"""Multimodal operator tests: real plumbing over the deterministic formats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from posextract_spark.operators.multimodal import (
    audio_features,
    decode_simg,
    encode_simg,
    image_features,
    resize_images,
    sample_frames,
)
from posextract_spark.sources.media import gen_media_row, generate_media


@pytest.fixture(scope="module")
def media(spark):
    df = generate_media(spark, 60, seed=5, n_partitions=4).persist()
    df.count()
    return df


def test_metadata_matches_payload(media, spark):
    """meta.width/height (columnar, no decode) == decoded payload dims —
    the invariant that makes metadata-only pruning safe."""
    feats = image_features(media)
    joined = feats.join(media.select("media_id", "meta"), "media_id")
    bad = joined.filter(
        (F.col("width") != F.col("meta.width")) | (F.col("height") != F.col("meta.height"))
    ).count()
    assert bad == 0
    assert feats.count() == media.filter(F.col("kind") == "image").count()


def _hist(row):
    return tuple(v for k, v in row.asDict().items() if k.startswith("hist_"))


def test_image_features_deterministic(media):
    a = {r.media_id: (r.mean_e4, r.std_e4, _hist(r)) for r in image_features(media).collect()}
    b = {r.media_id: (r.mean_e4, r.std_e4, _hist(r)) for r in image_features(media).collect()}
    assert a == b and len(a) > 0
    # histogram mass == pixel count; scalar bins (arrays are unhashable in
    # pandas canonicalizers — CORRECTNESS_r01 regression)
    row = image_features(media).head()
    assert len(_hist(row)) == 4
    assert sum(_hist(row)) == row.width * row.height


def test_resize_halves_dims(media):
    out = resize_images(media, factor=2).collect()
    src = {r.media_id: r for r in media.filter(F.col("kind") == "image").collect()}
    for r in out:
        px = decode_simg(bytes(r.payload))
        assert px.shape[0] == src[r.media_id].meta.height // 2
        assert px.shape[1] == src[r.media_id].meta.width // 2
        assert r.meta.format == "SIMG"


def test_audio_features(media):
    rows = audio_features(media).collect()
    assert rows and all(r.rms_e4 > 0 and r.sample_rate in (8000, 16000) for r in rows)


def test_frame_sampling(media):
    frames = sample_frames(media, every_k=2)
    counts = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    src = {r.media_id: r.meta.n_frames for r in media.filter(F.col("kind") == "video").collect()}
    assert counts and all(counts[m] == (n + 1) // 2 for m, n in src.items())
    # sampled frames are valid SIMG images
    f = frames.head()
    assert decode_simg(bytes(f.payload)).size > 0


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_simg(b"\xff\xd8\xff\xe0 not a simg")


def test_metadata_only_scan_prunes_payload(media, spark, tmp_path):
    """Filter on meta.width must not read payload bytes: check ReadSchema
    in the physical plan after a parquet round-trip."""
    path = str(tmp_path / "media")
    media.write.parquet(path)
    q = spark.read.parquet(path).filter(F.col("meta.width") >= 32).select("media_id", "meta.width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_generator_deterministic():
    assert gen_media_row(7, seed=5) == gen_media_row(7, seed=5)
