"""Garbage tolerance of the media operators (r5): corrupt or degenerate
payloads must be quarantined per row (on_error='skip', the default), never
kill the stage, and never be silently mis-decoded; real-codec magic must
still raise loudly. The r4 code crashed on a 0-pixel image
(int(floor(nan))) and on truncated SIMG/SVID bodies (numpy reshape), and
decode_saud silently returned FEWER samples than the header claimed."""

import struct

import numpy as np
import pytest

from posextract_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_saud,
    decode_simg,
    decode_svid,
    encode_saud,
    encode_simg,
    encode_svid,
    image_features,
    resize_images,
    sample_frames,
)


def _img_rows():
    good = encode_simg(np.arange(64, dtype=np.uint8).reshape(8, 8))
    empty = encode_simg(np.zeros((0, 0), dtype=np.uint8))  # 0-pixel, valid header
    truncated = good[: len(good) - 10]
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    return [
        (1, "image", bytearray(good), (8, 8, "SIMG", None, None)),
        (2, "image", bytearray(empty), (0, 0, "SIMG", None, None)),
        (3, "image", bytearray(truncated), (8, 8, "SIMG", None, None)),
    ], jpeg


def test_decoders_raise_explicit_valueerror_on_truncation():
    good = encode_simg(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated SIMG"):
        decode_simg(good[:-3])
    aud = encode_saud(8000, np.zeros(100, dtype=np.int16))
    with pytest.raises(ValueError, match="truncated SAUD"):
        decode_saud(aud[:-5])
    vid = encode_svid(np.zeros((3, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated SVID"):
        decode_svid(vid[:-7])


def test_image_features_quarantines_corrupt_and_degenerate(spark):
    rows, _ = _img_rows()
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = image_features(df).collect()
    # only the well-formed 8x8 image emits features; the 0-pixel and
    # truncated payloads are quarantined (no row), not a stage crash
    assert [r.media_id for r in out] == [1]
    assert out[0].width == 8 and out[0].height == 8
    with pytest.raises(Exception):  # fail-fast mode surfaces the ValueError
        image_features(df, on_error="raise").collect()


def test_real_codec_magic_still_raises_even_with_skip(spark):
    rows, jpeg = _img_rows()
    df = spark.createDataFrame(
        [(9, "image", bytearray(jpeg), (0, 0, "JPEG", None, None))], MEDIA_SCHEMA
    )
    # NotImplementedError must NOT be swallowed by on_error='skip':
    # dropping data the build cannot read hides a deployment error
    with pytest.raises(Exception, match="NotImplementedError|not implemented"):
        image_features(df).collect()


def test_resize_skips_sub_factor_images(spark):
    one_px = encode_simg(np.array([[7]], dtype=np.uint8))
    good = encode_simg(np.arange(16, dtype=np.uint8).reshape(4, 4))
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(one_px), (1, 1, "SIMG", None, None)),
            (2, "image", bytearray(good), (4, 4, "SIMG", None, None)),
        ],
        MEDIA_SCHEMA,
    )
    out = resize_images(df, factor=2).collect()
    assert [r.media_id for r in out] == [2]  # 1x1 would crop to 0 pixels
    assert out[0].meta.width == 2 and out[0].meta.height == 2


def test_audio_zero_samples_is_a_valid_row_but_truncation_skips(spark):
    silent = encode_saud(8000, np.zeros(0, dtype=np.int16))
    good = encode_saud(16000, np.array([100, -100, 100], dtype=np.int16))
    truncated = good[:-2]
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(silent), (None, None, "SAUD", None, 8000)),
            (2, "audio", bytearray(good), (None, None, "SAUD", None, 16000)),
            (3, "audio", bytearray(truncated), (None, None, "SAUD", None, 16000)),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in audio_features(df).collect()}
    assert set(out) == {1, 2}  # truncated quarantined; zero-sample kept
    assert out[1].n_samples == 0 and out[1].rms_e4 == 0 and out[1].zero_crossings == 0
    assert out[2].zero_crossings == 2


def test_frame_sample_skips_truncated_video(spark):
    good = encode_svid(np.zeros((4, 3, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(good), (3, 3, "SVID", 4, None)),
            (2, "video", bytearray(good[:-5]), (3, 3, "SVID", 4, None)),
        ],
        MEDIA_SCHEMA,
    )
    out = sample_frames(df, every_k=2).collect()
    assert {r.media_id for r in out} == {1}
    assert sorted(r.frame_idx for r in out) == [0, 2]


def test_on_error_validation():
    import pyspark.sql.functions as F  # noqa: F401

    with pytest.raises(ValueError, match="on_error"):
        image_features(None, on_error="ignore")


def test_quarantine_holes_from_review(spark):
    """r5 second review: (a) garbage/flipped magic and empty payloads must
    QUARANTINE (the first cut escalated every unknown magic to
    NotImplementedError — one flipped magic byte killed the stage under
    'skip'); (b) NULL payloads must quarantine, not TypeError; (c) a
    corrupt SAUD rate > INT32_MAX must quarantine, not silently wrap in
    the Arrow int64->int32 cast; (d) a 0-width video must quarantine
    rather than emit 0-pixel frame rows."""
    good = encode_simg(np.arange(64, dtype=np.uint8).reshape(8, 8))
    rows = [
        (1, "image", bytearray(good), (8, 8, "SIMG", None, None)),
        (2, "image", bytearray(b""), (0, 0, "SIMG", None, None)),            # empty
        (3, "image", bytearray(b"XIMG\x01\x00\x01\x00\x00"), (1, 1, "SIMG", None, None)),  # flipped magic
        (4, "image", None, (8, 8, "SIMG", None, None)),                      # NULL payload
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = image_features(df).collect()
    assert [r.media_id for r in out] == [1]

    wrapped_rate = b"SAUD" + struct.pack("<II", 0xFFFFFFFF, 0)
    good_aud = encode_saud(16000, np.array([5, -5], dtype=np.int16))
    adf = spark.createDataFrame(
        [
            (1, "audio", bytearray(good_aud), (None, None, "SAUD", None, 16000)),
            (2, "audio", bytearray(wrapped_rate), (None, None, "SAUD", None, None)),
            (3, "audio", None, (None, None, "SAUD", None, None)),
        ],
        MEDIA_SCHEMA,
    )
    aout = audio_features(adf).collect()
    assert [r.media_id for r in aout] == [1]  # no wrapped -1 sample_rate row

    zero_w_video = b"SVID" + struct.pack("<HHH", 0, 3, 4)
    vdf = spark.createDataFrame(
        [(1, "video", bytearray(zero_w_video), (0, 3, "SVID", 4, None))], MEDIA_SCHEMA
    )
    assert sample_frames(vdf).count() == 0  # no 0-pixel frame rows emitted
    with pytest.raises(Exception, match="degenerate"):
        sample_frames(vdf, on_error="raise").collect()


def test_weak_two_byte_magics_quarantine_not_escalate(spark):
    """Third review: 2-byte prefixes (BMP's 'BM', MP3's 0xFFFB frame
    sync) match ~2^-16 of random garbage — an expected event at 10^10
    rows — so they must QUARANTINE as corrupt data, not escalate to a
    stage-killing NotImplementedError; only >=3-byte magics escalate."""
    good = encode_simg(np.arange(64, dtype=np.uint8).reshape(8, 8))
    rows = [
        (1, "image", bytearray(good), (8, 8, "SIMG", None, None)),
        (2, "image", bytearray(b"BM25 ranking text that landed here"), (0, 0, "?", None, None)),
        (3, "image", bytearray(b"\xff\xfb\x01\x02\x03\x04\x05\x06"), (0, 0, "?", None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = image_features(df).collect()
    assert [r.media_id for r in out] == [1]


def test_mp4_error_reports_brand_not_box_size():
    payload = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="ftyp/mp42"):
        decode_simg(payload)


def test_encode_saud_rejects_undecodable_rates():
    with pytest.raises(ValueError, match="sample_rate"):
        encode_saud(0, np.zeros(4, dtype=np.int16))
    with pytest.raises(ValueError, match="sample_rate"):
        encode_saud(2**31, np.zeros(4, dtype=np.int16))
