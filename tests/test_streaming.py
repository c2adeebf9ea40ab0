"""Streaming pipeline test: availableNow file-source run + resume."""

from posextract_spark.sources.pages import generate_pages
from posextract_spark.streaming import stream_pages_to_triples


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 40, seed=3, n_partitions=2)
    pages.write.parquet(src)

    q = stream_pages_to_triples(spark, src, ckpt, out, provider="template")
    q.awaitTermination(180)

    from posextract_spark.pipeline import pages_to_triples

    batch = pages_to_triples(spark.read.parquet(src), provider="template")
    key = ["url", "sent_pos", "sent_id", "subject", "verb", "object"]
    a = sorted(map(tuple, spark.read.parquet(out).select(*key).collect()))
    b = sorted(map(tuple, batch.select(*key).collect()))
    assert a == b and len(a) > 0

    # restart with the same checkpoint: no new files -> no duplicate output
    q2 = stream_pages_to_triples(spark, src, ckpt, out, provider="template")
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(a)
