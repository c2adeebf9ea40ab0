"""Hot-bucket width cap for the exact n-gram Jaccard baseline.

ngram_jaccard_stats joins docs on shared shingles — quadratic in the
width of a shingle bucket, so an adversarial corpus (every page carrying
the same boilerplate) makes the self-join cartesian (documented in
operators/dedup.py; VERDICT r3 item 7). ``max_shingle_bucket`` bounds the
per-bucket work the same way similarity's ``max_bucket_width`` does.
"""

from pyspark.sql import functions as F

from posextract_spark.operators.dedup import ngram_jaccard_stats


def _identical_corpus(spark, n_docs: int):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


def test_cap_bounds_adversarial_identical_corpus(spark):
    """2000 identical docs: uncapped would build 2000^2 = 4M pairs PER
    SHINGLE (6 shingles -> 24M join rows). cap=16 keeps the first 16 docs
    per bucket, so the join is bounded at 6 * 16^2 rows regardless of
    corpus size, and completes fast."""
    docs = _identical_corpus(spark, 2000)
    out = ngram_jaccard_stats(docs, max_shingle_bucket=16).collect()
    # identical text -> identical hash-of-id order in EVERY shingle bucket
    # -> the same 16 surviving docs; each sees the other 15 as candidates
    assert len(out) == 16
    assert all(r.n_candidates == 15 for r in out)
    # 10 words -> 6 shingles, all shared by every surviving pair
    assert all(r.max_shared == 6 for r in out)


def test_cap_wider_than_buckets_is_exact(spark):
    """A cap wider than every real bucket must be a no-op — this is why
    the oracle-checked contract query (cap=None) and a production run
    with a generous cap agree on non-adversarial data."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r.doc_id): (r.n_candidates, r.max_shared)
        for r in ngram_jaccard_stats(docs).collect()
    }
    capped = {
        (r.doc_id): (r.n_candidates, r.max_shared)
        for r in ngram_jaccard_stats(docs, max_shingle_bucket=100000).collect()
    }
    assert exact == capped
