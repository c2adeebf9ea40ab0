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


def test_survivors_star_edges_equal_pair_join_closure(spark):
    """The r4 survivors path feeds CC star edges (member -> bucket-min)
    instead of the all-pairs listing. Within a bucket both edge sets have
    the same transitive closure, so the CLUSTERS must be identical — this
    re-derives survivors from the pair join and compares frames exactly."""
    from posextract_spark.operators.canonicalize import connected_components_star
    from posextract_spark.operators.dedup import minhash_band_pairs, minhash_dedup_survivors

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    star = {(r.doc_id, r.cluster_id, r.is_survivor) for r in minhash_dedup_survivors(docs).collect()}

    pairs = minhash_band_pairs(docs)
    comps = connected_components_star(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    via_pairs = {
        (r.doc_id, r.cluster_id, r.is_survivor)
        for r in docs.select("doc_id")
        .join(comps.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_survivor", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
        .collect()
    }
    assert star == via_pairs


def test_survivors_linear_on_hot_bucket(spark):
    """2000 identical docs land in ONE bucket per band: the old pair join
    built ~2000^2/2 * 4 bands = 8M join rows; star edges build exactly
    n-1 distinct edges and the whole dedup completes fast with one
    survivor."""
    from posextract_spark.operators.dedup import (
        _band_keys,
        _star_edges,
        minhash_dedup_survivors,
    )

    docs = _identical_corpus(spark, 2000)
    # the PRODUCTION edge construction (shared helper), not a re-implementation
    edges = _star_edges(_band_keys(docs, "text", "doc_id", 8, 2), "doc_id")
    assert edges.count() == 1999  # O(k), not O(k^2)

    out = minhash_dedup_survivors(docs).collect()
    assert len(out) == 2000
    assert sum(r.is_survivor for r in out) == 1
    assert {r.cluster_id for r in out} == {0}


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
