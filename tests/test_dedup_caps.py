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
    SHINGLE (6 shingles -> 24M join rows). cap=16 keeps each doc in a
    width-2000 bucket iff pmod(hash64(doc_id), 2000) < 16 (r5
    hash-threshold cap — expected width 16, no per-bucket sort). The
    predicate depends only on doc_id, so every bucket keeps the SAME doc
    set; this mirrors the hash in Python and asserts the exact survivor
    set, cross-checking the threshold semantics AND the hash."""
    import hashlib

    expected = {
        i
        for i in range(2000)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 2000 < 16
    }
    assert len(expected) == 15  # binomial(2000, 16/2000) draw for this corpus

    docs = _identical_corpus(spark, 2000)
    out = ngram_jaccard_stats(docs, max_shingle_bucket=16).collect()
    assert {r.doc_id for r in out} == expected
    assert all(r.n_candidates == len(expected) - 1 for r in out)
    # 10 words -> 6 shingles, all shared by every surviving pair
    assert all(r.max_shared == 6 for r in out)
    # the cap path must not rank inside buckets: no Window node in the plan
    plan = ngram_jaccard_stats(docs, max_shingle_bucket=16)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


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
    # r5 (VERDICT r4 item 1): the bucket-min must be a map-side-partial
    # groupBy + join-back, never a partition-only Window that serializes a
    # 10^6-copy hot bucket onto one task. Guard fails on the r4 code.
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan  # map-side partial aggregation of the bucket-min
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


def test_capped_band_pairs_exact_sample_and_single_materialization(spark):
    """minhash_band_pairs with a cap (r6, ADVICE r5): the band-key frame
    has two consumers (width agg + capped self-join), so it must be
    materialized ONCE (eager localCheckpoint) — the executed plan contains
    NO FileScan (lineage severed at the checkpoint) instead of the two
    full scan+shingle+md5 lineages the r5 code re-planned. Semantics: all
    2000 identical docs share one bucket per band; cap=16 keeps doc i iff
    md5(i) % 2000 < 16 (same Python mirror as the ngram cap test), so the
    pair listing is exactly C(15,2)=105 pairs, each colliding in all 4
    bands."""
    import hashlib

    from posextract_spark.operators.dedup import minhash_band_pairs

    expected = {
        i
        for i in range(2000)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 2000 < 16
    }
    docs = _identical_corpus(spark, 2000)
    capped = minhash_band_pairs(docs, max_bucket_width=16)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    out = capped.collect()
    ids = {r.id_a for r in out} | {r.id_b for r in out}
    assert ids == expected
    n = len(expected)
    assert len(out) == n * (n - 1) // 2
    assert all(r.n_bands == 4 for r in out)


def test_capped_band_pairs_single_scan_from_parquet(spark):
    """Same cap path over a real parquet source: the pre-r6 shape planned
    the FileScan TWICE (once under the width agg, once under the
    self-join); the checkpoint makes it zero FileScans in the final plan
    (both consumers read the checkpointed blocks)."""
    from posextract_spark.operators.dedup import minhash_band_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    capped = minhash_band_pairs(docs, max_bucket_width=64)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0
    # and the uncapped (oracle-checked) path still plans straight scans
    uncapped = minhash_band_pairs(docs)
    uplan = uncapped._jdf.queryExecution().executedPlan().toString()
    assert uplan.count("FileScan") >= 1


def test_against_base_flags_and_bucket_summary_plan(spark):
    """Append-only incremental dedup: 2000 identical docs split odd/even —
    every odd (new) doc must hit the base in all 4 bands with
    matched_base_id = 0 (the smallest even doc). The base side must be
    aggregated to a per-bucket summary BEFORE the join (partial_min, no
    Window), so hot buckets cannot make the join quadratic; and a truly
    novel doc comes back is_new=1 / matched -1."""
    from posextract_spark.operators.dedup import minhash_dedup_against_base

    docs = _identical_corpus(spark, 2000)
    novel = spark.createDataFrame(
        [(9001, "totally different words nobody else ever wrote here today ok")],
        "doc_id bigint, text string",
    )
    new_df = docs.filter(F.col("doc_id") % 2 == 1).unionAll(novel)
    base_df = docs.filter(F.col("doc_id") % 2 == 0)
    out = minhash_dedup_against_base(new_df, base_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 1001
    for i in range(1, 2000, 2):
        assert rows[i].n_hit_bands == 4 and rows[i].matched_base_id == 0
        assert rows[i].is_new == 0
    assert rows[9001].is_new == 1 and rows[9001].matched_base_id == -1


def test_best_survivors_picks_longest_per_cluster(spark):
    """Quality-aware selection: same clusters as the min-id survivors,
    winner = longest member (ties -> min id), exactly one per cluster."""
    import pandas as pd

    from posextract_spark.operators.dedup import (
        minhash_dedup_best_survivors,
        minhash_dedup_survivors,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),                       # cluster A, short
        (2, base + " extended with an extra trailing clause"),  # cluster A, LONGEST
        (3, base),                       # cluster A, short (tie with 1)
        (9, "completely different words making an unrelated singleton document here"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in minhash_dedup_best_survivors(docs).collect()}
    # cluster structure identical to the min-id survivors path
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in minhash_dedup_survivors(docs).collect()
    }
    assert {d: o["cluster_id"] for d, o in out.items()} == clusters
    # doc 2 (longest) wins its cluster even though doc 1 has the min id
    assert out[2]["is_best"] == 1 and out[1]["is_best"] == 0 and out[3]["is_best"] == 0
    assert out[9]["is_best"] == 1  # singleton is its own best
    # exactly one winner per cluster
    by_cluster = {}
    for o in out.values():
        by_cluster.setdefault(o["cluster_id"], 0)
        by_cluster[o["cluster_id"]] += o["is_best"]
    assert all(v == 1 for v in by_cluster.values())


def test_best_survivors_tie_breaks_min_id(spark):
    import pandas as pd

    from posextract_spark.operators.dedup import minhash_dedup_best_survivors

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        pd.DataFrame([(7, t), (4, t)], columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["is_best"] for r in minhash_dedup_best_survivors(docs).collect()}
    assert out == {4: 1, 7: 0}  # equal lengths -> min id wins
