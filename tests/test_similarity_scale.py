"""Scale-hardening guards for the embedding near-dup path (VERDICT r01 #4).

The oracle gate already pins value correctness at n_planes=4; these tests
pin the SCALE behavior: plane count grows with N, and a skew-hammered
bucket (every vector identical -> one bucket) stays bounded under
max_bucket_width instead of going quadratic.
"""

import pytest
from pyspark.sql import functions as F

from posextract_spark.operators.similarity import neardup_bucket_stats, planes_for


def test_planes_scale_with_n():
    assert planes_for(500) == 4  # floor
    assert planes_for(10**6, target_bucket=1024) == 10
    assert planes_for(10**9, target_bucket=1024) == 20
    assert planes_for(10**12, target_bucket=1024) == 24  # ceiling
    # monotone non-decreasing
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9, 10**11):
        p = planes_for(n)
        assert p >= prev
        prev = p


@pytest.fixture(scope="module")
def skewed(spark):
    # 300 identical vectors: every row lands in ONE lsh bucket — the
    # adversarial case hyperplanes cannot split.
    vec = [1.0, 0.5, -0.25, 0.125]
    return spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in vec]).alias("embedding"),
    )


def test_skewed_bucket_width_bounded(skewed):
    """r5: the cap is a deterministic hash threshold (expected width =
    cap, no per-bucket row_number Window that would serialize the hot
    bucket onto one task); mirror the md5 threshold in Python and assert
    the exact surviving-pair count."""
    import hashlib

    cap = 20
    survivors = [
        i
        for i in range(300)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 300 < cap
    ]
    assert len(survivors) == 25  # binomial(300, 20/300) draw for this id set

    q = neardup_bucket_stats(skewed, n_planes=4, max_bucket_width=cap)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no single-task hot-bucket sort
    rows = q.collect()
    hot = max(rows, key=lambda r: r.n_vecs)
    assert hot.n_vecs == 300  # true width still reported
    assert hot.n_pairs == len(survivors) * (len(survivors) - 1) // 2
    assert hot.max_sim_e6 == 1000000  # identical vectors -> cosine 1


def test_uncapped_matches_capped_on_small_buckets(spark):
    # When every bucket is under the cap, the cap must be a no-op.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r.bucket: r for r in neardup_bucket_stats(emb, n_planes=4).collect()}
    b = {
        r.bucket: r
        for r in neardup_bucket_stats(emb, n_planes=4, max_bucket_width=10**6).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert (a[k].n_pairs, a[k].n_neardup, a[k].max_sim_e6) == (
            b[k].n_pairs,
            b[k].n_neardup,
            b[k].max_sim_e6,
        )


def test_kmeans_convergence_properties(spark):
    """Trained centroids must (a) keep all k clusters, (b) be deterministic,
    (c) not decrease total assignment similarity vs the init centroids."""
    from posextract_spark.operators.similarity import ivf_assign, kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = kmeans_centroids(emb, n_iter=2)
    c2 = kmeans_centroids(emb, n_iter=2)
    assert c1 == c2  # deterministic
    assert len(c1) == 8 and all(len(v) == 64 for _, v in c1)

    init_sim = ivf_assign(emb).agg({"sim_e6": "sum"}).head()[0]
    trained_sim = ivf_assign(emb, centroids=c1).agg({"sim_e6": "sum"}).head()[0]
    assert trained_sim >= init_sim


def test_minhash_dedup_survivors_clusters(spark):
    """Exact duplicates must share a cluster with exactly one survivor (the
    min id); unique docs are their own singleton survivor."""
    from posextract_spark.operators.dedup import minhash_dedup_survivors

    rows = (
        [(i, "the quick brown fox jumps over the lazy dog wearing hats") for i in range(5)]
        + [(i, "merge sort beats bubble sort on large random integer arrays") for i in range(10, 13)]
        + [(20, "completely unrelated singleton text about spark shuffles here")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.cluster_id, r.is_survivor) for r in minhash_dedup_survivors(df).collect()}
    assert len(out) == 9
    assert all(out[i] == (0, 1 if i == 0 else 0) for i in range(5))
    assert all(out[i] == (10, 1 if i == 10 else 0) for i in range(10, 13))
    assert out[20] == (20, 1)


def test_band_join_correct_under_heavy_skew(spark):
    """Boilerplate-heavy corpus: one band bucket holds every doc. The pair
    join must stay correct (exact n*(n-1)/2 pairs with all bands colliding)
    — AQE's skew split changes the physical plan, never the result."""
    from posextract_spark.operators.dedup import MINHASH_SEEDS, minhash_band_pairs

    n = 120
    df = spark.createDataFrame(
        [(i, "identical boilerplate navigation footer text repeated on every page") for i in range(n)],
        "doc_id long, text string",
    )
    pairs = minhash_band_pairs(df).collect()
    assert len(pairs) == n * (n - 1) // 2
    assert all(p.n_bands == MINHASH_SEEDS // 2 for p in pairs)


def test_ivf_nprobe_recall_and_degeneration(spark):
    """nprobe widens the probe: results stay a subset-consistent ranking,
    and nprobe == n_centroids must equal exact brute force."""
    from posextract_spark.operators.similarity import cosine_topk, ivf_topk, kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").head()[1]]
    cents = kmeans_centroids(emb, n_iter=2)

    brute = [tuple(r) for r in cosine_topk(emb, qv, k=10).collect()]
    full_probe = [tuple(r) for r in ivf_topk(emb, qv, k=10, centroids=cents, nprobe=8).collect()]
    assert full_probe == brute

    one = {r[0] for r in ivf_topk(emb, qv, k=10, centroids=cents, nprobe=1).collect()}
    four = [tuple(r) for r in ivf_topk(emb, qv, k=10, centroids=cents, nprobe=4).collect()]
    # recall is monotone: the wider probe's hits overlap brute force at
    # least as much as the narrow probe's
    brute_ids = {b[0] for b in brute}
    assert len({f[0] for f in four} & brute_ids) >= len(one & brute_ids)


def test_repartition_by_hash_colocates(spark):
    from pyspark.sql import functions as F

    from posextract_spark.operators.triples import repartition_by_hash

    df = spark.createDataFrame(
        [(f"https://x.test/{i % 7}", i) for i in range(200)], "url string, n long"
    )
    out = repartition_by_hash(df, "url", n_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    parts = out.select("url", F.spark_partition_id().alias("p")).distinct()
    # each url lands in exactly one partition (co-location for bucketing)
    assert parts.groupBy("url").count().filter("count > 1").count() == 0


def test_zero_norm_vectors_rank_last_both_paths(spark):
    """A zero vector must rank below every real similarity (-2e6) instead of
    producing NaN (Spark) vs NULL (DuckDB) divergence or an ANSI cast error."""
    from pyspark.sql import functions as F

    from posextract_spark.operators.similarity import cosine_topk, ivf_assign

    rows = [(0, [1.0, 0.0, 0.0, 0.5]), (1, [0.5, 0.1, 0.0, 0.2]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = cosine_topk(df, [1.0, 0.0, 0.0, 0.5], k=3).collect()
    assert top[-1].vec_id == 2 and top[-1].sim_e6 == -2000000

    assign = {r.vec_id: r.sim_e6 for r in ivf_assign(df, k=2).collect()}
    assert assign[2] == -2000000


def test_neardup_single_projection_no_prejoin(spark):
    """The bucket+embedding frame must come from ONE scan projection — the
    r2 join-back shape shuffled the whole embedding table before the pair
    join."""
    from posextract_spark.operators.similarity import neardup_bucket_stats

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = neardup_bucket_stats(emb, n_planes=4)._jdf.queryExecution().executedPlan().toString()
    # no equi-join keyed on vec_id anywhere (the join-back shape); the only
    # joins are the bucket-keyed pair join and the sizes left-join
    import re

    assert not re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[vec_id", plan)
    # three scans: sizes + pair-left + pair-right (join-back had four)
    assert plan.count("Scan parquet") <= 3


# --- product quantization ------------------------------------------------------


def test_pq_encode_invariants_and_parity(spark):
    import duckdb
    import pandas as pd

    from posextract_spark.operators.similarity import (
        PQ_KSUB,
        PQ_M,
        pq_encode,
        pq_encode_sql,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = pq_encode(emb).toPandas()
    n_vecs = emb.count()
    assert len(got) == n_vecs * PQ_M
    assert got["code"].between(0, PQ_KSUB - 1).all()
    # codebook vectors encode to themselves in every subspace (their
    # subvector IS the centroid -> sim_e6 = 1e6, argmax picks it)
    own = got[got["vec_id"] < PQ_KSUB]
    assert (own["code"] == own["vec_id"]).all()
    # floor(cos * 1e6) of a self-match is 1e6 or 1e6-1 (the float dot/norm
    # quotient can land one ulp under 1.0)
    assert (own["sim_e6"] >= 999_999).all()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    want = con.execute(pq_encode_sql()).df()
    key = ["vec_id", "subspace"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.reindex(sorted(a.columns), axis=1), b.reindex(sorted(b.columns), axis=1),
        check_dtype=True,
    )


def test_pq_adc_query_ranks_itself_first(spark):
    from posextract_spark.operators.similarity import pq_adc_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    top = pq_adc_topk(emb, query_id=7, k=5).collect()
    # the query's own codes hit the max table entry in EVERY subspace, so
    # its ADC total is the global maximum
    assert top[0]["id"] == 7
    assert top[0]["adc_e6"] >= top[-1]["adc_e6"]


def test_pq_kmeans_codebooks_train_and_improve(spark):
    """Trained codebooks (VERDICT r6 item 2): training actually moves the
    id-slice init, cluster counts stay k_sub per subspace, and the trained
    quantizer's total encode distortion (sum of assignment sim_e6) is no
    worse than the untrained one."""
    from posextract_spark.operators.similarity import (
        PQ_KSUB,
        PQ_M,
        _pq_codebooks,
        pq_codebooks_kmeans,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    init = _pq_codebooks(emb, PQ_M, PQ_KSUB, "vec_id", "embedding")
    trained = pq_codebooks_kmeans(emb, n_iter=2)
    assert len(trained) == PQ_M
    assert all(len(book) == PQ_KSUB for book in trained)
    assert trained != init  # Lloyd moved at least one centroid
    # same cid labels, same dsub
    for s in range(PQ_M):
        assert [cid for cid, _ in trained[s]] == [cid for cid, _ in init[s]]
        assert all(len(vec) == len(init[s][0][1]) for _, vec in trained[s])

    sum_init = pq_encode(emb, codebooks=init).agg({"sim_e6": "sum"}).head()[0]
    sum_trained = pq_encode(emb, codebooks=trained).agg({"sim_e6": "sum"}).head()[0]
    assert sum_trained >= sum_init  # Lloyd is monotone in total similarity


def test_ivf_pq_full_probe_equals_adc_and_plan_has_no_join(spark):
    """nprobe == n_centroids degenerates IVF-PQ to plain full-corpus ADC,
    and the physical plan is ONE scan with a centroid filter — no join, no
    broadcast of id lists (the partition-pruning production shape)."""
    from posextract_spark.operators.similarity import IVF_K, ivf_pq_topk, pq_adc_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = [tuple(r) for r in ivf_pq_topk(emb, query_id=3, k=10, nprobe=IVF_K).collect()]
    adc = [tuple(r) for r in pq_adc_topk(emb, query_id=3, k=10).collect()]
    assert full == adc

    q = ivf_pq_topk(emb, query_id=3, k=10, nprobe=2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Scan parquet") == 1


def test_ann_recall_floors_and_monotonicity(spark):
    """Retrieval-quality floors (VERDICT r6 item 1): recall@10 is monotone
    in nprobe, the full probe is exact (recall 1.0), and nprobe=4 clears a
    0.75 floor on the fixture corpus (measured 0.83-0.86 at sf0.001/0.01,
    RECALL.md); the refine stage must beat raw ADC at equal nprobe."""
    from posextract_spark.operators.similarity import (
        IVF_K,
        ann_recall_ivf,
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks_kmeans,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_centroids(emb, n_iter=2)
    r = {
        int(row[0]): int(row[1])
        for row in ann_recall_ivf(
            emb, n_queries=20, k=10, nprobes=(1, 2, 4, 8), centroids=cents
        ).collect()
    }
    assert r[1] <= r[2] <= r[4] <= r[8]
    assert r[8] == 200  # full probe == brute force, all 20*10 hits
    assert r[4] >= 150  # recall@10 >= 0.75 at nprobe=4

    books = pq_codebooks_kmeans(emb, n_iter=2)
    qv = [float(x) for x in emb.filter("vec_id = 3").head()[1]]
    truth = {int(x[0]) for x in cosine_topk(emb, qv, k=10).collect()}
    raw = {
        int(x[0])
        for x in ivf_pq_topk(
            emb, query_id=3, k=10, nprobe=4, centroids=cents, codebooks=books
        ).collect()
    }
    refined = {
        int(x[0])
        for x in ivf_pq_topk(
            emb, query_id=3, k=10, nprobe=4, centroids=cents, codebooks=books, refine=50
        ).collect()
    }
    assert len(refined & truth) >= len(raw & truth)


def test_pq_index_rows_consistent_and_single_scan(spark):
    """The stored IVF-PQ index layout must agree with its two components
    (centroid_id == ivf_assign, codes == pq_encode) and come from ONE
    scan with no Exchange — the write path partitioned-by-centroid
    storage assumes."""
    from posextract_spark.operators.similarity import (
        ivf_assign,
        pq_encode,
        pq_index_rows,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = pq_index_rows(emb)
    rows = idx.collect()
    assign = {r.vec_id: r.centroid_id for r in ivf_assign(emb).collect()}
    codes = {
        (r.vec_id, r.subspace): r.code for r in pq_encode(emb).collect()
    }
    assert len(rows) == len(codes)
    for r in rows:
        assert r.centroid_id == assign[r.vec_id]
        assert r.code == codes[(r.vec_id, r.subspace)]

    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert plan.count("Scan parquet") == 1
