"""Selection operators: cluster-balanced sampling and reciprocal rank
fusion (operators/similarity.cluster_balanced_sample / rrf_search_topk)."""

import hashlib

from pyspark.sql import functions as F

from posextract_spark.operators.similarity import (
    cluster_balanced_sample,
    rrf_search_topk,
)

CENTS = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]


def test_cluster_balanced_sample_caps_hot_cluster_only(spark):
    # cluster 0: 40 vectors (hot); cluster 1: 3 vectors (tail)
    rows = [(i, [1.0, 0.001 * i]) for i in range(40)]
    rows += [(100 + i, [0.01 * i, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = cluster_balanced_sample(df, cap_per_cluster=8, centroids=CENTS).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r.centroid_id, []).append(r)
    assert len(by_c[0]) == 40 and len(by_c[1]) == 3  # row-preserving report
    # tail cluster entirely kept
    assert all(r.kept == 1 for r in by_c[1])
    kept_hot = [r for r in by_c[0] if r.kept == 1]
    # expected-cap subsample: some dropped, python-mirror the md5 rule
    for r in by_c[0]:
        h = int(hashlib.md5(str(r.vec_id).encode()).hexdigest()[:15], 16)
        want = 1 if (40 <= 8 or h % 40 < 8) else 0
        assert r.kept == want, r.vec_id
    assert 0 < len(kept_hot) < 40


def test_cluster_balanced_sample_partition_invariant(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        (r.vec_id, r.kept)
        for r in cluster_balanced_sample(emb, cap_per_cluster=8).collect()
    }
    b = {
        (r.vec_id, r.kept)
        for r in cluster_balanced_sample(
            emb.repartition(13), cap_per_cluster=8
        ).collect()
    }
    assert a == b


def test_rrf_fuses_both_arms(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seed = ["merge", "vector", "scan"]
    out = rrf_search_topk(docs, seed, query_id=0, k=10, pool=25).collect()
    assert len(out) == 10
    # deterministic order: score desc, id asc
    scores = [r.rrf_score_e6 for r in out]
    assert scores == sorted(scores, reverse=True)
    # a doc ranked 1 in both arms would score 2 * (1e6 div 61) = 32786
    assert all(r.rrf_score_e6 <= 2 * (1000000 // 61) for r in out)
    # every returned doc is in at least one arm
    assert all(r.lex_rank > 0 or r.sem_rank > 0 for r in out)


def test_rrf_rank_zero_means_absent_arm(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # a seed vocabulary hitting nothing: lexical arm is empty, the
    # semantic arm alone fills the result, lex_rank = 0 everywhere
    out = rrf_search_topk(docs, ["zzzznonexistent"], query_id=0, k=5).collect()
    assert len(out) == 5
    assert all(r.lex_rank == 0 and r.sem_rank > 0 for r in out)
    assert all(r.rrf_score_e6 == 1000000 // (60 + r.sem_rank) for r in out)


def test_hard_negatives_exclude_self_and_gold(spark):
    from posextract_spark.operators.similarity import hard_negative_mining

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),     # query
            (5, [1.0, 0.01]),    # gold positive (excluded)
            (6, [1.0, 0.02]),    # hardest negative
            (7, [0.9, 0.1]),     # next
            (8, [0.0, 1.0]),     # easy negative
        ],
        "vec_id bigint, embedding array<double>",
    )
    gold = spark.createDataFrame([(0, 5)], "qid long, pos_id long")
    out = sorted(
        hard_negative_mining(emb, gold, n_queries=1, k=2).collect(),
        key=lambda r: -r.sim_e6,
    )
    assert [r.neg_id for r in out] == [6, 7]  # self 0 and gold 5 excluded
    assert all(r.qid == 0 for r in out)


def test_hard_negatives_rank_by_similarity_desc(spark):
    from posextract_spark.operators.similarity import hard_negative_mining

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    gold = spark.createDataFrame(
        [(q, q + 50) for q in range(4)], "qid long, pos_id long"
    )
    out = hard_negative_mining(emb, gold, n_queries=4, k=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r)
    for qid, rows in per_q.items():
        assert len(rows) == 3
        sims = sorted((r.sim_e6 for r in rows), reverse=True)
        assert sims == [r.sim_e6 for r in sorted(rows, key=lambda r: (-r.sim_e6, r.neg_id))]
        assert all(r.neg_id != qid and r.neg_id != qid + 50 for r in rows)


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    from pyspark.sql import functions as F

    from posextract_spark.operators.similarity import (
        cosine_topk,
        lsh_bucket,
        lsh_multiprobe_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    truth = {
        r.vec_id for r in cosine_topk(emb.filter("vec_id <> 0"), qv, k=10).collect()
    }
    multi = {r.vec_id for r in lsh_multiprobe_topk(emb, query_id=0, k=10).collect()}
    b = lsh_bucket(emb, n_planes=4)
    qb = b.filter("vec_id = 0").collect()[0].bucket
    single_ids = {
        r.vec_id for r in b.filter(F.col("bucket") == qb).collect()
    } - {0}
    single = truth & single_ids  # single-bucket can only return its bucket
    assert len(multi & truth) >= len(single)
    # probing 5 of 16 buckets must beat a 1/16 random slice on recall
    assert len(multi & truth) >= 3, sorted(multi)
