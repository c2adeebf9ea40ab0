"""Physical-plan regression guards for the scale properties we claim.

These lock in: filter pushdown to the scan, column pruning, the
single-Python-crossing extraction stage, zero shuffles in extraction, and
the md5-once minhash plan (the Generate-boundary fix). If a refactor
reintroduces a shuffle or duplicates the hash pass, these fail."""

from pyspark.sql import functions as F

from posextract_spark.operators.dedup import minhash_signatures
from posextract_spark.operators.triples import extract_triples


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_pushdown_pruning_no_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = extract_triples(
        docs.filter(F.col("lang") == "en"), text_col="text", id_cols=["doc_id"], provider="svo"
    ).select("doc_id", "subject", "verb", "object")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert plan.count("MapInPandas") == 1  # one Python crossing
    assert "Exchange" not in plan  # extraction is shuffle-free
    # column pruning: the scan must not read source/n_chars
    assert "n_chars" not in plan and "source" not in plan


def test_minhash_hashes_once(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(minhash_signatures(docs))
    assert plan.count("md5") == 1  # the Generate-boundary guarantee
    assert "Exchange" not in plan  # still shuffle-free


def test_broadcast_linking_no_shuffle_join(spark):
    from posextract_spark.operators.graph import link_triples
    from posextract_spark.sources.pages import alias_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = extract_triples(docs, text_col="text", id_cols=["doc_id"], provider="svo")
    linked = link_triples(t, alias_table(spark))
    plan = _plan(linked)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_assign_no_shuffle(spark):
    """ivf_assign must be a pure scan-side projection: the r01 explode +
    window-argmax formulation shuffled N*k rows (VERDICT r01 item 3)."""
    from posextract_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(ivf_assign(emb))
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode either
    assert "Window" not in plan


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must merge-join with ZERO
    Exchange — the write-time shuffle pays for every later join. (Sort
    nodes may remain: sortBy order is only usable when each bucket is a
    single file, which parallel writers don't guarantee.)"""
    from posextract_spark.sources.bucketed import read_bucketed, write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "lang")
    write_bucketed(left, "bkt_left", "doc_id", 8, sort_col="doc_id",
                   path=str(tmp_path / "l"))
    write_bucketed(right, "bkt_right", "doc_id", 8, sort_col="doc_id",
                   path=str(tmp_path / "r"))
    try:
        a = read_bucketed(spark, "bkt_left").hint("merge")
        b = read_bucketed(spark, "bkt_right")
        joined = a.join(b, "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "SelectedBucketsCount" in plan  # bucketed scan, not plain files
        assert joined.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_ivf_inverted_lists_partition_pruned(spark, tmp_path):
    """The IVF probe's storage form: inverted lists written as
    centroid_id-partitioned parquet, probe = partition filter at the scan
    (touching ~1/k of the files), not a post-scan filter."""
    from pyspark.sql import functions as F

    from posextract_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lists = ivf_assign(emb).join(emb, "vec_id")
    path = str(tmp_path / "ivf_lists")
    lists.write.partitionBy("centroid_id").parquet(path)

    probe = spark.read.parquet(path).filter(F.col("centroid_id") == 3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # pruned scan reads only that list's rows
    assert probe.count() == lists.filter(F.col("centroid_id") == 3).count()


def test_corpus_quality_filter_single_scan_no_shuffle(spark):
    from posextract_spark.operators.textops import corpus_quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(corpus_quality_filter(docs))
    # the composite keep/drop decision is ONE scan-side projection:
    # no join, no Exchange, no Python crossing
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert plan.count("FileScan") == 1
