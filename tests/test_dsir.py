"""Integer DSIR importance scoring (operators/mldata.dsir_scores):
flog2 exactness, the target==raw zero invariant, ranking direction, and
the broadcast plan shape."""

from pyspark.sql import functions as F

from posextract_spark.operators.mldata import _flog2, dsir_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_flog2_exact_values(spark):
    got = (
        spark.range(1)
        .select(*[_flog2(F.lit(x)).alias(f"v{x}") for x in (0, 1, 2, 3, 8, 1023, 1024)])
        .collect()[0]
    )
    assert (got.v0, got.v1, got.v2, got.v3, got.v8, got.v1023, got.v1024) == (
        0, 0, 1, 1, 3, 9, 10,
    )


def test_dsir_target_equals_raw_is_identically_zero(spark):
    # ct == cr and Nt == Nr for every bucket -> every term cancels
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_scores(docs, docs)
    assert out.count() > 0
    assert out.filter(F.col("dsir_score") != 0).count() == 0


def test_dsir_ranks_target_like_docs_higher(spark):
    target = _docs(spark, [(100, "the cat sat on the mat " * 3)])
    raw = _docs(
        spark,
        [
            (1, "the cat sat on the mat today fine"),  # shares target bigrams
            (2, "quantum flux harmonics destabilize the manifold rapidly"),
        ],
    )
    out = {r.doc_id: r.dsir_score for r in dsir_scores(raw, target).collect()}
    assert out[1] > out[2]


def test_dsir_short_docs_emit_no_row(spark):
    raw = _docs(spark, [(1, "solo"), (2, "two words")])
    target = _docs(spark, [(100, "two words")])
    got = {r.doc_id for r in dsir_scores(raw, target).collect()}
    assert got == {2}


def test_dsir_score_map_broadcasts(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        dsir_scores(docs, docs.filter(F.col("doc_id") % 29 == 0))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
