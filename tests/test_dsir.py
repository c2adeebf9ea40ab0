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


def test_dsir_selects_target_domain_despite_flog2_quantization(spark):
    """Selection-quality study: two disjoint-vocabulary domains, target
    drawn from domain A -> the top-scoring half of the mixed raw corpus
    must be overwhelmingly domain A even with factor-2 log quantization."""
    import random

    pool_a = ("tensor gradient layer batch epoch loss optimizer weight "
              "embedding attention transformer token").split()
    pool_b = ("flour butter sugar oven whisk dough yeast frosting "
              "caramel sprinkle ganache pastry").split()

    def doc(pool, i):
        words = pool[:]
        random.Random(i).shuffle(words)
        return " ".join(words * 2)

    target = _docs(spark, [(1000 + i, doc(pool_a, 100 + i)) for i in range(10)])
    raw = _docs(
        spark,
        [(i, doc(pool_a, i)) for i in range(40)]
        + [(100 + i, doc(pool_b, i)) for i in range(40)],
    )
    scored = sorted(
        dsir_scores(raw, target).collect(),
        key=lambda r: (-r.dsir_score, r.doc_id),
    )
    top = [r.doc_id for r in scored[:40]]
    frac_a = sum(1 for d in top if d < 100) / 40
    assert frac_a >= 0.95, (frac_a, top[:10])
    # doc-level total separation is NOT guaranteed under factor-2 log
    # quantization (a rare unseen-by-target A bigram scores like a B
    # bigram) — the mean gap is, and is what importance RESAMPLING uses
    a_scores = [r.dsir_score for r in scored if r.doc_id < 100]
    b_scores = [r.dsir_score for r in scored if r.doc_id >= 100]
    assert sum(a_scores) / len(a_scores) > 2 * sum(b_scores) / len(b_scores)
