"""C4-style paragraph dedup (r6): intra-document order-preserving dedup
and corpus-global first-occurrence dedup (operators/textops.py). The hard
cross-engine signal is the oracle pair (dedup_paragraphs[_global] in the
local strict gate); these pin closed-form semantics and plan shape."""

from pyspark.sql import functions as F

from posextract_spark.operators.textops import dedup_paragraphs, dedup_paragraphs_global


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _corpus(spark):
    rows = [
        (1, "alpha\n\nboiler\n\nalpha\n\nbeta"),   # intra repeat of 'alpha'
        (2, "boiler\n\ngamma"),                    # 'boiler' first seen in doc 1
        (3, "boiler"),                             # everything a repeat -> empty
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_intra_doc_first_occurrence_order(spark):
    out = {r.doc_id: r for r in dedup_paragraphs(_corpus(spark)).collect()}
    assert out[1].text_dedup == "alpha\n\nboiler\n\nbeta"  # order preserved
    assert (out[1].n_paras, out[1].n_dropped) == (4, 1)
    assert out[2].text_dedup == "boiler\n\ngamma" and out[2].n_dropped == 0
    assert out[3].text_dedup == "boiler" and out[3].n_dropped == 0


def test_global_keeps_min_doc_min_pos_only(spark):
    out = {r.doc_id: r for r in dedup_paragraphs_global(_corpus(spark)).collect()}
    # doc 1 keeps alpha@0, boiler@1, beta@3 (alpha@2 is a global repeat)
    assert out[1].text_dedup == "alpha\n\nboiler\n\nbeta"
    assert (out[1].n_paras, out[1].n_dropped) == (4, 1)
    # doc 2 loses 'boiler' (first seen in doc 1) but keeps gamma
    assert out[2].text_dedup == "gamma" and out[2].n_dropped == 1
    # doc 3 is ALL repeats -> present with empty text (left join keeps it)
    assert out[3].text_dedup == "" and (out[3].n_paras, out[3].n_dropped) == (1, 1)


def test_intra_doc_is_scan_side(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup_paragraphs(docs))
    assert "Exchange" not in plan and "Join" not in plan


def test_global_winner_agg_is_map_side_partial(spark):
    """The winner groupBy must do map-side partial aggregation (a
    boilerplate paragraph on 10^9 pages sends one candidate per input
    partition) and never rank inside a Window."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup_paragraphs_global(docs))
    assert "Window" not in plan
    assert "partial_min" in plan


def test_separator_is_literal_not_regex(spark):
    """Spark's split() takes a REGEX; the operators \\Q-quote the
    separator so a regex-special sep ('|') behaves literally — unquoted,
    '|' would split between every character."""
    df = spark.createDataFrame([(1, "a|b|a")], "doc_id bigint, text string")
    out = dedup_paragraphs(df, sep="|").collect()[0]
    assert out.text_dedup == "a|b" and (out.n_paras, out.n_dropped) == (3, 1)
    g = dedup_paragraphs_global(df, sep="|").collect()[0]
    assert g.text_dedup == "a|b" and (g.n_paras, g.n_dropped) == (3, 1)
