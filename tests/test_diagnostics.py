"""Key-skew diagnostic (operators/diagnostics.key_skew_report)."""

from posextract_spark.operators.diagnostics import key_skew_report


def test_key_skew_report_exact_on_crafted_skew(spark):
    rows = [(i, "hot") for i in range(60)] + [(100 + i, f"cold{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    out = sorted(key_skew_report(df, "k", top_n=3).collect(), key=lambda r: r.rank)
    assert [(r.rank, r.key, r.n_rows) for r in out] == [
        (1, "hot", 60), (2, "cold0", 1), (3, "cold1", 1),
    ]
    assert out[0].pct_e6 == 600000  # 60/100
    assert out[2].cum_pct_e6 == 620000  # (60+1+1)/100


def test_key_skew_report_stringifies_and_orders_numeric_keys(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 2), (4, 2), (5, 9)], "id bigint, k int"
    )
    out = sorted(key_skew_report(df, "k", top_n=5).collect(), key=lambda r: r.rank)
    # count desc; ties broken by STRING order ('10' < '2' < '9')
    assert [r.key for r in out] == ["10", "2", "9"]
    assert out[-1].cum_pct_e6 == 1000000


def test_corpus_datacard_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s0"),
            (2, "a b c", "en", "s1"),   # exact dup of 1
            (3, "d e", "de", "s0"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    from posextract_spark.operators.diagnostics import corpus_datacard

    got = {r.metric: r.value for r in corpus_datacard(docs).collect()}
    assert got == {
        "n_docs": 3, "n_tokens": 8, "n_chars": 13,
        "n_langs": 2, "n_sources": 2, "n_exact_dup_docs": 1,
    }


def test_corpus_datacard_contamination_counts_hit_docs(spark):
    from pyspark.sql import functions as F

    from posextract_spark.operators.diagnostics import corpus_datacard

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    got = {r.metric: r.value for r in corpus_datacard(docs, ev).collect()}
    from posextract_spark.operators.mldata import decontaminate

    assert got["n_contaminated_docs"] == decontaminate(docs, ev).count()
    assert got["n_docs"] == docs.count()
