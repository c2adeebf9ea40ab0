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
