"""Count-Min sketch (operators/sketches.py cms_build / cms_estimate):
one-sided error guarantee, exactness at sparse width, forced-collision
overestimates, row-sum conservation. (KMV tests: test_lm_sketches.py.)"""

from pyspark.sql import functions as F

# --- count-min sketch ---------------------------------------------------------

def test_cms_never_underestimates_and_exact_when_sparse(spark):
    """CMS one-sided error: estimates >= exact always; with width far
    above vocabulary size collisions are unlikely and estimates are
    exact for most tokens."""
    import pandas as pd
    from collections import Counter

    from posextract_spark.operators.sketches import cms_build, cms_estimate

    rows = [
        (1, "a a a b b c"),
        (2, "a b d d d d"),
        (3, "e f g a"),
    ]
    exact = Counter(w for _, t in rows for w in t.split())
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )
    sketch = cms_build(docs, width=4096, depth=4)
    toks = spark.createDataFrame(pd.DataFrame({"token": list(exact)}))
    est = {r["token"]: r["n_est"] for r in cms_estimate(toks, sketch, width=4096, depth=4).collect()}
    for t, n in exact.items():
        assert est[t] >= n
    # 7 tokens in 4096 counters x4 rows: all exact with overwhelming odds
    assert est == dict(exact)
    # unseen token estimates 0 (all rows coalesce to empty counters) or
    # a collision value >= 0; with this width it is 0
    unseen = cms_estimate(
        spark.createDataFrame(pd.DataFrame({"token": ["zzz"]})), sketch, width=4096, depth=4
    ).collect()[0]
    assert unseen["n_est"] == 0


def test_cms_tight_width_overestimates_only(spark):
    """Force collisions (width 8) — estimates may exceed exact but never
    fall below, and the total per row is conserved."""
    import random
    from collections import Counter

    import pandas as pd

    from posextract_spark.operators.sketches import cms_build, cms_estimate

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(30)
    ]
    exact = Counter(w for _, t in rows for w in t.split())
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )
    sketch = cms_build(docs, width=8, depth=3)
    # row-sum conservation: every row's counters sum to total occurrences
    totals = {
        r["row"]: r["s"]
        for r in sketch.groupBy("row").agg(F.sum("c").alias("s")).collect()
    }
    assert totals == {0: 900, 1: 900, 2: 900}
    toks = spark.createDataFrame(pd.DataFrame({"token": list(exact)}))
    est = {r["token"]: r["n_est"] for r in cms_estimate(toks, sketch, width=8, depth=3).collect()}
    over = 0
    for t, n in exact.items():
        assert est[t] >= n
        over += est[t] - n
    assert over > 0  # width 8 << 40 tokens MUST collide somewhere


# --- corpus_length_quantiles (lives with the report-style ops) ----------------

def test_corpus_length_quantiles_nearest_rank(spark):
    import pandas as pd

    from posextract_spark.operators.textops import corpus_length_quantiles

    # lengths: 1,2,3,...,10 (one doc each) -> P50 = 5th value = 5,
    # P90 = 9, P99 = ceil(9.9) = 10th value = 10
    rows = [(i, " ".join(["w"] * i)) for i in range(1, 11)]
    out = corpus_length_quantiles(
        spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r == {
        "n_docs": 10, "n_tokens_total": 55, "min_len": 1, "max_len": 10,
        "p50_len": 5, "p90_len": 9, "p99_len": 10,
    }


def test_corpus_length_quantiles_duckdb_parity(spark):
    import random

    import duckdb
    import pandas as pd

    from posextract_spark.operators.textops import (
        corpus_length_quantiles,
        corpus_length_quantiles_sql,
    )

    rng = random.Random(11)
    rows = [(i, " ".join(["t"] * rng.randint(0, 60))) for i in range(200)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = corpus_length_quantiles(spark.createDataFrame(pdf)).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        "WITH _d AS (SELECT 1)" + corpus_length_quantiles_sql("documents")
    ).df().astype(got.dtypes.to_dict())
    con.close()
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1),
        check_dtype=True,
    )


def test_hdr_small_values_are_exact(spark):
    from posextract_spark.operators.sketches import hdr_quantiles

    df = spark.createDataFrame([(i,) for i in range(1, 51)], "v long")
    out = {r.q_e6: r.est_value for r in hdr_quantiles(df, "v").collect()}
    # values < 2^(p+1)=64 are slot-exact -> quantiles are exact
    assert out == {500000: 25, 900000: 45, 990000: 50}


def test_hdr_relative_error_bound_on_wide_range(spark):
    import hashlib

    from posextract_spark.operators.sketches import hdr_quantiles

    vals = [
        1 + int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
        for i in range(3000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.q_e6: r.est_value for r in hdr_quantiles(df, "v").collect()}
    svals = sorted(vals)
    for q_e6, est in got.items():
        rank = max((q_e6 * len(vals) + 999999) // 1000000, 1)
        exact = svals[rank - 1]
        assert est <= exact < est * (1 + 2 ** -5) + 1, (q_e6, est, exact)


def test_hdr_histogram_merges_by_sum(spark):
    from posextract_spark.operators.sketches import hdr_histogram

    a = spark.createDataFrame([(v,) for v in (3, 70, 700, 700000)], "v long")
    b = spark.createDataFrame([(v,) for v in (3, 71, 800, 700001)], "v long")
    union = hdr_histogram(a.unionAll(b), "v")
    merged = (
        hdr_histogram(a, "v").unionAll(hdr_histogram(b, "v"))
        .groupBy("slot").sum("n")
    )
    got_u = {(r.slot, r.n) for r in union.collect()}
    got_m = {(r[0], r[1]) for r in merged.collect()}
    assert got_u == got_m
