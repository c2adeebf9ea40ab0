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
