"""Knowledge fusion (operators/fusion.py): handcrafted semantics cases +
pure-Python brute mirrors + DuckDB-mirror parity on random triple stores."""

import random

import duckdb
import pandas as pd
import pytest

from posextract_spark.operators import fusion as fu


def _duck(pdf: pd.DataFrame, sql_suffix: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("triples", pdf)
    out = con.execute("WITH triples_base AS (SELECT * FROM triples)" + sql_suffix).df()
    con.close()
    return out


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_match(sdf, pdf_expected: pd.DataFrame):
    got = _norm(sdf.toPandas())
    want = _norm(pdf_expected)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


# --- pure-Python mirrors -----------------------------------------------------


def brute_relation_stats(rows):
    """rows: iterable of (src, predicate, dst)."""
    from collections import Counter, defaultdict

    obs = Counter(rows)
    by_pred = defaultdict(list)
    for (s, p, d), n in obs.items():
        by_pred[p].append((s, d, n))
    out = {}
    for p, edges in by_pred.items():
        n_edges = len(edges)
        n_obs = sum(n for _, _, n in edges)
        n_src = len({s for s, _, _ in edges})
        n_dst = len({d for _, d, _ in edges})
        out[p] = (
            n_obs,
            n_edges,
            n_src,
            n_dst,
            n_src * 1_000_000 // n_edges,
            n_dst * 1_000_000 // n_edges,
        )
    return out


def brute_fuse(rows, min_functionality_e6, min_confidence_e6=0):
    from collections import Counter, defaultdict

    stats = brute_relation_stats(rows)
    functional = {p for p, st in stats.items() if st[4] >= min_functionality_e6}
    obs = Counter(rows)
    groups = defaultdict(dict)
    for (s, p, d), n in obs.items():
        if p in functional:
            groups[(s, p)][d] = n
    out = []
    for (s, p), dsts in groups.items():
        total = sum(dsts.values())
        # max support, ties -> min dst
        d, support = min(dsts.items(), key=lambda kv: (-kv[1], kv[0]))
        conf = support * 1_000_000 // total
        if conf >= min_confidence_e6:
            out.append((s, p, d, support, total, conf))
    return sorted(out)


# --- semantics on a handcrafted store ----------------------------------------

STORE = [
    # born_in: functional (every subject has a clear majority object)
    ("ada", "born_in", "london"),
    ("ada", "born_in", "london"),
    ("ada", "born_in", "london"),
    ("ada", "born_in", "paris"),  # noise capture, outvoted 3:1
    ("bob", "born_in", "oslo"),
    # tied support -> minimum object wins deterministically
    ("cal", "born_in", "zurich"),
    ("cal", "born_in", "bern"),
    # visited: many-valued, must be EXCLUDED by the functionality gate
    ("ada", "visited", "rome"),
    ("ada", "visited", "kyiv"),
    ("ada", "visited", "lima"),
    ("bob", "visited", "rome"),
    ("bob", "visited", "cairo"),
]


def _store_df(spark):
    return spark.createDataFrame(STORE, ["src", "predicate", "dst"])


def test_relation_stats_handcrafted(spark):
    got = {
        r["predicate"]: (
            r["n_obs"],
            r["n_edges"],
            r["n_src"],
            r["n_dst"],
            r["functionality_e6"],
            r["inv_functionality_e6"],
        )
        for r in fu.relation_stats(_store_df(spark)).collect()
    }
    assert got == brute_relation_stats(STORE)
    # born_in: 5 edges over 3 subjects; visited: 5 edges over 2 subjects
    assert got["born_in"][4] == 600_000
    assert got["visited"][4] == 400_000


def test_fuse_majority_tiebreak_and_gate(spark):
    out = fu.fuse_functional_relations(_store_df(spark), min_functionality_e6=500_000)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == brute_fuse(STORE, 500_000)
    by_src = {r[0]: r for r in rows}
    # majority wins over the noise capture
    assert by_src["ada"][2:] == ("london", 3, 4, 750_000)
    # tie broken by minimum object
    assert by_src["cal"][2] == "bern"
    # non-functional predicate never fused
    assert all(r[1] == "born_in" for r in rows)


def test_fuse_confidence_floor(spark):
    out = fu.fuse_functional_relations(
        _store_df(spark), min_functionality_e6=500_000, min_confidence_e6=600_000
    )
    rows = sorted(tuple(r) for r in out.collect())
    # cal's 50% tie and... bob is 100%; ada is 75% -> both stay, cal drops
    assert [r[0] for r in rows] == ["ada", "bob"]
    assert rows == brute_fuse(STORE, 500_000, 600_000)


# --- random parity: Spark == Python == DuckDB mirror --------------------------


def _random_store(seed: int):
    rng = random.Random(seed)
    subs = [f"s{i}" for i in range(rng.randint(2, 8))]
    preds = [f"p{i}" for i in range(rng.randint(1, 4))]
    objs = [f"o{i}" for i in range(rng.randint(2, 6))]
    return [
        (rng.choice(subs), rng.choice(preds), rng.choice(objs))
        for _ in range(rng.randint(5, 120))
    ]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_fusion_random_parity_spark_python_duckdb(spark, seed):
    rows = _random_store(seed)
    pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
    sdf = spark.createDataFrame(pdf)
    thr = random.Random(seed * 7).choice([0, 300_000, 600_000, 1_000_000])

    stats = fu.relation_stats(sdf)
    _assert_match(stats, _duck(pdf, fu.relation_stats_sql("triples_base")))

    fused = fu.fuse_functional_relations(sdf, min_functionality_e6=thr)
    duck = _duck(pdf, fu.fuse_functional_sql("triples_base", thr))
    _assert_match(fused, duck)
    got = sorted(tuple(r) for r in fused.collect())
    assert got == brute_fuse(rows, thr)
