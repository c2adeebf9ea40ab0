"""Graph analytics (operators/graph_analytics.py): brute-force Python
mirrors + DuckDB-oracle parity + adversarial shapes (hub star, clique,
string node ids, parallel/reverse/self edges)."""

import itertools
import random

import duckdb
import pandas as pd
import pytest

from posextract_spark.operators import graph_analytics as ga


def _duck(pdf: pd.DataFrame, sql_suffix: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("edges", pdf)
    out = con.execute("WITH edges_base AS (SELECT * FROM edges)" + sql_suffix).df()
    con.close()
    return out


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_frame_match(sdf, pdf_expected: pd.DataFrame):
    got = _norm(sdf.toPandas())
    want = _norm(pdf_expected)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


# --- pure-Python mirrors -----------------------------------------------------


def brute_triangles(edges):
    """edges: iterable of (a, b). Returns {node: (degree, n_triangles)}."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for v, w, x in itertools.combinations(sorted(adj), 3):
        if w in adj[v] and x in adj[v] and x in adj[w]:
            tri[v] += 1
            tri[w] += 1
            tri[x] += 1
    return {v: (len(adj[v]), tri[v]) for v in adj}


def brute_pagerank(edges, n_iters=3, damping_e6=850_000):
    """Integer fixed-point mirror of ga.pagerank (same floor arithmetic)."""
    e = {(a, b) for a, b in edges if a != b}
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    if not nodes:
        return {}
    n = len(nodes)
    outd = {}
    for a, _ in e:
        outd[a] = outd.get(a, 0) + 1
    init = ga.PR_SCALE // n
    teleport = ((1_000_000 - damping_e6) * ga.PR_SCALE) // (1_000_000 * n)
    r = {v: init for v in nodes}
    for _ in range(n_iters):
        inflow = {v: 0 for v in nodes}
        for a, b in e:
            inflow[b] += (r[a] * damping_e6) // (1_000_000 * outd[a])
        r = {v: teleport + inflow[v] for v in nodes}
    return r


# --- fixtures ----------------------------------------------------------------

TRIANGLE_PLUS_TAIL = [  # K3 on 1,2,3 plus a tail and noise
    (1, 2), (2, 3), (3, 1),
    (3, 4),
    (2, 1),  # reverse duplicate
    (4, 4),  # self loop
    (1, 2),  # parallel duplicate
]


def test_degree_stats_exact(spark):
    e = spark.createDataFrame(pd.DataFrame(TRIANGLE_PLUS_TAIL, columns=["src", "dst"]))
    got = {r["node"]: r.asDict() for r in ga.degree_stats(e).collect()}
    # node 1: out->2 (x2), in<-3, in<-2
    assert got[1]["out_degree"] == 1 and got[1]["in_degree"] == 2
    assert got[1]["out_weight"] == 2 and got[1]["in_weight"] == 2
    # node 4: self loop counts both directions on itself + in from 3
    assert got[4]["out_degree"] == 1 and got[4]["in_degree"] == 2
    # weighted variant sums the weight column instead of row counts
    we = spark.createDataFrame(pd.DataFrame([(1, 2, 10), (3, 1, 5)], columns=["src", "dst", "w"]))
    wg = {r["node"]: r.asDict() for r in ga.degree_stats(we, weight="w").collect()}
    assert wg[1]["out_weight"] == 10 and wg[1]["in_weight"] == 5
    assert wg[2]["in_weight"] == 10 and wg[2]["out_weight"] == 0


def test_triangles_known_graph(spark):
    e = spark.createDataFrame(pd.DataFrame(TRIANGLE_PLUS_TAIL, columns=["src", "dst"]))
    got = {r["node"]: r.asDict() for r in ga.triangle_counts(e).collect()}
    want = brute_triangles(TRIANGLE_PLUS_TAIL)
    assert set(got) == set(want)
    for v, (deg, tri) in want.items():
        assert got[v]["degree"] == deg, v
        assert got[v]["n_triangles"] == tri, v
    # clustering: node 3 has degree 3, 1 triangle -> floor(2e6*1/6)
    assert got[3]["clustering_e6"] == 2_000_000 // 6
    assert got[4]["clustering_e6"] == 0  # degree 1


def test_triangles_clique_and_star(spark):
    # K5 clique: every node in C(4,2)=6 triangles, clustering 1.0
    clique = list(itertools.combinations(range(5), 2))
    # star hub 100 with 20 leaves: zero triangles everywhere
    star = [(100, 200 + i) for i in range(20)]
    e = spark.createDataFrame(pd.DataFrame(clique + star, columns=["src", "dst"]))
    got = {r["node"]: r.asDict() for r in ga.triangle_counts(e).collect()}
    for v in range(5):
        assert got[v]["n_triangles"] == 6
        assert got[v]["clustering_e6"] == 1_000_000
    assert got[100]["n_triangles"] == 0 and got[100]["degree"] == 20
    assert got[200]["clustering_e6"] == 0


def test_triangles_string_nodes(spark):
    # entity-surface node ids: ordering ties broken by string compare
    edges = [("acme", "zorin"), ("zorin", "bolt"), ("bolt", "acme"), ("acme", "hooli")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: r["n_triangles"] for r in ga.triangle_counts(e).collect()}
    assert got == {"acme": 1, "zorin": 1, "bolt": 1, "hooli": 0}


def test_pagerank_uniform_on_cycle(spark):
    # directed 4-cycle: perfectly symmetric -> every rank identical, mass
    # conserved exactly (out_deg=1 everywhere, no dangling)
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    e = spark.createDataFrame(pd.DataFrame(cyc, columns=["src", "dst"]))
    rows = ga.pagerank(e, n_iters=4).collect()
    vals = {r["rank_e12"] for r in rows}
    assert len(vals) == 1
    want = brute_pagerank(cyc, n_iters=4)
    assert {r["node"]: r["rank_e12"] for r in rows} == want


def test_pagerank_hub_matches_mirror(spark):
    # all leaves point at a hub; hub points at one leaf — skewed in-degree
    edges = [(i, 999) for i in range(1, 30)] + [(999, 1)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: r["rank_e12"] for r in ga.pagerank(e, n_iters=3).collect()}
    want = brute_pagerank(edges, n_iters=3)
    assert got == want
    assert got[999] == max(got.values())  # the hub dominates


@pytest.mark.parametrize("seed", [11, 23])
def test_random_graph_parity_spark_python_duckdb(spark, seed):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 25), rng.randrange(0, 25)) for _ in range(90)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    e = spark.createDataFrame(pdf)

    tri = ga.triangle_counts(e)
    want_tri = brute_triangles(edges)
    got_tri = {r["node"]: (r["degree"], r["n_triangles"]) for r in tri.collect()}
    assert got_tri == want_tri
    _assert_frame_match(tri, _duck(pdf, ga.triangle_counts_sql("edges_base")))

    pr = ga.pagerank(e, n_iters=3)
    assert {r["node"]: r["rank_e12"] for r in pr.collect()} == brute_pagerank(edges)
    _assert_frame_match(pr, _duck(pdf, ga.pagerank_sql("edges_base", n_iters=3)))

    _assert_frame_match(ga.degree_stats(e), _duck(pdf, ga.degree_stats_sql("edges_base")))


def test_pagerank_empty_and_selfloop_only(spark):
    e = spark.createDataFrame(pd.DataFrame([(7, 7)], columns=["src", "dst"]))
    assert ga.pagerank(e).count() == 0
    assert ga.triangle_counts(e).count() == 0


# --- k-core ------------------------------------------------------------------


def brute_kcore(edges, k):
    """Peel-to-fixpoint mirror over the undirected simple graph.

    Returns {node: core_degree} for the surviving k-core."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        doomed = {v for v, ns in adj.items() if len(ns) < k}
        if not doomed:
            break
        for v in doomed:
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]
    return {v: len(ns) for v, ns in adj.items()}


def test_kcore_clique_with_tails(spark):
    # K4 core survives k=2/k=3; the pendant chain 3-10-11-12 peels entirely
    clique = list(itertools.combinations(range(4), 2))
    chain = [(3, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(pd.DataFrame(clique + chain, columns=["src", "dst"]))
    got2 = {r["node"]: r["core_degree"] for r in ga.kcore(e, k=2).collect()}
    assert got2 == {0: 3, 1: 3, 2: 3, 3: 3}
    got3 = {r["node"]: r["core_degree"] for r in ga.kcore(e, k=3).collect()}
    assert got3 == {0: 3, 1: 3, 2: 3, 3: 3}
    assert ga.kcore(e, k=4).count() == 0  # K4 has max degree 3


def test_kcore_cycle_is_its_own_2core(spark):
    # a cycle never peels at k=2 (every node keeps degree exactly 2)
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    e = spark.createDataFrame(pd.DataFrame(cyc, columns=["src", "dst"]))
    got = {r["node"]: r["core_degree"] for r in ga.kcore(e, k=2).collect()}
    assert got == {i: 2 for i in range(6)}
    assert ga.kcore(e, k=3).count() == 0


def test_kcore_deep_peel_cascade(spark):
    # pendant path into a triangle: peel depth == path length, so the
    # loop must iterate (not converge in 1 round); mirrors must agree
    path = [(i, i + 1) for i in range(4)]  # 0-1-2-3-4
    tri = [(4, 11), (11, 12), (12, 4)]
    edges = path + tri
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    core = ga.kcore(e, k=2)
    got = {r["node"]: r["core_degree"] for r in core.collect()}
    assert got == brute_kcore(edges, 2) == {4: 2, 11: 2, 12: 2}
    # SQL mirror needs rounds >= peel depth (4 here)
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    _assert_frame_match(core, _duck(pdf, ga.kcore_sql("edges_base", k=2, rounds=4)))


@pytest.mark.parametrize("seed,k", [(11, 2), (23, 3)])
def test_kcore_random_parity_spark_python_duckdb(spark, seed, k):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 25), rng.randrange(0, 25)) for _ in range(70)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    e = spark.createDataFrame(pdf)
    core = ga.kcore(e, k=k)
    assert {r["node"]: r["core_degree"] for r in core.collect()} == brute_kcore(edges, k)
    _assert_frame_match(core, _duck(pdf, ga.kcore_sql("edges_base", k=k, rounds=8)))


def test_kcore_string_nodes_and_degenerate(spark):
    edges = [("acme", "bolt"), ("bolt", "core"), ("core", "acme"), ("acme", "dud")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: r["core_degree"] for r in ga.kcore(e, k=2).collect()}
    assert got == {"acme": 2, "bolt": 2, "core": 2}
    # self-loop-only graph has an empty simple graph -> empty core
    solo = spark.createDataFrame(pd.DataFrame([(7, 7)], columns=["src", "dst"]))
    assert ga.kcore(solo, k=1).count() == 0
    with pytest.raises(ValueError):
        ga.kcore(e, k=0)


# --- neighbor Jaccard --------------------------------------------------------


def brute_neighbor_jaccard(edges, min_common=1, min_jaccard_e6=0, cap=None):
    """{(a, b): (common, da, db, jaccard_e6)} over the simple graph."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        shared = adj[a] & adj[b]
        if cap is not None:
            shared = {n for n in shared if len(adj[n]) <= cap}
        common = len(shared)
        if common < min_common:
            continue
        da, db = len(adj[a]), len(adj[b])
        j = 1_000_000 * common // (da + db - common)
        if j >= min_jaccard_e6:
            out[(a, b)] = (common, da, db, j)
    return out


def _nj_dict(df):
    return {
        (r["a"], r["b"]): (r["common"], r["degree_a"], r["degree_b"], r["jaccard_e6"])
        for r in df.collect()
    }


def test_neighbor_jaccard_twins_and_stranger(spark):
    # x and y both link to {h1, h2, h3} (structural twins, jaccard=1.0
    # since x,y not adjacent); z links only to h1
    edges = [("x", "h1"), ("x", "h2"), ("x", "h3"),
             ("y", "h1"), ("y", "h2"), ("y", "h3"),
             ("z", "h1")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _nj_dict(ga.neighbor_jaccard(e))
    assert got == brute_neighbor_jaccard(edges)
    assert got[("x", "y")] == (3, 3, 3, 1_000_000)
    # z shares h1 with x: common=1, dz=1, dx=3 -> 1/3
    assert got[("x", "z")] == (1, 3, 1, 333_333)


def test_neighbor_jaccard_adjacent_pair_counts_neighbors_not_edge(spark):
    # triangle a-b-c: a,b share ONLY c (the a-b edge itself is not a
    # shared neighbor); jaccard = 1/(2+2-1) = 1/3
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _nj_dict(ga.neighbor_jaccard(e))
    assert got == brute_neighbor_jaccard(edges)
    assert got[("a", "b")] == (1, 2, 2, 333_333)


def test_neighbor_jaccard_hub_cap_drops_stopword_neighbor(spark):
    # h is a degree-4 hub shared by everyone; u,v ALSO share the quiet
    # node q. With cap=3 the hub wedge is dropped: u,v keep common=1
    # (via q, degrees stay full), pairs sharing ONLY h disappear.
    edges = [("u", "h"), ("v", "h"), ("w", "h"), ("t", "h"),
             ("u", "q"), ("v", "q")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    uncapped = _nj_dict(ga.neighbor_jaccard(e))
    assert uncapped == brute_neighbor_jaccard(edges)
    assert uncapped[("u", "v")] == (2, 2, 2, 1_000_000)
    capped = _nj_dict(ga.neighbor_jaccard(e, max_neighbor_degree=3))
    assert capped == brute_neighbor_jaccard(edges, cap=3)
    assert capped[("u", "v")] == (1, 2, 2, 333_333)  # lower bound, full degrees
    assert ("t", "w") not in capped  # pair shared ONLY the hot hub


@pytest.mark.parametrize("seed,cap", [(5, None), (17, 3)])
def test_neighbor_jaccard_random_parity_spark_python_duckdb(spark, seed, cap):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 18), rng.randrange(0, 18)) for _ in range(50)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    e = spark.createDataFrame(pdf)
    nj = ga.neighbor_jaccard(e, min_common=1, max_neighbor_degree=cap)
    assert _nj_dict(nj) == brute_neighbor_jaccard(edges, cap=cap)
    _assert_frame_match(
        nj, _duck(pdf, ga.neighbor_jaccard_sql("edges_base", max_neighbor_degree=cap))
    )


def test_neighbor_jaccard_thresholds_and_degenerate(spark):
    edges = [("x", "h1"), ("x", "h2"), ("x", "h3"),
             ("y", "h1"), ("y", "h2"), ("y", "h3"),
             ("z", "h1")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    strict = _nj_dict(ga.neighbor_jaccard(e, min_common=2))
    assert set(strict) == {("x", "y"), ("h1", "h2"), ("h1", "h3"), ("h2", "h3")}
    high = _nj_dict(ga.neighbor_jaccard(e, min_jaccard_e6=900_000))
    assert set(high) == {("x", "y"), ("h2", "h3")}  # h2,h3 share exactly {x,y}
    solo = spark.createDataFrame(pd.DataFrame([(7, 7)], columns=["src", "dst"]))
    assert ga.neighbor_jaccard(solo).count() == 0


# --- label propagation -------------------------------------------------------


def brute_lpa(edges, n_iters):
    """Synchronous min-tie label propagation (exact operator semantics)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(n_iters):
        new = {}
        for v, ns in adj.items():
            cnt = {}
            for n in ns:
                cnt[labels[n]] = cnt.get(labels[n], 0) + 1
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    return labels


def _lpa_dict(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_label_propagation_barbell_two_communities(spark):
    # two K4s joined by one bridge: sync LPA splits them at the bridge
    cliqueA = list(itertools.combinations([0, 1, 2, 3], 2))
    cliqueB = list(itertools.combinations([10, 11, 12, 13], 2))
    edges = cliqueA + cliqueB + [(3, 10)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _lpa_dict(ga.label_propagation(e, n_iters=4))
    assert got == brute_lpa(edges, 4)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 13: 10}


def test_label_propagation_star_oscillates_deterministically(spark):
    # sync LPA 2-cycles on a star (hub and leaves swap label families);
    # fixed n_iters makes each phase exact and mirrorable — this test
    # PINS the oscillation (a convergence loop would never terminate)
    edges = [(0, 1), (0, 2), (0, 3)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    odd = _lpa_dict(ga.label_propagation(e, n_iters=3))
    even = _lpa_dict(ga.label_propagation(e, n_iters=4))
    assert odd == {0: 1, 1: 0, 2: 0, 3: 0} == brute_lpa(edges, 3)
    assert even == {0: 0, 1: 1, 2: 1, 3: 1} == brute_lpa(edges, 4)


@pytest.mark.parametrize("seed,iters", [(7, 3), (31, 5)])
def test_label_propagation_random_parity_spark_python_duckdb(spark, seed, iters):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 20), rng.randrange(0, 20)) for _ in range(55)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    e = spark.createDataFrame(pdf)
    lp = ga.label_propagation(e, n_iters=iters)
    assert _lpa_dict(lp) == brute_lpa(edges, iters)
    _assert_frame_match(lp, _duck(pdf, ga.label_propagation_sql("edges_base", n_iters=iters)))


def test_label_propagation_string_nodes_min_tie(spark):
    # path x-y-z: every neighbor multiset is distinct labels only, so
    # every round is pure min-tie-break over strings
    edges = [("x", "y"), ("y", "z")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _lpa_dict(ga.label_propagation(e, n_iters=2))
    assert got == brute_lpa(edges, 2)
    solo = spark.createDataFrame(pd.DataFrame([(7, 7)], columns=["src", "dst"]))
    assert ga.label_propagation(solo, n_iters=2).count() == 0


# --- weighted pagerank -------------------------------------------------------


def brute_pagerank_weighted(edges_w, n_iters=3, damping_e6=850_000):
    """Integer mirror of ga.pagerank_weighted (same two-step floor order).

    edges_w: iterable of (src, dst, w) — parallel rows summed."""
    agg = {}
    for a, b, w in edges_w:
        if a == b:
            continue
        agg[(a, b)] = agg.get((a, b), 0) + w
    nodes = sorted({a for a, _ in agg} | {b for _, b in agg})
    if not nodes:
        return {}
    n = len(nodes)
    outw = {}
    for (a, _), w in agg.items():
        outw[a] = outw.get(a, 0) + w
    init = ga.PR_SCALE // n
    teleport = ((1_000_000 - damping_e6) * ga.PR_SCALE) // (1_000_000 * n)
    r = {v: init for v in nodes}
    for _ in range(n_iters):
        inflow = {v: 0 for v in nodes}
        for (a, b), w in agg.items():
            inflow[b] += ((r[a] * damping_e6) // 1_000_000) * w // outw[a]
        r = {v: teleport + inflow[v] for v in nodes}
    return r


def test_pagerank_weighted_skew_dominates(spark):
    # two structurally identical sinks; 9x heavier in-weight must rank higher
    edges = [(0, 1, 9), (0, 2, 1), (3, 1, 9), (3, 2, 1), (1, 0, 1), (2, 0, 1)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst", "weight"]))
    got = {r["node"]: r["rank_e12"] for r in ga.pagerank_weighted(e, n_iters=3).collect()}
    assert got == brute_pagerank_weighted(edges)
    assert got[1] > got[2]


def test_pagerank_weighted_parallel_rows_sum(spark):
    # duplicate (src,dst) rows aggregate before ranking: 3x(0->1,w=3) == 0->1,w=9
    dup = [(0, 1, 3), (0, 1, 3), (0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    one = [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    e_dup = spark.createDataFrame(pd.DataFrame(dup, columns=["src", "dst", "weight"]))
    e_one = spark.createDataFrame(pd.DataFrame(one, columns=["src", "dst", "weight"]))
    got_dup = {r["node"]: r["rank_e12"] for r in ga.pagerank_weighted(e_dup).collect()}
    got_one = {r["node"]: r["rank_e12"] for r in ga.pagerank_weighted(e_one).collect()}
    assert got_dup == got_one == brute_pagerank_weighted(dup)


@pytest.mark.parametrize("seed", [13, 29])
def test_pagerank_weighted_random_parity_spark_python_duckdb(spark, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(0, 15), rng.randrange(0, 15), rng.randrange(1, 50))
        for _ in range(60)
    ]
    pdf = pd.DataFrame(edges, columns=["src", "dst", "weight"])
    e = spark.createDataFrame(pdf)
    pr = ga.pagerank_weighted(e, n_iters=3)
    assert {r["node"]: r["rank_e12"] for r in pr.collect()} == brute_pagerank_weighted(edges)
    _assert_frame_match(pr, _duck(pdf, ga.pagerank_weighted_sql("edges_base", n_iters=3)))


def test_pagerank_weighted_selfloop_only_empty(spark):
    e = spark.createDataFrame(pd.DataFrame([(7, 7, 5)], columns=["src", "dst", "weight"]))
    assert ga.pagerank_weighted(e).count() == 0


# --- k-hop BFS ---------------------------------------------------------------


def brute_khop(edges, seeds, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for i in range(1, k + 1):
        nxt = set()
        for v in frontier:
            for n in adj.get(v, ()):
                if n not in dist:
                    nxt.add(n)
        for n in nxt:
            dist[n] = i
        frontier = nxt
        if not frontier:
            break
    return dist


def _khop_dict(df):
    return {r["node"]: r["hop"] for r in df.collect()}


def _seeds_df(spark, vals, typ="bigint"):
    return spark.createDataFrame([(v,) for v in vals], f"node {typ}")


def test_khop_chain_layers(spark):
    # path 0-1-2-3-4-5, seed {0}: hop == index, cut at k
    edges = [(i, i + 1) for i in range(5)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _khop_dict(ga.khop_nodes(e, _seeds_df(spark, [0]), k=3))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3} == brute_khop(edges, [0], 3)


def test_khop_min_distance_multi_seed_and_offgraph(spark):
    # two seeds meet in the middle: hop = min over seeds; a seed absent
    # from the graph stays at hop 0; disconnected node never appears
    edges = [(i, i + 1) for i in range(5)] + [(100, 101)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _khop_dict(ga.khop_nodes(e, _seeds_df(spark, [0, 4, 777]), k=2))
    want = brute_khop(edges, [0, 4], 2)
    want[777] = 0
    assert got == want
    assert got[2] == 2 and got[3] == 1
    assert 100 not in got


def test_khop_early_exit_on_drained_frontier(spark):
    # triangle fully visited at hop 1; k=5 must not loop or re-add nodes
    edges = [(1, 2), (2, 3), (3, 1)]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _khop_dict(ga.khop_nodes(e, _seeds_df(spark, [1]), k=5))
    assert got == {1: 0, 2: 1, 3: 1}


@pytest.mark.parametrize("seed,k", [(3, 2), (19, 3)])
def test_khop_random_parity_spark_python_duckdb(spark, seed, k):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(45)]
    seeds = [0, 7]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    e = spark.createDataFrame(pdf)
    kh = ga.khop_nodes(e, _seeds_df(spark, seeds), k=k)
    want = brute_khop(edges, [s for s in seeds], k)
    for s in seeds:
        want.setdefault(s, 0)
    assert _khop_dict(kh) == want
    _assert_frame_match(
        kh, _duck(pdf, ga.khop_sql("edges_base", "SELECT 0 AS node UNION ALL SELECT 7", k=k))
    )


def test_khop_string_nodes(spark):
    edges = [("acme", "bolt"), ("bolt", "core"), ("core", "dud")]
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = _khop_dict(ga.khop_nodes(e, _seeds_df(spark, ["acme"], typ="string"), k=2))
    assert got == {"acme": 0, "bolt": 1, "core": 2}


# --- hypothesis sweeps over arbitrary graph shapes ---------------------------
# (same low-example Spark-property pattern as
# test_properties.test_cc_star_equals_label_propagation)

from hypothesis import given, settings
from hypothesis import strategies as st

_EDGES = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=35
)


@settings(max_examples=8, deadline=None)
@given(_EDGES)
def test_graph_family_matches_brute_on_any_shape(spark, edge_list):
    """On ANY hypothesis graph (self-loops, multi-components, stars,
    cycles, duplicates), the iterative Spark operators equal their pure
    peel/BFS/propagation mirrors — convergence, tie-breaks, and caps
    included."""
    e = spark.createDataFrame(edge_list, "src long, dst long")
    assert {
        r["node"]: r["core_degree"] for r in ga.kcore(e, k=2).collect()
    } == brute_kcore(edge_list, 2)
    assert _lpa_dict(ga.label_propagation(e, n_iters=3)) == brute_lpa(edge_list, 3)
    assert _nj_dict(ga.neighbor_jaccard(e, max_neighbor_degree=4)) == (
        brute_neighbor_jaccard(edge_list, cap=4)
    )
    got_kh = _khop_dict(ga.khop_nodes(e, _seeds_df(spark, [0]), k=2))
    want_kh = brute_khop(edge_list, [0], 2)
    want_kh.setdefault(0, 0)  # off-graph seed stays at hop 0
    assert got_kh == want_kh


_WEDGES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12), st.integers(1, 9)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None)
@given(_WEDGES)
def test_pagerank_weighted_matches_brute_on_any_shape(spark, edges_w):
    e = spark.createDataFrame(edges_w, "src long, dst long, weight long")
    got = {r["node"]: r["rank_e12"] for r in ga.pagerank_weighted(e, n_iters=2).collect()}
    assert got == brute_pagerank_weighted(edges_w, n_iters=2)


def test_kcore_raises_when_peel_depth_exceeds_max_iter(spark):
    # a 12-node path needs ~6 peel rounds to empty at k=2; max_iter=2
    # leaves a partial peel whose interior nodes still look like core
    # members — the operator must refuse to return that silently
    path = [(i, i + 1) for i in range(11)]
    e = spark.createDataFrame(pd.DataFrame(path, columns=["src", "dst"]))
    with pytest.raises(RuntimeError, match="max_iter"):
        ga.kcore(e, k=2, max_iter=2)
    # with enough rounds the same graph converges to the empty 2-core
    assert ga.kcore(e, k=2, max_iter=10).count() == 0


# ---- relation_metapaths ------------------------------------------------

MP_EDGES = [
    # a -buys-> m -owns-> c  and  a -buys-> m -owns-> d  (one mid, two objects)
    ("a", "buys", "m"),
    ("m", "owns", "c"),
    ("m", "owns", "d"),
    # backtracking path x -p-> y -q-> x must NOT count
    ("x", "p", "y"),
    ("y", "q", "x"),
    # duplicate edge row: instances are counted over DISTINCT (s,p,o)
    ("a", "buys", "m"),
    # second (buys, owns) support via a different mid
    ("b", "buys", "n"),
    ("n", "owns", "c"),
]


def _mp_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "predicate", "dst"])
    )


def test_relation_metapaths_counts_and_backtracking(spark):
    got = {
        (r["pred_a"], r["pred_b"]): (r["n_paths"], r["n_pairs"])
        for r in ga.relation_metapaths(_mp_df(spark, MP_EDGES)).collect()
    }
    # (buys, owns): a-m-c, a-m-d, b-n-c = 3 paths over 3 distinct pairs;
    # (p, q) / (q, p) are pure backtracking -> absent
    assert got == {("buys", "owns"): (3, 3)}


def test_relation_metapaths_npairs_lt_npaths_on_parallel_mids(spark):
    rows = [
        ("a", "buys", "m1"),
        ("a", "buys", "m2"),
        ("m1", "owns", "c"),
        ("m2", "owns", "c"),
    ]
    [r] = ga.relation_metapaths(_mp_df(spark, rows)).collect()
    assert (r["n_paths"], r["n_pairs"]) == (2, 1)  # two mids, one (a, c) pair


def test_relation_metapaths_fanout_cap_drops_hub_mid(spark):
    hub = [("s%d" % i, "in", "hub") for i in range(3)] + [
        ("hub", "out", "o%d" % i) for i in range(3)
    ]
    quiet = [("q1", "in", "m"), ("m", "out", "q2")]
    df = _mp_df(spark, hub + quiet)
    uncapped = {
        (r["pred_a"], r["pred_b"]): r["n_paths"]
        for r in ga.relation_metapaths(df).collect()
    }
    assert uncapped == {("in", "out"): 10}  # 3*3 through hub + 1 through m
    capped = {
        (r["pred_a"], r["pred_b"]): r["n_paths"]
        for r in ga.relation_metapaths(df, max_mid_fanout=4).collect()
    }
    assert capped == {("in", "out"): 1}  # hub fanout 9 > 4 -> only m survives


def test_relation_metapaths_matches_duckdb_mirror_on_random_graphs(spark):
    rng = random.Random(7)
    preds = ["p", "q", "r"]
    for trial in range(3):
        rows = [
            (
                "n%d" % rng.randrange(8),
                rng.choice(preds),
                "n%d" % rng.randrange(8),
            )
            for _ in range(40)
        ]
        pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
        cap = rng.choice([None, 3])
        want = _duck(
            pdf,
            ga.relation_metapaths_sql("edges_base", max_mid_fanout=cap),
        )
        got = ga.relation_metapaths(_mp_df(spark, rows), max_mid_fanout=cap)
        _assert_frame_match(got, want)


# --- random walks -------------------------------------------------------------


def _md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def _portable_hash64(s: str) -> int:
    return int(_md5_hex(s)[:15], 16)


def brute_walks(edges, walk_length, walks_per_node, seed, cap=None):
    """Pure-Python mirror of random_walks: (start, walk, step, node) rows."""
    adj = {}
    dedup = sorted(set(edges))
    if cap is not None:
        from collections import Counter

        width = Counter(a for a, _ in dedup)
        dedup = [
            (a, b)
            for a, b in dedup
            if width[a] <= cap or _portable_hash64(b) % width[a] < cap
        ]
    for a, b in dedup:
        adj.setdefault(a, []).append(b)
    out = []
    for start in sorted(adj):
        for w in range(walks_per_node):
            node = start
            out.append((start, w, 0, node))
            for t in range(1, walk_length + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                node = min(
                    nbrs, key=lambda v: (_md5_hex(f"{seed}|{w}|{t}|{node}|{v}"), v)
                )
                out.append((start, w, t, node))
    return sorted(out)


def _walk_rows(sdf):
    return sorted((r["start"], r["walk"], r["step"], r["node"]) for r in sdf.collect())


def test_walks_deterministic_and_stop_at_sink(spark):
    # b is a sink: walks from a stop after reaching it; c->c self-loop spins
    edges = [("a", "b"), ("c", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _walk_rows(ga.random_walks(df, walk_length=3, walks_per_node=1, seed=1))
    assert got == brute_walks(edges, 3, 1, 1)
    # a's walk: step0=a, step1=b (only neighbor), then stops
    assert ("a", 0, 1, "b") in got and not any(
        r[0] == "a" and r[2] >= 2 for r in got
    )
    # self-loop walk never stops
    assert ("c", 0, 3, "c") in got


def test_walks_choice_varies_by_walk_and_step(spark):
    # star center with many leaves: different walk indices / steps hash to
    # different leaves (the corpus isn't one repeated walk)
    leaves = [f"v{i}" for i in range(12)]
    edges = [("hub", v) for v in leaves] + [(v, "hub") for v in leaves]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _walk_rows(ga.random_walks(df, walk_length=4, walks_per_node=3, seed=9))
    assert got == brute_walks(edges, 4, 3, 9)
    hub_hops = {(r[1], r[2]): r[3] for r in got if r[0] == "hub"}
    # at least two distinct leaves chosen across (walk, step) slots
    assert len(set(hub_hops.values()) - {"hub"}) >= 2


def test_walks_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        ga.random_walks(df, walk_length=0)
    with pytest.raises(ValueError):
        ga.random_walks(df, walks_per_node=0)


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_walks_random_parity_spark_python_duckdb(spark, seed):
    rng = random.Random(seed * 13 + 1)
    nodes = [f"n{i}" for i in range(rng.randint(3, 10))]
    rows = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(4, 60))
    ]
    wl = rng.randint(1, 5)
    wpn = rng.randint(1, 3)
    cap = rng.choice([None, 2, 3])
    pdf = pd.DataFrame(rows, columns=["src", "dst"])
    sdf = spark.createDataFrame(pdf)
    got = ga.random_walks(
        sdf, walk_length=wl, walks_per_node=wpn, seed=seed, max_out_degree=cap
    )
    assert _walk_rows(got) == brute_walks(rows, wl, wpn, seed, cap)
    want = _duck(
        pdf,
        ga.random_walks_sql(
            "edges_base",
            walk_length=wl,
            walks_per_node=wpn,
            seed=seed,
            max_out_degree=cap,
        ),
    )
    _assert_frame_match(got, want)


def test_walks_cap_prunes_hub_choices(spark):
    # hub with width 40 >> cap 5: the capped walk must pick from the
    # deterministic surviving subset, and that subset is a strict subset
    # (prefix 'leaf' chosen so the binomial draw keeps 4 of 40 — a 'w'
    # prefix at cap 3 happened to keep ZERO, a legal but signal-free draw)
    leaves = [f"leaf{i:02d}" for i in range(40)]
    edges = [("hub", v) for v in leaves]
    df = spark.createDataFrame(edges, ["src", "dst"])
    survivors = {
        b for b in leaves if _portable_hash64(b) % 40 < 5
    }
    assert 0 < len(survivors) < 40
    got = _walk_rows(ga.random_walks(df, walk_length=1, walks_per_node=4, seed=5, max_out_degree=5))
    assert got == brute_walks(edges, 1, 4, 5, cap=5)
    picked = {r[3] for r in got if r[2] == 1}
    assert picked <= survivors


# --- skip-gram pairs ------------------------------------------------------------


def brute_skipgrams(walk_rows, window, min_count=1):
    """walk_rows: (start, walk, step, node)."""
    from collections import Counter, defaultdict

    by_walk = defaultdict(dict)
    for start, w, step, node in walk_rows:
        by_walk[(start, w)][step] = node
    cnt = Counter()
    for steps in by_walk.values():
        for sc, center in steps.items():
            for sx, context in steps.items():
                if 0 < abs(sx - sc) <= window:
                    cnt[(center, context)] += 1
    return sorted(
        (c, x, n) for (c, x), n in cnt.items() if n >= min_count
    )


def test_skipgram_semantics_on_fixed_walks(spark):
    # one walk a-b-c-b: symmetric window=1 pairs each adjacent position
    rows = [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"), ("a", 0, 3, "b")]
    df = spark.createDataFrame(rows, ["start", "walk", "step", "node"])
    got = sorted(tuple(r) for r in ga.skipgram_pairs(df, window=1).collect())
    assert got == brute_skipgrams(rows, 1)
    by = {(r[0], r[1]): r[2] for r in got}
    # b<->c appears twice per direction (steps 1-2 and 2-3)
    assert by[("b", "c")] == 2 and by[("c", "b")] == 2
    assert by[("a", "b")] == 1 and by[("b", "a")] == 1
    # window=1 never pairs distance-2 positions
    assert ("a", "c") not in by
    # distance-2 revisit (b at steps 1 and 3) shows up at window=2
    got2 = {
        (r[0], r[1]): r[2]
        for r in ga.skipgram_pairs(df, window=2).collect()
    }
    assert got2[("b", "b")] == 2  # both directions of the (1, 3) pair


def test_skipgram_window_never_crosses_walks(spark):
    rows = [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("z", 0, 0, "y"), ("z", 0, 1, "x")]
    df = spark.createDataFrame(rows, ["start", "walk", "step", "node"])
    got = sorted(tuple(r) for r in ga.skipgram_pairs(df, window=4).collect())
    assert got == brute_skipgrams(rows, 4)
    assert all({r[0], r[1]} <= {"a", "b"} or {r[0], r[1]} <= {"x", "y"} for r in got)


@pytest.mark.parametrize("seed", [6, 7])
def test_skipgram_end_to_end_parity(spark, seed):
    rng = random.Random(seed * 17)
    nodes = [f"n{i}" for i in range(rng.randint(3, 8))]
    rows = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(4, 50))]
    wl, wpn, win = rng.randint(1, 4), rng.randint(1, 2), rng.randint(1, 3)
    mc = rng.choice([1, 2])
    pdf = pd.DataFrame(rows, columns=["src", "dst"])
    sdf = spark.createDataFrame(pdf)
    walks = ga.random_walks(sdf, walk_length=wl, walks_per_node=wpn, seed=seed)
    got = ga.skipgram_pairs(walks, window=win, min_count=mc)
    walk_rows = [(r["start"], r["walk"], r["step"], r["node"]) for r in walks.collect()]
    assert sorted(tuple(r) for r in got.collect()) == brute_skipgrams(
        walk_rows, win, mc
    )
    want = _duck(
        pdf,
        ga.skipgram_pairs_sql(
            "edges_base",
            window=win,
            min_count=mc,
            walk_length=wl,
            walks_per_node=wpn,
            seed=seed,
        ),
    )
    _assert_frame_match(got, want)


# --- transitive closure ------------------------------------------------------


def brute_closure(edges, max_depth):
    """BFS-from-every-node mirror: {(src, dst): min_depth <= max_depth}."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
    out = {}
    for s in adj:
        frontier, seen, d = {s}, {s}, 0
        while frontier and d < max_depth:
            d += 1
            frontier = {w for v in frontier for w in adj.get(v, ())} - seen
            for w in frontier:
                if w != s:
                    out[(s, w)] = d
            seen |= frontier
    return out


def test_closure_chain_cycle_cap(spark):
    # chain a..e, 3-cycle x->y->z->x, hub, chain->cycle bridge, self loop
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("h", "p"), ("h", "q"), ("e", "x"), ("p", "p")]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    got = {(r["src"], r["dst"]): r["depth"]
           for r in ga.transitive_closure(spark.createDataFrame(pdf), max_depth=8).collect()}
    assert got == brute_closure(edges, 8)
    assert got[("a", "e")] == 4 and got[("a", "x")] == 5
    assert ("x", "x") not in got  # cycle never emits reflexive pairs
    assert got[("z", "y")] == 2  # around the cycle
    # cap semantics: depth>3 pairs vanish, depth<=3 keep exact min depth
    capped = {(r["src"], r["dst"]): r["depth"]
              for r in ga.transitive_closure(spark.createDataFrame(pdf), max_depth=3).collect()}
    assert capped == brute_closure(edges, 3)


@pytest.mark.parametrize("seed,max_depth", [(11, 8), (23, 4)])
def test_closure_random_parity_spark_python_duckdb(spark, seed, max_depth):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 20), rng.randrange(0, 20)) for _ in range(45)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    cl = ga.transitive_closure(spark.createDataFrame(pdf), max_depth=max_depth)
    assert {(r["src"], r["dst"]): r["depth"] for r in cl.collect()} == brute_closure(
        edges, max_depth
    )
    _assert_frame_match(
        cl, _duck(pdf, ga.transitive_closure_sql("edges_base", max_depth=max_depth))
    )


def brute_cycles(edges, max_depth):
    cl = brute_closure(edges, max_depth)
    out = {}
    for (a, b), d1 in cl.items():
        d2 = cl.get((b, a))
        if d2 is not None:
            out[a] = min(out.get(a, 1 << 60), d1 + d2)
    return out


def test_cycle_nodes_handcrafted_and_parity(spark):
    # 3-cycle x->y->z->x, 2-cycle p<->q, acyclic chain a->b->c
    edges = [("x", "y"), ("y", "z"), ("z", "x"), ("p", "q"), ("q", "p"),
             ("a", "b"), ("b", "c")]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    got = {r["node"]: r["min_cycle_len"]
           for r in ga.cycle_nodes(spark.createDataFrame(pdf), max_depth=8).collect()}
    assert got == {"x": 3, "y": 3, "z": 3, "p": 2, "q": 2}
    assert got == brute_cycles(edges, 8)
    _assert_frame_match(
        ga.cycle_nodes(spark.createDataFrame(pdf), max_depth=8),
        _duck(pdf, ga.cycle_nodes_sql("edges_base", max_depth=8)),
    )


@pytest.mark.parametrize("seed", [5, 17])
def test_cycle_nodes_random_parity(spark, seed):
    rng = random.Random(seed)
    edges = [(rng.randrange(0, 18), rng.randrange(0, 18)) for _ in range(40)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    got = ga.cycle_nodes(spark.createDataFrame(pdf), max_depth=6)
    assert {r["node"]: r["min_cycle_len"] for r in got.collect()} == brute_cycles(
        edges, 6
    )
    _assert_frame_match(got, _duck(pdf, ga.cycle_nodes_sql("edges_base", max_depth=6)))


def test_node_features_assembly_parity(spark):
    # triangle K3 + directed tail + a self-loop-only node (coalesce path)
    edges = TRIANGLE_PLUS_TAIL + [(9, 9)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    nf = ga.node_features(spark.createDataFrame(pdf))
    rows = {r["node"]: r for r in nf.collect()}
    # node 9 exists (degree_stats universe) with zeroed graph features
    assert rows[9]["und_degree"] == 0 and rows[9]["rank_e12"] == 0
    # features agree with the standalone components
    tri = {r["node"]: r["n_triangles"] for r in ga.triangle_counts(
        spark.createDataFrame(pdf)).collect()}
    pr = {r["node"]: r["rank_e12"] for r in ga.pagerank(
        spark.createDataFrame(pdf)).collect()}
    for n, r in rows.items():
        assert r["n_triangles"] == tri.get(n, 0)
        assert r["rank_e12"] == pr.get(n, 0)
    _assert_frame_match(nf, _duck(pdf, ga.node_features_sql("edges_base")))


# --- shortest_paths (weighted delta-frontier Bellman-Ford) -------------------

def _wedges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst", "weight"]),
        "src string, dst string, weight long",
    )


def _seeds(spark, nodes):
    return spark.createDataFrame(pd.DataFrame({"node": nodes}), "node string")


def test_shortest_paths_picks_cheaper_indirect_route(spark):
    # a->c direct costs 10; a->b->c costs 3; directed (no back-edges)
    rows = [("a", "c", 10), ("a", "b", 1), ("b", "c", 2), ("c", "d", 5)]
    got = {
        r["node"]: r["dist"]
        for r in ga.shortest_paths(_wedges(spark, rows), _seeds(spark, ["a"]), max_iters=6).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 3, "d": 8}


def test_shortest_paths_respects_direction_and_multi_seed(spark):
    rows = [("a", "b", 4), ("c", "b", 1), ("b", "z", 1)]
    got = {
        r["node"]: r["dist"]
        for r in ga.shortest_paths(_wedges(spark, rows), _seeds(spark, ["a", "c"]), max_iters=4).collect()
    }
    # b reachable from both seeds: min(4, 1) = 1; direction matters (no a<-b)
    assert got == {"a": 0, "c": 0, "b": 1, "z": 2}


def test_shortest_paths_iteration_bound_and_early_exit(spark):
    # chain a->b->c->d of weight-1 edges: max_iters=2 must stop at c
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    got = {
        r["node"]: r["dist"]
        for r in ga.shortest_paths(_wedges(spark, rows), _seeds(spark, ["a"]), max_iters=2).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}
    # early exit: fixpoint after 3 rounds even with max_iters=50
    full = {
        r["node"]: r["dist"]
        for r in ga.shortest_paths(_wedges(spark, rows), _seeds(spark, ["a"]), max_iters=50).collect()
    }
    assert full == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_shortest_paths_python_mirror_and_duckdb_parity(spark):
    rng = random.Random(71)
    nodes = [f"n{i}" for i in range(25)]
    rows = list(
        {
            (rng.choice(nodes), rng.choice(nodes)): None
            for _ in range(120)
        }
    )
    rows = [(s, d, rng.randint(1, 9)) for (s, d) in rows if s != d]
    seeds = ["n0", "n1"]
    K = 5
    # pure-Python bounded Bellman-Ford
    dist = {s: 0 for s in seeds}
    for _ in range(K):
        new = dict(dist)
        for s, d, w in rows:
            if s in dist and dist[s] + w < new.get(d, 1 << 60):
                new[d] = min(new.get(d, 1 << 60), dist[s] + w)
        if new == dist:
            break
        dist = new
    got = {
        r["node"]: r["dist"]
        for r in ga.shortest_paths(_wedges(spark, rows), _seeds(spark, seeds), max_iters=K).collect()
    }
    assert got == dist
    pdf = pd.DataFrame(rows, columns=["src", "dst", "weight"])
    want = _duck(
        pdf,
        ga.shortest_paths_sql(
            "edges_base",
            "SELECT 'n0' AS node UNION SELECT 'n1'",
            max_iters=K,
        ),
    )
    assert {r.node: r.dist for r in want.itertuples()} == got


def test_anf_star_graph_orders_center_above_leaves(spark):
    from posextract_spark.operators.graph_analytics import neighborhood_function

    # center -> 100 leaves: center reaches 101 nodes, each leaf only itself
    edges = spark.createDataFrame(
        [("c", f"leaf{i}") for i in range(100)], "src string, dst string"
    )
    out = {r.node: r for r in neighborhood_function(edges, n_hops=2).collect()}
    center = out["c"].est_e6 / 1e6
    # FM with m=4 masks: ~39% 1-sigma relative error; generous determinism-
    # safe band around the true 101
    assert 30 <= center <= 350, center
    for i in range(100):
        leaf = out[f"leaf{i}"].est_e6 / 1e6
        assert leaf <= 4.0  # singleton neighborhoods estimate ~1-2
        assert leaf < center


def test_anf_monotone_in_hops_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from posextract_spark.operators.graph_analytics import neighborhood_function

    # a directed chain a->b->c->d: reachability grows with hops
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    h1 = {r.node: r.sum_r for r in neighborhood_function(edges, n_hops=1).collect()}
    h3 = {r.node: r.sum_r for r in neighborhood_function(edges, n_hops=3).collect()}
    assert all(h3[n] >= h1[n] for n in h1)  # registers only gain bits
    rep = {
        r.node: r.sum_r
        for r in neighborhood_function(edges.repartition(7), n_hops=3).collect()
    }
    assert rep == h3  # bit_or is order/partition independent
