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


# --- contested_facts ----------------------------------------------------------


def brute_contested(rows):
    from collections import Counter, defaultdict

    obs = Counter(rows)
    groups = defaultdict(dict)
    for (s, p, d), n in obs.items():
        groups[(s, p)][d] = n
    out = []
    for (s, p), dsts in groups.items():
        if len(dsts) < 2:
            continue
        ranked = sorted(dsts.items(), key=lambda kv: (-kv[1], kv[0]))
        (td, ts), (rd, rs) = ranked[0], ranked[1]
        out.append((s, p, len(dsts), td, ts, rd, rs, rs * 1_000_000 // ts))
    return sorted(out)


def test_contested_facts_handcrafted(spark):
    out = fu.contested_facts(_store_df(spark))
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == brute_contested(STORE)
    by_key = {(r[0], r[1]): r for r in rows}
    # ada/born_in: london 3 vs paris 1 -> margin 333333
    assert by_key[("ada", "born_in")][2:] == (2, "london", 3, "paris", 1, 333_333)
    # cal's dead heat: top = min object on the tie
    assert by_key[("cal", "born_in")][3:] == ("bern", 1, "zurich", 1, 1_000_000)
    # bob/born_in has one object -> absent
    assert ("bob", "born_in") not in by_key
    # many-valued groups ARE reported (conflict detection ignores the
    # functionality gate): ada/visited has 3 tied singleton objects
    assert by_key[("ada", "visited")][3:] == ("kyiv", 1, "lima", 1, 1_000_000)


# --- truth discovery ----------------------------------------------------------


def brute_truth(quads, rounds):
    """quads: iterable of (source, src, predicate, dst). Returns
    (facts_sorted, trust_sorted) mirroring truth_discovery exactly."""
    from collections import Counter, defaultdict

    claims = set(quads)
    sources = {q[0] for q in claims}
    n_claims = Counter(q[0] for q in claims)
    trust = {s: 500_000 for s in sources}
    for _ in range(rounds):
        votes = defaultdict(lambda: defaultdict(lambda: [0, 0]))
        for so, s, p, d in claims:
            votes[(s, p)][d][0] += trust[so]
            votes[(s, p)][d][1] += 1
        winners = {}
        for (s, p), dsts in votes.items():
            total = sum(v for v, _ in dsts.values())
            d, (vote, ns) = min(dsts.items(), key=lambda kv: (-kv[1][0], kv[0]))
            winners[(s, p)] = (d, ns, vote, total)
        wins = Counter()
        for so, s, p, d in claims:
            if winners[(s, p)][0] == d:
                wins[so] += 1
        trust = {so: wins[so] * 1_000_000 // n_claims[so] for so in sources}
    facts = sorted(
        (s, p, d, ns, vote, total, (0 if total == 0 else vote * 1_000_000 // total))
        for (s, p), (d, ns, vote, total) in winners.items()
    )
    trust_rows = sorted((so, n_claims[so], wins[so], trust[so]) for so in sources)
    return facts, trust_rows


# Mirror-farm scenario: sources A and D are authoritative (agree with the
# consensus on g1-g4); B, C, E are a low-quality farm that asserts 'b' for
# gx plus junk elsewhere. Round 1 (= majority) elects 'b' for gx (3 votes
# vs 2); after one trust update A+D (800k each) outweigh B+C+E (333,333
# each) and 'a' overturns it.
FARM = (
    [("A", g, "p", "t") for g in ["g1", "g2", "g3", "g4"]]
    + [("D", g, "p", "t") for g in ["g1", "g2", "g3", "g4"]]
    + [("A", "gx", "p", "a"), ("D", "gx", "p", "a")]
    + [("B", "gx", "p", "b"), ("B", "g1", "p", "u1"), ("B", "g2", "p", "u2")]
    + [("C", "gx", "p", "b"), ("C", "g3", "p", "u3"), ("C", "g4", "p", "u4")]
    + [("E", "gx", "p", "b"), ("E", "g1", "p", "u5"), ("E", "g2", "p", "u6")]
)


def _farm_df(spark):
    return spark.createDataFrame(FARM, ["source", "src", "predicate", "dst"])


def test_truth_discovery_overturns_majority(spark):
    df = _farm_df(spark)
    r1 = {(r["src"], r["predicate"]): r for r in fu.truth_discovery(df, rounds=1).collect()}
    # round 1 IS majority vote: the farm wins gx 3:2
    assert r1[("gx", "p")]["dst"] == "b"
    assert (r1[("gx", "p")]["vote_e6"], r1[("gx", "p")]["total_e6"]) == (1_500_000, 2_500_000)

    facts2, trust2 = fu.truth_discovery(df, rounds=2, return_trust=True)
    r2 = {(r["src"], r["predicate"]): r for r in facts2.collect()}
    # reliability flips it: a = 2 * 800000 = 1.6M > b = 3 * 333333
    assert r2[("gx", "p")]["dst"] == "a"
    assert r2[("gx", "p")]["vote_e6"] == 1_600_000
    assert r2[("gx", "p")]["n_sources"] == 2
    t2 = {r["source"]: r for r in trust2.collect()}
    # after round 2 A and D win every claim; the farm wins none
    assert t2["A"]["trust_e6"] == 1_000_000 and t2["A"]["n_wins"] == 5
    assert t2["B"]["trust_e6"] == 0 and t2["B"]["n_claims"] == 3

    want_facts, want_trust = brute_truth(FARM, 2)
    assert sorted(tuple(r) for r in facts2.collect()) == want_facts
    assert sorted(tuple(r) for r in trust2.collect()) == want_trust


def test_truth_discovery_rejects_bad_rounds(spark):
    with pytest.raises(ValueError):
        fu.truth_discovery(_farm_df(spark), rounds=0)


def _random_claims(seed: int):
    rng = random.Random(seed * 31 + 7)
    sources = [f"w{i}" for i in range(rng.randint(2, 6))]
    subs = [f"s{i}" for i in range(rng.randint(2, 6))]
    preds = [f"p{i}" for i in range(rng.randint(1, 3))]
    objs = [f"o{i}" for i in range(rng.randint(2, 5))]
    return [
        (rng.choice(sources), rng.choice(subs), rng.choice(preds), rng.choice(objs))
        for _ in range(rng.randint(6, 150))
    ]


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_truth_discovery_random_parity(spark, seed):
    quads = _random_claims(seed)
    rounds = random.Random(seed).choice([1, 2, 3])
    pdf = pd.DataFrame(quads, columns=["source", "src", "predicate", "dst"])
    sdf = spark.createDataFrame(pdf)

    facts, trust = fu.truth_discovery(sdf, rounds=rounds, return_trust=True)
    want_facts, want_trust = brute_truth(quads, rounds)
    assert sorted(tuple(r) for r in facts.collect()) == want_facts
    assert sorted(tuple(r) for r in trust.collect()) == want_trust

    _assert_match(facts, _duck(pdf, fu.truth_discovery_sql("triples_base", rounds)))
    _assert_match(trust, _duck(pdf, fu.source_trust_sql("triples_base", rounds)))


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_contested_random_parity(spark, seed):
    rows = _random_store(seed)
    pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
    sdf = spark.createDataFrame(pdf)
    out = fu.contested_facts(sdf)
    assert sorted(tuple(r) for r in out.collect()) == brute_contested(rows)
    _assert_match(out, _duck(pdf, fu.contested_facts_sql("triples_base")))


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


# --- predicate similarity -------------------------------------------------------


def brute_pred_sim(rows, min_common=1, min_jaccard_e6=0, cap=None):
    from collections import Counter, defaultdict

    ps0 = sorted({(p, s, o) for s, p, o in rows})
    sizes = Counter(p for p, _, _ in ps0)  # PRE-cap: denominators exact
    ps = ps0
    if cap is not None:
        fan = Counter((s, o) for _, s, o in ps0)
        ps = [(p, s, o) for p, s, o in ps0 if fan[(s, o)] <= cap]
    pairs_of = defaultdict(set)
    for p, s, o in ps:
        pairs_of[p].add((s, o))
    out = []
    preds = sorted(pairs_of)
    for i, a in enumerate(preds):
        for b in preds[i + 1:]:
            common = len(pairs_of[a] & pairs_of[b])
            if common < min_common:
                continue
            na, nb = sizes[a], sizes[b]
            j = common * 1_000_000 // (na + nb - common)
            if j >= min_jaccard_e6:
                out.append((a, b, common, na, nb, j))
    return sorted(out)


def _ps_rows(sdf):
    return sorted(tuple(r) for r in sdf.collect())


def test_predicate_similarity_synonyms(spark):
    rows = [
        # acquired and bought connect the same 3 pairs -> jaccard 1.0
        ("acme", "acquired", "zorg"), ("acme", "bought", "zorg"),
        ("beta", "acquired", "gamma"), ("beta", "bought", "gamma"),
        ("delta", "acquired", "eps"), ("delta", "bought", "eps"),
        # visited shares nothing
        ("acme", "visited", "paris"),
        # partial overlap: sold shares 1 of its 2 pairs with acquired
        ("acme", "sold", "zorg"), ("beta", "sold", "theta"),
    ]
    df = spark.createDataFrame(rows, ["src", "predicate", "dst"])
    got = _ps_rows(fu.predicate_similarity(df))
    assert got == brute_pred_sim(rows)
    by = {(r[0], r[1]): r for r in got}
    assert by[("acquired", "bought")][2:] == (3, 3, 3, 1_000_000)
    assert by[("acquired", "sold")][2:] == (1, 3, 2, 250_000)
    assert ("acquired", "visited") not in by
    # thresholds prune
    got2 = _ps_rows(fu.predicate_similarity(df, min_jaccard_e6=300_000))
    assert got2 == brute_pred_sim(rows, min_jaccard_e6=300_000)
    assert all(r[5] >= 300_000 for r in got2)


def test_predicate_similarity_fanout_cap(spark):
    # (hub, thing) asserted under 5 predicates; cap 3 removes that pair's
    # wedges, leaving only the p1/p2-specific overlap
    preds = [f"p{i}" for i in range(5)]
    rows = [("hub", p, "thing") for p in preds] + [
        ("a", "p0", "b"), ("a", "p1", "b"),
    ]
    df = spark.createDataFrame(rows, ["src", "predicate", "dst"])
    got = _ps_rows(fu.predicate_similarity(df, max_pair_fanout=3))
    assert got == brute_pred_sim(rows, cap=3)
    # only the (a,b)-driven pair survives; denominators keep the hub pair
    # (sizes are PRE-cap: p0 and p1 each own 2 distinct pairs), so the
    # capped jaccard is an honest LOWER bound: 1/(2+2-1)
    assert got == [("p0", "p1", 1, 2, 2, 333_333)]


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_predicate_similarity_random_parity(spark, seed):
    rng = random.Random(seed)
    rows = [
        (
            rng.choice(["s1", "s2", "s3", "s4"]),
            rng.choice(["p1", "p2", "p3"]),
            rng.choice(["o1", "o2", "o3"]),
        )
        for _ in range(rng.randint(4, 70))
    ]
    cap = rng.choice([None, 1, 2])
    mc = rng.choice([1, 2])
    mj = rng.choice([0, 200_000])
    pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
    sdf = spark.createDataFrame(pdf)
    got = fu.predicate_similarity(
        sdf, min_common=mc, min_jaccard_e6=mj, max_pair_fanout=cap
    )
    assert _ps_rows(got) == brute_pred_sim(rows, mc, mj, cap)
    _assert_match(
        got,
        _duck(
            pdf,
            fu.predicate_similarity_sql(
                "triples_base", min_common=mc, min_jaccard_e6=mj, max_pair_fanout=cap
            ),
        ),
    )


# --- entity co-occurrence lift ---------------------------------------------------


def brute_cooc(rows, min_pairs=1, cap=None):
    """rows: (doc_id, entity) mentions."""
    from collections import Counter, defaultdict

    m0 = sorted(set(rows))
    n_docs = len({d for d, _ in m0})
    marg = Counter(e for _, e in m0)
    m = m0
    if cap is not None:
        width = Counter(d for d, _ in m0)
        m = [(d, e) for d, e in m0 if width[d] <= cap]
    ents = defaultdict(set)
    for d, e in m:
        ents[d].add(e)
    pairs = Counter()
    for d, es in ents.items():
        es = sorted(es)
        for i, a in enumerate(es):
            for b in es[i + 1:]:
                pairs[(a, b)] += 1
    out = []
    for (a, b), n_ab in pairs.items():
        if n_ab < min_pairs:
            continue
        out.append(
            (a, b, n_ab, marg[a], marg[b], n_ab * 1_000_000 * n_docs // (marg[a] * marg[b]))
        )
    return sorted(out)


def test_entity_cooccurrence_lift_semantics(spark):
    rows = [
        # acme+zorg co-mentioned in 2 of 4 docs, each in 2 docs total:
        # lift = 2*4/(2*2) = 2.0 (associated)
        ("d1", "acme"), ("d1", "zorg"),
        ("d2", "acme"), ("d2", "zorg"),
        # beta appears everywhere -> lift with acme = 2*4/(2*4) = 1.0
        ("d1", "beta"), ("d2", "beta"), ("d3", "beta"), ("d4", "beta"),
        ("d3", "solo"),
        ("d4", "hermit"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "entity"])
    got = sorted(tuple(r) for r in fu.entity_cooccurrence(df).collect())
    assert got == brute_cooc(rows)
    by = {(r[0], r[1]): r for r in got}
    assert by[("acme", "zorg")][2:] == (2, 2, 2, 2_000_000)
    assert by[("acme", "beta")][5] == 1_000_000  # independence
    assert ("hermit", "solo") not in by  # never co-mentioned


def test_entity_cooccurrence_doc_cap(spark):
    # d_hub mentions 6 entities; cap 3 removes its pairs but keeps its
    # mentions in the marginals and n_docs (honest lower-bound n_ab)
    rows = [("d_hub", f"e{i}") for i in range(6)] + [
        ("d1", "e0"), ("d1", "e1"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "entity"])
    got = sorted(tuple(r) for r in fu.entity_cooccurrence(df, max_doc_entities=3).collect())
    assert got == brute_cooc(rows, cap=3)
    # only the d1 pair survives; marginals still count d_hub's mentions
    assert got == [("e0", "e1", 1, 2, 2, 500_000)]


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_entity_cooccurrence_random_parity(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"d{rng.randint(1, 6)}", f"e{rng.randint(1, 7)}")
        for _ in range(rng.randint(4, 80))
    ]
    mp = rng.choice([1, 2])
    cap = rng.choice([None, 2, 4])
    pdf = pd.DataFrame(rows, columns=["doc_id", "entity"])
    sdf = spark.createDataFrame(pdf)
    got = fu.entity_cooccurrence(sdf, min_pairs=mp, max_doc_entities=cap)
    assert sorted(tuple(r) for r in got.collect()) == brute_cooc(rows, mp, cap)
    con = duckdb.connect()
    con.register("mentions", pdf)
    want = con.execute(
        "WITH mentions_base AS (SELECT * FROM mentions)"
        + fu.entity_cooccurrence_sql(
            "mentions_base", min_pairs=mp, max_doc_entities=cap
        )
    ).df()
    con.close()
    _assert_match(got, want)


# --- weighted fusion -------------------------------------------------------------


def brute_fuse_weighted(rows, min_conf=0):
    """rows: (src, predicate, dst, weight)."""
    from collections import defaultdict

    groups = defaultdict(lambda: defaultdict(int))
    for s, p, d, w in rows:
        groups[(s, p)][d] += w
    out = []
    for (s, p), dsts in groups.items():
        total = sum(dsts.values())
        d, w = min(dsts.items(), key=lambda kv: (-kv[1], kv[0]))
        conf = 0 if total == 0 else w * 1_000_000 // total
        if conf >= min_conf:
            out.append((s, p, d, w, total, conf))
    return sorted(out)


def test_fuse_weighted_semantics(spark):
    rows = [
        # one heavy page outweighs two light ones
        ("acme", "hq", "berlin", 900), ("acme", "hq", "austin", 300),
        ("acme", "hq", "austin", 200),
        # zero-weight group -> confidence 0, min-dst winner
        ("zorg", "hq", "b", 0), ("zorg", "hq", "a", 0),
    ]
    df = spark.createDataFrame(rows, ["src", "predicate", "dst", "weight"])
    got = sorted(tuple(r) for r in fu.fuse_weighted(df).collect())
    assert got == brute_fuse_weighted(rows)
    by = {r[0]: r for r in got}
    assert by["acme"][2:] == ("berlin", 900, 1400, 642_857)
    assert by["zorg"][2:] == ("a", 0, 0, 0)
    # confidence floor drops the zero group
    got2 = sorted(tuple(r) for r in fu.fuse_weighted(df, min_confidence_e6=600_000).collect())
    assert got2 == brute_fuse_weighted(rows, 600_000)
    assert [r[0] for r in got2] == ["acme"]


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_fuse_weighted_random_parity(spark, seed):
    rng = random.Random(seed)
    rows = [
        (
            rng.choice(["s1", "s2", "s3"]),
            rng.choice(["p1", "p2"]),
            rng.choice(["a", "b", "c"]),
            rng.randint(0, 50),
        )
        for _ in range(rng.randint(3, 60))
    ]
    mc = rng.choice([0, 400_000])
    pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst", "weight"])
    sdf = spark.createDataFrame(pdf)
    got = fu.fuse_weighted(sdf, min_confidence_e6=mc)
    assert sorted(tuple(r) for r in got.collect()) == brute_fuse_weighted(rows, mc)
    _assert_match(
        got, _duck(pdf, fu.fuse_weighted_sql("triples_base", min_confidence_e6=mc))
    )


# --- entity type profile -----------------------------------------------------


def brute_type_profile(rows):
    """rows: (src, predicate, dst). Mirror of entity_type_profile."""
    per = {}
    for s, p, _ in rows:
        per.setdefault(s, {}).setdefault(p, 0)
        per[s][p] += 1
    out = {}
    for s, preds in per.items():
        n_facts = sum(preds.values())
        # max count, ties by min predicate
        top_p = min(preds, key=lambda p: (-preds[p], p))
        out[s] = (n_facts, len(preds), top_p, preds[top_p],
                  preds[top_p] * 1_000_000 // n_facts)
    return out


def test_entity_type_profile_handcrafted(spark):
    rows = [
        # e1: directed x3, produced x1 -> top=directed purity 750000
        ("e1", "directed", "m1"), ("e1", "directed", "m2"),
        ("e1", "directed", "m3"), ("e1", "produced", "m1"),
        # e2: tie 2-2 -> min predicate wins ("acted_in" < "wrote")
        ("e2", "wrote", "b1"), ("e2", "wrote", "b2"),
        ("e2", "acted_in", "m1"), ("e2", "acted_in", "m2"),
        # e3: single fact -> purity 1e6
        ("e3", "born_in", "c1"),
    ]
    pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
    got = {
        r["entity"]: (r["n_facts"], r["n_predicates"], r["top_predicate"],
                      r["top_count"], r["purity_e6"])
        for r in fu.entity_type_profile(spark.createDataFrame(pdf)).collect()
    }
    assert got == brute_type_profile(rows)
    assert got["e2"][2] == "acted_in"  # deterministic min tie-break
    _assert_match(
        fu.entity_type_profile(spark.createDataFrame(pdf)),
        _duck(pdf, fu.entity_type_profile_sql("triples_base")),
    )


@pytest.mark.parametrize("seed", [7, 31])
def test_entity_type_profile_random_parity(spark, seed):
    rows = _random_store(seed)
    pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
    got = fu.entity_type_profile(spark.createDataFrame(pdf))
    assert {
        r["entity"]: (r["n_facts"], r["n_predicates"], r["top_predicate"],
                      r["top_count"], r["purity_e6"])
        for r in got.collect()
    } == brute_type_profile(rows)
    _assert_match(got, _duck(pdf, fu.entity_type_profile_sql("triples_base")))
