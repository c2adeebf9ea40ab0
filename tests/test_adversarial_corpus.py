"""Contract-oracle parity on an ADVERSARIAL documents table.

The driver gate runs every oracle pair over the synthetic bag-of-words
corpus — lowercase, punctuation-free, single-spaced, 10-99 words. That
leaves the text operators' edge behavior (empty/whitespace-only docs,
leading punctuation, capitalization, '?'-questions, commas, repeated
words, multi-space runs, 1-word docs) checked by NOTHING: both engines
could diverge there and every golden stays green (exactly how the
DuckDB 'g'-flag slash-collapse bug survived three rounds in the URL
mirror — tests/test_urls_fuzz.py).

This test writes a small hostile documents.parquet (crafted edges +
seeded-random punctuation/case/length mixes), registers it as the
DuckDB `documents` view, and replays the REAL `__spark_entry__`
query/oracle pairs for every text-only query through the same
sorted-column value comparison the driver uses.
"""

import random

import duckdb
import pytest

import __spark_entry__ as em
from tools.check_contract import dtypes_match, value_hash

# every contract query whose oracle reads only the `documents` view —
# including the FULL extraction family (svo parse -> kernel -> pairs/KG),
# so the parser+kernel pipeline itself is parity-checked on hostile text
TEXT_QUERIES = [
    "svo_triples",
    "svo_triples_by_verb",
    "svo_triples_posrule",
    "adj_noun_pairs",
    "subj_verb_pairs",
    "kg_edges",
    "kg_nodes",
    "entity_link",
    "entity_link_scored",
    "url_normalize",
    "url_dedup_groups",
    "stratified_take",
    "sample_n",
    "sample_fraction",
    "token_count",
    "quality_score",
    "language_id",
    "fingerprint",
    "clean_text",
    "repetition_stats",
    "corpus_quality_filter",
    "mask_pii",
    "chunk_documents",
    "exact_dedup",
    "minhash_signatures",
    "minhash_band_pairs",
    "minhash_dedup_survivors",
    "simhash",
    "ngram_jaccard_stats",
    "validate_data",
    "dedup_paragraphs",
    "dedup_paragraphs_global",
    "shuffle_shards",
    "cap_per_domain",
    "syntax_check",
    "tag_sentence",
    "salted_doc_counts",
    "hash_split",
    "pack_sequences",
    "decontaminate",
]

_CRAFTED = [
    "",
    " ",
    "   ",
    "word",
    "The",
    "hon.",
    "Hon.",
    "Which way is the exit?",
    "What   now?",  # multi-space: split(' ') makes empty tokens both sides
    "a,b c, d ,e",
    "scan scan scan scan scan scan",
    "The the THE tHe the",
    "A big, fast merge. Which table is slow?",
    "trailing space ",
    " leading space",
    "one? two! three. four; five:",
    "....",
    "? ",
    "12 34 56 78 90 numbers only here now yes",
    "MiXeD CaSe WoRdS eVeRyWhErE iN tHiS dOc",
    # extraction-adversarial shapes (svo parser edges):
    "merge",                      # lone verb: root, no subject, no object
    "scan merge join sort",       # all verbs, conj chain, no nouns
    "table scan",                 # subject, verb, no object
    "scan table",                 # verb first: no subject, object only
    "rows scan table merge index",  # obj of v1 is subj-candidate of v2
    "data merge rows",            # posrule: subject d.* + IGNOREd verb
    "data scan rows",             # posrule: subject d.* kept
    "the big fast small slow x",  # ADJ pileup before one noun
    "fast",                       # lone ADJ, verbless -> ROOT, no pair
    "the data",                   # DET + alias surface, verbless
    "row line column customer scan data",  # alias surfaces + verb
    "a scan a merge a",           # DETs interleaved with verbs, no nouns
    "x scan y merge z join w",    # dense SVO chains
    "scan scan table",            # doubled verb then noun
]

_WORDS_POOL = (
    "the a an scan merge join sort filter group order hash batch stream "
    "query fast slow small big table index row column Which What Why "
    "Where When The THE der die das und le la les el los not no never "
    "data. rows, cols? x y z"
).split(" ")


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory):
    rng = random.Random(1234)
    texts = list(_CRAFTED)
    for _ in range(180):
        n = rng.randrange(1, 40)
        texts.append(" ".join(rng.choice(_WORDS_POOL) for _ in range(n)))
    import pandas as pd

    # single parquet FILE (like the driver's testdata), readable by both
    # engines at the same path the query/oracle pairs expect
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": [rng.choice(["en", "de", "xx"]) for _ in texts],
            "source": [f"src{i % 7}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path_factory.mktemp("advsf"))
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)
    return sf


# similarity-family queries whose oracles read only the `embeddings` view
EMB_QUERIES = [
    "cosine_topk",
    "lsh_bucket",
    "ivf_assign",
    "ivf_topk",
    "ivf_assign_kmeans",
    "ivf_topk_kmeans",
    "embedding_neardup",
]


@pytest.fixture(scope="module")
def adversarial_emb_sf(tmp_path_factory):
    """Hostile embeddings: zero vectors, exact duplicates, sign flips,
    axis-aligned one-hots, magnitude spread (1e-3..1e3), near-duplicates
    differing in one coordinate — the float shapes the smooth synthetic
    table never produces (engine parity needs identical summation order
    AND agreeing zero-norm guards)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(99)
    dim = 64
    vecs = [rng.standard_normal(dim)]  # vec_id 0: sane query vector
    vecs.append(np.zeros(dim))
    vecs.append(vecs[0].copy())          # exact duplicate of the query
    vecs.append(-vecs[0])                # antipode
    for i in range(6):
        v = np.zeros(dim)
        v[i] = 1.0
        vecs.append(v)                   # one-hots
    for scale in (1e-3, 1e3, 37.0):
        vecs.append(rng.standard_normal(dim) * scale)
    near = vecs[0].copy()
    near[7] += 1e-4
    vecs.append(near)                    # near-duplicate of the query
    while len(vecs) < 120:
        vecs.append(rng.standard_normal(dim))
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": [i % 5 for i in range(len(vecs))],
        }
    )
    sf = str(tmp_path_factory.mktemp("advemb"))
    pdf.to_parquet(f"{sf}/embeddings.parquet", index=False)
    return sf


def test_similarity_queries_match_oracles_on_adversarial_embeddings(spark, adversarial_emb_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{adversarial_emb_sf}/embeddings.parquet'"
    )
    qs = {**em.queries(), **em.extra_queries()}
    oracles = em.oracle_sql()
    failures = []
    for name in EMB_QUERIES:
        sdf = qs[name](spark, adversarial_emb_sf).toPandas()
        odf = con.execute(oracles[name]).df()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        ok = (
            len(sdf) == len(odf)
            and cols_ok
            and value_hash(sdf) == value_hash(odf)
            and (cols_ok and dtypes_match(sdf, odf)[0])
        )
        if not ok:
            failures.append((name, len(sdf), len(odf)))
    assert not failures, f"adversarial-embeddings divergences: {failures}"


def test_text_queries_match_oracles_on_adversarial_corpus(spark, adversarial_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{adversarial_sf}/documents.parquet'"
    )
    qs = {**em.queries(), **em.extra_queries()}
    oracles = em.oracle_sql()
    failures = []
    for name in TEXT_QUERIES:
        sdf = qs[name](spark, adversarial_sf).toPandas()
        odf = con.execute(oracles[name]).df()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        ok = (
            len(sdf) == len(odf)
            and cols_ok
            and value_hash(sdf) == value_hash(odf)
            # the driver gate's strict per-column pandas-dtype check too:
            # stringified values can collide while dtypes diverge (the r3
            # HUGEINT->float64 lesson)
            and (cols_ok and dtypes_match(sdf, odf)[0])
        )
        if not ok:
            failures.append((name, len(sdf), len(odf)))
    em.release_caches()
    assert not failures, f"adversarial-corpus divergences: {failures}"


# --- adversarial events + TPC-H join family (r5) ---------------------------
# events_by_type_day and revenue_by_nation were the only SQL-oracle queries
# with NO hostile-input replay (the synthetic events/orders are uniformly
# benign). The hazards here are engine-boundary ones: float->cent rounding
# at exactly-representable halves (x.125 * 100 = x12.5 EXACTLY — a genuine
# HALF_UP vs banker's probe, unlike 1.005 whose float product is not a
# half), day bucketing at midnight/end-of-year microseconds, unicode and
# empty event types, and join edges (nation with no customers, customer
# with no orders, customer with a dangling nationkey).


@pytest.fixture(scope="module")
def adversarial_events_sf(tmp_path_factory):
    import pandas as pd

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00.000000",  # exact midnight
            "2024-01-01 23:59:59.999999",  # last microsecond of the day
            "2024-12-31 23:59:59.999999",  # end of year
            "2024-02-29 12:00:00",         # leap day
            "2024-06-15 00:00:00.000001",  # first microsecond
            "2024-06-15 11:11:11.111111",
            "2024-06-15 11:11:11.111111",  # exact duplicate ts
            "2024-07-04 06:30:00",
            "2024-07-04 18:30:00",
            "2024-08-17 09:00:00",
        ]
        * 3,
        format="mixed",
    )
    n = len(ts)
    # values whose *100 product is an EXACT .5 (0.125 -> 12.5, 2.005 is
    # NOT: its product is 200.49999...), plus negatives, zero, huge, tiny
    vals = [0.125, -0.125, 0.005, 1.005, 2.675, -2.675, 0.0, -0.0,
            1e12, -1e12, 1e-9, 37.375, -37.375, 99.995, 0.015][: n] + [
        float(i) + 0.125 for i in range(max(0, n - 15))
    ]
    types = (["", " ", "purchase", "ünïcode-tÿpe", "PURCHASE", "a" * 200] * n)[:n]
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            # [us] precision: pandas-2 default ns parquet is unreadable by
            # Spark (PARQUET_TYPE_ILLEGAL TIMESTAMP(NANOS)); the driver's
            # testdata is [us] too
            "ts": ts.astype("datetime64[us]"),
            "user_id": [i % 7 - 3 for i in range(n)],  # negative ids too
            "event_type": types,
            "value": vals[:n],
            "props": ['{"k": 1}'] * n,
        }
    )
    sf = str(tmp_path_factory.mktemp("advev"))
    pdf.to_parquet(f"{sf}/events.parquet", index=False)
    return sf


def test_events_query_matches_oracle_on_adversarial_events(spark, adversarial_events_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{adversarial_events_sf}/events.parquet'"
    )
    sdf = em.extra_queries()["events_by_type_day"](spark, adversarial_events_sf).toPandas()
    odf = con.execute(em.oracle_sql()["events_by_type_day"]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert dtypes_match(sdf, odf)[0], dtypes_match(sdf, odf)[1]
    assert value_hash(sdf) == value_hash(odf)


@pytest.fixture(scope="module")
def adversarial_tpch_sf(tmp_path_factory):
    import pandas as pd

    nation = pd.DataFrame(
        {
            "n_nationkey": [0, 1, 2, 3, 4],
            "n_name": ["", "FRANCE", "FRANCE", "ünïcode-länd", "EMPTY NATION"],
            "n_regionkey": [0, 0, 1, 1, 2],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [10, 11, 12, 13, 14],
            # 99 dangles (no such nation); nation 4 has no customers
            "c_nationkey": [0, 1, 2, 3, 99],
            "c_name": ["a", "b", "c", "d", "e"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [100, 101, 102, 103, 104, 105],
            # 13 has no orders; 999 dangles (no such customer)
            "o_custkey": [10, 10, 11, 12, 14, 999],
            # exact-half products: 0.125*100 = 12.5, -0.125*100 = -12.5
            "o_totalprice": [0.125, -0.125, 2.675, 1e12, 0.005, 7.0],
        }
    )
    sf = str(tmp_path_factory.mktemp("advtpch"))
    nation.to_parquet(f"{sf}/nation.parquet", index=False)
    customer.to_parquet(f"{sf}/customer.parquet", index=False)
    orders.to_parquet(f"{sf}/orders.parquet", index=False)
    return sf


def test_revenue_query_matches_oracle_on_adversarial_tpch(spark, adversarial_tpch_sf):
    con = duckdb.connect()
    for t in ("nation", "customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{adversarial_tpch_sf}/{t}.parquet'"
        )
    sdf = em.extra_queries()["revenue_by_nation"](spark, adversarial_tpch_sf).toPandas()
    odf = con.execute(em.oracle_sql()["revenue_by_nation"]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert dtypes_match(sdf, odf)[0], dtypes_match(sdf, odf)[1]
    assert value_hash(sdf) == value_hash(odf)


@pytest.fixture(scope="module")
def adversarial_nation_sf(tmp_path_factory):
    """Hostile nation table for the CC queries, WITHIN the closed-form
    oracle's domain (each n_nationkey unique — a duplicated key with two
    regions would merge components and invalidate the per-region closed
    form, an oracle-domain limit, not an engine probe): negative and
    non-contiguous keys, a singleton region, a region whose min nation is
    negative, and keys straddling the +1000 region-anchor offset."""
    import pandas as pd

    nation = pd.DataFrame(
        {
            "n_nationkey": [-5, -1, 0, 3, 999, 1001, 7, 42],
            "n_name": ["a", "b", "c", "d", "e", "f", "g", "h"],
            # region -3: {-5}; region 0: {-1, 0, 3}; region 7: {999, 1001};
            # region 12: {7, 42}
            "n_regionkey": [-3, 0, 0, 0, 7, 7, 12, 12],
        }
    )
    sf = str(tmp_path_factory.mktemp("advnat"))
    nation.to_parquet(f"{sf}/nation.parquet", index=False)
    return sf


def test_cc_queries_match_oracle_on_adversarial_nation(spark, adversarial_nation_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{adversarial_nation_sf}/nation.parquet'"
    )
    qs = {**em.queries(), **em.extra_queries()}
    oracles = em.oracle_sql()
    failures = []
    for name in ("connected_components", "connected_components_star"):
        sdf = qs[name](spark, adversarial_nation_sf).toPandas()
        odf = con.execute(oracles[name]).df()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        ok = (
            len(sdf) == len(odf)
            and cols_ok
            and value_hash(sdf) == value_hash(odf)
            and (cols_ok and dtypes_match(sdf, odf)[0])
        )
        if not ok:
            failures.append((name, len(sdf), len(odf)))
    assert not failures, f"adversarial-nation CC divergences: {failures}"
