"""Cross-document duplicate-span detection (operators/dedup.py
dup_span_windows / dup_span_stats): handcrafted boilerplate corpus,
content-defined-sampling alignment independence, short-doc edge cases,
DuckDB-mirror parity."""

import random

import duckdb
import pandas as pd

from posextract_spark.operators.dedup import (
    dup_span_stats,
    dup_span_stats_sql,
    dup_span_windows,
    strip_duplicate_spans,
    strip_duplicate_spans_sql,
)

BOILER = "all rights reserved by the synthetic crawl consortium"  # 8 tokens


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), schema="doc_id long, text string"
    )


def test_boilerplate_block_detected(spark):
    rows = [
        (1, f"alpha beta gamma delta {BOILER} epsilon zeta"),
        (2, f"one two three four five six {BOILER}"),
        (3, "entirely unique content with no repeats at all whatsoever today"),
    ]
    stats = {r["doc_id"]: r.asDict() for r in dup_span_stats(_docs(spark, rows), window=4, sample=1).collect()}
    # docs 1 and 2 share the 8-token boilerplate -> both must flag dup
    # windows; doc 3 must flag none
    assert stats[1]["n_dup_windows"] > 0
    assert stats[2]["n_dup_windows"] > 0
    assert stats[3]["n_dup_windows"] == 0
    assert stats[3]["dup_ratio_e6"] == 0
    # in exact mode every fully-inside-boilerplate window (5 of them) is
    # duplicated in both carriers
    assert stats[1]["n_dup_windows"] >= 5
    assert stats[2]["n_dup_windows"] >= 5


def test_alignment_independence(spark):
    """THE property the content-defined sampler buys (and a fixed-stride
    sampler lacks — with stride 2, pad=1 below samples disjoint window
    offsets in the two docs and misses every shared span): whether a
    window is kept depends only on its CONTENT, so a shared run selects
    identical spans in both docs at every alignment."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
    for pad in range(4):
        prefix = " ".join(f"p{k}" for k in range(pad))
        rows = [
            (1, (prefix + " " + shared).strip()),
            (2, "q1 " + shared),
        ]
        wins = dup_span_windows(_docs(spark, rows), window=4, sample=2)
        by_doc = {1: set(), 2: set()}
        for r in wins.collect():
            by_doc[r["doc_id"]].add(r["h"])
        # every kept shared-run span appears in BOTH docs' kept sets
        shared_kept = by_doc[1] & by_doc[2]
        assert len(shared_kept) >= 1, f"pad={pad}: no shared span sampled"
        stats = {
            r["doc_id"]: r["n_dup_windows"]
            for r in dup_span_stats(_docs(spark, rows), window=4, sample=2).collect()
        }
        assert stats.get(1, 0) > 0 and stats.get(2, 0) > 0, f"pad={pad}"


def test_sample_is_subset_of_exact(spark):
    rng = random.Random(5)
    vocab = [f"w{k}" for k in range(9)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(20)]
    exact = dup_span_windows(_docs(spark, rows), window=4, sample=1)
    sampled = dup_span_windows(_docs(spark, rows), window=4, sample=3)
    e = {(r["doc_id"], r["pos"], r["h"]) for r in exact.collect()}
    s = {(r["doc_id"], r["pos"], r["h"]) for r in sampled.collect()}
    assert s < e  # strict subset: sampling drops some but fabricates none
    assert len(s) > 0


def test_short_and_exact_window_docs(spark):
    rows = [(1, "a b c"), (2, "a b c d"), (3, "a b c d")]
    wins = dup_span_windows(_docs(spark, rows), window=4, sample=1)
    got = {(r["doc_id"], r["pos"]) for r in wins.collect()}
    # doc 1 (3 tokens < W) emits nothing; docs 2/3 emit exactly pos=1
    assert got == {(2, 1), (3, 1)}
    stats = {r["doc_id"]: r.asDict() for r in dup_span_stats(_docs(spark, rows), window=4, sample=1).collect()}
    assert 1 not in stats
    assert stats[2]["n_dup_windows"] == 1 and stats[2]["dup_ratio_e6"] == 1_000_000


def test_intra_doc_repeat_is_not_cross_doc(spark):
    # the same span twice in ONE doc is not a cross-document duplicate
    rows = [(1, "x1 x2 x3 x4 mid x1 x2 x3 x4"), (2, "totally different words here now")]
    stats = {r["doc_id"]: r["n_dup_windows"] for r in dup_span_stats(_docs(spark, rows), window=4, sample=1).collect()}
    assert stats[1] == 0 and stats[2] == 0


def test_duckdb_parity_random_corpus(spark):
    rng = random.Random(31)
    vocab = [f"w{k}" for k in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))))
        for i in range(60)
    ]
    for sample in (1, 2):
        sdf = dup_span_stats(_docs(spark, rows), window=4, sample=sample)
        got = sdf.toPandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = (
            con.execute(dup_span_stats_sql(4, sample)).df().sort_values("doc_id").reset_index(drop=True)
        )
        con.close()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
        assert (got["n_dup_windows"] > 0).any()  # the corpus must carry signal


def test_strip_removes_shared_spans_only(spark):
    rows = [
        (1, f"alpha beta gamma delta {BOILER} epsilon zeta"),
        (2, f"one two three four five six {BOILER}"),
        (3, "entirely unique content with no repeats at all whatsoever today"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in strip_duplicate_spans(_docs(spark, rows), window=4, sample=1).collect()
    }
    # doc 3 untouched, byte-identical
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_removed"] == 0
    # the full 8-token boilerplate is gone from both carriers (every token
    # of it is covered by some cross-doc-duplicated 4-window)
    for d in (1, 2):
        for tok in BOILER.split():
            assert tok not in out[d]["clean_text"].split()
        assert out[d]["n_removed"] >= 8
    # unique flanks survive
    assert out[1]["clean_text"].split()[:4] == ["alpha", "beta", "gamma", "delta"]
    assert out[1]["clean_text"].split()[-2:] == ["epsilon", "zeta"]
    assert out[2]["clean_text"].split() == ["one", "two", "three", "four", "five", "six"]
    # token accounting: n_tokens + n_removed == original token count
    for d in (1, 2, 3):
        assert out[d]["n_tokens"] + out[d]["n_removed"] == len(rows[d - 1][1].split())


def test_strip_intra_doc_repeat_survives(spark):
    # same span twice in ONE doc is not cross-document -> nothing removed
    rows = [(1, "x1 x2 x3 x4 mid x1 x2 x3 x4"), (2, "totally different words here now")]
    out = {r["doc_id"]: r.asDict() for r in strip_duplicate_spans(_docs(spark, rows)).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["clean_text"] == rows[0][1]
    assert out[2]["n_removed"] == 0


def test_strip_duckdb_parity_random_corpus(spark):
    rng = random.Random(77)
    vocab = [f"w{k}" for k in range(10)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))))
        for i in range(50)
    ]
    sdf = strip_duplicate_spans(_docs(spark, rows), window=4, sample=1)
    got = sdf.toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(strip_duplicate_spans_sql(4, 1)).df().sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert (got["n_removed"] > 0).any()  # the corpus must carry signal


def test_threshold_filter_composition(spark):
    rows = [
        (1, BOILER + " " + BOILER),
        (2, BOILER),
        (3, "unique a unique b unique c unique d unique e unique f xx yy"),
    ]
    stats = dup_span_stats(_docs(spark, rows), window=4, sample=1)
    kept = {r["doc_id"] for r in stats.filter("dup_ratio_e6 < 500000").collect()}
    assert kept == {3}
