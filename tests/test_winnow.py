"""Winnowing fingerprints (operators/dedup.winnow_fingerprints /
winnow_stats): the shared-substring detection guarantee, selection
density, short-doc policy, and digest consistency."""

import hashlib

from posextract_spark.operators.dedup import (
    SHINGLE_N,
    WINNOW_WINDOW,
    winnow_fingerprints,
    winnow_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # guarantee: any shared word run >= window + SHINGLE_N - 1 (= 8 words)
    # yields a shared fingerprint, wherever it sits in each doc
    shared = "q w e r t y u i"  # 8 words
    d = _docs(
        spark,
        [
            (1, f"a1 b1 c1 {shared} z1"),
            (2, f"{shared} m2 n2 o2 p2 r2 s2"),
        ],
    )
    rows = winnow_fingerprints(d).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r.doc_id].add(r.fingerprint)
    assert fps[1] & fps[2], "shared 8-word run must share a fingerprint"


def test_winnow_disjoint_docs_share_nothing(spark):
    d = _docs(
        spark,
        [
            (1, "a b c d e f g h i j"),
            (2, "k l m n o p q r s t"),
        ],
    )
    rows = winnow_fingerprints(d).collect()
    f1 = {r.fingerprint for r in rows if r.doc_id == 1}
    f2 = {r.fingerprint for r in rows if r.doc_id == 2}
    assert f1 and f2 and not (f1 & f2)


def test_winnow_fingerprints_are_window_mins_of_gram_hashes(spark):
    words = [f"w{i}" for i in range(12)]
    d = _docs(spark, [(1, " ".join(words))])
    hs = [
        _h64(" ".join(words[i : i + SHINGLE_N]))
        for i in range(len(words) - SHINGLE_N + 1)
    ]
    want = {
        min(hs[i : i + WINNOW_WINDOW])
        for i in range(len(hs) - WINNOW_WINDOW + 1)
    }
    got = {r.fingerprint for r in winnow_fingerprints(d).collect()}
    assert got == want


def test_winnow_short_docs_emit_no_rows(spark):
    # 7 words -> 3 gram hashes < window=4 -> unmeasurable
    d = _docs(spark, [(1, "a b c d e f g")])
    assert winnow_fingerprints(d).count() == 0
    # 8 words -> exactly one window -> exactly one fingerprint
    d = _docs(spark, [(1, "a b c d e f g h")])
    assert winnow_fingerprints(d).count() == 1


def test_winnow_stats_digest_matches_fingerprints(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fps = {}
    for r in winnow_fingerprints(docs).collect():
        fps.setdefault(r.doc_id, []).append(r.fingerprint)
    stats = {r.doc_id: r for r in winnow_stats(docs).collect()}
    assert set(stats) == set(fps)
    for did, vals in fps.items():
        s = stats[did]
        x = 0
        for v in vals:
            x ^= v
        assert (s.n_fingerprints, s.fp_xor, s.fp_min, s.fp_max) == (
            len(vals), x, min(vals), max(vals),
        )
        # winnowing density: ~2/(w+1) of positions selected, never more
        # than the number of windows
        assert s.n_fingerprints >= 1
