"""Temporal operators (operators/temporal.py): adversarial semantics on
hand-built capture frames + plan-shape guards for the scale claims
(single map-side-combined shuffle, no Window, payload never shuffled)."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from posextract_spark.operators import temporal as T

SCHEMA = "url string, warc_ts timestamp, fp string, lang string"


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "fp", "lang"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


def _ts(s):
    return datetime.fromisoformat(s)


CAPS = [
    # u1: three captures, one content change
    ("u1", "2024-01-01", "aaa", "en"),
    ("u1", "2024-01-08", "aaa", "en"),
    ("u1", "2024-01-15", "bbb", "en"),
    # u2: single capture
    ("u2", "2024-01-01", "ccc", "de"),
    # u3: recaptured, never changed
    ("u3", "2024-01-01", "ddd", "en"),
    ("u3", "2024-01-15", "ddd", "en"),
]


def test_latest_capture_picks_newest_and_counts(spark):
    got = {
        r["url"]: (r["warc_ts"], r["fp"], r["n_captures"])
        for r in T.latest_capture(_df(spark, CAPS)).collect()
    }
    assert got == {
        "u1": (_ts("2024-01-15"), "bbb", 3),
        "u2": (_ts("2024-01-01"), "ccc", 1),
        "u3": (_ts("2024-01-15"), "ddd", 2),
    }


def test_latest_capture_tie_breaks_deterministically(spark):
    # same url, SAME timestamp, different payloads: struct-max must pick
    # the lexicographically greatest (fp, lang) — not an arbitrary one
    # (max_by under ties is partition-order-dependent; this is the reason
    # the operator uses struct-max)
    rows = [
        ("u", "2024-01-01", "aaa", "en"),
        ("u", "2024-01-01", "zzz", "de"),
        ("u", "2024-01-01", "mmm", "fr"),
    ]
    for _ in range(3):
        [r] = T.latest_capture(_df(spark, rows).repartition(4)).collect()
        assert (r["fp"], r["lang"], r["n_captures"]) == ("zzz", "de", 3)


def test_crawl_churn_is_content_defined(spark):
    got = {
        r["url"]: (r["n_captures"], r["n_versions"], r["changed"])
        for r in T.crawl_churn(_df(spark, CAPS)).collect()
    }
    # u3 was re-captured but never changed bytes -> not churn
    assert got == {"u1": (3, 2, True), "u2": (1, 1, False), "u3": (2, 1, False)}


def test_snapshot_diff_all_statuses(spark):
    rows = CAPS + [
        # u4 appears only in the new window -> added
        ("u4", "2024-01-15", "eee", "en"),
        # u2 is only in the old window -> removed
    ]
    got = {
        r["url"]: (r["status"], r["old_fp"], r["new_fp"])
        for r in T.snapshot_diff(
            _df(spark, rows),
            (None, "2024-01-07 00:00:00"),
            ("2024-01-07 00:00:00", "2024-01-21 00:00:00"),
        ).collect()
    }
    assert got == {
        "u1": ("changed", "aaa", "bbb"),
        "u2": ("removed", "ccc", None),
        "u3": ("stable", "ddd", "ddd"),
        "u4": ("added", None, "eee"),
    }


def test_window_bounds_are_exclusive_inclusive(spark):
    # (start, end]: a capture exactly AT start is excluded, AT end included
    rows = [("u", "2024-01-07", "aaa", "en"), ("u", "2024-01-14", "bbb", "en")]
    snap = T.crawl_window_snapshot(
        _df(spark, rows), "2024-01-07 00:00:00", "2024-01-14 00:00:00"
    )
    [r] = snap.collect()
    assert (r["fp"], r["n_captures"]) == ("bbb", 1)


def test_latest_capture_plan_single_partial_shuffle_no_window(spark):
    plan = (
        T.latest_capture(_df(spark, CAPS))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle on the url key
    assert "Window" not in plan
    assert "partial_max" in plan  # map-side combine carries structs, not rows


def test_snapshot_diff_no_python_and_statuses_match_oracle_shape(spark):
    df = T.snapshot_diff(
        _df(spark, CAPS),
        (None, "2024-01-07 00:00:00"),
        ("2024-01-07 00:00:00", "2024-01-21 00:00:00"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Python" not in plan  # whole family stays JVM-side


def test_incremental_triples_equals_scratch_and_only_extracts_dirty(spark):
    from posextract_spark.operators.temporal import (
        crawl_window_snapshot,
        incremental_triples,
        with_fingerprint,
    )
    from posextract_spark.pipeline import pages_to_triples
    from posextract_spark.sources.pages import generate_recrawls

    pages = generate_recrawls(spark, 60, seed=7, n_partitions=4)
    ts_old, ts_new = "2024-01-10 00:00:00", "2024-02-01 00:00:00"

    fp = with_fingerprint(pages)
    payload = ("fp", "lang", "text", "html")
    old = crawl_window_snapshot(fp, None, ts_old, payload=payload)
    new = crawl_window_snapshot(fp, None, ts_new, payload=payload)
    o = {r["url"]: r["fp"] for r in old.select("url", "fp").collect()}
    n = {r["url"]: r["fp"] for r in new.select("url", "fp").collect()}
    n_dirty = sum(1 for u, f in n.items() if o.get(u) != f)
    # the scenario must exercise BOTH branches: some urls re-extracted,
    # some carried over from the base build
    assert 0 < n_dirty < len(n)

    inc = incremental_triples(pages, ts_old, ts_new)
    scratch = pages_to_triples(
        new.select("url", "warc_ts", "html", "text", "lang")
    )
    cols = ["url", "subject", "verb", "object"]
    got = sorted(map(tuple, inc.select(cols).collect()))
    want = sorted(map(tuple, scratch.select(cols).collect()))
    assert got == want and len(got) > 0


def test_incremental_triples_accepts_precomputed_base(spark):
    from posextract_spark.operators.temporal import (
        crawl_window_snapshot,
        incremental_triples,
        with_fingerprint,
    )
    from posextract_spark.pipeline import pages_to_triples
    from posextract_spark.sources.pages import generate_recrawls

    pages = generate_recrawls(spark, 40, seed=11, n_partitions=4)
    ts_old, ts_new = "2024-01-10 00:00:00", "2024-02-01 00:00:00"
    base = pages_to_triples(
        crawl_window_snapshot(
            with_fingerprint(pages), None, ts_old, payload=("fp", "lang", "text", "html")
        ).select("url", "warc_ts", "html", "text", "lang")
    )
    via_base = incremental_triples(pages, ts_old, ts_new, base_triples=base)
    recomputed = incremental_triples(pages, ts_old, ts_new)
    cols = ["url", "subject", "verb", "object"]
    assert sorted(map(tuple, via_base.select(cols).collect())) == sorted(
        map(tuple, recomputed.select(cols).collect())
    )


# --- fact_history --------------------------------------------------------------


def brute_fact_history(rows):
    """rows: (src, predicate, epoch, dst) claim occurrences."""
    from collections import Counter, defaultdict

    cnt = Counter(rows)
    winners = {}
    by_fact_epoch = defaultdict(dict)
    for (s, p, e, d), n in cnt.items():
        by_fact_epoch[(s, p, e)][d] = n
    for (s, p, e), dsts in by_fact_epoch.items():
        d, n = min(dsts.items(), key=lambda kv: (-kv[1], kv[0]))
        winners[(s, p, e)] = (d, n)
    out = []
    for (s, p, e), (d, n) in winners.items():
        earlier = [e2 for (s2, p2, e2) in winners if s2 == s and p2 == p and e2 < e]
        prev = winners[(s, p, max(earlier))][0] if earlier else None
        out.append((s, p, e, d, n, prev, prev is None or prev != d))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


def _fh_rows(sdf):
    return sorted(
        (
            (r["src"], r["predicate"], r["epoch"], r["dst"], r["support"],
             r["prev_dst"], r["changed"])
            for r in sdf.collect()
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )


FH_CLAIMS = [
    # acme/ceo: ada wins e1; bob overtakes in e2 (changed); absent in e3;
    # returns UNCHANGED in e4 (prev looks back past the gap)
    ("acme", "ceo", "e1", "ada"), ("acme", "ceo", "e1", "ada"),
    ("acme", "ceo", "e1", "bob"),
    ("acme", "ceo", "e2", "bob"), ("acme", "ceo", "e2", "bob"),
    ("acme", "ceo", "e2", "ada"),
    ("acme", "ceo", "e4", "bob"),
    # acme/hq: tie in e1 -> min dst wins; same winner in e2 -> not changed
    ("acme", "hq", "e1", "berlin"), ("acme", "hq", "e1", "austin"),
    ("acme", "hq", "e2", "austin"),
    # zorg/ceo: single epoch -> first appearance, changed
    ("zorg", "ceo", "e2", "cal"),
]


def test_fact_history_semantics(spark):
    df = spark.createDataFrame(FH_CLAIMS, ["src", "predicate", "epoch", "dst"])
    got = _fh_rows(T.fact_history(df))
    assert got == brute_fact_history(FH_CLAIMS)
    by = {(r[0], r[1], r[2]): r for r in got}
    assert by[("acme", "ceo", "e1")][3:] == ("ada", 2, None, True)
    assert by[("acme", "ceo", "e2")][3:] == ("bob", 2, "ada", True)
    # gap: e4's prev is e2's winner, unchanged
    assert by[("acme", "ceo", "e4")][3:] == ("bob", 1, "bob", False)
    # tie -> min dst, then stable
    assert by[("acme", "hq", "e1")][3] == "austin"
    assert by[("acme", "hq", "e2")][3:] == ("austin", 1, "austin", False)
    assert by[("zorg", "ceo", "e2")][5:] == (None, True)


def test_fact_history_duckdb_parity_random(spark):
    import random

    import duckdb

    for seed in (5, 6, 7):
        rng = random.Random(seed)
        rows = [
            (
                rng.choice(["s1", "s2", "s3"]),
                rng.choice(["p1", "p2"]),
                rng.choice(["e1", "e2", "e3", "e4"]),
                rng.choice(["a", "b", "c"]),
            )
            for _ in range(rng.randint(4, 80))
        ]
        pdf = pd.DataFrame(rows, columns=["src", "predicate", "epoch", "dst"])
        sdf = spark.createDataFrame(pdf)
        got = T.fact_history(sdf)
        assert _fh_rows(got) == brute_fact_history(rows)
        con = duckdb.connect()
        con.register("claims", pdf)
        want = con.execute(
            "WITH claims_base AS (SELECT * FROM claims)"
            + T.fact_history_sql("claims_base")
        ).df()
        con.close()
        gpd = got.toPandas()
        for frame in (gpd, want):
            frame.sort_values(["src", "predicate", "epoch"], inplace=True)
            frame.reset_index(drop=True, inplace=True)
        pd.testing.assert_frame_equal(
            gpd[sorted(gpd.columns)], want[sorted(want.columns)], check_dtype=True
        )


# --- asof_join ------------------------------------------------------------------


def brute_asof(left_rows, right_rows, payload_cols):
    """left_rows: (key, ts, id); right_rows: (key, ts, *payload).
    Returns {left_id: payload tuple or None}. Max (ts, payload) wins."""
    out = {}
    for k, t, i in left_rows:
        cands = [r for r in right_rows if r[0] == k and _nullable_le(r[1], t)]
        if cands:
            best = max(cands, key=lambda r: (r[1] is not None, r[1:] if r[1] is not None else tuple(), r[2:]))
            out[i] = tuple(best[2:])
        else:
            out[i] = None
    return out


def _nullable_le(rt, lt):
    # null right ts = "since forever": visible to every left row;
    # null left ts sees only null-ts right rows
    if rt is None:
        return True
    if lt is None:
        return False
    return rt <= lt


def test_asof_join_semantics_and_ties(spark):
    left = spark.createDataFrame(
        [("u1", 10, 1), ("u1", 20, 2), ("u1", 5, 3), ("u2", 10, 4)],
        ["k", "ts", "id"],
    )
    right = spark.createDataFrame(
        # u1: rows at 10 (two: tie -> max payload), 15; u2: none before 10
        [("u1", 10, "a"), ("u1", 10, "b"), ("u1", 15, "c"), ("u2", 50, "z")],
        ["k", "ts", "v"],
    )
    got = {
        r["id"]: r["v"]
        for r in T.asof_join(left, right, key="k", payload={"v": "v"}).collect()
    }
    # at-or-before: id 1 (ts 10) matches the ts-10 rows, tie -> 'b'
    assert got == {1: "b", 2: "c", 3: None, 4: None}


def test_asof_join_cross_batch_state(spark):
    # force tiny Arrow batches so one key spans many batches — the fill
    # must carry the last payload across batch boundaries
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        left_rows = [("k", t, t) for t in range(0, 40)]
        right_rows = [("k", t, t * 10) for t in range(0, 40, 7)]
        left = spark.createDataFrame(left_rows, ["k", "ts", "id"])
        right = spark.createDataFrame(right_rows, ["k", "ts", "p"])
        got = {
            r["id"]: r["p"]
            for r in T.asof_join(left, right, key="k", payload={"p": "p"}).collect()
        }
        want = {i: (None if v is None else v[0]) for i, v in brute_asof(left_rows, right_rows, 1).items()}
        assert got == want
        # spot-check the fill: t=13 -> last right at 7 -> 70
        assert got[13] == 70 and got[6] == 0 and got[7] == 70
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_asof_join_rejects_bad_payload(spark):
    df = spark.createDataFrame([("k", 1, 1)], ["k", "ts", "id"])
    with pytest.raises(ValueError):
        T.asof_join(df, df, key="k", payload={})
    with pytest.raises(ValueError):
        T.asof_join(df, df, key="k", payload={"id": "id"})  # collides


def test_asof_join_duckdb_native_parity(spark):
    import random

    import duckdb

    rng = random.Random(77)
    # unique (key, ts) on the right so DuckDB ASOF's tie behavior is moot
    right_rows = [
        (f"u{k}", t, rng.randint(0, 99))
        for k in range(4)
        for t in sorted(rng.sample(range(100), 6))
    ]
    left_rows = [
        (f"u{rng.randint(0, 4)}", rng.randint(0, 120), i) for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, ["k", "ts", "id"])
    right = spark.createDataFrame(right_rows, ["k", "ts", "p"])
    got = {
        r["id"]: r["p"]
        for r in T.asof_join(left, right, key="k", payload={"p": "p"}).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k VARCHAR, ts BIGINT, id BIGINT)")
    con.execute("CREATE TABLE r(k VARCHAR, ts BIGINT, p BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left_rows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", right_rows)
    want = {
        int(i): (None if p is None else int(p))
        for i, p in con.execute(
            "SELECT l.id, r.p FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    con.close()
    assert got == want


# --- sessionize -----------------------------------------------------------------


def brute_sessions(rows, gap):
    """rows: (key, ts numeric, id). Returns {id: session_id}."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, t, i in rows:
        by_key[k].append((t, i))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        sess, prev = 0, None
        for t, i in evs:
            if prev is not None and t - prev > gap:
                sess += 1
            out[i] = sess
            prev = t
    return out


def test_sessionize_semantics(spark):
    rows = [
        ("u1", 0, 1), ("u1", 100, 2), ("u1", 2000, 3), ("u1", 2100, 4),
        ("u2", 0, 5),
        # equal timestamps can never split a session
        ("u3", 10, 6), ("u3", 10, 7), ("u3", 5000, 8),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "id"])
    got = {
        r["id"]: r["session_id"]
        for r in T.sessionize(df, key="user_id", ts="ts", gap_seconds=1800).collect()
    }
    assert got == brute_sessions(rows, 1800)
    assert (got[1], got[2], got[3], got[4]) == (0, 0, 1, 1)
    assert got[6] == got[7] == 0 and got[8] == 1


def test_sessionize_cross_batch_state(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        # one key, 30 events, breaks at every multiple of 5 -> sessions 0..5;
        # tiny batches force the state splice on both break and non-break
        # boundaries (the off-by-one hides exactly there)
        rows = [("k", sum(300 if j % 5 == 0 and j > 0 else 10 for j in range(1, t + 1)), t) for t in range(30)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "id"])
        got = {
            r["id"]: r["session_id"]
            for r in T.sessionize(df, key="user_id", ts="ts", gap_seconds=100).collect()
        }
        assert got == brute_sessions(rows, 100)
        assert max(got.values()) == 5  # 29 // 5 breaks happened
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_sessionize_timestamps_and_stats(spark):
    import duckdb

    pdf = pd.DataFrame(
        {
            "user_id": ["a"] * 4 + ["b"] * 2,
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00", "2024-01-01 00:10:00",
                    "2024-01-01 01:10:00", "2024-01-01 01:15:00",
                    "2024-01-01 00:00:00", "2024-01-02 00:00:00",
                ]
            ),
            "id": [1, 2, 3, 4, 5, 6],
        }
    )
    df = spark.createDataFrame(pdf)
    stats = T.session_stats(df, key="user_id", ts="ts", gap_seconds=1800)
    got = sorted(tuple(r) for r in stats.collect())
    con = duckdb.connect()
    con.register("ev", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH b AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                     THEN 1 ELSE 0 END AS brk
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM b)
            SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(epoch(ts)) AS BIGINT) AS start_epoch,
                   CAST(max(epoch(ts)) AS BIGINT) AS end_epoch,
                   CAST(max(epoch(ts)) - min(epoch(ts)) AS BIGINT) AS duration_sec
            FROM s GROUP BY user_id, session_id
            """
        ).fetchall()
    )
    con.close()
    assert got == want
    by = {(r[0], r[1]): r for r in got}
    assert by[("a", 0)][2] == 2 and by[("a", 1)][2] == 2
    assert by[("b", 1)][2] == 1


def test_asof_join_preserves_64bit_ids_exactly(spark):
    # portable_hash64-scale ids (> 2^53): a flat long column with NULLs
    # would pandas-ify to float64 and silently round these; the struct
    # transport must keep them bit-exact
    big = [(2**60 + 1, "k", 10), (2**60 + 3, "k", 20)]
    left = spark.createDataFrame(big, ["big_id", "k", "ts"])
    right = spark.createDataFrame(
        [("k", 5, 2**61 + 7)], ["k", "ts", "rbig"]
    )
    rows = {r["big_id"]: r["rbig"] for r in
            T.asof_join(left, right, key="k", payload={"rbig": "rbig"}).collect()}
    assert rows == {2**60 + 1: 2**61 + 7, 2**60 + 3: 2**61 + 7}


def test_asof_join_matched_row_nulls_not_resurrected(spark):
    # the matched right row has v=NULL: the output must carry THAT row's
    # NULL, not backfill 'a' from the older right row (review finding)
    left = spark.createDataFrame([("k", 12, 1)], ["k", "ts", "id"])
    right = spark.createDataFrame(
        [("k", 5, "a"), ("k", 10, None)], ["k", "ts", "v"]
    )
    out = T.asof_join(left, right, key="k", payload={"v": "v"}).collect()
    assert len(out) == 1 and out[0]["v"] is None
    # and a multi-column payload must come from ONE right row, never mixed
    right2 = spark.createDataFrame(
        [("k", 5, "a", 1), ("k", 10, None, 2)], ["k", "ts", "v", "n"]
    )
    out2 = T.asof_join(
        left, right2, key="k", payload={"v": "v", "n": "n"}
    ).collect()
    assert out2[0]["v"] is None and out2[0]["n"] == 2


def test_asof_join_null_keys_match_nothing(spark):
    # SQL equality: NULL keys never match — a NULL-key left row keeps
    # NULL payload even when a NULL-key right row sorts before it
    left = spark.createDataFrame(
        [(None, 10, 1), ("k", 10, 2)], "k string, ts long, id long"
    )
    right = spark.createDataFrame(
        [(None, 5, "ghost"), ("k", 5, "real")], "k string, ts long, v string"
    )
    got = {
        r["id"]: r["v"]
        for r in T.asof_join(left, right, key="k", payload={"v": "v"}).collect()
    }
    assert got == {1: None, 2: "real"}


def test_asof_join_non_identifier_column_names(spark):
    # payload/left columns that are not plain identifiers must survive
    # (the cast uses DataType objects, not simpleString DDL)
    left = spark.createDataFrame([(1, "k", 10)], ["page-rank", "k", "ts"])
    right = spark.createDataFrame([("k", 5, 42)], ["k", "ts", "n"])
    out = T.asof_join(left, right, key="k", payload={"n": "view count"})
    row = out.collect()[0]
    assert row["page-rank"] == 1 and row["view count"] == 42
