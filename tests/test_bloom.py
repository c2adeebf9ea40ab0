"""Distributed Bloom filter (operators/bloom.py): no-false-negative
guarantee, measured false-positive rate vs the configured budget,
63-bit word-packing edge bits, decontaminate superset property vs the
exact path, DuckDB-mirror parity, and the broadcast plan shape."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from posextract_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_decontaminate_sql,
    bloom_params,
    bloom_probe,
    decontaminate_bloom,
)
from posextract_spark.operators.mldata import decontaminate

M = 63 * 64  # small filter so tests exercise dense words
K = 4


def _vals(spark, names):
    return spark.createDataFrame([(n,) for n in names], "value string")


def test_no_false_negatives_and_fp_budget(spark):
    members = [f"item{i}" for i in range(300)]
    f = bloom_build(_vals(spark, members), m_bits=M, k=K)
    got = {r["value"]: r["in_bloom"] for r in bloom_probe(_vals(spark, members), f, m_bits=M, k=K).collect()}
    assert all(v == 1 for v in got.values())  # the Bloom guarantee
    others = [f"other{i}" for i in range(1000)]
    fp = sum(
        r["in_bloom"]
        for r in bloom_probe(_vals(spark, others), f, m_bits=M, k=K).collect()
    )
    # 300 items in 4032 bits at k=4 -> theoretical fp ~ 8%; assert a
    # loose 2x ceiling so the test pins "filter works", not RNG luck
    assert fp / 1000 < 0.16


def test_word_packing_uses_all_63_bits_and_no_bit63(spark):
    # enough values to touch every bit position with high probability
    f = bloom_build(_vals(spark, [f"v{i}" for i in range(2000)]), m_bits=M, k=K).collect()
    assert all(0 <= r["word_idx"] < M // WORD_BITS for r in f)
    # bit 63 must never be set (packed layout keeps every word positive)
    assert all(r["bits"] > 0 for r in f)
    # dense fill: some word should have its top usable bit (62) set
    assert any((r["bits"] >> 62) & 1 for r in f)


def test_params_math():
    m, k = bloom_params(1000, 0.01)
    assert m % WORD_BITS == 0 and 9000 < m < 11000 and 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)
    with pytest.raises(ValueError):
        bloom_build(None, m_bits=100)  # not a multiple of WORD_BITS


def test_decontaminate_superset_of_exact(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 35))))
        for i in range(150)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    exact = {r["doc_id"]: r["n_contaminated"] for r in decontaminate(docs, ev).collect()}
    bl = {
        r["doc_id"]: r["n_contaminated"]
        for r in decontaminate_bloom(docs, ev, m_bits=63 * 128, k=4).collect()
    }
    # never a false negative: every exactly-contaminated doc is flagged,
    # with a count at least the exact count
    assert set(exact) <= set(bl)
    for d, n in exact.items():
        assert bl[d] >= n
    assert exact  # corpus must carry signal


def test_duckdb_parity(spark):
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(14)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(140)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf, "doc_id long, text string")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    got = (
        decontaminate_bloom(docs, ev, m_bits=63 * 256, k=5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(bloom_decontaminate_sql(63 * 256, 5))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert len(got) > 0


def test_probe_plan_is_broadcast(spark):
    f = bloom_build(_vals(spark, ["a", "b"]), m_bits=M, k=K)
    plan = (
        bloom_probe(_vals(spark, ["a", "c"]), f, m_bits=M, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the filter lookup must broadcast the word rows, never shuffle the
    # probed stream against them
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
