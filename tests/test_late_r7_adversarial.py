"""Adversarial-input sweep for the late-r7 text operators: empty text,
NULL text, whitespace runs, one giant word, control bytes, unicode,
and a 10k-word document must never crash and must land in the
documented skip/measure buckets."""

import pytest
from pyspark.sql import functions as F

NASTY = [
    (1, ""),
    (2, None),
    (3, "   "),
    (4, "x" * 5000),
    (5, "a\x01b c\x02d e f g h i j"),
    (6, "naïve café Straße 試験 😀 emoji words here now ok"),
    (7, " ".join(f"w{i % 97}" for i in range(10_000))),
    (8, "dup dup dup dup dup dup dup dup"),
]


@pytest.fixture(scope="module")
def nasty(spark):
    return spark.createDataFrame(NASTY, "doc_id bigint, text string")


def test_contamination_family_survives_nasty_input(spark, nasty):
    from posextract_spark.operators.mldata import (
        contaminated_token_fraction,
        decontaminate_fuzzy,
    )

    ev = nasty.filter(F.col("doc_id") == 7)
    rows = contaminated_token_fraction(nasty, ev).collect()
    by = {r.doc_id: r for r in rows}
    # doc 7 fully covers itself
    assert by[7].frac_e6 == 1000000
    # empty/NULL/whitespace/giant-single-word docs are unmeasurable: no row
    for short_id in (1, 2, 3, 4):
        assert short_id not in by
    kept = {r.doc_id for r in decontaminate_fuzzy(nasty, ev).collect()}
    assert 7 not in kept and {1, 2, 3, 4} <= kept


def test_dsir_and_winnow_survive_nasty_input(spark, nasty):
    from posextract_spark.operators.dedup import winnow_fingerprints
    from posextract_spark.operators.mldata import dsir_scores

    out = dsir_scores(nasty, nasty.filter(F.col("doc_id") == 7))
    got = {r.doc_id for r in out.collect()}
    # >= 2 words required for a bigram; NULL/empty/single-word drop out
    assert {5, 6, 7, 8} <= got and not {1, 2, 3, 4} & got

    fp = winnow_fingerprints(nasty)
    by = {}
    for r in fp.collect():
        by.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert 7 in by and len(by[7]) > 0
    assert 4 not in by  # one giant word -> no 5-gram


def test_hdr_quantiles_survive_extreme_values(spark):
    from posextract_spark.operators.sketches import hdr_quantiles

    df = spark.createDataFrame(
        [(0,), (1,), (2**40,), (2**52,)], "v long"
    )
    got = {r.q_e6: r.est_value for r in hdr_quantiles(df, "v").collect()}
    # p99 lands in 2^52's slot; lower bound within 2^-5 relative error
    assert got[990000] <= 2**52 < got[990000] * (1 + 2**-5)
    assert got[500000] <= 2


def test_datacard_counts_nasty_docs_without_crashing(spark, nasty):
    from posextract_spark.operators.diagnostics import corpus_datacard

    df = nasty.select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source")
    )
    got = {r.metric: r.value for r in corpus_datacard(df).collect()}
    assert got["n_docs"] == len(NASTY)
    assert got["n_exact_dup_docs"] == 0
