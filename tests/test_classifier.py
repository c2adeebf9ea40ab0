"""Bootstrapped quality classifier (operators/classifier.py): weight
polarity semantics, smoothing/default-weight behavior, empty-doc edge,
end-to-end pseudo-label composition, DuckDB-mirror parity, and the
broadcast plan shape of the scoring join."""

import random

import duckdb
import pandas as pd

from posextract_spark.operators.classifier import (
    NEUTRAL_E6,
    nb_score_documents,
    nb_token_weights,
    quality_classifier_scores,
    quality_classifier_scores_sql,
    quality_classifier_weights,
    quality_classifier_weights_sql,
)


def _labeled(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "keep", "text"]),
        schema="doc_id long, keep int, text string",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]),
        schema="doc_id long, lang string, text string",
    )


def test_weight_polarity_and_bounds(spark):
    rows = [
        (1, 1, "alpha alpha beta"),
        (2, 1, "alpha gamma"),
        (3, 0, "spam spam beta"),
        (4, 0, "spam click"),
    ]
    w = {r["token"]: r.asDict() for r in nb_token_weights(_labeled(spark, rows)).collect()}
    # positive-only token above neutral, negative-only below, and bounded
    assert w["alpha"]["weight_e6"] > NEUTRAL_E6
    assert w["spam"]["weight_e6"] < NEUTRAL_E6
    for r in w.values():
        assert 0 <= r["weight_e6"] <= 1_000_000
    # beta appears once per class with equal totals-ish -> near neutral,
    # strictly between the pure-class extremes
    assert w["spam"]["weight_e6"] < w["beta"]["weight_e6"] < w["alpha"]["weight_e6"]
    # counts are multinomial occurrences, not presence
    assert w["alpha"]["n_pos"] == 3 and w["alpha"]["n_neg"] == 0
    assert w["spam"]["n_pos"] == 0 and w["spam"]["n_neg"] == 3


def test_score_direction_and_prediction(spark):
    rows = [
        (1, 1, "good fine nice good"),
        (2, 1, "good nice words here"),
        (3, 0, "junk junk junk spam"),
        (4, 0, "spam junk awful"),
    ]
    lab = _labeled(spark, rows)
    w = nb_token_weights(lab)
    docs = _docs(
        spark,
        [
            (10, "en", "good nice fine"),
            (11, "en", "spam junk junk"),
            (12, "en", ""),
        ],
    )
    s = {r["doc_id"]: r.asDict() for r in nb_score_documents(docs, w).collect()}
    assert s[10]["score_e6"] > 0 and s[10]["pred_keep"] == 1
    assert s[11]["score_e6"] < 0 and s[11]["pred_keep"] == 0
    # empty doc: zero tokens, zero evidence, keep by convention
    assert s[12] == {"doc_id": 12, "n_tokens": 0, "score_e6": 0, "pred_keep": 1}


def test_unseen_token_gets_smoothed_default(spark):
    """Unseen tokens get the zero-count posterior, which under add-1
    smoothing leans toward the class with FEWER observed tokens
    (P(unseen|c) = 1/(T_c + V) is larger for the smaller class) — the
    standard NB behavior, asserted here so nobody 'fixes' it to neutral:
    w0 = (T_neg + V) / ((T_neg + V) + (T_pos + V))."""
    rows = [(1, 1, "a b"), (2, 0, "c d e f g h i j k l m n")]
    w = nb_token_weights(_labeled(spark, rows))
    docs = _docs(spark, [(1, "en", "zzz zzz")])
    out = nb_score_documents(docs, w).collect()[0]
    assert out["n_tokens"] == 2
    # t_pos=2, t_neg=12, V=14 -> w0 = 1e6*26 div 42 = 619047 per token
    assert out["score_e6"] == 2 * (619047 - NEUTRAL_E6)
    # and the mirror-image corpus flips the sign
    w2 = nb_token_weights(_labeled(spark, [(1, 0, "a b"), (2, 1, "c d e f g h i j k l m n")]))
    out2 = nb_score_documents(docs, w2).collect()[0]
    assert out2["score_e6"] == 2 * (380952 - NEUTRAL_E6)


def test_end_to_end_bootstrap_separates_quality(spark):
    """Composed pipeline on a corpus where the heuristic labels are driven
    by length/repetition: the learned scores must rank clean docs above
    degenerate ones even at lengths the heuristic itself would pass."""
    rng = random.Random(9)
    vocab = [f"tok{k}" for k in range(40)]
    rows = []
    for i in range(60):
        # clean: 30-60 distinct-ish five-char words
        rows.append((i, "en", " ".join(rng.choice(vocab) for _ in range(rng.randint(30, 60)))))
    for i in range(60, 100):
        # degenerate: heavy single-token repetition (too_repetitive/long_run)
        rows.append((i, "en", " ".join(["zzzzz"] * rng.randint(30, 60))))
    s = quality_classifier_scores(_docs(spark, rows)).toPandas()
    clean = s[s.doc_id < 60]["score_e6"]
    degen = s[s.doc_id >= 60]["score_e6"]
    assert clean.median() > degen.median()
    assert (degen < 0).all()  # pure-repetition docs score negative


def test_duckdb_parity_random_corpus(spark):
    rng = random.Random(17)
    vocab = [f"w{k}" for k in range(25)] + ["spam", "click", "buy"]
    rows = [
        (
            i,
            "en" if i % 7 else "xx",
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 70))),
        )
        for i in range(120)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    docs = _docs(spark, rows)
    con = duckdb.connect()
    con.register("documents", pdf)
    for fn, sql in (
        (quality_classifier_weights, quality_classifier_weights_sql()),
        (quality_classifier_scores, quality_classifier_scores_sql()),
    ):
        got = fn(docs).toPandas()
        key = got.columns[0]
        got = got.sort_values(key).reset_index(drop=True)
        want = con.execute(sql).df().sort_values(key).reset_index(drop=True)
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1).astype(got.dtypes.to_dict())
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
    con.close()


def test_scoring_join_is_broadcast(spark):
    docs = _docs(spark, [(1, "en", "a b c"), (2, "en", "b c d")])
    plan = (
        quality_classifier_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the weight-table lookup must be a broadcast hash join, never a
    # shuffle of the exploded occurrence stream against the vocab
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_source_quality_report_rollup(spark):
    """Per-source rollup: counts and keep totals reconcile with the
    underlying scores; keep_rate_e4 uses integer floor division."""
    from posextract_spark.operators.classifier import (
        quality_classifier_scores,
        source_quality_report,
    )

    rows = []
    for i in range(30):
        # source A: clean medium docs; source B: degenerate repetition
        if i % 2 == 0:
            rows.append((i, "en", "srcA", " ".join(f"tok{j}" for j in range(30))))
        else:
            rows.append((i, "en", "srcB", " ".join(["zz"] * 40)))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"]),
        "doc_id long, lang string, source string, text string",
    )
    rep = {r["source"]: r.asDict() for r in source_quality_report(docs).collect()}
    scores = quality_classifier_scores(docs).collect()
    srcof = {i: ("srcA" if i % 2 == 0 else "srcB") for i in range(30)}
    want_keep = {"srcA": 0, "srcB": 0}
    want_total = {"srcA": 0, "srcB": 0}
    for r in scores:
        want_keep[srcof[r["doc_id"]]] += r["pred_keep"]
        want_total[srcof[r["doc_id"]]] += r["score_e6"]
    for s in ("srcA", "srcB"):
        assert rep[s]["n_docs"] == 15
        assert rep[s]["n_keep"] == want_keep[s]
        assert rep[s]["total_score_e6"] == want_total[s]
        assert rep[s]["keep_rate_e4"] == 10000 * want_keep[s] // 15
    # the clean source must outrank the degenerate one
    assert rep["srcA"]["keep_rate_e4"] > rep["srcB"]["keep_rate_e4"]
