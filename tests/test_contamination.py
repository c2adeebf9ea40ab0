"""Fuzzy contamination family: token-coverage fractions
(mldata.contaminated_token_fraction / decontaminate_fuzzy), minhash
near-dup eval decontamination (dedup.neardup_contamination), and the
tokenizer fertility report (mldata.bpe_fertility_stats) — semantics
pinned on hand-computable corpora plus the plan shapes."""

from pyspark.sql import functions as F

from posextract_spark.operators.dedup import neardup_contamination
from posextract_spark.operators.mldata import (
    bpe_fertility_stats,
    contaminated_token_fraction,
    decontaminate_fuzzy,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_fraction_single_match_covers_five_tokens(spark):
    # train doc: 10 words, ONE eval 5-gram sits at positions 0..4
    train = _docs(spark, [(1, "a b c d e x1 x2 x3 x4 x5")])
    ev = _docs(spark, [(100, "a b c d e")])
    [r] = contaminated_token_fraction(train, ev).collect()
    assert (r.doc_id, r.n_words, r.covered_tokens, r.frac_e6) == (1, 10, 5, 500000)


def test_token_fraction_overlapping_matches_union_not_sum(spark):
    # eval "a b c d e f" contributes shingles at train positions 0 and 1;
    # naive sum would say 10 covered tokens, the interval union is 6
    train = _docs(spark, [(1, "a b c d e f y1 y2 y3 y4 y5 y6")])
    ev = _docs(spark, [(100, "a b c d e f")])
    [r] = contaminated_token_fraction(train, ev).collect()
    assert (r.n_words, r.covered_tokens, r.frac_e6) == (12, 6, 500000)


def test_token_fraction_full_copy_is_one(spark):
    train = _docs(spark, [(1, "p q r s t u v")])
    ev = _docs(spark, [(100, "p q r s t u v")])
    [r] = contaminated_token_fraction(train, ev).collect()
    assert (r.covered_tokens, r.frac_e6) == (7, 1000000)


def test_token_fraction_clean_and_short_docs_emit_no_row(spark):
    train = _docs(
        spark,
        [
            (1, "n1 n2 n3 n4 n5 n6"),  # clean: no eval shingle
            (2, "a b c d"),  # < SHINGLE_N words: unmeasurable
        ],
    )
    ev = _docs(spark, [(100, "a b c d e")])
    assert contaminated_token_fraction(train, ev).count() == 0


def test_token_fraction_broadcasts_eval_side(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    plan = _plan(contaminated_token_fraction(docs, ev))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_fuzzy_threshold_keeps_light_contamination(spark):
    # doc 1: 5/20 tokens covered (25%); doc 2: full copy (100%); doc 3 clean
    train = _docs(
        spark,
        [
            (1, "a b c d e " + " ".join(f"z{i}" for i in range(15))),
            (2, "a b c d e"),
            (3, "m1 m2 m3 m4 m5 m6"),
        ],
    )
    ev = _docs(spark, [(100, "a b c d e")])
    kept = sorted(
        r.doc_id for r in decontaminate_fuzzy(train, ev, max_frac_e6=500000).collect()
    )
    assert kept == [1, 3]
    # tighter threshold drops the 25% doc too
    kept = sorted(
        r.doc_id for r in decontaminate_fuzzy(train, ev, max_frac_e6=200000).collect()
    )
    assert kept == [3]


def test_neardup_contamination_flags_exact_copy_all_bands(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words nothing shared here at all ok fine"),
        ],
    )
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog today")])
    out = {r.doc_id: r for r in neardup_contamination(train, ev).collect()}
    assert list(out) == [1]
    # 8 seeds / band_size 2 -> 4 bands, all colliding on an exact copy
    assert out[1].n_hit_bands == 4
    assert out[1].matched_eval_id == 100
    # min_bands above the total band count can never flag
    assert neardup_contamination(train, ev, min_bands=5).count() == 0


def test_bpe_fertility_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "ab cde", "s1"),
            (2, "ab ab", "s2"),
        ],
        "doc_id bigint, text string, source string",
    )
    # no merges: every word tokenizes to its characters
    out = {r.source: r for r in bpe_fertility_stats(docs, []).collect()}
    r = out["s1"]  # 2 words, 5 chars-in-words, text length 6
    assert (r.n_docs, r.ws_tokens, r.bpe_tokens, r.n_chars) == (1, 2, 5, 6)
    assert r.fertility_e6 == 2500000  # 5 bpe tokens / 2 words
    assert r.chars_per_bpe_e6 == 1200000  # 6 chars / 5 tokens
    # one merge fuses 'a'+'b' -> "ab" becomes a single token
    out = {r.source: r for r in bpe_fertility_stats(docs, [("a", "b")]).collect()}
    assert out["s1"].bpe_tokens == 4  # ab->1, cde->3
    assert out["s2"].bpe_tokens == 2


def test_bpe_fertility_stats_empty_text_group_zero_guarded(spark):
    docs = spark.createDataFrame(
        [(1, "", "empty")], "doc_id bigint, text string, source string"
    )
    [r] = bpe_fertility_stats(docs, []).collect()
    assert (r.n_docs, r.ws_tokens, r.bpe_tokens, r.fertility_e6) == (1, 0, 0, 0)
