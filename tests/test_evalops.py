"""Eval-pipeline operator tests (P5-P8)."""

from pyspark.sql import functions as F

from posextract_spark.operators.evalops import (
    stratified_take,
    syntax_check,
    tag_sentence,
    validate_data,
)


def _df(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_validate_data(spark):
    rows = ["Hello world one two", "hon.", "lower start text", "Valid line here"]
    out = validate_data(_df(spark, rows)).collect()
    assert {r.text for r in out} == {"Hello world one two", "Valid line here"}
    assert {r.num_words for r in out} == {4, 3}


def test_syntax_check_two_nouns(spark):
    rows = ["data scan table", "the fast scan", "data row line"]
    out = {r.doc_id: r.syntax_check for r in syntax_check(_df(spark, rows)).collect()}
    assert out == {0: "valid", 1: None, 2: "valid"}


def test_tag_sentence_branches(spark):
    rows = [
        "Which data is in the table?",  # interrogative (2nd word NOUN)
        "data scan, table merge",  # comp (comma)
        "fast scan data today",  # leftward: ADJ first, VERB second
        "data scan table",  # none
    ]
    out = {r.doc_id: r.tag for r in tag_sentence(_df(spark, rows)).collect()}
    assert out == {
        0: "interrogative_sent",
        1: "comp_sent",
        2: "leftward_sent",
        3: None,
    }


def test_stratified_take_deterministic(spark):
    df = _df(spark, ["data scan, x"] * 5 + ["fast scan data"] * 5)
    tagged = tag_sentence(df)
    take = stratified_take(tagged, "tag", "doc_id", n_per_tag=2)
    got = sorted((r.tag, r.doc_id) for r in take.collect())
    assert got == [
        ("comp_sent", 0),
        ("comp_sent", 1),
        ("leftward_sent", 5),
        ("leftward_sent", 6),
    ]


def test_sample_n_deterministic_across_parallelism(spark):
    from posextract_spark.operators.evalops import sample_n

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(r.doc_id for r in sample_n(docs, 20, seed=3).collect())
    b = sorted(
        r.doc_id for r in sample_n(docs.repartition(17), 20, seed=3).collect()
    )
    assert a == b and len(a) == 20
    # different seed -> different draw
    c = sorted(r.doc_id for r in sample_n(docs, 20, seed=4).collect())
    assert a != c
    # top-n merge, not a global sort
    plan = sample_n(docs, 20, seed=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sample_fraction_scan_side_and_stable(spark):
    from posextract_spark.operators.evalops import sample_fraction

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(r.doc_id for r in sample_fraction(docs, 0.2, seed=3).collect())
    b = sorted(
        r.doc_id
        for r in sample_fraction(docs.repartition(17), 0.2, seed=3).collect()
    )
    assert a == b
    n = docs.count()
    assert 0.05 * n < len(a) < 0.5 * n  # loose Bernoulli bounds
    plan = sample_fraction(docs, 0.2, seed=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_random_sample_api_parity(spark):
    from posextract_spark.operators.evalops import random_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert random_sample(docs, n=10).count() == 10
    assert 0 < random_sample(docs, fraction=0.3, seed=1).count() < docs.count()


def test_clean_text_nfc_and_strips(spark):
    from posextract_spark.operators.textops import clean_text

    df = spark.createDataFrame(
        [(1, "café x"), (2, "a\x07b  c"), (3, "​z​"), (4, "  ok  ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in clean_text(df).collect()}
    assert out[1].clean_text == "café x"  # NFC composed
    assert out[1].n_chars_raw == 7 and out[1].n_chars_clean == 6
    assert out[2].clean_text == "a b c"  # control -> space, runs collapsed
    assert out[3].clean_text == "z"  # zero-width removed
    assert out[4].clean_text == "ok"  # trimmed


def test_repetition_stats_known_values(spark):
    from posextract_spark.operators.textops import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b c"), (2, "x y x y x y"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.dup_word_frac_e4, r.top_bigram_frac_e4, r.max_word_run)
           for r in repetition_stats(df).collect()}
    assert out[1] == (4000, 5000, 3)   # 2/5 dup, 'a a' 2/4 bigrams, run aaa
    assert out[2] == (6666, 6000, 1)   # 4/6 dup, 'x y' 3/5 bigrams
    assert out[3] == (0, 0, 0)
    assert out[4] == (0, 0, 1)


def test_mask_pii_known_values(spark):
    from posextract_spark.operators.textops import mask_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@c.io or x_y%z@d.example.com today"),
            (2, "go to https://a.test/p?q=1 from 192.168.0.1 now"),
            (3, "no pii here at all"),
            (4, "bad ip 999.1.1.1 still masked by the simple pattern"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in mask_pii(df).collect()}
    assert out[1].n_email == 2 and out[1].masked_text == "mail <EMAIL> or <EMAIL> today"
    assert (out[2].n_url, out[2].n_ip) == (1, 1)
    assert out[2].masked_text == "go to <URL> from <IP> now"
    assert out[3].masked_text == "no pii here at all"
    assert out[4].n_ip == 1  # documented: simple pattern, no octet range check


def test_chunk_documents_windows(spark):
    import pytest as _pytest

    from posextract_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x y")], "doc_id long, text string"
    )
    out = sorted(
        (r.doc_id, r.chunk_id, r.n_words_chunk, r.chunk_text)
        for r in chunk_documents(df, chunk_size=4, overlap=1).collect()
    )
    assert out == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),
        (1, 2, 1, "g"),
        (3, 0, 2, "x y"),
    ]
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_stratified_take_two_phase_equals_naive_window(spark):
    """r5: the salted two-phase top-n must return EXACTLY the naive
    single-window result (per-bucket first-n is a superset of global
    first-n), while no window partition carries a whole tag."""
    from pyspark.sql import Window

    from posextract_spark.operators.evalops import stratified_take

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tag"), (F.col("id") % 3).cast("string")).alias("tag"),
    )
    got = {(r.doc_id, r.tag) for r in stratified_take(df, "tag", "doc_id", n_per_tag=7).collect()}
    w = Window.partitionBy("tag").orderBy("doc_id")
    want = {
        (r.doc_id, r.tag)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .drop("_rn")
        .collect()
    }
    assert got == want and len(got) == 21
    # phase-1 window must be salted (tag alone never partitions raw data)
    plan = stratified_take(df, "tag", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
