"""N-gram LM count tables, LM-familiarity scoring, and the KMV distinct
sketch: pure-Python brute mirrors + DuckDB builder parity + the sketch's
accuracy/invariance properties."""

import random

import duckdb
import pandas as pd
import pytest

from posextract_spark.operators import sketches as sk
from posextract_spark.operators import textops as tx


def _duck(pdf: pd.DataFrame, sql: str, rel: str = "documents") -> pd.DataFrame:
    con = duckdb.connect()
    con.register(rel, pdf)
    out = con.execute(sql).df()
    con.close()
    return out


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_match(sdf, pdf_expected: pd.DataFrame):
    pd.testing.assert_frame_equal(
        _norm(sdf.toPandas()), _norm(pdf_expected), check_dtype=True
    )


def _words(text: str) -> list[str]:
    return [w for w in text.lower().split(" ") if w]


def brute_ngrams(texts, n):
    grams = {}
    for t in texts:
        ws = _words(t)
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    return grams


def _random_docs(seed):
    rng = random.Random(seed)
    vocab = ["the", "cat", "sat", "on", "mat", "a", "b"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10))))
        for i in range(50)
    ]
    rows += [(50, ""), (51, "one"), (52, "  double  spaced  ")]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.mark.parametrize("seed,n,min_count", [(1, 2, 1), (2, 3, 2)])
def test_ngram_counts_parity(spark, seed, n, min_count):
    pdf = _random_docs(seed)
    got = tx.ngram_counts(spark.createDataFrame(pdf), n=n, min_count=min_count)
    want = {
        g: c for g, c in brute_ngrams(pdf["text"], n).items() if c >= min_count
    }
    assert {r["ngram"]: r["n_count"] for r in got.collect()} == want
    _assert_match(
        got,
        _duck(pdf, "WITH _d AS (SELECT 1)"
              + tx.ngram_counts_sql("documents", n=n, min_count=min_count)),
    )


def test_ngram_count_of_counts_parity(spark):
    pdf = _random_docs(3)
    got = tx.ngram_count_of_counts(spark.createDataFrame(pdf), n=2)
    counts = list(brute_ngrams(pdf["text"], 2).values())
    want = {c: counts.count(c) for c in set(counts)}
    assert {r["n_count"]: r["n_ngrams"] for r in got.collect()} == want
    _assert_match(
        got,
        _duck(pdf, "WITH _d AS (SELECT 1)"
              + tx.ngram_count_of_counts_sql("documents", n=2)),
    )


def test_lm_familiarity_handcrafted(spark):
    # corpus bigram counts: "a b"x3, "b a"x2, "b c"x1, "c d"x1
    rows = [
        (1, "a b a b"),      # grams: a b, b a, a b -> (3+2+3)//3 = 2
        (2, "a b c d"),      # grams: a b, b c, c d -> (3+1+1)//3 = 1
        (3, "solo"),         # 0 grams -> (0, 0)
        (4, ""),             # 0 grams -> (0, 0)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = {
        r["id"]: (r["n_grams"], r["familiarity"])
        for r in tx.lm_familiarity(spark.createDataFrame(pdf), n=2).collect()
    }
    assert got == {1: (3, 2), 2: (3, 1), 3: (0, 0), 4: (0, 0)}


@pytest.mark.parametrize("seed", [4, 9])
def test_lm_familiarity_parity(spark, seed):
    pdf = _random_docs(seed)
    got = tx.lm_familiarity(spark.createDataFrame(pdf), n=2)
    assert got.count() == len(pdf)  # every doc gets a row
    _assert_match(
        got,
        _duck(pdf, "WITH _d AS (SELECT 1)"
              + tx.lm_familiarity_sql("documents", n=2)),
    )


# --- KMV distinct sketch -----------------------------------------------------


def test_kmv_parity_and_nulls(spark):
    rng = random.Random(7)
    rows = [
        (f"h{i % 4}", f"http://h{i % 4}.com/p{rng.randint(0, 250)}")
        for i in range(1500)
    ]
    rows += [("hnull", None), ("hnull", None), ("hnull", "only")]
    pdf = pd.DataFrame(rows, columns=["host", "url"])
    got = sk.distinct_kmv(spark.createDataFrame(pdf), "host", "url", k=32)
    _assert_match(
        got,
        _duck(pdf, "WITH _d AS (SELECT 1)"
              + sk.distinct_kmv_sql("urls", "host", "url", k=32), rel="urls"),
    )
    # NULLs ignored: the 1-value group has 1 bucket and (b-1)... = 0
    row = {r["host"]: r for r in got.collect()}["hnull"]
    assert row["n_buckets"] == 1 and row["est_distinct"] == 0


def test_kmv_accuracy_and_duplicate_invariance(spark):
    true_n = 20_000
    once = pd.DataFrame(
        [("h", f"u{j}") for j in range(true_n)], columns=["host", "url"]
    )
    twice = pd.concat([once, once], ignore_index=True)
    est1 = sk.distinct_kmv(spark.createDataFrame(once), "host", "url", k=256).collect()[0]
    est2 = sk.distinct_kmv(spark.createDataFrame(twice), "host", "url", k=256).collect()[0]
    # duplicates never move the sketch (same hashes, same mins)
    assert (est1["n_buckets"], est1["est_distinct"]) == (
        est2["n_buckets"], est2["est_distinct"]
    )
    # documented regime: ~1/sqrt(k) relative error for n >> k
    assert abs(est1["est_distinct"] - true_n) / true_n < 0.15
    assert est1["n_buckets"] == 256


# --- seed relevance ----------------------------------------------------------


def brute_relevance(rows, terms, k):
    N = len(rows)
    dls = {d: len(_words(t)) for d, t in rows}
    avgdl = max(sum(dls.values()) // N, 1)
    tfs, dfs = {}, {}
    for d, t in rows:
        for w in _words(t):
            if w in terms:
                tfs[(d, w)] = tfs.get((d, w), 0) + 1
    for d, w in tfs:
        dfs[w] = dfs.get(w, 0) + 1
    sc = {}
    for (d, w), tf in tfs.items():
        idf2 = ((N + 1) // (dfs[w] + 1)).bit_length()
        sat = (1_000_000 * 44 * avgdl * tf) // (20 * avgdl * tf + 6 * avgdl + 18 * dls[d])
        sc.setdefault(d, [0, 0])
        sc[d][0] += 1
        sc[d][1] += idf2 * sat
    return [
        (d, h, s) for d, (h, s) in
        sorted(sc.items(), key=lambda kv: (-kv[1][1], kv[0]))
    ][:k]


@pytest.mark.parametrize("seed", [11, 29])
def test_seed_relevance_parity(spark, seed):
    rng = random.Random(seed)
    vocab = ["merge", "stream", "filter", "data", "spark", "the", "a"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
            for i in range(80)] + [(80, ""), (81, "MERGE Merge merge")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    terms = ["merge", "stream", "absentterm"]
    got = tx.seed_relevance_topk(spark.createDataFrame(pdf), terms, k=15)
    got_rows = [(r["id"], r["n_hits"], r["relevance_e6"]) for r in got.collect()]
    assert got_rows == brute_relevance(rows, set(terms), 15)
    _assert_match(
        got,
        _duck(pdf, "WITH _d AS (SELECT 1)" + tx.seed_relevance_topk_sql(terms, k=15)),
    )
