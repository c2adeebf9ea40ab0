"""Long-document complexity guards.

The synthetic corpus averages ~50 words/doc, so the per-document
complexity of the array operators is invisible to the oracle gate. Real
web pages run to thousands of words, and two O(words^2)-per-document
regressions shipped green in r3 precisely because short docs hid them:
(a) signals that re-split the text per reference, (b) HOF lambdas that
re-evaluate a non-attribute array subtree per element (the shingle/chunk
slice). This suite runs the word-array operators on 64 docs x 4000 words
— where the quadratic forms take minutes and the fixed linear forms take
seconds — and asserts exact closed-form invariants so the run also
verifies correctness at lengths the parquet corpus never reaches.
"""

import time

import pytest
from pyspark.sql import functions as F

N_DOCS = 64
N_WORDS = 4000
_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def long_docs(spark):
    # deterministic 4000-word docs; doc_id rotates the vocab so texts are
    # distinct but share shingles only within a doc (vocab cycles with
    # period 8 < shingle width 5's span, so shingles repeat per doc)
    rows = [
        (i, " ".join(_VOCAB[(i + k) % len(_VOCAB)] for k in range(N_WORDS)))
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8).persist()


def test_minhash_signatures_linear_on_long_docs(long_docs):
    from posextract_spark.operators.dedup import MINHASH_SEEDS, minhash_signatures

    t0 = time.time()
    rows = minhash_signatures(long_docs).collect()
    dt = time.time() - t0
    assert len(rows) == N_DOCS * MINHASH_SEEDS
    # vocab cycles with period 8 -> every doc has exactly 8 DISTINCT
    # shingles; rotations share the same shingle SET, so all docs agree
    # on every per-seed minimum
    sigs = {}
    for r in rows:
        sigs.setdefault(r.seed, set()).add(r.minhash)
    assert all(len(v) == 1 for v in sigs.values())
    assert dt < 120, f"minhash on long docs took {dt:.0f}s — quadratic regression?"


def test_chunk_documents_linear_and_exact_on_long_docs(long_docs):
    from posextract_spark.operators.textops import chunk_documents

    t0 = time.time()
    out = chunk_documents(long_docs, chunk_size=64, overlap=16)
    agg = out.groupBy().agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum("n_words_chunk").alias("n_words")
    ).collect()[0]
    dt = time.time() - t0
    # stride 48: ceil(4000/48) = 84 chunks/doc; the last covers words
    # [3984, 4000) = 16 words, the other 83 are full 64-word windows
    assert agg.n_chunks == N_DOCS * 84
    assert agg.n_words == N_DOCS * (83 * 64 + 16)
    assert dt < 120, f"chunking long docs took {dt:.0f}s — quadratic regression?"


def test_repetition_and_quality_on_long_docs(long_docs):
    from posextract_spark.operators.textops import corpus_quality_filter, repetition_stats

    t0 = time.time()
    rep = repetition_stats(long_docs).collect()
    keep = corpus_quality_filter(long_docs).agg(F.sum("keep")).collect()[0][0]
    dt = time.time() - t0
    assert len(rep) == N_DOCS
    for r in rep:
        # every word appears 500x -> dup fraction = (4000 - 8)/4000
        assert r.dup_word_frac_e4 == int((N_WORDS - 8) * 10000 / N_WORDS)
        # vocab period 8 -> all 8 distinct bigrams equally frequent:
        # modal bigram ~ (3999/8) of 3999 bigrams
        assert r.max_word_run == 1
    # all docs are dup-heavy + wrong mean length -> everything dropped
    assert keep == 0
    assert dt < 120, f"repetition/quality on long docs took {dt:.0f}s"


def test_simhash_linear_on_long_docs(long_docs):
    from posextract_spark.operators.dedup import simhash

    t0 = time.time()
    rows = simhash(long_docs).collect()
    dt = time.time() - t0
    assert len(rows) == N_DOCS
    # identical word MULTISET per doc (rotations) -> identical simhash
    assert len({r.simhash for r in rows}) == 1
    assert dt < 120, f"simhash on long docs took {dt:.0f}s"


def test_pack_sequences_linear_on_long_docs(long_docs):
    from posextract_spark.operators.mldata import pack_sequences

    t0 = time.time()
    rows = pack_sequences(long_docs, budget=512, n_buckets=4).collect()
    dt = time.time() - t0
    assert len(rows) == N_DOCS
    # every doc is exactly N_WORDS tokens; within a bucket the k-th doc
    # (id order) starts at offset k * N_WORDS
    by_bucket = {}
    for r in rows:
        assert r.n_tokens == N_WORDS
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows_b in by_bucket.values():
        rows_b.sort(key=lambda r: r.doc_id)
        for k, r in enumerate(rows_b):
            assert r.bin_offset == k * N_WORDS
            assert r.seq_bin == (k * N_WORDS) // 512
    assert dt < 60, f"pack_sequences took {dt:.1f}s on long docs"


def test_decontaminate_linear_on_long_docs(long_docs):
    from posextract_spark.operators.mldata import decontaminate

    # eval = the first doc; all docs share its shingle SET (vocab
    # rotations), so every doc is fully contaminated with exactly the
    # 8 distinct shingles of the cycle
    ev = long_docs.filter(F.col("doc_id") == 0)
    t0 = time.time()
    out = {r.doc_id: r.n_contaminated for r in decontaminate(long_docs, ev).collect()}
    dt = time.time() - t0
    assert len(out) == N_DOCS
    assert set(out.values()) == {8}
    assert dt < 60, f"decontaminate took {dt:.1f}s on long docs"
