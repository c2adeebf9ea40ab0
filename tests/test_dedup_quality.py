"""Dedup-quality family: exact pairwise shingle Jaccard
(ngram_jaccard_pairs) and the LSH recall/precision report
(minhash_pair_quality) — the dedup analogue of the ANN recall floors in
test_similarity_scale.py. Full parameter sweep + S-curve lives in
tools/dedup_quality.py -> DEDUP_QUALITY.md.
"""

from pyspark.sql import functions as F

from posextract_spark.operators.dedup import (
    minhash_pair_quality,
    ngram_jaccard_pairs,
)


def _doc(words):
    return " ".join(words)


def _w(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_jaccard_pairs_exact_hand_computed(spark):
    """24-word docs sharing a 19-word prefix: each has 20 shingles; the
    shared ones are exactly those fully inside the prefix (15), so
    J = 15 / (20 + 20 - 15) = 0.6."""
    a = _w("a", 24)
    b = a[:19] + _w("b", 5)
    docs = spark.createDataFrame(
        [(0, _doc(a)), (1, _doc(b))], "doc_id long, text string"
    )
    rows = ngram_jaccard_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (0, 1)
    assert (r.inter, r.size_a, r.size_b) == (15, 20, 20)
    assert r.jaccard_e6 == 600000

    # min_jaccard_e6 filter is inclusive
    assert ngram_jaccard_pairs(docs, min_jaccard_e6=600000).count() == 1
    assert ngram_jaccard_pairs(docs, min_jaccard_e6=600001).count() == 0


def test_disjoint_docs_emit_no_pair(spark):
    docs = spark.createDataFrame(
        [(0, _doc(_w("a", 10))), (1, _doc(_w("b", 10)))],
        "doc_id long, text string",
    )
    assert ngram_jaccard_pairs(docs).count() == 0


def test_pair_quality_exact_dups_full_recall_and_precision(spark):
    """3 exact-dup pairs + 4 mutually disjoint docs: exact duplicates
    agree on every minhash, so every band collides -> recall = 1.0 at
    every threshold; disjoint docs share no shingle, so (modulo a 60-bit
    band-key collision, deterministically absent for this corpus) they
    produce no candidate pair -> precision = 1.0."""
    rows = []
    for d in range(3):
        text = _doc(_w(f"dup{d}_", 12))
        rows += [(2 * d, text), (2 * d + 1, text)]
    for j in range(4):
        rows.append((100 + j, _doc(_w(f"solo{j}_", 12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.thr_e6: r for r in minhash_pair_quality(docs).collect()}
    assert set(out) == {500000, 700000, 900000}
    for r in out.values():
        assert r.n_true == 3
        assert r.n_caught == 3
        assert r.n_cand == 3
        assert r.recall_e6 == 1000000
        assert r.precision_e6 == 1000000


def test_pair_quality_misses_are_counted_not_hidden(spark):
    """A J=0.6 pair that the bands happen to miss must show up as
    n_true > n_caught, never be silently dropped: with band_size=8
    (one band of all 8 minhashes) the collision probability at s=0.6 is
    s^8 ~= 1.7%, and for THIS fixture the band key differs -> caught=0."""
    a = _w("a", 24)
    b = a[:19] + _w("b", 5)
    docs = spark.createDataFrame(
        [(0, _doc(a)), (1, _doc(b))], "doc_id long, text string"
    )
    out = {
        r.thr_e6: r
        for r in minhash_pair_quality(
            docs, thresholds_e6=(500000,), band_size=8
        ).collect()
    }
    r = out[500000]
    assert r.n_true == 1
    if r.n_cand == 0:  # the expected draw for this fixture
        assert r.n_caught == 0 and r.recall_e6 == 0 and r.precision_e6 == 1000000
    else:  # if the single band ever collides, the report must stay consistent
        assert r.n_caught == r.n_cand == 1 and r.recall_e6 == 1000000


def test_pair_quality_plan_has_no_window_and_caps_forward(spark):
    """Both caps forward to the underlying operators and the whole report
    plan stays Window-free (the dedup-family discipline pinned by
    test_dedup_caps.py)."""
    docs = spark.createDataFrame(
        [(i, _doc(_w("x", 12))) for i in range(20)], "doc_id long, text string"
    )
    q = minhash_pair_quality(docs, max_shingle_bucket=8, max_bucket_width=8)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = q.collect()
    assert len(rows) == 3  # capped run still produces the 3-row report
    for r in rows:
        # identical docs: every surviving true pair is J=1 and caught
        assert r.recall_e6 == 1000000
