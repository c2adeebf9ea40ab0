"""Training-data export operators (operators/mldata.py): semantics + the
scale plan shapes (split is scan-side, packing shuffles once on bucket,
decontamination broadcast-joins the eval side)."""

import hashlib

from pyspark.sql import functions as F

from posextract_spark.operators.mldata import decontaminate, hash_split, pack_sequences


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h100(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100


def test_hash_split_deterministic_and_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.split for r in hash_split(docs).select("doc_id", "split").collect()}
    # python mirror of the md5 threshold — cross-checks hash AND bucketing
    for doc_id, split in got.items():
        h = _h100(doc_id)
        want = "train" if h < 90 else ("val" if h < 95 else "test")
        assert split == want, (doc_id, h, split, want)
    # partition-invariance: same assignment under a different partitioning
    reparted = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(13)).select("doc_id", "split").collect()
    }
    assert got == reparted


def test_hash_split_scan_side_no_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(hash_split(docs).select("doc_id", "split"))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_hash_split_rejects_bad_percents(spark):
    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        hash_split(docs, train_pct=96, val_pct=5)


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=100, n_buckets=4).collect()
    assert len(out) == docs.count()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r.doc_id)
        # bin_offset is the exclusive running sum of n_tokens in id order
        cum = 0
        for r in rows:
            assert r.bin_offset == cum, (bucket, r.doc_id)
            assert r.seq_bin == cum // 100
            cum += r.n_tokens
    # every doc appears exactly once regardless of bucket count
    assert sum(len(v) for v in by_bucket.values()) == len(out)


def test_pack_sequences_single_bucket_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(pack_sequences(docs))
    # exactly one Exchange: the hash shuffle onto buckets. The per-bucket
    # Window is the deliberate, bounded sequential core of packing —
    # n_buckets (not corpus size) caps what one task sorts.
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(bucket" in plan


def test_decontaminate_eval_docs_flag_themselves(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    out = {r.doc_id: r.n_contaminated for r in decontaminate(docs, ev).collect()}
    # every eval doc with >= 5 words contains 100% of its own shingles
    from posextract_spark.operators.dedup import SHINGLE_N

    for r in ev.select("doc_id", "text").collect():
        words = [w for w in r.text.split(" ") if w]
        n_shingles = len({" ".join(words[i : i + SHINGLE_N]) for i in range(len(words) - SHINGLE_N + 1)}) if len(words) >= SHINGLE_N else 0
        if n_shingles:
            assert out.get(r.doc_id, 0) >= n_shingles, r.doc_id


def test_decontaminate_broadcasts_eval_side(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    plan = _plan(decontaminate(docs, ev))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_disjoint_corpora_empty(spark):
    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(2, "one two three four five six")], "doc_id bigint, text string"
    )
    assert decontaminate(a, b).count() == 0
