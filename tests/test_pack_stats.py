"""pack_stats must agree exactly with the span export it summarizes."""

from pyspark.sql import functions as F

from posextract_spark.operators.mldata import pack_sequence_spans, pack_stats


def _corpus(spark):
    rows = []
    for i in range(120):
        # lengths 0..119 words: includes zero-token docs and docs longer
        # than the budget (straddlers across several bins at budget=64)
        rows.append((i, " ".join(f"w{i}_{j}" for j in range(i))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_consistent_with_span_export(spark):
    docs = _corpus(spark)
    budget, n_buckets = 64, 8
    stats = {
        r.bucket: r
        for r in pack_stats(docs, budget=budget, n_buckets=n_buckets).collect()
    }
    spans = pack_sequence_spans(docs, budget=budget, n_buckets=n_buckets)
    per_bucket = {
        r.bucket: r
        for r in spans.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("tok_end") - F.col("tok_start")).alias("tokens"),
            F.countDistinct("seq_bin").alias("n_bins"),
            F.sum((F.col("tok_start") > 0).cast("long")).alias("carryovers"),
        )
        .collect()
    }
    assert set(stats) == set(per_bucket)
    for b, s in stats.items():
        e = per_bucket[b]
        assert s.n_spans == e.n_spans
        assert s.total_tokens == e.tokens
        assert s.n_bins == e.n_bins
        # every straddling doc re-enters later bins with tok_start > 0;
        # carryover spans per doc = bins touched - 1, so:
        assert e.carryovers == s.n_spans - (s.n_docs - _n_zero_docs(b))
        assert s.waste_tokens == s.n_bins * budget - s.total_tokens
        assert 0 <= s.waste_tokens < budget  # waste only in the tail bin


_ZERO_DOCS = None


def _n_zero_docs(bucket):
    """zero-token docs per bucket (doc 0 is the only empty text)."""
    import hashlib

    h = int(hashlib.md5(b"0").hexdigest()[:15], 16) % 8
    return 1 if bucket == h else 0


def test_straddler_count_matches_definition(spark):
    docs = _corpus(spark)
    out = pack_stats(docs, budget=64, n_buckets=1).collect()
    assert len(out) == 1
    s = out[0]
    # single bucket: total tokens = sum 0..119 = 7140 -> 112 bins of 64
    assert s.total_tokens == sum(range(120))
    assert s.n_bins == (s.total_tokens - 1) // 64 + 1
    # straddlers touch >= 2 bins (possibly 3+: a 119-token doc can cross
    # two boundaries), so spans exceed straddler+doc counting from below
    assert s.n_spans >= s.n_straddling + (s.n_docs - 1)  # one zero-token doc
    assert s.n_straddling > 0  # many docs are longer than the 64 budget

    # definition check against the span export: a straddling doc is
    # exactly a doc appearing in more than one seq_bin
    spans = pack_sequence_spans(docs, budget=64, n_buckets=1)
    n_multi = (
        spans.groupBy("doc_id")
        .agg(F.countDistinct("seq_bin").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert s.n_straddling == n_multi
