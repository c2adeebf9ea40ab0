"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "triples_per_sec": ..., ...}

The documents table at sf0.1 is ~1.5 MB of text, far too small to exercise
a 32-core executor; the bench deterministically replicates it REPLICATE
times (doc_id remapped to keep ids unique) so the extraction stage runs for
whole seconds. Throughput numbers are per *replicated* corpus. Set
SPARK_GRAFT_BENCH_REPLICATE=1 to bench the raw table.

Scaling-efficiency protocol (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and
=32 on the same input; eff = (rows/s @32) / (4 * rows/s @8). Input partition
count is fixed (>= 2*32) at both levels so the wide level is not
partition-starved.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "40"))
    n_parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "64"))

    # Pre-flight load guard AT PROCESS START — before the session build and
    # the 32-core warmup inflate the 1-minute average with our own load.
    # The r2 driver bench was noise-contaminated (28.7s recorded vs 16.7s
    # reproduced on a quiet box; this VM shows documented +-60%
    # noisy-neighbor variance). If loadavg says another heavy job is
    # running, wait briefly for it to drain and say so on stderr — the
    # stdout contract stays ONE JSON line.
    load_limit = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_LIMIT", str(max(4.0, cpus * 0.5))))
    load1_at_start = None
    load_waited = 0.0
    try:
        # up to 2 min: observed neighbor bursts on this VM routinely outlast
        # the previous 60s ceiling (BENCH/BASELINE.md r4 noise notes)
        for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAITS", "12"))):
            load1 = os.getloadavg()[0]
            if load1 <= load_limit:
                break
            print(f"bench: load1={load1:.1f} > {load_limit:.1f}, waiting 10s for quiet box",
                  file=sys.stderr)
            time.sleep(10)
            load_waited += 10.0
        load1_at_start = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    from posextract_spark.session import build_session
    from posextract_spark.operators.triples import extract_triples
    from posextract_spark.operators.pairs import extract_adj_noun_pairs
    from posextract_spark.operators.dedup import minhash_signatures, simhash
    from posextract_spark.operators.textops import (
        corpus_quality_filter,
        fingerprint,
        language_id,
        quality_score,
    )
    from posextract_spark.operators.similarity import cosine_topk

    spark = build_session(app_name="posextract-bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    docs_raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = (
            docs_raw.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
                "text",
                "lang",
            )
        )
    else:
        docs = docs_raw.select("doc_id", "text", "lang")
    docs = docs.repartition(n_parts).persist()
    n_docs = docs.count()  # materialize input outside the timed region

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()

    timings: dict[str, float] = {}
    extras: dict = {}
    all_runs: dict[str, list[float]] = {}
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    if load1_at_start is not None:
        extras["load1_at_start"] = load1_at_start
    if load_waited:
        extras["load_wait_sec"] = load_waited

    # The interpreted-HOF scan queries degrade FAR more under neighbor
    # contention than the pandas-UDF extraction (measured the same night:
    # triples 4.1 -> 4.8s while corpus_quality_filter went 1.7 -> 19-36s
    # and one text_quality_scan sample hit 124s — allocation/bandwidth-
    # heavy interpreted projections amplify CPU steal). Give those
    # volatile queries extra min-of-N samples so one clean window
    # suffices; per-run samples still expose the contamination.
    _VOLATILE = {"minhash_signatures", "simhash", "text_quality_scan",
                 "corpus_quality_filter"}

    def timed(name: str, fn):
        # min-of-N: this VM shows occasional 5-25x noisy-neighbor spikes on
        # individual queries (BENCH/BASELINE.md); a single sample can land
        # entirely inside one. The min is the honest capability number.
        # Every per-run sample is printed (stderr) and recorded (JSON
        # "runs") so a spike-contaminated session is self-diagnosing.
        n_runs = max(runs_per_query, 5) if name in _VOLATILE else runs_per_query
        best, result, samples = None, None, []
        for _ in range(n_runs):
            t0 = time.time()
            result = fn()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        all_runs[name] = samples
        print(f"bench: {name} runs={samples} min={timings[name]}", file=sys.stderr)
        return result

    # Full-width warmup: run the real extraction once untimed so every
    # executor core's python worker is spawned and has imported the kernel
    # (a limit()-style warmup collapses to one partition and warms exactly
    # one worker — the first timed run then pays ~1s import per core).
    extract_triples(docs, text_col="text", id_cols=["doc_id"], provider="svo").count()

    n_triples = timed(
        "triples_extract",
        lambda: extract_triples(docs, text_col="text", id_cols=["doc_id"], provider="svo").count(),
    )
    extras["n_docs"] = n_docs
    extras["n_triples"] = n_triples
    extras["triples_per_sec"] = round(n_triples / timings["triples_extract"], 1)
    extras["docs_per_sec"] = round(n_docs / timings["triples_extract"], 1)

    timed(
        "kg_edges",
        lambda: extract_triples(docs, text_col="text", id_cols=["doc_id"], provider="svo")
        .groupBy("subject", "verb", "object")
        .agg(F.count(F.lit(1)).alias("weight"))
        .count(),
    )
    timed(
        "adj_noun_pairs",
        lambda: extract_adj_noun_pairs(docs, id_cols=["doc_id"], provider="svo").count(),
    )
    # Every line below forces evaluation of the operator's OUTPUT columns
    # via an aggregate over them. r1-r3 ended these three in .count() over
    # pure projections, which Catalyst prunes to a bare scan — the executed
    # plans contained none of the operator expressions and the recorded
    # 0.6-1.1s timings measured nothing (VERDICT r3 item 2). This breaks
    # cross-round comparability of the headline once; BENCH/BASELINE.md
    # documents the discontinuity. (avg, not sum, for 60-bit hash columns:
    # summing them overflows BIGINT under ANSI mode at bench row counts.)
    timed(
        "minhash_signatures",
        lambda: minhash_signatures(docs).agg(F.sum("minhash")).collect(),
    )
    timed("simhash", lambda: simhash(docs).agg(F.sum("simhash")).collect())
    timed(
        "text_quality_scan",
        lambda: fingerprint(language_id(quality_score(docs)))
        .agg(
            F.sum("n_words"),
            F.avg("mean_word_len_e4"),
            F.avg("stopword_ratio_e4"),
            F.count(F.when(F.col("pred_lang") == "en", 1)),
            F.avg("text_hash"),
            F.avg("min_word_hash"),
        )
        .collect(),
    )
    timed(
        "corpus_quality_filter",
        lambda: corpus_quality_filter(docs).agg(F.sum("keep")).collect(),
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    timed("cosine_topk", lambda: cosine_topk(emb, qvec, k=10).collect())

    # r6-family representatives (VERDICT r6 item 5: bench coverage must
    # grow with the engine): NB classifier scoring, register-blocked bloom
    # decontamination, and iterative pagerank. The pagerank input edge list
    # is materialized OUTSIDE the timed region — the timing measures the
    # iterative rounds, not a repeated extraction.
    from posextract_spark.operators.bloom import decontaminate_bloom
    from posextract_spark.operators.classifier import quality_classifier_scores
    from posextract_spark.operators.graph_analytics import pagerank
    from posextract_spark.operators.triples import extract_triples as _ext

    timed(
        "quality_classifier_scores",
        lambda: quality_classifier_scores(docs)
        .agg(F.sum("score_e6"), F.sum("pred_keep"))
        .collect(),
    )
    ev_docs = docs.filter(F.col("doc_id") % 29 == 0)
    timed(
        "decontaminate_bloom",
        lambda: decontaminate_bloom(docs, ev_docs, m_bits=63 * 2048, k=5)
        .agg(F.sum("n_contaminated"))
        .collect(),
    )
    edges = (
        _ext(docs, text_col="text", id_cols=["doc_id"], provider="svo")
        .select(F.col("subject").alias("src"), F.col("object").alias("dst"))
        .persist()
    )
    edges.count()
    timed(
        "kg_pagerank",
        lambda: pagerank(edges, n_iters=3).agg(F.sum("rank_e12")).collect(),
    )
    edges.unpersist()

    # r7 additions: the contamination + semantic-dedup families
    from posextract_spark.operators.mldata import contaminated_token_fraction
    from posextract_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_survivors,
    )

    timed(
        "contaminated_token_fraction",
        lambda: contaminated_token_fraction(docs, ev_docs)
        .agg(F.sum("covered_tokens"), F.sum("frac_e6"))
        .collect(),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed(
        "semdedup_survivors",
        lambda: semdedup_survivors(
            emb, threshold_e6=400000, centroids=kmeans_centroids(emb, n_iter=2)
        ).count(),
    )

    # The headline total covers the SEVEN queries benchmarked since round 1
    # so "value" stays comparable across rounds; queries added later (e.g.
    # corpus_quality_filter in r3) are timed and reported but summed
    # separately under extra_queries_sec.
    _R1_SET = (
        "triples_extract", "kg_edges", "adj_noun_pairs", "minhash_signatures",
        "simhash", "text_quality_scan", "cosine_topk",
    )
    total = round(sum(timings[q] for q in _R1_SET), 3)
    extra_total = round(sum(v for q, v in timings.items() if q not in _R1_SET), 3)
    out = {
        "metric": "kg_pipeline_headline_sec",
        "value": total,
        "unit": "sec",
        "extra_queries_sec": extra_total,
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "replicate": replicate,
        "runs_per_query": runs_per_query,
        # the _VOLATILE queries get min-of-max(runs_per_query, 5) samples
        # (ADVICE r4: the JSON must not misstate the per-query N — the
        # authoritative per-query count is len(runs[name]); the extra
        # min-of-N draws bias volatile minima lower vs the rest, noted in
        # BENCH/BASELINE.md where cross-query comparisons are made)
        "runs_per_query_actual": {q: len(s) for q, s in all_runs.items()},
        "volatile_queries": sorted(_VOLATILE),
        "runs": all_runs,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
