"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given SF and compares
row count, column names, and an order-insensitive value hash against the
matching oracle_sql() via DuckDB.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in row))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    # STRICT stringification — deliberately NO float->int collapse: the
    # driver's hasher stringifies raw values, so a DuckDB HUGEINT that
    # pandas-ifies to float64 ('5695.0') must FAIL here against Spark's
    # int64 ('5695'), exactly as it fails in the driver (r2 lesson:
    # events_by_type_day / revenue_by_nation, CORRECTNESS_r02.json).
    if v is None or v != v:
        return ""
    return str(v)


def dtypes_match(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    """Per-column pandas-dtype equality after name sort. Catches divergent
    pandas-ification (HUGEINT->float64, DATE->datetime64 vs object) even
    when the stringified values happen to collide."""
    mism = []
    for c in sorted(sdf.columns):
        st, ot = str(sdf[c].dtype), str(odf[c].dtype)
        if st != ot:
            mism.append(f"{c}: spark={st} oracle={ot}")
    return (not mism, "; ".join(mism))


def _streaming_batch_equivalence(spark) -> tuple[bool, str]:
    """Run the foreachBatch streaming pipeline (availableNow) and the plain
    batch pipeline over the SAME generated pages corpus; compare the triple
    sets with the gate's order-insensitive value hash. Exactly-once is what
    this regression-gates: a sink that appended instead of overwriting its
    batch_id partition, or a replayed micro-batch, shows up as extra rows."""
    import shutil
    import tempfile

    from posextract_spark.pipeline import pages_to_triples
    from posextract_spark.sources.pages import generate_pages
    from posextract_spark.streaming import stream_pages_to_triples

    root = tempfile.mkdtemp(prefix="gate_stream_")
    try:
        src, ckpt, out = f"{root}/src", f"{root}/ckpt", f"{root}/out"
        # two writes -> multiple files, so availableNow runs >1 micro-batch
        generate_pages(spark, 30, seed=11, n_partitions=2).write.mode("append").parquet(src)
        generate_pages(spark, 30, seed=12, n_partitions=2).write.mode("append").parquet(src)

        q = stream_pages_to_triples(spark, src, ckpt, out, provider="template")
        try:
            if not q.awaitTermination(300):
                # availableNow should drain and stop well inside the timeout;
                # a hang would otherwise read partial output below and then
                # rmtree the source/checkpoint under a live query
                return False, "stream did not terminate within 300s"
        finally:
            q.stop()

        streamed = spark.read.parquet(out).drop("batch_id").toPandas()
        batch = pages_to_triples(
            spark.read.parquet(src), provider="template"
        ).toPandas()
        ok_rows = len(streamed) == len(batch)
        ok_cols = sorted(streamed.columns) == sorted(batch.columns)
        ok_hash = (
            value_hash(streamed) == value_hash(batch) if ok_rows and ok_cols else False
        )
        return (
            ok_rows and ok_cols and ok_hash,
            f"rows={len(streamed)}/{len(batch)} cols_ok={ok_cols} hash_ok={ok_hash}",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main(sf_dir: str, only: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from posextract_spark.session import build_session

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = build_session(app_name="contract-check")

    # Full-width executor + python-worker warmup BEFORE any timing: the
    # first query otherwise pays ~7s of JVM/worker spawn and is falsely
    # flagged SLOW regardless of its plan (same lesson as bench.py — a
    # narrow warmup warms exactly one worker, hence the repartition).
    from pyspark.sql import functions as _F

    @_F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(4096).repartition(64).select(_warm("id")).count()

    # the driver caps its sweep at 50 queries (CORRECTNESS_r05 evidence);
    # the LOCAL gate has no cap — it also sweeps the rotated-out
    # extra_queries() so every oracle-backed query keeps a hard signal
    qs = dict(entry_mod.queries())
    if hasattr(entry_mod, "extra_queries"):
        qs.update(entry_mod.extra_queries())
    oracles = entry_mod.oracle_sql()
    failures = 0
    spark_secs: dict[str, float] = {}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        spark_secs[name] = t1 - t0
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (rows-only, {t1-t0:.1f}s)")
            continue
        odf = con.execute(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = value_hash(sdf) == value_hash(odf) if ok_rows and ok_cols else False
        ok_dtypes, dtype_msg = dtypes_match(sdf, odf) if ok_cols else (False, "cols differ")
        status = "OK" if (ok_rows and ok_cols and ok_hash and ok_dtypes) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} dtypes_ok={ok_dtypes} ({t1-t0:.1f}s)"
        )
        if not ok_dtypes and ok_cols:
            print(f"  dtype mismatch: {dtype_msg}")
        if status == "FAIL" and ok_cols:
            s = sdf.reindex(sorted(sdf.columns), axis=1)
            o = odf.reindex(sorted(odf.columns), axis=1)
            key = sorted(sdf.columns)[0]
            print("  spark sample:", s.sort_values(list(s.columns)).head(3).to_dict("records"))
            print("  oracle sample:", o.sort_values(list(o.columns)).head(3).to_dict("records"))

    # Streaming batch-equivalence (VERDICT r4 item 6): the streaming
    # surface was pytest-only; the strict gate now also proves that the
    # foreachBatch pipeline (exactly-once batch_id-overwrite sink) emits
    # EXACTLY the rows the batch pipeline computes on the same input —
    # row count + order-insensitive value hash, same comparator as the
    # oracle rows. Selectable as 'streaming_batch_equivalence'.
    if not only or "streaming_batch_equivalence" in only:
        t0 = time.time()
        try:
            ok, detail = _streaming_batch_equivalence(spark)
        except Exception as e:  # a crashed stream must FAIL the gate, not skip it
            ok, detail = False, f"raised {type(e).__name__}: {e}"
        spark_secs["streaming_batch_equivalence"] = time.time() - t0
        if not ok:
            failures += 1
        print(
            f"streaming_batch_equivalence: {'OK' if ok else 'FAIL'} {detail} "
            f"({spark_secs['streaming_batch_equivalence']:.1f}s)"
        )

    entry_mod.release_caches()  # free the shared persisted triples frame
    spark.stop()

    # Per-query wall-time table, slowest first (Spark side only — the
    # DuckDB oracle is not the engine under test). The r3 50s-per-run
    # corpus_quality_filter plan defect was invisible in the smoke's
    # pass/fail output and only surfaced in the driver's bench
    # (VERDICT r3 item 5); >5s at smoke scale now flags loudly.
    # streaming_batch_equivalence is exempt from the SLOW flag: it runs
    # the pipeline TWICE (stream + batch) plus stream startup, so ~9s is
    # its floor, not a plan defect
    _slow_exempt = {"streaming_batch_equivalence"}
    print("\nper-query Spark wall-times (slowest first):")
    for name, dt in sorted(spark_secs.items(), key=lambda kv: -kv[1]):
        flag = "  << SLOW (>5s) — check the plan" if dt > 5.0 and name not in _slow_exempt else ""
        print(f"  {dt:6.1f}s  {name}{flag}")
    slow = [n for n, dt in spark_secs.items() if dt > 5.0 and n not in _slow_exempt]
    if slow:
        print(f"SLOW QUERIES: {len(slow)} over 5s: {', '.join(slow)}")
    return failures


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    sys.exit(1 if main(sf_dir, only) else 0)
