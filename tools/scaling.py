"""Scaling-efficiency experiment (BASELINE.md protocol).

Runs the triple-extraction stage on the same replicated sf0.1 corpus at
several local[N] parallelism levels (fresh SparkSession per level,
full-width warmup, best-of-3 timed runs, fixed 128 input partitions), plus
a pure-python multiprocessing control at the same levels to expose the
hardware frequency/bandwidth ceiling. Prints one JSON line.

Run serialized, with nothing else on the box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = r"""
import os, sys, time, json
sys.path.insert(0, %(repo)r)
cpus = int(sys.argv[1])
os.environ['SPARK_DRIVER_MEMORY'] = '48g'
from posextract_spark.session import build_session
from posextract_spark.operators.triples import extract_triples
from pyspark.sql import functions as F
spark = build_session(master=f'local[{cpus}]', shuffle_partitions=cpus)
spark.sparkContext.setLogLevel('ERROR')
docs_raw = spark.read.parquet(%(sf)r + '/documents.parquet')
reps = spark.range(%(rep)d).select(F.col('id').alias('rep'))
docs = (docs_raw.crossJoin(F.broadcast(reps))
        .select((F.col('doc_id')*%(rep)d+F.col('rep')).alias('doc_id'),'text')
        .repartition(128).persist())
n_docs = docs.count()
ex = lambda: extract_triples(docs, text_col='text', id_cols=['doc_id'], provider='svo').count()
n_triples = ex()  # full-width warmup
best = None
for _ in range(3):
    t0 = time.time(); ex(); dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({'cpus': cpus, 'best_sec': round(best,3),
                  'n_docs': n_docs, 'n_triples': n_triples}))
spark.stop()
"""


def mp_control(levels, texts):
    from multiprocessing import Pool

    import tools._mp_work as w  # noqa: F401  (picklable worker)

    out = {}
    for procs in levels:
        chunks = [texts[i::procs] for i in range(procs)]
        with Pool(procs) as p:
            p.map(w.work, [texts[:10]] * procs)
            t0 = time.time()
            p.map(w.work, chunks)
            out[procs] = round(time.time() - t0, 3)
    return out


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "40"))
    levels = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,8,16,32").split(",")]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    script = PROBE % {"repo": repo, "sf": sf, "rep": rep}
    spark_runs = {}
    for cpus in levels:
        res = subprocess.run(
            [sys.executable, "-c", script, str(cpus)],
            capture_output=True, text=True, timeout=900,
        )
        line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
        spark_runs[cpus] = json.loads(line)

    import duckdb

    texts = [r[0] for r in duckdb.sql(f"select text from '{sf}/documents.parquet'").fetchall()] * rep
    mp = mp_control(levels, texts)

    n_docs = spark_runs[levels[0]]["n_docs"]
    n_triples = spark_runs[levels[0]]["n_triples"]

    def eff(lo, hi):
        f = hi / lo
        return round((n_docs / spark_runs[hi]["best_sec"]) / (f * n_docs / spark_runs[lo]["best_sec"]), 3)

    def mp_eff(lo, hi):
        f = hi / lo
        return round((len(texts) / mp[hi]) / (f * len(texts) / mp[lo]), 3)

    out = {
        "n_docs": n_docs,
        "n_triples": n_triples,
        "spark_sec": {str(k): v["best_sec"] for k, v in spark_runs.items()},
        "spark_docs_per_sec": {str(k): round(n_docs / v["best_sec"], 1) for k, v in spark_runs.items()},
        "mp_control_sec": {str(k): v for k, v in mp.items()},
        "efficiency": {},
        "mp_ceiling": {},
    }
    for lo, hi in [(4, 16), (8, 32), (4, 8), (8, 16), (16, 32)]:
        if lo in spark_runs and hi in spark_runs:
            out["efficiency"][f"{lo}->{hi}"] = eff(lo, hi)
            out["mp_ceiling"][f"{lo}->{hi}"] = mp_eff(lo, hi)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
