"""Checkpoint-resumable bucketed orchestration with per-partition lineage.

The 100 TB shape (BASELINE.json north_rule): pages are hashed into B url
buckets; each bucket runs the full extraction pipeline independently and
atomically writes its output partition plus one lineage manifest row
(bucket id, row counts, input fingerprint, kernel version, wall seconds).
A re-run anti-joins pending buckets against the manifest, so a crashed job
resumes exactly where it stopped and never double-writes a partition.

On a real cluster each bucket is a fraction of the input read via partition
pruning (bucket column or Iceberg bucket(url) hidden partitioning); in the
sandbox fallback the bucket filter is a pushed-down parquet predicate.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from posextract_spark import __version__

MANIFEST_DIR = "_lineage"


def bucket_of(col, n_buckets: int):
    """Deterministic url bucket (explicit repartition key per north_rule)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


class BucketedRun:
    """Orchestrates stage_fn over url-hash buckets with resume."""

    def __init__(self, spark: SparkSession, out_dir: str, n_buckets: int = 16,
                 stage: str = "triples"):
        self.spark = spark
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.stage = stage
        self.manifest_path = os.path.join(out_dir, MANIFEST_DIR)
        os.makedirs(self.manifest_path, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest_file(self, bucket: int) -> str:
        return os.path.join(self.manifest_path, f"{self.stage}-{bucket:05d}.json")

    def completed_buckets(self) -> List[int]:
        done = []
        for fn in os.listdir(self.manifest_path):
            if fn.startswith(f"{self.stage}-") and fn.endswith(".json"):
                with open(os.path.join(self.manifest_path, fn)) as f:
                    row = json.load(f)
                if row.get("status") != "ok":
                    continue
                if int(row.get("n_buckets", -1)) != self.n_buckets:
                    # resuming with a different bucket count would silently
                    # double-count: old partitions hold pmod(h, old_n) rows,
                    # new ones pmod(h, new_n) — refuse loudly
                    raise ValueError(
                        f"manifest {fn} was written with n_buckets="
                        f"{row.get('n_buckets')} but this run uses "
                        f"{self.n_buckets}; use a fresh out_dir or the "
                        "original bucket count"
                    )
                done.append(int(row["bucket"]))
        return sorted(done)

    def pending_buckets(self) -> List[int]:
        done = set(self.completed_buckets())
        return [b for b in range(self.n_buckets) if b not in done]

    # -- run ---------------------------------------------------------------

    def run(
        self,
        pages: DataFrame,
        stage_fn: Callable[[DataFrame], DataFrame],
        key_col: str = "url",
        fail_after: int | None = None,
    ) -> int:
        """For each pending bucket: filter pages to the bucket, apply
        stage_fn, write parquet part, append manifest row. ``fail_after``
        simulates a crash after N buckets (tests resume semantics).
        Returns the number of buckets processed this call."""
        from pyspark.sql import Observation

        bucketed = pages.withColumn("_bucket", bucket_of(F.col(key_col), self.n_buckets))
        processed = 0
        for b in self.pending_buckets():
            t0 = time.time()
            # observe() harvests both row counts from the ONE write job —
            # r01 paid part.count() + a re-read count() per bucket, i.e. two
            # extra full passes per bucket just for manifest stats.
            obs_in = Observation(f"{self.stage}-in-{b}")
            obs_out = Observation(f"{self.stage}-out-{b}")
            part = bucketed.filter(F.col("_bucket") == b).drop("_bucket").observe(
                obs_in,
                F.count(F.lit(1)).alias("rows"),
                # order-independent input fingerprint, harvested from the
                # same job: ties each completed bucket to the input it was
                # computed from (manifest contract) at zero extra passes
                F.coalesce(F.expr(f"bit_xor(xxhash64({key_col}))"), F.lit(0)).alias("fp"),
            )
            out_df = stage_fn(part).observe(obs_out, F.count(F.lit(1)).alias("rows"))
            out_path = os.path.join(self.out_dir, self.stage, f"bucket={b}")
            out_df.write.mode("overwrite").parquet(out_path)
            in_rows = obs_in.get["rows"]
            out_rows = obs_out.get["rows"]
            row = {
                "stage": self.stage,
                "bucket": b,
                "n_buckets": self.n_buckets,
                "input_fingerprint": int(obs_in.get["fp"]),
                "input_rows": in_rows,
                "output_rows": out_rows,
                "engine_version": __version__,
                "wall_sec": round(time.time() - t0, 3),
                "status": "ok",
            }
            tmp = self._manifest_file(b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(row, f)
            os.replace(tmp, self._manifest_file(b))  # atomic commit
            processed += 1
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"simulated crash after {processed} buckets")
        return processed

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir, self.stage))

    def metrics(self) -> dict:
        rows = []
        for b in self.completed_buckets():
            with open(self._manifest_file(b)) as f:
                rows.append(json.load(f))
        return {
            "buckets_done": len(rows),
            "input_rows": sum(r["input_rows"] for r in rows),
            "output_rows": sum(r["output_rows"] for r in rows),
            "wall_sec": round(sum(r["wall_sec"] for r in rows), 3),
        }
