"""Scale-adaptive input spreading for compute-heavy operators.

The problem (measured, r8): a small parquet table arrives as ONE scan
partition (a 2000-vector embeddings file is a single ~1 MB split), so
every downstream per-row computation — k-means assignment argmax, the
within-cluster pair cosine of semdedup, LSH bucket pair joins — runs on
ONE core while 31 idle. semdedup_survivors spent 12.6s of its 12.6s
wall in a single-task BroadcastHashJoin probe for exactly this reason.

The fix is NOT a constant repartition (guide §2: a shuffle that only
helps local[32] is a pessimization at scale — at 100 TB the scan
already yields thousands of partitions and a round-robin repartition
would pointlessly shuffle the full payload). ``spread_small_input``
round-robin-repartitions ONLY when the input has fewer partitions than
the session's shuffle parallelism (itself parameterised via
SPARK_SHUFFLE_PARTITIONS / SPARK_GRAFT_CPUS, see session.py), so the
production plan is untouched and the small-input plan uses every core.

Row contents are unchanged and every consumer of these frames is
order-independent (fixed-point integer aggregation, per-row
projections, set-valued outputs), so results are bit-identical either
way. Keyless repartition pays a local sort (sortBeforeRepartition,
SPARK-23207) to stay deterministic under task retry — exactly what we
want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the session's shuffle parallelism
    iff it currently has fewer partitions; identity otherwise."""
    target = min_parts or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    return df.repartition(target)
