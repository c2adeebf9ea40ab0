"""Bucketed-table seam: co-located joins/aggs with zero Exchange.

At 100 TB the dominant cost of repeated joins on a stable key (doc_id, url,
entity_id) is re-shuffling the fact table every query. Spark's bucketed
tables move that shuffle to WRITE time: `bucketBy(n, key)` hash-partitions
files on disk, and every subsequent equi-join or aggregation on the key
reads co-located buckets with NO Exchange in the plan (`sortBy` can
additionally elide the merge-join Sort, but only when each bucket is a
single file — parallel writers don't guarantee that, so Sort nodes may
remain). This is the parquet-catalog analog of the Iceberg
`bucket(url)` hidden partitioning in sources/catalog.py.

Rules for the no-shuffle plan (pinned by tests/test_plan_shape.py):
- both sides bucketed with the SAME bucket count on the join key;
- spark.sql.sources.bucketing.enabled = true (default);
- bucket counts differing by an integer ratio still avoid one side's
  shuffle (bucket coalescing).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: Optional[str] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed (optionally sorted) parquet table. ``path``
    makes it external (table metadata in the session catalog, files at
    path) — required in tests to keep files out of the default warehouse."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
