"""Operational diagnostics: the reports an engineer runs BEFORE pointing
a 100-TB job at a key — is this join/agg key skewed enough to need
salting, AQE skew-join thresholds, or a broadcast rethink?"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """(rank, key, n_rows, pct_e6, cum_pct_e6) for the ``top_n`` hottest
    values of ``key_col`` — the pre-flight skew check for any join/agg
    key. Read it as: if rank-1 carries >> 1/num-partitions of the rows,
    a plain hash shuffle puts that key's whole traffic on one task —
    reach for salting (salted_doc_counts' pattern), AQE skew-join, or a
    bucket-width cap before running the real job.

    Keys are stringified so the report is type-generic and
    oracle-stable; pct/cum are integer fixed-point (x1e6, div).

    Shape: one map-side-combinable count per key (this aggregation
    experiences the skew it measures — its hot task is a combine of
    pre-aggregated partials, i.e. #partitions rows, not the raw
    traffic), TakeOrderedAndProject to ``top_n``, a 1-row total
    broadcast, and a rank/cumsum Window over the top_n-bounded frame
    (driver-small, not the banned unbounded kind)."""
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    top = counts.orderBy(F.desc("n_rows"), F.col("key").asc()).limit(top_n)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    w = (
        Window.orderBy(F.desc("n_rows"), F.col("key").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n_rows"), F.col("key").asc()))
            .cast("int")
            .alias("rank"),
            "key",
            "n_rows",
            F.expr("n_rows * CAST(1000000 AS BIGINT) div __total")
            .cast("long")
            .alias("pct_e6"),
            F.expr(
                "sum(n_rows) OVER (ORDER BY n_rows DESC, key ASC "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " * CAST(1000000 AS BIGINT) div __total"
            )
            .cast("long")
            .alias("cum_pct_e6"),
        )
    )


def key_skew_report_sql(
    rel: str = "events", key_col: str = "user_id", top_n: int = 20
) -> str:
    """DuckDB mirror: same stringified key, same (n desc, key asc)
    order, same fixed-point pct/cumsum."""
    return f"""
WITH _ks_c AS (
  SELECT CAST({key_col} AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_rows
  FROM {rel} GROUP BY 1
),
_ks_t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM {rel}),
_ks_top AS (
  SELECT key, n_rows,
         CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC) AS INT) AS rank
  FROM _ks_c ORDER BY n_rows DESC, key ASC LIMIT {top_n}
)
SELECT rank, key, n_rows,
       CAST((n_rows * 1000000) // total AS BIGINT) AS pct_e6,
       CAST((sum(n_rows) OVER (ORDER BY rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
            // total AS BIGINT) AS cum_pct_e6
FROM _ks_top CROSS JOIN _ks_t
"""
