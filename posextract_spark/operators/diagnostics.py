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

    # NULLS LAST on every key tie-break (ADVICE r7): Spark sorts NULLs
    # FIRST ascending while the DuckDB mirror sorts them LAST, so a NULL
    # key competing at the top_n boundary (or on a count tie) could rank
    # or truncate differently between engine and oracle. Pinning NULLS
    # LAST Spark-side matches DuckDB's default; no-op on NULL-free keys.
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    top = counts.orderBy(F.desc("n_rows"), F.col("key").asc_nulls_last()).limit(top_n)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n_rows"), F.col("key").asc_nulls_last()))
            .cast("int")
            .alias("rank"),
            "key",
            "n_rows",
            F.expr("n_rows * CAST(1000000 AS BIGINT) div __total")
            .cast("long")
            .alias("pct_e6"),
            F.expr(
                "sum(n_rows) OVER (ORDER BY n_rows DESC, key ASC NULLS LAST "
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


def corpus_datacard(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(metric, value) — the one-query corpus datasheet (the numbers a
    'data card' publishes): document/token/char totals, language and
    source cardinalities, exact-duplicate count, and (with ``eval_df``)
    the contaminated-doc count. Every number BIGINT so the frame is
    value-hash stable.

    Shape: one materialized word-count scan for the token/char totals
    (map-side combinable), tiny distinct-counts for lang/source, the
    exact-dedup hash groupBy re-aggregated to ONE number, and
    decontaminate's broadcast join counted — each metric is an
    already-shaped aggregate; the union is of 1-row frames."""
    from posextract_spark.functions.boundary import materialize
    from posextract_spark.functions.hashing import word_array
    from posextract_spark.operators.dedup import exact_dedup_groups

    g = materialize(
        docs.select(F.col(id_col), F.col(text_col), "lang", "source"),
        __dc_w=word_array(F.col(text_col)),
    )
    base = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.col("__dc_w"))).cast("long").alias("n_tokens"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
        F.count_distinct(F.col("lang")).cast("long").alias("n_langs"),
        F.count_distinct(F.col("source")).cast("long").alias("n_sources"),
    )
    dup = exact_dedup_groups(docs, text_col=text_col, id_col=id_col).agg(
        (F.sum("n_docs") - F.count(F.lit(1))).cast("long").alias("n_exact_dup_docs")
    )
    metrics = base.crossJoin(F.broadcast(dup))
    names = ["n_docs", "n_tokens", "n_chars", "n_langs", "n_sources",
             "n_exact_dup_docs"]
    if eval_df is not None:
        from posextract_spark.operators.mldata import decontaminate

        cont = decontaminate(docs, eval_df, text_col=text_col, id_col=id_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_contaminated_docs")
        )
        metrics = metrics.crossJoin(F.broadcast(cont))
        names.append("n_contaminated_docs")
    stacked = ", ".join(f"'{n}', {n}" for n in names)
    return metrics.selectExpr(
        f"stack({len(names)}, {stacked}) AS (metric, value)"
    )


def corpus_datacard_sql(rel: str = "documents", eval_mod: int | None = 29) -> str:
    """DuckDB mirror: the same aggregates unioned as (metric, value)."""
    words = "list_filter(string_split(text, ' '), w -> w <> '')"
    cont = ""
    if eval_mod is not None:
        cont = f"""
UNION ALL
SELECT 'n_contaminated_docs', CAST((
  WITH dcw AS (SELECT doc_id, {words} AS ws FROM {rel}),
  dcsh AS (
    SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 5 THEN
      list_transform(generate_series(1, len(ws) - 4),
                     i -> array_to_string(ws[i:i+4], ' ')) ELSE [] END)) AS shingle
    FROM dcw),
  dcev AS (SELECT DISTINCT shingle FROM dcsh WHERE doc_id % {eval_mod} = 0)
  SELECT count(DISTINCT s.doc_id) FROM dcsh s JOIN dcev USING (shingle)
) AS BIGINT)"""
    return f"""
SELECT metric, value FROM (
SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM {rel}
UNION ALL
SELECT 'n_tokens', CAST(sum(len({words})) AS BIGINT) FROM {rel}
UNION ALL
SELECT 'n_chars', CAST(sum(length(text)) AS BIGINT) FROM {rel}
UNION ALL
SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM {rel}
UNION ALL
SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM {rel}
UNION ALL
SELECT 'n_exact_dup_docs', CAST(count(*) - count(DISTINCT
  (('0x' || substring(md5(text), 1, 15))::BIGINT,
   ('0x' || substring(md5(text), 17, 15))::BIGINT)) AS BIGINT) FROM {rel}
{cont}
)
"""
