"""Knowledge fusion / truth discovery over extracted triples.

Web-scale KG construction extracts the same (subject, predicate) fact from
many pages with *conflicting* objects — extraction noise, stale captures,
plain disagreement. The classic fusion stage (Dong et al., "Knowledge
Vault"-style voting) resolves each functional relation to its best-supported
object with a confidence score. Two operators:

- ``relation_stats``: per-predicate profile over the distinct edge set —
  how functional is this predicate? ``functionality_e6`` is the fixed-point
  ratio n_distinct_subjects / n_distinct_edges: 1e6 means every subject has
  exactly one object (a functional relation, e.g. *born_in*); small values
  mean a many-valued relation (e.g. *links_to*). This is the signal that
  decides which predicates fusion may legally collapse.
- ``fuse_functional_relations``: for predicates whose functionality clears
  a threshold, pick the majority-vote object per (subject, predicate)
  (support = observation count; ties broken by MINIMUM object so the result
  is a pure function of the input), and emit support/total/confidence.

Scale shape (the fusion path of a 10^12-triple build):
- ``relation_stats``: one (src, predicate, dst) groupBy with map-side
  partial counts, then a predicate-keyed re-aggregation whose cardinality
  is the predicate vocabulary (tiny). The distinct counts ride the second
  shuffle; no Window anywhere.
- ``fuse_functional_relations``: the functional-predicate set is vocabulary
  -sized, so it joins back as a BROADCAST semi-filter (no shuffle of the
  triple traffic on that join); candidate counts are one (src, predicate,
  dst) shuffle; the winner is a struct-min aggregation per (src, predicate)
  — map-side combinable, skew-safe (a head subject's groups are still one
  key each; AQE splits the residual).

All arithmetic is integer fixed-point (``*_e6``), so the DuckDB mirrors
(`relation_stats_sql` / `fuse_functional_sql`) are engine-exact; the SQL
side may use windows (mirror only — the Spark side stays Window-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_counts(
    triples: DataFrame, src: str, predicate: str, dst: str
) -> DataFrame:
    """Distinct (src, predicate, dst) with observation counts — the shared
    first shuffle of both fusion operators."""
    return triples.groupBy(
        F.col(src).alias("src"),
        F.col(predicate).alias("predicate"),
        F.col(dst).alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))


def relation_stats(
    triples: DataFrame,
    src: str = "src",
    predicate: str = "predicate",
    dst: str = "dst",
) -> DataFrame:
    """(predicate, n_obs, n_edges, n_src, n_dst, functionality_e6,
    inv_functionality_e6) — the per-relation schema profile.

    functionality_e6     = floor(1e6 * n_src / n_edges)
    inv_functionality_e6 = floor(1e6 * n_dst / n_edges)
    """
    edges = _edge_counts(triples, src, predicate, dst)
    return (
        edges.groupBy("predicate")
        .agg(
            F.sum("n_obs").cast("long").alias("n_obs"),
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.countDistinct("src").cast("long").alias("n_src"),
            F.countDistinct("dst").cast("long").alias("n_dst"),
        )
        .withColumn(
            "functionality_e6",
            F.expr("n_src * 1000000 div n_edges").cast("long"),
        )
        .withColumn(
            "inv_functionality_e6",
            F.expr("n_dst * 1000000 div n_edges").cast("long"),
        )
    )


def fuse_functional_relations(
    triples: DataFrame,
    min_functionality_e6: int = 800_000,
    min_confidence_e6: int = 0,
    src: str = "src",
    predicate: str = "predicate",
    dst: str = "dst",
) -> DataFrame:
    """Majority-vote object per (src, predicate) for sufficiently
    functional predicates.

    Returns (src, predicate, dst, support, total, confidence_e6) where
    ``dst`` is the object with the highest observation count (ties broken
    by minimum object — deterministic), ``support`` its count, ``total``
    the group's total observations and ``confidence_e6`` =
    floor(1e6 * support / total). Rows below ``min_confidence_e6`` are
    dropped (a fused fact a third of the evidence disagrees with is often
    worse than no fact).
    """
    cand = _edge_counts(triples, src, predicate, dst).withColumnRenamed(
        "n_obs", "support"
    )
    functional = (
        cand.groupBy("predicate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.countDistinct("src").cast("long").alias("n_src"),
        )
        .filter(
            F.expr("n_src * 1000000 div n_edges").cast("long")
            >= F.lit(min_functionality_e6)
        )
        .select("predicate")
    )
    # predicate vocabulary is tiny at any corpus scale -> broadcast the
    # semi-filter so the candidate traffic never shuffles for it
    cand = cand.join(F.broadcast(functional), "predicate")
    fused = (
        cand.groupBy("src", "predicate")
        .agg(
            F.sum("support").cast("long").alias("total"),
            F.min(
                F.struct(
                    (-F.col("support")).alias("negs"), F.col("dst").alias("d")
                )
            ).alias("m"),
        )
        .select(
            "src",
            "predicate",
            F.col("m.d").alias("dst"),
            (-F.col("m.negs")).cast("long").alias("support"),
            "total",
        )
        .withColumn(
            "confidence_e6",
            F.expr("support * 1000000 div total").cast("long"),
        )
    )
    if min_confidence_e6 > 0:
        fused = fused.filter(F.col("confidence_e6") >= F.lit(min_confidence_e6))
    return fused


# --- DuckDB mirrors (oracle side; never fed to Spark) -----------------------


def relation_stats_sql(
    triples_rel: str,
    src: str = "src",
    predicate: str = "predicate",
    dst: str = "dst",
) -> str:
    """SQL suffix mirroring relation_stats() over ``triples_rel``."""
    return f"""
, _rs_edges AS MATERIALIZED (
  SELECT {src} AS src, {predicate} AS predicate, {dst} AS dst,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM {triples_rel} GROUP BY 1, 2, 3)
SELECT predicate,
  CAST(sum(n_obs) AS BIGINT) AS n_obs,
  CAST(count(*) AS BIGINT) AS n_edges,
  CAST(count(DISTINCT src) AS BIGINT) AS n_src,
  CAST(count(DISTINCT dst) AS BIGINT) AS n_dst,
  CAST(count(DISTINCT src) * 1000000 // count(*) AS BIGINT) AS functionality_e6,
  CAST(count(DISTINCT dst) * 1000000 // count(*) AS BIGINT) AS inv_functionality_e6
FROM _rs_edges GROUP BY predicate"""


def fuse_functional_sql(
    triples_rel: str,
    min_functionality_e6: int = 800_000,
    min_confidence_e6: int = 0,
    src: str = "src",
    predicate: str = "predicate",
    dst: str = "dst",
) -> str:
    """SQL suffix mirroring fuse_functional_relations() (window tie-break
    — mirror only, the Spark side stays Window-free)."""
    having = (
        f"CAST(support * 1000000 // total AS BIGINT) >= {min_confidence_e6} AND "
        if min_confidence_e6 > 0
        else ""
    )
    return f"""
, _ff_cand AS MATERIALIZED (
  SELECT {src} AS src, {predicate} AS predicate, {dst} AS dst,
         CAST(count(*) AS BIGINT) AS support
  FROM {triples_rel} GROUP BY 1, 2, 3),
_ff_func AS MATERIALIZED (
  SELECT predicate FROM _ff_cand GROUP BY predicate
  HAVING CAST(count(DISTINCT src) * 1000000 // count(*) AS BIGINT)
         >= {min_functionality_e6}),
_ff_win AS (
  SELECT c.src, c.predicate, c.dst, c.support,
         CAST(sum(c.support) OVER (PARTITION BY c.src, c.predicate) AS BIGINT)
           AS total,
         row_number() OVER (PARTITION BY c.src, c.predicate
                            ORDER BY c.support DESC, c.dst ASC) AS rn
  FROM _ff_cand c JOIN _ff_func f ON f.predicate = c.predicate)
SELECT src, predicate, dst, support, total,
       CAST(support * 1000000 // total AS BIGINT) AS confidence_e6
FROM _ff_win WHERE rn = 1 AND {having}TRUE"""
