"""Canonicalization: surface-form aggregation + connected components.

Connected components over co-reference/alias edges is the one operator
Spark lacks natively (SURVEY.md §4.2). Implemented as iterative min-label
propagation over DataFrame joins with ``localCheckpoint()`` per round to
cut lineage growth and an early-exit convergence probe. Rounds are
O(graph diameter); alias/co-reference graphs are near-star-shaped
(diameter <= ~4), so this settles in a handful of rounds. For adversarially
deep graphs the alternating large-star/small-star formulation (Kiveris et
al., "Connected Components in MapReduce and Beyond") drops this to
O(log n) rounds — the planned upgrade path if component shapes change.

Skew note (north_rule): head entities produce hot keys in the surface-form
groupBy; ``salted_counts`` demonstrates the two-phase salted aggregation
used by the materialize stage when a direct groupBy skews.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node BIGINT, component BIGINT) — component = min node id reachable.

    edges: undirected pairs of BIGINT node ids (any orientation).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # label(v) starts as min(v, min neighbor) — one round for free
    labels = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.first("a")).alias("component"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # propagate: candidate label for v = min over neighbors u of label(u)
        prop = (
            e.join(labels.withColumnRenamed("node", "b_node"), F.col("b") == F.col("b_node"))
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels


def salted_counts(
    df: DataFrame, key_col: str, n_salts: int = 16, count_alias: str = "n"
) -> DataFrame:
    """Two-phase salted count for skewed keys: partial count on
    (key, hash(full-row-ish salt) % n_salts), then final merge. Identical
    result to a direct groupBy-count; bounded partition width on hot keys."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(key_col, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key_col).agg(F.sum("_partial").cast("bigint").alias(count_alias))


def canonical_clusters(
    linked_mentions: DataFrame,
    alias_df: DataFrame,
) -> DataFrame:
    """Cluster surface forms that share a canonical entity (alias edges),
    then pick the lexicographically-smallest surface as the cluster
    representative. Returns (surface_norm, cluster_rep)."""
    from posextract_spark.functions.hashing import portable_hash64

    # alias edges: surface <-> canonical anchor node
    edges = alias_df.select(
        portable_hash64(F.col("surface_norm")).alias("src"),
        portable_hash64(F.concat(F.lit("canon:"), F.col("canonical"))).alias("dst"),
    )
    comps = connected_components(edges)

    surfaces = alias_df.select(
        "surface_norm", portable_hash64(F.col("surface_norm")).alias("node")
    )
    with_comp = surfaces.join(comps, "node")
    reps = with_comp.groupBy("component").agg(F.min("surface_norm").alias("cluster_rep"))
    return with_comp.join(reps, "component").select("surface_norm", "cluster_rep")
