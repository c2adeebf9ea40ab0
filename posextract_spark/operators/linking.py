"""Entity linking: broadcast alias-dictionary lookup.

mentions (surface strings from triple subjects/objects) are normalized and
left-joined against a broadcast alias dictionary (surface_norm -> canonical
entity). Unresolved mentions fall back to a deterministic surface-form
entity id so downstream stages never see nulls (BASELINE.json north_star:
"entity linking via broadcast alias-dictionary lookup").

Scale: the alias dictionary is the small side — explicit F.broadcast keeps
the join shuffle-free regardless of autoBroadcastJoinThreshold; mention
traffic stays partitioned as produced by the extraction stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import portable_hash64


def normalize_surface(col):
    """Surface-form normalization key: trimmed lower-case."""
    return F.lower(F.trim(col))


def mentions_from_triples(triples: DataFrame, id_cols=("url", "sent_id")) -> DataFrame:
    """One row per subject/object mention with provenance and role."""
    ids = [F.col(c) for c in id_cols]
    subj = triples.select(*ids, F.lit("subject").alias("role"), F.col("subject").alias("surface"))
    obj = triples.select(*ids, F.lit("object").alias("role"), F.col("object").alias("surface"))
    return subj.unionAll(obj)


def link_entities(
    mentions: DataFrame,
    alias_df: DataFrame,
    surface_col: str = "surface",
) -> DataFrame:
    """Adds (surface_norm, canonical, entity_id, linked).

    alias_df: (surface_norm, canonical). entity_id is the portable hash of
    the canonical form when linked, of the normalized surface otherwise.
    """
    m = mentions.withColumn("surface_norm", normalize_surface(F.col(surface_col)))
    joined = m.join(F.broadcast(alias_df), "surface_norm", "left")
    return (
        joined.withColumn("linked", F.col("canonical").isNotNull())
        .withColumn("canonical", F.coalesce(F.col("canonical"), F.col("surface_norm")))
        .withColumn("entity_id", portable_hash64(F.col("canonical")))
    )
