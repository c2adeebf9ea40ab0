"""The end-to-end KG construction pipeline (BASELINE.json north_star).

pages(url, warc_ts, html, text, lang)
  -> lang filter (partition-prunable predicate, first thing after the scan)
  -> extract_text (pandas UDF; byte-identical to the stored text contract)
  -> split_sentences (native columns)
  -> extract_triples (fused segment+parse+extract pandas UDF)
  -> link_triples (broadcast alias joins)
  -> build_edges / build_nodes (grouped aggregation)

Each stage is usable standalone; ``kg_from_pages`` composes them. The
checkpoint-resumable form runs the same composition per url bucket via
plans.lineage.BucketedRun.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.operators.html_text import extract_text
from posextract_spark.operators.sentences import split_sentences
from posextract_spark.operators.triples import extract_triples
from posextract_spark.operators.graph import build_edges, build_nodes, link_triples
from posextract_spark.operators.linking import link_entities, mentions_from_triples
from posextract_spark.options import TripleExtractorOptions


def pages_to_triples(
    pages: DataFrame,
    lang: Optional[str] = "en",
    use_stored_text: bool = False,
    provider: str = "template",
    options: Optional[TripleExtractorOptions] = None,
    remove_quotes: bool = False,
) -> DataFrame:
    """pages -> triples with (url, sent_pos, sent_id) provenance."""
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if not use_stored_text:
        df = df.drop("text")
        df = extract_text(df, html_col="html", out_col="text")
    sents = split_sentences(
        df.select("url", "text"), text_col="text", remove_quotes=remove_quotes
    )
    return extract_triples(
        sents,
        text_col="sentence",
        id_cols=["url", "sent_pos"],
        options=options,
        provider=provider,
    )


def kg_from_pages(
    pages: DataFrame,
    alias_df: DataFrame,
    out_dir: Optional[str] = None,
    n_buckets: int = 16,
    persist: bool = True,
    canonicalize: bool = False,
    min_score_e6: int = 300000,
    coref_min_sim_e6: int = 500000,
    max_block_width: Optional[int] = None,
    **kwargs,
):
    """(nodes, edges) from raw pages.

    ``canonicalize=True`` (r6, SURVEY §7.6 full chain) builds the NODES via
    scored fuzzy linking + co-reference connected components instead of the
    exact broadcast alias join: distinct mention surfaces are scored against
    the dictionary (operators.linking.resolve_surfaces_scored), link and
    co-reference edges feed the O(log n) star CC, and the vocabulary-sized
    (surface -> cluster-canonical) map is broadcast back onto mention
    traffic (operators.canonicalize.resolve_canonical_cc). EDGES link
    through the same map, so every edge endpoint id is a canonical nodes
    entity_id — a fuzzy/coref merge moves the node AND its edges together
    (graph consistency, pinned by tests/test_canonicalize_cc.py).

    ``persist`` caches the triples at the fan-out point — CRITICAL for
    scale: edges and nodes both consume the triples, and
    mentions_from_triples is a UNION of two selects of them, so without a
    persist the whole generate->html->parse->extract lineage re-runs up to
    4x (measured 222s -> 57s at 20k pages). MEMORY_AND_DISK (the default
    StorageLevel) spills gracefully when the triple set outgrows executor
    memory at the 10^12 design point; the bucketed/lineage orchestration
    path avoids even this by materializing each stage to parquet.
    """
    triples = pages_to_triples(pages, **kwargs)
    if persist:
        triples = triples.persist()
    mentions = mentions_from_triples(triples, id_cols=("url", "sent_id"))
    if canonicalize:
        from posextract_spark.operators.canonicalize import resolve_canonical_cc
        from posextract_spark.operators.linking import normalize_surface

        mapping = resolve_canonical_cc(
            mentions,
            alias_df,
            surface_col="surface",
            min_score_e6=min_score_e6,
            coref_min_sim_e6=coref_min_sim_e6,
            max_block_width=max_block_width,
        )

        # EDGES must link through the SAME map as the nodes: exact-link
        # endpoint ids would not join a canonical nodes table whenever a
        # fuzzy/coref cluster changed a surface's canonical (graph
        # consistency — every edge endpoint is a node entity_id).
        def attach(df: DataFrame, col: str, out: str) -> DataFrame:
            m = mapping.select(
                F.col("surface_norm").alias(f"_{out}_norm"),
                F.col("entity_id").alias(out),
            )
            return df.withColumn(
                f"_{out}_norm", normalize_surface(F.col(col))
            ).join(F.broadcast(m), f"_{out}_norm", "left")

        linked = attach(
            attach(triples, "subject", "subject_entity_id"),
            "object",
            "object_entity_id",
        )
        linked_mentions = mentions.withColumn(
            "surface_norm", normalize_surface(F.col("surface"))
        ).join(F.broadcast(mapping), "surface_norm")
    else:
        linked = link_triples(triples, alias_df)
        linked_mentions = link_entities(mentions, alias_df)
    edges = build_edges(linked, source_col="url").withColumn(
        "bucket", F.pmod(F.col("src"), F.lit(n_buckets))
    )
    nodes = build_nodes(linked_mentions).withColumn(
        "bucket", F.pmod(F.col("entity_id"), F.lit(n_buckets))
    )
    if out_dir:
        edges.write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/edges")
        nodes.write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/nodes")
        if persist:
            # both consumers are materialized — release the cache instead of
            # leaking one MEMORY_AND_DISK block set per call in long sessions
            triples.unpersist()
    return nodes, edges
