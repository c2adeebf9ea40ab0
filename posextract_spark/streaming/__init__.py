"""Structured Streaming surface (design-first per SURVEY.md §2.8).

The reference is pure batch; the north_rule asks for checkpoint-resumable
batch orchestration (plans/lineage.py), not streaming. This module exists
so a pages *stream* (e.g. a WARC firehose landing in object storage) can
reuse the identical batch stages unchanged via foreachBatch.
"""

from posextract_spark.streaming.pipeline import (  # noqa: F401
    curate_batch,
    stream_pages_to_triples,
    streaming_corpus_curation,
    streaming_dedup,
    streaming_edge_weights,
    streaming_entity_profiles,
)
