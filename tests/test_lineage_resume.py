"""Checkpoint-resume orchestration tests (plans.lineage)."""

import pytest
from pyspark.sql import functions as F

from posextract_spark.pipeline import pages_to_triples
from posextract_spark.plans.lineage import BucketedRun
from posextract_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, 60, seed=11, n_partitions=4).persist()
    df.count()
    return df


def _stage(part):
    return pages_to_triples(part, provider="template", use_stored_text=True)


def test_resume_equals_single_run(spark, pages, tmp_path):
    # single uninterrupted run
    full = BucketedRun(spark, str(tmp_path / "full"), n_buckets=4)
    assert full.run(pages, _stage) == 4

    # crashed run: 2 buckets then simulated failure, then resume
    resumed = BucketedRun(spark, str(tmp_path / "resumed"), n_buckets=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        resumed.run(pages, _stage, fail_after=2)
    assert len(resumed.completed_buckets()) == 2
    # resume processes exactly the remaining buckets
    assert resumed.run(pages, _stage) == 2

    key = ["url", "sent_pos", "sent_id", "subject", "verb", "object"]
    a = sorted(map(tuple, full.read_output().select(*key).collect()))
    b = sorted(map(tuple, resumed.read_output().select(*key).collect()))
    assert a == b and len(a) > 0


def test_metrics_and_idempotent_rerun(spark, pages, tmp_path):
    run = BucketedRun(spark, str(tmp_path / "m"), n_buckets=3)
    run.run(pages, _stage)
    m = run.metrics()
    assert m["buckets_done"] == 3
    assert m["input_rows"] == pages.count()
    assert m["output_rows"] == run.read_output().count()
    # second call is a no-op
    assert run.run(pages, _stage) == 0


def test_two_stage_kg_resume_matches_single_run(spark, pages, tmp_path):
    """The full KG materialize as TWO chained checkpointed stages — crash in
    each, resume, and the final edge table must equal the uninterrupted
    kg_from_pages run. Stage 2 buckets on subject_entity_id so every
    (src, predicate, dst) group lives wholly inside one bucket (bucketing on
    raw subject surface would split a canonical's groups and double-count)."""
    from posextract_spark.operators.graph import build_edges, link_triples
    from posextract_spark.pipeline import kg_from_pages
    from posextract_spark.sources.pages import alias_table

    r1 = BucketedRun(spark, str(tmp_path / "kg"), n_buckets=4, stage="triples")
    with pytest.raises(RuntimeError, match="simulated crash"):
        r1.run(pages, _stage, fail_after=1)
    assert r1.run(pages, _stage) == 3

    linked = link_triples(r1.read_output(), alias_table(spark)).persist()
    linked.count()
    r2 = BucketedRun(spark, str(tmp_path / "kg"), n_buckets=4, stage="edges")

    def edge_stage(part):
        return build_edges(part, source_col="url")

    with pytest.raises(RuntimeError, match="simulated crash"):
        r2.run(linked, edge_stage, key_col="subject_entity_id", fail_after=1)
    assert r2.run(linked, edge_stage, key_col="subject_entity_id") == 3

    cols = ["src", "predicate", "dst", "weight"]
    got = sorted(map(tuple, r2.read_output().select(*cols).collect()))
    _, edges = kg_from_pages(pages, alias_table(spark), use_stored_text=True)
    want = sorted(map(tuple, edges.select(*cols).collect()))
    assert got == want and len(got) > 0
    linked.unpersist()


def test_resumed_triples_feed_canonical_nodes(spark, pages, tmp_path):
    """The r6 canonicalization composes with checkpoint-resume: stage 1
    (triples per url bucket) crashes and resumes; the GLOBAL
    canonicalization stage (scored linking + coref CC — inherently
    cross-bucket, so it runs over the union of resumed bucket outputs)
    then produces exactly the nodes the uninterrupted
    kg_from_pages(canonicalize=True) run builds."""
    from posextract_spark.operators.canonicalize import resolve_canonical_cc
    from posextract_spark.operators.graph import build_nodes
    from posextract_spark.operators.linking import (
        mentions_from_triples,
        normalize_surface,
    )
    from posextract_spark.pipeline import kg_from_pages
    from posextract_spark.sources.pages import alias_table, typo_pages

    corpus = pages.unionAll(typo_pages(spark))
    r1 = BucketedRun(spark, str(tmp_path / "kgcanon"), n_buckets=4, stage="triples")
    with pytest.raises(RuntimeError, match="simulated crash"):
        r1.run(corpus, _stage, fail_after=2)
    assert r1.run(corpus, _stage) == 2

    alias_df = alias_table(spark)
    mentions = mentions_from_triples(r1.read_output(), id_cols=("url", "sent_id"))
    mapping = resolve_canonical_cc(mentions, alias_df, surface_col="surface")
    resumed_nodes = build_nodes(
        mentions.withColumn("surface_norm", normalize_surface(F.col("surface"))).join(
            F.broadcast(mapping), "surface_norm"
        )
    )

    single_nodes, _ = kg_from_pages(
        corpus, alias_df, canonicalize=True, use_stored_text=True
    )

    def rows(nodes):
        return {
            (r.entity_id, r.canonical, tuple(r.surface_forms), r.n_mentions)
            for r in nodes.select(
                "entity_id", "canonical", "surface_forms", "n_mentions"
            ).collect()
        }

    got, want = rows(resumed_nodes), rows(single_nodes)
    assert got == want and len(got) > 0
    # the typo clusters survived the bucketed path too
    canons = {c for _e, c, _s, _n in got}
    assert "quixote" in canons and "acmecorpx" not in canons
