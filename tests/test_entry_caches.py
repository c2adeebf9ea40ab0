"""The driver runs all 44 contract queries in ONE session; r2 leaked three
independent persist()s of the triples frame (VERDICT r2 item 6). Pin the
fix: the four KG queries share one persisted frame, and release_caches()
leaves zero persisted RDDs behind."""

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _n_cached_rdds(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def test_kg_queries_share_one_persisted_frame(spark):
    import __spark_entry__ as entry

    entry.release_caches()
    base = _n_cached_rdds(spark)

    edges = entry.q_kg_edges(spark, SF)
    nodes = entry.q_kg_nodes(spark, SF)
    linked = entry.q_entity_link(spark, SF)
    scored = entry.q_entity_link_scored(spark, SF)
    assert edges.count() > 0
    assert nodes.count() > 0
    assert linked.count() > 0
    assert scored.count() > 0

    # exactly ONE new persisted RDD across all four queries
    assert _n_cached_rdds(spark) == base + 1
    assert len(entry._TRIPLES_CACHE) == 1

    entry.release_caches()
    assert _n_cached_rdds(spark) == base
    assert not entry._TRIPLES_CACHE


def test_cache_evicts_on_sf_dir_change(spark):
    import __spark_entry__ as entry

    entry.release_caches()
    base = _n_cached_rdds(spark)
    entry._shared_triples(spark, SF).count()
    entry._shared_triples(spark, "/root/testdata/sf0.01").count()
    # old key evicted eagerly -> never more than one live cache
    # (persist is lazy: count() materializes so getPersistentRDDs sees it)
    assert len(entry._TRIPLES_CACHE) == 1
    assert _n_cached_rdds(spark) == base + 1
    entry.release_caches()
    assert _n_cached_rdds(spark) == base
