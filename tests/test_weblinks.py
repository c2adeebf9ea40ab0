"""Web link-graph extraction (operators/weblinks.py): handcrafted-HTML
exact expectations, generator-replay parity, plan shape (no Python in the
extraction path), and the pagerank composition."""

import pandas as pd

from posextract_spark.operators.weblinks import extract_links, host_graph
from posextract_spark.sources.weblinks import (
    gen_linked_page,
    linked_pages,
    replay_host_edges,
)

PAGE_SCHEMA = "url string, html binary"


def _page(url: str, html: str):
    return {"url": url, "html": html.encode("utf-8")}


def test_extract_links_filter_semantics(spark):
    html = (
        '<html><body>'
        '<a href="https://b.test/x">abs https</a>'
        '<a href="http://c.test:8080/y?q=1#f">abs http, port+query+frag</a>'
        '<a href="HTTPS://d.test/up">uppercase scheme — dropped (case-sensitive)</a>'
        '<a href="https://UPPER.Test/z">uppercase host — kept, lowercased</a>'
        '<a href="/rel">relative</a>'
        '<a href="//e.test/pr">protocol-relative</a>'
        '<a href="mailto:x@f.test">mailto</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="#frag">fragment</a>'
        '<a href="https://b.test/x2">second to b</a>'
        "</body></html>"
    )
    df = spark.createDataFrame(
        pd.DataFrame([_page("https://a.test/p/1", html)]), schema=PAGE_SCHEMA
    )
    rows = sorted(
        (r["src_host"], r["target"], r["dst_host"]) for r in extract_links(df).collect()
    )
    assert rows == [
        ("a.test", "http://c.test:8080/y?q=1#f", "c.test"),
        ("a.test", "https://UPPER.Test/z", "upper.test"),
        ("a.test", "https://b.test/x", "b.test"),
        ("a.test", "https://b.test/x2", "b.test"),
    ]


def test_host_graph_weights_and_self_links(spark):
    html = (
        '<a href="https://b.test/1"></a><a href="https://b.test/2"></a>'
        '<a href="https://a.test/self"></a>'
    )
    df = spark.createDataFrame(
        pd.DataFrame([_page("https://a.test/p", html)]), schema=PAGE_SCHEMA
    )
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_graph(extract_links(df)).collect()
    }
    assert got == {("a.test", "b.test"): 2, ("a.test", "a.test"): 1}


def test_generator_replay_parity(spark):
    n, seed = 120, 7
    hg = host_graph(extract_links(linked_pages(spark, n, seed=seed)))
    got = sorted((r["src_host"], r["dst_host"], r["weight"]) for r in hg.collect())
    assert got == replay_host_edges(n, seed=seed)


def test_generator_exercises_drop_cases():
    # the corpus must actually contain dropped anchor kinds, or the filter
    # semantics carry no signal
    htmls = "".join(gen_linked_page(i, seed=42)["html"].decode() for i in range(60))
    assert 'href="/relative/' in htmls
    assert 'href="mailto:' in htmls
    assert 'href="javascript:' in htmls
    assert 'href="//' in htmls
    assert 'href="#section-' in htmls
    assert ":8443/" in htmls
    assert 'href="https://HOST' in htmls  # uppercase-host variant


def test_extraction_plan_is_native(spark):
    """The hot path must stay whole-stage-codegen: no Python evaluation
    nodes in the extraction/aggregation plan."""
    df = spark.createDataFrame(
        pd.DataFrame([_page("https://a.test/p", '<a href="https://b.test/x"></a>')]),
        schema=PAGE_SCHEMA,
    )
    plan = host_graph(extract_links(df))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan


def test_host_pagerank_composition(spark):
    from posextract_spark.operators.graph_analytics import pagerank
    from pyspark.sql import functions as F

    hg = host_graph(extract_links(linked_pages(spark, 120, seed=7)))
    pr = pagerank(
        hg.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst")),
        n_iters=2,
    )
    rows = {r["node"]: r["rank_e12"] for r in pr.collect()}
    # every host participates (the generator links across the full set)
    assert set(rows) == {f"host{j}.test" for j in range(12)}
    assert all(v > 0 for v in rows.values())
