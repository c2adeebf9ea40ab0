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


# --- anchor-text alias mining ------------------------------------------------


def _anchors_df(spark, html: str):
    from posextract_spark.operators.weblinks import extract_anchors

    df = spark.createDataFrame(
        pd.DataFrame([_page("https://a.test/p", html)]), schema=PAGE_SCHEMA
    )
    return extract_anchors(df)


def test_extract_anchors_text_and_filters(spark):
    html = (
        '<a href="https://b.test/x">Acme Corp</a>'
        '<a href="https://b.test/y" rel="nofollow">ACME CORP</a>'
        '<a href="/relative">Acme Corp</a>'  # dropped: relative target
        '<a href="https://c.test/z"></a>'  # kept: empty text survives extraction
        '<a href="mailto:x@b.test">Acme</a>'  # dropped
    )
    rows = {(r["dst_host"], r["anchor_text"]) for r in _anchors_df(spark, html).collect()}
    assert rows == {
        ("b.test", "Acme Corp"),
        ("b.test", "ACME CORP"),
        ("c.test", ""),
    }


def test_anchor_alias_candidates_normalize_share_thresholds(spark):
    from posextract_spark.operators.weblinks import anchor_alias_candidates

    html = (
        '<a href="https://b.test/1">Acme Corp</a>'
        '<a href="https://b.test/2">ACME CORP</a>'  # case-merges with above
        '<a href="https://b.test/3"> acme corp </a>'  # trim-merges too
        '<a href="https://b.test/4">click here</a>'
        '<a href="https://c.test/1"></a>'  # empty text -> dropped entirely
        '<a href="https://c.test/2">Zorin</a>'
    )
    cands = anchor_alias_candidates(_anchors_df(spark, html))
    got = {
        (r["dst_host"], r["surface_norm"]): (r["n_anchors"], r["share_e6"])
        for r in cands.collect()
    }
    # b.test total = 4 kept anchors; acme corp 3/4, click here 1/4;
    # c.test total = 1 (the empty-text anchor never reaches the totals)
    assert got == {
        ("b.test", "acme corp"): (3, 750_000),
        ("b.test", "click here"): (1, 250_000),
        ("c.test", "zorin"): (1, 1_000_000),
    }
    capped = anchor_alias_candidates(_anchors_df(spark, html), min_count=2)
    assert {k for k in {(r["dst_host"], r["surface_norm"]) for r in capped.collect()}} == {
        ("b.test", "acme corp")
    }
    shared = anchor_alias_candidates(_anchors_df(spark, html), min_share_e6=300_000)
    assert {(r["dst_host"], r["surface_norm"]) for r in shared.collect()} == {
        ("b.test", "acme corp"),
        ("c.test", "zorin"),
    }


def test_anchor_alias_generator_replay_parity(spark):
    from posextract_spark.operators.weblinks import (
        anchor_alias_candidates,
        extract_anchors,
    )
    from posextract_spark.sources.weblinks import replay_anchor_alias

    n, seed = 90, 7
    cands = anchor_alias_candidates(
        extract_anchors(linked_pages(spark, n, seed=seed)), min_count=2
    )
    got = sorted(
        (r["dst_host"], r["surface_norm"], r["n_anchors"], r["share_e6"])
        for r in cands.collect()
    )
    assert got == replay_anchor_alias(n, seed=seed, min_count=2)


def test_anchor_extraction_plan_is_native(spark):
    from posextract_spark.operators.weblinks import (
        anchor_alias_candidates,
        extract_anchors,
    )

    df = spark.createDataFrame(
        pd.DataFrame([_page("https://a.test/p", '<a href="https://b.test/x">B</a>')]),
        schema=PAGE_SCHEMA,
    )
    plan = (
        anchor_alias_candidates(extract_anchors(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_alias_df_from_anchors_best_row_and_linking_shape(spark):
    from posextract_spark.operators.weblinks import alias_df_from_anchors

    cands = spark.createDataFrame(
        pd.DataFrame(
            [
                ("acme.com", "acme", 10, 500_000),
                ("mirror.acme.com", "acme", 10, 500_000),  # tie -> min host
                ("other.com", "acme", 2, 100_000),
                ("zorin.io", "zorin", 9, 900_000),
                ("spam.biz", "junk", 1, 50_000),  # below min_share -> out
            ],
            columns=["dst_host", "surface_norm", "n_anchors", "share_e6"],
        )
    )
    got = {r["surface_norm"]: r["canonical"] for r in alias_df_from_anchors(cands).collect()}
    assert got == {"acme": "acme.com", "zorin": "zorin.io"}
