"""Web link-graph construction from raw crawl HTML: outlink extraction and
host-level graph aggregation.

This is the crawl-frontier / authority-signal side of a web-scale corpus
pipeline (the reference stops at text; a 100-TB crawl also needs its link
structure — for PageRank-style quality priors, seed discovery, and spam
clustering). Composes with operators/graph_analytics.pagerank for host
authority ranking.

Scale design:
- extraction is 100% native Catalyst expressions (decode + regexp_extract_all
  + explode + regexp_extract): whole-stage codegen, zero Python in the hot
  path, predicate/column pruning reaches the parquet scan (only url+html
  read);
- one Generate (explode) per page bounds memory — no collect of per-page
  link lists;
- host_graph is ONE map-side-combinable shuffle on (src_host, dst_host);
  hub hosts (a CDN linked from everywhere) skew the reduce side -> AQE
  skew-split handles it, and weights are plain counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: kept-target filter and host extraction — mirrored by
#: sources/weblinks.replay_links (Python re) and the DuckDB oracle.
HREF_PATTERN = r'href="([^"]*)"'
ABS_PATTERN = r"^https?://"
HOST_PATTERN = r"^https?://([^/:?#]+)"


def extract_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, src_host, target, dst_host) — one row per absolute http(s)
    anchor occurrence (duplicates preserved; they carry weight).

    Relative / mailto: / javascript: / protocol-relative targets are
    dropped by the case-sensitive ^https?:// filter; hosts are lowercased,
    port/path/query/fragment stripped by the [^/:?#] host pattern.
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    links = pages.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(F.col(url_col), HOST_PATTERN, 1)).alias("src_host"),
        F.explode(F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), F.lit(1))).alias(
            "target"
        ),
    )
    return links.filter(F.col("target").rlike(ABS_PATTERN)).select(
        "url",
        "src_host",
        "target",
        F.lower(F.regexp_extract(F.col("target"), HOST_PATTERN, 1)).alias("dst_host"),
    )


def host_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, weight) — host-level link aggregate. Self-links
    kept (downstream pagerank drops self-loops itself); empty hosts (an
    absolute URL with no parseable host, e.g. 'https://') dropped."""
    return (
        links.filter(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
