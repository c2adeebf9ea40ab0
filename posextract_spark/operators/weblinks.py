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


#: full well-formed simple anchor element (href first attr, flat text body)
ANCHOR_ELEM_PATTERN = r'<a href="[^"]*"[^>]*>[^<]*</a>'
ANCHOR_TEXT_PATTERN = r">([^<]*)</a>"


def extract_anchors(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, src_host, target, dst_host, anchor_text) — one row per
    well-formed absolute http(s) anchor ELEMENT, keeping the human-visible
    link text alongside the target.

    Same keep/host semantics as extract_links, but matching whole
    ``<a href="...">text</a>`` elements (href-first, flat text body) so
    the text can be captured — regexp_extract_all returns a single group
    per match, so element-then-two-extracts is the Catalyst-native way to
    get both fields without Python. Still 100% codegen expressions: one
    Generate per page, column pruning reaches the scan.
    """
    html_str = F.decode(F.col(html_col), "UTF-8")
    elems = pages.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(F.col(url_col), HOST_PATTERN, 1)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(ANCHOR_ELEM_PATTERN), F.lit(0))
        ).alias("elem"),
    )
    return (
        elems.select(
            "url",
            "src_host",
            F.regexp_extract(F.col("elem"), HREF_PATTERN, 1).alias("target"),
            F.regexp_extract(F.col("elem"), ANCHOR_TEXT_PATTERN, 1).alias("anchor_text"),
        )
        .filter(F.col("target").rlike(ABS_PATTERN))
        .select(
            "url",
            "src_host",
            "target",
            F.lower(F.regexp_extract(F.col("target"), HOST_PATTERN, 1)).alias("dst_host"),
            "anchor_text",
        )
    )


def anchor_alias_candidates(
    anchors: DataFrame,
    min_count: int = 1,
    min_share_e6: int = 0,
) -> DataFrame:
    """Alias-dictionary mining from anchor text — the classic web-KG
    bootstrap: the texts people use to LINK to a page are that entity's
    surface forms ("IBM", "Big Blue" and "International Business Machines"
    all anchor to ibm.com), so aggregating them yields the
    (surface -> entity) dictionary operators/linking.py consumes, with no
    hand-curated input.

    Input: extract_anchors output. Returns
    (dst_host, surface_norm, n_anchors, share_e6) — per linked host, each
    distinct trimmed-lowercased anchor text with its occurrence count and
    integer-fixed-point share of that host's total kept anchors (empty
    texts dropped; both thresholds are dictionary-quality knobs:
    min_count kills one-off anchor noise, min_share_e6 kills long-tail
    junk like "click here" spread across hosts... which survives ONLY if
    it dominates a host, which is itself signal the host has no name).

    Scale shape: two map-side-combinable groupBys over the same anchor
    frame — (dst_host, surface_norm) counts and dst_host totals — joined
    on dst_host. Deliberately NO broadcast hint: a web corpus has one
    totals row per distinct LINKED HOST (hundreds of millions), far past
    broadcast range — AQE picks broadcast itself when totals is actually
    small (same rule as canonicalize.py's hint caveat). No Window, no
    Python; celebrity hosts (10^8 in-links) are plain counter skew,
    AQE-split.
    """
    from posextract_spark.operators.linking import normalize_surface

    kept = anchors.select(
        "dst_host", normalize_surface(F.col("anchor_text")).alias("surface_norm")
    ).filter(F.col("surface_norm") != "")
    counts = kept.groupBy("dst_host", "surface_norm").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors")
    )
    totals = kept.groupBy("dst_host").agg(F.count(F.lit(1)).cast("long").alias("_total"))
    return (
        counts.join(totals, "dst_host")
        .withColumn(
            "share_e6",
            # integer div, not `/` + floor — double division can floor
            # differently from the replay mirror's exact `//` past 2^53
            F.expr("(1000000 * n_anchors) div _total").cast("long"),
        )
        .filter((F.col("n_anchors") >= min_count) & (F.col("share_e6") >= min_share_e6))
        .select("dst_host", "surface_norm", "n_anchors", "share_e6")
    )


def alias_df_from_anchors(candidates: DataFrame, min_share_e6: int = 100_000) -> DataFrame:
    """Shape mined candidates into the (surface_norm, canonical) broadcast
    dictionary operators/linking.link_entities expects, canonical = the
    linked host. A surface anchoring several hosts keeps its best row
    (max share, ties to the MIN host string — struct-min on (-share,
    host), no Window).
    """
    best = (
        candidates.filter(F.col("share_e6") >= min_share_e6)
        .groupBy("surface_norm")
        .agg(
            F.min(
                F.struct(
                    (-F.col("share_e6")).alias("neg_s"),
                    F.col("dst_host").alias("h"),
                )
            ).alias("m")
        )
    )
    return best.select("surface_norm", F.col("m.h").alias("canonical"))


#: query params dropped by canonicalize_urls — tracking junk that varies
#: per click without changing the resource (the crawl-dedup motivation).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=.*)?$"


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canonical_url``: the crawl-dedup canonical form of an
    http(s) URL — the normalization a recrawl pipeline applies before
    URL-level dedup / latest-capture selection (temporal.latest_capture),
    so 'HTTP://Host.TEST:80/a/?utm_source=x' and 'http://host.test/a'
    collapse to one key.

    Rules (deterministic, order matters, all native Column expressions —
    no UDF, no shuffle):
      1. trim surrounding whitespace; strip the #fragment;
      2. lowercase scheme and host[:port] (path/query case preserved);
      3. drop the scheme's default port (:80 http, :443 https);
      4. empty path -> '/'; otherwise strip ALL trailing slashes
         ('/a/' and '/a//' -> '/a'; bare '/' kept) — all, not one,
         or canonicalization would not be idempotent
         (tests/test_url_canonicalize.py::test_idempotent);
      5. drop tracking query params (TRACKING_PARAM_RE: utm_*, fbclid,
         gclid, msclkid, ref) and empty fragments from repeated '&';
         sort the surviving params bytewise; drop '?' if none survive;
      6. non-http(s) or host-less inputs -> canonical_url = NULL (the
         caller filters or quarantines them).

    Everything is mirrored verbatim in canonicalize_urls_sql (DuckDB), so
    the pair is value-hash checkable; tests pin each rule and the
    idempotence property canonical(canonical(u)) = canonical(u).
    """
    u = F.trim(F.col(url_col))
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
    ).otherwise(F.when(scheme == "https", F.regexp_replace(hostport, r":443$", "")).otherwise(hostport))
    path = F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    qstr = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), hostport, path, qstr)
    valid = scheme.isin("http", "https") & (hostport != "")
    return df.withColumn("canonical_url", F.when(valid, canon))


def canonicalize_urls_sql(
    rel: str, url_col: str = "url", keep_cols: tuple[str, ...] = ("url_id", "url")
) -> str:
    """DuckDB mirror of canonicalize_urls over ``rel``: emits
    ``keep_cols`` + canonical_url (NULL for non-http(s) / host-less)."""
    keep = ", ".join(keep_cols)
    return f"""
SELECT {keep},
  CASE WHEN _scheme IN ('http', 'https') AND _hostport2 <> ''
       THEN _scheme || '://' || _hostport2 || _path2 ||
            CASE WHEN len(_params) > 0
                 THEN '?' || array_to_string(list_sort(_params), '&')
                 ELSE '' END
  END AS canonical_url
FROM (
  SELECT {keep}, _scheme,
    CASE WHEN _scheme = 'http' THEN regexp_replace(_hostport, ':80$', '')
         WHEN _scheme = 'https' THEN regexp_replace(_hostport, ':443$', '')
         ELSE _hostport END AS _hostport2,
    CASE WHEN regexp_replace(_path, '/+$', '') = '' THEN '/'
         ELSE regexp_replace(_path, '/+$', '') END AS _path2,
    list_filter(string_split(_qs, '&'),
                p -> p <> '' AND NOT regexp_matches(lower(p), '{TRACKING_PARAM_RE}'))
      AS _params
  FROM (
    SELECT {keep},
      lower(coalesce(regexp_extract(_nofrag, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1), '')) AS _scheme,
      lower(coalesce(regexp_extract(_nofrag, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1), '')) AS _hostport,
      coalesce(regexp_extract(_nofrag, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1), '') AS _path,
      coalesce(regexp_extract(_nofrag, '\\?([^#]*)', 1), '') AS _qs
    FROM (SELECT {keep}, regexp_replace(trim({url_col}), '#.*$', '') AS _nofrag FROM {rel})
  )
)
"""
