"""URL canonicalization — the crawl-side dedup primitive.

A Common-Crawl-scale pipeline keys page identity on a NORMALIZED url (the
reference ingests Wikipedia pages by url, eval/generate-datasets/
generate_wikipedia_dataset.py:19; at 10^12 documents the same page arrives
under dozens of surface forms). ``url_normalize`` applies the standard
canonicalization, entirely as native Columns (RE2-compatible regexes so
the Java-regex Spark side and the DuckDB mirror agree on spans — same
discipline as mask_pii):

1. scheme lowercased;
2. host lowercased, a leading ``www.`` stripped;
3. default ports dropped (``:80`` for http, ``:443`` for https); other
   ports kept;
4. fragment dropped;
5. tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``),
   remaining params sorted bytewise by ``k=v`` (order-insensitive key);
6. path: duplicate slashes collapsed, trailing slash stripped, empty path
   rendered as ``/`` (path CASE is preserved — paths are case-sensitive);
7. empty query after filtering renders without ``?``.

Scan-side, zero shuffle, zero Python: the dedup key for a 100-TB crawl is
computed inside the parquet scan projection. Pair with
``exact_dedup_groups`` (operators/dedup.py) on ``url_norm`` for
first-seen-wins page dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid)(=|$)"


def url_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host, port (post-default-strip, '' when none), and url_norm.

    Plan shape: two Generate boundaries (functions/boundary.py). Stage 1
    materializes each regex extraction from the raw URL exactly once;
    stage 2 materializes the derived parts (host, port, normalized path,
    filtered+sorted query string) once each; the final projection only
    compares and concatenates attributes. The naive expression composition
    pasted 27 regexp_extract + 10 regexp_replace copies per row (every
    reference to scheme/hostport/port/path re-ran its chain) — per-row
    waste that multiplies by 10^12 at crawl scale on the single most
    common crawl-side operator."""
    from posextract_spark.functions.boundary import materialize

    url = F.col(url_col)
    g1 = materialize(
        df,
        __u_scheme=F.lower(F.regexp_extract(url, _SCHEME_RE, 1)),
        __u_hostport=F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1)),
        __u_rawpath=F.regexp_extract(url, _PATH_RE, 1),
        # strip the fragment BEFORE extracting the query: '\?' alone would
        # match a '?' that first appears inside the fragment
        # (https://h/p#sec?a=1) and leak fragment content into the params
        # (ADVICE r3; both engines agreed, so only a golden can catch it)
        __u_query=F.regexp_extract(F.regexp_replace(url, "#.*$", ""), _QUERY_RE, 1),
    )
    scheme = F.col("__u_scheme")
    hostport = F.col("__u_hostport")

    path = F.regexp_replace(F.col("__u_rawpath"), "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.col("__u_query"), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    g2 = materialize(
        g1,
        __u_host=F.regexp_replace(
            F.regexp_replace(hostport, ":[0-9]+$", ""), r"^www\.", ""
        ),
        __u_port=F.regexp_extract(hostport, ":([0-9]+)$", 1),
        __u_path=path,
        __u_qs=F.concat_ws("&", F.array_sort(params)),
    )
    port = F.col("__u_port")
    qs = F.col("__u_qs")
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        F.col("__u_host"),
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.col("__u_path"),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return (
        g2.withColumn("host", F.col("__u_host"))
        .withColumn("port", F.when(keep_port, port).otherwise(F.lit("")))
        .withColumn("url_norm", url_norm)
        .drop(
            "__u_scheme", "__u_hostport", "__u_rawpath", "__u_query",
            "__u_host", "__u_port", "__u_path", "__u_qs",
        )
    )


# DuckDB mirror over a relation exposing (doc_id, url). Same regexes, same
# rule order; list_sort/array_sort agree bytewise on ASCII params.
URL_NORMALIZE_EXPR_SQL = r"""
SELECT doc_id, url,
  host,
  CASE WHEN keep_port THEN port ELSE '' END AS port,
  scheme || '://' || host
    || (CASE WHEN keep_port THEN ':' || port ELSE '' END)
    || path
    || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS url_norm
FROM (
  SELECT doc_id, url, scheme, host, port,
    port <> '' AND NOT ((scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')) AS keep_port,
    CASE WHEN path3 = '' THEN '/' ELSE path3 END AS path,
    array_to_string(list_sort(list_filter(string_split(query, '&'),
      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)(=|$)'))), '&') AS qs
  FROM (
    SELECT doc_id, url, scheme, port,
      regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\.', '') AS host,
      regexp_replace(regexp_replace(path1, '/{2,}', '/', 'g'), '/$', '') AS path3,
      regexp_extract(regexp_replace(url, '#.*$', ''), '\?([^#]*)', 1) AS query
    FROM (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
        regexp_extract(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':([0-9]+)$', 1) AS port,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path1
      FROM urls_in
    )
  )
)
"""


def cap_per_domain(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    cap: int = 1000,
) -> DataFrame:
    """Per-domain document cap (Common-Crawl curation staple: one SEO farm
    must not dominate the corpus). A document in a domain wider than
    ``cap`` survives iff ``pmod(hash64(id), width) < cap`` — the SHARED
    deterministic hash-threshold policy (functions/capping.py: expected
    surviving width = cap, exact when width <= cap, no per-domain ranking
    Window, retry/append-reproducible in the data).

    Scale shape: one map-side-combinable width count + one AQE-splittable
    equijoin back on host — the same two-pass shape as every other cap;
    a 10^9-page domain costs one counter and a skew-split join, never a
    single-task sort."""
    from posextract_spark.functions.capping import cap_bucket_width

    return cap_bucket_width(df, [host_col], id_col, cap)


def cap_per_domain_sql(cap: int, inner: str = "urls_in") -> str:
    """DuckDB mirror over a (doc_id, host, ...) relation ``inner``: the
    same md5 threshold, widths via a window count (engine-local detail —
    the FILTER SEMANTICS are what the oracle checks)."""
    return f"""
SELECT doc_id, host
FROM (
  SELECT doc_id, host, count(*) OVER (PARTITION BY host) AS w
  FROM {inner}
)
WHERE w <= {cap}
   OR (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % w < {cap}
"""
