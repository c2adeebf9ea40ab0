"""Sketch aggregations — fixed-memory approximate statistics.

At the 10^12-document design point, per-group ``countDistinct`` over a
high-cardinality value (distinct URLs per host, distinct hosts per
n-gram) shuffles every distinct value to its reducer. A sketch caps the
per-group state at a constant, turning the aggregation into plain
map-side-combinable ``min``s — the same shuffle shape as a ``sum``.

The sketch here is KMV with stochastic averaging (Bar-Yossef et al.'s
k-minimum-values family, bucketed like Flajolet's PCSA/HLL): the hash
space is split into ``k`` substreams by ``hash mod k``; each substream
keeps only MIN(hash). Unlike classic bottom-k (which needs a k-smallest
aggregate Spark lacks natively — a ranking window would serialize hot
groups), per-bucket min is a plain aggregate: deterministic in the data,
partition-independent, mergeable (min of mins), and exactly mirrorable
in SQL. Everything is integer arithmetic on the md5-derived 60-bit hash
(functions/hashing.portable_hash64 — the engine-portable hash used by
exact dedup), so the DuckDB oracle hash-matches bit-for-bit, the same
hard signal pattern as integer PageRank / k-means.

Estimator: Giroire's inverse-sum. With b hit buckets each holding the
min of ~n/k uniform hashes on [0, M), each min is ≈ Exponential with
mean M·k/n, so S = sum of mins ≈ Gamma(b, M·k/n) and the bias-corrected
inverse n̂ = (b-1)·b·M / S is unbiased for n ≫ k (measured rel. err.
0.5-8% for n ≥ 4k at k ∈ {64, 256} — ~1/sqrt(k)). (Summing per-bucket
M/min instead is the tempting-but-wrong estimator: 1/min is
heavy-tailed, E[M/min] diverges, measured 4.6× overestimate.) Below
n ≈ k the estimate degrades toward ~2n; that regime is visible to the
caller as n_buckets < k, and a group small enough to leave buckets
empty is small enough for exact countDistinct anyway — the sketch
exists for the groups that are NOT.

Duplicate values hash identically, so duplicates never inflate the
estimate — that's the whole point of hashing first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import portable_hash64, portable_hash64_sql

#: hash domain: portable_hash64 yields 15 hex chars = 60 bits
HASH_M = 1 << 60


def distinct_kmv(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """(key, n_buckets, est_distinct) — approximate distinct ``value_col``
    per ``key_col`` in constant memory per group.

    n_buckets = substreams actually hit (< k flags the small-cardinality
    regime where the caller should trust exact counting instead);
    est_distinct = (n_buckets - 1) * n_buckets * M div sum(bucket mins),
    floor-integer so the result is exact given the input. NULL values
    are ignored (they are not a distinct value).

    Scale shape: ONE shuffle on (key, bucket) with map-side partial mins
    — per-group reducer state is ≤ k longs regardless of group size, so
    a host with 10^9 URLs costs the same as one with 10^2. The second
    groupBy(key) aggregates ≤ k rows per key. No window, no collect_set,
    no unbounded state anywhere.
    """
    h = portable_hash64(F.col(value_col))
    per_bucket = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(key_col).alias("key"), h.alias("_h"))
        .groupBy("key", F.pmod(F.col("_h"), F.lit(k)).alias("_b"))
        .agg(F.min("_h").alias("_m"))
    )
    return (
        per_bucket.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            # DECIMAL(38,0): S can reach k*2^60 ≈ 2^68 and the numerator
            # (b-1)*b*M ≈ 2^76 — both past BIGINT. Spark's decimal `div`
            # is an exact integral divide returning BIGINT (the quotient
            # ≈ the cardinality, which fits); DuckDB mirrors the same
            # arithmetic in native HUGEINT.
            F.sum(F.col("_m").cast("decimal(38,0)")).alias("_s"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_buckets",
            F.expr(
                f"(CAST(n_buckets - 1 AS DECIMAL(38,0)) * n_buckets "
                f"* {HASH_M}) div _s"
            ).alias("est_distinct"),
        )
    )


def distinct_kmv_sql(
    rel: str,
    key_col: str,
    value_col: str,
    k: int = 256,
) -> str:
    """DuckDB mirror of distinct_kmv() (same integer recurrence, HUGEINT
    in place of Spark's DECIMAL(38,0)); the hash is hoisted into one
    subquery column so md5 runs once per row like the Spark side."""
    h = portable_hash64_sql(value_col)
    return f"""
, _kmvh AS (
  SELECT {key_col} AS key, {h} AS h
  FROM {rel} WHERE {value_col} IS NOT NULL),
_kmv AS MATERIALIZED (
  SELECT key, h % {k} AS b, min(h) AS m
  FROM _kmvh GROUP BY 1, 2)
SELECT key AS {key_col}, CAST(count(*) AS BIGINT) AS n_buckets,
       CAST((count(*)::HUGEINT - 1) * count(*) * {HASH_M}
            // sum(m::HUGEINT) AS BIGINT) AS est_distinct
FROM _kmv GROUP BY key"""


def cms_build(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    lowercase: bool = True,
) -> DataFrame:
    """(row INT, idx BIGINT, c BIGINT) — a Count-Min sketch of corpus
    token frequencies (Cormode & Muthukrishnan): depth hash rows of
    width counters; every token occurrence increments one counter per
    row; a point estimate is the MIN over rows (cms_estimate below).
    The heavy-hitter companion to the KMV distinct sketch: fixed
    width*depth memory for frequency queries over an unbounded
    vocabulary, one-sided error (never underestimates — collisions only
    ADD), overestimate <= 2e/width * total with prob 1 - e^-depth.

    Scale shape: token counting is the ONE corpus-sized shuffle
    (map-side combinable); the depth hash evaluations then run over the
    DISTINCT-word frame weighted by count (vocabulary-bounded, the
    bpe_pair_counts argument), and the final (row, idx) aggregation has
    at most width*depth groups. The sketch is mergeable across
    partitions/corpora by summing counters — a plain sum groupBy.
    """
    from posextract_spark.functions.hashing import word_array

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    wc = (
        docs.select(F.explode(word_array(src)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wn"))
    )
    rows = []
    for r in range(depth):
        rows.append(
            wc.select(
                F.lit(r).cast("int").alias("row"),
                F.pmod(
                    portable_hash64(F.concat(F.lit(f"cms{r}#"), F.col("w"))),
                    F.lit(width),
                ).alias("idx"),
                F.col("wn"),
            )
        )
    u = rows[0]
    for fr in rows[1:]:
        u = u.unionAll(fr)
    return u.groupBy("row", "idx").agg(F.sum("wn").cast("long").alias("c"))


def cms_estimate(
    tokens: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(token, n_est) — point-estimate each token's corpus frequency from
    a cms_build sketch: min over the depth rows of the addressed
    counter. The sketch is width*depth rows — broadcast; the token frame
    explodes to depth probe rows and min-combines back (token-keyed
    groupBy over depth*|tokens| rows; for a handful of query tokens this
    is all driver-trivial, for a full-vocab scoring pass it is one
    bounded shuffle). Missing counters read 0 (token never seen)."""
    probes = None
    for r in range(depth):
        p = tokens.select(
            F.col(token_col).alias("token"),
            F.lit(r).cast("int").alias("row"),
            F.pmod(
                portable_hash64(F.concat(F.lit(f"cms{r}#"), F.col(token_col))),
                F.lit(width),
            ).alias("idx"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(F.broadcast(sketch), ["row", "idx"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("n_est"))
    )


def cms_top_tokens_sql(
    docs_rel: str = "documents",
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    k: int = 20,
) -> str:
    """Mirror of the composed contract query: build the sketch, take the
    top-k exact tokens (count DESC, token ASC), emit
    (token, n_exact, n_est) — n_est >= n_exact is the CMS guarantee the
    gate then value-checks."""
    words = f"list_filter(string_split(lower({text_col}), ' '), w -> w <> '')"
    h_w = [portable_hash64_sql(f"('cms{r}#' || w)") for r in range(depth)]
    h_tw = [portable_hash64_sql(f"('cms{r}#' || t.w)") for r in range(depth)]
    row_selects = "\n  UNION ALL\n".join(
        f"  SELECT {r} AS row, ({h_w[r]} % {width}) AS idx, wn FROM _cms_wc"
        for r in range(depth)
    )
    est_terms = ",\n    ".join(
        f"(SELECT coalesce(min(c), 0) FROM _cms_sk s WHERE s.row = {r} AND "
        f"s.idx = ({h_tw[r]} % {width}))"
        for r in range(depth)
    )
    return f"""
WITH _cms_wc AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wn
  FROM (SELECT unnest({words}) AS w FROM {docs_rel})
  GROUP BY w),
_cms_sk AS MATERIALIZED (
  SELECT row, idx, CAST(sum(wn) AS BIGINT) AS c FROM (
{row_selects}
  ) GROUP BY row, idx),
_cms_top AS (SELECT w, wn FROM _cms_wc ORDER BY wn DESC, w ASC LIMIT {k})
SELECT t.w AS token, t.wn AS n_exact,
       CAST(least({est_terms}) AS BIGINT) AS n_est
FROM _cms_top t"""
