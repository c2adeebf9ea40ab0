"""Distributed Bloom filter build + probe — the membership-test scale
path for eval-set decontamination (and any "is this value in that other
table" gate) when even the DISTINCT key set of the filter side is too
large to ship raw but a few bits per key are fine.

Representation: the filter is a DataFrame of (word_idx BIGINT,
bits BIGINT) rows — a sparse packed bitset. Bits live at positions
0..62 of each word (63-bit words: DuckDB's ``<<`` range-checks and
``1 << 63`` overflows a signed BIGINT, so bit 63 is never used; every
mask stays positive in both engines). Membership hashing is the
portable md5-based hash64 (functions/hashing.py) with k per-hash salt
prefixes, so build and probe are deterministic, retry-safe, and
bit-identical between Spark and the DuckDB mirror.

Semantics: the standard Bloom guarantee — NO false negatives (every
inserted value probes true), false positives at a rate set by
(m_bits, k, n_items). For decontamination that is the right direction:
a false positive quarantines a clean document (cheap), a false negative
would leak eval data into training (catastrophic).

Scale shape (100 TB): build is one scan of the filter side -> k
positions per value (scan-side array explode) -> ONE word_idx-keyed
groupBy with bit_or (map-side partials collapse each partition to at
most m_bits/63 rows, so the shuffle is bounded by the FILTER SIZE, not
the data). The built filter is m_bits/8 bytes regardless of item count
(1 GiB handles ~8.6e8 items at 1% fpp) — broadcast it and the probe is
scan-side: k positions per value, one broadcast hash join against the
word rows, groupBy-back on the probed key. Compare decontaminate's
exact path, whose broadcast grows with the eval set's DISTINCT shingle
count; the bloom's size is chosen, not inherited.

Spark has a builtin BloomFilterAggregate (DataFrame.stat.bloomFilter /
the bloom_filter_agg expression) — not used here because (a) it
materializes the filter on the DRIVER as a single opaque sketch rather
than a distributable DataFrame, and (b) its xxhash64-based layout has
no DuckDB mirror, so it cannot be oracle-checked. The layout here keeps
the filter itself a first-class, partitioned, parquet-writable table —
a model artifact a later job (or a different engine) can reuse.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

WORD_BITS = 63  # bits 0..62 only; see module docstring


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` at target false-positive rate.
    Driver-side config math (floats fine here — nothing data-dependent):
    m = -n ln(p) / ln(2)^2, k = (m/n) ln 2."""
    if n_items <= 0:
        raise ValueError("bloom_params: n_items must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("bloom_params: fpp must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(WORD_BITS, ((m + WORD_BITS - 1) // WORD_BITS) * WORD_BITS)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(value: Column, m_bits: int, k: int) -> Column:
    """Array of the k bit positions for a value (distinct salt per hash)."""
    return F.array(
        *[
            F.pmod(portable_hash64(F.concat(F.lit(f"bf{i}#"), value)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, value_col: str = "value", m_bits: int = 63 * 1024, k: int = 5
) -> DataFrame:
    """(word_idx, bits) — build the filter from a column of values.
    Duplicate values cost nothing extra (bit_or is idempotent); absent
    words mean all-zero (the probe coalesces)."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"bloom_build: m_bits must be a multiple of {WORD_BITS}")
    pos = df.select(
        F.explode(_positions(F.col(value_col), m_bits, k)).alias("h")
    )
    return (
        pos.select(
            F.expr(f"h div {WORD_BITS}").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(h % {WORD_BITS} AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(_mask)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str = "value",
    m_bits: int = 63 * 1024,
    k: int = 5,
    id_cols: tuple = (),
) -> DataFrame:
    """(*id_cols, value_col, in_bloom) — probe every row's value; a value
    is in_bloom=1 iff ALL k bits are set. One broadcast hash join of the
    exploded probe positions against the word rows, then a groupBy back
    on the probed row (hit count == k). No driver collect: the filter
    stays a DataFrame end to end."""
    cols = [*id_cols, value_col]
    pos = df.select(
        *cols, F.posexplode(_positions(F.col(value_col), m_bits, k)).alias("_i", "h")
    ).select(
        *cols,
        "_i",
        F.expr(f"h div {WORD_BITS}").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(h % {WORD_BITS} AS INT))").alias(
            "_mask"
        ),
    )
    hit = (
        F.col("_mask").bitwiseAND(F.coalesce(F.col("bits"), F.lit(0))) == F.col("_mask")
    ).cast("int")
    return (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .select(*cols, hit.alias("_hit"))
        .groupBy(*cols)
        .agg((F.sum("_hit") == F.lit(k)).cast("int").alias("in_bloom"))
    )


def decontaminate_bloom(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 63 * 1024,
    k: int = 5,
) -> DataFrame:
    """Bloom-gated eval-contamination count — same output shape as
    mldata.decontaminate (rows only for flagged docs: doc_id,
    n_contaminated), but n_contaminated counts the doc's distinct
    shingles the BLOOM claims eval contains: a superset signal
    (>= the exact count per doc, never misses real contamination;
    property-pinned by tests/test_bloom.py). Use when the eval shingle
    set outgrows both the broadcast and the appetite for a shuffle join:
    the filter is m_bits/8 bytes, period."""
    from posextract_spark.functions.boundary import materialize
    from posextract_spark.functions.hashing import word_array
    from posextract_spark.operators.dedup import SHINGLE_N, _shingles

    def shingle_rows(frame: DataFrame) -> DataFrame:
        g = materialize(
            frame.select(F.col(id_col), F.col(text_col)),
            __bw=word_array(F.col(text_col)),
        )
        return g.filter(F.size(F.col("__bw")) >= SHINGLE_N).select(
            F.col(id_col), F.explode(_shingles(F.col("__bw"))).alias("shingle")
        )

    filt = bloom_build(
        shingle_rows(eval_df).select(F.col("shingle").alias("value")),
        m_bits=m_bits,
        k=k,
    )
    probed = bloom_probe(
        shingle_rows(train_df),
        filt,
        value_col="shingle",
        m_bits=m_bits,
        k=k,
        id_cols=(id_col,),
    )
    return (
        probed.filter(F.col("in_bloom") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


# --- DuckDB mirrors ----------------------------------------------------------


def _positions_sql(value_expr: str, m_bits: int, k: int) -> str:
    """DuckDB list of the k positions (same salts, same hash)."""
    items = ", ".join(
        portable_hash64_sql(f"('bf{i}#' || {value_expr})") + f" % {m_bits}"
        for i in range(k)
    )
    return f"[{items}]"


def bloom_decontaminate_sql(m_bits: int = 63 * 1024, k: int = 5) -> str:
    """Mirror of decontaminate_bloom over the contract corpus (eval suite
    = doc_id % 29 = 0, train side = ALL docs — both exactly as
    DECONTAMINATE_SQL, so the bloom row set is a per-doc superset of the
    exact query's)."""
    pos = _positions_sql("shingle", m_bits, k)
    return f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    list_distinct(CASE WHEN len(ws) >= 5 THEN
      list_transform(generate_series(1, len(ws) - 4),
                     i -> array_to_string(ws[i:i+4], ' '))
      ELSE [] END)) AS shingle
  FROM words
),
epos AS (
  SELECT unnest({pos}) AS h FROM sh WHERE doc_id % 29 = 0
),
bloom AS (
  SELECT h // {WORD_BITS} AS word_idx,
         bit_or(1::BIGINT << CAST(h % {WORD_BITS} AS INT)) AS bits
  FROM epos GROUP BY h // {WORD_BITS}
),
tpos AS (
  SELECT doc_id, shingle, unnest({pos}) AS h FROM sh
),
hits AS (
  SELECT t.doc_id, t.shingle,
         CAST(count(*) FILTER (WHERE
           (1::BIGINT << CAST(t.h % {WORD_BITS} AS INT)) & coalesce(b.bits, 0)
             = (1::BIGINT << CAST(t.h % {WORD_BITS} AS INT))
         ) = {k} AS INT) AS in_bloom
  FROM tpos t LEFT JOIN bloom b ON t.h // {WORD_BITS} = b.word_idx
  GROUP BY t.doc_id, t.shingle
)
SELECT doc_id, count(*) AS n_contaminated
FROM hits WHERE in_bloom = 1
GROUP BY doc_id"""
