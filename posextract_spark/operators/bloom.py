"""Distributed Bloom filter build + probe — the membership-test scale
path for eval-set decontamination (and any "is this value in that other
table" gate) when even the DISTINCT key set of the filter side is too
large to ship raw but a few bits per key are fine.

Representation: the filter is a DataFrame of (word_idx BIGINT,
bits BIGINT) rows — a sparse packed bitset of 63-bit REGISTER BLOCKS
(the Impala/Parquet split-block design: a value's k bits all live in
one block, so membership is one lookup + one mask compare). Bits live
at positions 0..62 (DuckDB's ``<<`` range-checks and ``1 << 63``
overflows a signed BIGINT, so bit 63 is never used; every mask stays
positive in both engines). Block and in-block positions derive from ONE
portable md5 hash (functions/hashing.py), so build and probe are
deterministic, retry-safe, and bit-identical between Spark and the
DuckDB mirror.

Semantics: the standard Bloom guarantee — NO false negatives (every
inserted value probes true), false positives at a rate set by
(m_bits, k, n_items). For decontamination that is the right direction:
a false positive quarantines a clean document (cheap), a false negative
would leak eval data into training (catastrophic).

Scale shape (100 TB): build is one scan of the filter side -> one
scan-side (block, mask) projection -> ONE block-keyed groupBy with
bit_or (map-side partials collapse each partition to at most m_bits/63
rows, so the shuffle is bounded by the FILTER SIZE, not the data). The
built filter is m_bits/8 bytes regardless of item count — broadcast it
and the probe is a row-preserving scan: one hash, one broadcast hash
join on the block, one mask compare; no explode, no Exchange. Compare
decontaminate's exact path, whose broadcast grows with the eval set's
DISTINCT shingle count; the bloom's size is chosen, not inherited.
Measured honestly at sf1 (2M docs, 2.7M-shingle eval set): the exact
broadcast join wins while the eval set FITS a broadcast (89s vs ~150s
— the bloom pays one md5 per probed shingle, the exact join hashes
JVM-side); the bloom's regime is eval sets beyond broadcast reach,
where exact degrades to a full shuffle join of the train shingles.

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


def _with_block_mask(df: DataFrame, value_col: str, m_bits: int, k: int) -> DataFrame:
    """df + (__bf_block, __bf_mask) columns — REGISTER-BLOCKED bloom
    hashing (the Impala/Parquet split-block design): all k bits of a
    value live in ONE 63-bit word, so the probe is a single broadcast
    join + one mask compare instead of k joins (or a k-fold explode +
    shuffle back).

    Derivation from ONE portable md5 hash (60 uniform bits):
      block = (h % 2^30) % n_blocks          (n_blocks = m_bits / 63)
      p_i   = ((h div 2^30) div 64^i) % 64 % 63          (i < k <= 5)
      mask  = OR over i of (1 << p_i)
    Non-negative BIGINT arithmetic only (division/modulo by literal
    powers of two, no variable shifts) — bit-identical in DuckDB. The
    hash is materialized once behind a Generate boundary (it is
    referenced by block AND every bit slice; without the boundary
    Catalyst pastes the md5 per use site).

    Perf history (sf1, 2M docs, 100M probed shingles, measured): k-salt
    md5 scheme + explode/groupBy probe: 296s; Kirsch-Mitzenmacher
    double hash + k narrow broadcast joins: 335s (the per-join stream
    passes, not the hashing, dominate); this blocked layout: one hash,
    one join, one compare. Cost: blocked filters need ~1.2-1.5x the
    bits of a classic bloom for the same fpp (block-load variance);
    size m_bits accordingly."""
    from posextract_spark.functions.boundary import materialize

    if not 1 <= k <= 5:
        raise ValueError("bloom: k must be in [1, 5] (5 x 6-bit in-block slots)")
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"bloom: m_bits must be a multiple of {WORD_BITS}")
    n_blocks = m_bits // WORD_BITS
    g = materialize(
        df, __bf_h=portable_hash64(F.concat(F.lit("bf#"), F.col(value_col)))
    )
    bits = []
    for i in range(k):
        # pyspark's F.shiftleft only takes a literal shift amount, so the
        # variable-amount shift goes through expr()
        bits.append(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(((__bf_h div {1 << 30}) div {64 ** i}) % 64 % {WORD_BITS} AS INT))"
            )
        )
    mask = bits[0]
    for b in bits[1:]:
        mask = mask.bitwiseOR(b)
    return g.withColumn(
        "__bf_block", F.expr(f"(__bf_h % {1 << 30}) % {n_blocks}")
    ).withColumn("__bf_mask", mask)


def bloom_build(
    df: DataFrame, value_col: str = "value", m_bits: int = 63 * 1024, k: int = 5
) -> DataFrame:
    """(word_idx, bits) — build the filter from a column of values: one
    scan-side (block, mask) projection + ONE block-keyed bit_or groupBy
    (map-side partials collapse each partition to <= m_bits/63 rows, so
    the shuffle is bounded by the FILTER size, not the data). Duplicate
    values cost nothing extra (bit_or is idempotent); absent words mean
    all-zero (the probe coalesces)."""
    g = _with_block_mask(df, value_col, m_bits, k)
    return (
        g.groupBy(F.col("__bf_block").alias("word_idx"))
        .agg(F.expr("bit_or(__bf_mask)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str = "value",
    m_bits: int = 63 * 1024,
    k: int = 5,
) -> DataFrame:
    """(*df.columns, in_bloom) — annotate every row: in_bloom=1 iff all k
    of the value's bits are set in its block. Row-preserving projection:
    one scan-side (block, mask) computation + ONE broadcast hash join on
    the block + one mask compare. No explode, no Exchange, no driver
    collect — the probed stream flows through untouched (see
    _with_block_mask's measured history of the rejected shapes)."""
    cols = list(df.columns)
    g = _with_block_mask(df, value_col, m_bits, k)
    side = F.broadcast(
        bloom.select(F.col("word_idx").alias("__bf_block"), F.col("bits").alias("__bf_bits"))
    )
    hit = (
        F.col("__bf_mask").bitwiseAND(F.coalesce(F.col("__bf_bits"), F.lit(0)))
        == F.col("__bf_mask")
    ).cast("int")
    return g.join(side, "__bf_block", "left").select(*cols, hit.alias("in_bloom"))


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
    )
    return (
        probed.filter(F.col("in_bloom") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


# --- DuckDB mirrors ----------------------------------------------------------


def bloom_decontaminate_ctes(
    train_rel: str,
    m_bits: int = 63 * 1024,
    k: int = 5,
    eval_filter: str = "doc_id % 29 = 0",
) -> str:
    """CTE chain (no WITH prefix) ending in ``bcontam(doc_id,
    n_contaminated)`` — the composable form of bloom_decontaminate_sql
    for pipeline oracles: the eval side is documents WHERE
    ``eval_filter``; the probed side is ``train_rel`` (doc_id, text),
    typically a filtered intermediate CTE. Same hash/block/mask
    arithmetic as the standalone mirror."""
    n_blocks = m_bits // WORD_BITS
    h = portable_hash64_sql("('bf#' || shingle)")
    mask = " | ".join(
        f"(1::BIGINT << CAST(((hh // {1 << 30}) // {64 ** i}) % 64 % {WORD_BITS} AS INT))"
        for i in range(k)
    )
    shingles = (
        "unnest(list_distinct(CASE WHEN len(ws) >= 5 THEN "
        "list_transform(generate_series(1, len(ws) - 4), "
        "i -> array_to_string(ws[i:i+4], ' ')) ELSE [] END)) AS shingle"
    )
    return f"""
bw_ev AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents WHERE {eval_filter}),
bsh_ev AS (SELECT doc_id, {shingles} FROM bw_ev),
bhm_ev AS (
  SELECT (hh % {1 << 30}) % {n_blocks} AS block, {mask} AS mask
  FROM (SELECT {h} AS hh FROM bsh_ev)),
bbloom AS (SELECT block AS word_idx, bit_or(mask) AS bits FROM bhm_ev GROUP BY block),
bw_tr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM {train_rel}),
bsh_tr AS (SELECT doc_id, {shingles} FROM bw_tr),
bhm_tr AS (
  SELECT doc_id, (hh % {1 << 30}) % {n_blocks} AS block, {mask} AS mask
  FROM (SELECT doc_id, {h} AS hh FROM bsh_tr)),
bcontam AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM (
    SELECT t.doc_id,
           CAST((t.mask & coalesce(b.bits, 0)) = t.mask AS INT) AS in_bloom
    FROM bhm_tr t LEFT JOIN bbloom b ON t.block = b.word_idx)
  WHERE in_bloom = 1 GROUP BY doc_id)"""


def bloom_decontaminate_sql(m_bits: int = 63 * 1024, k: int = 5) -> str:
    """Mirror of decontaminate_bloom over the contract corpus (eval suite
    = doc_id % 29 = 0, train side = ALL docs — both exactly as
    DECONTAMINATE_SQL, so the bloom row set is a per-doc superset of the
    exact query's)."""
    n_blocks = m_bits // WORD_BITS
    h = portable_hash64_sql("('bf#' || shingle)")
    mask = " | ".join(
        f"(1::BIGINT << CAST(((hh // {1 << 30}) // {64 ** i}) % 64 % {WORD_BITS} AS INT))"
        for i in range(k)
    )
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
hm AS (
  SELECT doc_id, shingle, hh,
         (hh % {1 << 30}) % {n_blocks} AS block,
         {mask} AS mask
  FROM (SELECT doc_id, shingle, {h} AS hh FROM sh)
),
bloom AS (
  SELECT block AS word_idx, bit_or(mask) AS bits
  FROM hm WHERE doc_id % 29 = 0 GROUP BY block
),
hits AS (
  SELECT t.doc_id,
         CAST((t.mask & coalesce(b.bits, 0)) = t.mask AS INT) AS in_bloom
  FROM hm t LEFT JOIN bloom b ON t.block = b.word_idx
)
SELECT doc_id, count(*) AS n_contaminated
FROM hits WHERE in_bloom = 1
GROUP BY doc_id"""
