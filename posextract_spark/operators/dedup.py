"""Deduplication operators (exact, minhash-LSH, simhash, n-gram Jaccard).

Scale notes (the 100 TB design point):
- exact dedup is a single hash-keyed shuffle with map-side partial
  aggregation; the representative-choice (min doc_id) keeps it one pass.
- minhash: signatures AND band keys are per-row array expressions (zero
  shuffle, zero Python); the only shuffle in the whole near-dup path is the
  band-bucket self-join, which AQE skew-split handles when a band bucket
  is hot (boilerplate-heavy shards).
- n-gram Jaccard candidate generation joins on shared shingles — quadratic
  on hot shingles; it is provided as the exact small-scale baseline, with
  minhash-LSH as the scale path.
- hashing is the portable md5-based hash (functions.hashing) so every
  stage is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import portable_hash64, word_array

MINHASH_SEEDS = 8
SHINGLE_N = 5


def _shingles(text_col: str):
    """Distinct word 5-gram shingles as strings."""
    words = word_array(F.col(text_col))
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(SHINGLE_N), F.lit(-1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, SHINGLE_N)))
    return F.array_distinct(F.when(n >= SHINGLE_N, sh).otherwise(F.array()))


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    representative (min id) and multiplicity."""
    return (
        df.select(portable_hash64(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


# Affine rehash family for minhash: each shingle is md5-hashed ONCE, then
# seed s's hash is (A[s] * (h % P) + B[s]) % P with P prime > 2^32. All
# integer ops stay far below 2^63 (A,B < 2^20; h%P < 2^33), so no overflow
# under ANSI mode and exact parity in DuckDB.
MINHASH_P = 4294967311
MINHASH_A = [7, 131, 2053, 16411, 131101, 524309, 1048583, 999983]
MINHASH_B = [3, 401, 4099, 32771, 262147, 786433, 65537, 424243]


def _signature_array_from(hs, n_seeds: int):
    """array<struct<seed:int, minhash:bigint>> from a column reference
    holding the array of base shingle hashes. IMPORTANT: pass a *column
    reference*, not the expression itself — the array is referenced n_seeds
    times and Catalyst would otherwise duplicate the whole computation per
    reference (no CSE across array elements; observed 5-20x slowdowns)."""

    def min_for(seed: int):
        a, b = MINHASH_A[seed % len(MINHASH_A)], MINHASH_B[seed % len(MINHASH_B)]
        return F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P))
        )

    arr = F.array(
        *[
            F.struct(F.lit(s).cast("int").alias("seed"), min_for(s).alias("minhash"))
            for s in range(n_seeds)
        ]
    )
    return F.when(F.size(hs) > 0, arr)


def _with_signature(df: DataFrame, text_col: str, id_col: str, n_seeds: int) -> DataFrame:
    """(id, _sig) with projection barriers so shingles, their base hashes,
    and the signature array are each computed exactly once per row
    (CollapseProject keeps multi-referenced non-cheap attributes
    materialized)."""
    shingled = df.select(F.col(id_col), _shingles(text_col).alias("_sh"))
    hashed = shingled.select(
        F.col(id_col),
        F.transform(F.col("_sh"), lambda s: portable_hash64(s)).alias("_hs"),
    )
    return hashed.select(
        F.col(id_col), _signature_array_from(F.col("_hs"), n_seeds).alias("_sig")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """(id, seed, minhash) — min over shingles of hash(seed || '|' || shingle).

    Computed as per-row array expressions + one explode: no shuffle at all
    (the naive shingle x seed explode + groupBy creates |shingles| x K rows
    and a giant partial-agg shuffle). Documents with fewer than SHINGLE_N
    words emit no rows.
    """
    sig = _with_signature(df, text_col, id_col, n_seeds)
    return sig.select(F.col(id_col), F.explode("_sig").alias("sm")).select(
        id_col, F.col("sm.seed").alias("seed"), F.col("sm.minhash").alias("minhash")
    )


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: band key = hash of the band's ordered minhashes; output
    candidate near-duplicate pairs (a < b) with the number of bands that
    collided."""
    # Band keys straight from the scan-side signature array: no groupBy.
    sig_df = _with_signature(df, text_col, id_col, n_seeds)
    sig = F.col("_sig")
    n_bands = n_seeds // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                portable_hash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(sig, b * band_size + r + 1)["minhash"].cast("string")
                            for r in range(band_size)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    keys = sig_df.select(
        F.col(id_col), F.explode(F.when(sig.isNotNull(), bands)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a, b = keys.alias("a"), keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """16-bit SimHash over the word multiset: bit j is set iff
    sum over word instances of (+1 if bit j of hash(word) else -1) > 0.

    Fully scan-side: hash the word array once per row, then per bit
    popcount via size(filter(...)) — sum_j = 2*set_j - n. No explode, no
    shuffle."""
    hashes = F.transform(word_array(F.col(text_col)), lambda w: portable_hash64(w))
    n = F.size(hashes)
    fp = None
    for j in range(bits):
        set_j = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1)
        )
        term = F.when((set_j * 2 - n) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    # wordless docs emit nothing (parity with the word-explode formulation)
    return df.filter(F.size(word_array(F.col(text_col))) > 0).select(
        F.col(id_col), fp.cast("bigint").alias("simhash")
    )


def ngram_jaccard_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact shared-shingle statistics per document: how many other docs
    share at least one 5-gram shingle, and the max shared-shingle count.
    (The exact-Jaccard small-scale baseline; minhash_band_pairs is the
    scale path.)"""
    sh = df.select(F.col(id_col), F.explode(_shingles(text_col)).alias("shingle"))
    a, b = sh.alias("a"), sh.alias("b")
    overl = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return overl.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_candidates"), F.max("shared").alias("max_shared")
    )


# --- DuckDB mirrors --------------------------------------------------------

_H = "(('0x' || substring(md5({x}), 1, 15))::BIGINT)"
_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"
# DuckDB lists are 1-based; shingle i covers words [i, i+4].
_SHINGLES = (
    f"list_distinct(CASE WHEN len({_WORDS}) >= 5 THEN "
    f"list_transform(generate_series(1, len({_WORDS}) - 4), "
    f"i -> array_to_string({_WORDS}[i:i+4], ' ')) "
    f"ELSE [] END)"
)

EXACT_DEDUP_SQL = f"""
SELECT {_H.format(x='text')} AS text_hash,
       min(doc_id) AS rep_id, count(*) AS n_docs
FROM documents GROUP BY 1
"""

_A_LIST = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_B_LIST = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"

MINHASH_SIGNATURES_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_H.format(x='shingle')} AS h
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents)
),
seeds AS (SELECT unnest(generate_series(0, {MINHASH_SEEDS - 1})) AS seed),
rehashed AS (
  SELECT doc_id, seed,
         ({_A_LIST}[seed + 1] * (h % {MINHASH_P}) + {_B_LIST}[seed + 1]) % {MINHASH_P} AS mh
  FROM sh CROSS JOIN seeds
)
SELECT doc_id, seed, min(mh) AS minhash FROM rehashed GROUP BY doc_id, seed
"""

SIMHASH_SQL = f"""
WITH w AS (
  SELECT doc_id, {_H.format(x='word')} AS h
  FROM (SELECT doc_id, unnest({_WORDS}) AS word FROM documents)
),
bitsum AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM w CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM bitsum GROUP BY doc_id
"""

NGRAM_JACCARD_STATS_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
),
overl AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a AS doc_id, count(*) AS n_candidates, max(shared) AS max_shared
FROM overl GROUP BY id_a
"""

MINHASH_BAND_PAIRS_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_H.format(x='shingle')} AS h
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents)
),
seeds AS (SELECT unnest(generate_series(0, {MINHASH_SEEDS - 1})) AS seed),
sig AS (
  SELECT doc_id, seed,
         min(({_A_LIST}[seed + 1] * (h % {MINHASH_P}) + {_B_LIST}[seed + 1]) % {MINHASH_P}) AS minhash
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
),
keys AS (
  SELECT doc_id, (seed // 2) AS band,
         {_H.format(x="array_to_string(list_transform(list_sort(list({'s': seed, 'm': minhash})), r -> r.m::VARCHAR), ',')")} AS band_key
  FROM sig GROUP BY doc_id, (seed // 2)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
FROM keys a JOIN keys b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""
