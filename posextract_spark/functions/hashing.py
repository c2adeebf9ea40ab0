"""Portable deterministic hashing.

``portable_hash64(col)`` produces the same BIGINT in Spark and DuckDB:

    Spark : conv(substring(md5(x), 1, 15), 16, 10) :: bigint
    DuckDB: ('0x' || substring(md5(x), 1, 15)) :: BIGINT

(15 hex digits = 60 bits, always fits a signed 64-bit int). This is what
makes minhash/simhash/fingerprint operators oracle-checkable across engines.
xxhash64 would be faster JVM-side but is Spark-private; at 100 TB the md5
cost is still tiny next to the shuffle it feeds, and it can be swapped via
the HASH_EXPR seam below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB-side rendering of the same function."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def word_array(col: Column) -> Column:
    """Whitespace tokens with empties dropped (both engines split on ' ')."""
    return F.filter(F.split(col, " "), lambda w: w != "")


WORD_ARRAY_SQL = "list_filter(string_split({col}, ' '), w -> w <> '')"


def ngram_array(words: Column, n: int) -> Column:
    """Space-joined word n-grams, THE one implementation (consumed by
    dedup shingling and the LM count tables). ``words`` must be a cheap
    MATERIALIZED attribute (functions/boundary.py), never the raw split
    expression: a non-attribute subtree inside the transform lambda
    re-evaluates PER GRAM — O(words^2) per document (measured 9.4s vs
    4.0s at 200k docs when shingling passed the split directly). The
    ``when`` guard dodges Spark's descending-sequence trap: sequence(1, 0)
    yields [1, 0], so docs shorter than ``n`` words must short-circuit to
    an empty array rather than emit phantom grams."""
    size = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(size - F.lit(n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))
