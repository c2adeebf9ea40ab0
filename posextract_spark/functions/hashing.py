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
    expression: a non-attribute subtree referenced by the ladder below
    re-evaluates per reference — O(words^2) per document (measured 9.4s
    vs 4.0s at 200k docs when shingling passed the split directly).

    Implementation (r8): a zip_with LADDER — level k concatenates the
    (k)-gram at each position with the word k places right, so n-1
    interpreted passes of a 2-arg concat build every n-gram, instead of
    one pass whose per-gram lambda allocates a 5-slice and runs a
    varargs concat_ws (measured at 200k docs x ~50 words: gram array
    3.1s -> 1.0s, gram+posexplode 6.3s -> 2.8s; byte-identical output
    incl. multi-space/short-doc edges, full-corpus exceptAll = 0).
    zip_with pads the shorter (sliced) side with NULL and concat
    propagates it, so positions past size-n+1 turn NULL and the final
    slice drops exactly them; the ``when`` guard short-circuits docs
    shorter than ``n`` words to an empty array."""
    size = F.size(words)
    acc = words
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(words, k + 1, F.greatest(size - F.lit(k), F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.slice(acc, 1, F.greatest(size - F.lit(n - 1), F.lit(0)))
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))
