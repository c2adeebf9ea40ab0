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
