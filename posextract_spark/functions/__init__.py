"""Column-function helpers shared by operators (all JVM-side, no UDFs)."""

from posextract_spark.functions.hashing import portable_hash64, word_array  # noqa: F401
