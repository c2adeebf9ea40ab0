"""JSONL (newline-delimited JSON) document source — the format webtext
corpora actually arrive in (Common-Crawl derivative dumps, Dolma, HF
datasets exports are all JSONL/JSONL.gz).

Design decisions for the 100-TB read path:
- The schema is DECLARED, never inferred: schema inference reads the
  whole input once before the real job starts — at 100 TB that is a
  full extra pass, and a single odd record silently widens a column for
  the entire run. Callers get documents-table columns out regardless of
  the producer's field names (``field_map`` renames at the projection).
- Corrupt records quarantine, never kill: mode=PERMISSIVE with a
  ``_corrupt_record`` column; ``read_documents_jsonl`` returns the clean
  frame and ``jsonl_corrupt_records`` the quarantine stream (same
  pattern as multimodal's corruption quarantine) — a crawl dump with
  0.01% broken lines must not fail a week-long job, and the broken
  lines must stay auditable.
- .gz inputs are fine but each gzip member is ONE task (not
  splittable): the docstring-level guidance is many medium files (the
  layout crawl dumps already use), not one giant archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: producer-side fields expected by default (Dolma-style)
JSONL_FIELDS = (
    ("id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
)

#: default mapping producer field -> documents-table column
DEFAULT_FIELD_MAP = {"id": "doc_id", "text": "text", "lang": "lang", "source": "source"}


def jsonl_schema() -> StructType:
    """Declared read schema: the expected fields plus the PERMISSIVE-mode
    corrupt-record sink column."""
    return StructType(
        [StructField(n, t, True) for n, t in JSONL_FIELDS]
        + [StructField("_corrupt_record", StringType(), True)]
    )


def _raw(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(jsonl_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    field_map: dict[str, str] | None = None,
) -> DataFrame:
    """Documents-table frame from a JSONL dump: declared schema, corrupt
    lines dropped (see jsonl_corrupt_records for the quarantine view),
    producer fields renamed per ``field_map``, and ``n_chars`` derived —
    the output is column-for-column the synthetic documents table, so
    every operator and contract query runs on a real dump unchanged.

    Drop predicate = (id IS NULL after the PERMISSIVE parse) — and ONLY
    that (ADVICE r7): a malformed line parses to all-NULL fields (id
    included, dropped); a line whose id is missing/untypable is dropped;
    a line whose id parses but a SECONDARY field fails conversion is
    KEPT with that field NULL (partial-results parsing). This makes the
    drop set structurally identical to jsonl_corrupt_records' from_json
    predicate, so no line can vanish from both views — the previous
    `_corrupt_record IS NULL` conjunct silently dropped
    secondary-field-corrupt lines that the quarantine could not see."""
    fmap = dict(DEFAULT_FIELD_MAP if field_map is None else field_map)
    df = _raw(spark, path).filter(F.col(fmap_src(fmap, "doc_id")).isNotNull())
    cols = [F.col(src).alias(dst) for src, dst in fmap.items()]
    return df.select(*cols, F.length(F.coalesce(F.col(fmap_src(fmap, "text")), F.lit(""))).cast("long").alias("n_chars"))


def fmap_src(fmap: dict[str, str], dst: str) -> str:
    """Producer-side field name that maps to documents column ``dst``."""
    for src, d in fmap.items():
        if d == dst:
            return src
    raise ValueError(f"field_map has no source for required column {dst!r}")


def jsonl_corrupt_records(spark: SparkSession, path: str) -> DataFrame:
    """(line) — the quarantine view: raw text of every line the clean
    reader drops (invalid JSON, or a parseable line whose id field is
    missing/untypable). Audit/alert on its count; never silently lose
    producer bugs.

    Built on a raw ``text`` read + ``from_json``, NOT the PERMISSIVE
    reader's ``_corrupt_record`` column: Spark refuses any plan that
    column-prunes down to only the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and every
    aggregation over a quarantine view does exactly that; the
    cache-the-raw-frame workaround is not an option at a 100-TB read.
    from_json yields a NULL struct on malformed JSON and a NULL id on a
    type-corrupt one — together the same drop set as
    read_documents_jsonl's filter."""
    inner = StructType([StructField(n, t, True) for n, t in JSONL_FIELDS])
    parsed = F.from_json(F.col("value"), inner)
    return (
        spark.read.text(path)
        .filter(parsed.isNull() | parsed["id"].isNull())
        .select(F.col("value").alias("line"))
    )


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int = 32,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Documents-table frame -> JSONL dump with DETERMINISTIC sharding:
    each row's shard is the md5 hash of its id (shuffle_shards' rule),
    so re-running the export after a retry, repartition, or append
    produces byte-stable shard MEMBERSHIP (file ordering within a shard
    follows the shard sort). One exchange on the shard key; writers are
    n_shards parallel tasks — size n_shards so one shard ~ one
    comfortable task output (256-1024 MB at 100 TB scale).

    Round-trips through read_documents_jsonl (n_chars is derived on
    read, so it is dropped here if present)."""
    from posextract_spark.functions.hashing import portable_hash64

    cols = [c for c in df.columns if c != "n_chars"]
    out = (
        df.select(*cols)
        .withColumn(
            "__shard",
            F.pmod(portable_hash64(F.col(id_col).cast("string")), F.lit(n_shards)),
        )
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions(id_col)
        .drop("__shard")
    )
    # producer field names: documents 'doc_id' goes out as 'id'
    out = out.withColumnRenamed(id_col, "id")
    out.write.mode(mode).json(path)
