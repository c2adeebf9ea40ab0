"""Deterministic hot-bucket width capping — THE one implementation.

Three operators bound quadratic hot-bucket work the same way
(ngram_jaccard_stats, minhash_band_pairs, neardup_bucket_stats): a row in
a bucket wider than ``cap`` survives iff ``pmod(hash64(id), width) < cap``
— kept with probability cap/width, so the expected surviving width is
exactly ``cap`` (binomial concentration; O(cap) whp), buckets at or under
the cap untouched (exact). The sample is deterministic in the DATA (md5
of the id), so cluster-side stage retries reproduce it (no
SPARK-23207-class recompute hazard), and there is NO per-bucket
row_number Window — a ranking cap serializes the whole hot bucket onto
one task, the exact hazard VERDICT r4 item 1 removed.

Shared helper (r5): the policy previously lived in three near-identical
copies; like the media quarantine (operators/multimodal.py
_decode_or_none), drift between copies is how one surface silently keeps
the hazard.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import portable_hash64


def cap_bucket_width(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    cap: int,
    widths: Optional[DataFrame] = None,
    width_col: str = "_n",
) -> DataFrame:
    """Subsample rows so each (bucket_cols) bucket keeps expected ``cap``
    rows, deterministically in ``id_col``.

    ``widths``: pre-computed (bucket_cols..., width_col) frame to join —
    pass it when the caller already aggregates widths (e.g.
    neardup_bucket_stats' ``sizes``); otherwise it is computed here with
    a map-side-partial groupBy count, which consumes ``df`` a second
    time (the deliberate linear-for-quadratic trade documented at the
    call sites)."""
    bucket_cols = list(bucket_cols)
    if widths is None:
        widths = df.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias(width_col))
    return (
        df.join(widths, bucket_cols)
        .filter(
            (F.col(width_col) <= cap)
            | (F.pmod(portable_hash64(F.col(id_col).cast("string")), F.col(width_col)) < cap)
        )
        .drop(width_col)
    )
