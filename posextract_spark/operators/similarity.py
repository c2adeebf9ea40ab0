"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline (one scan, no shuffle
except the final top-k). The LSH-bucketed variant is the scale path: random
hyperplane signs bucket vectors so the candidate scan touches ~1/2^H of the
data; hyperplanes are derived from the portable hash so both engines agree.

All arithmetic is native (zip_with / aggregate — JVM codegen); similarity is
reported as floor(sim * 1e6) BIGINT so cross-engine value hashes are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sims = df.select(
        F.col(id_col),
        F.floor(_cosine(emb, q) * F.lit(1000000.0)).cast("bigint").alias("sim_e6"),
    )
    return sims.orderBy(F.desc("sim_e6"), F.col(id_col)).limit(k)


def cosine_topk_sql(k: int = 10) -> str:
    """DuckDB mirror over the `embeddings` view: query vector = vec_id 0's
    embedding (same rule as the Spark side), sequential-sum cosine with
    identical float evaluation order."""
    return f"""
WITH q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
           FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id,
    CAST(floor(
      list_aggregate(list_transform(generate_series(1, len(embedding)),
                     i -> embedding[i]::DOUBLE * qv[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum')))
      * 1000000.0) AS BIGINT) AS sim_e6
  FROM embeddings, q
)
SELECT vec_id, sim_e6 FROM sims ORDER BY sim_e6 DESC, vec_id LIMIT {k}
"""


def lsh_bucket(
    df: DataFrame,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id per vector.

    Plane p's weight for dimension i is +1/-1 from bit 0 of
    portable_hash(p || ':' || i) — deterministic, engine-agnostic, and cheap
    to recompute scan-side (no broadcast needed). Bucketed ANN then probes a
    single bucket (and optionally its Hamming-1 neighbors) instead of the
    full table."""
    from posextract_spark.functions.hashing import portable_hash64

    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dims = F.sequence(F.lit(0), F.size(emb) - 1)

    def plane_sign(p, i):
        h = portable_hash64(F.concat_ws(":", F.lit(str(p)), i.cast("string")))
        return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    def _weighted(p):
        return F.zip_with(emb, dims, lambda x, i: x * plane_sign(p, i))

    bucket = None
    for p in range(n_planes):
        s = F.aggregate(_weighted(p), F.lit(0.0), lambda acc, v: acc + v)
        bit = F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def lsh_bucket_sql(n_planes: int = 4) -> str:
    terms = []
    for p in range(n_planes):
        sign = (
            f"CASE WHEN ((('0x' || substring(md5(concat('{p}', ':', (i-1)::VARCHAR)), 1, 15))::BIGINT) & 1) = 1 "
            f"THEN 1.0 ELSE -1.0 END"
        )
        s = (
            f"list_aggregate(list_transform(generate_series(1, len(embedding)), "
            f"i -> embedding[i]::DOUBLE * ({sign})), 'sum')"
        )
        terms.append(f"CASE WHEN ({s}) > 0 THEN {1 << p} ELSE 0 END")
    total = " + ".join(terms)
    return f"SELECT vec_id, CAST({total} AS INT) AS bucket FROM embeddings"
