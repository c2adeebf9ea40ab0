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

from posextract_spark.functions.partitioning import spread_small_input


def _cosine(a, b):
    """Cosine with a zero-norm guard: 0/0 is NaN in Spark but NULL in
    DuckDB — a zero vector would silently diverge the engines (or throw
    under ANSI cast). Zero-norm pairs rank as -2.0, below any real cosine."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    denom = na * nb
    return F.when(denom != 0, dot / denom).otherwise(F.lit(-2.0))


def _cosine_prenormed(a, b, na, nb):
    """_cosine when both norms are already materialized columns (r8):
    the pair joins used to re-derive sqrt(sum(x^2)) for BOTH vectors of
    EVERY pair inside the interpreted-lambda evaluator — two of the
    three O(dim) passes per pair were recomputing per-ROW constants.
    ``na``/``nb`` must be the exact _ivf_base norm expression
    (sequential float64 sum + sqrt) so the value is bit-identical to
    _cosine's."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    denom = na * nb
    return F.when(denom != 0, dot / denom).otherwise(F.lit(-2.0))


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
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(embedding)),
                     i -> embedding[i]::DOUBLE * qv[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))) END)
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
    return df.select(
        F.col(id_col), lsh_bucket_expr(n_planes, vec_col).alias("bucket")
    )


def lsh_bucket_expr(n_planes: int, vec_col: str = "embedding"):
    """The bucket id as a pure per-row Column (shared by lsh_bucket and
    neardup_bucket_stats so callers never need a join to attach it)."""
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
    return bucket.cast("int")


def planes_for(n_vecs: int, target_bucket: int = 1024, min_planes: int = 4,
               max_planes: int = 24) -> int:
    """Hyperplane count that keeps the EXPECTED bucket width near
    ``target_bucket``: ceil(log2(N / target)). Fixed planes do not survive a
    scale-up — 16 buckets over 10^9 rows makes the within-bucket self-join a
    cartesian (VERDICT r01 item 4); planes must grow with log2(N)."""
    import math

    if n_vecs <= target_bucket:
        return min_planes
    return max(min_planes, min(max_planes, math.ceil(math.log2(n_vecs / target_bucket))))


def neardup_bucket_stats(
    df: DataFrame,
    n_planes: int | None = None,
    threshold_e6: int = 250000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 1024,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection, LSH-bucketed (the scale
    path: the pair join only runs within a bucket, ~1/2^planes of the
    quadratic work). Returns per-bucket stats: vector count, pairs with
    cosine >= threshold, and the max pairwise similarity (x1e6).

    Scale levers (both needed at 100 TB — VERDICT r01 item 4):
    - ``n_planes=None`` sizes the bucket space from the data: one count job
      up front (at production scale pass the known table rowcount via
      ``n_planes=planes_for(n)`` instead), then ceil(log2(N/target_bucket))
      planes so expected width stays ~target_bucket regardless of N;
    - ``max_bucket_width`` bounds the WORST bucket (hyperplanes cannot bound
      skew — 10^6 embeddings of one boilerplate page all share a bucket):
      over-width buckets keep a deterministic hash-threshold sample of
      EXPECTED size ``max_bucket_width`` (binomial around the cap, whp
      within a small factor — exact semantics in functions/capping.py), so
      per-bucket pair work concentrates near cap^2/2 rather than width^2/2.
      Buckets already at or under the cap are kept exactly. ``n_vecs``
      still reports the TRUE width, so capped buckets are visible to the
      caller (n_pairs < n_vecs*(n_vecs-1)/2 flags sampling).
    """
    if n_planes is None:
        n_planes = planes_for(df.count(), target_bucket)
    # r8 perf: spread a single-split input before the per-row bucket
    # expression and the within-bucket pair join (no-op at production
    # partition counts), and materialize the norm once per row so the
    # pair cosine is one O(dim) pass per pair instead of three.
    df = spread_small_input(df)
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # one projection: the bucket is a pure per-row expression, so joining
    # lsh_bucket's output back onto df would shuffle the whole embedding
    # table once before the pair join for nothing
    b = df.select(
        F.col(id_col),
        lsh_bucket_expr(n_planes, vec_col).alias("bucket"),
        emb.alias("_e"),
        F.sqrt(
            F.aggregate(
                F.transform(emb, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
            )
        ).alias("_n"),
    )
    sizes = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))
    if max_bucket_width is not None:
        # Deterministic hash-threshold subsample (r5; the shared policy —
        # semantics and the no-Window rationale in functions/capping.py).
        # ``sizes`` is reused as the width frame, so the cap adds no
        # extra aggregation pass here.
        from posextract_spark.functions.capping import cap_bucket_width

        b = cap_bucket_width(
            b, ["bucket"], id_col, max_bucket_width, widths=sizes, width_col="n_vecs"
        )
    left = b.select(
        F.col("bucket"), F.col(id_col).alias("id_a"), F.col("_e").alias("ea"),
        F.col("_n").alias("na"),
    )
    right = b.select(
        F.col("bucket").alias("bucket_b"), F.col(id_col).alias("id_b"), F.col("_e").alias("eb"),
        F.col("_n").alias("nb"),
    )
    pairs = left.join(
        right, (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "bucket",
        F.floor(
            _cosine_prenormed(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
            * F.lit(1000000.0)
        ).cast("bigint").alias("sim_e6"),
    )
    per_bucket = pairs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("sim_e6") >= threshold_e6).cast("long")).alias("n_neardup"),
        F.max("sim_e6").alias("max_sim_e6"),
    )
    return sizes.join(per_bucket, "bucket", "left").select(
        "bucket",
        "n_vecs",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        F.coalesce(F.col("n_neardup"), F.lit(0)).alias("n_neardup"),
        F.coalesce(F.col("max_sim_e6"), F.lit(-1000000)).alias("max_sim_e6"),
    )


def neardup_bucket_stats_sql(n_planes: int = 4, threshold_e6: int = 250000) -> str:
    bucket_sql = lsh_bucket_sql(n_planes)
    norms = (
        "(sqrt(list_aggregate(list_transform(a.e, x -> x * x), 'sum'))"
        " * sqrt(list_aggregate(list_transform(b.e, x -> x * x), 'sum')))"
    )
    cos = (
        "CAST(floor((CASE WHEN " + norms + " = 0 THEN -2.0 ELSE "
        "list_aggregate(list_transform(generate_series(1, len(a.e)), i -> a.e[i] * b.e[i]), 'sum')"
        " / " + norms + " END)"
        " * 1000000.0) AS BIGINT)"
    )
    return f"""
WITH buckets AS ({bucket_sql}),
vecs AS (
  SELECT b.vec_id, b.bucket, list_transform(e.embedding, x -> x::DOUBLE) AS e
  FROM buckets b JOIN embeddings e ON b.vec_id = e.vec_id
),
pairs AS (
  SELECT a.bucket, {cos} AS sim_e6
  FROM vecs a JOIN vecs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
per_bucket AS (
  SELECT bucket, count(*) AS n_pairs,
         CAST(sum(CASE WHEN sim_e6 >= {threshold_e6} THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
         max(sim_e6) AS max_sim_e6
  FROM pairs GROUP BY bucket
)
SELECT v.bucket, count(*) AS n_vecs,
       CAST(COALESCE(any_value(p.n_pairs), 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(any_value(p.n_neardup), 0) AS BIGINT) AS n_neardup,
       CAST(COALESCE(any_value(p.max_sim_e6), -1000000) AS BIGINT) AS max_sim_e6
FROM vecs v LEFT JOIN per_bucket p ON v.bucket = p.bucket
GROUP BY v.bucket
"""


# --- IVF (inverted-file) ANN ------------------------------------------------

IVF_K = 8


def _centroid_literals(df: DataFrame, k: int, id_col: str, vec_col: str):
    """Deterministic coarse quantizer: centroids = embeddings of the k
    smallest ids (production would k-means; the IVF mechanics — assignment,
    inverted lists, probe-one-list search — are identical)."""
    rows = (
        df.filter(F.col(id_col) < k)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def _centroid_struct_array(cents):
    """Literal array<struct<cid,cvec,cnorm>> for the scan-side argmax."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).cast("int").alias("cid"),
                F.array(*[F.lit(x) for x in vec]).alias("cvec"),
                F.lit(_seq_norm(vec)).alias("cnorm"),
            )
            for cid, vec in cents
        ]
    )


def _ivf_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        emb.alias("_e"),
        F.sqrt(
            F.aggregate(
                F.transform(emb, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
            )
        ).alias("_norm"),
    )


def _best_centroid_expr(e, norm, cent_arr):
    """struct(sim, ncid) of the nearest centroid over explicit vector/norm
    expressions: array_max picks max sim; on ties max(-cid) == smallest
    centroid id. Shared by the full-vector argmax (_best_centroid) and the
    per-subspace PQ encoder."""

    def sim_e6(c):
        dot = F.aggregate(
            F.zip_with(e, c["cvec"], lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        denom = norm * c["cnorm"]
        cos = F.when(denom != 0, dot / denom).otherwise(F.lit(-2.0))
        return F.floor(cos * F.lit(1000000.0)).cast("bigint")

    return F.array_max(
        F.transform(
            cent_arr, lambda c: F.struct(sim_e6(c).alias("sim"), (-c["cid"]).alias("ncid"))
        )
    )


def _best_centroid(cent_arr):
    """struct(sim, ncid) of the nearest centroid over _e/_norm columns."""
    return _best_centroid_expr(F.col("_e"), F.col("_norm"), cent_arr)


def ivf_assign(
    df: DataFrame,
    k: int = IVF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """(id, centroid_id, sim_e6): nearest centroid by cosine, ties broken by
    smallest centroid id.

    Scale shape: a single scan-side projection — per row, transform() maps
    the centroid literal array to (sim_e6, -cid) structs and array_max takes
    the argmax (struct ordering = sim desc winner; on sim ties the larger
    -cid wins, i.e. the SMALLEST centroid id — matching the DuckDB mirror's
    ``ORDER BY sim_e6 DESC, centroid_id ASC``). Zero shuffle and zero
    Generate; the previous explode + row_number()-window formulation pushed
    N*k rows through a full Exchange just to take a per-row argmax
    (VERDICT r01), which at 100 TB is the dominant cost. Centroid norms are
    folded into the literals so each pair costs one dot-product pass.
    Pinned by tests/test_plan_shape.py::test_ivf_assign_no_shuffle.

    ``centroids`` overrides the coarse quantizer with precomputed
    (cid, vector) literals — pass ``kmeans_centroids(df)`` for trained ones.
    """
    cents = centroids if centroids is not None else _centroid_literals(df, k, id_col, vec_col)
    base = _ivf_base(df, id_col, vec_col)
    best = _best_centroid(_centroid_struct_array(cents))
    return base.select(
        id_col,
        (-best["ncid"]).alias("centroid_id"),
        best["sim"].alias("sim_e6"),
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = IVF_K,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Lloyd's k-means with a fixed iteration count and seeded (first-k-ids)
    init — the real IVF coarse quantizer, replacing r01's init-only
    centroids.

    Deterministic and ENGINE-EXACT by construction, so the DuckDB mirror
    (kmeans SQL CTE chain) reproduces bit-identical centroids:
    - assignment compares floored fixed-point similarities (sim_e6 BIGINT),
      ties to the smallest centroid id;
    - the update averages in integer fixed-point: sum over members of
      floor(x * 1e6) as BIGINT (integer addition is order-independent, so
      shuffle/partition order cannot perturb the result — float sums would),
      then floor(sum/count)/1e6;
    - empty clusters keep their previous centroid.

    Scale shape per iteration: one scan-side assignment projection (no
    shuffle — same plan as ivf_assign) + posexplode(dims) + a groupBy on
    (centroid, dim) whose result is k*dim rows — the only shuffle, with
    map-side partial aggregation, collecting k*dim longs to the driver.
    """
    import math

    cents = _centroid_literals(df, k, id_col, vec_col)
    # spread BEFORE the per-row argmax: a single-split parquet input would
    # otherwise run every interpreted k*dim dot product on one core
    # (functions/partitioning.py; no-op at production partition counts)
    base = _ivf_base(spread_small_input(df), id_col, vec_col)
    for _ in range(n_iter):
        best = _best_centroid(_centroid_struct_array(cents))
        # two selects: resolving a lambda-struct field in the same projection
        # as a generator trips analysis (FIELD_NOT_FOUND col1/col2);
        # CollapseProject fuses them back into one stage anyway.
        assigned = base.select(
            (-best["ncid"]).alias("centroid_id"), F.col("_e")
        ).select("centroid_id", F.posexplode(F.col("_e")).alias("pos", "val"))
        rows = (
            assigned.groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.floor(F.col("val") * F.lit(1000000.0)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        acc: dict = {}
        for r in rows:
            # float(s)/c, not int-truediv: the mirror computes
            # CAST(sum AS DOUBLE)/count, and python's exact int division
            # would diverge from it once a cluster sum exceeds 2^53
            acc.setdefault(r.centroid_id, {})[r.pos] = (
                math.floor(float(r.s) / r.c) / 1000000.0
            )
        cents = [
            (cid, [acc[cid][p] for p in range(len(vec))] if cid in acc else vec)
            for cid, vec in cents
        ]
    return cents


def _fixed_sim_e6(a, b) -> int:
    """Driver-side floored fixed-point cosine with the engines' sequential
    float64 evaluation order (used to rank probe centroids). Zero-norm
    vectors rank below every real similarity instead of dividing by zero."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    denom = _seq_norm(a) * _seq_norm(b)
    if denom == 0.0:
        return -2000000
    return math.floor(dot / denom * 1000000.0)


def _seq_norm(vec) -> float:
    """sqrt of the left-to-right float64 sum of squares — the exact value
    both Spark's F.aggregate+F.sqrt and DuckDB's list_aggregate('sum')+sqrt
    produce. math.sqrt, NOT ``** 0.5``: pow(x, 0.5) is not guaranteed
    correctly rounded on every libm, while both engines use true IEEE sqrt."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def ivf_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    n_centroids: int = IVF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search: rank only the ``nprobe`` inverted lists nearest the
    query. The scale path vs brute force: the scan touches
    ~nprobe/n_centroids of the data (in storage terms: the inverted lists
    are bucket partitions and the probe is partition pruning). nprobe
    trades scan fraction for recall; nprobe == n_centroids degenerates to
    exact brute force (pinned by tests)."""
    cents = centroids if centroids is not None else _centroid_literals(
        df, n_centroids, id_col, vec_col
    )
    assign = ivf_assign(df, n_centroids, id_col, vec_col, centroids=cents)
    # the query is vec_id 0's embedding => probe its centroid, then the
    # next-closest centroids of ITS OWN assignment ranking when nprobe > 1
    if nprobe <= 1:
        qc = assign.filter(F.col(id_col) == 0).select("centroid_id")
    else:
        qrow = df.filter(F.col(id_col) == 0).select(vec_col).head()
        if qrow is None:
            raise ValueError(
                f"ivf_topk(nprobe={nprobe}): query vector row ({id_col} == 0) not found"
            )
        qv = [float(x) for x in qrow[0]]
        ranked = sorted(
            cents,
            key=lambda cv: (-_fixed_sim_e6(qv, cv[1]), cv[0]),
        )[:nprobe]
        qc = df.sparkSession.createDataFrame(
            [(cid,) for cid, _ in ranked], "centroid_id int"
        )
    probe = assign.join(F.broadcast(qc), "centroid_id").select(id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sims = df.join(probe, id_col).select(
        F.col(id_col),
        F.floor(_cosine(emb, q) * F.lit(1000000.0)).cast("bigint").alias("sim_e6"),
    )
    return sims.orderBy(F.desc("sim_e6"), F.col(id_col)).limit(k)


_IVF_ASSIGN_CTE = f"""
WITH cents AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cvec
  FROM embeddings WHERE vec_id < {IVF_K}
),
vecs AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
),
pairs AS (
  SELECT v.vec_id, CAST(c.cid AS INTEGER) AS centroid_id,
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(v.e)), i -> v.e[i] * c.cvec[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))) END)
      * 1000000.0) AS BIGINT) AS sim_e6
  FROM vecs v CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id, sim_e6 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e6 DESC, centroid_id ASC) AS rn
    FROM pairs
  ) WHERE rn = 1
)
"""

IVF_ASSIGN_SQL = _IVF_ASSIGN_CTE + "SELECT vec_id, centroid_id, sim_e6 FROM assign"


def ivf_topk_sql(k: int = 10) -> str:
    return (
        _IVF_ASSIGN_CTE
        + f"""
, qc AS (SELECT centroid_id FROM assign WHERE vec_id = 0),
q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv FROM embeddings WHERE vec_id = 0),
probe AS (SELECT a.vec_id FROM assign a JOIN qc ON a.centroid_id = qc.centroid_id),
sims AS (
  SELECT v.vec_id,
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(v.e)), i -> v.e[i] * qv[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))) END)
      * 1000000.0) AS BIGINT) AS sim_e6
  FROM vecs v JOIN probe p ON v.vec_id = p.vec_id, q
)
SELECT vec_id, sim_e6 FROM sims ORDER BY sim_e6 DESC, vec_id LIMIT {k}
"""
    )


# --- k-means mirror (unrolled Lloyd iterations as CTE chain) -----------------

_COS_NORMS_SQL = (
    "(sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))"
    " * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum')))"
)
_COS_SQL = (
    "CAST(floor((CASE WHEN " + _COS_NORMS_SQL + " = 0 THEN -2.0 ELSE "
    "list_aggregate(list_transform(generate_series(1, len(v.e)), j -> v.e[j] * c.cvec[j]), 'sum')"
    " / " + _COS_NORMS_SQL + " END)"
    " * 1000000.0) AS BIGINT)"
)


def _assign_ctes(i, cents_name: str) -> str:
    """pairs{i}/assign{i} CTEs: fixed-point cosine vs cents_name + argmax
    with the same (sim desc, cid asc) tie-break as the Spark side."""
    return f"""
pairs{i} AS (
  SELECT v.vec_id, c.cid, {_COS_SQL} AS sim_e6
  FROM vecs v CROSS JOIN {cents_name} c
),
assign{i} AS (
  SELECT vec_id, cid, sim_e6 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e6 DESC, cid ASC) AS rn
    FROM pairs{i}
  ) WHERE rn = 1
)"""


def kmeans_cents_cte(n_iter: int, k: int = IVF_K, rel: str = "embeddings"):
    """(cte_fragment, final_cents_name): Lloyd unrolled — DuckDB has no
    iteration, but n_iter is a small fixed constant, so each round becomes
    one assign + one integer-fixed-point update CTE. Mirrors
    kmeans_centroids() exactly: floor(x*1e6) BIGINT member sums (order-free),
    floor(sum/count)/1e6 updates, COALESCE keeps empty clusters. ``rel``
    is any (vec_id, embedding) relation (alias derived frames into that
    shape for composed pipelines)."""
    parts = [
        f"cents0 AS (SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cvec\n"
        f"  FROM {rel} WHERE vec_id < {k})",
        f"vecs AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM {rel})",
    ]
    for i in range(n_iter):
        parts.append(_assign_ctes(i, f"cents{i}").lstrip())
        parts.append(
            f"""upd{i} AS (
  SELECT a.cid, t.d,
    CAST(floor(CAST(sum(CAST(floor(v.e[t.d] * 1000000.0) AS BIGINT)) AS DOUBLE) / count(*)) AS DOUBLE)
      / 1000000.0 AS x
  FROM assign{i} a JOIN vecs v ON a.vec_id = v.vec_id
  CROSS JOIN UNNEST(generate_series(1, len(v.e))) AS t(d)
  GROUP BY a.cid, t.d
),
centsu{i} AS (SELECT cid, list(x ORDER BY d) AS cvec FROM upd{i} GROUP BY cid),
cents{i+1} AS (
  SELECT c.cid, COALESCE(u.cvec, c.cvec) AS cvec
  FROM cents{i} c LEFT JOIN centsu{i} u ON c.cid = u.cid
)"""
        )
    return "WITH " + ",\n".join(parts), f"cents{n_iter}"


def ivf_assign_kmeans_sql(n_iter: int = 2, k: int = IVF_K) -> str:
    ctes, final = kmeans_cents_cte(n_iter, k)
    return (
        ctes
        + ",\n"
        + _assign_ctes("F", final).lstrip()
        + "\nSELECT vec_id, CAST(cid AS INTEGER) AS centroid_id, sim_e6 FROM assignF"
    )


def ivf_topk_kmeans_sql(k_results: int = 10, n_iter: int = 2, k: int = IVF_K) -> str:
    ctes, final = kmeans_cents_cte(n_iter, k)
    return (
        ctes
        + ",\n"
        + _assign_ctes("F", final).lstrip()
        + f"""
, qc AS (SELECT cid FROM assignF WHERE vec_id = 0),
q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv FROM embeddings WHERE vec_id = 0),
probe AS (SELECT a.vec_id FROM assignF a JOIN qc ON a.cid = qc.cid),
sims AS (
  SELECT v.vec_id,
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(v.e)), j -> v.e[j] * qv[j]), 'sum')
      / (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(qv, x -> x * x), 'sum'))) END)
      * 1000000.0) AS BIGINT) AS sim_e6
  FROM vecs v JOIN probe p ON v.vec_id = p.vec_id, q
)
SELECT vec_id, sim_e6 FROM sims ORDER BY sim_e6 DESC, vec_id LIMIT {k_results}
"""
    )


def lsh_bucket_expr_sql(n_planes: int, vec_expr: str = "embedding") -> str:
    """DuckDB rendering of lsh_bucket_expr over any list-valued
    expression (shared by lsh_bucket_sql and composed pipelines)."""
    terms = []
    for p in range(n_planes):
        sign = (
            f"CASE WHEN ((('0x' || substring(md5(concat('{p}', ':', (i-1)::VARCHAR)), 1, 15))::BIGINT) & 1) = 1 "
            f"THEN 1.0 ELSE -1.0 END"
        )
        s = (
            f"list_aggregate(list_transform(generate_series(1, len({vec_expr})), "
            f"i -> {vec_expr}[i]::DOUBLE * ({sign})), 'sum')"
        )
        terms.append(f"CASE WHEN ({s}) > 0 THEN {1 << p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS INT)"


def lsh_bucket_sql(n_planes: int = 4) -> str:
    return (
        f"SELECT vec_id, {lsh_bucket_expr_sql(n_planes)} AS bucket FROM embeddings"
    )


# --- product quantization (IVF-PQ's compression half) -------------------------

PQ_M = 4
PQ_KSUB = 8


def _pq_codebooks(df, m, k_sub, id_col, vec_col):
    """m per-subspace codebooks, each [(cid, subvector)] sliced from the
    k_sub smallest-id embeddings — the deterministic quantizer convention
    of _centroid_literals (kmeans_centroids per subspace is the production
    upgrade; the encode/ADC mechanics are identical either way)."""
    rows = (
        df.filter(F.col(id_col) < k_sub)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    dim = len(rows[0][1])
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [
            (int(r[0]), [float(x) for x in r[1][s * dsub : (s + 1) * dsub]])
            for r in rows
        ]
        for s in range(m)
    ]


def _pq_prepared(
    df, m: int, dsub: int, id_col: str, vec_col: str, with_full_norm: bool = False
):
    """Per-subspace slices (__pq_s{s}) and norms (__pq_n{s}) materialized
    ONCE behind Generate boundaries. This is the expression-paste fix for
    the whole PQ family (measured at 2M x 64: trained-codebook iterations
    dropped ~10x): _best_centroid_expr references its vector and norm
    operands once PER CENTROID, so inline slice/fold expressions were
    re-evaluated k_sub+1 times per subspace per row — ~36 array
    allocations and 32 redundant norm folds per row in interpreted HOF
    projection. As attributes they are computed once each."""
    from posextract_spark.functions.boundary import materialize

    g = materialize(
        df.select(id_col, vec_col),
        __pq_e=F.transform(F.col(vec_col), lambda x: x.cast("double")),
    )
    g = materialize(
        g,
        **{
            f"__pq_s{s}": F.slice(F.col("__pq_e"), s * dsub + 1, dsub)
            for s in range(m)
        },
    )
    norms = {
        f"__pq_n{s}": F.sqrt(
            F.aggregate(
                F.transform(F.col(f"__pq_s{s}"), lambda x: x * x),
                F.lit(0.0),
                lambda a, v: a + v,
            )
        )
        for s in range(m)
    }
    if with_full_norm:
        # the coarse-assignment norm (ivf_pq_topk / pq_index_rows) — same
        # paste risk as the subspace norms, same fix
        norms["__pq_fn"] = F.sqrt(
            F.aggregate(
                F.transform(F.col("__pq_e"), lambda x: x * x),
                F.lit(0.0),
                lambda a, v: a + v,
            )
        )
    return materialize(g, **norms)


def _pq_sub_structs(books, m):
    """Per-row array of m structs (subspace, code, sim_e6) over the
    materialized per-subspace slice/norm attributes (_pq_prepared)."""
    subs = []
    for s in range(m):
        best = _best_centroid_expr(
            F.col(f"__pq_s{s}"), F.col(f"__pq_n{s}"), _centroid_struct_array(books[s])
        )
        subs.append(
            F.struct(
                F.lit(s).cast("int").alias("subspace"),
                (-best["ncid"]).cast("int").alias("code"),
                best["sim"].alias("sim_e6"),
            )
        )
    return F.array(*subs)


def pq_encode(
    df: DataFrame,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks=None,
) -> DataFrame:
    """(id, subspace, code, sim_e6) — product-quantization encoding: the
    vector is split into ``m`` subvectors, each assigned its nearest
    codebook centroid (same cosine/fixed-point/min-tie rule as ivf_assign).
    PQ is the compression half of IVF-PQ: 64 floats become m small codes,
    the layout a billion-vector index actually stores.

    Scale shape: ONE scan-side projection computes all m subspace
    argmaxes over the Generate-materialized double vector, then one
    posexplode-style Generate emits the m code rows — no shuffle, no
    Python, codebooks are literals (constant-folded)."""
    books = codebooks or _pq_codebooks(df, m, k_sub, id_col, vec_col)
    g = _pq_prepared(df, m, len(books[0][0][1]), id_col, vec_col)
    return g.select(
        F.col(id_col), F.explode(_pq_sub_structs(books, m)).alias("_s")
    ).select(
        id_col,
        F.col("_s.subspace").alias("subspace"),
        F.col("_s.code").alias("code"),
        F.col("_s.sim_e6").alias("sim_e6"),
    )


def pq_codebooks_kmeans(
    df: DataFrame,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """TRAINED per-subspace PQ codebooks: Lloyd's k-means on each of the m
    subvector spaces (init = the _pq_codebooks id-slices), the production
    quantizer (VERDICT r6 item 2). Same engine-exact arithmetic contract as
    kmeans_centroids — fixed-point sim_e6 assignment with smallest-cid
    tie-break, integer fixed-point member sums (partition-order free),
    floor(sum/count)/1e6 updates, empty clusters keep their centroid — so
    the DuckDB mirror (per-subspace unrolled CTE chains) reproduces
    bit-identical codebooks.

    Scale shape per iteration: ALL m subspaces train in ONE fused pass —
    a scan-side projection computes every subspace's argmax over the
    Generate-materialized double vector, one explode + posexplode emits
    (subspace, code, dim, val) rows, and a single map-side-combinable
    groupBy reduces them to m * k_sub * dsub longs on the driver (the
    model artifact). m separate kmeans runs would scan the corpus
    m * n_iter times; this scans it n_iter times."""
    import math

    books = _pq_codebooks(df, m, k_sub, id_col, vec_col)
    dsub = len(books[0][0][1])
    # spread BEFORE the per-row m-subspace argmax (training only — the
    # search-path queries stay exchange-free so partition pruning on a
    # bucketed store is untouched); no-op at production partition counts
    g = _pq_prepared(spread_small_input(df), m, dsub, id_col, vec_col)
    for _ in range(n_iter):
        subs = []
        for s in range(m):
            best = _best_centroid_expr(
                F.col(f"__pq_s{s}"),
                F.col(f"__pq_n{s}"),
                _centroid_struct_array(books[s]),
            )
            subs.append(
                F.struct(
                    F.lit(s).cast("int").alias("s"),
                    (-best["ncid"]).cast("int").alias("code"),
                    F.col(f"__pq_s{s}").alias("vals"),
                )
            )
        # three selects: lambda-struct resolution must not share a
        # projection with a generator (kmeans_centroids' FIELD_NOT_FOUND
        # note); CollapseProject fuses the stages back together.
        ex = (
            g.select(F.array(*subs).alias("_ts"))
            .select(F.explode("_ts").alias("_t"))
            .select(
                F.col("_t.s").alias("s"),
                F.col("_t.code").alias("code"),
                F.posexplode(F.col("_t.vals")).alias("pos", "val"),
            )
        )
        rows = (
            ex.groupBy("s", "code", "pos")
            .agg(
                F.sum(F.floor(F.col("val") * F.lit(1000000.0)).cast("long")).alias("ssum"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        acc: dict = {}
        for r in rows:
            # float(s)/c matches the mirror's CAST(sum AS DOUBLE)/count
            # (see kmeans_centroids)
            acc.setdefault((r.s, r.code), {})[r.pos] = (
                math.floor(float(r.ssum) / r.c) / 1000000.0
            )
        books = [
            [
                (
                    cid,
                    [acc[(s, cid)][p] for p in range(dsub)]
                    if (s, cid) in acc
                    else vec,
                )
                for cid, vec in books[s]
            ]
            for s in range(m)
        ]
    return books


def pq_adc_topk(
    df: DataFrame,
    query_id: int = 0,
    k: int = 10,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks=None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id, adc_e6) — asymmetric-distance top-k: the query (the embedding
    of ``query_id``) is scored against every row's PQ CODES via
    per-subspace lookup tables, never against the raw vectors — the
    search core of IVF-PQ, where the corpus side is m bytes per vector.
    adc_e6 = sum over subspaces of table_s[code_s], table_s[c] =
    sim_e6(query_sub_s, codebook_s[c]).

    The tables are built as literal-vs-literal IN-ENGINE arithmetic
    (Catalyst constant-folds them once; DuckDB mirrors the same
    expressions) — computing them in Python could differ in the last ulp
    of the float fold and break the oracle hash. Top-k is a
    TakeOrderedAndProject with total-order (adc desc, id) tie-break.

    ``codebooks`` overrides the deterministic id-slice quantizer (pass
    pq_codebooks_kmeans(df) for trained ones); ``candidates`` (a 1-column
    id frame, broadcast) restricts scoring to those rows — the IVF-PQ
    composition's probe set."""
    books = codebooks or _pq_codebooks(df, m, k_sub, id_col, vec_col)
    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).head(1)
    if not qrow:
        raise ValueError(f"pq_adc_topk: query_id {query_id} not found")
    qvec = [float(x) for x in qrow[0][0]]

    base = df.select(id_col, vec_col)
    if candidates is not None:
        base = base.join(F.broadcast(candidates), id_col)
    g = _pq_prepared(base, m, len(qvec) // m, id_col, vec_col)
    codes = g.select(F.col(id_col).alias("id"), _pq_sub_structs(books, m).alias("_ss"))
    adc = codes.select("id", _adc_sum_expr(books, qvec, m).alias("adc_e6"))
    return adc.orderBy(F.col("adc_e6").desc(), F.col("id").asc()).limit(k)


def _adc_sum_expr(books, qvec, m):
    """sum-over-subspaces ADC lookup column (expects the per-row code
    structs in ``_ss``): table_s = literal map code -> sim_e6(query_sub_s,
    codebook_s[code]), built as literal-vs-literal IN-ENGINE arithmetic so
    Catalyst constant-folds each table once and the DuckDB mirror's
    identical expressions fold to the same bits."""
    dsub = len(qvec) // m

    def table_lookup(s, code_col):
        qsub = qvec[s * dsub : (s + 1) * dsub]
        qlit = F.array(*[F.lit(x) for x in qsub])
        qnorm = F.lit(_seq_norm(qsub))

        def sim(cvec_lit, cnorm_lit):
            dot = F.aggregate(
                F.zip_with(qlit, cvec_lit, lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            denom = qnorm * cnorm_lit
            cos = F.when(denom != 0, dot / denom).otherwise(F.lit(-2.0))
            return F.floor(cos * F.lit(1000000.0)).cast("bigint")

        pairs = [
            (cid, sim(F.array(*[F.lit(x) for x in vec]), F.lit(_seq_norm(vec))))
            for cid, vec in books[s]
        ]
        table = F.map_from_arrays(
            F.array(*[F.lit(c).cast("int") for c, _ in pairs]),
            F.array(*[v for _, v in pairs]),
        )
        return F.element_at(table, code_col)

    return sum(
        table_lookup(s, F.col("_ss")[s]["code"]) for s in range(m)
    ).cast("long")


def ivf_pq_topk(
    df: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = 1,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    codebooks=None,
    refine: int | None = None,
) -> DataFrame:
    """(id, adc_e6) — the production billion-vector ANN index shape
    (VERDICT r6 item 2): IVF coarse probe narrows the corpus to the
    ``nprobe`` inverted lists nearest the query, then PQ asymmetric-
    distance re-ranks ONLY those rows via per-subspace lookup tables.
    Pass ``centroids=kmeans_centroids(df)`` / ``codebooks=
    pq_codebooks_kmeans(df)`` for the trained quantizers.

    ``refine=R`` adds the standard refinement stage: ADC produces an
    R-candidate shortlist, then the EXACT cosine re-ranks only those R
    raw vectors and the output becomes (id, sim_e6). This is how real
    IVF-PQ deployments recover recall lost to quantization — the corpus
    scan still reads m codes per row; only R rows' raw vectors are ever
    touched (a broadcast semi-join of R ids against the store).

    Scale shape — ONE scan, no joins: a single projection computes both
    the row's coarse assignment (scan-side argmax over centroid literals,
    same plan as ivf_assign) and its PQ codes; the probe is a FILTER on
    centroid_id against ``nprobe`` driver-side ints (the query's ranked
    centroids — an O(n_centroids * dim) driver computation), then ADC +
    TakeOrderedAndProject. In production the encoded table is stored
    partitioned by centroid_id, so this filter is partition pruning: the
    scan touches ~nprobe/n_centroids of the data and reads m codes per
    row, not the raw vectors. Contrast pq_adc_topk(candidates=...): no
    id-list is ever broadcast here, only centroid ids."""
    cents = centroids if centroids is not None else _centroid_literals(
        df, n_centroids, id_col, vec_col
    )
    books = codebooks or _pq_codebooks(df, m, k_sub, id_col, vec_col)
    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).head(1)
    if not qrow:
        raise ValueError(f"ivf_pq_topk: query_id {query_id} not found")
    qvec = [float(x) for x in qrow[0][0]]
    probe_cids = [
        cid
        for cid, _ in sorted(
            cents, key=lambda cv: (-_fixed_sim_e6(qvec, cv[1]), cv[0])
        )[:nprobe]
    ]
    g = _pq_prepared(df, m, len(qvec) // m, id_col, vec_col, with_full_norm=True)
    best = _best_centroid_expr(
        F.col("__pq_e"), F.col("__pq_fn"), _centroid_struct_array(cents)
    )
    assigned = g.select(
        F.col(id_col).alias("id"),
        (-best["ncid"]).alias("centroid_id"),
        _pq_sub_structs(books, m).alias("_ss"),
    ).filter(F.col("centroid_id").isin(probe_cids))
    adc = assigned.select("id", _adc_sum_expr(books, qvec, m).alias("adc_e6"))
    if refine is None:
        return adc.orderBy(F.col("adc_e6").desc(), F.col("id").asc()).limit(k)
    short = (
        adc.orderBy(F.col("adc_e6").desc(), F.col("id").asc())
        .limit(refine)
        .select("id")
    )
    qlit = F.array(*[F.lit(x) for x in qvec])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sims = df.join(F.broadcast(short), df[id_col] == short["id"]).select(
        F.col("id"),
        F.floor(_cosine(emb, qlit) * F.lit(1000000.0)).cast("bigint").alias("sim_e6"),
    )
    return sims.orderBy(F.desc("sim_e6"), F.col("id")).limit(k)


def _pq_sub_sql(s: int, dsub: int, k_sub: int, cb_name: str | None = None) -> str:
    """Per-subspace assign CTE chain (mirrors one _pq_sub_structs entry).
    ``cb_name`` points the assignment at an externally-defined codebook CTE
    (cols cid, cvec — the trained-kmeans chain) instead of defining the
    deterministic id-slice codebook inline."""
    lo, hi = s * dsub + 1, (s + 1) * dsub
    cb = cb_name or f"_pqc{s}"
    cb_def = "" if cb_name else f"""
_pqc{s} AS (
  SELECT vec_id AS cid,
         list_transform(embedding[{lo}:{hi}], x -> x::DOUBLE) AS cvec
  FROM embeddings WHERE vec_id < {k_sub}),"""
    return f"""{cb_def}
_pqp{s} AS (
  SELECT v.vec_id, CAST(c.cid AS INTEGER) AS code,
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(v.e{s}, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(v.e{s})), i -> v.e{s}[i] * c.cvec[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(v.e{s}, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))) END)
      * 1000000.0) AS BIGINT) AS sim_e6
  FROM _pqv v CROSS JOIN {cb} c),
_pqa{s} AS (
  SELECT vec_id, code, sim_e6 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e6 DESC, code ASC) AS rn
    FROM _pqp{s}) WHERE rn = 1)"""


def _pq_vecs_sql(m: int, dsub: int, from_sql: str = "embeddings") -> str:
    slices = ", ".join(
        f"list_transform(embedding[{s * dsub + 1}:{(s + 1) * dsub}], x -> x::DOUBLE) AS e{s}"
        for s in range(m)
    )
    return f"_pqv AS (SELECT vec_id, {slices} FROM {from_sql})"


def _pq_query_tables_sql(query_id: int, m: int, dsub: int, cb_names=None):
    """_pqq{s} (query subvector) + _pqt{s} (code -> qsim_e6 lookup table)
    CTEs — the SQL rendering of _adc_sum_expr's literal tables.
    ``cb_names[s]`` points table s at an external codebook CTE (trained
    k-means chain); default is the inline id-slice codebook _pqc{s}."""
    parts = []
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        cb = cb_names[s] if cb_names else f"_pqc{s}"
        parts.append(f"""
_pqq{s} AS (
  SELECT list_transform(embedding[{lo}:{hi}], x -> x::DOUBLE) AS q
  FROM embeddings WHERE vec_id = {query_id}),
_pqt{s} AS (
  SELECT c.cid,
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(q.q, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(q.q)), i -> q.q[i] * c.cvec[i]), 'sum')
      / (sqrt(list_aggregate(list_transform(q.q, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum'))) END)
      * 1000000.0) AS BIGINT) AS qsim_e6
  FROM {cb} c CROSS JOIN _pqq{s} q)""")
    return parts


def _pq_adc_final_sql(k: int, m: int) -> str:
    joins = " ".join(
        f"JOIN _pqa{s} a{s} ON a{s}.vec_id = v.vec_id "
        f"JOIN _pqt{s} t{s} ON t{s}.cid = a{s}.code"
        for s in range(m)
    )
    total = " + ".join(f"t{s}.qsim_e6" for s in range(m))
    return f"""
SELECT v.vec_id AS id, CAST({total} AS BIGINT) AS adc_e6
FROM _pqv v {joins}
ORDER BY adc_e6 DESC, id ASC LIMIT {k}"""


def pq_encode_sql(m: int = PQ_M, k_sub: int = PQ_KSUB, dim: int = 64) -> str:
    """DuckDB mirror of pq_encode() over the embeddings view."""
    dsub = dim // m
    ctes = ",".join([_pq_vecs_sql(m, dsub)] + [_pq_sub_sql(s, dsub, k_sub) for s in range(m)])
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({s} AS INTEGER) AS subspace, code, sim_e6 FROM _pqa{s}"
        for s in range(m)
    )
    return "WITH " + ctes + "\n" + union


def pq_adc_topk_sql(
    query_id: int = 0, k: int = 10, m: int = PQ_M, k_sub: int = PQ_KSUB, dim: int = 64
) -> str:
    """DuckDB mirror of pq_adc_topk(): query-vs-codebook tables computed
    in-SQL from the same embeddings view (all float folds in-engine)."""
    dsub = dim // m
    parts = [_pq_vecs_sql(m, dsub)]
    parts += [_pq_sub_sql(s, dsub, k_sub) for s in range(m)]
    parts += _pq_query_tables_sql(query_id, m, dsub)
    return "WITH " + ",".join(parts) + _pq_adc_final_sql(k, m)


def _pq_kmeans_chain(s: int, dsub: int, k_sub: int, n_iter: int):
    """(cte_fragment, final_codebook_name) — the per-subspace unrolled
    Lloyd chain mirroring one subspace of pq_codebooks_kmeans(): id-slice
    init, fixed-point cosine assignment with (sim desc, cid asc) argmax,
    integer fixed-point member sums, floor(sum/count)/1e6 updates,
    COALESCE keeps empty clusters. Same contract as kmeans_cents_cte but
    over the _pqv subvector column e{s}."""
    lo, hi = s * dsub + 1, (s + 1) * dsub
    norms = (
        f"(sqrt(list_aggregate(list_transform(v.e{s}, x -> x * x), 'sum'))"
        " * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum')))"
    )
    cos = (
        "CAST(floor((CASE WHEN " + norms + " = 0 THEN -2.0 ELSE "
        f"list_aggregate(list_transform(generate_series(1, len(v.e{s})), j -> v.e{s}[j] * c.cvec[j]), 'sum')"
        " / " + norms + " END)"
        " * 1000000.0) AS BIGINT)"
    )
    parts = [
        f"""sp{s}c0 AS (
  SELECT vec_id AS cid, list_transform(embedding[{lo}:{hi}], x -> x::DOUBLE) AS cvec
  FROM embeddings WHERE vec_id < {k_sub})"""
    ]
    for i in range(n_iter):
        parts.append(f"""sp{s}p{i} AS (
  SELECT v.vec_id, c.cid, {cos} AS sim_e6
  FROM _pqv v CROSS JOIN sp{s}c{i} c),
sp{s}a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e6 DESC, cid ASC) AS rn
    FROM sp{s}p{i}) WHERE rn = 1),
sp{s}u{i} AS (
  SELECT a.cid, t.d,
    CAST(floor(CAST(sum(CAST(floor(v.e{s}[t.d] * 1000000.0) AS BIGINT)) AS DOUBLE) / count(*)) AS DOUBLE)
      / 1000000.0 AS x
  FROM sp{s}a{i} a JOIN _pqv v ON a.vec_id = v.vec_id
  CROSS JOIN UNNEST(generate_series(1, len(v.e{s}))) AS t(d)
  GROUP BY a.cid, t.d),
sp{s}cu{i} AS (SELECT cid, list(x ORDER BY d) AS cvec FROM sp{s}u{i} GROUP BY cid),
sp{s}c{i+1} AS (
  SELECT c.cid, COALESCE(u.cvec, c.cvec) AS cvec
  FROM sp{s}c{i} c LEFT JOIN sp{s}cu{i} u ON c.cid = u.cid)""")
    return ",\n".join(parts), f"sp{s}c{n_iter}"


def pq_encode_kmeans_sql(
    m: int = PQ_M, k_sub: int = PQ_KSUB, n_iter: int = 2, dim: int = 64
) -> str:
    """DuckDB mirror of pq_encode(df, codebooks=pq_codebooks_kmeans(df)):
    m unrolled per-subspace Lloyd chains feed the per-subspace assignment
    CTEs via _pq_sub_sql's cb_name hook."""
    dsub = dim // m
    parts = [_pq_vecs_sql(m, dsub)]
    finals = []
    for s in range(m):
        chain, final = _pq_kmeans_chain(s, dsub, k_sub, n_iter)
        parts.append(chain)
        finals.append(final)
    parts += [_pq_sub_sql(s, dsub, k_sub, cb_name=finals[s]) for s in range(m)]
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({s} AS INTEGER) AS subspace, code, sim_e6 FROM _pqa{s}"
        for s in range(m)
    )
    return "WITH " + ",".join(parts) + "\n" + union


def ivf_pq_topk_sql(
    query_id: int = 0,
    k: int = 10,
    nprobe: int = 1,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    dim: int = 64,
    refine: int | None = None,
) -> str:
    """DuckDB mirror of ivf_pq_topk(): coarse assign (the IVF_ASSIGN CTE),
    query-ranked probe centroids (same fixed-point sim + (sim desc, cid)
    order as the driver-side _fixed_sim_e6 ranking), then PQ codes + ADC
    restricted to the probed inverted lists; with ``refine`` the ADC
    shortlist is exact-cosine re-ranked (mirroring the Spark refine arm)."""
    dsub = dim // m
    qnorms = (
        "(sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))"
        " * sqrt(list_aggregate(list_transform(c.cvec, x -> x * x), 'sum')))"
    )
    qcos = (
        "CAST(floor((CASE WHEN " + qnorms + " = 0 THEN -2.0 ELSE "
        "list_aggregate(list_transform(generate_series(1, len(q.qv)), j -> q.qv[j] * c.cvec[j]), 'sum')"
        " / " + qnorms + " END)"
        " * 1000000.0) AS BIGINT)"
    )
    parts = [
        f"""q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
  FROM embeddings WHERE vec_id = {query_id}),
qprobe AS (
  SELECT CAST(c.cid AS INTEGER) AS cid
  FROM cents c CROSS JOIN q
  ORDER BY {qcos} DESC, c.cid ASC LIMIT {nprobe}),
probe AS (SELECT a.vec_id FROM assign a JOIN qprobe ON a.centroid_id = qprobe.cid)""",
        _pq_vecs_sql(m, dsub, from_sql="embeddings JOIN probe USING (vec_id)"),
    ]
    parts += [_pq_sub_sql(s, dsub, k_sub) for s in range(m)]
    parts += _pq_query_tables_sql(query_id, m, dsub)
    if refine is None:
        return _IVF_ASSIGN_CTE + ", " + ",".join(parts) + _pq_adc_final_sql(k, m)
    parts.append(
        "shortlist AS (" + _pq_adc_final_sql(refine, m).strip() + ")"
    )
    return (
        _IVF_ASSIGN_CTE
        + ", "
        + ",".join(parts)
        + f"""
SELECT v.vec_id AS id, {_cos_pair_sql("v.e", "q.qv")} AS sim_e6
FROM vecs v JOIN shortlist s ON v.vec_id = s.id CROSS JOIN q
ORDER BY sim_e6 DESC, id ASC LIMIT {k}"""
    )


# --- ANN retrieval-quality measurement ----------------------------------------


def ann_recall_ivf(
    df: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    nprobes=(1, 2, 4),
    n_centroids: int = IVF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """(nprobe, hits, recall_e2) — recall@k of IVF search vs brute-force
    cosine, measured over the ``n_queries`` smallest-id vectors as queries
    (VERDICT r6 item 1: the retrieval-quality analogue of DIFFERENTIAL.md
    — every index previously proved only its own arithmetic). hits = how
    many of the Q*k brute-force top-k pairs the nprobe-probe IVF search
    also returns; recall_e2 = floor(100 * hits / (Q * k)).

    Exact by construction (ties broken (sim desc, id asc) on both engines;
    integer hit counts), so the DuckDB mirror hash-matches.

    Scale shape — an EVALUATION harness, run on a bounded query sample,
    not a per-row production path: ONE Q x N similarity materialization
    (queries broadcast) feeds both the brute-force ground truth and every
    nprobe arm; per-query top-k is a groupBy collect_list/sort_array/slice
    (no ranking Window, bounded by the sample); the per-row centroid
    assignment rides the same scan; the query-side centroid ranking is
    scan-side over Q rows. Cost is Q scans' worth of dot products — the
    price of ground truth, independent of corpus partitioning."""
    cents = centroids if centroids is not None else _centroid_literals(
        df, n_centroids, id_col, vec_col
    )
    cent_arr = _centroid_struct_array(cents)
    base = _ivf_base(df, id_col, vec_col)
    best = _best_centroid(cent_arr)
    rows = base.select(
        F.col(id_col).alias("id"),
        F.col("_e"),
        F.col("_norm"),
        (-best["ncid"]).alias("centroid_id"),
    )
    qf = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"),
        F.col("_e").alias("_qe"),
        F.col("_norm").alias("_qnorm"),
    )

    def fixed_cos(dot, denom):
        cos = F.when(denom != 0, dot / denom).otherwise(F.lit(-2.0))
        return F.floor(cos * F.lit(1000000.0)).cast("bigint")

    sims = rows.crossJoin(F.broadcast(qf)).select(
        "qid",
        "id",
        "centroid_id",
        fixed_cos(
            F.aggregate(
                F.zip_with(F.col("_e"), F.col("_qe"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            F.col("_norm") * F.col("_qnorm"),
        ).alias("sim_e6"),
    )

    def topk_per(grp_cols, frame):
        # no-Window per-group top-k: sort_array of (-sim, id) structs,
        # slice k, explode — total order (sim desc, id asc)
        return (
            frame.groupBy(*grp_cols)
            .agg(
                F.slice(
                    F.sort_array(
                        F.collect_list(F.struct((-F.col("sim_e6")).alias("ns"), F.col("id").alias("id")))
                    ),
                    1,
                    k,
                ).alias("_top")
            )
            .select(*grp_cols, F.explode("_top").alias("_t"))
            .select(*grp_cols, F.col("_t.id").alias("id"))
        )

    brute = topk_per(["qid"], sims)

    # query-side centroid ranking: scan-side sort of the centroid literal
    # array by (sim desc, cid asc); two selects around the generator
    # (lambda-struct + Generate analysis trap, see kmeans_centroids)
    def qsim(c):
        dot = F.aggregate(
            F.zip_with(F.col("_qe"), c["cvec"], lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        return fixed_cos(dot, F.col("_qnorm") * c["cnorm"])

    ranked = F.sort_array(
        F.transform(
            cent_arr, lambda c: F.struct((-qsim(c)).alias("ns"), c["cid"].alias("cid"))
        )
    )
    # rename the rank frame's keys: sims and qrk share lineage (both derive
    # from base), so joining on same-named attributes would hit Spark's
    # ambiguous-self-join resolution — explicit names sidestep it
    qrk = (
        qf.select("qid", ranked.alias("_ra"))
        .select("qid", F.posexplode("_ra").alias("pos", "rc"))
        .select(
            F.col("qid").alias("_rqid"),
            (F.col("pos") + 1).alias("rnk"),
            F.col("rc.cid").alias("_rcid"),
        )
    )

    probed = (
        sims.join(
            F.broadcast(qrk),
            (F.col("qid") == F.col("_rqid")) & (F.col("centroid_id") == F.col("_rcid")),
        )
        .select("qid", "id", "sim_e6", "rnk")
        .select(
            "*", F.explode(F.array(*[F.lit(int(p)) for p in nprobes])).alias("nprobe")
        )
        .filter(F.col("rnk") <= F.col("nprobe"))
    )
    ivfk = topk_per(["qid", "nprobe"], probed)
    hits = (
        ivfk.join(brute, ["qid", "id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    np_df = df.sparkSession.createDataFrame([(int(p),) for p in nprobes], "nprobe int")
    denom = n_queries * k
    return (
        np_df.join(hits, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            F.floor(
                F.coalesce(F.col("hits"), F.lit(0)) * F.lit(100.0) / F.lit(float(denom))
            )
            .cast("bigint")
            .alias("recall_e2"),
        )
        .orderBy("nprobe")
    )


def _cos_pair_sql(a: str, b: str) -> str:
    """DuckDB fixed-point cosine between two list expressions — the same
    sequential-fold arithmetic as _COS_SQL with explicit operands."""
    norms = (
        f"(sqrt(list_aggregate(list_transform({a}, x -> x * x), 'sum'))"
        f" * sqrt(list_aggregate(list_transform({b}, x -> x * x), 'sum')))"
    )
    return (
        "CAST(floor((CASE WHEN " + norms + " = 0 THEN -2.0 ELSE "
        f"list_aggregate(list_transform(generate_series(1, len({a})), j -> {a}[j] * {b}[j]), 'sum')"
        " / " + norms + " END)"
        " * 1000000.0) AS BIGINT)"
    )


def ann_recall_ivf_sql(
    n_queries: int = 20,
    k: int = 10,
    nprobes=(1, 2, 4),
    n_centroids: int = IVF_K,
    trained_iters: int | None = None,
) -> str:
    """DuckDB mirror of ann_recall_ivf. Default quantizer = id-slice
    centroids; ``trained_iters`` swaps in the unrolled k-means chain
    (kmeans_cents_cte) so the TRAINED quantizer's recall carries the same
    hash signal."""
    np_values = ", ".join(f"({int(p)})" for p in nprobes)
    denom = n_queries * k
    if trained_iters is None:
        head = f"""
WITH cents AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cvec
  FROM embeddings WHERE vec_id < {n_centroids}),
vecs AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),"""
    else:
        ctes, final = kmeans_cents_cte(trained_iters, n_centroids)
        # kmeans_cents_cte defines vecs itself
        head = ctes + f",\ncents AS (SELECT cid, cvec FROM {final}),"
    return head + f"""
qs AS (SELECT vec_id AS qid, e AS qe FROM vecs WHERE vec_id < {n_queries}),
sims AS (
  SELECT q.qid, v.vec_id, {_cos_pair_sql("v.e", "q.qe")} AS sim_e6
  FROM vecs v CROSS JOIN qs q),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, vec_id ASC) AS rn
    FROM sims) WHERE rn <= {k}),
cpairs AS (
  SELECT v.vec_id, c.cid, {_cos_pair_sql("v.e", "c.cvec")} AS sim_e6
  FROM vecs v CROSS JOIN cents c),
assign AS (
  SELECT vec_id, cid AS centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_e6 DESC, cid ASC) AS rn
    FROM cpairs) WHERE rn = 1),
qcent AS (
  SELECT q.qid, c.cid, {_cos_pair_sql("q.qe", "c.cvec")} AS sim_e6
  FROM qs q CROSS JOIN cents c),
qrank AS (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, cid ASC) AS rnk
  FROM qcent),
probed AS (
  SELECT s.qid, s.vec_id, s.sim_e6, np.nprobe
  FROM sims s
  JOIN assign a ON s.vec_id = a.vec_id
  JOIN qrank r ON r.qid = s.qid AND r.cid = a.centroid_id
  CROSS JOIN (VALUES {np_values}) AS np(nprobe)
  WHERE r.rnk <= np.nprobe),
ivfk AS (
  SELECT qid, nprobe, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY qid, nprobe ORDER BY sim_e6 DESC, vec_id ASC) AS rn
    FROM probed) WHERE rn <= {k}),
hit_counts AS (
  SELECT i.nprobe, count(*) AS hits
  FROM ivfk i JOIN brute b ON b.qid = i.qid AND b.vec_id = i.vec_id
  GROUP BY i.nprobe)
SELECT np.nprobe,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       CAST(floor(COALESCE(h.hits, 0) * 100.0 / {denom}.0) AS BIGINT) AS recall_e2
FROM (VALUES {np_values}) AS np(nprobe)
LEFT JOIN hit_counts h ON h.nprobe = np.nprobe
ORDER BY np.nprobe
"""


def pq_index_rows(
    df: DataFrame,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    n_centroids: int = IVF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    codebooks=None,
) -> DataFrame:
    """(id, centroid_id, subspace, code) — the STORED IVF-PQ index layout:
    each vector's coarse inverted-list assignment plus its m subspace
    codes, emitted in ONE scan-side projection (the write path
    ivf_pq_topk's search assumes — store partitioned by centroid_id and
    the probe filter becomes partition pruning). Quantizers default to
    the deterministic id-slices over ``df`` itself; pass trained ones.

    Scale shape: single scan, no shuffle — centroid argmax + m code
    argmaxes over constant-folded literals, then one Generate for the
    per-subspace rows."""
    cents = centroids if centroids is not None else _centroid_literals(
        df, n_centroids, id_col, vec_col
    )
    books = codebooks or _pq_codebooks(df, m, k_sub, id_col, vec_col)
    g = _pq_prepared(
        df, m, len(books[0][0][1]), id_col, vec_col, with_full_norm=True
    )
    best = _best_centroid_expr(
        F.col("__pq_e"), F.col("__pq_fn"), _centroid_struct_array(cents)
    )
    return (
        g.select(
            F.col(id_col),
            (-best["ncid"]).alias("centroid_id"),
            _pq_sub_structs(books, m).alias("_ss"),
        )
        .select(id_col, "centroid_id", F.explode("_ss").alias("_s"))
        .select(
            id_col,
            "centroid_id",
            F.col("_s.subspace").alias("subspace"),
            F.col("_s.code").alias("code"),
        )
    )


def pq_index_ctes(
    rel: str,
    m: int = PQ_M,
    k_sub: int = PQ_KSUB,
    n_centroids: int = IVF_K,
    dim: int = 64,
    id_col: str = "vec_id",
) -> str:
    """CTE chain (no WITH prefix) mirroring pq_index_rows over a generic
    (``id_col``, embedding) relation, ending in
    ``pq_index(vec_id, centroid_id, subspace, code)``. Codebooks and
    centroids are the id-slice convention over ``rel`` itself."""
    dsub = dim // m
    src = f"(SELECT {id_col} AS vec_id, embedding FROM {rel})"
    parts = [
        f"""_pxc AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cvec
  FROM {src} WHERE vec_id < {n_centroids}),
_pxv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM {src}),
_pxa AS (
  SELECT vec_id, cid AS centroid_id FROM (
    SELECT v.vec_id, c.cid,
           {_cos_pair_sql("v.e", "c.cvec")} AS sim_e6,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_pair_sql("v.e", "c.cvec")} DESC, c.cid ASC) AS rn
    FROM _pxv v CROSS JOIN _pxc c) WHERE rn = 1)""",
        _pq_vecs_sql(m, dsub, from_sql=src),
    ]
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(f"""_pxcb{s} AS (
  SELECT vec_id AS cid,
         list_transform(embedding[{lo}:{hi}], x -> x::DOUBLE) AS cvec
  FROM {src} WHERE vec_id < {k_sub})""")
        parts.append(_pq_sub_sql(s, dsub, k_sub, cb_name=f"_pxcb{s}").lstrip().rstrip(","))
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({s} AS INTEGER) AS subspace, code FROM _pqa{s}"
        for s in range(m)
    )
    parts.append(
        f"""pq_index AS (
  SELECT a.vec_id, CAST(a.centroid_id AS INTEGER) AS centroid_id,
         u.subspace, u.code
  FROM _pxa a JOIN ({union}) u USING (vec_id))"""
    )
    return ",\n".join(parts)


# --- feature-hash document embeddings ----------------------------------------


def hash_embed(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_tokens, embedding array<bigint> length ``dim``) — sign-
    random-projection document embeddings from TEXT, with no model:
    emb[j] = sum over token occurrences of (+1 if bit j of the token's
    portable hash is set else -1). This is classic feature hashing /
    SRP: cosine between two embeddings estimates the angular similarity
    of the documents' bag-of-words vectors, which makes the ANN family
    (cosine_topk / LSH / IVF / PQ) runnable straight off a text corpus —
    previously those operators required a pre-supplied embedding column.

    Exactness: ONE portable hash per token occurrence (materialized
    behind a Generate boundary; bit j tested with a literal power-of-two
    mask, never a variable shift), integer accumulation — bit-identical
    in the DuckDB mirror, partition-order independent. ``dim`` <= 60
    (the portable hash carries 60 bits). Empty documents embed as the
    zero vector (n_tokens = 0).

    Scale shape: pure scan-side projection — no shuffle, no UDF; per-doc
    cost O(tokens * dim) integer ops over the materialized hash array.
    """
    if not 1 <= dim <= 60:
        raise ValueError("hash_embed: dim must be in [1, 60]")
    from posextract_spark.functions.boundary import materialize
    from posextract_spark.functions.hashing import portable_hash64, word_array

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    g = materialize(
        docs.select(F.col(id_col), src.alias("_he_t")),
        __he_ws=word_array(F.col("_he_t")),
    )
    g = materialize(
        g, __he_hs=F.transform(F.col("__he_ws"), lambda w: portable_hash64(w))
    )
    hs = F.col("__he_hs")
    def _component(j: int):
        # closure (NOT a default arg: pyspark builds one lambda variable
        # per positional parameter, so a default would become a third
        # lambda var instead of the captured constant)
        mask = F.lit(1 << j)
        return F.aggregate(
            hs,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    emb = F.array(*[_component(j) for j in range(dim)])
    return g.select(
        F.col(id_col),
        F.size(hs).cast("long").alias("n_tokens"),
        emb.alias("embedding"),
    )


def _hash_embed_ctes(
    dim: int,
    docs_rel: str,
    text_col: str,
    id_col: str,
    lowercase: bool,
) -> str:
    """CTE chain (no WITH keyword) to _he_e(id, n_tokens, embedding)."""
    from posextract_spark.functions.hashing import WORD_ARRAY_SQL, portable_hash64_sql

    src = f"lower({text_col})" if lowercase else text_col
    words = WORD_ARRAY_SQL.format(col=src)
    h = portable_hash64_sql("w")
    comps = ", ".join(
        f"CAST(coalesce(list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE -1 END)), 0) AS BIGINT)"
        for j in range(dim)
    )
    return f"""
_he_h AS (
  SELECT {id_col}, list_transform({words}, w -> {h}) AS hs FROM {docs_rel}),
_he_e AS MATERIALIZED (
  SELECT {id_col}, CAST(len(hs) AS BIGINT) AS n_tokens, [{comps}] AS embedding
  FROM _he_h)"""


def hash_embed_sql(
    dim: int = 32,
    docs_rel: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> str:
    """DuckDB mirror of hash_embed() (same per-token hash, same literal
    bit masks, coalesced zero for empty docs)."""
    ctes = _hash_embed_ctes(dim, docs_rel, text_col, id_col, lowercase)
    return f"{ctes}\nSELECT {id_col}, n_tokens, embedding FROM _he_e"


def hash_embed_topk(
    docs: DataFrame,
    query_id: int = 0,
    k: int = 25,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sim_e6) — end-to-end text ANN: hash_embed the corpus, then
    brute-force cosine top-k against the embedding of document
    ``query_id`` (collected as an O(dim) literal — model-artifact-sized
    driver traffic, same contract as the k-means centroids). The scan is
    shared: one embedding pass feeds both the query lookup and the
    ranking (TakeOrderedAndProject, never a full sort)."""
    emb = hash_embed(docs, dim=dim, text_col=text_col, id_col=id_col).persist()
    try:
        q = emb.filter(F.col(id_col) == query_id).select("embedding").collect()
        if not q:
            raise ValueError(f"hash_embed_topk: query id {query_id} not found")
        qv = [float(x) for x in q[0]["embedding"]]
        return cosine_topk(emb, qv, k=k, id_col=id_col, vec_col="embedding")
    finally:
        emb.unpersist()


def hash_embed_topk_sql(
    query_id: int = 0,
    k: int = 25,
    dim: int = 32,
    docs_rel: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_ctes: str = "",
) -> str:
    """Mirror of hash_embed_topk: embeddings CTE + the cosine_topk formula
    (identical float evaluation order: sequential left-fold dot product,
    sqrt norms, zero-norm -> -2.0). ``extra_ctes`` (a 'name AS (...),'
    chain) is prepended so composed callers can define ``docs_rel``
    inline (passage_search_topk)."""
    ctes = extra_ctes + _hash_embed_ctes(dim, docs_rel, text_col, id_col, lowercase=True)
    dot = (
        "list_aggregate(list_transform(generate_series(1, len(e.embedding)), "
        "i -> e.embedding[i]::DOUBLE * q.qv[i]), 'sum')"
    )
    na = (
        "sqrt(list_aggregate(list_transform(e.embedding, "
        "x -> x::DOUBLE * x::DOUBLE), 'sum'))"
    )
    nb = "sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))"
    return f"""WITH {ctes},
_he_q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
          FROM _he_e WHERE {id_col} = {query_id})
SELECT e.{id_col},
       CAST(floor((CASE WHEN ({na} * {nb}) = 0 THEN -2.0
                        ELSE {dot} / ({na} * {nb}) END) * 1000000.0) AS BIGINT)
         AS sim_e6
FROM _he_e e CROSS JOIN _he_q q
ORDER BY sim_e6 DESC, e.{id_col} ASC LIMIT {k}"""


def hash_embed_idf(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_tokens, embedding) — IDF-weighted SRP embeddings: like
    hash_embed, but each token occurrence votes with integer weight
    idf2(t) = bit_length((N + 1) div (df_t + 1)) instead of +-1, so
    corpus-universal tokens (stopwords, boilerplate) stop dominating the
    signs and the cosine ranks by DISTINCTIVE vocabulary — the tf-idf
    upgrade every bag-of-words retrieval stack applies. idf2 is the
    binary-length integer idf (seed_relevance_topk's trick: floats would
    make the per-component SUM partition-order dependent; the quantized
    idf is monotone in the true idf and exactly engine-portable).

    Shape vs hash_embed: weighting needs the document-frequency table,
    so this variant pays ONE extra vocabulary-keyed shuffle (distinct
    (doc, token) -> df counts, map-side combinable) and the per-doc
    component sums move from scan-side array aggregates to a doc-keyed
    groupBy over the exploded occurrence stream (the df table enters by
    broadcast — same bound as the classifier's weight table). Still no
    Python anywhere.
    """
    if not 1 <= dim <= 60:
        raise ValueError("hash_embed_idf: dim must be in [1, 60]")
    from posextract_spark.functions.boundary import materialize
    from posextract_spark.functions.hashing import portable_hash64, word_array

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    g = materialize(
        docs.select(F.col(id_col).alias("id"), src.alias("_hi_t")),
        __hi_ws=word_array(F.col("_hi_t")),
    )
    n = g.agg(F.count(F.lit(1)).cast("long").alias("_n_docs"))
    occ = g.select("id", F.explode_outer("__hi_ws").alias("token"))
    dfreq = (
        occ.filter(F.col("token").isNotNull())
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
    )
    j = (
        occ.join(F.broadcast(dfreq), "token", "left")
        .crossJoin(F.broadcast(n))
    )
    j = materialize(
        j,
        __hi_h=F.when(
            F.col("token").isNotNull(), portable_hash64(F.col("token"))
        ).otherwise(F.lit(0)),
        __hi_w=F.when(
            F.col("token").isNotNull(),
            F.length(F.expr("bin((_n_docs + 1) div (_df + 1))")).cast("long"),
        ).otherwise(F.lit(0)),
    )
    comps = [
        F.sum(
            F.when(F.col("__hi_h").bitwiseAND(F.lit(1 << k)) != 0, F.col("__hi_w"))
            .otherwise(-F.col("__hi_w"))
        ).cast("long")
        for k in range(dim)
    ]
    return (
        j.groupBy("id")
        .agg(
            F.count(F.col("token")).cast("long").alias("n_tokens"),
            F.array(*comps).alias("embedding"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "embedding")
    )


def hash_embed_idf_sql(
    dim: int = 32,
    docs_rel: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> str:
    """DuckDB mirror of hash_embed_idf (same integer idf, same masks;
    empty docs -> zero vector via the outer-join NULL row weighting 0)."""
    from posextract_spark.functions.hashing import WORD_ARRAY_SQL, portable_hash64_sql

    src = f"lower({text_col})" if lowercase else text_col
    words = WORD_ARRAY_SQL.format(col=src)
    h = portable_hash64_sql("o.token")
    comps = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN token IS NULL THEN 0 "
        f"WHEN (hh & {1 << k}) <> 0 THEN w ELSE -w END), 0) AS BIGINT)"
        for k in range(dim)
    )
    return f"""
_hi_w AS (
  SELECT {id_col} AS id, {words} AS ws FROM {docs_rel}),
_hi_o AS (
  SELECT id,
         unnest(CASE WHEN ws IS NULL OR len(ws) = 0 THEN [NULL::VARCHAR] ELSE ws END) AS token
  FROM _hi_w),
_hi_df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT id, token FROM _hi_o WHERE token IS NOT NULL)
  GROUP BY token),
_hi_n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM _hi_w),
_hi_j AS (
  SELECT o.id, o.token,
         CASE WHEN o.token IS NULL THEN 0 ELSE {h} END AS hh,
         CASE WHEN o.token IS NULL THEN 0
              ELSE length(printf('%b', (n.n_docs + 1) // (d.df + 1))) END AS w
  FROM _hi_o o
  LEFT JOIN _hi_df d USING (token)
  CROSS JOIN _hi_n n)
SELECT id AS {id_col},
       CAST(count(token) AS BIGINT) AS n_tokens,
       [{comps}] AS embedding
FROM _hi_j GROUP BY id"""


# --- SemDeDup: semantic near-dup pruning (Abbas et al. 2023) -----------------

SEMDEDUP_THRESHOLD_E6 = 950000


def semdedup_survivors(
    df: DataFrame,
    k: int = IVF_K,
    n_iter: int = 2,
    threshold_e6: int = SEMDEDUP_THRESHOLD_E6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    max_cluster_width: int | None = None,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv
    2303.09540): k-means-cluster the embeddings, then inside each cluster
    drop every vector that has a cosine-similar neighbor (sim_e6 >=
    ``threshold_e6``) ranking before it. Rank = (centroid_sim asc, id
    asc): the KEPT member of a near-dup group is the one FARTHEST from
    its centroid — the paper's best-performing keep policy (edge-of-
    cluster examples are the informative ones) — made deterministic with
    the id tie-break. One-pass dominance (b drops if ANY ranked-before
    similar a exists) rather than transitive closure: the policy is
    order-free, engine-exact, and matches the paper's epsilon-ball
    pruning within a cluster.

    Output: survivors only — (id, centroid_id, centroid_sim_e6);
    left-anti join the input to materialize the deduped corpus.

    Scale shape: training is kmeans_centroids' contract (k*dim driver
    longs per iteration); assignment is the zero-shuffle ivf_assign
    projection; the quadratic is confined to same-cluster pairs via ONE
    shuffle on centroid_id. Cluster width is the skew knob — k should
    scale with N (the paper uses N/k ~ 10^4); ``max_cluster_width``
    additionally caps hot clusters by deterministic subsampling
    (cap_bucket_width), under which a capped-out vector is neither
    dropped nor drops others — coverage, not correctness, degrades, as
    with minhash_band_pairs' cap. The assignment frame has three
    consumers (both pair sides + the anti-join), so it is materialized
    once with an eager localCheckpoint.

    k ceiling: the literal-centroid scan-side argmax (ivf_assign's
    shape) is practical to k ~ few hundred — beyond that the per-row
    literal array dominates. The paper-scale regime (k ~ 10^5 clusters
    for 10^8+ docs) swaps the assignment for a broadcast join against a
    (cid, cvec) centroid TABLE (k x dim doubles broadcast easily) with
    the same fixed-point argmax as a groupBy-min — everything downstream
    of the assignment is unchanged. Measured at 200k x 64-dim, k=256:
    26s train + 249s prune (BENCH/BASELINE.md r7)."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(df, k, n_iter, id_col, vec_col)
    )
    # r8 perf (results identical; see plans/r08/semdedup_survivors_*):
    # - spread_small_input: a single-split embeddings file made the ENTIRE
    #   pair-probe run as one task (12.6s single-threaded at 2000 vecs);
    # - _norm rides the checkpointed assignment frame so the pair cosine
    #   stops re-deriving both norms per pair (2 of 3 O(dim) interpreted
    #   passes were per-row constants);
    # - the threshold test is CASE-guarded under the dominance test so the
    #   expensive cosine is only evaluated for the dominance-ordered half
    #   of each cluster's pairs (Catalyst had merged the two filters with
    #   the cosine FIRST in the conjunction).
    base = _ivf_base(spread_small_input(df), id_col, vec_col)
    best = _best_centroid(_centroid_struct_array(cents))
    g = base.select(
        F.col(id_col),
        (-best["ncid"]).alias("centroid_id"),
        best["sim"].alias("centroid_sim_e6"),
        F.col("_e"),
        F.col("_norm"),
    ).localCheckpoint(eager=True)
    pair_side = g
    if max_cluster_width is not None:
        from posextract_spark.functions.capping import cap_bucket_width

        pair_side = cap_bucket_width(g, ["centroid_id"], id_col, max_cluster_width)
    a = pair_side.select(
        F.col(id_col).alias("_a_id"),
        F.col("centroid_id").alias("_a_cid"),
        F.col("centroid_sim_e6").alias("_a_csim"),
        F.col("_e").alias("_a_e"),
        F.col("_norm").alias("_a_n"),
    )
    b = pair_side.select(
        F.col(id_col).alias("_b_id"),
        F.col("centroid_id").alias("_b_cid"),
        F.col("centroid_sim_e6").alias("_b_csim"),
        F.col("_e").alias("_b_e"),
        F.col("_norm").alias("_b_n"),
    )
    dominates = (F.col("_a_csim") < F.col("_b_csim")) | (
        (F.col("_a_csim") == F.col("_b_csim")) & (F.col("_a_id") < F.col("_b_id"))
    )
    pair_sim = (
        F.floor(
            _cosine_prenormed(
                F.col("_a_e"), F.col("_b_e"), F.col("_a_n"), F.col("_b_n")
            )
            * F.lit(1000000.0)
        )
        .cast("bigint")
    )
    dropped = (
        a.join(b, F.col("_a_cid") == F.col("_b_cid"))
        .filter(
            F.when(dominates, pair_sim >= F.lit(threshold_e6)).otherwise(F.lit(False))
        )
        .select(F.col("_b_id").alias(id_col))
        .distinct()
    )
    return g.join(dropped, id_col, "left_anti").select(
        id_col, "centroid_id", "centroid_sim_e6"
    )


def semdedup_survivors_sql(
    n_iter: int = 2,
    k: int = IVF_K,
    threshold_e6: int = SEMDEDUP_THRESHOLD_E6,
) -> str:
    """DuckDB mirror of semdedup_survivors (trained-centroid path): the
    unrolled k-means chain + final assignment, the same (csim, id)
    dominance pair join, anti-join of the dropped set."""
    ctes, final = kmeans_cents_cte(n_iter, k)
    norms = (
        "(sqrt(list_aggregate(list_transform(a.e, x -> x * x), 'sum'))"
        " * sqrt(list_aggregate(list_transform(b.e, x -> x * x), 'sum')))"
    )
    pair_cos = (
        "CAST(floor((CASE WHEN " + norms + " = 0 THEN -2.0 ELSE "
        "list_aggregate(list_transform(generate_series(1, len(a.e)), j -> a.e[j] * b.e[j]), 'sum')"
        " / " + norms + " END)"
        " * 1000000.0) AS BIGINT)"
    )
    return (
        ctes
        + ",\n"
        + _assign_ctes("F", final).lstrip()
        + f""",
sg AS (
  SELECT s.vec_id, s.cid, s.sim_e6 AS csim, v.e
  FROM assignF s JOIN vecs v USING (vec_id)
),
sdropped AS (
  SELECT DISTINCT b.vec_id
  FROM sg a JOIN sg b
    ON a.cid = b.cid
   AND (a.csim < b.csim OR (a.csim = b.csim AND a.vec_id < b.vec_id))
  WHERE {pair_cos} >= {threshold_e6}
)
SELECT g.vec_id, CAST(g.cid AS INTEGER) AS centroid_id, g.csim AS centroid_sim_e6
FROM sg g LEFT JOIN sdropped d ON g.vec_id = d.vec_id
WHERE d.vec_id IS NULL
"""
    )


def semdedup_against_base(
    new_df: DataFrame,
    base_df: DataFrame,
    k: int = IVF_K,
    n_iter: int = 2,
    threshold_e6: int = SEMDEDUP_THRESHOLD_E6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    max_cluster_width: int | None = None,
) -> DataFrame:
    """APPEND-ONLY incremental semantic dedup — the SemDeDup counterpart
    of dedup.minhash_dedup_against_base: flag new-snapshot vectors with a
    cosine-similar neighbor (sim_e6 >= ``threshold_e6``) in the EXISTING
    corpus, without touching base survivors. New-vs-new semantic dups are
    handled by semdedup_survivors over the new snapshot alone first; this
    answers "is this new doc semantically redundant against what we
    already keep" — the daily-ingest question.

    Output: one row per new vector —
      (id, centroid_id, n_base_hits, matched_base_id [-1 if none], is_new)

    Scale shape: the quantizer is trained on the BASE corpus (or passed
    in — production keeps it as a model artifact so assignment costs
    never retrain); both sides assign scan-side (zero shuffle); the
    cross join is confined to same-cluster (new x base) pairs via one
    shuffle per side on centroid_id. Unlike the minhash variant the base
    side cannot be pre-aggregated to bucket summaries (cosine needs the
    vectors), so hot clusters are the skew knob: ``max_cluster_width``
    deterministically subsamples the BASE side per cluster
    (cap_bucket_width) — a capped-out base vector stops flagging new
    ones (coverage degrades, correctness doesn't). Same k ceiling note
    as semdedup_survivors."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(base_df, k, n_iter, id_col, vec_col)
    )
    cent_arr = _centroid_struct_array(cents)

    # r8 perf: same three-way treatment as semdedup_survivors (spread a
    # single-split input, materialize norms once per row, keep the pair
    # cosine to one O(dim) pass per pair); results identical.
    def assigned(frame: DataFrame) -> DataFrame:
        base = _ivf_base(spread_small_input(frame), id_col, vec_col)
        best = _best_centroid(cent_arr)
        return base.select(
            F.col(id_col),
            (-best["ncid"]).alias("centroid_id"),
            F.col("_e"),
            F.col("_norm"),
        )

    gn = assigned(new_df).localCheckpoint(eager=True)
    gb = assigned(base_df).select(
        F.col(id_col).alias("_base_id"),
        F.col("centroid_id").alias("_b_cid"),
        F.col("_e").alias("_b_e"),
        F.col("_norm").alias("_b_n"),
    )
    if max_cluster_width is not None:
        from posextract_spark.functions.capping import cap_bucket_width

        gb = cap_bucket_width(gb, ["_b_cid"], "_base_id", max_cluster_width)
    pair_sim = (
        F.floor(
            _cosine_prenormed(
                F.col("_e"), F.col("_b_e"), F.col("_norm"), F.col("_b_n")
            )
            * F.lit(1000000.0)
        ).cast("bigint")
    )
    hits = (
        gn.join(gb, F.col("centroid_id") == F.col("_b_cid"))
        .filter(pair_sim >= F.lit(threshold_e6))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_base_hits"),
            F.min("_base_id").alias("_mb"),
        )
    )
    return gn.join(hits, id_col, "left").select(
        id_col,
        "centroid_id",
        F.coalesce(F.col("n_base_hits"), F.lit(0)).cast("int").alias("n_base_hits"),
        F.coalesce(F.col("_mb"), F.lit(-1)).cast("bigint").alias("matched_base_id"),
        (F.col("n_base_hits").isNull()).cast("int").alias("is_new"),
    )


def semdedup_against_base_sql(
    n_iter: int = 2,
    k: int = IVF_K,
    threshold_e6: int = SEMDEDUP_THRESHOLD_E6,
) -> str:
    """Mirror of semdedup_against_base with the contract's deterministic
    split: base = even vec_id, new = odd. The k-means chain trains on the
    base relation (init = base ids < k, so an even-only base yields
    ceil(k/2) centroids — identically in both engines); both sides assign
    against the final centroids with the same fixed-point argmax."""
    base_rel = "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)"
    ctes, final = kmeans_cents_cte(n_iter, k, rel=base_rel)
    norms = (
        "(sqrt(list_aggregate(list_transform(n.e, x -> x * x), 'sum'))"
        " * sqrt(list_aggregate(list_transform(b.e, x -> x * x), 'sum')))"
    )
    pair_cos = (
        "CAST(floor((CASE WHEN " + norms + " = 0 THEN -2.0 ELSE "
        "list_aggregate(list_transform(generate_series(1, len(n.e)), j -> n.e[j] * b.e[j]), 'sum')"
        " / " + norms + " END)"
        " * 1000000.0) AS BIGINT)"
    )
    return (
        ctes
        + f""",
nvecs AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings WHERE vec_id % 2 = 1
),
nasg AS (
  SELECT vec_id, cid, e FROM (
    SELECT v.vec_id, c.cid, v.e, {_COS_SQL} AS sim_e6,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {_COS_SQL} DESC, c.cid ASC) AS rn
    FROM nvecs v CROSS JOIN {final} c
  ) WHERE rn = 1
),
basg AS (
  SELECT vec_id AS base_id, cid, e FROM (
    SELECT v.vec_id, c.cid, v.e, {_COS_SQL} AS sim_e6,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {_COS_SQL} DESC, c.cid ASC) AS rn
    FROM vecs v CROSS JOIN {final} c
  ) WHERE rn = 1
),
bhits AS (
  SELECT n.vec_id, CAST(count(*) AS INT) AS n_base_hits,
         min(b.base_id) AS mb
  FROM nasg n JOIN basg b ON n.cid = b.cid AND {pair_cos} >= {threshold_e6}
  GROUP BY n.vec_id
)
SELECT g.vec_id, CAST(g.cid AS INTEGER) AS centroid_id,
       CAST(coalesce(h.n_base_hits, 0) AS INT) AS n_base_hits,
       CAST(coalesce(h.mb, -1) AS BIGINT) AS matched_base_id,
       CAST(h.vec_id IS NULL AS INT) AS is_new
FROM nasg g LEFT JOIN bhits h ON g.vec_id = h.vec_id
"""
    )


def cluster_balanced_sample(
    df: DataFrame,
    cap_per_cluster: int = 64,
    k: int = IVF_K,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """Diversity-preserving corpus subsampling: assign every vector to
    its trained k-means cluster and keep a deterministic expected-
    ``cap_per_cluster`` subsample of each cluster — mega-clusters
    (boilerplate / templated content, the webtext mode) are downweighted
    toward the cap while tail clusters survive intact, which is the
    cluster-balanced selection step pretraining-data pipelines run after
    dedup (cf. SemDeDup sec. 5's cluster sampling / DCLM's diversity
    balancing).

    Output: row-preserving report (id, centroid_id, cluster_width, kept)
    — kept = 1 iff width <= cap or md5(id) mod width < cap, the same
    hash-of-the-DATA rule as functions/capping.cap_bucket_width, so
    stage retries, repartitions, and appends reproduce the decision;
    filter kept = 1 to materialize the sample.

    Scale shape: zero-shuffle trained assignment (ivf_assign), one
    k-row width aggregate broadcast back, one scan-side flag. The
    assignment frame has two consumers (widths + flag) — eager
    localCheckpoint, same discipline as semdedup_survivors."""
    from posextract_spark.functions.hashing import portable_hash64

    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(df, k, n_iter, id_col, vec_col)
    )
    assign = ivf_assign(df, k=k, id_col=id_col, vec_col=vec_col, centroids=cents)
    assign = assign.select(id_col, "centroid_id").localCheckpoint(eager=True)
    widths = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_width")
    )
    kept = (
        (F.col("cluster_width") <= cap_per_cluster)
        | (
            F.pmod(
                portable_hash64(F.col(id_col).cast("string")),
                F.col("cluster_width"),
            )
            < cap_per_cluster
        )
    ).cast("int")
    return assign.join(F.broadcast(widths), "centroid_id").select(
        id_col, "centroid_id", "cluster_width", kept.alias("kept")
    )


def cluster_balanced_sample_sql(
    cap_per_cluster: int = 64, n_iter: int = 2, k: int = IVF_K
) -> str:
    """Mirror of cluster_balanced_sample on trained centroids: the
    unrolled k-means chain + final assignment, width counts, the same
    md5-mod keep rule."""
    from posextract_spark.functions.hashing import portable_hash64_sql

    ctes, final = kmeans_cents_cte(n_iter, k)
    h = portable_hash64_sql("CAST(a.vec_id AS VARCHAR)")
    return (
        ctes
        + ",\n"
        + _assign_ctes("F", final).lstrip()
        + f""",
cw AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS cluster_width
  FROM assignF GROUP BY cid
)
SELECT a.vec_id, CAST(a.cid AS INTEGER) AS centroid_id, w.cluster_width,
       CAST(w.cluster_width <= {cap_per_cluster}
            OR ({h} % w.cluster_width) < {cap_per_cluster} AS INT) AS kept
FROM assignF a JOIN cw w USING (cid)
"""
    )


# --- reciprocal rank fusion (hybrid lexical + semantic retrieval) ------------

RRF_K = 60


def rrf_search_topk(
    docs: DataFrame,
    seed_terms: list[str],
    query_id: int = 0,
    k: int = 10,
    pool: int = 25,
    k_rrf: int = RRF_K,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009): fuse the LEXICAL arm (seed_relevance_topk —
    the integer BM25-ish seed ranking) with the SEMANTIC arm
    (hash_embed_topk — SRP-embedding cosine against document
    ``query_id``), scoring each doc

      rrf_score_e6 = sum over arms of floor(1e6 div (k_rrf + rank))

    with rank = the doc's 1-based position in that arm's deterministic
    (score desc, id asc) order and absent-from-arm contributing 0. RRF
    needs only ranks, so the arms' incomparable score scales (idf2 x
    saturation vs cosine e6) never mix — the standard hybrid-search
    fusion, integer-exact here.

    Output: top-``k`` (id, rrf_score_e6, lex_rank, sem_rank), rank 0 =
    absent from that arm's pool.

    Scale shape: each arm is already top-``pool`` bounded
    (TakeOrderedAndProject), so everything downstream — the rank
    windows, the full-outer fuse, the final TakeOrdered — runs on <= 2 x
    pool rows. The Window here is NOT the banned unbounded ranking
    window: its partition is a k-bounded arm result (driver-small, same
    budget as a collected centroid table)."""
    from pyspark.sql import Window

    from posextract_spark.operators.textops import seed_relevance_topk

    lex = seed_relevance_topk(
        docs, seed_terms, k=pool, text_col=text_col, id_col=id_col
    )
    sem = hash_embed_topk(
        docs, query_id=query_id, k=pool, dim=dim, text_col=text_col, id_col=id_col
    )
    # seed_relevance_topk returns its id column as literal "id"
    wl = Window.orderBy(F.desc("relevance_e6"), F.col("id").asc())
    ws = Window.orderBy(F.desc("sim_e6"), F.col(id_col).asc())
    lr = lex.select(
        F.col("id").alias(id_col),
        F.row_number().over(wl).cast("long").alias("lex_rank"),
    )
    sr = sem.select(
        F.col(id_col), F.row_number().over(ws).cast("long").alias("sem_rank")
    )
    def contrib(col_name: str) -> F.Column:
        # NULL rank (absent from the arm) -> NULL div -> 0; integer div
        # keeps the fusion engine-exact (DuckDB mirrors it with //)
        return F.coalesce(
            F.expr(f"CAST(1000000 AS BIGINT) div ({k_rrf} + {col_name})"),
            F.lit(0).cast("long"),
        )

    fused = lr.join(sr, id_col, "full_outer").select(
        F.col(id_col),
        (contrib("lex_rank") + contrib("sem_rank")).cast("long").alias("rrf_score_e6"),
        F.coalesce(F.col("lex_rank"), F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce(F.col("sem_rank"), F.lit(0)).cast("long").alias("sem_rank"),
    )
    return fused.orderBy(F.desc("rrf_score_e6"), F.col(id_col).asc()).limit(k)


def rrf_search_topk_sql(
    seed_terms: list[str],
    query_id: int = 0,
    k: int = 10,
    pool: int = 25,
    k_rrf: int = RRF_K,
    dim: int = 32,
) -> str:
    """DuckDB mirror of rrf_search_topk: both arm queries nested as
    derived tables (nested WITH inside a derived table is legal DuckDB),
    the same row_number ranks, integer // fusion, same tie-break."""
    from posextract_spark.operators.textops import seed_relevance_topk_sql

    lex_q = "WITH _sr_dummy AS (SELECT 1)" + seed_relevance_topk_sql(
        seed_terms, k=pool
    )
    sem_q = hash_embed_topk_sql(query_id=query_id, k=pool, dim=dim)
    return f"""
WITH rlex AS (
  SELECT id AS doc_id,
         row_number() OVER (ORDER BY relevance_e6 DESC, id ASC) AS lex_rank
  FROM ({lex_q})
),
rsem AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim_e6 DESC, doc_id ASC) AS sem_rank
  FROM ({sem_q})
),
rfuse AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
         (coalesce(1000000 // ({k_rrf} + l.lex_rank), 0)
          + coalesce(1000000 // ({k_rrf} + s.sem_rank), 0)) AS rrf,
         coalesce(l.lex_rank, 0) AS lex_rank,
         coalesce(s.sem_rank, 0) AS sem_rank
  FROM rlex l FULL OUTER JOIN rsem s ON l.doc_id = s.doc_id
)
SELECT doc_id, CAST(rrf AS BIGINT) AS rrf_score_e6,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank
FROM rfuse ORDER BY rrf DESC, doc_id ASC LIMIT {k}
"""


def hard_negative_mining(
    df: DataFrame,
    gold_pairs: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, neg_id, sim_e6) — HARD NEGATIVES for retriever training
    (the DPR/Contriever recipe): for each query vector (the
    ``n_queries`` smallest ids), the top-``k`` most-similar corpus
    vectors that are NEITHER the query itself NOR a gold positive
    (``gold_pairs``: (qid, pos_id) rows). Training on these
    near-miss negatives is what makes a dense retriever discriminate;
    random negatives are too easy.

    Scale shape (the ann_recall_ivf harness pattern): queries broadcast
    into ONE Q x N similarity pass; gold pairs broadcast-anti-joined
    (eval-suite sized); per-query top-k is the no-Window
    collect/sort_array/slice aggregate bounded by the query sample. For
    mining over MILLIONS of queries, replace the brute-force pass with
    ivf_pq_topk per shard — the selection logic downstream is
    unchanged."""
    base = _ivf_base(df, id_col, vec_col)
    qf = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"),
        F.col("_e").alias("_qe"),
        F.col("_norm").alias("_qnorm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_e"), F.col("_qe"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    denom = F.col("_norm") * F.col("_qnorm")
    cos = F.when(denom != 0, dot / denom).otherwise(F.lit(-2.0))
    sims = (
        base.crossJoin(F.broadcast(qf))
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col).alias("neg_id"),
            F.floor(cos * F.lit(1000000.0)).cast("bigint").alias("sim_e6"),
        )
    )
    gold = gold_pairs.select(
        F.col(gold_pairs.columns[0]).cast("long").alias("qid"),
        F.col(gold_pairs.columns[1]).cast("long").alias("neg_id"),
    )
    cand = sims.join(F.broadcast(gold), ["qid", "neg_id"], "left_anti")
    picked = (
        cand.groupBy("qid")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct((-F.col("sim_e6")).alias("ns"), "neg_id"))
                ),
                1,
                k,
            ).alias("top")
        )
        .select("qid", F.explode("top").alias("t"))
        .select(
            "qid",
            F.col("t.neg_id").alias("neg_id"),
            (-F.col("t.ns")).cast("bigint").alias("sim_e6"),
        )
    )
    return picked


def hard_negative_mining_sql(
    n_queries: int = 10, k: int = 5, gold_offset: int = 250
) -> str:
    """Mirror with the contract's synthetic gold: positive of query q is
    vec_id q + gold_offset; same (sim desc, id asc) top-k per query."""
    return f"""
WITH _hn_v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
),
_hn_q AS (SELECT vec_id AS qid, e AS qe FROM _hn_v WHERE vec_id < {n_queries}),
_hn_s AS (
  SELECT q.qid, v.vec_id AS neg_id,
    CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(q.qe, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
      list_aggregate(list_transform(generate_series(1, len(v.e)), j -> v.e[j] * q.qe[j]), 'sum')
      / (sqrt(list_aggregate(list_transform(v.e, x -> x * x), 'sum'))
         * sqrt(list_aggregate(list_transform(q.qe, x -> x * x), 'sum'))) END)
      * 1000000.0) AS BIGINT) AS sim_e6
  FROM _hn_v v CROSS JOIN _hn_q q
  WHERE v.vec_id <> q.qid AND v.vec_id <> q.qid + {gold_offset}
),
_hn_r AS (
  SELECT qid, neg_id, sim_e6,
         row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, neg_id ASC) AS rn
  FROM _hn_s
)
SELECT qid, neg_id, sim_e6 FROM _hn_r WHERE rn <= {k}
"""


def lsh_multiprobe_topk(
    df: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket, sim_e6) — LSH ANN with MULTI-PROBE (Lv et al., VLDB
    2007): instead of searching only the query's own SRP bucket, also
    probe every Hamming-1 neighbor (one sign flipped — the buckets a
    near-boundary neighbor most likely fell into), then exact-rerank the
    union by cosine. Recall rises from single-bucket's ~(1-miss)^planes
    toward 1 at ~(n_planes+1)x the candidate volume — the standard
    probe/recall dial, measured in tests vs single-probe on the same
    corpus.

    Scale shape: bucket ids are scan-side (lsh_bucket_expr, no
    broadcast); the probe set is n_planes+1 driver ints; candidate
    selection is a Filter(bucket IN probes) that prunes partitions when
    the table is stored bucketed by `bucket`; the rerank is cosine over
    the candidate slice feeding TakeOrderedAndProject."""
    from posextract_spark.functions.boundary import materialize

    with_b = materialize(
        df.select(F.col(id_col), F.col(vec_col)),
        __lmb=lsh_bucket_expr(n_planes, vec_col),
    )
    q = with_b.filter(F.col(id_col) == query_id).select(vec_col, "__lmb").collect()
    if not q:
        raise ValueError(f"lsh_multiprobe_topk: query id {query_id} not found")
    qv = [float(x) for x in q[0][vec_col]]
    qb = int(q[0]["__lmb"])
    probes = [qb] + [qb ^ (1 << p) for p in range(n_planes)]
    qlit = F.array(*[F.lit(x) for x in qv])
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cand = with_b.filter(F.col("__lmb").isin(probes)).filter(
        F.col(id_col) != query_id
    )
    return (
        cand.select(
            F.col(id_col),
            F.col("__lmb").alias("bucket"),
            F.floor(_cosine(emb, qlit) * F.lit(1000000.0)).cast("bigint").alias("sim_e6"),
        )
        .orderBy(F.desc("sim_e6"), F.col(id_col).asc())
        .limit(k)
    )


def lsh_multiprobe_topk_sql(
    query_id: int = 0, k: int = 10, n_planes: int = 4
) -> str:
    """Mirror: the same bucket expression, the probe set via xor, the
    same exact rerank and tie-break."""
    b = lsh_bucket_expr_sql(n_planes)
    flips = "\n  UNION ALL\n  ".join(
        f"SELECT xor(bucket, {1 << p}) FROM qb" for p in range(n_planes)
    )
    return f"""
WITH _mp_b AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e,
         {b} AS bucket
  FROM embeddings
),
qb AS (SELECT bucket, e AS qe FROM _mp_b WHERE vec_id = {query_id}),
probes AS (
  SELECT bucket AS pb FROM qb
  UNION ALL
  {flips}
),
cand AS (
  SELECT v.vec_id, v.bucket, v.e, qb.qe
  FROM _mp_b v JOIN qb ON v.bucket IN (SELECT pb FROM probes)
  WHERE v.vec_id <> {query_id}
)
SELECT vec_id, bucket,
  CAST(floor((CASE WHEN (sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
       * sqrt(list_aggregate(list_transform(qe, x -> x * x), 'sum'))) = 0 THEN -2.0 ELSE
    list_aggregate(list_transform(generate_series(1, len(e)), j -> e[j] * qe[j]), 'sum')
    / (sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
       * sqrt(list_aggregate(list_transform(qe, x -> x * x), 'sum'))) END)
    * 1000000.0) AS BIGINT) AS sim_e6
FROM cand
ORDER BY sim_e6 DESC, vec_id ASC LIMIT {k}
"""
