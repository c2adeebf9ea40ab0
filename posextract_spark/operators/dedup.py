"""Deduplication operators (exact, minhash-LSH, simhash, n-gram Jaccard).

Scale notes (the 100 TB design point):
- exact dedup is a single hash-keyed shuffle with map-side partial
  aggregation; the representative-choice (min doc_id) keeps it one pass.
- minhash: signatures AND band keys are per-row array expressions (zero
  shuffle, zero Python). The SURVIVORS path builds star edges via a
  map-side-partial groupBy bucket-min + join-back — NO task ever holds a
  whole hot bucket (no Window node anywhere in the path), and AQE can
  skew-split the join-back. The pair-LISTING query (minhash_band_pairs)
  still self-joins by definition; AQE skew-split applies there, and an
  optional max_bucket_width deterministically subsamples hot buckets.
- n-gram Jaccard candidate generation joins on shared shingles — quadratic
  on hot shingles; it is provided as the exact small-scale baseline, with
  minhash-LSH as the scale path; max_shingle_bucket hash-threshold caps
  the hot-shingle blowup without any per-bucket sort.
- hashing is the portable md5-based hash (functions.hashing) so every
  stage is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import ngram_array, portable_hash64, word_array

MINHASH_SEEDS = 8
SHINGLE_N = 5


def _shingles(words):
    """Distinct word 5-gram shingles as strings, over a MATERIALIZED
    word-array column (functions/boundary.py) — the shared gram builder
    (functions/hashing.ngram_array) carries the attribute-reference-only
    performance contract and the short-doc sequence guard."""
    return F.array_distinct(ngram_array(words, SHINGLE_N))


def portable_hash64b(col):
    """Second independent 60-bit hash (md5 chars 17-31) — paired with
    portable_hash64 it forms a 120-bit dedup key, so hash-keyed 'exact'
    dedup does not silently merge distinct texts at the 10^12-doc design
    point (a single 60-bit key hits 50% collision odds near 1.3e9 rows)."""
    return F.conv(F.substring(F.md5(col), 17, 15), 16, 10).cast("bigint")


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    representative (min id) and multiplicity. Groups on a 120-bit dual
    hash (shuffle stays two BIGINTs wide instead of carrying full text);
    output exposes the first half as text_hash."""
    return (
        df.select(
            portable_hash64(F.col(text_col)).alias("text_hash"),
            portable_hash64b(F.col(text_col)).alias("_h2"),
            F.col(id_col),
        )
        .groupBy("text_hash", "_h2")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_docs"))
        .drop("_h2")
    )


# Affine rehash family for minhash: each shingle is md5-hashed ONCE, then
# seed s's hash is (A[s] * (h % P) + B[s]) % P with P prime > 2^32. All
# integer ops stay far below 2^63 (A,B < 2^20; h%P < 2^33), so no overflow
# under ANSI mode and exact parity in DuckDB.
MINHASH_P = 4294967311
MINHASH_A = [7, 131, 2053, 16411, 131101, 524309, 1048583, 999983]
MINHASH_B = [3, 401, 4099, 32771, 262147, 786433, 65537, 424243]


def _check_n_seeds(n_seeds: int) -> None:
    if n_seeds > len(MINHASH_A):
        raise ValueError(
            f"n_seeds={n_seeds} exceeds the {len(MINHASH_A)}-entry affine "
            "family; extend MINHASH_A/MINHASH_B (silent wrapping would "
            "duplicate hash functions and the Column path would read out "
            "of bounds)"
        )


def _affine_min(hs, seed):
    """min over the base-hash array of the affine rehash for ``seed``
    (seed may be a python int or a Column)."""
    if isinstance(seed, int):
        a = F.lit(MINHASH_A[seed])
        b = F.lit(MINHASH_B[seed])
    else:
        a = F.element_at(F.array(*[F.lit(x) for x in MINHASH_A]), seed + 1)
        b = F.element_at(F.array(*[F.lit(x) for x in MINHASH_B]), seed + 1)
    return F.array_min(F.transform(hs, lambda h: (a * (h % F.lit(MINHASH_P)) + b) % F.lit(MINHASH_P)))


def _with_base_hashes(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _hs): md5 base hash per distinct shingle, computed ONCE per row.

    IMPORTANT plan shape: everything that consumes ``_hs`` more than once
    must sit ABOVE a Generate (explode) boundary. Spark's CollapseProject
    inlines multi-referenced expressions into each use site (no CSE across
    array elements, and higher-order-function lambdas are interpreted), so
    a plain projection 'barrier' does NOT hold — we measured the md5
    transform duplicated 8x (85s vs ~8s at bench scale). A Generate is a
    real materialization point: its child projection computes ``_hs`` once
    and the exploded rows reference the materialized array.

    The word array gets the same treatment BELOW the shingling (r4): the
    slice inside the shingle transform's lambda re-evaluates any
    non-attribute subtree per element, so shingling over the raw split
    expression was O(words^2) per document."""
    from posextract_spark.functions.boundary import materialize

    g = materialize(
        df.select(F.col(id_col), F.col(text_col)),
        __words=word_array(F.col(text_col)),
    )
    pruned = g.filter(F.size(F.col("__words")) >= SHINGLE_N)
    return pruned.select(
        F.col(id_col),
        F.transform(_shingles(F.col("__words")), lambda s: portable_hash64(s)).alias("_hs"),
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """(id, seed, minhash) — min over shingles of the seed's affine rehash
    of the per-shingle base hash.

    Shape: base-hash projection -> explode(seeds) [Generate boundary] ->
    per-(row, seed) single min pass. No shuffle; md5 exactly once per
    shingle. Documents with fewer than SHINGLE_N words emit no rows.
    """
    _check_n_seeds(n_seeds)
    hs = _with_base_hashes(df, text_col, id_col)
    seeds = F.array(*[F.lit(s).cast("int") for s in range(n_seeds)])
    exploded = hs.select(F.col(id_col), F.col("_hs"), F.explode(seeds).alias("seed"))
    return exploded.select(
        id_col, "seed", _affine_min(F.col("_hs"), F.col("seed")).alias("minhash")
    )


def _band_keys(
    df: DataFrame, text_col: str, id_col: str, n_seeds: int, band_size: int
) -> DataFrame:
    """(id, band, band_key): base-hash once [below the Generate], then
    per-(row, band) compute the band's member minhashes and hash them
    into one key."""
    _check_n_seeds(n_seeds)
    hs_df = _with_base_hashes(df, text_col, id_col)
    n_bands = n_seeds // band_size
    band_lits = F.array(*[F.lit(b).cast("int") for b in range(n_bands)])
    exploded = hs_df.select(F.col(id_col), F.col("_hs"), F.explode(band_lits).alias("band"))
    member_mins = [
        _affine_min(F.col("_hs"), F.col("band") * band_size + r).cast("string")
        for r in range(band_size)
    ]
    return exploded.select(
        F.col(id_col),
        F.col("band"),
        portable_hash64(F.concat_ws(",", *member_mins)).alias("band_key"),
    )


def _star_edges(keys: DataFrame, id_col: str) -> DataFrame:
    """(src, dst) star edges per band bucket: member -> bucket-min, deduped
    across bands. Same transitive closure as the all-pairs listing at O(k)
    per bucket; shared by minhash_dedup_survivors and its linearity test.

    The bucket-min is a groupBy aggregate + join-back, NOT a partition-only
    Window (r5, VERDICT r4 item 1): ``Window.partitionBy(band, band_key)``
    forces the ENTIRE hot bucket onto one task and sorts it — for the
    motivating case (a boilerplate page with 10^6+ copies) that is one task
    materializing 10^6 rows per band. ``groupBy().agg(min)`` does map-side
    partial aggregation, so no task ever holds a whole bucket, and the
    join-back is an equijoin AQE can skew-split. The plan must contain no
    Window node (pinned by tests/test_dedup_caps.py)."""
    mins = keys.groupBy("band", "band_key").agg(F.min(id_col).alias("_min"))
    return (
        keys.join(mins, ["band", "band_key"])
        .filter(F.col(id_col) != F.col("_min"))
        .select(F.col(id_col).alias("src"), F.col("_min").alias("dst"))
        .distinct()
    )


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """LSH banding: output candidate near-duplicate pairs (a < b) with the
    number of bands that collided. The within-bucket self-join is
    quadratic in bucket width BY DEFINITION of this query (it LISTS the
    pairs); the survivors path below never calls it — it builds star
    edges instead, so hot buckets cost O(k), not O(k^2).

    ``max_bucket_width`` (r5, VERDICT r4 item 4) bounds the remaining
    quadratic for production runs where listing every pair inside a
    10^6-copy boilerplate bucket is pointless: buckets wider than the cap
    are deterministically subsampled to expected width ``cap`` via
    ``pmod(hash64(doc_id), width) < cap`` (hash of the DATA, so stage
    retries reproduce it; same pattern as ngram_jaccard_stats /
    similarity.neardup_bucket_stats). Honest semantics under a cap: pair
    coverage inside a capped bucket drops to ~(cap/width)^2 of the
    listing and ``n_bands`` is a lower bound for pairs whose other bands
    were capped — use the survivors path, which never needs the listing,
    when you want full closure. None (default, used by the oracle-checked
    contract query) is exact.

    Cost note (r6, ADVICE r5): with the cap enabled the band-key frame
    has two consumers (the width aggregation and the capped self-join),
    so it is materialized ONCE here via an eager localCheckpoint — the
    executed plan has a single scan+shingle+md5 lineage; widths and the
    join-back both read the checkpointed blocks. localCheckpoint (same
    mechanism as the CC rounds) needs no caller-side unpersist: blocks
    are reclaimed when the RDD is GC'd. Caveat it inherits: losing an
    executor loses its blocks un-recomputably and fails the job — for
    this diagnostic LISTING query that is the right trade; the survivors
    path (the production dedup) uses persist+unpersist instead."""
    keys = _band_keys(df, text_col, id_col, n_seeds, band_size)
    if max_bucket_width is not None:
        from posextract_spark.functions.capping import cap_bucket_width

        keys = keys.localCheckpoint(eager=True)
        keys = cap_bucket_width(keys, ["band", "band_key"], id_col, max_bucket_width)
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


def minhash_dedup_against_base(
    new_df: DataFrame,
    base_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
) -> DataFrame:
    """APPEND-ONLY incremental near-dup dedup (r6, the dedup counterpart
    of graph.merge_edge_deltas): flag new-snapshot documents that collide
    with the EXISTING corpus — any shared LSH band key — without touching
    base survivors. New-vs-new duplicates are handled by running
    minhash_dedup_survivors over the new snapshot alone first; this
    operator answers "is this new doc a near-dup of anything we already
    keep", which is the question a daily crawl ingest actually asks.

    Output: one row per new doc with >= SHINGLE_N words —
      (id, n_hit_bands,        -- bands whose bucket exists in base (0..n_bands)
       matched_base_id,        -- smallest colliding base doc id, -1 if none
       is_new)                 -- 1 iff no collision

    Scale shape: the base side is pre-aggregated to ONE ROW PER BAND
    BUCKET (min base id via map-side-partial groupBy) BEFORE the join, so
    a boilerplate bucket with 10^6 base copies meets each new key as a
    single summary row — the join can never go quadratic, unlike a raw
    keys-to-keys join. One shuffle per side on (band, band_key) + the
    final per-doc aggregation; in production the base bucket summary is
    a small persisted table maintained incrementally (merge = groupBy
    min again, associative like the graph deltas)."""
    new_keys = _band_keys(new_df, text_col, id_col, n_seeds, band_size)
    base_summary = (
        _band_keys(base_df, text_col, id_col, n_seeds, band_size)
        .groupBy("band", "band_key")
        .agg(F.min(id_col).alias("_base_min"))
    )
    hits = new_keys.join(base_summary, ["band", "band_key"], "left")
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.col("_base_min")).alias("n_hit_bands"),
            F.min("_base_min").alias("_mb"),
        )
        .select(
            id_col,
            F.col("n_hit_bands").cast("int").alias("n_hit_bands"),
            F.coalesce(F.col("_mb"), F.lit(-1)).cast("bigint").alias("matched_base_id"),
            (F.col("n_hit_bands") == 0).cast("int").alias("is_new"),
        )
    )


def minhash_dedup_survivors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
) -> DataFrame:
    """End-to-end near-duplicate deduplication — what a 100 TB training-data
    pipeline actually runs: LSH band buckets -> STAR EDGES per bucket ->
    connected components (O(log n) large-star/small-star rounds) ->
    per-cluster survivor = smallest doc id.

    Star edges, not the pair join (r4): CC only needs CONNECTIVITY, and
    within one band bucket every member is pairwise-connected either way,
    so edges (member -> bucket-min) have exactly the same transitive
    closure as the all-pairs listing while a hot bucket (10^6 copies of a
    boilerplate page — the common case that motivates dedup at all) costs
    O(k) edges instead of O(k^2). One window-min per bucket, no self-join
    anywhere in the survivors path; the oracle is closure-based and
    therefore algorithm-independent (tests/test_dedup_caps.py pins
    star == pair-join cluster equality and the linear hot-bucket cost).

    Output: (doc_id, cluster_id, is_survivor 0/1). Downstream keeps
    ``is_survivor = 1`` rows; cluster_id gives full dedup lineage. Documents
    with no near-dup candidates are their own singleton cluster (left join +
    coalesce, no shuffle beyond the CC rounds).

    LEAF CONTRACTION before CC (r6 — measured at sf1): the star edges
    (member -> bucket-min) form a bipartite-ish graph whose member nodes
    are leaves chained only through their mins, so CC does not need them:
    for each member, connect the SET of bucket-mins it touches (a star
    onto its smallest min), run CC over the MIN-GRAPH only — O(#buckets)
    nodes instead of O(#docs) — and map each member to its smallest min's
    component. Exactness: a component's smallest doc id is always itself
    a bucket-min (its bucket's min is <= it and connected, hence equal),
    so min-over-min-nodes == min-over-all-nodes, and contracting leaves
    preserves connectivity between mins by construction. The dup-free
    extreme costs nothing (every member is its own min -> empty min
    graph). Measured (interleaved 3x3 A/B at 2M docs, contended box,
    identical outputs): median 70.5s -> 47.6s (1.48x), min 56.5 -> 43.8s
    — the wall-clock win is modest single-node because band-key hashing
    dominates; the structural win is what matters at 10^12 docs: every
    CC checkpoint round materializes a ~#buckets-node graph instead of
    an O(#docs)-edge one (BENCH/BASELINE.md r6). Equality vs the
    uncontracted star path and
    the pair-join closure is pinned by tests/test_dedup_caps.py; the
    recursive-CTE oracle is algorithm-independent.

    ``keys`` is persisted across the bucket-min construction (r5 review):
    the groupBy bucket-min + join-back consumes the band-key frame TWICE,
    and without the persist each consumer re-plans the whole
    scan -> shingle -> md5 -> minhash lineage. ``per_member`` is
    materialized via eager localCheckpoint: it feeds both the min-graph
    edges (consumed inside the eager CC) and the final member mapping
    (consumed lazily by the caller), and the checkpoint both avoids the
    double scan+shuffle and lets the keys persist be released before
    returning."""
    from posextract_spark.operators.canonicalize import connected_components_star

    keys = _band_keys(df, text_col, id_col, n_seeds, band_size).persist()
    try:
        mins = keys.groupBy("band", "band_key").agg(F.min(id_col).alias("_min"))
        per_member = (
            keys.join(mins, ["band", "band_key"])
            .groupBy(id_col)
            .agg(
                F.min("_min").alias("_m0"),
                F.collect_set("_min").alias("_ms"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        keys.unpersist()
    min_edges = (
        per_member.select(F.explode("_ms").alias("src"), F.col("_m0").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    comps = connected_components_star(min_edges)
    member_comp = (
        per_member.join(
            comps.withColumnRenamed("node", "_m0"), "_m0", "left"
        ).select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col("_m0")).alias("component"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(member_comp, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "is_survivor", (F.col(id_col) == F.col("cluster_id")).cast("int")
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """16-bit SimHash over the word multiset: bit j is set iff
    sum over word instances of (+1 if bit j of hash(word) else -1) > 0.

    Fully scan-side, no shuffle. The per-word hash array is materialized
    ONCE behind a Generate boundary (functions/boundary.py) and each bit's
    popcount filter scans the materialized BIGINT array — the r3
    formulation pasted an independent split+md5-per-word copy into every
    bit term (32 md5 occurrences in the plan; VERDICT r3 item 2).

    MEASURED NEGATIVE RESULT (r5, VERDICT r4 item 2 proposed collapsing
    the 16 filter scans into one counting ``aggregate`` with a 16-field
    struct accumulator, predicting ~2s -> <1s at 200k docs): interleaved
    same-session A/B at 50k x 16-bit on local[32], three formulations —
    16 filter scans min 1.19s / med 1.52s; single aggregate with 16-field
    struct accumulator min 1.77s / med 7-20s (!); 4x4 bit-packed BIGINT
    accumulator min 1.55s / med 2.1-2.8s. The struct formulation
    allocates a fresh 16-field struct PER ARRAY ELEMENT in the
    interpreted evaluator, which both costs more at quiet-box minimum and
    amplifies contention spikes far beyond the tight per-bit scans (the
    _lang_pred analogy does not transfer: 4 counters there, and its
    alternative re-ran split(text) per language, not a cheap re-scan of a
    materialized BIGINT array). Keeping the filter-scan formulation is
    the measured choice; all three agreed bit-exactly on sum(simhash)."""
    from posextract_spark.functions.boundary import materialize

    g = materialize(
        df.select(F.col(id_col), F.col(text_col)),
        __wh=F.transform(word_array(F.col(text_col)), lambda w: portable_hash64(w)),
    )
    hashes = F.col("__wh")
    n = F.size(hashes)
    fp = None
    for j in range(bits):
        set_j = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1)
        )
        term = F.when((set_j * 2 - n) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    # wordless docs emit nothing (parity with the word-explode formulation)
    return g.filter(n > 0).select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def ngram_jaccard_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_bucket: int | None = None,
) -> DataFrame:
    """Exact shared-shingle statistics per document: how many other docs
    share at least one 5-gram shingle, and the max shared-shingle count.
    (The exact-Jaccard small-scale baseline; minhash_band_pairs is the
    scale path.)

    ``max_shingle_bucket`` bounds the quadratic hot-shingle blowup (a
    boilerplate shingle shared by 10^6 docs makes the self-join a
    cartesian) via a DETERMINISTIC HASH THRESHOLD, not ranking (r5,
    VERDICT r4 item 1): a ``row_number`` window would force the whole hot
    bucket onto one task and sort it. Instead bucket widths come from a
    map-side-partial ``groupBy(shingle).count`` joined back, and a row in
    a bucket of width n > cap survives iff
    ``pmod(hash64(doc_id), n) < cap`` — each doc kept with probability
    cap/n, so the expected surviving width is exactly ``cap`` (binomial
    concentration around it; width stays O(cap) whp). Buckets at or under
    the cap are untouched (exact). The sample is deterministic in the
    DATA (hash of doc_id), so a cluster-side stage retry reproduces it —
    no SPARK-23207-class recompute hazard. Under a cap, surviving docs
    report a deterministic LOWER BOUND of their true counts, and a doc
    sampled out of ALL its buckets emits NO ROW at all — callers joining
    the stats back to the corpus must treat missing rows as "not
    measured", never as "no candidates". None (default, used by the
    oracle-checked contract query) is exact.

    Cost note (r5 review): computing bucket widths consumes the shingle
    frame a second time (2 FileScans + 2 shingle Generates when capped).
    Deliberate: one extra linear pass buys out of the quadratic
    hot-shingle join; persist the input to amortize."""
    from posextract_spark.functions.boundary import materialize

    g = materialize(
        df.select(F.col(id_col), F.col(text_col)),
        __words=word_array(F.col(text_col)),
    )
    sh = g.select(F.col(id_col), F.explode(_shingles(F.col("__words"))).alias("shingle"))
    if max_shingle_bucket is not None:
        from posextract_spark.functions.capping import cap_bucket_width

        sh = cap_bucket_width(sh, ["shingle"], id_col, max_shingle_bucket)
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
FROM documents
GROUP BY 1, (('0x' || substring(md5(text), 17, 15))::BIGINT)
"""

_A_LIST = "[" + ", ".join(str(a) for a in MINHASH_A) + "]"
_B_LIST = "[" + ", ".join(str(b) for b in MINHASH_B) + "]"

MINHASH_SIGNATURES_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_H.format(x='shingle')} AS h
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents)
),
seeds AS (SELECT CAST(unnest(generate_series(0, {MINHASH_SEEDS - 1})) AS INTEGER) AS seed),
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

# shared scan->shingle->minhash->band-key CTE chain (keys per doc/band);
# consumed by the pair listing, the survivors closure, the incremental
# against-base mirror, and (relation-parameterized) the end-to-end
# training-corpus pipeline oracle


def band_keys_ctes(rel: str = "documents") -> str:
    return f"""sh AS (
  SELECT doc_id, {_H.format(x='shingle')} AS h
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM {rel})
),
seeds AS (SELECT CAST(unnest(generate_series(0, {MINHASH_SEEDS - 1})) AS INTEGER) AS seed),
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
)"""


def band_pairs_ctes(rel: str = "documents") -> str:
    return band_keys_ctes(rel) + """,
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
  FROM keys a JOIN keys b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)"""


_BAND_KEYS_CTES = band_keys_ctes()
_BAND_PAIRS_CTES = band_pairs_ctes()

MINHASH_BAND_PAIRS_SQL = (
    "WITH " + _BAND_PAIRS_CTES + "\nSELECT id_a, id_b, n_bands FROM pairs"
)

# Incremental against-base mirror: base = even doc_ids, new = odd (the
# deterministic split used by the contract query). LEFT JOIN against the
# per-bucket base summary, count(b.band) counts matches only.
MINHASH_DEDUP_AGAINST_BASE_SQL = (
    "WITH " + _BAND_KEYS_CTES + """,
base AS (
  SELECT band, band_key, min(doc_id) AS bmin
  FROM keys WHERE doc_id % 2 = 0 GROUP BY band, band_key
),
hits AS (
  SELECT n.doc_id, count(b.band) AS n_hit_bands, min(b.bmin) AS mb
  FROM (SELECT * FROM keys WHERE doc_id % 2 = 1) n
  LEFT JOIN base b ON n.band = b.band AND n.band_key = b.band_key
  GROUP BY n.doc_id
)
SELECT doc_id,
       CAST(n_hit_bands AS INT) AS n_hit_bands,
       CAST(coalesce(mb, -1) AS BIGINT) AS matched_base_id,
       CAST(n_hit_bands = 0 AS INT) AS is_new
FROM hits
"""
)


# Survivor selection: transitive closure of the candidate-pair graph as a
# recursive CTE (exact fixpoint, algorithm-independent — mirrors whatever
# CC implementation the Spark side uses), cluster id = min reachable doc.


def minhash_dedup_survivors_ctes(rel: str = "documents") -> str:
    """CTE suffix (caller must open with WITH RECURSIVE): band pairs over
    ``rel`` -> closure -> ``surv`` (doc_id, cluster_id, is_survivor)."""
    return band_pairs_ctes(rel) + f""",
und AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a AND r.a <> u.b
),
comp AS (SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
surv AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS cluster_id,
         CAST(CASE WHEN COALESCE(c.comp, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS INT) AS is_survivor
  FROM {rel} d LEFT JOIN comp c ON d.doc_id = c.node
)"""


MINHASH_DEDUP_SURVIVORS_SQL = (
    "WITH RECURSIVE "
    + minhash_dedup_survivors_ctes()
    + "\nSELECT doc_id, cluster_id, is_survivor FROM surv"
)


# --- cross-document duplicate spans ------------------------------------------
#
# Exact substring-level dedup signal (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — suffix-array exact-substring
# dedup, here reformulated as hash-anchored rolling windows so it runs as
# two scans + one shuffle instead of a distributed suffix array):
# boilerplate/licence blocks repeated across crawl pages inflate memorization
# even when whole-document hashes differ. Every W-token window is hashed;
# windows whose hash is ≡ 0 (mod sample) are KEPT — selection is
# CONTENT-DEFINED (winnowing-style), so a given span is selected in either
# every document that contains it or none: cross-document alignment can
# never hide a duplicate (a fixed-stride sampler can — two docs sharing a
# run at different parities sample disjoint offsets; caught by
# tests/test_dup_spans.py::test_alignment_independence). A kept hash seen
# in >= 2 DISTINCT documents marks a duplicated span.
#
# Cost shape: hashing is O(tokens) per doc either way (scan-side, cheap);
# ``sample`` divides the SHUFFLE+join volume by S — the term that actually
# binds at 10^12 docs. Detection of a duplicated run of length L >= W is
# probabilistic in S: miss chance (1-1/S)^(L-W+1), e.g. S=4, L=2W=8 tokens
# -> ~24%; boilerplate blocks (50+ tokens) are caught w.p. ~1.


def dup_span_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    sample: int = 2,
) -> DataFrame:
    """(id, pos, h) — one row per KEPT window position; h = md5 of the
    space-joined W-token span (full 128 bits kept: at the 10^12-doc design
    point window counts reach ~10^13, where a 60-bit key would already
    collide; 128-bit keeps false merges < 1e-12). sample=1 keeps every
    window (exact mode).

    Shape: pure scan-side — split once (materialize boundary), every span
    sliced+hashed exactly once inside one array transform, the content-
    defined keep-filter applied array-side, then ONE Generate explodes only
    the kept windows. Documents shorter than ``window`` tokens emit no
    rows (they cannot contain a duplicated span).
    """
    from posextract_spark.functions.boundary import materialize

    if window < 1 or sample < 1:
        raise ValueError("window and sample must be >= 1")
    mat = materialize(
        df.select(F.col(id_col), F.col(text_col)), __dsw=word_array(F.col(text_col))
    )
    words = F.col("__dsw")
    n = F.size(words)
    # guard: F.sequence(1, 0) DESCENDS (step defaults negative when
    # start > stop) — empty array when the doc is too short
    positions = F.when(
        n >= F.lit(window),
        F.sequence(F.lit(1), n - F.lit(window) + 1),
    ).otherwise(F.array().cast("array<int>"))
    win = F.transform(
        positions,
        lambda p: F.struct(
            p.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(words, p, window))).alias("h"),
        ),
    )
    if sample > 1:
        win = F.filter(
            win,
            lambda w: F.conv(F.substring(w["h"], 1, 15), 16, 10).cast("bigint")
            % F.lit(sample)
            == 0,
        )
    return mat.select(F.col(id_col), F.explode(win).alias("_w")).select(
        id_col, F.col("_w.pos").cast("int").alias("pos"), F.col("_w.h").alias("h")
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    sample: int = 2,
) -> DataFrame:
    """Per-document duplicated-span profile: (id, n_windows, n_dup_windows,
    dup_ratio_e6) over the content-defined window sample; a window is
    duplicated iff its span hash occurs in >= 2 distinct documents; ratio
    is integer fixed-point (engine-exact). Because selection is content-
    defined, dup_ratio over the sample is an unbiased estimate of the true
    duplicated-window ratio. Docs with no kept window are absent.

    Scale shape: windows frame persisted across its two consumers (the
    duplicate-hash aggregate and the join-back); ONE map-side-combinable
    shuffle on h for the aggregate — a boilerplate span shared by 10^7
    pages is a single counter, never a pair listing — then one shuffle
    join back on h (AQE broadcasts the duplicate set when it is small,
    skew-splits when a hash is hot) and one groupBy on the doc id.
    Compose with a threshold filter for the C4-style 'drop docs that are
    mostly boilerplate' policy (tests/test_dup_spans.py).
    """
    wins = dup_span_windows(df, text_col, id_col, window, sample).persist()
    try:
        dup_hashes = (
            wins.groupBy("h")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .filter(F.col("_nd") >= 2)
            .select("h", F.lit(1).alias("_dup"))
        )
        out = (
            wins.join(dup_hashes, "h", "left")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.count("_dup").alias("n_dup_windows"),
            )
            .select(
                id_col,
                "n_windows",
                "n_dup_windows",
                F.expr("(1000000 * n_dup_windows) div n_windows").alias("dup_ratio_e6"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        wins.unpersist()


def dup_span_stats_sql(window: int = 4, sample: int = 2) -> str:
    """DuckDB mirror of dup_span_stats over the ``documents`` view.
    ws[p : p+W-1] is 1-based INCLUSIVE slicing == Spark slice(ws, p, W);
    the anchor filter mirrors conv(substring(md5,1,15),16,10) % sample."""
    keep = (
        f"AND ('0x' || substring(md5(array_to_string(ws[p : p + {window - 1}], ' ')), 1, 15))::BIGINT % {sample} = 0"
        if sample > 1
        else ""
    )
    return f"""
WITH _dsw AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents),
_wins AS (
  SELECT doc_id, CAST(p AS INTEGER) AS pos,
         md5(array_to_string(ws[p : p + {window - 1}], ' ')) AS h
  FROM _dsw, unnest(generate_series(1, len(ws) - {window} + 1)) AS t(p)
  WHERE len(ws) >= {window} {keep}
),
_dups AS (
  SELECT h FROM _wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(d.h) AS BIGINT) AS n_dup_windows,
       CAST((1000000 * count(d.h)) // count(*) AS BIGINT) AS dup_ratio_e6
FROM _wins w LEFT JOIN _dups d ON w.h = d.h
GROUP BY w.doc_id"""


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    sample: int = 1,
) -> DataFrame:
    """(id, clean_text, n_tokens, n_removed) — exact-substring dedup that
    EDITS the corpus (Lee et al. 2022's remedy, not just dup_span_stats'
    report): every token covered by a window whose span hash occurs in
    >= 2 distinct documents is removed, and the document is rebuilt from
    the survivors. Default ``sample=1`` considers EVERY window (removal
    must not miss spans); a sampled run (sample > 1) removes only
    anchor-selected spans and is documented as partial.

    Scale shape: the window frame is built once (scan-side) and persisted
    across its two consumers; duplicated hashes are ONE counter each
    (map-side-combinable groupBy, never a pair listing); duplicate
    START POSITIONS come back per doc as one sorted array (bounded by the
    doc's own window count — document-sized, the same bound as the text
    itself), and the rebuild is a single scan-side indexed filter over
    the materialized word array: keep token i unless some duplicate
    start p covers it (p <= i+1 < p+window).
    """
    from posextract_spark.functions.boundary import materialize

    wins = dup_span_windows(df, text_col, id_col, window, sample).persist()
    try:
        dup_hashes = (
            wins.groupBy("h")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .filter(F.col("_nd") >= 2)
            .select("h")
        )
        starts = (
            wins.join(dup_hashes, "h")
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("pos")).alias("_starts"))
        )
        g = materialize(
            df.select(id_col, text_col), __sds_ws=word_array(F.col(text_col))
        ).join(starts, id_col, "left")
        st = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
        kept = F.filter(
            F.col("__sds_ws"),
            lambda w, i: ~F.exists(
                st, lambda p: (p <= i + 1) & (i + 1 < p + F.lit(window))
            ),
        )
        return g.select(
            id_col,
            F.concat_ws(" ", kept).alias("clean_text"),
            F.size(kept).cast("long").alias("n_tokens"),
            (F.size(F.col("__sds_ws")) - F.size(kept)).cast("long").alias("n_removed"),
        )
    finally:
        wins.unpersist()


def strip_duplicate_spans_sql(window: int = 4, sample: int = 1) -> str:
    """DuckDB mirror of strip_duplicate_spans over ``documents`` (indexed
    rebuild via generate_series + NULL-filter — portable, no indexed
    lambda)."""
    keep = (
        f"AND ('0x' || substring(md5(array_to_string(ws[p : p + {window - 1}], ' ')), 1, 15))::BIGINT % {sample} = 0"
        if sample > 1
        else ""
    )
    return f"""
WITH _sdw AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents),
_swins AS (
  SELECT doc_id, CAST(p AS INTEGER) AS pos,
         md5(array_to_string(ws[p : p + {window - 1}], ' ')) AS h
  FROM _sdw, unnest(generate_series(1, len(ws) - {window} + 1)) AS t(p)
  WHERE len(ws) >= {window} {keep}
),
_sdups AS (SELECT h FROM _swins GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
_sstarts AS (
  SELECT w.doc_id, list_sort(list(w.pos)) AS starts
  FROM _swins w JOIN _sdups d ON w.h = d.h GROUP BY w.doc_id),
_skept AS (
  SELECT s.doc_id,
         list_filter(
           list_transform(generate_series(1, len(s.ws)),
             i -> CASE WHEN len(list_filter(coalesce(t.starts, []),
                                p -> p <= i AND i < p + {window})) > 0
                  THEN NULL ELSE s.ws[i] END),
           x -> x IS NOT NULL) AS kept,
         len(s.ws) AS n_all
  FROM _sdw s LEFT JOIN _sstarts t ON t.doc_id = s.doc_id)
SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
       CAST(len(kept) AS BIGINT) AS n_tokens,
       CAST(n_all - len(kept) AS BIGINT) AS n_removed
FROM _skept"""


def minhash_dedup_best_survivors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
) -> DataFrame:
    """Quality-aware survivor selection: same near-dup clusters as
    minhash_dedup_survivors, but each cluster keeps its LONGEST member
    (token count, ties by min id) instead of the smallest id — "keep the
    most complete copy", the rule curation pipelines actually want when
    near-dups are truncated/paginated variants of one page. Output:
    (doc_id, cluster_id, n_tokens, is_best 0/1).

    Shape: the dedup path is unchanged (star edges, leaf-contracted CC);
    on top, one column-pruned length scan joins cluster rows by id (both
    sides doc-keyed — AQE-splittable equi-join) and the winner per
    cluster is the shared map-side-combinable argmax aggregate
    (functions/selection.argmax_min_tie — no ranking Window, hot
    boilerplate clusters never serialize onto one task), broadcast back
    against the cluster rows (cluster count <= doc count; at production
    scale swap the join-back broadcast for a plain shuffle join if the
    cluster table outgrows it).
    """
    from posextract_spark.functions.selection import argmax_min_tie

    clusters = minhash_dedup_survivors(
        df, text_col=text_col, id_col=id_col, n_seeds=n_seeds, band_size=band_size
    ).select(id_col, "cluster_id")
    lens = df.select(
        F.col(id_col), F.size(word_array(F.col(text_col))).cast("long").alias("n_tokens")
    )
    rows = clusters.join(lens, id_col)
    best = rows.groupBy("cluster_id").agg(
        argmax_min_tie(F.col("n_tokens"), F.col(id_col)).alias("m")
    ).select("cluster_id", F.col("m.v").alias("_best_id"))
    return rows.join(F.broadcast(best), "cluster_id").select(
        id_col,
        "cluster_id",
        "n_tokens",
        (F.col(id_col) == F.col("_best_id")).cast("int").alias("is_best"),
    )


def minhash_dedup_best_survivors_sql(rel: str = "documents") -> str:
    """Oracle: the survivors closure CTEs (recursive opener required) +
    length ranking with the same (n_tokens DESC, id ASC) rule."""
    return (
        "WITH RECURSIVE "
        + minhash_dedup_survivors_ctes(rel)
        + f""",
_bl AS (SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens
        FROM {rel}),
_bj AS (SELECT s.doc_id, s.cluster_id, l.n_tokens
        FROM surv s JOIN _bl l USING (doc_id)),
_bb AS (SELECT cluster_id, min(struct_pack(neg := -n_tokens, v := doc_id)) AS m
        FROM _bj GROUP BY cluster_id)
SELECT j.doc_id, j.cluster_id, j.n_tokens,
       CAST(j.doc_id = b.m.v AS INT) AS is_best
FROM _bj j JOIN _bb b USING (cluster_id)"""
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard_e6: int = 0,
    max_shingle_bucket: int | None = None,
) -> DataFrame:
    """EXACT pairwise 5-shingle Jaccard for every document pair sharing at
    least one shingle: (id_a, id_b, inter, size_a, size_b, jaccard_e6),
    id_a < id_b, jaccard_e6 = floor(|A∩B| * 1e6 / |A∪B|).

    This is the verification baseline the LSH family is measured against
    (minhash_pair_quality below, tools/dedup_quality.py): minhash banding
    APPROXIMATES exactly this quantity, and a user tuning bands/rows needs
    the true pair Jaccard to know what the bands caught and missed. It is
    also the post-LSH audit pass a production pipeline runs on a
    deterministic document sample.

    Shape: one materialized shingle array per doc (size + explode read the
    same Generate output), shingle-keyed self-join (a.id < b.id), then a
    map-side-combinable pair count; sizes ride the groupBy keys (they are
    functionally dependent on the ids) so there is no join-back. Quadratic
    on hot shingles BY DEFINITION (it lists pairs) — same contract as
    ngram_jaccard_stats: ``max_shingle_bucket`` hash-threshold-caps hot
    buckets deterministically (no ranking window, stage-retry
    reproducible), and at 100 TB you run this on a hash-sample of docs or
    behind the cap, never corpus-wide.
    """
    from posextract_spark.functions.boundary import materialize

    g = materialize(
        df.select(F.col(id_col), F.col(text_col)),
        __sh=_shingles(word_array(F.col(text_col))),
    )
    sh = g.select(
        F.col(id_col), F.size("__sh").alias("_sz"), F.explode("__sh").alias("shingle")
    )
    if max_shingle_bucket is not None:
        from posextract_spark.functions.capping import cap_bucket_width

        sh = cap_bucket_width(sh, ["shingle"], id_col, max_shingle_bucket)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._sz").alias("_sa"),
            F.col("b._sz").alias("_sb"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = inter.select(
        F.col("id_a"),
        F.col("id_b"),
        F.col("_inter").cast("long").alias("inter"),
        F.col("_sa").cast("long").alias("size_a"),
        F.col("_sb").cast("long").alias("size_b"),
        F.expr("_inter * 1000000 div (_sa + _sb - _inter)")
        .cast("long")
        .alias("jaccard_e6"),
    )
    if min_jaccard_e6 > 0:
        out = out.filter(F.col("jaccard_e6") >= F.lit(min_jaccard_e6))
    return out


def minhash_pair_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds_e6: tuple[int, ...] = (500000, 700000, 900000),
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
    max_shingle_bucket: int | None = None,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Retrieval-quality report for minhash LSH banding — the dedup-family
    analogue of the ANN recall harness (tools/recall.py): per Jaccard
    threshold t, how many TRULY similar pairs exist (exact shingle
    Jaccard >= t, ngram_jaccard_pairs) and how many of them the band join
    surfaced as candidates, plus band precision at t.

    One row per threshold:
      (thr_e6, n_true, n_caught, n_cand, recall_e6, precision_e6)
    recall_e6    = n_caught * 1e6 div n_true        (1e6 when n_true = 0)
    precision_e6 = n_caught * 1e6 div n_cand        (1e6 when n_cand = 0)
    n_cand is the TOTAL candidate-pair count (threshold-independent), so
    precision at t reads "fraction of surfaced pairs that are >= t-similar".

    Shape: truth LEFT JOIN candidates on the pair key (candidate pairs
    with no shared shingle have J = 0 and can never reach a threshold, so
    the inner-ish join loses nothing; their count enters via n_cand), one
    conditional aggregation to a single row, a 1-row broadcast crossJoin
    for n_cand, then ``stack`` unpivots to one row per threshold —
    drivers never see pair-level data. At 100 TB this runs on a
    deterministic hash-sample of documents (recall estimation needs a
    sample of TRUE pairs, not all of them) and/or behind the two caps,
    which are forwarded verbatim.
    """
    truth = ngram_jaccard_pairs(
        df, text_col=text_col, id_col=id_col, max_shingle_bucket=max_shingle_bucket
    )
    cand = minhash_band_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        n_seeds=n_seeds,
        band_size=band_size,
        max_bucket_width=max_bucket_width,
    )
    tj = truth.join(
        cand.select("id_a", "id_b", F.lit(1).alias("_c")), ["id_a", "id_b"], "left"
    )
    aggs = []
    for i, t in enumerate(thresholds_e6):
        hit = (F.col("jaccard_e6") >= F.lit(t)).cast("long")
        aggs.append(F.coalesce(F.sum(hit), F.lit(0)).alias(f"_nt{i}"))
        aggs.append(
            F.coalesce(F.sum(hit * F.coalesce(F.col("_c"), F.lit(0))), F.lit(0)).alias(
                f"_nc{i}"
            )
        )
    wide = tj.agg(*aggs).crossJoin(
        F.broadcast(cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand")))
    )
    stack_args = ", ".join(
        f"{int(t)}, _nt{i}, _nc{i}" for i, t in enumerate(thresholds_e6)
    )
    rows = wide.select(
        F.expr(
            f"stack({len(thresholds_e6)}, {stack_args}) AS (thr_e6, n_true, n_caught)"
        ),
        "n_cand",
    )
    return rows.select(
        F.col("thr_e6").cast("int").alias("thr_e6"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_caught").cast("long").alias("n_caught"),
        F.col("n_cand").cast("long").alias("n_cand"),
        F.expr(
            "CASE WHEN n_true = 0 THEN 1000000 ELSE n_caught * 1000000 div n_true END"
        )
        .cast("long")
        .alias("recall_e6"),
        F.expr(
            "CASE WHEN n_cand = 0 THEN 1000000 ELSE n_caught * 1000000 div n_cand END"
        )
        .cast("long")
        .alias("precision_e6"),
    )


def ngram_jaccard_pairs_ctes(rel: str = "documents") -> str:
    """CTE fragment ending in ``truth`` (id_a, id_b, inter, size_a,
    size_b, jaccard_e6) — the exact-pair mirror of ngram_jaccard_pairs."""
    return f"""_jp_sh AS (
  SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle
  FROM (SELECT doc_id, {_SHINGLES} AS sh FROM {rel})
),
truth AS (
  SELECT id_a, id_b, inter, size_a, size_b,
         (inter * 1000000) // (size_a + size_b - inter) AS jaccard_e6
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
           CAST(a.sz AS BIGINT) AS size_a, CAST(b.sz AS BIGINT) AS size_b
    FROM _jp_sh a JOIN _jp_sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
  )
)"""


NGRAM_JACCARD_PAIRS_SQL = (
    "WITH "
    + ngram_jaccard_pairs_ctes()
    + """
SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter, size_a, size_b,
       CAST(jaccard_e6 AS BIGINT) AS jaccard_e6
FROM truth"""
)


def minhash_pair_quality_sql(
    thresholds_e6: tuple[int, ...] = (500000, 700000, 900000),
    rel: str = "documents",
) -> str:
    """Oracle: exact truth CTEs + the shared band-pair CTEs (band_size=2,
    matching the Spark default) + per-threshold conditional aggregation,
    unpivoted via UNION ALL."""
    per_thr = []
    for t in thresholds_e6:
        per_thr.append(
            f"""SELECT {int(t)} AS thr_e6,
       (SELECT coalesce(sum((jaccard_e6 >= {int(t)})::BIGINT), 0) FROM truth) AS n_true,
       (SELECT coalesce(sum((t.jaccard_e6 >= {int(t)})::BIGINT), 0)
          FROM truth t JOIN pairs p ON t.id_a = p.id_a AND t.id_b = p.id_b) AS n_caught,
       (SELECT count(*) FROM pairs) AS n_cand"""
        )
    body = "\nUNION ALL\n".join(per_thr)
    return (
        "WITH "
        + ngram_jaccard_pairs_ctes(rel)
        + ",\n"
        + band_pairs_ctes(rel)
        + f""",
_pq_rows AS (
{body}
)
SELECT CAST(thr_e6 AS INTEGER) AS thr_e6,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_caught AS BIGINT) AS n_caught,
       CAST(n_cand AS BIGINT) AS n_cand,
       CAST(CASE WHEN n_true = 0 THEN 1000000 ELSE (n_caught * 1000000) // n_true END AS BIGINT) AS recall_e6,
       CAST(CASE WHEN n_cand = 0 THEN 1000000 ELSE (n_caught * 1000000) // n_cand END AS BIGINT) AS precision_e6
FROM _pq_rows"""
    )


def neardup_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_seeds: int = MINHASH_SEEDS,
    band_size: int = 2,
    min_bands: int = 1,
) -> DataFrame:
    """NEAR-duplicate eval decontamination (the FineWeb/Llama recipe's
    fuzzy arm): train docs whose minhash-LSH band keys collide with the
    EVAL set in >= ``min_bands`` bands — catches lightly-paraphrased /
    whitespace-perturbed eval leaks that exact-shingle decontaminate()
    misses, with ``min_bands`` steepening the implied Jaccard threshold
    (the same S-curve calibration as DEDUP_QUALITY.md).

    Output: (id, n_hit_bands, matched_eval_id) — one row per contaminated
    train doc; absence means clean; callers left-anti join to filter.

    Pure composition: minhash_dedup_against_base with eval as the base
    corpus, so it inherits the scale contract verbatim — the eval side is
    pre-aggregated to one summary row per band bucket before the join
    (never quadratic in bucket width), one shuffle per side on
    (band, band_key), one per-doc aggregate. Short docs (< SHINGLE_N
    words) emit no bands and are never flagged, matching
    contaminated_token_fraction's unmeasurable-doc policy."""
    hits = minhash_dedup_against_base(
        train_df, eval_df, text_col=text_col, id_col=id_col,
        n_seeds=n_seeds, band_size=band_size,
    )
    return hits.filter(F.col("n_hit_bands") >= F.lit(min_bands)).select(
        F.col(id_col),
        F.col("n_hit_bands"),
        F.col("matched_base_id").alias("matched_eval_id"),
    )


def neardup_contamination_sql(
    rel: str = "documents", eval_mod: int = 29, min_bands: int = 1
) -> str:
    """Mirror of neardup_contamination with the contract's deterministic
    split: eval = doc_id % eval_mod = 0, train = the rest (disjoint, so
    no doc trivially matches itself)."""
    return (
        "WITH " + band_keys_ctes(rel) + f""",
base AS (
  SELECT band, band_key, min(doc_id) AS bmin
  FROM keys WHERE doc_id % {eval_mod} = 0 GROUP BY band, band_key
),
hits AS (
  SELECT n.doc_id, count(b.band) AS n_hit_bands, min(b.bmin) AS mb
  FROM (SELECT * FROM keys WHERE doc_id % {eval_mod} <> 0) n
  LEFT JOIN base b ON n.band = b.band AND n.band_key = b.band_key
  GROUP BY n.doc_id
)
SELECT doc_id, CAST(n_hit_bands AS INT) AS n_hit_bands,
       CAST(mb AS BIGINT) AS matched_eval_id
FROM hits WHERE n_hit_bands >= {min_bands}
"""
    )


# --- winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm) ------

WINNOW_WINDOW = 4


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = WINNOW_WINDOW,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every word 5-gram, slide a ``window``-wide window
    over the hash sequence, keep each window's MINIMUM hash; the distinct
    selected hashes are the document's fingerprint set. Guarantee: two
    documents sharing any run of >= window + SHINGLE_N - 1 consecutive
    words share at least one fingerprint — local, position-robust copy
    detection with a ~2/(window+1) expected selection density, the
    classic alternative to minhash when the question is "do these share a
    SUBSTRING" rather than "are these globally similar".

    Output: (id, fingerprint) distinct rows. Join on fingerprint for
    candidate copy pairs (bucket-cap exactly like band keys if a
    boilerplate fingerprint goes hot).

    Scale shape: pure scan-side — the POSITIONAL (non-distinct, unlike
    _with_base_hashes') gram-hash array materializes once behind its own
    Generate boundary, the window mins are an O(window) slice-min per
    position over that attribute, and the only exchange is the final
    distinct's hash partial. Docs with fewer than window + SHINGLE_N - 1
    words emit no rows (short docs filtered BEFORE sequence(): Spark's
    sequence(1, 0) DESCENDS)."""
    from posextract_spark.functions.boundary import materialize

    g0 = materialize(
        df.select(F.col(id_col), F.col(text_col)),
        __ww=word_array(F.col(text_col)),
    )
    g1 = materialize(
        g0.filter(F.size(F.col("__ww")) >= SHINGLE_N),
        __whs=F.transform(
            ngram_array(F.col("__ww"), SHINGLE_N), lambda s: portable_hash64(s)
        ),
    )
    m = F.size(F.col("__whs"))
    wmins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), m - F.lit(window - 1)),
            lambda i: F.array_min(F.slice(F.col("__whs"), i, window)),
        )
    )
    return (
        g1.filter(m >= window)
        .select(F.col(id_col), F.explode(wmins).alias("fingerprint"))
        .distinct()
    )


def winnow_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = WINNOW_WINDOW,
) -> DataFrame:
    """Per-doc digest of the fingerprint set — (id, n_fingerprints,
    fp_xor, fp_min, fp_max): count + order-free bit_xor + extrema pin the
    full set for the value-hash gate without shipping every row; one
    combinable aggregate over winnow_fingerprints."""
    fp = winnow_fingerprints(df, text_col, id_col, window)
    return fp.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.expr("bit_xor(fingerprint)").cast("bigint").alias("fp_xor"),
        F.min("fingerprint").cast("bigint").alias("fp_min"),
        F.max("fingerprint").cast("bigint").alias("fp_max"),
    )


def winnow_stats_sql(rel: str = "documents", window: int = WINNOW_WINDOW) -> str:
    """DuckDB mirror of winnow_stats: same md5 gram hashes (the dedup
    _H chain, NON-distinct grams in position order), same slice-min
    windows, same digest aggregate."""
    grams = (
        "CASE WHEN len(ws) >= 5 THEN "
        "list_transform(generate_series(1, len(ws) - 4), "
        "i -> array_to_string(ws[i:i+4], ' ')) "
        "ELSE [] END"
    )
    return f"""
WITH wwords AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM {rel}
),
whs AS (
  SELECT doc_id,
         list_transform({grams}, g -> {_H.format(x='g')}) AS hs
  FROM wwords
),
wfp AS (
  SELECT DISTINCT doc_id, unnest(
    list_distinct(
      list_transform(generate_series(1, len(hs) - {window - 1}),
                     i -> list_aggregate(hs[i:i+{window - 1}], 'min'))
    )) AS fingerprint
  FROM whs WHERE len(hs) >= {window}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(bit_xor(fingerprint) AS BIGINT) AS fp_xor,
       CAST(min(fingerprint) AS BIGINT) AS fp_min,
       CAST(max(fingerprint) AS BIGINT) AS fp_max
FROM wfp GROUP BY doc_id
"""


def lsh_params_for(
    threshold_e6: int, n_seeds: int = MINHASH_SEEDS
) -> tuple[int, int]:
    """(band_size, n_bands) whose LSH S-curve midpoint best matches a
    target Jaccard ``threshold_e6``: the curve P(candidate) =
    1 - (1 - s^r)^b crosses 1/2 near s* = (1/b)^(1/r); pick the divisor
    band_size r of n_seeds minimizing |s* - threshold| (the closed-form
    companion to DEDUP_QUALITY.md's measured S-curves). Steeper r =
    higher threshold: with 8 seeds, r=1 targets ~0.06 (catch
    everything), r=2 ~0.5, r=4 ~0.84, r=8 ~0.92."""
    if not (0 < threshold_e6 < 1_000_000):
        raise ValueError(f"threshold_e6 out of (0, 1e6): {threshold_e6}")
    t = threshold_e6 / 1e6
    best = None
    for r in range(1, n_seeds + 1):
        if n_seeds % r:
            continue
        b = n_seeds // r
        s_star = (1.0 / b) ** (1.0 / r) if b > 1 else 0.5 ** (1.0 / r)
        d = abs(s_star - t)
        if best is None or d < best[0]:
            best = (d, r, b)
    return best[1], best[2]
