"""Eval-pipeline operators (reference: eval/generate-datasets/select_sentences.py).

P5 validate_data, P6 syntax_check, P7 sentence_check/tag_sentence, P8
stratified selection (SURVEY.md §2.2). Native Columns; the POS-dependent
classifiers evaluate over the deterministic SVO lexicon so the DuckDB
mirrors are exact.

Quirks preserved:
- validate_data uses pandas str.match (start-anchored) semantics
  (select_sentences.py:10-15): drop rows equal to 'hon.' and rows not
  starting with an uppercase letter; num_words from whitespace split;
- syntax_check's ``or 'PRON'`` is vacuously truthy (select_sentences.py:19),
  so validity reduces to >=2 NOUN tokens — and the function returns None
  (never 'invalid') otherwise;
- tag_sentence order: interrogative (regex + 2nd token NOUN) -> comp
  (contains ',') -> leftward (1st token not NOUN/PRON/PROPN and not 'The',
  2nd token VERB/ADJ) -> null (select_sentences.py:31-45);
- the reference's df.sample selection is random; ``stratified_take`` is the
  deterministic counterpart (first n per tag by id) so distributed runs are
  reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.hashing import word_array

_SVO_DET = ("the", "a", "an")
_SVO_ADJ = ("fast", "slow", "small", "big")
_SVO_VERB = (
    "scan", "merge", "join", "sort", "filter", "group", "order", "hash", "batch", "stream", "query",
)


def _svo_pos(word):
    return (
        F.when(word.isin(*_SVO_DET), F.lit("DET"))
        .when(word.isin(*_SVO_ADJ), F.lit("ADJ"))
        .when(word.isin(*_SVO_VERB), F.lit("VERB"))
        .otherwise(F.lit("NOUN"))
    )


def validate_data(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P5 (select_sentences.py:10-15)."""
    c = F.col(text_col)
    return (
        df.filter(~c.rlike(r"^hon\.$"))
        .filter(c.rlike(r"^[A-Z]"))
        .withColumn("num_words", F.size(word_array(c)))
    )


def syntax_check(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P6 (select_sentences.py:17-23) over the SVO lexicon: 'valid' iff the
    POS sequence contains >= 2 NOUNs; null otherwise (the reference's
    'invalid' branch is unreachable — `or 'PRON'` is vacuously truthy)."""
    words = word_array(F.col(text_col))
    n_nouns = F.size(F.filter(words, lambda w: _svo_pos(w) == "NOUN"))
    return df.withColumn("syntax_check", F.when(n_nouns >= 2, F.lit("valid")))


def tag_sentence(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P7 (select_sentences.py:31-45). The word array is split once behind
    a Generate boundary: the _svo_pos CASEs reference w0/w1 repeatedly and
    every reference pasted its own split(text) copy (11x in the r4 plan
    audit)."""
    from posextract_spark.functions.boundary import materialize

    c = F.col(text_col)
    df = materialize(df, __ts_words=word_array(c))
    words = F.col("__ts_words")
    w0 = F.element_at(words, 1)
    w1 = F.element_at(words, 2)
    p0, p1 = _svo_pos(w0), _svo_pos(w1)
    interrogative = c.rlike(r"(?i)^(Which|What|Why|Where|When) (.*)\?$") & (p1 == "NOUN")
    comp = F.instr(c, ",") > 0
    leftward = (
        (~p0.isin("NOUN", "PRON", "PROPN")) & (w0 != "The") & p1.isin("VERB", "ADJ")
    )
    tag = (
        F.when(F.size(words) < 2, F.lit(None).cast("string"))
        .when(interrogative, F.lit("interrogative_sent"))
        .when(comp, F.lit("comp_sent"))
        .when(leftward, F.lit("leftward_sent"))
    )
    return df.withColumn("tag", tag).drop("__ts_words")


def stratified_take(
    df: DataFrame, tag_col: str, id_col: str, n_per_tag: int = 10, n_salts: int = 32
) -> DataFrame:
    """P8, deterministic: first n rows per tag ordered by id (the reference
    samples randomly, select_sentences.py:69,74 — irreproducible across
    cluster sizes; this variant is run-invariant).

    Two-phase salted top-n (r5): a single ``Window.partitionBy(tag)``
    puts an ENTIRE tag — 1/4 of the corpus with this tagger's 4 tags —
    onto one task (the same single-task hot-partition hazard removed
    from the dedup/similarity caps). Phase 1 ranks within
    (tag, hash(id) % n_salts) — each task sees ~1/n_salts of a tag — and
    keeps its local first-n: the union of per-bucket first-n is a
    SUPERSET of the global first-n (every global top row is top-n inside
    its own bucket). Phase 2 re-ranks the <= n_salts * n survivors per
    tag — trivially small by construction. Exact same output; salt is
    deterministic in the data (retry-safe)."""
    from pyspark.sql import Window

    filtered = df.filter(F.col(tag_col).isNotNull())
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    w1 = Window.partitionBy(tag_col, "_salt").orderBy(id_col)
    cand = (
        filtered.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= n_per_tag)
        .drop("_rn")
    )
    w2 = Window.partitionBy(tag_col).orderBy(id_col)
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n_per_tag)
        .drop("_rn", "_salt")
    )


def sample_n(df: DataFrame, n: int, seed: int = 0, id_col: str = "doc_id") -> DataFrame:
    """P8 parity with the reference's ``df.sample(n)``
    (select_sentences.py:69,74), made reproducible: rank rows by
    md5(seed:id) and take the first n — a seeded pseudo-random draw that is
    identical across engines AND cluster sizes (rand(seed) is
    partitioning-dependent, so a 4N-executor rerun would sample different
    rows — unacceptable for resumable pipelines).

    Plan shape: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-n, single driver merge of n*P candidates), not a
    global sort — safe at any scale for n << data."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return df.orderBy(key, F.col(id_col)).limit(n)


def sample_fraction(
    df: DataFrame, fraction: float, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Seeded Bernoulli sample by hash threshold: keep iff the 60-bit
    portable hash of (seed:id) < fraction * 2^60. A pure scan-side filter —
    no shuffle, no state — and the same rows fall in the sample at any
    parallelism (the property the reference's pandas df.sample lacks)."""
    from posextract_spark.functions.hashing import portable_hash64

    threshold = int(fraction * (1 << 60))
    key = portable_hash64(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    return df.filter(key < F.lit(threshold))


def random_sample(df: DataFrame, n: int | None = None, fraction: float | None = None,
                  seed: int = 0) -> DataFrame:
    """Thin reference-API wrapper (df.sample semantics). NOT run-reproducible
    across cluster sizes — use sample_n / sample_fraction in pipelines; this
    exists for drop-in parity with select_sentences.py:69,74."""
    if fraction is not None:
        return df.sample(fraction=fraction, seed=seed)
    if n is None:
        raise ValueError("random_sample: pass n or fraction")
    return df.orderBy(F.rand(seed)).limit(n)


# --- DuckDB mirrors ---------------------------------------------------------

_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"
_POS = (
    "CASE WHEN {w} IN ('the','a','an') THEN 'DET' "
    "WHEN {w} IN ('fast','slow','small','big') THEN 'ADJ' "
    "WHEN {w} IN ('scan','merge','join','sort','filter','group','order','hash','batch','stream','query') THEN 'VERB' "
    "ELSE 'NOUN' END"
)

def sample_n_sql(n: int, seed: int = 0) -> str:
    return (
        f"SELECT doc_id FROM documents "
        f"ORDER BY md5(concat('{seed}', ':', CAST(doc_id AS VARCHAR))), doc_id LIMIT {n}"
    )


def sample_fraction_sql(fraction: float, seed: int = 0) -> str:
    threshold = int(fraction * (1 << 60))
    h = f"(('0x' || substring(md5(concat('{seed}', ':', CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT)"
    return f"SELECT doc_id FROM documents WHERE {h} < {threshold}"


VALIDATE_DATA_SQL = f"""
WITH docs2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0
         THEN upper(substring(text, 1, 1)) || substring(text, 2)
         ELSE text END AS text
  FROM documents
)
SELECT doc_id, CAST(len({_WORDS}) AS INTEGER) AS num_words
FROM docs2
WHERE NOT regexp_matches(text, '^hon\\.$') AND regexp_matches(text, '^[A-Z]')
"""

SYNTAX_CHECK_SQL = f"""
SELECT doc_id,
  COALESCE(CASE WHEN len(list_filter({_WORDS}, w -> ({_POS.format(w='w')}) = 'NOUN')) >= 2
       THEN 'valid' END, '') AS syntax_check
FROM documents
"""

TAG_SENTENCE_SQL = f"""
SELECT doc_id,
  COALESCE(CASE
    WHEN len({_WORDS}) < 2 THEN NULL
    WHEN regexp_matches(text, '^(Which|What|Why|Where|When) (.*)\\?$', 'i')
         AND ({_POS.format(w=f"({_WORDS})[2]")}) = 'NOUN' THEN 'interrogative_sent'
    WHEN instr(text, ',') > 0 THEN 'comp_sent'
    WHEN ({_POS.format(w=f"({_WORDS})[1]")}) NOT IN ('NOUN','PRON','PROPN')
         AND ({_WORDS})[1] <> 'The'
         AND ({_POS.format(w=f"({_WORDS})[2]")}) IN ('VERB','ADJ') THEN 'leftward_sent'
  END, '') AS tag
FROM documents
"""
