"""Text-analysis operators for training-data pipelines.

All native Column expressions (whole-stage-codegen'd; no Python in the hot
path). Each has an exact DuckDB SQL mirror used by the driver's correctness
gate. Ratio outputs are truncated to integers-at-1e4 (floor) so value hashes
are robust to cross-engine float formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from posextract_spark.functions.boundary import materialize
from posextract_spark.functions.hashing import (
    WORD_ARRAY_SQL,
    ngram_array,
    portable_hash64,
    word_array,
)

# Tiny deterministic language marker sets (heuristic n-gram-free lang-id:
# marker-word voting). At 100 TB this would be a broadcast model; the
# operator shape (per-row pure expression) is the same.
LANG_MARKERS = {
    "en": ("the", "a", "an", "of", "and", "in", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "es": ("el", "los", "las", "es", "y", "en"),
}

STOPWORDS_EN = ("the", "a", "an", "of", "and", "in", "to", "is", "was", "it")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token counting (BPE-ish char/4 estimate included)."""
    words = word_array(F.col(text_col))
    return df.withColumn("n_tokens", F.size(words)).withColumn(
        "n_tokens_bpe_est", (F.length(F.col(text_col)) / F.lit(4)).cast("bigint")
    )


def _mean_word_len_e4(words, text_col: str) -> F.Column:
    """floor(chars-without-spaces / n_words * 1e4) as BIGINT — the shared
    mean-word-length signal (quality_score AND the corpus_quality_filter
    composite must agree on its definition, so it lives in one place).
    10000.0 (double): int*int overflows IntegerType and throws under ANSI
    mode once a document exceeds ~214k chars."""
    n_words = F.size(words)
    n_chars_nospace = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    return (
        F.when(n_words > 0, F.floor(n_chars_nospace * F.lit(10000.0) / n_words))
        .otherwise(F.lit(0))
        .cast("bigint")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword/mean-word-length quality metrics.

    mean_len_e4 / stop_ratio_e4 are floor(x * 1e4) BIGINTs. The word array
    is split ONCE behind a Generate boundary (functions/boundary.py) — the
    r3 plan pasted an independent split(text) into every signal.
    """
    g = materialize(df, __qs_words=word_array(F.col(text_col)))
    words = F.col("__qs_words")
    n_words = F.size(words)
    # isin -> InSet: the previous array_contains(literal-array, ...) form
    # re-materialized the 10-literal array PER WORD inside the interpreted
    # lambda evaluator (r8; same fix in _lang_pred, parity-checked at 200k
    # docs with zero diffs)
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS_EN)))
    return (
        g.withColumn("n_words", n_words)
        .withColumn("mean_word_len_e4", _mean_word_len_e4(words, text_col))
        .withColumn(
            "stopword_ratio_e4",
            F.when(n_words > 0, F.floor(stop_hits * F.lit(10000.0) / n_words)).otherwise(F.lit(0)).cast("bigint"),
        )
        .drop("__qs_words")
    )


def _lang_pred(words) -> F.Column:
    """argmax-of-marker-hits as ONE aggregate pass over a materialized word
    array: the accumulator carries one counter per language and the finish
    lambda resolves the argmax (ties broken by fixed en/de/fr/es order,
    'und' when no marker hits). The r3 CASE formulation referenced each
    per-language filter scan ~3x and re-split the text inside every copy
    (24 split(text) in the plan; 4.5s vs 0.6s forced at 200k docs)."""
    langs = ("en", "de", "fr", "es")

    def merge(acc, w):
        # isin -> InSet membership: array_contains over a literal array
        # re-built the marker array per word per language in the
        # interpreted evaluator (measured 1.09s -> 0.58s for the full
        # scan at 200k docs, r8; identical booleans)
        lw = F.lower(w)
        return F.struct(
            *[(acc[l] + lw.isin(*LANG_MARKERS[l]).cast("int")).alias(l) for l in langs]
        )

    def finish(acc):
        best = F.greatest(*[acc[l] for l in langs])
        pred = F.when(best <= 0, F.lit("und"))
        for lang in langs:
            pred = pred.when(acc[lang] == best, F.lit(lang))
        return pred

    init = F.struct(*[F.lit(0).alias(l) for l in langs])
    return F.aggregate(words, init, merge, finish)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word-voting language ID: argmax of marker hits, ties broken by
    fixed language order (en, de, fr, es), 'und' when no marker hits.
    Split-once (Generate boundary) + single counting pass."""
    g = materialize(df, __lid_words=word_array(F.col(text_col)))
    return g.withColumn("pred_lang", _lang_pred(F.col("__lid_words"))).drop("__lid_words")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: full-text hash + min word hash (minhash-1) —
    the cheap building block for shard-level dedup manifests."""
    words = word_array(F.col(text_col))
    word_hashes = F.transform(words, lambda w: portable_hash64(w))
    return df.withColumn("text_hash", portable_hash64(F.col(text_col))).withColumn(
        # coalesce: empty/whitespace-only docs would emit NULL (engines
        # render NULL differently -> breaks engine-agnostic value hashing)
        "min_word_hash", F.coalesce(F.array_min(word_hashes), F.lit(-1).cast("bigint"))
    )


# --- DuckDB mirrors --------------------------------------------------------

_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"

TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CAST(len({_WORDS}) AS INTEGER) AS n_tokens,
       CAST(floor(length(text) / 4) AS BIGINT) AS n_tokens_bpe_est
FROM documents
"""

QUALITY_SCORE_SQL = f"""
SELECT doc_id,
  CAST(len({_WORDS}) AS INTEGER) AS n_words,
  CASE WHEN len({_WORDS}) > 0
       THEN CAST(floor(length(replace(text, ' ', '')) * 10000.0 / len({_WORDS})) AS BIGINT)
       ELSE 0 END AS mean_word_len_e4,
  CASE WHEN len({_WORDS}) > 0
       THEN CAST(floor(len(list_filter({_WORDS}, w -> lower(w) IN ('the','a','an','of','and','in','to','is','was','it'))) * 10000.0 / len({_WORDS})) AS BIGINT)
       ELSE 0 END AS stopword_ratio_e4
FROM documents
"""


def _lang_score_sql(markers) -> str:
    in_list = ",".join(f"'{m}'" for m in markers)
    return f"len(list_filter(list_transform({_WORDS}, w -> lower(w)), w -> w IN ({in_list})))"


LANGUAGE_ID_SQL = f"""
SELECT doc_id,
  CASE
    WHEN greatest({_lang_score_sql(LANG_MARKERS['en'])}, {_lang_score_sql(LANG_MARKERS['de'])},
                  {_lang_score_sql(LANG_MARKERS['fr'])}, {_lang_score_sql(LANG_MARKERS['es'])}) <= 0 THEN 'und'
    WHEN {_lang_score_sql(LANG_MARKERS['en'])} = greatest({_lang_score_sql(LANG_MARKERS['en'])}, {_lang_score_sql(LANG_MARKERS['de'])}, {_lang_score_sql(LANG_MARKERS['fr'])}, {_lang_score_sql(LANG_MARKERS['es'])}) THEN 'en'
    WHEN {_lang_score_sql(LANG_MARKERS['de'])} = greatest({_lang_score_sql(LANG_MARKERS['en'])}, {_lang_score_sql(LANG_MARKERS['de'])}, {_lang_score_sql(LANG_MARKERS['fr'])}, {_lang_score_sql(LANG_MARKERS['es'])}) THEN 'de'
    WHEN {_lang_score_sql(LANG_MARKERS['fr'])} = greatest({_lang_score_sql(LANG_MARKERS['en'])}, {_lang_score_sql(LANG_MARKERS['de'])}, {_lang_score_sql(LANG_MARKERS['fr'])}, {_lang_score_sql(LANG_MARKERS['es'])}) THEN 'fr'
    ELSE 'es'
  END AS pred_lang
FROM documents
"""

FINGERPRINT_SQL = f"""
SELECT doc_id,
  (('0x' || substring(md5(text), 1, 15))::BIGINT) AS text_hash,
  COALESCE(list_min(list_transform({_WORDS}, w -> (('0x' || substring(md5(w), 1, 15))::BIGINT))), -1) AS min_word_hash
FROM documents
"""


# --- text cleaning (unicode NFC + control/zero-width strip) ------------------

# deterministic "dirt" the contract query injects so the cleaning oracle is
# discriminative on the otherwise-clean synthetic corpus: a combining acute
# (NFC composes e+U+0301 -> U+00E9), a BEL control char, double spaces, and
# a zero-width space.
DIRT_SUFFIX = " café \x07zz  end"
DIRT_PREFIX = "​pad "

_CONTROL_RE = r"[\x00-\x1F\x7F]"
_ZEROWIDTH_RE = "[​-‏  ﻿]"


def clean_text(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """Standard training-data text cleaning:

    1. Unicode NFC normalization — Spark has NO native normalizer, so this
       is a legitimate Arrow-batched pandas UDF (unicodedata.normalize over
       the batch); the DuckDB oracle cross-checks it against DuckDB's
       native C nfc_normalize;
    2. control chars (C0 + DEL) -> space, zero-width/bidi chars removed,
       space runs collapsed, trimmed — native regexp_replace (codegen).

    Adds n_chars_raw / n_chars_clean for downstream quality filters.
    """
    import unicodedata

    @F.pandas_udf("string")
    def nfc(s):
        return s.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)

    c = nfc(F.col(text_col))
    c = F.regexp_replace(c, _CONTROL_RE, " ")
    c = F.regexp_replace(c, _ZEROWIDTH_RE, "")
    c = F.trim(F.regexp_replace(c, " +", " "))
    return (
        df.withColumn("n_chars_raw", F.length(F.col(text_col)))
        .withColumn(out_col, c)
        .withColumn("n_chars_clean", F.length(F.col(out_col)))
    )


# NOTE: DuckDB regexp_replace is single-occurrence WITHOUT the 'g' flag
# (Spark's is always global).
CLEAN_TEXT_SQL = f"""
WITH dirty AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN text || '{DIRT_SUFFIX}'
         WHEN doc_id % 3 = 1 THEN '{DIRT_PREFIX}' || text
         ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  CAST(length(text) AS INTEGER) AS n_chars_raw,
  trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
       '[\\x00-\\x1F\\x7F]', ' ', 'g'),
       '[{_ZEROWIDTH_RE[1:-1]}]', '', 'g'),
       ' +', ' ', 'g')) AS clean_text,
  length(trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
       '[\\x00-\\x1F\\x7F]', ' ', 'g'),
       '[{_ZEROWIDTH_RE[1:-1]}]', '', 'g'),
       ' +', ' ', 'g')))::INTEGER AS n_chars_clean
FROM dirty
"""


# --- repetition stats (Gopher-style boilerplate signals) ---------------------


def _longest_run(arr) -> F.Column:
    """Longest equal-run length of ``arr`` as ONE aggregate pass carrying
    (prev, run, best); finish projects best so callers hold a single-use
    scalar (referencing the 3-field accumulator struct from outside would
    paste a full copy of the aggregate per reference)."""
    return F.aggregate(
        arr,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _repetition_cols(words):
    """(dup_word_frac_e4, top_bigram_frac_e4, max_word_run) as Columns over
    a MATERIALIZED word-array column (functions/boundary.py) — shared by
    repetition_stats and the composite corpus_quality_filter so the
    composite stays a single scan-side pipeline (no join). Every O(n)
    subexpression is referenced exactly once."""
    n = F.size(words)

    dup_frac = F.when(
        n > 0,
        F.floor((n - F.size(F.array_distinct(words))) * F.lit(10000.0) / n).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))

    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # bigram count in closed form (n-1 for n>=2) so the bigram array itself
    # is only referenced once, by the modal-run scan below
    nb = F.when(n >= 2, n - 1).otherwise(F.lit(0))
    # modal bigram count = longest equal-run of the SORTED bigram array —
    # O(n log n) per row; the naive distinct x filter scan is O(n^2) and
    # would bind on long documents at scale
    modal_best = _longest_run(F.array_sort(bigrams))
    top_bigram_frac = F.when(
        nb > 0, F.floor(modal_best * F.lit(10000.0) / nb).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))

    return dup_frac, top_bigram_frac, _longest_run(words).cast("int")


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Boilerplate/repetition signals per document (the Gopher-rule family
    used by web-scale training-data filters):

    - dup_word_frac_e4: 1 - distinct(words)/words — high for pages that
      repeat navigation tokens;
    - top_bigram_frac_e4: occurrences of the most frequent word bigram /
      total bigrams — high for templated/boilerplate text;
    - max_word_run: longest run of the SAME word repeated consecutively.

    All scan-side native Columns (aggregate/transform over the word array,
    zero shuffle, zero Python) with exact integer fixed-point outputs;
    the word array is split once behind a Generate boundary.
    """
    g = materialize(df, __rep_words=word_array(F.col(text_col)))
    dup_frac, top_bigram_frac, max_run = _repetition_cols(F.col("__rep_words"))
    return g.select(
        F.col(id_col),
        dup_frac.alias("dup_word_frac_e4"),
        top_bigram_frac.alias("top_bigram_frac_e4"),
        max_run.alias("max_word_run"),
    )


REPETITION_STATS_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
b AS (
  SELECT doc_id, words,
    CASE WHEN len(words) >= 2
         THEN list_transform(generate_series(1, len(words) - 1),
                             i -> words[i] || ' ' || words[i + 1])
         ELSE [] END AS bigrams
  FROM w
)
SELECT doc_id,
  CASE WHEN len(words) > 0
       THEN CAST(floor((len(words) - len(list_distinct(words))) * 10000.0 / len(words)) AS BIGINT)
       ELSE 0 END AS dup_word_frac_e4,
  CASE WHEN len(bigrams) > 0
       THEN CAST(floor(
            list_max(list_transform(generate_series(1, len(bstarts)),
              k -> (CASE WHEN k < len(bstarts) THEN bstarts[k+1]
                         ELSE len(bigrams) + 1 END) - bstarts[k]))
            * 10000.0 / len(bigrams)) AS BIGINT)
       ELSE 0 END AS top_bigram_frac_e4,
  CAST(CASE WHEN len(words) = 0 THEN 0 ELSE (
    -- run-start indices; run length = gap to the next start (or end+1)
    list_max(list_transform(generate_series(1, len(starts)),
      k -> (CASE WHEN k < len(starts) THEN starts[k+1] ELSE len(words) + 1 END) - starts[k]))
  ) END AS INT) AS max_word_run
FROM (
  SELECT doc_id, words, bigrams,
    list_filter(generate_series(1, len(words)),
                i -> i = 1 OR words[i] <> words[i-1]) AS starts,
    list_filter(generate_series(1, len(sb)),
                i -> i = 1 OR sb[i] <> sb[i-1]) AS bstarts
  FROM (SELECT *, list_sort(bigrams) AS sb FROM b)
)
"""


# --- PII masking (training-data redaction) -----------------------------------

# RE2-compatible patterns (no lookaround/backrefs) so the Java-regex Spark
# side and the RE2 DuckDB mirror match the SAME spans.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ ]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def mask_pii(df: DataFrame, text_col: str = "text", out_col: str = "masked_text") -> DataFrame:
    """Standard redaction stage: replace emails / URLs / IPv4 literals with
    typed placeholder tokens and count each class per document. Order
    matters (emails before URLs would otherwise leave 'mailto'-ish residue;
    URLs before IPs so an IP inside a URL is already consumed). Pure native
    regexp columns — codegen, no Python."""
    c = F.col(text_col)
    counts = []
    for name, pattern, _ in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).alias(f"n_{name}"))
    masked = c
    for _, pattern, token in PII_PATTERNS:
        masked = F.regexp_replace(masked, pattern, token)
    return df.select(
        "*", *counts, masked.alias(out_col)
    )


# NOTE: counts computed on the ORIGINAL text (Spark side identical);
# DuckDB needs the 'g' flag for global regexp_replace.
MASK_PII_SQL = r"""
WITH dirty AS (
  SELECT doc_id,
    CASE WHEN doc_id % 4 = 0 THEN text || ' contact bob.smith+spam@mail.example.org now'
         WHEN doc_id % 4 = 1 THEN 'see https://ex.test/a?b=1 and 10.0.255.7 ' || text
         ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
  CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INTEGER) AS n_url,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ip,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    'https?://[^ ]+', '<URL>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS masked_text
FROM dirty
"""


# --- document chunking (context-window packing) -------------------------------


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size word windows with overlap — the
    standard LLM-training chunking stage (sequence packing feeds on these).

    One row per chunk: (id, chunk_id, n_words_chunk, chunk_text). Chunk k
    covers words [k*stride, k*stride + chunk_size) with
    stride = chunk_size - overlap; the final chunk may be short; empty
    documents produce no chunks. Scan-side sequence/transform + explode —
    no shuffle, no Python; per-row work is linear in document length
    (the word array is materialized once behind a Generate boundary: the
    slice inside the chunk transform's lambda re-evaluates non-attribute
    subtrees PER CHUNK, so slicing the raw split expression was
    O(words * chunks) per document).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    g = materialize(
        df.select(F.col(id_col), F.col(text_col)),
        __ck_words=word_array(F.col(text_col)),
    )
    words = F.col("__ck_words")
    n = F.size(words)
    # start offsets 0, stride, 2*stride ... < n (empty docs -> empty array;
    # note sequence(a, b) DESCENDS when a > b, so guard n == 0 explicitly)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s, k: F.struct(
            k.alias("chunk_id"),
            F.least(n - s, F.lit(chunk_size)).alias("n_words_chunk"),
            F.concat_ws(" ", F.slice(words, s + 1, chunk_size)).alias("chunk_text"),
        ),
    )
    exploded = g.select(F.col(id_col), F.explode(chunks).alias("c"))
    return exploded.select(id_col, "c.chunk_id", "c.n_words_chunk", "c.chunk_text")


def chunk_documents_sql(chunk_size: int = 64, overlap: int = 16) -> str:
    stride = chunk_size - overlap
    return f"""
WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
c AS (
  SELECT doc_id,
    CASE WHEN len(words) > 0
         THEN generate_series(1, len(words), {stride})
         ELSE [] END AS starts,
    words
  FROM w
)
SELECT doc_id,
  CAST(k - 1 AS INT) AS chunk_id,
  CAST(least(len(words) - starts[k] + 1, {chunk_size}) AS INT) AS n_words_chunk,
  array_to_string(words[starts[k]:starts[k] + {chunk_size} - 1], ' ') AS chunk_text
FROM c CROSS JOIN UNNEST(generate_series(1, len(starts))) AS t(k)
"""


# --- composite corpus quality filter -----------------------------------------

# Default thresholds chosen to be discriminative on the synthetic corpus
# (sf0.01 signal distributions: n_words 10-99, mean_word_len_e4 37k-53k,
# dup_word_frac_e4 median ~5.4k / max ~7.2k, max_word_run <= 4, ~91% en).
QF_MIN_WORDS = 25
QF_MAX_WORDS = 5000
QF_MIN_MEAN_E4 = 30000
QF_MAX_MEAN_E4 = 50000
QF_MAX_DUP_E4 = 6000
QF_MAX_RUN = 3
QF_LANG = "en"


def corpus_quality_filter(
    df: DataFrame, text_col: str = "text", carry: tuple = ()
) -> DataFrame:
    """The end-to-end keep/drop decision a C4/Gopher-style training-data
    pipeline applies per document, composed from the scan-side signal
    family (quality_score, repetition_stats, language_id) in ONE pass:
    no join, no shuffle, no Python.

    Plan shape (the r4 fix for VERDICT r3 item 1): two chained Generate
    boundaries — the first splits the text ONCE, the second evaluates each
    O(n) signal ONCE over the materialized word array — then a cheap final
    projection derives the flags. The r3 formulation pasted an independent
    split(text) into every signal reference (32x in the committed plan,
    28.6s vs 2.8s forced at 200k docs, BENCH/PLANS.md:295).

    Output: doc_id, each violated-rule flag as an INT (auditable reject
    reasons, the shape quality-filter reports need), and keep = 1 iff no
    flag fired. The reference has no corpus filtering at all (its eval
    corpus was hand-curated, reference: eval/generate-datasets/
    select_sentences.py); this is part of the LLM-pipeline operator set
    the engine adds on top.
    """
    g = materialize(df, __qf_words=word_array(F.col(text_col)))
    words = F.col("__qf_words")
    n_words = F.size(words)
    mean_e4 = _mean_word_len_e4(words, text_col)
    dup_frac, _, max_run = _repetition_cols(words)
    sig = materialize(
        g,
        __n_words=n_words,
        __mean_e4=mean_e4,
        __dup_e4=dup_frac,
        __max_run=max_run,
        __pred_lang=_lang_pred(words),
    )
    too_short = (F.col("__n_words") < QF_MIN_WORDS).cast("int")
    too_long = (F.col("__n_words") > QF_MAX_WORDS).cast("int")
    bad_word_len = (
        (F.col("__mean_e4") < QF_MIN_MEAN_E4) | (F.col("__mean_e4") > QF_MAX_MEAN_E4)
    ).cast("int")
    too_repetitive = (F.col("__dup_e4") > QF_MAX_DUP_E4).cast("int")
    long_run = (F.col("__max_run") > QF_MAX_RUN).cast("int")
    wrong_lang = (F.col("__pred_lang") != QF_LANG).cast("int")
    flags = [too_short, too_long, bad_word_len, too_repetitive, long_run, wrong_lang]
    names = ["too_short", "too_long", "bad_word_len", "too_repetitive", "long_run", "wrong_lang"]
    # ``carry`` passes source columns through alongside the flags (the
    # signals frame retains every input column), so a consumer that needs
    # both the decision and the text — e.g. classifier.nb_token_weights'
    # pseudo-label training — gets them from ONE scan, no doc_id join back
    out = sig.select("doc_id", *carry, *[f.alias(n) for f, n in zip(flags, names)])
    keep = (sum(F.col(n) for n in names) == 0).cast("int")
    return out.withColumn("keep", keep)


CORPUS_QUALITY_FILTER_SQL = f"""
WITH q AS ({QUALITY_SCORE_SQL}), r AS ({REPETITION_STATS_SQL}), l AS ({LANGUAGE_ID_SQL}),
f AS (
  SELECT q.doc_id,
    CAST(n_words < {QF_MIN_WORDS} AS INT) AS too_short,
    CAST(n_words > {QF_MAX_WORDS} AS INT) AS too_long,
    CAST(mean_word_len_e4 < {QF_MIN_MEAN_E4} OR mean_word_len_e4 > {QF_MAX_MEAN_E4} AS INT) AS bad_word_len,
    CAST(dup_word_frac_e4 > {QF_MAX_DUP_E4} AS INT) AS too_repetitive,
    CAST(max_word_run > {QF_MAX_RUN} AS INT) AS long_run,
    CAST(pred_lang <> '{QF_LANG}' AS INT) AS wrong_lang
  FROM q JOIN r ON q.doc_id = r.doc_id JOIN l ON q.doc_id = l.doc_id
)
SELECT *, CAST(too_short + too_long + bad_word_len + too_repetitive + long_run + wrong_lang = 0 AS INT) AS keep
FROM f
"""


# --- paragraph dedup (C4-style span removal, r6) ----------------------------

def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    out_col: str = "text_dedup",
) -> DataFrame:
    """INTRA-document paragraph dedup: drop repeated paragraphs within one
    document, keeping the FIRST occurrence in order (the within-page half
    of C4's repeated-span removal — nav boilerplate pasted between
    sections, templated footers, etc.).

    Scale shape: a pure per-row projection — split, order-preserving
    array_distinct, re-join. Zero shuffle, zero state; runs at scan
    bandwidth on any number of executors. (Spark's array_distinct keeps
    first-occurrence order; DuckDB's list_distinct does NOT, so the SQL
    mirror pins the ordering with a window formulation — the oracle
    genuinely checks the order semantics, not just the multiset.)

    ``sep`` is \Q-quoted before the split: Spark's split() interprets its
    separator as a REGEX while DuckDB's string_split is literal, so an
    unquoted regex-special separator ('.', '|') would silently diverge
    between the operator and its oracle. (Quoting caveat: a sep containing
    the literal sequence '\\E' is not supported.)"""
    paras = F.split(F.col(text_col), F.lit("\\Q" + sep + "\\E"))
    kept = F.array_distinct(paras)
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias(out_col),
        F.size(paras).alias("n_paras"),
        (F.size(paras) - F.size(kept)).alias("n_dropped"),
    )


def dedup_paragraphs_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    out_col: str = "text_dedup",
) -> DataFrame:
    """GLOBAL paragraph dedup: every distinct paragraph is kept exactly
    once across the whole corpus — at its first occurrence by
    (min doc id, min position) — and removed everywhere else (C4: "we
    removed any three-sentence span occurring more than once"; the unit
    here is the paragraph). Subsumes the intra-document dedup (a repeat
    inside one doc is also a global repeat).

    Output: one row per input document — (id, deduped text, n_paras,
    n_dropped); a document whose every paragraph occurred earlier comes
    back with an empty string (left join keeps the row).

    Scale shape (100 TB): three shuffles, all map-side combinable or
    AQE-handled —
    1. winner = groupBy(paragraph).agg(min(struct(doc, pos))): partial
       min on the map side, so a boilerplate paragraph on 10^9 pages
       sends ONE candidate per input partition, not 10^9 rows;
    2. join paras->winner on the paragraph: both sides exchange on the
       same key (the winner side reuses its aggregation exchange) and a
       hot paragraph is an AQE-splittable skew key;
    3. rebuild groupBy(doc): input-sized, bounded per-task by document
       size. The paragraph STRING is the join/agg key deliberately —
       exact (no hash-collision merges); swap in a 120-bit hash pair key
       to cut shuffle bytes when paragraphs are huge.

    Cost note: the exploded-paragraph lineage is planned TWICE (the
    winner aggregation and the join probe side are different subtrees, so
    Spark cannot reuse the exchange) plus a third thin scan for the
    per-doc paragraph counts — callers running this over an expensive
    upstream lineage should persist/materialize their input first, the
    same rule as minhash_band_pairs (operators/dedup.py cost note).
    ``sep`` is \Q-quoted (see dedup_paragraphs)."""
    qsep = "\\Q" + sep + "\\E"
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(qsep))).alias("_pos", "_para"),
    )
    winner = paras.groupBy("_para").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p"))).alias("_w")
    )
    kept = (
        paras.join(winner, "_para")
        .filter((F.col(id_col) == F.col("_w.d")) & (F.col("_pos") == F.col("_w.p")))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias(out_col),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    n_paras = F.size(F.split(F.col(text_col), F.lit(qsep)))
    return (
        df.select(F.col(id_col), n_paras.alias("n_paras"))
        .join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            "n_paras",
            (F.col("n_paras") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_dropped"),
        )
    )


# Mirrors use the window formulation (row_number over first occurrence):
# DuckDB's list_distinct is NOT order-preserving, so the oracle pins
# Spark's first-occurrence ordering through string_agg(... ORDER BY pos).
# The dirtied corpus is built in the paired contract queries
# (__spark_entry__.q_dedup_paragraphs*): [text, BOILER] per doc, plus a
# repeat of the doc's own text for doc_id % 3 == 0.
PARA_BOILER = "subscribe to our newsletter for updates"

DEDUP_PARAGRAPHS_SQL = f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || e'\\n\\n' || '{PARA_BOILER}' || e'\\n\\n' || text
              ELSE text || e'\\n\\n' || '{PARA_BOILER}' END AS text
  FROM documents
),
s AS (SELECT doc_id, string_split(text, e'\\n\\n') AS ps FROM dirty),
p AS (
  SELECT doc_id, ps[i] AS para, i - 1 AS pos
  FROM s CROSS JOIN UNNEST(generate_series(1, len(ps))) AS t(i)
),
k AS (
  SELECT doc_id, para, pos,
         row_number() OVER (PARTITION BY doc_id, para ORDER BY pos) AS rn
  FROM p
)
SELECT d.doc_id,
       coalesce(string_agg(k.para, e'\\n\\n' ORDER BY k.pos) FILTER (WHERE k.rn = 1), '') AS text_dedup,
       CAST(count(k.pos) AS INT) AS n_paras,
       CAST(count(k.pos) - count(k.pos) FILTER (WHERE k.rn = 1) AS INT) AS n_dropped
FROM dirty d LEFT JOIN k ON d.doc_id = k.doc_id
GROUP BY d.doc_id
"""

DEDUP_PARAGRAPHS_GLOBAL_SQL = f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || e'\\n\\n' || '{PARA_BOILER}' || e'\\n\\n' || text
              ELSE text || e'\\n\\n' || '{PARA_BOILER}' END AS text
  FROM documents
),
s AS (SELECT doc_id, string_split(text, e'\\n\\n') AS ps FROM dirty),
p AS (
  SELECT doc_id, ps[i] AS para, i - 1 AS pos
  FROM s CROSS JOIN UNNEST(generate_series(1, len(ps))) AS t(i)
),
k AS (
  SELECT doc_id, para, pos,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM p
)
SELECT d.doc_id,
       coalesce(string_agg(k.para, e'\\n\\n' ORDER BY k.pos) FILTER (WHERE k.rn = 1), '') AS text_dedup,
       CAST(count(k.pos) AS INT) AS n_paras,
       CAST(count(k.pos) - count(k.pos) FILTER (WHERE k.rn = 1) AS INT) AS n_dropped
FROM dirty d LEFT JOIN k ON d.doc_id = k.doc_id
GROUP BY d.doc_id
"""


def term_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus term statistics — the inverted-index profile a retrieval or
    tokenizer-training stage starts from: per term (single-SPACE split,
    the repo-wide word_array contract — tabs/newlines stay in-token),
    document frequency and total term frequency.

    Returns (term, df, tf) with df = distinct documents containing the
    term and tf = total occurrences; terms below ``min_df`` are dropped
    (the long tail of hapaxes dominates the vocabulary — min_df=2 already
    cuts most of it).

    Scale shape: one split per document behind a Generate boundary, then
    ONE term-keyed aggregation. Zipf skew (a stopword appears in every
    document) is harmless here: counts partial-aggregate map-side, so the
    hot term arrives at its reducer as one partial row per upstream
    partition, never as raw occurrences. df rides the same shuffle as
    count(DISTINCT doc) — per-term distinct sets are bounded by the doc
    count and AQE splits stragglers.
    """
    words = word_array(
        F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    )
    exploded = docs.select(
        F.col(id_col).alias("_d"), F.explode(words).alias("term")
    )
    out = exploded.groupBy("term").agg(
        F.countDistinct("_d").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("tf"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= F.lit(min_df))
    return out


def term_stats_sql(
    docs_rel: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    lowercase: bool = True,
) -> str:
    """DuckDB mirror of term_stats()."""
    src = f"lower({text_col})" if lowercase else text_col
    words = WORD_ARRAY_SQL.format(col=src)
    having = f"HAVING count(DISTINCT {id_col}) >= {min_df}" if min_df > 1 else ""
    return f"""
SELECT term,
       CAST(count(DISTINCT {id_col}) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS tf
FROM (SELECT {id_col}, unnest({words}) AS term FROM {docs_rel})
GROUP BY term {having}"""


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_count: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """(ngram, n_count) — the corpus word-n-gram count table: the count
    step of KenLM-style language-model training and the denominator table
    perplexity-style quality filters join against (term_stats() is the
    n=1 special case with document frequencies; this adds the order-n
    surface LM training actually consumes).

    Scale shape: one split per document behind a Generate boundary
    (functions/boundary.py), gram construction as a single interpreted
    transform over the materialized attribute, then ONE ngram-keyed
    aggregation with map-side partials — Zipf-hot grams ("of the") arrive
    at their reducer as one partial per upstream partition. The output
    table is the large artifact (grams ~ corpus tokens): ``min_count``
    prunes the hapax tail BEFORE the table is persisted, which at 10^12
    docs is the difference between a joinable table and a second corpus.
    """
    base = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    g = materialize(docs.select(base.alias("__lm_t")), __lm_ws=word_array(F.col("__lm_t")))
    out = (
        g.select(F.explode(ngram_array(F.col("__lm_ws"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_count"))
    )
    if min_count > 1:
        out = out.filter(F.col("n_count") >= F.lit(min_count))
    return out


_NGRAM_SQL = (
    "list_transform(generate_series(1, len({w}) - {nm1}), "
    "i -> array_to_string(list_slice({w}, i, i + {nm1}), ' '))"
)


def ngram_counts_sql(
    docs_rel: str = "documents",
    n: int = 2,
    text_col: str = "text",
    min_count: int = 1,
    lowercase: bool = True,
) -> str:
    """DuckDB mirror of ngram_counts() (generate_series(1,0) is empty in
    DuckDB, so no short-doc guard is needed on this side)."""
    src = f"lower({text_col})" if lowercase else text_col
    words = WORD_ARRAY_SQL.format(col=src)
    grams = _NGRAM_SQL.format(w="w", nm1=n - 1)
    having = f"HAVING count(*) >= {min_count}" if min_count > 1 else ""
    return f"""
SELECT ngram, CAST(count(*) AS BIGINT) AS n_count
FROM (SELECT unnest({grams}) AS ngram
      FROM (SELECT {words} AS w FROM {docs_rel}))
GROUP BY ngram {having}"""


def ngram_count_of_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(n_count, n_ngrams) — frequencies of frequencies over the n-gram
    count table: the Good-Turing smoothing input (N_r = how many distinct
    grams occur exactly r times). Second aggregation runs over the
    count-table rows, not the corpus; output is O(max count) rows."""
    return (
        ngram_counts(docs, n=n, text_col=text_col, lowercase=lowercase)
        .groupBy("n_count")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ngrams"))
    )


def ngram_count_of_counts_sql(
    docs_rel: str = "documents",
    n: int = 2,
    text_col: str = "text",
    lowercase: bool = True,
) -> str:
    """DuckDB mirror of ngram_count_of_counts()."""
    inner = ngram_counts_sql(docs_rel, n=n, text_col=text_col, lowercase=lowercase)
    return f"""
SELECT n_count, CAST(count(*) AS BIGINT) AS n_ngrams
FROM ({inner})
GROUP BY n_count"""


def lm_familiarity(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_grams, familiarity) — integer LM-familiarity quality score:
    familiarity = floor(mean corpus count of the document's n-grams),
    i.e. sum(count table lookups) div n_grams; 0 for docs shorter than n
    words. The integer stand-in for perplexity filtering: text whose
    n-grams are corpus-frequent is "ordinary" (high familiarity), while
    gibberish / boilerplate-mangled text scores low. Exact integers, so
    the score is partition-independent and oracle-hashable.

    Scale shape: the corpus count table is built once (one shuffle);
    per-doc grams then JOIN it on the gram key — a co-partitioned shuffle
    join, the scale-correct choice because the count table at LM scale is
    far beyond broadcast size. Zipf grams make the join many-to-ONE on a
    hot key (the count side has a single row per gram), which AQE's skew
    split handles without correctness impact. Final per-doc agg is one
    more map-side-combinable shuffle on the id.
    """
    counts = ngram_counts(docs, n=n, text_col=text_col, lowercase=lowercase)
    base = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    g = materialize(
        docs.select(F.col(id_col).alias("id"), base.alias("__lm_t")),
        __lm_ws=word_array(F.col("__lm_t")),
    )
    doc_grams = g.select(
        "id", F.explode(ngram_array(F.col("__lm_ws"), n)).alias("ngram")
    )
    scored = (
        doc_grams.join(counts, "ngram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("n_count").cast("long").alias("_sum"),
        )
        .withColumn("familiarity", F.expr("_sum div n_grams").cast("long"))
        .drop("_sum")
    )
    # docs with < n words have no grams: keep them at (0, 0) so the output
    # covers every input row (a filter stage drops them explicitly, not
    # silently)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("familiarity", F.lit(0)).cast("long").alias("familiarity"),
        )
    )


def lm_familiarity_sql(
    docs_rel: str = "documents",
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> str:
    """DuckDB mirror of lm_familiarity()."""
    counts = ngram_counts_sql(docs_rel, n=n, text_col=text_col, lowercase=lowercase)
    src = f"lower({text_col})" if lowercase else text_col
    words = WORD_ARRAY_SQL.format(col=src)
    grams = _NGRAM_SQL.format(w="w", nm1=n - 1)
    return f"""
, _lmc AS MATERIALIZED ({counts}),
_lmg AS MATERIALIZED (
  SELECT id, unnest({grams}) AS ngram
  FROM (SELECT {id_col} AS id, {words} AS w FROM {docs_rel})),
_lms AS (
  SELECT g.id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(c.n_count) // count(*) AS BIGINT) AS familiarity
  FROM _lmg g JOIN _lmc c USING (ngram)
  GROUP BY g.id)
SELECT d.{id_col} AS id,
       CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(s.familiarity, 0) AS BIGINT) AS familiarity
FROM {docs_rel} d LEFT JOIN _lms s ON s.id = d.{id_col}"""


def seed_relevance_topk(
    docs: DataFrame,
    seed_terms: list[str],
    k: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hits, relevance_e6) — top-k documents by BM25-style
    relevance to a fixed seed vocabulary: the cheap "looks like the
    high-quality seed corpus" ranking a curation pipeline runs before any
    classifier (CCNet-style). EXACT integer arithmetic end to end, so the
    ranking is partition-independent and oracle-hashable:

    - idf2(t) = floor(log2((N + 1) div (df_t + 1))) + 1 via binary-string
      length (length(bin(x)) — bit-identical in DuckDB via
      printf('%b')), a quantized-but-monotone stand-in for ln-idf (floats
      would make the per-doc SUM order-dependent across partitions); the
      +1 floor keeps corpus-common seed terms contributing (ratio < 2
      otherwise quantizes to 0 and the ranking collapses), so within an
      idf octave documents rank by tf saturation;
    - tf saturation = BM25 with k1 = 6/5, b = 3/4 cleared of fractions:
      sat_e6 = floor(1e6 * 44*avgdl*tf / (20*avgdl*tf + 6*avgdl + 18*dl))
      with avgdl = floor(total corpus words / N). Numerators reach ~1e20,
      so the division runs in DECIMAL(38,0) (HUGEINT in the mirror);
    - relevance_e6 = sum over matched seed terms of idf2 * sat_e6; ties
      broken by min id.

    Scale shape: seed terms are a broadcast literal array, so the
    term-match filter runs scan-side and ONLY matching (doc, term) rows
    shuffle (one groupBy); df (<= |seed|) and the (N, avgdl) scalar each
    broadcast back; final top-k is a TakeOrderedAndProject, never a full
    sort. Two corpus scans total (doc-term match + the column-pruned
    length scan) — a production loop would persist the word-array scan.
    """
    base = docs.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__sr_t"))
    g = materialize(base, __sr_ws=word_array(F.col("__sr_t")))
    doclen = g.select("id", F.size("__sr_ws").alias("dl"), "__sr_ws")
    stats = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.greatest(
            F.expr("sum(dl) div count(1)"), F.lit(1)
        ).cast("long").alias("avgdl"),
    )
    terms_arr = F.array(*[F.lit(t) for t in seed_terms])
    doc_term = (
        doclen.select(
            "id",
            "dl",
            F.explode(F.filter(F.col("__sr_ws"), lambda w: F.array_contains(terms_arr, w))).alias(
                "term"
            ),
        )
        .groupBy("id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_t = doc_term.groupBy("term").agg(
        F.countDistinct("id").cast("long").alias("df")
    )
    scored = (
        doc_term.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf2", F.length(F.expr("bin((n_docs + 1) div (df + 1))")).cast("long"))
        .withColumn(
            "sat_e6",
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * 44 * avgdl * tf) div "
                "(20 * avgdl * tf + 6 * avgdl + 18 * dl)"
            ).cast("long"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum(F.expr("idf2 * sat_e6")).cast("long").alias("relevance_e6"),
        )
    )
    return scored.orderBy(F.col("relevance_e6").desc(), F.col("id").asc()).limit(k)


def seed_relevance_topk_sql(
    seed_terms: list[str],
    k: int = 25,
    docs_rel: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of seed_relevance_topk() (HUGEINT for the saturated
    tf division, printf('%b') for the binary-length idf)."""
    words = WORD_ARRAY_SQL.format(col=f"lower({text_col})")
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in seed_terms)
    return f"""
, _srl AS MATERIALIZED (
  SELECT {id_col} AS id, len({words}) AS dl, {words} AS ws FROM {docs_rel}),
_srs AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(greatest(sum(dl) // count(*), 1) AS BIGINT) AS avgdl FROM _srl),
_srdt AS MATERIALIZED (
  SELECT id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT id, dl, unnest(list_filter(ws, w -> w IN ({in_list}))) AS term FROM _srl)
  GROUP BY id, dl, term),
_srdf AS (SELECT term, CAST(count(DISTINCT id) AS BIGINT) AS df FROM _srdt GROUP BY term),
_srsc AS (
  SELECT t.id,
         CAST(count(*) AS BIGINT) AS n_hits,
         CAST(sum(
           length(printf('%b', (s.n_docs + 1) // (f.df + 1)))
           * ((1000000::HUGEINT * 44 * s.avgdl * t.tf) //
              (20 * s.avgdl * t.tf + 6 * s.avgdl + 18 * t.dl))
         ) AS BIGINT) AS relevance_e6
  FROM _srdt t JOIN _srdf f USING (term) CROSS JOIN _srs s
  GROUP BY t.id)
SELECT id, n_hits, relevance_e6 FROM _srsc
ORDER BY relevance_e6 DESC, id ASC LIMIT {k}"""


def corpus_length_quantiles(
    df: DataFrame,
    text_col: str = "text",
    quantiles: tuple = (50, 90, 99),
) -> DataFrame:
    """One-row corpus length report: doc count, token totals, and EXACT
    integer percentiles of the per-doc token count — the summary a
    curation run logs per snapshot (and the input to threshold tuning
    for the quality filter). Percentile rule: p-th percentile = the
    smallest length L whose cumulative doc count reaches ceil(p/100 * N)
    (the classic nearest-rank definition — integer-exact, no
    interpolation, so the DuckDB mirror hash-matches; approx_percentile
    would be engine-divergent).

    Scale shape: ONE corpus scan -> groupBy on the token count (the
    domain is bounded by the longest document, thousands of distinct
    values at most — NOT corpus-sized) -> cumulative sum via a window
    over that tiny frame (a Window here is safe: the frame is
    domain-sized; the corpus never passes through it) -> one-row
    aggregate.
    """
    from pyspark.sql import Window

    n_tokens = F.size(word_array(F.col(text_col))).cast("long")
    hist = df.select(n_tokens.alias("len")).groupBy("len").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "len", "n", F.sum("n").over(w).alias("cn")
    )
    totals = hist.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.col("n") * F.col("len")).cast("long").alias("n_tokens_total"),
        F.max("len").cast("long").alias("max_len"),
        F.min("len").cast("long").alias("min_len"),
    )
    qcols = []
    for p in quantiles:
        # rank = ceil(p/100 * N), integer: (p*N + 99) div 100
        qcols.append(
            F.min(
                F.when(
                    F.col("cn") >= F.expr(f"({p} * n_docs + 99) div 100"), F.col("len")
                )
            ).cast("long").alias(f"p{p}_len")
        )
    return (
        cum.crossJoin(F.broadcast(totals))
        .groupBy("n_docs", "n_tokens_total", "min_len", "max_len")
        .agg(*qcols)
        .select(
            "n_docs", "n_tokens_total", "min_len", "max_len",
            *[f"p{p}_len" for p in quantiles],
        )
    )


def corpus_length_quantiles_sql(
    docs_rel: str = "documents",
    text_col: str = "text",
    quantiles: tuple = (50, 90, 99),
) -> str:
    """DuckDB mirror (same nearest-rank rule, same integer rank math)."""
    words = WORD_ARRAY_SQL.format(col=text_col)
    qsel = ",\n       ".join(
        f"CAST(min(CASE WHEN cn >= ({p} * n_docs + 99) // 100 THEN len END) AS BIGINT) AS p{p}_len"
        for p in quantiles
    )
    return f"""
, _clq_h AS MATERIALIZED (
  SELECT len({words}) AS len, CAST(count(*) AS BIGINT) AS n
  FROM {docs_rel} GROUP BY 1),
_clq_c AS (
  SELECT len, n, CAST(sum(n) OVER (ORDER BY len) AS BIGINT) AS cn FROM _clq_h),
_clq_t AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(n * len) AS BIGINT) AS n_tokens_total,
         CAST(min(len) AS BIGINT) AS min_len,
         CAST(max(len) AS BIGINT) AS max_len
  FROM _clq_h)
SELECT n_docs, n_tokens_total, min_len, max_len,
       {qsel}
FROM _clq_c CROSS JOIN _clq_t
GROUP BY n_docs, n_tokens_total, min_len, max_len"""
