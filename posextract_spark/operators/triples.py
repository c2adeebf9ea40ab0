"""Distributed triple extraction (the flagship operator).

Spark lifecycle (SURVEY.md §3.1): scan -> [pandas UDF: segment+parse+extract,
one Arrow crossing] -> posexplode [JVM] -> Catalyst filters -> downstream.
Extraction is embarrassingly parallel per document: no shuffle is introduced
anywhere in this operator; partition count is inherited from the scan (use
``repartition_by_hash`` before calling it only when upstream partitions are
skewed, e.g. oversized pages).

The reference's equivalent path is one python process, one row at a time
(reference: src/posextract/grammatical_triples.py:362-371 CLI loop; per
sentence nlp() at :260). Here parsing is always batched per Arrow batch and
fused with extraction so token trees never cross a process boundary.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from posextract_spark.kernel.extract import extract_triples_one
from posextract_spark.kernel.quotes import split_quotes_list
from posextract_spark.kernel.triple import FLAT_FIELDS
from posextract_spark.options import TripleExtractorOptions

OUTPUT_STRING_FIELDS = tuple(FLAT_FIELDS) + (
    "subject_token_text",
    "verb_token_text",
    "object_token_text",
)

# C-level tuple extraction of the 17 output fields per triple (replaces a
# per-triple genexpr of dict lookups in the UDF hot loop)
import operator as _operator

_FIELDS_GETTER = _operator.itemgetter(*OUTPUT_STRING_FIELDS)

TOKEN_STRUCT = StructType(
    [
        StructField("i", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("lemma", StringType(), False),
        StructField("pos", StringType(), False),
        StructField("dep", StringType(), False),
        StructField("head", IntegerType(), False),
    ]
)


def repartition_by_hash(
    df: DataFrame, col: str = "url", n_partitions: Optional[int] = None
) -> DataFrame:
    """Explicit url-hash repartition (north_rule skew seam): call before
    extract_triples when upstream partitions are skewed — e.g. a scan whose
    input files cluster oversized pages. Hash partitioning spreads the KEYS
    uniformly; pair it with split_sentences' max_sentence_chars cap, which
    bounds the per-ROW work an oversized page can demand."""
    n = n_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, F.xxhash64(F.col(col)))


def extract_triples(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Optional[List[str]] = None,
    options: Optional[TripleExtractorOptions] = None,
    provider: str = "auto",
    provider_kwargs: Optional[dict] = None,
    posrule_filter: Optional[Column] = None,
) -> DataFrame:
    """documents(text [, ids...]) -> triples(ids..., sent_id, triple fields).

    Implementation: ``mapInPandas`` emitting already-exploded flat frames —
    measured ~30% faster than the array<struct> + JVM-explode formulation
    (one fewer nested-Arrow construction and no Generate). Parsing batches
    across the whole Arrow batch (spaCy's nlp.pipe amortizes over it; the
    reference's triples path parses one sentence at a time,
    grammatical_triples.py:260).

    ``posrule_filter`` is a Catalyst Column compiled by
    posextract_spark.posrule — applied after the UDF so the optimizer sees
    it (vs the reference's post-hoc python filter at
    grammatical_triples.py:222-229).
    """
    if options is None:
        options = TripleExtractorOptions()
    id_cols = list(id_cols or [])
    provider_kwargs = provider_kwargs or {}
    provider_name = provider

    pruned = df.select(*id_cols, F.col(text_col))
    id_fields = [
        f"`{f.name}` {f.dataType.simpleString()}" for f in pruned.schema.fields[: len(id_cols)]
    ]
    out_schema = ", ".join(
        id_fields + ["sent_id int"] + [f"{name} string" for name in OUTPUT_STRING_FIELDS]
    )
    columns = id_cols + ["sent_id"] + list(OUTPUT_STRING_FIELDS)

    def gen(batches):
        # Lazy per-executor provider (the reference's module-level
        # singleton, util.py:18-22, becomes a process-local cache).
        import gc

        from posextract_spark.parse.provider import get_provider

        prov = get_provider(provider_name, **provider_kwargs)
        # Token._sent <-> Sentence.tokens is a reference cycle, so every
        # batch leaves ~50 cyclic objects per document that only the
        # cyclic collector can free. Under the default thresholds that
        # allocation rate triggers thousands of threshold collections per
        # batch, measured at ~50% of this UDF's CPU (7.5s -> 3.7s per 20k
        # docs with gc off). Disable threshold GC for the task and run ONE
        # explicit collect per batch after the parse forest is unbound:
        # same liberated garbage, one heap walk. Memory stays flat
        # (collect-per-batch measured rss-stable vs +370MB/batch fully
        # disabled). Workers are single-threaded and reused, so the
        # enabled state is restored in the finally.
        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            for pdf in batches:
                texts = pdf[text_col]
                segments_per_doc = [split_quotes_list(t) if t else [] for t in texts]
                flat_segments = [seg for segs in segments_per_doc for seg in segs]
                # lazy parse: Token objects materialize only where the
                # traversal touches them (LazySentence; parity pinned by
                # tests/test_lazy_sentence_parity.py)
                parsed = prov.parse_lazy_batch(flat_segments)

                rows = []
                pos = 0
                # plain-list id columns: Series.iloc per document was
                # ~40x the cost of a list index at batch sizes
                id_values = [pdf[c].tolist() for c in id_cols]
                get_fields = _FIELDS_GETTER
                for r, segs in enumerate(segments_per_doc):
                    ids = tuple(col[r] for col in id_values)
                    for sent_id in range(len(segs)):
                        for flat in extract_triples_one(parsed[pos + sent_id], options=options):
                            rows.append(ids + (sent_id,) + get_fields(flat))
                    pos += len(segs)
                out = pd.DataFrame(rows, columns=columns)
                del parsed, segments_per_doc, flat_segments, rows
                yield out
                del out
                gc.collect()
        finally:
            if gc_was_enabled:
                gc.enable()

    out = pruned.mapInPandas(gen, out_schema)
    if posrule_filter is not None:
        out = out.filter(posrule_filter)
    return out


def parse_documents(
    df: DataFrame,
    text_col: str = "text",
    provider: str = "auto",
    provider_kwargs: Optional[dict] = None,
) -> DataFrame:
    """Materialize the token-array parse as a column (for inspection /
    operators that reuse parses). The triples path does NOT go through this
    (fused UDF avoids shipping trees over Arrow)."""
    pk = provider_kwargs or {}

    @F.pandas_udf(ArrayType(TOKEN_STRUCT))
    def parse_udf(texts: pd.Series) -> pd.Series:
        from posextract_spark.parse.provider import get_provider

        p = get_provider(provider, **pk)
        toks = p.parse_tokens_batch([t if t else "" for t in texts])
        return pd.Series(
            [
                [(t["i"], t["text"], t["lemma"], t["pos"], t["dep"], t["head"]) for t in sent]
                for sent in toks
            ]
        )

    return df.withColumn("tokens", parse_udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# DuckDB oracle for the SVO-provider pipeline (documents corpus).
#
# The SVO chunk parser (posextract_spark.parse.svo) is constructed so that
# the kernel's output over its trees is exactly the window-function query
# below (always rule2; one triple per verb with both a subject and an
# object; per-document first-wins dedup == DISTINCT on an all-lowercase
# corpus). This lets the driver verify the full Spark pipeline
# (UDF -> kernel -> explode) against pure ANSI SQL.
# ---------------------------------------------------------------------------

SVO_TRIPLES_CTE = """
WITH toks AS (
  SELECT doc_id, unnest(ws) AS word,
         unnest(generate_series(1, len(ws))) AS idx
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
ctoks AS (
  SELECT doc_id, word, idx,
    CASE WHEN word IN ('the','a','an') THEN 'DET'
         WHEN word IN ('fast','slow','small','big') THEN 'ADJ'
         WHEN word IN ('scan','merge','join','sort','filter','group','order',
                       'hash','batch','stream','query') THEN 'VERB'
         ELSE 'NOUN' END AS pos
  FROM toks WHERE length(word) > 0
),
marked AS (
  SELECT doc_id, word, idx, pos,
    max(CASE WHEN pos='VERB' THEN idx END) OVER (
      PARTITION BY doc_id ORDER BY idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_verb_idx,
    min(CASE WHEN pos='VERB' THEN idx END) OVER (
      PARTITION BY doc_id ORDER BY idx
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_verb_idx
  FROM ctoks
),
verbs AS (
  SELECT doc_id, idx AS v_idx, word AS verb, prev_verb_idx, next_verb_idx
  FROM marked WHERE pos='VERB'
),
subj AS (
  SELECT v.doc_id, v.v_idx, max(t.idx) AS subj_idx
  FROM verbs v JOIN ctoks t
    ON t.doc_id = v.doc_id AND t.pos = 'NOUN'
   AND t.idx < v.v_idx AND t.idx > COALESCE(v.prev_verb_idx, 0)
  GROUP BY v.doc_id, v.v_idx
),
obj AS (
  SELECT v.doc_id, v.v_idx, min(t.idx) AS obj_idx
  FROM verbs v JOIN ctoks t
    ON t.doc_id = v.doc_id AND t.pos = 'NOUN'
   AND t.idx > v.v_idx AND t.idx < COALESCE(v.next_verb_idx, 2147483647)
  GROUP BY v.doc_id, v.v_idx
),
cand AS (
  SELECT v.doc_id, v.v_idx, v.verb, s.subj_idx, o.obj_idx,
    lag(o.obj_idx) OVER (PARTITION BY v.doc_id ORDER BY v.v_idx) AS prev_obj_idx
  FROM verbs v
  LEFT JOIN subj s ON s.doc_id = v.doc_id AND s.v_idx = v.v_idx
  LEFT JOIN obj o ON o.doc_id = v.doc_id AND o.v_idx = v.v_idx
),
svo_triples AS (
  SELECT DISTINCT c.doc_id, ts.word AS subject, c.verb, tob.word AS object
  FROM cand c
  JOIN ctoks ts ON ts.doc_id = c.doc_id AND ts.idx = c.subj_idx
  JOIN ctoks tob ON tob.doc_id = c.doc_id AND tob.idx = c.obj_idx
  WHERE c.subj_idx IS NOT NULL AND c.obj_idx IS NOT NULL
    AND c.subj_idx IS DISTINCT FROM c.prev_obj_idx
)
"""
