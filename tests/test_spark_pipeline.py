"""Spark-level pipeline tests: explode shape, posrule Column parity,
parallelism invariance."""

from pyspark.sql import functions as F

from posextract_spark.operators.triples import extract_triples
from posextract_spark.operators.pairs import extract_adj_noun_pairs, extract_subj_verb_pairs
from posextract_spark.posrule import parse_posrule_text, to_column


def _docs(spark):
    rows = [
        (0, "Acme acquired Zorin."),
        (1, "Acme did not acquire Zorin."),
        (2, "Acme acquired factories, and mines, and railways."),
        (3, 'Bolt said "Acme acquired Zorin" yesterday.'),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_extract_triples_end_to_end(spark):
    out = extract_triples(
        _docs(spark), text_col="text", id_cols=["doc_id"], provider="template"
    ).collect()
    svo = {(r.doc_id, r.subject, r.verb, r.object) for r in out}
    assert (0, "Acme", "acquired", "Zorin") in svo
    assert (1, "Acme", "acquire", "Zorin") in svo
    assert {(2, "Acme", "acquired", o) for o in ("factories", "mines", "railways")} <= svo
    # quoted segment parsed standalone (split_quotes at segmentation)
    assert (3, "Acme", "acquired", "Zorin") in svo
    assert not [r for r in out if r.doc_id == 4]


def test_sent_id_provenance(spark):
    out = extract_triples(
        _docs(spark).filter(F.col("doc_id") == 3),
        text_col="text",
        id_cols=["doc_id"],
        provider="template",
    ).collect()
    # segments: 'Bolt said ' (0), quote body (1), 'esterday.' remainder (2)
    assert {r.sent_id for r in out} == {1}


def test_posrule_column_filter(spark):
    flt = to_column(parse_posrule_text('MATCH SUBJECT="Acme"; IGNORE VERB="acquire";'))
    out = extract_triples(
        _docs(spark), text_col="text", id_cols=["doc_id"], provider="template",
        posrule_filter=flt,
    ).collect()
    assert out and all(r.subject_token_text == "Acme" for r in out)
    assert all(r.verb_token_text != "acquire" for r in out)


def test_parallelism_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    one = extract_triples(
        docs.repartition(1), text_col="text", id_cols=["doc_id"], provider="svo"
    )
    many = extract_triples(
        docs.repartition(16), text_col="text", id_cols=["doc_id"], provider="svo"
    )
    a = sorted((r.doc_id, r.subject, r.verb, r.object) for r in one.collect())
    b = sorted((r.doc_id, r.subject, r.verb, r.object) for r in many.collect())
    assert a == b and len(a) > 0


def test_pairs_operators(spark):
    df = spark.createDataFrame([(0, "the fast data scan a small table")], "doc_id long, text string")
    adj = extract_adj_noun_pairs(df, id_cols=["doc_id"], provider="svo").collect()
    assert {(r.adjective, r.noun) for r in adj} == {("fast", "data"), ("small", "table")}
    sv = extract_subj_verb_pairs(df, id_cols=["doc_id"], provider="svo").collect()
    assert [(r.subject, r.verb) for r in sv] == [("data", "scan")]
