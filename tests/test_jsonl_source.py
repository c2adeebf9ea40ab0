"""JSONL document source (sources/jsonl.py): declared-schema read,
corrupt-line quarantine, field mapping, operator compatibility."""

import json

from posextract_spark.sources.jsonl import (
    jsonl_corrupt_records,
    read_documents_jsonl,
)


def _write_jsonl(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_reads_documents_shape(spark, tmp_path):
    p = str(tmp_path / "dump.jsonl")
    _write_jsonl(
        p,
        [
            json.dumps({"id": 1, "text": "alpha beta gamma", "lang": "en", "source": "s0"}),
            json.dumps({"id": 2, "text": "delta", "lang": "de", "source": "s1"}),
        ],
    )
    df = read_documents_jsonl(spark, p)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].n_chars == len("alpha beta gamma")
    assert rows[2].lang == "de"


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = str(tmp_path / "dump.jsonl")
    _write_jsonl(
        p,
        [
            json.dumps({"id": 1, "text": "good", "lang": "en", "source": "s"}),
            "{broken json",
            json.dumps({"id": 3, "text": "also good", "lang": "en", "source": "s"}),
        ],
    )
    clean = read_documents_jsonl(spark, p)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 3]
    bad = jsonl_corrupt_records(spark, p).collect()
    assert len(bad) == 1 and "{broken json" in bad[0].line


def test_jsonl_drop_set_parity_on_type_corrupt_secondary_field(spark, tmp_path):
    """ADVICE r7: a line whose id parses but whose SECONDARY field is
    type-odd must not vanish from BOTH views. With the relaxed drop
    predicate (id IS NULL only) the clean reader KEEPS such lines —
    Spark string-coerces a JSON object into a StringType field, so the
    row survives with the raw JSON text — and the quarantine correctly
    excludes them; clean + quarantine together account for every input
    line (the old `_corrupt_record IS NULL` conjunct could drop a line
    the quarantine could not see)."""
    p = str(tmp_path / "dump.jsonl")
    _write_jsonl(
        p,
        [
            json.dumps({"id": 1, "text": "good", "lang": "en", "source": "s"}),
            json.dumps({"id": 2, "text": "typey", "lang": {"not": "a string"}, "source": "s"}),
            "{broken json",
            json.dumps({"id": "abc", "text": "bad id", "lang": "en", "source": "s"}),
        ],
    )
    clean = read_documents_jsonl(spark, p)
    rows = {r.doc_id: r for r in clean.collect()}
    assert sorted(rows) == [1, 2]
    assert rows[2].text == "typey" and json.loads(rows[2].lang) == {"not": "a string"}
    bad = [r.line for r in jsonl_corrupt_records(spark, p).collect()]
    assert len(bad) == 2
    assert any("{broken json" in l for l in bad)
    assert any('"abc"' in l for l in bad)
    # every input line is in exactly one view
    assert len(rows) + len(bad) == 4


def test_jsonl_field_map_renames_producer_fields(spark, tmp_path):
    p = str(tmp_path / "dump.jsonl")
    # producer uses 'id'/'text' but we map source->source differently is
    # the default; here exercise an explicit identity-with-rename map
    _write_jsonl(
        p,
        [json.dumps({"id": 7, "text": "x y z", "lang": "en", "source": "web"})],
    )
    df = read_documents_jsonl(
        spark, p,
        field_map={"id": "doc_id", "text": "text", "lang": "lang", "source": "source"},
    )
    [r] = df.collect()
    assert (r.doc_id, r.source) == (7, "web")


def test_jsonl_feeds_existing_operators(spark, tmp_path):
    from posextract_spark.operators.textops import token_count

    p = str(tmp_path / "dump.jsonl")
    _write_jsonl(
        p,
        [json.dumps({"id": 1, "text": "a b c d", "lang": "en", "source": "s"})],
    )
    docs = read_documents_jsonl(spark, p)
    [r] = token_count(docs).select("doc_id", "n_tokens").collect()
    assert (r.doc_id, r.n_tokens) == (1, 4)


def test_jsonl_write_read_round_trip(spark, tmp_path):
    from pyspark.sql import functions as F

    from posextract_spark.sources.jsonl import write_documents_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "export")
    write_documents_jsonl(docs, p, n_shards=4)
    back = read_documents_jsonl(spark, p + "/*.json")
    want = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in docs.select("doc_id", "text", "lang", "source", "n_chars").collect()
    }
    got = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in back.collect()
    }
    assert got == want
    assert jsonl_corrupt_records(spark, p + "/*.json").count() == 0
