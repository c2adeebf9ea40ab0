"""Feature-hash document embeddings (operators/similarity.py hash_embed):
SRP semantics (similar bags -> similar vectors), exact integer contract,
empty-doc zero vector, end-to-end text ANN, and DuckDB-mirror parity."""

import random

import duckdb
import pandas as pd
import pytest

from posextract_spark.operators.similarity import (
    hash_embed,
    hash_embed_sql,
    hash_embed_topk,
    hash_embed_topk_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_embedding_shape_and_determinism(spark):
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, ""), (4, "zz")]
    out = {r["doc_id"]: r.asDict() for r in hash_embed(_docs(spark, rows), dim=16).collect()}
    # identical text -> identical embedding (content-deterministic)
    assert out[1]["embedding"] == out[2]["embedding"]
    assert out[1]["n_tokens"] == 3
    # empty doc -> zero vector
    assert out[3]["embedding"] == [0] * 16 and out[3]["n_tokens"] == 0
    # single token -> every component is exactly +-1
    assert all(abs(v) == 1 for v in out[4]["embedding"])
    # parity bound: |emb[j]| <= n_tokens and emb[j] == n_tokens (mod 2)
    for d in (1, 2):
        for v in out[d]["embedding"]:
            assert abs(v) <= 3 and (v - 3) % 2 == 0


def test_similar_bags_embed_closer(spark):
    """The SRP property the embedding exists for: overlapping bags land
    closer in cosine than disjoint ones."""
    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(27)) + " x1 x2 x3"
    far = " ".join(f"zzz{i}" for i in range(30))
    rows = [(0, base), (1, near), (2, far)]
    top = hash_embed_topk(_docs(spark, rows), query_id=0, k=3, dim=32).collect()
    order = [r["doc_id"] for r in top]
    assert order == [0, 1, 2]  # self, near-duplicate, unrelated
    sims = {r["doc_id"]: r["sim_e6"] for r in top}
    assert sims[0] == 1000000  # self-similarity exactly 1
    assert sims[1] > 700000 > sims[2]


def test_dim_validation(spark):
    with pytest.raises(ValueError):
        hash_embed(_docs(spark, [(1, "a")]), dim=61)
    with pytest.raises(ValueError):
        hash_embed(_docs(spark, [(1, "a")]), dim=0)
    with pytest.raises(ValueError):
        hash_embed_topk(_docs(spark, [(1, "a")]), query_id=99)


def test_duckdb_parity(spark):
    rng = random.Random(47)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(100)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = _docs(spark, rows)
    con = duckdb.connect()
    con.register("documents", pdf)
    got = (
        hash_embed(docs, dim=24).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        con.execute("WITH " + hash_embed_sql(dim=24))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert [list(e) for e in got["embedding"]] == [list(e) for e in want["embedding"]]
    gt = (
        hash_embed_topk(docs, query_id=0, k=15, dim=24)
        .toPandas()
        .reset_index(drop=True)
    )
    wt = con.execute(hash_embed_topk_sql(query_id=0, k=15, dim=24)).df().reset_index(drop=True)
    con.close()
    assert gt["doc_id"].tolist() == wt["doc_id"].tolist()
    assert gt["sim_e6"].tolist() == wt["sim_e6"].tolist()


def test_hash_embed_is_scan_side(spark):
    """The embedding is a pure projection: no Exchange, no Python, one
    Generate boundary pair (word split + hash materialization)."""
    docs = _docs(spark, [(1, "a b c"), (2, "d e")])
    plan = (
        hash_embed(docs, dim=8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_idf_weighting_downweights_stopwords(spark):
    """The point of the idf variant: a doc sharing only STOPWORDS with
    the query ranks below a doc sharing distinctive terms, even when the
    stopword overlap is larger; unweighted SRP gets this wrong by
    construction (every token votes +-1 equally)."""
    from posextract_spark.operators.similarity import cosine_topk, hash_embed_idf

    stop = "the of and in to is was it on as"          # in EVERY doc -> df = N
    rows = [
        (0, stop + " quantum entanglement spectroscopy"),
        # shares the distinctive terms, few stopwords
        (1, "quantum entanglement spectroscopy results"),
        # shares ONLY the ubiquitous stopwords, in bulk
        (2, stop + " " + stop + " " + stop + " pottery"),
    ] + [
        # filler docs so df(stopwords) >> df(distinctive terms)
        (10 + i, stop + f" filler{i} words here") for i in range(12)
    ]
    docs = _docs(spark, rows)
    emb = hash_embed_idf(docs, dim=48)
    qv = [float(x) for x in emb.filter("doc_id = 0").collect()[0]["embedding"]]
    order = [
        r["doc_id"]
        for r in cosine_topk(emb, qv, k=3, id_col="doc_id", vec_col="embedding").collect()
    ]
    assert order[0] == 0          # self
    assert order[1] == 1          # distinctive-term overlap wins...
    assert 2 not in order[:2]     # ...over bulk stopword overlap


def test_idf_embed_duckdb_parity_and_empty_docs(spark):
    import duckdb

    from posextract_spark.operators.similarity import hash_embed_idf, hash_embed_idf_sql

    rng = random.Random(19)
    vocab = ["the", "of"] + [f"w{k}" for k in range(15)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(80)
    ]
    rows[5] = (5, "")  # force an empty doc
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = _docs(spark, rows)
    got = hash_embed_idf(docs, dim=20).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute("WITH " + hash_embed_idf_sql(dim=20))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert [list(e) for e in got["embedding"]] == [list(e) for e in want["embedding"]]
    empty = got[got.doc_id == 5].iloc[0]
    assert empty["n_tokens"] == 0 and list(empty["embedding"]) == [0] * 20


def test_passage_search_finds_the_matching_chunk(spark):
    """Chunk -> embed -> top-k composition: the chunk sharing the query
    chunk's vocabulary outranks chunks from the same doc with different
    vocabulary."""
    from pyspark.sql import functions as F

    from posextract_spark.operators.similarity import hash_embed_topk
    from posextract_spark.operators.textops import chunk_documents

    part_a = " ".join(f"alpha{j}" for j in range(32))   # doc0 chunk0 vocab
    part_b = " ".join(f"beta{j}" for j in range(32))    # doc0 chunk1+ vocab
    rows = [
        (0, part_a + " " + part_b),
        (1, part_a),      # pure chunk-0-vocab doc -> its chunk must rank top-2
        (2, part_b),      # pure chunk-1-vocab doc
        (3, " ".join(f"gamma{j}" for j in range(40))),  # unrelated
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )
    ch = chunk_documents(docs, chunk_size=32, overlap=0)
    p = ch.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("pid"), "chunk_text"
    )
    top = hash_embed_topk(p, query_id=0, k=4, dim=32, text_col="chunk_text", id_col="pid")
    order = [(r["pid"] // 1000, r["pid"] % 1000) for r in top.collect()]
    assert order[0] == (0, 0)            # the query chunk itself
    assert order[1] == (1, 0)            # same-vocab chunk from doc 1
    assert (3, 0) not in order[:3]       # unrelated doc ranks last
