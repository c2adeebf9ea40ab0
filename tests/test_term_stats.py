"""term_stats (operators/textops.py): brute mirror + DuckDB parity."""

import duckdb
import pandas as pd

from posextract_spark.operators.textops import term_stats, term_stats_sql


def brute(rows, min_df=1, lowercase=True):
    from collections import Counter, defaultdict

    tf = Counter()
    docs_of = defaultdict(set)
    for doc_id, text in rows:
        for w in (text.lower() if lowercase else text).split(" "):
            if not w:
                continue
            tf[w] += 1
            docs_of[w].add(doc_id)
    return sorted(
        (t, len(docs_of[t]), tf[t]) for t in tf if len(docs_of[t]) >= min_df
    )


ROWS = [
    (1, "The cat sat on the MAT"),
    (2, "the dog  sat"),          # double space -> empty token dropped
    (3, "mat MAT mat"),
    (4, "tab\tsep x"),            # SINGLE-SPACE split: tab stays in-token
    (5, "tab\tsep y"),
]


def test_term_stats_semantics_and_mirror(spark):
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text"])
    got = sorted(
        tuple(r)
        for r in term_stats(spark.createDataFrame(pdf), min_df=2).collect()
    )
    assert got == brute(ROWS, min_df=2)
    by = {r[0]: r for r in got}
    # case folding merges The/the; df counts DOCS, tf counts occurrences
    assert by["the"][1:] == (2, 3)
    assert by["mat"][1:] == (2, 4)
    assert by["sat"][1:] == (2, 2)
    assert "dog" not in by  # df=1 < min_df
    # the tab-joined token reaches df=2 AS ONE TOKEN; an all-whitespace
    # splitter would emit tab/sep separately and fail both asserts
    assert by["tab\tsep"][1:] == (2, 2)
    assert "tab" not in by and "sep" not in by
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH d AS (SELECT 1)" + term_stats_sql("docs", min_df=2)
        ).fetchall()
    )
    assert got == want
