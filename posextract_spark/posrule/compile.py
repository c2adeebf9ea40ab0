"""Compile posrule expression trees to Catalyst Columns / python / SQL.

Variable binding follows the reference exactly (posrule/parser.py:33-40):
SUBJECT -> triple.subject, VERB -> triple.verb, PREDICATE -> triple.object,
evaluated on raw Token.text — hence the ``*_token_text`` columns.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List

from pyspark.sql import Column
from pyspark.sql import functions as F

from posextract_spark.posrule.parser import Equality, Expr, Node, parse_posrule_file

DEFAULT_COLS = {
    "SUBJECT": "subject_token_text",
    "VERB": "verb_token_text",
    "PREDICATE": "object_token_text",
}


def _anchored(pattern: str) -> str:
    """re.match anchors at the start only (reference: parser.py:42-43)."""
    return "^(?:" + pattern + ")"


def to_column(node: Node, cols: Dict[str, str] = None) -> Column:
    cols = cols or DEFAULT_COLS
    if isinstance(node, Equality):
        c = F.col(cols[node.var])
        if node.is_regex:
            return c.rlike(_anchored(node.value))
        return c == F.lit(node.value)
    if node.op == "AND":
        return to_column(node.left, cols) & to_column(node.right, cols)
    if node.op == "OR":
        return to_column(node.left, cols) | to_column(node.right, cols)
    if node.op == "IGNORE":
        return ~to_column(node.left, cols)
    raise ValueError(f"unknown op {node.op}")


def to_sql(node: Node, cols: Dict[str, str] = None) -> str:
    """ANSI SQL (DuckDB-compatible) predicate string."""
    cols = cols or DEFAULT_COLS
    if isinstance(node, Equality):
        col = cols[node.var]
        if node.is_regex:
            pat = _anchored(node.value).replace("'", "''")
            return f"regexp_matches({col}, '{pat}')"
        val = node.value.replace("'", "''")
        return f"{col} = '{val}'"
    if node.op == "AND":
        return f"({to_sql(node.left, cols)} AND {to_sql(node.right, cols)})"
    if node.op == "OR":
        return f"({to_sql(node.left, cols)} OR {to_sql(node.right, cols)})"
    if node.op == "IGNORE":
        return f"(NOT {to_sql(node.left, cols)})"
    raise ValueError(f"unknown op {node.op}")


def to_python_predicate(node: Node) -> Callable:
    """Predicate over kernel TripleExtraction (token .text fields), for
    in-kernel filtering parity with the reference's eval
    (posrule/parser.py:27-72)."""

    def get_target(triple, var: str) -> str:
        tok = {"SUBJECT": triple.subject, "VERB": triple.verb, "PREDICATE": triple.object}[var]
        return tok.text if tok is not None else ""

    def ev(n: Node, triple) -> bool:
        if isinstance(n, Equality):
            target = get_target(triple, n.var)
            if n.is_regex:
                return re.match(n.value, target) is not None
            return n.value == target
        if n.op == "AND":
            return ev(n.left, triple) and ev(n.right, triple)
        if n.op == "OR":
            return ev(n.left, triple) or ev(n.right, triple)
        if n.op == "IGNORE":
            return not ev(n.left, triple)
        raise ValueError(f"unknown op {n.op}")

    return lambda triple: ev(node, triple)


def files_filter_column(paths: List[str], cols: Dict[str, str] = None) -> Column:
    """OR across rule files — any file matching keeps the triple
    (reference: grammatical_triples.py:222-229)."""
    col = None
    for p in paths:
        c = to_column(parse_posrule_file(p), cols)
        col = c if col is None else (col | c)
    if col is None:
        raise ValueError("no posrule files given")
    return col
