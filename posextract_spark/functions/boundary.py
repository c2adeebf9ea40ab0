"""Materialization boundary for multi-referenced expensive expressions.

The trap (measured twice in this repo — minhash in r1, corpus_quality_filter
in r3): building several output Columns from the same Python ``Column``
object pastes an independent COPY of its expression tree into every use
site, and nothing downstream merges them — Catalyst has no optimizer-level
CSE, and higher-order-function lambdas force interpreted projection
evaluation where codegen subexpression elimination never runs. The r3
``corpus_quality_filter`` plan evaluated ``split(text)`` 32x per row
(28.6s vs ~3s at 200k docs); ``simhash`` evaluated md5-per-word 32x.

A plain ``withColumn`` barrier is NOT a guarantee either: CollapseProject
inlines project-over-project (it currently keeps non-cheap multi-referenced
aliases separate, but that is a heuristic, config-dependent via
``collapseProjectAlwaysInline``). A Generate IS a hard materialization
point: its generator expression is evaluated exactly once per input row and
downstream projections reference the generated attribute. ``explode`` of a
1-element array preserves cardinality exactly (never null, never empty),
so the boundary is free row-wise; the arrays it materializes would be
built anyway — once — by the consuming expressions.

Used by operators/textops.py (word array) and operators/dedup.py (per-word
hash array); tests/test_plan_shape.py pins the resulting expression counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def materialize(df: DataFrame, **cols: Column) -> DataFrame:
    """Append ``cols`` computed ONCE per row behind a Generate boundary.

    All expressions are packed into a single one-element-array explode so
    one Generate materializes every column; each output column is then a
    cheap struct-field reference that downstream Columns (and CollapseProject)
    may duplicate freely.
    """
    tmp = "__mat"
    clash = ({tmp} | set(cols)) & set(df.columns)
    if clash:
        raise ValueError(
            f"materialize: output name(s) {sorted(clash)} already exist on the "
            "input DataFrame — pick unused names (duplicate columns would "
            "make every downstream reference ambiguous)"
        )
    packed = F.explode(F.array(F.struct(*[c.alias(n) for n, c in cols.items()])))
    g = df.select("*", packed.alias(tmp))
    return g.select("*", *[F.col(f"{tmp}.{n}").alias(n) for n in cols]).drop(tmp)
