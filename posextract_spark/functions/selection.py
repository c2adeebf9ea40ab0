"""Deterministic argmax selection — THE one implementation.

Six operators pick "the row with the highest count/weight/vote, ties
broken by MINIMUM value" (fuse_functional_relations, contested_facts'
top and runner, truth_discovery, fuse_weighted, fact_history). The rule
is encoded as a single ``F.min`` over a struct whose first field is the
NEGATED order — map-side combinable (a plain aggregate, never a ranking
Window, which would serialize a hot group onto one task) and a total
order, so the winner is a pure function of the input on every executor.

Like functions/capping.py: the policy previously lived in six
near-identical struct literals; drift between copies is how one surface
silently changes the tie-break and stops matching its DuckDB mirror
(mirrors encode the same rule as ``ORDER BY order DESC, value ASC``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def argmax_min_tie(order: Column, value: Column, *carry: Column) -> Column:
    """Aggregation Column selecting the group's row with MAXIMUM ``order``,
    ties broken by MINIMUM ``value``.

    Returns a struct with fields ``neg`` (= -order), ``v`` (= value) and
    ``c0``, ``c1``, ... for each ``carry`` column. Read the winner back as
    ``F.col("m.v")`` / ``(-F.col("m.neg"))`` / ``F.col("m.c0")``.

    ``carry`` columns ride along un-compared as long as (order, value) is
    unique within the group — true at every call site, where ``value`` is
    the group's distinct candidate key. ``order`` must be a numeric type
    whose negation is exact (BIGINT fixed-point everywhere here).
    """
    fields = [(-order).alias("neg"), value.alias("v")]
    fields += [c.alias(f"c{i}") for i, c in enumerate(carry)]
    return F.min(F.struct(*fields))
