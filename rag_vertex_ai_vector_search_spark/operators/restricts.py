"""Restrict predicates over datapoint tables (the Vertex FindNeighbors
filter contract the reference configures, setup_vector_search.py:43-77).

A datapoint row carries
  restricts:         map<string, array<string>>   (categorical)
  numeric_restricts: map<string, bigint>          (numeric)

A query supplies per-namespace allow/deny lists and numeric bounds;
everything compiles to ONE Column predicate of built-in functions
(arrays_overlap / element_at / comparisons), so Catalyst pushes it
below scoring and into the scan where possible -- the reference
filters inside ANN traversal for the same reason (SURVEY §2.2 Q3/Q4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def restrict_predicate(
    allow: dict[str, list[str]] | None = None,
    deny: dict[str, list[str]] | None = None,
    numeric_min: dict[str, int] | None = None,
    numeric_max: dict[str, int] | None = None,
    restricts_col: str = "restricts",
    numeric_col: str = "numeric_restricts",
) -> Column:
    """AND of all supplied restrict clauses; empty spec == keep all.

    allow: namespace -> query allow_list; matches when the row's list
    for that namespace intersects the query's list (Vertex allow-list
    semantics). deny: matches when it does NOT intersect. Rows missing
    a restricted namespace are excluded for allow, kept for deny.
    """
    pred = F.lit(True)
    for ns, values in (allow or {}).items():
        row_list = F.element_at(F.col(restricts_col), ns)
        pred = pred & row_list.isNotNull() & F.arrays_overlap(
            row_list, F.array(*[F.lit(v) for v in values])
        )
    for ns, values in (deny or {}).items():
        row_list = F.element_at(F.col(restricts_col), ns)
        pred = pred & (
            row_list.isNull()
            | ~F.arrays_overlap(row_list, F.array(*[F.lit(v) for v in values]))
        )
    for ns, bound in (numeric_min or {}).items():
        val = F.element_at(F.col(numeric_col), ns)
        pred = pred & val.isNotNull() & (val >= F.lit(bound))
    for ns, bound in (numeric_max or {}).items():
        val = F.element_at(F.col(numeric_col), ns)
        pred = pred & val.isNotNull() & (val <= F.lit(bound))
    return pred
