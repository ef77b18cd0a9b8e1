"""Driver-local literal frames without the parallelize tax.

``spark.createDataFrame(small_list)`` ships the rows through an RDD
parallelize job and a Python worker round-trip — ~0.7 s per call in
this environment, paid EVERY call, for frames of a handful of rows
(measured while closing the round-8 ``classifier_train`` bench
excursion; the 4-row result frame was a third of the query's wall
time). :func:`values_df` renders the same rows as a SQL ``VALUES``
literal instead: a pure Catalyst LocalRelation, no job, no Python
worker, ~4× faster, and identical downstream behavior (broadcastable,
foldable).

Scalar columns only — strings, integral/floating types, booleans,
NULLs. Frames with array/struct cells (e.g. the PQ codebook's one-row
array) keep ``createDataFrame``: they are built once per query and the
literal rendering would not be simpler or faster. Doubles render via
``repr`` (shortest round-trip), so values parse back bit-identical —
the ``classifier_train`` oracle pins this.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def _render(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(v, bool):
        lit = "TRUE" if v else "FALSE"
    elif isinstance(v, str):
        lit = "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    elif isinstance(v, float):
        if v != v:  # nan
            lit = "'NaN'"
        elif v in (float("inf"), float("-inf")):
            lit = "'Infinity'" if v > 0 else "'-Infinity'"
        else:
            lit = repr(v)
    elif isinstance(v, int):
        lit = str(v)
    else:
        raise TypeError(f"values_df is scalar-only, got {type(v).__name__}")
    return f"CAST({lit} AS {typ})"


def values_df(
    spark: SparkSession, rows: Sequence[tuple], ddl: str
) -> DataFrame:
    """``createDataFrame(rows, ddl)`` for small SCALAR frames, as a
    VALUES literal — no parallelize job. ``ddl`` is the usual
    ``"name type, name type"`` string (scalar types only: the comma
    split does not understand nested generics). Every cell is CAST to
    its declared type, so the schema is exactly the DDL's regardless
    of the Python values. Empty ``rows`` fall back to an empty
    createDataFrame (VALUES needs at least one row)."""
    fields = []
    for part in ddl.split(","):
        name, typ = part.strip().split(None, 1)
        if "<" in typ:
            raise ValueError(f"values_df is scalar-only: {typ}")
        fields.append((name, typ))
    if not rows:
        return spark.createDataFrame([], ddl)
    # a filtered-out all-NULL sentinel row keeps every column NULLABLE,
    # matching createDataFrame's schema exactly (all-literal VALUES
    # would otherwise infer non-nullable columns and break schema
    # comparisons downstream)
    nulls = ", ".join(f"CAST(NULL AS {typ})" for _, typ in fields)
    rendered = [f"(0, {nulls})"]
    for row in rows:
        if len(row) != len(fields):
            raise ValueError(f"row width {len(row)} != ddl width {len(fields)}")
        cells = ", ".join(
            _render(v, typ) for v, (_, typ) in zip(row, fields)
        )
        rendered.append(f"(1, {cells})")
    cols = ", ".join(
        f"col{i + 2} AS {name}" for i, (name, _) in enumerate(fields)
    )
    return spark.sql(
        f"SELECT {cols} FROM (VALUES {', '.join(rendered)}) WHERE col1 = 1"
    )
