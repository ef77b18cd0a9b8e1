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

from decimal import Decimal as _Decimal
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def _render(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(v, bool):
        lit = "TRUE" if v else "FALSE"
    elif isinstance(v, str):
        # plain printable-ASCII strings render as plain literals; any
        # string containing a quote, backslash, control char, or
        # non-ASCII renders as unhex(<utf-8 hex>) instead — escaping
        # rules DIFFER between Spark's default parser and the legacy
        # spark.sql.parser.escapedStringLiterals=true raw mode (where
        # a lone quote is not even representable in a '...' literal),
        # while the hex form parses identically under both and still
        # folds to a LocalRelation
        if all(32 <= ord(c) < 127 and c not in "'\"\\" for c in v):
            lit = "'" + v + "'"
        else:
            lit = f"CAST(unhex('{v.encode('utf-8').hex()}') AS STRING)"
    elif isinstance(v, float):
        if v != v:  # nan
            lit = "'NaN'"
        elif v in (float("inf"), float("-inf")):
            lit = "'Infinity'" if v > 0 else "'-Infinity'"
        else:
            # 'D' suffix: parse as a DOUBLE literal, not a DECIMAL one.
            # Bare `-0.0` parses as Decimal — which has no signed zero —
            # so the sign bit dies before the CAST; `-0.0D` keeps it.
            # repr is shortest-round-trip, so non-zero values parse back
            # bit-identical either way.
            lit = repr(v) + "D"
    elif isinstance(v, int):
        lit = str(v)
    elif isinstance(v, _Decimal):
        lit = f"'{v}'"  # exact decimal string, CAST does the scaling
    else:
        raise TypeError(f"values_df is scalar-only, got {type(v).__name__}")
    return f"CAST({lit} AS {typ})"


def _split_ddl(ddl: str) -> list[str]:
    """Split a DDL column list on TOP-LEVEL commas only, so
    parameterized scalar types — ``decimal(10,2)`` — parse as one
    field instead of two broken ones. '<' (nested generics) is still
    rejected by the caller; '(' only ever opens a type's precision
    list in scalar DDL."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(ddl):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(ddl[start:i])
            start = i + 1
    parts.append(ddl[start:])
    return parts


def values_df(
    spark: SparkSession, rows: Sequence[tuple], ddl: str
) -> DataFrame:
    """``createDataFrame(rows, ddl)`` for small SCALAR frames, as a
    VALUES literal — no parallelize job. ``ddl`` is the usual
    ``"name type, name type"`` string, scalar types only (nested
    generics are rejected; parameterized scalars like
    ``decimal(10,2)`` are fine). Every cell is CAST to its declared
    type, so the schema is exactly the DDL's regardless of the Python
    values. Empty ``rows`` fall back to an empty createDataFrame
    (VALUES needs at least one row). Strings needing escapes render
    via ``unhex`` (see ``_render``), so values round-trip
    bit-identical under BOTH the default parser and the legacy
    ``spark.sql.parser.escapedStringLiterals`` raw mode."""
    fields = []
    for part in _split_ddl(ddl):
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
