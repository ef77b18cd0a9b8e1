"""Order-insensitive table checksums for migration reconciliation.

Validating a copy/rewrite at 100 TB must not sort: a checksum that is a
COMMUTATIVE reduction of per-row hashes compares two tables with one
map-side-combinable aggregate each, any partitioning, no shuffle of data
rows. This is how you prove a zone rewrite (compaction, z-order,
format change, cluster migration) preserved content exactly.

Recipe: per row, xxhash64 over the chosen columns (null-tagged so
``(null)`` and ``('')`` differ); the table digest is (row_count,
SUM(hash) wrapped to 64 bits, BIT_XOR(hash)). Sum and xor are both
order- and partitioning-independent; carrying both makes collisions by
coincidence (one matching, not the other) vanishingly unlikely.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_hash(df: DataFrame, cols: Optional[Sequence[str]] = None):
    """64-bit content hash per row over ``cols`` (default: all, sorted by
    name so column order differences don't change the digest).

    Nulls are hashed as an out-of-band per-column null-indicator argument
    (not an in-band sentinel string), so a genuine string value can never
    collide with NULL. Values are still compared as strings, so
    same-schema reconciliation is exact; cross-type coincidences (int 1
    vs string '1') remain equal by design — this checksums content, not
    schema (pair with a schema check when types matter)."""
    use = sorted(cols if cols is not None else df.columns)
    parts = []
    for c in use:
        parts.append(F.col(c).isNull().cast("string"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    return F.xxhash64(*parts)


def table_checksum(
    df: DataFrame, cols: Optional[Sequence[str]] = None
) -> dict[str, int]:
    """One aggregate pass → {n_rows, hash_sum, hash_xor}."""
    h = row_hash(df, cols)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # sum in decimal(38) then wrap to 64 bits — overflow-safe at any
        # row count, partition-order independent
        F.sum(h.cast("decimal(38,0)")).alias("s"),
        F.bit_xor(h).alias("x"),
    ).collect()[0]
    wrapped = int(row["s"] or 0) % (1 << 64)
    return {
        "n_rows": int(row["n"]),
        "hash_sum": wrapped,
        "hash_xor": int(row["x"] or 0) & ((1 << 64) - 1),
    }


def tables_equal(
    a: DataFrame, b: DataFrame, cols: Optional[Sequence[str]] = None
) -> bool:
    """Content equality as multisets of rows (order/partitioning/file
    layout irrelevant). Two aggregate jobs, zero row shuffles."""
    return table_checksum(a, cols) == table_checksum(b, cols)
