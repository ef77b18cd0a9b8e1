"""Entity resolution: blocked fuzzy matching.

The classic two-stage ER shape — a cheap BLOCKING key turns the O(N·M)
pair space into per-block equi-join buckets, then an edit-distance
VERIFY pass keeps pairs within threshold. Reference parity: the
reference dedupes records by exact key only (data_lake's upsert path);
fuzzy resolution is a post-reference addition a training-data pipeline
needs for noisy references (OCR'd titles, user-typed names) against a
canonical registry.

Plan shape at 100 TB: the join is a plain hash equi-join on the block
key — no pair space, no nested loop. Levenshtein runs JVM-side
(``F.levenshtein`` is a codegen'd built-in), only on within-block
candidates. Block sizing is the scale knob: a key drawing B rows costs
O(B²) verifies, so compose keys (prefix + length band) until blocks are
bounded; skewed blocks can be salted or capped exactly like the LSH
hot-band cap in textdedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_join(
    dirty: DataFrame,
    clean: DataFrame,
    text_col: str,
    block_col: str,
    max_dist: int,
) -> DataFrame:
    """Join ``dirty`` to ``clean`` on block-key equality, keeping pairs
    with ``levenshtein(dirty.text, clean.text) <= max_dist``. Both
    inputs must carry ``text_col`` and ``block_col``; all other columns
    pass through (clean side suffixed ``_clean``). Returns the matched
    pairs with the distance as ``edit_dist``."""
    c = clean.select(
        *[F.col(cc).alias(f"{cc}_clean") for cc in clean.columns],
    )
    j = dirty.join(
        c, F.col(block_col) == F.col(f"{block_col}_clean"), "inner"
    ).withColumn(
        "edit_dist",
        F.levenshtein(F.col(text_col), F.col(f"{text_col}_clean")),
    )
    return j.filter(F.col("edit_dist") <= max_dist)


def delete_char(col: Column, pos: Column) -> Column:
    """Delete the 1-based ``pos``-th character of ``col`` (identity when
    pos exceeds the string). The deterministic 'typo' generator used by
    the fuzzy_match query's dirty side — both engines express it as the
    same SUBSTR concatenation, so the synthetic noise is bit-identical
    cross-engine."""
    return F.concat(
        F.substring(col, F.lit(1), pos - 1),
        F.substring(col, pos + 1, F.length(col)),
    )
