"""Exact (order-independent) floating aggregation.

Summing doubles is order-dependent in every distributed engine: the shuffle
partitioning decides the addition order, so two runs (or two engines) can
differ in the last bits. For money-like metrics we make the sum exact and
associative instead:

1. per-row arithmetic stays in IEEE double — bit-identical everywhere;
2. quantize deterministically: ``floor(x * 10^scale)`` — floor of a double
   is exact, no rounding-mode ambiguity (unlike double→decimal casts,
   which engines implement differently);
3. SUM the resulting integers — exact and associative, so partition order
   can't change the result;
4. convert back to double and divide by 10^scale at the end — both steps
   IEEE-deterministic.

The same recipe is mirrored textually in the DuckDB oracle SQL
(:func:`oracle_sum_micros`), so results are bit-identical across engines
AND across cluster sizes — a reproducibility property worth having at
100 TB, not just for tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1e6 resolves 2-dp money values and their products comfortably.
MONEY_SCALE = 1_000_000.0


def sum_micros(col: Column | str, scale: float = MONEY_SCALE) -> Column:
    """Order-independent SUM as integer micro-units (long).

    Keep results in micros while re-aggregating (sums of sums stay exact);
    convert with :func:`micros_to_amount` only at the output edge.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * F.lit(scale)))


def micros_to_amount(col: Column | str, scale: float = MONEY_SCALE) -> Column:
    """micros (long) → double amount; deterministic long→double + divide."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double") / F.lit(scale)


def sum_exact(col: Column | str, scale: float = MONEY_SCALE) -> Column:
    """Order-independent SUM of a double expression, returned as double."""
    return micros_to_amount(sum_micros(col, scale), scale)


def avg_exact(col: Column | str, scale: float = MONEY_SCALE) -> Column:
    """Order-independent AVG: exact micros sum / exact count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return micros_to_amount(sum_micros(c, scale), scale) / F.count(c)


# --- DuckDB oracle mirrors (same ops, same textual order) -----------------


def oracle_sum_micros(expr: str, scale: str = "1000000.0") -> str:
    return f"SUM(CAST(FLOOR(({expr}) * {scale}) AS BIGINT))"


def oracle_sum_exact(expr: str, scale: str = "1000000.0") -> str:
    return f"CAST({oracle_sum_micros(expr, scale)} AS DOUBLE) / {scale}"


def micro_share_sql(num: str, den: str, scale: int = 1_000_000) -> str:
    """Floored micro-share ``floor(num·scale / den)`` with genuine int64
    headroom at any corpus size. The naive ``num·scale`` overflows int64
    past num ~9.2e12 (a 100 TB corpus holds ~2.5e13 tokens), and for
    shares (num ≤ den) a single quotient/remainder split degenerates to
    exactly that naive product, so the scale is applied as two long-
    division digit steps of 10³ each (the ``_epochs_micro`` recipe in
    dq_q.py):

        floor(n·10⁶/d) = (n div d)·10⁶
                       + ((n%d)·10³ div d)·10³
                       + (((n%d)·10³ % d)·10³) div d

    Every intermediate is ≤ max(num, den·10³) — safe while den ≤ ~9.2e15.
    Spark spelling (``div``); oracles take :func:`oracle_micro_share_sql`,
    the same text with ``//`` — both floor identically on nonnegative
    inputs."""
    if scale != 1_000_000:
        raise ValueError("micro_share_sql digit split is fixed at scale=10^6")
    r = f"(({num}) % ({den}))"
    r2 = f"(({r} * 1000) % ({den}))"
    return (
        f"(({num}) div ({den})) * {scale}"
        f" + (({r} * 1000) div ({den})) * 1000"
        f" + ({r2} * 1000) div ({den})"
    )


def oracle_micro_share_sql(num: str, den: str, scale: int = 1_000_000) -> str:
    """DuckDB spelling of :func:`micro_share_sql` (``//`` for ``div``)."""
    return micro_share_sql(num, den, scale).replace(" div ", " // ")


def micro_share_guarded_sql(num: str, den: str, scale: int = 1_000_000) -> str:
    """:func:`micro_share_sql` with the degenerate-denominator guard
    (the mleval_q convention: ``den <= 0`` → 0). Needed wherever the
    denominator can legitimately be 0 at some data shape — Spark's
    non-ANSI ``div`` would yield NULL there while DuckDB ``//`` raises
    a division-by-zero error, so an unguarded share breaks cross-engine
    parity exactly on the degenerate input."""
    return (
        f"CASE WHEN ({den}) > 0"
        f" THEN {micro_share_sql(num, den, scale)} ELSE 0 END"
    )


def oracle_micro_share_guarded_sql(
    num: str, den: str, scale: int = 1_000_000
) -> str:
    """DuckDB spelling of :func:`micro_share_guarded_sql`."""
    return micro_share_guarded_sql(num, den, scale).replace(" div ", " // ")
