"""Presto/Athena ↔ Spark date-function parity (SURVEY §2.9, §4).

The reference's queries run on Athena (Presto dialect), where
``day_of_week`` is ISO (1=Monday … 7=Sunday) — e.g.
``/root/reference/src/lambdas/earnings/earningsByDayOfWeek.py:123``.
Spark's ``dayofweek`` is 1=Sunday … 7=Saturday, so a rebuilt query that
used it verbatim would bucket every row into the wrong weekday. These
wrappers encode the shift once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dow_presto(col: Column | str) -> Column:
    """ISO day-of-week: 1=Monday … 7=Sunday (Presto ``day_of_week``).

    Spark dayofweek: Sun=1..Sat=7 → shift: ((dow + 5) % 7) + 1.
    """
    c = F.col(col) if isinstance(col, str) else col
    return ((F.dayofweek(c) + 5) % 7 + 1).cast("long")


def week_presto(col: Column | str) -> Column:
    """ISO week number — Presto ``WEEK()`` and Spark ``weekofyear`` are both
    ISO-8601, so this is a pass-through kept for intent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.weekofyear(c).cast("long")
