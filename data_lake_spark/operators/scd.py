"""Slowly-changing-dimension type 2 (SCD2) versioning.

The reference's user dimension is overwritten in place on every refresh
(new wins: /root/reference/src/etls/utils/BronzeIngestUsers.py:69-77), so
history is lost — a query asking "which office was this model in when the
earnings row landed" cannot be answered. SCD2 keeps every version with a
validity interval instead; the as-of join (operators/asof.py) then
answers point-in-time questions against it.

Spark-first shape: one window pass over (current ∪ updates) per key —
no per-record driver loop, no MERGE dependency; idempotent because
versioning is a pure function of the unioned rows. At scale this is one
shuffle on the business key, and the dimension is dim-sized anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
    open_end=OPEN_END,
) -> DataFrame:
    """Fold ``updates`` (key, attrs, eff_date) into an SCD2 ``current``
    (key, attrs, valid_from, valid_to, is_current).

    Semantics:
    - a brand-new key opens its first version at its eff_date;
    - a changed attribute tuple closes the open version the day the
      change becomes effective and opens a new one;
    - an update identical to the key's latest version is a no-op
      (idempotent re-runs);
    - multiple updates for one key apply in eff_date order.
    """
    upd = updates.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(eff_col).alias("valid_from"),
    )
    base = current.select(key, *attrs, "valid_from")
    allv = base.unionByName(upd)

    w = Window.partitionBy(key).orderBy("valid_from")
    # collapse consecutive identical attribute tuples (no-op updates);
    # unit-separator delimiter: bare concat would collide ("ab","c")/("a","bc")
    sig = F.concat_ws(chr(31), *[F.col(a).cast("string") for a in attrs])
    dedup = (
        allv.withColumn("__sig", sig)
        .withColumn("__prev_sig", F.lag("__sig").over(w))
        .filter(
            F.col("__prev_sig").isNull() | (F.col("__sig") != F.col("__prev_sig"))
        )
        .drop("__sig", "__prev_sig")
    )
    nxt = F.lead("valid_from").over(w)
    return (
        dedup.withColumn("valid_to", F.coalesce(nxt, F.lit(open_end)))
        .withColumn("is_current", (F.col("valid_to") == open_end).cast("long"))
    )


def asof_dim_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    date_col: str,
) -> DataFrame:
    """Point-in-time dimension resolution: each fact row joins the dim
    version whose [valid_from, valid_to) interval contains its date.
    Equi-join on the key + interval filter; the dim is broadcast (it is
    dim-sized by construction), so facts never shuffle."""
    return facts.join(F.broadcast(dim), key).filter(
        (F.col(date_col) >= F.col("valid_from"))
        & (F.col(date_col) < F.col("valid_to"))
    )
