"""Distribution-drift arithmetic shared by the batch monitor
(queries/tsmon_q.q_dist_drift) and the streaming face
(streaming/incremental.start_drift_monitor).

Why not PSI: PSI's ln(p/q) is libm-dependent (ln is not required to be
correctly rounded), so the cross-engine hash gate would flake. The L1
term |p−q| and the chi-square-style term (p−q)²/(p+q) are the standard
substitutes and stay INTEGER-exact end to end: counts are int64, shares
are floored micro-shares via the digit-split long division
(functions/exact.micro_share_sql — int64-safe past 9.2e12 rows), and
(p−q)² ≤ 10¹² keeps the chi² numerator int64. Identical integers on any
engine and any partitioning — no float step at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_spark.functions.exact import micro_share_guarded_sql


def drift_report(binned: DataFrame) -> DataFrame:
    """(bin, a_cnt, b_cnt) → per-bin drift terms + one TOTAL row
    (bin = -1) summing them into the two headline statistics (L1
    distance and 2× triangular discrimination).

    The input frame is BIN-sized (bounded by construction — the caller
    aggregated the data down to it), so the share windows and the
    total re-aggregate ride a frame of dozens of rows; nothing here
    touches data volume."""
    w = Window.partitionBy()
    shared = (
        # an EMPTY cohort (a_tot/b_tot = 0) is a legitimate monitor input
        # (e.g. reference window before any data landed) — guarded shares
        # (mleval_q convention: 0) keep Spark and the oracle in agreement
        # instead of NULL-vs-division-error divergence
        binned.withColumn("a_tot", F.sum("a_cnt").over(w))
        .withColumn("b_tot", F.sum("b_cnt").over(w))
        .withColumn(
            "a_micro", F.expr(micro_share_guarded_sql("a_cnt", "a_tot"))
        )
        .withColumn(
            "b_micro", F.expr(micro_share_guarded_sql("b_cnt", "b_tot"))
        )
        .withColumn("l1_micro", F.abs(F.col("a_micro") - F.col("b_micro")))
        .withColumn(
            "chi2_micro",
            F.when(
                F.col("a_micro") + F.col("b_micro") > 0,
                F.expr(
                    "((a_micro - b_micro) * (a_micro - b_micro))"
                    " div (a_micro + b_micro)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    detail = shared.select(
        "bin", "a_cnt", "b_cnt", "a_micro", "b_micro",
        "l1_micro", "chi2_micro",
    )
    total = (
        shared.groupBy()
        .agg(
            F.sum("a_cnt").alias("a_cnt"),
            F.sum("b_cnt").alias("b_cnt"),
            F.sum("a_micro").alias("a_micro"),
            F.sum("b_micro").alias("b_micro"),
            F.sum("l1_micro").alias("l1_micro"),
            F.sum("chi2_micro").alias("chi2_micro"),
        )
        .select(
            F.lit(-1).cast("long").alias("bin"),
            "a_cnt", "b_cnt", "a_micro", "b_micro",
            "l1_micro", "chi2_micro",
        )
    )
    return detail.unionByName(total).orderBy("bin")
