"""Scalar-function parity layer (SURVEY §2.9) and exact-arithmetic helpers."""

from data_lake_spark.functions.dates import dow_presto, week_presto
from data_lake_spark.functions.exact import (
    avg_exact,
    micros_to_amount,
    sum_exact,
    sum_micros,
)

__all__ = [
    "dow_presto",
    "week_presto",
    "sum_exact",
    "avg_exact",
    "sum_micros",
    "micros_to_amount",
]
