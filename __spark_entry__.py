"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full named-query registry from
``data_lake_spark.queries`` — one entry per implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions — checked against DuckDB
at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lake_spark.queries import full_registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_lake_spark.queries.relational import q_earnings_by_day

    return q_earnings_by_day(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in full_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in full_registry().items()
        if spec.oracle is not None
    }
