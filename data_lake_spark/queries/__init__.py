"""Named query registry — the driver-facing surface.

Each module contributes ``REGISTRY: dict[name, QuerySpec]`` entries; a
QuerySpec pairs the Spark implementation with the equivalent DuckDB oracle
SQL (or ``None`` for non-SQL-expressible operators, which get rows-only
checks). ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over this.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One driver-checkable query: Spark impl + DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


def full_registry() -> dict[str, QuerySpec]:
    from data_lake_spark.queries import (
        api_queries,
        curation,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        quality_q,
        relational,
        relational2,
        relational3,
        relational4,
        sketches,
        temporal,
        temporal2,
        temporal3,
    )

    reg: dict[str, QuerySpec] = {}
    reg.update(relational.REGISTRY)
    reg.update(relational2.REGISTRY)
    reg.update(relational3.REGISTRY)
    reg.update(relational4.REGISTRY)
    reg.update(curation.REGISTRY)
    reg.update(sketches.REGISTRY)
    reg.update(llm.REGISTRY)
    reg.update(llm2.REGISTRY)
    reg.update(llm3.REGISTRY)
    reg.update(llm4.REGISTRY)
    reg.update(llm5.REGISTRY)
    reg.update(quality_q.REGISTRY)
    reg.update(temporal.REGISTRY)
    reg.update(temporal2.REGISTRY)
    reg.update(temporal3.REGISTRY)
    reg.update(api_queries.REGISTRY)
    return reg
