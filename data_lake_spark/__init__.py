"""data_lake_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of the ``jucalp21/data_lake``
reference (a medallion bronze/silver/gold data lake on S3 + Glue + Athena +
Lambda), re-expressed as idiomatic Spark:

- zones        -> Parquet warehouse directories + Spark catalog
- Glue crawler -> schema inference + ``saveAsTable`` / temp views
- Athena SQL   -> ``spark.sql`` / DataFrame logical plans (Catalyst is the IR)
- Lambdas      -> parameterized query functions (``data_lake_spark.api``)
- upsert λ     -> idempotent merge writes with decrease-traceability

plus LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

See SURVEY.md for the operator-by-operator blueprint with reference
file:line citations.
"""

from data_lake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
