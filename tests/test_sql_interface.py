"""Athena-style SQL-string interface: a reference user who writes SQL
(every lambda builds Presto SQL strings) can run the same queries through
``spark.sql`` over registered views and get identical results to the
DataFrame API."""

from __future__ import annotations

from data_lake_spark.catalog import register_views
from data_lake_spark.queries.relational import q_earnings_by_day


def test_sql_interface_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd') AS report_date,
               CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 AS total_amount
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(o_orderdate AS DATE)
              BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
          AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY 1
        ORDER BY 1
        """
    ).collect()
    via_df = q_earnings_by_day(spark, sf_dir).collect()
    assert via_sql == via_df  # bit-identical, not approx


def test_two_part_names(spark, sf_dir):
    # Athena addresses tables as "db"."table"; temp views give the
    # single-part equivalent and catalog databases the two-part one
    register_views(spark, sf_dir)
    n = spark.sql("SELECT COUNT(*) AS c FROM orders").first().c
    assert n > 0
