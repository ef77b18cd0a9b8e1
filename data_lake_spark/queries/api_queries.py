"""Driver-gate bindings for the 8 serving-layer endpoints (SURVEY §3.1).

Each entry applies an ``api.endpoints`` function to the reference-domain
adapters over the testdata (``api.domain``) with fixed parameters, paired
with a DuckDB oracle that mirrors BOTH the adapters (shared CTE prefix)
and the endpoint semantics — so the whole serving path is end-to-end
oracle-checked, not just the relational core underneath it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_lake_spark.api import endpoints as ep
from data_lake_spark.api.domain import (
    ADAPTERS_SQL,
    earnings_by_performer,
    jasmin_performance,
    streamate_performance,
    users_dim,
)
from data_lake_spark.queries import QuerySpec

_SUM_M = "SUM(CAST(FLOOR((total_earnings) * 1000000.0) AS BIGINT))"
_LOC = "(office = 'BUILDING' OR city = 'NATION_3')"


def _tables(spark: SparkSession, sf_dir: str):
    return (
        users_dim(spark, sf_dir),
        jasmin_performance(spark, sf_dir),
        streamate_performance(spark, sf_dir),
    )


# --- 1. earnings -----------------------------------------------------------


def q_api_earnings(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.earnings(u, j, s, start_date="1996-06-01")


ORACLE_API_EARNINGS = f"""
WITH {ADAPTERS_SQL},
both_src AS (
  SELECT jp.date, jp.total_earnings, 'Jasmin' AS source
  FROM jasmin_perf jp JOIN users us ON jp._id = us._id
  WHERE CAST(jp.date AS DATE) >= DATE '1996-06-01'
  UNION ALL
  SELECT sp.date, sp.total_earnings, 'Streamate' AS source
  FROM streamate_perf sp JOIN users us ON sp._id = us._id
  WHERE CAST(sp.date AS DATE) >= DATE '1996-06-01'
)
SELECT date AS report_date,
       CAST(COALESCE(SUM(CASE WHEN source = 'Jasmin'
                 THEN CAST(FLOOR((total_earnings) * 1000000.0) AS BIGINT) END), 0)
            AS DOUBLE) / 1000000.0 AS jasmin,
       CAST(COALESCE(SUM(CASE WHEN source = 'Streamate'
                 THEN CAST(FLOOR((total_earnings) * 1000000.0) AS BIGINT) END), 0)
            AS DOUBLE) / 1000000.0 AS streamate
FROM both_src GROUP BY 1 ORDER BY 1
"""


# --- 2. needle -------------------------------------------------------------


def q_api_needle(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.needle(
        u, j, s,
        start_date="1996-03-10",
        end_date="1996-04-08",  # 29-day span → 'month' unit
        locations=[{"officeName": "BUILDING"}, {"cityName": "NATION_3"}],
    )


ORACLE_API_NEEDLE = f"""
WITH {ADAPTERS_SQL},
u AS (SELECT _id FROM users WHERE {_LOC}),
perf AS (SELECT * FROM jasmin_perf UNION ALL SELECT * FROM streamate_perf),
pu AS (SELECT p.*, CAST(p.date AS DATE) AS d FROM perf p JOIN u ON p._id = u._id),
cur AS (
  SELECT CAST({_SUM_M} AS DOUBLE) / 1000000.0 AS current_value
  FROM pu WHERE d BETWEEN DATE '1996-03-10' AND DATE '1996-04-08'
),
hist AS (
  SELECT CAST(MONTH(d) AS BIGINT) AS period, {_SUM_M} AS s
  FROM pu WHERE d BETWEEN DATE '1996-02-10' AND DATE '1996-03-08'
  GROUP BY 1
),
h AS (SELECT CAST(SUM(s) AS DOUBLE) / 1000000.0 / COUNT(s) AS target_value FROM hist)
SELECT current_value, target_value, 'month' AS time_unit
FROM cur CROSS JOIN h
"""


# --- 3. averageProfitability ----------------------------------------------


def q_api_avg_profitability(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.average_profitability(
        u, j, s, start_date="1996-02-01", end_date="1996-02-28", platform="streamate"
    )


ORACLE_API_AVG_PROFITABILITY = f"""
WITH {ADAPTERS_SQL},
te AS (
  SELECT 'Total' AS transmissionType,
         {"SUM(CAST(FLOOR((COALESCE(total_earnings, 0.0)) * 1000000.0) AS BIGINT))"} AS e_m,
         SUM(COALESCE(online_seconds, 0)) AS secs
  FROM streamate_perf sp JOIN users us ON sp._id = us._id
  WHERE CAST(sp.date AS DATE) BETWEEN DATE '1996-02-01' AND DATE '1996-02-28'
),
base AS (SELECT 'Toy' AS t UNION ALL SELECT 'Privada' UNION ALL SELECT 'Total')
SELECT b.t AS id, b.t AS label,
       CAST(e_m AS DOUBLE) / 1000000.0 AS total_value,
       CAST(secs AS DOUBLE) AS total_seconds,
       CAST(e_m AS DOUBLE) / 1000000.0 / (CAST(secs AS DOUBLE) / 3600) AS average_per_hour,
       CASE b.t WHEN 'Toy' THEN '#21619A' WHEN 'Privada' THEN '#EB933D'
                WHEN 'Total' THEN '#219E0D' ELSE '#000000' END AS color
FROM base b JOIN te ON b.t = te.transmissionType
ORDER BY CASE WHEN b.t = 'Total' THEN 1 WHEN b.t = 'Privada' THEN 2
              WHEN b.t = 'Toy' THEN 3 ELSE 4 END
"""


# --- 4. totalProfitReport --------------------------------------------------


def q_api_total_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.total_profit_report(
        u, j, s,
        start_date="1996-02-01",
        end_date="1996-03-31",
        locations=[{"cityName": "NATION_5"}],
    )


ORACLE_API_TOTAL_PROFIT = f"""
WITH {ADAPTERS_SQL},
u AS (SELECT _id, office FROM users WHERE (city = 'NATION_5')),
perf AS (SELECT * FROM jasmin_perf UNION ALL SELECT * FROM streamate_perf),
per_office AS (
  SELECT 'Total' AS transmissionType,
         {"SUM(CAST(FLOOR((COALESCE(total_earnings, 0.0)) * 1000000.0) AS BIGINT))"} AS m
  FROM perf p JOIN u ON p._id = u._id
  WHERE CAST(p.date AS DATE) BETWEEN DATE '1996-02-01' AND DATE '1996-03-31'
  GROUP BY u.office
),
base AS (SELECT 'Toy' AS t UNION ALL SELECT 'Privada' UNION ALL SELECT 'Total')
SELECT b.t AS id, b.t AS label,
       CAST(COALESCE(SUM(m), 0) AS DOUBLE) / 1000000.0 AS value,
       CASE b.t WHEN 'Toy' THEN '#21619A' WHEN 'Privada' THEN '#EB933D'
                WHEN 'Total' THEN '#219E0D' ELSE '#000000' END AS color
FROM base b LEFT JOIN per_office po ON b.t = po.transmissionType
GROUP BY b.t
ORDER BY CASE WHEN b.t = 'Total' THEN 1 WHEN b.t = 'Privada' THEN 2
              WHEN b.t = 'Toy' THEN 3 ELSE 4 END
"""


# --- 5. profitAvg ----------------------------------------------------------


def q_api_profit_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = users_dim(spark, sf_dir)
    eap = earnings_by_performer(spark, sf_dir)
    return ep.profit_avg(u, eap, start_date="1996-01-01", end_date="1996-06-30")


ORACLE_API_PROFIT_AVG = f"""
WITH {ADAPTERS_SQL},
eap_d AS (SELECT * FROM eap
          WHERE CAST(date AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
matched AS (
  SELECT us.office, e.payableamount FROM eap_d e JOIN users us ON e.emailaddress = us.streamateuser
  UNION ALL
  SELECT us.office, e.payableamount FROM eap_d e JOIN users us ON e.emailaddress = us.jasminuser
),
per_office AS (
  SELECT 'Otros' AS transmissionType,
         {"SUM(CAST(FLOOR((COALESCE(payableamount, 0.0)) * 1000000.0) AS BIGINT))"} AS m
  FROM matched GROUP BY office
),
base AS (SELECT 'Toy' AS t UNION ALL SELECT 'Privada' UNION ALL SELECT 'Otros')
SELECT b.t AS id, b.t AS label,
       COALESCE(CAST(SUM(m) AS DOUBLE) / 1000000.0 / COUNT(m), 0.0) AS value,
       CASE b.t WHEN 'Toy' THEN '#BD0909' WHEN 'Privada' THEN '#EB8326'
                WHEN 'Otros' THEN '#C9370F' ELSE '#000000' END AS color
FROM base b LEFT JOIN per_office po ON b.t = po.transmissionType
GROUP BY b.t
ORDER BY CASE WHEN b.t = 'Toy' THEN 1 WHEN b.t = 'Privada' THEN 2
              WHEN b.t = 'Otros' THEN 3 ELSE 4 END
"""


# --- 6. models_earning_distribution ---------------------------------------


def q_api_models_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.models_earning_distribution(
        u, j, s, start_date="1996-01-01", end_date="1996-12-31", sort_key="DESC"
    )


ORACLE_API_MODELS_DISTRIBUTION = f"""
WITH {ADAPTERS_SQL},
perf AS (SELECT * FROM jasmin_perf UNION ALL SELECT * FROM streamate_perf),
ranked AS (
  SELECT us.artisticname, MAX(us.picture) AS picture, MAX(us.city) AS city,
         MAX(us.office) AS office, {_SUM_M} AS m
  FROM perf p JOIN users us ON p._id = us._id
  WHERE CAST(p.date AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  GROUP BY 1
),
with_rank AS (
  SELECT *, CAST(FLOOR(CAST(m AS DOUBLE) / 1000000.0 * 100 + 0.5) AS BIGINT) AS c,
         ROW_NUMBER() OVER (ORDER BY m DESC, artisticname ASC) AS ranking
  FROM ranked
),
relabeled AS (
  SELECT CASE WHEN ranking <= 5 THEN artisticname ELSE 'General' END AS artisticname,
         CASE WHEN ranking <= 5 THEN picture ELSE '' END AS picture,
         CASE WHEN ranking <= 5 THEN city ELSE '' END AS city,
         CASE WHEN ranking <= 5 THEN office ELSE '' END AS office,
         c
  FROM with_rank
),
regrouped AS (
  SELECT artisticname, MAX(picture) AS picture, MAX(city) AS city,
         MAX(office) AS office, SUM(c) AS c2
  FROM relabeled GROUP BY 1
)
SELECT artisticname, picture, city, office,
       CAST(c2 AS DOUBLE) / 100 AS total_earnings,
       FLOOR((CAST(c2 AS DOUBLE) / 100 / (CAST(SUM(c2) OVER () AS DOUBLE) / 100) * 100)
             * 100 + 0.5) / 100.0 AS percentage
FROM regrouped
ORDER BY total_earnings DESC
"""


# --- 7. earningsByDayOfWeek -----------------------------------------------


def q_api_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.earnings_by_day_of_week(
        u, j, s, start_date="1996-01-01", end_date="1996-12-31"
    )


ORACLE_API_DOW = f"""
WITH {ADAPTERS_SQL},
perf AS (SELECT * FROM jasmin_perf UNION ALL SELECT * FROM streamate_perf),
combined AS (
  SELECT p.*, CAST(p.date AS DATE) AS d
  FROM perf p JOIN users us ON p._id = us._id
  WHERE CAST(p.date AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
),
grouped AS (
  SELECT CAST(ISODOW(d) AS BIGINT) AS day_number, {_SUM_M} AS m,
         COUNT(DISTINCT d) AS active_days
  FROM combined GROUP BY 1
),
scored AS (
  SELECT day_number,
         FLOOR(CAST(m AS DOUBLE) / 1000000.0 * 100 + 0.5) / 100.0 AS total,
         FLOOR(CAST(m AS DOUBLE) / 1000000.0 / active_days * 100 + 0.5) AS avg_c
  FROM grouped
)
SELECT CASE day_number WHEN 1 THEN 'Lun' WHEN 2 THEN 'Mar' WHEN 3 THEN 'Mié'
            WHEN 4 THEN 'Jue' WHEN 5 THEN 'Vie' WHEN 6 THEN 'Sáb'
            WHEN 7 THEN 'Dom' END AS dow,
       total,
       CAST(avg_c AS DOUBLE) / 100 AS average_per_day,
       FLOOR((CAST(avg_c AS DOUBLE) / 100
              / (CAST(SUM(avg_c) OVER () AS DOUBLE) / 100) * 100) * 100 + 0.5)
         / 100.0 AS percentage
FROM scored
ORDER BY CASE WHEN day_number = 7 THEN 1 ELSE day_number + 1 END
"""


# --- 8. detailedRanking ----------------------------------------------------


def q_api_detailed_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, j, s = _tables(spark, sf_dir)
    return ep.detailed_ranking(
        u, j, s, start_date="1996-01-01", end_date="1996-06-30", page=2, limit=15
    )


ORACLE_API_DETAILED_RANKING = f"""
WITH {ADAPTERS_SQL},
jd AS (
  SELECT us._id, us.artisticname, us.city, us.office, us.room, us.picture,
         {_SUM_M} AS m, SUM(CAST(online_seconds AS BIGINT)) AS t
  FROM jasmin_perf p JOIN users us ON p._id = us._id
  WHERE CAST(p.date AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
  GROUP BY 1, 2, 3, 4, 5, 6
),
sd AS (
  SELECT us._id, us.artisticname, us.city, us.office, us.room, us.picture,
         {_SUM_M} AS m, SUM(CAST(online_seconds AS BIGINT)) AS t
  FROM streamate_perf p JOIN users us ON p._id = us._id
  WHERE CAST(p.date AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
  GROUP BY 1, 2, 3, 4, 5, 6
),
flat AS (
  SELECT COALESCE(jd._id, sd._id) AS _id,
         COALESCE(jd.artisticname, sd.artisticname) AS artisticname,
         COALESCE(jd.city, sd.city) AS city,
         COALESCE(jd.office, sd.office) AS office,
         COALESCE(jd.room, sd.room) AS room,
         jd.picture AS picture,
         CAST(COALESCE(jd.m, 0) AS DOUBLE) / 1000000.0 AS jasmin_sales,
         CAST(COALESCE(jd.t, 0) AS BIGINT) AS jasmin_time,
         CAST(COALESCE(sd.m, 0) AS DOUBLE) / 1000000.0 AS streamate_sales,
         CAST(COALESCE(sd.t, 0) AS BIGINT) AS streamate_time,
         CAST(COALESCE(jd.m, 0) AS DOUBLE) / 1000000.0
           + CAST(COALESCE(sd.m, 0) AS DOUBLE) / 1000000.0 AS total_sales
  FROM jd FULL OUTER JOIN sd ON jd._id = sd._id
)
SELECT _id, artisticname, city, office, room, picture,
       jasmin_sales, jasmin_time, streamate_sales, streamate_time,
       FLOOR((jasmin_sales / total_sales * 100) * 100 + 0.5) / 100.0 AS jasmin_percentage,
       FLOOR((streamate_sales / total_sales * 100) * 100 + 0.5) / 100.0 AS streamate_percentage,
       total_sales
FROM flat
WHERE jasmin_sales > 0 OR streamate_sales > 0
ORDER BY total_sales DESC, artisticname ASC
LIMIT 15 OFFSET 15
"""


REGISTRY: dict[str, QuerySpec] = {
    "api_earnings": QuerySpec(q_api_earnings, ORACLE_API_EARNINGS, "endpoint: earnings series"),
    "api_needle": QuerySpec(q_api_needle, ORACLE_API_NEEDLE, "endpoint: needle gauge"),
    "api_avg_profitability": QuerySpec(q_api_avg_profitability, ORACLE_API_AVG_PROFITABILITY, "endpoint: profitability/hour"),
    "api_total_profit": QuerySpec(q_api_total_profit, ORACLE_API_TOTAL_PROFIT, "endpoint: total profit report"),
    "api_profit_avg": QuerySpec(q_api_profit_avg, ORACLE_API_PROFIT_AVG, "endpoint: per-office avg (OR-join)"),
    "api_models_distribution": QuerySpec(q_api_models_distribution, ORACLE_API_MODELS_DISTRIBUTION, "endpoint: top-5 distribution"),
    "api_dow": QuerySpec(q_api_dow, ORACLE_API_DOW, "endpoint: day-of-week distribution"),
    "api_detailed_ranking": QuerySpec(q_api_detailed_ranking, ORACLE_API_DETAILED_RANKING, "endpoint: detailed ranking"),
}
