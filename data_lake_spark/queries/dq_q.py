"""Data-quality constraint suite and the token-budget epoch planner —
the governance pair a lake runs before and after curation.

``dq_checks`` is the Deequ-style (public AWS-labs constraint-suite
pattern) verification pass the reference performs implicitly by hand in
its silver-conform Glue job (reference
`src/glue/silver_conform/job.py` null normalization + type coercion):
completeness, uniqueness, domain containment, range, and referential
integrity expressed as ONE aggregation pass per fact table plus one
anti-join count per foreign key, every metric an integer micro-share so
both engines floor identically.

``epoch_plan`` is the consumer of the mixture story that
``mixture_weights`` begins: given the corpus's per-source token supply
and a uniform target mixture, how many epochs of each source does a
token budget imply, and how much of the budget can actually be granted
under an oversampling cap — the DoReMi/data-mixture scheduling shape
(public data-mixture literature), computed entirely in exact integer
micro-epochs.

Plan shapes (the 100 TB audit):
- ``dq_checks``: each fact table is scanned ONCE into a single-row
  aggregate (map-side combinable; one distinct-count per table so no
  EXPAND multiplication); the per-check rows are literal selects over
  those one-row frames — dim-sized from the first shuffle on. The two
  referential checks are left-anti joins on the key (AQE picks
  broadcast when the parent's key side fits); their outputs are
  single-row counts.
- ``epoch_plan``: one map-side-combinable groupBy(source), a scalar
  corpus total via a constant-partition window over the SOURCE-sized
  frame (bounded by construction, the mixture_weights convention), and
  map-only integer long-division — no corpus-sized shuffle beyond the
  one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import (
    micro_share_guarded_sql,
    oracle_micro_share_guarded_sql,
)
from data_lake_spark.queries import QuerySpec

_SCALE = 1_000_000


def _share(num: str, den: str) -> F.Column:
    """Floored micro-share with int64 headroom — the shared
    functions/exact recipe as a Column, denominator-guarded: an EMPTY
    fact table is a realistic DQ input (it is precisely a failure the
    suite should report as observed 0, not crash on), and the guard
    keeps Spark and the oracle in agreement there."""
    return F.expr(micro_share_guarded_sql(num, den))


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite verification over orders / lineitem / customer:
    every check is (table, check, observed_micro, threshold_micro, ok)
    where observed is the satisfying-row micro-share (uniqueness: the
    distinct-key micro-share). A full pass is observed == 10⁶ on every
    row; `ok` makes the report actionable without arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("n_key"),
        F.sum(F.col("o_custkey").isNotNull().cast("long")).alias("n_cust"),
        F.sum((F.col("o_totalprice") >= 0).cast("long")).alias("n_price"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("long")
        ).alias("n_status"),
    )
    # compound key distinct as a STRUCT: countDistinct(col1, col2)
    # silently drops rows where either part is NULL, while the oracle's
    # COUNT(DISTINCT (a, b)) counts NULL-bearing tuples — and dirty keys
    # are exactly what a constraint suite must see; the struct is
    # non-null even when its fields are, matching ROW semantics
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.struct("l_orderkey", "l_linenumber")
        ).alias("n_key"),
        F.sum((F.col("l_quantity") > 0).cast("long")).alias("n_qty"),
        F.sum(
            ((F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)).cast(
                "long"
            )
        ).alias("n_disc"),
    )

    def check(agg: DataFrame, tbl: str, name: str, num: str) -> DataFrame:
        return agg.select(
            F.lit(tbl).alias("tbl"),
            F.lit(name).alias("check"),
            _share(num, "n").alias("observed_micro"),
            F.lit(_SCALE).cast("long").alias("threshold_micro"),
            (F.col(num) == F.col("n")).alias("ok"),
        )

    # referential integrity: one left join per FK against the DISTINCT
    # parent keys (so a duplicate-keyed parent can't fan out the child),
    # aggregated to a single (n, n_matched) row. A NULL child key
    # matches nothing and counts as an orphan in both engines — equality
    # join semantics, unlike NOT IN / anti-join whose null handling
    # diverges between engines.
    def ref_agg(child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        return (
            child.select(ckey)
            .join(
                parent.select(pkey).distinct(),
                F.col(ckey) == F.col(pkey),
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(pkey).isNotNull().cast("long")).alias("n_matched"),
            )
        )

    li_ref = ref_agg(lineitem, "l_orderkey", orders, "o_orderkey")
    o_ref = ref_agg(orders, "o_custkey", customer, "c_custkey")

    def ref_check(agg: DataFrame, tbl: str, name: str) -> DataFrame:
        return agg.select(
            F.lit(tbl).alias("tbl"),
            F.lit(name).alias("check"),
            _share("n_matched", "n").alias("observed_micro"),
            F.lit(_SCALE).cast("long").alias("threshold_micro"),
            (F.col("n_matched") == F.col("n")).alias("ok"),
        )

    rows = [
        check(o, "orders", "complete_o_custkey", "n_cust"),
        check(o, "orders", "unique_o_orderkey", "n_key"),
        check(o, "orders", "range_o_totalprice_nonneg", "n_price"),
        check(o, "orders", "domain_o_orderstatus", "n_status"),
        check(li, "lineitem", "unique_l_orderkey_linenumber", "n_key"),
        check(li, "lineitem", "range_l_quantity_positive", "n_qty"),
        check(li, "lineitem", "range_l_discount_unit", "n_disc"),
        ref_check(li_ref, "lineitem", "fk_l_orderkey_in_orders"),
        ref_check(o_ref, "orders", "fk_o_custkey_in_customer"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("tbl", "check")


ORACLE_DQ_CHECKS = f"""
WITH o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_key,
         CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cust,
         CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_price,
         CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_status
  FROM orders
),
li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_key,
         CAST(SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_qty,
         CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc
  FROM lineitem
),
li_ref AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
  FROM lineitem c
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
    ON c.l_orderkey = p.o_orderkey
),
o_ref AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN p.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
  FROM orders c
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
    ON c.o_custkey = p.c_custkey
),
checks AS (
  SELECT 'orders' AS tbl, 'complete_o_custkey' AS "check",
         {oracle_micro_share_guarded_sql("n_cust", "n")} AS observed_micro,
         n_cust = n AS ok FROM o
  UNION ALL
  SELECT 'orders', 'unique_o_orderkey',
         {oracle_micro_share_guarded_sql("n_key", "n")}, n_key = n FROM o
  UNION ALL
  SELECT 'orders', 'range_o_totalprice_nonneg',
         {oracle_micro_share_guarded_sql("n_price", "n")}, n_price = n FROM o
  UNION ALL
  SELECT 'orders', 'domain_o_orderstatus',
         {oracle_micro_share_guarded_sql("n_status", "n")}, n_status = n FROM o
  UNION ALL
  SELECT 'lineitem', 'unique_l_orderkey_linenumber',
         {oracle_micro_share_guarded_sql("n_key", "n")}, n_key = n FROM li
  UNION ALL
  SELECT 'lineitem', 'range_l_quantity_positive',
         {oracle_micro_share_guarded_sql("n_qty", "n")}, n_qty = n FROM li
  UNION ALL
  SELECT 'lineitem', 'range_l_discount_unit',
         {oracle_micro_share_guarded_sql("n_disc", "n")}, n_disc = n FROM li
  UNION ALL
  SELECT 'lineitem', 'fk_l_orderkey_in_orders',
         {oracle_micro_share_guarded_sql("n_matched", "n")},
         n_matched = n FROM li_ref
  UNION ALL
  SELECT 'orders', 'fk_o_custkey_in_customer',
         {oracle_micro_share_guarded_sql("n_matched", "n")},
         n_matched = n FROM o_ref
)
SELECT tbl, "check", CAST(observed_micro AS BIGINT) AS observed_micro,
       CAST({_SCALE} AS BIGINT) AS threshold_micro, ok
FROM checks ORDER BY tbl, "check"
"""


# ---------------------------------------------------------------------------
# epoch_plan — token-budget epoch scheduling per source
# ---------------------------------------------------------------------------

# Oversample the corpus 2× and cap any single source at 4 epochs — the
# point where repetition stops buying quality in the public data-mixture
# ablations (the documented knob, not a magic number).
_BUDGET_X = 2
_MAX_EPOCHS_MICRO = 4 * _SCALE


def _epochs_micro(wanted: str, avail: str) -> str:
    """SQL fragment: floor(wanted·10⁶ / avail) as exact integer
    micro-epochs with int64 headroom at any corpus size. wanted·10⁶
    overflows past ~9.2e12 tokens (a 100 TB corpus holds ~2.5e13), so
    the division runs as two long-division digit steps of 10³ each:
    floor(r·10⁶/a) = q2·10³ + floor((r·10³ mod a)·10³ / a) with
    q2 = r·10³ div a — every intermediate ≤ max(wanted, avail·10³).
    Runs textually identically on both engines (div spelled per
    dialect by the caller)."""
    return (
        f"(({wanted}) div ({avail})) * {_SCALE}"
        f" + (((({wanted}) % ({avail})) * 1000) div ({avail})) * 1000"
        f" + (((((({wanted}) % ({avail})) * 1000) % ({avail})) * 1000) div ({avail}))"
    )


def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch schedule for a token budget of 2× the corpus
    under a uniform target mixture: tokens available, tokens wanted
    (budget · uniform share), the epoch count that demand implies
    (micro-epochs, exact integer long division), the 4-epoch
    oversampling cap, and the tokens actually granted =
    min(wanted, avail · 4) — the plan a training-data loader consumes.

    One groupBy(source); the corpus total rides a constant-partition
    window over the SOURCE-sized aggregate (bounded by construction);
    everything after is map-only integer arithmetic on a dim-sized
    frame."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_src = docs.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("avail")
    )
    w = Window.partitionBy(F.lit(0))
    planned = per_src.withColumn("total", F.sum("avail").over(w)).withColumn(
        "n_src", F.count(F.lit(1)).over(w)
    )
    # wanted = (2·total) div n_src: the uniform share of the doubled
    # budget; total·2 stays far inside int64 (2⁶² tokens ≈ 4.6e18)
    planned = planned.withColumn(
        "wanted", F.expr(f"({_BUDGET_X} * total) div n_src")
    )
    epochs = _epochs_micro("wanted", "avail")
    # capped compares EXACT integers (wanted vs 4·avail), not the
    # floored micro-epochs: in the band 4·avail < wanted <
    # 4·avail + avail/10⁶ the floor lands exactly on 4·10⁶ and a
    # floor-based flag would report an uncapped plan whose grant was
    # cut (capped must equal granted < wanted by definition)
    return planned.select(
        "source",
        "avail",
        "wanted",
        F.least(
            F.expr(epochs), F.lit(_MAX_EPOCHS_MICRO).cast("long")
        ).alias("epochs_micro"),
        (
            F.col("wanted")
            > F.col("avail") * (_MAX_EPOCHS_MICRO // _SCALE)
        ).alias("capped"),
        F.least(
            F.col("wanted"), F.col("avail") * (_MAX_EPOCHS_MICRO // _SCALE)
        ).alias("granted"),
    ).orderBy("source")


_EPOCHS_SQL = (
    _epochs_micro("wanted", "avail").replace(" div ", " // ")
)

ORACLE_EPOCH_PLAN = f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS avail
  FROM documents GROUP BY 1
),
planned AS (
  SELECT source, avail,
         ({_BUDGET_X} * (SELECT SUM(avail) FROM per_src))
           // (SELECT COUNT(*) FROM per_src) AS wanted
  FROM per_src
)
SELECT source, avail, CAST(wanted AS BIGINT) AS wanted,
       CAST(LEAST({_EPOCHS_SQL}, {_MAX_EPOCHS_MICRO}) AS BIGINT) AS epochs_micro,
       wanted > avail * {_MAX_EPOCHS_MICRO // _SCALE} AS capped,
       CAST(LEAST(wanted, avail * {_MAX_EPOCHS_MICRO // _SCALE}) AS BIGINT) AS granted
FROM planned ORDER BY source
"""


REGISTRY: dict[str, QuerySpec] = {
    "dq_checks": QuerySpec(
        q_dq_checks,
        ORACLE_DQ_CHECKS,
        "Deequ-style constraint suite: completeness/uniqueness/domain/"
        "range/referential integrity as one-pass integer micro-shares",
    ),
    "epoch_plan": QuerySpec(
        q_epoch_plan,
        ORACLE_EPOCH_PLAN,
        "token-budget epoch scheduler per source: uniform-mixture demand, "
        "micro-epoch long division, oversampling cap, granted tokens",
    ),
}


# ---------------------------------------------------------------------------
# k_anonymity — privacy-governance check over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    (c_nationkey, c_mktsegment) quasi-identifier pair (the public
    Sweeney model: every row must be indistinguishable from at least
    k−1 others on the columns an adversary can link externally).
    Output: one row per VIOLATING equivalence class (size < 5) with its
    size, plus rollup rows per nation summarizing rows-at-risk and the
    smallest class — the table a release-review reads before exporting
    any per-customer extract.

    Plan: ONE groupBy over the quasi-identifier pair (map-side
    combinable), then a nation-level re-aggregate of the CLASS frame
    (dim-sized); the union of detail + rollup rows is dim-sized output.
    At 100 TB this stays a single corpus shuffle on the QI key — the
    class frame is bounded by the QI domain, not the row count."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    viol = classes.filter(F.col("n") < _K_ANON).select(
        F.lit("class").alias("level"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.col("n").alias("class_size"),
        F.col("n").alias("rows_at_risk"),
    )
    rollup = classes.groupBy("c_nationkey").agg(
        F.min("n").alias("min_class"),
        F.sum(F.when(F.col("n") < _K_ANON, F.col("n")).otherwise(0))
        .cast("long")
        .alias("at_risk"),
    ).select(
        F.lit("nation").alias("level"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.lit(None).cast("string").alias("segment"),
        F.col("min_class").cast("long").alias("class_size"),
        F.col("at_risk").alias("rows_at_risk"),
    )
    return viol.unionAll(rollup).orderBy(
        "level", "nationkey", "segment"
    )


ORACLE_K_ANONYMITY = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
viol AS (
  SELECT 'class' AS level, CAST(c_nationkey AS BIGINT) AS nationkey,
         c_mktsegment AS segment, n AS class_size, n AS rows_at_risk
  FROM classes WHERE n < {_K_ANON}
),
rollup AS (
  SELECT 'nation' AS level, CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(NULL AS VARCHAR) AS segment,
         CAST(MIN(n) AS BIGINT) AS class_size,
         CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT)
           AS rows_at_risk
  FROM classes GROUP BY 2
)
SELECT * FROM (
  SELECT * FROM viol UNION ALL SELECT * FROM rollup
) ORDER BY level, nationkey, segment
"""


REGISTRY["k_anonymity"] = QuerySpec(
    q_k_anonymity,
    ORACLE_K_ANONYMITY,
    "k-anonymity audit over (nation, segment) quasi-identifiers: "
    "violating classes + per-nation rows-at-risk rollup",
)
