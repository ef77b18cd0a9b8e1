"""In-engine model training: a linear-probe quality classifier fitted
by deterministic batch gradient descent — the training side of
queries/curation.classifier_filter's fixed-weight inference.

The 100 TB shape: each GD iteration is ONE map-side-combinable
aggregation over the corpus (per-feature gradient sums as exact
quantized-floor integer folds); only the d+1 weight scalars travel to
the driver between iterations (model state, not data). K iterations =
K linear passes — no per-row Python, no shuffle beyond the aggregate.

Determinism contract: squared loss keeps every per-row term pure
arithmetic (no exp/log whose last-ulp may differ across engines); the
per-row residual uses the weights as double literals and left-
associated products/sums in the SAME textual order as the DuckDB
oracle, and gradient sums quantize with floor at 1e-12 before the
exact integer fold — weights match the oracle bit-for-bit after every
iteration.

Beyond the reference surface (SURVEY §8 training-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec

_PS = "1000000000000.0"
_PSF = 1_000_000_000_000.0
_LR = 0.5
_ITERS = 3
_STOP = ("the", "and", "of", "to", "a", "in", "is", "it")
_FEATURES = ("bias", "len_norm", "stop_ratio", "word_len")


def _features(docs: DataFrame) -> DataFrame:
    """(y, x0..x3): label = doc is English; features = capped token
    count, stopword ratio, mean word length — all pure projections."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin(*_STOP)))
    return docs.select(
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.least(n_tok, F.lit(200)) / F.lit(200.0)).alias("x1"),
        (stop_cnt * F.lit(1.0) / n_tok).alias("x2"),
        (
            F.length(F.regexp_replace(F.col("text"), " ", ""))
            * F.lit(1.0)
            / n_tok
            / F.lit(10.0)
        ).alias("x3"),
    )


def fit_linear_probe(
    feats: DataFrame, lr: float = _LR, iters: int = _ITERS
) -> list[float]:
    """Batch GD on squared loss: w ← w − lr·(Σ floor((w·x − y)·x_j·PS))
    / PS / n per feature. One aggregation job per iteration; the weight
    vector (d+1 doubles) is the only driver round-trip. The corpus
    count rides along in iteration 1's aggregate (w₀ = 0 means the
    first gradient needs no n until AFTER the job returns), so K
    iterations cost exactly K corpus passes, not K+1 — a full pass
    saved at 100 TB, and one fewer job launch locally (the r8 bench
    excursion was job-launch/driver overhead, not compute: the three
    aggregation jobs measure ~0.16 s each at sf0.1 while the query
    measured ~2 s)."""
    feats = feats.localCheckpoint(eager=False)
    n: int | None = None
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(iters):
        r: Column = (
            F.lit(w[0]) * F.col("x0")
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
            - F.col("y")
        )
        aggs = [
            F.sum(F.floor(r * F.col(f"x{j}") * F.lit(_PSF))).alias(f"g{j}")
            for j in range(4)
        ]
        if n is None:
            aggs.append(F.count(F.lit(1)).alias("n"))
        grads = feats.agg(*aggs).collect()[0]
        if n is None:
            n = grads["n"]
        w = [w[j] - lr * (grads[f"g{j}"] / _PSF) / n for j in range(4)]
    return w


def q_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the linear quality probe in-engine (3 GD iterations over
    the documents corpus) and return the learned weights — one row per
    feature. The oracle replays the identical iterations as chained SQL
    CTEs; weights match bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    w = fit_linear_probe(_features(docs))
    # literal VALUES, not createDataFrame: a 4-row createDataFrame runs
    # a parallelize job through Python workers (~0.7 s of the r8 bench
    # excursion); repr() doubles parse back bit-identical
    from data_lake_spark.functions.localframe import values_df

    return values_df(
        spark, list(zip(_FEATURES, w)), "feature string, weight double"
    ).orderBy("feature")


def _sql_feats() -> str:
    stop = ", ".join(f"'{s}'" for s in _STOP)
    return f"""
f AS (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         LEAST(LEN(STRING_SPLIT(text, ' ')), 200) / 200.0 AS x1,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ({stop}))) * 1.0
           / LEN(STRING_SPLIT(text, ' ')) AS x2,
         LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')) * 1.0
           / LEN(STRING_SPLIT(text, ' ')) / 10.0 AS x3
  FROM documents
),
nn AS (SELECT COUNT(*) AS n FROM f)"""


def _sql_iter(i: int) -> str:
    """Gradient CTE g{i} against weights w{i}, then weights w{i+1}."""
    w = f"w{i}"
    dot = f"({w}.w0 * x0 + {w}.w1 * x1 + {w}.w2 * x2 + {w}.w3 * x3 - y)"
    sums = ",\n         ".join(
        f"SUM(CAST(FLOOR({dot} * x{j} * {_PS}) AS BIGINT)) AS g{j}"
        for j in range(4)
    )
    upd = ", ".join(
        f"{w}.w{j} - {_LR} * (CAST(g{j} AS DOUBLE) / {_PS}) / n AS w{j}"
        for j in range(4)
    )
    return (
        f"g{i} AS (\n  SELECT {sums}\n  FROM f CROSS JOIN w{i}\n),\n"
        f"w{i + 1} AS (SELECT {upd} FROM g{i} CROSS JOIN nn CROSS JOIN w{i})"
    )


ORACLE_CLASSIFIER_TRAIN = (
    "WITH "
    + _sql_feats()
    + ",\nw0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),\n"
    + ",\n".join(_sql_iter(i) for i in range(_ITERS))
    + f"""
SELECT feature, weight FROM (
  SELECT 'bias' AS feature, w0 AS weight FROM w{_ITERS}
  UNION ALL SELECT 'len_norm', w1 FROM w{_ITERS}
  UNION ALL SELECT 'stop_ratio', w2 FROM w{_ITERS}
  UNION ALL SELECT 'word_len', w3 FROM w{_ITERS}
)
ORDER BY feature
"""
)


REGISTRY: dict[str, QuerySpec] = {
    "classifier_train": QuerySpec(
        q_classifier_train,
        ORACLE_CLASSIFIER_TRAIN,
        "linear quality probe trained in-engine: 3 deterministic GD "
        "iterations, one aggregation pass each, bit-exact vs the oracle",
    ),
}


# ---------------------------------------------------------------------------
# lang_fit — per-group model fit through the grouped-map Arrow path
# ---------------------------------------------------------------------------


def q_lang_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OLS fit (token count against document length)
    executed as a grouped-map ``applyInPandas`` — the batch Arrow path
    for custom per-group model fits, under the same cross-engine
    oracle contract as everything else.

    Why this exists: classifier_train / trend_slopes prove that
    SUM-DECOMPOSABLE fits belong in aggregations (map-side combine,
    nothing materializes a group). But fits that genuinely need the
    group's rows in memory — isotonic PAVA, quantile regression, any
    sklearn call — run through grouped-map applyInPandas, and THIS
    query pins that path's contract with a fit whose answer is also
    SQL-replayable: Arrow batch → pandas → exact integer sums (Python
    ints, no int64 wraparound) → the same two IEEE divisions as the
    oracle. Determinism note in the pattern: anything order-dependent
    inside the pandas fn must sort or reduce exactly (here: integer
    sums are order-free by construction).

    Scale shape: one shuffle on the group key; each task holds ONE
    group's rows (the documented applyInPandas memory bound — groups
    must fit an executor; skewed groups get salted two-phase treatment
    or the aggregation path)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.split("text", " ")).cast("long").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # Python-int sums: exact at any group size (numpy int64 would
        # wrap silently past 2^63 — the audit trend_slopes does
        # analytically, done structurally here)
        n = int(len(pdf))
        sx = int(pdf.x.sum())
        sy = int(pdf.y.sum())
        sxy = int((pdf.x * pdf.y).sum())
        sxx = int((pdf.x * pdf.x).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            # degenerate group (one doc, or all docs the same length):
            # no defined slope — emit NULLs instead of letting
            # ZeroDivisionError kill the executor task
            slope = intercept = None
        else:
            slope = float(num) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
        return pd.DataFrame(
            {
                "lang": [pdf.lang.iloc[0]],
                "n_docs": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return (
        docs.groupBy("lang")
        .applyInPandas(
            fit, schema="lang string, n_docs long, slope double, intercept double"
        )
        .orderBy("lang")
    )


ORACLE_LANG_FIT = """
WITH pts AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS x,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS y
  FROM documents
),
s AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY 1
)
SELECT lang, n AS n_docs,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) END AS intercept
FROM s ORDER BY lang
"""


REGISTRY["lang_fit"] = QuerySpec(
    q_lang_fit,
    ORACLE_LANG_FIT,
    "per-language OLS fit via grouped-map applyInPandas (the Arrow "
    "custom-fit path, SQL-replayed oracle)",
)


# ---------------------------------------------------------------------------
# negative_pairs — deterministic contrastive negative mining
# ---------------------------------------------------------------------------

_N_ANCHORS = 8
_K_NEG = 4
_NEG_BLK = 4


def q_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k deterministic random negatives per anchor document — the
    contrastive-training pair miner. "Random" is a hash ordering
    (md5 of anchor:candidate), so the sample is reproducible across
    engines, partitionings and reruns (the hash_sample principle
    applied to PAIRS); candidates sharing the anchor's 4-char title
    prefix are excluded — the cheap blocking proxy for "suspected
    positive", keeping near-duplicates out of the negative set.

    Plan: broadcast the (tiny) anchor set, stream the corpus once,
    one per-anchor top-k window — the cosine_topk shape with a hash
    in place of a distance."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _NEG_BLK).alias("blk")
    )
    anchors = docs.filter(F.col("doc_id") < _N_ANCHORS).select(
        F.col("doc_id").alias("anchor_id"), F.col("blk").alias("a_blk")
    )
    cands = docs.select(
        F.col("doc_id").alias("cand_id"), F.col("blk").alias("c_blk")
    )
    from pyspark.sql import Window

    h = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(":"),
            F.col("cand_id").cast("string"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("h"), F.col("cand_id")
    )
    return (
        F.broadcast(anchors)
        .crossJoin(cands)
        .filter(
            (F.col("anchor_id") != F.col("cand_id"))
            & (F.col("a_blk") != F.col("c_blk"))
        )
        .withColumn("h", h)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _K_NEG)
        .select("anchor_id", "cand_id", "rk")
        .orderBy("anchor_id", "rk")
    )


ORACLE_NEGATIVE_PAIRS = f"""
WITH d AS (
  SELECT doc_id, SUBSTR(text, 1, {_NEG_BLK}) AS blk FROM documents
),
a AS (SELECT doc_id AS anchor_id, blk AS a_blk FROM d
      WHERE doc_id < {_N_ANCHORS}),
c AS (SELECT doc_id AS cand_id, blk AS c_blk FROM d),
p AS (
  SELECT anchor_id, cand_id,
         MD5(CAST(anchor_id AS VARCHAR) || ':' || CAST(cand_id AS VARCHAR))
           AS h
  FROM a CROSS JOIN c
  WHERE anchor_id != cand_id AND a_blk != c_blk
)
SELECT anchor_id, cand_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY h, cand_id)
            AS BIGINT) AS rk
FROM p
QUALIFY rk <= {_K_NEG}
ORDER BY anchor_id, rk
"""


REGISTRY["negative_pairs"] = QuerySpec(
    q_negative_pairs,
    ORACLE_NEGATIVE_PAIRS,
    "deterministic contrastive negatives: hash-ordered top-k per "
    "anchor, block-prefix positives excluded",
)


# ---------------------------------------------------------------------------
# curriculum_order — length curriculum with in-band deterministic shuffle
# ---------------------------------------------------------------------------


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A global training order: documents banded by length quartile
    (the classic short→long curriculum; boundaries are exact
    percentiles, F.percentile ≡ QUANTILE_CONT) and SHUFFLED
    deterministically within each band by an md5 key — curriculum
    stages progress, but within a stage the model sees no length
    gradient. The global index comes from operators/ranking.
    global_row_number — the two-phase distributed ROW_NUMBER (range
    repartition + per-partition rank + broadcast offsets), never a
    single-reducer window over the corpus."""
    from data_lake_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    bounds = docs.agg(
        F.percentile("n_tokens", F.lit(0.25)).alias("b1"),
        F.percentile("n_tokens", F.lit(0.5)).alias("b2"),
        F.percentile("n_tokens", F.lit(0.75)).alias("b3"),
    )
    banded = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("n_tokens") <= F.col("b1"), 1)
            .when(F.col("n_tokens") <= F.col("b2"), 2)
            .when(F.col("n_tokens") <= F.col("b3"), 3)
            .otherwise(4)
            .cast("long")
            .alias("band"),
        )
        .withColumn("shuf", F.md5(F.col("doc_id").cast("string")))
    )
    out = global_row_number(
        banded,
        [F.col("band"), F.col("shuf"), F.col("doc_id")],
        out_col="curriculum_idx",
    )
    return (
        out.select(
            "doc_id",
            "band",
            F.col("curriculum_idx").cast("long").alias("curriculum_idx"),
        )
        .orderBy("curriculum_idx")
    )


ORACLE_CURRICULUM_ORDER = """
WITH d AS (
  SELECT doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT QUANTILE_CONT(n_tokens, 0.25) AS b1,
         QUANTILE_CONT(n_tokens, 0.5) AS b2,
         QUANTILE_CONT(n_tokens, 0.75) AS b3
  FROM d
),
banded AS (
  SELECT doc_id,
         CASE WHEN n_tokens <= b.b1 THEN 1
              WHEN n_tokens <= b.b2 THEN 2
              WHEN n_tokens <= b.b3 THEN 3
              ELSE 4 END AS band,
         MD5(CAST(doc_id AS VARCHAR)) AS shuf
  FROM d CROSS JOIN b
)
SELECT doc_id, CAST(band AS BIGINT) AS band,
       CAST(ROW_NUMBER() OVER (ORDER BY band, shuf, doc_id) AS BIGINT)
         AS curriculum_idx
FROM banded ORDER BY curriculum_idx
"""


REGISTRY["curriculum_order"] = QuerySpec(
    q_curriculum_order,
    ORACLE_CURRICULUM_ORDER,
    "short→long length curriculum: exact-quartile bands, deterministic "
    "in-band shuffle, two-phase distributed global row number",
)
