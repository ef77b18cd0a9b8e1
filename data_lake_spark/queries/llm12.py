"""Training-data-pipeline queries, part 12 (round 7, second wave):
mixture-sampling audit, vocabulary-pruning ladder, n-gram coverage
curve, and an in-engine PCA power iteration — each with a bit-identical
DuckDB oracle.

Beyond the reference surface (north-star extensions per BASELINE.json).
Scale notes baked into each plan:

- mixture_audit closes the temp_weights → sampler loop: targets and
  thresholds live on the LANGUAGE frame (windows over dozens of rows);
  the corpus pays one token-count scan + one sampled re-aggregate;
- vocab_prune is one explode + one groupBy(token), then the threshold
  ladder rides the VOCABULARY frame against a 6-row broadcast dim;
- ngram_coverage is the bigram census + TakeOrdered(1000) — the
  cumulative window runs over 1000 rows, never the vocabulary;
- embedding_pca is two power-method iterations as map-side-combinable
  aggregates: per-vector projections ride a vec_id window, per-dim
  re-aggregates shuffle 64 keys, and the direction frames (64 rows)
  broadcast back — no gram matrix, no driver-side linear algebra.

Cross-engine exactness follows the house floor-micros discipline; the
one new wrinkle (PCA components are SIGNED) is handled sign-magnitude
because integer division on negatives truncates toward zero in Spark
but floors in DuckDB; the max-abs rescale is a hybrid (exact product
form while it provably fits int64, divide-first beyond — see the
``_RESCALE`` block comment) so it cannot overflow at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import (
    micro_share_guarded_sql,
    micro_share_sql,
    oracle_micro_share_guarded_sql,
    oracle_micro_share_sql,
)
from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.curation import _oracle_u16, doc_u16

REGISTRY: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# mixture_audit — did the sampler hit the temperature targets?
# ---------------------------------------------------------------------------
#
# temp_weights PLANS a mixture (weight ∝ √share); this query RUNS the
# deterministic sampler that implements the plan and measures what it
# achieved: per language, the target micro-weight, the u16 keep
# threshold (∝ weight/share, normalized so the most-boosted language
# keeps everything), sampled token counts, the achieved micro-share,
# and |achieved − target|. The audit a pipeline runs after every
# sampling job — plan, execute, MEASURE.


def q_mixture_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    w = Window.partitionBy(F.lit(0))
    counts = docs.groupBy("lang").agg(F.sum("n_tok").alias("lang_tok"))
    # target weight ∝ √share (the temp_weights α=0.5 recipe, same
    # IEEE-exact single-sqrt step), threshold ∝ weight/share rescaled
    # to keep the most-boosted language fully
    lang = (
        counts.withColumn("tot", F.sum("lang_tok").over(w))
        .withColumn("share_micro", F.expr(micro_share_sql("lang_tok", "tot")))
        .withColumn(
            "sqrt_micro",
            F.expr(
                "CAST(FLOOR(SQRT(CAST(share_micro * 1000000 AS DOUBLE)))"
                " AS BIGINT)"
            ),
        )
        .withColumn("sqrt_tot", F.sum("sqrt_micro").over(w))
        .withColumn(
            "target_micro", F.expr(micro_share_sql("sqrt_micro", "sqrt_tot"))
        )
        # share_micro floors to 0 for a sub-ppm language — guarded
        # (the temp_weights boost convention): such a language samples
        # at thr 0 rather than poisoning the whole table cross-engine
        .withColumn(
            "boost_micro",
            F.expr(micro_share_guarded_sql("target_micro", "share_micro")),
        )
        .withColumn("max_boost", F.max("boost_micro").over(w))
        .withColumn(
            "thr", F.expr("(65536 * boost_micro) div max_boost")
        )
        .select("lang", "lang_tok", "share_micro", "target_micro", "thr")
    )
    sampled = (
        docs.withColumn("u", doc_u16())
        .join(F.broadcast(lang.select("lang", "thr")), "lang")
        .filter(F.col("u") < F.col("thr"))
        .groupBy("lang")
        .agg(F.sum("n_tok").alias("samp_tok"))
    )
    out = (
        lang.join(sampled, "lang", "left")
        .withColumn("samp_tok", F.coalesce("samp_tok", F.lit(0)))
        .withColumn("samp_tot", F.sum("samp_tok").over(w))
        .withColumn(
            "achieved_micro", F.expr(micro_share_sql("samp_tok", "samp_tot"))
        )
    )
    return out.select(
        "lang",
        "lang_tok",
        "target_micro",
        "thr",
        "samp_tok",
        "achieved_micro",
        F.abs(F.col("achieved_micro") - F.col("target_micro")).alias(
            "abs_err_micro"
        ),
    ).orderBy("lang")


def _oracle_mixture_audit() -> str:
    share = oracle_micro_share_sql("lang_tok", "tot")
    target = oracle_micro_share_sql("sqrt_micro", "sqrt_tot")
    boost = oracle_micro_share_guarded_sql("target_micro", "share_micro")
    achieved = oracle_micro_share_sql("samp_tok", "samp_tot")
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
counts AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tok FROM d GROUP BY 1),
s1 AS (
  SELECT lang, lang_tok, CAST({share} AS BIGINT) AS share_micro
  FROM (SELECT lang, lang_tok, CAST(SUM(lang_tok) OVER () AS BIGINT) AS tot
        FROM counts)
),
s2 AS (
  SELECT lang, lang_tok, share_micro,
         CAST(FLOOR(SQRT(CAST(share_micro * 1000000 AS DOUBLE))) AS BIGINT)
           AS sqrt_micro
  FROM s1
),
s3 AS (
  SELECT lang, lang_tok, share_micro, sqrt_micro,
         CAST(SUM(sqrt_micro) OVER () AS BIGINT) AS sqrt_tot
  FROM s2
),
s4 AS (
  SELECT lang, lang_tok, share_micro,
         CAST({target} AS BIGINT) AS target_micro
  FROM s3
),
s5 AS (
  SELECT lang, lang_tok, share_micro, target_micro,
         CAST({boost} AS BIGINT) AS boost_micro
  FROM s4
),
lang_t AS (
  SELECT lang, lang_tok, share_micro, target_micro,
         (65536 * boost_micro) // MAX(boost_micro) OVER () AS thr
  FROM s5
),
sampled AS (
  SELECT d.lang, CAST(SUM(d.n_tok) AS BIGINT) AS samp_tok
  FROM d JOIN lang_t t ON d.lang = t.lang
  WHERE {_oracle_u16("d.doc_id")} < t.thr
  GROUP BY 1
),
joined AS (
  SELECT t.lang, t.lang_tok, t.target_micro, t.thr,
         COALESCE(s.samp_tok, 0) AS samp_tok,
         CAST(SUM(COALESCE(s.samp_tok, 0)) OVER () AS BIGINT) AS samp_tot
  FROM lang_t t LEFT JOIN sampled s ON t.lang = s.lang
)
SELECT lang, lang_tok, target_micro, thr, samp_tok,
       CAST({achieved} AS BIGINT) AS achieved_micro,
       ABS(CAST({achieved} AS BIGINT) - target_micro) AS abs_err_micro
FROM joined ORDER BY lang
"""


REGISTRY["mixture_audit"] = QuerySpec(
    q_mixture_audit,
    _oracle_mixture_audit(),
    "temperature-mixture sampling audit: deterministic u16 sampler at "
    "sqrt-share targets, achieved vs target token share per language",
)


# ---------------------------------------------------------------------------
# vocab_prune — min-df pruning ladder with OOV cost
# ---------------------------------------------------------------------------

_DF_CUTS = [1, 2, 4, 8, 16, 32]


def q_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer/feature-vocabulary design table: for each min-df
    threshold, the surviving type count, kept token occurrences, and
    the OOV micro-share a lookup built at that threshold would pay.
    One explode + one groupBy(token); the 6-row threshold dim
    broadcast-joins the VOCABULARY frame (never the corpus), and the
    corpus-total occurrence count rides a constant window over it."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("tf")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    from data_lake_spark.functions.localframe import values_df

    cuts = values_df(
        docs.sparkSession, [(c,) for c in _DF_CUTS], "min_tf long"
    )
    # tf-histogram frame (one row per distinct frequency — far smaller
    # than the vocabulary) against the 6-row cut dim
    w = Window.partitionBy(F.lit(0))
    hist = vocab.withColumn(
        "total_occ", F.sum(F.col("tf") * F.col("n_types")).over(w)
    )
    ladder = (
        F.broadcast(cuts)
        .join(hist, hist["tf"] >= cuts["min_tf"])
        .groupBy("min_tf")
        .agg(
            F.sum("n_types").alias("n_types"),
            F.sum(F.col("tf") * F.col("n_types")).alias("kept_occ"),
            F.max("total_occ").alias("total_occ"),
        )
    )
    return ladder.select(
        "min_tf",
        "n_types",
        "kept_occ",
        F.expr(
            micro_share_sql("(total_occ - kept_occ)", "total_occ")
        ).alias("oov_micro"),
    ).orderBy("min_tf")


def _oracle_vocab_prune() -> str:
    oov = oracle_micro_share_sql("(total_occ - kept_occ)", "total_occ")
    cuts = ", ".join(f"({c})" for c in _DF_CUTS)
    return f"""
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
vocab AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY 1),
hist AS (
  SELECT tf, CAST(COUNT(*) AS BIGINT) AS n_types FROM vocab GROUP BY 1
),
tot AS (SELECT CAST(SUM(tf * n_types) AS BIGINT) AS total_occ FROM hist),
ladder AS (
  SELECT c.min_tf,
         CAST(SUM(h.n_types) AS BIGINT) AS n_types,
         CAST(SUM(h.tf * h.n_types) AS BIGINT) AS kept_occ,
         MAX(t.total_occ) AS total_occ
  FROM (VALUES {cuts}) AS c(min_tf)
  JOIN hist h ON h.tf >= c.min_tf
  CROSS JOIN tot t
  GROUP BY 1
)
SELECT min_tf, n_types, kept_occ,
       CAST({oov} AS BIGINT) AS oov_micro
FROM ladder ORDER BY min_tf
"""


REGISTRY["vocab_prune"] = QuerySpec(
    q_vocab_prune,
    _oracle_vocab_prune(),
    "min-df vocabulary pruning ladder: surviving types, kept "
    "occurrences, OOV micro-share per threshold — ladder rides the "
    "tf-histogram frame, never the corpus",
)


# ---------------------------------------------------------------------------
# ngram_coverage — how much corpus the top-K bigrams cover
# ---------------------------------------------------------------------------

_RANK_CUTS = [10, 100, 1000]


def q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus compressibility/redundancy read: cumulative share of all
    bigram slots covered by the top-10/100/1000 bigrams. The census is
    one per-doc window + one groupBy(bigram); only the TOP-1000 frame
    (TakeOrdered — no global sort of the vocabulary) carries the
    cumulative window; the corpus slot total attaches as a one-row
    broadcast (the bm25_topk scalar shape)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    top = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(max(_RANK_CUTS))
    )
    total = bigrams.groupBy().agg(
        F.count(F.lit(1)).alias("total_slots")
    )
    wrank = Window.orderBy(F.col("cnt").desc(), "bigram")
    ranked = (
        top.withColumn("rk", F.row_number().over(wrank))
        .withColumn(
            "cum_occ",
            F.sum("cnt").over(wrank.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .crossJoin(F.broadcast(total))
    )
    cuts = ranked.filter(F.col("rk").isin(_RANK_CUTS))
    return cuts.select(
        F.col("rk").cast("long").alias("rank_cut"),
        F.col("cum_occ").cast("long").alias("covered_slots"),
        "total_slots",
        F.expr(micro_share_sql("cum_occ", "total_slots")).alias(
            "coverage_micro"
        ),
    ).orderBy("rank_cut")


def _oracle_ngram_coverage() -> str:
    cov = oracle_micro_share_sql("cum_occ", "total_slots")
    cuts = ", ".join(str(c) for c in _RANK_CUTS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(STRING_SPLIT(text, ' ')) AS tok,
         GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
  FROM documents
),
bi AS (
  SELECT tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos)
           AS bigram
  FROM toks
),
census AS (
  SELECT bigram, COUNT(*) AS cnt FROM bi WHERE bigram IS NOT NULL GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total_slots FROM bi
  WHERE bigram IS NOT NULL
),
ranked AS (
  SELECT bigram, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, bigram) AS rk,
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, bigram
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_occ
  FROM census
)
SELECT CAST(rk AS BIGINT) AS rank_cut, cum_occ AS covered_slots,
       t.total_slots,
       CAST({cov} AS BIGINT) AS coverage_micro
FROM ranked CROSS JOIN tot t
WHERE rk IN ({cuts})
ORDER BY rank_cut
"""


REGISTRY["ngram_coverage"] = QuerySpec(
    q_ngram_coverage,
    _oracle_ngram_coverage(),
    "top-K bigram cumulative coverage of all bigram slots (corpus "
    "redundancy curve) — census groupBy + TakeOrdered(1000) window",
)


# ---------------------------------------------------------------------------
# embedding_pca — top principal direction via two in-engine power steps
# ---------------------------------------------------------------------------
#
# PCA whitening is a standard embedding-pipeline stage (decorrelate
# before quantization/ANN). The power method maps perfectly onto
# map-side-combinable aggregates: w ← Σ_rows x·(x·v) needs one
# projection pass (a vec_id window) and one per-dim re-aggregate (64
# keys) per iteration — never a D×D gram matrix, never vectors to the
# driver. Two fixed iterations from the uniform start; each step
# monotonically raises the Rayleigh quotient (the convergence metric —
# on a near-isotropic spectrum like this synthetic corpus the top
# DIRECTION is ill-conditioned by nature, λ2/λ1 ≈ 0.94). Production
# loops to tolerance with the same per-iteration plan.
#
# Exactness: projections floor-quantize at 10⁶ per element; per-dim
# sums are exact int64 (bounds documented inline); iteration-boundary
# rescaling is sign-magnitude max-abs normalization — sign(w) ·
# (|w| div (max|w| div 10⁶ + 1)) — because negative integer division
# truncates toward zero in Spark but floors in DuckDB, so |·| keeps
# both engines on the nonnegative-div common ground. The rescale is a
# HYBRID on the max magnitude m: the exact product form
# (|w|·10⁶ div m) while m ≤ 9·10¹² — where the product provably fits
# int64 (≤ 9·10¹⁸ < 2⁶³) — and the divide-first form
# (|w| div (m div 10⁶ + 1)) beyond, where every intermediate stays
# ≤ m and the relative quantization is ≤ ~10⁻⁶ because the divisor
# exceeds 9·10⁶. The pure product form overflowed past ~5·10⁵ vectors
# (Spark wraps silently where DuckDB errors); the pure divide-first
# form undershot up to 2× for m just above 10⁶ — the hybrid is exact
# where exactness is cheap and bounded-error where it is not. m = 0
# (all-zero corpus) short-circuits to 0, no div-by-zero either engine.

_RESCALE = (
    "CASE WHEN {m} = 0 THEN 0"
    " WHEN {m} <= 9000000000000 THEN (ABS({w}) * 1000000) div {m}"
    " ELSE ABS({w}) div ({m} div 1000000 + 1) END"
)

_ORACLE_RESCALE = (
    "CASE WHEN {m} = 0 THEN 0"
    " WHEN {m} <= 9000000000000 THEN (ABS({w}) * 1000000) // {m}"
    " ELSE ABS({w}) // ({m} // 1000000 + 1) END"
)


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("d", "xv"),
    ).select("vec_id", "d", F.col("xv").cast("double").alias("x"))

    wv = Window.partitionBy("vec_id")
    wall = Window.partitionBy(F.lit(0))

    # iteration 1: v0 = 1 (uniform) — s1 = Σ_d floor(x·10⁶) ≤ 64·10⁶
    it1 = elems.withColumn(
        "s1", F.sum(F.floor(F.col("x") * F.lit(1e6))).over(wv)
    )
    # w1_d = Σ_vec floor(x·s1): |term| ≤ 0.32·6.4e7 ≈ 2e7, summed over
    # every vector — the SUM is int64-safe past 10¹¹ vectors, and the
    # hybrid rescale below is overflow-safe at any magnitude (the old
    # unconditional ABS(w1)·10⁶ product overflowed at ~5·10⁵ vectors)
    w1 = it1.groupBy("d").agg(
        F.sum(F.floor(F.col("x") * F.col("s1"))).alias("w1")
    )
    # hybrid rescale (see block comment): the exact product form while
    # it cannot overflow (m ≤ 9e12 keeps ABS(w)·10⁶ ≤ 9e18 < 2⁶³),
    # divide-first beyond — which is ≤ 10⁻⁶-relative there because the
    # divisor m div 10⁶ + 1 is ≥ 9·10⁶
    v1 = w1.withColumn("m1", F.max(F.abs(F.col("w1"))).over(wall)).select(
        "d",
        (F.signum("w1").cast("long") * F.expr(_RESCALE.format(w="w1", m="m1"))).alias(
            "v1"
        ),
    )
    # iteration 2 against the 64-row broadcast v1 (|v1| ≤ 10⁶):
    # s2 = Σ_d floor(x·v1_d) ≤ 64·3.2e5; w2 terms ≤ 0.32·2.1e7
    it2 = (
        elems.join(F.broadcast(v1), "d")
        .withColumn(
            "s2", F.sum(F.floor(F.col("x") * F.col("v1"))).over(wv)
        )
    )
    w2 = it2.groupBy("d").agg(
        F.sum(F.floor(F.col("x") * F.col("s2"))).alias("w2")
    )
    return (
        w2.withColumn("m2", F.max(F.abs(F.col("w2"))).over(wall))
        .select(
            F.col("d").cast("long").alias("dim"),
            F.col("w2").cast("long").alias("w2"),
            (
                F.signum("w2").cast("long")
                * F.expr(_RESCALE.format(w="w2", m="m2"))
            ).alias("component_micro"),
        )
        .orderBy("dim")
    )


_O_V1 = _ORACLE_RESCALE.format(w="w1", m="MAX(ABS(w1)) OVER ()")
_O_V2 = _ORACLE_RESCALE.format(w="w2", m="MAX(ABS(w2)) OVER ()")

ORACLE_EMBEDDING_PCA = f"""
WITH elems AS (
  SELECT vec_id, CAST(d - 1 AS INT) AS d, CAST(x AS DOUBLE) AS x
  FROM (SELECT vec_id,
               UNNEST(embedding) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS d
        FROM embeddings)
),
it1 AS (
  SELECT vec_id, d, x,
         CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT))
              OVER (PARTITION BY vec_id) AS BIGINT) AS s1
  FROM elems
),
w1 AS (
  SELECT d, CAST(SUM(CAST(FLOOR(x * s1) AS BIGINT)) AS BIGINT) AS w1
  FROM it1 GROUP BY 1
),
v1 AS (
  SELECT d,
         CAST(CASE WHEN w1 > 0 THEN 1 WHEN w1 < 0 THEN -1 ELSE 0 END
              * ({_O_V1})
            AS BIGINT)
           AS v1
  FROM w1
),
it2 AS (
  SELECT e.vec_id, e.d, e.x,
         CAST(SUM(CAST(FLOOR(e.x * v.v1) AS BIGINT))
              OVER (PARTITION BY e.vec_id) AS BIGINT) AS s2
  FROM elems e JOIN v1 v ON e.d = v.d
),
w2 AS (
  SELECT d, CAST(SUM(CAST(FLOOR(x * s2) AS BIGINT)) AS BIGINT) AS w2
  FROM it2 GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS dim, w2,
       CAST(CASE WHEN w2 > 0 THEN 1 WHEN w2 < 0 THEN -1 ELSE 0 END
            * ({_O_V2})
          AS BIGINT)
         AS component_micro
FROM w2 ORDER BY dim
"""

REGISTRY["embedding_pca"] = QuerySpec(
    q_embedding_pca,
    ORACLE_EMBEDDING_PCA,
    "top principal direction by two in-engine power-method iterations "
    "(projection window + 64-key re-aggregate per step, no gram matrix)",
)


# ---------------------------------------------------------------------------
# pca_project_stored — projection served from the PERSISTED component
# ---------------------------------------------------------------------------
#
# embedding_pca is the TRAINING face: every call replays both power
# iterations. Production projects against a component learned once and
# versioned as an artifact — the ivf_stored / bpe_encode_stored
# convention applied to the last in-engine-training query that lacked
# its serving twin. The stored form reads the 64-row component parquet
# (data_lake_spark.artifacts: fingerprint-keyed, so regenerated
# embeddings retrain) and pays ONE pass over the corpus: explode →
# broadcast join on the dim key → per-vector SUM. No vec_id window, no
# per-dim re-aggregate, zero power-iteration stages in-plan — the plan
# census in tests/test_plan_contracts.py pins exactly that.
#
# Exactness: proj_micro = Σ_d floor(x_d · v_d) with |v_d| ≤ 10⁶ and
# |x| ≤ ~0.32, so |term| < 3.2·10⁵ and the 64-term sum < 2.1·10⁷ —
# int64-trivial. The double product x·v is IEEE-identical across
# engines, and the artifact's long components round-trip parquet
# bit-exactly, so the oracle may recompute the component inline (SQL
# cannot read the artifact) and still match bit-for-bit.


def stored_pca_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_lake_spark.artifacts import stored_artifact

    return stored_artifact(
        spark,
        sf_dir,
        "pca_component",
        ["embeddings"],
        lambda: q_embedding_pca(spark, sf_dir).select(
            "dim", "component_micro"
        ),
        # builder-format version: "2" = the hybrid max-abs rescale
        # (bump whenever the training arithmetic changes — the data
        # fingerprint alone cannot see code drift)
        version="2",
    )


def q_pca_project_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector projection onto the stored top principal component —
    the serving twin of q_embedding_pca (see block comment)."""
    comp = stored_pca_component(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("d", "xv"),
    ).select("vec_id", "d", F.col("xv").cast("double").alias("x"))
    return (
        elems.join(F.broadcast(comp), elems["d"] == comp["dim"])
        .groupBy("vec_id")
        .agg(
            F.sum(F.floor(F.col("x") * F.col("component_micro")))
            .cast("long")
            .alias("proj_micro")
        )
        .orderBy("vec_id")
    )


ORACLE_PCA_PROJECT = f"""
WITH elems AS (
  SELECT vec_id, CAST(d - 1 AS INT) AS d, CAST(x AS DOUBLE) AS x
  FROM (SELECT vec_id,
               UNNEST(embedding) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS d
        FROM embeddings)
),
it1 AS (
  SELECT vec_id, d, x,
         CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT))
              OVER (PARTITION BY vec_id) AS BIGINT) AS s1
  FROM elems
),
w1 AS (
  SELECT d, CAST(SUM(CAST(FLOOR(x * s1) AS BIGINT)) AS BIGINT) AS w1
  FROM it1 GROUP BY 1
),
v1 AS (
  SELECT d,
         CAST(CASE WHEN w1 > 0 THEN 1 WHEN w1 < 0 THEN -1 ELSE 0 END
              * ({_O_V1})
            AS BIGINT)
           AS v1
  FROM w1
),
it2 AS (
  SELECT e.vec_id, e.d, e.x,
         CAST(SUM(CAST(FLOOR(e.x * v.v1) AS BIGINT))
              OVER (PARTITION BY e.vec_id) AS BIGINT) AS s2
  FROM elems e JOIN v1 v ON e.d = v.d
),
w2 AS (
  SELECT d, CAST(SUM(CAST(FLOOR(x * s2) AS BIGINT)) AS BIGINT) AS w2
  FROM it2 GROUP BY 1
),
comp AS (
  SELECT d,
         CAST(CASE WHEN w2 > 0 THEN 1 WHEN w2 < 0 THEN -1 ELSE 0 END
              * ({_O_V2})
            AS BIGINT)
           AS v
  FROM w2
)
SELECT e.vec_id,
       CAST(SUM(CAST(FLOOR(e.x * c.v) AS BIGINT)) AS BIGINT) AS proj_micro
FROM elems e JOIN comp c ON e.d = c.d
GROUP BY 1
ORDER BY vec_id
"""

REGISTRY["pca_project_stored"] = QuerySpec(
    q_pca_project_stored,
    ORACLE_PCA_PROJECT,
    "per-vector projection onto the PERSISTED top principal component: "
    "one explode + 64-row broadcast join + per-vector sum, zero "
    "power-iteration stages in-plan (the stored-artifact serving twin "
    "of embedding_pca)",
)
