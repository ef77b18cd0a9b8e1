"""Property-based checks (hypothesis) for the round-5 operators:

- interval_join equals the brute-force inequality join on arbitrary
  integer interval sets and chunk widths, each pair exactly once;
- the pareto_front window algebra equals brute-force dominance on
  arbitrary integer point sets (incl. duplicate x and duplicate
  points — the tie semantics that sink naive skylines);
- the blocked fuzzy join never invents pairs and, when the block key
  survives the perturbation, finds every within-threshold pair the
  brute force finds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 120)),
        min_size=1,
        max_size=25,
    ),
    jvs=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 120)),
        min_size=1,
        max_size=25,
    ),
    chunk=st.sampled_from([1, 7, 16, 100, 1000]),
)
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce_property(spark, ivs, jvs, chunk):
    from data_lake_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(ivs)],
        "lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(jvs)],
        "rid long, rs long, re long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "ls", "le", "rs", "re", chunk=chunk
        ).collect()
    )
    want = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert got == want  # same multiset: nothing missed, nothing doubled


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_pareto_window_algebra_matches_bruteforce(spark, pts):
    # mirror the pareto_front query's plan on raw points: per-x max y,
    # exclusive running max over x desc, keep y == group max and
    # y > best_above
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "pid long, x long, y long",
    )
    g = df.groupBy("x").agg(F.max("y").alias("ymax"))
    w = Window.orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    m = g.withColumn("best_above", F.max("ymax").over(w))
    got = {
        r.pid
        for r in df.join(m, "x")
        .filter(
            (F.col("y") == F.col("ymax"))
            & (
                F.col("best_above").isNull()
                | (F.col("y") > F.col("best_above"))
            )
        )
        .collect()
    }
    want = {
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for (x2, y2) in pts
        )
    }
    assert got == want


_WORDS = st.text(alphabet="abc", min_size=4, max_size=10)


@given(
    names=st.lists(_WORDS, min_size=1, max_size=15, unique=True),
    dist=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_blocked_fuzzy_join_subset_and_block_complete(spark, names, dist):
    from data_lake_spark.operators.entity import blocked_fuzzy_join

    clean = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "clean_id long, title string"
    ).withColumn("blk", F.substring("title", 1, 2))
    dirty = spark.createDataFrame(
        [(i + 1000, n) for i, n in enumerate(names)],
        "ref_id long, title string",
    ).withColumn("blk", F.substring("title", 1, 2))
    blocked = {
        (r.ref_id, r.clean_id_clean)
        for r in blocked_fuzzy_join(
            dirty, clean, "title", "blk", max_dist=dist
        ).collect()
    }
    brute = {
        (r.ref_id, r.clean_id)
        for r in dirty.select("ref_id", F.col("title").alias("dt"), "blk")
        .crossJoin(
            clean.select(
                "clean_id", F.col("title").alias("ct"), F.col("blk").alias("cblk")
            )
        )
        .filter(F.levenshtein("dt", "ct") <= dist)
        .collect()
    }
    same_block = {
        (r.ref_id, r.clean_id)
        for r in dirty.select("ref_id", F.col("title").alias("dt"), "blk")
        .crossJoin(
            clean.select(
                "clean_id", F.col("title").alias("ct"), F.col("blk").alias("cblk")
            )
        )
        .filter(
            (F.levenshtein("dt", "ct") <= dist)
            & (F.col("blk") == F.col("cblk"))
        )
        .collect()
    }
    # blocking can only LOSE cross-block pairs, never invent or drop
    # a within-block pair
    assert blocked <= brute
    assert blocked == same_block
