"""operators/entity.py: blocked fuzzy join semantics vs brute force,
and the deterministic typo generator's edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.operators.entity import blocked_fuzzy_join, delete_char


def _frames(spark):
    clean = spark.createDataFrame(
        [
            (1, "spark analytics engine"),
            (2, "spark analytics enginr"),
            (3, "duckdb oracle harness"),
            (4, "zzz unrelated title"),
        ],
        "clean_id long, title string",
    ).withColumn("blk", F.substring("title", 1, 3))
    dirty = spark.createDataFrame(
        [
            (10, "spark analytics engin"),   # dist 1 to #1 AND to #2
            (11, "duckdb oracle harnes"),     # dist 1 to #3
            (12, "spa completely different"), # blocks with spark, dist big
            (13, "qqq no block partner"),     # block matches nothing
        ],
        "ref_id long, title string",
    ).withColumn("blk", F.substring("title", 1, 3))
    return dirty, clean


def test_blocked_join_matches_bruteforce_within_blocks(spark):
    dirty, clean = _frames(spark)
    got = sorted(
        (r.ref_id, r.clean_id_clean, r.edit_dist)
        for r in blocked_fuzzy_join(
            dirty, clean, "title", "blk", max_dist=2
        ).collect()
    )
    assert got == [(10, 1, 1), (10, 2, 1), (11, 3, 1)]


def test_blocking_never_invents_pairs(spark):
    # the blocked result must be a subset of the unblocked brute force
    dirty, clean = _frames(spark)
    brute = {
        (r.ref_id, r.clean_id)
        for r in dirty.crossJoin(
            clean.select(
                F.col("clean_id"), F.col("title").alias("t2")
            )
        )
        .filter(F.levenshtein("title", "t2") <= 2)
        .collect()
    }
    blocked = {
        (r.ref_id, r.clean_id_clean)
        for r in blocked_fuzzy_join(
            dirty, clean, "title", "blk", max_dist=2
        ).collect()
    }
    assert blocked <= brute


def test_delete_char_positions(spark):
    df = spark.createDataFrame([("abcdef",)], "s string")
    out = df.select(
        delete_char(F.col("s"), F.lit(1)).alias("first"),
        delete_char(F.col("s"), F.lit(3)).alias("mid"),
        delete_char(F.col("s"), F.lit(6)).alias("last"),
        delete_char(F.col("s"), F.lit(99)).alias("past_end"),
    ).first()
    assert out.first == "bcdef"
    assert out.mid == "abdef"
    assert out.last == "abcde"
    assert out.past_end == "abcdef"  # identity beyond the string


def test_lang_fit_degenerate_group_yields_null_not_crash(spark, tmp_path):
    # one doc in a lang / all docs same length -> den = 0: the pandas
    # fit must emit NULL slope/intercept, not ZeroDivisionError
    from data_lake_spark.queries.train_q import ORACLE_LANG_FIT, q_lang_fit
    from tests.compare import compare

    import pandas as pd

    rows = [
        (0, "a b c", "xx", "s", 5),      # single doc in lang xx
        (1, "d e", "yy", "s", 3),        # two docs, SAME n_chars
        (2, "f g h i", "yy", "s", 3),
        (3, "j k", "zz", "s", 2),        # healthy group
        (4, "l m n o p q", "zz", "s", 11),
    ]
    sf = str(tmp_path / "degen")
    (tmp_path / "degen").mkdir()
    # single parquet FILE (not a Spark part-dir): both catalog.load_table
    # and the DuckDB oracle's read_parquet read the same path
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{sf}/documents.parquet")
    out = {r.lang: (r.slope, r.intercept) for r in q_lang_fit(spark, sf).collect()}
    assert out["xx"] == (None, None)
    assert out["yy"] == (None, None)
    assert out["zz"][0] is not None
    compare(q_lang_fit(spark, sf), ORACLE_LANG_FIT, sf)
