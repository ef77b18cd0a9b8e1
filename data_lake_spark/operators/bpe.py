"""In-engine BPE merge learning (Sennrich et al. 2016) — the tokenizer
TRAINING side; queries/llm3.py's ``bpe_tokens`` covers the accounting
(fertility) side with a fixed regex pretokenizer.

The industrial shape: BPE never iterates over the corpus. One
corpus-scale aggregation builds the (word, count) vocabulary table —
after that, every merge round runs over the vocabulary only (tens of
thousands of rows at any corpus size), so 100 TB of text and 100 MB of
text pay the same per-round cost. Each round is:

1. adjacent symbol-pair counts weighted by word frequency — a map-only
   pair expansion over the vocabulary + one map-side-combinable SUM;
2. argmax pair (count desc, then lexicographic — the deterministic
   tie-break; ONE row crosses to the driver per round, model state,
   the kmeans/classifier_train convention);
3. apply the merge to every word's symbol array — a left-to-right fold
   as a higher-order ``aggregate`` expression: zero shuffle, lineage
   cut per round with localCheckpoint.

All arithmetic is integer counts; ties break lexicographically — the
whole procedure is deterministic on any partitioning, proven against a
plain-Python reference replay in tests/test_bpe_learn.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) vocabulary table — the single corpus-scale pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _merge_expr(sym: Column, a: Column, b: Column, joined: Column) -> Column:
    """Left-to-right single-pass merge of adjacent (a, b) into
    ``joined`` within the symbols array — the BPE apply step as one
    fold; the skip flag consumes the right element of a merged pair so
    overlapping occurrences (e.g. 'aaa' with merge (a,a)) resolve
    leftmost-first, exactly like the reference implementation."""
    n = F.size(sym)
    return F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, i: F.when(
            acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip"))
        )
        .when(
            (i < n) & (F.element_at(sym, i) == a) & (F.element_at(sym, i + 1) == b),
            F.struct(
                F.concat(acc["out"], F.array(joined)).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(F.element_at(sym, i))).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )


def bpe_learn(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a corpus.

    Returns (merges, vocab_symbols): the ordered merge list, and the
    final (word, n, symbols) vocabulary frame (useful for fertility
    accounting of the learned tokenizer). Stops early if no adjacent
    pair repeats. Word boundary handling: words are split to characters
    with a ``</w>`` end-of-word marker appended as its own symbol (the
    Sennrich formulation), so merges never cross word boundaries."""
    wc = word_counts(docs, text_col)
    vocab = wc.select(
        "word",
        "n",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit("</w>"))
        ).alias("symbols"),
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # guard single-symbol words: sequence(1, 0) DESCENDS in Spark
        # ([1, 0]), so an unguarded transform would index out of bounds
        # once a merge collapses a whole word to one symbol
        pair_arr = F.when(
            F.size("symbols") > 1,
            F.transform(
                F.sequence(F.lit(1), F.size("symbols") - 1),
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("a"),
                    F.element_at("symbols", i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<a:string,b:string>>)"))
        pairs = vocab.select("n", F.explode(pair_arr).alias("p"))
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "word",
            "n",
            _merge_expr(
                F.col("symbols"), F.lit(a), F.lit(b), F.lit(a + b)
            ).alias("symbols"),
        ).localCheckpoint(eager=False)
    return merges, vocab
