"""Python UDTF surface (SURVEY §2.12) — the one custom-function flavor
the engine had not yet pinned with a contract: scalar Pandas UDFs,
grouped-map (lang_fit), mapInPandas (multimodal), and
applyInPandasWithState (streaming rollup) all have oracle- or
test-verified showcases; this module adds the table-valued extension
point (Spark 4 ``@udtf``, arrow-serialized rows) and proves it against
the built-in expression form.

Production rule unchanged: row-generating transforms that CAN be
expressed with explode/HOFs SHOULD be (JVM codegen, no Python
round-trip) — ``sentence_rows_expr`` below is the production path and
the UDTF is the extension contract for logic that genuinely needs
Python (a real sentence segmenter, a domain parser, a tokenizer with
state). The test suite holds the two forms row-identical so a future
Python implementation can be swapped in knowing exactly what the
JVM-side contract is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string")
class SentenceSplit:
    """Split a text into ('. '-delimited) sentence rows with a 0-based
    index. Deliberately the same semantics as sentence_rows_expr so the
    pair is testable; empty fragments are dropped, the terminal '.' is
    kept on its sentence."""

    def eval(self, text: str):  # noqa: D102 — UDTF protocol method
        if text is None:
            return
        idx = 0
        parts = text.split(". ")
        for i, p in enumerate(parts):
            s = p if i == len(parts) - 1 else p + "."
            if s:
                yield idx, s
                idx += 1


def register_sentence_split(spark: SparkSession, name: str = "sentence_split") -> None:
    """Register the UDTF for SQL lateral use:
    ``SELECT d.doc_id, s.* FROM docs d, LATERAL sentence_split(d.text) s``."""
    spark.udtf.register(name, SentenceSplit)


def sentence_rows_expr(text: Column) -> Column:
    """The JVM-side production twin: the same (idx, sentence) rows as
    one higher-order-function expression (split + re-append the '.'
    on every non-final fragment + filter empties) ready for
    ``explode`` — whole-stage codegen, no Python round-trip."""
    parts = F.split(text, "\\. ")
    n = F.size(parts)
    with_dot = F.transform(
        parts,
        lambda p, i: F.when(i < n - 1, F.concat(p, F.lit("."))).otherwise(p),
    )
    kept = F.filter(with_dot, lambda s: s != "")
    return F.transform(
        kept, lambda s, i: F.struct(i.cast("int").alias("idx"), s.alias("sentence"))
    )


def sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, idx, sentence) via the production expression form."""
    return docs.select(
        "doc_id", F.explode(sentence_rows_expr(F.col(text_col))).alias("s")
    ).select("doc_id", F.col("s.idx").alias("idx"), F.col("s.sentence").alias("sentence"))
