"""Unicode normalization — the text-hygiene stage every multilingual
corpus needs before hashing/dedup (composed vs decomposed forms of the
SAME text hash differently: 'café' with U+00E9 and 'cafe' + U+0301 are
distinct byte strings, so exact dedup, gram indexes, and MinHash all
silently treat them as different documents until the corpus is
normalized).

Spark exposes no JVM built-in for Unicode normalization, so this is an
honest Arrow-batched stage (the media-decode argument): one
``pandas_udf`` over the text column, vectorized batch transfer, no
per-row Python round-trips. At 100 TB it is a map-only pass that
fuses into the ingest scan — run it ONCE at bronze→silver, never
per-query.

Cross-engine contract: Python's ``unicodedata.normalize("NFC", ·)``
and DuckDB's ``nfc_normalize`` both implement Unicode NFC (verified on
composed/decomposed Latin, combining marks, and ASCII), which is what
makes the audit query oracle-pairable.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


@F.pandas_udf("string")
def nfc_col(s: pd.Series) -> pd.Series:
    """NFC-normalize a string column (Arrow-batched; NULL-safe)."""
    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def with_nfc(col: str | Column, out: str = "nfc_text"):
    """(column expression) → the NFC-normalized twin, for select()."""
    c = F.col(col) if isinstance(col, str) else col
    return nfc_col(c).alias(out)
