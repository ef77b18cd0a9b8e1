"""Takedown propagation for the persisted index families.

The lake's CDC surface (versioned.version_diff / apply_changes) can
remove a document from the TABLES, but the derived dedup/ANN indexes —
gram postings, LSH band signatures, dHash/audio fingerprint indexes,
IVF(-PQ) code lists — only ever grew: a GDPR/DMCA takedown could not
retract the deleted content's grams, hashes, or codes, so a removed
document kept suppressing "duplicates" of itself and kept surfacing as
a neighbor. This module adds the standard search-engine remedy
(Lucene's deleted-docs bitmap, applied lake-style):

- **Tombstones** — :func:`delete_ids` records deleted ids under
  ``<index_root>/_tombstones/`` (the underscore prefix keeps Spark's
  partition discovery of ``batch_id=*`` dirs blind to them). Each
  delete call writes a digest-named overwrite dir, so replays of the
  same takedown are idempotent, and the set is append-only/mergeable —
  a tombstone holds only the numeric id, never the content being
  removed.
- **Read-side filtering** — every index reader anti-joins the
  tombstone set (broadcast; takedown sets are legal-request-sized),
  so deletion is effective IMMEDIATELY after :func:`delete_ids`
  returns, without rewriting a single index file. A crash-replayed
  micro-batch that republishes a deleted document's rows cannot
  resurrect it: the filter is applied at read, not at write.
- **Physical purge at compaction** — ``compact_gram_index`` drops
  tombstoned postings while folding, so the bytes leave the disk on
  the existing maintenance schedule (the Lucene merge analogy); the
  tombstone files remain, continuing to screen any not-yet-compacted
  stream dirs.

The gram index is deletable because its partials are per-(gram,
document) postings — ``keeper = doc_id·2²⁰ + pos`` makes the document
id recoverable from every row (``incremental._gram_partials``). The
hash/LSH/IVF indexes store row-level (media_id / doc_id / vec_id)
entries already.

At 100 TB: tombstone sets stay tiny (thousands of ids), so every
filter is a broadcast anti-join appended to an existing scan — no new
shuffle anywhere.
"""

from __future__ import annotations

import glob
import hashlib
import os
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tombstones live beside the batch dirs; the leading underscore hides
#: the subtree from Spark's partition discovery of the index root
TOMB_DIR = "_tombstones"


def delete_ids(
    spark: SparkSession,
    index_roots: str | Sequence[str],
    ids: Iterable[int],
    id_col: str = "doc_id",
) -> None:
    """Record a takedown: ``ids`` are dead to every reader of the given
    index root(s) from this call on. Pass every root the content
    touched (e.g. the dHash family's ``index_root`` AND ``pairs_root``)
    — each root owns its tombstones so its readers stay self-contained.

    Idempotent: the dir name digests the sorted id set, and the write
    is an overwrite — replaying the same takedown republishes identical
    files. Distinct takedowns get distinct dirs; the reader unions
    them."""
    uniq = sorted({int(i) for i in ids})
    if not uniq:
        return
    digest = hashlib.sha1(
        (id_col + ":" + ",".join(map(str, uniq))).encode()
    ).hexdigest()[:16]
    df = spark.createDataFrame([(i,) for i in uniq], f"{id_col} long")
    roots = [index_roots] if isinstance(index_roots, str) else index_roots
    for root in roots:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, TOMB_DIR, f"del_{digest}")
        )


def read_tombstones(
    spark: SparkSession, index_root: str, id_col: str = "doc_id"
) -> Optional[DataFrame]:
    """The union of every takedown recorded under ``index_root``, as a
    one-column (``id_col``) frame — or None when no takedown exists
    (the common case; callers skip the join entirely)."""
    dirs = sorted(glob.glob(os.path.join(index_root, TOMB_DIR, "del_*")))
    if not dirs:
        return None
    df = spark.read.parquet(*dirs)
    src_col = df.columns[0]
    return df.select(F.col(src_col).alias(id_col)).distinct()


def filter_tombstoned(
    df: DataFrame, tomb: Optional[DataFrame], cols: Sequence[str]
) -> DataFrame:
    """Drop every row where ANY of ``cols`` is a tombstoned id —
    one broadcast anti-join per column (pair tables have two id
    columns). No-op when ``tomb`` is None."""
    if tomb is None:
        return df
    tomb_id = tomb.columns[0]
    for c in cols:
        df = df.join(
            F.broadcast(tomb.select(F.col(tomb_id).alias(c))), c, "left_anti"
        )
    return df
