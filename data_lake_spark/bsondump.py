"""S9 closer: a dependency-free reader for mongodump ``.bson`` files.

The reference's MongoDB dimension collections (users / offices / cities
/ rooms; `data-lake-stack.yml:62-148`, connection `:205-216`) reach the
lake through a network connector this sandbox cannot ship
(``io.read_mongo_dim`` stays the config-gated LIVE path and raises with
a clear contract). The standard offline interchange for those same
collections is ``mongodump``, whose ``.bson`` files are nothing but a
concatenation of BSON documents — a PUBLIC byte format
(https://bsonspec.org/spec.html), the same class of self-describing
container as the RIFF/WAV/AVI walkers in ``operators/audiofp.py`` /
``operators/videofp.py``. This module walks that format in pure Python
and exposes it as a DataFrame source, so the reference's Mongo dims can
be ingested from dump files with zero extra dependencies.

Scale shape: one ``.bson`` file is NOT splittable (documents are
length-prefixed with no sync marker, like a gzip JSON file), so
parallelism is per FILE — ``binaryFile`` source → one Arrow-batched
``mapInPandas`` decode pass per file, the exact economics of Spark's
own whole-file codecs. mongodump emits one file per collection and
dimension collections are small by definition; a huge collection should
be dumped per-shard (many files) or ingested via the live connector.
Decoded rows conform to an explicit caller schema (never inference), so
the bronze zone's columns are stable across dumps.
"""

from __future__ import annotations

import datetime as _dt
import json as _json
import struct
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# BSON element type tags (bsonspec.org). Deprecated/unsupported tags
# raise loudly rather than mis-decode: a dim ingest must never guess.
_EOO = 0x00
_DOUBLE = 0x01
_STRING = 0x02
_DOCUMENT = 0x03
_ARRAY = 0x04
_BINARY = 0x05
_OBJECTID = 0x07
_BOOL = 0x08
_DATETIME = 0x09
_NULL = 0x0A
_INT32 = 0x10
_TIMESTAMP = 0x11
_INT64 = 0x12


def _read_cstring(buf: bytes, off: int, limit: int) -> tuple[str, int]:
    """NUL-terminated element name, bounded by the enclosing document:
    a terminator found at/after ``limit`` means the name ran off the
    document — raising here (not at the next tag read) keeps corrupt
    input on the ValueError contract and off the next document's
    bytes."""
    try:
        end = buf.index(b"\x00", off)
    except ValueError:
        raise ValueError(f"unterminated BSON cstring at offset {off}")
    if end >= limit - 1:
        # the terminator landed on (or past) the document's EOO byte:
        # the name ran off the element stream — an in-bounds name must
        # leave room for the trailing EOO after its value
        raise ValueError(
            f"BSON cstring at offset {off} overruns its document"
        )
    return buf[off:end].decode("utf-8"), end + 1


def _fits(off: int, n: int, limit: int, what: str) -> None:
    if off + n > limit:
        raise ValueError(
            f"BSON {what} at offset {off} overruns its document"
        )


def _read_value(buf: bytes, off: int, tag: int, limit: int):
    """Decode one element value; EVERY read — fixed-width and
    variable-length alike — is bounds-checked against ``limit`` (the
    END of the enclosing document), so corrupt or truncated input
    raises ValueError instead of reading across document boundaries or
    dying with IndexError/struct.error."""
    if tag == _DOUBLE:
        _fits(off, 8, limit, "double")
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if tag == _STRING:
        _fits(off, 4, limit, "string header")
        (n,) = struct.unpack_from("<i", buf, off)
        if n < 1 or off + 4 + n > limit:
            raise ValueError(f"BSON string length {n} at {off} overruns")
        s = buf[off + 4 : off + 4 + n - 1].decode("utf-8")
        return s, off + 4 + n
    if tag in (_DOCUMENT, _ARRAY):
        _fits(off, 4, limit, "document header")
        (n,) = struct.unpack_from("<i", buf, off)
        if n < 5 or off + n > limit:
            raise ValueError(
                f"nested BSON document size {n} at {off} overruns its parent"
            )
        inner = _parse_document(buf, off, off + n)
        if tag == _ARRAY:
            # arrays are documents keyed '0','1',... in order
            inner = [inner[str(i)] for i in range(len(inner))]
        return inner, off + n
    if tag == _BINARY:
        _fits(off, 5, limit, "binary header")
        (n,) = struct.unpack_from("<i", buf, off)
        if n < 0 or off + 5 + n > limit:
            raise ValueError(f"BSON binary length {n} at {off} overruns")
        subtype = buf[off + 4]
        data = bytes(buf[off + 5 : off + 5 + n])
        if subtype == 0x02:  # legacy "old binary": payload is len-prefixed
            data = data[4:]
        return data, off + 5 + n
    if tag == _OBJECTID:
        _fits(off, 12, limit, "objectid")
        return bytes(buf[off : off + 12]).hex(), off + 12
    if tag == _BOOL:
        _fits(off, 1, limit, "bool")
        return buf[off] != 0, off + 1
    if tag == _DATETIME:
        _fits(off, 8, limit, "datetime")
        (ms,) = struct.unpack_from("<q", buf, off)
        return (
            _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=ms),
            off + 8,
        )
    if tag == _NULL:
        return None, off
    if tag == _INT32:
        _fits(off, 4, limit, "int32")
        return struct.unpack_from("<i", buf, off)[0], off + 4
    if tag == _TIMESTAMP:  # internal replication ts: expose raw uint64
        _fits(off, 8, limit, "timestamp")
        return struct.unpack_from("<Q", buf, off)[0], off + 8
    if tag == _INT64:
        _fits(off, 8, limit, "int64")
        return struct.unpack_from("<q", buf, off)[0], off + 8
    raise ValueError(
        f"unsupported BSON element type 0x{tag:02x} at offset {off} — "
        "decimal128/regex/code/minkey/maxkey are not dimension-table "
        "types; re-dump with a supported projection"
    )


def _parse_document(buf: bytes, start: int, end: int) -> dict:
    """One document: int32 total size (includes itself and the trailing
    0x00), then elements ``tag cstring value`` until EOO."""
    (size,) = struct.unpack_from("<i", buf, start)
    if (
        size != end - start
        or size < 5
        or end > len(buf)
        or buf[end - 1] != _EOO
    ):
        raise ValueError(f"malformed BSON document at offset {start}")
    out: dict = {}
    off = start + 4
    while True:
        tag = buf[off]
        if tag == _EOO:
            if off != end - 1:
                raise ValueError(
                    f"BSON document terminated early at offset {off}"
                )
            return out
        name, off = _read_cstring(buf, off + 1, end)
        out[name], off = _read_value(buf, off, tag, end)


def iter_bson_docs(buf: bytes) -> Iterator[dict]:
    """Walk a mongodump ``.bson`` byte string: documents back to back,
    each length-prefixed. Trailing garbage raises (a truncated dump
    must fail the ingest, not silently drop rows)."""
    off, total = 0, len(buf)
    while off < total:
        if total - off < 5:
            raise ValueError(f"trailing {total - off} bytes are not a document")
        (size,) = struct.unpack_from("<i", buf, off)
        if size < 5 or off + size > total:
            raise ValueError(f"document size {size} at {off} overruns file")
        yield _parse_document(buf, off, off + size)
        off += size


def _conform_cell(v, dtype: T.DataType):
    """Python-decoded BSON value → cell for a Spark column of ``dtype``.
    Explicit, lossless-or-loud: unsupported combinations raise."""
    if v is None:
        return None
    if isinstance(dtype, T.StringType):
        if isinstance(v, str):
            return v
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, _dt.datetime):
            # canonical 'YYYY-MM-DD HH:MM:SS.mmm': BSON datetimes are
            # ms-precision, so the string form carries exactly that —
            # fixed width, no parser-dependent fraction trimming
            return (
                v.strftime("%Y-%m-%d %H:%M:%S")
                + f".{v.microsecond // 1000:03d}"
            )
        if isinstance(v, (dict, list)):
            # nested docs conform to string as canonical JSON — the
            # raw-payload bronze convention (sort_keys: deterministic)
            return _json.dumps(v, sort_keys=True, default=str)
        return str(v)
    if isinstance(dtype, T.LongType) or isinstance(dtype, T.IntegerType):
        if isinstance(v, bool) or not isinstance(v, int):
            raise ValueError(f"BSON {type(v).__name__} into {dtype}")
        return v
    if isinstance(dtype, T.DoubleType) or isinstance(dtype, T.FloatType):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"BSON {type(v).__name__} into {dtype}")
        return float(v)
    if isinstance(dtype, T.BooleanType):
        if not isinstance(v, bool):
            raise ValueError(f"BSON {type(v).__name__} into {dtype}")
        return v
    if isinstance(dtype, T.TimestampType):
        if not isinstance(v, _dt.datetime):
            raise ValueError(f"BSON {type(v).__name__} into {dtype}")
        return v
    if isinstance(dtype, T.BinaryType):
        if not isinstance(v, (bytes, bytearray)):
            raise ValueError(f"BSON {type(v).__name__} into {dtype}")
        return bytes(v)
    if isinstance(dtype, T.ArrayType):
        if not isinstance(v, list):
            raise ValueError(f"BSON {type(v).__name__} into {dtype}")
        return [_conform_cell(x, dtype.elementType) for x in v]
    raise ValueError(f"unsupported target type {dtype} for BSON ingest")


def read_bson_dump(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    path_col: Optional[str] = None,
) -> DataFrame:
    """mongodump ``.bson`` file(s) → DataFrame with the EXPLICIT
    ``schema`` (DDL string or StructType): top-level fields are
    extracted by name, missing fields are NULL, extra fields are
    dropped — the same conform-don't-infer stance as the ingest zone.
    ``path`` accepts a file, directory, or glob (``binaryFile``
    semantics). Pass ``path_col`` to keep each row's source file (the
    upsert bookkeeping column the reference carries as ``file``).

    One Arrow-batched Python pass per FILE (mapInPandas over the
    binaryFile rows); see the module docstring for why per-file is the
    right parallelism for this format."""
    import pandas as pd

    out_schema = (
        T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    fields = list(out_schema.fields)
    full_schema = T.StructType(fields + ([T.StructField(path_col, T.StringType())] if path_col else []))
    names = [f.name for f in fields]

    def _decode(batches):
        for pdf in batches:
            rows = []
            for content, fpath in zip(pdf["content"], pdf["path"]):
                for doc in iter_bson_docs(bytes(content)):
                    row = [
                        _conform_cell(doc.get(f.name), f.dataType)
                        for f in fields
                    ]
                    if path_col:
                        row.append(fpath)
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=names + ([path_col] if path_col else [])
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bson")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_decode, full_schema)
