"""The S9 mongodump-BSON source: spec-vector decode, encoder/decoder
round-trip (the encoder in tools/make_bson_fixture.py is a separate
write-side implementation of the public spec), malformed-input
loudness, schema conform, and the Spark reader end to end."""

from __future__ import annotations

import datetime
import os
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_lake_spark.bsondump import iter_bson_docs, read_bson_dump

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "mongo")


def test_spec_vector_hello_world():
    # the canonical example from bsonspec.org/faq: {"hello": "world"}
    buf = bytes.fromhex("160000000268656c6c6f0006000000776f726c640000")
    assert list(iter_bson_docs(buf)) == [{"hello": "world"}]


def test_spec_vector_awesome_array():
    # second bsonspec.org example: {"BSON": ["awesome", 5.05, 1986]}
    buf = (
        b"1\x00\x00\x00\x04BSON\x00&\x00\x00\x00\x020\x00\x08\x00\x00\x00"
        b"awesome\x00\x011\x00333333\x14@\x102\x00\xc2\x07\x00\x00\x00\x00"
    )
    assert list(iter_bson_docs(buf)) == [{"BSON": ["awesome", 5.05, 1986]}]


def test_all_supported_types_roundtrip():
    from tools.make_bson_fixture import (
        _doc,
        _elem_array_of_strings,
        _elem_bool,
        _elem_datetime,
        _elem_double,
        _elem_int32,
        _elem_int64,
        _elem_null,
        _elem_objectid,
        _elem_string,
    )

    oid = "0123456789abcdef01234567"
    buf = _doc(
        b"".join(
            [
                _elem_objectid("_id", oid),
                _elem_string("s", "héllo☃"),
                _elem_double("d", -1.5e-300),
                _elem_int32("i", -42),
                _elem_int64("l", 1 << 40),
                _elem_bool("b", True),
                _elem_null("z"),
                _elem_datetime("t", 1_700_000_123_456),
                _elem_array_of_strings("a", ["x", "y"]),
            ]
        )
    )
    (doc,) = iter_bson_docs(buf)
    assert doc["_id"] == oid
    assert doc["s"] == "héllo☃"
    assert doc["d"] == -1.5e-300
    assert doc["i"] == -42 and doc["l"] == 1 << 40
    assert doc["b"] is True and doc["z"] is None
    assert doc["t"] == datetime.datetime(1970, 1, 1) + datetime.timedelta(
        milliseconds=1_700_000_123_456
    )
    assert doc["a"] == ["x", "y"]


def test_nested_document_and_truncation_is_loud():
    from tools.make_bson_fixture import _cstring, _doc, _elem_string

    inner = _doc(_elem_string("k", "v"))
    buf = _doc(b"\x03" + _cstring("sub") + inner)
    (doc,) = iter_bson_docs(buf)
    assert doc == {"sub": {"k": "v"}}
    # truncated tail: must raise, never silently drop rows
    with pytest.raises(ValueError):
        list(iter_bson_docs(buf + b"\x10\x00"))
    # corrupted size: must raise
    bad = struct.pack("<i", 9999) + buf[4:]
    with pytest.raises(ValueError):
        list(iter_bson_docs(bad))
    # unsupported element tag (decimal128): loud
    dec128 = _doc(b"\x13" + _cstring("x") + b"\x00" * 16)
    with pytest.raises(ValueError, match="unsupported BSON element"):
        list(iter_bson_docs(dec128))


_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.floats(allow_nan=False),
    st.text(
        alphabet=st.characters(blacklist_characters="\x00", codec="utf-8"),
        max_size=40,
    ),
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.text(
                alphabet=st.characters(
                    blacklist_characters="\x00", codec="utf-8"
                ),
                min_size=1,
                max_size=12,
            ),
            _scalars,
            max_size=6,
        ),
        max_size=8,
    )
)
def test_property_encode_decode_roundtrip(dicts):
    # write side: an independent spec implementation (the fixture
    # encoder); read side: bsondump. Any scalar document round-trips.
    from tools.make_bson_fixture import (
        _cstring,
        _doc,
        _elem_bool,
        _elem_double,
        _elem_int32,
        _elem_null,
        _elem_string,
    )

    def enc(d):
        out = b""
        for k, v in d.items():
            if v is None:
                out += _elem_null(k)
            elif isinstance(v, bool):
                out += _elem_bool(k, v)
            elif isinstance(v, int):
                out += _elem_int32(k, v)
            elif isinstance(v, float):
                out += _elem_double(k, v)
            else:
                out += _elem_string(k, v)
        return _doc(out)

    buf = b"".join(enc(d) for d in dicts)
    got = list(iter_bson_docs(buf))
    assert got == dicts


def test_read_bson_dump_spark_end_to_end(spark):
    ddl = (
        "_id string, artisticname string, active boolean, score double, "
        "sessions int, created timestamp, tags array<string>, "
        "missing_col string"
    )
    df = read_bson_dump(spark, FIXTURE, ddl, path_col="src_file")
    rows = df.collect()
    assert len(rows) == 240
    r0 = sorted(rows, key=lambda r: r["_id"])[0]
    assert len(r0["_id"]) == 24 and int(r0["_id"], 16) >= 0
    assert isinstance(r0["score"], float)
    assert r0["missing_col"] is None  # absent field -> NULL, no error
    assert r0["src_file"].endswith("users.bson")
    assert isinstance(r0["created"], datetime.datetime)
    # explicit schema, never inference
    assert [f.name for f in df.schema.fields][:2] == ["_id", "artisticname"]


def test_conform_is_loud_on_type_mismatch(spark):
    # a string field read as long must raise, not coerce garbage
    from pyspark.errors import PythonException

    with pytest.raises(Exception, match="BSON str into|PythonException"):
        read_bson_dump(spark, FIXTURE, "artisticname long").collect()


def test_corrupt_nested_sizes_raise_valueerror_not_indexerror():
    from tools.make_bson_fixture import _cstring, _doc, _elem_string

    inner = _doc(_elem_string("k", "v"))
    # nested doc whose size field overruns the parent: ValueError, and
    # never a silent read across document boundaries / IndexError
    blown = bytearray(_doc(b"\x03" + _cstring("sub") + inner))
    pos = bytes(blown).index(inner)
    blown[pos : pos + 4] = struct.pack("<i", 9999)
    with pytest.raises(ValueError, match="overruns|malformed"):
        list(iter_bson_docs(bytes(blown)))
    # string length overrun inside a document
    s_doc = bytearray(_doc(_elem_string("s", "hello")))
    s_pos = bytes(s_doc).index(struct.pack("<i", 6))  # len('hello')+1
    s_doc[s_pos : s_pos + 4] = struct.pack("<i", 5000)
    with pytest.raises(ValueError, match="overruns|malformed"):
        list(iter_bson_docs(bytes(s_doc)))
    # unterminated cstring name
    with pytest.raises(ValueError, match="cstring|malformed"):
        list(iter_bson_docs(struct.pack("<i", 7) + b"\x08ab"))


def test_datetime_string_conform_is_ms_canonical(spark):
    # BSON datetimes are ms-precision; the string conform must carry
    # exactly that, fixed width, for whole and fractional seconds alike
    df = read_bson_dump(spark, FIXTURE, "_id string, created string")
    vals = [r["created"] for r in df.collect()]
    import re

    assert all(
        re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}", v)
        for v in vals
    )
    assert any(not v.endswith(".000") for v in vals)  # ms are real here


def test_truncated_fixed_width_values_raise_valueerror():
    from tools.make_bson_fixture import _cstring

    # a document claiming a double at its tail with only 4 payload
    # bytes left: must be ValueError, never struct.error or a silent
    # read into the next document's bytes
    elems = b"\x01" + _cstring("a") + b"\x00\x00\x00\x00"  # 4 of 8 bytes
    size = 4 + len(elems) + 1
    doc = struct.pack("<i", size) + elems + b"\x00"
    with pytest.raises(ValueError, match="overruns"):
        list(iter_bson_docs(doc))
    # element NAME whose terminator is the EOO byte itself: the name
    # scan must not consume the document terminator (or bytes of the
    # FOLLOWING document)
    bad_name = struct.pack("<i", 10) + b"\x0a" + b"abcd" + b"\x00"
    with pytest.raises(ValueError, match="cstring|overruns|malformed"):
        list(iter_bson_docs(bad_name))
