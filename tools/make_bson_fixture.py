#!/usr/bin/env python
"""Deterministic mongodump-style fixture for the S9 BSON dim source.

Encodes a users-like dimension collection (FIXTURES.md §A `users`;
reference Mongo dims in `data-lake-stack.yml:62-148`) as a real
``.bson`` file — documents back to back, each encoded straight from the
public BSON spec (https://bsonspec.org/spec.html) — plus a line-JSON
twin with IDENTICAL values so DuckDB can read the same rows for the
``mongo_dim_conform`` oracle. The encoder here is intentionally a
SEPARATE implementation from data_lake_spark/bsondump.py's decoder
(write side vs read side of the spec); the JSON twin + DuckDB oracle
then cross-checks the pair end to end.

Deterministic (fixed LCG, no clock, no PRNG module), so re-running
reproduces byte-identical fixtures. Usage:
    python tools/make_bson_fixture.py [out_dir]   # default fixtures/mongo
"""

from __future__ import annotations

import json
import os
import struct
import sys

N_ROWS = 240
CITIES = ["Medellin", "Bogota", "Cali", "Cartagena"]
OFFICES = ["L1", "L2", "L3"]
ROOMS = ["r%02d" % i for i in range(1, 13)]
EPOCH_MS = 1_700_000_000_000  # fixed base instant


def _lcg(seed: int):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield s >> 33


def _cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    assert b"\x00" not in b
    return b + b"\x00"


def _elem_string(name: str, v: str) -> bytes:
    b = v.encode("utf-8") + b"\x00"
    return b"\x02" + _cstring(name) + struct.pack("<i", len(b)) + b


def _elem_objectid(name: str, hex24: str) -> bytes:
    return b"\x07" + _cstring(name) + bytes.fromhex(hex24)


def _elem_bool(name: str, v: bool) -> bytes:
    return b"\x08" + _cstring(name) + (b"\x01" if v else b"\x00")


def _elem_double(name: str, v: float) -> bytes:
    return b"\x01" + _cstring(name) + struct.pack("<d", v)


def _elem_int32(name: str, v: int) -> bytes:
    return b"\x10" + _cstring(name) + struct.pack("<i", v)


def _elem_int64(name: str, v: int) -> bytes:
    return b"\x12" + _cstring(name) + struct.pack("<q", v)


def _elem_datetime(name: str, ms: int) -> bytes:
    return b"\x09" + _cstring(name) + struct.pack("<q", ms)


def _elem_null(name: str) -> bytes:
    return b"\x0a" + _cstring(name)


def _doc(elems: bytes) -> bytes:
    size = 4 + len(elems) + 1
    return struct.pack("<i", size) + elems + b"\x00"


def _elem_array_of_strings(name: str, vals: list[str]) -> bytes:
    inner = b"".join(_elem_string(str(i), v) for i, v in enumerate(vals))
    return b"\x04" + _cstring(name) + _doc(inner)


def make_rows():
    rnd = _lcg(20260816)
    rows = []
    for i in range(N_ROWS):
        oid = "%024x" % ((next(rnd) << 64 | next(rnd)) % (1 << 96))
        city = CITIES[next(rnd) % len(CITIES)]
        office = OFFICES[next(rnd) % len(OFFICES)]
        room = ROOMS[next(rnd) % len(ROOMS)]
        name = f"model_{i:04d}"
        email = None if next(rnd) % 7 == 0 else f"user{i:04d}@example.com"
        active = next(rnd) % 3 != 0
        score = (next(rnd) % 10_000) / 100.0
        sessions = next(rnd) % 500
        # ms-precision on purpose: real mongodump datetimes are almost
        # never whole-second, and the canonical string form carries ms
        created_ms = (
            EPOCH_MS
            + (next(rnd) % (365 * 24 * 3600)) * 1000
            + next(rnd) % 1000
        )
        tags = sorted(
            {CITIES[next(rnd) % len(CITIES)].lower() for _ in range(next(rnd) % 3)}
        )
        rows.append(
            dict(
                _id=oid,
                artisticname=name,
                streamateUser=email,
                city=city,
                office=office,
                room=room,
                active=active,
                score=score,
                sessions=sessions,
                created_ms=created_ms,
                tags=tags,
            )
        )
    return rows


def encode_row(r: dict) -> bytes:
    elems = b"".join(
        [
            _elem_objectid("_id", r["_id"]),
            _elem_string("artisticname", r["artisticname"]),
            (
                _elem_null("streamateUser")
                if r["streamateUser"] is None
                else _elem_string("streamateUser", r["streamateUser"])
            ),
            _elem_string("city", r["city"]),
            _elem_string("office", r["office"]),
            _elem_string("room", r["room"]),
            _elem_bool("active", r["active"]),
            _elem_double("score", r["score"]),
            _elem_int32("sessions", r["sessions"]),
            _elem_datetime("created", r["created_ms"]),
            _elem_array_of_strings("tags", r["tags"]),
        ]
    )
    return _doc(elems)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rows = make_rows()
    with open(os.path.join(out_dir, "users.bson"), "wb") as f:
        for r in rows:
            f.write(encode_row(r))
    with open(os.path.join(out_dir, "users.json"), "w") as f:
        for r in rows:
            # identical values, JSON-native types; created as epoch ms
            # (the oracle reconstructs the same timestamp string)
            f.write(json.dumps(r, sort_keys=True) + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fixtures/mongo")
