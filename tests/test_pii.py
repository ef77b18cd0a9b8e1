"""PII detection/redaction contracts (operators/redact.py): planted
PII of every kind is counted exactly and the scrubbed corpus is
hit-free; the scan-pattern superset is mutually non-overlapping so
per-kind counts are order-independent."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_lake_spark.operators.redact import (
    PII_PATTERNS,
    PII_SCAN_PATTERNS,
    redact_pii,
)

# one canonical planted example per scan kind
_EXAMPLES = {
    "email": "jane.doe+spam@mail.example.co",
    "ipv4": "192.168.0.17",
    "phone": "555-0142",
    "iban": "GB82WEST12345698765432",
    "cc": "4111 1111 1111 1111",
}


def test_each_example_matches_only_its_own_pattern():
    # disjointness is what makes per-kind counts order-independent:
    # no kind's canonical example may trip another kind's detector
    for kind, example in _EXAMPLES.items():
        for other, (pat, _) in PII_SCAN_PATTERNS.items():
            hits = re.findall(pat, example)
            if other == kind:
                assert hits, (kind, other)
            else:
                assert not hits, (kind, other, hits)


def test_planted_pii_counted_exactly_and_scrub_is_hit_free(spark):
    rows = [
        (
            1,
            "please write to jane.doe+spam@mail.example.co or "
            "bob@corp.example.com from host 192.168.0.17 today",
        ),
        (2, "call 555-0142 or 555-99 about invoice twelve"),
        (3, "no sensitive content in this row at all"),
        (4, "pay to GB82WEST12345698765432 card 4111 1111 1111 1111"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    red = redact_pii(docs, "text").orderBy("doc_id").collect()

    counts = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"]) for r in red}
    assert counts == {1: (2, 1, 0), 2: (0, 0, 2), 3: (0, 0, 0), 4: (0, 0, 0)}

    # the scrub criterion: NO redaction-kind pattern survives in any
    # redacted text (the planted strings are gone, placeholders remain)
    for r in red:
        for kind, (pat, repl) in PII_PATTERNS.items():
            assert not re.findall(pat, r["redacted"]), (r["doc_id"], kind)
    assert "<EMAIL>" in red[0]["redacted"]
    assert "<IP>" in red[0]["redacted"]
    assert "<PHONE>" in red[1]["redacted"]
    assert red[2]["redacted"] == rows[2][1]  # clean row untouched


def test_scan_superset_scrub_is_hit_free(spark):
    # the detection superset drives the scrub: planted iban/card strings
    # are scrubbed too when redact_pii runs with PII_SCAN_PATTERNS
    docs = spark.createDataFrame(
        [(1, "pay GB82WEST12345698765432 with 4111 1111 1111 1111 now")],
        "doc_id long, text string",
    )
    out = docs
    for kind, (pat, _) in PII_SCAN_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col("text"), F.lit(pat)).cast("long")
        )
    scrub = F.col("text")
    for pat, repl in PII_SCAN_PATTERNS.values():
        scrub = F.regexp_replace(scrub, pat, repl)
    row = out.withColumn("redacted", scrub).collect()[0]
    assert (row["n_iban"], row["n_cc"]) == (1, 1)
    for kind, (pat, _) in PII_SCAN_PATTERNS.items():
        assert not re.findall(pat, row["redacted"]), kind
    assert "<IBAN>" in row["redacted"] and "<CARD>" in row["redacted"]
