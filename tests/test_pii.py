"""PII detection/scrubbing (operators/pii.py) over planted fixtures —
the driver corpus is PII-free by construction, so every class is
planted here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.pii import PII_PATTERNS, pii_profile, pii_scrub

DOCS = [
    (1, "contact me at jane.doe+spam@example.co.uk for details"),
    (2, "server at 192.168.1.254 responded; also 8.8.8.8"),
    (3, "call +1-555-123-4567 or (020) 7946-0958 today"),
    (4, "ssn 123-45-6789 leaked with card 4111 1111 1111 1111"),
    (5, "order id 123456789012 shipped"),
    (6, "a perfectly clean sentence with the number 42 in it"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_profile_counts_every_class(spark, docs):
    rows = {r["doc_id"]: r.asDict() for r in pii_profile(docs, "doc_id", "text").collect()}
    assert rows[1]["n_email"] == 1
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_phone"] == 2
    assert rows[4]["n_ssn_like"] == 1 and rows[4]["n_card_like"] == 1
    assert rows[5]["n_long_digit_run"] == 1
    assert rows[6]["n_pii_total"] == 0
    # totals add up per doc
    for r in rows.values():
        assert r["n_pii_total"] == sum(
            v for k, v in r.items() if k.startswith("n_") and k != "n_pii_total"
        )


def test_scrub_masks_and_is_idempotent(spark, docs):
    scrubbed = docs.select("doc_id", pii_scrub("text").alias("text"))
    txt = {r["doc_id"]: r["text"] for r in scrubbed.collect()}
    assert "[EMAIL]" in txt[1] and "@" not in txt[1]
    assert txt[2].count("[IP]") == 2
    assert "[PHONE]" in txt[3]
    assert "[SSN]" in txt[4] and "[CARD]" in txt[4]
    assert "[NUM]" in txt[5]
    assert txt[6] == DOCS[5][1]  # clean text untouched (42 survives)
    # idempotent: scrubbing the scrubbed text changes nothing
    again = scrubbed.select("doc_id", pii_scrub("text").alias("text"))
    assert {r["doc_id"]: r["text"] for r in again.collect()} == txt


def test_unknown_class_rejected(spark, docs):
    with pytest.raises(ValueError, match="unknown PII class"):
        pii_profile(docs, "doc_id", "text", classes=["nope"])


def test_class_subset(spark, docs):
    out = pii_profile(docs, "doc_id", "text", classes=["email"]).columns
    assert out == ["doc_id", "n_email", "n_pii_total"]


def test_plan_is_single_projection(spark, docs):
    plan = pii_profile(docs, "doc_id", "text")._jdf.queryExecution().toString()
    assert "Join" not in plan and "Exchange" not in plan
