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


# --------------------------------------------------------------------------
# q186's rolling-hash scale twin (operators/chunking.py, r5 verdict task 3)
# --------------------------------------------------------------------------


def _ref_rolling_chunks(words, tok_h, w=4, mask_bits=3):
    """Pure-Python buzhash reference: token hashes ``tok_h`` are taken
    from Spark's own xxhash64 (the hash function is the engine's; the
    reference pins the ROLLING/boundary/chunking logic around it)."""
    M = (1 << 64) - 1

    def rot(x, k):
        return ((x << k) | (x >> (64 - k))) & M

    mask = (1 << mask_bits) - 1
    chunks, cur, rh = [], [], 0
    for i, word in enumerate(words):
        rh = rot(rh, 1) ^ (tok_h[word] & M)
        if i >= w:
            rh ^= rot(tok_h[words[i - w]] & M, w)
        cur.append(word)
        if i >= w - 1 and (rh & mask) == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [" ".join(c) for c in chunks]


def _spark_tok_hashes(spark, words):
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [(t,) for t in sorted(set(words))], "t string"
    ).select("t", F.xxhash64("t").alias("h")).collect()
    return {r["t"]: r["h"] for r in rows}


def test_rolling_cdc_matches_reference_and_resynchronizes(spark):
    """Spark O(1)-rolling fold == pure-Python buzhash reference, and
    the CDC resync property holds for this branch too: one inserted
    word only disturbs chunks up to the next boundary."""
    import hashlib

    from pyspark.sql import functions as F

    from file_appender_spark.operators.chunking import rolling_chunk_hashes

    words = [f"tok{(i * 7919) % 101}" for i in range(200)]
    inserted = words[:5] + ["INSERTED"] + words[5:]
    tok_h = _spark_tok_hashes(spark, inserted)

    for ws in (words, inserted):
        df = spark.createDataFrame([(1, " ".join(ws))], "id long, text string")
        got = df.select(
            rolling_chunk_hashes(F.split("text", r"\s+")).alias("hs")
        ).collect()[0]["hs"]
        ref = [
            hashlib.md5(c.encode()).hexdigest()
            for c in _ref_rolling_chunks(ws, tok_h)
        ]
        assert got == ref, len(ws)

    a = _ref_rolling_chunks(words, tok_h)
    b = _ref_rolling_chunks(inserted, tok_h)
    suffix = 0
    while suffix < min(len(a), len(b)) and a[-1 - suffix] == b[-1 - suffix]:
        suffix += 1
    assert suffix >= len(a) - 3
    assert a != b
    assert len(a) > 10  # mask_bits=3 -> ~25 chunks over 200 words


def test_rolling_cdc_stats_shape_and_sharing(spark):
    """cdc_chunk_stats_rolling: q186's output shape; two docs sharing
    a long tail report shared chunks, a disjoint doc reports none."""
    from file_appender_spark.operators.chunking import cdc_chunk_stats_rolling

    tail = " ".join(f"shared{(i * 31) % 53}" for i in range(120))
    twin = " ".join(f"twin{(i * 17) % 97}" for i in range(100))
    rows = [
        (1, "unique head alpha beta " + tail),
        (2, "other head gamma delta " + tail),
        (3, " ".join(f"lonely{i}" for i in range(80))),
        # exact-duplicate pair: the distinct-text cache computes this
        # text once but must still report every chunk as shared (two
        # distinct doc ids contain it — group-weighted sharing)
        (4, twin),
        (5, twin),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cdc_chunk_stats_rolling(docs).collect()}
    assert out[1]["n_shared"] > 0 and out[2]["n_shared"] > 0
    assert out[3]["n_shared"] == 0
    assert out[4]["n_shared"] == out[4]["n_chunks"] > 0
    assert out[5]["n_shared"] == out[5]["n_chunks"] > 0
    assert out[4]["n_chunks"] == out[5]["n_chunks"]
    for i in (1, 2, 3, 4, 5):
        assert 1 <= out[i]["n_chunks"] <= out[i]["n_words"]


def test_rolling_cdc_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from file_appender_spark.operators.chunking import rolling_chunk_hashes

    with _pytest.raises(ValueError, match="mask_bits"):
        rolling_chunk_hashes(F.array(F.lit("a")), mask_bits=0)
    with _pytest.raises(ValueError, match="window"):
        rolling_chunk_hashes(F.array(F.lit("a")), window=1)


# --------------------------------------------------------------------------
# blocking_params_for (operators/blocking.py, r5 verdict task 5)
# --------------------------------------------------------------------------


def test_blocking_params_holds_block_size_flat():
    from file_appender_spark.operators.blocking import blocking_params_for

    # q182's geometry: 25 nations, ~1.1M-cent balance range
    rng, dims, tgt = 1_100_000, 25, 64.0
    for n in (1_500, 15_000, 150_000, 1_500_000):
        p = blocking_params_for(n, rng, n_coblock=dims, target_block_size=tgt)
        if not p.saturated:
            assert p.expected_block_size <= tgt + 1
    # width shrinks monotonically as the corpus grows
    widths = [
        blocking_params_for(n, rng, n_coblock=dims).width
        for n in (1_500, 15_000, 150_000, 1_500_000)
    ]
    assert widths == sorted(widths, reverse=True)


def test_blocking_params_tolerance_floor_and_saturation():
    from file_appender_spark.operators.blocking import blocking_params_for

    # the co-blocking guarantee: width never drops below 2*tolerance
    p = blocking_params_for(
        10_000_000, 1_100_000, n_coblock=25, target_block_size=8, tolerance=500
    )
    assert p.width == 1000 and p.saturated
    assert p.expected_block_size > 8  # honest: the floor binds
    # unconstrained, the same corpus gets a width of 1 and stays flat
    q = blocking_params_for(10_000_000, 1_100_000, n_coblock=25, target_block_size=8)
    assert q.width >= 1 and not q.saturated or q.width == 1


def test_blocking_params_validation():
    import pytest as _pytest

    from file_appender_spark.operators.blocking import blocking_params_for

    for bad in (
        dict(n_rows=0, value_range=1.0),
        dict(n_rows=10, value_range=0),
        dict(n_rows=10, value_range=1.0, n_coblock=0),
        dict(n_rows=10, value_range=1.0, tolerance=-1),
    ):
        with _pytest.raises(ValueError):
            blocking_params_for(**bad)


# --------------------------------------------------------------------------
# r12: vectorized Arrow per-text CDC stage (bit-equality vs the JVM spelling)
# --------------------------------------------------------------------------


def test_xxh64_python_matches_spark_engine(spark):
    """The pure-Python XXH64 behind the Arrow CDC stage must match
    Spark's xxhash64 built-in bit-for-bit on every spec code path:
    empty, 1/3/4/7/8/9-byte tails, 31/32/33-byte stripe edges, long
    inputs, multi-byte UTF-8."""
    from pyspark.sql import functions as F

    from file_appender_spark.operators.chunking import _xxh64_bytes

    cases = [
        "", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
        "x" * 31, "x" * 32, "x" * 33, "x" * 64, "x" * 100,
        "tok17", "héllo wörld", "日本語トークン", "mixed é 語 x" * 7,
    ]
    rows = (
        spark.createDataFrame([(c,) for c in cases], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    )
    for r in rows:
        py = _xxh64_bytes(r["t"].encode("utf-8"))
        signed = py - (1 << 64) if py >= (1 << 63) else py
        assert signed == r["h"], repr(r["t"])


def _cdc_adversarial_texts():
    # every shape that could separate the Arrow tokenizer/rolling
    # math from the JVM spelling: whitespace runs of each Java \s
    # member, Unicode NON-\s whitespace inside tokens (NBSP, em
    # space — Java \s is ASCII-only and must NOT split), short docs
    # around the window size, multi-byte tokens, and enough long
    # pseudo-random docs that chunk boundaries (incl. on the final
    # token) occur across the set.
    texts = [
        "single",
        "two toks",
        "three tok doc",
        "four tok doc now",
        "a  b\tc\nd\re\ff\x0bg",
        "  leading and trailing   ",
        "nbsp inside one token here yes really",
        "em space also stays inside its token ok",
        "héllo wörld 日本語 トークン mixed ascii and utf8 tokens here",
    ]
    for s in range(12):
        texts.append(
            " ".join(f"tok{(i * 7919 + s * 104729) % 257}" for i in range(180 + s))
        )
    # exact duplicates exercise the n_docs grouping
    texts.append(texts[-1])
    texts.append(texts[3])
    return texts


def test_cdc_arrow_stage_matches_jvm_spelling(spark):
    """cdc_chunk_stats_rolling's default-ws Arrow stage ==
    the JVM rolling_chunk_hashes spelling, full output frame,
    on the adversarial corpus. The JVM arm is forced by passing
    Java \\s+'s explicit ASCII class as ws (same tokenization, JVM
    dispatch path)."""
    from file_appender_spark.operators.chunking import (
        _JAVA_WS_CLASS,
        cdc_chunk_stats_rolling,
    )

    texts = _cdc_adversarial_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_arrow = sorted(
        map(tuple, cdc_chunk_stats_rolling(df).collect())
    )
    got_jvm = sorted(
        map(tuple, cdc_chunk_stats_rolling(df, ws=_JAVA_WS_CLASS).collect())
    )
    assert got_arrow == got_jvm
    assert len(got_arrow) == sum(
        1 for t in texts if any(c not in " \t\n\r\f\x0b" for c in t)
    )


def test_cdc_arrow_per_text_hashes_match_rolling_chunk_hashes(spark):
    """Stage-level pin: the Arrow pass's per-text chunk-hash arrays
    equal rolling_chunk_hashes' for the same distinct texts (not just
    the aggregated stats)."""
    from pyspark.sql import functions as F

    from file_appender_spark.operators.chunking import (
        _cdc_per_text_arrow,
        rolling_chunk_hashes,
    )

    texts = [t for t in _cdc_adversarial_texts() if t.strip()]
    df = spark.createDataFrame(
        [(t,) for t in sorted(set(texts))], "text string"
    ).select(
        F.sha2("text", 256).alias("tk"), F.lit(1).cast("bigint").alias("n_docs"), "text"
    )
    wt = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    jvm = {
        r["tk"]: (r["nw"], r["hs"])
        for r in df.select(
            "tk",
            F.size(wt).alias("nw"),
            rolling_chunk_hashes(wt).alias("hs"),
        ).collect()
    }
    arrow = {
        r["tk"]: (r["n_words"], r["hs"])
        for r in df.mapInArrow(
            _cdc_per_text_arrow(4, 3),
            schema="tk string, n_docs bigint, n_words int, hs array<string>",
        ).collect()
    }
    assert arrow == jvm
    # sanity: boundaries actually fired somewhere in the corpus
    assert any(len(v[1]) > 1 for v in arrow.values())


def test_cdc_rolling_validation_same_on_both_paths(spark):
    import pytest as _pytest

    from file_appender_spark.operators.chunking import cdc_chunk_stats_rolling

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    for kw in (dict(mask_bits=0), dict(mask_bits=63), dict(window=1), dict(window=64)):
        with _pytest.raises(ValueError):
            cdc_chunk_stats_rolling(df, **kw)  # arrow path (default ws)
        with _pytest.raises(ValueError):
            cdc_chunk_stats_rolling(df, ws=r"[ ]+", **kw)  # jvm path
