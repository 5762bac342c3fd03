"""Content-defined chunking — the O(1)-per-position rolling-hash
production branch beside q186's oracle-exact per-position-md5 form
(r5 verdict task 3: the one declared scale cost without a twin).

q186 (queries/tranche5.py) decides a boundary by hashing the FULL
trailing w-gram at every position: O(w) string building + one md5 per
position — honest for the oracle contract, a real scale-killer shape
at 100 TB (measured x6.3 at the 10x probe). Production CDC (LBFS /
rsync lineage) uses an incrementally-updated rolling hash instead;
this module implements the cyclic-polynomial variant (buzhash,
public algorithm: Cohen, "Recursive Hashing Functions for n-Grams",
TOIS 1997):

    H_i = rot1(H_{i-1}) XOR rot_w(h(t_{i-w})) XOR h(t_i)

with h = xxhash64 (Spark's built-in 64-bit hash, JVM-side) and rot_k
a 64-bit left rotation — the O(1)-update recurrence sequential CDC
scanners use. A boundary falls after position i when H_i mod 2^d ==
0 (expected chunk length 2^d, the standard CDC mask test;
power-of-two so the modulus is a single AND).

In Spark the recurrence telescopes to the stateless per-position
value W_i = XOR_{k<w} rot_k(h(t_{i-k})) — w cheap token-hash xors,
no string building, no md5 — which is the spelling implemented here:
a sequential fold would pay Spark's interpreted HOF-aggregate
struct-copy accumulator per step and MEASURED SLOWER than the md5
form it was meant to replace (rolling_chunk_hashes docstring). The
boundary values are bit-identical to the rolling recurrence's, which
the tests pin against a pure-Python rolling implementation.

The CDC property (an insertion resynchronizes within one window)
depends only on the boundary decision being a function of the
trailing w tokens — true for both hashes — and is pinned for this
branch by the same suffix-match harness as the md5 form
(tests/test_tranche5b.py).

Scale shape: boundary + chunk hashing is per-row expression work (no
explode, no window) run once per DISTINCT text (cdc_chunk_stats_rolling
docstring — q181's dedup-cache pattern at doc granularity), then a
chunk-hash groupBy for cross-doc sharing and a join back to doc ids.
Measured (SCALE_PROBE_r6.json): 1.63s -> 2.09s at 10x (x1.3) vs the
md5 oracle form's 5.45s -> 47.2s (x8.7); the full falsification trail
(sequential fold SLOWER than md5; stateless form x7.0) is in
SCALING.md round-6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CDC_W = 4  # q186's window: boundary decided by the trailing 4-gram


def _rot(col: Column, k: int) -> Column:
    """64-bit rotate-left by a CONSTANT k (1 <= k <= 63) on a long."""
    return F.shiftleft(col, k).bitwiseOR(F.shiftrightunsigned(col, 64 - k))


# pure-Python XXH64 (Collet's public reference spec), bit-compatible
# with Spark's xxhash64 built-in at its default seed 42 — pinned
# against the engine over every spec code path (stripe loop, 8/4/1
# byte tails, multi-byte UTF-8) in tests/test_tranche5b.py. Used by
# the Arrow CDC stage below, once per DISTINCT token per executor
# (cached), so compatibility is everything and speed is irrelevant.
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` — unsigned 64-bit result."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    def rnd(acc: int, inp: int) -> int:
        return (rotl((acc + inp * _XXP2) & _M64, 31) * _XXP1) & _M64

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            v1 = rnd(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[i : i + 8], "little")), 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        h = (rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * _XXP5) & _M64, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def rolling_chunk_hashes(
    t: Column, window: int = _CDC_W, mask_bits: int = 3
) -> Column:
    """Chunk-hash array for a bound word-array column ``t`` under
    buzhash boundaries: boundary AFTER position i (i >= window-1)
    when the cyclic-polynomial hash of the trailing ``window`` tokens
    has its low ``mask_bits`` bits zero (expected chunk
    ~2^mask_bits words, matching q186's md5-digit rule at
    mask_bits=3). Returns array<string> of per-chunk md5 hashes —
    the same chunk identity as q186, so downstream cross-doc sharing
    logic is shared.

    Physical spelling: the buzhash value W_i = XOR_k rot_k(h(t_{i-k}))
    is evaluated STATELESS per position inside one `filter` HOF (w
    token-hash xors, w a small constant), not via the sequential O(1)
    rolling recurrence — the recurrence needs a fold, and Spark's
    higher-order aggregate is interpreted with a struct-copy
    accumulator per step, which MEASURED SLOWER than q186's
    per-position md5 at 10x (54.6s vs 45.0s; the md5 cost was never
    the bottleneck, the fold was). The stateless form computes
    bit-identical boundary values (same algebra the rolling update
    telescopes to — pinned against a pure-Python ROLLING reference in
    tests), lets each position evaluate independently, and builds
    chunks by slicing between boundary positions instead of copying
    a growing accumulator. Per-chunk md5 runs once per chunk, not
    per position."""
    if not 1 <= mask_bits <= 62:
        raise ValueError(f"mask_bits must be in [1, 62], got {mask_bits}")
    if not 2 <= window <= 63:
        raise ValueError(f"window must be in [2, 63], got {window}")
    mask = (1 << mask_bits) - 1
    n = F.size(t)

    from file_appender_spark.operators.textstats import let_expr

    def chunks_from(bound):
        # chunk j spans [start_j, end_j]: starts = 0, bnd+1...;
        # ends = bnd..., n-1; the final chunk is dropped when a
        # boundary fell exactly on the last token (empty tail)
        spans = F.transform(
            F.sequence(F.lit(0), F.size(bound)),
            lambda j: F.struct(
                F.when(j == 0, F.lit(0))
                .otherwise(F.element_at(bound, j) + 1)
                .alias("s"),
                F.when(j == F.size(bound), n - 1)
                .otherwise(F.element_at(bound, j + 1))
                .alias("e"),
            ),
        )
        live = F.filter(spans, lambda sp: sp["s"] <= sp["e"])
        return F.transform(
            live,
            lambda sp: F.md5(
                F.array_join(F.slice(t, sp["s"] + 1, sp["e"] - sp["s"] + 1), " ")
            ),
        )

    def with_hashes(hs):
        # every token hash feeds `window` consecutive W_i — binding
        # the per-token hash array once cuts the xxhash64 evaluations
        # per position from `window` to amortized 1 (each token is
        # hashed once; the window contributes only rotate/xor ops)
        def wh(i):
            # W_i over 0-based position i: tokens t[i-w+1 .. i],
            # newest unrotated — exactly what the rolling recurrence
            # maintains
            acc = F.element_at(hs, i + 1)
            for k in range(1, window):
                acc = acc.bitwiseXOR(_rot(F.element_at(hs, i + 1 - k), k))
            return acc

        bnd = F.when(
            n >= window,
            F.filter(
                F.sequence(F.lit(window - 1), n - 1),
                lambda i: wh(i).bitwiseAND(F.lit(mask).cast("long")) == 0,
            ),
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        return let_expr(bnd, chunks_from)

    return let_expr(F.transform(t, lambda x: F.xxhash64(x)), with_hashes)


# Java's \s character class is ASCII-only ([ \t\n\x0B\f\r]); Python's
# is Unicode-wide. The Arrow stage below may only take over
# tokenization when it can reproduce the JVM's split EXACTLY, so the
# default pattern is translated to the explicit ASCII class and any
# other pattern routes to the JVM spelling.
_JAVA_WS_CLASS = "[ \t\n\x0b\f\r]+"


def _cdc_per_text_arrow(window: int, mask_bits: int):
    """One-pass Arrow respelling of the per-distinct-text CDC stage
    (guide §4.2, the image/SRP-signature family): (tk, n_docs, text)
    -> (tk, n_docs, n_words, hs). Per text: tokenize (Java-\\s-exact
    ASCII class), hash each DISTINCT token once via the pinned
    pure-Python XXH64 (per-TASK cache — created inside ``fn`` per
    mapInArrow invocation, so reuse amortizes across the task's
    batches, not across tasks; kept task-scoped deliberately so the
    dict cannot grow without bound in a reused worker — r12 ADVICE
    corrected the earlier 'executor-lifetime' claim), then the
    stateless buzhash
    W_i = XOR_k rot_k(h(t_{i-k})) as ~``window`` vectorized uint64
    shift/xor passes over the whole token axis, boundaries by one
    mask compare, chunk md5s via hashlib. Replaces the interpreted
    per-position filter-HOF evaluation (window rotate/xor Catalyst
    expression nodes PER POSITION) with numpy; bit-identical by
    construction and pinned against the JVM spelling in
    tests/test_tranche5b.py."""
    import re

    mask = (1 << mask_bits) - 1
    ws_re = re.compile(_JAVA_WS_CLASS)

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        cache: dict[str, int] = {}

        def th(tok: str) -> int:
            h = cache.get(tok)
            if h is None:
                h = _xxh64_bytes(tok.encode("utf-8"))
                cache[tok] = h
            return h

        for batch in batches:
            tks = batch.column("tk").to_pylist()
            nds = batch.column("n_docs").to_pylist()
            texts = batch.column("text").to_pylist()
            o_nw: list[int] = []
            o_hs: list[list[str]] = []
            for text in texts:
                toks = [t for t in ws_re.split(text) if t]
                n = len(toks)
                if n >= window:
                    h = np.fromiter(
                        (th(t) for t in toks), dtype=np.uint64, count=n
                    )
                    w_val = h[window - 1 :].copy()
                    for k in range(1, window):
                        hk = h[window - 1 - k : n - k]
                        w_val ^= (hk << np.uint64(k)) | (hk >> np.uint64(64 - k))
                    bnd = (
                        np.nonzero((w_val & np.uint64(mask)) == 0)[0]
                        + (window - 1)
                    ).tolist()
                else:
                    bnd = []
                starts = [0] + [b + 1 for b in bnd]
                ends = bnd + [n - 1]
                o_hs.append(
                    [
                        hashlib.md5(
                            " ".join(toks[s : e + 1]).encode("utf-8")
                        ).hexdigest()
                        for s, e in zip(starts, ends)
                        if s <= e
                    ]
                )
                o_nw.append(n)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(tks, pa.string()),
                    pa.array(nds, pa.int64()),
                    pa.array(o_nw, pa.int32()),
                    pa.array(o_hs, pa.list_(pa.string())),
                ],
                ["tk", "n_docs", "n_words", "hs"],
            )

    return fn


def cdc_chunk_stats_rolling(
    docs: DataFrame,
    window: int = _CDC_W,
    mask_bits: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ws: str = r"\s+",
) -> DataFrame:
    """q186's full output shape (doc_id, n_words, n_chunks, n_shared)
    under buzhash boundaries — the production CDC operator. Chunk
    hashes and cross-doc sharing are computed exactly as q186's
    (md5 chunk identity, "appears in >= 2 distinct docs" sharing
    rule); only the boundary decision differs (rolling vs
    per-position md5), so the two branches are different operating
    points of the same CDC design, not approximations of one truth.

    Distinct-text cache (q181's word-type pattern, one level up):
    chunk hashes are a pure function of the text, so the tokenize +
    boundary + per-chunk-md5 work runs ONCE PER DISTINCT TEXT and the
    per-text stats join back to doc ids by text hash. Cross-doc
    sharing stays exact: the number of distinct docs containing chunk
    hash h is the sum of text-group sizes over the distinct texts
    whose chunk set contains h (docs sharing a text share every
    chunk). Exact-dedup-first is the repo-wide discipline for every
    near-dup operator (operators/imagehash.py docstring); here it
    makes the heavy compute scale with DISTINCT corpus content — on a
    duplicate-free corpus the cache degenerates to a pass-through
    plus one exchange on the text hash.

    Per-text stage dispatch (r12, guide §4.2): under the DEFAULT
    ``ws`` the boundary+chunk-md5 stage runs as one vectorized Arrow
    pass (``_cdc_per_text_arrow`` — bit-identical, dispatch-pinned in
    tests/test_tranche5b.py); any other split pattern keeps the JVM
    ``rolling_chunk_hashes`` spelling, because Python regex semantics
    are not Java's and tokenization authority stays with the engine
    that q186 declared."""
    from file_appender_spark.operators.textstats import let_expr

    w = F.filter(F.split(F.col(text_col), ws), lambda x: x != "")
    ids = docs.filter(F.size(w) >= 1).select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("tk")
    )
    distinct_texts = (
        docs.filter(F.size(w) >= 1)
        .select(F.sha2(F.col(text_col), 256).alias("tk"), F.col(text_col).alias("text"))
        .groupBy("tk")
        .agg(F.count("*").alias("n_docs"), F.min("text").alias("text"))
    )
    if ws == r"\s+":
        # default tokenizer: the vectorized Arrow stage reproduces
        # Java's \s exactly (ASCII class) and the rolling math
        # bit-for-bit — validated params first so both spellings
        # raise identically
        if not 1 <= mask_bits <= 62:
            raise ValueError(f"mask_bits must be in [1, 62], got {mask_bits}")
        if not 2 <= window <= 63:
            raise ValueError(f"window must be in [2, 63], got {window}")
        per_text = distinct_texts.mapInArrow(
            _cdc_per_text_arrow(window, mask_bits),
            schema="tk string, n_docs bigint, n_words int, hs array<string>",
        )
    else:
        # non-default split pattern: Python regex semantics are not
        # Java's, so the JVM spelling keeps tokenization authority
        wt = F.filter(F.split(F.col("text"), ws), lambda x: x != "")
        per_text = distinct_texts.select(
            "tk",
            "n_docs",
            F.size(wt).alias("n_words"),
            let_expr(wt, lambda t: rolling_chunk_hashes(t, window, mask_bits)).alias(
                "hs"
            ),
        )
    # n_words rides the explode so per_text has ONE consumer — the
    # r12 Arrow stage made re-evaluating it a Python pass, and the
    # old n_words join-back was a third full evaluation of the stage
    # (plans/r12/cdc_rolling_stats: 3 MapInArrow nodes -> 2)
    ch = per_text.select(
        "tk", "n_docs", "n_words", F.explode("hs").alias("h")
    )
    # distinct docs containing h = sum of group sizes over DISTINCT
    # texts containing h (a text contributes its group once even when
    # h repeats inside it)
    shared = (
        ch.dropDuplicates(["tk", "h"])
        .groupBy("h")
        .agg(F.sum("n_docs").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    # no broadcast hint: the shared-hash set grows with distinct
    # corpus content (unbounded at the 100 TB scale this branch is
    # for) — forcing the build would OOM the driver instead of
    # degrading to a shuffle join; AQE still broadcasts when the set
    # is actually small (the q186 oracle form keeps the hint as its
    # declared fixture-scale contract)
    j = ch.join(shared.withColumn("_s", F.lit(1)), "h", "left")
    text_stats = j.groupBy("tk", "n_words").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("_s").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_shared"),
    )
    return ids.join(text_stats, "tk").select(
        "doc_id", "n_words", "n_chunks", "n_shared"
    )
