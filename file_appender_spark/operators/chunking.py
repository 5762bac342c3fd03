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
a 64-bit left rotation. Each position costs TWO token hash lookups
and three bit-ops — O(1), independent of the window — vs the md5
form's O(w) re-hash. A boundary falls after position i when
H_i mod 2^d == 0 (expected chunk length 2^d, the standard CDC mask
test; power-of-two so the modulus is a single AND).

The CDC property (an insertion resynchronizes within one window)
depends only on the boundary decision being a function of the
trailing w tokens — true for both hashes — and is pinned for this
branch by the same suffix-match harness as the md5 form
(tests/test_tranche5b.py).

Scale shape: identical to q186's — the per-doc fold is ONE
zero-shuffle higher-order aggregate (no explode, no window); the only
shuffles are the cross-doc chunk-hash groupBy and the final per-doc
aggregation. Probe: scripts/probe_chunk.py measures both branches at
10x (the rolling branch's ratio is the one bounded row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CDC_W = 4  # q186's window: boundary decided by the trailing 4-gram


def _rot(col: Column, k: int) -> Column:
    """64-bit rotate-left by a CONSTANT k (1 <= k <= 63) on a long."""
    return F.shiftleft(col, k).bitwiseOR(F.shiftrightunsigned(col, 64 - k))


def rolling_chunk_hashes(
    t: Column, window: int = _CDC_W, mask_bits: int = 3
) -> Column:
    """Chunk-hash array for a bound word-array column ``t`` under
    buzhash boundaries: boundary AFTER position i (i >= window-1)
    when the rolling hash of the trailing ``window`` tokens has its
    low ``mask_bits`` bits zero (expected chunk ~2^mask_bits words,
    matching q186's md5-digit rule at mask_bits=3). Returns
    array<string> of per-chunk md5 hashes — the same chunk identity
    as q186, so downstream cross-doc sharing logic is shared.

    The accumulator carries (closed chunks, current chunk, rolling
    hash); per position the rolling value is updated in O(1) from the
    incoming token's xxhash64 and the outgoing token's (window
    positions back), never re-hashing the window."""
    if not 1 <= mask_bits <= 62:
        raise ValueError(f"mask_bits must be in [1, 62], got {mask_bits}")
    if not 2 <= window <= 63:
        raise ValueError(f"window must be in [2, 63], got {window}")
    mask = (1 << mask_bits) - 1
    empty_chunks = F.expr("CAST(array() AS array<array<string>>)")
    empty_words = F.expr("CAST(array() AS array<string>)")
    init = F.struct(
        empty_chunks.alias("chs"),
        empty_words.alias("cur"),
        F.lit(0).cast("long").alias("rh"),
    )

    def merge(acc, i):
        wi = F.element_at(t, i + 1)
        rh = _rot(acc["rh"], 1).bitwiseXOR(F.xxhash64(wi))
        rh = F.when(
            i >= F.lit(window),
            rh.bitwiseXOR(
                _rot(F.xxhash64(F.element_at(t, i - window + 1)), window % 64)
            ),
        ).otherwise(rh)

        def with_rh(rh_b):
            bnd = (i >= F.lit(window - 1)) & (
                rh_b.bitwiseAND(F.lit(mask).cast("long")) == 0
            )
            closed = F.struct(
                F.concat(
                    acc["chs"], F.array(F.concat(acc["cur"], F.array(wi)))
                ).alias("chs"),
                empty_words.alias("cur"),
                rh_b.alias("rh"),
            )
            grown = F.struct(
                acc["chs"].alias("chs"),
                F.concat(acc["cur"], F.array(wi)).alias("cur"),
                rh_b.alias("rh"),
            )
            return F.when(bnd, closed).otherwise(grown)

        # let-bind the rolling value: it feeds the boundary test AND
        # both accumulator branches — CollapseProject would otherwise
        # re-derive the rotate/xor chain (and both token hashes) per
        # reference site, compounding along the fold
        from file_appender_spark.operators.textstats import let_expr

        return let_expr(rh, with_rh)

    def finish(acc):
        chs = F.when(
            F.size(acc["cur"]) > 0, F.concat(acc["chs"], F.array(acc["cur"]))
        ).otherwise(acc["chs"])
        return F.transform(chs, lambda ch: F.md5(F.array_join(ch, " ")))

    return F.aggregate(F.sequence(F.lit(0), F.size(t) - 1), init, merge, finish)


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
    (md5 chunk identity, countDistinct >= 2 sharing rule); only the
    boundary decision differs (rolling vs per-position md5), so the
    two branches are different operating points of the same CDC
    design, not approximations of one truth."""
    from file_appender_spark.operators.textstats import let_expr

    w = F.filter(F.split(F.col(text_col), ws), lambda x: x != "")
    base = docs.filter(F.size(w) >= 1).select(
        F.col(id_col).alias("doc_id"),
        F.size(w).alias("n_words"),
        let_expr(w, lambda t: rolling_chunk_hashes(t, window, mask_bits)).alias(
            "hs"
        ),
    )
    ch = base.select("doc_id", "n_words", F.explode("hs").alias("h"))
    shared = (
        ch.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    j = ch.join(F.broadcast(shared.withColumn("_s", F.lit(1))), "h", "left")
    return j.groupBy("doc_id").agg(
        F.max("n_words").alias("n_words"),
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("_s").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_shared"),
    )
