"""Pure-SQL Bloom-filter semi-join pruning — the runtime-filter
technique engines use to cut shuffle volume on selective joins
(Spark's own runtime bloom filters, Bloom 1970).

Why hand-rolled: Spark's injected runtime filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) only apply
where the optimizer sees a selective build side at plan time; this
operator makes the same pruning available as an explicit, composable
step — build a filter from one dataframe's keys, prefilter another
BEFORE its expensive shuffle — with the filter evaluated entirely in
codegen (a literal long-array + xxhash64 bit probes; no UDF, no
broadcast variable plumbing).

Design:
- **build** is one distributed aggregation: each value maps to
  ``k_hashes`` bit positions (``xxhash64(seed=i, value) mod m``),
  positions group into 64-bit words, ``bit_or`` folds the masks
  map-side, and the collect is bounded at ``m_bits/64`` rows
  REGARDLESS of input size — build cost is one scan + one tiny
  shuffle.
- **probe** is a generated per-row expression over the literal word
  array: k shifted-bit tests ANDed. No join, no shuffle; Catalyst
  folds it into whatever scan it prunes.
- **No false negatives**: pruning with the filter then running the
  EXACT join yields byte-identical results to the unpruned plan
  (pinned by test); false positives only cost wasted probe rows.

Size guidance: the word array is a plan literal — fine to ~1M bits
(16k longs, the same order as Spark's default runtime filter). For
larger filters, switch the probe to an Arrow-broadcast pandas UDF;
the build stage is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n ln p / (ln 2)^2 bits, k = m/n ln 2,
    m rounded up to a multiple of 64."""
    if n_items <= 0:
        return 64, 1
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _pos_expr(col: str, seed: int, m_bits: int) -> str:
    return f"pmod(xxhash64({seed}L, {col}), {m_bits})"


def bloom_build(
    df: DataFrame, col: str, m_bits: int, k_hashes: int
) -> list[int]:
    """Build the filter: returns ``m_bits / 64`` words as Python ints.
    One scan, map-side bit_or, collect bounded at m_bits/64 rows."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos_arr = "array(" + ",".join(
        _pos_expr("v", i, m_bits) for i in range(k_hashes)
    ) + ")"
    rows = (
        df.select(F.col(col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .select(F.explode(F.expr(pos_arr)).alias("pos"))
        .select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word"]] = int(r["bits"])
    return words


def bloom_might_contain(
    col: str, words: list[int], k_hashes: int
) -> Column:
    """Membership probe as ONE generated expression over the literal
    word array: the k positions are computed ONCE into an array, then
    ``forall`` runs the bit test per position — k xxhash64 calls per
    row total, all inside codegen."""
    m_bits = len(words) * 64
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    pos_arr = "array(" + ",".join(
        _pos_expr(col, i, m_bits) for i in range(k_hashes)
    ) + ")"
    return F.expr(
        f"forall({pos_arr}, p -> "
        f"(shiftright(element_at({arr}, cast(p DIV 64 as int) + 1), "
        f"cast(pmod(p, 64) as int)) & 1L) = 1L)"
    )


def bloom_prefilter(
    df: DataFrame,
    col: str,
    keys: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """Semi-join reduction: keep only ``df`` rows whose ``col`` MIGHT
    be in ``keys[key_col]``. No false negatives — following with the
    exact join gives identical results to the unpruned plan; the win
    is that the pruned rows never enter the join's shuffle.

    Both sides hash their values AS STRINGS, so the two columns must
    already share one type: a double 1.0 probing a filter built from
    int 1 would hash '1.0' vs '1' and produce a FALSE NEGATIVE even
    though the join's numeric coercion would match the rows. Raising
    here is the only safe behavior — silently casting would hide the
    same class of bug one level down."""
    lt = df.schema[col].dataType
    rt = keys.schema[key_col].dataType
    if lt != rt:
        raise ValueError(
            f"bloom_prefilter key types must match exactly "
            f"({col}: {lt.simpleString()} vs {key_col}: {rt.simpleString()}) "
            "— string-hashing differs where join coercion would not; "
            "cast both sides to one type first"
        )
    if n_keys is None:
        n_keys = keys.count()
    m_bits, k_hashes = bloom_params(n_keys, fpp)
    words = bloom_build(keys, key_col, m_bits, k_hashes)
    probe_col = f"cast({col} as string)"
    return df.filter(bloom_might_contain(probe_col, words, k_hashes))
