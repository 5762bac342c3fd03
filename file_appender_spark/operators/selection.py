"""Exact distributed selection (k-th smallest / exact quantile)
WITHOUT a global sort — the 100 TB scale path behind the exact
percentile queries (q19/q95/q98/q133 compute exact percentiles
through in-group sorts, fine per group; a GLOBAL exact percentile
over 10^12 rows cannot afford `ORDER BY` and approx_percentile only
bounds the error).

Classic value-domain bisection with filter-and-collect refinement:

1. bracket the k-th value by [min, max],
2. each pass computes ONE map-side-combined count(x <= mid) and
   halves the value bracket,
3. once the bracket holds few enough rows, collect just those and
   finish locally.

Pass count is ~log2(value-range / bracket-width) — data-independent,
each pass a cheap aggregate; the collect is bounded by
``refine_rows``. Exactness: the bracket always contains the k-th
value by the count invariants (count(<= lo) < k <= count(<= hi)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    refine_rows: int = 100_000,
    max_passes: int = 128,
) -> float:
    """Exact k-th smallest (1-based) of a numeric column, ignoring
    nulls. One count aggregate per bisection pass, one bounded
    collect at the end — no global sort, no unbounded driver data."""
    vals = df.select(F.col(col).alias("x")).filter(F.col("x").isNotNull())
    n = vals.count()
    if not 1 <= k <= n:
        raise ValueError(f"k={k} outside [1, {n}]")
    row = vals.agg(F.min("x").alias("lo"), F.max("x").alias("hi")).first()
    lo, hi = float(row["lo"]), float(row["hi"])
    if lo == hi:
        return lo
    # establish the invariant count(x <= lo) < k <= count(x <= hi):
    # when k lands within the minimum's multiplicity, the answer IS
    # the minimum (the (lo, hi] bracket below would exclude it)
    if vals.filter(F.col("x") <= lo).count() >= k:
        return lo
    # shrink until few enough rows to collect
    for _ in range(max_passes):
        in_bracket = vals.filter((F.col("x") > lo) & (F.col("x") <= hi))
        stats = in_bracket.agg(
            F.count("*").alias("m"), F.min("x").alias("bmin"), F.max("x").alias("bmax")
        ).first()
        m = stats["m"]
        # duplicate-heavy shortcut: a bracket holding one distinct
        # value IS the answer (the invariant places the k-th inside) —
        # without this, 10^6 copies of one value would bisect to float
        # resolution instead of stopping immediately
        if m > 0 and stats["bmin"] == stats["bmax"]:
            return float(stats["bmin"])
        if m <= refine_rows:
            below = vals.filter(F.col("x") <= lo).count()
            local = sorted(r["x"] for r in in_bracket.collect())
            return float(local[k - below - 1])
        mid = lo + (hi - lo) / 2
        if mid <= lo or mid >= hi:
            # bracket at float resolution: no float strictly between
            # lo and hi exists, so every remaining value equals hi —
            # the ONLY path where returning hi is justified
            return hi
        c = vals.filter(F.col("x") <= mid).count()
        if c >= k:
            hi = mid
        else:
            lo = mid
    # pass budget exhausted while the bracket still spans many floats
    # (possible when magnitudes span ~2^max_passes ulps): returning hi
    # here would silently break the exactness contract — fail loudly
    raise RuntimeError(
        f"kth_smallest did not converge in {max_passes} passes "
        f"(bracket ({lo}, {hi}] still holds > refine_rows={refine_rows} "
        "rows); raise max_passes or refine_rows"
    )


def exact_quantile(
    df: DataFrame, col: str, q: float, refine_rows: int = 100_000
) -> float:
    """PERCENTILE_DISC(q) semantics (the smallest value whose
    cumulative count reaches ceil(q * n)) via ``kth_smallest``."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q={q} outside [0, 1]")
    n = (
        df.select(F.col(col).alias("x"))
        .filter(F.col("x").isNotNull())
        .count()
    )
    if n == 0:
        raise ValueError(f"no non-null values in {col!r}")
    k = max(1, math.ceil(q * n))
    return kth_smallest(df, col, k, refine_rows=refine_rows)
