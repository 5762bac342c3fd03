"""Distribution-drift monitoring at scale: the quantile-grid
(binned) two-sample KS that q117_ks_drift's docstring names as its
100 TB twin — made real here, batch and streaming.

Exact KS needs the supremum over the pooled empirical CDFs, i.e. a
global ordering of every value (q117's oracle form). At 100 TB the
standard monitoring practice is a FIXED quantile grid frozen from a
reference sample: each side collapses to per-bin counts (one map-side
combined aggregation, no global sort), and the KS supremum is taken
over the grid's cumulative fractions. The approximation error is
bounded by the reference CDF mass per bin (~1/n_bins for a quantile
grid), which is what a drift monitor needs — thresholds are set in
units of "how much drift", not machine epsilon.

Streaming: ``ks_monitor_batch`` is foreachBatch-shaped (stateless per
batch given the frozen grid), so a micro-batch stream monitors drift
against the reference with per-batch cost O(batch) and fixed-size
output — the drift sibling of the label-balance monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantile_grid(ref: DataFrame, col: str, n_bins: int = 32) -> list[float]:
    """Interior quantile boundaries of the reference distribution
    (n_bins - 1 cut points) — freeze ONCE from a reference sample,
    then reuse across every monitored batch so all KS numbers are
    comparable. Uses exact percentile at fixture scale;
    approx_percentile is the drop-in at corpus scale (the grid is a
    monitoring artifact, not an oracle surface)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = [i / n_bins for i in range(1, n_bins)]
    row = ref.select(
        F.expr(f"percentile({col}, array({', '.join(map(str, probs))}))").alias("qs")
    ).first()
    return [float(x) for x in row["qs"]]


def bin_counts(df: DataFrame, col: str, grid: list[float]) -> DataFrame:
    """Per-bin row counts under the frozen grid: bin i = number of
    boundaries <= value (one O(|grid|) array fold inside codegen —
    no join, no sort; empty bins are emitted downstream, not here).

    Nulls are EXCLUDED before binning: (col >= b) is NULL for null
    values, so without the filter the whole fold yields a NULL bin
    whose rows inflate the _cum_fractions total but never enter the
    cumulative sums — fractions would never reach 1.0 and the KS
    would read inflated drift. The filter matches quantile_grid's
    percentile(), which also ignores nulls, keeping both sides of
    the statistic consistent."""
    garr = F.array(*[F.lit(float(b)) for b in grid])
    bin_expr = F.aggregate(
        garr,
        F.lit(0),
        lambda acc, b: acc + (F.col(col) >= b).cast("int"),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def _cum_fractions(counts: DataFrame, n_bins: int) -> list[float]:
    rows = {r["bin"]: r["n"] for r in counts.collect()}
    total = sum(rows.values())
    if total == 0:
        raise ValueError("empty side: KS undefined over zero rows")
    cum, acc = [], 0
    for b in range(n_bins):
        acc += rows.get(b, 0)
        cum.append(acc / total)
    return cum


def binned_ks(
    a: DataFrame, b: DataFrame, col: str, grid: list[float]
) -> float:
    """Two-sample KS statistic over the frozen grid: sup |F_a - F_b|
    evaluated at the grid boundaries. Differs from the exact KS by at
    most the reference mass of one bin (~1/n_bins for a quantile
    grid). Each side is ONE aggregation; only |grid|+1 counts reach
    the driver."""
    n_bins = len(grid) + 1
    ca = _cum_fractions(bin_counts(a, col, grid), n_bins)
    cb = _cum_fractions(bin_counts(b, col, grid), n_bins)
    return max(abs(x - y) for x, y in zip(ca, cb))


def ks_monitor_batch(
    batch: DataFrame, col: str, grid: list[float], ref_cum: list[float]
) -> dict:
    """foreachBatch body: KS of one micro-batch against the frozen
    reference cumulative fractions. Returns a small report dict
    (rows, ks) the caller appends to its monitoring sink. Stateless
    given (grid, ref_cum), so retries are idempotent."""
    n_bins = len(grid) + 1
    counts = bin_counts(batch, col, grid)
    rows = {r["bin"]: r["n"] for r in counts.collect()}
    total = sum(rows.values())
    if total == 0:
        return {"n_rows": 0, "ks": None}
    acc, ks = 0, 0.0
    for b in range(n_bins):
        acc += rows.get(b, 0)
        ks = max(ks, abs(acc / total - ref_cum[b]))
    return {"n_rows": total, "ks": round(ks, 6)}


def reference_cum(ref: DataFrame, col: str, grid: list[float]) -> list[float]:
    """Cumulative fractions of the reference under its own grid —
    compute once alongside the grid, ship both to the monitor."""
    return _cum_fractions(bin_counts(ref, col, grid), len(grid) + 1)


# ---------------------------------------------------------------------------
# categorical mix-shift monitor (TVD) — q247's streaming companion
# ---------------------------------------------------------------------------


def reference_fractions(ref: DataFrame, col: str) -> dict:
    """Category -> count of the frozen reference window (exact
    integers; the monitor cross-multiplies, so no fraction rounding
    enters the comparison). NULL categories normalize to '(null)' —
    the same real-category treatment q247 applies, so the pinned
    monitor==q247 equivalence holds under NULLs too (review finding).
    Bounded collect: |categories| rows."""
    return {
        (r[col] if r[col] is not None else "(null)"): r["n"]
        for r in ref.groupBy(col).agg(F.count("*").alias("n")).collect()
    }


def tvd_monitor_batch(batch: DataFrame, col: str, ref_counts: dict) -> dict:
    """foreachBatch body: total variation distance of one
    micro-batch's categorical mix against the frozen reference —
    TVD = sum |c_b * t_ref - c_ref * t_b| / (2 * t_b * t_ref), the
    exact integer-numerator form q247 uses for day pairs, so the
    streaming monitor and the batch query CANNOT disagree on the
    metric (pinned in tests/test_drift.py). Stateless given
    ref_counts; retries are idempotent. Bounded collect:
    |categories| rows per batch."""
    rows = {
        (r[col] if r[col] is not None else "(null)"): r["n"]
        for r in batch.groupBy(col).agg(F.count("*").alias("n")).collect()
    }
    t_b = sum(rows.values())
    t_ref = sum(ref_counts.values())
    if t_b == 0 or t_ref == 0:
        return {"n_rows": t_b, "tvd": None}
    cats = set(rows) | set(ref_counts)
    num = sum(
        abs(rows.get(c, 0) * t_ref - ref_counts.get(c, 0) * t_b) for c in cats
    )
    return {"n_rows": t_b, "tvd": round(num / (2.0 * t_b * t_ref), 6)}
