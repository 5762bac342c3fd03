"""Exact distributed heavy hitters with a Misra-Gries candidate pass.

The classic two-phase exact frequent-items plan for data too large to
count every distinct key:

1. **Candidate generation** — one Misra-Gries summary (k counters)
   per partition, computed in a single Arrow-batched pass
   (``mapInPandas``). MG's guarantee: any item whose frequency within
   the partition exceeds ``N_p / k`` survives the partition's summary.
   By pigeonhole, an item with GLOBAL frequency > ``N / k`` must
   exceed ``N_p / k`` in at least one partition, so the union of
   per-partition summaries is a superset of every true heavy hitter.
   The union is tiny: at most ``k - 1`` candidates per partition,
   independent of the number of distinct keys.
2. **Exact verify** — count ONLY the candidate keys (broadcast semi
   join prunes the token stream before the shuffle), then filter by
   the exact global threshold. Output is exact — identical to a full
   ``GROUP BY key HAVING count(*) * k > total`` — which is what makes
   the operator oracle-checkable (q155).

At 100 TB the win is the shuffle: the naive plan shuffles one row per
distinct key (trillions for web-scale token streams); this plan
shuffles ``partitions x k`` candidate rows plus the pre-filtered
matches. The MG summaries themselves never leave the executors as
state — each batch iterator folds into a dict bounded at ``k``
entries.

Per-batch merging uses the mergeable-summaries formulation (Agarwal
et al., PODS 2012): add the batch's value_counts to the running
counters, then if more than ``k - 1`` counters remain, subtract the
k-th largest count from all and drop the non-positive — equivalent
error bound to element-at-a-time MG, vectorized over Arrow batches.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: Counter, batch: pd.Series, k: int) -> Counter:
    """Fold one batch of values into a Misra-Gries summary of at most
    ``k - 1`` counters (mergeable-summaries trim)."""
    counts = batch.value_counts()
    for value, n in counts.items():
        counters[value] += int(n)
    if len(counters) > k - 1:
        # subtract the k-th largest count from everything; at most
        # k - 1 counters stay positive. This is the batched analogue
        # of MG's decrement-all step and preserves the N_p/k error
        # bound (each subtraction is charged to >= k distinct items).
        kth = sorted(counters.values(), reverse=True)[k - 1]
        for value in list(counters):
            counters[value] -= kth
            if counters[value] <= 0:
                del counters[value]
    return counters


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Candidate heavy hitters of ``df[col]``: the union of
    per-partition Misra-Gries summaries with ``k`` counters.

    Guaranteed to contain every value with global frequency
    > ``total_rows / k`` regardless of partitioning; the exact set
    returned beyond those depends on partition boundaries, so callers
    MUST verify with exact counts (see q155) before reporting."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            _mg_fold(counters, pdf[col].dropna(), k)
        yield pd.DataFrame({col: list(counters.keys())}, dtype=object)

    return (
        df.select(F.col(col).cast("string").alias(col))
        .mapInPandas(summarize, schema=f"{col} string")
        .distinct()
    )


def exact_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact items with frequency > total/k: MG candidates, then an
    exact verify count restricted to the candidate set.

    Returns ``(col, cnt, freq)`` with ``freq`` rounded to 6 dp from a
    single long/long division (deterministic across engines)."""
    vals = df.select(F.col(col).cast("string").alias(col)).filter(
        F.col(col).isNotNull()
    )
    cands = misra_gries_candidates(vals, col, k)
    total = vals.agg(F.count("*").alias("total"))
    return (
        vals.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("total"))
        .select(
            col,
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("freq"),
        )
    )


def streaming_heavy_hitter_candidates(
    tokens: DataFrame, col: str, k: int, n_shards: int = 8
) -> DataFrame:
    """Streaming Misra-Gries: one MG summary per hash shard, carried
    across micro-batches via ``applyInPandasWithState``.

    A value always hashes to the same shard, so the shard's summary
    sees the value's ENTIRE stream — the guarantee strengthens over
    the batch pass: global count > N/k implies count > N_shard/k
    (N_shard <= N), so every true heavy hitter of the whole stream so
    far is present in its shard's state after every batch. Emits each
    shard's current candidates in update mode; exactness still
    requires the batch verify (exact_heavy_hitters) over the stored
    corpus — the stream gives the live, bounded-memory watchlist.

    State is bounded at k-1 (value, count) entries per shard; the
    shuffle per batch is the grouping on n_shards keys only."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    import pandas as pd

    def update(key, pdfs, state):
        (shard,) = key
        if state.exists:
            # GroupState.get is a PROPERTY returning the state tuple
            # (calling it raises "'tuple' object is not callable")
            keys, counts, upd = state.get
            counters = Counter(dict(zip(keys, counts)))
        else:
            counters, upd = Counter(), 0
        for pdf in pdfs:
            _mg_fold(counters, pdf[col].dropna(), k)
        upd += 1
        state.update(
            ((list(counters.keys()), [int(c) for c in counters.values()], upd))
        )
        # `upd` is the shard's update sequence number: in an
        # update-mode sink (which keeps every emission) the rows with
        # the shard's max upd ARE its final state — consumers and the
        # coverage test select on it instead of unioning history
        yield pd.DataFrame(
            {
                "shard": shard,
                col: list(counters.keys()),
                "mg_count": [int(c) for c in counters.values()],
                "upd": upd,
            }
        )

    return (
        tokens.select(F.col(col).cast("string").alias(col))
        .withColumn("shard", F.pmod(F.xxhash64(F.col(col)), F.lit(n_shards)))
        .groupBy("shard")
        .applyInPandasWithState(
            update,
            outputStructType=f"shard long, {col} string, mg_count long, upd long",
            stateStructType="keys array<string>, counts array<long>, upd long",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
