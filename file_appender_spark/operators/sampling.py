"""Deterministic weighted sampling (distributed A-ExpJ / A-Res).

Curation pipelines sample documents proportional to a score (quality,
domain weight, dedup-cluster size) — and the sample must be
RERUN-STABLE: the same inputs must select the same rows on every run,
any partitioning, or downstream caches/evals silently churn. Spark's
``df.sample`` cannot do either (per-partition RNG, no weights).

The Efraimidis-Spirakis A-Res scheme makes weighted sampling a top-k
problem: give each row the key ``u^(1/w)`` (u uniform in (0,1)) and
keep the k largest keys — the inclusion probabilities match weighted
sampling without replacement. Determinism comes from deriving u not
from an RNG but from a cryptographic hash of the row's id (+ a seed):
uniform in distribution across rows, yet a pure function of the data.

Scale: the key is one projection (md5 -> 16 hex chars -> unit
fraction -> pow), then ``k`` survivors come from the same
TakeOrderedAndProject / per-group WindowGroupLimit machinery as every
top-k in this engine — no shuffle beyond the top-k's own, no driver
materialization. Per-stratum sampling = the same with a
``partitionBy`` on the stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _stable_uniform(id_col: str, seed: str):
    """Uniform (0,1] derived from md5(seed || id): the top 16 hex
    chars as a 64-bit integer, scaled. Pure function of (seed, id) —
    identical on any partitioning, any run."""
    h = F.md5(F.concat_ws("\x1f", F.lit(seed), F.col(id_col).cast("string")))
    frac = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("double")
        / float(16**15)
    )
    # avoid exactly 0 (pow(0, 1/w) would zero every weight's key)
    return F.greatest(frac, F.lit(1e-18))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    seed: str = "ws1",
    stratify_by: str | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """k rows sampled without replacement with probability
    proportional to ``weight_col`` (A-Res key = u^(1/w)), rerun-stable
    by construction. Rows with weight <= 0 are never selected.
    With ``stratify_by``, k rows per stratum. ``keep_key`` retains the
    ``_wkey`` ranking key (the q135 oracle surface inspects it)."""
    key = F.pow(_stable_uniform(id_col, seed), 1.0 / F.col(weight_col))
    ranked = df.filter(F.col(weight_col) > 0).withColumn("_wkey", key)
    if stratify_by is None:
        out = ranked.orderBy(F.col("_wkey").desc(), F.col(id_col)).limit(k)
    else:
        w = W.partitionBy(stratify_by).orderBy(
            F.col("_wkey").desc(), F.col(id_col)
        )
        out = ranked.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= k
        ).drop("_rn")
    return out if keep_key else out.drop("_wkey")
