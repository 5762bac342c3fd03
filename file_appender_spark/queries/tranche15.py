"""Round-6 tranche 15: dedup-planning + label-QA operators
(q241-q242).

- q241: dedup threshold sensitivity sweep — the q52 near-dup pair
  mass bucketed by Jaccard decile with a cumulative
  pairs-at-or-above count per threshold: the one-pass curve an
  operator reads BEFORE picking the dedup threshold (how many pairs
  does 0.8 vs 0.5 actually remove), instead of re-running the
  pipeline per candidate threshold.
- q242: language-label confusion per source — q57's stopword-marker
  language ID aggregated against the labeled lang, per source: the
  mislabeled-language QA matrix (a source whose labels disagree with
  the detector is a metadata bug upstream; fixes route to labels or
  detector depending on which source misbehaves).

Determinism: q241's deciles are integer floor(jaccard*10) buckets of
the already-6dp-rounded q52 jaccard; the cumulative count is an
integer suffix sum over <=9 buckets. q242 reuses q57's exact marker
counts and its declared argmax tie-break order (en > de > fr > es);
all outputs are integer counts.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's dedup and
text-analysis families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import (
    _LANG_PRED_SQL,
    _Q52_CTES,
    _Q52_FINAL,
    _lang_scores_sql,
    lang_marker_score_cols,
    lang_pred_expr,
)
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q241 — dedup threshold sensitivity sweep
# ---------------------------------------------------------------------------


@register(
    "q241_threshold_sweep",
    f"""
    WITH {_Q52_CTES},
    q52 AS ({_Q52_FINAL}),
    binned AS (
      SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM q52 GROUP BY 1
    )
    SELECT decile, n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY decile DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_pairs_at_or_above
    FROM binned
    """,
)
def q241_threshold_sweep(
    spark: SparkSession, sf_dir: str, *, graph_dir: str | None = None
) -> DataFrame:
    """Threshold sensitivity of the q52 near-dup pipeline: pair mass
    per Jaccard decile plus the cumulative pairs retained at each
    threshold — computed in ONE pass over the pair list, so choosing
    between dedup thresholds costs a groupBy, not a pipeline re-run
    per candidate. Deciles floor the already-rounded q52 jaccard;
    the suffix sum runs over <=9 integer rows.

    Scale: inherits q52's banded candidate generation; the sweep adds
    one bucket aggregate and a bounded window."""
    from file_appender_spark.operators.pairstore import q52_edges

    pairs = q52_edges(spark, sf_dir, graph_dir).select("jaccard")
    binned = pairs.groupBy(
        F.floor(F.col("jaccard") * 10).cast("long").alias("decile")
    ).agg(F.count("*").cast("long").alias("n_pairs"))
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return binned.select(
        "decile",
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("n_pairs_at_or_above"),
    )


# ---------------------------------------------------------------------------
# q242 — language-label confusion per source
# ---------------------------------------------------------------------------


@register(
    "q242_lang_confusion",
    f"""
    WITH {_lang_scores_sql("source, lang")},
    pred AS (
      SELECT source, lang AS labeled_lang,
             {_LANG_PRED_SQL} AS predicted_lang
      FROM scores
    )
    SELECT source, labeled_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN labeled_lang = predicted_lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
    FROM pred GROUP BY source, labeled_lang, predicted_lang
    """,
)
def q242_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label QA: q57's stopword-marker detector aggregated
    against the labeled lang PER SOURCE — the (source, labeled,
    predicted) confusion cells that localize metadata bugs (one
    source disagreeing = that source's labeler; every source
    disagreeing on one lang = the detector's markers). Reuses q57's
    exact marker counts and declared argmax tie-break (en > de >
    fr > es); note 'zh' has no marker set, so its docs fall to the
    tie-break floor — the cells still pin detector behavior.

    Scale: one scan with four JVM-side filter counts per row (q57's
    cost), one map-side-combined groupBy bounded by sources x
    langs²."""
    d = _t(spark, sf_dir, "documents")
    scores = d.select(
        "source",
        F.col("lang").alias("labeled_lang"),
        *lang_marker_score_cols(),
    )
    return (
        scores.select(
            "source", "labeled_lang", lang_pred_expr().alias("predicted_lang")
        )
        .groupBy("source", "labeled_lang", "predicted_lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("labeled_lang") == F.col("predicted_lang"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
    )
