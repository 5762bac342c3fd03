"""Round-6 tranche 17: dedup economics + agreement/drift metrics
(q245-q247).

- q245: token-weighted dedup savings — q144 counts DOCS a dedup pass
  removes; training cost is TOKENS, so this weighs q116's
  keep-one-per-cluster decision by token counts (the number that
  actually moves a training budget).
- q246: Cohen's kappa (Cohen 1960) between q57's language detector
  and the labels — chance-corrected agreement as one exact integer
  cross-multiplication (po*n - pe_n2) / (n² - pe_n2). On this
  synthetic corpus the marker detector degenerates to a constant
  predictor, and kappa = EXACTLY 0 on both engines — the no-skill
  answer, integer-exact (raw accuracy q242 reports ~40% and looks
  deceptively useful; kappa says otherwise).
- q247: day-over-day total variation distance of the event-type mix
  — per-day distribution shift as exact integer numerators
  |c1*t2 - c2*t1| over the common denominator 2*t1*t2 (one IEEE
  division per day pair), the release-regression tripwire.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's dedup-analytics
and drift families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import (
    _LANG_PRED_SQL,
    _Q52_CTES,
    _Q52_FINAL,
    _WS,
    _lang_scores_sql,
    lang_marker_score_cols,
    lang_pred_expr,
    q116_dedup_clusters,
)
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q245 — token-weighted dedup savings
# ---------------------------------------------------------------------------


@register(
    "q245_effective_tokens",
    f"""
    WITH RECURSIVE {_Q52_CTES},
    q52 AS ({_Q52_FINAL}),
    sym AS (SELECT d1 AS u, d2 AS v FROM q52 UNION ALL SELECT d2, d1 FROM q52),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT x.id, s.v FROM reach x JOIN sym s ON s.u = x.r
    ),
    asg AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    ntok AS (SELECT doc_id,
                    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                      AS n_tok
             FROM documents),
    j AS (SELECT ntok.n_tok,
                 CASE WHEN asg.doc_id = asg.cluster_id THEN 1 ELSE 0 END
                   AS keep
          FROM asg JOIN ntok ON ntok.doc_id = asg.doc_id)
    SELECT CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN keep = 1 THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(sum(CASE WHEN keep = 0 THEN n_tok ELSE 0 END) AS BIGINT)
             AS saved_tokens,
           round(CAST(sum(CASE WHEN keep = 0 THEN n_tok ELSE 0 END) AS DOUBLE)
                 / sum(n_tok), 6) AS saved_share
    FROM j
    """,
)
def q245_effective_tokens(
    spark: SparkSession, sf_dir: str, *, graph_dir: str | None = None
) -> DataFrame:
    """Token-weighted dedup savings: what keep-one-per-cluster over
    q116's transitive near-dup clusters saves in TOKENS — the number
    a training budget actually feels (q144's doc-count savings can
    misestimate badly when duplicates skew long or short). Exact
    integer token sums, one rounded share.

    Scale: composes q116's CC (O(log n) rounds); the token count is
    a per-row expression joined on doc_id — one corpus-keyed
    equi-join, two map-side-combined aggregates. ``graph_dir``
    (opt-in) forwards to q116: the cluster assignment comes from the
    materialized operators/pairstore.py store instead of re-running
    LSH + CC."""
    asg = q116_dedup_clusters(spark, sf_dir, graph_dir=graph_dir).select(
        "doc_id", "keep"
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", _WS)).cast("long").alias("n_tok")
    )
    j = asg.join(d, "doc_id").select(
        "n_tok", F.when(F.col("keep"), 1).otherwise(0).alias("k")
    )
    return j.agg(
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("k") == 1, F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum(F.when(F.col("k") == 0, F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("saved_tokens"),
        F.round(
            F.sum(F.when(F.col("k") == 0, F.col("n_tok")).otherwise(0))
            .cast("double")
            / F.sum("n_tok"),
            6,
        ).alias("saved_share"),
    )


# ---------------------------------------------------------------------------
# q246 — Cohen's kappa: language detector vs labels
# ---------------------------------------------------------------------------


@register(
    "q246_lang_kappa",
    f"""
    WITH {_lang_scores_sql("doc_id, lang")},
    pred AS (
      SELECT lang AS a,
             {_LANG_PRED_SQL} AS b
      FROM scores
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pred),
    agree AS (SELECT CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
                       AS po_n FROM pred),
    ma AS (SELECT a, CAST(count(*) AS BIGINT) AS ca FROM pred GROUP BY a),
    mb AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM pred GROUP BY b),
    -- coalesce: disjoint label/prediction classes make the join
    -- empty and sum() NULL, but the true pe is 0 (kappa defined!) —
    -- review finding
    pe AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS pe_n2
           FROM ma JOIN mb ON ma.a = mb.b)
    SELECT nn AS n_docs, po_n AS n_agree,
           CASE WHEN nn * nn - pe_n2 > 0
                THEN round(CAST(po_n * nn - pe_n2 AS DOUBLE)
                           / (nn * nn - pe_n2), 6)
                ELSE NULL END AS kappa
    FROM n, agree, pe
    """,
)
def q246_lang_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between q57's marker detector and
    the language labels: kappa = (po - pe) / (1 - pe) spelled as the
    exact integer cross-multiplication (po*n - sum(ca*cb)) /
    (n² - sum(ca*cb)), guarded for the degenerate pe=1 case. On this
    corpus the detector predicts one class for nearly every doc, and
    kappa lands at EXACTLY 0 on both engines — the no-skill verdict
    that q242's raw-accuracy cells cannot deliver.

    Scale: q57's one-scan marker counts; the marginals are
    |langs|-row aggregates; everything after is scalar."""
    d = _t(spark, sf_dir, "documents")
    scores = d.select(
        F.col("lang").alias("a"), *lang_marker_score_cols()
    )
    pred = scores.select("a", lang_pred_expr().alias("b"))
    # ONE document scan: the <=|langs|²-row confusion rollup carries
    # everything; n/agree/marginals/pe derive from it (review finding:
    # four independent aggregations re-ran the split+filter scan 4x)
    cm = pred.groupBy("a", "b").agg(F.count("*").cast("long").alias("c"))
    stats = cm.agg(
        F.sum("c").cast("long").alias("nn"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("po_n"),
    )
    ma = cm.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    mb = cm.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    # coalesce: disjoint classes -> empty join -> NULL sum, but the
    # true pe is 0 and kappa is defined (review finding)
    pe = (
        ma.join(mb, F.col("a") == F.col("b"))
        .agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            .cast("long")
            .alias("pe_n2")
        )
    )
    return (
        stats.crossJoin(F.broadcast(pe))
        .select(
            F.col("nn").alias("n_docs"),
            F.col("po_n").alias("n_agree"),
            F.when(
                F.col("nn") * F.col("nn") - F.col("pe_n2") > 0,
                F.round(
                    (F.col("po_n") * F.col("nn") - F.col("pe_n2")).cast("double")
                    / (F.col("nn") * F.col("nn") - F.col("pe_n2")),
                    6,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# q247 — day-over-day total variation distance of the event mix
# ---------------------------------------------------------------------------


@register(
    "q247_daily_tvd",
    """
    WITH de AS (
      -- coalesce: a NULL event_type must be a REAL category — the
      -- bare column would vanish from the numerator's equi-joins
      -- while still counting in the day totals (review finding)
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             coalesce(event_type, '(null)') AS event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    dt AS (SELECT d, CAST(sum(c) AS BIGINT) AS td FROM de GROUP BY d),
    days AS (SELECT d, row_number() OVER (ORDER BY d) AS i FROM dt),
    pairs AS (
      SELECT a.d AS day_from, b.d AS day_to, ta.td AS t1, tb.td AS t2
      FROM days a JOIN days b ON b.i = a.i + 1
      JOIN dt ta ON ta.d = a.d JOIN dt tb ON tb.d = b.d
    ),
    terms AS (
      SELECT p.day_from, p.day_to, p.t1, p.t2,
             CAST(sum(abs(coalesce(c1.c, 0) * p.t2
                          - coalesce(c2.c, 0) * p.t1)) AS BIGINT) AS num
      FROM pairs p
      CROSS JOIN (SELECT DISTINCT event_type FROM de) et
      LEFT JOIN de c1 ON c1.d = p.day_from AND c1.event_type = et.event_type
      LEFT JOIN de c2 ON c2.d = p.day_to AND c2.event_type = et.event_type
      GROUP BY 1, 2, 3, 4
    )
    SELECT day_from, day_to,
           round(CAST(num AS DOUBLE) / (2.0 * t1 * t2), 6) AS tvd
    FROM terms
    """,
)
def q247_daily_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total variation distance between consecutive days' event-type
    distributions: TVD = 0.5 * sum |p - q| computed as the exact
    integer numerator sum(|c1*t2 - c2*t1|) over the common
    denominator 2*t1*t2 — one IEEE division per day pair. A TVD spike
    is the release-regression tripwire (q117's KS watches a NUMERIC
    column drift; this watches the categorical mix).

    Scale: the (day, type) matrix is bounded; the dense day-pair x
    type grid is |days| x |types| — everything past the first
    aggregate is tiny; the lag pairing is an equi-join on day rank."""
    e = _t(spark, sf_dir, "events")
    de = (
        e.select(
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("d"),
            F.coalesce("event_type", F.lit("(null)")).alias("event_type"),
        )
        .groupBy("d", "event_type")
        .agg(F.count("*").cast("long").alias("c"))
    )
    dt = de.groupBy("d").agg(F.sum("c").cast("long").alias("td"))
    days = dt.select("d", F.row_number().over(Window.orderBy("d")).alias("i"))
    a = days.select(F.col("d").alias("day_from"), "i")
    bb = days.select(F.col("d").alias("day_to"), (F.col("i") - 1).alias("i"))
    t1 = dt.select(F.col("d").alias("day_from"), F.col("td").alias("t1"))
    t2 = dt.select(F.col("d").alias("day_to"), F.col("td").alias("t2"))
    pairs = a.join(bb, "i").join(t1, "day_from").join(t2, "day_to")
    et = de.select("event_type").distinct()
    c1 = de.select(
        F.col("d").alias("day_from"), "event_type", F.col("c").alias("c1")
    )
    c2 = de.select(F.col("d").alias("day_to"), "event_type", F.col("c").alias("c2"))
    terms = (
        pairs.crossJoin(F.broadcast(et))
        .join(c1, ["day_from", "event_type"], "left")
        .join(c2, ["day_to", "event_type"], "left")
        .groupBy("day_from", "day_to", "t1", "t2")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce("c1", F.lit(0)) * F.col("t2")
                    - F.coalesce("c2", F.lit(0)) * F.col("t1")
                )
            )
            .cast("long")
            .alias("num")
        )
    )
    return terms.select(
        "day_from",
        "day_to",
        F.round(
            F.col("num").cast("double") / (2.0 * F.col("t1") * F.col("t2")), 6
        ).alias("tvd"),
    )
