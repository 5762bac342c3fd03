"""Round-6 tranche 16: distribution-shape diagnostics (q243-q244).

- q243: Hill tail-index estimator (Hill 1975) of the document-length
  distribution — alpha ~2 means heavy-tailed lengths (a few huge
  docs dominate token budgets; chunking q75 and packing q68 policy
  depends on it); alpha >> 3 means thin tails.
- q244: Q-Q decile mapping between English and non-English document
  lengths — the distribution-alignment table behind length-normalized
  mixture planning (q215 tests WHETHER they differ; this says WHERE).

Determinism: q243's top-k order statistics depend only on VALUES
(boundary ties swap identical values), each ln term floor-scales to
1e-9 integers before the sum, and the final alpha is one guarded
IEEE division; q244 selects existing values by the tie-collapsed
cumulative rule (q200) — integer arithmetic until the final rounded
ratio.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's statistics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

_HILL_K_CAP = 100

# ---------------------------------------------------------------------------
# q243 — Hill tail-index estimator of document lengths
# ---------------------------------------------------------------------------


@register(
    "q243_hill_tail_index",
    f"""
    WITH x AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents
               WHERE n_chars > 0),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM x),
    -- nd // 10, NOT nd / 10: DuckDB's / is float division and the
    -- BIGINT cast ROUNDS (46/10 -> 5), while the Spark side floors —
    -- review-confirmed divergence at any doc count where they differ
    k AS (SELECT CAST(least({_HILL_K_CAP}, nd // 10) AS BIGINT) AS kk FROM n),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v DESC) AS r FROM x
    ),
    thr AS (SELECT v AS x_thr FROM ranked, k WHERE r = kk + 1),
    terms AS (
      SELECT CAST(floor(ln(CAST(ranked.v AS DOUBLE) / x_thr)
                        * 1000000000 + 0.5) AS BIGINT) AS t
      FROM ranked, k, thr WHERE r <= kk
    )
    SELECT (SELECT kk FROM k) AS k_used,
           (SELECT x_thr FROM thr) AS x_threshold,
           CASE WHEN (SELECT sum(t) FROM terms) > 0
                THEN round(CAST((SELECT kk FROM k) AS DOUBLE) * 1000000000
                           / (SELECT sum(t) FROM terms), 6)
                ELSE NULL END AS hill_alpha
    """,
)
def q243_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator over the top k = min(100, n/10) document
    lengths: alpha = k / sum(ln(x_(i) / x_(k+1))). Order statistics
    are value-deterministic under boundary ties; each log term
    floor-scales to 1e-9 before the sum; the division is guarded
    (all-equal tails sum to 0 -> NULL, the ANSI lesson).

    Scale: k is bounded, so Spark takes the top k+1 rows via
    orderBy+limit — TakeOrderedAndProject, a per-partition heap +
    k-row merge, never a global sort (the oracle's row_number spelling
    is the checkable form; n itself is one count, a bounded driver
    scalar by the selection.py contract)."""
    x = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0).select(
        F.col("n_chars").cast("long").alias("v")
    )
    nd = x.count()  # bounded scalar (selection.py contract)
    kk = int(min(_HILL_K_CAP, nd // 10))
    topk1 = x.orderBy(F.col("v").desc()).limit(kk + 1)
    thr = topk1.agg(F.min("v").alias("x_thr"))
    terms = (
        x.orderBy(F.col("v").desc())
        .limit(kk)
        .crossJoin(F.broadcast(thr))
        .select(
            F.floor(
                F.log(F.col("v").cast("double") / F.col("x_thr")) * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("st"))
    )
    return (
        terms.crossJoin(F.broadcast(thr))
        .select(
            F.lit(kk).cast("long").alias("k_used"),
            F.col("x_thr").alias("x_threshold"),
            F.when(
                F.col("st") > 0,
                F.round(F.lit(float(kk)) * 1000000000 / F.col("st"), 6),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("hill_alpha"),
        )
    )


# ---------------------------------------------------------------------------
# q244 — Q-Q decile mapping, English vs non-English lengths
# ---------------------------------------------------------------------------


@register(
    "q244_qq_deciles",
    """
    WITH g AS (
      SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS grp,
             CAST(n_chars AS BIGINT) AS v
      FROM documents
    ),
    byv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt FROM g
            GROUP BY grp, v),
    cum AS (
      SELECT grp, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_cum,
             CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n_g
      FROM byv
    ),
    dec(d) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)),
    q AS (
      SELECT grp, d, min(v) AS qv
      FROM cum JOIN dec ON 10 * c_cum >= d * n_g
      GROUP BY grp, d
    )
    SELECT a.d AS decile, a.qv AS q_en, b.qv AS q_other,
           round(CAST(a.qv AS DOUBLE) / b.qv, 6) AS qq_ratio
    FROM q a JOIN q b ON a.d = b.d AND a.grp = 'en' AND b.grp = 'other'
    """,
)
def q244_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q decile table of English vs non-English document lengths:
    each group's exact DISC deciles (smallest value whose cumulative
    count reaches d/10 — q200's tie-collapsed integer selection) side
    by side with their ratio. A flat ratio ~1 means one length policy
    fits both; a drifting ratio says length-normalize per lang before
    mixing (q87).

    Scale: one groupBy(grp, value) with map-side combine; the
    cumulative windows run over DISTINCT values per group (value-
    domain bounded, q215's argument); the decile table is 18 rows."""
    d = _t(spark, sf_dir, "documents")
    g = d.select(
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp"),
        F.col("n_chars").cast("long").alias("v"),
    )
    byv = g.groupBy("grp", "v").agg(F.count("*").cast("long").alias("cnt"))
    wc = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("grp")
    cum = byv.select(
        "grp",
        "v",
        F.sum("cnt").over(wc).cast("long").alias("c_cum"),
        F.sum("cnt").over(wall).cast("long").alias("n_g"),
    )
    dec = spark.range(1, 10).select(F.col("id").cast("int").alias("d"))
    q = (
        cum.join(F.broadcast(dec), 10 * F.col("c_cum") >= F.col("d") * F.col("n_g"))
        .groupBy("grp", "d")
        .agg(F.min("v").alias("qv"))
    )
    a = q.filter(F.col("grp") == "en").select(
        F.col("d").alias("decile"), F.col("qv").alias("q_en")
    )
    b = q.filter(F.col("grp") == "other").select(
        F.col("d").alias("db"), F.col("qv").alias("q_other")
    )
    return (
        a.join(b, F.col("decile") == F.col("db"))
        .select(
            "decile",
            "q_en",
            "q_other",
            F.round(F.col("q_en").cast("double") / F.col("q_other"), 6).alias(
                "qq_ratio"
            ),
        )
    )
