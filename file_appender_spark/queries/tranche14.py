"""Round-6 tranche 14: forecasting + population-estimation operators
(q237-q240).

- q237: Holt's linear (double) exponential smoothing of daily event
  volume, alpha=1/2 beta=1/4 (Holt 1957) — level+trend state in
  exact micro-units with power-of-two steps, the forecasting
  primitive behind capacity dashboards. Sequential state like q202:
  Spark = ONE day-level HOF fold, oracle = recursive CTE — two
  independent sequential formulations.
- q238: MASE-style forecast-error comparison (Hyndman & Koehler
  2006): seasonal-naive (lag 7) vs naive (lag 1) absolute error on
  daily volume, exact integer sums — "is there weekly structure
  worth modeling", the decision input for q237/q210.
- q239: RFM segmentation (recency/frequency/monetary quintiles per
  user, deterministic tie-breaks) — the classic lifecycle grid.
- q240: capture-recapture vocabulary estimate (Chapman 1951): split
  the corpus into two deterministic "captures" (doc_id parity) and
  estimate the TOTAL distinct-8-gram population from the overlap —
  the crawl-planning "how much vocabulary exists that we have not
  seen" companion to q198's Heaps fit and q214's novelty curve.

Determinism: q237's state quantizes to integer micro-units at every
step with floor(x / 2.0) spelled IDENTICALLY on both engines
(power-of-two divisions of <2^52 magnitudes are exact in double, so
the floor is exact; integer `//`-vs-`div` would diverge on negative
trends — DuckDB floors, Spark truncates); q238/q240 are integer sums
with one guarded/rounded final expression; q239's quintiles order by
(metric, user_id) so ntile is reproducible.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's time-series and
corpus-statistics families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import _WS
from file_appender_spark.queries.mining import _gram_sql
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q237 — Holt linear smoothing of daily event volume
# ---------------------------------------------------------------------------


@register(
    "q237_holt_smoothing",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    ser AS (SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily),
    hw(i, l_micro, b_micro) AS (
      SELECT CAST(1 AS BIGINT), y * 1000000, CAST(0 AS BIGINT)
      FROM ser WHERE i = 1
      UNION ALL
      SELECT hw.i + 1,
             CAST(floor((ser.y * 1000000 + hw.l_micro + hw.b_micro) / 2.0)
                  AS BIGINT),
             hw.b_micro
               + CAST(floor((CAST(floor((ser.y * 1000000 + hw.l_micro
                                          + hw.b_micro) / 2.0) AS BIGINT)
                             - hw.l_micro - hw.b_micro) / 4.0) AS BIGINT)
      FROM hw JOIN ser ON ser.i = hw.i + 1
    )
    SELECT ser.d, ser.y,
           round(CAST(hw.l_micro AS DOUBLE) / 1000000, 6) AS level,
           round(CAST(hw.b_micro AS DOUBLE) / 1000000, 6) AS trend
    FROM hw JOIN ser ON ser.i = hw.i
    """,
)
def q237_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing over the daily series:
    l_t = (y_t + l_{t-1} + b_{t-1}) / 2, b_t = b_{t-1} + (l_t -
    l_{t-1} - b_{t-1}) / 4, state held in integer micro-units and
    re-quantized with an exact power-of-two floor at every step so
    both engines walk the identical integer lattice (floor(x/2.0) on
    both sides — integer // vs div would diverge on negative trend).

    Scale: the sequential state is DAY-level (bounded — 10 years =
    3.7k steps regardless of event volume), so one HOF fold over the
    sorted day array is the right plan, q202's argument; the daily
    aggregate itself combines map-side. Declared bound: micro-unit
    levels stay double-exact below 2^52 (~4.5e9 events/day)."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("y"))
    )
    g = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("a")
    )

    def half_floor(x):
        return F.floor(x / F.lit(2.0)).cast("long")

    def quarter_floor(x):
        return F.floor(x / F.lit(4.0)).cast("long")

    init = F.struct(
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"),
        F.lit(True).alias("first"),
        F.expr(
            "CAST(array() AS array<struct<d: bigint, y: bigint,"
            " l_micro: bigint, b_micro: bigint>>)"
        ).alias("out"),
    )

    def step(acc, s):
        y_micro = s["y"] * F.lit(1000000)
        l1 = F.when(acc["first"], y_micro).otherwise(
            half_floor(y_micro + acc["l"] + acc["b"])
        )
        b1 = F.when(acc["first"], F.lit(0).cast("long")).otherwise(
            acc["b"] + quarter_floor(l1 - acc["l"] - acc["b"])
        )
        rec = F.struct(
            s["d"].alias("d"),
            s["y"].alias("y"),
            l1.alias("l_micro"),
            b1.alias("b_micro"),
        )
        return F.struct(
            l1.alias("l"),
            b1.alias("b"),
            F.lit(False).alias("first"),
            F.concat(acc["out"], F.array(rec)).alias("out"),
        )

    folded = g.select(
        F.explode(F.aggregate(F.col("a"), init, step)["out"]).alias("r")
    )
    return folded.select(
        F.col("r.d").alias("d"),
        F.col("r.y").alias("y"),
        F.round(F.col("r.l_micro").cast("double") / 1000000, 6).alias("level"),
        F.round(F.col("r.b_micro").cast("double") / 1000000, 6).alias("trend"),
    )


# ---------------------------------------------------------------------------
# q238 — seasonal-naive vs naive forecast error (MASE form)
# ---------------------------------------------------------------------------


@register(
    "q238_forecast_error",
    """
    WITH daily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    ser AS (SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily),
    err AS (
      SELECT a.i,
             abs(a.y - n1.y) AS e_naive,
             abs(a.y - n7.y) AS e_seasonal
      FROM ser a JOIN ser n1 ON n1.i = a.i - 1
                 JOIN ser n7 ON n7.i = a.i - 7
    )
    SELECT CAST(count(*) AS BIGINT) AS n_evaluated,
           CAST(sum(e_naive) AS BIGINT) AS sae_naive,
           CAST(sum(e_seasonal) AS BIGINT) AS sae_seasonal,
           CASE WHEN sum(e_naive) > 0
                THEN round(CAST(sum(e_seasonal) AS DOUBLE) / sum(e_naive), 6)
                ELSE NULL END AS mase_seasonal_vs_naive
    FROM err
    """,
)
def q238_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is there weekly structure worth modeling? Compare the lag-7
    seasonal-naive forecast's absolute error against the lag-1 naive
    baseline on days where both exist (MASE's ratio form, Hyndman &
    Koehler 2006). Ratio < 1 = weekly seasonality is real — the
    go/no-go input for q237's smoothing and q210's ACF. Exact integer
    error sums, one guarded final division.

    Scale: day-level frame (bounded), two self-equi-joins on the day
    rank — everything past the daily aggregate is tiny."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("y"))
    )
    ser = daily.select(
        "y", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    a = ser.select(F.col("i"), F.col("y"))
    n1 = ser.select((F.col("i") + 1).alias("i"), F.col("y").alias("y1"))
    n7 = ser.select((F.col("i") + 7).alias("i"), F.col("y").alias("y7"))
    err = a.join(n1, "i").join(n7, "i").select(
        F.abs(F.col("y") - F.col("y1")).alias("e_naive"),
        F.abs(F.col("y") - F.col("y7")).alias("e_seasonal"),
    )
    agg = err.agg(
        F.count("*").cast("long").alias("n_evaluated"),
        F.sum("e_naive").cast("long").alias("sae_naive"),
        F.sum("e_seasonal").cast("long").alias("sae_seasonal"),
    )
    return agg.select(
        "n_evaluated",
        "sae_naive",
        "sae_seasonal",
        F.when(
            F.col("sae_naive") > 0,
            F.round(
                F.col("sae_seasonal").cast("double") / F.col("sae_naive"), 6
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("mase_seasonal_vs_naive"),
    )


# ---------------------------------------------------------------------------
# q239 — RFM segmentation
# ---------------------------------------------------------------------------


@register(
    "q239_rfm_segments",
    """
    WITH gmax AS (SELECT max(ts) AS gm FROM events),
    u AS (
      SELECT user_id,
             CAST(floor((epoch_us(gm) - epoch_us(max(ts))) / 86400000000)
                  AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events CROSS JOIN gmax GROUP BY user_id, gm
    ),
    q AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_q,
             ntile(5) OVER (ORDER BY frequency, user_id) AS f_q,
             ntile(5) OVER (ORDER BY monetary_cents, user_id) AS m_q
      FROM u
    )
    SELECT CAST(r_q AS BIGINT) AS r_quintile, CAST(f_q AS BIGINT) AS f_quintile,
           CAST(m_q AS BIGINT) AS m_quintile, CAST(count(*) AS BIGINT) AS n_users
    FROM q GROUP BY 1, 2, 3
    """,
)
def q239_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM lifecycle grid: recency/frequency/monetary quintiles per
    user (higher quintile = better on each axis — most recent, most
    frequent, highest spend), rolled up to segment counts. Quintile
    ordering tie-breaks by user_id, so ntile is deterministic; spend
    is cent-scaled exact.

    Scale: the user aggregate combines map-side; the three ntile
    windows run over the USER-level frame. A global ntile sort at
    billions of users would warrant the q150 two-phase range
    partition instead — declared, this is the dashboard form."""
    e = _t(spark, sf_dir, "events")
    gmax = e.agg(F.max("ts").alias("gm"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    u = (
        e.crossJoin(F.broadcast(gmax))
        .groupBy("user_id", "gm")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(cents).cast("long").alias("monetary_cents"),
        )
        .select(
            "user_id",
            F.floor(
                (F.unix_micros("gm") - F.unix_micros("last_ts"))
                / F.lit(86400000000)
            )
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    q = u.select(
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), F.col("user_id")))
        .cast("long")
        .alias("r_quintile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency"), F.col("user_id")))
        .cast("long")
        .alias("f_quintile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary_cents"), F.col("user_id")))
        .cast("long")
        .alias("m_quintile"),
    )
    return q.groupBy("r_quintile", "f_quintile", "m_quintile").agg(
        F.count("*").cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# q240 — capture-recapture vocabulary estimate (Chapman)
# ---------------------------------------------------------------------------

_CR_K = 8


@register(
    "q240_capture_recapture",
    f"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w
               FROM documents),
    g AS (
      SELECT DISTINCT doc_id % 2 AS cap,
             md5({_gram_sql(_CR_K)}) AS gr
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - {_CR_K - 2})) AS i
            FROM t WHERE len(w) >= {_CR_K})
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN cap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN cap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) - CAST(count(DISTINCT gr) AS BIGINT)
               AS m_both,
             CAST(count(DISTINCT gr) AS BIGINT) AS observed
      FROM g
    )
    SELECT n1, n2, m_both, observed,
           CAST(floor(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m_both + 1)
                      - 1 + 0.5) AS BIGINT) AS chapman_estimate
    FROM m
    """,
)
def q240_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much 8-gram vocabulary exists that the crawl has NOT seen:
    treat the doc_id-parity halves as two captures and apply the
    Chapman estimator N = (n1+1)(n2+1)/(m+1) - 1 (Chapman 1951) to
    the gram overlap — estimate >> observed means the corpus is far
    from vocabulary saturation (the inferential companion to q198's
    Heaps fit and q214's novelty curve). The +1 terms make the
    estimator defined even at zero overlap — no divide guard needed.

    Scale: grams travel as md5; ONE distinct over (capture, gram) +
    one aggregate whose distinct-count runs as the standard two-phase
    expand. No joins."""
    d = _t(spark, sf_dir, "documents")
    from file_appender_spark.operators.textstats import ngrams

    w = F.split("text", _WS)
    g = (
        d.filter(F.size(w) >= _CR_K)
        .select(
            (F.col("doc_id") % 2).alias("cap"),
            F.explode(F.transform(ngrams(w, _CR_K), F.md5)).alias("gr"),
        )
        .distinct()
    )
    m = g.agg(
        F.sum(F.when(F.col("cap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("cap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        (F.count("*") - F.countDistinct("gr")).cast("long").alias("m_both"),
        F.countDistinct("gr").cast("long").alias("observed"),
    )
    est = F.floor(
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        / (F.col("m_both") + 1)
        - 1
        + F.lit(0.5)
    ).cast("long")
    return m.select(
        "n1", "n2", "m_both", "observed", est.alias("chapman_estimate")
    )
