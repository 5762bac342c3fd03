"""Dataset profiling and event-sequence analytics.

Profiling (q79) is the "look at your data before training on it"
query every 100 TB pipeline runs first; the cohort/funnel/transition
trio (q80-q82) are the classic product-analytics shapes over the
`events` stream table, expressed so a single shuffle on `user_id`
carries each whole computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.queries.registry import register
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, count({c}) AS n_nonnull,"
    f" count(DISTINCT {c}) AS n_distinct, count(*) AS n_rows FROM customer"
    for c in _PROFILE_COLS
)


@register("q79_profile_columns", _PROFILE_ORACLE)
def q79_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of `customer`: per column, non-null
    count and exact distinct count, long-format output via
    stack()-unpivot of the one aggregate row.

    Scale: ONE scan + one aggregation computes all columns' stats
    (Catalyst plans the N exact count(distinct)s as a single Expand —
    rows x5, then one shuffle of partial aggregates); the unpivot is a
    driver-row-level projection. At 100 TB swap the exact distincts
    for approx_count_distinct to drop the Expand — the query shape is
    unchanged. The naive alternative (one query per column) scans the
    table N times."""
    c = _t(spark, sf_dir, "customer")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in _PROFILE_COLS:
        aggs.append(F.count(col).alias(f"nn_{col}"))
        aggs.append(F.count_distinct(F.col(col)).alias(f"nd_{col}"))
    one = c.agg(*aggs)
    stack = ", ".join(f"'{col}', nn_{col}, nd_{col}" for col in _PROFILE_COLS)
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack})"
            " AS (col_name, n_nonnull, n_distinct)"
        ),
        "n_rows",
    )


@register(
    "q80_cohort_retention",
    """
    WITH e AS (
      SELECT user_id, ts,
             min(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events
    )
    SELECT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
           CAST(date_trunc('week', ts)       AS DATE) AS active_week,
           CAST(date_diff('day', CAST(date_trunc('week', first_ts) AS DATE),
                                 CAST(date_trunc('week', ts) AS DATE)) / 7
                AS BIGINT)                             AS week_offset,
           count(DISTINCT user_id)                     AS n_active_users
    FROM e
    GROUP BY 1, 2, 3
    """,
)
def q80_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the ISO week of
    their first event, counted distinct in every week they were
    active.

    Scale: first-seen is a window min over user_id — ONE shuffle on
    the user key, no self-join back to the events table (the textbook
    formulation joins a firsts aggregate to the fact table: two
    shuffles of the big side). The final distinct-count agg shuffles
    only (cohort, week) pairs. week_offset stays in integer math
    (days/7 on week-truncated dates is exact)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    cohort = F.date_trunc("week", F.col("first_ts")).cast("date")
    active = F.date_trunc("week", F.col("ts")).cast("date")
    return (
        e.select("user_id", "ts")
        .withColumn("first_ts", F.min("ts").over(w))
        .select(
            cohort.alias("cohort_week"),
            active.alias("active_week"),
            "user_id",
        )
        .withColumn(
            "week_offset",
            (F.datediff("active_week", "cohort_week") / 7).cast("bigint"),
        )
        .groupBy("cohort_week", "active_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


_FUNNEL_WINDOW = (
    "(PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


@register(
    "q81_event_funnel",
    f"""
    WITH e1 AS (
      SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER {_FUNNEL_WINDOW} AS fv
      FROM events
    ), e2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
               OVER {_FUNNEL_WINDOW} AS fc
      FROM e1
    ), e3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
               OVER {_FUNNEL_WINDOW} AS fp
      FROM e2
    ), per_user AS (
      SELECT user_id, max(fv) AS fv, max(fc) AS fc, max(fp) AS fp
      FROM e3 GROUP BY user_id
    )
    SELECT count(fv) AS n_viewed,
           count(fc) AS n_clicked_after_view,
           count(fp) AS n_purchased_after_click
    FROM per_user
    """,
)
def q81_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view -> click -> purchase:
    a user converts a stage only with an event strictly AFTER their
    first event of the previous stage (not merely possessing all
    three types).

    Scale: the three dependent "first X after first Y" columns are
    running mins over the SAME window spec (user_id, ordered by ts) —
    Spark plans one Exchange + one Sort and stacks three Window
    operators on top, so the whole funnel costs a single shuffle of
    the events table plus a tiny per-user aggregate."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ts, typ = F.col("ts"), F.col("event_type")
    e1 = e.select("user_id", "ts", "event_type", "event_id").withColumn(
        "fv", F.min(F.when(typ == "view", ts)).over(w)
    )
    e2 = e1.withColumn(
        "fc", F.min(F.when((typ == "click") & (ts > F.col("fv")), ts)).over(w)
    )
    e3 = e2.withColumn(
        "fp", F.min(F.when((typ == "purchase") & (ts > F.col("fc")), ts)).over(w)
    )
    per_user = e3.groupBy("user_id").agg(
        F.max("fv").alias("fv"), F.max("fc").alias("fc"), F.max("fp").alias("fp")
    )
    return per_user.agg(
        F.count("fv").alias("n_viewed"),
        F.count("fc").alias("n_clicked_after_view"),
        F.count("fp").alias("n_purchased_after_click"),
    )


@register(
    "q82_event_transitions",
    """
    WITH pairs AS (
      SELECT event_type,
             lead(event_type) OVER w AS next_type,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type, next_type,
           count(*)    AS n_transitions,
           CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
    FROM pairs WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q82_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive
    event types per user, with the total dwell time (microseconds,
    exact integer — no float accumulation) per transition edge.

    Scale: lead() needs one shuffle+sort on user_id; the transition
    aggregate then map-side-combines to at most |types|^2 = 25 groups.
    Dwell time stays in i64 microseconds so the sum is associative and
    exact regardless of partitioning."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("gap_us"),
    )
    return (
        pairs.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(
            F.count("*").alias("n_transitions"),
            F.sum("gap_us").alias("sum_gap_us"),
        )
    )


@register(
    "q97_regression",
    """
    SELECT l_returnflag,
           count(*)                                            AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)   AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 3) AS icpt,
           round(regr_r2(l_extendedprice, l_quantity), 6)      AS r2,
           round(corr(l_extendedprice, l_quantity), 6)         AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 1)   AS covar_pq
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q97_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit of extendedprice on
    quantity via the SQL:2016 ``regr_*`` ordered-pair aggregates
    (slope, intercept, R^2) plus Pearson correlation and sample
    covariance — the drift/feature-correlation screen a curation
    pipeline runs per data source.

    Scale: every ``regr_*`` aggregate is a streaming moment
    accumulator (sum, sum-of-squares, co-moment) with partial+final
    combine, so one map-side-combined shuffle to |flags| = 3 groups
    carries the whole fit; no second pass, no collect. Rounding is
    magnitude-scaled (covar ~1e5 -> 1 dp) so the engines' different
    accumulation orders cannot flip a printed digit."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 3).alias("icpt"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.corr(y, x), 6).alias("corr_pq"),
        F.round(F.covar_samp(y, x), 1).alias("covar_pq"),
    )


@register(
    "q98_decile_stats",
    """
    WITH d AS (
      SELECT o_orderpriority, o_totalprice,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT o_orderpriority, decile,
           count(*)                   AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           CAST(floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) + 50)
                / 100.0) AS BIGINT) / 100.0 AS total
    FROM d
    GROUP BY o_orderpriority, decile
    """,
)
def q98_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning: per order-priority deciles of
    o_totalprice (ntile over a totally-ordered window — price ties
    broken by o_orderkey so tile assignment is deterministic), then
    per-bin count / bounds / integer-scaled exact total.

    Scale: the window partitions by priority, so the sort is
    per-partition, never global; a GLOBAL ntile would serialize on one
    task — at 100 TB you'd range-partition on the order column and
    add per-partition rank offsets with the two-phase scheme of
    ``operators/prefix_sum.py``. The money total uses the bulletproof
    integer-cents pipeline (see relational._money_sum_2dp)."""
    from file_appender_spark.queries.relational import _money_sum_2dp

    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    d = o.select(
        "o_orderpriority", "o_totalprice", F.ntile(10).over(w).alias("decile")
    )
    return d.groupBy("o_orderpriority", "decile").agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        _money_sum_2dp(F.col("o_totalprice")).alias("total"),
    )


@register(
    "q100_mad_outliers",
    """
    WITH med AS (
      SELECT c_mktsegment, median(c_acctbal) AS med
      FROM customer GROUP BY c_mktsegment
    ),
    dev AS (
      SELECT c.c_mktsegment, med.med,
             abs(c.c_acctbal - med.med) AS adev
      FROM customer c JOIN med USING (c_mktsegment)
    ),
    madt AS (
      SELECT c_mktsegment, median(adev) AS mad
      FROM dev GROUP BY c_mktsegment
    )
    SELECT d.c_mktsegment,
           count(*)             AS n,
           round(min(d.med), 4) AS med,
           round(min(m.mad), 4) AS mad,
           CAST(sum(CASE WHEN d.adev > 1.5 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out
    FROM dev d JOIN madt m USING (c_mktsegment)
    GROUP BY d.c_mktsegment
    """,
)
def q100_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per market segment: median absolute
    deviation (median-of-|x - median|) and the count of accounts
    deviating more than 1.5 * MAD. The 1.5 threshold is deliberate:
    acctbal is ~uniform, where max |dev| = 2 * MAD, so a 2x threshold
    would sit exactly on a float-equality boundary (cf. the q77
    z-score lesson) — 1.5 flags the top ~quarter robustly.

    Scale: two exact per-group medians (sort-based aggregate within
    each segment's partition) and two broadcast joins of the 5-row
    stats tables back onto the fact — no global sort, no self-join of
    the fact table against itself. Both engines interpolate the
    even-count median as lower + (upper-lower)*0.5 on identical
    doubles, and every emitted float is rounded magnitude-aware."""
    c = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    med = c.groupBy("c_mktsegment").agg(F.median("c_acctbal").alias("med"))
    dev = c.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment", "med", F.abs(F.col("c_acctbal") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("c_mktsegment").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("med"), 4).alias("med"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 1.5 * F.col("mad"), 1).otherwise(0)
            ).alias("n_out"),
        )
    )


@register(
    "q102_arrival_percentiles",
    """
    WITH pairs AS (
      SELECT event_type,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS gap_us
      FROM events
    )
    SELECT event_type,
           count(*)                    AS n,
           quantile_disc(gap_us, 0.5)  AS p50_us,
           quantile_disc(gap_us, 0.9)  AS p90_us,
           quantile_disc(gap_us, 0.99) AS p99_us
    FROM pairs
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def q102_arrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-latency profile of user activity: DISCRETE p50/p90/p99 of
    the inter-event arrival gap (microseconds, per preceding event
    type) — the SLO-style distribution summary a pipeline publishes
    about its own event streams.

    Discrete (percentile_disc / quantile_disc), not interpolated, by
    hard-won design: gaps reach ~2e11 us, where one double ulp is
    ~6e-5 — BIGGER than a 4 dp rounding granule, so the engines'
    differently-ordered interpolation arithmetic flipped a printed
    digit at sf0.1. A discrete percentile returns an actual element:
    exact i64, zero float arithmetic, deterministic at any magnitude
    (Spark emits it as DOUBLE, so we cast back to BIGINT; every gap
    is far under 2^53 so the cast is lossless).

    Scale: the lead() window and nothing else shuffles (one exchange
    on user_id, same spec as q82); the percentile aggregate's partial
    state is per-group, and at most |types| = 5 groups reach the
    final stage."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "event_type",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("gap_us"),
    )
    disc = (
        "cast(percentile_disc({p}) within group (order by gap_us) as bigint)"
        " as {alias}"
    )
    return (
        pairs.filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr(disc.format(p=0.5, alias="p50_us")),
            F.expr(disc.format(p=0.9, alias="p90_us")),
            F.expr(disc.format(p=0.99, alias="p99_us")),
        )
    )


@register(
    "q104_quality_report",
    """
    WITH base AS (
      SELECT count(*)                         AS n_rows,
             count(DISTINCT o_orderkey)       AS n_pk,
             count(o_totalprice)              AS n_price_nonnull,
             CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_price_nonpos,
             CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                             OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_date_oob
      FROM orders
    ),
    orph AS (
      SELECT count(*) AS n_fk_orphans
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    )
    SELECT base.*, orph.n_fk_orphans FROM base CROSS JOIN orph
    """,
)
def q104_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality report over `orders` (the Deequ-style
    pre-training gate): primary-key uniqueness (n_pk == n_rows),
    completeness, value bounds, date sanity, and referential
    integrity against `customer` — every count exact-integer, so the
    report is deterministic under any partitioning.

    Scale: the five constraint counters fuse into ONE scan's
    aggregate (conditional sums + a two-phase exact count-distinct);
    the FK check is a separate anti-join count whose build side is
    the customer key column only. Both results are single rows, so
    the final cross join is free."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_pk"),
        F.count("o_totalprice").alias("n_price_nonnull"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_price_nonpos"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01 00:00:00").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("1999-01-01 00:00:00").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        ).alias("n_date_oob"),
    )
    orphans = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_fk_orphans"))
    )
    return base.crossJoin(orphans)


@register(
    "q117_ks_drift",
    """
    WITH pooled AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS isa
      FROM orders
    ),
    tot AS (
      SELECT CAST(sum(isa) AS BIGINT) AS na,
             CAST(count(*) - sum(isa) AS BIGINT) AS nb
      FROM pooled
    ),
    by_x AS (
      SELECT x, CAST(sum(isa) AS BIGINT) AS a,
             CAST(count(*) - sum(isa) AS BIGINT) AS b
      FROM pooled GROUP BY x
    ),
    cdf AS (
      SELECT x,
             CAST(sum(a) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
             CAST(sum(b) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
      FROM by_x
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           round(max(abs(ca * 1.0 / t.na - cb * 1.0 / t.nb)), 6) AS ks_stat
    FROM cdf CROSS JOIN tot t
    GROUP BY t.na, t.nb
    """,
)
def q117_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the
    o_totalprice distributions before/after 1998 — the standard
    dataset-drift gate a training pipeline runs when a new data dump
    arrives (alongside q106's embedding-centroid drift).

    Scale: the exact KS needs the supremum over the pooled empirical
    CDFs, i.e. a global ordering. Here that is one window over the
    DISTINCT values (group first — |distinct| << |rows|); at 100 TB
    the same shape runs on a quantile-binned grid (percentile sketch
    per side, sup over the grid) — a bounded-error KS with no global
    sort, the documented scale twin."""
    o = _t(spark, sf_dir, "orders")
    pooled = o.select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .cast("long")
        .alias("isa"),
    )
    tot = pooled.agg(
        F.sum("isa").cast("bigint").alias("na"),
        (F.count("*") - F.sum("isa")).cast("bigint").alias("nb"),
    )
    by_x = pooled.groupBy("x").agg(
        F.sum("isa").cast("bigint").alias("a"),
        (F.count("*") - F.sum("isa")).cast("bigint").alias("b"),
    )
    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdf = by_x.select(
        "x",
        F.sum("a").over(w).cast("bigint").alias("ca"),
        F.sum("b").over(w).cast("bigint").alias("cb"),
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy(F.col("na").alias("n_a"), F.col("nb").alias("n_b"))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") * 1.0 / F.col("na")
                        - F.col("cb") * 1.0 / F.col("nb")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
    )


@register(
    "q128_anomaly_hours",
    """
    WITH hrs AS (
      SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS c
      FROM events WHERE user_id % 20 = 0
      GROUP BY 1, 2
    ),
    st AS (
      SELECT user_id, count(*) AS nh,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM hrs GROUP BY user_id
    ),
    thr AS (
      SELECT user_id, nh,
             s1 * 1.0 / nh AS mean_c,
             CASE WHEN nh > 1
                  THEN sqrt((s2 - s1 * 1.0 * s1 / nh) / (nh - 1))
                  ELSE 0.0 END AS sd_c
      FROM st
    )
    SELECT h.user_id,
           t.nh AS n_hours,
           CAST(sum(CASE WHEN h.c > round(t.mean_c + 2 * t.sd_c, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
    FROM hrs h JOIN thr t ON t.user_id = h.user_id
    GROUP BY h.user_id, t.nh
    """,
)
def q128_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-anomaly screen: hours whose event count
    exceeds that user's mean + 2 sigma over their observed hourly
    counts — the traffic-spike/bot-burst detector of the event
    analytics family (q77's z-outliers over values; this is over
    RATES).

    Determinism note: the variance is spelled as the explicit moment
    formula over EXACT integer sums (sum(c), sum(c*c) are bigint), so
    both engines derive the identical double threshold — the built-in
    stddev_samp accumulates in engine-specific order and could flip a
    knife-edge comparison. The threshold is rounded at 6 dp before
    the strict compare for the same reason.

    Scale: two shuffles on user_id (hour rollup, then the stats
    join-back), both map-side combined; the user filter stands in for
    the segment under investigation."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    hrs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    st = hrs.groupBy("user_id").agg(
        F.count("*").alias("nh"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    thr = st.select(
        "user_id",
        "nh",
        (F.col("s1") * 1.0 / F.col("nh")).alias("mean_c"),
        F.when(
            F.col("nh") > 1,
            F.sqrt(
                (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("nh"))
                / (F.col("nh") - 1)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("sd_c"),
    )
    return (
        hrs.join(thr, "user_id")
        .groupBy("user_id", F.col("nh").alias("n_hours"))
        .agg(
            F.sum(
                F.when(
                    F.col("c") > F.round(F.col("mean_c") + 2 * F.col("sd_c"), 6), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalous")
        )
    )


@register(
    "q130_correlation",
    """
    WITH j AS (
      SELECT c.c_nationkey AS nation, c.c_acctbal AS x, o.o_totalprice AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    m AS (
      SELECT nation, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM j GROUP BY nation
    )
    SELECT nation, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS pearson_r
    FROM m WHERE n > 1
    """,
)
def q130_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Pearson correlation between customer balance and
    order value, spelled as the explicit moment formula (q97's OLS
    family member) — the built-in corr() accumulates co-moments in
    engine-specific order, which can flip the 6th decimal between
    engines; raw power sums over the same doubles reduce identically
    here.

    Scale: one join shuffle, then map-side-combined power sums to
    |nations| groups — the single-pass streaming-moment shape."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    n = F.count("*")
    m = j.groupBy("nation").agg(
        n.alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = (m["n"] * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(m["n"] * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(m["n"] * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.filter(F.col("n") > 1).select(
        "nation",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(r, 6).alias("pearson_r"),
    )


@register(
    "q132_burstiness",
    """
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) // 1000000)
               - (epoch_us(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) // 1000000) AS g
      FROM events WHERE user_id % 25 = 0
    ),
    m AS (
      SELECT user_id, count(*) AS n,
             CAST(sum(g) AS BIGINT) AS s1,
             CAST(sum(g * g) AS BIGINT) AS s2
      FROM gaps WHERE g IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           round(s1 * 1.0 / n, 6) AS mean_gap_s,
           round(sqrt((s2 - s1 * 1.0 * s1 / n) / (n - 1)) / (s1 * 1.0 / n), 6)
             AS burstiness_cv
    FROM m WHERE n > 1 AND s1 > 0
    """,
)
def q132_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival burstiness: the coefficient of variation
    of the gaps between consecutive events (CV ~ 1 is Poisson-like,
    >> 1 is bursty bot/batch traffic, << 1 is metronomic) — the rate-
    regularity member of the event family (q102 does tail
    percentiles, q128 hourly spikes).

    Determinism: gaps are exact integer SECONDS, moments are exact
    integer sums (s2 of second-scale gaps stays far inside i64), and
    both engines derive the identical double CV — same discipline as
    q128."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    m = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("g").cast("bigint").alias("s1"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1") * 1.0 / F.col("n")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return m.filter((F.col("n") > 1) & (F.col("s1") > 0)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd / mean, 6).alias("burstiness_cv"),
    )


@register(
    "q133_monthly_bands",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           count(*) AS n_orders,
           quantile_disc(o_totalprice, 0.5)  AS p50,
           quantile_disc(o_totalprice, 0.9)  AS p90,
           quantile_disc(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY 1
    """,
)
def q133_monthly_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly p50/p90/p99 bands of order value — the SLO-style
    percentile report shape (q19 is global interpolated; these are
    per-group DISCRETE percentiles: actual data values, so the result
    is float-exact on both engines with no interpolation arithmetic).

    Scale: one shuffle on month; exact grouped percentiles sort
    within month partitions. At corpus scale the drop-ins are
    approx_percentile with a declared error bound, the KLL sketch
    rollup (operators/sketches.py) for mergeable cross-shard bands,
    or operators/selection.py's exact bisection when the answer must
    stay EXACT with no global sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p50"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p90"),
            F.expr(
                "percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p99"),
        )
    )


@register(
    "q134_attribution",
    """
    WITH fp AS (
      SELECT user_id, ts AS pt, event_id AS pid
      FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    prior AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type
      FROM events e JOIN fp ON fp.user_id = e.user_id
      WHERE (e.ts, e.event_id) < (fp.pt, fp.pid)
    ),
    ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_first,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM prior
    ),
    touches AS (
      SELECT f.user_id,
             coalesce(ff.event_type, 'direct') AS first_touch,
             coalesce(ll.event_type, 'direct') AS last_touch
      FROM fp f
      LEFT JOIN (SELECT user_id, event_type FROM ranked WHERE rn_first = 1) ff
        ON ff.user_id = f.user_id
      LEFT JOIN (SELECT user_id, event_type FROM ranked WHERE rn_last = 1) ll
        ON ll.user_id = f.user_id
    )
    SELECT first_touch, last_touch, count(*) AS n_users
    FROM touches GROUP BY 1, 2
    """,
)
def q134_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: for each
    user's FIRST purchase, which event type opened the journey and
    which immediately preceded the purchase (users whose first event
    IS the purchase attribute to 'direct') — the marketing-analytics
    staple over the same event stream as the funnel (q81).

    Scale: everything partitions by user_id — one shuffle carries the
    first-purchase window, the strictly-before filter (a struct
    tuple compare, no epoch arithmetic to overflow), and both
    touch windows."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("pt"), F.col("event_id").alias("pid"))
    )
    prior = ev.join(fp, "user_id").filter(
        F.struct("ts", "event_id") < F.struct(F.col("pt"), F.col("pid"))
    )
    wd = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = prior.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn_first"),
        F.row_number().over(wd).alias("rn_last"),
    )
    ff = ranked.filter(F.col("rn_first") == 1).select(
        "user_id", F.col("event_type").alias("ft")
    )
    ll = ranked.filter(F.col("rn_last") == 1).select(
        "user_id", F.col("event_type").alias("lt")
    )
    return (
        fp.select("user_id")
        .join(ff, "user_id", "left")
        .join(ll, "user_id", "left")
        .select(
            F.coalesce("ft", F.lit("direct")).alias("first_touch"),
            F.coalesce("lt", F.lit("direct")).alias("last_touch"),
        )
        .groupBy("first_touch", "last_touch")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "q138_weekly_conversion",
    """
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           count(DISTINCT user_id) AS n_active,
           count(DISTINCT CASE WHEN event_type = 'purchase'
                               THEN user_id END) AS n_purchasers,
           round(count(DISTINCT CASE WHEN event_type = 'purchase'
                                     THEN user_id END) * 1.0
                 / count(DISTINCT user_id), 6) AS conversion_rate
    FROM events
    GROUP BY 1
    """,
)
def q138_weekly_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly conversion trend: distinct purchasing users over
    distinct active users per calendar week — the time-series face of
    q81's one-shot funnel.

    Scale: one groupBy on the week with two distinct aggregates
    (Spark plans the multi-distinct via Expand — same shape as q79's
    profile); no joins, no windows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.count_distinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("n_purchasers"),
        )
        .select(
            "week",
            "n_active",
            "n_purchasers",
            F.round(
                F.col("n_purchasers") * 1.0 / F.col("n_active"), 6
            ).alias("conversion_rate"),
        )
    )


@register(
    "q142_chi_square",
    """
    WITH obs AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
    ),
    r AS (SELECT lang, sum(o) AS rl FROM obs GROUP BY 1),
    c AS (SELECT source, sum(o) AS cs FROM obs GROUP BY 1),
    t AS (SELECT sum(o) AS n FROM obs),
    m AS (
      SELECT r.lang, c.source, coalesce(obs.o, 0) AS o, r.rl, c.cs, t.n
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((o - rl * 1.0 * cs / n) * (o - rl * 1.0 * cs / n)
                     / (rl * 1.0 * cs / n)), 6) AS chi_square
    FROM m
    """,
)
def q142_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the (lang, source)
    contingency table — "is my language mix independent of the
    source?", the balance check run before q87's mixture rebalance
    decides what to up/down-sample. Expected counts from the
    marginals in the standard closed form, over the FULL lang x
    source cross product: empty cells contribute (0-E)^2/E = E, so
    skipping them (the observed-cells-only shortcut) biases the
    statistic low whenever any combination is absent.

    Determinism: observed counts are exact integers; the marginals
    are aggregates of the TINY contingency table (|langs| x
    |sources| cells), so both engines compute the identical doubles.
    Scale: one map-side-combined groupBy to the cell table; the
    cross product, join-back and final sum never touch raw rows."""
    d = _t(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rl = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    cs = obs.groupBy("source").agg(F.sum("o").alias("cs"))
    m = (
        rl.crossJoin(F.broadcast(cs))
        .join(obs, ["lang", "source"], "left")
        .na.fill({"o": 0})
        .withColumn("n", F.sum("o").over(W.partitionBy()))
    )
    e = F.col("rl") * 1.0 * F.col("cs") / F.col("n")
    return m.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
            "chi_square"
        ),
    )
