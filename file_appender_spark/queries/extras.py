"""Subqueries and event-time operators in batch form: correlated
scalar subquery, sessionization, tumbling window, session window —
the batch twins of the streaming suite (SURVEY.md §2 Part B
streaming-only rows get their deterministic oracle HERE; the
streaming execution of the same logic is tested Spark-native in
tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.operators.sessionize import sessionize
from file_appender_spark.queries.registry import register
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q36_scalar_subquery",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS bal
    FROM customer c
    WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 2) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q36_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their nation's mean
    balance). Catalyst decorrelates this into an aggregate + join —
    same plan you would write by hand."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM customer c
        WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 2) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "q37_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx,
           count(*)                 AS n_events,
           min(ts)                  AS t_start,
           max(ts)                  AS t_end,
           round(sum(value), 2)     AS total_value
    FROM sessioned
    GROUP BY user_id, session_idx
    """,
)
def q37_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) with per-session aggregates —
    lag + flag + running-sum, one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q38_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q38_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window in batch (the streaming twin
    runs in tests/test_streaming.py with a watermark)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q40_sliding_window",
    """
    WITH starts AS (
      SELECT event_id, event_type, value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start
      FROM events
    )
    SELECT window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM starts
    GROUP BY window_start, event_type
    """,
)
def q40_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide) in batch: every event
    belongs to exactly 2 windows. The oracle reproduces Spark's window
    assignment by unnesting both candidate starts per event."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q39_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             -- session_window MERGES events exactly gap apart
             -- (empirically verified on this Spark version: two events
             -- 1800s apart yield one session), so new-session is the
             -- STRICT inequality, microsecond-precise
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS s_idx
      FROM flagged
    )
    SELECT user_id,
           min(ts)                                   AS session_start,
           max(ts) + INTERVAL '30 minutes'           AS session_end,
           count(*)                                  AS n_events
    FROM sessioned
    GROUP BY user_id, s_idx
    """,
)
def q39_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window in batch mode: sessions merge events
    closer than the 30-min gap; end = last event + gap (matching the
    oracle's lag/cumsum formulation)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q77_group_outliers",
    """
    WITH stats AS (
      SELECT p_partkey, p_type, p_retailprice,
             round((p_retailprice - avg(p_retailprice) OVER (PARTITION BY p_type))
                   / stddev_samp(p_retailprice) OVER (PARTITION BY p_type), 6) AS z
      FROM part
    )
    SELECT p_partkey, p_type, p_retailprice, z
    FROM stats WHERE abs(z) > 1.5
    """,
)
def q77_group_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 1.5 on the ROUNDED
    score, so the cut is engine-identical): parts priced far from
    their type's mean. (Prices are ~uniform per type, so max |z| is
    about sqrt(3) — a 2.0 cut would never fire on this data.)

    Scale: two window aggregates over the same partition spec fuse
    into ONE Window exec — a single shuffle on the group key; the
    filter is a narrow post-projection. The classic alternative
    (groupBy stats + self-join back) costs a second shuffle."""
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_type")
    z = F.round(
        (F.col("p_retailprice") - F.avg("p_retailprice").over(w))
        / F.stddev_samp("p_retailprice").over(w),
        6,
    )
    return (
        p.select("p_partkey", "p_type", "p_retailprice", z.alias("z"))
        .filter(F.abs(F.col("z")) > 1.5)
    )


@register(
    "q78_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
           count(*)                                    AS n_orders,
           round(min(o_totalprice), 2)                 AS lo,
           round(max(o_totalprice), 2)                 AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q78_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (25k-wide bins) with
    per-bin extrema — the one-pass profiling query behind data
    dashboards.

    Scale: bin assignment is a stateless projection; the agg
    map-side-combines to ~20 groups, so the shuffle is tiny no matter
    the row count. Bin ids use floor + bigint cast (never float
    division on huge ids)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "q96_session_paths",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_idx,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sessioned
      GROUP BY user_id, session_idx
    )
    SELECT path, count(*) AS n_sessions
    FROM paths
    GROUP BY path
    HAVING count(*) >= 5
    """,
)
def q96_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: each session becomes its ordered
    event-type string ("view>click>purchase"), then paths occurring
    >= 5 times are counted — the how-do-users-actually-navigate
    query behind every funnel redesign.

    Scale: sessionization and the per-session LISTAGG share the same
    user_id partitioning (one shuffle of events); the path-frequency
    aggregate then map-side-combines — distinct paths, not sessions,
    cross the second (tiny) exchange. The WITHIN GROUP ordering is
    total (ts, event_id), so every engine builds the same string."""
    ev = _t(spark, sf_dir, "events")
    s = sessionize(
        ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id"
    )
    s.createOrReplaceTempView("sessioned_events")
    paths = spark.sql(
        """
        SELECT user_id, session_idx,
               listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id) AS path
        FROM sessioned_events
        GROUP BY user_id, session_idx
        """
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


@register(
    "q103_union_by_name",
    """
    WITH u AS (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL BY NAME
      SELECT c_custkey, c_acctbal, c_mktsegment, c_nationkey
      FROM customer WHERE c_custkey % 2 = 1
    )
    SELECT coalesce(c_mktsegment, 'legacy') AS segment,
           count(*)                 AS n,
           count(c_name)            AS n_name,
           count(c_nationkey)       AS n_nation,
           round(sum(c_acctbal), 2) AS bal
    FROM u GROUP BY coalesce(c_mktsegment, 'legacy')
    """,
)
def q103_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: two snapshots of the same table with
    different column sets combine by NAME (missing columns become
    NULL), then aggregate across the seam — the read-side half of
    schema evolution, where a 100 TB lake always holds files written
    under several historical schemas (the write-side mergeSchema
    twin is tested in test_sources_sinks.py).

    Scale: unionByName is a zero-shuffle plan union — each side keeps
    its own scan and the null-padding is a projection; only the final
    aggregate exchanges."""
    c = _t(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    new = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_acctbal", "c_mktsegment", "c_nationkey"
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy(
        F.coalesce("c_mktsegment", F.lit("legacy")).alias("segment")
    ).agg(
        F.count("*").alias("n"),
        F.count("c_name").alias("n_name"),
        F.count("c_nationkey").alias("n_nation"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
    )


@register(
    "q108_gap_fill",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hourly),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM bounds
    ),
    grid AS (
      SELECT t.event_type, s.hr
      FROM (SELECT DISTINCT event_type FROM hourly) t CROSS JOIN spine s
    )
    SELECT g.event_type, g.hr,
           coalesce(h.n, 0) AS n_events,
           CAST(sum(coalesce(h.n, 0)) OVER (
             PARTITION BY g.event_type ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_events
    FROM grid g LEFT JOIN hourly h USING (event_type, hr)
    """,
)
def q108_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a generated calendar spine (sequence +
    explode) crossed with the observed dimension values, left-joined
    to the hourly aggregate so missing hours appear as explicit zero
    rows, plus a per-type running total over the now-dense series —
    the densification step every downstream charting/forecasting
    consumer needs.

    Scale: the fact aggregates FIRST (hourly is |types| x |hours|
    rows); the spine is generated from a 1-row bounds aggregate
    (broadcast), the grid is dims x hours (small by construction), and
    the left join + window run over the aggregate, never the raw
    fact. The raw scan is touched exactly once."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr")
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .withColumn("cum_events", F.sum("n_events").over(w).cast("bigint"))
    )


@register(
    "q140_dataset_diff",
    """
    WITH old AS (
      SELECT doc_id, lang, source, n_chars FROM documents
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang,
             source,
             n_chars + CASE WHEN doc_id % 13 = 0 THEN 5 ELSE 0 END AS n_chars
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 1000000, lang, source, n_chars
      FROM documents WHERE doc_id % 23 = 0
    ),
    j AS (
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             o.doc_id IS NULL AS is_added,
             n.doc_id IS NULL AS is_removed,
             (o.lang IS DISTINCT FROM n.lang) AS c_lang,
             (o.n_chars IS DISTINCT FROM n.n_chars) AS c_n_chars,
             (o.source IS DISTINCT FROM n.source) AS c_source
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT doc_id,
           CASE WHEN is_added THEN 'added'
                WHEN is_removed THEN 'removed'
                ELSE 'changed' END AS change_type,
           coalesce(array_to_string(
             CASE WHEN is_added OR is_removed THEN CAST([] AS VARCHAR[])
                  ELSE list_filter(
                         [CASE WHEN c_lang THEN 'lang' END,
                          CASE WHEN c_n_chars THEN 'n_chars' END,
                          CASE WHEN c_source THEN 'source' END],
                         x -> x IS NOT NULL)
             END, ','), '') AS changed_cols
    FROM j
    WHERE is_added OR is_removed OR c_lang OR c_n_chars OR c_source
    """,
)
def q140_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level dataset reconciliation (operators/datadiff.py
    ``table_diff``): the "new dump" is derived deterministically from
    the documents table in-query (deletions: doc_id % 17; mutations:
    lang for % 11, n_chars for % 13; additions: shifted ids for
    % 23), so the full added/removed/changed report — including the
    per-key changed-column list — is oracle-checkable.

    The changed-column list is flattened to a comma-joined STRING in
    the query projection (array_join here, array_to_string in the
    oracle): array-typed output columns crash the driver's pandas
    canonicalizer (r3 verdict), and the element order is already
    deterministic (table_diff enumerates value columns sorted).

    Scale: one full-outer shuffle join on the key; output bounded by
    true change volume (unchanged keys emit nothing)."""
    from file_appender_spark.operators.datadiff import table_diff

    d = _t(spark, sf_dir, "documents")
    old = d.select("doc_id", "lang", "source", "n_chars")
    new = (
        d.filter(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 11 == 0, "xx").otherwise(F.col("lang")).alias(
                "lang"
            ),
            "source",
            (
                F.col("n_chars")
                + F.when(F.col("doc_id") % 13 == 0, 5).otherwise(0)
            ).alias("n_chars"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 23 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                "lang",
                "source",
                "n_chars",
            )
        )
    )
    return table_diff(old, new, ["doc_id"]).withColumn(
        "changed_cols", F.array_join("changed_cols", ",")
    )


@register(
    "q141_debounce",
    """
    WITH g AS (
      SELECT user_id, event_type, ts, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id, event_type, count(*) AS n_kept
    FROM g
    WHERE gap_us IS NULL OR gap_us > 5000000
    GROUP BY user_id, event_type
    HAVING count(*) > 1
    """,
)
def q141_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce dedup: drop events repeating the same (user, type)
    within 5 seconds of the previous occurrence — the double-click /
    retry-storm suppressor that runs before event analytics (q29
    dedups exact duplicates; this dedups by TIME proximity).
    Microsecond-exact integer gap comparison, so both engines keep
    identical rows.

    Scale: one window on the (user_id, event_type) partitioning and a
    stateless filter — the streaming twin is dropDuplicates within a
    watermark over the same key (tests/test_streaming.py)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "event_type",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    return (
        g.filter(F.col("gap_us").isNull() | (F.col("gap_us") > 5_000_000))
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_kept"))
        .filter(F.col("n_kept") > 1)
    )
