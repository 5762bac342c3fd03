"""Window-function inventory + sort/limit/top-k + set ops
(SURVEY.md §2 Part B). All window orderings are total: the tie-break
key makes every frame deterministic so the oracle hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.queries.registry import register
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q21_window_rank",
    """
    SELECT o_orderkey, o_custkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM orders
    WHERE o_custkey % 20 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q21_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a totally-ordered partition. Scale: one
    shuffle on the partition key; no global sort."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q22_window_offset",
    """
    SELECT event_id, user_id,
           lag(value, 1, -1.0)  OVER w AS prev_value,
           lead(value, 1, -1.0) OVER w AS next_value,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q22_window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults; first/last over explicit frames."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@register(
    "q23_window_running",
    """
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER w, 2)  AS running_qty,
           round(avg(l_extendedprice) OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                                             AS ma3_price,
           round(min(l_discount) OVER w, 2)  AS running_min_disc,
           round(max(l_tax) OVER w, 2)       AS running_max_tax,
           count(*) OVER w                   AS running_n
    FROM lineitem
    WHERE l_orderkey % 40 = 0
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q23_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates with rows frames incl. a moving average."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    # (l_orderkey, l_linenumber) is NOT unique in the driver data — the
    # running-frame ordering must be total, so it extends to every
    # aggregated column; fully-tied rows are then interchangeable and
    # the output multiset is deterministic.
    order_cols = ["l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    w = (
        W.partitionBy("l_orderkey")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w3 = W.partitionBy("l_orderkey").orderBy(*order_cols).rowsBetween(-2, 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        F.round(F.avg("l_extendedprice").over(w3), 4).alias("ma3_price"),
        F.round(F.min("l_discount").over(w), 2).alias("running_min_disc"),
        F.round(F.max("l_tax").over(w), 2).alias("running_max_tax"),
        F.count("*").over(w).alias("running_n"),
    )


@register(
    "q24_window_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    WHERE o_custkey % 25 = 0
    """,
)
def q24_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween frame over epoch seconds: trailing-30-day spend.
    Deterministic because range frames depend only on the order value."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@register(
    "q42_window_nth_ignore_nulls",
    """
    SELECT event_id, user_id,
           nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type,
           last_value(CASE WHEN value >= 100 THEN value END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_big_value
    FROM events
    WHERE user_id % 10 = 0
    """,
)
def q42_window_nth_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full frame and last_value with IGNORE NULLS
    (carry-forward of the most recent qualifying value — the standard
    fill-forward idiom)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w_full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    big = F.when(F.col("value") >= 100, F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.nth_value("event_type", 2).over(w_full).alias("second_type"),
        F.last(big, ignorenulls=True).over(w_run).alias("last_big_value"),
    )


@register(
    "q25_topk_per_group",
    """
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS bal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
)
def q25_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group = row_number + filter. Scale: Spark rewrites
    rank<=k filters into a per-partition top-k (WindowGroupLimit) so
    only k rows per key survive the shuffle."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q26_sort_limit",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q26_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100: Spark executes order-by-limit as TakeOrdered
    (per-partition top-k then merge on driver) — no global sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@register(
    "q27_sort_nulls",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
    FROM customer
    ORDER BY bal DESC NULLS FIRST, c_custkey
    LIMIT 200
    """,
)
def q27_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering (desc_nulls_first) + limit."""
    c = _t(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.round("c_acctbal", 2)
    )
    return (
        c.select("c_custkey", bal.alias("bal"))
        .orderBy(F.col("bal").desc_nulls_first(), F.col("c_custkey").asc())
        .limit(200)
    )


@register(
    "q28_set_ops",
    """
    WITH big_cust AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7000),
         buyers   AS (SELECT DISTINCT o_custkey AS k FROM orders),
         machine  AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY')
    SELECT 'union_all' AS op, count(*) AS n FROM (SELECT k FROM big_cust UNION ALL SELECT k FROM machine) t
    UNION ALL
    SELECT 'union_distinct', count(*) FROM (SELECT k FROM big_cust UNION SELECT k FROM machine) t
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT k FROM big_cust INTERSECT SELECT k FROM buyers) t
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT k FROM big_cust EXCEPT SELECT k FROM buyers) t
    UNION ALL
    SELECT 'intersect_all', count(*) FROM (SELECT k FROM big_cust INTERSECT ALL SELECT k FROM machine) t
    UNION ALL
    SELECT 'except_all', count(*) FROM (SELECT k FROM big_cust EXCEPT ALL SELECT k FROM machine) t
    """,
)
def q28_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / unionAll / intersect(All) / except(All) / distinct —
    result is op->cardinality so one query covers the family."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = c.filter(F.col("c_acctbal") > 7000).select(F.col("c_custkey").alias("k"))
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    machine = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("k")
    )

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        one("union_all", big.unionAll(machine))
        .unionByName(one("union_distinct", big.union(machine).distinct()))
        .unionByName(one("intersect", big.intersect(buyers)))
        .unionByName(one("except", big.exceptAll(buyers.distinct()).distinct()))
        .unionByName(one("intersect_all", big.intersectAll(machine)))
        .unionByName(one("except_all", big.exceptAll(machine)))
    )


@register(
    "q29_dedup_subset",
    """
    SELECT o_custkey, min(o_orderkey) AS first_order, count(*) AS n_dups
    FROM orders
    GROUP BY o_custkey
    """,
)
def q29_dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates(subset) semantics made deterministic: the kept
    representative is declared (min orderkey), never "first seen"
    (which depends on partition order at scale)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("first_order"), F.count("*").alias("n_dups")
    )


@register(
    "q137_running_distinct",
    """
    SELECT user_id, ts, event_id,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS n_types_seen
    FROM events
    WHERE user_id % 25 = 0
    """,
)
def q137_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — a semantic Spark's
    window functions DO NOT support directly (DISTINCT aggregates are
    rejected in windows). Re-expressed Spark-first: a row is the
    FIRST occurrence of its (user, event_type) iff row_number over
    that pair is 1; the running distinct count is then a plain
    running SUM of first-occurrence flags over the same (ts,
    event_id) order. The oracle states the intended semantics
    verbatim (DuckDB supports windowed DISTINCT), so the emulation is
    hash-checked against the real thing.

    Scale: two windows on the SAME user_id partitioning (one
    sub-partitioned by type) — one shuffle total, no joins."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn(
            "_is_first", (F.row_number().over(w_first) == 1).cast("long")
        )
        .withColumn("n_types_seen", F.sum("_is_first").over(w_run))
        .select("user_id", "ts", "event_id", "n_types_seen")
    )


@register(
    "q139_rank_fractions",
    """
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           ntile(4) OVER w AS quartile
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q139_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fractional-rank window family (percent_rank, cume_dist,
    ntile) in one pass over a single sort — completing the window
    inventory next to q21-q24's rank/offset/frame rows.

    Scale: one shuffle on the partition key; all three functions share
    the same window sort (SQL WINDOW clause / identical WindowSpec),
    so the plan has exactly one Window operator."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
