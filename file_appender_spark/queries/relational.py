"""Relational query inventory (SURVEY.md §2 Part B: scans, filters,
joins, aggregations, windows, sort/limit, set ops).

Every query is a (DataFrame plan, DuckDB oracle SQL) pair over the
driver tables. Scale notes are attached per query: these plans are
written for a 1000-executor cluster first — broadcast hints for dim
tables, partial aggregation everywhere, no collect() anywhere.

Determinism: float aggregates rounded to a declared precision on both
sides; window orderings are total (tie-break on a key column); DISTINCT
representatives picked by min/max, never "first seen".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.queries.registry import register
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)



# --- deterministic money arithmetic -----------------------------------------
# Double sums are order-dependent (a cent flipped at the 10x probe), and
# even double->DECIMAL conversion differs between engines near scale
# boundaries (Spark converts via the shortest decimal string, DuckDB via
# the exact binary expansion). The only fully cross-engine-deterministic
# pipeline is integer arithmetic: scale each value to exact 1e-4 units
# with floor(x*10000 + 0.5) (multiply/add/floor are IEEE ops that yield
# bit-identical doubles on every engine), sum the BIGINTs exactly, and
# round to cents with integer half-up. Sums stay far under 2^53, so every
# intermediate double is exact.


def _money_sum_2dp(col_expr):
    scaled = F.floor(col_expr * 10000 + F.lit(0.5)).cast("bigint")
    cents = F.floor((F.sum(scaled) + 50) / 100.0).cast("bigint")
    return cents / 100.0


def _money_avg_4dp(col_expr):
    scaled = F.floor(col_expr * 10000 + F.lit(0.5)).cast("bigint")
    units = F.floor(F.sum(scaled) / F.count(F.lit(1)) + 0.5).cast("bigint")
    return units / 10000.0


def _sql_money_sum_2dp(expr: str) -> str:
    return (
        f"CAST(floor((sum(CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT)) + 50)"
        " / 100.0) AS BIGINT) / 100.0"
    )


def _sql_money_avg_4dp(expr: str) -> str:
    return (
        f"CAST(floor(sum(CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT))"
        " / count(*) + 0.5) AS BIGINT) / 10000.0"
    )


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary (scan + pushdown filter + agg + sort)
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(floor((sum(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS sum_qty,
           CAST(floor((sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS sum_disc_price,
           CAST(floor((sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS sum_charge,
           CAST(floor(sum(CAST(floor((l_quantity) * 10000 + 0.5) AS BIGINT)) / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_qty,
           CAST(floor(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_price,
           CAST(floor(sum(CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)) / count(*) + 0.5) AS BIGINT) / 10000.0 AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Scale: filter + projection push into the parquet
    scan (PushedFilters in explain); aggregation is partial+final with
    only 4 groups, so the shuffle is tiny regardless of input size.

    Money/quantity aggregates use the integer-scaled pipeline (see
    _money_sum_2dp): per-row floor(x*1e4+0.5) is bit-identical on
    every engine, the BIGINT sum is exact under any partitioning, and
    cent-rounding happens in integer space — double sums of ~1e10
    flipped the last rounded cent at the 10x probe, and double→DECIMAL
    conversion itself differs between engines near scale boundaries
    (Spark converts via the shortest decimal string, DuckDB via the
    exact binary value)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum_2dp(F.col("l_quantity")).alias("sum_qty"),
            _money_sum_2dp(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum_2dp(disc_price).alias("sum_disc_price"),
            _money_sum_2dp(charge).alias("sum_charge"),
            _money_avg_4dp(F.col("l_quantity")).alias("avg_qty"),
            _money_avg_4dp(F.col("l_extendedprice")).alias("avg_price"),
            _money_avg_4dp(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q01b_selective_agg",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q01b_selective_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective predicate straight into the
    scan, then a single global aggregate — the plan is one map stage
    plus a 1-row reduce whatever the input size."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q01c_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(floor((sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q01c_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dims joined into the fact, grouped,
    global top-10 via TakeOrdered (no full sort)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _money_sum_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Filters / predicates / conditionals / casts
# --------------------------------------------------------------------------


@register(
    "q02_filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
      AND (o_orderkey % 2 = 0 OR o_totalprice > 25000)
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / LIKE / IS NULL / boolean combinators — all of
    these compile to Catalyst predicates and push into the scan."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 25000))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
    )


@register(
    "q03_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                          AS bal_band,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
           round(coalesce(c_acctbal, 0.0), 2)            AS bal
    FROM customer
    """,
)
def q03_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg"
        ),
        F.round(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal"),
    )


@register(
    "q04_cast",
    """
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT)               AS qty_int,
           CAST(l_linenumber AS DOUBLE)             AS line_dbl,
           CAST(l_returnflag AS VARCHAR)            AS flag_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q04_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across numeric / string / date / decimal.

    The DECIMAL(18,2) cast stays in the plan, but the column is emitted
    as its canonical string rendering on BOTH sides: round-1 driver
    correctness showed rows+schema green but hash red on the raw
    DECIMAL column — DECIMAL values round-trip through the comparison
    harness differently per engine (e.g. Decimal object vs float64),
    while the scale-2 string rendering ("123.40") is identical.
    Caveat (documented, not hit at sf0.01): double→DECIMAL conversion
    itself can differ at half-cent binary boundaries (Spark rounds the
    shortest-string rendering, DuckDB the exact binary value).
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_returnflag").cast("string").alias("flag_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("price_dec"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q05_join_inner",
    """
    SELECT n.n_name AS nation,
           CAST(floor((sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q05_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join (TPC-H Q5 shape). Scale: nation (25
    rows) is explicitly broadcast; lineitem⋈orders is the one real
    shuffle and AQE handles skew. Filter on o_orderdate prunes before
    the join.

    Money uses the integer-scaled pipeline (_money_sum_2dp): exact
    BIGINT accumulation under any partitioning — double sums of ~1e10
    flipped the last rounded cent between engines at the 10x probe
    scale (and would at 100 TB in any two runs)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _money_sum_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "q06_join_left",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q06_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count = 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "q07_join_right",
    """
    SELECT o.o_orderkey, c.c_name
    FROM customer c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_acctbal > 9000
    WHERE o.o_orderkey % 50 = 0
    """,
)
def q07_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with a join-side predicate (kept in ON, not
    WHERE — outer-join semantics differ and Catalyst must not push it
    below the join's null-supplying side)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (c.c_acctbal > 9000),
            "right",
        )
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "c_name")
    )


@register(
    "q08_join_full",
    """
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0)    AS n_cust,
           coalesce(n_supp, 0)    AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def q08_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "q09_join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q09_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q10_join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q10_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q11_join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q11_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (both broadcastable)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q12_join_range",
    """
    WITH bands(band, lo, hi) AS (VALUES ('xs', 0, 10), ('s', 10, 20),
                                        ('m', 20, 35), ('l', 35, 100))
    SELECT b.band, count(*) AS n_items, CAST(floor((sum(CAST(floor((l.l_extendedprice) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS band_price
    FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def q12_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: lineitem against quantity bands. Scale: the
    band table is tiny, so this is a broadcast-nested-loop with 4
    comparisons per row — the scalable way to do a band join."""
    li = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("xs", 0, 10), ("s", 10, 20), ("m", 20, 35), ("l", 35, 100)],
        "band string, lo int, hi int",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            _money_sum_2dp(F.col("l_extendedprice")).alias("band_price"),
        )
    )


@register(
    "q13_join_asof",
    """
    WITH deposits AS (
      SELECT user_id, ts, max(event_id) AS dep_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, d.dep_id AS last_purchase_id
    FROM clicks c ASOF LEFT JOIN deposits d
      ON c.user_id = d.user_id AND c.ts >= d.ts
    """,
)
def q13_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the latest purchase at-or-before it,
    per user. Implemented as the sort-merge union trick (SURVEY.md §2
    Part B joins row): tag both sides, union, one window sorted by
    (ts, side) per user, carry the last purchase id forward with
    last(ignorenulls). Scale: one shuffle on user_id, no range
    explosion, no per-group pandas — this is the 100 TB-safe as-of.
    Right side deduped to one row per (user, ts) for determinism."""
    ev = _t(spark, sf_dir, "events")
    deposits = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("dep_id"))
        .select("user_id", "ts", "dep_id", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("dep_id"),
            F.lit(1).alias("side"),
            "event_id",
        )
    )
    merged = deposits.unionByName(clicks)
    # right rows sort before left rows at equal ts => inclusive (ts >= ts)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        merged.withColumn("last_purchase_id", F.last("dep_id", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "last_purchase_id")
    )


# --------------------------------------------------------------------------
# TPC-H Q5/Q4 shapes: multiway join reordering + correlated EXISTS
# --------------------------------------------------------------------------


@register(
    "q83_local_supplier_volume",
    """
    SELECT n_name,
           CAST(floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q83_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the customer and the
    line's supplier share a nation inside one region — a six-table
    join with both equi keys and a cross-table filter.

    Scale: region/nation/supplier are dimension-sized at any SF —
    broadcast them so the only shuffles are the big-side
    lineitem<->orders and orders<->customer equi-joins (AQE reorders
    those and picks shuffled-hash vs sort-merge at runtime). The date
    filter lands in the orders scan (pushed down), shrinking the
    probe side before any join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _money_sum_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q84_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q84_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (in a quarter) having at least one line
    shipped after the order date, counted by priority — a correlated
    EXISTS with a non-equi component.

    Scale: expressed as a LEFT SEMI join on (l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate): the equi key drives the shuffle,
    the date comparison rides along as a residual condition, and the
    semi form never materializes the (order x lines) multiplicity —
    output cardinality is bounded by orders, not lineitem."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q92_lateral_topk",
    """
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    WHERE c.c_custkey % 50 = 0
    """,
)
def q92_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (each
    customer's two biggest orders) — the SQL spelling of per-group
    top-k.

    Scale: Catalyst decorrelates the lateral into a join + per-key
    limit instead of running one subquery per outer row; semantics
    and output match the window-function top-k (q25), and the total
    order (price DESC, then key) makes the cut deterministic."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_custkey % 50 = 0
        """
    )


@register(
    "q93_recursive_spine",
    """
    WITH RECURSIVE spine(week_start) AS (
      SELECT TIMESTAMP '2024-01-01'
      UNION ALL
      SELECT week_start + INTERVAL 7 DAY FROM spine
      WHERE week_start + INTERVAL 7 DAY <= TIMESTAMP '2024-03-04'
    )
    SELECT s.week_start, count(e.event_id) AS n_events
    FROM spine s
    LEFT JOIN events e ON date_trunc('week', e.ts) = s.week_start
    GROUP BY s.week_start
    """,
)
def q93_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4) generating a weekly date spine, LEFT
    JOINed to event counts so EMPTY weeks surface as zeros — the
    gaps-in-time-series report a bare GROUP BY cannot produce.

    Scale: the recursion materializes O(weeks) rows on the driver
    side of the plan (trivially small at any data scale) and the
    spine joins the fact table on an equi key (week truncation), so
    the fact side shuffles once; no per-week rescan."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE spine(week_start) AS (
          SELECT TIMESTAMP '2024-01-01'
          UNION ALL
          SELECT week_start + INTERVAL '7' DAY FROM spine
          WHERE week_start + INTERVAL '7' DAY <= TIMESTAMP '2024-03-04'
        )
        SELECT s.week_start, count(e.event_id) AS n_events
        FROM spine s
        LEFT JOIN events e ON date_trunc('week', e.ts) = s.week_start
        GROUP BY s.week_start
        """
    )


@register(
    "q105_share_of_total",
    f"""
    WITH nat AS (
      SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
             {_sql_money_sum_2dp('o.o_totalprice')} AS revenue
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT regionkey, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY regionkey), 6)
             AS share_region,
           round(revenue / sum(revenue) OVER (), 6) AS share_total
    FROM nat
    """,
)
def q105_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share within its region
    and of the grand total — the classic reporting-function shape.

    Scale-honest spelling: the shares are computed by windows over
    the ALREADY-AGGREGATED 25-row nation table, so the unpartitioned
    grand-total window touches 25 rows, not the fact table (windowing
    the raw join output would serialize billions of rows through one
    partition). Revenue itself uses the integer-scaled money pipeline,
    exact under any partitioning; the share denominators sum 25
    2dp-rounded doubles, so 6 dp rounding has ~1e-13 slack."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(_money_sum_2dp(F.col("o_totalprice")).alias("revenue"))
    )
    w_region = W.partitionBy("regionkey")
    w_all = W.partitionBy()
    return nat.select(
        "regionkey",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_region), 6).alias(
            "share_region"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_total"
        ),
    )


@register(
    "q110_asof_tolerance",
    """
    WITH deposits AS (
      SELECT user_id, ts, max(event_id) AS dep_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id,
           CASE WHEN d.ts >= c.ts - INTERVAL 1 HOUR THEN d.dep_id END
             AS recent_purchase_id
    FROM clicks c ASOF LEFT JOIN deposits d
      ON c.user_id = d.user_id AND c.ts >= d.ts
    """,
)
def q110_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest purchase
    at-or-before each click only counts when it happened within the
    last hour (merge_asof tolerance semantics — stale matches become
    nulls, rows are never dropped). Runs through the library operator
    (operators/asof.py::asof_join, tolerance="1 hour"): the matched
    right timestamp rides inside the carried payload struct, so the
    plan is STILL one user_id shuffle + one sort — tolerance adds a
    null-out projection, not a range join."""
    from file_appender_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    deposits = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("dep_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        clicks,
        deposits,
        on="user_id",
        ts="ts",
        value_cols=["dep_id"],
        tolerance="1 hour",
    ).select(
        "event_id", "user_id", F.col("dep_id").alias("recent_purchase_id")
    )
