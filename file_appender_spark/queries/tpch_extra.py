"""TPC-H optimizer-shape tranche (round 5) — the classic Catalyst
stress tests the inventory did not yet cover, adapted to the driver
schema (no partsupp / shipmode / commitdate columns, so Q2/Q11/Q12/
Q16/Q20/Q21 have no faithful adaptation — they landed in round 6 as
declared SHAPE adaptations, tranche7.py q203-q208; Q1/Q3/Q4/Q5/Q6
shapes landed in rounds 1-3 as q01/q01b/q01c/q83/q84):

- q168 (Q10 shape): returned-item revenue per customer — 3-way fact
  join + broadcast dim, quarter predicate pushed to both scans.
- q169 (Q14 shape): promo revenue share — conditional aggregation
  over a month window, single-row ratio.
- q170 (Q15 shape): top supplier(s) by quarter revenue — aggregate,
  then keep the argmax rows via a broadcast scalar subquery.
- q171 (Q17 shape): small-quantity revenue — correlated per-part
  average decorrelated into a pre-aggregate + join, integer-exact
  `5*qty*cnt < sum` form of `qty < 0.2*avg`.
- q172 (Q18 shape): large-volume orders — HAVING on a fact
  pre-aggregate, then semi-shaped join back to orders/customer.
- q173 (Q19 shape): disjunctive brand/size/quantity predicates —
  OR-of-conjunctions that must not block partial pushdown.
- q174 (Q22 shape): positive-balance customers above the global
  average with no orders — scalar subquery + anti join.

All money/quantity aggregates use relational.py's integer-scaled
deterministic pipeline (see the `_money_*` helpers there for why
double sums cannot be hash-compared across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.registry import register
from file_appender_spark.queries.relational import (
    _money_avg_4dp,
    _money_sum_2dp,
    _sql_money_avg_4dp,
    _sql_money_sum_2dp,
)
from file_appender_spark.sources.catalog import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev_col():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# q168 — TPC-H Q10: returned-item revenue per customer
# --------------------------------------------------------------------------


@register(
    "q168_returned_item_revenue",
    f"""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           {_sql_money_sum_2dp(_REV)} AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    """,
)
def q168_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    quarter. Two fact tables joined on their keys, two dimension
    attaches, quarter + returnflag predicates.

    Scale: the o_orderdate range and l_returnflag='R' both push into
    the parquet scans BEFORE the join (PushedFilters), so the
    orders↔lineitem shuffle carries one quarter of one flag, not the
    fact tables; nation (25 rows) broadcasts; customer joins
    post-aggregation size, not fact size."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-04-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-07-01 00:00:00"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            _money_sum_2dp(_rev_col()).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue", "n_items")
    )


# --------------------------------------------------------------------------
# q169 — TPC-H Q14: promo revenue share
# --------------------------------------------------------------------------

_SCALED_REV = f"CAST(floor(({_REV}) * 10000 + 0.5) AS BIGINT)"


@register(
    "q169_promo_revenue_share",
    f"""
    WITH j AS (
      SELECT p_type, {_SCALED_REV} AS sr
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    )
    SELECT
      CAST(floor((sum(CASE WHEN p_type = 'PROMO' THEN sr ELSE 0 END) + 50) / 100.0) AS BIGINT) / 100.0 AS promo_revenue,
      CAST(floor((sum(sr) + 50) / 100.0) AS BIGINT) / 100.0 AS total_revenue,
      CAST(floor(100.0 * (CAST(sum(CASE WHEN p_type = 'PROMO' THEN sr ELSE 0 END) AS DOUBLE)
                          / sum(sr)) * 10000 + 0.5) AS BIGINT) / 10000.0 AS promo_pct
    FROM j
    """,
)
def q169_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue that came from
    promotional parts — conditional aggregation after a fact↔dim join,
    reduced to a single ratio row.

    Determinism: both sums stay integer-scaled; the ratio is ONE
    double division of two exact integers (< 2^53) followed by the
    floor-based 4dp round, bit-identical on both engines.

    Scale: the month predicate pushes into the lineitem scan; part
    joins broadcast (dim); the aggregate is a two-cell partial+final
    — no step depends on fact cardinality beyond the scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    p = _t(spark, sf_dir, "part")
    sr = F.floor(_rev_col() * 10000 + F.lit(0.5)).cast("bigint")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        "p_type", sr.alias("sr")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("sr")).otherwise(F.lit(0)))
    total = F.sum("sr")
    return j.agg(
        (F.floor((promo + 50) / 100.0).cast("bigint") / 100.0).alias("promo_revenue"),
        (F.floor((total + 50) / 100.0).cast("bigint") / 100.0).alias("total_revenue"),
        (
            F.floor(100.0 * (promo.cast("double") / total) * 10000 + F.lit(0.5)).cast(
                "bigint"
            )
            / 10000.0
        ).alias("promo_pct"),
    )


# --------------------------------------------------------------------------
# q170 — TPC-H Q15: top supplier(s) by quarter revenue
# --------------------------------------------------------------------------


@register(
    "q170_top_supplier",
    f"""
    WITH r AS (
      SELECT l_suppkey AS suppkey, {_sql_money_sum_2dp(_REV)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN r ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM r)
    """,
)
def q170_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarter revenue equals
    the maximum quarter revenue (the original's view + scalar-subquery
    form; ties all survive, which is why this is not a LIMIT 1).

    Determinism: revenue values are integer-scaled cents, so the
    equality against the max is exact — no float-equality hazard.

    Scale: the per-supplier aggregate is one partial+final shuffle on
    a supplier-cardinality key; the max is a 1-row broadcast join, and
    supplier attaches by broadcast — the fact table is scanned once."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = _t(spark, sf_dir, "supplier")
    r = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        _money_sum_2dp(_rev_col()).alias("total_revenue")
    )
    mx = r.agg(F.max("total_revenue").alias("mx"))
    return (
        r.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q171 — TPC-H Q17: small-quantity-order revenue
# --------------------------------------------------------------------------


@register(
    "q171_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT
      count(*) AS n_small,
      CAST(floor((sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS small_revenue,
      CAST(floor(CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 700.0 + 0.5) AS BIGINT) / 100.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pk = l_partkey
    WHERE p_brand = 'Brand#1'
      AND 5 * CAST(floor(l_quantity + 0.5) AS BIGINT) * cnt < sum_qty
    """,
)
def q171_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders for one
    brand — the classic correlated `l_quantity < 0.2 * avg(per part)`
    subquery, decorrelated into a per-part pre-aggregate joined back.

    Determinism: quantities are integral, so `qty < 0.2*avg` is the
    EXACT integer inequality `5*qty*cnt < sum` — no float threshold;
    `avg_yearly` divides an exact integer by 7 once.

    Scale: the pre-aggregate shuffles on l_partkey with map-side
    combine; the join back is partkey↔partkey (co-partitioned by AQE);
    part filtered to one brand broadcasts. Nothing is per-pair."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.floor(F.sum("l_quantity") + 0.5).cast("bigint").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    qty = F.floor(F.col("l_quantity") + 0.5).cast("bigint")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(5 * qty * F.col("cnt") < F.col("sum_qty"))
    )
    scaled = F.sum(F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast("bigint"))
    return j.agg(
        F.count("*").alias("n_small"),
        (F.floor((scaled + 50) / 100.0).cast("bigint") / 100.0).alias("small_revenue"),
        (
            F.floor(scaled.cast("double") / 700.0 + F.lit(0.5)).cast("bigint") / 100.0
        ).alias("avg_yearly"),
    )


# --------------------------------------------------------------------------
# q172 — TPC-H Q18: large-volume orders
# --------------------------------------------------------------------------


@register(
    "q172_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey AS ok,
             CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = ok
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q172_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds 250
    (top ~1% of orders), with their customer — the HAVING-subquery-IN
    form expressed as aggregate → join, which is what a decorrelator
    produces.

    Scale: the quantity rollup shuffles once on l_orderkey (map-side
    combine collapses each order's ≤7 lines early); the HAVING cuts
    ~99% of groups BEFORE the joins, so orders/customer join against
    the small survivor set — broadcast-eligible under AQE."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.floor(F.sum("l_quantity") + 0.5).cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("ok"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# q173 — TPC-H Q19: disjunctive predicate revenue
# --------------------------------------------------------------------------

_Q19_PRED = """(
         (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1  AND 11)
      OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
    )"""


@register(
    "q173_disjunctive_revenue",
    f"""
    SELECT count(*) AS n_items,
           {_sql_money_sum_2dp(_REV)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_PRED}
    """,
)
def q173_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/
    quantity conjunctions — the optimizer test for disjunctive
    predicates (a naive planner evaluates the OR only after a full
    join; a good one pushes the per-side residuals: the brand/size
    disjunction prunes part, the quantity range prunes lineitem).

    Scale: part pre-filtered by `OR(brand..)` broadcasts; lineitem
    pre-filtered by the quantity envelope [1,30] before the join; the
    exact 3-way conjunction applies as the join residual."""
    p = _t(spark, sf_dir, "part").filter(
        F.expr(
            "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10)"
            " OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20)"
            " OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 30)"
        )
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.expr("l_quantity BETWEEN 1 AND 30"))
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).filter(
        F.expr(_Q19_PRED)
    )
    return j.agg(
        F.count("*").alias("n_items"),
        _money_sum_2dp(_rev_col()).alias("revenue"),
    )


# --------------------------------------------------------------------------
# q174 — TPC-H Q22: rich customers with no orders
# --------------------------------------------------------------------------


@register(
    "q174_idle_rich_customers",
    f"""
    WITH avg_bal AS (
      SELECT {_sql_money_avg_4dp('c_acctbal')} AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           {_sql_money_sum_2dp('c_acctbal')} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q174_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (churn-adapted): customers with
    above-average positive balance and NO order since 2000-01-01,
    rolled up per nation — scalar aggregate subquery + NOT EXISTS
    anti join. (The literal "never ordered" form is empty on the
    driver corpus — every customer has orders — so the recency form
    keeps the anti join non-trivial while preserving the plan shape.)

    Determinism: the average is the integer-scaled 4dp form, so the
    `>` threshold is a comparison against an exact 1e-4 grid value.

    Scale: the scalar average is a 1-row broadcast; the anti join
    needs only o_custkey (column pruning cuts orders to one column
    pre-shuffle); the final rollup has nation cardinality."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(
        _money_avg_4dp(F.col("c_acctbal")).alias("ab")
    )
    rich = c.join(F.broadcast(ab)).filter(F.col("c_acctbal") > F.col("ab"))
    recent = o.filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
    idle = rich.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        _money_sum_2dp(F.col("c_acctbal")).alias("totacctbal"),
    )
