"""Round-6 tranche 7: the six remaining TPC-H optimizer shapes as
explicit SHAPE ADAPTATIONS (q203-q208), completing all 22.

The driver schema has no partsupp table and no l_shipmode /
l_commitdate / l_receiptdate / comment columns, so Q2/Q11/Q12/Q16/
Q20/Q21 admit no *faithful* adaptation (tpch_extra.py's preamble).
What the optimizer cares about, though, is the plan shape, not the
column names — and every one of those six shapes is a pattern a user
of this engine would run daily:

- q203 (Q2 shape): correlated-min supplier election — per-group MIN
  decorrelated into a pre-aggregate + equality join back, under a
  region dimension filter. partsupp is derived from lineitem
  (min observed unit price per (part, supplier) = ps_supplycost).
- q204 (Q11 shape): group value vs a global scalar subquery —
  HAVING sum() compared against an aggregate over ALL groups. The
  TPC-H fraction is SF-scaled by spec; here the threshold is
  mean-relative (value > 2x mean part value) so the predicate is
  scale-stable by construction, integer-exact via cross-multiply.
- q205 (Q12 shape): two-bucket CASE-sum aggregation under a
  cross-column date inequality (shipped >30 days after the order
  date substitutes for commit/receipt lag) plus a one-year window.
- q206 (Q16 shape): count(DISTINCT supplier) per part attribute
  with a NOT IN exclusion subquery (negative account balance
  substitutes for the '%Customer%Complaints%' comment scan).
- q207 (Q20 shape): nested semi-join chain — suppliers selected by
  an aggregate comparison on a part-filtered fact pre-aggregate,
  then a dimension semi-join (availqty := lifetime shipped quantity;
  the Q20 predicate availqty > 0.5 * one-year quantity is kept,
  doubled to integer-exact form).
- q208 (Q21 shape): the double EXISTS / NOT EXISTS self-join —
  suppliers who were the SOLE late supplier on a multi-supplier
  order. Lateness := shipped >60 days after o_orderdate. The
  correlated pair is decorrelated into ONE per-order aggregate
  (distinct suppliers, distinct late suppliers) instead of two
  self-joins — the plan Spark should run at 100 TB.

All quantities/money use the integer-scaled discipline
(relational.py); every sum the oracle would widen to HUGEINT is CAST
to BIGINT on both sides (test_oracle_types.py tripwire).

Reference parity: the reference engine (a CDAP batch sink,
docs/FileAppender-batchsink.md) has no query surface; these cover
SURVEY.md §2 Part B's "TPC-H optimizer shapes" family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t, _ts

# ---------------------------------------------------------------------------
# shared partsupp substitute: the driver schema has no partsupp, so both
# engines derive one deterministic frame from lineitem.
#   ps_supplycost_c : min observed unit price, integer cents
#                     (l_extendedprice / l_quantity is the same IEEE
#                     double in both engines; floor(x*100+0.5) is then
#                     bit-deterministic — same trick as _SCALED_REV)
#   ps_availqty     : lifetime shipped quantity (integral doubles, so
#                     the BIGINT cast is exact)
# ---------------------------------------------------------------------------

_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))
           AS ps_supplycost_c,
         CAST(sum(l_quantity) AS BIGINT) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    unit_c = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100) + F.lit(0.5)
    ).cast("long")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(unit_c).alias("ps_supplycost_c"),
        F.sum("l_quantity").cast("long").alias("ps_availqty"),
    )


# ---------------------------------------------------------------------------
# q203 — TPC-H Q2 shape: correlated-min supplier election
# ---------------------------------------------------------------------------


@register(
    "q203_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_SQL}),
    eligible AS (
      SELECT ps_partkey, ps_supplycost_c, s_name, s_acctbal, n_name
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'),
    minc AS (SELECT ps_partkey, min(ps_supplycost_c) AS min_cost_c
             FROM eligible GROUP BY 1)
    SELECT p_partkey, p_name, p_brand, s_name, n_name, s_acctbal,
           ps_supplycost_c AS supplycost_c
    FROM eligible JOIN minc USING (ps_partkey)
    JOIN part ON p_partkey = ps_partkey
    WHERE ps_supplycost_c = min_cost_c
      AND p_size BETWEEN 20 AND 35 AND p_type IN ('STANDARD', 'ECONOMY')
    """,
)
def q203_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every mid-size STANDARD/ECONOMY part, the
    EUROPE supplier(s) offering the minimum supply cost. The classic
    correlated scalar subquery `cost = (SELECT min(cost) ... WHERE
    same part)` decorrelated into a per-part MIN pre-aggregate joined
    back on equality — ties keep all argmin rows, exactly the SQL
    semantics.

    Scale: the region filter prunes the supplier dim BEFORE the ps
    join (nation/region broadcast); the min re-join is aggregate-sized
    (one row per part), so the second shuffle carries |parts|, not
    |partsupp|; part predicates push into its scan. No window sort —
    at 100 TB a per-part min + equi-join beats rank()-per-partition
    because partial aggregation combines map-side."""
    ps = _ps(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(20, 35)
        & F.col("p_type").isin("STANDARD", "ECONOMY")
    )
    dim = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = ps.join(
        F.broadcast(dim), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select("ps_partkey", "ps_supplycost_c", "s_name", "s_acctbal", "n_name")
    minc = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_c").alias("min_cost_c")
    )
    return (
        eligible.join(minc, "ps_partkey")
        .filter(F.col("ps_supplycost_c") == F.col("min_cost_c"))
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("ps_supplycost_c").alias("supplycost_c"),
        )
    )


# ---------------------------------------------------------------------------
# q204 — TPC-H Q11 shape: group value vs global scalar subquery
# ---------------------------------------------------------------------------


@register(
    "q204_important_stock",
    f"""
    WITH ps AS ({_PS_SQL}),
    natps AS (
      SELECT ps_partkey, ps_supplycost_c * ps_availqty AS value_c
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'),
    byp AS (SELECT ps_partkey, CAST(sum(value_c) AS BIGINT) AS part_value_c
            FROM natps GROUP BY 1),
    tot AS (SELECT CAST(sum(part_value_c) AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n_parts FROM byp)
    SELECT ps_partkey AS part_key, part_value_c FROM byp, tot
    WHERE part_value_c * n_parts > 2 * total_c
    """,
)
def q204_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose ASIA-held stock value exceeds a
    global threshold — groupBy + HAVING against a scalar subquery over
    the SAME aggregate. TPC-H scales its fraction by 1/SF precisely
    because a fixed fraction empties at scale; here the threshold is
    mean-relative (part value > 2x the mean part value), scale-stable
    by construction and integer-exact via cross-multiplication
    (value * n_parts > 2 * total — no division anywhere).

    Declared bound (review finding): the cross-product value*n_parts
    overflows BIGINT once n_parts * max_part_value_cents approaches
    2^63 (~SF 1e4 with this data shape). Past that, spell the
    threshold as value > 2.0 * total / n_parts in DOUBLE — the
    integer form is the ORACLE-EXACT spelling at checkable scales,
    same declared-bound class as q222/q223's rank moments.

    Scale: one shuffle to the per-part aggregate; the global total is
    a 1-row aggregate OF the aggregate (tiny), broadcast back via
    cross-join — never a second pass over the fact. The region filter
    broadcasts into the supplier dim before the fact join."""
    ps = _ps(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey")
    )
    byp = (
        ps.join(F.broadcast(dim), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty")).alias("value_c"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum("value_c").cast("long").alias("part_value_c"))
    )
    tot = byp.agg(
        F.sum("part_value_c").cast("long").alias("total_c"),
        F.count("*").cast("long").alias("n_parts"),
    )
    return (
        byp.join(F.broadcast(tot))
        .filter(F.col("part_value_c") * F.col("n_parts") > 2 * F.col("total_c"))
        .select(F.col("ps_partkey").alias("part_key"), "part_value_c")
    )


# ---------------------------------------------------------------------------
# q205 — TPC-H Q12 shape: priority buckets under a cross-column lag
# ---------------------------------------------------------------------------


@register(
    "q205_late_ship_priority",
    """
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q205_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: how many urgent vs non-urgent lines shipped
    late in 1998, bucketed by return flag (the schema's stand-in for
    l_shipmode). Keeps Q12's two signature features: a cross-COLUMN
    inequality (shipped >30 days after the order date — only checkable
    post-join) and the two-bucket conditional aggregation.

    Scale: the one-year shipdate range pushes into the lineitem scan;
    the lag predicate filters join output before aggregation; the
    CASE-sums combine map-side into 3 groups. One fact-fact shuffle,
    aggregate output is 3 rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1998-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1999-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q206 — TPC-H Q16 shape: distinct-supplier counts with NOT IN exclusion
# ---------------------------------------------------------------------------


@register(
    "q206_supplier_part_counts",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
                                l_suppkey AS ps_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13' AND p_name NOT LIKE 'small%'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q206_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) bucket, excluding suppliers matching a
    predicate — the NOT IN subquery Catalyst must plan as a
    null-safe anti join (s_suppkey is non-null here, so a plain
    broadcast anti join). Negative account balance stands in for the
    '%Customer%Complaints%' comment scan.

    Scale: ps is a DISTINCT projection of two fact columns (map-side
    combined); the part predicates (including the IN list) push into
    the part scan; the excluded-supplier list is dim-sized and
    broadcast for the anti join; count(DISTINCT) runs as the standard
    two-phase expand. No fact-fact shuffle beyond the distinct."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_name").like("small%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(
            F.broadcast(bad),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q207 — TPC-H Q20 shape: nested semi-join chain
# ---------------------------------------------------------------------------


@register(
    "q207_excess_stock_suppliers",
    f"""
    WITH ps AS ({_PS_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty_y
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY 1, 2),
    cand AS (
      SELECT DISTINCT ps_suppkey
      FROM ps JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      WHERE ps_partkey IN (SELECT p_partkey FROM part
                           WHERE p_name LIKE 'large%')
        AND ps_availqty > 2 * qty_y)
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (SELECT ps_suppkey FROM cand)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON r_regionkey = n_regionkey
                          WHERE r_name = 'ASIA')
    """,
)
def q207_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers holding excess stock of
    'large*' parts — a chain of nested IN subqueries (part filter →
    correlated quantity comparison → supplier → nation), each of which
    Catalyst should plan as a semi join. ps_availqty (lifetime
    quantity) stands in for the missing ps_availqty column; Q20's
    `availqty > 0.5 * one-year shipped` survives as the integer-exact
    `availqty > 2 * qty_y` cross-multiplication.

    Scale: the part name filter semi-joins (broadcast) BEFORE the
    ps↔shipped join so only matching parts shuffle; both aggregates
    share the (partkey, suppkey) shuffle key — AQE reuses the
    exchange; the final two IN filters are dim-sized broadcast semi
    joins. Nothing driver-side."""
    ps = _ps(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1999-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("2000-01-01 00:00:00"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty_y"))
    )
    large_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("large%")
    ).select("p_partkey")
    cand = (
        ps.join(
            F.broadcast(large_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty_y"))
        .select("ps_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    ).select("n_nationkey")
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(cand),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# q208 — TPC-H Q21 shape: sole late supplier (EXISTS / NOT EXISTS pair)
# ---------------------------------------------------------------------------


@register(
    "q208_sole_late_supplier",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_name
    """,
)
def q208_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up a finished
    multi-supplier order (lateness := shipped >60 days after the
    order date, standing in for receipt-after-commit). The oracle
    spells the EXISTS / NOT EXISTS pair literally; the Spark plan
    DECORRELATES both into one per-order aggregate — distinct
    suppliers and distinct LATE suppliers — because

      EXISTS(other supplier)          <=> n_suppliers >= 2
      NOT EXISTS(other late supplier) <=> n_late_suppliers = 1
                                          (l1 itself is late)

    which is the aggregation form a 1000-executor cluster wants: one
    extra shuffle on l_orderkey instead of two self-joins with
    inequality residuals.

    Scale: o_orderstatus='F' pushes into the orders scan; the order
    stats frame is |orders|-sized with two map-side-combinable
    distinct aggregates; the join back to late rows is key-colocated
    with the stats shuffle. count(*) per supplier combines
    map-side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lat = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            )
            .cast("int")
            .alias("late"),
        )
    )
    stats = lat.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        lat.filter(F.col("late") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
