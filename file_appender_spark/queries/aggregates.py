"""Aggregation inventory: stats suite, distinct counts, collect_list,
grouping sets / cube / rollup, exact percentiles, pivot.
(SURVEY.md §2 Part B, Aggregations.)
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
    "q14_agg_stats",
    """
    SELECT c_nationkey,
           count(*)                              AS n,
           count(DISTINCT c_mktsegment)          AS n_segments,
           round(sum(c_acctbal), 2)              AS sum_bal,
           round(avg(c_acctbal), 4)              AS avg_bal,
           round(min(c_acctbal), 2)              AS min_bal,
           round(max(c_acctbal), 2)              AS max_bal,
           round(stddev_samp(c_acctbal), 4)      AS sd_bal,
           round(var_samp(c_acctbal), 1)         AS var_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q14_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full stats agg suite incl. exact count(distinct). Scale: all of
    these are partial+final aggregates (map-side combine) in Catalyst;
    count(distinct) expands to a two-phase agg automatically."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        # var ~5e6: at 4 dp the engines' different accumulation orders
        # can land on opposite sides of a rounding boundary; 1 dp is
        # magnitude-appropriate (rounding precision must scale with value)
        F.round(F.var_samp("c_acctbal"), 1).alias("var_bal"),
    )


@register(
    "q15_agg_collect",
    """
    SELECT n.n_regionkey AS regionkey,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n
    GROUP BY n.n_regionkey
    """,
)
def q15_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list made deterministic by sort_array, emitted as a
    joined string (SURVEY.md Part B: collect_list with sort_array
    wrapper for determinism)."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "q16_rollup",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() disambiguation of the all-rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
    ).select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
        "gid",
        "n",
        "sum_qty",
    )


@register(
    "q17_cube",
    """
    SELECT coalesce(o_orderstatus, '<all>')    AS status,
           coalesce(o_orderpriority, '<all>')  AS priority,
           grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q17_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
        "gid",
        "n",
        "total",
    )


@register(
    "q18_grouping_sets",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(CAST(l_linenumber AS VARCHAR), '<all>') AS linenumber,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linenumber), ())
    """,
)
def q18_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (same Catalyst Expand operator
    as cube/rollup)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '<all>') AS returnflag,
               coalesce(CAST(l_linenumber AS STRING), '<all>') AS linenumber,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linenumber), ())
        """
    )


@register(
    "q19_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q19_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (the global-EXACT no-sort scale
    path is operators/selection.py's value-domain bisection; approx
    variants are bench-only,
    SURVEY.md Part B agg row)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99_price"),
    )


@register(
    "q20_pivot",
    """
    SELECT l_returnflag,
           round(coalesce(sum(l_quantity) FILTER (l_linestatus = 'O'), 0), 2) AS qty_O,
           round(coalesce(sum(l_quantity) FILTER (l_linestatus = 'F'), 0), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never infer pivot values at
    scale — that is an extra pass over the data)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
        .select(
            "l_returnflag",
            F.round(F.coalesce("O", F.lit(0.0)), 2).alias("qty_O"),
            F.round(F.coalesce("F", F.lit(0.0)), 2).alias("qty_F"),
        )
    )


@register(
    "q91_unpivot_measures",
    """
    SELECT measure, l_returnflag,
           count(*)                 AS n,
           round(sum(value), 2)     AS total,
           round(avg(value), 6)     AS mean
    FROM (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    GROUP BY measure, l_returnflag
    """,
)
def q91_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (``DataFrame.unpivot`` / MELT) of three
    lineitem measures, then per-(measure, flag) stats — the reshaping
    step feeding any generic per-metric dashboard or drift monitor.

    Scale: unpivot is a zero-shuffle 3x row projection (one scan; the
    oracle's UNION ALL spelling would scan three times if taken
    literally — Spark's unpivot never re-reads); the aggregate
    map-side-combines to |measures| x |flags| = 9 groups."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "extendedprice")
        .otherwise("discount"),
    )
    return long.groupBy("measure", "l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.round(F.avg("value"), 6).alias("mean"),
    )


@register(
    "q95_listagg",
    """
    SELECT c_nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment, c_custkey) AS segs,
           count(*) AS n
    FROM customer
    WHERE c_custkey % 40 = 0
    GROUP BY c_nationkey
    """,
)
def q95_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP, the SQL
    2016 ordered-set aggregate Spark 4 added) — deterministic because
    the WITHIN GROUP ordering is total (segment, then custkey).

    Scale: one shuffle on the group key; the ordered aggregation
    sorts within each group's partial state, never globally."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               listagg(c_mktsegment, '|')
                 WITHIN GROUP (ORDER BY c_mktsegment, c_custkey) AS segs,
               count(*) AS n
        FROM customer
        WHERE c_custkey % 40 = 0
        GROUP BY c_nationkey
        """
    )


@register(
    "q124_mode_per_group",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT o_orderstatus, o_orderpriority, n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY n DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_orders
    FROM r WHERE rn = 1
    """,
)
def q124_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value) with a deterministic
    tie-break — the aggregate SQL's MODE() computes
    non-deterministically on ties, so the engine spells it as
    count + rank, the only form that is oracle-stable.

    Scale: the inner count collapses to |status x priority| groups
    (map-side combine), the rank runs over that tiny aggregate — the
    window never sees raw rows."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
        )
    )
