"""Round-6 tranche 21: exposure league table + referential-integrity
audit (q254-q255).

- q254: per-source near-dup exposure — the share of each source's
  documents that participate in ANY q52 near-dup pair: the league
  table that turns q52's pair list into a per-source acquisition
  decision (a source with 40% dup exposure is mostly re-crawl).
- q255: referential-integrity audit of the warehouse star — orphan
  lineitem->order/part/supplier references, orders with no lines,
  and the line-count ceiling: the FK health check every load
  pipeline runs before trusting joins (q140's reconciliation diffs
  two SNAPSHOTS; this checks one snapshot's internal edges).

Determinism: pure integer counts; q254's one ratio divides exact
integers inside round(.., 6).

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's dedup-analytics
and data-quality families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import (
    _Q52_CTES,
    _Q52_FINAL,
)
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q254 — per-source near-dup exposure
# ---------------------------------------------------------------------------


@register(
    "q254_source_dup_exposure",
    f"""
    WITH {_Q52_CTES},
    q52 AS ({_Q52_FINAL}),
    dup_docs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT d1 AS doc_id FROM q52 UNION ALL SELECT d2 FROM q52)
    ),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN dup_docs.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dup_docs
      FROM documents LEFT JOIN dup_docs USING (doc_id)
      GROUP BY source
    )
    SELECT source, n_docs, n_dup_docs,
           round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate
    FROM per WHERE n_dup_docs > 0
    """,
)
def q254_source_dup_exposure(
    spark: SparkSession, sf_dir: str, *, graph_dir: str | None = None
) -> DataFrame:
    """Share of each source's documents that sit in at least one q52
    near-dup pair — the per-source acquisition league table (q217
    says WHICH source pairs overlap; this says how much of EACH
    source is redundant with anything). Sources with zero exposure
    are omitted (the interesting rows are the exposed ones).

    Scale: q52's banded pairs collapse to a distinct doc set (bounded
    by documents, not pairs); one left join on doc_id + one source
    rollup. Shares q52's CTEs verbatim with the whole dedup family."""
    from file_appender_spark.operators.pairstore import q52_edges

    pairs = q52_edges(spark, sf_dir, graph_dir)
    dup_docs = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionAll(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
        .select("doc_id", F.lit(1).alias("is_dup"))
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    per = (
        d.join(dup_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.coalesce("is_dup", F.lit(0))).cast("long").alias("n_dup_docs"),
        )
    )
    return per.filter(F.col("n_dup_docs") > 0).select(
        "source",
        "n_docs",
        "n_dup_docs",
        F.round(F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
    )


# ---------------------------------------------------------------------------
# q255 — referential-integrity audit
# ---------------------------------------------------------------------------


@register(
    "q255_referential_integrity",
    """
    WITH li AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
                FROM lineitem GROUP BY 1),
    o AS (SELECT o_orderkey FROM orders)
    SELECT
      CAST((SELECT count(*) FROM li LEFT JOIN o ON o_orderkey = l_orderkey
            WHERE o_orderkey IS NULL) AS BIGINT) AS orphan_lineitem_orders,
      CAST((SELECT count(*) FROM o LEFT JOIN li ON l_orderkey = o_orderkey
            WHERE l_orderkey IS NULL) AS BIGINT) AS empty_orders,
      CAST((SELECT count(*) FROM li) AS BIGINT) AS orders_with_lines,
      CAST((SELECT max(n_lines) FROM li) AS BIGINT) AS max_lines_per_order,
      CAST((SELECT count(*) FROM lineitem l
            LEFT JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_partkey IS NULL) AS BIGINT) AS orphan_part_refs,
      CAST((SELECT count(*) FROM lineitem l
            LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE s.s_suppkey IS NULL) AS BIGINT) AS orphan_supplier_refs
    """,
)
def q255_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK health of the warehouse star in one row: orphan lineitem
    order keys, orders with no lines (257 at sf0.01 — a real property
    of the generated data this audit surfaces), distinct ordered
    orders, the per-order line ceiling, and orphan part/supplier
    references. q140 diffs two snapshots; this checks ONE snapshot's
    internal edges — the load-pipeline gate before any join is
    trusted.

    Scale: each check is an anti-join (broadcast dims for
    part/supplier, key-shuffled for orders) feeding a count — the
    plans Spark already runs for q09/q10's semi/anti family; all six
    scalars assemble via 1-row broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    p = _t(spark, sf_dir, "part").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey")
    li_g = li.groupBy("l_orderkey").agg(F.count("*").cast("long").alias("n_lines"))
    orphan_li = li_g.join(
        o, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti"
    ).agg(F.count("*").cast("long").alias("orphan_lineitem_orders"))
    empty_o = o.join(
        li_g, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
    ).agg(F.count("*").cast("long").alias("empty_orders"))
    li_stats = li_g.agg(
        F.count("*").cast("long").alias("orders_with_lines"),
        F.max("n_lines").cast("long").alias("max_lines_per_order"),
    )
    orphan_p = li.join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"), "left_anti"
    ).agg(F.count("*").cast("long").alias("orphan_part_refs"))
    orphan_s = li.join(
        F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
    ).agg(F.count("*").cast("long").alias("orphan_supplier_refs"))
    return (
        orphan_li.crossJoin(F.broadcast(empty_o))
        .crossJoin(F.broadcast(li_stats))
        .crossJoin(F.broadcast(orphan_p))
        .crossJoin(F.broadcast(orphan_s))
        .select(
            "orphan_lineitem_orders",
            "empty_orders",
            "orders_with_lines",
            "max_lines_per_order",
            "orphan_part_refs",
            "orphan_supplier_refs",
        )
    )
