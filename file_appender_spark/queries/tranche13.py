"""Round-6 tranche 13: clustering/graph evaluation operators
(q235-q236) — scoring the near-dup graph's STRUCTURE against
external labels, completing the q213/q219/q226 graph-statistics
family.

- q235: cluster purity + NMI of the q116 near-dup clusters against
  source labels — "does duplication follow source boundaries"
  (purity; Strehl & Ghosh 2002's normalized mutual information).
  High NMI = dedup clusters are really source clusters, so
  source-level dedup (q217) would be cheaper than doc-level.
- q236: degree assortativity (Newman 2002) of the near-dup graph —
  Pearson correlation of endpoint degrees over symmetrized edges.
  Assortative (r>0) near-dup graphs mean hub-to-hub boilerplate
  families; disassortative means star-shaped template-and-variants.

Determinism: all counts BIGINT; every entropy/MI term is one IEEE
expression over exact integers floor-scaled to 1e-9 BEFORE its sum
(q191's discipline); assortativity's moments are exact BIGINT
(degrees are integers), r is one guarded IEEE expression.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's dedup-analytics
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import (
    _Q52_CTES,
    _Q52_FINAL,
    q116_dedup_clusters,
)
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q235 — near-dup cluster purity + NMI against source labels
# ---------------------------------------------------------------------------


@register(
    "q235_cluster_purity",
    f"""
    WITH RECURSIVE {_Q52_CTES},
    q52 AS ({_Q52_FINAL}),
    sym AS (SELECT d1 AS u, d2 AS v FROM q52 UNION ALL SELECT d2, d1 FROM q52),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT x.id, s.v FROM reach x JOIN sym s ON s.u = x.r
    ),
    asg AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    joint AS (
      SELECT cluster_id, source, CAST(count(*) AS BIGINT) AS c
      FROM asg JOIN documents USING (doc_id)
      GROUP BY cluster_id, source
    ),
    per_cluster AS (
      SELECT cluster_id, CAST(sum(c) AS BIGINT) AS n_c,
             CAST(max(c) AS BIGINT) AS maj
      FROM joint GROUP BY cluster_id
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM asg),
    marg_s AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM joint
               GROUP BY source),
    mi_terms AS (
      SELECT CAST(floor(CAST(j.c AS DOUBLE) / nd
                  * ln(CAST(j.c AS DOUBLE) * nd
                       / (CAST(p.n_c AS DOUBLE) * m.cs))
                  * 1000000000 + 0.5) AS BIGINT) AS t
      FROM joint j JOIN per_cluster p USING (cluster_id)
                   JOIN marg_s m USING (source) CROSS JOIN n
    ),
    hc_terms AS (
      SELECT CAST(floor(-CAST(n_c AS DOUBLE) / nd
                  * ln(CAST(n_c AS DOUBLE) / nd)
                  * 1000000000 + 0.5) AS BIGINT) AS t
      FROM per_cluster CROSS JOIN n
    ),
    hs_terms AS (
      SELECT CAST(floor(-CAST(cs AS DOUBLE) / nd * ln(CAST(cs AS DOUBLE) / nd)
                  * 1000000000 + 0.5) AS BIGINT) AS t
      FROM marg_s CROSS JOIN n
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM per_cluster) AS n_clusters,
           nd AS n_docs,
           round(CAST((SELECT sum(maj) FROM per_cluster) AS DOUBLE) / nd, 6)
             AS purity,
           CASE WHEN (SELECT sum(t) FROM hc_terms) > 0
                     AND (SELECT sum(t) FROM hs_terms) > 0 THEN
             round(CAST((SELECT sum(t) FROM mi_terms) AS DOUBLE)
                   / sqrt(CAST((SELECT sum(t) FROM hc_terms) AS DOUBLE)
                          * (SELECT sum(t) FROM hs_terms)), 6)
           ELSE NULL END AS nmi
    FROM n
    """,
)
def q235_cluster_purity(
    spark: SparkSession, sf_dir: str, *, graph_dir: str | None = None
) -> DataFrame:
    """Purity and NMI of the q116 near-dup clustering against source
    labels: purity = majority-source mass / n; NMI = I(C;S) /
    sqrt(H(C) H(S)) (Strehl & Ghosh 2002). Every MI/entropy term is
    one IEEE expression over exact counts, floor-scaled to 1e-9
    integers before its sum; the final two divisions happen once on
    the scaled integer sums (the 1e-9 factors cancel in the NMI
    ratio exactly).

    Scale: composes q116's CC assignment; joint/marginals are
    map-side-combined aggregates bounded by clusters x sources; the
    three term sums and the final row are scalar-sized. Oracle
    composes the SAME q52 CTEs + recursive closure."""
    asg = q116_dedup_clusters(spark, sf_dir, graph_dir=graph_dir).select(
        "doc_id", "cluster_id"
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    joint = (
        asg.join(docs, "doc_id")
        .groupBy("cluster_id", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per_cluster = joint.groupBy("cluster_id").agg(
        F.sum("c").cast("long").alias("n_c"),
        F.max("c").cast("long").alias("maj"),
    )
    marg_s = joint.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    n = asg.agg(F.count("*").cast("long").alias("nd"))

    mi_t = (
        joint.join(per_cluster.select("cluster_id", "n_c"), "cluster_id")
        .join(marg_s, "source")
        .crossJoin(F.broadcast(n))
        .select(
            F.floor(
                F.col("c").cast("double")
                / F.col("nd")
                * F.log(
                    F.col("c").cast("double")
                    * F.col("nd")
                    / (F.col("n_c").cast("double") * F.col("cs"))
                )
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("mi"))
    )
    hc_t = (
        per_cluster.crossJoin(F.broadcast(n))
        .select(
            F.floor(
                -F.col("n_c").cast("double")
                / F.col("nd")
                * F.log(F.col("n_c").cast("double") / F.col("nd"))
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("hc"))
    )
    hs_t = (
        marg_s.crossJoin(F.broadcast(n))
        .select(
            F.floor(
                -F.col("cs").cast("double")
                / F.col("nd")
                * F.log(F.col("cs").cast("double") / F.col("nd"))
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("hs"))
    )
    stats = per_cluster.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("maj").cast("long").alias("maj_sum"),
    )
    return (
        stats.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(mi_t))
        .crossJoin(F.broadcast(hc_t))
        .crossJoin(F.broadcast(hs_t))
        .select(
            "n_clusters",
            F.col("nd").alias("n_docs"),
            F.round(F.col("maj_sum").cast("double") / F.col("nd"), 6).alias(
                "purity"
            ),
            # guarded: one cluster (H(C)=0) or one source (H(S)=0)
            # zeroes the sqrt — ANSI Spark raises, oracle yields NULL
            F.when(
                (F.col("hc") > 0) & (F.col("hs") > 0),
                F.round(
                    F.col("mi").cast("double")
                    / F.sqrt(F.col("hc").cast("double") * F.col("hs")),
                    6,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# q236 — degree assortativity of the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "q236_degree_assortativity",
    f"""
    WITH {_Q52_CTES},
    e AS (SELECT d1, d2 FROM ({_Q52_FINAL})),
    und AS (SELECT d1 AS v FROM e UNION ALL SELECT d2 FROM e),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY v),
    ek AS (
      SELECT da.k AS ka, db.k AS kb
      FROM e JOIN deg da ON da.v = e.d1 JOIN deg db ON db.v = e.d2
    ),
    sy AS (SELECT ka AS x, kb AS y FROM ek UNION ALL SELECT kb, ka FROM ek),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy_,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM sy
    )
    SELECT m // 2 AS n_edges,
           CASE WHEN m >= 2
                     AND CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                THEN round((CAST(m AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy_)
                     / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(m AS DOUBLE) * syy
                               - CAST(sy_ AS DOUBLE) * sy_)), 6)
                ELSE NULL END AS assortativity
    FROM mom
    """,
)
def q236_degree_assortativity(
    spark: SparkSession, sf_dir: str, *, graph_dir: str | None = None
) -> DataFrame:
    """Degree assortativity (Newman 2002) of the q52 near-dup graph:
    Pearson r of endpoint degrees over symmetrized edges — exact
    BIGINT moments (degrees are integers), one guarded IEEE r.
    r ~ +1 = clique-of-equals boilerplate families (what exact-copy
    groups produce); r < 0 = template hubs with leaf variants, which
    favors representative-election dedup (q164) over pair pruning.

    Scale: degrees are one map-side-combined groupBy of the doubled
    edge list; the degree attach is two equi-joins edge->vertex; the
    moment aggregate is one row. Nothing vertex-quadratic."""
    from file_appender_spark.operators.pairstore import q52_edges

    e = q52_edges(spark, sf_dir, graph_dir).select("d1", "d2")
    und = e.select(F.col("d1").alias("v")).unionAll(e.select(F.col("d2").alias("v")))
    deg = und.groupBy("v").agg(F.count("*").cast("long").alias("k"))
    da = deg.select(F.col("v").alias("d1"), F.col("k").alias("ka"))
    db = deg.select(F.col("v").alias("d2"), F.col("k").alias("kb"))
    ek = e.join(da, "d1").join(db, "d2").select("ka", "kb")
    sy = ek.select(F.col("ka").alias("x"), F.col("kb").alias("y")).unionAll(
        ek.select(F.col("kb").alias("x"), F.col("ka").alias("y"))
    )
    mom = sy.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy_"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    md, sxd = F.col("m").cast("double"), F.col("sx").cast("double")
    var_x = md * F.col("sxx") - sxd * F.col("sx")
    r = F.when(
        (F.col("m") >= 2) & (var_x > 0),
        F.round(
            (md * F.col("sxy") - sxd * F.col("sy_"))
            / (
                F.sqrt(var_x)
                * F.sqrt(
                    md * F.col("syy")
                    - F.col("sy_").cast("double") * F.col("sy_")
                )
            ),
            6,
        ),
    ).otherwise(F.lit(None).cast("double"))
    return mom.select(
        F.expr("m div 2").alias("n_edges"), r.alias("assortativity")
    )
