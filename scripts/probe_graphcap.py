#!/usr/bin/env python
"""Round-7 graph-cap probe (r6 verdict task 2): the degree-capped
triangle twin (operators/graph.py) against a planted 5k-member
NEAR-clique — each pair present with probability 0.98 via a
deterministic hash, i.e. the boilerplate-template-family regime that
SURVIVES exact-dedup-first (the members are distinct documents; the
graph is dense but not complete, so no exact-copy pass removes it).

What it measures:

1. The 5k near-clique + 10k planted low-degree organic triangles:
   - the UNCAPPED orientation's wedge count (computed analytically
     via one groupBy — never materialized): ~2e10, the join the
     naive q183/q213 spelling would have to execute;
   - the CAPPED wedge count and wall under the sized policy cap
     (graph_params_for(m)) — the bounded work actually done;
   - organic recall: every planted low-degree triangle must still be
     found (the cap binds ONLY on hot-family vertices, all of which
     are reported by capped_vertices).

2. A 300-member clique small enough to enumerate exactly: capped vs
   exact wall + counts, so the trade is measured, not asserted.

Output: one JSON object -> GRAPHCAP_PROBE_r7.json; the numbers
belong in SCALING.md's round-7 section.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.operators.graph import (  # noqa: E402
    capped_vertices,
    graph_params_for,
    triangle_count,
    wedge_count,
)
from file_appender_spark.session import get_spark  # noqa: E402

ORGANIC_OFFSET = 10_000_000


def near_clique(spark, n: int, keep_per_1000: int = 980):
    """Every pair (i, j), i<j<n, kept iff xxhash64 lands under the
    threshold — a deterministic ~98%-dense family of DISTINCT ids."""
    a = spark.range(n).select(F.col("id").alias("d1"))
    b = spark.range(n).select(F.col("id").alias("d2"))
    return (
        a.crossJoin(b)
        .filter(F.col("d1") < F.col("d2"))
        .filter(F.pmod(F.xxhash64("d1", "d2"), F.lit(1000)) < keep_per_1000)
    )


def organic_triangles(spark, n_tris: int):
    """n_tris vertex-disjoint triangles far from the clique's id
    range — degree 2 everywhere, so the cap can never bind on them."""
    base = spark.range(n_tris).select(
        (ORGANIC_OFFSET + 3 * F.col("id")).alias("v")
    )
    return base.select(
        F.explode(
            F.array(
                F.struct(F.col("v").alias("d1"), (F.col("v") + 1).alias("d2")),
                F.struct(F.col("v").alias("d1"), (F.col("v") + 2).alias("d2")),
                F.struct((F.col("v") + 1).alias("d1"), (F.col("v") + 2).alias("d2")),
            )
        ).alias("e")
    ).select("e.d1", "e.d2")


def run_capped(spark, clique_n: int, n_organic: int) -> dict:
    e = near_clique(spark, clique_n).unionByName(
        organic_triangles(spark, n_organic)
    ).persist()
    m = e.count()
    uncapped_wedges = wedge_count(e)  # analytic: one groupBy, no join
    params = graph_params_for(m)
    cap = params.max_degree
    capped_wedges = wedge_count(e, max_degree=cap)
    t0 = time.time()
    tri = triangle_count(e, max_degree=cap).collect()[0]
    wall = time.time() - t0
    # organic recall: the capped run must find every planted triangle
    from file_appender_spark.operators.graph import triangle_triples

    organic_found = (
        triangle_triples(e, max_degree=cap)
        .filter(F.col("a") >= ORGANIC_OFFSET)
        .count()
    )
    n_capped_vertices = capped_vertices(e, cap).count()
    e.unpersist()
    return {
        "clique_members": clique_n,
        "organic_triangles_planted": n_organic,
        "n_edges": m,
        "policy_cap": cap,
        "uncapped_wedges_analytic": uncapped_wedges,
        "capped_wedges": capped_wedges,
        "wedge_reduction_x": round(uncapped_wedges / max(capped_wedges, 1), 1),
        "linear_bound_m_cap": int(m * (cap - 1) / 2),
        "bound_respected": capped_wedges <= m * (cap - 1) / 2,
        "capped_wall_sec": round(wall, 2),
        "triangles_found": tri["n_triangles"],
        "organic_found": organic_found,
        "organic_recall": round(organic_found / n_organic, 4),
        "capped_vertices_reported": n_capped_vertices,
    }


def run_exact_vs_capped(spark, clique_n: int, n_organic: int) -> dict:
    e = near_clique(spark, clique_n).unionByName(
        organic_triangles(spark, n_organic)
    ).persist()
    m = e.count()
    cap = graph_params_for(m).max_degree
    t0 = time.time()
    exact = triangle_count(e).collect()[0]
    wall_exact = time.time() - t0
    t0 = time.time()
    capped = triangle_count(e, max_degree=cap).collect()[0]
    wall_capped = time.time() - t0
    e.unpersist()
    return {
        "clique_members": clique_n,
        "n_edges": m,
        "policy_cap": cap,
        "exact_triangles": exact["n_triangles"],
        "exact_wall_sec": round(wall_exact, 2),
        "capped_triangles": capped["n_triangles"],
        "capped_wall_sec": round(wall_capped, 2),
        "capped_is_lower_bound": capped["n_triangles"] <= exact["n_triangles"],
    }


def main() -> None:
    spark = get_spark(app_name="graphcap_probe_r7")
    out = {
        "probe": "graphcap_r7",
        "hot_family": run_capped(spark, clique_n=5000, n_organic=10000),
        "exact_vs_capped_300": run_exact_vs_capped(
            spark, clique_n=300, n_organic=1000
        ),
    }
    print(json.dumps(out))
    with open("/root/repo/GRAPHCAP_PROBE_r7.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
