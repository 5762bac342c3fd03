"""Degree-bounded triangle enumeration over near-dup pair graphs —
the r6-verdict scale twin for the q183/q213 triangle family.

The naive two-equi-join enumeration (q183_neardup_triangles,
q213_clustering_coefficient) is the right ORACLE spelling, but its
wedge step `ab.join(bc, "b")` materializes every length-2 path: a
boilerplate template family of f near-duplicate documents is a
near-clique, and near-cliques SURVIVE exact-dedup-first (the texts
are distinct), so at crawl scale a 10^5-member family yields ~10^10
wedges — quadratic in per-vertex degree with no bound.

This module is the production twin, two standard public techniques:

1. **Degree-ordered orientation** (Suri & Vassilvitskii, "Counting
   triangles and the curse of the last reducer", WWW 2011; also
   Schank & Wagner 2005): orient every undirected edge from its
   lower-(degree, id) endpoint to the higher. The orientation is
   acyclic, every triangle has exactly ONE vertex whose two oriented
   out-edges lie inside it, and a vertex's out-degree is at most
   ~sqrt(2m) regardless of its raw degree — so wedge work drops from
   sum(deg^2) to sum(outdeg^2) <= O(m^1.5) with EXACT results.

2. **An out-degree cap** (the banding policies' band_bucket_cap
   pattern applied to adjacency lists): above `max_degree` a
   vertex's out-list is truncated to a deterministic pseudo-random
   `max_degree`-subset, bounding wedges to <= m*(max_degree-1)/2 —
   LINEAR in edges. Capping trades completeness for the bound: the
   returned triangles are a subset (a lower bound on counts), and
   `capped_vertices` reports exactly which vertices were truncated
   so the caller can see where. `graph_params_for` sizes the cap.

Oracle-parity contract: with `max_degree=None` (or any cap at or
above the true max out-degree) `triangle_triples` returns exactly
the q183/q213 triangle set — pinned by tests/test_graph.py against
the two-join spelling on random graphs and on the real sf0.001 q52
graph.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class GraphParams:
    max_degree: int  # out-degree cap after degree-ordered orientation
    wedge_bound_per_edge: float  # wedges/edge worst case = (cap-1)/2
    exact_below_edges: int  # graphs smaller than this are exact anyway


def graph_params_for(
    n_edges: int, target_wedges_per_edge: float = 64.0
) -> GraphParams:
    """Size the out-degree cap so total wedge work stays LINEAR in the
    edge count: after orientation every edge belongs to exactly one
    source's out-list, so wedges = sum_v C(outdeg_v, 2) <=
    m * (cap - 1) / 2. Solving (cap-1)/2 = target_wedges_per_edge
    gives the cap; the default 64 wedges/edge matches the banding
    policies' linear-candidate budget.

    The cap only ever binds past the orientation's own sqrt(2m)
    out-degree bound — `exact_below_edges` reports the edge count
    below which the capped and exact enumerations are provably
    identical (sqrt(2m) <= cap), so callers can log whether a run
    was exact without a second pass."""
    if n_edges <= 0:
        raise ValueError(f"n_edges must be positive, got {n_edges}")
    if target_wedges_per_edge < 0.5:
        raise ValueError(
            f"target_wedges_per_edge must be >= 0.5, got {target_wedges_per_edge}"
        )
    cap = max(2, int(math.floor(2.0 * target_wedges_per_edge)) + 1)
    return GraphParams(
        max_degree=cap,
        wedge_bound_per_edge=(cap - 1) / 2.0,
        exact_below_edges=cap * cap // 2,
    )


def _canonical_edges(e: DataFrame) -> DataFrame:
    """(d1, d2) with d1 < d2, self-loops dropped, duplicates (in
    either direction) collapsed — q52's pair contract, re-asserted
    cheaply so arbitrary edge frames are safe inputs."""
    d1, d2 = F.col("d1"), F.col("d2")
    return (
        e.select(
            F.least(d1, d2).alias("d1"), F.greatest(d1, d2).alias("d2")
        )
        .filter(F.col("d1") != F.col("d2"))
        .distinct()
    )


def _degrees_from_canonical(e: DataFrame) -> DataFrame:
    und = e.select(F.col("d1").alias("v")).unionAll(
        e.select(F.col("d2").alias("v"))
    )
    return und.groupBy("v").agg(F.count("*").cast("long").alias("degree"))


def degrees(e: DataFrame) -> DataFrame:
    """(v, degree) over the canonical edge list — one map-side-combined
    groupBy of the doubled list (the q213/q226/q236 degree prefix)."""
    return _degrees_from_canonical(_canonical_edges(e))


def _oriented_from_canonical(e: DataFrame) -> DataFrame:
    deg = _degrees_from_canonical(e)
    da = deg.select(F.col("v").alias("d1"), F.col("degree").alias("_k1"))
    db = deg.select(F.col("v").alias("d2"), F.col("degree").alias("_k2"))
    withk = e.join(da, "d1").join(db, "d2")
    # total order: (degree, id) — d1 < d2 already, so ties go d1->d2
    d1_first = (F.col("_k1") < F.col("_k2")) | (
        (F.col("_k1") == F.col("_k2")) & (F.col("d1") < F.col("d2"))
    )
    return withk.select(
        F.when(d1_first, F.col("d1")).otherwise(F.col("d2")).alias("src"),
        F.when(d1_first, F.col("d2")).otherwise(F.col("d1")).alias("dst"),
    )


def oriented_edges(e: DataFrame) -> DataFrame:
    """(src, dst): every canonical edge oriented from its lower-
    (degree, id) endpoint — the Suri-Vassilvitskii total order. Two
    equi-joins attach endpoint degrees (broadcast-eligible under AQE
    when the vertex set is small); no step exceeds O(m)."""
    return _oriented_from_canonical(_canonical_edges(e))


def _capped(o: DataFrame, max_degree: int) -> DataFrame:
    """Truncate each src's out-list to a deterministic pseudo-random
    max_degree-subset: rank by a multiplicative hash of (src, dst) so
    the kept subset is unbiased w.r.t. vertex ids (smallest-id-first
    would systematically favor old documents) yet stable across runs
    AND portable across engines — the hash is plain mod-prime integer
    arithmetic (no wrap-around), so an ANSI-SQL oracle (q266) can
    reproduce the identical subset: each operand is reduced mod
    p = 2^31 - 1 before the multiply, so every product stays below
    2^62 and no engine-specific overflow semantics are involved
    (DuckDB errors on int64 overflow where Spark wraps). One
    hash-partitioned window sort — linear in edges."""
    # casts to long (r10 ADVICE): with IntegerType ids, pmod(int, int)
    # stays int and int * _CAP_A wraps at 2^31 (or errors under ANSI),
    # silently breaking the no-overflow contract above. Long operands
    # keep every product below 2^62 whatever the id type.
    h = F.pmod(
        F.pmod(F.col("src").cast("long"), F.lit(_CAP_P)) * F.lit(_CAP_A)
        + F.pmod(F.col("dst").cast("long"), F.lit(_CAP_P)) * F.lit(_CAP_B),
        F.lit(_CAP_P),
    )
    w = Window.partitionBy("src").orderBy(h, "dst")
    return (
        o.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_degree)
        .drop("_r")
    )


# portable cap-subset hash constants (see _capped): p = 2^31 - 1 and
# two odd multipliers < 2^31 — shared verbatim by q266's oracle SQL
_CAP_P = 2147483647
_CAP_A = 1103515245
_CAP_B = 777767777


def capped_vertices(e: DataFrame, max_degree: int) -> DataFrame:
    """(v, out_degree) for every vertex whose oriented out-list
    exceeds the cap — the truncation report the near-dup graph health
    checks surface next to their capped counts (the band_bucket_cap
    reporting pattern). Empty = the capped run was exact."""
    if max_degree < 1:
        raise ValueError(f"max_degree must be >= 1, got {max_degree}")
    return (
        oriented_edges(e)
        .groupBy(F.col("src").alias("v"))
        .agg(F.count("*").cast("long").alias("out_degree"))
        .filter(F.col("out_degree") > max_degree)
    )


def triangle_triples(
    e: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """(a, b, c) with a < b < c: one row per triangle of the
    undirected graph `e` (columns d1, d2). Exact when `max_degree`
    is None or no out-list exceeds it; with a binding cap the result
    is the deterministic subset reachable through the truncated
    out-lists (a lower bound — see module docstring).

    Plan shape: orientation (two equi-joins + groupBy), the wedge
    self-join of out-lists on src (bounded by C(outdeg, 2) per
    vertex), and ONE closing equi-join against the canonical edge
    list — never vertex-quadratic, and with a cap never more than
    m*(cap-1)/2 wedge rows total."""
    return _triples_from_canonical(_canonical_edges(e), max_degree)


def _triples_from_canonical(
    e: DataFrame, max_degree: int | None
) -> DataFrame:
    o = _oriented_from_canonical(e)
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        o = _capped(o, max_degree)
    u = o.select("src", F.col("dst").alias("_u"))
    v = o.select("src", F.col("dst").alias("_v"))
    wedges = u.join(v, "src").filter(F.col("_u") < F.col("_v"))
    closed = wedges.join(
        e,
        (F.col("_u") == F.col("d1")) & (F.col("_v") == F.col("d2")),
    )
    # the wedge apex is the (degree, id)-minimum of the triangle, not
    # necessarily the id-minimum — re-sort ids so the triple matches
    # the oracle spelling's a < b < c orientation exactly
    arr = F.array_sort(F.array("src", "_u", "_v"))
    return closed.select(
        arr[0].alias("a"), arr[1].alias("b"), arr[2].alias("c")
    )


def triangle_count(
    e: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """(n_triangles, n_apex_docs): the q183 output shape from the
    degree-bounded enumeration — n_apex_docs keeps q183's semantics
    (distinct id-minimum vertex over triangles)."""
    return triangle_triples(e, max_degree).agg(
        F.count("*").alias("n_triangles"),
        F.countDistinct("a").alias("n_apex_docs"),
    )


def local_triangle_counts(
    e: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """(v, triangles): per-vertex triangle membership counts — the
    q213 `vt` CTE from the degree-bounded enumeration (a union of
    three projections of the triple set; no extra join)."""
    return _local_counts_from_canonical(_canonical_edges(e), max_degree)


def _local_counts_from_canonical(
    e: DataFrame, max_degree: int | None
) -> DataFrame:
    tri = _triples_from_canonical(e, max_degree)
    return (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("triangles"))
    )


def clustering_coefficients(
    e: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """(doc_id, degree, triangles, coeff): the q213 output shape from
    the degree-bounded enumeration. Degrees are the TRUE (uncapped)
    degrees — only the triangle numerator is bounded, so a capped run
    under-reports coeff (never over-reports), the conservative
    direction for a "is this a boilerplate family?" signal."""
    e = _canonical_edges(e)
    deg = _degrees_from_canonical(e)
    vt = _local_counts_from_canonical(e, max_degree)
    return (
        deg.join(vt, "v", "left")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("v").alias("doc_id"),
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.round(
                (2 * F.coalesce("triangles", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("coeff"),
        )
    )


def wedge_count(e: DataFrame, max_degree: int | None = None) -> int:
    """The enumeration's actual work metric — sum_v C(outdeg_v, 2)
    over the (optionally capped) orientation, computed WITHOUT
    materializing wedges (a groupBy + one aggregate row). This is
    what the scale probe reports: the capped bound m*(cap-1)/2 vs
    the uncapped sum that would have been joined."""
    o = oriented_edges(e)
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        o = _capped(o, max_degree)
    row = (
        o.groupBy("src")
        .agg(F.count("*").alias("k"))
        .agg(
            F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long").alias("w")
        )
        .collect()
    )
    return int(row[0]["w"] or 0)
