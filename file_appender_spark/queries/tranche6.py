"""Round-6 tranche: the remaining adaptable TPC-H optimizer shapes
plus a statistical-LM quality scorer.

TPC-H completion (with tpch_extra's round-5 seven and the earlier
Q1/Q3/Q4/Q5/Q6 shapes this covers every TPC-H query the driver
schema can express faithfully; Q2/Q11/Q16/Q20 are partsupp-centric
and Q12/Q21 need shipmode/commitdate/receiptdate — those landed
later in round 6 as declared SHAPE adaptations, tranche7.py
q203-q208, completing all 22):

- q187 (Q7 shape): volume shipping between two nations — the classic
  double-dim-join with a symmetric nation-pair disjunction that the
  optimizer must not turn into a cross product.
- q188 (Q8 shape): national market share inside one region — a
  five-join tree whose ratio-of-conditional-sums must stay
  integer-scaled for cross-engine determinism.
- q189 (Q9 shape, adapted): product-type profit by nation and year.
  The driver schema has no partsupp, so the declared cost model is
  `0.1 * p_retailprice * l_quantity` (a broadcast-dim expression,
  exactly where ps_supplycost would sit in the join tree; the plan
  shape — part-filtered fact join + dim joins + two-key rollup — is
  Q9's).
- q190 (Q13 shape): customer order-count distribution — the
  outer-join + double aggregation that stresses null-preserving
  grouped counts.

LLM-pipeline addition:

- q191: add-one-smoothed bigram language-model scoring (the
  KenLM/CCNet-style perplexity quality filter, Wenzek et al.
  arXiv:1911.00359, expressed as an exact self-trained bigram model):
  score every document by its average bigram log-probability under
  the corpus's own counts. Per-bigram log-probs are floor-scaled to
  integer 1e-6 units before summing (relational.py's money
  discipline, applied to logs) so the per-doc average is
  order-independent and hash-identical across engines.

Scale notes are attached per query; all money aggregates use
relational.py's integer-scaled helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import _WS
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.relational import (
    _money_sum_2dp,
    _sql_money_sum_2dp,
)

# one definition of the revenue expression / money scaling / table
# loader across both TPC-H tranches — two copies of the scaling
# formula could drift independently (review finding r6)
from file_appender_spark.queries.tpch_extra import (  # noqa: F401
    _REV,
    _SCALED_REV,
    _rev_col,
    _t,
    _ts,
)


# --------------------------------------------------------------------------
# q187 — TPC-H Q7: volume shipping between two nations
# --------------------------------------------------------------------------


@register(
    "q187_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_sql_money_sum_2dp(_REV)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q187_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a symmetric pair of
    nations by ship year. The nation-pair OR is the optimizer stress:
    it correlates BOTH dim joins, so it can only be applied after
    they land — but each nation dim pre-filters to the two named
    nations, so the broadcast side is 2 rows each and the fact rows
    surviving the join are already restricted to the pair's
    suppliers/customers.

    Scale: the two-year shipdate predicate pushes into the fact scan;
    supplier/customer/nation all broadcast (dims); one shuffle total
    — the final 3-key rollup over at most 2x2x2 year groups. Revenue
    is integer-scaled (relational.py money discipline)."""
    pair = ("NATION_1", "NATION_2")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("n1_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("n1_key") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("n2_key"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("n2_key") == F.col("c_nationkey"),
        )
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_money_sum_2dp(_rev_col()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q188 — TPC-H Q8: national market share within a region
# --------------------------------------------------------------------------


@register(
    "q188_market_share",
    f"""
    WITH j AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_SCALED_REV} AS sr,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(floor((sum(CASE WHEN supp_nation = 'NATION_3' THEN sr ELSE 0 END) + 50) / 100.0) AS BIGINT) / 100.0 AS nation_revenue,
           CAST(floor((sum(sr) + 50) / 100.0) AS BIGINT) / 100.0 AS total_revenue,
           CAST(floor((CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN sr ELSE 0 END) AS DOUBLE)
                       / sum(sr)) * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS mkt_share
    FROM j
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q188_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the share of one supplier nation in a region's
    revenue for one part type, by order year — the deepest join tree
    in the suite (fact + 6 dims, nation joined twice with different
    roles).

    Determinism: the ratio is one double division of two exact
    integer-scaled sums, then a floor-based 6dp round (q169's
    pattern).

    Scale: p_type and the region filter cut both broadcast sides
    before the fact join; the two-year predicate pushes into the
    orders scan; everything except the orders↔lineitem join is a
    broadcast, and the final rollup has one group per year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nat = n.join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cust_nat), F.col("cn_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("sn_key") == F.col("s_nationkey"),
        )
    )
    sr = F.floor(_rev_col() * 10000 + F.lit(0.5)).cast("bigint")
    grouped = j.select(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        sr.alias("sr"),
        "supp_nation",
    ).groupBy("o_year")
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("sr")).otherwise(F.lit(0))
    )
    tot = F.sum("sr")
    return grouped.agg(
        (F.floor((nat + 50) / 100.0).cast("bigint") / 100.0).alias("nation_revenue"),
        (F.floor((tot + 50) / 100.0).cast("bigint") / 100.0).alias("total_revenue"),
        (
            F.floor((nat.cast("double") / tot) * 1000000 + F.lit(0.5)).cast("bigint")
            / 1000000.0
        ).alias("mkt_share"),
    ).orderBy("o_year")


# --------------------------------------------------------------------------
# q189 — TPC-H Q9 (adapted): product-type profit by nation and year
# --------------------------------------------------------------------------

_PROFIT = f"{_REV} - 0.1 * p_retailprice * l_quantity"


@register(
    "q189_product_profit",
    f"""
    SELECT nation, o_year, {_sql_money_sum_2dp(_PROFIT)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice, l_discount, l_quantity, p_retailprice
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%g%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q189_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted): profit per supplier nation per order
    year for parts whose name matches a substring. The driver schema
    has no partsupp, so the cost term is the declared proxy
    `0.1 * p_retailprice * l_quantity` — it sits exactly where
    `ps_supplycost * l_quantity` does in Q9's profit expression, so
    the join tree (substring-filtered part dim into the fact, then
    supplier→nation, rollup on (nation, year)) is Q9's.

    Scale: the LIKE filter cuts the part broadcast before the fact
    join (never a post-join filter); supplier/nation broadcast; one
    shuffle for the (25 x 7)-group rollup. Profit is integer-scaled
    per row BEFORE summing — sum-then-subtract of two separately
    rounded sums would differ from the oracle's row-wise rounding."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%g%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    profit = _rev_col() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(_money_sum_2dp(F.col("profit")).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# q190 — TPC-H Q13: customer order-count distribution
# --------------------------------------------------------------------------


@register(
    "q190_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q190_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders
    (excluding one priority class). The stress is the outer join with
    a join-side predicate: the priority filter belongs INSIDE the
    join condition — filtering after the join would turn customers
    with only urgent orders into nulls-dropped rows instead of
    c_count = 0.

    Scale: count(o_orderkey) ignores the null-extended rows natively;
    both aggregations are partial-aggregable; the second rollup's
    key space is the max order count (tiny). The customer↔orders join
    shuffles on custkey — at 100 TB that is the natural co-partition
    key for both tables (bucketed layout, operators/layout.py)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# q191 — bigram language-model scoring (perplexity quality filter)
# --------------------------------------------------------------------------


@register(
    "q191_bigram_lm_score",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
    ),
    uni AS (
      SELECT tok, count(*) AS c1
      FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok
    ),
    v AS (SELECT count(*) AS vsz FROM uni),
    bgp AS (
      SELECT doc_id, w, unnest(range(1, len(w))) AS i
      FROM t WHERE len(w) >= 2
    ),
    bgx AS (SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bg FROM bgp),
    c2 AS (SELECT bg, count(*) AS cnt2 FROM bgx GROUP BY bg),
    scored AS (
      SELECT doc_id,
             CAST(floor(ln((cnt2 + 1.0) / (c1 + vsz)) * 1000000 + 0.5) AS BIGINT)
               AS slp
      FROM bgx JOIN c2 USING (bg) JOIN uni ON uni.tok = bgx.w1 CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(floor(CAST(sum(slp) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             / 1000000.0 AS avg_logp
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q191_bigram_lm_score(
    spark: SparkSession, sf_dir: str, *, stats_dir: str | None = None
) -> DataFrame:
    """Statistical-LM quality scoring (the CCNet-style perplexity
    filter, Wenzek et al. arXiv:1911.00359, with the corpus's own
    add-one-smoothed bigram model standing in for KenLM): every
    document scored by its mean bigram log-probability
    ln((c(w1,w2)+1) / (c(w1)+V)). Low scores = improbable token
    sequences = gibberish/boilerplate candidates for curation.

    Determinism: c(w1,w2), c(w1) and V are exact integers, so the
    probability ratio is one IEEE division with identical operands on
    both engines; each ln is floor-scaled to integer 1e-6 units
    BEFORE summing (the money discipline applied to logs — a double
    sum of logs is order-dependent and would hash-flip), making the
    per-doc mean a pure integer computation. The only cross-engine
    exposure is a <=1-ulp libm ln difference landing within 1e-9 of
    a scaling boundary (~1e-5 expected flips corpus-wide).

    Scale: two hash aggregations (unigram, bigram counts) and two
    equi-joins back to the bigram stream, all partitioned by token
    keys — the same bounded-shuffle profile as q58's TF-IDF; V is a
    broadcast scalar. Counts are Zipf-skewed; at 100 TB AQE's skew
    split handles the head tokens, and the model table itself is the
    per-corpus artifact you'd persist and broadcast to score new
    batches incrementally.

    ``stats_dir`` (opt-in) IS that persisted artifact: the unigram
    counts, vocabulary size and bigram counts all come from the
    materialized operators/corpusstats.py store, so the model-build
    scans disappear and only the per-doc scoring pass reads the
    corpus (equivalence pinned in tests/test_corpusstats.py)."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)
    if stats_dir is not None:
        from file_appender_spark.operators.corpusstats import (
            read_bigram_stats,
            read_token_stats,
        )

        uni = (
            read_token_stats(spark, stats_dir)
            .groupBy(F.col("token").alias("tok"))
            .agg(F.sum("tf").alias("c1"))
        )
        vsz = uni.agg(F.count("*").alias("vsz"))
        c2_store = (
            read_bigram_stats(spark, stats_dir)
            .groupBy(F.col("bigram").alias("bg"))
            .agg(F.sum("tf").alias("cnt2"))
        )
    else:
        toks = d.select(F.explode(w).alias("tok"))
        uni = toks.groupBy("tok").agg(F.count("*").alias("c1"))
        vsz = uni.agg(F.count("*").alias("vsz"))
        c2_store = None
    wb = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 2)
    bgx = wb.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(element_at(w, i) AS w1, "
                "concat(element_at(w, i), ' ', element_at(w, i + 1)) AS bg))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.w1").alias("w1"), F.col("s.bg").alias("bg"))
    c2 = (
        c2_store
        if c2_store is not None
        else bgx.groupBy("bg").agg(F.count("*").alias("cnt2"))
    )
    scored = (
        bgx.join(c2, "bg")
        .join(uni, F.col("tok") == F.col("w1"))
        .crossJoin(F.broadcast(vsz))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("cnt2") + 1.0) / (F.col("c1") + F.col("vsz")))
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("slp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.floor(F.sum("slp").cast("double") / F.count("*") + 0.5).cast(
                    "bigint"
                )
                / 1000000.0
            ).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q192 — Gopher-rule quality flags
# --------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STOPS_SQL = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)


def _gopher_parts(t, text_col: str = "text"):
    """The five Gopher A1.1 measurements over a bound token array
    ``t`` — shared verbatim between q192's report and
    curate(quality_mode='gopher')'s admission gate.

    Physical spelling, probe-measured: sum-of-token-lengths is the
    char-class identity length(regexp_replace(text, '\\s', '')) —
    split tokens are precisely the non-whitespace runs, and dropping
    the aggregate() fold (interpreted struct accumulator) for it is
    the cheap win. The per-token letter/stop-list tests STAY as
    filter() lambdas: rewriting them as backtracking regex counts
    (\\S*[A-Za-z]\\S*, lookaround-anchored alternations) measured
    SLOWER than the interpreted HOFs (12.2s vs 9.4s at 10x)."""
    n_words = F.size(t)
    sum_len = F.length(F.regexp_replace(text_col, r"\s", "")).cast("bigint")
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))).cast("bigint")
    # "at least two of the following words": DISTINCT membership (a
    # doc containing only "the the" has ONE of the listed words), so
    # the count runs over the stop LIST, testing presence in the doc
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
            lambda s: F.exists(t, lambda x: x == s),
        )
    ).cast("bigint")
    # the hash and ellipsis ratios are tested SEPARATELY (A1.1: "for
    # either the hash symbol or the ellipsis"), so both counts return
    n_hash = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, "#", ""))
    ).cast("bigint")
    n_ell = (
        (F.length(text_col) - F.length(F.regexp_replace(text_col, r"\.\.\.", "")))
        / F.lit(3)
    ).cast("bigint")
    return n_words, sum_len, n_alpha, n_stop, n_hash, n_ell


def gopher_pass_bool(t, text_col: str = "text"):
    """Composite Gopher admission decision (all five rules) as one
    boolean Column over a bound token array — exact cross-multiplied
    integer tests, no floating thresholds."""
    n_words, sum_len, n_alpha, n_stop, n_hash, n_ell = _gopher_parts(t, text_col)
    return (
        (n_words >= 50)
        & (n_words <= 100000)
        & (sum_len >= 3 * n_words)
        & (sum_len <= 10 * n_words)
        & (10 * n_alpha >= 8 * n_words)
        & (10 * n_hash <= n_words)
        & (10 * n_ell <= n_words)
        & (n_stop >= 2)
    )



@register(
    "q192_gopher_rules",
    f"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(text, '\\s+') AS w FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(w) AS n_words,
             (SELECT sum(length(x)) FROM unnest(w) AS u(x)) AS sum_len,
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               AS n_alpha_words,
             len(list_filter([{_GOPHER_STOPS_SQL}],
                             s -> list_contains(w, s))) AS n_stop_hits,
             (length(text) - length(replace(text, '#', ''))) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
      FROM t
    )
    SELECT doc_id, n_words,
           CAST(floor(CAST(sum_len AS DOUBLE) * 10000 / n_words + 0.5) AS BIGINT)
             / 10000.0 AS mean_word_len,
           CAST(floor(CAST(n_alpha_words AS DOUBLE) * 10000 / n_words + 0.5)
                AS BIGINT) / 10000.0 AS alpha_word_frac,
           CAST(floor(CAST(n_hash AS DOUBLE) * 10000 / n_words + 0.5)
                AS BIGINT) / 10000.0 AS hash_ratio,
           CAST(floor(CAST(n_ell AS DOUBLE) * 10000 / n_words + 0.5)
                AS BIGINT) / 10000.0 AS ellipsis_ratio,
           n_stop_hits,
           CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS flag_word_count,
           CAST(sum_len >= 3 * n_words AND sum_len <= 10 * n_words AS INTEGER)
             AS flag_mean_len,
           CAST(10 * n_alpha_words >= 8 * n_words AS INTEGER) AS flag_alpha,
           CAST(10 * n_hash <= n_words AND 10 * n_ell <= n_words AS INTEGER)
             AS flag_symbol,
           CAST(n_stop_hits >= 2 AS INTEGER) AS flag_stop,
           CAST(n_words >= 50 AND n_words <= 100000
                AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
                AND 10 * n_alpha_words >= 8 * n_words
                AND 10 * n_hash <= n_words AND 10 * n_ell <= n_words
                AND n_stop_hits >= 2 AS INTEGER) AS gopher_pass
    FROM m
    ORDER BY doc_id
    """,
)
def q192_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher corpus-filter rules (Rae et al. arXiv:2112.11446,
    Appendix A1.1) as machine-checkable flags per document: word
    count in [50, 100000], mean word length in [3, 10], >= 80% of
    words contain an alphabetic character, symbol-to-word ratio
    <= 0.1 for the hash symbol AND for the ellipsis (tested
    separately, per the paper), and at least 2 DISTINCT words from
    the published 8-word stop list present. The composite gate is the standard pre-training
    admission rule; q56's ratio profile feeds human review, this one
    is the yes/no production filter.

    Determinism: every threshold is evaluated on exact integers
    (cross-multiplied — `sum_len >= 3*n_words` not `mean >= 3.0`);
    the reported ratios are floor-scaled integer divisions.

    Scale: zero shuffles — one pass of per-row expressions (the
    ORDER BY is presentation only); the filter composes into
    curate() as a stage expression exactly like q154's scorer."""
    from file_appender_spark.operators.textstats import let_expr

    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)

    def build(t):
        n_words, sum_len, n_alpha, n_stop, n_hash, n_ell = _gopher_parts(t, "text")

        def frac4(num):
            return (
                F.floor(num.cast("double") * 10000 / n_words + F.lit(0.5)).cast(
                    "bigint"
                )
                / 10000.0
            )

        f_wc = ((n_words >= 50) & (n_words <= 100000)).cast("int")
        f_ml = ((sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)).cast("int")
        f_al = (10 * n_alpha >= 8 * n_words).cast("int")
        f_sy = ((10 * n_hash <= n_words) & (10 * n_ell <= n_words)).cast("int")
        f_st = (n_stop >= 2).cast("int")
        return F.struct(
            n_words.alias("n_words"),
            frac4(sum_len).alias("mean_word_len"),
            frac4(n_alpha).alias("alpha_word_frac"),
            frac4(n_hash).alias("hash_ratio"),
            frac4(n_ell).alias("ellipsis_ratio"),
            n_stop.alias("n_stop_hits"),
            f_wc.alias("flag_word_count"),
            f_ml.alias("flag_mean_len"),
            f_al.alias("flag_alpha"),
            f_sy.alias("flag_symbol"),
            f_st.alias("flag_stop"),
            (f_wc * f_ml * f_al * f_sy * f_st).alias("gopher_pass"),
        )

    return d.select("doc_id", let_expr(w, build).alias("g")).select(
        "doc_id", "g.*"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q193 — t-closeness audit (ordered EMD), completing the governance trio
# --------------------------------------------------------------------------


@register(
    "q193_t_closeness",
    """
    WITH s AS (
      SELECT lang, source, n_chars // 100 AS band FROM documents
    ),
    dom AS (SELECT band, count(*) AS cg FROM s GROUP BY band),
    tot AS (SELECT count(*) AS n FROM s),
    mm AS (SELECT count(*) AS m FROM dom),
    grp AS (SELECT lang, source, count(*) AS n_g FROM s GROUP BY lang, source),
    cell AS (
      SELECT lang, source, band, count(*) AS c
      FROM s GROUP BY lang, source, band
    ),
    grid AS (
      SELECT g.lang, g.source, g.n_g, d.band, d.cg, coalesce(c.c, 0) AS c
      FROM grp g CROSS JOIN dom d
      LEFT JOIN cell c
        ON c.lang = g.lang AND c.source = g.source AND c.band = d.band
    ),
    cum AS (
      SELECT lang, source, n_g, band,
             sum(c * n - cg * n_g)
               OVER (PARTITION BY lang, source ORDER BY band) AS cd
      FROM grid CROSS JOIN tot
    )
    SELECT lang, source, n_g AS group_size,
           CAST(floor((CAST(sum(abs(cd)) AS DOUBLE) * 1000000
                       + (CAST(n_g AS DOUBLE) * n * (m - 1)) / 2)
                      / (CAST(n_g AS DOUBLE) * n * (m - 1))) AS BIGINT)
             / 1000000.0 AS t_closeness,
           CAST(sum(abs(cd)) * 5 > CAST(n_g AS BIGINT) * n * (m - 1)
                AS INTEGER) AS violates_t02
    FROM cum CROSS JOIN tot CROSS JOIN mm
    GROUP BY lang, source, n_g, n, m
    ORDER BY lang, source
    """,
)
def q193_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the third leg of the governance trio after k-anonymity (q157) and
    l-diversity (q179): a quasi-identifier group leaks when the
    DISTRIBUTION of its sensitive attribute (ordered length band)
    sits far from the global distribution. Distance is the ordered
    Earth-Mover's Distance: EMD = (1/(m-1)) * sum_i |cum_i(P - Q)|
    over the m global bands.

    Determinism: P - Q per band has the exact common denominator
    n_g * n, so the cumulative differences are exact BIGINTs
    (c*n - cg*n_g summed in band order); EMD's final division is one
    floor-scaled 6dp op, and the t > 0.2 violation flag is the exact
    cross-multiplied integer test 5*sum|cum| > n_g*n*(m-1).

    Scale: the heavy inputs are two bounded groupBys (QI-space and
    QI x band); the dense grid is groups x global-bands — QI-domain
    bounded, never row bounded — and the window cumsum runs inside
    each group's m-row partition."""
    d = _t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    s = d.select("lang", "source", F.expr("n_chars div 100").alias("band"))
    dom = s.groupBy("band").agg(F.count("*").alias("cg"))
    grp = s.groupBy("lang", "source").agg(F.count("*").alias("n_g"))
    cell = s.groupBy("lang", "source", "band").agg(F.count("*").alias("c"))
    tot = s.agg(F.count("*").alias("n"))
    mm = dom.agg(F.count("*").alias("m"))
    grid = (
        grp.crossJoin(F.broadcast(dom))
        .join(cell, ["lang", "source", "band"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    cum = grid.withColumn(
        "cd",
        F.sum(F.col("c") * F.col("n") - F.col("cg") * F.col("n_g")).over(
            W.partitionBy("lang", "source").orderBy("band")
        ),
    )
    denom = F.col("n_g").cast("double") * F.col("n") * (F.col("m") - 1)
    return (
        cum.groupBy("lang", "source", "n_g", "n")
        .agg(F.sum(F.abs("cd")).alias("sabs"))
        .crossJoin(F.broadcast(mm))
        .select(
            "lang",
            "source",
            F.col("n_g").alias("group_size"),
            (
                F.floor(
                    (F.col("sabs").cast("double") * 1000000 + denom / 2) / denom
                ).cast("bigint")
                / 1000000.0
            ).alias("t_closeness"),
            (
                F.col("sabs") * 5
                > F.col("n_g").cast("bigint") * F.col("n") * (F.col("m") - 1)
            )
            .cast("int")
            .alias("violates_t02"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# q194 — Pareto frontier (2-D skyline)
# --------------------------------------------------------------------------


@register(
    "q194_pareto_frontier",
    """
    SELECT p_partkey, p_retailprice AS price, p_size
    FROM part p1
    WHERE NOT EXISTS (
      SELECT 1 FROM part p2
      WHERE p2.p_retailprice <= p1.p_retailprice
        AND p2.p_size >= p1.p_size
        AND (p2.p_retailprice < p1.p_retailprice OR p2.p_size > p1.p_size)
    )
    ORDER BY price, p_partkey
    """,
)
def q194_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline operator, Börzsönyi et al. ICDE
    2001): the parts not dominated on (minimize price, maximize
    size). A part is dominated when another part is no worse on both
    dimensions and strictly better on at least one.

    The oracle states the DEFINITION (quadratic NOT EXISTS); the
    Spark plan uses the sort-based 2-D skyline: per price level the
    max size (only it can survive), then a running max of size over
    strictly-cheaper levels — a row is on the frontier iff it
    carries its level max AND beats every cheaper level's max.
    Duplicate (price, size) pairs are BOTH kept (no strict part),
    which the level formulation preserves naturally.

    Scale: two bounded aggregations + one window over price LEVELS
    (distinct prices, not rows) + a broadcast join back — O(n) data
    movement vs the definition's O(n^2); for d > 2 dimensions the
    block-nested-loops refinement applies but the 2-D case is the
    common (cost, quality) curation trade-off."""
    from pyspark.sql.window import Window as W

    p = _t(spark, sf_dir, "part")
    lvl = p.groupBy("p_retailprice").agg(F.max("p_size").alias("lvlmax"))
    run = lvl.withColumn(
        "prevmax",
        F.max("lvlmax").over(
            W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    j = p.join(F.broadcast(run), "p_retailprice")
    return (
        j.filter(
            (F.col("p_size") == F.col("lvlmax"))
            & (F.col("prevmax").isNull() | (F.col("prevmax") < F.col("p_size")))
        )
        .select(
            "p_partkey", F.col("p_retailprice").alias("price"), "p_size"
        )
        .orderBy("price", "p_partkey")
    )


# --------------------------------------------------------------------------
# q195 — KLL mergeable-sketch rollup under an error contract
# --------------------------------------------------------------------------


@register(
    "q195_kll_error_contract",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(1 AS INTEGER) AS q25_ok,
           CAST(1 AS INTEGER) AS med_ok,
           CAST(1 AS INTEGER) AS q75_ok
    FROM events GROUP BY event_type
    """,
)
def q195_kll_error_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch rollup path (operators/sketches.py
    kll_rollup -> kll_quantiles) under q66's error-contract scheme —
    the first ORACLE row for the sketch tier, which was pytest-only:
    per-(event_type, shard) KLL(k=200) sketches are MERGED up to
    event_type (the incremental-metrics pattern: shards stand in for
    per-day partial sketches) and the merged estimates must land
    inside generous exact PERCENTILE_DISC bands (+-10 percentile
    points; KLL k=200's published normalized rank error is ~1.65%,
    so a violation means the merge or the sketch broke, not luck).
    Sketch values are engine-specific, so the oracle pins the exact
    count and asserts every contract flag is literally 1.

    Scale: the sketch table is the 100 TB artifact — per-shard
    sketches are bytes, merge is associative, and re-estimating after
    new shards arrive never rescans history."""
    from file_appender_spark.operators.sketches import kll_quantiles, kll_rollup

    ev = _t(spark, sf_dir, "events").withColumn(
        "shard", (F.col("user_id") % 8).cast("int")
    )
    roll = kll_rollup(ev, ["event_type", "shard"], "value")
    est = kll_quantiles(roll, ["event_type"], [0.25, 0.5, 0.75])

    def _disc(q: float) -> F.Column:
        return F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)")

    exact = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        _disc(0.15).alias("_lo25"),
        _disc(0.35).alias("_hi25"),
        _disc(0.40).alias("_lo50"),
        _disc(0.60).alias("_hi50"),
        _disc(0.65).alias("_lo75"),
        _disc(0.85).alias("_hi75"),
    )

    j = exact.join(F.broadcast(est), "event_type")

    def _ok(col: str, lo: str, hi: str) -> F.Column:
        return ((F.col(col) >= F.col(lo)) & (F.col(col) <= F.col(hi))).cast(
            "int"
        )

    return j.select(
        "event_type",
        "n_events",
        _ok("p25", "_lo25", "_hi25").alias("q25_ok"),
        _ok("p50", "_lo50", "_hi50").alias("med_ok"),
        _ok("p75", "_lo75", "_hi75").alias("q75_ok"),
    )


# --------------------------------------------------------------------------
# q196 — exact running median over the event stream
# --------------------------------------------------------------------------


@register(
    "q196_running_median",
    """
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
             ) AS fr
      FROM events
    )
    SELECT event_id, user_id,
           len(fr) AS n_frame,
           list_sort(fr)[CAST((len(fr) + 1) // 2 AS INTEGER)] AS med5
    FROM w
    ORDER BY user_id, event_id
    """,
)
def q196_running_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact running median (lower-middle PERCENTILE_DISC rule) of
    each user's last-5 event values — the robust-location companion
    to q180's rolling mean/EWMA (a median survives the value spikes
    q128 hunts). The DISC rule (sorted frame, element (n+1)//2) is
    deliberate: it selects an EXISTING value, so both engines compare
    bit-identical parquet doubles and no interpolation arithmetic can
    ulp-flip a hash (the q66 lesson).

    Scale: one window sort per user partition carries the frame;
    the frame list is bounded (5 rows) so state per row is O(5) — the
    exact-median-over-unbounded-frame problem (which needs the
    two-heap trick and is not expressible as a bounded frame) is
    declared out of scope here."""
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    fr = F.array_sort(F.collect_list("value").over(w))
    return (
        ev.select(
            "event_id",
            "user_id",
            F.size(fr).alias("n_frame"),
            F.element_at(fr, ((F.size(fr) + 1) / 2).cast("int")).alias("med5"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# q197 — per-source token-distribution drift (Jensen-Shannon divergence)
# --------------------------------------------------------------------------


@register(
    "q197_jsd_sources",
    """
    WITH tok AS (
      SELECT source, unnest(string_split_regex(text, '\\s+')) AS t
      FROM documents
    ),
    sc AS (SELECT source, t, count(*) AS cs FROM tok GROUP BY source, t),
    gc AS (SELECT t, count(*) AS cg FROM tok GROUP BY t),
    ns AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
    ng AS (SELECT count(*) AS n FROM tok),
    grid AS (
      SELECT ns.source, ns.n_s, gc.cg, coalesce(sc.cs, 0) AS cs, ng.n
      FROM gc
      JOIN ns ON TRUE
      LEFT JOIN sc ON sc.t = gc.t AND sc.source = ns.source
      CROSS JOIN ng
    ),
    terms AS (
      SELECT source,
             CAST(floor((
               CASE WHEN cs > 0 THEN
                 (CAST(cs AS DOUBLE) / n_s)
                 * ln((CAST(cs AS DOUBLE) / n_s)
                      / ((CAST(cs AS DOUBLE) / n_s
                          + CAST(cg AS DOUBLE) / n) / 2))
               ELSE 0 END
               + (CAST(cg AS DOUBLE) / n)
                 * ln((CAST(cg AS DOUBLE) / n)
                      / ((CAST(cs AS DOUBLE) / n_s
                          + CAST(cg AS DOUBLE) / n) / 2))
             ) * 1000000000 + 0.5) AS BIGINT) AS term9
      FROM grid
    )
    SELECT source,
           CAST(floor(CAST(sum(term9) AS DOUBLE) / 2000 + 0.5) AS BIGINT)
             / 1000000.0 AS jsd
    FROM terms GROUP BY source ORDER BY source
    """,
)
def q197_jsd_sources(
    spark: SparkSession, sf_dir: str, *, stats_dir: str | None = None
) -> DataFrame:
    """Per-source corpus drift: Jensen-Shannon divergence between each
    source's token distribution P_s and the global distribution Q —
    the mixture-tuning signal (a source with high JSD is
    idiosyncratic; q87/q160's rebalancing consumes exactly this kind
    of score). JSD = 0.5*KL(P||M) + 0.5*KL(Q||M), M=(P+Q)/2, summed
    over the source's token union (a token absent from the source
    contributes only the Q-side term, handled by the dense
    global-vocab grid with cs=0).

    Determinism: q191's integer-log discipline, one level deeper —
    each token's KL contribution is computed from exactly-rounded
    rationals (cs/n_s, cg/n: IEEE divisions of exact integers) and
    floor-scaled to 1e-9 units BEFORE the order-sensitive sum; the
    final /2 and 6dp rounding happen on the exact integer sum.

    Scale: two token-keyed counts (source-level and global) and one
    equi-join of the source grid against the global vocabulary —
    bounded by |sources| x |vocab|, the same stationary-key profile
    as q58's TF-IDF; no pair explosion, nothing driver-side.

    ``stats_dir`` (opt-in) derives every count from a materialized
    operators/corpusstats.py store — all four marginals (cs, cg, n_s,
    n) come from the stats table, no corpus scan; the zero-token
    source filter (total_tokens > 0) replicates the scan path's
    "source must contribute at least one token" semantics
    (equivalence pinned in tests/test_corpusstats.py)."""
    if stats_dir is not None:
        from file_appender_spark.operators.corpusstats import (
            read_source_stats,
            read_token_stats,
        )

        ts = read_token_stats(spark, stats_dir)
        sc = ts.select(
            "source", F.col("token").alias("t"), F.col("tf").alias("cs")
        )
        gc = ts.groupBy(F.col("token").alias("t")).agg(
            F.sum("tf").alias("cg")
        )
        ss = read_source_stats(spark, stats_dir).filter(
            F.col("total_tokens") > 0
        )
        ns = ss.select("source", F.col("total_tokens").alias("n_s"))
        ng = ss.agg(F.sum("total_tokens").alias("n"))
    else:
        d = _t(spark, sf_dir, "documents")
        tok = d.select("source", F.explode(F.split("text", _WS)).alias("t"))
        sc = tok.groupBy("source", "t").agg(F.count("*").alias("cs"))
        gc = tok.groupBy("t").agg(F.count("*").alias("cg"))
        ns = tok.groupBy("source").agg(F.count("*").alias("n_s"))
        ng = tok.agg(F.count("*").alias("n"))
    grid = (
        gc.crossJoin(F.broadcast(ns))
        .join(sc, ["source", "t"], "left")
        .withColumn("cs", F.coalesce(F.col("cs"), F.lit(0)))
        .crossJoin(F.broadcast(ng))
    )
    p = F.col("cs").cast("double") / F.col("n_s")
    q = F.col("cg").cast("double") / F.col("n")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("cs") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + q * F.log(q / m)
    )
    terms = grid.select(
        "source",
        F.floor(contrib * 1000000000 + F.lit(0.5)).cast("bigint").alias("term9"),
    )
    return (
        terms.groupBy("source")
        .agg(
            (
                F.floor(F.sum("term9").cast("double") / 2000 + F.lit(0.5)).cast(
                    "bigint"
                )
                / 1000000.0
            ).alias("jsd")
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q198 — Heaps'-law vocabulary growth exponent
# --------------------------------------------------------------------------


@register(
    "q198_heaps_law",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
      FROM documents
    ),
    firsts AS (SELECT t, min(doc_id) AS fd FROM tok GROUP BY t),
    per_doc AS (
      SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id
    ),
    new_types AS (SELECT fd AS doc_id, count(*) AS nt FROM firsts GROUP BY fd),
    curve AS (
      SELECT p.doc_id,
             sum(p.n_tok) OVER (ORDER BY p.doc_id) AS cum_tokens,
             sum(coalesce(n.nt, 0)) OVER (ORDER BY p.doc_id) AS cum_types
      FROM per_doc p LEFT JOIN new_types n ON n.doc_id = p.doc_id
    ),
    pts AS (
      SELECT CAST(floor(ln(CAST(cum_tokens AS DOUBLE)) * 10000 + 0.5)
                  AS BIGINT) AS x,
             CAST(floor(ln(CAST(cum_types AS DOUBLE)) * 10000 + 0.5)
                  AS BIGINT) AS y
      FROM curve
    ),
    moms AS (
      SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT (SELECT CAST(max(cum_tokens) AS BIGINT) FROM curve)
             AS total_tokens,
           (SELECT CAST(max(cum_types) AS BIGINT) FROM curve) AS total_types,
           CAST(floor(
             (CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS heaps_beta
    FROM moms
    """,
)
def q198_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent of the corpus: fit V(n) ~ K * n^beta by
    OLS over the log-log vocabulary-growth curve (docs in doc_id
    order; V = distinct tokens seen, n = tokens seen). The repo's own
    scale arguments lean on Heaps' law (q181's word-type cache, the
    probe corpora's growing vocabularies) — this query MEASURES it
    for the corpus at hand.

    Determinism: each curve point's (ln n, ln V) is floor-scaled to
    integer 1e-4 units (1e-6 overflowed BIGINT in the x*y moment at
    the 10x probe — sum bounds are n_docs * (1e4*ln N)^2, safe to
    ~2e8 docs at this scale; beyond that, center the points per
    bucket and merge, same algebra); the OLS moments are exact BIGINT
    sums and the closed-form slope is scalar double arithmetic on
    those exact moments — no order-sensitive double sum anywhere.

    Scale: first-occurrence via one token-keyed min; the growth curve
    is ONE window cumsum over per-doc aggregates (rows = docs, not
    tokens); moments are a 5-cell aggregate. The single-partition
    window is doc-count bounded and feeds a scalar — at 100 TB the
    curve would be computed per range-bucket and the moments merged
    (sum-of-sums), same algebra."""
    from pyspark.sql.window import Window as W

    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", _WS)).alias("t"))
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    per_doc = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    new_types = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").alias("nt")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    curve = (
        per_doc.join(new_types, "doc_id", "left")
        .withColumn("nt", F.coalesce(F.col("nt"), F.lit(0)))
        .select(
            "doc_id",
            F.sum("n_tok").over(w).alias("cum_tokens"),
            F.sum("nt").over(w).alias("cum_types"),
        )
    )
    pts = curve.select(
        F.floor(F.log(F.col("cum_tokens").cast("double")) * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("cum_types").cast("double")) * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
        "cum_tokens",
        "cum_types",
    )
    moms = pts.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("cum_tokens").alias("total_tokens"),
        F.max("cum_types").alias("total_types"),
    )
    kd = F.col("k").cast("double")
    beta = (kd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        kd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return moms.select(
        "total_tokens",
        "total_types",
        (F.floor(beta * 1000000 + F.lit(0.5)).cast("bigint") / 1000000.0).alias(
            "heaps_beta"
        ),
    )


# --------------------------------------------------------------------------
# q199 — Good-Turing frequency spectrum
# --------------------------------------------------------------------------


@register(
    "q199_good_turing",
    """
    WITH tok AS (
      SELECT unnest(string_split_regex(text, '\\s+')) AS t FROM documents
    ),
    tf AS (SELECT t, count(*) AS r FROM tok GROUP BY t),
    spec AS (SELECT r, count(*) AS n_r FROM tf GROUP BY r)
    SELECT s.r, s.n_r,
           CASE WHEN s2.n_r IS NOT NULL THEN
             CAST(floor(CAST((s.r + 1) * s2.n_r AS DOUBLE) / s.n_r * 1000000
                        + 0.5) AS BIGINT) / 1000000.0
           END AS r_star
    FROM spec s LEFT JOIN spec s2 ON s2.r = s.r + 1
    ORDER BY s.r
    """,
)
def q199_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency spectrum: N_r = how many token types
    occur exactly r times, with the adjusted count
    r* = (r+1) * N_{r+1} / N_r (null when N_{r+1} = 0 — the classic
    estimator is undefined there and smoothing variants diverge, so
    the query reports the raw Turing estimate only where it exists).
    Feeds unseen-mass estimation (P0 = N_1/N) for q191's LM family.

    Determinism: r, N_r are exact; r* is one IEEE division of exact
    integers, floor-scaled to 6dp.

    Scale: two hash aggregations (token counts, then
    frequency-of-frequencies — output rows bounded by max frequency)
    and a self-join on consecutive r over that tiny spectrum."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", _WS)).alias("t"))
    tf = tok.groupBy("t").agg(F.count("*").alias("r"))
    spec = tf.groupBy("r").agg(F.count("*").alias("n_r"))
    s2 = spec.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r2"))
    return (
        spec.join(s2, "r", "left")
        .select(
            "r",
            "n_r",
            F.when(
                F.col("n_r2").isNotNull(),
                F.floor(
                    ((F.col("r") + 1) * F.col("n_r2")).cast("double")
                    / F.col("n_r")
                    * 1000000
                    + F.lit(0.5)
                ).cast("bigint")
                / 1000000.0,
            ).alias("r_star"),
        )
        .orderBy("r")
    )


# --------------------------------------------------------------------------
# q200 — weighted percentiles (quantity-weighted price quantiles)
# --------------------------------------------------------------------------


@register(
    "q200_weighted_percentile",
    """
    WITH s AS (
      SELECT l_returnflag AS f,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS w
      FROM lineitem
    ),
    g AS (SELECT f, c, sum(w) AS w FROM s GROUP BY f, c),
    t AS (SELECT f, sum(w) AS tot FROM s GROUP BY f),
    cum AS (
      SELECT f, c, sum(w) OVER (PARTITION BY f ORDER BY c) AS cumw FROM g
    )
    SELECT cum.f AS l_returnflag,
           CAST(min(CASE WHEN cumw * 100 >= 50 * tot THEN c END) AS DOUBLE)
             / 100.0 AS wp50,
           CAST(min(CASE WHEN cumw * 100 >= 90 * tot THEN c END) AS DOUBLE)
             / 100.0 AS wp90
    FROM cum JOIN t ON t.f = cum.f
    GROUP BY cum.f
    ORDER BY l_returnflag
    """,
)
def q200_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles: the quantity-weighted p50/p90 of
    extended price per return flag — the weighted PERCENTILE_DISC
    (smallest value whose cumulative weight reaches p of the total),
    which no built-in percentile covers (they weight rows equally;
    inventory/revenue quantiles must weight by units).

    Determinism: values and weights integer-scaled to cents; the
    threshold test cumw*100 >= p*tot is exact BIGINT arithmetic; the
    one double division is presentation.

    Scale: ties collapse FIRST (groupBy (flag, cents) — the window
    then runs over distinct values per group, not raw rows), one
    window cumsum per flag partition, and a 3-row broadcast of the
    totals. The raw fact is touched exactly once."""
    from pyspark.sql.window import Window as W

    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("f"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint").alias("w"),
    )
    g = s.groupBy("f", "c").agg(F.sum("w").alias("w"))
    t = s.groupBy("f").agg(F.sum("w").alias("tot"))
    cum = g.withColumn(
        "cumw", F.sum("w").over(W.partitionBy("f").orderBy("c"))
    )
    j = cum.join(F.broadcast(t), "f")

    def wp(p: int):
        return (
            F.min(
                F.when(F.col("cumw") * 100 >= p * F.col("tot"), F.col("c"))
            ).cast("double")
            / 100.0
        )

    return (
        j.groupBy(F.col("f").alias("l_returnflag"))
        .agg(wp(50).alias("wp50"), wp(90).alias("wp90"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q201 — interval concurrency via sweep-line (no self-join)
# --------------------------------------------------------------------------

_Q201_WIN_S = 300  # each event holds a 5-minute activity window


@register(
    "q201_concurrency_sweep",
    f"""
    WITH iv AS (
      SELECT event_id, ts AS s, ts + INTERVAL {_Q201_WIN_S} SECOND AS e
      FROM events
    )
    SELECT a.event_id,
           count(*) AS n_concurrent
    FROM iv a JOIN iv b
      ON b.s < a.e AND a.s < b.e
    GROUP BY a.event_id
    ORDER BY a.event_id
    """,
)
def q201_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval concurrency: for every event's 5-minute activity
    window, how many windows (its own included) overlap it — the
    load-profile / concurrent-sessions statistic.

    The ORACLE states the quadratic definition (interval self-join);
    the Spark plan is the SWEEP-LINE spelling: overlaps(a) =
    |starts strictly before a.end| - |ends at-or-before a.start|
    (count inclusion-exclusion over a sorted sweep — each term is a
    rank in a global order, computed by sorting starts and ends once
    and counting with window functions), which is O(n log n) with NO
    pair materialization. Choosing different physical algebra on the
    two sides is the point: the equality of results pins the
    inclusion-exclusion identity.

    Determinism: counts of exact timestamp comparisons; ties are
    handled identically on both sides (strict < on starts-vs-end,
    <= on ends-vs-start via the join's a.s < b.e symmetry).

    Scale: two global sorts (the starts rank and the ends rank) via
    range-partitioned window cumsums — at 100 TB both are
    range-exchange + per-partition scans; contrast the oracle's
    self-join, whose output alone is sum(n_concurrent) pairs. The
    single-partition windows here are the local-mode spelling of a
    range-partitioned rank; see q150's two-phase pattern for the
    cluster form."""
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_Q201_WIN_S} SECOND")).alias("e"),
    )
    # rank tables: how many starts are <= t, how many ends are <= t,
    # evaluated by joining each event against sorted unique bounds —
    # expressed with window cumsums over the union of bound points
    starts = iv.groupBy("s").agg(F.count("*").alias("ns"))
    w_s = W.orderBy("s").rowsBetween(W.unboundedPreceding, W.currentRow)
    starts_cum = starts.select(
        F.col("s").alias("t"), F.sum("ns").over(w_s).alias("starts_le")
    )
    ends = iv.groupBy("e").agg(F.count("*").alias("ne"))
    w_e = W.orderBy("e").rowsBetween(W.unboundedPreceding, W.currentRow)
    ends_cum = ends.select(
        F.col("e").alias("t"), F.sum("ne").over(w_e).alias("ends_le")
    )
    # starts strictly before a.e == starts_le at the greatest bound
    # point < a.e; with all starts/e on the same second grid the
    # as-of lookup is an equi-join on the point itself when present.
    # Events share the grid (e = s + fixed window), so every a.e and
    # a.s IS a bound point when any event starts/ends there — handle
    # the general case with an as-of join on the sorted point table.
    from file_appender_spark.operators.asof import asof_join

    a = iv.select("event_id", "s", "e")
    k = F.lit(1).alias("k")
    # n_starts strictly before a.e: as-of at e - 1 microsecond
    probe_e = a.select(
        "event_id", k, (F.col("e") - F.expr("INTERVAL 1 MICROSECOND")).alias("t")
    )
    sb = asof_join(
        probe_e,
        starts_cum.select(k, "t", "starts_le"),
        on="k",
        ts="t",
        value_cols=["starts_le"],
    ).select("event_id", F.coalesce("starts_le", F.lit(0)).alias("nsb"))
    # n_ends at-or-before a.s
    probe_s = a.select("event_id", k, F.col("s").alias("t"))
    eb = asof_join(
        probe_s,
        ends_cum.select(k, "t", "ends_le"),
        on="k",
        ts="t",
        value_cols=["ends_le"],
    ).select("event_id", F.coalesce("ends_le", F.lit(0)).alias("neb"))
    return (
        a.join(sb, "event_id")
        .join(eb, "event_id")
        .select(
            "event_id",
            (F.col("nsb") - F.col("neb")).cast("bigint").alias("n_concurrent"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# q202 — clamped running balance (bounded-state sequential fold)
# --------------------------------------------------------------------------

_Q202_CAP = 100_000  # balance ceiling in cents ($1000); floor is 0


@register(
    "q202_clamped_balance",
    f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT)
               * (CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS d,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, rn,
             CAST(least(greatest(d, 0), {_Q202_CAP}) AS BIGINT) AS bal
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.rn,
             CAST(least(greatest(r.bal + e.d, 0), {_Q202_CAP}) AS BIGINT)
      FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, event_id, bal AS balance_cents
    FROM r ORDER BY user_id, event_id
    """,
)
def q202_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance per user: credits (any event) and
    debits ('error' events) accumulate, saturating at [0, $1000] —
    inventory/wallet semantics. The clamp makes every step depend on
    the SATURATED previous value, so no window frame or prefix
    decomposition expresses it (the textbook case for custom
    sequential state); the oracle states it as a recursive CTE, the
    Spark side as one per-user HOF fold — two independent sequential
    formulations.

    Scale contract: state is PER USER and per-user event counts are
    business-bounded (replication adds users, not depth — the 10x
    replica remaps user ids), so the fold's input array stays small
    no matter the corpus; the groupBy shuffles each user's events
    once. The fold appends to its output array per step (O(n^2)
    copies per user) — priced and fine at bounded n; the streaming
    production form of the same state machine IS implemented:
    streaming/ops.py::clamped_balance_with_state, batch==streaming
    equivalence pinned in tests/test_streaming.py."""
    from file_appender_spark.operators.textstats import let_expr

    ev = _t(spark, sf_dir, "events")
    d = (
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        * F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    )
    g = ev.select(
        "user_id", F.struct("ts", "event_id", d.alias("d")).alias("s")
    ).groupBy("user_id").agg(F.collect_list("s").alias("a"))

    def fold(arr):
        init = F.struct(
            F.lit(0).cast("bigint").alias("bal"),
            F.expr(
                "CAST(array() AS array<struct<event_id: bigint, bal: bigint>>)"
            ).alias("out"),
        )

        def merge(acc, s):
            nb = F.least(
                F.greatest(acc["bal"] + s["d"], F.lit(0).cast("bigint")),
                F.lit(_Q202_CAP).cast("bigint"),
            )

            def with_nb(b):
                return F.struct(
                    b.alias("bal"),
                    F.concat(
                        acc["out"],
                        F.array(
                            F.struct(
                                s["event_id"].alias("event_id"),
                                b.alias("bal"),
                            )
                        ),
                    ).alias("out"),
                )

            return let_expr(nb, with_nb)

        return F.aggregate(F.array_sort(arr), init, merge, lambda a: a["out"])

    return (
        g.select("user_id", F.explode(fold(F.col("a"))).alias("o"))
        .select(
            "user_id",
            F.col("o.event_id").alias("event_id"),
            F.col("o.bal").alias("balance_cents"),
        )
        .orderBy("user_id", "event_id")
    )
