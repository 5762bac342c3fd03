"""Round-6 tranche 10: robust statistics + dataset-management
operators (q221-q226).

- q221: Theil-Sen estimator (Theil 1950, Sen 1968) of the daily
  event-count trend — the robust median-of-pairwise-slopes line that
  one outage day cannot drag the way OLS (q97) can.
- q222: Spearman rank correlation (Spearman 1904) between per-user
  activity (event count) and spend — monotone association without
  the normality assumption q130's Pearson makes.
- q223: Kruskal-Wallis H (Kruskal & Wallis 1952) across the five
  language groups' document lengths — the k-group generalization of
  q215's Mann-Whitney, same distinct-value tied-rank machinery.
- q224: order-independent corpus fingerprint per source (XOR of
  60-bit md5 prefixes + counts) — the dataset-versioning primitive:
  two snapshots with equal fingerprints hold identical text
  multisets (up to 2^-60 collisions), however they were partitioned.
- q225: Herfindahl-Hirschman concentration of sources within each
  language (+ effective-source count 1/HHI) — the mixture-planning
  signal for "is this language really one crawl in a trenchcoat".
- q226: degree-distribution power-law slope of the q52 near-dup
  graph — log-log OLS over the degree histogram (q198's floor-scaled
  discipline); heavy-tailed degrees mean boilerplate hubs.

Determinism: ranks are doubled to stay integral under ties (q215's
scheme; rank-moment products bound n <~ 1e6 before BIGINT overflow —
declared, same class as q222's docstring note); Theil-Sen's median
SELECTS an existing rounded slope (q200's tie-collapsed rule);
Kruskal-Wallis group contributions floor-scale to 1e-3 integers
before the cross-group sum (5 groups — a double sum would be
order-dependent); fingerprints are exact integer XOR.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's statistics,
governance, and graph families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import _Q52_CTES, _Q52_FINAL
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q221 — Theil-Sen robust trend of daily event counts
# ---------------------------------------------------------------------------


@register(
    "q221_theil_sen",
    """
    WITH daily AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT round((CAST(b.y AS DOUBLE) - a.y) / (b.d - a.d), 6) AS slope
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    grp AS (SELECT slope, CAST(count(*) AS BIGINT) AS cnt FROM pairs
            GROUP BY slope),
    cum AS (
      SELECT slope, cnt,
             CAST(sum(cnt) OVER (ORDER BY slope ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS c_cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n_pairs
      FROM grp
    )
    SELECT n_pairs,
           min(CASE WHEN 2 * c_cum >= n_pairs THEN slope END) AS ts_slope
    FROM cum GROUP BY n_pairs
    """,
)
def q221_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of daily event volume: the median of all
    pairwise day-to-day slopes — up to ~29% contaminated days cannot
    move it (OLS q97 breaks at one). Each slope is one IEEE division
    of exact integers rounded to 6dp; the median SELECTS an existing
    rounded slope via the tie-collapsed cumulative rule (q200), so
    no interpolation arithmetic exists to drift.

    Scale: the pair join runs on the DAY-level aggregate — O(days²)
    pairs is the algorithm's published cost and days are bounded
    (10 years = 3.7k rows = 6.7M pairs) regardless of event volume;
    the daily aggregate itself combines map-side. The slope-median
    windows run over distinct slope values."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("y"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("db") > F.col("da")).select(
        F.round(
            (F.col("yb").cast("double") - F.col("ya")) / (F.col("db") - F.col("da")),
            6,
        ).alias("slope")
    )
    grp = pairs.groupBy("slope").agg(F.count("*").cast("long").alias("cnt"))
    wasc = Window.orderBy("slope").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = grp.select(
        "slope",
        F.sum("cnt").over(wasc).cast("long").alias("c_cum"),
        F.sum("cnt").over(wall).cast("long").alias("n_pairs"),
    )
    return cum.groupBy("n_pairs").agg(
        F.min(
            F.when(2 * F.col("c_cum") >= F.col("n_pairs"), F.col("slope"))
        ).alias("ts_slope")
    )


# ---------------------------------------------------------------------------
# q222 — Spearman rank correlation: user activity vs spend
# ---------------------------------------------------------------------------


@register(
    "q222_spearman",
    """
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    rx AS (
      SELECT x, 2 * (CAST(sum(cnt) OVER (ORDER BY x
               ROWS UNBOUNDED PRECEDING) AS BIGINT) - cnt) + cnt + 1 AS r2
      FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY x)
    ),
    ry AS (
      SELECT y, 2 * (CAST(sum(cnt) OVER (ORDER BY y
               ROWS UNBOUNDED PRECEDING) AS BIGINT) - cnt) + cnt + 1 AS r2
      FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY y)
    ),
    r AS (SELECT rx.r2 AS a, ry.r2 AS b
          FROM u JOIN rx ON rx.x = u.x JOIN ry ON ry.y = u.y),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
             CAST(sum(a * b) AS BIGINT) AS sab,
             CAST(sum(a * a) AS BIGINT) AS saa,
             CAST(sum(b * b) AS BIGINT) AS sbb
      FROM r
    )
    SELECT n,
           CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
             round((CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
             / (sqrt(CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                * sqrt(CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)
           ELSE NULL END AS rho
    FROM mom
    """,
)
def q222_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between each user's event count and cent-scaled
    spend: Pearson over tied-average ranks, with both variables'
    ranks DOUBLED to stay integral (2*below + cnt + 1 per distinct
    value — q215's device), so every moment is an exact BIGINT and
    rho is one IEEE expression. Doubling cancels in rho exactly.
    Declared bound: doubled-rank product moments overflow BIGINT past
    n ~ 1e6 rows — ample for the user-level frame; a corpus-row-level
    Spearman would need the scaled-contribution trick (q223).

    Scale: user aggregate combines map-side; rank frames run over
    DISTINCT x / y values (value-domain bounded windows, q215's
    argument); the joins back are equi-joins on those values."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    u = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("x"),
        F.sum(cents).cast("long").alias("y"),
    )

    def rank2(df: DataFrame, col: str) -> DataFrame:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        g = df.groupBy(col).agg(F.count("*").cast("long").alias("cnt"))
        return g.select(
            col,
            (
                2 * (F.sum("cnt").over(w).cast("long") - F.col("cnt"))
                + F.col("cnt")
                + 1
            ).alias("r2"),
        )

    rx = rank2(u, "x").withColumnRenamed("r2", "a")
    ry = rank2(u, "y").withColumnRenamed("r2", "b")
    r = u.join(rx, "x").join(ry, "y")
    mom = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    # guarded: constant x or y (zero rank variance) zeroes a sqrt —
    # ANSI-mode Spark raises where the oracle yields NULL
    rho = F.when(
        (n * F.col("saa") - sa * sa > 0) & (n * F.col("sbb") - sb * sb > 0),
        F.round(
            (n.cast("double") * F.col("sab") - sa.cast("double") * sb)
            / (
                F.sqrt(n.cast("double") * F.col("saa") - sa.cast("double") * sa)
                * F.sqrt(n.cast("double") * F.col("sbb") - sb.cast("double") * sb)
            ),
            6,
        ),
    ).otherwise(F.lit(None).cast("double"))
    return mom.select("n", rho.alias("rho"))


# ---------------------------------------------------------------------------
# q223 — Kruskal-Wallis H across language groups
# ---------------------------------------------------------------------------


@register(
    "q223_kruskal_wallis",
    """
    WITH g AS (SELECT lang, n_chars AS v FROM documents),
    vals AS (SELECT v, lang, CAST(count(*) AS BIGINT) AS cnt FROM g
             GROUP BY v, lang),
    tv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS tcnt FROM vals GROUP BY v),
    ord_v AS (
      SELECT v, tcnt,
             CAST(sum(tcnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - tcnt
                  AS BIGINT) AS below
      FROM tv
    ),
    rsum AS (
      SELECT vals.lang,
             CAST(sum(vals.cnt) AS BIGINT) AS n_g,
             CAST(sum(vals.cnt * (2 * ord_v.below + ord_v.tcnt + 1))
                  AS BIGINT) AS r2_g
      FROM vals JOIN ord_v ON ord_v.v = vals.v
      GROUP BY vals.lang
    ),
    tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM rsum),
    contrib AS (
      SELECT lang, n_g, r2_g,
             CAST(floor(CAST(r2_g AS DOUBLE) * r2_g / (4 * n_g) * 1000 + 0.5)
                  AS BIGINT) AS c_milli
      FROM rsum
    ),
    s AS (SELECT CAST(sum(c_milli) AS BIGINT) AS sc,
                 CAST(count(*) AS BIGINT) AS n_groups FROM contrib)
    SELECT n, n_groups,
           round(12.0 / (CAST(n AS DOUBLE) * (n + 1))
                 * (CAST(sc AS DOUBLE) / 1000) - 3.0 * (n + 1), 6) AS h
    FROM s, tot
    """,
)
def q223_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five languages' document lengths
    (no tie correction — declared, like q215): H = 12/(n(n+1)) *
    sum(R_g²/n_g) - 3(n+1). Rank sums come from the doubled-tied-rank
    aggregation; each group's R_g²/n_g contribution floor-scales to a
    1e-3 integer BEFORE the cross-group sum, because a 5-term double
    sum is order-dependent and would hash-flip (the q191 discipline,
    applied to rank moments).

    Scale: one groupBy(value, lang) + one value-domain window + one
    5-row group aggregate. Same bounded profile as q215."""
    d = _t(spark, sf_dir, "documents")
    vals = d.select("lang", F.col("n_chars").alias("v")).groupBy("v", "lang").agg(
        F.count("*").cast("long").alias("cnt")
    )
    tv = vals.groupBy("v").agg(F.sum("cnt").cast("long").alias("tcnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ord_v = tv.select(
        "v",
        "tcnt",
        (F.sum("tcnt").over(w) - F.col("tcnt")).cast("long").alias("below"),
    )
    rsum = (
        vals.join(ord_v, "v")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(F.col("cnt") * (2 * F.col("below") + F.col("tcnt") + 1))
            .cast("long")
            .alias("r2_g"),
        )
    )
    contrib = rsum.select(
        "n_g",
        F.floor(
            F.col("r2_g").cast("double") * F.col("r2_g") / (4 * F.col("n_g")) * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("c_milli"),
    )
    s = contrib.agg(
        F.sum("c_milli").cast("long").alias("sc"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n_g").cast("long").alias("n"),
    )
    h = F.round(
        12.0 / (F.col("n").cast("double") * (F.col("n") + 1))
        * (F.col("sc").cast("double") / 1000)
        - 3.0 * (F.col("n") + 1),
        6,
    )
    return s.select("n", "n_groups", h.alias("h"))


# ---------------------------------------------------------------------------
# q224 — order-independent corpus fingerprint per source
# ---------------------------------------------------------------------------


def fingerprint_agg(docs: DataFrame) -> DataFrame:
    """The ONE fingerprint definition (60-bit md5-prefix XOR + doc and
    char counts per source) — shared by q224 and the streaming twin
    (streaming/ops.py::corpus_fingerprint_stream) so the two cannot
    drift apart (review finding); the batch==streaming equivalence
    test pins them equal."""
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    return (
        docs.select("source", "n_chars", h60.alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
            F.expr("bit_xor(h)").cast("long").alias("fingerprint"),
        )
    )


@register(
    "q224_corpus_fingerprint",
    """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT))
                AS BIGINT) AS fingerprint
    FROM documents GROUP BY source
    """,
)
def q224_corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning fingerprint per source: XOR of each text's
    60-bit md5 prefix, plus doc and char counts. XOR is commutative,
    associative and overflow-free, so the fingerprint is identical
    for ANY partitioning/ordering of the same text multiset* — the
    primitive behind "did this source change between snapshots"
    without a diff join (q140 is the full reconciliation; this is
    the O(1)-output tripwire). *XOR cancels even-multiplicity dups —
    the doc count pins multiset size alongside.

    Scale: a pure map-side-combined aggregate — ONE scan, one 20-row
    output; the md5 is the only per-row work."""
    return fingerprint_agg(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q225 — source concentration (HHI) within each language
# ---------------------------------------------------------------------------


@register(
    "q225_source_hhi",
    """
    WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt
               FROM documents GROUP BY lang, source),
    a AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_sources,
                 CAST(sum(cnt * cnt) AS BIGINT) AS ss
          FROM c GROUP BY lang)
    SELECT lang, total AS n_docs, n_sources,
           round(CAST(ss AS DOUBLE) / (CAST(total AS DOUBLE) * total), 6)
             AS hhi,
           round(CAST(total AS DOUBLE) * total / ss, 6) AS effective_sources
    FROM a
    """,
)
def q225_source_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of sources inside each
    language: HHI = sum((c_i/total)²) computed as the exact integer
    pair (sum of squared counts, total²) with ONE IEEE division, plus
    the effective-source count 1/HHI — a language whose "20 sources"
    have effective count 1.4 is one crawl with stragglers, which is
    what the q87 mixture rebalancer needs to know before trusting
    source labels as diversity.

    Scale: two nested map-side-combined aggregates over (lang,
    source); output is |langs| rows. Nothing else."""
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("cnt"))
    a = c.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_sources"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ss"),
    )
    tot_d = F.col("total").cast("double")
    return a.select(
        "lang",
        F.col("total").alias("n_docs"),
        "n_sources",
        F.round(F.col("ss").cast("double") / (tot_d * F.col("total")), 6).alias(
            "hhi"
        ),
        F.round(tot_d * F.col("total") / F.col("ss"), 6).alias(
            "effective_sources"
        ),
    )


# ---------------------------------------------------------------------------
# q226 — near-dup graph degree-distribution power-law slope
# ---------------------------------------------------------------------------


@register(
    "q226_degree_powerlaw",
    f"""
    WITH {_Q52_CTES},
    e AS (SELECT d1, d2 FROM ({_Q52_FINAL})),
    und AS (SELECT d1 AS v FROM e UNION ALL SELECT d2 FROM e),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS k FROM und GROUP BY v),
    hist AS (SELECT k, CAST(count(*) AS BIGINT) AS nk FROM deg GROUP BY k),
    pts AS (
      SELECT CAST(floor(ln(CAST(k AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(CAST(nk AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
      FROM hist
    ),
    moms AS (SELECT CAST(count(*) AS BIGINT) AS m,
                    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    CAST(sum(x * x) AS BIGINT) AS sxx
             FROM pts)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           m AS n_degree_levels,
           CASE WHEN m >= 2
                     AND CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                THEN CAST(floor((CAST(m AS DOUBLE) * sxy
                                 - CAST(sx AS DOUBLE) * sy)
                     / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * 1000000 + 0.5) AS BIGINT) / 1000000.0
                ELSE NULL END AS powerlaw_slope
    FROM moms
    """,
)
def q226_degree_powerlaw(
    spark: SparkSession, sf_dir: str, *, graph_dir: str | None = None
) -> DataFrame:
    """Power-law exponent of the near-dup graph's degree distribution:
    OLS slope over the log-log degree histogram (q198's floor-scaled
    log discipline — each ln quantized to a 1e-4 integer before the
    moment sums, slope floored to 1e-6). A steep negative slope means
    organic near-dups; a flat one means boilerplate hub families the
    dedup pass should cluster first (q213 localizes WHICH docs).

    Scale: degrees are one map-side-combined groupBy of the doubled
    q52 edge list; the histogram and its moments are degree-level
    (bounded by max degree, not vertices); the two count scalars ride
    1-row broadcasts. Guarded NULL when fewer than two degree levels
    exist."""
    from file_appender_spark.operators.pairstore import q52_edges

    e = q52_edges(spark, sf_dir, graph_dir).select("d1", "d2")
    und = e.select(F.col("d1").alias("v")).unionAll(e.select(F.col("d2").alias("v")))
    deg = und.groupBy("v").agg(F.count("*").cast("long").alias("k"))
    hist = deg.groupBy("k").agg(F.count("*").cast("long").alias("nk"))
    lg = lambda c: F.floor(F.log(c.cast("double")) * 10000 + F.lit(0.5)).cast("long")  # noqa: E731
    pts = hist.select(lg(F.col("k")).alias("x"), lg(F.col("nk")).alias("y"))
    moms = pts.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nv = deg.agg(F.count("*").cast("long").alias("n_vertices"))
    ne = e.agg(F.count("*").cast("long").alias("n_edges"))
    m, sx = F.col("m").cast("double"), F.col("sx").cast("double")
    denom = m * F.col("sxx") - sx * F.col("sx")
    slope = F.when(
        (F.col("m") >= 2) & (denom > 0),
        F.floor((m * F.col("sxy") - sx * F.col("sy")) / denom * 1000000 + F.lit(0.5))
        .cast("long")
        / 1000000.0,
    ).otherwise(F.lit(None).cast("double"))
    return (
        moms.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_vertices",
            "n_edges",
            F.col("m").alias("n_degree_levels"),
            slope.alias("powerlaw_slope"),
        )
    )
