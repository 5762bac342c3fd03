"""Round-6 tranche 8: sequence analytics + corpus-mining operators
the inventory did not yet cover (q209-q214).

- q209: activity streaks (gaps-and-islands) — longest run of
  consecutive active days per user, the classic engagement metric.
- q210: autocorrelation function of the daily event-count series at
  lags 1..7 — seasonality detection; exact BIGINT moments, one IEEE
  expression for r.
- q211: CUSUM changepoint profile over daily spend — mean-shift
  detection as exact integer cumulative deviations (Page 1954); the
  peak day is the argmax changepoint estimate.
- q212: Dunning G² log-likelihood keywords (Dunning 1993, the
  standard corpus-linguistics "distinctive terms" test) — the
  domain-signature signal a mixture tuner reads per source.
- q213: local clustering coefficient over the q52 near-dup graph —
  per-vertex triangle density (boilerplate families cluster; organic
  near-dups do not), refining q183's global count.
- q214: n-gram novelty curve — fraction of each ingestion bucket's
  distinct 8-grams never seen in earlier buckets (Heaps-style
  saturation signal: when novelty collapses, more crawl of the same
  source buys no new data).

Determinism: counts/days are exact BIGINT; every log is computed on
one IEEE ratio of exact integers (q191's discipline) and the G² sum
is a fixed-order two-term addition before floor-scaling; ACF's r and
the clustering coefficient divide exact integers inside round(.., 6)
on both engines.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's statistics and
LLM-pipeline families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.operators.textstats import ngrams
from file_appender_spark.queries.llm import _WS
from file_appender_spark.queries.mining import _gram_sql
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q209 — activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------


@register(
    "q209_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    isl AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
      FROM days
    ),
    runs AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(run_len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def q209_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands shape: island key = epoch-day minus the per-user
    day rank, constant exactly while days are consecutive. Integer
    date arithmetic end to end, nothing to ulp-flip.

    Scale: the window partitions BY USER (no global sort); its input
    is the distinct (user, day) frame — bounded by users x days, far
    below event cardinality — and both groupBys combine map-side.
    The user-day distinct, the window, and both aggregates all share
    the user_id shuffle key, so AQE runs one exchange."""
    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        (
            F.datediff("d", F.to_date(F.lit("1970-01-01")))
            - F.row_number().over(w)
        ).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("run_len").cast("long").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# q210 — autocorrelation of the daily event-count series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7

# guarded: a single-pair lag or a zero-variance window makes either
# sqrt term 0 — ANSI-mode Spark raises DIVIDE_BY_ZERO where the
# oracle yields NULL (review finding). One shared string = one guard
# for both engines.
_ACF_R_SQL = """
CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
  round(
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
    6)
ELSE NULL END
"""


@register(
    "q210_daily_acf",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    series AS (
      SELECT spine.d, coalesce(daily.y, 0) AS y,
             row_number() OVER (ORDER BY spine.d) AS i
      FROM spine LEFT JOIN daily ON daily.d = spine.d
    ),
    lags(k) AS (VALUES {', '.join(f'({k})' for k in range(1, _ACF_MAX_LAG + 1))}),
    pairs AS (
      SELECT k, a.y AS x, b.y AS yv
      FROM series a JOIN lags ON true
      JOIN series b ON b.i = a.i + k
    ),
    mom AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy,
             CAST(sum(x * yv) AS BIGINT) AS sxy
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag, n, {_ACF_R_SQL} AS acf
    FROM mom
    """,
)
def q210_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the zero-filled daily event-count series at
    lags 1..7 — weekly seasonality shows as a lag-7 spike. Pearson r
    between the series and its lag over the overlap window, from six
    exact BIGINT moments; the final r is one fixed IEEE expression
    (exact int->double casts, one division, round 6) identical on
    both engines.

    Scale: daily counts aggregate map-side; the spine/window/self-join
    all operate on the DAY-level frame (bounded: 10 years of days is
    ~3.7k rows regardless of event volume — this is the one place a
    single-partition window is the RIGHT plan, and it is documented,
    like q201's sweep). The lag join is a 7-row broadcast."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("y"))
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = (
        spine.join(daily, "d", "left")
        .select("d", F.coalesce("y", F.lit(0)).alias("y"))
        .select(
            "y", F.row_number().over(Window.orderBy("d")).alias("i")
        )
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = series.select(F.col("y").alias("x"), "i")
    b = series.select(F.col("y").alias("yv"), F.col("i").alias("ib"))
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("ib") == F.col("i") + F.col("k")
    )
    mom = pairs.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("yv")).cast("long").alias("sxy"),
    )
    return mom.select(
        F.col("k").cast("long").alias("lag"),
        "n",
        F.expr(_ACF_R_SQL).alias("acf"),
    )


# ---------------------------------------------------------------------------
# q211 — CUSUM changepoint profile over daily spend
# ---------------------------------------------------------------------------


@register(
    "q211_cusum_changepoint",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS t
      FROM events GROUP BY 1
    ),
    ser AS (
      SELECT d, t,
             row_number() OVER (ORDER BY d) AS i,
             CAST(sum(t) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS pref
      FROM daily
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(t) AS BIGINT) AS tt FROM daily),
    cus AS (SELECT d, n * pref - i * tt AS s_num FROM ser, tot),
    mx AS (SELECT max(abs(s_num)) AS m FROM cus)
    SELECT d, s_num,
           CASE WHEN 2 * abs(s_num) > m THEN 1 ELSE 0 END AS high_flag,
           CASE WHEN abs(s_num) = m THEN 1 ELSE 0 END AS is_peak
    FROM cus, mx
    """,
)
def q211_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift profile (Page 1954) over daily spend: the
    cumulative deviation from the global daily mean, day by day; its
    absolute peak is the classic single-changepoint estimate, and
    high_flag marks the half-peak neighborhood. Exact arithmetic
    throughout: spend is cent-scaled, and the deviation sum
    sum_{j<=i}(t_j - mean) is cross-multiplied to the integer
    numerator n*prefix_i - i*total (denominator n > 0 shared by every
    row, so flags and argmax are unaffected) — no float accumulation
    to drift cross-engine.

    Scale: the only unbounded work is the daily aggregate (map-side
    combined). The running sum orders by DAY — the same bounded
    single-partition window as q210, documented; the two scalars
    (total, max) broadcast back via 1-row cross joins."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        e.select(F.to_date(F.date_trunc("day", "ts")).alias("d"), cents.alias("c"))
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("t"))
    )
    w = Window.orderBy("d")
    ser = daily.select(
        "d",
        "t",
        F.row_number().over(w).alias("i"),
        F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("pref"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("t").cast("long").alias("tt")
    )
    cus = ser.join(F.broadcast(tot)).select(
        "d", (F.col("n") * F.col("pref") - F.col("i") * F.col("tt")).alias("s_num")
    )
    mx = cus.agg(F.max(F.abs("s_num")).alias("m"))
    return cus.join(F.broadcast(mx)).select(
        "d",
        "s_num",
        F.when(2 * F.abs("s_num") > F.col("m"), 1).otherwise(0).alias("high_flag"),
        F.when(F.abs("s_num") == F.col("m"), 1).otherwise(0).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# q212 — Dunning G² distinctive keywords per source
# ---------------------------------------------------------------------------

_G2_MIN_COUNT = 3
_G2_TOP_K = 10


@register(
    "q212_dunning_keywords",
    f"""
    WITH tk AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS a
      FROM (SELECT source, unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY source, tok
    ),
    st AS (SELECT source, CAST(sum(a) AS BIGINT) AS c FROM tk GROUP BY source),
    gt AS (SELECT tok, CAST(sum(a) AS BIGINT) AS ab FROM tk GROUP BY tok),
    tot AS (SELECT CAST(sum(a) AS BIGINT) AS nn FROM tk),
    g2 AS (
      SELECT tk.source, tk.tok, tk.a,
             CAST(floor((
               tk.a * ln((CAST(tk.a AS DOUBLE) * nn) / (CAST(c AS DOUBLE) * ab))
               + CASE WHEN ab > tk.a THEN
                   (ab - tk.a) * ln((CAST(ab - tk.a AS DOUBLE) * nn)
                                    / (CAST(nn - c AS DOUBLE) * ab))
                 ELSE 0.0 END
             ) * 2000 + 0.5) AS BIGINT) AS g2_milli
      FROM tk JOIN st USING (source) JOIN gt USING (tok) CROSS JOIN tot
      WHERE tk.a >= {_G2_MIN_COUNT}
        AND tk.a * nn > c * ab
    )
    SELECT source, tok, a, g2_milli, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                    ORDER BY g2_milli DESC, tok) AS rnk FROM g2)
    WHERE rnk <= {_G2_TOP_K}
    """,
)
def q212_dunning_keywords(
    spark: SparkSession, sf_dir: str, *, stats_dir: str | None = None
) -> DataFrame:
    """Distinctive keywords per source by Dunning's G² log-likelihood
    ratio (Dunning 1993) — the standard "what vocabulary makes this
    source different" test, restricted to over-represented terms
    (observed > expected, integer cross-multiplied a*N > c*ab). The
    two G² terms are each one ln of a single IEEE ratio of exact
    integers times an exact integer, summed in fixed order and
    floor-scaled to 1e-3 units of 2*G² (q191's log discipline).

    Scale: one groupBy(source, token) with map-side combine carries
    the corpus; source totals (|sources| rows) and the grand total
    (1 row) broadcast; token totals join on the token key. The top-k
    window partitions by source — never global. At 100 TB the token
    marginal is Zipf-skewed and AQE skew-split handles the head, same
    profile as q58/q191.

    ``stats_dir`` (opt-in) reads the (source, token) marginal from a
    materialized operators/corpusstats.py store — the entire corpus
    scan disappears; every downstream term derives from the stats
    table (equivalence pinned in tests/test_corpusstats.py)."""
    if stats_dir is not None:
        from file_appender_spark.operators.corpusstats import read_token_stats

        tk = read_token_stats(spark, stats_dir).select(
            "source", F.col("token").alias("tok"), F.col("tf").alias("a")
        )
    else:
        d = _t(spark, sf_dir, "documents")
        tk = (
            d.select("source", F.explode(F.split("text", _WS)).alias("tok"))
            .groupBy("source", "tok")
            .agg(F.count("*").cast("long").alias("a"))
        )
    st = tk.groupBy("source").agg(F.sum("a").cast("long").alias("c"))
    gt = tk.groupBy("tok").agg(F.sum("a").cast("long").alias("ab"))
    tot = tk.agg(F.sum("a").cast("long").alias("nn"))
    t1 = F.col("a") * F.log(
        (F.col("a").cast("double") * F.col("nn"))
        / (F.col("c").cast("double") * F.col("ab"))
    )
    b = F.col("ab") - F.col("a")
    t2 = F.when(
        b > 0,
        b
        * F.log(
            (b.cast("double") * F.col("nn"))
            / ((F.col("nn") - F.col("c")).cast("double") * F.col("ab"))
        ),
    ).otherwise(F.lit(0.0))
    g2 = (
        tk.join(F.broadcast(st), "source")
        .join(gt, "tok")
        .crossJoin(F.broadcast(tot))
        .filter(
            (F.col("a") >= _G2_MIN_COUNT)
            & (F.col("a") * F.col("nn") > F.col("c") * F.col("ab"))
        )
        .select(
            "source",
            "tok",
            "a",
            F.floor((t1 + t2) * 2000 + F.lit(0.5)).cast("long").alias("g2_milli"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("g2_milli").desc(), F.col("tok")
    )
    return (
        g2.select("*", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= _G2_TOP_K)
    )


# ---------------------------------------------------------------------------
# q213 — local clustering coefficient over the near-dup graph
# ---------------------------------------------------------------------------

# the q52 pair definition, shared verbatim with q183 (llm._Q52_CTES)
from file_appender_spark.queries.llm import _Q52_CTES, _Q52_FINAL  # noqa: E402


@register(
    "q213_clustering_coefficient",
    f"""
    WITH {_Q52_CTES},
    e AS (SELECT d1, d2 FROM ({_Q52_FINAL})),
    und AS (SELECT d1 AS v, d2 AS w FROM e
            UNION ALL SELECT d2, d1 FROM e),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY v),
    tri AS (
      SELECT ab.d1 AS a, ab.d2 AS b, bc.d2 AS c
      FROM e ab
      JOIN e bc ON bc.d1 = ab.d2
      JOIN e ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2
    ),
    vt AS (
      SELECT v, CAST(count(*) AS BIGINT) AS triangles
      FROM (SELECT a AS v FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
      GROUP BY v
    )
    SELECT deg.v AS doc_id, degree,
           coalesce(vt.triangles, 0) AS triangles,
           round(CAST(2 * coalesce(vt.triangles, 0) AS DOUBLE)
                 / (degree * (degree - 1)), 6) AS coeff
    FROM deg LEFT JOIN vt ON vt.v = deg.v
    WHERE degree >= 2
    """,
)
def q213_clustering_coefficient(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_degree: int | None | str = None,
    graph_dir: str | None = None,
) -> DataFrame:
    """Local clustering coefficient of every near-dup-graph vertex
    with degree >= 2: 2*triangles / (degree*(degree-1)) — per-doc
    triangle density. q183 reports ONE global count; this localizes
    it (a boilerplate template family is a near-clique, coeff ~1;
    chains of borderline matches score ~0), which is what a curation
    pass acts on. Triangle/degree arithmetic is exact integers; the
    coefficient is one division of small exact ints inside round 6.

    Scale: same two-equi-join triangle enumeration as q183 (cost
    bounded by per-vertex degree, never vertex-quadratic); degrees
    are one map-side-combined groupBy of the doubled edge list; the
    three-way apex attribution is a union of projections — no new
    join. Shares q52's edge CTE verbatim, so the two oracles cannot
    drift apart. The per-vertex-degree cost is the boilerplate-family
    hole this query's own docstring describes — the production twin
    is operators/graph.py's clustering_coefficients(e, max_degree=
    graph_params_for(m).max_degree), which bounds wedge work to
    m*(cap-1)/2 and reports truncated vertices; per-doc parity vs
    this query is pinned in tests/test_graph.py.

    ``max_degree`` (opt-in, the stats_dir pattern) IS that twin as a
    kwarg: an int forwards the cap, ``"auto"`` sizes it from the edge
    count via graph_params_for (one count over the checkpointed edge
    list), ``None`` (default) keeps the oracle spelling unchanged. A
    cap at or above the true max out-degree is provably exact; a
    binding cap under-reports coeff, never over-reports.

    ``graph_dir`` (opt-in) reads the edge list from a materialized
    operators/pairstore.py store (built from the same documents at
    q52's 0.2 threshold) instead of re-running LSH — composable with
    ``max_degree`` (store edges + capped enumeration is the full
    production shape)."""
    from file_appender_spark.operators.pairstore import q52_edges

    e = q52_edges(spark, sf_dir, graph_dir).select("d1", "d2")
    if max_degree is not None:
        from file_appender_spark.operators.graph import (
            clustering_coefficients,
            graph_params_for,
        )

        # the q52 pair pipeline feeds both the (possible) sizing count
        # and the enumeration — materialize once, don't re-run LSH
        e = e.localCheckpoint(eager=True)
        if max_degree == "auto":
            max_degree = graph_params_for(max(e.count(), 1)).max_degree
        elif isinstance(max_degree, str):
            raise ValueError(
                f"max_degree must be 'auto', None, or an int, got {max_degree!r}"
            )
        return clustering_coefficients(e, max_degree)
    und = e.select(F.col("d1").alias("v")).unionAll(
        e.select(F.col("d2").alias("v"))
    )
    deg = und.groupBy("v").agg(F.count("*").cast("long").alias("degree"))
    ab = e.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    bc = e.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    ac = e.select(F.col("d1").alias("a2"), F.col("d2").alias("c2"))
    tri = ab.join(bc, "b").join(
        ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2"))
    )
    vt = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
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


# ---------------------------------------------------------------------------
# q214 — n-gram novelty curve across ingestion buckets
# ---------------------------------------------------------------------------

_NOV_K = 8
_NOV_BUCKETS = 10
_NOV_GRAM = _gram_sql(_NOV_K)


@register(
    "q214_ngram_novelty",
    f"""
    WITH t AS (
      SELECT doc_id % {_NOV_BUCKETS} AS bucket,
             string_split_regex(text, '\\s+') AS w
      FROM documents
    ),
    bg AS (
      SELECT DISTINCT bucket, g
      FROM (
        SELECT bucket, unnest(list_transform(range(1, len(w) - {_NOV_K - 2}),
                                             i -> md5({_NOV_GRAM}))) AS g
        FROM t WHERE len(w) >= {_NOV_K}
      )
    ),
    firstb AS (SELECT g, min(bucket) AS fb FROM bg GROUP BY g)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN fb = bucket THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(CAST(sum(CASE WHEN fb = bucket THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM bg JOIN firstb USING (g)
    GROUP BY bucket
    """,
)
def q214_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve: split the corpus into 10 deterministic
    ingestion buckets (doc_id mod 10 standing in for crawl batches)
    and measure, per bucket, the fraction of its distinct 8-grams
    first seen THERE — the saturation signal behind "more crawl of
    this source buys nothing new" decisions (the q198 Heaps exponent
    is the parametric cousin; this is the raw curve).

    Scale: grams travel as md5 hashes, never text (q153/q167's
    pattern); one distinct over (bucket, gram), one min-aggregate per
    gram, one bucket rollup — all map-side combinable, no pair join.
    The gram↔firstb join shares the gram-hash shuffle key with the
    min-aggregate, so AQE reuses the exchange."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)
    bg = (
        d.filter(F.size(w) >= _NOV_K)
        .select(
            (F.col("doc_id") % _NOV_BUCKETS).alias("bucket"),
            F.explode(F.transform(ngrams(w, _NOV_K), F.md5)).alias("g"),
        )
        .distinct()
    )
    firstb = bg.groupBy("g").agg(F.min("bucket").alias("fb"))
    novel = F.when(F.col("fb") == F.col("bucket"), 1).otherwise(0)
    return (
        bg.join(firstb, "g")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count("*"), 6
            ).alias("novelty"),
        )
    )
