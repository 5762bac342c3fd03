"""Round-6 tranche 11: sequence-mining + stylometry operators
(q227-q231).

- q227: Markov entropy rate contributions of the event-type chain —
  per-state conditional entropy H_i = -(1/N) sum_j c_ij ln(c_ij/c_i)
  (Shannon 1948), the predictability signal behind session-path
  anomaly detection (a state whose next hop is near-deterministic is
  a funnel; near-uniform is browsing).
- q228: Burrows' Delta stylometry (Burrows 2002) between sources —
  mean absolute z-score difference over the 20 most frequent words,
  the standard authorship/register distance; near-zero Delta between
  two "different" crawl sources means one scraper wearing two hats.
- q229: transition lift matrix — observed/expected ratio per
  (from, to) event-type pair (PMI's ratio form, q118's device on the
  transition graph), integer cross-multiplied over-representation.
- q230: session market-basket lift (Agrawal 1993's support/lift on
  (user, day) baskets of event types) — co-occurrence, where q229 is
  adjacency.
- q231: document-frequency stopword discovery — tokens appearing in
  >30% of documents (the corpus-derived stopword list the q59/q154
  quality features assume; cross-multiplied df*10 > nd*3 test).

Determinism: every count is BIGINT; q227's per-transition entropy
terms and q228's per-word |z| differences floor-scale to integers
BEFORE their sums (q191's discipline); q228's per-million word
frequencies use exact integer floor-division so the moment sums stay
BIGINT; lifts are single IEEE ratios of exact integers rounded 6dp
with integer cross-multiplied flags.

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's event-analytics
and text-analysis families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import _WS
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q227 — Markov entropy rate contributions per state
# ---------------------------------------------------------------------------


@register(
    "q227_markov_entropy",
    """
    WITH seq AS (
      SELECT event_type AS f,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t
      FROM events
    ),
    tr AS (SELECT f, t, CAST(count(*) AS BIGINT) AS c FROM seq
           WHERE t IS NOT NULL GROUP BY f, t),
    fi AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM tr GROUP BY f),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM tr),
    terms AS (
      SELECT tr.f, tr.c,
             CAST(floor(CAST(tr.c AS DOUBLE)
                        * ln(CAST(tr.c AS DOUBLE) / fi.cf)
                        * 1000000000 / nt + 0.5) AS BIGINT) AS term_nano
      FROM tr JOIN fi USING (f) CROSS JOIN n
    )
    SELECT f AS from_state, CAST(sum(c) AS BIGINT) AS n_out,
           round(-CAST(sum(term_nano) AS DOUBLE) / 1000000000, 6)
             AS h_contrib_nats
    FROM terms GROUP BY f
    """,
)
def q227_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state entropy-rate contributions of the empirical event
    Markov chain: H = sum over states of h_contrib, where each
    (from, to) transition contributes -(c/N) ln(c/c_from). Every log
    argument is one IEEE ratio of exact counts and every term is
    floor-scaled to 1e-9 integers before the per-state sum (5 terms —
    a raw double sum would be order-dependent).

    Scale: the lead window partitions BY USER; the transition matrix
    is |event_types|² rows (bounded), everything after the first
    groupBy is tiny; the N scalar rides a 1-row broadcast. Same
    transition extraction as q178's PageRank."""
    e = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(wu).alias("t"),
    ).filter(F.col("t").isNotNull())
    tr = seq.groupBy("f", "t").agg(F.count("*").cast("long").alias("c"))
    fi = tr.groupBy("f").agg(F.sum("c").cast("long").alias("cf"))
    n = tr.agg(F.sum("c").cast("long").alias("nt"))
    cd = F.col("c").cast("double")
    term = (
        F.floor(
            cd * F.log(cd / F.col("cf")) * 1000000000 / F.col("nt") + F.lit(0.5)
        )
        .cast("long")
        .alias("term_nano")
    )
    terms = tr.join(fi, "f").crossJoin(F.broadcast(n)).select("f", "c", term)
    return terms.groupBy(F.col("f").alias("from_state")).agg(
        F.sum("c").cast("long").alias("n_out"),
        F.round(
            -F.sum("term_nano").cast("double") / 1000000000, 6
        ).alias("h_contrib_nats"),
    )


# ---------------------------------------------------------------------------
# q228 — Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------

_DELTA_TOP_WORDS = 20


@register(
    "q228_burrows_delta",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(text, '\\s+')) AS t
      FROM documents
    ),
    stot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM tok
             GROUP BY source),
    topw AS (
      SELECT t FROM (SELECT t, count(*) AS c FROM tok GROUP BY t
                     ORDER BY c DESC, t LIMIT {_DELTA_TOP_WORDS})
    ),
    cnt AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
            FROM tok JOIN topw USING (t) GROUP BY source, t),
    grid AS (
      SELECT stot.source, topw.t, stot.n_s, coalesce(cnt.c, 0) AS c
      FROM stot CROSS JOIN topw
      LEFT JOIN cnt ON cnt.source = stot.source AND cnt.t = topw.t
    ),
    fi AS (SELECT source, t, (c * 1000000) // n_s AS f FROM grid),
    ws AS (
      SELECT t, CAST(count(*) AS BIGINT) AS s,
             CAST(sum(f) AS BIGINT) AS sf, CAST(sum(f * f) AS BIGINT) AS sff
      FROM fi GROUP BY t
    ),
    z AS (
      SELECT fi.source, fi.t,
             CASE WHEN ws.s * ws.sff - ws.sf * ws.sf > 0
                  THEN (CAST(ws.s AS DOUBLE) * fi.f - ws.sf)
                       / sqrt((CAST(ws.s AS DOUBLE) * ws.sff
                               - CAST(ws.sf AS DOUBLE) * ws.sf)
                              * ws.s / (ws.s - 1.0))
                  ELSE 0.0 END AS zv
      FROM fi JOIN ws USING (t)
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(CAST(floor(abs(a.zv - b.zv) * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS d_micro,
             CAST(count(*) AS BIGINT) AS m
      FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, round(CAST(d_micro AS DOUBLE) / m / 1000000, 6)
             AS delta
    FROM pairs
    """,
)
def q228_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair: mean |z_a - z_b| over
    the 20 corpus-wide most frequent words, where z standardizes each
    word's per-million frequency across sources (sample stddev). The
    register/authorship distance — two sources with near-zero Delta
    are stylistically one source. Per-million frequencies are exact
    integer floor-divisions (moments stay BIGINT: f <= 1e6, 20
    sources => sum f² <= 2e13); each z is one guarded IEEE
    expression; each |z_a - z_b| floor-scales to 1e-6 BEFORE the
    20-term sum.

    Scale: one token groupBy carries the corpus; the top-word list is
    a 20-row broadcast, the dense grid |sources| x 20, and the pair
    join |sources|² x 20 — all dashboard-sized after the first
    aggregate. The top-k orderBy runs on the token marginal (Zipf
    head), not rows."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", _WS)).alias("t"))
    stot = tok.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    topw = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("t"))
        .limit(_DELTA_TOP_WORDS)
        .select("t")
    )
    cnt = (
        tok.join(F.broadcast(topw), "t")
        .groupBy("source", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    grid = (
        stot.crossJoin(F.broadcast(topw))
        .join(cnt, ["source", "t"], "left")
        .select(
            "source", "t", "n_s", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
    )
    fi = grid.select(
        "source", "t", F.expr("(c * 1000000) div n_s").alias("f")
    )
    ws = fi.groupBy("t").agg(
        F.count("*").cast("long").alias("s"),
        F.sum("f").cast("long").alias("sf"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("sff"),
    )
    sd, sfd = F.col("s").cast("double"), F.col("sf").cast("double")
    zv = F.when(
        F.col("s") * F.col("sff") - F.col("sf") * F.col("sf") > 0,
        (sd * F.col("f") - F.col("sf"))
        / F.sqrt(
            (sd * F.col("sff") - sfd * F.col("sf"))
            * F.col("s")
            / (F.col("s") - F.lit(1.0))
        ),
    ).otherwise(F.lit(0.0))
    z = fi.join(ws, "t").select("source", "t", zv.alias("zv"))
    a = z.select(F.col("source").alias("src_a"), "t", F.col("zv").alias("za"))
    b = z.select(
        F.col("source").alias("src_b"), F.col("t").alias("tb"), F.col("zv").alias("zb")
    )
    pairs = (
        a.join(b, (F.col("t") == F.col("tb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.floor(F.abs(F.col("za") - F.col("zb")) * 1000000 + F.lit(0.5))
                .cast("long")
            )
            .cast("long")
            .alias("d_micro"),
            F.count("*").cast("long").alias("m"),
        )
    )
    return pairs.select(
        "src_a",
        "src_b",
        F.round(F.col("d_micro").cast("double") / F.col("m") / 1000000, 6).alias(
            "delta"
        ),
    )


# ---------------------------------------------------------------------------
# q229 — event-type transition lift matrix
# ---------------------------------------------------------------------------


@register(
    "q229_transition_lift",
    """
    WITH seq AS (
      SELECT event_type AS f,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t
      FROM events
    ),
    tr AS (SELECT f, t, CAST(count(*) AS BIGINT) AS c FROM seq
           WHERE t IS NOT NULL GROUP BY f, t),
    fi AS (SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM tr GROUP BY f),
    ti AS (SELECT t, CAST(sum(c) AS BIGINT) AS ct FROM tr GROUP BY t),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM tr)
    SELECT tr.f AS from_state, tr.t AS to_state, tr.c AS n_transitions,
           round(CAST(tr.c AS DOUBLE) * nt / (CAST(cf AS DOUBLE) * ct), 6)
             AS lift,
           CASE WHEN tr.c * nt > cf * ct THEN 1 ELSE 0 END AS over_represented
    FROM tr JOIN fi USING (f) JOIN ti USING (t) CROSS JOIN n
    """,
)
def q229_transition_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift of every event-type transition: observed/expected under
    marginal independence, P(to|from)/P(to) — q118's PMI device on
    the transition graph (lift is PMI's ratio form; q227 gives the
    same matrix's entropy view). The flag is the integer
    cross-multiplied test c*N > c_from*c_to, immune to the division.

    Scale: q227's transition extraction (user-partitioned lead);
    matrix and marginals are |event_types|-bounded; N broadcasts."""
    e = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(wu).alias("t"),
    ).filter(F.col("t").isNotNull())
    tr = seq.groupBy("f", "t").agg(F.count("*").cast("long").alias("c"))
    fi = tr.groupBy("f").agg(F.sum("c").cast("long").alias("cf"))
    ti = tr.groupBy("t").agg(F.sum("c").cast("long").alias("ct"))
    n = tr.agg(F.sum("c").cast("long").alias("nt"))
    return (
        tr.join(fi, "f")
        .join(ti, "t")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("f").alias("from_state"),
            F.col("t").alias("to_state"),
            F.col("c").alias("n_transitions"),
            F.round(
                F.col("c").cast("double") * F.col("nt")
                / (F.col("cf").cast("double") * F.col("ct")),
                6,
            ).alias("lift"),
            F.when(
                F.col("c") * F.col("nt") > F.col("cf") * F.col("ct"), 1
            )
            .otherwise(0)
            .alias("over_represented"),
        )
    )


# ---------------------------------------------------------------------------
# q230 — session market-basket lift over (user, day) baskets
# ---------------------------------------------------------------------------


@register(
    "q230_session_basket",
    """
    WITH se AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             event_type
      FROM events
    ),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n
           FROM (SELECT DISTINCT user_id, d FROM se)),
    item AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM se
             GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM se a JOIN se b ON a.user_id = b.user_id AND a.d = b.d
                         AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, c_ab, ia.c AS c_a, ib.c AS c_b,
           round(CAST(c_ab AS DOUBLE) * n / (CAST(ia.c AS DOUBLE) * ib.c), 6)
             AS lift,
           round(CAST(c_ab AS DOUBLE) / n, 6) AS support
    FROM pair JOIN item ia ON ia.event_type = item_a
              JOIN item ib ON ib.event_type = item_b
              CROSS JOIN ns
    """,
)
def q230_session_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket support/lift (Agrawal et al. 1993) between event
    types co-occurring in the same (user, day) basket — co-presence,
    where q229 measures adjacency. Counts exact; lift one IEEE ratio.

    Scale: baskets are the distinct (user, day, type) frame; the pair
    self-join is an equi-join on the basket key with per-basket
    fanout bounded by |event_types| (constant) — never event fanout;
    the item marginals broadcast."""
    e = _t(spark, sf_dir, "events")
    se = e.select(
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("d"),
        "event_type",
    ).distinct()
    ns = se.select("user_id", "d").distinct().agg(
        F.count("*").cast("long").alias("n")
    )
    item = se.groupBy("event_type").agg(F.count("*").cast("long").alias("c"))
    a = se.select("user_id", "d", F.col("event_type").alias("item_a"))
    b = se.select(
        F.col("user_id").alias("ub"), F.col("d").alias("db"),
        F.col("event_type").alias("item_b"),
    )
    pair = (
        a.join(
            b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("d") == F.col("db"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    ia = item.select(F.col("event_type").alias("item_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("event_type").alias("item_b"), F.col("c").alias("c_b"))
    return (
        pair.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(ns))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("c_a").cast("double") * F.col("c_b")),
                6,
            ).alias("lift"),
            F.round(F.col("c_ab").cast("double") / F.col("n"), 6).alias("support"),
        )
    )


# ---------------------------------------------------------------------------
# q231 — document-frequency stopword discovery
# ---------------------------------------------------------------------------


@register(
    "q231_stopword_discovery",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\\s+')))
               AS t
      FROM documents
    ),
    df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY t),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
    SELECT t AS token, df, nd AS n_docs,
           round(CAST(df AS DOUBLE) / nd, 6) AS df_share
    FROM df, n
    WHERE df * 10 > nd * 3
    """,
)
def q231_stopword_discovery(
    spark: SparkSession, sf_dir: str, *, stats_dir: str | None = None
) -> DataFrame:
    """Corpus-derived stopword list: tokens whose DOCUMENT frequency
    exceeds 30% (cross-multiplied df*10 > nd*3 — no division in the
    predicate). The q59/q154 quality features assume a stopword
    lexicon; this derives it from the corpus itself, the
    language-agnostic first step of every tokenizer pipeline.

    Scale: per-doc distinct tokens explode once (array_distinct
    before the explode bounds fanout at doc vocabulary); one
    map-side-combined groupBy; the doc count is a 1-row broadcast.
    Output is the Zipf head — tiny.

    ``stats_dir`` (opt-in) reads document frequencies and the doc
    count from a materialized operators/corpusstats.py store (df per
    token = sum of per-source df, exact because every doc has one
    source) — no corpus scan (equivalence pinned in
    tests/test_corpusstats.py)."""
    if stats_dir is not None:
        from file_appender_spark.operators.corpusstats import (
            read_source_stats,
            read_token_stats,
        )

        df = (
            read_token_stats(spark, stats_dir)
            .groupBy(F.col("token").alias("t"))
            .agg(F.sum("df").cast("long").alias("df"))
        )
        n = read_source_stats(spark, stats_dir).agg(
            F.sum("n_docs").cast("long").alias("nd")
        )
    else:
        d = _t(spark, sf_dir, "documents")
        tok = d.select(
            F.explode(F.array_distinct(F.split("text", _WS))).alias("t")
        )
        df = tok.groupBy("t").agg(F.count("*").cast("long").alias("df"))
        n = d.agg(F.count("*").cast("long").alias("nd"))
    return (
        df.crossJoin(F.broadcast(n))
        .filter(F.col("df") * 10 > F.col("nd") * 3)
        .select(
            F.col("t").alias("token"),
            "df",
            F.col("nd").alias("n_docs"),
            F.round(F.col("df").cast("double") / F.col("nd"), 6).alias("df_share"),
        )
    )
