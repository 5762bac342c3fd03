"""Round-6 tranche 19: budget-concentration + robust-location
operators (q250-q252).

- q250: token Lorenz curve — what share of corpus TOKENS the top
  1/5/10/25/50% LONGEST documents hold (the budget-concentration
  companion to q249's length histogram: if 1% of docs carry 30% of
  tokens, chunking policy dominates the pipeline's cost).
- q251: script consistency per language — ASCII character share as
  exact removal-length differences; a 'zh'-labeled corpus that is
  100% ASCII is mislabeled or transliterated (the character-level
  companion to q242's word-marker confusion).
- q252: 10% trimmed mean of event value per type (the robust
  location between q14's mean and q100's MAD family): occurrences
  weighted by their EXACT rank-band overlap with (0.1n, 0.9n] in
  integer tenth-units — fractional trimming without floats.

Determinism: all counts/weights are exact BIGINT; q250/q252 select
and weight over distinct-value frames (q200/q215's device); final
shares divide exact integers inside round(.., 6).

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's statistics and
text-analysis families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import _WS
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q250 — token Lorenz curve over document lengths
# ---------------------------------------------------------------------------


@register(
    "q250_token_lorenz",
    """
    WITH ntok AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n_tok) AS BIGINT) AS tt FROM ntok),
    byv AS (SELECT n_tok, CAST(count(*) AS BIGINT) AS cnt FROM ntok
            GROUP BY n_tok),
    cum AS (
      SELECT n_tok, cnt,
             CAST(sum(cnt) OVER (ORDER BY n_tok DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_docs,
             CAST(sum(n_tok * cnt) OVER (ORDER BY n_tok DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_toks
      FROM byv
    ),
    dec(p) AS (VALUES (1),(5),(10),(25),(50)),
    pick AS (
      SELECT p, min(c_docs) AS docs_at, min_by(c_toks, c_docs) AS toks_at
      FROM cum JOIN dec ON 100 * c_docs >= p * (SELECT nd FROM tot)
      GROUP BY p
    )
    SELECT p AS top_doc_pct, docs_at AS n_docs_in_top,
           round(CAST(toks_at AS DOUBLE) / (SELECT tt FROM tot), 6)
             AS token_share
    FROM pick
    """,
)
def q250_token_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token concentration in the longest documents: for each top-p%
    cut (by length) the exact smallest document prefix reaching p%
    and its token share — the Lorenz points that say whether a
    handful of giant documents dominate the training budget (q243's
    Hill alpha is the parametric tail summary; this is the curve).

    Scale: one groupBy(distinct length) carries the corpus; the
    cumulative window runs over the value domain (q215's bound); the
    percent table is a 5-row broadcast."""
    d = _t(spark, sf_dir, "documents")
    ntok = d.select(F.size(F.split("text", _WS)).cast("long").alias("n_tok"))
    tot = ntok.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("n_tok").cast("long").alias("tt"),
    )
    byv = ntok.groupBy("n_tok").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy(F.col("n_tok").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = byv.select(
        F.sum("cnt").over(w).cast("long").alias("c_docs"),
        F.sum(F.col("n_tok") * F.col("cnt")).over(w).cast("long").alias("c_toks"),
    )
    dec = spark.createDataFrame([(1,), (5,), (10,), (25,), (50,)], "p int")
    pick = (
        cum.crossJoin(F.broadcast(tot))
        .join(F.broadcast(dec), 100 * F.col("c_docs") >= F.col("p") * F.col("nd"))
        .groupBy("p", "tt")
        .agg(
            F.min("c_docs").alias("docs_at"),
            F.min_by("c_toks", "c_docs").alias("toks_at"),
        )
    )
    return pick.select(
        F.col("p").alias("top_doc_pct"),
        F.col("docs_at").alias("n_docs_in_top"),
        F.round(F.col("toks_at").cast("double") / F.col("tt"), 6).alias(
            "token_share"
        ),
    )


# ---------------------------------------------------------------------------
# q251 — script consistency per language
# ---------------------------------------------------------------------------


@register(
    "q251_script_consistency",
    """
    SELECT lang,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(sum(n_chars - len(regexp_replace(text, '[\\x00-\\x7F]', '',
                                                 'g'))) AS BIGINT) AS n_ascii,
           round(CAST(sum(n_chars - len(regexp_replace(text, '[\\x00-\\x7F]',
                                                       '', 'g'))) AS DOUBLE)
                 / sum(n_chars), 6) AS ascii_share
    FROM documents GROUP BY lang
    """,
)
def q251_script_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASCII character share per labeled language (exact removal-
    length counts, q248's device at lang granularity): a 'zh' corpus
    that is 100% ASCII is transliterated or mislabeled — the
    character-script cross-check on language metadata, one level
    below q242's word-marker confusion. (This synthetic corpus IS
    all-ASCII, which the cells report honestly.)

    Scale: per-row regexp + one map-side-combined aggregate; |langs|
    output rows."""
    d = _t(spark, sf_dir, "documents")
    ascii_n = (
        F.col("n_chars") - F.length(F.regexp_replace("text", "[\\x00-\\x7F]", ""))
    ).cast("long")
    return d.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("n_chars_total"),
        F.sum(ascii_n).cast("long").alias("n_ascii"),
        F.round(F.sum(ascii_n).cast("double") / F.sum("n_chars"), 6).alias(
            "ascii_share"
        ),
    )


# ---------------------------------------------------------------------------
# q252 — 10% trimmed mean of event value per type
# ---------------------------------------------------------------------------


@register(
    "q252_trimmed_mean",
    """
    WITH v AS (SELECT event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
               FROM events),
    byv AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt FROM v
            GROUP BY event_type, c),
    cum AS (
      SELECT event_type, c, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_g
      FROM byv
    ),
    kept AS (
      SELECT event_type, c,
             least(10 * c_cum, 9 * n_g)
               - greatest(10 * (c_cum - cnt), n_g) AS w10
      FROM cum
    )
    SELECT event_type,
           CAST(sum(w10) AS BIGINT) AS w10_total,
           round(CAST(sum(c * w10) AS DOUBLE) / sum(w10) / 100, 6)
             AS trimmed_mean
    FROM kept WHERE w10 > 0
    GROUP BY event_type
    """,
)
def q252_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed mean of cent-scaled event value per type: each
    distinct value's occurrences are weighted by their EXACT rank-
    band overlap with (0.1n, 0.9n], in integer tenth-units (a value
    straddling the cut contributes its fractional part exactly — no
    float trimming, no per-row sort). The robust location between the
    plain mean (q14, outlier-dragged) and the median (q19/q196,
    throws information away).

    Scale: one groupBy(type, distinct value) with map-side combine;
    the band windows partition by TYPE over the value domain (q215's
    bound); output is |types| rows."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    byv = v.groupBy("event_type", "c").agg(F.count("*").cast("long").alias("cnt"))
    wc = Window.partitionBy("event_type").orderBy("c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    cum = byv.select(
        "event_type",
        "c",
        "cnt",
        F.sum("cnt").over(wc).cast("long").alias("c_cum"),
        F.sum("cnt").over(wall).cast("long").alias("n_g"),
    )
    w10 = F.least(10 * F.col("c_cum"), 9 * F.col("n_g")) - F.greatest(
        10 * (F.col("c_cum") - F.col("cnt")), F.col("n_g")
    )
    kept = cum.select("event_type", "c", w10.alias("w10")).filter(
        F.col("w10") > 0
    )
    return kept.groupBy("event_type").agg(
        F.sum("w10").cast("long").alias("w10_total"),
        F.round(
            F.sum(F.col("c") * F.col("w10")).cast("double")
            / F.sum("w10")
            / 100,
            6,
        ).alias("trimmed_mean"),
    )
