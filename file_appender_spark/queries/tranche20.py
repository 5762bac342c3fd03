"""Round-6 tranche 20: collocation mining (q253).

q253: windowed skip-gram PMI — pointwise mutual information of
ordered token pairs within a ±2 window (the word2vec/GloVe
co-occurrence statistic; Church & Hanks 1990's association ratio at
window granularity, where q118's PMI is doc-granular). Top-20
over-represented collocations with min support 5.

Determinism: pair/marginal counts are exact BIGINT; each PMI is ONE
ln of a single IEEE ratio of exact integers, floor-scaled to 1e-6
(q191's discipline); over-representation is the integer
cross-multiplied c*N > ca*cb; ranking ties break by (wa, wb).

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; this extends SURVEY.md §2 Part B's text-analysis
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import _WS
from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


@register(
    "q253_skipgram_pmi",
    f"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w
               FROM documents),
    pairs AS (
      SELECT w[i] AS wa, w[i + k] AS wb
      FROM (SELECT w, unnest(range(1, len(w))) AS i FROM t WHERE len(w) >= 2)
      CROSS JOIN (SELECT unnest([1, 2]) AS k)
      WHERE i + k <= len(w)
    ),
    pc AS (SELECT wa, wb, CAST(count(*) AS BIGINT) AS c FROM pairs
           GROUP BY wa, wb),
    ma AS (SELECT wa, CAST(sum(c) AS BIGINT) AS ca FROM pc GROUP BY wa),
    mb AS (SELECT wb, CAST(sum(c) AS BIGINT) AS cb FROM pc GROUP BY wb),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM pc),
    pmi AS (
      SELECT pc.wa, pc.wb, pc.c,
             CAST(floor(ln(CAST(pc.c AS DOUBLE) * nn
                           / (CAST(ca AS DOUBLE) * cb))
                        * 1000000 + 0.5) AS BIGINT) AS pmi_micro
      FROM pc JOIN ma USING (wa) JOIN mb USING (wb) CROSS JOIN n
      WHERE pc.c >= {_PMI_MIN_COUNT} AND pc.c * nn > ca * cb
    )
    SELECT wa, wb, c, pmi_micro, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY pmi_micro DESC, wa, wb)
                      AS rnk
          FROM pmi)
    WHERE rnk <= {_PMI_TOP_K}
    """,
)
def q253_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by windowed skip-gram PMI: ordered token
    pairs at distance 1-2, scored ln(c*N / (ca*cb)) on exact integer
    counts (one IEEE ratio, floor-scaled 1e-6), restricted to
    over-represented pairs (integer cross-multiply) with support >=
    5. The multi-word-expression miner that seeds tokenizer merge
    candidates beyond q152's frequency-only BPE pairs.

    Scale: positions explode x2 (window width), then ONE
    groupBy(pair) with map-side combine carries the corpus; marginals
    join on token keys (Zipf-skew handled by AQE, q58/q191's
    profile); the global top-20 window runs on the filtered
    over-represented set — at production scale the WindowGroupLimit
    rewrite keeps it a per-partition heap."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)
    # build BOTH window offsets per position inside ONE per-row fold
    # (flatten(transform(...))) so each exploded output row carries
    # two strings, not the whole token array — the position x array
    # duplication of the explode+crossJoin spelling measured x8.6 at
    # 10x before this rewrite (q186's per-position lesson)
    withw = d.filter(F.size(w) >= 2).select(w.alias("w"))
    pair_structs = F.expr(
        "flatten(transform(sequence(1, size(w) - 1), i -> "
        "CASE WHEN i + 2 <= size(w) THEN "
        "  array(struct(w[i - 1] AS wa, w[i] AS wb), "
        "        struct(w[i - 1] AS wa, w[i + 1] AS wb)) "
        "ELSE array(struct(w[i - 1] AS wa, w[i] AS wb)) END))"
    )
    pairs = withw.select(F.explode(pair_structs).alias("s")).select(
        F.col("s.wa").alias("wa"), F.col("s.wb").alias("wb")
    )
    pc = pairs.groupBy("wa", "wb").agg(F.count("*").cast("long").alias("c"))
    ma = pc.groupBy("wa").agg(F.sum("c").cast("long").alias("ca"))
    mb = pc.groupBy("wb").agg(F.sum("c").cast("long").alias("cb"))
    n = pc.agg(F.sum("c").cast("long").alias("nn"))
    pmi = (
        pc.join(ma, "wa")
        .join(mb, "wb")
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("c") >= _PMI_MIN_COUNT)
            & (F.col("c") * F.col("nn") > F.col("ca") * F.col("cb"))
        )
        .select(
            "wa",
            "wb",
            "c",
            F.floor(
                F.log(
                    F.col("c").cast("double") * F.col("nn")
                    / (F.col("ca").cast("double") * F.col("cb"))
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    wr = Window.orderBy(F.col("pmi_micro").desc(), F.col("wa"), F.col("wb"))
    return (
        pmi.select("*", F.row_number().over(wr).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= _PMI_TOP_K)
    )
