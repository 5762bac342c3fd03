"""Round-6 tranche 18: corpus-hygiene profiles (q248-q249).

- q248: character-class profile per source — alpha/digit/whitespace
  character mass as exact integer removal-length differences (the
  binary-junk / log-spam / table-dump detector one tier below q192's
  word-level Gopher rules).
- q249: power-of-two document-length histogram per source — the
  packing-planning length profile (q68's sequence packer and q75's
  chunker need the length SHAPE, not just quantiles), with the
  bucket computed as len(bin(n)) - 1: an EXACT integer floor(log2)
  on both engines (floor(ln(n)/ln(2)) would ulp-flip at exact powers
  of two).

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these extend SURVEY.md §2 Part B's text-analysis
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.registry import register
from file_appender_spark.queries.tpch_extra import _t

# ---------------------------------------------------------------------------
# q248 — character-class profile per source
# ---------------------------------------------------------------------------


@register(
    "q248_charclass_profile",
    """
    SELECT source,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(sum(n_chars - len(regexp_replace(text, '[a-zA-Z]', '', 'g')))
                AS BIGINT) AS n_alpha,
           CAST(sum(n_chars - len(regexp_replace(text, '[0-9]', '', 'g')))
                AS BIGINT) AS n_digit,
           CAST(sum(n_chars - len(regexp_replace(text, '[ \\t\\n]', '', 'g')))
                AS BIGINT) AS n_space,
           round(CAST(sum(n_chars - len(regexp_replace(text, '[a-zA-Z]', '',
                                                       'g'))) AS DOUBLE)
                 / sum(n_chars), 6) AS alpha_share
    FROM documents GROUP BY source
    """,
)
def q248_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class mass per source: alpha/digit/whitespace counts
    as exact length differences after class removal (count = n_chars
    - len(text without the class)) — the binary-junk and table-dump
    detector a notch below word-level quality rules (a source that is
    40% digits is a log dump, whatever its word stats say).

    Scale: pure per-row JVM regexp work + one map-side-combined
    aggregate; output is |sources| rows."""
    d = _t(spark, sf_dir, "documents")

    def removed(pattern):
        return (F.col("n_chars") - F.length(F.regexp_replace("text", pattern, ""))).cast(
            "long"
        )

    return d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("n_chars_total"),
        F.sum(removed("[a-zA-Z]")).cast("long").alias("n_alpha"),
        F.sum(removed("[0-9]")).cast("long").alias("n_digit"),
        F.sum(removed("[ \t\n]")).cast("long").alias("n_space"),
        F.round(
            F.sum(removed("[a-zA-Z]")).cast("double") / F.sum("n_chars"), 6
        ).alias("alpha_share"),
    )


# ---------------------------------------------------------------------------
# q249 — power-of-two length histogram per source
# ---------------------------------------------------------------------------


@register(
    "q249_length_histogram",
    """
    SELECT source,
           CAST(len(bin(CAST(n_chars AS BIGINT))) - 1 AS BIGINT)
             AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_in_bucket
    FROM documents WHERE n_chars > 0
    GROUP BY source, len(bin(CAST(n_chars AS BIGINT))) - 1
    """,
)
def q249_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length histogram per source in power-of-two buckets:
    bucket = floor(log2(n_chars)) computed as len(bin(n)) - 1 — an
    exact INTEGER operation on both engines, where the float spelling
    floor(ln(n)/ln(2)) can ulp-flip at exact powers of two. The
    length SHAPE (not just quantiles) is what q68's packer and q75's
    chunker size their policies against.

    Scale: one expression + one map-side-combined aggregate; output
    bounded by sources x ~64 buckets."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    bucket = (F.length(F.bin(F.col("n_chars").cast("long"))) - 1).cast("long")
    return d.groupBy("source", bucket.alias("log2_bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_in_bucket"),
    )
