"""Benford leading-digit conformance profiling — the fraud /
synthetic-data smell test of the data-quality family (q104 checks
constraints; this checks the VALUE DISTRIBUTION's first digits
against Benford's law, which naturally-occurring multi-magnitude
quantities follow and fabricated or truncated data usually does not).

One map-side-combined aggregation to 9 digit groups, then the
chi-square-style deviation statistic on the tiny result — the same
exact-integer-counts discipline as q142/q128 (both engines would
derive identical doubles, should this ever grow an oracle face).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

# P(leading digit = d) = log10(1 + 1/d)
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def leading_digit_profile(df: DataFrame, col: str) -> DataFrame:
    """Observed vs expected leading-digit distribution of |col|
    (zeros and nulls excluded — they have no leading digit).
    Returns (digit, n, observed_p, benford_p) for digits 1-9,
    including zero-count digits."""
    # first nonzero digit via translate-then-first-char: strip the
    # characters that can precede it in any rendering ('0', '.', sign,
    # exponent markers — scientific notation keeps the mantissa's
    # leading digit first, so the first surviving char IS the leading
    # digit). translate is a table lookup per char; the regex form
    # ('[^1-9]*([1-9]).*' + replace) cost ~8x more per row and made
    # the 10x probe read as heavy linear CPU.
    lead = F.substring(
        F.translate(F.abs(F.col(col)).cast("string"), "0.-eE+", ""), 1, 1
    )
    counts = (
        df.filter(F.col(col).isNotNull() & (F.abs(F.col(col)) > 0))
        .select(lead.cast("int").alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    expected = F.array(*[F.lit(BENFORD_P[d]) for d in range(1, 10)])
    total = F.sum("n").over(W.partitionBy())
    return (
        digits.join(counts, "digit", "left")
        .na.fill({"n": 0})
        .withColumn("_tot", total)
        .select(
            "digit",
            "n",
            F.round(F.col("n") * 1.0 / F.greatest(F.col("_tot"), F.lit(1)), 6).alias(
                "observed_p"
            ),
            F.round(F.element_at(expected, F.col("digit")), 6).alias("benford_p"),
        )
    )


def benford_deviation(df: DataFrame, col: str) -> float:
    """Single-number conformance score: the chi-square-style deviation
    sum((obs - exp)^2 / exp) over the nine digit fractions. ~0 for
    Benford-conforming data; large for uniform/fabricated values.
    Collects only the 9-row profile."""
    rows = leading_digit_profile(df, col).collect()
    total = sum(r["n"] for r in rows)
    if total == 0:
        raise ValueError(f"no nonzero values in {col!r}: Benford undefined")
    dev = 0.0
    for r in rows:
        obs = r["n"] / total
        exp = BENFORD_P[r["digit"]]
        dev += (obs - exp) ** 2 / exp
    return dev
