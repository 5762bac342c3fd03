"""Text-analysis operators: tokenization, n-grams, TF-IDF, quality
gates — reusable forms of the queries/llm.py inventory, all pure
Catalyst expressions (no Python in the row loop)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE = r"\s+"
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col, pattern: str = WHITESPACE) -> Column:
    return F.split(col if isinstance(col, Column) else F.col(col), pattern)


def ngrams(tok_col: Column, n: int) -> Column:
    """Word n-grams via sequence+transform — JVM-side, no UDF.

    Guarded for short inputs: sequence(1, 0) would DESCEND in Spark
    (default step -1) and index out of range, so fewer than n tokens
    yields an empty array."""
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok_col, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("term"))
    return tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact smoothed TF-IDF: idf = ln((N+1)/(df+1)) + 1."""
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n = df.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
