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


def let_expr(col, fn) -> Column:
    """Explicit let-binding for expression trees: evaluate ``col``
    ONCE per row and reference it freely inside ``fn``.

    Why: Catalyst's CollapseProject inlines a projected expression
    into every reference site — through exchanges and inside
    higher-order-function lambdas, where whole-stage-codegen common-
    subexpression elimination does not reach. N-gramming over an
    inline ``split(text)`` therefore re-splits the text at every
    ``element_at``: ~n x (len-n) regex splits per document — measured
    11.3s -> 0.6s (20x) on a 4000-doc shingling batch at sf0.1 once
    bound. ``transform``'s lambda variable IS evaluated once per
    element, so a 1-element array wrap gives the let."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def ngrams(tok_col: Column, n: int) -> Column:
    """Word n-grams via sequence+transform — JVM-side, no UDF, with
    the token array let-bound (callers pass ``split(text)`` inline;
    see let_expr for why that would otherwise re-split per gram).

    Guarded for short inputs: sequence(1, 0) would DESCEND in Spark
    (default step -1) and index out of range, so fewer than n tokens
    yields an empty array."""

    def build(t):
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let_expr(tok_col, build)


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
