"""Python UDTF surface (SURVEY.md §2 Part B UDF/UDAF/UDTF row):
Spark 4's @udtf API — a table function yielding multiple rows per
input. Engine guidance: prefer built-in generators (explode /
posexplode, q64) on hot paths; the UDTF API is the extension point
for logic they can't express."""

from __future__ import annotations

import pytest
from pyspark.sql.functions import udtf, lit


@udtf(returnType="tok string, pos int, is_long boolean")
class Tokenize:
    def eval(self, text: str):
        for i, tok in enumerate(text.split()):
            yield tok, i, len(tok) > 4


def test_python_udtf_lateral(spark):
    spark.udtf.register("tokenize", Tokenize)
    df = spark.createDataFrame(
        [(1, "spark shuffles data fast"), (2, "ok")], "id long, text string"
    )
    df.createOrReplaceTempView("udtf_src")
    out = spark.sql(
        """
        SELECT s.id, t.tok, t.pos, t.is_long
        FROM udtf_src s, LATERAL tokenize(s.text) t
        """
    ).collect()
    got = {(r["id"], r["tok"], r["pos"], r["is_long"]) for r in out}
    assert got == {
        (1, "spark", 0, True),
        (1, "shuffles", 1, True),
        (1, "data", 2, False),
        (1, "fast", 3, False),
        (2, "ok", 0, False),
    }


def test_python_udtf_direct_call(spark):
    rows = Tokenize(lit("a bb ccccc"))
    got = [(r["tok"], r["pos"], r["is_long"]) for r in rows.collect()]
    assert got == [("a", 0, False), ("bb", 1, False), ("ccccc", 2, True)]
