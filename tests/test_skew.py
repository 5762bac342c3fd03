

def test_salted_join_equals_plain_join(spark, sf_dir):
    """Value-exact vs the unsalted join on a real key (orders x
    lineitem on orderkey), inner and left."""
    from file_appender_spark.operators.skew import salted_join
    from file_appender_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey", "l_quantity"
    )
    for how in ("inner", "left"):
        plain = o.join(li, ["o_orderkey"], how)
        salted = salted_join(o, li, ["o_orderkey"], n_salts=8, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def test_salted_join_spreads_a_hot_key(spark):
    """The mechanism itself: one key holding 90% of rows lands in
    several (key, salt) groups, and results stay exact under
    duplicates on BOTH sides."""
    from pyspark.sql import functions as F

    from file_appender_spark.operators.skew import salted_join

    hot = spark.range(0, 9000).select(
        F.lit(7).alias("k"), (F.col("id") % 13).alias("v")
    )
    cold = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), F.lit(-1).alias("v")
    )
    left = hot.union(cold)
    right = spark.createDataFrame(
        [(7, "hot"), (7, "hot2"), (3, "cold")], "k int, tag string"
    )
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], n_salts=8)
    # 9000 hot k=7 x2 tags + 10 cold k=7 x2 tags + 10 cold k=3 x1 tag
    assert plain.count() == salted.count() == 9000 * 2 + 10 * 2 + 10
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # hot key occupies multiple salt groups
    n_groups = (
        left.withColumn(
            "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(8))
        )
        .filter("k = 7")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_groups > 1
