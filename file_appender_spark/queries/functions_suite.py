"""Scalar function families (SURVEY.md §2 Part B): string, date/time,
math, array (incl. higher-order), map, json. One representative
oracle-checked query per family, touching every listed function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.registry import register
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q30_string_funcs",
    """
    SELECT c_custkey,
           upper(c_name)                                   AS up,
           lower(c_mktsegment)                             AS lo,
           substring(c_name, 1, 8)                         AS sub8,
           trim(concat(' ', c_name, ' '))                  AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')        AS padded,
           rpad(c_mktsegment, 12, '.')                     AS rpadded,
           length(c_name)                                  AS name_len,
           instr(c_name, '#')                              AS hash_pos,
           concat_ws('|', c_name, c_mktsegment)            AS joined,
           regexp_extract(c_name, '([0-9]+)', 1)           AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g')       AS masked,
           CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS is_cust,
           split_part(c_name, '#', 1)                      AS first_tok
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
)
def q30_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: substring/upper/lower/trim/pads/split/regexp/
    like/length/instr/concat_ws."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.length("c_name").alias("name_len"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.when(F.col("c_name").like("Customer%"), 1).otherwise(0).alias("is_cust"),
        F.element_at(F.split("c_name", "#"), 1).alias("first_tok"),
    )


@register(
    "q31_date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate)                                   AS yr,
           month(o_orderdate)                                  AS mo,
           day(o_orderdate)                                    AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS DATE)        AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(epoch(o_orderdate) AS BIGINT)                  AS epoch_s,
           make_date(year(o_orderdate), 1, 1)                  AS year_start,
           strftime(o_orderdate, '%Y-%m-%d')                   AS iso_day
    FROM orders
    WHERE o_orderkey % 25 = 0
    """,
)
def q31_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/day, date_trunc, date_add,
    datediff, unix_timestamp, make_date, formatting."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).alias("year_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@register(
    "q32_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                     AS rounded,
           round_even(l_extendedprice, 0)                AS banker,
           abs(l_discount - 0.05)                        AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT)              AS up_qty,
           CAST(floor(l_quantity) AS BIGINT)             AS down_qty,
           round(pow(l_quantity, 2), 4)                  AS qty_sq,
           round(sqrt(l_extendedprice), 6)               AS root_price,
           round(exp(l_discount), 8)                     AS exp_disc,
           round(ln(l_extendedprice + 1), 8)             AS ln_price,
           CAST(l_orderkey AS BIGINT) % 7                AS mod7,
           ((CAST(l_orderkey AS BIGINT) - 3) % 7 + 7) % 7 AS pmod7,
           CAST(sign(l_discount - 0.05) AS INT)          AS sgn
    FROM lineitem
    WHERE l_orderkey % 60 = 0
    """,
)
def q32_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/bround/abs/ceil/floor/pow/sqrt/exp/log/pmod/
    sign."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 60 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("rounded"),
        F.bround("l_extendedprice", 0).alias("banker"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.ceil("l_quantity").alias("up_qty"),
        F.floor("l_quantity").alias("down_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("root_price"),
        F.round(F.exp("l_discount"), 8).alias("exp_disc"),
        F.round(F.log(F.col("l_extendedprice") + 1), 8).alias("ln_price"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.pmod(F.col("l_orderkey") - 3, F.lit(7)).alias("pmod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sgn"),
    )


@register(
    "q33_array_funcs",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents
    )
    SELECT doc_id,
           len(words)                                              AS n_words,
           CAST(list_contains(words, 'data') AS INT)               AS has_data,
           array_to_string(list_sort(list_distinct(words)), ' ')   AS vocab,
           len(list_distinct(words))                               AS n_distinct,
           array_to_string(words[1:5], ' ')                        AS head5,
           words[3]                                                AS third,
           array_to_string(list_transform(words[1:5], w -> upper(w)), ' ') AS head5_up,
           len(list_filter(words, w -> length(w) > 4))             AS n_long,
           list_reduce(list_transform(words, w -> length(w)), (a, b) -> a + b) AS total_chars
    FROM toks
    WHERE doc_id % 5 = 0
    """,
)
def q33_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/filter/aggregate.
    Scale: all JVM-side Catalyst expressions — no Python in the loop."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    words = F.split("text", r"\s+")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "data").cast("int").alias("has_data"),
        F.array_join(F.sort_array(F.array_distinct(words)), " ").alias("vocab"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.array_join(F.slice(words, 1, 5), " ").alias("head5"),
        F.element_at(words, 3).alias("third"),
        F.array_join(
            F.transform(F.slice(words, 1, 5), lambda w: F.upper(w)), " "
        ).alias("head5_up"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "q34_map_funcs",
    """
    SELECT e.event_type,
           count(*)                     AS n,
           round(sum(e.value), 2)       AS total_value,
           min(e.event_id)              AS min_id
    FROM events e
    GROUP BY e.event_type
    """,
)
def q34_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map literal per group, then read it back
    with map_keys/map_values/element_at. The oracle checks the same
    values computed relationally (map construction is Spark-side; the
    extracted scalars must agree)."""
    ev = _t(spark, sf_dir, "events")
    grouped = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_v"),
        F.min("event_id").alias("mn"),
    )
    m = F.create_map(
        F.lit("n"), F.col("cnt").cast("double"),
        F.lit("total"), F.col("sum_v"),
        F.lit("min_id"), F.col("mn").cast("double"),
    )
    with_map = grouped.select("event_type", m.alias("stats"))
    # read back out of the map — element_at + map_keys sanity via size
    return with_map.select(
        "event_type",
        F.element_at("stats", "n").cast("long").alias("n"),
        F.element_at("stats", "total").alias("total_value"),
        F.element_at("stats", "min_id").cast("long").alias("min_id"),
    ).filter(F.size(F.map_keys("stats")) == 3)


@register(
    "q41_map_explode",
    """
    WITH g AS (
      SELECT event_type,
             count(*) FILTER (value >= 100)            AS big,
             count(*) FILTER (value < 100 OR value IS NULL) AS small
      FROM events GROUP BY event_type
    )
    SELECT event_type, k AS bucket, v AS n
    FROM g, LATERAL (VALUES ('big', big), ('small', small)) t(k, v)
    """,
)
def q41_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode over a map column (one row per entry) — the map-family
    generator (SURVEY.md Part B map row). The map is built per group,
    then unrolled; the oracle produces the same rows relationally."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("value") >= 100, 1)).alias("big"),
        F.count(F.when(F.col("value").isNull() | (F.col("value") < 100), 1)).alias(
            "small"
        ),
    )
    m = F.create_map(
        F.lit("big"), F.col("big"), F.lit("small"), F.col("small")
    )
    return (
        g.select("event_type", m.alias("buckets"))
        .select("event_type", F.explode("buckets").alias("bucket", "n"))
    )


@register(
    "q35_json_funcs",
    """
    SELECT event_id,
           json_extract_string(props, '$.k')              AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') IS NULL AS INT) AS missing_null
    FROM events
    WHERE event_id % 7 = 0
    """,
)
def q35_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props (a JSON string column):
    get_json_object / from_json / json_tuple."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().cast("int").alias(
            "missing_null"
        ),
    )


@register(
    "q85_token_set_algebra",
    """
    WITH halves AS (
      SELECT doc_id,
             list_distinct(words[1:len(words)//2])              AS a,
             list_distinct(words[len(words)//2 + 1:len(words)]) AS b
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS words
            FROM documents)
      WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           len(list_filter(a, x -> list_contains(b, x)))     AS n_common,
           len(list_filter(a, x -> NOT list_contains(b, x))) AS n_only_first,
           len(list_distinct(list_concat(a, b)))             AS n_union,
           round(len(list_filter(a, x -> list_contains(b, x)))
                 / len(list_distinct(list_concat(a, b))), 6) AS jaccard
    FROM halves
    """,
)
def q85_token_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / except / union) between the
    distinct token sets of each document's first and second half —
    the split-halves Jaccard self-similarity used as a repetition
    signal in corpus QA.

    Scale: entirely JVM-side array expressions inside one projection —
    no explode, no shuffle, no Python; output is one row per document
    with only small integers. The oracle spells intersect/except as
    list_filter/list_contains because DuckDB's list_intersect makes no
    element-order or dedup guarantee; sizes are engine-identical."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    words = F.split("text", r"\s+")
    half = (F.size(words) / 2).cast("int")
    d2 = d.select(
        "doc_id",
        F.array_distinct(F.slice(words, 1, half)).alias("a"),
        F.array_distinct(
            F.slice(words, half + 1, F.size(words) - half)
        ).alias("b"),
    )
    n_common = F.size(F.array_intersect("a", "b"))
    n_union = F.size(F.array_union("a", "b"))
    return d2.select(
        "doc_id",
        n_common.alias("n_common"),
        F.size(F.array_except("a", "b")).alias("n_only_first"),
        n_union.alias("n_union"),
        F.round(n_common / n_union, 6).alias("jaccard"),
    )


@register(
    "q86_regexp_extract_all",
    """
    SELECT event_id,
           array_to_string(regexp_extract_all(props, '[0-9]+'), '-') AS nums,
           len(regexp_extract_all(props, '[0-9]+'))                  AS n_nums,
           regexp_extract(props, '"k":\\s*([0-9]+)', 1)              AS k_val
    FROM events
    WHERE event_id % 11 = 0
    """,
)
def q86_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + group-capture extraction over the JSON
    props string (digit runs joined positionally, and the "k" value
    by capture group).

    Scale: stateless codegen'd projection — the regex runs inside
    whole-stage codegen on the JVM, no shuffle, no UDF."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    nums = F.expr(r"regexp_extract_all(props, '[0-9]+', 0)")
    return e.select(
        "event_id",
        F.array_join(nums, "-").alias("nums"),
        F.size(nums).alias("n_nums"),
        F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).alias("k_val"),
    )


@register(
    "q94_variant_extract",
    """
    SELECT event_type,
           count(*)                                                  AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q94_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once, then typed path extraction — the open-schema
    column pattern (store anything, pay typed-access cost only for
    the paths you touch).

    Scale: VARIANT stores a parsed binary form, so repeated path
    extraction never re-parses the JSON text (unlike
    get_json_object, which parses per call — q35 covers that
    surface); shredded parquet writes make the touched paths
    columnar. The oracle spells the same extraction with DuckDB's
    json_extract."""
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


@register(
    "q111_bitfield_aggs",
    """
    SELECT event_type,
           bit_and(user_id % 256)  AS mask_and,
           bit_or(user_id % 256)   AS mask_or,
           bit_xor(user_id % 256)  AS mask_xor,
           bool_and(value >= 0)    AS all_nonneg,
           bool_or(value > 99)     AS any_large
    FROM events
    GROUP BY event_type
    """,
)
def q111_bitfield_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and boolean aggregate family: AND/OR/XOR-folded bit
    masks (the permission-mask / feature-bitset reduction) and
    bool_and/bool_or predicates — all commutative-associative, so
    partial aggregation is exact under any partitioning."""
    e = _t(spark, sf_dir, "events")
    m = F.col("user_id") % 256
    return e.groupBy("event_type").agg(
        F.bit_and(m).alias("mask_and"),
        F.bit_or(m).alias("mask_or"),
        F.bit_xor(m).alias("mask_xor"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_large"),
    )
