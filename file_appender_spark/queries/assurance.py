"""Oracle-checked exposure for operators that previously shipped
with pytest-only evidence: Benford conformance
(operators/benford.py), exact global selection
(operators/selection.py), the typed free-text PII tier
(operators/pii.py), SCD2/CDC merge (operators/scd2.py), the salted
two-phase aggregation (operators/skew.py), and the distributed
global prefix sum (operators/prefix_sum.py). Each was a first-class
component resting on self-written tests alone — these queries put
them under the driver's DuckDB hash-compare like every other
inventory row.

Oracle strategy per query:
- q145 mirrors the leading-digit extraction in DuckDB SQL (the
  string-based first-nonzero-digit rule is rendering-robust on both
  engines, unlike a log10/floor arithmetic that can flip at powers
  of ten; translate-then-first-char, since scientific notation keeps
  the mantissa's leading digit first in every rendering either
  engine produces).
- q146 relies on DuckDB's ``quantile_disc`` sharing the standard
  PERCENTILE_DISC convention (smallest element whose cumulative
  count reaches ceil(q*n)) with operators/selection.py.
- q147 plants PII deterministically IN-QUERY from doc_id arithmetic
  (the q140 derive-the-other-table-in-query pattern), so the oracle
  is pure ground-truth arithmetic with NO regex at all — the hash
  match proves the real Java-regex tier detects exactly what was
  planted, with zero cross-engine regex-dialect risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.operators.benford import BENFORD_P, leading_digit_profile
from file_appender_spark.queries.registry import register
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# full-precision IEEE doubles embedded as literals; BOTH engines round
# the same double to 6 dp, so the rendered values cannot disagree
_BENFORD_VALUES = ", ".join(f"({d}, {BENFORD_P[d]!r})" for d in range(1, 10))

@register(
    "q145_benford",
    f"""
    WITH vals AS (
      SELECT abs(o_totalprice) AS v FROM orders
      WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) > 0
    ),
    lead AS (
      SELECT TRY_CAST(
               substring(translate(CAST(v AS VARCHAR), '0.-eE+', ''), 1, 1)
               AS INTEGER) AS digit
      FROM vals
    ),
    counts AS (
      SELECT digit, count(*) AS n FROM lead
      WHERE digit IS NOT NULL GROUP BY 1
    ),
    spine AS (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10)),
    bp(digit, p) AS (VALUES {_BENFORD_VALUES}),
    tot AS (SELECT sum(n) AS t FROM counts)
    SELECT s.digit,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           round(coalesce(c.n, 0) * 1.0 / greatest(t.t, 1), 6) AS observed_p,
           round(CAST(bp.p AS DOUBLE), 6) AS benford_p
    FROM spine s
    LEFT JOIN counts c ON c.digit = s.digit
    JOIN bp ON bp.digit = s.digit
    CROSS JOIN tot t
    """,
)
def q145_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit conformance profile of orders.o_totalprice
    (operators/benford.py ``leading_digit_profile``): observed vs
    expected first-digit distribution, all nine digits emitted
    including zero-count ones.

    Scale: one map-side-combined aggregation to 9 digit groups; the
    spine join and grand-total window run over the 9-row aggregate,
    never the fact table."""
    return leading_digit_profile(_t(spark, sf_dir, "orders"), "o_totalprice")


_SELECTION_QS = (0.25, 0.5, 0.875)  # exact binary fractions: ceil(q*n)
# cannot drift between engines from floating q*n representation

@register(
    "q146_exact_selection",
    """
    SELECT CAST(0.25 AS DOUBLE) AS q,
           quantile_disc(l_extendedprice, 0.25) AS value FROM lineitem
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE),
           quantile_disc(l_extendedprice, 0.5) FROM lineitem
    UNION ALL
    SELECT CAST(0.875 AS DOUBLE),
           quantile_disc(l_extendedprice, 0.875) FROM lineitem
    """,
)
def q146_exact_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global quantiles of lineitem.l_extendedprice through
    operators/selection.py's value-domain bisection — the NO-global-
    sort selection path (PERCENTILE_DISC semantics: smallest element
    whose cumulative count reaches ceil(q*n)), checked against
    DuckDB's quantile_disc which shares the convention.

    refine_rows=2000 forces REAL bisection passes even at the
    driver's sf0.01 gate (~60k lineitem rows) — the oracle row is
    evidence for the bisection machinery, not for a collect-and-sort
    shortcut.

    Scale: each quantile costs ~log2(value_range) count aggregates
    (map-side combined, no shuffle of raw rows) plus one collect
    bounded by refine_rows — the same plan shape at 10^12 rows."""
    from file_appender_spark.operators.selection import exact_quantile

    li = _t(spark, sf_dir, "lineitem")
    rows = [
        (q, exact_quantile(li, "l_extendedprice", q, refine_rows=2000))
        for q in _SELECTION_QS
    ]
    return spark.createDataFrame(rows, "q double, value double")


@register(
    "q147_pii_scrub",
    """
    WITH k AS (SELECT doc_id % 5 AS kind FROM documents)
    SELECT CASE kind WHEN 0 THEN 'email' WHEN 1 THEN 'ipv4'
                     WHEN 2 THEN 'ssn' WHEN 3 THEN 'card'
                     ELSE 'clean' END AS pii_kind,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
           CAST(sum(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ipv4,
           CAST(sum(CASE WHEN kind = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ssn,
           CAST(sum(CASE WHEN kind = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_card,
           CAST(sum(CASE WHEN kind = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
           CAST(sum(CASE WHEN kind <> 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(0 AS BIGINT) AS n_residual
    FROM k GROUP BY 1
    """,
)
def q147_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII detection + scrub (operators/pii.py) over a corpus
    with PLANTED, deterministically derived PII: each doc_id plants
    one known PII instance by doc_id % 5 (email / IPv4 / SSN-like /
    card-like / clean), so the oracle is pure arithmetic ground truth
    and the hash match certifies the real regex tier end to end —
    detection counts per class, the flagged-document count, and a
    zero residual (re-detection over the SCRUBBED text) proving the
    scrub removes everything detection finds.

    Two deliberate truths this pins: the phone pattern also fires
    inside a spaced 16-digit card number (n_phone = n_card bucket —
    the documented class-overlap that makes scrub ORDER matter), and
    class tokens never re-match (idempotency, n_residual = 0).

    The patterns and scrub composition are imported from
    operators/pii.py (pii_profile's counts are these same
    regexp_count columns, pii.py:59-62), so query and operator
    cannot drift. Scale: one narrow projection + one JVM-regex scan,
    map-side-combined aggregate to 5 rows; no joins, no Python."""
    from file_appender_spark.operators.pii import PII_PATTERNS, pii_scrub

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email_txt = F.concat(F.lit("reach user"), s(did), F.lit("@mail.example.org soon"))
    ip_txt = F.concat(
        F.lit("host 192.168."),
        s(did % 89 + 10),
        F.lit("."),
        s(did % 80 + 10),
        F.lit(" up"),
    )
    ssn_txt = F.concat(
        F.lit("ssn "),
        F.lpad(s(did % 1000), 3, "0"),
        F.lit("-"),
        F.lpad(s(did % 100), 2, "0"),
        F.lit("-"),
        F.lpad(s(did % 10000), 4, "0"),
        F.lit(" ok"),
    )
    card_txt = F.concat(
        F.lit("acct 4111 1111 1111 "), F.lpad(s(did % 10000), 4, "0"), F.lit(" due")
    )
    clean_txt = F.concat(F.lit("plain note "), s(did % 7))
    kind = did % 5
    planted = d.select(
        "doc_id",
        F.when(kind == 0, "email")
        .when(kind == 1, "ipv4")
        .when(kind == 2, "ssn")
        .when(kind == 3, "card")
        .otherwise("clean")
        .alias("pii_kind"),
        F.when(kind == 0, email_txt)
        .when(kind == 1, ip_txt)
        .when(kind == 2, ssn_txt)
        .when(kind == 3, card_txt)
        .otherwise(clean_txt)
        .alias("text"),
    )
    counts = {
        c: F.regexp_count(F.col("text"), F.lit(pat))
        for c, (pat, _tok) in PII_PATTERNS.items()
    }
    residual = None
    scrubbed = pii_scrub("text")
    for c, (pat, _tok) in PII_PATTERNS.items():
        term = F.regexp_count(scrubbed, F.lit(pat))
        residual = term if residual is None else residual + term
    total = None
    for c in counts:
        total = counts[c] if total is None else total + counts[c]
    row = planted.select(
        "pii_kind",
        counts["email"].alias("c_email"),
        counts["ipv4"].alias("c_ipv4"),
        counts["ssn_like"].alias("c_ssn"),
        counts["card_like"].alias("c_card"),
        counts["phone"].alias("c_phone"),
        (total > 0).cast("int").alias("c_flagged"),
        residual.alias("c_residual"),
    )
    return row.groupBy("pii_kind").agg(
        F.count("*").alias("n_docs"),
        F.sum("c_email").alias("n_email"),
        F.sum("c_ipv4").alias("n_ipv4"),
        F.sum("c_ssn").alias("n_ssn"),
        F.sum("c_card").alias("n_card"),
        F.sum("c_phone").alias("n_phone"),
        F.sum("c_flagged").alias("n_flagged"),
        F.sum("c_residual").alias("n_residual"),
    )


@register(
    "q148_scd2_merge",
    """
    WITH cur AS (
      SELECT c_custkey, c_mktsegment, c_nationkey,
             TIMESTAMP '2020-01-01' AS eff_ts,
             CAST(NULL AS TIMESTAMP) AS end_ts,
             TRUE AS is_current
      FROM customer
    ),
    hist AS (
      SELECT c_custkey, 'OLDSEG', c_nationkey,
             TIMESTAMP '2019-01-01', TIMESTAMP '2020-01-01', FALSE
      FROM customer WHERE c_custkey % 17 = 0
    ),
    dim AS (SELECT * FROM cur UNION ALL SELECT * FROM hist),
    upd AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 11 = 0
                  THEN CAST((c_nationkey + 1) % 25 AS INTEGER)
                  ELSE c_nationkey END AS c_nationkey
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEWSEG', CAST(0 AS INTEGER)
      FROM customer WHERE c_custkey % 13 = 0
    ),
    chg AS (
      SELECT u.c_custkey, u.c_mktsegment, u.c_nationkey
      FROM upd u
      LEFT JOIN (SELECT * FROM dim WHERE is_current) d
        ON d.c_custkey = u.c_custkey
      WHERE d.c_custkey IS NULL
         OR NOT (u.c_mktsegment IS NOT DISTINCT FROM d.c_mktsegment
                 AND u.c_nationkey IS NOT DISTINCT FROM d.c_nationkey)
    )
    SELECT d.c_custkey, d.c_mktsegment, d.c_nationkey, d.eff_ts,
           CASE WHEN d.is_current AND k.c_custkey IS NOT NULL
                THEN TIMESTAMP '2021-06-01' ELSE d.end_ts END AS end_ts,
           CASE WHEN d.is_current AND k.c_custkey IS NOT NULL
                THEN FALSE ELSE d.is_current END AS is_current
    FROM dim d
    LEFT JOIN (SELECT DISTINCT c_custkey FROM chg) k
      ON k.c_custkey = d.c_custkey
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_nationkey,
           TIMESTAMP '2021-06-01', CAST(NULL AS TIMESTAMP), TRUE
    FROM chg
    """,
)
def q148_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 / CDC merge (operators/scd2.py ``scd2_merge``) with the
    updates batch derived in-query from the customer table (the
    q140/q147 derive-the-other-input pattern): segment moves for
    key % 7, nation shifts for key % 11, brand-new keys for % 13,
    and a no-op tranche (key % 3 rows with neither change) proving
    the null-safe change detector leaves unchanged keys alone.
    Pre-existing HISTORICAL rows (key % 17) pass through untouched,
    exercising every branch of the merge: close-out, passthrough,
    historical-passthrough, insert-changed, insert-new.

    Scale: one shuffle on the business key (semi/anti joins against
    the changed-key set) — the classic parquet-only MERGE INTO
    emulation; with Delta/Iceberg on the classpath this delegates to
    native MERGE."""
    from file_appender_spark.operators.scd2 import scd2_merge

    c = _t(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    eff2020 = F.lit("2020-01-01 00:00:00").cast("timestamp")
    cur = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        eff2020.alias("eff_ts"),
        F.lit(None).cast("timestamp").alias("end_ts"),
        F.lit(True).alias("is_current"),
    )
    hist = c.filter(key % 17 == 0).select(
        "c_custkey",
        F.lit("OLDSEG").alias("c_mktsegment"),
        "c_nationkey",
        F.lit("2019-01-01 00:00:00").cast("timestamp").alias("eff_ts"),
        eff2020.alias("end_ts"),
        F.lit(False).alias("is_current"),
    )
    dim = cur.unionByName(hist)
    upd = (
        c.filter(key % 3 == 0)
        .select(
            "c_custkey",
            F.when(key % 7 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            F.when(key % 11 == 0, ((F.col("c_nationkey") + 1) % 25).cast("int"))
            .otherwise(F.col("c_nationkey"))
            .alias("c_nationkey"),
        )
        .unionByName(
            c.filter(key % 13 == 0).select(
                (key + 1000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(0).cast("int").alias("c_nationkey"),
            )
        )
    )
    return scd2_merge(
        dim,
        upd,
        key="c_custkey",
        compare_cols=["c_mktsegment", "c_nationkey"],
        effective_col="eff_ts",
        run_ts="2021-06-01 00:00:00",
    )


@register(
    "q149_salted_agg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(min(l_orderkey) AS BIGINT) AS min_order,
           CAST(max(l_orderkey) AS BIGINT) AS max_order
    FROM lineitem GROUP BY 1
    """,
)
def q149_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregation (operators/skew.py
    ``salted_agg``) under the oracle: results must be hash-identical
    to the plain GROUP BY the oracle states, proving the skew scale
    path is a pure physical rewrite (partial per (key, salt), final
    per key) with zero semantic drift. l_returnflag has only 3
    values over ~600k rows at sf0.1 — exactly the
    hot-key-per-reducer shape the salt exists for.

    All aggregates chosen decomposable and exact (integer sum,
    count, min/max) so cross-engine equality is bit-exact."""
    from file_appender_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        ["l_returnflag"],
        partial_aggs=[
            F.sum(F.col("l_quantity").cast("bigint")).alias("_s"),
            F.count("*").alias("_n"),
            F.min("l_orderkey").alias("_mn"),
            F.max("l_orderkey").alias("_mx"),
        ],
        final_aggs=[
            F.sum("_s").cast("bigint").alias("sum_qty"),
            F.sum("_n").cast("bigint").alias("n_items"),
            F.min("_mn").cast("bigint").alias("min_order"),
            F.max("_mx").cast("bigint").alias("max_order"),
        ],
    )


@register(
    "q150_prefix_sum",
    """
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (ORDER BY o_orderkey) AS BIGINT) AS running_sum
    FROM orders
    """,
)
def q150_prefix_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running total (operators/prefix_sum.py
    ``global_running_sum``): the oracle states the naive
    single-partition window (fine for DuckDB at gate scale), the
    Spark side runs the TWO-PHASE distributed form — range partition
    + per-partition Arrow cumsum + offsets from an
    O(n_partitions)-row window — so the hash match proves the scale
    path computes exactly the single-reducer semantics without the
    single-reducer plan. Money int-scaled to cents (the q01
    discipline) for cross-engine exactness."""
    from file_appender_spark.operators.prefix_sum import global_running_sum

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    return global_running_sum(o, "o_orderkey", "cents", out_col="running_sum")


@register(
    "q151_boilerplate",
    """
    WITH docs2 AS (
      SELECT doc_id,
             text || chr(10) ||
             CASE WHEN doc_id % 2 = 0
                  THEN 'subscribe to our newsletter today'
                  ELSE 'ref line ' || CAST(doc_id AS VARCHAR) END ||
             CASE WHEN doc_id % 3 = 0
                  THEN chr(10) || 'cookie policy applies here'
                  ELSE '' END AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs2)
    ),
    ldf AS (SELECT line, count(DISTINCT doc_id) AS n FROM lines GROUP BY 1),
    kept AS (
      SELECT l.doc_id, l.pos, l.line
      FROM lines l JOIN ldf ON ldf.line = l.line
      WHERE ldf.n <= 10
    ),
    reb AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY 1
    ),
    tot AS (
      SELECT doc_id, len(string_split(text, chr(10))) AS n_lines FROM docs2
    )
    SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
           CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM tot t LEFT JOIN reb r ON r.doc_id = t.doc_id
    """,
)
def q151_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (operators/boilerplate.py, the
    CCNet/RefinedWeb cleanup) over a corpus with PLANTED boilerplate
    derived in-query: every even doc gains a subscribe prompt
    (df ~ n/2, stripped), every doc_id % 3 a cookie banner (df ~ n/3,
    stripped), odd docs a unique 'ref line <id>' (df = 1, kept), and
    the original single-line body is document-unique (kept). The
    hash match pins line splitting, distinct-doc df counting, the
    df <= max_df keep rule, and order-preserving reassembly.

    Scale: explode + vocabulary-bounded line-df aggregate + one
    equi-join back + per-doc reassembly — no windows over raw rows,
    no driver collect."""
    from file_appender_spark.operators.boilerplate import strip_boilerplate

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n"),
            F.when(did % 2 == 0, F.lit("subscribe to our newsletter today"))
            .otherwise(F.concat(F.lit("ref line "), did.cast("string"))),
            F.when(
                did % 3 == 0, F.concat(F.lit("\n"), F.lit("cookie policy applies here"))
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return strip_boilerplate(planted, max_df=10)


@register(
    "q152_bpe_pairs",
    """
    WITH words AS (
      SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents
    ),
    wf AS (SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY w),
    sy AS (
      SELECT c, list_concat(list_transform(range(1, length(w) + 1),
                                           i -> substring(w, i, 1)),
                            ['</w>']) AS syms
      FROM wf
    ),
    pairs AS (
      SELECT c,
             unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS a,
             unnest(list_transform(range(1, len(syms)), i -> syms[i + 1])) AS b
      FROM sy
    )
    SELECT a, b, CAST(sum(c) AS BIGINT) AS cnt
    FROM pairs GROUP BY a, b
    ORDER BY cnt DESC, a, b LIMIT 10
    """,
)
def q152_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, the oracle face (operators/bpe.py):
    the weighted adjacent-symbol pair counts over the corpus
    word-frequency table — i.e. the exact argmax table the FIRST
    merge is chosen from — top 10 under the training total order
    (count DESC, a, b). The iterative trainer (bpe_merges) is
    pinned against a pure-Python Sennrich-style reference in
    tests/test_bpe.py; this row pins its distributed counting stage
    cross-engine.

    Scale: BPE trains on (word, count) — vocabulary-bounded, not
    corpus-bounded — so every merge iteration is one map-side
    combined aggregate over millions of rows at 100 TB, never
    trillions; the driver holds one (a, b) row per merge."""
    from file_appender_spark.operators.bpe import pair_counts, word_frequencies
    from file_appender_spark.operators.bpe import _char_symbols

    d = _t(spark, sf_dir, "documents")
    wf = word_frequencies(d)
    sym = wf.select("c", _char_symbols().alias("syms"))
    return (
        pair_counts(sym)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(10)
    )
