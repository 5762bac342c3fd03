"""Round-5 additions — four pipeline-composition queries that close
gaps a production curation stack hits right after the round-4 mining
tranche:

- q164: near-dup cluster REPRESENTATIVE selection by model quality —
  composes q116's transitive clusters with q154's scorer (keep the
  best copy, not the lowest-id copy; the rule real pipelines want).
  The oracle composes the SAME q52 CTE chain + the SAME declared
  weight arithmetic, so neither definition can drift.
- q165: readability scoring (Flesch-Kincaid grade with a
  deterministic vowel-group syllable heuristic) — the classic cheap
  quality filter between heuristics (q56) and the model scorer
  (q154).
- q166: EXACT stratified train/val/test split — per-stratum ranked
  modulo assignment guaranteeing 8/1/1 within one document per
  stratum (q67's hash split holds proportions only in expectation;
  q72 samples at a rate). Determinism comes from ranking on
  (md5(doc_id), doc_id).
- q167: corpus diversity health per source — distinct-8-gram
  type-token ratio and top-gram share (Herfindahl numerator), the
  self-repetition signal at SOURCE granularity (q153 is per-doc,
  q123 is eval-vs-train).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import (
    _Q52_CTES,
    _Q52_FINAL,
    _WS,
    q52_minhash_lsh,
)
from file_appender_spark.queries.mining import _Q154_W_SQL, _gram_sql, qs_score_sum
from file_appender_spark.queries.registry import register
from file_appender_spark.operators.textstats import let_expr, ngrams
from file_appender_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q164 — cluster representatives by model quality
# --------------------------------------------------------------------------


@register(
    "q164_cluster_representatives",
    f"""
    WITH RECURSIVE {_Q52_CTES},
    q52 AS ({_Q52_FINAL}),
    sym AS (
      SELECT d1 AS u, d2 AS v FROM q52
      UNION ALL
      SELECT d2 AS u, d1 AS v FROM q52
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT x.id, s.v FROM reach x JOIN sym s ON s.u = x.r
    ),
    cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    sc AS (
      SELECT doc_id,
             list_reduce(list_transform(w, tok -> {_Q154_W_SQL}),
                         (a, b) -> a + b) AS s
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
            FROM documents)
      WHERE len(w) >= 1
    ),
    ranked AS (
      SELECT cl.cluster_id, cl.doc_id, sc.s,
             row_number() OVER (PARTITION BY cl.cluster_id
                                ORDER BY sc.s DESC, cl.doc_id) AS rn,
             count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
      FROM cl JOIN sc USING (doc_id)
    )
    SELECT cluster_id, n_members,
           doc_id AS rep_doc_id, s AS rep_score_sum
    FROM ranked WHERE rn = 1
    """,
)
def q164_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representative selection: q116's transitive
    near-dup clusters, but the kept copy per cluster is the one the
    q154 model scorer likes BEST (ties break to the lower doc_id) —
    the keep rule production curation wants ("among near-duplicates,
    keep the cleanest"), vs the lowest-id convention q116/SemDeDup
    use for oracle simplicity. Scores stay INTEGER weight sums so the
    argmax is exact on both engines.

    Scale: clusters from the banded-LSH pair graph (large/small-star
    CC, O(log n) rounds); scoring is a zero-shuffle per-row fold; the
    representative argmax is one groupBy on cluster_id — no step sees
    a pair explosion or a driver loop."""
    from file_appender_spark.operators.components import dedup_clusters

    pairs = q52_minhash_lsh(spark, sf_dir).select("d1", "d2")
    cl = dedup_clusters(pairs)
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)
    sc = d.filter(F.size(w) >= 1).select(
        "doc_id", let_expr(w, qs_score_sum).alias("s")
    )
    m = (
        sc.join(
            cl.select(F.col("doc").alias("doc_id"), "cluster"), "doc_id", "left"
        )
        .select(
            "doc_id",
            "s",
            F.coalesce("cluster", F.col("doc_id")).alias("cluster_id"),
        )
    )
    return m.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.expr("max_by(doc_id, struct(s, -doc_id))").alias("rep_doc_id"),
        F.max("s").alias("rep_score_sum"),
    ).select("cluster_id", "n_members", "rep_doc_id", "rep_score_sum")


# --------------------------------------------------------------------------
# q165 — readability (Flesch-Kincaid grade, deterministic syllables)
# --------------------------------------------------------------------------


@register(
    "q165_readability",
    """
    WITH t AS (
      SELECT doc_id, text, string_split_regex(text, '\\s+') AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(w) AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
             list_reduce(
               list_transform(w, tok -> greatest(1,
                 len(regexp_extract_all(lower(tok), '[aeiouy]+')))),
               (a, b) -> a + b) AS n_syllables
      FROM t WHERE len(w) >= 1
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                 - 15.59, 4) AS fk_grade
    FROM m
    """,
)
def q165_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per document with a DETERMINISTIC
    syllable heuristic (max(1, count of maximal [aeiouy]+ runs) per
    lowercased word — the standard cheap approximation) and sentence
    count = max(1, punctuation-run count). The classic readability
    gate between q56's character heuristics and q154's model scorer;
    identical regex class on both engines keeps it oracle-exact.

    Scale: one zero-shuffle scan — two regexp folds per row inside
    codegen, no UDF, no join; 100 TB scoring is embarrassingly
    parallel."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)

    def syllable_sum(t):
        # vowel-group count per token inside the HOF lambda: replace
        # each maximal [aeiouy]+ run with one sentinel char and count
        # sentinels (split parts - 1) — identical by construction to
        # the oracle's len(regexp_extract_all(...)), expressible on a
        # lambda variable where regexp_extract_all is not
        def runs(tok):
            return (
                F.size(
                    F.split(
                        F.regexp_replace(F.lower(tok), "[aeiouy]+", "\x01"),
                        "\x01",
                    )
                )
                - 1
            )

        return F.aggregate(
            F.transform(t, lambda tok: F.greatest(F.lit(1), runs(tok))),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )

    n_sent = F.greatest(
        F.lit(1), F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)"))
    )
    base = d.filter(F.size(w) >= 1).select(
        "doc_id",
        F.size(w).alias("n_words"),
        n_sent.alias("n_sentences"),
        let_expr(w, syllable_sum).alias("n_syllables"),
    )
    fk = (
        F.lit(0.39) * (F.col("n_words").cast("double") / F.col("n_sentences"))
        + F.lit(11.8) * (F.col("n_syllables").cast("double") / F.col("n_words"))
        - F.lit(15.59)
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(fk, 4).alias("fk_grade"),
    )


# --------------------------------------------------------------------------
# q166 — exact stratified train/val/test split
# --------------------------------------------------------------------------


@register(
    "q166_exact_stratified_split",
    """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN (rn - 1) % 10 < 8 THEN 'train'
                WHEN (rn - 1) % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM r
    """,
)
def q166_exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stratified 8/1/1 split: within every lang stratum,
    documents are ranked by (md5(doc_id), doc_id) — a deterministic
    shuffle — and assigned by ranked modulo, so every stratum's split
    sizes are exact to within one document. q67's hash split only
    holds proportions in expectation (a small stratum can land 100%
    in train); q72 samples at a rate. Eval-set curation needs the
    exact guarantee per language.

    Scale: one window sort per stratum (partitionBy lang — shuffle
    keyed on the stratum, never a global sort); the md5 rank key is
    incompressible so within-stratum order is unbiased by doc_id
    locality."""
    from pyspark.sql.window import Window as W

    d = _t(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    m = (rn - 1) % 10
    return d.select(
        "doc_id",
        "lang",
        F.when(m < 8, "train").when(m == 8, "val").otherwise("test").alias("split"),
    )


# --------------------------------------------------------------------------
# q167 — corpus diversity per source (8-gram type-token ratio)
# --------------------------------------------------------------------------

_DIV_K = 8
_DIV_GRAM = _gram_sql(_DIV_K)


@register(
    "q167_source_diversity",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(text, '\\s+') AS w
      FROM documents
    ),
    pos AS (
      SELECT source, unnest(hs) AS g
      FROM (
        SELECT source,
               list_transform(range(1, len(w) - {_DIV_K - 2}),
                              i -> md5({_DIV_GRAM})) AS hs
        FROM t WHERE len(w) >= {_DIV_K}
      )
    ),
    per AS (
      SELECT source, g, count(*) AS c FROM pos GROUP BY source, g
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_grams,
           count(*) AS n_distinct,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS type_token_ratio,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_gram_share
    FROM per GROUP BY source
    """,
)
def q167_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity health per SOURCE: 8-gram type-token ratio
    (distinct grams / total gram positions — low TTR = the source
    repeats itself; self-repetition at source granularity, where q153
    reports per-doc and q123 eval-vs-train) plus the top gram's share
    of all positions (the Herfindahl numerator — one boilerplate
    template dominating a crawl shows up here before anything else).

    Scale: positions carry a 128-bit md5, never text; ONE
    groupBy(source, gram) with map-side partial aggregation, then a
    source-bounded rollup. No pair join anywhere."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", _WS)
    pos = d.filter(F.size(w) >= _DIV_K).select(
        "source", F.explode(F.transform(ngrams(w, _DIV_K), F.md5)).alias("g")
    )
    per = pos.groupBy("source", "g").agg(F.count("*").alias("c"))
    return per.groupBy("source").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.round(F.count("*").cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_gram_share"),
    )


# --------------------------------------------------------------------------
# q175/q176 — perceptual image hashing (average hash) + banded near-dup
# --------------------------------------------------------------------------
#
# The multimodal dedup path: opaque binary payload -> deterministic
# "decode" to a 64-cell luminance grid (strided byte sums — the
# container has no image codecs, so the decode step is the documented
# deterministic fake; operators/imagehash.py carries the real-decode
# seam) -> average hash (aHash: bit c = cell c above the global mean,
# the classic public perceptual hash) -> 4 x 16-bit bands -> banded
# LSH candidates -> exact Hamming verify. Every comparison is integer
# (64*cell > total, shifts, xor popcount), so the whole pipeline is
# oracle-exact.

_AHASH_CTES = """
    h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE octet_length(encode(text)) >= 1
    ),
    e AS (SELECT doc_id, n, hx, unnest(range(0, n)) AS i FROM h),
    byt AS (
      SELECT doc_id, n, CAST(i % 64 AS INTEGER) AS c,
             16 * (instr('0123456789ABCDEF',
                         substr(hx, CAST(2*i+1 AS INTEGER), 1)) - 1)
               + (instr('0123456789ABCDEF',
                        substr(hx, CAST(2*i+2 AS INTEGER), 1)) - 1) AS b
      FROM e
    ),
    cells AS (
      SELECT doc_id, max(n) AS n_bytes, c, sum(b) AS cell
      FROM byt GROUP BY doc_id, c
    ),
    bits AS (
      SELECT doc_id, n_bytes, c,
             CASE WHEN 64 * cell > sum(cell) OVER (PARTITION BY doc_id)
                  THEN 1 ELSE 0 END AS bit
      FROM cells
    ),
    bands AS (
      SELECT doc_id, max(n_bytes) AS n_bytes,
             CAST(floor(c / 16.0) AS INTEGER) AS bi,
             CAST(sum(bit << (c % 16)) AS BIGINT) AS bv,
             CAST(sum(bit) AS BIGINT) AS pop
      FROM bits GROUP BY doc_id, CAST(floor(c / 16.0) AS INTEGER)
    ),
    wide AS (
      SELECT doc_id, max(n_bytes) AS n_bytes,
             CAST(sum(pop) AS BIGINT) AS popcount,
             CAST(sum(CASE WHEN bi = 0 THEN bv ELSE 0 END) AS BIGINT) AS b0,
             CAST(sum(CASE WHEN bi = 1 THEN bv ELSE 0 END) AS BIGINT) AS b1,
             CAST(sum(CASE WHEN bi = 2 THEN bv ELSE 0 END) AS BIGINT) AS b2,
             CAST(sum(CASE WHEN bi = 3 THEN bv ELSE 0 END) AS BIGINT) AS b3
      FROM bands GROUP BY doc_id
    )
"""


@register(
    "q175_image_ahash",
    f"""
    WITH {_AHASH_CTES}
    SELECT doc_id, n_bytes, popcount, b0, b1, b2, b3 FROM wide
    """,
)
def q175_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average perceptual hash (aHash) of each document's binary
    payload: bytes -> 64 strided cell sums -> bit c set iff
    64*cell_c > total (the integer-exact form of cell > mean) ->
    four 16-bit bands. The feature-extraction half of the multimodal
    dedup path; the payload "decode" is the documented deterministic
    byte-grid fake (no image codecs in the container) with the real
    Pillow decode seam in operators/imagehash.py.

    Scale: explode emits one narrow (doc, c, byte) row per payload
    byte, but partial aggregation collapses them to 64 cells/doc
    map-side BEFORE the shuffle — the exchange carries 64 rows per
    document regardless of payload size. No pair work here."""
    from file_appender_spark.operators.imagehash import ahash_wide

    d = _t(spark, sf_dir, "documents")
    payload = d.filter(F.length(F.encode("text", "UTF-8")) >= 1).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return ahash_wide(payload, "doc_id", "payload")


@register(
    "q176_image_neardup",
    f"""
    WITH {_AHASH_CTES},
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT d1, d2,
             bit_count(xor(w1.b0, w2.b0)) + bit_count(xor(w1.b1, w2.b1))
           + bit_count(xor(w1.b2, w2.b2)) + bit_count(xor(w1.b3, w2.b3))
             AS hamming
      FROM cand
      JOIN wide w1 ON w1.doc_id = d1
      JOIN wide w2 ON w2.doc_id = d2
    )
    SELECT d1, d2, CAST(hamming AS BIGINT) AS hamming
    FROM ham WHERE hamming <= 8
    """,
)
def q176_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Hamming near-dup over the q175 aHash: candidates are
    pairs agreeing EXACTLY on at least one 16-bit band (standard
    multi-index Hamming LSH — any pair within Hamming 3 of the 64-bit
    hash must agree on some band by pigeonhole; threshold 8 keeps the
    verify honest about banding recall), verified with the exact
    xor-popcount distance.

    Scale: the candidate join is equality on (band_index, band_value)
    — bucketed, never all-pairs; exact-duplicate payloads share all
    bands, so run q50's exact dedup FIRST in production (the operator
    docstring pins that composition and a bucket cap)."""
    from file_appender_spark.operators.imagehash import ahash_neardup

    d = _t(spark, sf_dir, "documents")
    payload = d.filter(F.length(F.encode("text", "UTF-8")) >= 1).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return ahash_neardup(payload, "doc_id", "payload", max_hamming=8)
