"""Round-9 tranche: the STORE READ PATHS as oracle-checked queries
(r8 verdict task 3 — until now every store consumer was
driver-certified only on its recompute default, and store-path
equivalence lived in pytest alone).

Each query here builds its store INSIDE the query — from the same
driver parquet tables every other query reads — then serves the
result THROUGH the store's read path, and is hash-compared against
the SAME DuckDB oracle as the recompute spelling (the oracle strings
are referenced from the registry, not copied, so the two can never
drift):

- q256: pairstore batch build -> materialized clusters -> q116 shape.
- q257: pairstore build + INCREMENTAL epoch ingest + the r9
  representative-space cluster fold (refresh_clusters mode='auto'
  choosing 'incremental') -> q116 shape. This is the production
  maintenance loop, end-to-end under the value-hash gate.
- q258: corpusstats store -> q58 TF-IDF served from stats_dir.
- q259: pairstore -> q245 token economics served from graph_dir.
- q260: the textdup INGEST protocol itself, simulated over two
  epochs (even doc_ids then odd) and mirrored in SQL: band-collision
  candidates, ESTIMATED-Jaccard (agreeing minhash slots / 16)
  verification, earlier-id suppression within an epoch, and
  admitted-history suppression across epochs. This puts the
  incremental dedup VERIFIER — previously pytest-only — under the
  DuckDB oracle.
- q261: q260's twin for the IMAGE modality (aHash bands, exact
  xor-popcount Hamming <= 8, q176's own CTEs).
- q262: q59's bigram top-50 from an INCREMENTALLY maintained
  corpus-stats store (base + one epoch; additivity certified).
- q263: the pairstore lifecycle WITH compaction (build + ingest +
  incremental fold + compact, then serve) — compaction preserves the
  merged view and the freshness stamp under the driver hash.
- q264: q260 with a compact_store between the epochs — maintenance
  must not change the admitted set (same oracle as q260).

Store scratch space: one directory per (session, sf_dir) under the
system temp dir, created at plan-build time and left for the OS to
reap — the memoized DataFrame re-reads it on every action, so the
data must outlive the call (localCheckpoint blocks are evictable;
parquet is not).

Reference parity: the reference engine (a CDAP batch sink) has no
query surface; these certify SURVEY.md §2's incremental-store tier.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_appender_spark.queries.llm import (
    _Q52_CTES,
    q58_tfidf,
    q116_dedup_clusters,
)
from file_appender_spark.queries.registry import QUERIES, register
from file_appender_spark.queries.tpch_extra import _t
from file_appender_spark.queries.tranche17 import q245_effective_tokens

# the recompute spellings' oracles, shared verbatim (zero drift): a
# store-served query is CORRECT precisely when it hashes equal to
# the same SQL its default spelling hashes equal to
_Q116_ORACLE = QUERIES["q116_dedup_clusters"].oracle
_Q58_ORACLE = QUERIES["q58_tfidf"].oracle
_Q245_ORACLE = QUERIES["q245_effective_tokens"].oracle


def _scratch(kind: str) -> str:
    """A fresh scratch store dir. One per plan-build (the registry
    memoizes the built DataFrame per (session, sf_dir), so repeated
    driver/bench calls reuse one store); left on disk because the
    memoized plan re-reads it on every action."""
    return os.path.join(
        tempfile.mkdtemp(prefix=f"spark_graft_{kind}_"), "store"
    )


@register("q256_pairstore_served_clusters", _Q116_ORACLE)
def q256_pairstore_served_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q116's transitive cluster assignment served from a
    MATERIALIZED pair store: build_pair_graph over the documents
    table (exact — cap None is the build default), then answer from
    the store's (doc, cluster) parquet via the q52_clusters dispatch
    instead of re-running LSH + CC. Hash-equal to the recursive-CTE
    closure oracle, the same one the recompute spelling carries.

    Scale: the build is q52's banded plan paid ONCE; the serve path
    reads a pair-count-sized parquet table. This is the store's
    production promise (SCALE100_PROBE_r8: 56x for 3 consumers at
    500k docs) under the driver's value-hash gate."""
    from file_appender_spark.operators.pairstore import build_pair_graph

    store = _scratch("q256_pairgraph")
    docs = _t(spark, sf_dir, "documents")
    build_pair_graph(spark, docs, store)
    return q116_dedup_clusters(spark, sf_dir, graph_dir=store)


@register("q257_pairstore_incremental_served", _Q116_ORACLE)
def q257_pairstore_incremental_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pair store's full MAINTENANCE loop under the oracle gate:
    build over the even doc_ids, ingest the odd doc_ids as an epoch
    (cap None — the exact-parity setting), fold the new edges into
    the cluster assignment with the r9 INCREMENTAL refresh
    (representative-space CC over the new epoch's pairs only;
    asserts 'incremental' was actually chosen), then serve q116's
    shape from the folded assignment. Hash-equal to the full-corpus
    closure oracle — the strongest equivalence statement the driver
    can make about the incremental path."""
    from file_appender_spark.operators.pairstore import (
        build_pair_graph,
        pairstore_ingest_batch,
        refresh_clusters,
    )

    store = _scratch("q257_pairinc")
    docs = _t(spark, sf_dir, "documents")
    build_pair_graph(spark, docs.filter(F.col("doc_id") % 2 == 0), store)
    pairstore_ingest_batch(
        spark,
        docs.filter(F.col("doc_id") % 2 == 1),
        store,
        batch_id=1,
        band_bucket_cap=None,
    )
    used = refresh_clusters(spark, store)
    if used != "incremental":
        raise AssertionError(
            f"expected the incremental fold, refresh chose {used!r}"
        )
    return q116_dedup_clusters(spark, sf_dir, graph_dir=store)


@register("q258_corpusstats_served_tfidf", _Q58_ORACLE)
def q258_corpusstats_served_tfidf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q58's exact TF-IDF served from a MATERIALIZED corpus-stats
    store: build_corpus_stats over the documents table, then answer
    df and N from the (Zipf-small) token table — the corpus is
    tokenized only for the 1-in-20 output docs. Hash-equal to q58's
    own oracle."""
    from file_appender_spark.operators.corpusstats import build_corpus_stats

    store = _scratch("q258_corpusstats")
    docs = _t(spark, sf_dir, "documents")
    build_corpus_stats(spark, docs, store)
    return q58_tfidf(spark, sf_dir, stats_dir=store)


@register("q259_pairstore_served_economics", _Q245_ORACLE)
def q259_pairstore_served_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q245's token-weighted dedup savings served from the pair
    store (graph_dir dispatch): cluster keep-set from the
    materialized assignment, token counts from one corpus
    projection. Hash-equal to q245's closure oracle."""
    from file_appender_spark.operators.pairstore import build_pair_graph

    store = _scratch("q259_paireco")
    docs = _t(spark, sf_dir, "documents")
    build_pair_graph(spark, docs, store)
    return q245_effective_tokens(spark, sf_dir, graph_dir=store)


@register(
    "q260_textdup_ingest_sim",
    f"""
    WITH {_Q52_CTES},
    est AS (
      -- q52's own band-collision candidates (cand: d1 < d2), scored
      -- by the INGEST's estimator: agreeing minhash slots / 16
      SELECT c.d1 AS a, c.d2 AS b,
             sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0 AS e
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.d1
      JOIN sigs sb ON sb.doc_id = c.d2 AND sb.j = sa.j
      GROUP BY c.d1, c.d2
    ),
    dup0 AS (
      SELECT DISTINCT b AS doc FROM est
      WHERE a % 2 = 0 AND b % 2 = 0 AND e >= 0.5
    ),
    adm0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc FROM dup0)
    ),
    dup1 AS (
      SELECT DISTINCT b AS doc FROM est
      WHERE a % 2 = 1 AND b % 2 = 1 AND e >= 0.5
      UNION
      SELECT DISTINCT CASE WHEN a % 2 = 1 THEN a ELSE b END AS doc FROM est
      WHERE (a % 2) <> (b % 2) AND e >= 0.5
        AND (CASE WHEN a % 2 = 0 THEN a ELSE b END)
              IN (SELECT doc_id FROM adm0)
    )
    SELECT doc_id, CAST(doc_id % 2 AS INT) AS epoch
    FROM documents
    WHERE NOT (doc_id % 2 = 0 AND doc_id IN (SELECT doc FROM dup0))
      AND NOT (doc_id % 2 = 1 AND doc_id IN (SELECT doc FROM dup1))
    """,
)
def q260_textdup_ingest_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL text dedup protocol itself under the oracle
    gate: ingest the even doc_ids as epoch 0 and the odd ones as
    epoch 1 through textdup_ingest_batch (cap None — exact), and
    return every admitted (doc_id, epoch). The SQL mirrors the
    protocol exactly over q52's own CTE chain: candidates are band
    collisions, the verifier is the ESTIMATED Jaccard (agreeing
    minhash slots / 16, threshold 0.5 — the store holds fixed-size
    signature rows, never shingle sets), suppression within an epoch
    is vs earlier ids (regardless of the earlier row's own fate —
    the single-pass rule), and across epochs vs the ADMITTED
    history, id order irrelevant. Docs too short to shingle are
    admitted unconditionally on both engines.

    This certifies the dedup-store verifier against DuckDB — the one
    ingest semantic that pytest pinned but no driver hash covered."""
    from file_appender_spark.operators.neardup_ingest import (
        textdup_ingest_batch,
    )

    store = _scratch("q260_textdup")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a0 = textdup_ingest_batch(
        spark,
        docs.filter(F.col("doc_id") % 2 == 0),
        store,
        threshold=0.5,
        band_bucket_cap=None,
    )
    a1 = textdup_ingest_batch(
        spark,
        docs.filter(F.col("doc_id") % 2 == 1),
        store,
        threshold=0.5,
        band_bucket_cap=None,
    )
    # parquet-back the admitted set: the ingest returns localCheckpoint
    # frames, whose blocks are evictable — a re-action of the MEMOIZED
    # plan after block loss would fail and never self-heal. Every
    # other tranche-22 query already re-reads its store's parquet;
    # this one writes its answer next to the scratch store and does
    # the same (review finding r9).
    out_path = os.path.join(os.path.dirname(store), "admitted.parquet")
    a0.unionByName(a1).select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("epoch")
    ).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


# ---------------------------------------------------------------------------
# Second r9 batch: the image-ingest protocol, incremental corpusstats,
# and compaction-mid-lifecycle — each under the same zero-drift oracle
# discipline as q256-q260.
# ---------------------------------------------------------------------------

from file_appender_spark.queries.tranche5 import _AHASH_CTES  # noqa: E402

_Q59_ORACLE = QUERIES["q59_ngram_freq"].oracle


@register(
    "q261_imagedup_ingest_sim",
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
    ),
    dup0 AS (
      SELECT DISTINCT d2 AS doc FROM ham
      WHERE d1 % 2 = 0 AND d2 % 2 = 0 AND hamming <= 8
    ),
    adm0 AS (
      SELECT doc_id FROM h
      WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc FROM dup0)
    ),
    dup1 AS (
      SELECT DISTINCT d2 AS doc FROM ham
      WHERE d1 % 2 = 1 AND d2 % 2 = 1 AND hamming <= 8
      UNION
      SELECT DISTINCT CASE WHEN d1 % 2 = 1 THEN d1 ELSE d2 END AS doc
      FROM ham
      WHERE (d1 % 2) <> (d2 % 2) AND hamming <= 8
        AND (CASE WHEN d1 % 2 = 0 THEN d1 ELSE d2 END)
              IN (SELECT doc_id FROM adm0)
    )
    SELECT doc_id, CAST(doc_id % 2 AS INT) AS epoch
    FROM h
    WHERE NOT (doc_id % 2 = 0 AND doc_id IN (SELECT doc FROM dup0))
      AND NOT (doc_id % 2 = 1 AND doc_id IN (SELECT doc FROM dup1))
    """,
)
def q261_imagedup_ingest_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMAGE modality's incremental dedup protocol under the
    oracle gate — q260's twin on the q175/q176 aHash pipeline: ingest
    the even doc_ids' payloads as epoch 0 and the odd ones as epoch 1
    through imagedup_ingest_batch (cap None — exact), and return
    every admitted (doc_id, epoch). The SQL mirrors the protocol over
    q176's own CTEs: candidates are 16-bit band collisions, the
    verifier is the exact xor-popcount Hamming distance (<= 8,
    q176's threshold), suppression within an epoch is vs earlier
    ids, and across epochs vs the ADMITTED history regardless of id
    order. Payloads are the q175 deterministic byte-grid fake
    (encode(text) — no image codecs in the container); empty
    payloads are excluded on both engines (the ingest admits them
    unconditionally, so including them would test nothing)."""
    from file_appender_spark.operators.neardup_ingest import (
        imagedup_ingest_batch,
    )

    store = _scratch("q261_imagedup")
    d = _t(spark, sf_dir, "documents")
    payload = d.filter(F.length(F.encode("text", "UTF-8")) >= 1).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    a0 = imagedup_ingest_batch(
        spark,
        payload.filter(F.col("doc_id") % 2 == 0),
        store,
        max_hamming=8,
        band_bucket_cap=None,
    )
    a1 = imagedup_ingest_batch(
        spark,
        payload.filter(F.col("doc_id") % 2 == 1),
        store,
        max_hamming=8,
        band_bucket_cap=None,
    )
    out_path = os.path.join(os.path.dirname(store), "admitted.parquet")
    a0.unionByName(a1).select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("epoch")
    ).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


@register("q262_corpusstats_incremental_served", _Q59_ORACLE)
def q262_corpusstats_incremental_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q59's corpus bigram top-50 served from a corpus-stats store
    maintained INCREMENTALLY: base build over the even doc_ids, one
    foreachBatch-style epoch for the odd ones, merged read. tf is
    additive across epochs because each document lives in exactly one
    — the additivity contract, certified by the driver hash against
    q59's own whole-corpus oracle."""
    from file_appender_spark.operators.corpusstats import (
        build_corpus_stats,
        corpusstats_ingest_batch,
    )
    from file_appender_spark.queries.llm import q59_ngram_freq

    store = _scratch("q262_csinc")
    docs = _t(spark, sf_dir, "documents")
    build_corpus_stats(spark, docs.filter(F.col("doc_id") % 2 == 0), store)
    corpusstats_ingest_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 1), store, 1
    )
    return q59_ngram_freq(spark, sf_dir, stats_dir=store)


@register("q263_pairstore_compacted_served", _Q116_ORACLE)
def q263_pairstore_compacted_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pair store's lifecycle WITH compaction under the oracle
    gate: build over even ids, ingest odd ids as an epoch, fold the
    clusters incrementally, COMPACT the epoch partitions into a fresh
    base (crash-safe two-rename swap, sized files), then serve q116's
    shape from the compacted store — compaction must preserve the
    merged pair view, the cluster assignment, and its freshness
    stamp, and the driver hash against the full-corpus closure is
    the proof."""
    from file_appender_spark.operators.pairstore import (
        build_pair_graph,
        compact_pairstore,
        pairstore_ingest_batch,
        refresh_clusters,
    )

    store = _scratch("q263_paircomp")
    docs = _t(spark, sf_dir, "documents")
    build_pair_graph(spark, docs.filter(F.col("doc_id") % 2 == 0), store)
    pairstore_ingest_batch(
        spark,
        docs.filter(F.col("doc_id") % 2 == 1),
        store,
        batch_id=1,
        band_bucket_cap=None,
    )
    refresh_clusters(spark, store)
    compact_pairstore(spark, store)
    return q116_dedup_clusters(spark, sf_dir, graph_dir=store)


@register("q264_textdup_compacted_sim", QUERIES["q260_textdup_ingest_sim"].oracle)
def q264_textdup_compacted_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q260 with a COMPACTION between the two epochs: ingest the even
    doc_ids, compact_store (file fold + retry-row dedup + params-stamp
    survival), then ingest the odd ids against the compacted history.
    The admitted set must be byte-identical to the uncompacted run —
    same oracle as q260 — because compaction only changes the store's
    file layout, never its signature content. This puts the dedup
    store's maintenance operation itself under the driver hash."""
    from file_appender_spark.operators.neardup_ingest import (
        compact_store,
        textdup_ingest_batch,
    )

    store = _scratch("q264_textcomp")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a0 = textdup_ingest_batch(
        spark,
        docs.filter(F.col("doc_id") % 2 == 0),
        store,
        threshold=0.5,
        band_bucket_cap=None,
    )
    # parquet-back epoch 0's answer BEFORE compaction: its
    # localCheckpoint plan must not be re-run against the compacted
    # store on a memoized re-action
    out_path = os.path.join(os.path.dirname(store), "admitted.parquet")
    a0.select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("epoch")
    ).write.mode("overwrite").parquet(out_path)
    compact_store(spark, store, id_col="doc_id")
    a1 = textdup_ingest_batch(
        spark,
        docs.filter(F.col("doc_id") % 2 == 1),
        store,
        threshold=0.5,
        band_bucket_cap=None,
    )
    a1.select(
        "doc_id", (F.col("doc_id") % 2).cast("int").alias("epoch")
    ).write.mode("append").parquet(out_path)
    return spark.read.parquet(out_path)


# ---------------------------------------------------------------------------
# q265 — the EMBEDDING modality's ingest protocol (completing the
# trilogy: text q260, image q261, embedding here). The SRP hyperplane
# coefficients are Spark-murmur3-derived; the oracle inlines the same
# matrix as SQL literals via a pure-Python murmur3 twin (any drift
# between the twin and Spark's hash would flip a sign bit and fail
# the driver hash loudly).
# ---------------------------------------------------------------------------


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _murmur3_hash_int(value: int, seed: int) -> int:
    """Murmur3_x86_32 hashInt — the exact function Spark's
    ``F.hash(int, int)`` chains per column (seed 42, then each
    column's hash seeds the next; fmix length 4 per int)."""
    k1 = (value & 0xFFFFFFFF) * 0xCC9E2D51 & 0xFFFFFFFF
    k1 = _rotl32(k1, 15)
    k1 = k1 * 0x1B873593 & 0xFFFFFFFF
    h1 = (seed & 0xFFFFFFFF) ^ k1
    h1 = _rotl32(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # fmix: length in bytes
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def _spark_hash2(a: int, b: int) -> int:
    """Signed-int32 value of Spark's ``F.hash(lit(a), lit(b))``."""
    h = _murmur3_hash_int(a, 42)
    h = _murmur3_hash_int(b, h)
    return h - 2**32 if h >= 2**31 else h


def _srp_coef_sql_matrix(n_bits: int, dim: int) -> list[str]:
    """The SRP hyperplane matrix (operators/similarity._srp_coefs:
    coefficient(bit, i) = murmur3(bit, i) / 2^31) as one SQL list
    literal per bit. repr() of a Python float round-trips exactly,
    and every coefficient is int32/2^31 — exactly representable."""
    return [
        "[" + ",".join(repr(_spark_hash2(bit, i) / 2147483648.0) for i in range(dim))
        + "]"
        for bit in range(n_bits)
    ]


def _q265_oracle() -> str:
    coefs = _srp_coef_sql_matrix(16, 64)

    def bit(b: int) -> str:
        return (
            f"(CASE WHEN list_dot_product(e, {coefs[b]}) >= 0 "
            "THEN 1 ELSE 0 END)"
        )

    def band(bi: int) -> str:
        # Spark's fold: sig = bit0; sig = sig*2 + bit_j
        sig = bit(4 * bi)
        for j in range(1, 4):
            sig = f"({sig} * 2 + {bit(4 * bi + j)})"
        return sig

    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
             {band(0)} AS b0, {band(1)} AS b1,
             {band(2)} AS b2, {band(3)} AS b3
      FROM v
    ),
    bands AS (
      SELECT vec_id, 0 AS band, b0 AS sig FROM sigs
      UNION ALL SELECT vec_id, 1, b1 FROM sigs
      UNION ALL SELECT vec_id, 2, b2 FROM sigs
      UNION ALL SELECT vec_id, 3, b3 FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    ver AS (
      SELECT c.d1, c.d2
      FROM cand c
      JOIN sigs s1 ON s1.vec_id = c.d1
      JOIN sigs s2 ON s2.vec_id = c.d2
      WHERE s1.nrm > 0 AND s2.nrm > 0
        AND round(list_dot_product(s1.e, s2.e) / (s1.nrm * s2.nrm), 6)
              >= 0.4
    ),
    dup0 AS (
      SELECT DISTINCT d2 AS doc FROM ver
      WHERE d1 % 2 = 0 AND d2 % 2 = 0
    ),
    adm0 AS (
      SELECT vec_id FROM v
      WHERE vec_id % 2 = 0 AND vec_id NOT IN (SELECT doc FROM dup0)
    ),
    dup1 AS (
      SELECT DISTINCT d2 AS doc FROM ver
      WHERE d1 % 2 = 1 AND d2 % 2 = 1
      UNION
      SELECT DISTINCT CASE WHEN d1 % 2 = 1 THEN d1 ELSE d2 END AS doc
      FROM ver
      WHERE (d1 % 2) <> (d2 % 2)
        AND (CASE WHEN d1 % 2 = 0 THEN d1 ELSE d2 END)
              IN (SELECT vec_id FROM adm0)
    )
    SELECT vec_id, CAST(vec_id % 2 AS INT) AS epoch
    FROM v
    WHERE NOT (vec_id % 2 = 0 AND vec_id IN (SELECT doc FROM dup0))
      AND NOT (vec_id % 2 = 1 AND vec_id IN (SELECT doc FROM dup1))
    """


@register("q265_embeddingdup_ingest_sim", _q265_oracle())
def q265_embeddingdup_ingest_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The EMBEDDING modality's incremental dedup protocol under the
    oracle gate — the last of the three ingest twins (text q260,
    image q261): ingest the even vec_ids as epoch 0 and the odd ones
    as epoch 1 through neardup_ingest_batch (SRP 16-bit/4-band
    signatures, exact-cosine verify at 0.4 — q62's threshold — cap
    None), and return every admitted (vec_id, epoch). The oracle
    recomputes the SAME sign-random-projection bands in SQL: the
    hyperplane matrix is Spark's murmur3(bit, dim)/2^31 (a pure-
    Python murmur3 twin inlines it as literals — a single bit of
    drift flips a sign and fails the hash), candidates are band
    collisions, verification is the exact rounded cosine with
    zero-norm vectors never suppressed (the try_divide contract)."""
    from file_appender_spark.operators.neardup_ingest import (
        neardup_ingest_batch,
    )

    store = _scratch("q265_embdup")
    v = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a0 = neardup_ingest_batch(
        spark,
        v.filter(F.col("vec_id") % 2 == 0),
        store,
        threshold=0.4,
        band_bucket_cap=None,
    )
    a1 = neardup_ingest_batch(
        spark,
        v.filter(F.col("vec_id") % 2 == 1),
        store,
        threshold=0.4,
        band_bucket_cap=None,
    )
    out_path = os.path.join(os.path.dirname(store), "admitted.parquet")
    a0.unionByName(a1).select(
        "vec_id", (F.col("vec_id") % 2).cast("int").alias("epoch")
    ).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
