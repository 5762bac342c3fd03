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
