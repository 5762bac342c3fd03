"""Size-based scale-twin dispatch (operators/dispatch.py): auto mode
must pick the expression/fixed forms under the measured crossover and
the blocked/sized production forms past it — asserted on the PLAN,
not just the flag — while both physical strategies agree on results
where the semantics promise identity (r4 verdict task 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.dispatch import (
    SIMILARITY_CROSSOVER,
    semantic_dedup,
    similarity_topk,
)
from file_appender_spark.sources.catalog import load_table


def _queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )


def test_auto_small_corpus_uses_expression_plan(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity_topk(spark, emb, _queries(emb), k=5)  # tiny corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan  # expression path, no Arrow worker
    assert "BroadcastNestedLoopJoin" in plan  # the declared brute-force form


def test_auto_big_corpus_uses_blocked_plan(spark, sf_dir):
    """n_rows passed explicitly (the caller-knows-the-size contract)
    so the test exercises the big-corpus branch without building a
    million rows: the plan must be the Arrow/BLAS local-prune one —
    no cross join anywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity_topk(
        spark, emb, _queries(emb), k=5, n_rows=SIMILARITY_CROSSOVER + 1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_both_strategies_agree_exactly(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    a = {
        (r.qid, r.vec_id, r.cos_sim)
        for r in similarity_topk(spark, emb, q, k=5, mode="expr").collect()
    }
    b = {
        (r.qid, r.vec_id, r.cos_sim)
        for r in similarity_topk(spark, emb, q, k=5, mode="blocked").collect()
    }
    assert a == b
    assert a  # non-vacuous


def test_semantic_dedup_fixed_matches_q156(spark, sf_dir):
    from file_appender_spark.queries import QUERIES

    got = {
        (r.vec_id, r.cell, r.kept)
        for r in semantic_dedup(
            load_table(spark, sf_dir, "embeddings"), mode="fixed"
        ).collect()
    }
    want = {
        (r.vec_id, r.cell, r.kept)
        for r in QUERIES["q156_semantic_dedup"].spark_fn(spark, sf_dir).collect()
    }
    assert got == want


def test_semantic_dedup_sized_cells_scale_with_corpus(spark, sf_dir):
    """The sized quantizer must produce ~n/target cells (the flat
    per-cell work property) and still catch exact duplicates: an
    identical vector pair shares EVERY sign cell, so the higher id
    must be dropped under any quantizer."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(400)
    )
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    data = emb.unionByName(dup)
    out = semantic_dedup(data, tau=0.99, mode="sized", target_cell_size=64)
    rows = {r.vec_id: (r.cell, r.kept) for r in out.collect()}
    n_cells = len({c for c, _ in rows.values()})
    # 401 rows / target 64 -> 8 cells requested; sign cells split
    # unevenly, allow [2, 64]
    assert 2 <= n_cells <= 64
    assert rows[10_000_000][0] == rows[0][0]  # identical vector, same cell
    assert rows[10_000_000][1] == 0  # higher id dropped
    assert rows[0][1] == 1


def test_auto_semantic_picks_sized_past_crossover(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, n_rows=100_000, target_cell_size=256)
    # 100k rows / 256 -> ivf_bits_for gives >= 8 bits -> cell ids can
    # exceed the fixed quantizer's 64-cell ceiling; the fixed mode
    # caps at 63. Distinguish by the cell-id domain.
    assert out.agg(F.max("cell")).first()[0] > 63


def test_mode_validation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        similarity_topk(spark, emb, _queries(emb), k=5, mode="nope")
    with pytest.raises(ValueError):
        semantic_dedup(emb, mode="nope")


# --------------------------------------------------------------------------
# wjaccard_neardup dispatch (r5 verdict task 2)
# --------------------------------------------------------------------------


def _wj_docs(spark):
    """Planted multiset corpus: (1, 2) are heavy-overlap twins at
    J_w = 8/10 = 0.8, (3) shares only a stopword with them, (4, 5)
    are a second twin family; 'the' is ubiquitous (df = 5)."""
    rows = [
        (1, "the alpha alpha beta gamma delta delta epsilon zeta eta"),
        (2, "the alpha alpha beta gamma delta delta epsilon theta iota"),
        (3, "the completely unrelated tokens about harbor cranes tide"),
        (4, "the mineral mineral glacier deposits formation alpine slope ridge"),
        (5, "the mineral mineral glacier deposits formation alpine creek basin"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_wjaccard_auto_small_corpus_takes_capped_jvm_path(spark):
    from file_appender_spark.operators.dispatch import wjaccard_neardup

    out = wjaccard_neardup(_wj_docs(spark), threshold=0.5)  # 5 docs: capped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan  # pure-JVM prefix-filter branch


def test_wjaccard_auto_big_corpus_takes_icws_path(spark):
    from file_appender_spark.operators.dispatch import (
        WJACCARD_CROSSOVER,
        wjaccard_neardup,
    )

    out = wjaccard_neardup(
        _wj_docs(spark), threshold=0.5, n_rows=WJACCARD_CROSSOVER + 1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the ICWS sampler is Arrow-batched


def test_wjaccard_branches_agree_on_planted_corpus(spark):
    """Output equivalence pinned: all three branches find exactly the
    two planted twin pairs with the IDENTICAL exact J_w (every branch
    verifies exactly; they differ only in candidate generation)."""
    from file_appender_spark.operators.dispatch import wjaccard_neardup

    docs = _wj_docs(spark)
    want_pairs = {(1, 2), (4, 5)}
    results = {}
    for mode in ("exact", "capped", "icws"):
        got = {
            (r["d1"], r["d2"]): r["wjac"]
            for r in wjaccard_neardup(docs, threshold=0.5, mode=mode).collect()
        }
        assert set(got) == want_pairs, mode
        results[mode] = got
    assert results["exact"] == results["capped"] == results["icws"]


def test_wjaccard_mode_validation(spark):
    from file_appender_spark.operators.dispatch import wjaccard_neardup

    with pytest.raises(ValueError, match="mode"):
        wjaccard_neardup(_wj_docs(spark), mode="nope")
