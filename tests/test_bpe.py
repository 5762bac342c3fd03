"""operators/bpe.py: merge training must equal a pure-Python
reference implementation of Sennrich-style BPE (same tie-break),
segmentation must apply merges greedily left-to-right, and training
must stop under min_freq."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.bpe import (
    END,
    bpe_merges,
    bpe_segment,
    pair_counts,
    word_frequencies,
)


def _ref_bpe(words: dict[str, int], n_merges: int, min_freq: int = 2):
    """Reference BPE on a word-frequency dict: argmax pair by
    (count desc, a asc, b asc), greedy non-overlapping rewrite."""
    state = {tuple(list(w) + [END]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        # deterministic tie-break: count desc, then a asc, b asc
        best_pair = min(
            p for p, c in counts.items() if c == max(counts.values())
        )
        best_cnt = counts[best_pair]
        if best_cnt < min_freq:
            break
        merges.append(best_pair)
        a, b = best_pair
        new_state = {}
        for syms, c in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + c
        state = new_state
    return merges


def _corpus(spark, words: dict[str, int]):
    rows = []
    doc_id = 0
    for w, c in words.items():
        for _ in range(c):
            rows.append((doc_id, w))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2}


def test_merges_match_reference(spark):
    docs = _corpus(spark, WORDS)
    got = bpe_merges(docs, n_merges=8, min_freq=2)
    want = _ref_bpe(WORDS, 8, min_freq=2)
    assert got == want
    # the classic example learns 'est</w>' pieces from newest/widest
    joined = ["".join(p) for p in got]
    assert any("est" in j for j in joined)


def test_min_freq_stops_training(spark):
    docs = _corpus(spark, {"ab": 1, "cd": 1})
    assert bpe_merges(docs, n_merges=5, min_freq=2) == []


def test_segment_applies_merges_in_order(spark):
    docs = _corpus(spark, WORDS)
    merges = bpe_merges(docs, n_merges=6, min_freq=2)
    df = spark.createDataFrame([("newest low",)], "text string")
    toks = df.select(
        bpe_segment(F.col("text"), merges).alias("t")
    ).first()["t"]
    # reference segmentation of the same string
    ref_state = {}
    for w in ["newest", "low"]:
        syms = list(w) + [END]
        for a, b in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        ref_state[w] = syms
    assert toks == ref_state["newest"] + ref_state["low"]
    # round-trip: concatenating tokens restores the words + markers
    assert "".join(toks) == "newest" + END + "low" + END


def test_pair_counts_weighted_by_word_frequency(spark):
    docs = _corpus(spark, {"aa": 3, "ab": 2})
    wf = word_frequencies(docs)
    sym = wf.select("c", F.expr(
        "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)), "
        f"array('{END}'))"
    ).alias("syms"))
    got = {
        (r["a"], r["b"]): r["cnt"] for r in pair_counts(sym).collect()
    }
    assert got[("a", "a")] == 3
    assert got[("a", "b")] == 2
    assert got[("a", END)] == 3   # from 'aa'
    assert got[("b", END)] == 2


def test_validation(spark):
    docs = _corpus(spark, {"ab": 1})
    with pytest.raises(ValueError, match="n_merges"):
        bpe_merges(docs, n_merges=0)


def test_type_level_tokenization_equals_occurrence_level(spark, sf_dir):
    """bpe_tokenize_docs (distinct-word segmentation + position join)
    must reproduce bpe_segment-per-document exactly — same tokens,
    same order — including repeated words and multi-level merges."""
    from pyspark.sql import functions as F

    from file_appender_spark.operators.bpe import bpe_segment, bpe_tokenize_docs
    from file_appender_spark.sources.catalog import load_table

    merges = [("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
              ("table", "</w>"), ("r", "o"), ("ro", "w")]
    docs = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(40)
        .select("doc_id", "text")
        .filter(F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")) >= 1)
    )
    occ = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", bpe_segment(F.col("text"), merges).alias("t")
        ).collect()
    }
    typ = {
        r["doc_id"]: r["toks"]
        for r in bpe_tokenize_docs(docs, "doc_id", "text", merges).collect()
    }
    assert occ == typ
