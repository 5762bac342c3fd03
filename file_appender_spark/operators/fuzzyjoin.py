"""Blocked (candidate-generating) edit-distance self-join — the scale
path behind q43_fuzzy_match, completing the near-dup family: q52 bands
the MinHash space, srp_neardup bands the embedding space, and this
bands the *string* space.

Algorithm: partition-signature blocking in the style of PassJoin
(Li, Deng & Feng, "Pass-Join: a partition-based method for similarity
joins", PVLDB 5(3), 2011 — public literature). Pigeonhole: split a
string into ``k+1`` contiguous segments; any string within edit
distance ``k`` must contain at least one of those segments *verbatim*
(k edits cannot touch all k+1 segments), at a position shifted by at
most ``k``. So:

- index side: each string emits its ``k+1`` segments keyed by
  ``(len, segment_index, segment_text)``;
- probe side: each string emits, for every indexed length within
  ``±k`` of its own and every segment index, the substrings at the
  (at most ``2k+1``) positions an untouched segment could occupy;
- candidates = equi-join on the key (never a cross join), dedup,
  then ONE exact ``levenshtein`` per surviving pair.

Row expansion is a constant: ``k+1`` keys per indexed string and at
most ``(2k+1)²·(k+1) ≈ 45`` (k=2) per probed string — candidate
generation is linear in rows and *exact* (no recall loss), unlike
prefix-only blocking. Cost concentrates where true near-duplicates
concentrate, which is inherent to the output itself.

Degenerate corpora (every string sharing a long common template, e.g.
TPC-H ``Supplier#00000…`` names) make some segment keys ubiquitous and
candidates quadratic — but on such data the *result* is quadratic too,
so no blocking scheme can do better. ``key_df_cap`` optionally drops
keys more frequent than a cap (same skew guard as q70's postings cap),
trading bounded recall for a hard cost ceiling; exact recall holds
whenever a pair shares at least one sub-cap key.

Reference parity: the reference engine (777-LoC Java append-sink
plugin) has no fuzzy join; this is part of the declared extension
surface (SURVEY.md §2 Part B, dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _seg_start(i: str, l: str, k: int) -> str:
    """1-based start of segment ``i`` of a length-``l`` string split
    into ``k+1`` even parts (SQL integer arithmetic)."""
    return f"(({i} * {l}) div {k + 1}) + 1"


def _seg_len(i: str, l: str, k: int) -> str:
    return f"((({i} + 1) * {l}) div {k + 1}) - (({i} * {l}) div {k + 1})"


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    key_df_cap: int | None = None,
) -> DataFrame:
    """All pairs ``(id1 < id2, edit_dist)`` with
    ``levenshtein(str1, str2) <= max_dist``, via exact segment
    blocking — no cross join anywhere in the plan.

    Returns columns ``(id1, id2, edit_dist)``.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    k = max_dist
    s = df.select(
        F.col(id_col).alias("_fid"),
        F.col(str_col).alias("_fnm"),
        F.length(str_col).alias("_fl"),
    )

    # ---- index side: the k+1 segments of each string --------------------
    seg_struct = (
        f"struct(_fl AS l, i AS i, "
        f"substring(_fnm, {_seg_start('i', '_fl', k)}, {_seg_len('i', '_fl', k)}) AS seg)"
    )
    idx = s.select(
        F.col("_fid").alias("id_i"),
        F.col("_fnm").alias("nm_i"),
        F.explode(F.expr(f"transform(sequence(0, {k}), i -> {seg_struct})")).alias("ks"),
    ).select("id_i", "nm_i", "ks.l", "ks.i", "ks.seg")

    # ---- probe side: substrings an untouched indexed segment could be ---
    # For every plausible indexed length lv in [len±k] and segment i,
    # the segment (length SLEN, nominal start SSTART) can only survive
    # k edits at positions within ±k of SSTART — enumerate exactly
    # those substrings. Empty windows yield an empty (typed) sequence.
    sstart = _seg_start("i", "lv", k)
    slen = _seg_len("i", "lv", k)
    lo = f"greatest(1, {sstart} - {k})"
    hi = f"least(_fl - ({slen}) + 1, {sstart} + {k})"
    window_seq = (
        f"CASE WHEN {lo} <= {hi} THEN sequence({lo}, {hi}) "
        f"ELSE cast(array() AS array<int>) END"
    )
    probe_keys = (
        f"flatten(transform(sequence(greatest(0, _fl - {k}), _fl + {k}), lv -> "
        f"  flatten(transform(sequence(0, {k}), i -> "
        f"    transform({window_seq}, p -> "
        f"      struct(lv AS l, i AS i, substring(_fnm, p, {slen}) AS seg))"
        f"  ))"
        f"))"
    )
    prb = s.select(
        F.col("_fid").alias("id_p"),
        F.col("_fnm").alias("nm_p"),
        F.explode(F.expr(probe_keys)).alias("kp"),
    ).select("id_p", "nm_p", "kp.l", "kp.i", "kp.seg")

    if key_df_cap is not None:
        # skew guard: drop keys whose index-side frequency exceeds the
        # cap (documented bounded-recall trade, cf. q70 postings cap)
        hot = (
            idx.groupBy("l", "i", "seg")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > key_df_cap)
            .select("l", "i", "seg")
        )
        idx = idx.join(F.broadcast(hot), ["l", "i", "seg"], "left_anti")
        prb = prb.join(F.broadcast(hot), ["l", "i", "seg"], "left_anti")

    # Both orientations of every qualifying pair are generated
    # (pigeonhole holds splitting either string), so keeping only
    # id_i < id_p loses nothing and halves the verify work.
    cand = (
        idx.join(prb, ["l", "i", "seg"])
        .filter(F.col("id_i") < F.col("id_p"))
        .select(
            F.col("id_i").alias("id1"),
            F.col("id_p").alias("id2"),
            "nm_i",
            "nm_p",
        )
        .distinct()
    )
    # exact verify only on candidates; 3-arg levenshtein early-exits
    # past the threshold (returns -1 when distance > max_dist)
    dist = F.levenshtein("nm_i", "nm_p", k)
    return (
        cand.withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)
        .select("id1", "id2", "edit_dist")
    )
