"""Directed containment dedup C(A->B) = |A n B| / |A| — the
asymmetric near-superset detector behind q129 (quote/copy inclusion
that symmetric Jaccard misses), factored out so the SCALE path can
cap hot-token postings while the query keeps its exact oracle form.

Two modes:

- ``token_df_cap=None`` (exact, q129's declared oracle contract):
  plain inverted-index join — every shared token contributes a
  posting pair. On a realistic Zipf vocabulary the ubiquitous tokens
  ("the", "and") have postings ~n_docs, making the join
  near-quadratic; fine at fixture scale, a scale-killer at 100 TB.

- ``token_df_cap=k`` (the 100 TB path, fuzzyjoin.py's ``key_df_cap``
  pattern + PPJoin-style prefix filtering): the SUB side probes only
  each document's ``|A| - ceil(t*|A|) + 1`` globally-rarest tokens
  (its "prefix") — if C(A->B) >= t then B shares at least one prefix
  token, because A has at most that many unshared tokens. The SUPER
  side's postings are capped at df <= k. Every candidate is verified
  EXACTLY against the full token sets (array_intersect on the
  per-doc distinct-token arrays), so emitted pairs carry the exact
  containment value — the cap affects RECALL, never precision:

  recall contract: a true pair (A, B) is found iff at least one
  token of A n B has df <= k. (The prefix filter does not narrow
  this: prefix tokens are A's rarest, so whenever ANY shared token
  has df <= k, the shared prefix token that must exist has df <= k
  too.) A miss therefore requires EVERY shared token — at t = 0.9,
  essentially every token of A — to be corpus-ubiquitous: documents
  made only of stopwords. Pick k >= the df of a "rare-ish" token
  (e.g. the 99th-percentile df) to make misses implausible.

Scale shape with the cap: candidates <= prefix_size * k per sub-doc
(LINEAR in corpus size for fixed k), one distinct on candidate pairs,
verify join ships token arrays only for candidates. The df ranking
costs one vocab-bounded aggregate and a per-doc token sort (bounded
by doc length). Probe on a 20k-word Zipf corpus: see SCALING.md
round 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    token_df_cap: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    ws: str = r"\s+",
    reliable: bool = False,
) -> DataFrame:
    """Directed pairs (d_sub, d_super, containment) with
    containment = |tokens(d_sub) n tokens(d_super)| / |tokens(d_sub)|
    rounded to 6 dp, containment >= threshold, d_sub != d_super.
    Token sets are whitespace-split distinct tokens (q51/q129's
    declared tokenizer).

    ``reliable=True`` (capped branch only) swaps the sides frame's
    localCheckpoint for the reliable DFS ``.checkpoint()`` — the
    scheduled-pipeline knob; requires
    ``spark.sparkContext.setCheckpointDir`` (materialize.py)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    arr = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.split(F.col(text_col), ws)).alias("_toks"),
    )
    toks = arr.select("_id", F.explode("_toks").alias("tok"))

    if token_df_cap is None:
        # exact inverted-index form: i from posting-pair counts
        sizes = toks.groupBy("_id").agg(F.count("*").alias("n"))
        a = toks.alias("a")
        b = toks.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.tok") == F.col("b.tok"))
                & (F.col("a._id") != F.col("b._id")),
            )
            .groupBy(F.col("a._id").alias("d_sub"), F.col("b._id").alias("d_super"))
            .agg(F.count("*").alias("i"))
        )
        cont = F.col("i").cast("double") / F.col("n")
        return (
            inter.join(sizes.select(F.col("_id").alias("d_sub"), "n"), "d_sub")
            .filter(cont >= threshold)
            .select("d_sub", "d_super", F.round(cont, 6).alias("containment"))
        )

    if token_df_cap < 1:
        raise ValueError(f"token_df_cap must be >= 1, got {token_df_cap}")
    from pyspark.sql.window import Window as W

    # global token document frequencies (vocab-bounded aggregate;
    # AQE broadcasts the join-back when the vocab is small). Postings
    # joins key on xxhash64(tok) LONGS — the r11 schema-v2 trick
    # (CONTBREAK_PROBE_r11: df join-back + windows 0.90 -> 0.83s,
    # candidate join 1.24 -> 0.99s on the 20k Zipf corpus); the
    # prefix ORDER below stays on (_df, tok) STRINGS, so the selected
    # prefix is identical barring hash collisions. Honest collision
    # accounting: a 64-bit collision MERGES two tokens' df counts,
    # which can push a rare token over token_df_cap (its postings
    # drop from the super side) or evict it from a prefix — a RECALL
    # loss, not just extra candidates. Probability (birthday bound)
    # ~vocab^2 / 2^65: ~5e-8 at a 1M-token vocabulary, ~5e-6 at 10M
    # — small but NOT the per-pair ~1e-12 figure (that one applies to
    # the verify-side per-pair claim below); precision is always
    # exact (full verify below), and the q129-family driver hashes
    # fail loudly, never silently.
    toks = toks.withColumn("_th", F.xxhash64("tok"))
    tok_df = toks.groupBy("_th").agg(F.count("*").alias("_df"))
    ranked = toks.join(tok_df, "_th")
    # prefix: each doc's (n - ceil(t*n) + 1) RAREST tokens — at most
    # that many tokens of A are unshared when C(A->B) >= t, so B must
    # share one. The 1e-9 slack keeps float noise in t*n from
    # shrinking the prefix below the exact-arithmetic size (errs
    # toward a one-larger prefix, never smaller).
    w = W.partitionBy("_id").orderBy("_df", "tok")
    nw = W.partitionBy("_id")
    # ONE "sides" frame carries both membership flags and is lazily
    # localCheckpoint'ed so the [explode -> df join -> windows]
    # subtree is evaluated ONCE instead of once per join arm (r12,
    # wjaccard.py's restructure applied to the same family shape:
    # SIDES_CKPT_PROBE_r12 measured 4.11 -> 3.70s median cold-JVM at
    # 20k docs locally — and at 100 TB the re-derivation it removes
    # is full extra corpus scans. The verify's arr64 frame stays an
    # independent subtree over ``arr``: it needs full token ARRAYS,
    # which the per-token sides frame deliberately does not carry).
    # Flag expressions are the shipped prefix/cap predicates verbatim,
    # so the selected prefix and the recall contract are unchanged.
    # Cluster caveat (same as wjaccard's): a LOCAL checkpoint is not
    # fault-tolerant to executor loss — reliable=True swaps in the
    # DFS .checkpoint() for scheduled pipelines needing within-job
    # recovery (r12 verdict item 7, materialize_frame).
    from file_appender_spark.operators.materialize import materialize_frame

    sides = materialize_frame(
        ranked.withColumn("_pos", F.row_number().over(w))
        .withColumn(
            "_k",
            F.count("*").over(nw)
            - F.ceil(F.lit(threshold) * F.count("*").over(nw) - 1e-9)
            + 1,
        )
        .select(
            "_id",
            "_th",
            (F.col("_pos") <= F.col("_k")).alias("_isp"),
            (F.col("_df") <= token_df_cap).alias("_isb"),
        ),
        eager=False,
        reliable=reliable,
    )
    prefix = sides.filter("_isp").select("_id", "_th")
    # super side: capped postings only
    bside = sides.filter("_isb").select("_id", "_th")
    a = prefix.alias("a")
    b = bside.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._th") == F.col("b._th")) & (F.col("a._id") != F.col("b._id")),
        )
        .select(F.col("a._id").alias("d_sub"), F.col("b._id").alias("d_super"))
        .distinct()
    )
    # exact verify over full token arrays, candidates only — over the
    # PRE-HASHED long arrays (CONTBREAK_PROBE_r11: 0.72 -> 0.43s,
    # value-equality asserted in the probe): |A n B| and |A| are
    # unchanged unless two distinct tokens of one candidate pair
    # collide in 64 bits (~1e-12). A cross-doc collision inflates the
    # intersection (containment rounds UP); two colliding tokens
    # WITHIN one doc leave a duplicate long in the transform output
    # (|A| = size() still counts both) while array_intersect counts
    # the value once — containment rounds DOWN. Either direction
    # perturbs one pair's value by one token at ~1e-12 probability
    # and fails the driver hash loudly, never silently
    arr64 = arr.select(
        "_id", F.expr("transform(_toks, t -> xxhash64(t))").alias("_toks64")
    )
    sub = arr64.select(
        F.col("_id").alias("d_sub"), F.col("_toks64").alias("_sub_toks")
    )
    sup = arr64.select(
        F.col("_id").alias("d_super"), F.col("_toks64").alias("_sup_toks")
    )
    i = F.size(F.array_intersect("_sub_toks", "_sup_toks"))
    cont = i.cast("double") / F.size("_sub_toks")
    return (
        cand.join(sub, "d_sub")
        .join(sup, "d_super")
        .filter(cont >= threshold)
        .select("d_sub", "d_super", F.round(cont, 6).alias("containment"))
    )
