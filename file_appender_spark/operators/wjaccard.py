"""Weighted (multiset) Jaccard near-dup pairs and its two scale
paths — the r4-verdict gap: q159 declared the token_df_cap pattern and
the ICWS sketch twin in prose; this module makes both real.

Weighted Jaccard over term frequencies:

    J_w(A, B) = sum_t min(a_t, b_t) / sum_t max(a_t, b_t)

with the shared-token identity sum max = |A| + |B| - sum min
(|A| = sum_t a_t), so only SHARED tokens ever join — the
frequency-aware refinement of plain set Jaccard (q51/q159's declared
semantics, mining.py:q159).

Three forms:

- ``token_df_cap=None`` (exact, q159's oracle contract): inverted tf
  index, posting-list equi-join, partial-agg min sums. On a Zipf
  vocabulary the ubiquitous tokens make the join near-quadratic —
  fine at fixture scale, the declared scale-killer at 100 TB.

- ``token_df_cap=k`` (the 100 TB path, the weighted analogue of
  operators/containment.py's PPJoin prefix filter): each doc probes
  only its WEIGHTED prefix — tokens in global-rarity order until
  their cumulative tf weight exceeds (1 - t) * |A|. Proof it
  suffices: J_w(A,B) >= t implies sum min >= t * sum max >= t * |A|,
  and shared-token weight in A is >= sum min, so UNSHARED weight in A
  is <= (1 - t) * |A| — if every prefix token were unshared, the
  prefix weight bound would be violated; hence every qualifying B
  shares at least one prefix token. The other side's postings are
  capped at df <= k; candidates are verified EXACTLY against
  occurrence-indexed long arrays (native array_intersect — see
  _exact_verify), so emitted pairs carry the exact J_w — the cap
  affects RECALL only, never precision:

  recall contract (same as containment's, same proof): a true pair
  (A, B) is found iff at least one SHARED token has df <= k. Prefix
  tokens are A's rarest, so whenever ANY shared token s has df <= k,
  either s itself is in the prefix (joins: df(s) <= k passes the
  posting cap) or every prefix token has df <= df(s) <= k and the
  prefix's guaranteed shared token joins instead.

- ``icws_neardup_pairs`` (the sketch twin, Ioffe "Improved Consistent
  Sampling, Weighted Minhash and L1 Sketching", ICDM 2010): K
  consistent weighted samples per doc with P[sample_k(A) ==
  sample_k(B)] = J_w(A, B) exactly; samples band like q52's MinHash
  (r rows x b bands, candidate iff some band agrees, detection prob
  1 - (1 - t^r)^b), candidates verified exactly as above. Gamma(2,1)
  draws come from deterministic splitmix64 streams keyed by
  (seed, token) — rerun-stable, no RNG state.

Scale shape with the cap: candidates <= prefix_postings * k per doc
(LINEAR in corpus size for fixed k); ICWS is O(K * doc_len) per doc
(zero shuffle until the band equi-join) with candidate volume set by
the banding policy. Probe: scripts/probe_wjaccard.py (Zipf corpus,
10x ratio + planted-pair recall at both scales).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

# fixed 64-bit mixing constants (splitmix64, public domain reference
# constants) — shared by the Spark-side and test-side ICWS generators
_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_MASK64 = (1 << 64) - 1


def _tf(docs: DataFrame, id_col: str, text_col: str, ws: str) -> DataFrame:
    """Per-(doc, token) term frequencies — one row per distinct token."""
    return (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), ws)).alias("tok"),
        )
        .groupBy("_id", "tok")
        .agg(F.count("*").alias("tf"))
    )


def _exact_verify(cand: DataFrame, tf: DataFrame, threshold: float) -> DataFrame:
    """Exact J_w for candidate (d1, d2) pairs via OCCURRENCE-INDEXED
    long arrays (r12, closing the r11 verdict's last untried
    spelling): token t with tf = c contributes the c longs
    xxhash64(t, 1..c), and

        sum_t min(a_t, b_t)  ==  |array_intersect(occ(A), occ(B))|

    exactly — occurrence i of t is in both multisets iff i <=
    min(a_t, b_t) — so the weighted intersection is ONE native
    set-intersect over flat bigint arrays. union = sz1 + sz2 - inter.
    No per-candidate union-map materialization (the r11 map_zip_with
    fold's attributed dominant cost), no sort, no per-key lookups:
    measured 2.50 -> 0.82s over 2.0M candidates on the bench corpus
    (WJACCARD_BREAKDOWN_r12, value-equality asserted both directions)
    — the same pre-hashed-array family as containment's verify
    (CONTBREAK_PROBE_r11), which a sorted-merge zip cannot reach
    because Spark HOFs have no two-pointer iteration.

    The shipped state per candidate is two arrays of sum(tf) longs
    (doc token LENGTH, vs the map spelling's distinct-token count —
    a ~2-3x larger but flat and primitive payload; the trade is
    measured above). The J_w VALUE is unchanged unless two distinct
    (tok, i) occurrence pairs collide in 64 bits (birthday odds
    ~1e-12 at bench corpus scale; q163's driver hash would fail
    loudly, never silently)."""
    occ = tf.groupBy("_id").agg(
        F.flatten(
            F.collect_list(
                F.expr("transform(sequence(1, tf), i -> xxhash64(tok, i))")
            )
        ).alias("_occ"),
        F.sum("tf").alias("_sz"),
    )
    o1 = occ.select(
        F.col("_id").alias("d1"), F.col("_occ").alias("_o1"), F.col("_sz").alias("_sz1")
    )
    o2 = occ.select(
        F.col("_id").alias("d2"), F.col("_occ").alias("_o2"), F.col("_sz").alias("_sz2")
    )
    inter = F.size(F.array_intersect("_o1", "_o2")).cast("bigint")
    wjac = inter.cast("double") / (F.col("_sz1") + F.col("_sz2") - inter)
    return (
        cand.join(o1, "d1")
        .join(o2, "d2")
        .filter(wjac >= threshold)
        .select("d1", "d2", F.round(wjac, 6).alias("wjac"))
    )


def weighted_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    token_df_cap: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    ws: str = r"\s+",
    reliable: bool = False,
) -> DataFrame:
    """All pairs (d1 < d2, wjac) with weighted Jaccard >= threshold.
    ``token_df_cap=None`` is exact; with a cap, precision stays exact
    and recall follows the module-docstring contract.

    ``reliable=True`` (capped branch only — the exact branch has no
    checkpoint) swaps the sides frame's localCheckpoint for the
    reliable DFS ``.checkpoint()`` so an executor loss recovers
    instead of failing the job — a scheduled-pipeline knob; requires
    ``spark.sparkContext.setCheckpointDir`` (operators/materialize.py
    has the trade)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    tf = _tf(docs, id_col, text_col, ws)

    if token_df_cap is None:
        # exact inverted-index form (q159's plan, mining.py)
        sizes = tf.groupBy("_id").agg(F.sum("tf").alias("sz"))
        a = tf.alias("a")
        b = tf.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.tok") == F.col("b.tok"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .groupBy(F.col("a._id").alias("d1"), F.col("b._id").alias("d2"))
            .agg(F.sum(F.least("a.tf", "b.tf")).alias("inter"))
        )
        s1 = sizes.select(F.col("_id").alias("d1"), F.col("sz").alias("sz1"))
        s2 = sizes.select(F.col("_id").alias("d2"), F.col("sz").alias("sz2"))
        wjac = F.col("inter").cast("double") / (
            F.col("sz1") + F.col("sz2") - F.col("inter")
        )
        return (
            shared.join(s1, "d1")
            .join(s2, "d2")
            .filter(wjac >= threshold)
            .select("d1", "d2", F.round(wjac, 6).alias("wjac"))
        )

    if token_df_cap < 1:
        raise ValueError(f"token_df_cap must be >= 1, got {token_df_cap}")
    # global token document frequencies (vocab-bounded aggregate).
    # Postings JOINS run on xxhash64(tok) long keys (r11, the
    # schema-v2 trick — WJACCARD_BREAKDOWN_r11 measured the candidate
    # join 1.40 -> 1.21s); the prefix ORDER stays on (_df, tok)
    # STRINGS, so the selected prefix — and with it the recall
    # contract and the q163 oracle hash — is byte-identical.
    tfh = tf.withColumn("_th", F.xxhash64("tok"))
    tok_df = tfh.groupBy("_th").agg(F.count("*").alias("_df"))
    ranked = tfh.join(tok_df, "_th")
    # weighted prefix: tokens in (df, tok) rarity order while the
    # cumulative tf BEFORE the token is <= (1-t)*|A|. The 1e-9 slack
    # errs toward a larger prefix, never smaller (float-noise guard,
    # same discipline as containment.py's prefix size).
    ord_w = W.partitionBy("_id").orderBy("_df", "tok")
    doc_w = W.partitionBy("_id")
    pre = ranked.withColumn("_cum", F.sum("tf").over(ord_w)).withColumn(
        "_sz", F.sum("tf").over(doc_w)
    )
    # ONE "sides" frame carries both membership flags and is lazily
    # localCheckpoint'ed, so the [tokenize -> tf -> df join -> windows]
    # subtree is evaluated ONCE instead of once per join arm plus once
    # for the verify's occ frame (r12: WJACCARD_TERMS_PROBE_r12
    # attributed the residual to that re-evaluation — the windows
    # themselves are ~free; SIDES_CKPT_PROBE_r12 measured the
    # restructure 10.2 -> 7.6s median cold-JVM at 20k docs, pair sets
    # equal both ways in every mode). The flag EXPRESSIONS are the
    # shipped prefix/cap predicates verbatim, so the selected prefix —
    # and with it the recall contract and the q163 oracle hash — is
    # unchanged. A lazy checkpoint (not persist) is deliberate:
    # TFPERSIST_PROBE_r12 measured operator-internal persists neutral
    # to ~10% SLOWER here (cache-write serialization + a
    # materialization barrier); the checkpoint materializes once as a
    # plain RDD scan that every consumer shares. Cluster caveat: a
    # LOCAL checkpoint stores blocks on executors, so an executor
    # loss mid-query fails the job instead of recomputing lineage —
    # acceptable for an interactive operator call (rerun); a
    # scheduled 100 TB pipeline that needs within-job recovery passes
    # reliable=True for the DFS .checkpoint() spelling (r12 verdict
    # item 7 — materialize_frame holds the trade).
    from file_appender_spark.operators.materialize import materialize_frame

    sides = materialize_frame(
        pre.select(
            "_id",
            "tok",
            "tf",
            "_th",
            (
                (F.col("_cum") - F.col("tf"))
                <= (1.0 - threshold) * F.col("_sz") + 1e-9
            ).alias("_isp"),
            (F.col("_df") <= token_df_cap).alias("_isb"),
        ),
        eager=False,
        reliable=reliable,
    )
    a = sides.filter("_isp").select("_id", "_th").alias("a")
    b = sides.filter("_isb").select("_id", "_th").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._th") == F.col("b._th")) & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least("a._id", "b._id").alias("d1"),
            F.greatest("a._id", "b._id").alias("d2"),
        )
        .distinct()
    )
    return _exact_verify(cand, sides.select("_id", "tok", "tf"), threshold)


# --------------------------------------------------------------------------
# ICWS sketch twin
# --------------------------------------------------------------------------


def _icws_pandas(n_hashes: int, seed: int):
    """Per-batch ICWS sampler: rows are (doc id, list<struct<tok,tf>>),
    output one row per (doc, hash k) with the 64-bit sample hash.
    Vectorized numpy over (K, n_tokens) per doc."""
    import hashlib

    import numpy as np

    def _splitmix64(z: "np.ndarray") -> "np.ndarray":
        z = (z + np.uint64(_SM_GAMMA)) & np.uint64(_MASK64)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(_SM_M1)) & np.uint64(_MASK64)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(_SM_M2)) & np.uint64(_MASK64)
        return z ^ (z >> np.uint64(31))

    def _uniform(z: "np.ndarray") -> "np.ndarray":
        # (0, 1]: top 53 bits, zero mapped to 1 ulp above 0
        u = (z >> np.uint64(11)).astype(np.float64) * (2.0**-53)
        return np.maximum(u, 2.0**-53)

    tok_cache: dict[str, int] = {}

    def _tok_h(tok: str) -> int:
        h = tok_cache.get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
            )
            tok_cache[tok] = h
        return h

    ks = np.arange(n_hashes, dtype=np.uint64).reshape(-1, 1)
    seed64 = np.uint64(seed * _SM_GAMMA & _MASK64)

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            ids, hks, shs = [], [], []
            for _id, entries in zip(pdf["_id"], pdf["_e"]):
                toks = np.array([_tok_h(e["tok"]) for e in entries], dtype=np.uint64)
                w = np.array([e["tf"] for e in entries], dtype=np.float64)
                # per-(k, token) streams: mix token digest with the
                # hash index and a per-draw constant
                base = (toks.reshape(1, -1) ^ ((ks + np.uint64(1)) * seed64)) & np.uint64(_MASK64)
                u1 = _uniform(_splitmix64(base + np.uint64(0x1111111111111111)))
                u2 = _uniform(_splitmix64(base + np.uint64(0x2222222222222222)))
                u3 = _uniform(_splitmix64(base + np.uint64(0x3333333333333333)))
                u4 = _uniform(_splitmix64(base + np.uint64(0x4444444444444444)))
                u5 = _uniform(_splitmix64(base + np.uint64(0x5555555555555555)))
                r = -np.log(u1 * u2)  # Gamma(2,1)
                c = -np.log(u3 * u4)  # Gamma(2,1)
                beta = u5  # U(0,1]
                lw = np.log(w)
                tk = np.floor(lw / r + beta)  # (K, T)
                y = np.exp(r * (tk - beta))
                a_val = c / (y * np.exp(r))
                arg = np.argmin(a_val, axis=1)  # (K,)
                sel_tok = toks[arg]
                sel_tk = tk[np.arange(n_hashes), arg]
                # sample identity = (token, t_k): mix into one 64-bit id
                sh = _splitmix64(
                    (sel_tok ^ (sel_tk.astype(np.int64).astype(np.uint64) * np.uint64(_SM_M1)))
                    & np.uint64(_MASK64)
                )
                ids.extend([_id] * n_hashes)
                hks.extend(range(n_hashes))
                shs.extend(sh.astype(np.int64))
            yield pd.DataFrame({"_id": ids, "k": hks, "sh": shs})

    return sample


def icws_sample_hashes(
    docs: DataFrame,
    n_hashes: int = 32,
    seed: int = 17,
    id_col: str = "doc_id",
    text_col: str = "text",
    ws: str = r"\s+",
    tf: DataFrame | None = None,
) -> DataFrame:
    """One row per (doc, k) with the k-th consistent weighted sample's
    64-bit hash; P[sh_k equal across two docs] = their exact J_w.

    ``seed=0`` is rejected: seed64 = seed * splitmix-gamma would be 0,
    making (k+1)*seed64 vanish for every hash index — all n_hashes
    streams would silently collapse to one identical sample and the
    banding detection-probability contract would be void.

    ``tf`` lets a caller that already built the per-(doc, token)
    frequency frame (``_tf``'s schema: _id, tok, tf) pass it in, so
    the tokenize-explode-groupBy scan is not repeated — the dominant
    pre-sketch cost when the same tf also feeds the exact verify."""
    if seed % (1 << 64) == 0:
        raise ValueError(
            "seed must be nonzero mod 2^64: seed=0 collapses every "
            "ICWS hash stream into one (seed64 = 0)"
        )
    if tf is None:
        tf = _tf(docs, id_col, text_col, ws)
    lists = tf.groupBy("_id").agg(
        F.collect_list(F.struct("tok", "tf")).alias("_e")
    )
    return lists.mapInPandas(
        _icws_pandas(n_hashes, seed), schema="_id long, k int, sh long"
    )


def icws_neardup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 32,
    n_bands: int = 8,
    seed: int = 17,
    id_col: str = "doc_id",
    text_col: str = "text",
    ws: str = r"\s+",
) -> DataFrame:
    """Banded-ICWS near-dup pairs (d1 < d2, exact wjac >= threshold):
    q52's band equi-join on weighted-sample signatures, candidates
    verified exactly (precision 1.0 by construction; recall is the
    banding detection probability 1 - (1 - t^r)^b)."""
    if n_hashes % n_bands != 0:
        raise ValueError(f"n_hashes ({n_hashes}) must divide into n_bands ({n_bands})")
    rows = n_hashes // n_bands
    # build the per-(doc, token) tf frame ONCE: it feeds both the
    # sampler and the exact verify (re-deriving it doubled the
    # dominant tokenize-explode-groupBy scan per call)
    tf = _tf(docs, id_col, text_col, ws)
    sh = icws_sample_hashes(docs, n_hashes, seed, id_col, text_col, ws, tf=tf)
    # band signature: xor-mix the band's sample hashes (order-free
    # would undercount — fold with position weights instead)
    bands = (
        sh.withColumn("band", (F.col("k") / rows).cast("int"))
        .groupBy("_id", "band")
        .agg(
            F.sum(
                F.hash(F.col("sh"), F.col("k")).cast("bigint")
            ).alias("sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("d1"), F.col("b._id").alias("d2"))
        .distinct()
    )
    return _exact_verify(cand, tf, threshold)


def icws_recall(threshold: float, n_hashes: int, n_bands: int) -> float:
    """Detection probability of a pair at exactly ``threshold`` under
    (n_hashes/n_bands)-row banding: 1 - (1 - t^r)^b (per-sample
    agreement probability IS the weighted Jaccard, Ioffe 2010)."""
    r = n_hashes // n_bands
    return 1.0 - (1.0 - threshold**r) ** n_bands


def icws_params_for(
    n_docs: int,
    threshold: float,
    j_rand: float = 0.05,
    min_recall: float = 0.9,
    target_candidates_per_doc: float = 4.0,
    max_bands: int = 256,
) -> tuple[int, int]:
    """Banding policy for ``icws_neardup_pairs`` at corpus scale —
    srp_params_for's analog for weighted sets: returns
    (n_hashes, n_bands).

    PRECISION-side cost: a random pair (weighted Jaccard ~ j_rand,
    corpus-dependent — estimate it from a pair sample; 0.05 suits
    ~20-token docs sharing a stopword or two) collides in a band with
    probability j_rand^r, so junk candidates per doc are
    ~ b * j_rand^r * n; r is chosen to keep that at
    target_candidates_per_doc — candidate volume then grows LINEARLY
    with the corpus. This is NOT optional at scale: the r5 probe's
    hand-picked r=2 at 200k docs let ~J^2-probability collisions
    flood the verify join until it spilled the disk; the policy's
    r=5 at the same scale keeps candidates ~n. RECALL-side: bands
    double until 1-(1-t^r)^b >= min_recall at the caller's threshold."""
    import math

    if not 0.0 < j_rand < threshold:
        raise ValueError(f"need 0 < j_rand < threshold, got {j_rand}, {threshold}")
    n_bands = 4
    while True:
        r = math.ceil(
            math.log(max(n_bands * max(n_docs - 1, 1) / target_candidates_per_doc, 2.0))
            / math.log(1.0 / j_rand)
        )
        r = min(max(r, 2), 64)
        if icws_recall(threshold, r * n_bands, n_bands) >= min_recall:
            return (r * n_bands, n_bands)
        if n_bands >= max_bands:
            return (r * n_bands, n_bands)  # best effort at the cap
        n_bands *= 2
