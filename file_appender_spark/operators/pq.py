"""Product quantization (PQ) for embedding columns — the compression
and ANN-serving standard of IVF-PQ (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

A D-dim vector is split into ``m`` subvectors; each subvector is
replaced by the index of its nearest codeword in a per-subspace
codebook of ``k`` entries. Storage drops from D floats to m small
ints (64 dims -> 4 bytes at m=4, k=16), and search runs on the codes
via asymmetric distance computation (ADC): per query, one
(m x k) lookup table of exact query-to-codeword distances, then each
candidate scores as m table lookups instead of a D-dim dot product.

Spark mapping:
- **encode** is a generated-SQL per-row expression (the similarity.py
  lesson: literal codebooks + HOF folds stay in codegen; no join, no
  shuffle, no UDF). Encoding 100 TB of vectors is an embarrassingly
  parallel scan, like q88's scalar quantizer.
- **train** is Lloyd's algorithm as repeated (assign -> mean)
  aggregations: assignment reuses the encode expression with the
  current codebook; the update is one groupBy(code) over each
  subspace. Each iteration is one job; the codebook (m x k x D/m
  floats) lives on the driver and broadcasts as literals — there is
  never a shuffle keyed on anything but the code id.
- **ADC search** is an Arrow-batched ``mapInPandas`` over the code
  table with the per-query LUT computed once per batch in numpy —
  the blocked_topk pattern with m lookups per candidate instead of a
  D-dim BLAS row.

Determinism: codeword assignment folds subvector distances
dim-by-dim IN ORDER (the q88 contract), ties break on the lower
codeword index, and the seed codebook is the subvectors of the k
lowest-id vectors — so encode is bit-reproducible across engines,
runs, and partitionings, which is what q158 hash-checks. Trained
codebooks additionally average floats per cluster (order-noise below
1e-12); training determinism is pinned by the monotone-distortion
test, not by bit equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_double(x: float) -> str:
    return f"{x!r}D"


def seed_codebook(
    df: DataFrame, vec_col: str, m: int, k: int
) -> list[list[list[float]]]:
    """Deterministic initial codebook: the subvectors of the ``k``
    lowest-id vectors (id = first column of ``df``). Bounded collect
    of k rows by contract."""
    id_col = df.columns[0]
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least {k} vectors to seed, got {len(rows)}")
    dim = len(rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [[float(r[vec_col][s * sub + j]) for j in range(sub)] for r in rows]
        for s in range(m)
    ]


def _dist_sql(vec_col: str, s: int, sub: int, codeword: list[float]) -> str:
    """Squared L2 distance of subspace ``s`` of ``vec_col`` to one
    literal codeword, as a Spark SQL expression: slice, zip_with
    squared diffs, left-fold sum — dim-by-dim in order."""
    arr = "array(" + ",".join(_sql_double(c) for c in codeword) + ")"
    sl = f"slice({vec_col}, {s * sub + 1}, {sub})"
    return (
        f"aggregate(zip_with({sl}, {arr}, (x, c) -> (x - c) * (x - c)), "
        f"0.0D, (acc, d) -> acc + d)"
    )


def pq_assign_exprs(
    vec_col: str, codebook: list[list[list[float]]]
) -> list[tuple[F.Column, F.Column]]:
    """Per subspace: (code, squared distance) columns — argmin over
    the codebook via array_min on (dist, idx) structs, ties to the
    lower index. One generated expression per subspace; the whole
    assignment stays in codegen."""
    m = len(codebook)
    k = len(codebook[0])
    sub = len(codebook[0][0])
    out = []
    for s in range(m):
        structs = ", ".join(
            f"named_struct('d', {_dist_sql(vec_col, s, sub, codebook[s][c])}, "
            f"'i', {c})"
            for c in range(k)
        )
        best = F.expr(f"array_min(array({structs}))")
        out.append((best.getField("i"), best.getField("d")))
    return out


def _pq_encode_sql(
    df: DataFrame,
    vec_col: str,
    codebook: list[list[list[float]]],
    keep: list[str],
) -> DataFrame:
    pairs = pq_assign_exprs(vec_col, codebook)
    err = F.lit(0.0)
    for _, d in pairs:
        err = err + d
    return df.select(
        *keep,
        *[code.alias(f"code{s}") for s, (code, _) in enumerate(pairs)],
        err.alias("recon_err2"),
    )


def _pq_encode_arrow(
    df: DataFrame,
    vec_col: str,
    codebook: list[list[list[float]]],
    keep: list[str],
) -> DataFrame:
    """One vectorized Arrow pass over fixed-width vectors — the
    srp_sigs_arrow technique (r12, guide §4.2) applied to the encode
    folds: m*k interpreted ``aggregate(zip_with(...))`` trees per row
    (4*16 folds x 16 dims = 1024 expression evaluations at q158's
    shape) become numpy float64 ops vectorized over rows with the
    FOLD ORDER preserved — the JVM spelling is a left fold
    ``((0 + d_1) + d_2) + ...`` per codeword and a left fold over
    subspaces for recon_err2, so the numpy loops run sequentially
    over the dim and subspace axes, making every intermediate
    rounding — hence every distance, code and error — BIT-IDENTICAL.
    Ties pick the lower codeword index in both spellings (np.argmin
    first-minimum == the (d, i) struct array_min). Degenerate rows
    (NULL vector, NULL element, ragged length, NaN values) fall back
    to a per-row Python replica pinning the SQL semantics (NULL
    distances sort FIRST like the struct ordering; NaN sorts LAST,
    Spark's NaN-as-largest) — pinned against the SQL spelling in
    tests/test_pq.py."""
    m = len(codebook)
    k = len(codebook[0])
    sub = len(codebook[0][0])
    dim = m * sub
    cb = [[list(map(float, cw)) for cw in cbs] for cbs in codebook]
    fields = [df.schema[c] for c in keep]

    def compute(batches):
        import math

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        C = np.array(cb, dtype=np.float64)  # (m, k, sub)

        def slow_row(v):
            if v is None:
                v = []
            codes, err = [], 0.0
            err_none = False
            for s in range(m):
                ds = []
                for c in range(k):
                    acc, bad = 0.0, False
                    for j in range(sub):
                        idx = s * sub + j
                        x = v[idx] if idx < len(v) else None
                        if x is None:
                            bad = True
                            break
                        dd = float(x) - C[s, c, j]
                        acc = acc + dd * dd
                    ds.append(None if bad else acc)
                best_c, best_key = 0, None
                for c, d in enumerate(ds):
                    # struct (d, i) ordering: NULL first, NaN last
                    key = (
                        (0, 0.0)
                        if d is None
                        else ((2, 0.0) if math.isnan(d) else (1, d))
                    )
                    if best_key is None or key < best_key:
                        best_key, best_c = key, c
                codes.append(best_c)
                d_sel = ds[best_c]
                if d_sel is None:
                    err_none = True
                elif not err_none:
                    err = err + d_sel
            return codes, (None if err_none else err)

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            keeps = [rb.column(i) for i in range(len(keep))]
            vec = pc.cast(rb.column(len(keep)), pa.list_(pa.float64()))
            lens = pc.list_value_length(vec)
            clean = (
                vec.null_count == 0
                and vec.flatten().null_count == 0
                and pc.min(lens).as_py() == dim
                and pc.max(lens).as_py() == dim
            )
            if clean:
                V = vec.flatten().to_numpy(zero_copy_only=False).reshape(n, dim)
                if np.isnan(V).any():
                    clean = False  # NaN ordering differs from argmin
            if clean:
                codes_cols = []
                err_acc = np.zeros(n, dtype=np.float64)
                for s in range(m):
                    off = s * sub
                    D = np.empty((n, k), dtype=np.float64)
                    for c in range(k):
                        acc = np.zeros(n, dtype=np.float64)
                        crow = C[s, c]
                        for j in range(sub):
                            dd = V[:, off + j] - crow[j]
                            acc = acc + dd * dd
                        D[:, c] = acc
                    sel = np.argmin(D, axis=1)  # first min == lower idx
                    codes_cols.append(sel.astype(np.int32))
                    err_acc = err_acc + D[np.arange(n), sel]
                arrays = keeps + [pa.array(c) for c in codes_cols] + [
                    pa.array(err_acc)
                ]
            else:
                pl = vec.to_pylist()
                rows = [slow_row(v) for v in pl]
                arrays = keeps + [
                    pa.array([r[0][s] for r in rows], type=pa.int32())
                    for s in range(m)
                ] + [
                    pa.array([r[1] for r in rows], type=pa.float64())
                ]
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=keep + [f"code{s}" for s in range(m)] + ["recon_err2"],
            )

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in fields]
        + [f"code{s} int" for s in range(m)]
        + ["recon_err2 double"]
    )
    return df.select(*keep, vec_col).mapInArrow(compute, schema=out_schema)


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebook: list[list[list[float]]],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Encode every vector: ``code{s}`` per subspace plus the total
    squared reconstruction error (= sum of subspace distances, summed
    in subspace order). Fixed-width frames take the vectorized Arrow
    pass (bit-identical by sequential-fold construction —
    _pq_encode_arrow's contract, pinned in tests/test_pq.py); an
    empty frame (no dim to validate the codebook against) keeps the
    generated-SQL spelling."""
    keep = keep_cols if keep_cols is not None else [df.columns[0]]
    from file_appender_spark.operators.similarity import _vec_dim

    dim = _vec_dim(df.select(F.col(vec_col).alias("v")), F.col("v"))
    if dim is None:
        return _pq_encode_sql(df, vec_col, codebook, keep)
    return _pq_encode_arrow(df, vec_col, codebook, keep)


def pq_train(
    df: DataFrame,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
) -> list[list[list[float]]]:
    """Lloyd's k-means per subspace, all subspaces in one pass per
    iteration: assign with the current codebook (generated-SQL argmin,
    no shuffle), then ONE groupBy per subspace over (code) computing
    the mean subvector via ``avg`` on posexploded dims. Empty clusters
    keep their previous codeword. Returns the trained codebook."""
    codebook = seed_codebook(df, vec_col, m, k)
    sub = len(codebook[0][0])
    for _ in range(iters):
        pairs = pq_assign_exprs(vec_col, codebook)
        assigned = df.select(
            vec_col,
            F.array(*[code for code, _ in pairs]).alias("_codes"),
        )
        # ONE aggregation job per iteration: posexplode the full
        # vector, derive (subspace, local dim) from the position and
        # the subspace's code from the codes array, mean per cell —
        # m*k*sub result cells, a single scan + shuffle (a per-subspace
        # loop here would rescan and re-assign m times per iteration)
        rows = (
            assigned.select("_codes", F.posexplode(vec_col).alias("j", "x"))
            .select(
                (F.col("j") / sub).cast("int").alias("s"),
                F.pmod(F.col("j"), F.lit(sub)).alias("jl"),
                F.element_at(
                    "_codes", (F.col("j") / sub).cast("int") + 1
                ).alias("code"),
                "x",
            )
            .groupBy("s", "code", "jl")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        new_cb = [[list(cw) for cw in cbs] for cbs in codebook]
        # empty clusters keep their previous codeword (no row emitted)
        for r in rows:
            new_cb[r["s"]][r["code"]][r["jl"]] = float(r["mu"])
        codebook = new_cb
    return codebook


def pq_distortion(df: DataFrame, vec_col: str, codebook) -> float:
    """Mean squared reconstruction error over the dataset."""
    row = (
        pq_encode(df, vec_col, codebook)
        .agg(F.avg("recon_err2").alias("d"))
        .first()
    )
    return float(row["d"])


def adc_topk(
    queries: list[tuple[int, list[float]]],
    encoded: DataFrame,
    codebook: list[list[list[float]]],
    k_results: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: for each (query_id, vector), build
    the (m x k) exact query-to-codeword distance LUT once, score every
    encoded row as m LUT lookups (numpy fancy indexing over Arrow
    batches), keep the per-batch top-k, then resolve the global top-k
    with one tiny aggregation. Approximation error is exactly PQ's
    reconstruction error; recall is pinned by test vs exact search."""
    import numpy as np
    import pandas as pd

    m = len(codebook)
    sub = len(codebook[0][0])
    id_col = encoded.columns[0]
    luts = []  # (qid, m x k ndarray)
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        lut = np.stack(
            [
                ((np.asarray(codebook[s], dtype=np.float64)
                  - q[s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
                for s in range(m)
            ]
        )
        luts.append((qid, lut))

    code_cols = [f"code{s}" for s in range(m)]

    def score(batches):
        for pdf in batches:
            codes = pdf[code_cols].to_numpy()
            ids = pdf[id_col].to_numpy()
            out = []
            for qid, lut in luts:
                d2 = np.zeros(len(pdf))
                for s in range(m):
                    d2 += lut[s][codes[:, s]]
                # PQ makes exact distance ties the norm (one code tuple
                # per tight cluster) — truncate on (d2, id), the SAME
                # order the final window ranks by, or the per-batch cut
                # keeps arbitrary Arrow-row-order ids and the output
                # becomes partitioning-dependent
                idx = np.lexsort((ids, d2))[:k_results]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: ids[idx],
                            "adc_dist2": d2[idx],
                        }
                    )
                )
            if out:  # empty queries list -> no frames; concat would raise
                yield pd.concat(out, ignore_index=True)

    spark = encoded.sparkSession
    partial = encoded.select(id_col, *code_cols).mapInPandas(
        score, schema=f"query_id long, {id_col} long, adc_dist2 double"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy("adc_dist2", id_col)
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_results)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# IVF-PQ: sign-cell coarse index + ADC scoring over codes — the
# production ANN serving architecture (IVFADC in Jégou et al. 2011)
# --------------------------------------------------------------------------


def ivf_pq_index(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_size: int = 1024,
    n_rows: int | None = None,
) -> tuple[DataFrame, int, list[list[float]]]:
    """Build the serving index: every vector gets its sign-IVF cell
    (operators/similarity's sized-cell quantizer — cells ~
    n_rows/target_cell_size) and its PQ codes. One zero-join
    projection; the index is (id, cell, code0..codeM) — m bytes per
    vector plus the cell id, the 100 TB-resident form of the corpus.

    Returns a ``(index_df, n_bits, coefs)`` tuple: the index frame
    plus the cell-quantizer metadata that ``ivf_pq_search`` needs to
    assign query cells identically (pass both through verbatim)."""
    from file_appender_spark.operators.similarity import (
        _srp_coefs,
        _srp_cell_sql,
        ivf_bits_for,
    )

    if n_rows is None:
        n_rows = corpus.count()
    n_bits = ivf_bits_for(n_rows, target_cell_size)
    v = corpus.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    dim = len(codebook) * len(codebook[0][0])
    coefs = _srp_coefs(corpus.sparkSession, n_bits, dim)
    cells = v.withColumn("cell", _srp_cell_sql("v", n_bits, coefs))
    enc = pq_encode(cells, "v", codebook, keep_cols=[id_col, "cell"])
    return enc.drop("recon_err2"), n_bits, coefs


def _py_cell(qv: list[float], n_bits: int, coefs: list[list[float]]) -> int:
    """Driver-side cell of a plain Python vector: the same left-fold
    dot products as the SQL path (Python floats ARE IEEE doubles and
    the fold order matches, so signs agree bit-for-bit)."""
    cell = 0
    for b in range(n_bits):
        s = 0.0
        for x, c in zip(qv, coefs[b]):
            s += x * c
        cell = cell * 2 + (1 if s >= 0 else 0)
    return cell


def ivf_pq_search(
    index: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]],
    n_bits: int,
    coefs: list[list[float]],
    k_results: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """IVFADC search: per query probe its cell (plus ``nprobe - 1``
    single-bit-flip neighbor cells), equi-join the probes against the
    index on the cell id, then score candidates with the per-query
    ADC lookup table (m lookups per candidate, numpy over Arrow
    batches). Per-query work is ~cell_size * nprobe LUT rows
    regardless of corpus size; the scored-candidate stream resolves
    to the global top-k with one bounded window."""
    import numpy as np
    import pandas as pd

    m = len(codebook)
    sub = len(codebook[0][0])
    id_col = index.columns[0]
    spark = index.sparkSession

    probe_rows = []
    luts = {}
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        luts[qid] = np.stack(
            [
                ((np.asarray(codebook[s], dtype=np.float64)
                  - q[s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
                for s in range(m)
            ]
        )
        cell = _py_cell(qv, n_bits, coefs)
        probe_rows.append((qid, cell))
        for b in range(min(nprobe - 1, n_bits)):
            probe_rows.append((qid, cell ^ (1 << (n_bits - 1 - b))))
    probes = spark.createDataFrame(probe_rows, "query_id long, cell long")

    code_cols = [f"code{s}" for s in range(m)]
    cand = index.join(F.broadcast(probes), "cell")

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for qid, grp in pdf.groupby("query_id"):
                lut = luts[int(qid)]
                codes = grp[code_cols].to_numpy()
                ids = grp[id_col].to_numpy()
                d2 = np.zeros(len(grp))
                for s in range(m):
                    d2 += lut[s][codes[:, s]]
                # truncate on (d2, id) — the final window's order —
                # so tied candidates resolve identically whatever the
                # partitioning (see adc_topk)
                idx = np.lexsort((ids, d2))[:k_results]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": int(qid),
                            id_col: ids[idx],
                            "adc_dist2": d2[idx],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = cand.select("query_id", id_col, *code_cols).mapInPandas(
        score, schema=f"query_id long, {id_col} long, adc_dist2 double"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy("adc_dist2", id_col)
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_results)
        .drop("rn")
    )
