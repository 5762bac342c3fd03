#!/usr/bin/env python
"""Round-12: Arrow respelling of the FUSED text-MinHash signature
stage (the last JVM signature stage after the image/SRP/CDC Arrow
passes — "not yet optimized" item 3's deferral re-examined).

The stage is exactly reproducible in Python: Spark's split(text,
'\\s+') is Java split with limit -1 over the ASCII \\s class (the
chunking.py CDC tokenizer already pins this), shingles are plain
' '.join of 3 consecutive words (concat_ws never sees NULLs here),
the 32-bit hash is int(md5_hex[:8], 16) (hashlib.md5 == Spark md5 by
spec), and the 16 affine mins fit int64 with no overflow
(a*h+b <= 31*2^32 + ~1.3e5 << 2^63). array_distinct only dedups
work — min over a multiset ignores duplicates — so a set suffices.

Probe: interleaved A/B per shape (host drift control), forced
full-column evaluation via the SIGDISPATCH bit_xor(xxhash64(*))
aggregate — which doubles as the BIT-equality check: identical
aggregate over all output columns (mh array + band strings) pins the
Arrow rows == fused JVM rows as multisets.

Output: MHSIG_ARROW_PROBE_r12.json
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

REPS = 5


def arrow_sig_frame(df, id_col: str, text_col: str):
    """Probe-local Arrow spelling: one mapInArrow pass, signatures
    bit-identical to _minhash_sig_frame by construction."""
    from file_appender_spark.operators.chunking import _JAVA_WS_CLASS
    from file_appender_spark.operators.neardup_ingest import _spread
    from file_appender_spark.queries.llm import _MH_P, _MH_PARAMS

    import re

    ws_pat = _JAVA_WS_CLASS
    params = list(_MH_PARAMS)
    prime = _MH_P
    n_slots = len(params)
    n_bands = n_slots // 4

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        ws_re = re.compile(ws_pat)
        A = np.array([a for a, _ in params], dtype=np.int64).reshape(-1, 1)
        B = np.array([b for _, b in params], dtype=np.int64).reshape(-1, 1)
        cache: dict[str, int] = {}

        def h32(sh: str) -> int:
            h = cache.get(sh)
            if h is None:
                h = int(hashlib.md5(sh.encode("utf-8")).hexdigest()[:8], 16)
                cache[sh] = h
            return h

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            o_id, o_mh = [], []
            o_b = [[] for _ in range(n_bands)]
            for _id, text in zip(ids, texts):
                if text is None:
                    continue
                w = ws_re.split(text)
                if len(w) < 3:
                    continue
                sh = {f"{w[i]} {w[i+1]} {w[i+2]}" for i in range(len(w) - 2)}
                hs = np.fromiter(
                    (h32(s) for s in sh), dtype=np.int64, count=len(sh)
                )
                m = ((A * hs + B) % prime).min(axis=1)
                o_id.append(_id)
                o_mh.append(m.tolist())
                for bi in range(n_bands):
                    o_b[bi].append(
                        ",".join(str(int(x)) for x in m[4 * bi : 4 * bi + 4])
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, batch.schema.field(0).type),
                    pa.array(o_mh, pa.list_(pa.int64())),
                    *[pa.array(o_b[bi], pa.string()) for bi in range(n_bands)],
                ],
                [id_col, "mh", *[f"b{bi}" for bi in range(n_bands)]],
            )

    id_t = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_t}, mh array<bigint>, " + ", ".join(
        f"b{bi} string" for bi in range(n_bands)
    )
    return _spread(df.select(id_col, text_col)).mapInArrow(fn, schema=schema)


def force(df):
    cols = ", ".join(df.columns)
    return df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()[0][0]


def main() -> None:
    spark = get_spark(app_name="probe_mhsig_arrow_r12")
    spark.sparkContext.setLogLevel("ERROR")
    from file_appender_spark.operators.neardup_ingest import _minhash_sig_frame

    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 1)
        .localCheckpoint(eager=True)
    )
    out = {"probe": "r12_mhsig_arrow", "reps": REPS, "shapes": {}}
    for mult, label in [(1, "x1"), (4, "x4"), (16, "x16")]:
        docs = base.select(
            "doc_id",
            F.concat_ws(" ", *([F.col("text")] * mult)).alias("text"),
        ).localCheckpoint(eager=True)
        n = docs.count()
        words = docs.select(
            F.avg(F.size(F.split("text", r"\s+"))).alias("w")
        ).collect()[0]["w"]
        hj = force(_minhash_sig_frame(docs, "doc_id", "text"))  # warm
        ha = force(arrow_sig_frame(docs, "doc_id", "text"))  # warm
        assert hj == ha, f"{label}: forced hash mismatch {hj} vs {ha}"
        # interleaved reps
        jt, at = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            force(_minhash_sig_frame(docs, "doc_id", "text"))
            jt.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            force(arrow_sig_frame(docs, "doc_id", "text"))
            at.append(round(time.perf_counter() - t0, 3))
        jm, am = statistics.median(jt), statistics.median(at)
        out["shapes"][label] = {
            "docs": n,
            "avg_words": round(words, 1),
            "forced_hash_equal": True,
            "jvm_fused_sec": jm,
            "jvm_reps": jt,
            "arrow_sec": am,
            "arrow_reps": at,
            "arrow_speedup": round(jm / am, 2),
        }
        print(
            f"# {label}: {n} docs avg {words:.0f} words — jvm {jm}s "
            f"arrow {am}s ({jm/am:.2f}x), hash equal",
            file=sys.stderr,
        )
    with open("/root/repo/MHSIG_ARROW_PROBE_r12.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["shapes"]))


if __name__ == "__main__":
    main()
