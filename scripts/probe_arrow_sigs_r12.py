#!/usr/bin/env python
"""r12 probe: the Arrow (mapInArrow + numpy) image-signature stage vs
the shipped exploded/SQL spellings.

1. BIT-EQUALITY on adversarial payload shapes (empty, NULL, 1 byte,
   grid-1/grid/grid+1 bytes, all-zero bytes, long, high-entropy) for
   BOTH hash modes — multiset equality of (id, b0..b3).
2. Timing at the bench epoch shape (2500 sf0.1 documents-as-payloads,
   forced full-column evaluation via the noop sink) — medians of 5.

Writes ARROW_SIGS_PROBE_r12.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.operators.imagehash import (  # noqa: E402
    ahash_ingest_sigs_sql,
    ahash_wide,
    dhash_wide,
    image_sigs_arrow,
)
from file_appender_spark.operators.neardup_ingest import _spread  # noqa: E402
from file_appender_spark.session import get_spark  # noqa: E402
from file_appender_spark.sources.catalog import load_table  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def medtime(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    ts.sort()
    return ts[len(ts) // 2], ts


def main() -> None:
    spark = get_spark(app_name="probe_arrow_sigs_r12")
    out: dict = {"probe": "r12_arrow_image_sigs"}

    # ---- 1. bit-equality on adversarial shapes ----
    rows = [
        (1, b""),
        (2, None),
        (3, b"\x00"),
        (4, b"\xff" * 63),
        (5, b"\x01\x02\x03" * 64),
        (6, bytes(range(256)) * 9 + b"tail"),
        (7, b"\x00" * 500),
        (8, os.urandom(0).join([bytes([(i * 37 + 11) % 256]) for i in range(2049)])),
        (9, b"a" * 64),
        (10, b"ab" * 1000),
    ]
    adv = spark.createDataFrame(rows, "doc_id long, payload binary")
    checks = {}
    for mode, wide in (("ahash", ahash_wide), ("dhash", dhash_wide)):
        ref = sorted(
            wide(adv, "doc_id", "payload")
            .select("doc_id", "b0", "b1", "b2", "b3")
            .collect()
        )
        got = sorted(
            image_sigs_arrow(adv, "doc_id", "payload", hash_mode=mode).collect()
        )
        checks[mode] = [tuple(r) for r in ref] == [tuple(r) for r in got]
        assert checks[mode], (mode, ref[:3], got[:3])
    # SQL spelling parity for ahash (it also carries bh/fh)
    ref_sql = sorted(
        ahash_ingest_sigs_sql(adv, "doc_id", "payload")
        .select("doc_id", "b0", "b1", "b2", "b3")
        .collect()
    )
    got_a = sorted(image_sigs_arrow(adv, "doc_id", "payload", "ahash").collect())
    checks["ahash_vs_sql"] = [tuple(r) for r in ref_sql] == [tuple(r) for r in got_a]
    assert checks["ahash_vs_sql"]
    out["bitequal"] = checks

    # bench-corpus equality too (real length distribution)
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    pay = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")).limit(
        2500
    )
    pay = pay.localCheckpoint(eager=True)
    for mode, wide in (("ahash", ahash_wide), ("dhash", dhash_wide)):
        ref = sorted(
            wide(pay, "doc_id", "payload")
            .select("doc_id", "b0", "b1", "b2", "b3")
            .collect()
        )
        got = sorted(image_sigs_arrow(pay, "doc_id", "payload", mode).collect())
        eq = [tuple(r) for r in ref] == [tuple(r) for r in got]
        out[f"bitequal_bench_{mode}"] = eq
        assert eq, mode

    # ---- 2. timing at the bench epoch shape ----
    spread = _spread(pay).localCheckpoint(eager=True)
    # warm codegen + python workers
    force(ahash_ingest_sigs_sql(spread, "doc_id", "payload"))
    force(image_sigs_arrow(spread, "doc_id", "payload", "ahash"))
    force(dhash_wide(spread, "doc_id", "payload").select("doc_id", "b0", "b1", "b2", "b3"))
    force(image_sigs_arrow(spread, "doc_id", "payload", "dhash"))

    spark.sparkContext.setJobDescription("sig stage: ahash SQL (exploded)")
    out["ahash_sql_sec"], out["ahash_sql_reps"] = medtime(
        lambda: force(ahash_ingest_sigs_sql(spread, "doc_id", "payload"))
    )
    spark.sparkContext.setJobDescription("sig stage: ahash arrow")
    out["ahash_arrow_sec"], out["ahash_arrow_reps"] = medtime(
        lambda: force(image_sigs_arrow(spread, "doc_id", "payload", "ahash"))
    )
    spark.sparkContext.setJobDescription("sig stage: dhash DataFrame (exploded)")
    out["dhash_df_sec"], out["dhash_df_reps"] = medtime(
        lambda: force(
            dhash_wide(spread, "doc_id", "payload").select(
                "doc_id", "b0", "b1", "b2", "b3"
            )
        )
    )
    spark.sparkContext.setJobDescription("sig stage: dhash arrow")
    out["dhash_arrow_sec"], out["dhash_arrow_reps"] = medtime(
        lambda: force(image_sigs_arrow(spread, "doc_id", "payload", "dhash"))
    )
    spark.sparkContext.setJobDescription(None)

    path = os.path.join(REPO, "ARROW_SIGS_PROBE_r12.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
