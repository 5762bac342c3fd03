#!/usr/bin/env python
"""Round-12 instrumentation (r11 verdict task 1): attribute the
per-epoch FIXED overhead of the bench-shaped textdup/imagedup ingest
epoch — which JOBS run, what each costs, and how much wall time is
driver scheduling gaps between jobs/stages rather than executor work.

Method: a dedicated session with the Spark event log enabled writes
one JSON event per job/stage; after the timed epoch the log is parsed
into a per-job timeline (name, submit, complete, stage count) plus
the inter-job gaps. The bench shape is reproduced exactly
(bench.py:346-410): sf0.1 documents, half populate / half timed.

Output: EPOCH_OVERHEAD_PROBE_r12.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def parse_event_log(log_dir: str, t_lo: float, t_hi: float) -> dict:
    """Jobs/stages inside [t_lo, t_hi] (epoch wall-clock, unix ms)."""
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    files = []
    for root, _dirs, names in os.walk(log_dir):
        files.extend(
            os.path.join(root, f)
            for f in names
            if "events" in f or f.startswith("local-")
        )
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "job": jid,
                        "submit_ms": ev["Submission Time"],
                        "stages": len(ev.get("Stage Infos", [])),
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        )[:100],
                        "callsite": (ev.get("Properties") or {}).get(
                            "callSite.short", ""
                        ),
                    }
                elif kind == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["complete_ms"] = ev["Completion Time"]
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub and comp:
                        stages[sid] = {
                            "stage": sid,
                            "name": si.get("Stage Name", "")[:80],
                            "submit_ms": sub,
                            "complete_ms": comp,
                            "tasks": si.get("Number of Tasks"),
                        }
    lo_ms, hi_ms = t_lo * 1000, t_hi * 1000
    jrows = sorted(
        (
            j
            for j in jobs.values()
            if "complete_ms" in j and lo_ms <= j["submit_ms"] <= hi_ms
        ),
        key=lambda j: j["submit_ms"],
    )
    srows = sorted(
        (s for s in stages.values() if lo_ms <= s["submit_ms"] <= hi_ms),
        key=lambda s: s["submit_ms"],
    )
    # wall accounted by jobs vs gaps between consecutive jobs
    out_jobs = []
    prev_end = lo_ms
    for j in jrows:
        out_jobs.append(
            {
                "job": j["job"],
                "gap_before_s": round((j["submit_ms"] - prev_end) / 1000, 3),
                "dur_s": round((j["complete_ms"] - j["submit_ms"]) / 1000, 3),
                "stages": j["stages"],
                "callsite": j.get("callsite", ""),
            }
        )
        prev_end = max(prev_end, j["complete_ms"])
    out_stages = []
    for s in srows:
        out_stages.append(
            {
                "stage": s["stage"],
                "dur_s": round((s["complete_ms"] - s["submit_ms"]) / 1000, 3),
                "tasks": s["tasks"],
                "name": s["name"],
            }
        )
    job_sum = sum(j["dur_s"] for j in out_jobs)
    gap_sum = sum(j["gap_before_s"] for j in out_jobs)
    tail = round(hi_ms / 1000 - prev_end / 1000, 3)
    return {
        "epoch_wall_s": round(t_hi - t_lo, 3),
        "job_time_s": round(job_sum, 3),
        "inter_job_gap_s": round(gap_sum, 3),
        "tail_after_last_job_s": tail,
        "n_jobs": len(out_jobs),
        "n_stages": len(out_stages),
        "stage_time_sum_s": round(sum(s["dur_s"] for s in out_stages), 3),
        "jobs": out_jobs,
        "stages": out_stages,
    }


def run_epoch(spark, kind: str, ingest_fn, mk_frames) -> dict:
    half, rest = mk_frames(spark)
    n_batch = rest.count()
    td = tempfile.mkdtemp()
    try:
        store = os.path.join(td, "store")
        ingest_fn(spark, half, store)  # populate (untimed)
        t0 = time.time()
        admitted = ingest_fn(spark, rest, store)
        n_adm = admitted.count()
        t1 = time.time()
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return {"kind": kind, "t0": t0, "t1": t1, "n_batch": n_batch, "n_admitted": n_adm,
            "docs_per_sec": int(n_batch / (t1 - t0))}


def main() -> None:
    log_dir = tempfile.mkdtemp(prefix="eventlog_")
    spark = get_spark(
        app_name="probe_epoch_overhead_r12",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    from file_appender_spark.operators.neardup_ingest import (
        imagedup_ingest_batch,
        textdup_ingest_batch,
    )

    def mk_text(spark):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
            "doc_id", "text"
        )
        return (
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        )

    def mk_img(spark):
        pay = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
            "doc_id", F.encode("text", "UTF-8").alias("payload")
        )
        return (
            pay.filter(F.col("doc_id") % 2 == 0),
            pay.filter(F.col("doc_id") % 2 == 1),
        )

    def tfn(spark, df, store):
        return textdup_ingest_batch(spark, df, store, threshold=0.5)

    results = {}
    # warm run first (codegen/JIT), then the measured run
    for kind, fn, mk in [
        ("textdup_warm", tfn, mk_text),
        ("textdup", tfn, mk_text),
        ("imagedup_warm", imagedup_ingest_batch, mk_img),
        ("imagedup", imagedup_ingest_batch, mk_img),
    ]:
        r = run_epoch(spark, kind, fn, mk)
        results[kind] = r
        print(f"# {kind}: {r['docs_per_sec']} docs/s "
              f"({r['n_admitted']}/{r['n_batch']})", file=sys.stderr)

    spark.stop()  # flush the event log
    time.sleep(2)
    out = {"sf_dir": SF_DIR}
    for kind in ("textdup", "imagedup"):
        r = results[kind]
        out[kind] = {
            "docs_per_sec": r["docs_per_sec"],
            "n_admitted": r["n_admitted"],
            "timeline": parse_event_log(log_dir, r["t0"], r["t1"]),
        }
    shutil.rmtree(log_dir, ignore_errors=True)
    with open("/root/repo/EPOCH_OVERHEAD_PROBE_r12.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v["docs_per_sec"] for k, v in out.items()
                      if isinstance(v, dict) and "docs_per_sec" in v}))


if __name__ == "__main__":
    main()
