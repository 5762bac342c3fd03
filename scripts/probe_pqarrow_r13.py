"""PQARROW_PROBE_r13 — A/B the q158 pq_encode spelling: generated-SQL
struct-min folds vs the vectorized mapInArrow pass (guide §4.2).

Interleaved reps in one JVM, noop sink (guide §1.4), labeled jobs
(§1.5).  Run:  python scripts/probe_pqarrow_r13.py [sf_dir] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
out_path = sys.argv[2] if len(sys.argv) > 2 else "PQARROW_PROBE_r13.json"
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("pqarrow_probe_r13")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from file_appender_spark.operators.pq import (  # noqa: E402
    _pq_encode_arrow,
    _pq_encode_sql,
    seed_codebook,
)
from file_appender_spark.queries.mining import _PQ_K, _PQ_M  # noqa: E402
from file_appender_spark.sources.catalog import load_table  # noqa: E402

emb = load_table(spark, sf_dir, "embeddings")
v = emb.select(
    "vec_id",
    F.transform("embedding", lambda x: x.cast("double")).alias("e"),
)
codebook = seed_codebook(v, "e", _PQ_M, _PQ_K)
n = v.count()  # warm the scan cache / JIT the read path once

def run(tag, fn):
    spark.sparkContext.setJobDescription(f"pqarrow_{tag}")
    t0 = time.perf_counter()
    df = fn(v, "e", codebook, ["vec_id"])
    df = df.select(
        "vec_id",
        *[F.col(f"code{s}").cast("int") for s in range(_PQ_M)],
        F.round("recon_err2", 6),
    )
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

# JIT warmup rep (both arms), then interleaved measured reps
res = {"sf_dir": sf_dir, "cpus": cpus, "n_vectors": n,
       "m": _PQ_M, "k": _PQ_K, "sql": [], "arrow": []}
run("warm_sql", _pq_encode_sql)
run("warm_arrow", _pq_encode_arrow)
for rep in range(4):
    res["sql"].append(run(f"sql_{rep}", _pq_encode_sql))
    res["arrow"].append(run(f"arrow_{rep}", _pq_encode_arrow))

t0 = time.perf_counter()
spark.range(100_000_000).selectExpr("sum(id)").collect()
res["calib_jvm_range_sum_1e8_sec"] = round(time.perf_counter() - t0, 3)
res["median_sql"] = sorted(res["sql"])[len(res["sql"]) // 2]
res["median_arrow"] = sorted(res["arrow"])[len(res["arrow"]) // 2]
res["speedup_median"] = round(res["median_sql"] / res["median_arrow"], 2)

with open(out_path, "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))
spark.stop()
