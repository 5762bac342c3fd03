"""File-layout maintenance: small-file compaction and range-clustered
rewrite for data skipping.

At 100 TB the dominant operational cost of a parquet lake is layout,
not compute: streaming sinks and over-parallel writes leave thousands
of KB-sized files (NameNode pressure, per-file open cost, tiny row
groups that defeat vectorized IO), and unsorted data defeats min/max
row-group skipping so every query scans everything. The two operators
here are the Spark-native analogs of a table format's OPTIMIZE:

- ``compact``: rewrite a directory to ~target-sized files; file count
  is planned from the MEASURED input bytes (filesystem listing — a
  driver-side metadata call, not a data read), never guessed.
- ``cluster_by``: range-partition + sort-within-partitions on the
  given columns so each output file covers a narrow, non-overlapping
  key range — point/range predicates then prune whole files via
  parquet footer min/max stats, before any row is read.

The reference has no layout maintenance (its appender mitigates small
files at write time by appending into existing files until a size
threshold — FileAppenderSink.java:48-59, AppendOutputFormat.java:80-99;
``compact`` is the batch-world generalization of that same goal).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_MB = 128


def dir_bytes(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of data files under ``path``, via the Hadoop
    FileSystem API (works for file://, hdfs://, s3a:// alike).
    Metadata-only: one recursive listing, no data read."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(suffix) and not name.startswith(("_", ".")):
            total += status.getLen()
    return total


def plan_file_count(total_bytes: int, target_file_mb: int = DEFAULT_TARGET_FILE_MB) -> int:
    """Files needed so each lands near the target size. Parquet
    re-encodes on rewrite so output bytes differ from input bytes,
    but the ratio is near 1 for already-columnar input; the point is
    the ORDER OF MAGNITUDE (4000 files -> 8, not 4000 -> 3997)."""
    return max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_file_mb``-sized files; returns the planned file count.

    Scale: the rewrite is one narrow job (scan -> exchange -> write).
    With ``sort_cols`` it becomes ``cluster_by`` (range exchange);
    without, a round-robin repartition that also breaks up skewed
    input files. Runs per partition/prefix in production so a 100 TB
    table compacts incrementally, not in one job."""
    df = spark.read.parquet(src)
    n = plan_file_count(dir_bytes(spark, src), target_file_mb)
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n


def cluster_by(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Range-cluster ``df`` so each output partition (= file on
    write) covers a narrow, non-overlapping range of ``cols``.

    ``repartitionByRange`` samples the key distribution to place
    boundaries (balanced files even under skew); the within-partition
    sort makes every parquet ROW GROUP's min/max tight too, so
    skipping works at both file and row-group granularity."""
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer stats —
    the exact metadata a scan's skipping logic consults. Driver-side
    footers-only read; used by tests to PROVE a layout skips."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return []  # stats missing: no skipping possible
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _quantile_code(col: str, boundaries: list[float]):
    """Map a numeric column to its quantile bucket 0..len(boundaries)
    by counting boundaries <= x — a single JVM higher-order filter
    over a literal array (one fold per row; NOT nested, so it stays
    inside whole-stage codegen). Rank-space coding makes the z-curve
    skew-proof: equal-population cells regardless of the value
    distribution. Nulls sort to bucket 0."""
    from pyspark.sql import functions as F

    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    x = F.col(col).cast("double")
    cnt = F.size(F.filter(arr, lambda b: b <= x))
    return F.when(x.isNull(), F.lit(0)).otherwise(cnt)


def _interleave_bits(codes, bits: int):
    """Interleave ``bits`` low bits of each code column into one
    BIGINT Morton (z-order) key, pure shift/and/or arithmetic —
    no UDF, fully codegen'd."""
    from pyspark.sql import functions as F

    k = len(codes)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(codes):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_by(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8
) -> DataFrame:
    """Multi-dimensional clustering (the OPTIMIZE ZORDER analog):
    rank-normalize each column to a ``bits``-bit code via sampled
    quantile boundaries, interleave the codes into a Morton key, then
    range-partition + sort on that key.

    ``cluster_by`` gives perfect skipping on its leading column and
    none on the rest; the z-curve trades a little of the first
    dimension's locality for skipping on EVERY listed dimension —
    each output file covers a small hyper-rectangle of rank space, so
    footer min/max prunes files for predicates on any clustered
    column. That trade is exactly why lakehouse OPTIMIZE implements
    ZORDER this way (quantile-coded interleave, e.g. Delta's
    range_partition_id approach).

    Scale: ``approxQuantile`` is one sampled pass per column
    (driver gets ~255 doubles back — metadata-sized); the coding +
    interleave is a stateless projection; the only shuffle is the
    final range exchange the rewrite needs anyway. Run per partition
    in production so a 100 TB table z-orders incrementally."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    codes = []
    for c in cols:
        bounds = df.approxQuantile(c, probs, 0.01)
        codes.append(_quantile_code(c, bounds))
    return (
        df.withColumn("_zkey", _interleave_bits(codes, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
