"""Small-files compaction for warehouse tables.

Incremental loads (R1 range replacement, streaming foreachBatch appends)
accumulate small files per partition; at 100 TB the file count — not the
byte count — becomes the bottleneck (driver listing time, task overhead,
NameNode/S3 metadata pressure). Compaction rewrites each partition's files
into ~target-sized outputs without changing content.

Implementation: read → repartition to max(1, bytes/target) within the same
partition layout → rewrite to a staging path → atomic directory swap. The
staging+swap avoids the read-overwrite conflict and leaves the table
readable until the swap."""

from __future__ import annotations

from pyspark.sql import SparkSession

from .range_replace import PARTITION_COL

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet table directory."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    n, total = 0, 0
    if not fs.exists(p):  # never-written table (S6 empty-guard upstream)
        return 0, 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") and not name.startswith("_"):
            n += 1
            total += f.getLen()
    return n, total


def compact_table(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> tuple[int, int]:
    """Rewrite ``path`` with ~target_bytes files; returns (files_before,
    files_after). Partitioned tables keep their partition layout."""
    before, total = table_file_stats(spark, path)
    if before == 0:  # nothing on disk: compaction is a no-op, not a crash
        return 0, 0
    df = spark.read.parquet(path)
    n_out = max(1, (total + target_bytes - 1) // target_bytes)
    partitioned = PARTITION_COL in df.columns
    if partitioned:
        # distribute by partition value so each output file stays within one
        # partition directory
        writer = df.repartition(int(n_out), PARTITION_COL)
    else:
        writer = df.coalesce(int(n_out)) if n_out < before else df.repartition(int(n_out))
    staging = f"{path}__compact_staging"
    w = writer.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partitioned:
        w = w.partitionBy(PARTITION_COL)
    w.parquet(staging)
    # atomic-ish swap: rename old out of the way, staging in, drop old
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    old = jvm.org.apache.hadoop.fs.Path(f"{path}__compact_old")
    fs.delete(old, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(path), old)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), jvm.org.apache.hadoop.fs.Path(path))
    fs.delete(old, True)
    after, _ = table_file_stats(spark, path)
    return before, after
