"""Warehouse writers: overwrite / append / idempotent range replacement
(reference parity: S4, S5, S6, R1, O7).

The reference implements idempotent incremental loads as two *non-atomic*
BigQuery jobs: ``DELETE FROM t WHERE DATE(LOWER(f)) BETWEEN a AND b`` then a
``WRITE_APPEND`` load of the re-extracted rows (reference utils.py:255-283,
utils.py:391-398; "Idempotência" README.md:10). A crash between the two loses
the range. Spark's dynamic partition overwrite replaces the touched
partitions atomically in one job — same intent, strictly safer, and it
scales: only the partitions intersecting the range are rewritten, never the
whole table.

Tables written by this module are date-partitioned parquet directories
(partition column ``p_date`` derived from the table's filter field), which is
what makes range replacement a metadata-local operation at 100 TB. On a real
cluster you'd put Delta/Iceberg underneath for snapshot isolation; the
operator surface here stays identical.
"""

from __future__ import annotations

import datetime as dt

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "p_date"

# Partition granularity is a per-table choice (registry.TableSpec): a 7-year
# daily fact means ~2500 directories — death by file listing on any
# filesystem; monthly keeps it at ~84 while date-filter partition pruning
# still works (p_date is the truncated date, pruning compares ranges).
GRANULARITIES = ("day", "month")


def _partition_expr(filter_field: str, granularity: str):
    if granularity == "day":
        return F.to_date(F.col(filter_field))
    if granularity == "month":
        return F.to_date(F.date_trunc("month", F.col(filter_field)))
    raise ValueError(f"granularity must be one of {GRANULARITIES}, got {granularity!r}")


def _with_partition(df: DataFrame, filter_field: str, granularity: str = "day") -> DataFrame:
    return df.withColumn(PARTITION_COL, _partition_expr(filter_field, granularity))


def _partition_of(day: str, granularity: str) -> dt.date:
    """The partition value a given ISO day falls into."""
    d = dt.date.fromisoformat(day)
    return d if granularity == "day" else d.replace(day=1)


def _delete_partitions(spark: SparkSession, path: str, parts: list) -> None:
    """Remove partition directories via the Hadoop FileSystem API (works on
    local FS, HDFS, and S3A alike — same code path a cluster uses)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for p in parts:
        ppath = jvm.org.apache.hadoop.fs.Path(f"{path}/{PARTITION_COL}={p}")
        fs = ppath.getFileSystem(conf)
        fs.delete(ppath, True)


def overwrite_table(
    df: DataFrame, path: str, filter_field: str | None = None, granularity: str = "day"
) -> None:
    """S4 — full-replace load (reference WRITE_TRUNCATE, utils.py:309,
    config.py:72-90). Partitioned by date when the table has a filter field
    so later incremental loads and date-pruned scans work."""
    if df.isEmpty():  # S6 guard (reference utils.py:287-292)
        return
    # force static overwrite: the session default is dynamic (for R1), which
    # would silently turn a full replace into a partial one
    w = df.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if filter_field:
        w = (
            _with_partition(df, filter_field, granularity)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(PARTITION_COL)
        )
    w.parquet(path)


def append_table(
    df: DataFrame, path: str, filter_field: str | None = None, granularity: str = "day"
) -> None:
    """S5 — append load (reference WRITE_APPEND, utils.py:309-317)."""
    if df.isEmpty():
        return
    w = df.write.mode("append")
    if filter_field:
        w = (
            _with_partition(df, filter_field, granularity)
            .write.mode("append")
            .partitionBy(PARTITION_COL)
        )
    w.parquet(path)


def replace_range(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    filter_field: str,
    start: str | dt.date,
    end: str | dt.date,
    granularity: str = "day",
) -> None:
    """R1 — idempotent day-granular range replacement: after this call, the
    table's content for dates in ``[start, end]`` is exactly the in-range
    rows of ``new_rows`` (rows outside the range are ignored, mirroring the
    reference where extraction and delete share the same range).

    One atomic job: dynamic partition overwrite rewrites only the touched
    partitions. Re-running with the same inputs is a no-op change
    (reference's delete+insert idempotency, utils.py:391-398, without the
    crash window between the two jobs).

    With ``granularity="month"`` the day range need not align to partition
    boundaries: rows of the touched months *outside* the range are read
    back and re-staged alongside the new rows (retain ∪ new), so the
    overwrite of those months is still exact. The retained rows are
    localCheckpoint'ed first — Spark refuses to overwrite a path it is
    concurrently reading from lineage."""
    start_d = F.lit(str(start)).cast("date")
    end_d = F.lit(str(end)).cast("date")
    day_in_range = F.to_date(F.col(filter_field)).between(start_d, end_d)
    staged = _with_partition(new_rows, filter_field, granularity).filter(day_in_range)
    if staged.isEmpty():
        # The reference skips the delete when extraction returns no rows
        # (extract-before-delete ordering, utils.py:379-398): absence of new
        # data must never destroy existing data.
        return
    # partitions the range *touches* in the existing table. Dynamic overwrite
    # only rewrites partitions present in the staged data — a touched
    # partition with no new (or retained) rows would keep stale in-range rows
    # (caught by tests/test_property_range_replace.py), so those are deleted
    # explicitly afterwards, mirroring the reference's DELETE of the full
    # range (utils.py:266-269).
    affected_existing: list = []
    try:
        existing = _with_partition(
            spark.read.parquet(path).drop(PARTITION_COL), filter_field, granularity
        )
        part_start = _partition_of(str(start), granularity)
        part_end = _partition_of(str(end), granularity)
        affected = existing.filter(
            F.col(PARTITION_COL).between(F.lit(part_start), F.lit(part_end))
        )
        affected_existing = [
            r[0] for r in affected.select(PARTITION_COL).distinct().collect()
        ]
        if granularity != "day":
            # sub-partition replacement: keep affected-partition rows that
            # fall outside the day range
            retained = affected.filter(~day_in_range).localCheckpoint()
            staged = staged.unionByName(retained)
    except AnalysisException:
        pass  # first load: nothing to retain or clear
    (
        staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )
    desired = {r[0] for r in staged.select(PARTITION_COL).distinct().collect()}
    stale = [p for p in affected_existing if p not in desired]
    if stale:
        _delete_partitions(spark, path, stale)


def refresh_recent(
    spark: SparkSession,
    path: str,
    source_df: DataFrame,
    filter_field: str,
    days: int = 7,
    today: dt.date | None = None,
    granularity: str = "day",
) -> tuple[dt.date, dt.date] | None:
    """O7 — recent-refresh window: re-replace the last ``days`` days from the
    source (reference utils.py:406-451, constant config.py:19). Skipped when
    days <= 0, like the reference (utils.py:410)."""
    if days <= 0:
        return None
    today = today or dt.date.today()
    start = today - dt.timedelta(days=days)
    fresh = source_df.filter(
        F.to_date(F.col(filter_field)).between(F.lit(str(start)), F.lit(str(today)))
    )
    replace_range(spark, path, fresh, filter_field, start, today, granularity)
    return (start, today)


def read_table(
    spark: SparkSession, path: str, like: DataFrame | None = None
) -> DataFrame:
    """Read a warehouse table written by this module or the streaming sink
    (drops the derived partition/epoch columns so round-trips are
    schema-stable). With ``like``, a missing/never-written table (the S6
    empty-guard skips the write entirely on empty input) reads back as an
    empty frame with ``like``'s schema instead of PATH_NOT_FOUND — so
    empty-source pipelines produce empty results, not crashes."""
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        if like is None:
            raise
        return spark.createDataFrame([], like.schema)
    for derived in (PARTITION_COL, "_epoch"):
        if derived in df.columns:
            df = df.drop(derived)
    return df


def delete_keys(spark: SparkSession, path: str, key: str, keys: DataFrame) -> None:
    """Keyed hard delete (the GDPR right-to-erasure path): drop every row
    whose ``key`` appears in ``keys`` from the table at ``path``.

    Anti-join rewrite on plain parquet: read, LEFT ANTI against the
    (deduplicated) key set, checkpoint, overwrite. Idempotent — re-running
    with the same key set is a no-op rewrite. Scale notes: the key set
    ships as a broadcast when small (the common case — an erasure batch);
    unlike the range delete, a keyed delete cannot prune by partition
    unless the table is partitioned by the key, so at 100 TB this is one
    full rewrite per erasure *batch* — which is why erasure requests are
    batched, exactly as the reference batches its range reloads."""
    keyset = keys.select(key).distinct()
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:
        return  # never-written table (S6 empty-guard): nothing to delete
    retained = existing.join(F.broadcast(keyset), key, "left_anti").localCheckpoint()
    retained.write.mode("overwrite").option("partitionOverwriteMode", "static").parquet(path)
