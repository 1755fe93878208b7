"""MERGE INTO emulation: keyed upsert and SCD2 history tracking on plain
parquet.

Spark without a table format (Delta/Iceberg/Hudi, none in this image) has no
MERGE INTO; the standard emulation (pyspark_guide.md "CDC / SCD2") is
anti-join + union + overwrite:

- upsert:  target rows whose key appears in the updates are dropped
           (anti-join), updates appended, result overwritten atomically.
- SCD2:    instead of dropping, superseded rows are *closed*
           (valid_to = change date) and updates open new current rows —
           full history, point-in-time queries via valid_from/valid_to.

Scale note: both rewrite only what they touch when the table is partitioned
and updates are partition-aligned; with a table format underneath the same
call sites become real MERGE INTO — the operator surface is what's stable.
The reference's closest behavior is the delete-range+insert idempotent load
(utils.py:255-283), which is a *range* merge; this module adds the *keyed*
merge family.
"""

from __future__ import annotations

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedupe_updates(updates: DataFrame, key: str) -> DataFrame:
    """Resolve duplicate keys in an update batch deterministically: per key,
    the row that sorts highest over all non-key columns (descending,
    nulls last) wins. One shuffle on the key — same cost class as the
    anti-join that follows, so free at scale."""
    order_cols = [
        F.col(c).desc_nulls_last() for c in updates.columns if c != key
    ] or [F.col(key)]
    w = Window.partitionBy(key).orderBy(*order_cols)
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> None:
    """Keyed upsert: last-write-wins per key. Updates may contain keys not
    in the target (inserts) and duplicate keys (resolved per
    :func:`dedupe_updates` before the merge, so the target never gains
    duplicate key rows).

    Only a *missing target* (first load) falls back to writing the updates
    alone; any other read failure (corrupt footer, permissions) propagates —
    silently overwriting the table with just the update batch would be data
    loss."""
    updates = dedupe_updates(updates, key)
    try:
        target = spark.read.parquet(path)
    except AnalysisException:
        merged = updates  # first load: no target yet
    else:
        retained = target.join(updates.select(key).distinct(), key, "left_anti")
        merged = retained.unionByName(updates).localCheckpoint()
    merged.write.mode("overwrite").option("partitionOverwriteMode", "static").parquet(path)


SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(df: DataFrame, as_of: str) -> DataFrame:
    """Open an initial SCD2 state: every row current from ``as_of``."""
    return df.select(
        "*",
        F.lit(as_of).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    spark: SparkSession, path: str, changes: DataFrame, key: str, as_of: str
) -> None:
    """Apply a change batch to an SCD2 table at ``path``:

    - keys present in ``changes``: current row closed (valid_to = as_of,
      is_current = false), new current row opened (valid_from = as_of);
    - unchanged keys: untouched;
    - brand-new keys: inserted as current.
    """
    target = spark.read.parquet(path)
    changed_keys = changes.select(key).distinct()
    untouched = target.join(changed_keys, key, "left_anti")
    closed = (
        target.join(changed_keys, key, "left_semi")
        .filter(F.col("is_current"))
        .withColumn("valid_to", F.lit(as_of).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    history = target.join(changed_keys, key, "left_semi").filter(~F.col("is_current"))
    opened = scd2_init(changes, as_of)
    merged = (
        untouched.unionByName(closed).unionByName(history).unionByName(opened)
    ).localCheckpoint()
    merged.write.mode("overwrite").option("partitionOverwriteMode", "static").parquet(path)


def merge_latest(
    spark: SparkSession, path: str, updates: DataFrame, key: str, order_cols: list[str]
) -> None:
    """CDC compaction merge: keep, per key, the row that sorts highest on
    ``order_cols`` (descending) across the existing target AND the update
    batch — the upsert rule of a change-data stream where the newest
    version wins. Commutative over batch order: any interleaving of update
    batches converges to the same table, which is what makes it safe under
    out-of-order micro-batch delivery. One shuffle on the key; with a
    key-partitioned target only touched partitions rewrite."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc_nulls_last() for c in order_cols])
    try:
        target = spark.read.parquet(path)
    except AnalysisException:
        source = updates  # first load: no target yet
    else:
        source = target.unionByName(updates)
    merged = (
        source.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint()
    )
    merged.write.mode("overwrite").option("partitionOverwriteMode", "static").parquet(path)
