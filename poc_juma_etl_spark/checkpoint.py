"""Lineage truncation for iterative plans, with a fault-tolerant mode.

Iterative operators (PageRank ``operators/graph.py``, connected components
``operators/components.py``, BFS hops ``plans/extra8.py``, k-core peeling
``plans/extra9.py``) must cut lineage every round — otherwise round N replays the
whole upstream build N times. Two cuts exist, selected here:

- **localCheckpoint (default)**: blocks pinned to executor storage. Fastest
  (no DFS write), but the blocks die with their executor — on a real
  cluster an executor loss mid-iteration kills the job. Fine on local[...]
  and for short chains.
- **reliable checkpoint** (``SPARK_GRAFT_RELIABLE_CHECKPOINT=1``): RDDs
  written to the SparkContext checkpoint directory. On a cluster, point
  ``SPARK_GRAFT_CHECKPOINT_DIR`` at HDFS/S3; lost executors then recover
  from the checkpoint files instead of recomputing or failing. Costs one
  DFS round-trip per cut — pay it when iterations are long-lived or
  executors are preemptible (spot instances).

Both modes produce the same LogicalRDD plan shape (lineage truncated to a
scan of materialized blocks), so downstream planning — including AQE's
treatment of the cut as a leaf — is identical; tests assert result parity
and equal plan truncation across modes.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

ENV_FLAG = "SPARK_GRAFT_RELIABLE_CHECKPOINT"
ENV_DIR = "SPARK_GRAFT_CHECKPOINT_DIR"


def reliable_mode() -> bool:
    """True when the fault-tolerant checkpoint mode is selected (env flag,
    read per call so tests can flip modes within one session)."""
    return os.environ.get(ENV_FLAG, "").strip() in {"1", "true", "yes"}


def _ensure_checkpoint_dir(spark) -> None:
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        # local default: a per-process scratch dir. On a cluster this env
        # must point at shared storage (HDFS/S3) — a driver-local path is
        # unreadable to executors there, which is why it's explicit config.
        configured = os.environ.get(ENV_DIR)
        path = configured or tempfile.mkdtemp(prefix="spark_graft_ckpt_")
        sc.setCheckpointDir(path)
        if not configured:
            # Checkpoint RDD files are never GC'd by Spark unless
            # spark.cleaner.referenceTracking.cleanCheckpoints was set at
            # context start; for the process-local scratch default, reclaim
            # the whole dir at interpreter exit so long sessions with many
            # iterative queries don't accumulate unbounded disk. A user-
            # configured ENV_DIR (shared storage) is left alone — recovery
            # across driver restarts is the point of configuring it.
            atexit.register(shutil.rmtree, path, ignore_errors=True)


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: ``localCheckpoint`` by default, reliable
    ``checkpoint`` under ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1``. Same
    truncation semantics either way — callers never branch on mode."""
    if reliable_mode():
        _ensure_checkpoint_dir(df.sparkSession)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
