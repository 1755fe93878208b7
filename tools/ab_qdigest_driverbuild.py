"""Interleaved A/B: driver-side q-digest build over the collected leaf
histogram vs the 20-pass level-synchronous Spark loop (round 12).

The level loop is 20 scheduled jobs + 20 localCheckpoints over a node
table that is DOMAIN-bounded (<= 2^B = 1M rows, ~16 MB) — fixed
scheduler overhead at every SF (the query is nearly sf-invariant: 5.0s
at sf0.1, 7.6s at sf1). The candidate collects the histogram once and
runs the pure-Python build (qdigest_build — already unit-pinned equal to
the Spark loop AND the DuckDB unrolled-CTE chain), the bounded-collect
posture the module's own quantile step already uses. Values must be
IDENTICAL; protocol: one session, q1 anchor, alternating arms, best-of-2.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/ab_qdigest_driverbuild.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_sf1"


def main() -> int:
    from pyspark.sql import functions as F

    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.operators.qdigest import (
        B,
        K,
        OUT_COLS,
        VALUE_EXPR,
        q_sketch_quantile_digest,
        qdigest_build,
        qdigest_quantiles,
    )
    from poc_juma_etl_spark.plans.queries import release_caches
    from poc_juma_etl_spark.session import get_spark

    spark = get_spark("ab-qdigest", master="local[32]", shuffle_partitions=32)

    def new_q(spark, sf_dir):
        o = load_table(spark, sf_dir, "orders").selectExpr(f"{VALUE_EXPR} AS v")
        leaves = o.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
        rows = leaves.collect()  # domain-bounded: <= 2^B distinct values
        null_mass = sum(int(r.cnt) for r in rows if r.v is None)
        if null_mass:
            raise ValueError(
                f"q-digest domain violation: {null_mass} rows carry a NULL"
            )
        hist = [(int(r.v), int(r.cnt)) for r in rows if r.v is not None]
        n = sum(c for _, c in hist)
        if hist:
            lo, hi = min(v for v, _ in hist), max(v for v, _ in hist)
            if lo < 0 or hi >= (1 << B):
                raise ValueError(
                    f"q-digest domain violation: [{lo}, {hi}] outside [0, {1 << B})"
                )
        digest = qdigest_build(hist, n)
        rows_out = [
            (p, est, n, len(digest), n // K)
            for p, est in qdigest_quantiles(digest, n)
        ]
        return spark.createDataFrame(rows_out, OUT_COLS).orderBy("pct")

    old_rows = sorted(map(tuple, q_sketch_quantile_digest(spark, SF).collect()))
    release_caches()
    new_rows = sorted(map(tuple, new_q(spark, SF).collect()))
    release_caches()
    if old_rows != new_rows:
        print("VALUES DIFFER — A/B aborted")
        print(" old:", old_rows)
        print(" new:", new_rows)
        return 1
    print(f"values identical ({len(old_rows)} rows)", flush=True)

    def anchor():
        from poc_juma_etl_spark.plans.queries import q1_pricing_summary

        t0 = time.time()
        q1_pricing_summary(spark, SF).collect()
        print(f"  q1 anchor {time.time() - t0:.2f}s", flush=True)

    times: dict[str, list[float]] = {"new": [], "old": []}
    for arm, fn in (("new", new_q), ("old", q_sketch_quantile_digest)) * 2:
        anchor()
        release_caches()
        t0 = time.time()
        fn(spark, SF).collect()
        dt = time.time() - t0
        times[arm].append(dt)
        print(f"{arm}: {dt:.2f}s", flush=True)
    bn, bo = min(times["new"]), min(times["old"])
    print(f"best new {bn:.2f}s vs best old {bo:.2f}s -> ratio {bo / bn:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
