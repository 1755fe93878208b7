"""Decade-scale (sf10) probes for the graph family — kcore and BFS carry
the repo's biggest iterative-join claims but (before round 10) only sf3
evidence; kmv/pca/audio set the sf10 protocol in round 9.

Protocol (BENCHNOTES round-9 rules): warm same-session timings — each
query runs twice and the SECOND time is reported; full DuckDB oracle
replay with value-hash comparison (not rows-only). Run on a QUIET host:
session-order noise dwarfs scale ratios.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/probe_graph_sf10.py \
           [sf10_dir] [sf1_dir] [names...]
       (defaults: /tmp/soak_sf10 /tmp/soak_sf1 q_graph_kcore q_graph_bfs_hops)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

SF10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_sf10"
SF1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_sf1"
NAMES = sys.argv[3:] or ["q_graph_kcore", "q_graph_bfs_hops"]


def main() -> int:
    import os

    from pyspark.sql import SparkSession

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.plans.queries import release_caches

    specs = all_queries()
    failures = 0
    for name in NAMES:
        spec = specs[name]
        # warm sf1 reference first (alternating-order rule), then sf10
        times: dict[str, float] = {}
        for sf_tag, sf_dir in (("sf1", SF1), ("sf10", SF10), ("sf1b", SF1), ("sf10b", SF10)):
            t0 = time.time()
            rows = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
            release_caches()
            times[sf_tag] = time.time() - t0
            if sf_tag == "sf10b":
                got = rows
        print(
            f"{name}: sf1 warm {times['sf1b']:.1f}s, sf10 warm {times['sf10b']:.1f}s, "
            f"ratio {times['sf10b'] / max(times['sf1b'], 1e-9):.2f}x at 10x data "
            f"(cold: {times['sf1']:.1f}/{times['sf10']:.1f})",
            flush=True,
        )
        con = duckdb.connect()
        # views for EVERY table present in the probe dir, so any registry
        # name works as argv (graph probes read lineitem/orders; scd2/text
        # probes read documents/customer/...)
        for p in sorted(Path(SF10).glob("*.parquet")):
            con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
        t0 = time.time()
        want = [tuple(r) for r in con.execute(spec.oracle).fetchall()]
        ok = got == want
        failures += 0 if ok else 1
        print(
            f"{name}: oracle replay {time.time() - t0:.1f}s — "
            f"{'HASH-GREEN' if ok else 'MISMATCH'} ({len(got)} rows)",
            flush=True,
        )
        con.close()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
