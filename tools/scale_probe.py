"""Wall-time scaling probe: run named queries at two (or more) fixture
dirs and print per-query times + adjacent-scale ratios.

Usage:
    python tools/scale_probe.py q_a,q_b /tmp/soak_sf1 /tmp/soak_sf3

Purpose (round-7 directive): the iterative graph family and span dedup are
the only operators whose cost is driven by pair/shingle volume rather than
row count — a superlinear blowup there would be invisible to the
fixed-scale bench. A ≤~(scale-ratio + epsilon) wall-time ratio across a
replicated-fixture decade-and-a-half confirms the linearity the plans
claim. Spark side only — the point is OUR engine's scaling, and the
oracle's recursive-CTE cost at 30× is a DuckDB property, not evidence.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.plans.queries import release_caches
    from poc_juma_etl_spark.session import get_spark

    names = sys.argv[1].split(",")
    dirs = sys.argv[2:]
    if not dirs:
        sys.exit("usage: scale_probe.py q_a,q_b DIR [DIR...]")
    specs = all_queries()
    if bad := [n for n in names if n not in specs]:
        sys.exit(f"unknown queries: {bad}")
    spark = get_spark("scale-probe")
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    for d in dirs:
        for n in names:
            t0 = time.perf_counter()
            rows = specs[n].fn(spark, d).count()
            dt = time.perf_counter() - t0
            times[n][d] = round(dt, 2)
            release_caches()
            print(f"{n} @ {d}: {dt:.1f}s ({rows} rows)", flush=True)
    report = {}
    for n in names:
        vals = [times[n][d] for d in dirs]
        ratios = [round(b / a, 2) if a > 0 else None for a, b in zip(vals, vals[1:])]
        report[n] = {"times_s": dict(zip(dirs, vals)), "ratios": ratios}
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
