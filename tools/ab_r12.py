"""Interleaved A/B harness for the round-12 optimization candidates.

The NEW arm is the working tree's registered implementation; the OLD arm
is reconstructed bit-exactly by exec'ing the owning module's source at a
pinned git base ref (default: the round-opening commit) inside a copy of
the module's namespace — no hand-transcription, no package shadowing.
The registry is snapshotted around the exec so re-run ``@register``
decorators cannot clobber the live entries.

Protocol (the standing BENCHNOTES rule): one session, q1 anchor between
samples, alternating arms, min-of-N, values verified IDENTICAL before
any timing.

Usage: python tools/ab_r12.py <query_name> <module_relpath> [sf_dir] [rounds]
  e.g. python tools/ab_r12.py q_graph_pagerank poc_juma_etl_spark/operators/graph.py
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

BASE_REF = os.environ.get("AB_BASE_REF", "8d57dbc")


def load_old_fn(module_relpath: str, func_name: str):
    """exec the module source at BASE_REF in a copy of the LIVE module's
    namespace (so helpers/constants resolve), returning the old function.
    Registry entries touched by re-run @register decorators are restored."""
    from poc_juma_etl_spark.plans.queries import QUERIES

    src = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{BASE_REF}:{module_relpath}"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    mod_name = (
        module_relpath.replace("/", ".").removesuffix(".py")
    )
    live = importlib.import_module(mod_name)
    ns = dict(vars(live))
    saved = dict(QUERIES)
    try:
        exec(compile(src, f"{BASE_REF}:{module_relpath}", "exec"), ns)
    finally:
        QUERIES.clear()
        QUERIES.update(saved)
    return ns[func_name]


def main() -> int:
    qname = sys.argv[1]
    module_relpath = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.plans.queries import release_caches
    from poc_juma_etl_spark.session import get_spark

    new_fn = all_queries()[qname].fn
    old_fn = load_old_fn(module_relpath, qname)
    spark = get_spark(f"ab-r12-{qname}")

    def norm(rows):
        return sorted(tuple(r) for r in rows)

    spark.sparkContext.setJobDescription(f"{qname}: old (values)")
    old_rows = norm(old_fn(spark, sf_dir).collect())
    release_caches()
    spark.sparkContext.setJobDescription(f"{qname}: new (values)")
    new_rows = norm(new_fn(spark, sf_dir).collect())
    release_caches()
    if old_rows != new_rows:
        print("VALUES DIFFER — A/B aborted")
        print(f" old n={len(old_rows)} new n={len(new_rows)}")
        for a, b in zip(old_rows[:5], new_rows[:5]):
            print(" old:", a)
            print(" new:", b)
        return 1
    print(f"values identical ({len(old_rows)} rows)", flush=True)

    def anchor():
        from poc_juma_etl_spark.plans.queries import q1_pricing_summary

        t0 = time.time()
        q1_pricing_summary(spark, sf_dir).count()
        print(f"  q1 anchor {time.time() - t0:.2f}s", flush=True)

    times: dict[str, list[float]] = {"new": [], "old": []}
    for arm, fn in (("new", new_fn), ("old", old_fn)) * rounds:
        anchor()
        release_caches()
        spark.sparkContext.setJobDescription(f"{qname}: {arm}")
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        release_caches()
        times[arm].append(dt)
        print(f"{arm}: {dt:.2f}s", flush=True)
    bn, bo = min(times["new"]), min(times["old"])
    print(
        f"RESULT {qname}: best new {bn:.2f}s vs best old {bo:.2f}s "
        f"-> {bo / bn:.2f}x ({'WIN' if bn < bo else 'LOSS'})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
