"""Empty-input sweep: run every registered query against a ZERO-ROW fixture.

Empty tables are the canonical ops edge case — a new deployment, a
filtered-to-nothing date range, a source outage — and the r5/r6 ADVICE
findings (empty-sink read-back, observed-metrics TypeError) were exactly
this class. Contract: every query must return its natural empty (or
constant-shaped) result, never raise. The round-6 sweep flushed out 15
crashers: centroid literals built from an empty seed collect
(array_min(array()) is an AnalysisException — fixed by qv_seeds'
zero-seed stand-in, operators/kmeans.py), fixed-K codebook loops
(operators/pq.py), warehouse read-backs after the S6 empty-guard skipped
the write (read_table(..., like=) in operators/range_replace.py), and
single-file parquet assumptions (sources/rest_api.py schema,
streaming/join.py sentinel staging).

Usage:
    python tools/empty_sweep.py              # all queries
    python tools/empty_sweep.py q_a,q_b      # subset

tests/test_empty_inputs.py pins the previously-crashing families; this
sweep is the full-registry version (~6 min), run per-round like the sf1
soak.
"""
import shutil
import sys
import tempfile

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.catalog import SCHEMAS, table_path
    from poc_juma_etl_spark.plans.queries import release_caches
    from poc_juma_etl_spark.session import get_spark

    spark = get_spark("empty-sweep")
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for name, schema in SCHEMAS.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            table_path(d, name)
        )
    print("fixture:", d, flush=True)

    fails = []
    names = list(all_queries().items())
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for i, (name, spec) in enumerate(names):
        if only and name not in only:
            continue
        try:
            n = spec.fn(spark, d).count()
            print(f"ok   [{i + 1}/{len(names)}] {name}: {n} rows", flush=True)
        except Exception as exc:
            fails.append(name)
            print(
                f"RAISE [{i + 1}/{len(names)}] {name}: "
                f"{type(exc).__name__}: {str(exc)[:200]}",
                flush=True,
            )
        release_caches()
    print("FAILS:", fails, flush=True)
    # the fixture's job ends with the sweep — don't accumulate one per run
    # in /tmp (the r5/r6 ADVICE hygiene class)
    shutil.rmtree(d, ignore_errors=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
