"""Dump .explain('formatted') for named queries to plans/r13/<query>_<tag>.txt.

    python tools/dump_plan_r13.py before q_graph_pagerank q_ann_pq_topk ...

Run at sf0.1 (the bench SF) so AQE/size-dependent choices match the bench.
"""
from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.session import get_spark
    from poc_juma_etl_spark.plans.queries import release_caches

    specs = all_queries()
    spark = get_spark("plan-dump-r13")
    out_dir = REPO / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        release_caches()
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
