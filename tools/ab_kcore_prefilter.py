"""Interleaved A/B: degree-upper-bound prefilter for q_graph_kcore's pair
generation (r11 verdict #7 — one measured attempt).

Hypothesis: a part whose co-occurrence UPPER BOUND (sum over its baskets of
basket_size-1) is < K can never reach degree K, so a pair whose endpoints
are BOTH such parts can be dropped BEFORE the distinct — at sf1 66% of
parts are sub-bound, so ~40% of raw pair volume never enters the distinct
shuffle. Trajectory safety: high-node round-1 degrees still count low
neighbors (only both-low pairs drop), and the round-1 node universe is
computed independently of the edge list (a low node with only low
neighbors must still be counted alive then removed in round 1).

Protocol: ONE session, q1 anchor between arms, alternating order
new/old/new/old, warm = best of the two runs per arm; value-equality
checked first. Run on a QUIET host.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/ab_kcore_prefilter.py [sf_dir]
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
    from poc_juma_etl_spark.plans.extra9 import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_peel,
        q_graph_kcore,
    )
    from poc_juma_etl_spark.checkpoint import truncate_lineage
    from poc_juma_etl_spark.plans.queries import release_caches
    from poc_juma_etl_spark.session import get_spark

    spark = get_spark("ab-kcore", master="local[32]", shuffle_partitions=32)

    def new_kcore(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        baskets = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("parts")
        )
        # upper bound on co-occurrence degree: sum of (basket_size - 1)
        ub = (
            baskets.select(F.explode("parts").alias("p"), F.size("parts").alias("sz"))
            .groupBy("p")
            .agg(F.sum(F.col("sz") - 1).alias("ub"))
        )
        low = F.broadcast(ub.filter(F.col("ub") < KCORE_K).select("p"))
        # node universe (computed BEFORE the pair filter): every part with
        # at least one neighbor
        n_nodes = (
            baskets.filter(F.size("parts") >= 2)
            .select(F.explode("parts").alias("p"))
            .distinct()
            .count()
        )
        # variant B (variant A — rebuilding baskets as tagged struct arrays
        # via an extra explode+join+re-agg — measured 0.83x, the rebuild
        # shuffle ate the savings): filter the RAW pair stream with two
        # broadcast probes before the distinct — no extra shuffle anywhere,
        # the only change is ~40% fewer rows entering the distinct exchange
        raw = (
            baskets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(parts, (x, i) -> "
                        "transform(slice(parts, i + 2, size(parts)), "
                        "y -> struct(x AS u, y AS v))))"
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
        )
        pairs = (
            raw.join(
                low.select(F.col("p").alias("u")).withColumn("lu", F.lit(True)),
                "u",
                "left",
            )
            .join(
                low.select(F.col("p").alias("v")).withColumn("lv", F.lit(True)),
                "v",
                "left",
            )
            .filter(~(F.coalesce("lu", F.lit(False)) & F.coalesce("lv", F.lit(False))))
            .select("u", "v")
            .distinct()
        )
        sym = truncate_lineage(
            pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        )
        return kcore_peel(spark, sym, KCORE_K, KCORE_ROUNDS, n_nodes=n_nodes)

    # --- value equality first ---
    old_rows = sorted(map(tuple, q_graph_kcore(spark, SF).collect()))
    release_caches()
    new_rows = sorted(map(tuple, new_kcore(spark, SF).collect()))
    release_caches()
    if old_rows != new_rows:
        print("VALUES DIFFER — A/B aborted")
        print(" old:", old_rows)
        print(" new:", new_rows)
        return 1
    print(f"values identical ({len(old_rows)} rounds)", flush=True)

    def anchor():
        from poc_juma_etl_spark.plans.queries import q1_pricing_summary

        t0 = time.time()
        q1_pricing_summary(spark, SF).collect()
        print(f"  q1 anchor {time.time() - t0:.2f}s", flush=True)

    times: dict[str, list[float]] = {"new": [], "old": []}
    for arm, fn in (("new", new_kcore), ("old", q_graph_kcore)) * 2:
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
