"""Property-based check (hypothesis): replace_range agrees with a trivial
Python model of the reference's delete-range+insert semantics on arbitrary
inputs — random base tables, random update sets, random ranges, both
partition granularities."""

import datetime as dt
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from poc_juma_etl_spark.operators.range_replace import (
    overwrite_table,
    read_table,
    replace_range,
)

row_st = st.tuples(
    st.integers(min_value=0, max_value=99),  # id
    st.integers(min_value=1, max_value=28),  # day in Jan 2024
    st.integers(min_value=0, max_value=9),  # value (int-valued double)
)


def _model(base, new, lo, hi):
    """Reference semantics: rows with day in [lo, hi] are exactly the
    in-range new rows; everything else is the base."""
    in_range_new = [r for r in new if lo <= r[1] <= hi]
    if not in_range_new:
        return sorted(base)
    kept = [r for r in base if not (lo <= r[1] <= hi)]
    return sorted(kept + in_range_new)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(row_st, max_size=25, unique_by=lambda r: r[0]),
    new=st.lists(row_st, max_size=10, unique_by=lambda r: r[0] + 1000),
    lo=st.integers(min_value=1, max_value=28),
    span=st.integers(min_value=0, max_value=10),
    granularity=st.sampled_from(["day", "month"]),
)
def test_replace_range_matches_model(spark, base, new, lo, span, granularity):
    hi = min(lo + span, 28)
    to_rows = lambda rs: [  # noqa: E731
        (i + off, dt.datetime(2024, 1, d, 12), float(v))
        for off, rlist in ((0, rs),)
        for (i, d, v) in rlist
    ]
    base_rows = [(i, dt.datetime(2024, 1, d, 12), float(v)) for i, d, v in base]
    new_rows = [(i + 1000, dt.datetime(2024, 1, d, 12), float(v)) for i, d, v in new]
    del to_rows
    tmp = tempfile.mkdtemp(prefix="prop_rr_")
    p = f"{tmp}/t"
    try:
        base_df = spark.createDataFrame(base_rows, "id long, ts timestamp, v double")
        overwrite_table(base_df, p, "ts", granularity=granularity)
        new_df = spark.createDataFrame(new_rows, "id long, ts timestamp, v double")
        replace_range(
            spark, p, new_df, "ts", f"2024-01-{lo:02d}", f"2024-01-{hi:02d}", granularity
        )
        if not base_rows and not [r for r in new_rows if lo <= r[1].day <= hi]:
            return  # nothing was ever written — no table to read
        got = sorted(
            (r.id if r.id < 1000 else r.id, r.ts.day, int(r.v))
            for r in read_table(spark, p).collect()
        )
        want = _model(
            [(i, t.day, int(v)) for i, t, v in base_rows],
            [(i, t.day, int(v)) for i, t, v in new_rows],
            lo,
            hi,
        )
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
