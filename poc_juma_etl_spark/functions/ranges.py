"""Date-range batching helpers (reference parity: O4, O5, O6).

The reference splits the historical window into month/day/N-day ``(start,
end)`` tuples to bound API payloads and driver memory (reference
config.py:152-208). In Spark the scan itself is partitioned, so batching is
unnecessary for file sources — these helpers exist for connector politeness
(paginated APIs) and for the registry's incremental-load dispatch (O8).

Kept driver-side pure-Python: the tuples are orchestration metadata, not
data. The distributed equivalent (``sequence(...) + explode``) is exposed as
``date_spine`` for in-plan use.
"""

from __future__ import annotations

import calendar
import datetime as dt

from pyspark.sql import DataFrame, SparkSession

Range = tuple[dt.date, dt.date]


def monthly_ranges(start: dt.date, end: dt.date) -> list[Range]:
    """O4 — calendar-month batches covering [start, end]."""
    out: list[Range] = []
    cur = start
    while cur <= end:
        last = dt.date(cur.year, cur.month, calendar.monthrange(cur.year, cur.month)[1])
        out.append((cur, min(last, end)))
        cur = last + dt.timedelta(days=1)
    return out


def daily_ranges(start: dt.date, end: dt.date) -> list[Range]:
    """O5 — one batch per day."""
    return [
        (start + dt.timedelta(days=i), start + dt.timedelta(days=i))
        for i in range((end - start).days + 1)
    ]


def custom_day_ranges(start: dt.date, end: dt.date, days_in_batch: int) -> list[Range]:
    """O6 — fixed-width N-day batches."""
    if days_in_batch < 1:
        raise ValueError("days_in_batch must be >= 1")
    out: list[Range] = []
    cur = start
    while cur <= end:
        batch_end = min(cur + dt.timedelta(days=days_in_batch - 1), end)
        out.append((cur, batch_end))
        cur = batch_end + dt.timedelta(days=1)
    return out


def date_spine(spark: SparkSession, start: dt.date, end: dt.date, step: str = "1 day") -> DataFrame:
    """Distributed date spine: the in-plan equivalent of the range helpers
    (``sequence + explode``), for joins against calendars at scale."""
    return spark.sql(
        f"SELECT explode(sequence(DATE '{start}', DATE '{end}', INTERVAL {step})) AS d"
    )
