"""Per-query bench regression diff: compare two bench outputs query by query.

The headline total hides per-query regressions as the set grows, so the
verdict loop diffs rounds at query granularity. Accepts either raw bench.py
JSON lines or the driver's BENCH_r{N}.json wrapper (which buries the JSON
line in a "tail" field).

    python tools/bench_diff.py BENCH_r02.json bench_now.json [threshold]

Prints one line per query present in both files whose ratio new/old exceeds
the threshold (default 1.25) or improved by the inverse, then totals over
the common subset. Exit code 0 always — informational, the judge decides.
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        obj = json.loads(text)
    except ValueError:
        obj = None
    if isinstance(obj, dict) and "queries" in obj:
        return obj["queries"]
    # driver wrapper: the bench JSON line is embedded in the "tail" string
    if isinstance(obj, dict) and "tail" in obj:
        tail = obj["tail"]
        line = tail[tail.rindex('{"metric') :].splitlines()[0]
        return json.loads(line)["queries"]
    # raw bench stdout: last line holding a metric JSON object
    for line in reversed(text.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)["queries"]
    raise SystemExit(f"no bench queries found in {path}")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    common = sorted(set(old) & set(new))
    flagged = 0
    for name in common:
        o, n = old[name], new[name]
        ratio = n / o if o else float("inf")
        if ratio >= threshold or ratio <= 1 / threshold:
            tag = "SLOWER" if ratio > 1 else "faster"
            print(f"{tag} {name}: {o:.3f}s -> {n:.3f}s ({ratio:.2f}x)")
            flagged += ratio >= threshold
    to, tn = sum(old[n] for n in common), sum(new[n] for n in common)
    print(
        f"common subset: {len(common)} queries, {to:.2f}s -> {tn:.2f}s "
        f"({tn / to:.2f}x); {flagged} regression(s) over {threshold}x; "
        f"only-old: {sorted(set(old) - set(new))or '[]'} "
        f"only-new: {sorted(set(new) - set(old)) or '[]'}"
    )


if __name__ == "__main__":
    main()
