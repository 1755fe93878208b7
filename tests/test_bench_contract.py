"""bench.py contract: the driver runs it per-round and parses exactly one
JSON line — a crash or malformed output forfeits the round's BENCH
artifact, so the harness itself gets a smoke test (one cheap query at the
smallest fixture; the measured values are irrelevant here)."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py", "q1_pricing_summary"],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_queries_total"
    assert payload["unit"] == "sec"
    assert set(payload["queries"]) == {"q1_pricing_summary"}
    assert payload["value"] > 0
    assert float(payload["sf"]) == 0.001


def test_bench_rejects_unknown_query():
    out = subprocess.run(
        [sys.executable, "bench.py", "q_no_such_query"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode != 0
    assert "unknown queries" in (out.stderr + out.stdout)
