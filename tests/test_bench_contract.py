"""bench.py contract: the driver runs it per-round and parses exactly one
JSON line — a crash or malformed output forfeits the round's BENCH
artifact, so the harness itself gets a smoke test (one cheap query at the
smallest fixture; the measured values are irrelevant here)."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    committed = os.path.join(repo, "bench_full.json")
    before = open(committed, "rb").read() if os.path.exists(committed) else None
    full_out = tmp_path / "bench_full.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_FULL_OUT=str(full_out),
    )
    out = subprocess.run(
        [sys.executable, "bench.py", "q1_pricing_summary"],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # side-effect contract: the run writes its full map ONLY to the
    # run-scoped path; the committed repo-root artifact is untouched
    # (round-6 postmortem: the smoke run silently clobbered the committed
    # 89-query map with this 1-query artifact)
    assert full_out.exists()
    full = json.loads(full_out.read_text())
    assert set(full["queries"]) == {"q1_pricing_summary"}
    after = open(committed, "rb").read() if os.path.exists(committed) else None
    assert before == after, "bench run modified the committed bench_full.json"
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
