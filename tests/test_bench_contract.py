"""The driver's bench contract: bench.py must print ONE JSON line with
the agreed keys — run end-to-end as a subprocess at the smallest sf
(probe off, 1 trial) exactly as the driver launches it."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line_with_contract_keys(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        BTD_BENCH_TRIALS="1",
        BTD_BENCH_SCALE_PROBE="0",
        BTD_BENCH_EXTRACT_REPLICAS="2",
        # keep the test's record out of BENCH/ — committed per-config
        # records must only change when a real bench run is recorded
        BTD_BENCH_RECORD_DIR=str(tmp_path),
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got {len(lines)}"
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, f"missing contract key {key}"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries())
    # the stdout line keeps only the slowest queries under a 1900-char
    # budget (the driver captures just the stdout tail); the COMPLETE
    # per-query record lives in the immutable full_record file
    assert len(lines[0]) <= 1900
    assert set(d["queries"]) <= registry
    assert d["n_queries"] == len(registry)
    assert d["queries_omitted"] == len(registry) - len(d["queries"])
    assert all(v >= 0 for v in d["queries"].values())
    rec = d["full_record"]
    full = json.load(
        open(rec if os.path.isabs(rec) else os.path.join(REPO, rec))
    )
    assert set(full["queries"]) == registry
    assert all(v >= 0 for v in full["queries"].values())
