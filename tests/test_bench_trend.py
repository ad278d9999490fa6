"""BENCH/trend.py is part of the gate (VERDICT r2): the checked-in
BENCH_r*.json history must show no per-query regression > threshold vs
the best prior round, and TREND.md must be regenerated from the same
data it gates on (no stale trend tables)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_trend_gate_green():
    proc = subprocess.run(
        [sys.executable, str(REPO / "BENCH" / "trend.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, f"bench trend regressions:\n{proc.stdout}"


def test_trend_md_matches_bench_files():
    """TREND.md must mention every round that has a BENCH_r*.json —
    a regenerated table, not a stale one."""
    trend = (REPO / "BENCH" / "TREND.md").read_text()
    rounds = sorted(REPO.glob("BENCH_r*.json"))
    assert rounds, "no bench files"
    for path in rounds:
        n = int(path.stem.split("r")[-1])
        data = json.load(open(path))
        if "queries" in data.get("parsed", data):
            assert f"r{n:02d} (s)" in trend, f"TREND.md missing round {n}"
