"""Per-query bench trend: diff the driver's BENCH_r{N}.json files so
"which queries regressed this round" is mechanical.

Usage: python BENCH/trend.py            # writes BENCH/TREND.md, prints it
Exit status 1 if any query regressed > REGRESSION_PCT vs the previous
round (useful as a pre-commit tripwire).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGRESSION_PCT = 20.0


def load_rounds() -> list[tuple[int, dict]]:
    rounds = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        parsed = data.get("parsed", data)
        if "queries" in parsed:
            rounds.append((int(m.group(1)), parsed))
    return sorted(rounds)


def main() -> int:
    rounds = load_rounds()
    if not rounds:
        print("no BENCH_r*.json files found", file=sys.stderr)
        return 0
    names: list[str] = []
    for _, p in rounds:
        for q in p["queries"]:
            if q not in names:
                names.append(q)

    header = "| query | " + " | ".join(f"r{n:02d} (s)" for n, _ in rounds)
    header += " | Δ last (%) |"
    sep = "|---" * (len(rounds) + 2) + "|"
    lines = [
        "# BENCH trend — per-query wall seconds by round",
        "",
        f"Regression threshold: +{REGRESSION_PCT:.0f}% vs previous round.",
        "",
        header,
        sep,
    ]
    regressed = []
    for q in names:
        cells = []
        for _, p in rounds:
            v = p["queries"].get(q)
            cells.append("—" if v is None else f"{v:.3f}")
        delta = "—"
        if len(rounds) >= 2:
            prev = rounds[-2][1]["queries"].get(q)
            cur = rounds[-1][1]["queries"].get(q)
            if prev and cur:
                pct = (cur - prev) / prev * 100.0
                delta = f"{pct:+.1f}"
                if pct > REGRESSION_PCT:
                    regressed.append((q, pct))
        lines.append(f"| {q} | " + " | ".join(cells) + f" | {delta} |")

    totals = " | ".join(f"{p.get('value', 0):.2f}" for _, p in rounds)
    lines.append(f"| **total** | {totals} | |")
    thr = [
        p.get("extraction_throughput", {}).get("docs_per_sec") for _, p in rounds
    ]
    if any(thr):
        lines.append(
            "| extraction docs/sec | "
            + " | ".join("—" if t is None else f"{t}" for t in thr)
            + " | |"
        )
    if regressed:
        lines += ["", "## REGRESSIONS"] + [
            f"- **{q}**: {pct:+.1f}%" for q, pct in regressed
        ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "TREND.md"), "w") as f:
        f.write(out)
    print(out)
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
