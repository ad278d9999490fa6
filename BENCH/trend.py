"""Per-query bench trend: diff the driver's BENCH_r{N}.json files so
"which queries regressed this round" is mechanical.

Usage: python BENCH/trend.py            # writes BENCH/TREND.md, prints it
Exit status 1 if any query regressed > REGRESSION_PCT vs the BEST prior
round (the regression gate; also run by tests/test_bench_trend.py).

Why best-prior, not previous-round (VERDICT r2): single rounds on a
shared VM carry contention noise — r02's own numbers were +17% across
the board with unchanged plans.  A REAL plan regression makes the
current round worse than EVERY prior round; comparing against the best
prior round keeps that signal while a noisy baseline round can no
longer raise (or mask) an alarm.  bench.py additionally reports
median-of-n per query since round 3, shrinking within-run noise.

The gate also requires an ABSOLUTE delta > ABS_FLOOR_S: a sub-second
query's +20% is a couple hundred milliseconds — below the shared VM's
per-run jitter even for a median-of-n (observed: td_dedup_simhash
0.95 s vs 1.25 s across back-to-back reps=5/reps=3 runs with an
identical plan).  A real plan regression on a query that small is
invisible in wall time anyway; the relative gate still guards every
query whose runtime can carry signal.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGRESSION_PCT = 20.0
ABS_FLOOR_S = 0.5


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
    header += " | Δ last (%) | Δ best-prior (%) |"
    sep = "|---" * (len(rounds) + 3) + "|"
    lines = [
        "# BENCH trend — per-query wall seconds by round",
        "",
        f"Regression gate: +{REGRESSION_PCT:.0f}% AND "
        f">{ABS_FLOOR_S:.1f}s absolute vs BEST prior round "
        "(noise-robust — see trend.py docstring); Δ last shown for "
        "context only.",
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
        delta = dbest = "—"
        if len(rounds) >= 2:
            cur = rounds[-1][1]["queries"].get(q)
            prev = rounds[-2][1]["queries"].get(q)
            priors = [
                p["queries"][q] for _, p in rounds[:-1] if p["queries"].get(q)
            ]
            if prev and cur:
                delta = f"{(cur - prev) / prev * 100.0:+.1f}"
            if priors and cur:
                best = min(priors)
                pct = (cur - best) / best * 100.0
                dbest = f"{pct:+.1f}"
                if pct > REGRESSION_PCT and (cur - best) > ABS_FLOOR_S:
                    regressed.append((q, pct))
        lines.append(
            f"| {q} | " + " | ".join(cells) + f" | {delta} | {dbest} |"
        )

    totals = " | ".join(f"{p.get('value', 0):.2f}" for _, p in rounds)
    lines.append(f"| **total** | {totals} | | |")
    thr = [
        p.get("extraction_throughput", {}).get("docs_per_sec") for _, p in rounds
    ]
    if any(thr):
        lines.append(
            "| extraction docs/sec | "
            + " | ".join("—" if t is None else f"{t}" for t in thr)
            + " | | |"
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
