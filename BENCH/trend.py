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

Since round 4 the gate compares MIN-of-reps vs best-prior MIN-of-reps
(VERDICT r3 #6): a single VM-stall rep inflates a median of 3 (r03's
td_dedup_minhash reps were [5.79, 3.46, 5.66] — two stalled reps around
a clean 3.46), but cannot inflate the min; and a plan that genuinely
got slower raises even its best rep.  Medians stay in the table for
reporting.  Raw samples are parsed from each BENCH_r{N}.json's "tail"
(bench.py prints a `samples: {...}` line before the result JSON);
rounds without samples fall back to their median.

The gate also DEFLATES for whole-VM speed drift: the same code on the
same data measured 5× slower across a sandbox re-provision (round 4:
cp_tpch_q1 0.59 s → 2.8 s warm with an identical plan, every query
shifted together).  A real plan regression is one query moving against
the fleet, so when the MEDIAN per-query ratio vs best-prior exceeds
DEFLATE_TRIGGER the per-query ratios are divided by that median before
the threshold test (and the absolute floor scales with it).  A global
shift flags nothing; a single query regressing 20% beyond the global
shift still flags.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGRESSION_PCT = 20.0
ABS_FLOOR_S = 0.5
# median per-query ratio above which the round is treated as a
# whole-VM speed shift and per-query ratios are deflated by it
DEFLATE_TRIGGER = 1.15


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
            parsed = dict(parsed)
            parsed["mins"] = _per_query_mins(data, parsed)
            rounds.append((int(m.group(1)), parsed))
    return sorted(rounds)


def _per_query_mins(data: dict, parsed: dict) -> dict:
    """Best (min) rep per query: bench.py's explicit `queries_min`
    field when present (round ≥ 4), else parsed from the
    `samples: {...}` line in the driver's captured tail; a round
    without either contributes its median as the min (conservative —
    an old median can only make the prior bar HARDER to regress
    against)."""
    mins = dict(parsed["queries"])
    if isinstance(parsed.get("queries_min"), dict):
        mins.update(parsed["queries_min"])
        return mins
    m = re.search(r"samples: (\{.*\})", data.get("tail", ""))
    if m:
        try:
            samples = json.loads(m.group(1))
            for q, reps in samples.items():
                if isinstance(reps, list) and reps:
                    mins[q] = min(reps)
        except (ValueError, TypeError):
            pass
    return mins


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

    # whole-VM drift deflator: median per-query ratio of current min
    # vs best-prior min across the fleet.  > DEFLATE_TRIGGER means the
    # machine itself got slower (or faster, symmetric) — divide every
    # per-query ratio by it so only AGAINST-the-fleet movement flags.
    deflate = 1.0
    if len(rounds) >= 2:
        ratios = []
        for q in names:
            cur = rounds[-1][1]["mins"].get(q)
            priors = [
                p["mins"][q] for _, p in rounds[:-1] if p["mins"].get(q)
            ]
            if cur and priors:
                ratios.append(cur / min(priors))
        if ratios:
            # exclude the single worst outlier so one genuine regression
            # on a small fleet can't drag the median into triggering
            # deflation (which would then hide that same regression)
            basis = sorted(ratios)[:-1] if len(ratios) >= 4 else ratios
            med = statistics.median(basis)
            # symmetric: a fleet-wide SPEEDUP also deflates, so a query
            # that merely failed to speed up with the fleet still flags
            if med > DEFLATE_TRIGGER or med < 1.0 / DEFLATE_TRIGGER:
                deflate = med

    header = "| query | " + " | ".join(f"r{n:02d} (s)" for n, _ in rounds)
    header += " | Δ last (%) | Δ best-prior min (%) |"
    sep = "|---" * (len(rounds) + 3) + "|"
    lines = [
        "# BENCH trend — per-query wall seconds by round (medians)",
        "",
        f"Regression gate: current MIN-of-reps +{REGRESSION_PCT:.0f}% AND "
        f">{ABS_FLOOR_S:.1f}s absolute vs BEST prior round's min-of-reps "
        "(noise-robust: a single VM-stall rep cannot flip the gate either "
        "way — see trend.py docstring); Δ last shown for context only."
        + (
            f"  Whole-VM drift deflator applied this round: ×{deflate:.2f} "
            "(fleet-median slowdown; only against-the-fleet movement flags)."
            if deflate != 1.0
            else ""
        ),
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
            cur_med = rounds[-1][1]["queries"].get(q)
            prev = rounds[-2][1]["queries"].get(q)
            cur = rounds[-1][1]["mins"].get(q)
            priors = [
                p["mins"][q] for _, p in rounds[:-1] if p["mins"].get(q)
            ]
            if prev and cur_med:
                delta = f"{(cur_med - prev) / prev * 100.0:+.1f}"
            if priors and cur:
                best = min(priors)
                adj = cur / deflate
                pct = (adj - best) / best * 100.0
                dbest = f"{pct:+.1f}"
                # a flag needs BOTH the against-the-fleet movement
                # (deflated) AND a genuine raw slowdown: under a
                # fleet-wide speedup (deflate < 1) a query that merely
                # improved less than the fleet median is not a
                # regression, while a raw slowdown hiding inside the
                # fleet speedup still trips the adjusted gate
                if (
                    pct > REGRESSION_PCT
                    and (adj - best) > ABS_FLOOR_S
                    and cur > best
                ):
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
