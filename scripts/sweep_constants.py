"""Sweep the solver's control-lattice constants across the test battery.

VERDICT r4 #5: the refined-endgame / Anderson-safeguard / forced-rho /
escalation constants were each tuned on 1-3 measured repros; this harness
shows the operating point is flat (or finds the brittle ones) by running
the outcome-asserting test families — fuzz, infeasibility, refinement,
chordal, problem suites — over a one-at-a-time grid around every constant.

Each grid point is one pytest subprocess (the constants are trace-time:
tests/conftest.py applies COSMO_SWEEP before any solve compiles; a fresh
process also sidesteps XLA:CPU's compile-count abort). A point PASSES when
the battery passes — the tests assert solution quality and statuses, which
is the robustness criterion (iteration counts are chaotic by design).

Usage:
    python scripts/sweep_constants.py [--jobs 2] [--out sweep_results.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# battery: the outcome-asserting families the lattice can affect.
BATTERY = [
    "tests/test_fuzz.py",
    "tests/test_infeasibility.py",
    "tests/test_refinement.py",
    "tests/test_problem_suites.py",
    "tests/test_chordal.py",
]

# one-at-a-time grid around the operating point (center listed first and
# skipped — the plain test suite already runs it every round).
GRID = {
    "REFINE_NEAR_SWITCH": (50.0, 20.0, 200.0),
    "REFINE_STALL_CHECKS": (4, 3, 6),
    "REFINE_STALL_LAST_RESORT": (16, 12, 24),
    "AA_STRIKE_FACTOR": (100.0, 30.0, 300.0),
    "AA_STRIKE_KILL": (2, 3),
    "AA_REARM_FACTOR": (10.0, 3.0, 30.0),
    "FORCED_RHO_BUDGET": (2, 1, 4),
    "ESCALATE_STAG_CHECKS": (2, 3),
}


def run_point(name: str, value) -> dict:
    env = dict(os.environ)
    env["COSMO_SWEEP"] = f"{name}={value}"
    # serial inside the point (the driver parallelizes across points);
    # -p no:cacheprovider keeps concurrent pytest processes from racing
    # on .pytest_cache
    cmd = [sys.executable, "-m", "pytest", "-q", "-x", "-n", "0",
           "-p", "no:cacheprovider", *BATTERY]
    t0 = time.time()
    p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=7200)
    dt = time.time() - t0
    tail = (p.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    rec = dict(constant=name, value=value, ok=(p.returncode == 0),
               seconds=round(dt, 1), summary=summary)
    if p.returncode != 0:
        rec["fail_tail"] = "\n".join(tail[-30:])
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--out", default="sweep_results.jsonl")
    ap.add_argument("--only", default=None,
                    help="comma list of constant names to sweep")
    a = ap.parse_args()
    points = []
    for name, vals in GRID.items():
        if a.only and name not in a.only.split(","):
            continue
        for v in vals[1:]:          # vals[0] = operating point, already CI'd
            points.append((name, v))
    print(f"{len(points)} grid points x {len(BATTERY)} files", flush=True)
    results = []
    with ThreadPoolExecutor(max_workers=a.jobs) as ex:
        for rec in ex.map(lambda p: run_point(*p), points):
            results.append(rec)
            print(json.dumps(rec), flush=True)
            with open(os.path.join(REPO, a.out), "a") as f:
                f.write(json.dumps(rec) + "\n")
    bad = [r for r in results if not r["ok"]]
    print(f"done: {len(results) - len(bad)}/{len(results)} points pass")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
