#!/usr/bin/env python
"""Health-gated bench_scaling rerun (round-4 VERDICT item 7).

Polls the calibrated spin probe; when the host shows a clean window
(two consecutive probes >= GATE, 60 s apart), runs bench_scaling.py.
Afterwards judges the run by its own recorded per-leg cpu_health: if
any leg dipped below JUDGE, the run is marked contaminated and the
gate re-arms (up to MAX_RUNS attempts).  Writes a one-line status to
/tmp/gated_scaling_status.json after every attempt so the arming
session can check the outcome.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import cpu_health_mips  # noqa: E402

GATE = float(os.environ.get("GATE_MIPS", "9.5"))
JUDGE = float(os.environ.get("JUDGE_MIPS", "9.0"))
MAX_RUNS = int(os.environ.get("GATE_MAX_RUNS", "3"))
DEADLINE = time.time() + float(os.environ.get("GATE_DEADLINE_S", "14400"))
STATUS = "/tmp/gated_scaling_status.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def status(**kw):
    with open(STATUS, "w") as f:
        json.dump(dict(kw, t=time.time()), f)


def main() -> None:
    runs = 0
    status(state="armed", gate=GATE)
    while runs < MAX_RUNS and time.time() < DEADLINE:
        h1 = cpu_health_mips()
        if h1 < GATE:
            status(state="waiting", last_probe=h1, runs=runs)
            time.sleep(180)
            continue
        time.sleep(60)
        h2 = cpu_health_mips()
        if h2 < GATE:
            status(state="waiting", last_probe=h2, runs=runs)
            continue
        status(state="running", probes=[h1, h2], runs=runs)
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py")],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # contention stretching the run past an hour IS the
            # contamination signal — record it and re-arm
            runs += 1
            status(state="contaminated", runs=runs, legs=[],
                   rc="timeout", tail="")
            continue
        runs += 1
        # judge by the run's own per-leg health markers.  bench_scaling
        # prints the per-leg dicts (which carry cpu_health_mips) to
        # STDERR and only the nested summary to stdout — scan both.
        healths = []
        for line in (p.stderr + "\n" + p.stdout).splitlines():
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if isinstance(d, dict) and "cpu_health_mips" in d:
                healths.append(d["cpu_health_mips"])
        clean = bool(healths) and min(healths) >= JUDGE and p.returncode == 0
        status(
            state="clean" if clean else "contaminated",
            runs=runs, legs=healths, rc=p.returncode,
            tail=p.stdout[-2000:],
        )
        if clean:
            return
    status(state="gave_up", runs=runs)


if __name__ == "__main__":
    main()
