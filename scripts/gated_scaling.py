#!/usr/bin/env python
"""Health-gated bench_scaling rerun (round-4 VERDICT item 7).

Polls the calibrated spin probe; when the host shows a clean window
(two consecutive probes >= GATE, PROBE_GAP_S apart), runs
bench_scaling.py in QUICK mode (criterion pair (2,8) only, reduced
inputs — the full run outlasts this host's clean windows; every full
attempt since round 1 degraded mid-run).  Afterwards judges the run by
its own recorded per-leg cpu_health (min of pre/post probes per leg):
if any leg dipped below JUDGE, the run is marked contaminated, its
SCALING_AUTO.md overwrite is reverted to the pre-run content, and the
gate re-arms (up to MAX_RUNS attempts).

Evidence is never lost: every attempt appends a full record (probes,
per-leg healths, rc, summary tail) to ATTEMPTS; the one-line STATUS
file carries the latest state including the last attempt's legs.

Cooperative lock: while LOCK exists (an interactive session running its
own Spark work), the gate waits instead of firing mid-contention.
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
MAX_RUNS = int(os.environ.get("GATE_MAX_RUNS", "6"))
PROBE_GAP_S = float(os.environ.get("GATE_PROBE_GAP_S", "30"))
DEADLINE = time.time() + float(os.environ.get("GATE_DEADLINE_S", "14400"))
STATUS = "/tmp/gated_scaling_status.json"
ATTEMPTS = "/tmp/gated_scaling_attempts.jsonl"
LOCK = "/tmp/spark_work.lock"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AUTO_MD = os.path.join(REPO, "BENCH", "SCALING_AUTO.md")


def status(**kw):
    with open(STATUS, "w") as f:
        json.dump(dict(kw, t=time.time()), f)


def record_attempt(**kw):
    with open(ATTEMPTS, "a") as f:
        f.write(json.dumps(dict(kw, t=time.time())) + "\n")


def main() -> None:
    runs = 0
    last = {}
    status(state="armed", gate=GATE)
    while runs < MAX_RUNS and time.time() < DEADLINE:
        if os.path.exists(LOCK):
            status(state="locked", runs=runs, **last)
            time.sleep(60)
            continue
        h1 = cpu_health_mips()
        if h1 < GATE:
            status(state="waiting", last_probe=h1, runs=runs, **last)
            time.sleep(120)
            continue
        time.sleep(PROBE_GAP_S)
        h2 = cpu_health_mips()
        if h2 < GATE:
            status(state="waiting", last_probe=h2, runs=runs, **last)
            continue
        if os.path.exists(LOCK):
            continue
        status(state="running", probes=[h1, h2], runs=runs)
        pre_md = open(AUTO_MD).read() if os.path.exists(AUTO_MD) else None
        env = dict(os.environ, BENCH_QUICK="1")
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py")],
                capture_output=True, text=True, cwd=REPO, timeout=2400,
                env=env,
            )
        except subprocess.TimeoutExpired:
            # contention stretching the run past the cap IS the
            # contamination signal — record it and re-arm
            runs += 1
            last = {"legs": [], "rc": "timeout"}
            record_attempt(verdict="contaminated", probes=[h1, h2], **last)
            status(state="contaminated", runs=runs, **last)
            if pre_md is not None:
                with open(AUTO_MD, "w") as f:
                    f.write(pre_md)
            continue
        runs += 1
        # judge by the run's own per-leg health markers.  bench_scaling
        # prints the per-leg dicts (which carry cpu_health_mips = min of
        # the pre/post probes) to STDERR and the nested summary to
        # stdout — scan both.
        healths = []
        for line in (p.stderr + "\n" + p.stdout).splitlines():
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if isinstance(d, dict) and "cpu_health_mips" in d:
                healths.append(d["cpu_health_mips"])
        clean = bool(healths) and min(healths) >= JUDGE and p.returncode == 0
        verdict = "clean" if clean else "contaminated"
        last = {"legs": healths, "rc": p.returncode}
        record_attempt(verdict=verdict, probes=[h1, h2],
                       tail=p.stdout[-2000:], stderr_tail=p.stderr[-2000:],
                       **last)
        status(state=verdict, runs=runs, **last)
        if clean:
            return
        if pre_md is not None:
            # a contaminated run must not clobber the recorded evidence
            with open(AUTO_MD, "w") as f:
                f.write(pre_md)
    status(state="gave_up", runs=runs, **last)


if __name__ == "__main__":
    main()
