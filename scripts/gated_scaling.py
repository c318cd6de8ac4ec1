#!/usr/bin/env python
"""Health-gated scaling evidence, one job pair per clean window.

Every full (and even QUICK) bench_scaling run this round outlasted the
host's clean-CPU windows and was self-judged contaminated.  Scaling
efficiency only needs WITHIN-PAIR consistency, so this runner hunts a
clean window per JOB: when two probes pass the gate (and the window is
not already collapsing), it runs just that job's local[2]/local[8] pair
(BENCH_JOBS=<job>, QUICK inputs, ceiling burn skipped) and judges the
pair by its own per-leg pre/post health.  Clean pairs accumulate; once
all three jobs have a clean pair, it measures the busy-loop hardware
ceiling and writes BENCH/SCALING_AUTO.md via bench_scaling._write_md.

Evidence is never lost: every attempt appends to ATTEMPTS; accumulated
clean pairs live in RESULTS; STATUS carries the latest state.  While
LOCK exists (an interactive session running its own Spark work) the
gate waits.  Inputs are pre-generated before hunting so dataset
generation never burns window time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# set BEFORE any bench_scaling import so this process's module-level
# sizes (used by _write_md's QUICK header) match the workers'
os.environ.setdefault("BENCH_QUICK", "1")
os.environ.setdefault("BENCH_STREAM_N_CONV", "4000")

GATE = float(os.environ.get("GATE_MIPS", "9.5"))
COLLAPSE = float(os.environ.get("GATE_COLLAPSE", "1.5"))  # h2 >= h1 - this
JUDGE = float(os.environ.get("JUDGE_MIPS", "9.0"))
MAX_ATTEMPTS_PER_JOB = int(os.environ.get("GATE_MAX_RUNS", "10"))
PROBE_GAP_S = float(os.environ.get("GATE_PROBE_GAP_S", "20"))
DEADLINE = time.time() + float(os.environ.get("GATE_DEADLINE_S", "14400"))
STATUS = "/tmp/gated_scaling_status.json"
ATTEMPTS = "/tmp/gated_scaling_attempts.jsonl"
RESULTS = "/tmp/gated_scaling_results.json"
LOCK = "/tmp/spark_work.lock"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(os.environ, BENCH_SKIP_CEILING="1")
JOB_NAMES = ["nfa_batch", "join_batch", "stream"]


def status(**kw):
    with open(STATUS, "w") as f:
        json.dump(dict(kw, t=time.time()), f)


def record_attempt(**kw):
    with open(ATTEMPTS, "a") as f:
        f.write(json.dumps(dict(kw, t=time.time())) + "\n")


def probe():
    from bench_scaling import cpu_health_mips

    return cpu_health_mips()


def wait_for_window(job, done):
    while time.time() < DEADLINE:
        if os.path.exists(LOCK):
            status(state="locked", hunting=job, clean=done)
            time.sleep(60)
            continue
        h1 = probe()
        if h1 < GATE:
            status(state="waiting", hunting=job, last_probe=h1, clean=done)
            time.sleep(90)
            continue
        time.sleep(PROBE_GAP_S)
        h2 = probe()
        # a collapsing window (h2 well below h1) will not survive the run
        if h2 < GATE or h2 < h1 - COLLAPSE:
            status(state="waiting", hunting=job, last_probe=h2, clean=done)
            continue
        if os.path.exists(LOCK):
            continue
        return [h1, h2]
    return None


def run_pair(job):
    """Run one job's (2, 8) pair; return (legs_by_cpus, judgments, rc).

    judgments = per-leg ``host_clean`` flags from bench_scaling's
    CONCURRENT free-core sampling against the under-load calibration —
    the in-worker cpu_health_mips is biased low by construction (the
    probe shares the pinned cores with the JVM, and this VM's per-core
    rate falls under any multi-core load: DVFS, not contention)."""
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_scaling.py")],
        capture_output=True, text=True, cwd=REPO, timeout=2400,
        env=dict(ENV, BENCH_JOBS=job),
    )
    legs, clean_flags = {}, []
    for line in (p.stderr + "\n" + p.stdout).splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if isinstance(d, dict) and d.get("job") == job and "cpus" in d:
            legs[d["cpus"]] = d
            clean_flags.append(bool(d.get("host_clean")))
    return legs, clean_flags, p.returncode


def main() -> None:
    # pre-generate inputs OUTSIDE any clean window
    status(state="prewarm")
    subprocess.run(
        [sys.executable, "-c",
         "import bench_scaling as b; b._ensure_transcripts(); b._ensure_stream_src()"],
        cwd=REPO, env=ENV, timeout=1800, capture_output=True,
    )
    clean: dict = {}
    if os.path.exists(RESULTS):
        try:
            clean = json.load(open(RESULTS)).get("jobs", {})
        except ValueError:
            clean = {}
    for job in JOB_NAMES:
        if job in clean:
            continue
        attempts = 0
        while attempts < MAX_ATTEMPTS_PER_JOB and time.time() < DEADLINE:
            probes = wait_for_window(job, sorted(clean))
            if probes is None:
                break
            status(state="running", hunting=job, probes=probes,
                   clean=sorted(clean))
            try:
                legs, clean_flags, rc = run_pair(job)
            except subprocess.TimeoutExpired:
                attempts += 1
                record_attempt(job=job, verdict="timeout", probes=probes)
                continue
            attempts += 1
            ok = (
                rc == 0 and len(legs) == 2
                and bool(clean_flags) and all(clean_flags)
            )
            record_attempt(job=job, verdict="clean" if ok else "contaminated",
                           probes=probes, host_clean=clean_flags, rc=rc,
                           legs={str(k): v for k, v in legs.items()})
            if ok:
                clean[job] = {str(k): v for k, v in legs.items()}
                with open(RESULTS, "w") as f:
                    json.dump({"jobs": clean}, f)
                break
            status(state="contaminated", hunting=job, host_clean=clean_flags,
                   clean=sorted(clean))
    if set(clean) != set(JOB_NAMES):
        status(state="gave_up", clean=sorted(clean))
        return
    # all three pairs clean: ceiling + combined markdown
    import bench_scaling as b

    hw = b._hw_ceiling()
    summary = {"metric": "scaling_efficiency", "levels": b.LEVELS,
               "quick": True, "per_job_windows": True, "hw_ceiling": hw,
               "pairs": {}}
    n, n4 = b.PAIRS[0]
    pair = {}
    for job in JOB_NAMES:
        a, c = clean[job][str(n)], clean[job][str(n4)]
        eff = (c["rows_per_sec"] / a["rows_per_sec"]) / (n4 / n)
        pair[job] = {
            f"local[{n}]": a, f"local[{n4}]": c,
            "speedup": round(c["rows_per_sec"] / a["rows_per_sec"], 3),
            "efficiency": round(eff, 3),
        }
    summary["pairs"][f"{n}->{n4}"] = pair
    os.chdir(REPO)
    b._write_md(summary)
    with open(RESULTS, "w") as f:
        json.dump({"jobs": clean, "summary": summary}, f)
    status(state="clean", clean=sorted(clean),
           eff={j: pair[j]["efficiency"] for j in pair})


if __name__ == "__main__":
    main()
