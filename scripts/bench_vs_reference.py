#!/usr/bin/env python
"""Single-node throughput vs the reference's evaluation style.

The reference (yuvadius/CEP) is a single-threaded pure-Python
tree-evaluation engine with no published numbers (BASELINE.md); the
closest apples-to-apples stand-in available offline is our in-repo
brute-force replica `tests/oracle_cep.py`, which evaluates patterns
the same way (per-event Python loop, per-binding condition eval).

This script runs replica vs the engine's vectorized NFA matcher on the
same single core, same data, same pattern (match counts asserted
equal) and prints one JSON line.  Spark-level parallelism multiplies
the NFA number by the scaling results in BENCH/SCALING.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from datetime import timedelta

from cep_spark.batch import match_group_nfa
from cep_spark.compiler import compile_pattern
from cep_spark.pattern import Ev, Pattern, Seq
from cep_spark.transcripts import gen_transcripts
from oracle_cep import match_group


def main():
    pat = Pattern(
        Seq(Ev("u", role="user"), Ev("a", role="assistant"), Ev("t", role="tool")),
        window=timedelta(minutes=10),
        key="conv_id", ts_col="ts", tiebreak_col="turn_idx",
    )
    cp = compile_pattern(pat)
    pdf = gen_transcripts(n_conv=int(os.environ.get("N_CONV", "4000")), seed=42)
    groups = [
        g.sort_values(["ts", "turn_idx"]).reset_index(drop=True)
        for _, g in pdf.groupby("conv_id", sort=False)
    ]
    rows = len(pdf)

    t0 = time.perf_counter()
    n_ref = sum(len(match_group(pat, g)) for g in groups)
    ref_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_nfa = sum(len(match_group_nfa(cp, g)) for g in groups)
    nfa_s = time.perf_counter() - t0
    assert n_ref == n_nfa, (n_ref, n_nfa)
    print(json.dumps({
        "rows": rows, "matches": n_ref,
        "replica_turns_per_sec": round(rows / ref_s, 1),
        "nfa_turns_per_sec": round(rows / nfa_s, 1),
        "single_core_speedup": round(ref_s / nfa_s, 2),
    }))


if __name__ == "__main__":
    main()
