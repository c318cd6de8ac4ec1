"""Hot-key (skewed conversation) handling for the batch NFA path.

SURVEY.md §7.4 item 2: NFA evaluation is order-dependent per key, so
classic value-salting cannot split one key's *state*.  What CAN be
split is TIME, because the pattern window bounds every match span:

    slice width = window W
    event with ts in [kW, (k+1)W)  ->  groups (key, k) and (key, k-1)
    group (key, k) holds events with ts in [kW, (k+2)W)
    a match whose FIRST event is in [kW, (k+1)W) spans < W
        => fully contained in group (key, k)
    emit a match from group k iff first_ts in [kW, (k+1)W)

Each match is found in exactly one group: exact all-matches semantics,
2x event duplication, and a hot conversation now parallelizes across
ceil(span/W) tasks instead of serializing on one core.  This is the
batch-mode answer to "salted repartitioning" — the shuffle key becomes
(conv_id, time_slice), which is exactly a salt whose correctness is
carried by the window bound.

`run_batch_auto` picks the sliced path for keys above a hotness
threshold and the plain path for the rest, unioning the results —
the common case pays no duplication.
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np

from .batch import match_group_nfa, match_schema_flat, matches_to_pdf_flat, prefilter
from .compiler import CompiledPattern

__all__ = [
    "run_batch_sliced",
    "run_batch_auto",
    "run_batch_multi_sliced",
    "run_batch_multi_auto",
]


def _slice_expr(ts_col: str, w_us: int):
    """floor(epoch_us / w_us) in exact integer arithmetic.

    unix_timestamp() truncates to whole seconds, which mis-buckets events
    when the window is not a whole number of seconds (timedelta carries
    ms/us); unix_micros keeps full precision and timedelta resolution IS
    microseconds, so this is exact.  pmod-based floordiv keeps floor
    semantics for any sign; (m - pmod) / w is an exact double division
    because both operands and the integer quotient fit in 53 bits."""
    from pyspark.sql import functions as F

    # cast handles TIMESTAMP_NTZ parquet columns; the session timezone is
    # pinned to UTC (session.py), so the cast is shift-free and the slice
    # agrees with the naive pandas-side ns bounds in fn()
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return ((m - F.pmod(m, F.lit(w_us))) / F.lit(w_us)).cast("long")


def run_batch_sliced(df, cp: CompiledPattern):
    """Window-sliced NFA execution: groupBy(key, slice).applyInPandas."""
    from pyspark.sql import functions as F

    from ._serde import ensure_shippable

    ensure_shippable()
    pat = cp.pattern
    if pat.window is None:
        raise ValueError("run_batch_sliced requires a pattern window (the slice width)")
    w_us = pat.window // timedelta(microseconds=1)
    w_ns = w_us * 1000
    key_type = df.schema[pat.key].dataType
    base = prefilter(df, cp)

    own = _slice_expr(pat.ts_col, w_us)
    # group k normally holds events in [kW, (k+2)W): every match whose
    # first event lies in [kW, (k+1)W) is contained (span <= W), and so
    # are gap/span/trailing negation candidates.  LEADING negation looks
    # BACK up to W before the first event — into [(k-1)W, kW) — so those
    # patterns replicate events into a third group (own+1): 3x
    # duplication instead of 2x, still exact.
    has_leading = any(
        n.kind == "leading" for alt in cp.alternatives for n in alt.negs
    )
    replicas = [own, own - 1] + ([own + 1] if has_leading else [])
    sliced = base.withColumn("__slice", F.explode(F.array(*replicas)))

    schema = match_schema_flat(cp, key_type)
    ts_col, tb_col = pat.ts_col, pat.tiebreak_col

    def fn(key, pdf):
        key_val, k = key[0], key[1]
        g = pdf.sort_values([ts_col, tb_col]).reset_index(drop=True)
        ts_ns = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
        lo, hi = k * w_ns, (k + 1) * w_ns
        res = []
        for alt_id, binding in match_group_nfa(cp, g):
            first = min(
                pos
                for p in binding.values()
                for pos in (p if isinstance(p, tuple) else (p,))
            )
            if lo <= ts_ns[first] < hi:
                res.append((alt_id, binding))
        return matches_to_pdf_flat(cp, g, key_val, res=res)

    # pin the exchange width: AQE's byte-based coalescing would collapse
    # this CPU-bound matcher stage to a handful of tasks (the whole point
    # of slicing is parallelism) — see batch.cpu_parallelism.  The pinned
    # repartition satisfies applyInPandas' clustered-distribution
    # requirement, so no second shuffle is added.
    from .batch import cpu_parallelism

    sliced = sliced.repartition(cpu_parallelism(df), pat.key, "__slice")
    return (
        sliced.groupBy(pat.key, "__slice")
        .applyInPandas(fn, schema=schema)
    )


def run_batch_multi_sliced(df, cps, emit_cols=("turn_idx", "role", "tool", "ts")):
    """Window-sliced MULTI-pattern execution: a hot conversation running
    N rules parallelizes across ceil(span/W) tasks AND matches all N
    patterns in one prefix-shared automaton per slice (merge.py) — the
    composition of the two hot-key answers.  Windows may differ: the
    slice width is the MAX window (every pattern's match span fits in
    one slice + its predecessor replica), and per-tag span re-checks at
    accept keep each pattern exact (merge.py).  Output is the array
    schema with ``pattern_id``, identical to run_batch_multi."""
    from pyspark.sql import functions as F

    from ._serde import ensure_shippable
    from .batch import (
        _ColStore,
        array_match_rows,
        cpu_parallelism,
        match_core,
        match_schema_array,
        prefilter_multi,
        unary_masks,
    )
    from .merge import merge_compiled, mergeable

    ensure_shippable()
    if not cps:
        raise ValueError("no patterns")
    if not mergeable(cps):
        raise ValueError(
            "run_batch_multi_sliced requires identical key/ts/tiebreak "
            "columns across patterns"
        )
    pat = cps[0].pattern
    if any(cp.pattern.window is None for cp in cps):
        raise ValueError(
            "run_batch_multi_sliced requires a window on every pattern "
            "(the max window is the slice width)"
        )
    merged = merge_compiled(cps)
    # slice width = the merged automaton's shared horizon (max window)
    w_us = merged.pattern.window // timedelta(microseconds=1)
    w_ns = w_us * 1000
    key_type = df.schema[pat.key].dataType
    base = prefilter_multi(df, cps, extra_cols=emit_cols)

    own = _slice_expr(pat.ts_col, w_us)
    has_leading = any(
        n.kind == "leading"
        for cp in cps for alt in cp.alternatives for n in alt.negs
    )
    replicas = [own, own - 1] + ([own + 1] if has_leading else [])
    sliced = base.withColumn("__slice", F.explode(F.array(*replicas)))

    schema = match_schema_array(pat, emit_cols, key_type)
    ts_col, tb_col, key_col = pat.ts_col, pat.tiebreak_col, pat.key
    out_cols = schema.fieldNames()

    # partition-amortized execution (mirrors batch._run_batch_multi_
    # partition): repartition on (key, slice), sort within partitions,
    # then ONE mapInPandas pass per partition — unary masks evaluate
    # once over the whole partition and every (key, slice) group is a
    # numpy slice of it.  groupBy().applyInPandas here would pay the
    # per-group pandas/mask setup ~span/W times PER KEY, which dominates
    # when slicing runs over non-hot keys (tiny groups); the pinned
    # repartition also keeps AQE from collapsing the CPU-bound matcher
    # stage (batch.cpu_parallelism).
    sliced = sliced.repartition(
        cpu_parallelism(df), key_col, "__slice"
    ).sortWithinPartitions(key_col, "__slice", ts_col, tb_col)

    def gen(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        n = len(pdf)
        if n == 0:
            return
        cols_all = {c: pdf[c].to_numpy() for c in pdf.columns}
        keys = cols_all[key_col]
        slices = cols_all["__slice"]
        change = (
            np.nonzero((keys[1:] != keys[:-1]) | (slices[1:] != slices[:-1]))[0]
            + 1
        )
        bounds = np.concatenate([[0], change, [n]])
        ts_all = cols_all[ts_col].astype("datetime64[ns]").astype(np.int64)
        masks_all = unary_masks(merged, cols_all, n)
        rows = []
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            sub_cols = {c: a[s:e] for c, a in cols_all.items()}
            store = _ColStore.from_cols(sub_cols)
            masks = {
                aid: ({sid: m[s:e] for sid, m in sm.items()}, [m[s:e] for m in nm])
                for aid, (sm, nm) in masks_all.items()
            }
            k = int(slices[s])
            lo, hi = k * w_ns, (k + 1) * w_ns
            ts_g = ts_all[s:e]
            by_cp: dict = {}
            for (pi, alt_id), binding in match_core(merged, store, ts_g, masks):
                first = min(
                    pos
                    for p in binding.values()
                    for pos in (p if isinstance(p, tuple) else (p,))
                )
                if lo <= ts_g[first] < hi:  # this slice owns the match
                    by_cp.setdefault(pi, []).append((alt_id, binding))
            for pi, lst in by_cp.items():
                rows.extend(
                    array_match_rows(cps[pi], keys[s], emit_cols, lst, sub_cols)
                )
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    return sliced.mapInPandas(gen, schema=schema)


def hot_keys(df, cp: CompiledPattern, threshold: int):
    """Keys whose (pattern-relevant) event count exceeds `threshold`, as
    a one-column DataFrame — never collected to the driver, so a skewed
    tail with many hot keys cannot blow up driver memory; callers route
    with a broadcast semi/anti join."""
    from pyspark.sql import functions as F

    pat = cp.pattern
    return (
        prefilter(df, cp)
        .filter(F.col(pat.key).isNotNull())
        .groupBy(pat.key)
        .count()
        .filter(F.col("count") > threshold)
        .select(pat.key)
    )


def run_batch_auto(df, cp: CompiledPattern, hot_threshold: int = 100_000):
    """Plain per-key NFA for normal keys; window-sliced for hot keys.

    Hot/cold routing is a broadcast semi/anti join against the hot-key
    aggregate (no collect + isin literals).  Null-key rows never match
    the semi join and always survive the anti join, so they flow down
    the plain path — identical grouping to `run_batch`."""
    from pyspark.sql import functions as F

    from .batch import run_batch

    pat = cp.pattern
    if pat.window is None:
        return run_batch(df, cp, mode="flat")
    # localCheckpoint (not cache): the aggregate feeds isEmpty + two
    # broadcast joins — one scan, not three, the checkpointed side is
    # tiny (only keys above threshold), and its blocks are released by
    # the ContextCleaner once the plan is unreferenced instead of
    # leaking a session-lifetime cache entry per invocation.
    hot = hot_keys(df, cp, hot_threshold).localCheckpoint()
    if hot.isEmpty():
        return run_batch(df, cp, mode="flat")
    cold_df = df.join(F.broadcast(hot), on=pat.key, how="left_anti")
    hot_df = df.join(F.broadcast(hot), on=pat.key, how="left_semi")
    return run_batch(cold_df, cp, mode="flat").unionByName(
        run_batch_sliced(hot_df, cp)
    )


def run_batch_multi_auto(df, cps, emit_cols=("turn_idx", "role", "tool", "ts"),
                         hot_threshold: int = 100_000):
    """Multi-pattern analogue of run_batch_auto: normal keys run the
    (prefix-shared when profitable) multi executor; keys whose
    pattern-relevant event count exceeds ``hot_threshold`` run
    window-sliced, prefix-shared.  Requires merge.mergeable patterns
    when any key is hot (the slice width is the common window)."""
    from pyspark.sql import functions as F

    from .batch import prefilter_multi, run_batch_multi

    pat = cps[0].pattern
    if pat.window is None:
        return run_batch_multi(df, cps, emit_cols=emit_cols)
    hot = (
        prefilter_multi(df, cps)
        .filter(F.col(pat.key).isNotNull())
        .groupBy(pat.key)
        .count()
        .filter(F.col("count") > hot_threshold)
        .select(pat.key)
        .localCheckpoint()
    )
    if hot.isEmpty():
        return run_batch_multi(df, cps, emit_cols=emit_cols)
    cold_df = df.join(F.broadcast(hot), on=pat.key, how="left_anti")
    hot_df = df.join(F.broadcast(hot), on=pat.key, how="left_semi")
    return run_batch_multi(cold_df, cps, emit_cols=emit_cols).unionByName(
        run_batch_multi_sliced(hot_df, cps, emit_cols=emit_cols)
    )
