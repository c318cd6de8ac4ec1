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

import numpy as np

from .batch import match_group_nfa, match_schema_flat, matches_to_pdf_flat, prefilter
from .compiler import CompiledPattern

__all__ = ["run_batch_sliced", "run_batch_auto"]


def _slice_expr(ts_col: str, w_s: float):
    from pyspark.sql import functions as F

    return F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(float(w_s))).cast("long")


def run_batch_sliced(df, cp: CompiledPattern):
    """Window-sliced NFA execution: groupBy(key, slice).applyInPandas."""
    from pyspark.sql import functions as F

    from ._serde import ensure_shippable

    ensure_shippable()
    pat = cp.pattern
    if pat.window is None:
        raise ValueError("run_batch_sliced requires a pattern window (the slice width)")
    w_s = pat.window.total_seconds()
    w_ns = int(w_s * 1e9)
    key_type = df.schema[pat.key].dataType
    base = prefilter(df, cp)

    own = _slice_expr(pat.ts_col, w_s)
    sliced = base.withColumn("__slice", F.explode(F.array(own, own - 1)))

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

    return (
        sliced.groupBy(pat.key, "__slice")
        .applyInPandas(fn, schema=schema)
    )


def hot_keys(df, cp: CompiledPattern, threshold: int):
    """Keys whose (pattern-relevant) event count exceeds `threshold` —
    one cheap aggregate over the prefiltered scan."""
    from pyspark.sql import functions as F

    pat = cp.pattern
    return [
        r[0]
        for r in prefilter(df, cp)
        .groupBy(pat.key)
        .count()
        .filter(F.col("count") > threshold)
        .collect()
    ]


def run_batch_auto(df, cp: CompiledPattern, hot_threshold: int = 100_000):
    """Plain per-key NFA for normal keys; window-sliced for hot keys."""
    from pyspark.sql import functions as F

    from .batch import run_batch

    pat = cp.pattern
    hot = hot_keys(df, cp, hot_threshold)
    if not hot or pat.window is None:
        return run_batch(df, cp, mode="flat")
    cold_df = df.filter(~F.col(pat.key).isin(hot))
    hot_df = df.filter(F.col(pat.key).isin(hot))
    return run_batch(cold_df, cp, mode="flat").unionByName(
        run_batch_sliced(hot_df, cp)
    )
