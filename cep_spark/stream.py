"""Structured-Streaming execution of compiled patterns.

flatMapGroupsWithState-style stateful processing (SURVEY.md §3.4, M3;
replaces the reference's push-loop over an in-memory queue — reference
`CEP.py` run loop, SURVEY.md §3.1):

    events readStream
      .filter(union of unary conditions)        <- Catalyst pushdown
      .withWatermark(ts, delay)
      .groupBy(key)
      .applyInPandasWithState(nfa_fn)           <- per-key event buffer
                                                   (Arrow IPC in the state
                                                   store), NFA re-advance,
                                                   watermark-sealed emission

Semantics (the parity contract — BASELINE "same input stream and
watermark"):

* A match is EMITTED in the first micro-batch whose watermark W is >=
  the match's last event-time ("sealed"): no in-order event arriving
  later can create, extend, or (via gap-negation) invalidate a match
  with last.ts <= W, because such events have ts > W.
* An arrival whose ts is <= the PREVIOUS emission watermark is LATE and
  dropped (counted in state): admitting it could mint a match that was
  already sealed shut, breaking exactly-once.  Arrivals inside the
  current bracket (prev_wm, W] are admitted even though they are
  behind max(event time) — bounded disorder is handled for free.
* State per key = the retained event buffer: events with
  ts > watermark - window cannot yet be excluded from a future match;
  everything older is pruned.  With a window, state is bounded by the
  key's event rate x window span.  Unbounded-window patterns keep the
  full key history (documented limit; the reference behaves the same).
* Exactly-once: a match seals in exactly one bracket (last_emit_wm, W].
  On failure Spark replays the batch from the checkpoint with the same
  state and the same watermark, reproducing the bracket byte-for-byte;
  the sink (sink.py) is idempotent per batch id.

The matcher is the SAME `match_group_nfa` as batch mode — batch ≡
stream parity is structural.  Each batch re-advances the NFA over the
retained buffer and emits only newly-sealed matches; partial-match
tables are recomputed from the (window-bounded) buffer rather than
persisted — the recompute-vs-checkpoint tradeoff taken on the
recompute side because buffers are bounded while partial-match sets
are not (Kleene is super-linear in buffer length in the worst case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .batch import (
    CompiledPattern,
    _ColStore,
    _Partials,
    _obj_array,
    advance_core,
    match_group_nfa,
    match_schema_array,
    match_schema_flat,
    matches_to_pdf_array,
    matches_to_pdf_flat,
    prefilter,
    unary_masks,
)

__all__ = ["run_stream", "stream_matches"]


def _ser_buf(pdf: pd.DataFrame) -> bytes:
    """Arrow-IPC encode the retained-event buffer (state-store value)."""
    import pyarrow as pa

    table = pa.Table.from_pandas(pdf, preserve_index=False)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def _de_buf(raw: bytes) -> pd.DataFrame:
    import pyarrow as pa

    return pa.ipc.open_stream(pa.BufferReader(raw)).read_all().to_pandas()


# --------------------------------------------------------------------------
# partial-table (de)serialization for the incremental executor


def _ser_tables(tables) -> bytes | None:
    """pickle the non-empty per-state partial tables ({alt: {sid: ...}})."""
    import pickle

    plain = {}
    total = 0
    for alt_id, tmap in tables.items():
        sub = {}
        for sid, p in tmap.items():
            if len(p) == 0:
                continue
            sub[sid] = (p.scalar, p.kleene, p.first_pos, p.last_pos, p.first_ts)
            total += len(p)
        if sub:
            plain[alt_id] = sub
    if not total:
        return None
    return pickle.dumps(plain, protocol=5)


def _de_tables(raw: bytes | None) -> dict:
    import pickle

    if not raw:
        return {}
    out = {}
    for alt_id, sub in pickle.loads(raw).items():
        tmap = {}
        for sid, (scalar, kleene, fp, lp, fts) in sub.items():
            p = _Partials(scalar, kleene)
            p.scalar, p.kleene = scalar, kleene
            p.first_pos, p.last_pos, p.first_ts = fp, lp, fts
            tmap[sid] = p
        out[alt_id] = tmap
    return out


def _tables_rows(tables) -> int:
    return sum(len(p) for tmap in tables.values() for p in tmap.values())


def _prune_tables(tables, min_first_ts_excl: int) -> None:
    """Drop partials that can no longer complete: a future event has
    ts' > wm, so completable partials have first_ts > wm - W."""
    for tmap in tables.values():
        for sid, p in list(tmap.items()):
            if len(p):
                alive = p.first_ts > min_first_ts_excl
                if not alive.all():
                    tmap[sid] = p.select(alive)


def _shift_tables(tables, off: int) -> None:
    """Re-base stored positions after evicting `off` prefix rows of the
    sealed buffer (eviction is always a sorted-order prefix, so the
    shift is uniform)."""
    if off == 0:
        return
    for tmap in tables.values():
        for p in tmap.values():
            if len(p) == 0:
                continue
            for v in p.scalar:
                p.scalar[v] = p.scalar[v] - off
            for v in p.kleene:
                p.kleene[v] = _obj_array(
                    [tuple(x - off for x in t) for t in p.kleene[v]]
                )
            p.first_pos = p.first_pos - off
            p.last_pos = p.last_pos - off


def _match_last_ts_ns(binding: dict, ts_ns: np.ndarray) -> int:
    last = -1
    for p in binding.values():
        for pos in p if isinstance(p, tuple) else (p,):
            t = int(ts_ns[pos])
            if t > last:
                last = t
    return last


def _trailing_alt_ids(cp: CompiledPattern) -> frozenset:
    """Alternatives carrying a trailing negation: their matches can be
    invalidated by a neg event up to first.ts + window, so they seal at
    that instant instead of the match's last event-time."""
    return frozenset(
        alt.alt_id
        for alt in cp.alternatives
        if any(n.kind == "trailing" for n in alt.negs)
    )


def _retention_w_ns(cp: CompiledPattern, w_ns):
    """Buffer-retention horizon.  2x window when an alternative has BOTH
    leading and trailing negs: a match parked for its trailing-neg seal
    (first.ts + W > wm) can still be killed by a leading neg as old as
    last.ts - W > wm - 2W, so those events must survive eviction."""
    if w_ns is None:
        return None
    for alt in cp.alternatives:
        kinds = {n.kind for n in alt.negs}
        if "trailing" in kinds and "leading" in kinds:
            return 2 * w_ns
    return w_ns


def _seal_ts_ns(binding: dict, ts_ns: np.ndarray, alt_id, trailing_ids, w_ns) -> int:
    """Watermark instant at which a match becomes immutable."""
    first, last = None, -1
    for p in binding.values():
        for pos in p if isinstance(p, tuple) else (p,):
            t = int(ts_ns[pos])
            if t > last:
                last = t
            if first is None or t < first:
                first = t
    if alt_id in trailing_ids:
        return first + w_ns
    return last


def stream_matches(df, cp: CompiledPattern, watermark: str, mode: str = "flat",
                   emit_cols=("turn_idx", "role", "tool", "ts"),
                   strategy: str = "auto", max_partials_per_state=None):
    """Attach the stateful NFA to a streaming DataFrame.

    Returns the streaming match DataFrame (append mode); the caller
    attaches the sink (memory sink in tests, exactly-once parquet via
    sink.py in production).

    ``strategy``:
      * ``"incremental"`` — persist the per-state partial-match tables in
        the state store and advance the NFA ONLY over newly-sealed
        arrivals (O(new events) per batch instead of O(buffer)).  Sealed
        matches involve only sealed events (every event of a match has
        ts <= the match's seal instant <= watermark), so limbo events
        above the watermark need no matching at all — each event is
        matched exactly once, in the batch where it seals, which is also
        exactly the batch the rematch executor would emit it in
        (identical emission brackets).  A per-key guard falls back to
        rematch when the partial set outgrows the buffer (Kleene-dense
        patterns — the powerset partial count can exceed serialization
        budget).  Trailing negations are handled by PARKING: an accepted
        match whose trailing look-ahead is still open (seal =
        first.ts + window > watermark) is stored as a parked partial and
        re-verified each batch against ONLY the freshly-sealed negation
        candidates — no per-batch buffer rematch.
      * ``"rematch"`` — re-run the matcher over the retained buffer each
        batch (the v1 path; also the checkpoint-compatibility pin for
        queries started before the incremental executor existed).
      * ``"auto"`` — incremental (or $CEP_SPARK_STREAM_STRATEGY).

    The two strategies use different state-store schemas, so switching
    strategy for an existing query requires a fresh checkpoint (Spark
    rejects the mismatch at restart — it cannot corrupt state).
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ._serde import ensure_shippable

    ensure_shippable()
    pat = cp.pattern
    key_type = df.schema[pat.key].dataType
    w_ns = None if pat.window is None else int(pat.window.total_seconds() * 1e9)
    trailing_ids = _trailing_alt_ids(cp)
    ret_ns = _retention_w_ns(cp, w_ns)

    # watermarks require TIMESTAMP (tz-aware); the engine's event time is
    # tz-naive — reinterpret under the pinned UTC session timezone
    if isinstance(df.schema[pat.ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(pat.ts_col, df[pat.ts_col].cast(T.TimestampType()))
    # Watermark semantics: Spark advances the watermark from the rows
    # reaching the EventTimeWatermark node, and Catalyst pushes the
    # deterministic unary prefilter below it — so the effective
    # watermark tracks PATTERN-RELEVANT events (standard Spark
    # behavior).  Parity is stated against that watermark ("same input
    # stream and watermark").
    df = df.withWatermark(pat.ts_col, watermark)
    df = prefilter(df, cp, extra_cols=emit_cols if mode == "array" else ())

    if mode == "flat":
        out_schema = match_schema_flat(cp, key_type)
    else:
        out_schema = match_schema_array(pat, emit_cols, key_type)

    if strategy == "auto":
        # CEP_SPARK_STREAM_STRATEGY overrides the auto default — the
        # operational escape hatch for restarting a checkpoint written by
        # an older executor (the two strategies use different state
        # schemas; Spark refuses the mismatch loudly, and pinning
        # rematch here resumes a v1 checkpoint without code changes)
        import os as _os

        strategy = _os.environ.get("CEP_SPARK_STREAM_STRATEGY") or "incremental"
    if strategy not in ("incremental", "rematch"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "incremental":
        return _stream_incremental(df, cp, out_schema, mode, emit_cols, w_ns,
                                   cap=max_partials_per_state)
    if max_partials_per_state is not None:
        # the rematch executor's state is the event buffer, not partial
        # tables — the guard has nothing to bound there; fail loudly
        # rather than silently ignore the knob
        raise ValueError(
            "max_partials_per_state requires the incremental strategy"
        )

    state_schema = T.StructType(
        [
            T.StructField("buf", T.BinaryType()),
            T.StructField("pending", T.BinaryType()),
            T.StructField("last_emit_wm_ms", T.LongType()),
            T.StructField("late_dropped", T.LongType()),
        ]
    )
    fn = _make_rematch_fn(cp, mode, emit_cols, w_ns, trailing_ids, ret_ns)

    return df.groupBy(pat.key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _make_rematch_fn(cp: CompiledPattern, mode, emit_cols, w_ns, trailing_ids, ret_ns):
    """Per-key state function for the rematch executor (exposed for the
    fake-GroupState harness and the executor A/B microbench)."""
    pat = cp.pattern
    ts_col, tb_col = pat.ts_col, pat.tiebreak_col

    def fn(key, pdf_iter, state):
        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000
        if state.exists:
            buf_raw, pend_raw, last_emit_wm_ms, late_dropped = state.get
            buf = _de_buf(buf_raw) if buf_raw else None
            pend = _de_buf(pend_raw) if pend_raw else None
        else:
            buf, pend, last_emit_wm_ms, late_dropped = None, None, -1, 0
        lo_ns = last_emit_wm_ms * 1_000_000

        chunks = [] if state.hasTimedOut else list(pdf_iter)
        arrivals = pd.concat(chunks, ignore_index=True) if chunks else None
        if arrivals is not None and len(arrivals):
            a_ns = arrivals[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
            late = a_ns <= lo_ns
            if late.any():
                late_dropped += int(late.sum())
                arrivals = arrivals.loc[~late]
            if buf is None or not len(buf):
                buf = arrivals
            elif len(arrivals):
                buf = pd.concat([buf, arrivals], ignore_index=True)
        else:
            arrivals = None

        min_unsealed_ns = None
        if arrivals is not None and len(arrivals) and buf is not None and len(buf):
            # NEW EVENTS: rematch the buffer; emit the freshly-sealed
            # bracket; park not-yet-sealed matches as PENDING rows (with
            # their last-event-time) so timer wakeups below never rerun
            # the matcher — they just filter this table.
            g = buf.sort_values([ts_col, tb_col], kind="mergesort").reset_index(drop=True)
            ts_ns = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
            res = match_group_nfa(cp, g)
            sealed, pending = [], []
            for a, b in res:
                lts = _seal_ts_ns(b, ts_ns, a, trailing_ids, w_ns)
                if lo_ns < lts <= wm_ns:
                    sealed.append((a, b))
                elif lts > wm_ns:
                    pending.append((lts, a, b))
            if sealed:
                if mode == "flat":
                    yield matches_to_pdf_flat(cp, g, key[0], res=sealed)
                else:
                    yield matches_to_pdf_array(cp, g, key[0], emit_cols, res=sealed)
            if pending:
                min_unsealed_ns = min(x[0] for x in pending)
                # Park pending rows only while the table is small relative
                # to the buffer: for selective patterns (the common case)
                # timer wakeups then skip the matcher entirely; for
                # match-dense patterns the Arrow round trip of a huge
                # pending table costs more than the rematch, so store
                # nothing and let the timer branch fall back to rematch.
                if len(pending) <= max(4 * len(g), 256):
                    if mode == "flat":
                        pend = matches_to_pdf_flat(cp, g, key[0], res=[x[1:] for x in pending])
                    else:
                        pend = matches_to_pdf_array(
                            cp, g, key[0], emit_cols, res=[x[1:] for x in pending]
                        )
                    pend["__lts"] = np.array([x[0] for x in pending], dtype=np.int64)
                else:
                    pend = None
            else:
                pend = None
                pending = None
            if ret_ns is not None and wm_ns > 0:
                g = g.loc[ts_ns > wm_ns - ret_ns]
        elif buf is not None and len(buf):
            if pend is not None and len(pend):
                # TIMER WAKEUP with parked rows: emit the newly-sealed
                # bracket; no matcher run, no sort — O(pending) only.
                lts_arr = pend["__lts"].to_numpy()
                emit_mask = (lts_arr > lo_ns) & (lts_arr <= wm_ns)
                if emit_mask.any():
                    yield pend.loc[emit_mask].drop(columns="__lts")
                pend = pend.loc[~emit_mask & (lts_arr > wm_ns)]
                if not len(pend):
                    pend = None
                else:
                    min_unsealed_ns = int(pend["__lts"].min())
                g = buf
                ts_ns = None
            else:
                # TIMER WAKEUP, match-dense fallback: rematch the buffer
                g = buf.sort_values([ts_col, tb_col], kind="mergesort").reset_index(drop=True)
                ts_ns = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
                sealed = []
                for a, b in match_group_nfa(cp, g):
                    lts = _seal_ts_ns(b, ts_ns, a, trailing_ids, w_ns)
                    if lo_ns < lts <= wm_ns:
                        sealed.append((a, b))
                    elif lts > wm_ns and (min_unsealed_ns is None or lts < min_unsealed_ns):
                        min_unsealed_ns = lts
                if sealed:
                    if mode == "flat":
                        yield matches_to_pdf_flat(cp, g, key[0], res=sealed)
                    else:
                        yield matches_to_pdf_array(cp, g, key[0], emit_cols, res=sealed)
            if ret_ns is not None and wm_ns > 0:
                if ts_ns is None:
                    ts_ns = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
                g = g.loc[ts_ns > wm_ns - ret_ns]
        else:
            g = pd.DataFrame()
            pend = None

        if not len(g) and min_unsealed_ns is None:
            # drained key: free the state-store entry entirely (at
            # 10^12-turn scale a tombstone per finished conversation is
            # the difference between bounded and unbounded state).  A
            # later arrival for this key restarts from empty state and
            # its stale events are re-admitted only if still inside the
            # current watermark bracket — same contract as a new key.
            state.remove()
            return
        state.update(
            (
                _ser_buf(g) if len(g) else None,
                _ser_buf(pend) if pend is not None and len(pend) else None,
                max(wm_ms, last_emit_wm_ms),
                late_dropped,
            )
        )
        # Seal-driven timers (not a wakeup per watermark advance — at
        # 10^12-turn scale a global per-key no-data sweep each batch is
        # the difference between O(active keys) and O(all keys)):
        #   * pending unsealed match -> fire when the watermark can first
        #     seal it (ceil to ms, watermark granularity);
        #   * else a non-empty buffer with a window -> one cleanup fire
        #     after the window fully passes, so silent keys free their
        #     state-store entry;
        #   * else no timer — the next arrival re-triggers processing.
        timer = None
        if min_unsealed_ns is not None:
            timer = max(-(-min_unsealed_ns // 1_000_000), wm_ms + 1)
        elif len(g) and ret_ns is not None:
            timer = max(wm_ms + ret_ns // 1_000_000 + 1, 1)
        if timer is not None:
            state.setTimeoutTimestamp(timer)
        import os as _os

        if _os.environ.get("CEP_STREAM_DEBUG"):
            with open(_os.environ["CEP_STREAM_DEBUG"], "a") as _f:
                _f.write(
                    f"{key[0]} wm={wm_ms} lo={last_emit_wm_ms} timed_out={state.hasTimedOut} "
                    f"buf={len(g)} timer={timer}\n"
                )

    return fn


def _stream_incremental(df, cp: CompiledPattern, out_schema, mode, emit_cols, w_ns,
                        cap=None):
    """Incremental stateful executor (stream_matches strategy docstring).

    State per key:
      * ``buf``   — SEALED events (ts <= watermark) inside the retention
        horizon, in (ts, tiebreak) order; the attribute store for partial
        positions and negation candidates.
      * ``limbo`` — events above the watermark, unmatched (no sealed
        match can involve them; they advance the NFA when they seal).
      * ``parts`` — pickled per-(alt, state) partial tables, positions
        indexing ``buf``.
      * ``parked`` — accepted matches awaiting their trailing-negation
        seal (first.ts + window), stored as per-alternative partial
        tables; re-verified against freshly-sealed negation candidates
        only, emitted (or killed) by the batch whose watermark crosses
        the seal.
    Sealed arrivals sort strictly after the stored buffer (their ts is
    above the previous watermark, the buffer's below), so the advance is
    a pure append; buffer eviction is a sorted prefix, so stored
    positions re-base by a uniform shift.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    pat = cp.pattern
    state_schema = T.StructType(
        [
            T.StructField("buf", T.BinaryType()),
            T.StructField("limbo", T.BinaryType()),
            T.StructField("parts", T.BinaryType()),
            T.StructField("parked", T.BinaryType()),
            T.StructField("last_wm_ms", T.LongType()),
            T.StructField("late_dropped", T.LongType()),
            T.StructField("fellback", T.IntegerType()),
        ]
    )
    from .batch import _guard_drops_acc

    acc = _guard_drops_acc(df, cap)
    fn = _make_incremental_fn(cp, mode, emit_cols, w_ns, cap=cap, acc=acc)

    out = df.groupBy(pat.key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # dropped-partial count (None when the guard is off): read .value on
    # the driver, or hand it to CepMetricsListener(guard_drops=...) for
    # per-batch exposure + alerting
    out.guard_drops = acc
    return out


def _binding_of(p: "_Partials", j: int) -> dict:
    """Reconstruct a matcher binding from row j of a partial table.
    An empty kleene tuple means an Or_-branch variable no repetition
    chose (see _park_partials) — the matcher represents that as an
    ABSENT key, and flat emission turns it into NULL columns."""
    b = {v: int(p.scalar[v][j]) for v in p.scalar}
    for v in p.kleene:
        t = p.kleene[v][j]
        if len(t):
            b[v] = tuple(t)
    return b


def _park_partials(alt, bindings, ts_ns) -> "_Partials":
    """Pack accepted (not yet sealed) trailing-neg matches into a
    _Partials table so the parked set reuses the partial-table helpers
    (serialization, eviction shift, _edge_ok re-verification)."""
    kleene_vars = set(alt.kleene_vars)
    svars = [v for v in alt.var_order if v not in kleene_vars]
    kvars = [v for v in alt.var_order if v in kleene_vars]
    p = _Partials(svars, kvars)
    m = len(bindings)
    p.scalar = {
        v: np.fromiter((b[v] for b in bindings), dtype=np.int64, count=m)
        for v in svars
    }
    # b.get: an Or_-branch variable is ABSENT from bindings whose
    # repetitions all chose a sibling branch — park it as the empty
    # tuple (a real kleene bind is never empty; min one repetition),
    # _binding_of reconstructs the absence on unpark
    p.kleene = {v: _obj_array([b.get(v, ()) for b in bindings]) for v in kvars}
    firsts = np.empty(m, dtype=np.int64)
    lasts = np.empty(m, dtype=np.int64)
    for j, b in enumerate(bindings):
        pos = [
            x for vv in b.values()
            for x in (vv if isinstance(vv, tuple) else (vv,))
        ]
        firsts[j] = min(pos)
        lasts[j] = max(pos)
    p.first_pos = firsts
    p.last_pos = lasts
    p.first_ts = ts_ns[firsts]
    return p


def _make_incremental_fn(cp: CompiledPattern, mode, emit_cols, w_ns, cap=None,
                         acc=None):
    """Build the per-key state function for the incremental executor.
    Exposed separately so tests can drive it directly against a fake
    GroupState (fast randomized semantics checks without a Spark
    streaming query).

    ``cap``: per-state partial-table bound (advance_core's state guard)
    — bounds the state-store footprint of a hot key instead of letting
    it grow to the fallback threshold; dropped-oldest, warn-logged,
    opt-in (None = exact)."""
    from .batch import _edge_ok, _flush_guard_stats

    pat = cp.pattern
    ts_col, tb_col = pat.ts_col, pat.tiebreak_col
    trailing_ids = _trailing_alt_ids(cp)
    alts_by_id = {alt.alt_id: alt for alt in cp.alternatives}
    trail_specs = {
        alt.alt_id: [
            si for si, sp in enumerate(alt.negs) if sp.kind == "trailing"
        ]
        for alt in cp.alternatives
        if alt.alt_id in trailing_ids
    }

    def _ts_i8(pdf):
        return pdf[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)

    def _emit(g, key_val, res):
        if mode == "flat":
            return matches_to_pdf_flat(cp, g, key_val, res=res)
        return matches_to_pdf_array(cp, g, key_val, emit_cols, res=res)

    def fn(key, pdf_iter, state):
        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000
        if state.exists:
            (buf_raw, limbo_raw, parts_raw, parked_raw,
             last_wm_ms, late_dropped, fellback) = state.get
            sealed = _de_buf(buf_raw) if buf_raw else None
            limbo = _de_buf(limbo_raw) if limbo_raw else None
        else:
            sealed, limbo, parts_raw, parked_raw = None, None, None, None
            last_wm_ms, late_dropped, fellback = -1, 0, 0
        lo_ns = last_wm_ms * 1_000_000

        chunks = [] if state.hasTimedOut else list(pdf_iter)
        arrivals = pd.concat(chunks, ignore_index=True) if chunks else None
        if arrivals is not None and len(arrivals):
            a_ns = _ts_i8(arrivals)
            late = a_ns <= lo_ns
            if late.any():
                late_dropped += int(late.sum())
                arrivals = arrivals.loc[~late]
            if len(arrivals):
                limbo = (
                    arrivals
                    if limbo is None or not len(limbo)
                    else pd.concat([limbo, arrivals], ignore_index=True)
                )

        # move limbo events at or below the watermark into the sealed buffer
        n_new = 0
        if limbo is not None and len(limbo):
            l_ns = _ts_i8(limbo)
            seal_mask = l_ns <= wm_ns
            if seal_mask.any():
                fresh = limbo.loc[seal_mask].sort_values(
                    [ts_col, tb_col], kind="mergesort"
                )
                limbo = limbo.loc[~seal_mask]
                n_new = len(fresh)
                sealed = (
                    fresh
                    if sealed is None or not len(sealed)
                    else pd.concat([sealed, fresh], ignore_index=True)
                )
            if not len(limbo):
                limbo = None

        tables = {}
        parked = {}
        min_parked_seal = None
        if fellback:
            # per-key rematch fallback (partial set outgrew the buffer):
            # matcher over everything retained, emission by seal bracket.
            # sealed/limbo stay SPLIT at the watermark: the limbo side
            # drives the sealing timer (a pending match's seal is the ts
            # of one of its limbo events), without which an
            # unbounded-window key would never wake to emit.  Parked
            # matches are discarded on fallback — the rematch re-derives
            # them every batch (trailing checks included) and emits them
            # in the same seal bracket.  Trailing-pending matches whose
            # events are ALL sealed have no limbo event to wake on, so
            # their min seal drives an explicit timer (min_parked_seal).
            allb = [x for x in (sealed, limbo) if x is not None and len(x)]
            if allb:
                g = pd.concat(allb, ignore_index=True).sort_values(
                    [ts_col, tb_col], kind="mergesort"
                ).reset_index(drop=True)
                ts_ns = _ts_i8(g)
                res = []
                fb_stats = {}
                for a, b in match_group_nfa(cp, g, cap=cap, stats=fb_stats):
                    lts = _seal_ts_ns(b, ts_ns, a, trailing_ids, w_ns)
                    if lo_ns < lts <= wm_ns:
                        res.append((a, b))
                    elif lts > wm_ns and a in trailing_ids and (
                        min_parked_seal is None or lts < min_parked_seal
                    ):
                        min_parked_seal = lts
                _flush_guard_stats(fb_stats, acc)
                if res:
                    yield _emit(g, key[0], res)
                if w_ns is not None and wm_ns > 0:
                    keep = ts_ns > wm_ns - w_ns
                    g = g.loc[keep].reset_index(drop=True)
                    ts_ns = ts_ns[keep]
                if len(g):
                    below = ts_ns <= wm_ns
                    sealed = g.loc[below] if below.any() else None
                    limbo = g.loc[~below] if (~below).any() else None
                else:
                    sealed = limbo = None
            parts_out = None
        else:
            tables = _de_tables(parts_raw)
            parked = _de_tables(parked_raw)
            res = []
            g = sealed.reset_index(drop=True) if sealed is not None else None
            sealed = g
            if n_new:
                store = _ColStore(g)
                ts_ns = _ts_i8(g)
                start = len(g) - n_new
                # slot masks only over the new suffix (negation masks are
                # full-range) — per-batch mask cost is O(new events)
                masks = unary_masks(cp, store._cols, len(g), start=start)
                stats = {}
                res, tables = advance_core(
                    cp, store, ts_ns, masks,
                    tables_in=tables or None, start=start,
                    cap=cap, stats=stats,
                )
                _flush_guard_stats(stats, acc)
                # re-verify parked matches against ONLY the freshly-
                # sealed trailing-negation candidates (earlier sealed
                # candidates were checked at accept / prior batches;
                # later ones are above the watermark and cannot belong
                # to a parked match's look-ahead once it seals)
                if parked:
                    for alt_id in list(parked):
                        p = parked[alt_id].get(0)
                        if p is None or len(p) == 0:
                            del parked[alt_id]
                            continue
                        alt = alts_by_id[alt_id]
                        _, neg_mask = masks[alt_id]
                        ok = np.ones(len(p), dtype=bool)
                        for si in trail_specs[alt_id]:
                            fresh_pos = np.nonzero(neg_mask[si][start:])[0] + start
                            if len(fresh_pos):
                                ok &= _edge_ok(
                                    fresh_pos, alt.negs[si], store, p,
                                    ts_ns, w_ns, leading=False,
                                )
                        if not ok.all():
                            p = p.select(ok)
                        if len(p):
                            parked[alt_id] = {0: p}
                        else:
                            del parked[alt_id]
                # split fresh accepts: trailing matches whose look-ahead
                # is still open get parked; everything else emits now
                if res and trailing_ids:
                    now = []
                    to_park: dict = {}
                    for a, b in res:
                        if a in trailing_ids:
                            pos = [
                                x for vv in b.values()
                                for x in (vv if isinstance(vv, tuple) else (vv,))
                            ]
                            seal = int(ts_ns[min(pos)]) + w_ns
                            if seal <= wm_ns:
                                now.append((a, b))
                            else:
                                to_park.setdefault(a, []).append(b)
                        else:
                            now.append((a, b))
                    for a, blist in to_park.items():
                        newp = _park_partials(alts_by_id[a], blist, ts_ns)
                        old = parked.get(a, {}).get(0)
                        if old is not None and len(old):
                            old.extend(newp)
                        else:
                            parked[a] = {0: newp}
                    res = now
            # emit parked matches whose seal the watermark just crossed
            # (survivors of every fresh-candidate check — their whole
            # look-ahead is sealed now, so the verdict is final)
            if parked:
                for alt_id in list(parked):
                    p = parked[alt_id][0]
                    seal_arr = p.first_ts + w_ns
                    emit_mask = (seal_arr > lo_ns) & (seal_arr <= wm_ns)
                    if emit_mask.any():
                        sel = p.select(emit_mask)
                        res.extend(
                            (alt_id, _binding_of(sel, j)) for j in range(len(sel))
                        )
                        p = p.select(~emit_mask)
                    if len(p):
                        parked[alt_id] = {0: p}
                        m = int((p.first_ts + w_ns).min())
                        if min_parked_seal is None or m < min_parked_seal:
                            min_parked_seal = m
                    else:
                        del parked[alt_id]
            if res:
                yield _emit(g, key[0], res)
            # prune dead partials, then evict the buffer prefix and
            # re-base stored positions (order matters: the prune bound
            # first_ts > wm - W guarantees no live partial — or parked
            # match (its seal first_ts + W > wm) — references an
            # evicted row)
            if w_ns is not None and wm_ns > 0:
                _prune_tables(tables, wm_ns - w_ns)
                if sealed is not None and len(sealed):
                    keep = _ts_i8(sealed) > wm_ns - w_ns
                    off = int((~keep).sum())
                    if off:
                        sealed = sealed.loc[keep].reset_index(drop=True)
                        _shift_tables(tables, off)
                        _shift_tables(parked, off)
                        if not len(sealed):
                            sealed = None
            nrows = _tables_rows(tables)
            buflen = (len(sealed) if sealed is not None else 0) + (
                len(limbo) if limbo is not None else 0
            )
            if nrows > max(256, 8 * buflen):
                fellback = 1
                parts_out = None
                parked = {}  # the rematch fallback re-derives pending matches
                min_parked_seal = None
            else:
                parts_out = _ser_tables(tables)

        parked_out = _ser_tables(parked) if parked else None
        has_buf = sealed is not None and len(sealed)
        has_limbo = limbo is not None and len(limbo)
        if (not has_buf and not has_limbo and parts_out is None
                and parked_out is None and min_parked_seal is None):
            state.remove()
            return
        state.update(
            (
                _ser_buf(sealed) if has_buf else None,
                _ser_buf(limbo) if has_limbo else None,
                parts_out,
                parked_out,
                max(wm_ms, last_wm_ms),
                late_dropped,
                fellback,
            )
        )
        # timers: wake at the earliest of (first limbo event seals,
        # first parked match seals); else one cleanup fire after the
        # window passes so silent keys free state
        timer = None
        if has_limbo:
            min_limbo = int(_ts_i8(limbo).min())
            timer = max(-(-min_limbo // 1_000_000), wm_ms + 1)
        if min_parked_seal is not None:
            t2 = max(-(-min_parked_seal // 1_000_000), wm_ms + 1)
            timer = t2 if timer is None else min(timer, t2)
        if timer is None and (has_buf or parts_out is not None) and w_ns is not None:
            timer = max(wm_ms + w_ns // 1_000_000 + 1, 1)
        if timer is not None:
            state.setTimeoutTimestamp(timer)

    return fn


def run_stream(
    spark,
    source_dir: str,
    cp: CompiledPattern,
    watermark: str,
    schema=None,
    mode: str = "flat",
    emit_cols=("turn_idx", "role", "tool", "ts"),
    max_files_per_trigger: int | None = 1,
    strategy: str = "auto",
):
    """readStream a parquet directory -> streaming match DataFrame.

    The parquet-dir source stands in for the BASELINE's Iceberg stream
    (the Iceberg runtime jar is unavailable offline); the source is
    behind this one call site so Iceberg drops in:
    ``spark.readStream.format("iceberg").load(table)``.
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.schema(spark.read.parquet(source_dir).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    return stream_matches(df, cp, watermark, mode=mode, emit_cols=emit_cols,
                          strategy=strategy)


def stream_matches_multi(df, cps, watermark: str,
                         emit_cols=("turn_idx", "role", "tool", "ts"),
                         strategy: str = "auto", max_partials_per_state=None,
                         window_bucket_spread: float | None = 16.0):
    """Streaming multi-pattern execution (reference `CEP(patterns=[...])`,
    SURVEY.md §2.3 E7): ONE keyed state stream runs every compiled
    pattern — one watermark, one shuffle, one event buffer per key
    (retention = the LARGEST pattern window).  Each pattern uses the
    incremental executor (persisted partial tables, advance over
    newly-sealed events; trailing negations handled by PARKING accepted
    matches until their first.ts + window seal, exactly like the
    single-pattern executor) unless its partial set outgrew the buffer
    (per-pattern rematch fallback, tracked as a state bitmask).  Output
    is the array schema with ``pattern_id``.

    ``strategy``: ``"auto"`` — per-pattern incremental-with-fallback,
    overridable via $CEP_SPARK_STREAM_STRATEGY (rematch / incremental /
    shared — the single-pattern surface's operational escape hatch;
    explicit arguments are never overridden); ``"rematch"`` — force
    EVERY pattern onto the rematch path (e.g. restarting a checkpoint
    written before the incremental executor existed);
    ``"incremental"`` — same as auto's default (kept for symmetry with
    the single-pattern surface); ``"shared"`` — merge the patterns into
    prefix-shared automata, ONE per connected component
    (merge.merge_components; windows may differ — max-window pruning
    with exact per-tag span re-checks): shared prefix states live ONCE
    in the state store and advance once per sealed event, acceptance is
    per tag, and trailing-neg parking / rematch fallback apply per
    COMPONENT.  The persisted partial tables of
    ``"shared"`` describe the merged automaton — switching an existing
    checkpoint between ``"shared"`` and the per-pattern strategies is
    detected via a format marker and fails loudly; start a fresh
    checkpoint to migrate (the exactly-once sink keeps replays
    idempotent).

    ``max_partials_per_state`` (opt-in hot-key guard, default None=exact):
    per-pattern per-NFA-state bound on the persisted partial tables AND
    on the in-flight matcher tables of per-pattern rematch fallbacks —
    oldest partials dropped deterministically, loss-only, warn-logged
    (batch.advance_core).  Rejected with strategy='rematch' (that
    executor's state is the event buffer; the guard bounds nothing).
    Under strategy='shared' the bound applies per MERGED state — a
    shared prefix state's table serves every tagged pattern, so the cap
    bounds their combined partials once rather than N times.

    ``window_bucket_spread`` (shared strategy only, default 16.0):
    before merging, patterns are bucketed so a bucket's retention
    windows span at most this factor — mixed-window sharing is exact
    but retains shared-prefix partials to the bucket MAX window, so an
    extreme spread (1h rule merged with a 7-day rule) would inflate the
    short rule's state up to W_max/W_tag.  The default caps that at
    16x; pass None to merge regardless of spread (pre-round-5
    behavior).  Changing the value re-partitions components — the state
    fingerprint refuses stale checkpoints loudly.
    """
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ._serde import ensure_shippable
    from .batch import prefilter_multi

    ensure_shippable()
    if not cps:
        raise ValueError("no patterns")
    p0 = cps[0].pattern
    for cp in cps[1:]:
        p = cp.pattern
        if (p.key, p.ts_col, p.tiebreak_col) != (p0.key, p0.ts_col, p0.tiebreak_col):
            raise ValueError("patterns must share key/ts/tiebreak columns")
    ids = [cp.pattern.pattern_id for cp in cps]
    if len(set(ids)) != len(ids):
        raise ValueError(f"pattern_id values must be distinct, got {ids}")
    key_type = df.schema[p0.key].dataType
    windows = [cp.pattern.window for cp in cps]
    w_ns_of = [
        None if w is None else int(w.total_seconds() * 1e9) for w in windows
    ]
    trailing_of = [_trailing_alt_ids(cp) for cp in cps]
    rets = [_retention_w_ns(cp, wn) for cp, wn in zip(cps, w_ns_of)]
    w_ns = None if any(r is None for r in rets) else max(rets)

    if strategy not in ("auto", "rematch", "incremental", "shared"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        # the same operational escape hatch as the single-pattern path:
        # CEP_SPARK_STREAM_STRATEGY pins the executor for an existing
        # checkpoint without code changes (e.g. rematch for pre-v2
        # state, or shared to opt a fleet in); explicit strategy=
        # arguments are never overridden
        import os as _os

        env = _os.environ.get("CEP_SPARK_STREAM_STRATEGY")
        if env and env not in ("rematch", "incremental", "shared"):
            # a typo in the restart-pin env var must fail loudly, not
            # silently run the wrong executor (matches the single-pattern
            # path, which routes the env value through the same check)
            raise ValueError(
                f"unknown CEP_SPARK_STREAM_STRATEGY {env!r} (expected "
                "rematch / incremental / shared)"
            )
        strategy = env or "incremental"
    force_rematch = strategy == "rematch"
    if force_rematch and max_partials_per_state is not None:
        raise ValueError(
            "max_partials_per_state requires the incremental strategy"
        )
    merged = None
    if strategy == "shared":
        from .merge import merge_components_bucketed, mergeable

        if not mergeable(cps):
            raise ValueError(
                "strategy='shared' requires identical key/ts/tiebreak "
                "columns across patterns (windows may differ — the merge "
                "runs under the max window with per-tag span re-checks)"
            )
        # one merged automaton per CONNECTED COMPONENT: an exploding
        # rule's rematch fallback then only drags rules it actually
        # shares state with (per-unit fellback bits below).  Components
        # are additionally split by window decade (window_bucket_spread)
        # so sharing never inflates a short rule's retained state past
        # that factor.
        merged = merge_components_bucketed(
            cps, rets, max_spread=window_bucket_spread
        )

    if isinstance(df.schema[p0.ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(p0.ts_col, df[p0.ts_col].cast(T.TimestampType()))
    df = df.withWatermark(p0.ts_col, watermark)
    df = prefilter_multi(df, cps, extra_cols=emit_cols)

    out_schema = match_schema_array(p0, emit_cols, key_type)
    state_schema = T.StructType(
        [
            T.StructField("buf", T.BinaryType()),
            T.StructField("limbo", T.BinaryType()),
            T.StructField("parts", T.BinaryType()),
            T.StructField("parked", T.BinaryType()),  # {ci: parked tables}
            T.StructField("last_emit_wm_ms", T.LongType()),
            T.StructField("late_dropped", T.LongType()),
            T.StructField("fellback", T.LongType()),  # per-pattern bitmask
            # strategy/format indicator, written UNCONDITIONALLY on every
            # update and validated on every restore: the fellback bitmask
            # and partial tables are meaningless under the other layout
            # (shared = one merged unit, per-pattern = one bit/dict entry
            # per pattern), and a shared run that fell back to rematch
            # persists fellback=1 with NO tables — without this column a
            # per-pattern restart would silently reinterpret that state.
            T.StructField("fmt", T.StringType()),
        ]
    )
    from .batch import _guard_drops_acc

    acc = _guard_drops_acc(df, max_partials_per_state)
    fn = _make_multi_fn(cps, emit_cols, w_ns_of, trailing_of, w_ns,
                        force_rematch=force_rematch,
                        cap=max_partials_per_state, merged=merged, acc=acc)

    out = df.groupBy(p0.key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # dropped-partial count (None when the guard is off) — same contract
    # as run_batch_multi; feed to CepMetricsListener(guard_drops=...)
    out.guard_drops = acc
    return out


def _cond_fp(cond):
    """Canonical token for one condition in the family fingerprint.

    Uses the same ``cond.sql()`` faithfulness contract that backs the
    unary-mask cache and merge signatures; conditions with no SQL
    lowering (UserPred) fall back to a structural token — name + arg
    refs — which is deterministic across processes (never ``repr(fn)``,
    whose address changes per run)."""
    try:
        return cond.sql({v: v for v in cond.vars()})
    except NotImplementedError:
        return (
            "nosql",
            type(cond).__name__,
            getattr(cond, "name", ""),
            tuple(sorted(cond.vars())),
            tuple(sorted(cond.cols())),
        )


def _pattern_fp(cp, w_ns):
    """Structural fingerprint of one compiled pattern: slots (with
    group/kleene shape), negation specs, variable order, window.
    Transitions/states derive deterministically from these at compile
    time, so slot structure suffices for identity."""
    pat = cp.pattern
    alts = []
    for alt in cp.alternatives:
        slots = tuple(
            (s.sid, s.var, _cond_fp(s.unary), s.kleene, s.kleene_max,
             tuple(sorted(s.prereq)),
             None if s.adjacent is None else _cond_fp(s.adjacent),
             s.group, s.grp_idx, s.grp_kind)
            # multi-event Or_ branches extend the tuple (round 5,
            # session 2) — appended conditionally so fingerprints of
            # branch-free families (all existing checkpoints) are
            # unchanged
            + ((s.br, s.br_idx, s.br_len) if s.br_len > 1 else ())
            # conjunctive (And_) position members (round 5, session 6)
            # — appended conditionally so fingerprints of pos_all-free
            # families (all existing checkpoints) are unchanged
            + ((("A", s.br),) if s.pos_all else ())
            # Or_-member unit ownership (session 9) — same conditional
            # rule: mem-free families keep their fingerprints
            + ((("O", s.mem),) if s.mem is not None else ())
            # unbounded nested Kleene position (session 16) — same
            # conditional rule: loop-free families keep their
            # fingerprints (continue transitions derive from this flag
            # at compile time)
            + (("K",) if s.grp_loop else ())
            for s in alt.slots
        )
        negs = tuple(
            (sp.var, _cond_fp(sp.unary),
             tuple(_cond_fp(c) for c in sp.multi), sp.kind,
             tuple(sorted(sp.post_slots)), sp.per_repeat, sp.repeat_only,
             tuple(sp.pre_vars))
            # branch gate (round 5 trailing-in-branch Negs) — appended
            # conditionally so fingerprints of guard-free families (all
            # existing checkpoints) are unchanged
            + ((tuple(sp.br_guard),) if sp.br_guard else ())
            # member-scoped gap (session 8) — same conditional rule
            + (("M",) if sp.mem_gap else ())
            # leading member gap (per-transition boundary override) —
            # same conditional rule; the override itself derives from
            # slots + this flag at compile time
            + (("L",) if sp.mem_lead else ())
            for sp in alt.negs
        )
        alts.append((alt.alt_id, slots, negs, tuple(alt.var_order)))
    return (pat.key, pat.ts_col, pat.tiebreak_col, w_ns, tuple(alts))


def _family_fp(cps, w_ns_of, unit_pats) -> str:
    """12-hex fingerprint of the whole pattern family INCLUDING the
    per-component partition and pattern order — persisted state keys
    partial tables by component index and merged-state sids, so an
    edited or reordered pattern list must refuse a stale checkpoint
    loudly (ADVICE r4) instead of restoring tables against a different
    automaton."""
    import hashlib

    fam = tuple(
        tuple(_pattern_fp(cps[gi], w_ns_of[gi]) for gi in idxs)
        for idxs in unit_pats
    )
    return hashlib.md5(repr(fam).encode()).hexdigest()[:12]


def _make_multi_fn(cps, emit_cols, w_ns_of, trailing_of, w_ns,
                   force_rematch: bool = False, cap=None, merged=None,
                   acc=None):
    """Per-key state function for multi-pattern streaming (exposed for
    the fake-GroupState property harness, like _make_incremental_fn).

    ``cap``: per-pattern per-NFA-state partial-table bound
    (advance_core's state guard) — see stream_matches_multi.

    ``merged`` (strategy='shared'): the merge.merge_compiled automaton.
    The loop then runs ONE execution unit whose advance emissions carry
    tag keys ``(pattern_index, alt_id)`` instead of plain alt ids; the
    per-unit lookup tables below (trailing set, alt objects, trailing
    neg-spec indices) are keyed accordingly, and the parked-match
    re-verification evaluates the ORIGINAL patterns' negation masks
    (parked bindings carry original variable names) — the shared
    predicate-mask cache makes those evaluations hits, not re-work."""
    from .batch import _edge_ok, _flush_guard_stats
    p0 = cps[0].pattern
    ts_col, tb_col = p0.ts_col, p0.tiebreak_col
    merged_mode = merged is not None
    # v2: shared state is keyed by CONNECTED-COMPONENT index
    # (merge_components) instead of one whole-family unit — v1 shared
    # checkpoints refuse loudly on restore
    _SHARED_FMT = "shared-v2"
    _PERPAT_FMT = "perpat-v1"
    my_fmt = _SHARED_FMT if merged_mode else _PERPAT_FMT
    # strategy='rematch' pins every pattern (checkpoint compatibility);
    # trailing negations ride the incremental path via parked matches
    # (single-pattern parity — _make_incremental_fn)
    alts_of = [{alt.alt_id: alt for alt in cp.alternatives} for cp in cps]
    trail_specs_of = [
        {
            alt.alt_id: [
                si for si, sp in enumerate(alt.negs) if sp.kind == "trailing"
            ]
            for alt in cp.alternatives
            if alt.alt_id in trailing_of[ci]
        }
        for ci, cp in enumerate(cps)
    ]
    if merged_mode:
        # ``merged``: list of (merged_cp, global pattern idxs) —
        # merge_components units — or a single merged CompiledPattern
        # covering all patterns (legacy callers / whole-family merge).
        # One execution unit (run_cps entry, fellback bit, parts slot)
        # per component; tag pattern indices inside a unit are LOCAL
        # and unit_pats maps them back to global.
        units = (
            merged if isinstance(merged, list)
            else [(merged, list(range(len(cps))))]
        )
        run_cps = [mc for mc, _ in units]
        unit_pats = [idxs for _, idxs in units]
        # per-unit PRUNING horizon = the component's max window
        # (None = unbounded wins); per-TAG window math (seal instants,
        # park deadlines, edge-neg intervals) uses tag_w below
        unit_w_ns = [
            None if any(w_ns_of[i] is None for i in idxs)
            else max(w_ns_of[i] for i in idxs)
            for idxs in unit_pats
        ]
        unit_trailing = [
            frozenset(
                (li, aid)
                for li, gi in enumerate(idxs) for aid in trailing_of[gi]
            )
            for idxs in unit_pats
        ]
        unit_alts = [
            {
                (li, alt.alt_id): alt
                for li, gi in enumerate(idxs)
                for alt in cps[gi].alternatives
            }
            for idxs in unit_pats
        ]
        unit_trail_specs = [
            {
                (li, aid): specs
                for li, gi in enumerate(idxs)
                for aid, specs in trail_specs_of[gi].items()
            }
            for idxs in unit_pats
        ]
    else:
        run_cps = cps
        unit_pats = [[i] for i in range(len(cps))]
        unit_w_ns = w_ns_of
        unit_trailing = trailing_of
        unit_alts = alts_of
        unit_trail_specs = trail_specs_of
    static_rematch = (1 << len(run_cps)) - 1 if force_rematch else 0

    # fmt = <strategy layout>:<family fingerprint> — both validated on
    # every restore.  The fingerprint covers pattern structure, windows,
    # order, AND the component partition, so restarting a checkpoint
    # with an edited/reordered pattern list (which reshuffles
    # merge_components' partition and the component-index state keys)
    # refuses loudly instead of restoring partial tables against a
    # different automaton.
    my_fmt = f"{my_fmt}:{_family_fp(cps, w_ns_of, unit_pats)}"

    if merged_mode:
        # per-tag window: merged alt ids are (LOCAL pattern idx, alt_id)
        def tag_w(ci, alt_id):
            return w_ns_of[unit_pats[ci][alt_id[0]]]
    else:
        def tag_w(ci, alt_id):
            return unit_w_ns[ci]

    def fn(key, pdf_iter, state):
        import pickle

        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000
        if state.exists:
            (buf_raw, limbo_raw, parts_raw, parked_raw,
             last_emit_wm_ms, late_dropped, fellback, fmt) = state.get
            # validate on EVERY restore, not only when partial tables
            # exist: a shared run whose merged unit fell back to rematch
            # persists fellback=1 with no tables — reinterpreting that
            # bitmask per-pattern would silently drop matches.
            if fmt != my_fmt:
                same_layout = (
                    isinstance(fmt, str)
                    and fmt.split(":", 1)[0] == my_fmt.split(":", 1)[0]
                )
                if same_layout:
                    raise RuntimeError(
                        f"state store fingerprint {fmt!r} does not match "
                        f"this query's pattern family {my_fmt!r}: the "
                        "pattern list was edited or reordered since the "
                        "checkpoint was written (persisted partial tables "
                        "are keyed by component index and merged-state "
                        "sids); restart from a fresh checkpoint"
                    )
                raise RuntimeError(
                    f"state store was written by strategy layout "
                    f"{fmt!r} but this query runs {my_fmt!r} "
                    f"({'shared merged-automaton' if merged_mode else 'per-pattern'}); "
                    "restart from a fresh checkpoint to switch strategies"
                )
            sealed = _de_buf(buf_raw) if buf_raw else None
            limbo = _de_buf(limbo_raw) if limbo_raw else None
            parts = pickle.loads(parts_raw) if parts_raw else {}
            parked_by_ci = pickle.loads(parked_raw) if parked_raw else {}
        else:
            sealed, limbo, parts, parked_by_ci = None, None, {}, {}
            last_emit_wm_ms, late_dropped, fellback = -1, 0, 0
        lo_ns = last_emit_wm_ms * 1_000_000
        rematch_mask = static_rematch | fellback

        def ts_i8(pdf):
            return pdf[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)

        chunks = [] if state.hasTimedOut else list(pdf_iter)
        arrivals = pd.concat(chunks, ignore_index=True) if chunks else None
        if arrivals is not None and len(arrivals):
            a_ns = ts_i8(arrivals)
            late = a_ns <= lo_ns
            if late.any():
                late_dropped += int(late.sum())
                arrivals = arrivals.loc[~late]
            if len(arrivals):
                limbo = (
                    arrivals if limbo is None or not len(limbo)
                    else pd.concat([limbo, arrivals], ignore_index=True)
                )

        n_new = 0
        if limbo is not None and len(limbo):
            l_ns = ts_i8(limbo)
            seal_mask = l_ns <= wm_ns
            if seal_mask.any():
                fresh = limbo.loc[seal_mask].sort_values([ts_col, tb_col], kind="mergesort")
                limbo = limbo.loc[~seal_mask]
                n_new = len(fresh)
                sealed = (
                    fresh if sealed is None or not len(sealed)
                    else pd.concat([sealed, fresh], ignore_index=True)
                )
            if not len(limbo):
                limbo = None

        min_unsealed_ns = None
        outs = []
        g_sealed = sealed.reset_index(drop=True) if sealed is not None else None
        sealed = g_sealed
        store = ts_s = masks = None
        g_all = ts_all = None
        tables_out = {}
        parked_out_by_ci = {}
        mask_cache = {}  # shared predicate masks across patterns, per batch
        orig_masks_cache = {}

        def unit_rows(g, res, ci):
            # merged emissions are tagged (LOCAL pattern idx, alt_id):
            # regroup per original (global) pattern for row building
            if not merged_mode:
                return None  # caller uses its own cp directly
            by: dict = {}
            for (li, aid), b in res:
                by.setdefault(unit_pats[ci][li], []).append((aid, b))
            return pd.concat(
                [
                    matches_to_pdf_array(cps[gi], g, key[0], emit_cols, res=lst)
                    for gi, lst in by.items()
                ],
                ignore_index=True,
            )

        for ci, cp in enumerate(run_cps):
            if rematch_mask & (1 << ci):
                if g_all is None:
                    allb = [x for x in (sealed, limbo) if x is not None and len(x)]
                    if not allb:
                        continue
                    g_all = pd.concat(allb, ignore_index=True).sort_values(
                        [ts_col, tb_col], kind="mergesort"
                    ).reset_index(drop=True)
                    ts_all = ts_i8(g_all)
                res_sealed = []
                fb_stats = {}
                for a, b in match_group_nfa(cp, g_all, cap=cap, stats=fb_stats):
                    lts = _seal_ts_ns(b, ts_all, a, unit_trailing[ci], tag_w(ci, a))
                    if lo_ns < lts <= wm_ns:
                        res_sealed.append((a, b))
                    elif lts > wm_ns and (min_unsealed_ns is None or lts < min_unsealed_ns):
                        min_unsealed_ns = lts
                _flush_guard_stats(fb_stats, acc)
                if res_sealed:
                    outs.append(
                        unit_rows(g_all, res_sealed, ci) if merged_mode
                        else matches_to_pdf_array(cp, g_all, key[0], emit_cols, res=res_sealed)
                    )
            else:
                tables = _de_tables(parts.get(ci))
                parked = _de_tables(parked_by_ci.get(ci))
                res = []
                if n_new and g_sealed is not None:
                    if store is None:
                        store = _ColStore(g_sealed)
                        ts_s = ts_i8(g_sealed)
                    start = len(g_sealed) - n_new
                    masks_ci = unary_masks(cp, store._cols, len(g_sealed),
                                           start=start, cache=mask_cache)
                    stats = {}
                    res, tables = advance_core(
                        cp, store, ts_s, masks_ci,
                        tables_in=tables or None, start=start,
                        cap=cap, stats=stats,
                    )
                    _flush_guard_stats(stats, acc)
                    # re-verify parked matches against ONLY the freshly-
                    # sealed trailing-negation candidates (single-pattern
                    # executor parity — _make_incremental_fn)
                    if parked:
                        for alt_id in list(parked):
                            p = parked[alt_id].get(0)
                            if p is None or len(p) == 0:
                                del parked[alt_id]
                                continue
                            alt = unit_alts[ci][alt_id]
                            if merged_mode:
                                # parked bindings use ORIGINAL var names:
                                # evaluate the original pattern's neg
                                # masks (cache-shared with the merged
                                # automaton's identical predicates)
                                gi = unit_pats[ci][alt_id[0]]
                                if gi not in orig_masks_cache:
                                    orig_masks_cache[gi] = unary_masks(
                                        cps[gi], store._cols, len(g_sealed),
                                        start=start, cache=mask_cache,
                                    )
                                _, neg_mask = orig_masks_cache[gi][alt_id[1]]
                            else:
                                _, neg_mask = masks_ci[alt_id]
                            ok = np.ones(len(p), dtype=bool)
                            for si in unit_trail_specs[ci][alt_id]:
                                fresh_pos = np.nonzero(neg_mask[si][start:])[0] + start
                                if len(fresh_pos):
                                    ok &= _edge_ok(
                                        fresh_pos, alt.negs[si], store, p,
                                        ts_s, tag_w(ci, alt_id), leading=False,
                                    )
                            if not ok.all():
                                p = p.select(ok)
                            if len(p):
                                parked[alt_id] = {0: p}
                            else:
                                del parked[alt_id]
                    # split fresh accepts: trailing matches whose look-
                    # ahead is still open get parked; the rest emit now
                    if res and unit_trailing[ci]:
                        now = []
                        to_park: dict = {}
                        for a, b in res:
                            if a in unit_trailing[ci]:
                                pos = [
                                    x for vv in b.values()
                                    for x in (vv if isinstance(vv, tuple) else (vv,))
                                ]
                                seal = int(ts_s[min(pos)]) + tag_w(ci, a)
                                if seal <= wm_ns:
                                    now.append((a, b))
                                else:
                                    to_park.setdefault(a, []).append(b)
                            else:
                                now.append((a, b))
                        for a, blist in to_park.items():
                            newp = _park_partials(unit_alts[ci][a], blist, ts_s)
                            old = parked.get(a, {}).get(0)
                            if old is not None and len(old):
                                old.extend(newp)
                            else:
                                parked[a] = {0: newp}
                        res = now
                # emit parked matches whose seal the watermark crossed
                if parked:
                    for alt_id in list(parked):
                        p = parked[alt_id][0]
                        seal_arr = p.first_ts + tag_w(ci, alt_id)
                        emit_mask = (seal_arr > lo_ns) & (seal_arr <= wm_ns)
                        if emit_mask.any():
                            sel = p.select(emit_mask)
                            res.extend(
                                (alt_id, _binding_of(sel, j)) for j in range(len(sel))
                            )
                            p = p.select(~emit_mask)
                        if len(p):
                            parked[alt_id] = {0: p}
                            m = int((p.first_ts + tag_w(ci, alt_id)).min())
                            if min_unsealed_ns is None or m < min_unsealed_ns:
                                min_unsealed_ns = m
                        else:
                            del parked[alt_id]
                if res:
                    outs.append(
                        unit_rows(g_sealed, res, ci) if merged_mode
                        else matches_to_pdf_array(cp, g_sealed, key[0], emit_cols, res=res)
                    )
                tables_out[ci] = tables
                if parked:
                    parked_out_by_ci[ci] = parked
        if outs:
            yield pd.concat(outs, ignore_index=True)

        # prune per-pattern partials; evict at the SHARED max-retention
        # horizon; shift positions by the shared prefix offset
        if w_ns is not None and wm_ns > 0:
            for ci, tables in tables_out.items():
                if unit_w_ns[ci] is not None:
                    _prune_tables(tables, wm_ns - unit_w_ns[ci])
            if sealed is not None and len(sealed):
                keep = ts_i8(sealed) > wm_ns - w_ns
                off = int((~keep).sum())
                if off:
                    sealed = sealed.loc[keep].reset_index(drop=True)
                    for tables in tables_out.values():
                        _shift_tables(tables, off)
                    # parked rows survive eviction by construction: seal
                    # first_ts + W_ci > wm ⇒ first_ts > wm - W_ci ≥ wm - w_ns
                    for parked in parked_out_by_ci.values():
                        _shift_tables(parked, off)
                    if not len(sealed):
                        sealed = None
            if limbo is not None and len(limbo):
                keepl = ts_i8(limbo) > wm_ns - w_ns
                if not keepl.all():
                    limbo = limbo.loc[keepl]
                    if not len(limbo):
                        limbo = None

        buflen = (len(sealed) if sealed is not None else 0) + (
            len(limbo) if limbo is not None else 0
        )
        parts_out = {}
        for ci, tables in tables_out.items():
            if _tables_rows(tables) > max(256, 8 * buflen):
                fellback |= 1 << ci
                # the rematch fallback re-derives pending trailing
                # matches every batch — drop this pattern's parked set
                parked_out_by_ci.pop(ci, None)
            else:
                raw = _ser_tables(tables)
                if raw is not None:
                    parts_out[ci] = raw
        parked_ser = {}
        for ci, parked in parked_out_by_ci.items():
            raw = _ser_tables(parked)
            if raw is not None:
                parked_ser[ci] = raw

        has_buf = sealed is not None and len(sealed)
        has_limbo = limbo is not None and len(limbo)
        if (not has_buf and not has_limbo and not parts_out
                and not parked_ser and min_unsealed_ns is None):
            state.remove()
            return
        state.update(
            (
                _ser_buf(sealed) if has_buf else None,
                _ser_buf(limbo) if has_limbo else None,
                pickle.dumps(parts_out, protocol=5) if parts_out else None,
                pickle.dumps(parked_ser, protocol=5) if parked_ser else None,
                max(wm_ms, last_emit_wm_ms),
                late_dropped,
                fellback,
                my_fmt,
            )
        )
        timer = None
        if has_limbo:
            min_limbo = int(ts_i8(limbo).min())
            timer = max(-(-min_limbo // 1_000_000), wm_ms + 1)
        if min_unsealed_ns is not None:
            t2 = max(-(-min_unsealed_ns // 1_000_000), wm_ms + 1)
            timer = t2 if timer is None else min(timer, t2)
        if timer is None and (has_buf or parts_out) and w_ns is not None:
            timer = max(wm_ms + w_ns // 1_000_000 + 1, 1)
        if timer is not None:
            state.setTimeoutTimestamp(timer)

    return fn
