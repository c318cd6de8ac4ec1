"""Batch execution of compiled patterns.

Two physical strategies (SURVEY.md §3.4 / §4.2):

* ``run_batch``  — groupBy(key).applyInPandas over (ts, tiebreak)-sorted
  groups, advancing the compiled NFA with NumPy/pandas *vectorized over
  the partial-match set* per event (no per-row Python in the inner
  candidate evaluation).  Handles everything incl. unbounded Kleene.
  The same group matcher backs the streaming processor (stream.py), so
  batch≡stream parity is structural.

* ``plan_join``  (join_planner.py) — fixed-arity patterns lowered to
  pure DataFrame self-joins: all-Catalyst, whole-stage-codegen'd, the
  100-TB scale path for batch and the shape the DuckDB oracle checks.

Replaces the reference's single-threaded evaluation-tree loop
(reference `TreeBasedEvaluationMechanism.py`, SURVEY.md §2.3 E6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .compiler import CompiledPattern

__all__ = [
    "match_group_nfa",
    "run_batch",
    "match_schema_array",
    "match_schema_flat",
    "cpu_parallelism",
]


def cpu_parallelism(df) -> int:
    """Target partition count for CPU-bound Python matcher stages.

    AQE's byte-based partition coalescing
    (spark.sql.adaptive.coalescePartitions) judges a shuffle stage by its
    BYTES, which under-parallelizes NFA stages catastrophically: matcher
    input is a few pruned columns (tiny bytes) with heavy Python compute
    per row, so AQE happily coalesces the exchange down to ONE task and
    serializes the whole matcher (measured 6.3s -> 1.1s at sf0.1 /
    local[32] when pinned).  Pinning the repartition count makes AQE
    leave the exchange alone; we pin to the session's shuffle
    parallelism, which a cluster deployment sizes to its executor-core
    count."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _obj_array(items) -> np.ndarray:
    """1-D object ndarray of tuples (np.array would collapse to 2-D)."""
    a = np.empty(len(items), dtype=object)
    for j, t in enumerate(items):
        a[j] = t
    return a


class _ColStore:
    """Column arrays for one sorted group; gathers return raw NumPy views.

    ``need`` restricts the pandas→NumPy conversion to the columns the
    matcher can actually reference (condition columns + ts) — per-group
    ``to_numpy`` of never-read columns was ~18% of matcher time."""

    def __init__(self, gdf: pd.DataFrame, need=None):
        cs = gdf.columns if need is None else [c for c in gdf.columns if c in need]
        self._cols = {c: gdf[c].to_numpy() for c in cs}

    @classmethod
    def from_cols(cls, cols: dict) -> "_ColStore":
        self = cls.__new__(cls)
        self._cols = cols
        return self

    def row(self, i: int) -> dict:
        return {c: v[i] for c, v in self._cols.items()}

    def gather(self, positions: np.ndarray) -> "_VarView":
        return _VarView(self._cols, positions)


class _VarView:
    """Lazy per-variable attribute view: ``view[col]`` gathers the raw
    NumPy array (no pandas Series wrapper — Series construction was ~20%
    of matcher time; every condition ``pd()`` implementation is
    NumPy-compatible, and UserPred re-wraps for its user-facing
    contract)."""

    def __init__(self, cols, positions):
        self._cols = cols
        self._pos = positions

    def __getitem__(self, col):
        return self._cols[col][self._pos]


class _Partials:
    """Columnar partial-match table for one NFA state."""

    __slots__ = ("scalar", "kleene", "first_pos", "last_pos", "first_ts")

    def __init__(self, scalar_vars, kleene_vars):
        self.scalar = {v: np.empty(0, dtype=np.int64) for v in scalar_vars}
        self.kleene = {v: np.empty(0, dtype=object) for v in kleene_vars}
        self.first_pos = np.empty(0, dtype=np.int64)
        self.last_pos = np.empty(0, dtype=np.int64)
        self.first_ts = np.empty(0, dtype=np.int64)  # ns epoch

    def __len__(self):
        return len(self.first_pos)

    def select(self, mask_or_idx):
        out = _Partials.__new__(_Partials)
        out.scalar = {v: a[mask_or_idx] for v, a in self.scalar.items()}
        out.kleene = {v: a[mask_or_idx] for v, a in self.kleene.items()}
        out.first_pos = self.first_pos[mask_or_idx]
        out.last_pos = self.last_pos[mask_or_idx]
        out.first_ts = self.first_ts[mask_or_idx]
        return out

    def extend(self, other: "_Partials"):
        for v in self.scalar:
            self.scalar[v] = np.concatenate([self.scalar[v], other.scalar[v]])
        for v in self.kleene:
            self.kleene[v] = np.concatenate([self.kleene[v], other.kleene[v]])
        self.first_pos = np.concatenate([self.first_pos, other.first_pos])
        self.last_pos = np.concatenate([self.last_pos, other.last_pos])
        self.first_ts = np.concatenate([self.first_ts, other.first_ts])


def _eval_conds(conds, store, partials, cur_var, cur_row, extra_scalar=None,
                var_group=None, aligned=()):
    """Vectorized evaluation of conjuncts over a partial table.

    cur_var's attributes come from the current event (scalars, broadcast);
    bound vars gather from the store.  A conjunct referencing an
    already-bound Kleene variable evaluates per ELEMENT of each
    partial's tuple via (partial, element) pair expansion — ALL elements
    must satisfy it.  ``aligned`` (composite-Kleene group mates of the
    slot being bound) evaluate as the CURRENT repetition's element —
    the last element of their tuple.  Returns boolean ndarray."""
    n = len(partials)
    mask = np.ones(n, dtype=bool)
    if not conds:
        return mask

    aligned_pos = None
    if aligned:
        extra = dict(extra_scalar) if extra_scalar else {}
        aligned_pos = {}
        for v in aligned:
            if v in partials.kleene and v not in extra:
                last_pos = np.fromiter(
                    (t[-1] for t in partials.kleene[v]), dtype=np.int64, count=n
                )
                extra[v] = store.gather(last_pos)
                # pair-expansion path (a conjunct ALSO referencing an
                # independent leaf Kleene var) needs the raw positions
                # to gather per (partial, element) pair
                aligned_pos[v] = last_pos
        extra_scalar = extra

    class _Env:
        def __getitem__(self, var):
            if var == cur_var:
                return cur_row
            if extra_scalar and var in extra_scalar:
                return extra_scalar[var]
            if var in partials.scalar:
                return store.gather(partials.scalar[var])
            raise KeyError(var)

    env = _Env()
    for c in conds:
        kref = [
            v for v in c.vars()
            if v != cur_var and v in partials.kleene
            and not (extra_scalar and v in extra_scalar)
        ]
        if kref:
            mask &= _eval_kleene_cond(
                c, kref, store, partials, cur_var, cur_row, var_group,
                extra_pos=aligned_pos,
            )
            continue
        r = c.pd(env)
        if isinstance(r, (bool, np.bool_)):
            if not r:
                return np.zeros(n, dtype=bool)
        else:
            mask &= np.asarray(r, dtype=bool)
    return mask


def _eval_kleene_cond(c, kref, store, partials, cur_var, cur_row, var_group=None,
                      extra_pos=None):
    """ALL-combinations evaluation of a conjunct over each partial's
    bound Kleene tuples for variables `kref` (cross-variable conditions
    like `k.value > c.value` where c binds after the closure).

    One Kleene variable -> per-element ALL.  Two or more independent
    Kleene variables -> CROSS PRODUCT of their element tuples (the
    reference's lambda formulas quantify over every pair of bindings;
    SURVEY.md §2.2).  Variables sharing an entry in ``var_group`` (an
    unbounded composite-Kleene group) form ONE dimension: their tuples
    are zip-ALIGNED per repetition instead of crossed — matching the
    bounded chain expansion, which replicates the conjunct per
    repetition index (compiler._expand_composite_kleene).

    ``extra_pos``: per-partial positions for ALIGNED group mates of the
    slot being bound (their evaluation element is the CURRENT
    repetition's, i.e. the last of their tuple — _eval_conds keeps them
    out of kref); a conjunct pairing such a var with an independent
    leaf Kleene var gathers them per expanded pair here.  Over the
    run, each repetition's completing bind contributes (all leaf
    elements) x (that repetition's element) — accumulating to exactly
    the chain expansion's cross product."""
    n = len(partials)
    if n == 0:
        return np.ones(0, dtype=bool)

    # dimensions: one per composite-Kleene group (aligned vars), one per
    # independent leaf Kleene variable
    dim_vars: list[list] = []
    if var_group:
        by_g: dict = {}
        for v in kref:
            g = var_group.get(v)
            if g is None:
                dim_vars.append([v])
            else:
                by_g.setdefault(g, []).append(v)
        dim_vars = list(by_g.values()) + dim_vars
    else:
        dim_vars = [[v] for v in kref]

    dim_lens = []
    for vs in dim_vars:
        ls = [
            np.fromiter((len(t) for t in partials.kleene[v]), dtype=np.int64, count=n)
            for v in vs
        ]
        # aligned vars zip over the completed repetitions (min length —
        # equal once the group is complete; an in-progress repetition's
        # unmatched head is checked at its own later sub-slot bind)
        dim_lens.append(ls[0] if len(ls) == 1 else np.minimum.reduce(ls))

    total = dim_lens[0].copy()
    for l in dim_lens[1:]:
        total = total * l
    tsum = int(total.sum())
    if tsum == 0:
        return np.ones(n, dtype=bool)  # vacuous (some tuple empty)

    pair_partial = np.repeat(np.arange(n), total)
    starts = np.cumsum(total) - total
    seq = np.arange(tsum) - np.repeat(starts, total)  # within-partial counter

    # mixed-radix decode: stride of dim d = product of lens of later dims
    strides = [np.ones(n, dtype=np.int64) for _ in dim_vars]
    for d in range(len(dim_vars) - 2, -1, -1):
        strides[d] = strides[d + 1] * dim_lens[d + 1]

    views = {}
    for d, vs in enumerate(dim_vars):
        idx = (seq // strides[d][pair_partial]) % dim_lens[d][pair_partial]
        for v in vs:
            flat = np.concatenate(
                [np.asarray(t, dtype=np.int64) for t in partials.kleene[v] if len(t)]
            ) if tsum else np.empty(0, dtype=np.int64)
            vlens = np.fromiter(
                (len(t) for t in partials.kleene[v]), dtype=np.int64, count=n
            )
            voff = np.cumsum(vlens) - vlens
            views[v] = store.gather(flat[voff[pair_partial] + idx])

    sub = partials.select(pair_partial)

    class _Env:
        def __getitem__(self, var):
            if var in views:
                return views[var]
            if var == cur_var:
                return cur_row
            if extra_pos is not None and var in extra_pos:
                # aligned group mate: current repetition's element,
                # gathered per expanded pair
                return store.gather(extra_pos[var][pair_partial])
            return store.gather(sub.scalar[var])

    r = c.pd(_Env())
    if isinstance(r, (bool, np.bool_)):
        m = np.full(tsum, bool(r))
    else:
        m = np.asarray(r, dtype=bool)
    ok = np.bincount(pair_partial, weights=m.astype(np.int64), minlength=n)
    return ok == total


def _br_guard_applies(spec, partials):
    """Branch gate for a trailing Neg inside an Or_ branch
    (NegSpec.br_guard = (branch_last_leaf_var, *position_vars)): the
    spec applies to a partial iff the latest bound position across ALL
    of the position's sub-slot vars belongs to the guarded branch's
    last leaf.  Strict repetition interleaving makes that latest bind
    exactly the relevant repetition's bind at the position, so this
    holds iff that repetition CHOSE the branch — the bounded chain
    expansion's per-instance spec existence, evaluated dynamically."""
    n = len(partials)

    def lastel(v):
        if v in partials.kleene:
            return np.fromiter(
                (t[-1] if len(t) else -1 for t in partials.kleene[v]),
                dtype=np.int64, count=n,
            )
        if v in partials.scalar:
            return partials.scalar[v]
        return np.full(n, -1, dtype=np.int64)

    bl = lastel(spec.br_guard[0])
    mx = bl.copy()
    for v in spec.br_guard[1:]:
        if v != spec.br_guard[0]:
            np.maximum(mx, lastel(v), out=mx)
    # returns (applies, branch_last_element): the second is the gap's
    # true left boundary wherever the guard applies — pre_vars may miss
    # it when the position's own slots are the spec's post slots (a
    # bare-Or_ group's loop-back)
    return (bl >= 0) & (bl == mx), bl


def _gap_ok(spec_positions, spec, store, partials, cur_var, cur_row, i,
            pre_off=None):
    """For each partial: True if NO qualifying negative event lies strictly
    inside the gap ending at i.  The gap's left boundary is the latest
    bound position among the spec's STRUCTURAL predecessors (pre_vars)
    — NOT the partial's last_pos, which overshoots when another
    variable (an And_ sibling) binds inside the gap.  Events bound to
    other variables of the partial are not negation candidates (pinned
    semantics, same as _span_ok and the replica).  Vectorized via
    searchsorted (+ pair expansion only when the neg condition
    references bound variables)."""
    np_pos = spec_positions
    n = len(partials)
    if len(np_pos) == 0:
        return np.ones(n, dtype=bool)
    if spec.pre_vars:
        left = np.full(n, -1, dtype=np.int64)
        for v in spec.pre_vars:
            if v in partials.scalar:
                np.maximum(left, partials.scalar[v], out=left)
            elif v in partials.kleene:
                lastel = np.fromiter(
                    (t[-1] if len(t) else -1 for t in partials.kleene[v]),
                    dtype=np.int64, count=n,
                )
                np.maximum(left, lastel, out=left)
    else:
        left = partials.last_pos
    if spec.br_guard:
        applies, bl = _br_guard_applies(spec, partials)
        left = np.maximum(left, bl)
    if pre_off is not None:
        # leading member gap in a single-position group: per-transition
        # boundary override (Transition.gap_pre) — off1 vars contribute
        # their LAST element, off2 vars (mid-repetition in the source
        # state) their SECOND-TO-LAST (their last element belongs to
        # the CURRENT repetition and must not shrink the interval)
        if left is partials.last_pos:
            left = np.full(n, -1, dtype=np.int64)
        off1, off2 = pre_off
        for v in off1:
            if v in partials.kleene:
                np.maximum(left, np.fromiter(
                    (t[-1] if len(t) else -1 for t in partials.kleene[v]),
                    dtype=np.int64, count=n,
                ), out=left)
            elif v in partials.scalar:
                np.maximum(left, partials.scalar[v], out=left)
        for v in off2:
            if v in partials.kleene:
                np.maximum(left, np.fromiter(
                    (t[-2] if len(t) >= 2 else -1
                     for t in partials.kleene[v]),
                    dtype=np.int64, count=n,
                ), out=left)
    lo = np.searchsorted(np_pos, left, side="right")
    hi = int(np.searchsorted(np_pos, i, side="left"))
    counts = hi - lo
    if spec.br_guard:
        counts = np.where(applies, counts, 0)
    hot = np.nonzero(counts > 0)[0]
    if len(hot) == 0:
        return np.ones(n, dtype=bool)
    # expand (partial, neg event) pairs; exclude events bound to the
    # partial's own positive variables, then evaluate any multi-var
    # conditions vectorized
    reps = counts[hot]
    pair_partial = np.repeat(hot, reps)
    pair_neg = np.concatenate([np_pos[lo[h] : hi] for h in hot])
    sub = partials.select(pair_partial)
    keep = np.ones(len(pair_partial), dtype=bool)
    for v, arr in sub.scalar.items():
        keep &= pair_neg != arr
    for v, karr in sub.kleene.items():
        keep &= np.fromiter(
            (int(pn) not in t for pn, t in zip(pair_neg, karr)),
            dtype=bool, count=len(pair_partial),
        )
    if not spec.multi:
        bad = np.bincount(pair_partial[keep], minlength=n) > 0
        return ~bad
    neg_view = store.gather(pair_neg)

    class _Env:
        def __getitem__(self, var):
            if var == spec.var:
                return neg_view
            if var == cur_var:
                return cur_row
            return store.gather(sub.scalar[var])

    env = _Env()
    m = keep
    for c in spec.multi:
        r = c.pd(env)
        m &= np.asarray(r, dtype=bool) if not isinstance(r, (bool, np.bool_)) else r
    bad = np.bincount(pair_partial[m], minlength=n) > 0
    return ~bad


def _span_ok(spec_positions, spec, store, partials, alt):
    """Span-scoped negation (Neg inside And_): no qualifying negative event
    strictly inside (first_pos, last_pos), excluding the bound events."""
    if len(spec_positions) == 0:
        return np.ones(len(partials), dtype=bool)
    np_pos = spec_positions
    lo = np.searchsorted(np_pos, partials.first_pos, side="right")
    hi = np.searchsorted(np_pos, partials.last_pos, side="left")
    counts = hi - lo
    ok = np.ones(len(partials), dtype=bool)
    hot = np.nonzero(counts > 0)[0]
    if len(hot) == 0:
        return ok
    reps = counts[hot]
    pair_partial = np.repeat(hot, reps)
    pair_neg = np.concatenate([np_pos[lo[h] : hi[h]] for h in hot])
    sub = partials.select(pair_partial)
    # exclude events bound to positive variables (scalar AND kleene tuples)
    keep = np.ones(len(pair_partial), dtype=bool)
    for v, arr in sub.scalar.items():
        keep &= pair_neg != arr
    for v, karr in sub.kleene.items():
        keep &= np.fromiter(
            (int(pn) not in t for pn, t in zip(pair_neg, karr)),
            dtype=bool, count=len(pair_partial),
        )
    neg_view = store.gather(pair_neg)

    class _Env:
        def __getitem__(self, var):
            if var == spec.var:
                return neg_view
            return store.gather(sub.scalar[var])

    env = _Env()
    m = keep
    for c in spec.multi:
        r = c.pd(env)
        m = m & (np.asarray(r, dtype=bool) if not isinstance(r, (bool, np.bool_)) else r)
    bad = np.bincount(pair_partial[m], minlength=len(partials)) > 0
    return ~bad


def _edge_ok(spec_positions, spec, store, partials, ts_ns, w_ns, leading: bool):
    """Leading/trailing negation (accept-time, window-bounded).

    leading:  no qualifying neg strictly before first_pos with
              last.ts - neg.ts <= window;
    trailing: no qualifying neg strictly after last_pos with
              neg.ts - first.ts <= window.
    Positions are (ts, tiebreak)-sorted, so position order IS the event
    order and ts_ns[spec_positions] is non-decreasing — both bounds are
    searchsorted lookups."""
    if len(spec_positions) == 0:
        return np.ones(len(partials), dtype=bool)
    np_pos = spec_positions
    neg_ts = ts_ns[np_pos]
    if leading:
        hi = np.searchsorted(np_pos, partials.first_pos, side="left")
        lo = np.searchsorted(neg_ts, ts_ns[partials.last_pos] - w_ns, side="left")
    else:
        lo = np.searchsorted(np_pos, partials.last_pos, side="right")
        hi = np.searchsorted(neg_ts, partials.first_ts + w_ns, side="right")
    counts = np.maximum(hi - lo, 0)
    if spec.br_guard:
        # trailing Neg inside an Or_ branch: window-bounded look-ahead
        # applies only when the FINAL repetition chose the branch
        counts = np.where(_br_guard_applies(spec, partials)[0], counts, 0)
    if not spec.multi:
        return counts <= 0
    ok = np.ones(len(partials), dtype=bool)
    hot = np.nonzero(counts > 0)[0]
    if len(hot) == 0:
        return ok
    reps = counts[hot]
    pair_partial = np.repeat(hot, reps)
    pair_neg = np.concatenate([np_pos[lo[h] : hi[h]] for h in hot])
    sub = partials.select(pair_partial)
    neg_view = store.gather(pair_neg)

    class _Env:
        def __getitem__(self, var):
            if var == spec.var:
                return neg_view
            return store.gather(sub.scalar[var])

    env = _Env()
    m = np.ones(len(pair_partial), dtype=bool)
    for c in spec.multi:
        r = c.pd(env)
        m = m & (np.asarray(r, dtype=bool) if not isinstance(r, (bool, np.bool_)) else r)
    bad = np.bincount(pair_partial[m], minlength=len(partials)) > 0
    return ~bad


def unary_masks(cp: CompiledPattern, cols: dict, n: int, start: int = 0,
                cache: dict | None = None):
    """Vectorized unary-condition masks over `n` rows for every slot and
    negation of every alternative: {alt_id: ({sid: bool[n]}, [bool[n]])}.

    Evaluated ONCE per pandas frame — per-partition in the partition
    executor, per-group in the classic one.

    ``start`` > 0 (the incremental streaming executor resuming over a
    persisted buffer): SLOT masks are evaluated only over rows
    [start, n) — `advance_core` never probes a slot mask below its
    resume point, so rows [0, start) are left False.  NEGATION masks
    stay full-range: gap/span/edge checks scan candidate positions
    across the whole retained buffer.  This keeps per-batch mask cost
    O(new events) for the slot side instead of O(buffer).

    Identical unary conditions are evaluated ONCE per frame: masks are
    memoized on the condition's canonical SQL (var normalized) — OR
    expansion repeats each slot across alternatives, and multi-pattern
    execution repeats predicates like role='user' across patterns.
    Pass a shared ``cache`` dict to extend the memo across patterns
    within one frame (run_batch_multi / stream_matches_multi); masks
    are returned by reference and must not be mutated by callers."""
    out = {}
    if cache is None:
        cache = {}  # always share across this pattern's alternatives
    rng = np.arange(start, n) if start else np.arange(n)
    for alt in cp.alternatives:
        def mask_of(var, cond, full):
            full_range = bool(full and start) or not start
            try:
                ckey = (cond.sql({var: "e"}), full_range)
            except Exception:  # UserPred & friends: no SQL form
                ckey = None
            if ckey is not None and ckey in cache:
                return cache[ckey]
            idx = np.arange(n) if (full and start) else rng
            env = {var: _VarView(cols, idx)}
            r = cond.pd(env)
            if isinstance(r, (bool, np.bool_)):
                m = np.full(len(idx), bool(r))
            else:
                m = np.asarray(r, dtype=bool)
            if len(idx) != n:
                outm = np.zeros(n, dtype=bool)
                outm[start:] = m
                m = outm
            if ckey is not None:
                cache[ckey] = m
            return m

        slot_mask = {s.sid: mask_of(s.var, s.unary, False) for s in alt.slots}
        neg_mask = [mask_of(sp.var, sp.unary, True) for sp in alt.negs]
        out[alt.alt_id] = (slot_mask, neg_mask)
    return out


def match_group_nfa(cp: CompiledPattern, gdf: pd.DataFrame, cap=None, stats=None) -> list:
    """All matches in one key-group (gdf sorted by (ts, tiebreak)).

    Returns list of (alt_id, {var: pos | tuple(pos)}).  Same contract as
    tests/oracle_cep.match_group — the two are cross-checked in tests."""
    n = len(gdf)
    if n == 0:
        return []
    need = {cp.pattern.ts_col}
    for cs_ in cp.needed_cols.values():
        need.update(cs_)
    store = _ColStore(gdf, need=need)
    ts_ns = store._cols[cp.pattern.ts_col].astype("datetime64[ns]").astype(np.int64)
    masks = unary_masks(cp, store._cols, n)
    return match_core(cp, store, ts_ns, masks, cap=cap, stats=stats)


def match_core(cp: CompiledPattern, store, ts_ns, masks, cap=None, stats=None) -> list:
    """NFA advance over one sorted group given precomputed unary masks."""
    out, _ = advance_core(cp, store, ts_ns, masks, cap=cap, stats=stats)
    return out


def advance_core(cp: CompiledPattern, store, ts_ns, masks, tables_in=None, start=0,
                 cap=None, stats=None):
    """Resumable NFA advance: process events [start, n) against partial
    tables carried over from a previous call (the incremental streaming
    executor persists them in the state store and advances only over
    newly-sealed arrivals — stream.py).  `tables_in` maps
    alt_id -> {state_sid: _Partials} with positions indexing `store`;
    returns (matches, tables_out) — tables_out is safe to persist.
    tables_in=None, start=0 is a full from-scratch match.

    ``cap`` (state guard, opt-in): hard bound on the number of partial
    matches retained per NFA state per key.  On breach the OLDEST
    partials (front of the insertion-ordered table — earliest starts)
    are dropped deterministically and counted into
    ``stats["dropped_partials"]``.  Dropping a partial can only LOSE
    matches, never fabricate one; with cap=None semantics are exact.
    This is the hot-key safety valve for powerset-Kleene patterns whose
    partial count is exponential in the number of matching events
    inside the window — at 100 TB one adversarial conversation must
    not OOM its executor or blow the state store."""
    pat = cp.pattern
    n = len(ts_ns)
    w_ns = None if pat.window is None else int(pat.window.total_seconds() * 1e9)
    out = []
    tables_out = {}

    for alt in cp.alternatives:
        slots = {s.sid: s for s in alt.slots}
        svars = {st.sid: [slots[x].var for x in st.bound if not slots[x].kleene] for st in alt.states}
        kvars = {st.sid: [slots[x].var for x in st.bound if slots[x].kleene] for st in alt.states}
        slot_mask, neg_mask = masks[alt.alt_id]
        neg_positions = [np.nonzero(m)[0] for m in neg_mask]
        # composite-Kleene groups: same-group mates evaluate zip-aligned
        var_group = getattr(alt, "var_group", None) or None
        slot_aligned = {}
        if var_group:
            for s in alt.slots:
                if s.group is not None:
                    slot_aligned[s.sid] = frozenset(
                        x.var for x in alt.slots
                        if x.group == s.group and x.sid != s.sid
                    )

        if tables_in is not None and alt.alt_id in tables_in:
            tables = tables_in[alt.alt_id]
            for st in alt.states:  # serialization skips empty states
                if st.sid not in tables:
                    tables[st.sid] = _Partials(svars[st.sid], kvars[st.sid])
        else:
            tables = {st.sid: _Partials(svars[st.sid], kvars[st.sid]) for st in alt.states}
        tables_out[alt.alt_id] = tables

        # Fast path (round 5): an event on which NO slot's unary mask is
        # true cannot start, extend, loop, or complete anything — partial
        # tables are only read at firing events, and window expiry at the
        # NEXT firing event (with its later cur_ts) prunes at least as
        # much as it would have at the skipped event, so iterating the
        # precomputed firing positions only is EXACT (including the
        # cap-guard drop accounting, which is a no-op when nothing is
        # staged).  On selective patterns this skips the per-event Python
        # loop for the large majority of rows.  Masks may be shared via
        # the unary-mask memo — union into a fresh array, never in place.
        any_fire = np.zeros(n, dtype=bool)
        for m in slot_mask.values():
            np.logical_or(any_fire, m, out=any_fire)
        fire_pos = np.nonzero(any_fire)[0]
        if start:
            fire_pos = fire_pos[fire_pos >= start]

        # The current event's attribute dict is only consulted by
        # multi-variable transition conjuncts, adjacent-pair Kleene
        # conditions, and gap-negation conjuncts — collect the columns
        # those can reference and materialize just them per firing event
        # (unary-only patterns pay nothing).
        row_cols: set = set()
        for st in alt.states:
            for tr in st.transitions:
                for c in tr.conds:
                    row_cols.update(col for _, col in c.cols())
            for _ksid, kconds in st.kleene_loops:
                for c in kconds:
                    row_cols.update(col for _, col in c.cols())
        for s in alt.slots:
            if s.adjacent is not None:
                row_cols.update(col for _, col in s.adjacent.cols())
        for sp in alt.negs:
            for c in sp.multi:
                row_cols.update(col for _, col in c.cols())
        row_arrays = [(c, store._cols[c]) for c in sorted(row_cols)]

        # seq-group repetition-count ANCHOR variables per group: the
        # repetition count of a partial is the TOTAL number of binds at
        # the group's first NON-loop position — with Or_ branches that
        # is a SUM across branch vars (each repetition binds exactly
        # one of them).  An unbounded nested leaf Kleene's looping
        # position (session 17: allowed at position 0 too) binds a
        # VARIABLE number of elements per repetition, so it cannot
        # anchor the count; the cap check only fires at loop-back binds
        # (group COMPLETE), where every finished repetition has bound
        # every position once — any non-loop position counts them
        # (validation guarantees one exists)
        grp_anchor_vars: dict = {}
        anchor_idx: dict = {}
        for s in alt.slots:
            if (s.group is not None and s.grp_kind != "and"
                    and not s.grp_loop):
                j = anchor_idx.get(s.group)
                anchor_idx[s.group] = (
                    s.grp_idx if j is None else min(j, s.grp_idx)
                )
        for s in alt.slots:
            if (s.group is not None and s.grp_kind != "and"
                    and s.grp_idx == anchor_idx.get(s.group, 0)
                    and not s.grp_loop and s.br_idx == 0
                    and (not s.pos_all or s.br == 0 or s.mem == 0)):
                # entry sub-slots only: a multi-event (Seq) branch binds
                # once per repetition at its br_idx-0 event; a
                # conjunctive (And_) position binds EVERY member each
                # repetition, so count member 0 alone — when member 0
                # is an Or_ (session 9), exactly one of its units binds
                # per repetition, so summing across them stays one per
                # repetition
                grp_anchor_vars.setdefault(s.group, []).append(s.var)

        def _accept_negs(sub, neg_indices, edge_w=None):
            # accept-time negation checks: span + leading/trailing edges
            if edge_w is None:
                edge_w = w_ns
            okm = np.ones(len(sub), dtype=bool)
            for si in neg_indices:
                spec = alt.negs[si]
                if spec.kind == "span":
                    okm &= _span_ok(neg_positions[si], spec, store, sub, alt)
                else:
                    okm &= _edge_ok(
                        neg_positions[si], spec, store, sub, ts_ns, edge_w,
                        leading=(spec.kind == "leading"),
                    )
            return okm

        def emit(sub: _Partials, state_sid):
            if alt.accept_tags is not None:
                # merged multi-pattern automaton: acceptance is per TAG
                # (merge.merge_compiled) — each tag applies its own
                # accept-time negs and renames canonical vars back to
                # the owning pattern's variable names.  Under MIXED
                # windows the merged automaton prunes at the max window,
                # so each tag re-checks span <= W_tag here (exact: see
                # merge.py module docstring) and bounds its edge-neg
                # intervals by its own window.
                for tag in alt.accept_tags.get(state_sid, ()):
                    tw = tag.w_ns if tag.w_ns is not None else w_ns
                    okm = _accept_negs(sub, tag.accept_negs, edge_w=tw)
                    if tag.w_ns is not None and (
                        w_ns is None or tag.w_ns < w_ns
                    ):
                        okm &= (
                            sub.first_ts
                            >= ts_ns[sub.last_pos] - tag.w_ns
                        )
                    sel = sub.select(okm) if not okm.all() else sub
                    vmap = tag.var_map
                    for j in range(len(sel)):
                        b = {vmap[v]: int(sel.scalar[v][j]) for v in sel.scalar}
                        for v in sel.kleene:
                            b[vmap[v]] = tuple(sel.kleene[v][j])
                        out.append((tag.key, b))
                return
            okm = _accept_negs(sub, alt.span_negs)
            sel = sub.select(okm) if not okm.all() else sub
            for j in range(len(sel)):
                b = {v: int(sel.scalar[v][j]) for v in sel.scalar}
                for v in sel.kleene:
                    b[v] = tuple(sel.kleene[v][j])
                out.append((alt.alt_id, b))

        for i in fire_pos:
            i = int(i)
            cur_ts = ts_ns[i]
            cur_row = {c: a[i] for c, a in row_arrays}
            staged = []  # (target_state_id, _Partials)

            for st in alt.states:
                tbl = tables[st.sid]
                has = len(tbl) > 0
                # window expiry: partials that can no longer complete
                if has and w_ns is not None:
                    alive = tbl.first_ts >= cur_ts - w_ns
                    if not alive.all():
                        tbl = tbl.select(alive)
                        tables[st.sid] = tbl
                        has = len(tbl) > 0

                # initial transitions out of the empty state
                if st.sid == 0 and not st.bound:
                    for tr in st.transitions:
                        if not slot_mask[tr.slot][i]:
                            continue
                        s = slots[tr.slot]
                        npart = _Partials(svars[tr.target], kvars[tr.target])
                        if s.kleene:
                            npart.kleene[s.var] = _obj_array([(i,)])
                        else:
                            npart.scalar[s.var] = np.array([i], dtype=np.int64)
                        for v in svars[tr.target]:
                            if v != s.var and v not in npart.scalar:
                                npart.scalar[v] = np.array([i], dtype=np.int64)
                        npart.first_pos = np.array([i], dtype=np.int64)
                        npart.last_pos = np.array([i], dtype=np.int64)
                        npart.first_ts = np.array([cur_ts], dtype=np.int64)
                        staged.append((tr.target, npart))
                        if tr.accepting:
                            emit(npart, tr.target)
                    continue

                if not has:
                    continue

                # regular transitions
                for tr in st.transitions:
                    if not slot_mask[tr.slot][i]:
                        continue
                    s = slots[tr.slot]
                    mask = _eval_conds(
                        tr.conds, store, tbl, s.var, cur_row,
                        var_group=var_group,
                        aligned=slot_aligned.get(tr.slot, ()),
                    )
                    if tr.loop_cont and s.adjacent is not None:
                        # unbounded nested Kleene (session 16):
                        # adjacent-pair condition between the run's
                        # consecutive chosen events — continue binds
                        # only (an entry bind starts a fresh run; the
                        # tuple's last element is always the CURRENT
                        # repetition's previous choice here)
                        prev_pos = np.fromiter(
                            (t[-1] for t in tbl.kleene[s.var]),
                            dtype=np.int64, count=len(tbl),
                        )
                        mask &= _eval_conds(
                            (s.adjacent,), store, tbl, s.var, cur_row,
                            extra_scalar={
                                f"{s.var}__prev": store.gather(prev_pos)
                            },
                        )
                    if tr.rep_start and s.kleene_max is not None:
                        # bounded composite under group lowering: cap
                        # the repetition count at the loop-back bind
                        # (seq groups: SUM of the anchor position's
                        # branch tuple lengths — one bind per
                        # repetition; a branch never bound contributes
                        # 0; the anchor is the first NON-loop position,
                        # see grp_anchor_vars above)
                        vs = (
                            grp_anchor_vars[s.group]
                            if s.grp_kind != "and" else [s.var]
                        )
                        lens = np.zeros(len(tbl), dtype=np.int64)
                        for v in vs:
                            if v in tbl.kleene:
                                lens += np.fromiter(
                                    (len(t) for t in tbl.kleene[v]),
                                    dtype=np.int64, count=len(tbl),
                                )
                        mask &= lens < s.kleene_max
                    gp = (
                        {g: (o1, o2) for g, o1, o2 in tr.gap_pre}
                        if tr.gap_pre else None
                    )
                    for gi in tr.gap_negs:
                        mask &= _gap_ok(
                            neg_positions[gi], alt.negs[gi], store, tbl, s.var, cur_row, i,
                            pre_off=None if gp is None else gp.get(gi),
                        )
                    if not mask.any():
                        continue
                    sub = tbl.select(mask)
                    npart = _Partials(svars[tr.target], kvars[tr.target])
                    for v in svars[tr.target]:
                        npart.scalar[v] = (
                            sub.scalar[v]
                            if v in sub.scalar
                            else np.full(len(sub), i, dtype=np.int64)
                        )
                    for v in kvars[tr.target]:
                        if v in sub.kleene:
                            npart.kleene[v] = (
                                _obj_array([t + (i,) for t in sub.kleene[v]])
                                if (tr.repeat and v == s.var)
                                else sub.kleene[v]
                            )
                        else:
                            npart.kleene[v] = _obj_array([(i,)] * len(sub))
                    npart.first_pos = sub.first_pos
                    npart.last_pos = np.full(len(sub), i, dtype=np.int64)
                    npart.first_ts = sub.first_ts
                    staged.append((tr.target, npart))
                    if tr.accepting:
                        emit(npart, tr.target)

                # kleene self-extension (take/skip fork: original rows stay)
                for ksid, kconds in st.kleene_loops:
                    if not slot_mask[ksid][i]:
                        continue
                    s = slots[ksid]
                    mask = _eval_conds(kconds, store, tbl, s.var, cur_row)
                    if s.adjacent is not None:
                        # consecutive-chosen condition: prev = each
                        # partial's last chosen event, next = current
                        prev_pos = np.fromiter(
                            (t[-1] for t in tbl.kleene[s.var]),
                            dtype=np.int64, count=len(tbl),
                        )
                        mask &= _eval_conds(
                            (s.adjacent,), store, tbl, s.var, cur_row,
                            extra_scalar={f"{s.var}__prev": store.gather(prev_pos)},
                        )
                    if s.kleene_max is not None:
                        lens = np.fromiter(
                            (len(t) for t in tbl.kleene[s.var]), dtype=np.int64, count=len(tbl)
                        )
                        mask &= lens < s.kleene_max
                    if not mask.any():
                        continue
                    sub = tbl.select(mask)
                    npart = _Partials(svars[st.sid], kvars[st.sid])
                    npart.scalar = {v: a.copy() for v, a in sub.scalar.items()}
                    npart.kleene = {v: a.copy() for v, a in sub.kleene.items()}
                    npart.kleene[s.var] = _obj_array(
                        [t + (i,) for t in sub.kleene[s.var]]
                    )
                    npart.first_pos = sub.first_pos
                    npart.last_pos = np.full(len(sub), i, dtype=np.int64)
                    npart.first_ts = sub.first_ts
                    staged.append((st.sid, npart))
                    if st.accepting:
                        emit(npart, st.sid)

            for target, npart in staged:
                tables[target].extend(npart)
            if cap is not None:
                for sid, tbl in tables.items():
                    over = len(tbl) - cap
                    if over > 0:
                        tables[sid] = tbl.select(np.arange(over, len(tbl)))
                        if stats is not None:
                            stats["dropped_partials"] = (
                                stats.get("dropped_partials", 0) + over
                            )

    return out, tables_out


# --------------------------------------------------------------------------
# Spark-facing wrappers


def match_schema_array(pat, emit_cols=("turn_idx", "role", "tool", "ts"), key_type=None):
    """key, pattern_id, alt_id, matched: array<struct<emit_cols>>."""
    from pyspark.sql import types as T

    field_type = {
        "turn_idx": T.IntegerType(),
        "role": T.StringType(),
        "tool": T.StringType(),
        "ts": T.TimestampType(),
        "event_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "var": T.StringType(),
    }
    struct = T.StructType(
        [T.StructField("var", T.StringType())]
        + [T.StructField(c, field_type.get(c, T.StringType())) for c in emit_cols]
    )
    return T.StructType(
        [
            T.StructField(pat.key, key_type if key_type is not None else T.StringType()),
            T.StructField("pattern_id", T.StringType()),
            T.StructField("alt_id", T.IntegerType()),
            T.StructField("matched", T.ArrayType(struct)),
        ]
    )


def matches_to_pdf_array(cp, gdf, key_val, emit_cols, res=None, cols=None):
    """Matcher output for one sorted group -> array-mode pdf.  ``res``
    overrides the match set (streaming passes the sealed subset);
    ``cols`` ({col: ndarray}) skips the pandas frame entirely (the
    partition executor already holds column arrays).

    Columnar: positions are flattened across matches, every emit column
    is gathered ONCE with NumPy fancy indexing, and the within-match
    (ts, tiebreak) sort is a single lexsort — no per-position ``.iloc``
    (~50x cheaper than the per-match dict loop it replaces; the flat
    path got the same treatment in round 2)."""
    pat = cp.pattern
    if res is None:
        res = match_group_nfa(cp, gdf)
    out_cols = [pat.key, "pattern_id", "alt_id", "matched"]
    if not res:
        return pd.DataFrame(columns=out_cols)
    if cols is None:
        need = set(emit_cols) | {pat.ts_col, pat.tiebreak_col}
        cols = {c: gdf[c].to_numpy() for c in gdf.columns if c in need}
    rows = array_match_rows(cp, key_val, emit_cols, res, cols)
    return pd.DataFrame(rows, columns=out_cols)


def array_match_rows(cp, key_val, emit_cols, res, cols) -> list:
    """Array-mode rows as plain tuples (key, pattern_id, alt_id, matched)
    — the partition executor accumulates these across ALL groups and
    builds ONE pandas frame per partition (a frame per small group costs
    more than the gathers themselves)."""
    pat = cp.pattern

    # flatten (match, var, position) triples
    pos_chunks, var_chunks, lens, alt_ids = [], [], [], []
    for alt_id, binding in res:
        alt = cp.alternatives[alt_id]
        mpos: list = []
        mvar: list = []
        for v in alt.var_order:
            p = binding.get(v)
            if p is None:
                continue  # Or_-branch var no repetition chose
            if isinstance(p, tuple):
                mpos.extend(p)
                mvar.extend([v] * len(p))
            else:
                mpos.append(p)
                mvar.append(v)
        pos_chunks.append(np.asarray(mpos, dtype=np.int64))
        var_chunks.append(mvar)
        lens.append(len(mpos))
        alt_ids.append(alt_id)
    lens = np.asarray(lens, dtype=np.int64)
    pos_flat = np.concatenate(pos_chunks)
    var_flat = np.empty(len(pos_flat), dtype=object)
    k = 0
    for mvar in var_chunks:
        var_flat[k : k + len(mvar)] = mvar
        k += len(mvar)
    mid = np.repeat(np.arange(len(res)), lens)

    # one lexsort orders every match's events by (ts, tiebreak) at once
    ts = cols[pat.ts_col][pos_flat]
    tb = cols[pat.tiebreak_col][pos_flat]
    order = np.lexsort((tb, ts, mid))
    pos_s = pos_flat[order]
    var_s = var_flat[order]

    # gather each emit column once; datetime64 -> python datetimes for
    # the struct payload (Arrow accepts those directly)
    names = ["var"] + list(emit_cols)
    gathered = [var_s.tolist()]
    for c in emit_cols:
        a = cols[c][pos_s]
        gathered.append(a.tolist())
    recs = [dict(zip(names, vals)) for vals in zip(*gathered)]
    offs = np.concatenate([[0], np.cumsum(lens)])
    pid = pat.pattern_id
    return [
        (key_val, pid, alt_ids[i], recs[offs[i] : offs[i + 1]])
        for i in range(len(res))
    ]


def match_schema_flat(cp, key_type=None):
    """key + per-var tiebreak columns; kleene -> len/first/last summary."""
    from pyspark.sql import types as T

    pat = cp.pattern
    kt = key_type if key_type is not None else T.StringType()
    fields = [T.StructField(pat.key, kt), T.StructField("alt_id", T.IntegerType())]
    for v in cp.all_vars():
        if any(v in a.kleene_vars for a in cp.alternatives):
            fields += [
                T.StructField(f"{v}_len", T.LongType()),
                T.StructField(f"{v}_first", T.LongType()),
                T.StructField(f"{v}_last", T.LongType()),
            ]
        else:
            fields.append(T.StructField(f"{v}_{pat.tiebreak_col}", T.LongType()))
    return T.StructType(fields)


def matches_to_pdf_flat(cp, gdf, key_val, res=None):
    pat = cp.pattern
    tb = gdf[pat.tiebreak_col].to_numpy()
    if res is None:
        res = match_group_nfa(cp, gdf)
    all_vars = cp.all_vars()
    kleene_all = set()
    for a in cp.alternatives:
        kleene_all |= set(a.kleene_vars)
    var_is_kleene = [(v, v in kleene_all) for v in all_vars]
    rows = []
    for alt_id, binding in res:  # tuple rows: ~5x cheaper than dicts at
        row = [key_val, alt_id]  # millions of emissions per batch
        for v, is_k in var_is_kleene:
            p = binding.get(v)
            if is_k:
                if p is None:
                    row += [None, None, None]
                else:
                    pp = p if isinstance(p, tuple) else (p,)
                    row += [len(pp), int(tb[pp[0]]), int(tb[pp[-1]])]
            else:
                row.append(None if p is None else int(tb[p]))
        rows.append(tuple(row))
    cols = [pat.key, "alt_id"]
    for v, is_k in var_is_kleene:
        if is_k:
            cols += [f"{v}_len", f"{v}_first", f"{v}_last"]
        else:
            cols.append(f"{v}_{pat.tiebreak_col}")
    return pd.DataFrame(rows, columns=cols)


def _guard_drops_acc(df, cap):
    """Spark accumulator receiving the state guard's dropped-partial
    count (None when the guard is off).  Attached to the returned
    DataFrame as ``.guard_drops`` — read ``.value`` after an action."""
    if cap is None:
        return None
    return df.sparkSession.sparkContext.accumulator(0)


def _flush_guard_stats(stats, acc):
    d = stats.get("dropped_partials", 0)
    if d:
        if acc is not None:
            acc.add(d)
        import logging

        logging.getLogger("cep_spark.guard").warning(
            "state guard dropped %d partial matches (results are a "
            "deterministic subset; raise max_partials_per_state for "
            "exact semantics)", d,
        )


def run_batch(df, cp: CompiledPattern, mode="flat", emit_cols=("turn_idx", "role", "tool", "ts"),
              strategy="auto", assume_clustered=False, max_partials_per_state=None):
    """Batch NFA execution.  Two physical strategies:

    * ``partition`` (default for flat output) — repartition(key) +
      sortWithinPartitions(key, ts, tb) + ONE mapInPandas over each
      whole partition: unary conditions evaluated vectorized ONCE per
      partition, group boundaries found by key-change scan, one output
      frame per partition.  Small-group fixed costs (per-group pandas
      frames, per-group condition eval, per-group Arrow round trip)
      amortize across the partition — the difference between ~10k and
      ~100k turns/s when conversations are short.
    * ``group`` — groupBy(key).applyInPandas, one call per key (used
      for array output mode; also the reference implementation the
      partition strategy is tested against).

    Both push the union of unary conditions + column pruning into the
    scan (Catalyst forwards them to parquet).

    ``assume_clustered=True`` skips the repartition(key) shuffle: the
    caller asserts every key's rows already live in one partition
    (bucketed table, pre-partitioned write, or an upstream exchange) —
    the zero-shuffle path scripts/demo_bucketing.py demonstrates for
    the join lowering, extended here to the NFA executor.

    ``max_partials_per_state`` (opt-in state guard, default None=exact):
    bound the per-key per-NFA-state partial-match tables, dropping the
    oldest partials deterministically on breach — see advance_core.
    Drop counts surface on the returned DataFrame's ``guard_drops``
    accumulator (read ``.value`` after an action) and as executor-side
    warnings; never silent."""
    from ._serde import ensure_shippable

    ensure_shippable()
    cap = max_partials_per_state
    if strategy == "auto":
        strategy = "partition"
    if strategy == "partition":
        if mode == "flat":
            return _run_batch_partition(df, cp, assume_clustered, cap=cap)
        # array mode: the N=1 case of the partition-amortized multi executor
        return _run_batch_multi_partition(df, [cp], emit_cols, assume_clustered, cap=cap)
    pat = cp.pattern
    key_type = df.schema[pat.key].dataType
    acc = _guard_drops_acc(df, cap)
    df = prefilter(df, cp, extra_cols=emit_cols if mode == "array" else ())
    if mode == "flat":
        schema = match_schema_flat(cp, key_type)

        def fn(key, pdf):
            g = pdf.sort_values([pat.ts_col, pat.tiebreak_col]).reset_index(drop=True)
            stats = {}
            res = match_group_nfa(cp, g, cap=cap, stats=stats)
            _flush_guard_stats(stats, acc)
            return matches_to_pdf_flat(cp, g, key[0], res=res)

    else:
        schema = match_schema_array(pat, emit_cols, key_type)

        def fn(key, pdf):
            g = pdf.sort_values([pat.ts_col, pat.tiebreak_col]).reset_index(drop=True)
            stats = {}
            res = match_group_nfa(cp, g, cap=cap, stats=stats)
            _flush_guard_stats(stats, acc)
            return matches_to_pdf_array(cp, g, key[0], emit_cols, res=res)

    out = df.groupBy(pat.key).applyInPandas(fn, schema=schema)
    out.guard_drops = acc
    return out


def _run_batch_partition(df, cp: CompiledPattern, assume_clustered=False, cap=None):
    """Partition-amortized NFA execution (see run_batch docstring)."""
    pat = cp.pattern
    key_type = df.schema[pat.key].dataType
    schema = match_schema_flat(cp, key_type)
    out_cols = schema.fieldNames()
    acc = _guard_drops_acc(df, cap)
    base = prefilter(df, cp)
    if assume_clustered:
        rep = base.sortWithinPartitions(pat.key, pat.ts_col, pat.tiebreak_col)
    else:
        rep = base.repartition(cpu_parallelism(df), pat.key).sortWithinPartitions(
            pat.key, pat.ts_col, pat.tiebreak_col
        )
    all_vars = cp.all_vars()
    kleene_all = set()
    for a in cp.alternatives:
        kleene_all |= set(a.kleene_vars)
    var_is_kleene = [(v, v in kleene_all) for v in all_vars]
    ts_col, tb_col, key_col = pat.ts_col, pat.tiebreak_col, pat.key

    def gen(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        n = len(pdf)
        if n == 0:
            return
        cols_all = {c: pdf[c].to_numpy() for c in pdf.columns}
        keys = cols_all[key_col]
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        bounds = np.concatenate([[0], change, [n]])
        ts_all = cols_all[ts_col].astype("datetime64[ns]").astype(np.int64)
        masks_all = unary_masks(cp, cols_all, n)
        tb_all = cols_all[tb_col]
        rows = []
        stats = {}
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            sub_cols = {c: a[s:e] for c, a in cols_all.items()}
            store = _ColStore.from_cols(sub_cols)
            masks = {
                aid: ({sid: m[s:e] for sid, m in sm.items()}, [m[s:e] for m in nm])
                for aid, (sm, nm) in masks_all.items()
            }
            res = match_core(cp, store, ts_all[s:e], masks, cap=cap, stats=stats)
            if not res:
                continue
            key_val = keys[s]
            tb = tb_all[s:e]
            for alt_id, binding in res:
                row = [key_val, alt_id]
                for v, is_k in var_is_kleene:
                    p = binding.get(v)
                    if is_k:
                        if p is None:
                            row += [None, None, None]
                        else:
                            pp = p if isinstance(p, tuple) else (p,)
                            row += [len(pp), int(tb[pp[0]]), int(tb[pp[-1]])]
                    else:
                        row.append(None if p is None else int(tb[p]))
                rows.append(tuple(row))
        _flush_guard_stats(stats, acc)
        yield pd.DataFrame(rows, columns=out_cols)

    out = rep.mapInPandas(gen, schema=schema)
    out.guard_drops = acc
    return out


def prefilter(df, cp: CompiledPattern, extra_cols=()):
    """Scan-side reduction: keep only rows any slot/neg could use, and only
    the columns the pattern references (→ parquet predicate pushdown +
    column pruning via Catalyst)."""
    pat = cp.pattern
    ors = None
    needed = {pat.key, pat.ts_col, pat.tiebreak_col, *extra_cols}
    for alt in cp.alternatives:
        for s in alt.slots:
            c = s.unary.spark_col({s.var: df})
            ors = c if ors is None else (ors | c)
        for ng in alt.negs:
            c = ng.unary.spark_col({ng.var: df})
            ors = c if ors is None else (ors | c)
    for v, cols in cp.needed_cols.items():
        needed.update(cols)
    needed_present = [c for c in df.columns if c in needed]
    out = df.select(*needed_present)
    if ors is not None:
        out = out.filter(ors)
    return out


# --------------------------------------------------------------------------
# multi-pattern execution (SURVEY.md §2.3 E7: the reference's CEP() takes a
# pattern list; we run all compiled patterns in ONE scan + ONE shuffle)


def prefilter_multi(df, cps, extra_cols=()):
    """Union prefilter across patterns: a row survives if ANY pattern's
    slot/negation could use it; columns = union of referenced columns."""
    ors = None
    needed = set(extra_cols)
    for cp in cps:
        pat = cp.pattern
        needed |= {pat.key, pat.ts_col, pat.tiebreak_col}
        for v, cols in cp.needed_cols.items():
            needed.update(cols)
        for alt in cp.alternatives:
            for s in alt.slots:
                c = s.unary.spark_col({s.var: df})
                ors = c if ors is None else (ors | c)
            for ng in alt.negs:
                c = ng.unary.spark_col({ng.var: df})
                ors = c if ors is None else (ors | c)
    out = df.select(*[c for c in df.columns if c in needed])
    if ors is not None:
        out = out.filter(ors)
    return out


def run_batch_multi(df, cps, emit_cols=("turn_idx", "role", "tool", "ts"),
                    strategy="auto", assume_clustered=False,
                    max_partials_per_state=None):
    """Run N compiled patterns over one keyed scan: single shuffle,
    single sort, one matcher pass per pattern; output is the array
    schema with ``pattern_id`` distinguishing the patterns.

    Strategies: ``'shared'`` merges the patterns into ONE prefix-shared
    automaton (merge.merge_compiled) — states provably holding identical
    partial tables across patterns are advanced once per event; windows
    may differ (the merge runs under the max window with exact per-tag
    span re-checks at accept).  ``'partition'`` runs one automaton per pattern
    over the same frame (unary masks still shared via the cross-pattern
    memo).  ``'auto'`` picks ``'shared'`` when the patterns are
    mergeable and actually share at least one non-initial state, else
    ``'partition'``.  ``'group'`` keeps the per-key
    groupBy().applyInPandas reference implementation.

    All patterns must share (key, ts_col, tiebreak_col); give each a
    distinct ``Pattern.pattern_id``."""
    from ._serde import ensure_shippable

    ensure_shippable()
    if not cps:
        raise ValueError("no patterns")
    p0 = cps[0].pattern
    for cp in cps[1:]:
        p = cp.pattern
        if (p.key, p.ts_col, p.tiebreak_col) != (p0.key, p0.ts_col, p0.tiebreak_col):
            raise ValueError("run_batch_multi patterns must share key/ts/tiebreak columns")
    ids = [cp.pattern.pattern_id for cp in cps]
    if len(set(ids)) != len(ids):
        raise ValueError(f"pattern_id values must be distinct, got {ids}")
    cap = max_partials_per_state
    merged = None
    if strategy == "auto":
        strategy = "partition"
        from .merge import merge_compiled, mergeable

        if len(cps) > 1 and mergeable(cps):
            cand = merge_compiled(cps)
            n_orig = sum(len(a.states) for cp in cps for a in cp.alternatives)
            n_alts = sum(len(cp.alternatives) for cp in cps)
            # the empty state always merges (n_alts-1 saved for free);
            # pick the shared automaton only when NON-initial states
            # merge too — that's where per-event work is actually saved
            if len(cand.alternatives[0].states) < n_orig - (n_alts - 1):
                strategy, merged = "shared", cand
    if strategy == "shared":
        if merged is None:
            from .merge import merge_compiled

            merged = merge_compiled(cps)
        return _run_batch_multi_partition(
            df, cps, emit_cols, assume_clustered, cap=cap, merged=merged,
        )
    if strategy == "partition":
        return _run_batch_multi_partition(df, cps, emit_cols, assume_clustered, cap=cap)
    key_type = df.schema[p0.key].dataType
    schema = match_schema_array(p0, emit_cols, key_type)
    acc = _guard_drops_acc(df, cap)
    base = prefilter_multi(df, cps, extra_cols=emit_cols)

    def fn(key, pdf):
        g = pdf.sort_values([p0.ts_col, p0.tiebreak_col]).reset_index(drop=True)
        stats = {}
        outs = []
        for cp in cps:
            res = match_group_nfa(cp, g, cap=cap, stats=stats)
            outs.append(matches_to_pdf_array(cp, g, key[0], emit_cols, res=res))
        _flush_guard_stats(stats, acc)
        return pd.concat(outs, ignore_index=True)

    out = base.groupBy(p0.key).applyInPandas(fn, schema=schema)
    out.guard_drops = acc
    return out


def _run_batch_multi_partition(df, cps, emit_cols, assume_clustered=False, cap=None,
                               merged=None):
    """Partition-amortized multi-pattern execution (see run_batch_multi).

    With ``merged`` (a merge.merge_compiled automaton) the N patterns
    advance as ONE prefix-shared NFA per group; emissions come back
    tagged ``((pattern_index, alt_id), binding)`` and are regrouped per
    pattern for row building."""
    p0 = cps[0].pattern
    key_type = df.schema[p0.key].dataType
    schema = match_schema_array(p0, emit_cols, key_type)
    acc = _guard_drops_acc(df, cap)
    base = prefilter_multi(df, cps, extra_cols=emit_cols)
    if assume_clustered:
        rep = base.sortWithinPartitions(p0.key, p0.ts_col, p0.tiebreak_col)
    else:
        rep = base.repartition(cpu_parallelism(df), p0.key).sortWithinPartitions(
            p0.key, p0.ts_col, p0.tiebreak_col
        )
    ts_col, tb_col, key_col = p0.ts_col, p0.tiebreak_col, p0.key

    def gen(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        n = len(pdf)
        if n == 0:
            return
        cols_all = {c: pdf[c].to_numpy() for c in pdf.columns}
        keys = cols_all[key_col]
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        bounds = np.concatenate([[0], change, [n]])
        ts_all = cols_all[ts_col].astype("datetime64[ns]").astype(np.int64)
        shared = {}  # one evaluation per distinct predicate across ALL patterns
        run_cps = [merged] if merged is not None else cps
        masks_by_cp = [unary_masks(cp, cols_all, n, cache=shared) for cp in run_cps]
        rows = []
        stats = {}
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            sub_cols = {c: a[s:e] for c, a in cols_all.items()}
            store = _ColStore.from_cols(sub_cols)
            for ci, cp in enumerate(run_cps):
                masks = {
                    aid: ({sid: m[s:e] for sid, m in sm.items()}, [m[s:e] for m in nm])
                    for aid, (sm, nm) in masks_by_cp[ci].items()
                }
                res = match_core(cp, store, ts_all[s:e], masks, cap=cap, stats=stats)
                if not res:
                    continue
                if merged is not None:
                    by_cp: dict = {}
                    for (pi, alt_id), b in res:
                        by_cp.setdefault(pi, []).append((alt_id, b))
                    for pi, lst in by_cp.items():
                        rows.extend(
                            array_match_rows(cps[pi], keys[s], emit_cols, lst, sub_cols)
                        )
                else:
                    rows.extend(
                        array_match_rows(cp, keys[s], emit_cols, res, sub_cols)
                    )
        _flush_guard_stats(stats, acc)
        if rows:
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    out = rep.mapInPandas(gen, schema=schema)
    out.guard_drops = acc
    return out
