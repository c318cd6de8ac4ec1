"""Pattern compiler: AST -> NFA transition tables (plain data).

Replaces the reference's evaluation-tree builder (reference
`Tree.py`/`TreeBasedEvaluationMechanism.py`, SURVEY.md §2.3 E6 — which
BASELINE.json explicitly says NOT to port).  Design:

* Or_ nodes are expanded at compile time into Or-free *alternatives*
  (reference OrOperator ≙ union of compiled automata, SURVEY.md §2.1 O4).
* Each alternative's positive leaves become *slots* with a structural
  partial order: slot s may bind only after prereq(s) ⊆ bound set
  (Seq induces prerequisites; And_ does not).  NFA states are the
  reachable down-closed slot sets (a trie merged by bound-set — valid
  because events are processed in the pinned (ts, tiebreak) order, so
  SEQ's order predicates hold by construction and need no runtime check).
* Multi-variable conjuncts of ``Pattern.where`` attach to the first
  transition at which all their variables are bound (the reference's
  `Formula.get_formula_of` pushdown, done once at compile time).
* Negation compiles to *deferred gap checks*: a Neg between Seq parts is
  verified at the transition that opens the following part, against a
  buffer of negative candidate events — this stays correct under Kleene
  powerset branching where eager kill-edges would over-kill branches
  that later extend past the negative event.  Neg inside And_ is a
  *span check* at accept time.
* Kleene slots self-extend while "open" (no later slot bound); each
  qualifying event forks the partial (take / skip), which enumerates
  exactly the non-empty ordered subsets (powerset semantics, SURVEY.md
  §2.4 item 4).

The output (`CompiledPattern`) is plain picklable data — it is shipped
to executors inside the stateful UDF closure (broadcast-equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .conditions import Cond, TRUE, split_conditions, subst
from .pattern import And_, Ev, Kleene, Neg, Node, Or_, Pattern, Seq

__all__ = ["compile_pattern", "CompiledPattern", "CompiledAlternative", "Slot", "NegSpec"]


@dataclass(frozen=True)
class Slot:
    sid: int
    var: str
    unary: Cond  # unary condition on this slot's event
    kleene: bool = False
    kleene_max: Optional[int] = None
    prereq: frozenset = frozenset()  # slot ids that must be bound first
    # leaf-Kleene adjacent-pair condition over ({var}__prev, {var}):
    # checked between each pair of consecutive CHOSEN events
    adjacent: Optional[Cond] = None
    # UNBOUNDED composite Kleene: the sub-structure's leaves become a
    # GROUP of kleene-storage slots cycled by the NFA (sub-automaton
    # repetition) instead of compile-time chain expansion.  `group` is
    # the group id, `grp_idx` the position within one repetition.
    group: Optional[int] = None
    grp_idx: int = 0


@dataclass(frozen=True)
class NegSpec:
    var: str
    unary: Cond
    multi: tuple  # multi-var conjuncts, vars ⊆ {var} ∪ available vars
    kind: str  # "gap" | "span" | "leading" | "trailing"
    # gap: checked on transitions that bind a slot in `post_slots` from a
    #   state where none of `post_slots` is bound; interval =
    #   (partial.last_pos, candidate.pos) exclusive.
    # span: checked at accept; interval = (first_pos, last_pos) exclusive.
    # leading (Seq(Neg(n), ...)): checked at accept; forbidden = any
    #   qualifying n strictly before the match's first event with
    #   last.ts - n.ts <= window (the window bounds the look-back, so a
    #   pattern window is required).
    # trailing (Seq(..., Neg(n))): checked at accept; forbidden = any
    #   qualifying n strictly after the match's last event with
    #   n.ts - first.ts <= window.  Streaming seals such matches at
    #   first.ts + window instead of last.ts (stream.py).
    post_slots: frozenset = frozenset()


@dataclass(frozen=True)
class Transition:
    slot: int
    target: int  # state id
    conds: tuple  # multi-var conjuncts newly evaluable at this binding
    gap_negs: tuple  # indices into alternative.negs to verify
    accepting: bool
    # group-Kleene repetition bind: the slot's var is ALREADY bound —
    # append the event to its element tuple instead of creating it
    repeat: bool = False


@dataclass
class State:
    sid: int
    bound: frozenset  # slot ids
    transitions: list = field(default_factory=list)
    kleene_loops: list = field(default_factory=list)  # (slot_id, conds) open kleenes
    accepting: bool = False
    # in-progress composite-Kleene repetitions: frozenset of
    # (group_id, next_sub_slot_index) — a state is accepting only when
    # every group's current repetition is complete (mid is empty)
    mid: frozenset = frozenset()


@dataclass
class CompiledAlternative:
    alt_id: int
    slots: list  # list[Slot]
    states: list  # list[State]; state 0 = empty set
    negs: list  # list[NegSpec]
    span_negs: tuple  # indices of kind=="span"
    var_order: list  # output variable order (structure order)
    kleene_vars: frozenset
    # composite-Kleene groups: var -> group id (empty when none).  Vars
    # sharing a group are zip-ALIGNED per repetition in multi-var
    # condition evaluation; independent kleene vars cross-product.
    var_group: dict = field(default_factory=dict)


@dataclass
class CompiledPattern:
    pattern: Pattern
    alternatives: list  # list[CompiledAlternative]
    # columns referenced anywhere (for pruning): (var -> set of columns)
    needed_cols: dict
    # union of per-var unary conditions OR'ed together -> prefilter Column
    # built lazily in planners to avoid importing pyspark here.

    def all_vars(self) -> list[str]:
        seen: list[str] = []
        for alt in self.alternatives:
            for v in alt.var_order:
                if v not in seen:
                    seen.append(v)
        return seen


# --------------------------------------------------------------------------
# composite-Kleene expansion: Kleene over a sub-structure -> Or_ of fixed
# repetition chains (bounded powerset over sub-matches, resolved at
# compile time so every executor + the SQL oracle handle it unchanged)


def _all_names(node: Node) -> list[str]:
    """Every variable name in the sub-structure, INCLUDING negated vars
    (they must be renamed per repetition too to stay unique)."""
    if isinstance(node, Ev):
        return [node.name]
    if isinstance(node, (Kleene, Neg)):
        return _all_names(node.inner)
    return [n for p in node.parts for n in _all_names(p)]


def _rename_node(node: Node, mapping: dict) -> Node:
    if isinstance(node, Ev):
        return Ev(mapping.get(node.name, node.name), where=subst(node.where, mapping))
    if isinstance(node, Kleene):
        adj = node.adjacent
        if adj is not None and isinstance(node.inner, Ev):
            old = node.inner.name
            new = mapping.get(old, old)
            adj = subst(adj, {old: new, f"{old}__prev": f"{new}__prev"})
        return Kleene(_rename_node(node.inner, mapping), max_len=node.max_len,
                      adjacent=adj)
    if isinstance(node, Neg):
        return Neg(_rename_node(node.inner, mapping))
    if isinstance(node, (Seq, And_, Or_)):
        return type(node)(*[_rename_node(p, mapping) for p in node.parts])
    raise TypeError(f"unknown node {node!r}")


def _validate_group_inner(node: Kleene) -> None:
    """An unbounded composite Kleene compiles to a looping sub-automaton
    (group slots); that requires the inner structure to be a Seq of
    plain event leaves — repetitions are position-interleaved
    (a1 < b1 < a2 < b2 ...) and each leaf stores its per-repetition
    element tuple."""
    inner = node.inner
    ok = (
        isinstance(inner, Seq)
        and len(inner.parts) >= 2
        and all(isinstance(p, Ev) for p in inner.parts)
    )
    if not ok:
        raise ValueError(
            "unbounded Kleene over a composite sub-structure supports "
            "Seq of plain event leaves only (nested Kleene/Neg/Or_/And_ "
            "inside the repetition requires max_len — those expand to "
            "fixed chains at compile time)"
        )


def _expand_composite_kleene(node: Node, reps: list, force_group: bool = False) -> Node:
    """Bottom-up rewrite of every composite-inner Kleene.  `reps`
    collects (inner_names, [per-repetition rename mapping]) so
    compile_pattern can replicate `where` conjuncts that reference the
    inner variables (ALL-repetitions semantics, mirroring the leaf
    Kleene's per-event condition rule).

    BOUNDED composites expand to an Or_ of fixed repetition chains
    (resolved at compile time so every executor + the SQL oracle handle
    them unchanged).  UNBOUNDED composites — or any composite under
    ``force_group`` — are left in place: `_collect` lowers them to a
    looping GROUP of kleene slots executed as a sub-automaton
    repetition in the NFA (batch.advance_core)."""
    if isinstance(node, (Ev, Neg)):
        return node
    if isinstance(node, Kleene):
        inner = _expand_composite_kleene(node.inner, reps, force_group)
        if isinstance(inner, Ev):
            return node if inner is node.inner else Kleene(inner, max_len=node.max_len)
        if node.max_len is None or force_group:
            _validate_group_inner(Kleene(inner, max_len=node.max_len))
            if node.max_len is None and not force_group:
                raise ValueError(
                    "Kleene over a composite sub-structure requires max_len "
                    "(group lowering lands with _collect support)"
                )
            return node if inner is node.inner else Kleene(inner, max_len=node.max_len)
        names = _all_names(inner)
        mappings = [{v: f"{v}__{j}" for v in names} for j in range(1, node.max_len + 1)]
        reps.append((names, mappings))
        chains = []
        for r in range(1, node.max_len + 1):
            insts = [_rename_node(inner, mappings[j]) for j in range(r)]
            chains.append(insts[0] if r == 1 else Seq(*insts))
        return chains[0] if len(chains) == 1 else Or_(*chains)
    if isinstance(node, (Seq, And_, Or_)):
        return type(node)(
            *[_expand_composite_kleene(p, reps, force_group) for p in node.parts]
        )
    raise TypeError(f"unknown node {node!r}")


# --------------------------------------------------------------------------
# Or_ expansion


def _expand_or(node: Node) -> list[Node]:
    """Return the list of Or-free alternatives of `node`."""
    if isinstance(node, Ev) or isinstance(node, Kleene) or isinstance(node, Neg):
        return [node]
    if isinstance(node, Or_):
        out = []
        for p in node.parts:
            out.extend(_expand_or(p))
        return out
    if isinstance(node, (Seq, And_)):
        # cartesian product of children alternatives
        alts: list[list[Node]] = [[]]
        for p in node.parts:
            sub = _expand_or(p)
            alts = [prefix + [s] for prefix in alts for s in sub]
        ctor = Seq if isinstance(node, Seq) else And_
        return [ctor(*a) for a in alts]
    raise TypeError(f"unknown node {node!r}")


# --------------------------------------------------------------------------
# structural analysis of one Or-free alternative


def _collect(
    node: Node,
    prereq: frozenset,
    slots: list,
    negs: list,
    pending_gap: list,
) -> frozenset:
    """Walk the structure assigning slot ids & prerequisites.

    Returns the frozenset of slot ids contained in `node` (positives only).
    `pending_gap` accumulates Neg nodes seen in a Seq awaiting their
    following part (to fill post_slots).
    """
    if isinstance(node, Ev):
        sid = len(slots)
        slots.append(Slot(sid, node.name, node.where, prereq=prereq))
        return frozenset({sid})
    if isinstance(node, Kleene):
        sid = len(slots)
        slots.append(
            Slot(sid, node.name, node.inner.where, kleene=True,
                 kleene_max=node.max_len, prereq=prereq, adjacent=node.adjacent)
        )
        return frozenset({sid})
    if isinstance(node, Seq):
        acc = frozenset()
        here: frozenset = prereq
        open_negs: list[Neg] = []
        for part in node.parts:
            if isinstance(part, Neg):
                open_negs.append(part)
                continue
            ids = _collect(part, here, slots, negs, pending_gap)
            if open_negs:
                if here == prereq and not acc:
                    # leading Neg inside this Seq: only valid if the Seq
                    # itself has prerequisites (nested case); otherwise
                    # there is no left boundary.
                    if not prereq:
                        raise ValueError(
                            "leading Neg without a preceding positive part is unsupported (v1)"
                        )
                for ng in open_negs:
                    negs.append((ng, ids))  # post_slots = first following part
                open_negs = []
            acc |= ids
            here = prereq | acc
        if open_negs:
            raise ValueError("trailing Neg without a following positive part is unsupported (v1)")
        return acc
    if isinstance(node, And_):
        acc = frozenset()
        for part in node.parts:
            if isinstance(part, Neg):
                negs.append((part, None))  # span-scoped
                continue
            ids = _collect(part, prereq, slots, negs, pending_gap)
            acc |= ids
        return acc
    raise TypeError(f"unexpected node {node!r}")


def _reachable_states(slots: list) -> list:
    """BFS over down-closed slot sets (valid prefixes)."""
    all_ids = frozenset(s.sid for s in slots)
    states: dict[frozenset, State] = {}
    s0 = State(0, frozenset())
    states[frozenset()] = s0
    order = [s0]
    frontier = [s0]
    while frontier:
        nxt = []
        for st in frontier:
            for s in slots:
                if s.sid in st.bound or not s.prereq <= st.bound:
                    continue
                nb = st.bound | {s.sid}
                if nb not in states:
                    ns = State(len(order), nb, accepting=(nb == all_ids))
                    states[nb] = ns
                    order.append(ns)
                    nxt.append(ns)
        frontier = nxt
    return order


def _open_kleenes(bound: frozenset, slots: list) -> list:
    """Kleene slots in `bound` with no bound successor (still extensible)."""
    out = []
    for s in slots:
        if s.kleene and s.sid in bound:
            if not any(o.sid in bound and s.sid in o.prereq for o in slots):
                out.append(s.sid)
    return out


def compile_pattern(pat: Pattern) -> CompiledPattern:
    # composite-Kleene pre-pass: rewrite Kleene(sub-structure) into an
    # Or_ of repetition chains; `where` conjuncts referencing the inner
    # variables replicate per repetition (ALL must hold — conjuncts for
    # repetitions absent from a lower-arity alternative drop out via the
    # standard per-alternative variable filter below).
    reps: list = []
    expanded = _expand_composite_kleene(pat.structure, reps)
    if reps:
        from dataclasses import replace as _dc_replace

        new_conjs = []
        for c in pat.where.conjuncts():
            hits = [(names, maps) for names, maps in reps if set(c.vars()) & set(names)]
            if not hits:
                new_conjs.append(c)
                continue
            if len(hits) > 1:
                raise ValueError(
                    f"condition {c!r} references variables of multiple "
                    f"composite Kleene groups"
                )
            _, maps = hits[0]
            new_conjs.extend(subst(c, mp) for mp in maps)
        w: Cond = TRUE
        for c in new_conjs:
            w = w & c
        pat = _dc_replace(pat, structure=expanded, where=w)

    alternatives = []
    needed: dict[str, set] = {}

    def note_cols(c: Cond):
        for v, col in c.cols():
            needed.setdefault(v, set()).add(col)

    for alt_id, struct in enumerate(_expand_or(pat.structure)):
        slots: list = []
        raw_negs: list = []
        # leading/trailing Neg at the ROOT Seq: no gap boundary exists,
        # so they become window-bounded accept-time checks (the pattern
        # window is the look-back/look-ahead bound and is required).
        edge_negs: list = []  # (Neg, "leading" | "trailing")
        if isinstance(struct, Seq):
            parts = list(struct.parts)
            while parts and isinstance(parts[0], Neg):
                edge_negs.append((parts.pop(0), "leading"))
            while parts and isinstance(parts[-1], Neg):
                edge_negs.append((parts.pop(), "trailing"))
            if not parts:
                raise ValueError("pattern has no positive event leaf")
            if edge_negs:
                if pat.window is None:
                    raise ValueError(
                        "leading/trailing negation requires a pattern window "
                        "(it bounds the forbidden interval)"
                    )
                struct = Seq(*parts)
        _collect(struct, frozenset(), slots, raw_negs, [])
        raw_negs.extend(edge_negs)
        if not slots:
            raise ValueError("pattern has no positive event leaf")

        var_of = {s.sid: s.var for s in slots}
        names = [s.var for s in slots]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate variable names in one alternative: {names}")
        kleene_vars = frozenset(s.var for s in slots if s.kleene)

        # split the global where into unary (merged into slot unary) and
        # multi-var conjuncts (attached to transitions); leaf conditions
        # may also carry multi-var conjuncts — hoist those too.
        unary, multi = split_conditions(pat.where)
        slot_list = []
        for s in slots:
            s_unary, s_multi = split_conditions(s.unary)
            u = s_unary.get(s.var, TRUE)
            if s.var in unary:
                u = u & unary[s.var]
            multi.extend(s_multi)
            slot_list.append(
                Slot(s.sid, s.var, u, s.kleene, s.kleene_max, s.prereq, s.adjacent)
            )
            if s.adjacent is not None:
                # {var}__prev reads the same physical columns as {var}
                for v, col in s.adjacent.cols():
                    base_v = v[: -len("__prev")] if v.endswith("__prev") else v
                    needed.setdefault(base_v, set()).add(col)
        slots = slot_list
        alt_vars = set(names)
        neg_names = {ng.name for ng, _ in raw_negs}
        multi = [c for c in multi if c.vars() <= alt_vars | neg_names]

        # negation specs (extract neg-var conjuncts before kleene checks)
        neg_specs: list[NegSpec] = []
        for ng, post in raw_negs:
            n_unary, n_multi = split_conditions(ng.inner.where)
            u = n_unary.get(ng.name, TRUE) & unary.get(ng.name, TRUE)
            extra = [c for c in n_multi]
            # pull conjuncts of the global where that mention the neg var
            for c in list(multi):
                if ng.name in c.vars():
                    extra.append(c)
                    multi.remove(c)
            for c in extra:
                if c.vars() & kleene_vars:
                    raise ValueError(
                        f"negation condition {c!r} may not reference a Kleene "
                        f"variable (per-element negation scope is undefined)"
                    )
            if post is None:
                kind = "span"
            elif isinstance(post, str):
                kind = post  # "leading" | "trailing"
            else:
                kind = "gap"
            neg_specs.append(
                NegSpec(ng.name, u, tuple(extra), kind,
                        post if isinstance(post, frozenset) else frozenset())
            )
            note_cols(u)
            for c in extra:
                note_cols(c)

        # conjuncts referencing a kleene var are evaluated per-element
        # (ALL must hold): at the kleene self-extension when the other
        # vars are already bound, or by (partial, element) pair expansion
        # at the transition that completes the variable set (batch.py
        # _eval_conds kleene expansion).  Conjuncts over TWO OR MORE
        # kleene vars quantify over the CROSS PRODUCT of their element
        # tuples (batch._eval_kleene_cond mixed-radix expansion; the
        # join lowering replicates the conjunct over every expanded
        # element-variable combination — same semantics).

        for s in slots:
            note_cols(s.unary)
        for c in multi:
            note_cols(c)

        # build states
        states = _reachable_states(slots)
        state_of = {st.bound: st.sid for st in states}
        slot_by_id = {s.sid: s for s in slots}
        vars_of_set = {st.bound: frozenset(var_of[i] for i in st.bound) for st in states}

        gap_idx = [i for i, n in enumerate(neg_specs) if n.kind == "gap"]
        # accept-time negs: span + the window-bounded edge kinds
        span_idx = tuple(
            i for i, n in enumerate(neg_specs)
            if n.kind in ("span", "leading", "trailing")
        )

        for st in states:
            bound_vars = vars_of_set[st.bound]
            for s in slots:
                if s.sid in st.bound or not s.prereq <= st.bound:
                    continue
                nb = st.bound | {s.sid}
                conds = tuple(
                    c
                    for c in multi
                    if c.vars() <= bound_vars | {s.var} and not c.vars() <= bound_vars
                )
                gnegs = tuple(
                    gi
                    for gi in gap_idx
                    if s.sid in neg_specs[gi].post_slots
                    and not (neg_specs[gi].post_slots & st.bound)
                )
                # gap-neg conditions must be evaluable now
                for gi in gnegs:
                    ns = neg_specs[gi]
                    avail = bound_vars | {s.var, ns.var}
                    for c in ns.multi:
                        if not c.vars() <= avail:
                            raise ValueError(
                                f"negation condition {c!r} references variables not "
                                f"bound when the gap closes ({sorted(avail)})"
                            )
                st.transitions.append(
                    Transition(s.sid, state_of[nb], conds, gnegs, nb == frozenset(x.sid for x in slots))
                )
            # kleene self-loops: per-event conds = conjuncts mentioning the
            # kleene var whose OTHER vars are already bound in this state
            # (cross conds with later vars are enforced by pair expansion
            # at the completing transition instead)
            for ksid in _open_kleenes(st.bound, slots):
                k = slot_by_id[ksid]
                kconds = tuple(
                    c for c in multi
                    if k.var in c.vars() and c.vars() <= bound_vars | {k.var}
                )
                st.kleene_loops.append((ksid, kconds))

        # span-neg conditions must be evaluable with all vars bound (they are)
        var_order = [s.var for s in slots]
        alternatives.append(
            CompiledAlternative(
                alt_id, slots, states, neg_specs, span_idx, var_order, kleene_vars
            )
        )

    return CompiledPattern(pat, alternatives, {v: sorted(c) for v, c in needed.items()})
