"""Pattern AST — the query surface of the engine.

Mirrors the reference's `Pattern(PatternStructure, Formula, timedelta)`
triple (reference `Pattern.py` / `PatternStructure.py`, SURVEY.md §2.1;
the reference checkout was empty this session so citations are to the
survey's reconstruction of yuvadius/CEP):

  reference                      ours
  -------------------------      ------------------------------------
  QItem(event_type, name)        Ev(name, where=<unary Cond>)
  SeqOperator([...])             Seq(*parts)
  AndOperator([...])             And_(*parts)
  OrOperator([...])              Or_(*alternatives)
  KleeneClosureOperator(arg)     Kleene(Ev(...))
  NegationOperator(arg)          Neg(Ev(...))          (inside Seq/And_)
  Pattern(s, f, window)          Pattern(s, where=f, window=w)

The reference binds leaves by event *type* on a well-known column; we
generalize: a leaf carries an arbitrary unary condition (``Ev("a",
where=attr("a","role") == lit("user"))``) plus sugar ``Ev("a", role=
"user")`` for equality on columns.

Pinned semantics (SURVEY.md §2.4, encoded in tests/oracle_cep.py):

1. all-matches: every event combination satisfying the pattern is
   emitted (no selection/consumption policies — those arrived only in
   the OpenCEP successor).
2. event order is lexicographic ``(ts, tiebreak)``; SEQ requires
   strictly increasing order between successive bindings.
3. window: ``max(ts) - min(ts) <= window`` (inclusive).
4. Kleene: one-or-more; emits every non-empty ordered subset of
   qualifying events (powerset semantics).
5. Neg inside Seq guards the gap between its positive neighbours
   (strictly between in (ts, tiebreak) order).  Leading/trailing Neg at
   the root Seq is position-free (reference NegationOperator): the
   forbidden interval is window-bounded before the first / after the
   last positive event, so a pattern window is required.  Streaming
   seals trailing-neg matches at first.ts + window.
6. AND binds distinct events, any arrival order, all assignments
   (permutations of distinct events count separately when both satisfy
   the per-variable conditions).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta
from typing import Optional

from .conditions import Cond, TRUE, attr, lit

__all__ = ["Ev", "Seq", "And_", "Or_", "Kleene", "Neg", "Pattern", "Node"]


class Node:
    """Base class for pattern-structure nodes."""

    def leaves(self) -> list["Ev"]:
        raise NotImplementedError

    def var_names(self) -> list[str]:
        return [l.name for l in self.leaves()]


def _where_from_kwargs(name: str, where: Optional[Cond], eq: dict) -> Cond:
    cond = where if where is not None else TRUE
    for col, val in eq.items():
        cond = cond & (attr(name, col) == lit(val))
    return cond


@dataclass(frozen=True, eq=False)
class Ev(Node):
    """Leaf: bind one event to variable ``name`` (reference QItem).

    ``Ev("a", role="user")`` == ``Ev("a", where=attr("a","role")==lit("user"))``.
    """

    name: str
    where: Cond = field(default=TRUE)

    def __init__(self, name: str, where: Optional[Cond] = None, **eq):
        object.__setattr__(self, "name", name)
        w = _where_from_kwargs(name, where, eq)
        if name not in w.vars() and w.vars():
            raise ValueError(f"Ev({name!r}) condition never references {name!r}")
        # multi-var conjuncts are legal: the compiler hoists them into the
        # pattern's transition conditions (or the Neg spec's conditions).
        object.__setattr__(self, "where", w)

    def leaves(self):
        return [self]

    def __repr__(self):
        return f"Ev({self.name!r})"


@dataclass(frozen=True, eq=False)
class Seq(Node):
    """Ordered conjunction (reference SeqOperator)."""

    parts: tuple

    def __init__(self, *parts: Node):
        if len(parts) < 1:
            raise ValueError("Seq needs at least one part")
        object.__setattr__(self, "parts", tuple(parts))

    def leaves(self):
        out = []
        for p in self.parts:
            out.extend(p.leaves())
        return out

    def __repr__(self):
        return f"Seq{self.parts!r}"


@dataclass(frozen=True, eq=False)
class And_(Node):
    """Unordered conjunction (reference AndOperator)."""

    parts: tuple

    def __init__(self, *parts: Node):
        if len(parts) < 2:
            raise ValueError("And_ needs at least two parts")
        object.__setattr__(self, "parts", tuple(parts))

    def leaves(self):
        out = []
        for p in self.parts:
            out.extend(p.leaves())
        return out

    def __repr__(self):
        return f"And_{self.parts!r}"


@dataclass(frozen=True, eq=False)
class Or_(Node):
    """Disjunction of alternatives (reference OrOperator)."""

    parts: tuple

    def __init__(self, *parts: Node):
        if len(parts) < 2:
            raise ValueError("Or_ needs at least two alternatives")
        object.__setattr__(self, "parts", tuple(parts))

    def leaves(self):
        # union of alternative leaves; var sets may differ per alternative
        out = []
        seen = set()
        for p in self.parts:
            for l in p.leaves():
                if l.name not in seen:
                    seen.add(l.name)
                    out.append(l)
        return out

    def __repr__(self):
        return f"Or_{self.parts!r}"


@dataclass(frozen=True, eq=False)
class Kleene(Node):
    """One-or-more closure (reference KleeneClosureOperator).

    Over a leaf: emits every non-empty ordered subset of qualifying
    events (powerset semantics).  ``max_len`` bounds emission arity;
    ``None`` = unbounded (exact parity mode).  A bound is
    parity-breaking and exists for the SQL oracle and for hot-key
    protection — the executor logs when it truncates (no silent caps).

    Over a composite sub-structure (``Kleene(Seq(a, b))``): one-or-more
    sequential repetitions of the sub-structure, every event of
    repetition j strictly before every event of repetition j+1.  With
    ``max_len`` the compiler expands it into an Or_ of fixed repetition
    chains (fresh variables ``v__1 .. v__r``;
    compiler._expand_composite_kleene), so every executor and the SQL
    oracle handle it for free.  WITHOUT ``max_len`` the inner leaves
    become a looping slot GROUP executed as a sub-automaton repetition
    in the NFA (compiler._successors) — each leaf binds an element
    tuple, one element per repetition; the inner structure must then be
    a Seq of plain event leaves, and the join lowering (which has no
    fixed-arity expansion for interleaved repetitions) rejects it.

    ``adjacent`` (leaf Kleene only): a condition between each pair of
    CONSECUTIVE CHOSEN events, written over the pseudo-variable
    ``{name}__prev`` and ``{name}`` — e.g. a strictly-rising run:
    ``Kleene(Ev("k"), adjacent=attr("k","value") > attr("k__prev","value"))``
    (the reference's lambda over successive Kleene bindings).
    """

    inner: Node
    max_len: Optional[int] = None
    adjacent: Optional[Cond] = None

    def __init__(self, inner: Node, max_len: Optional[int] = None,
                 adjacent: Optional[Cond] = None):
        if not isinstance(inner, Node):
            raise ValueError("Kleene inner must be a pattern node")
        if adjacent is not None:
            if not isinstance(inner, Ev):
                raise ValueError("adjacent conditions require a leaf Kleene")
            allowed = {inner.name, f"{inner.name}__prev"}
            if not set(adjacent.vars()) <= allowed:
                raise ValueError(
                    f"adjacent condition may only reference {sorted(allowed)}; "
                    f"got {sorted(adjacent.vars())}"
                )
        object.__setattr__(self, "inner", inner)
        object.__setattr__(self, "max_len", max_len)
        object.__setattr__(self, "adjacent", adjacent)

    @property
    def name(self):
        if not isinstance(self.inner, Ev):
            raise AttributeError("composite Kleene has no single variable name")
        return self.inner.name

    def leaves(self):
        return self.inner.leaves()

    def __repr__(self):
        return f"Kleene({self.inner!r})"


@dataclass(frozen=True, eq=False)
class Neg(Node):
    """Negated leaf (reference NegationOperator): the match is invalid if
    a qualifying event occurs in the guarded scope (between the positive
    neighbours for Seq; window-bounded before/after the match for
    leading/trailing position; anywhere inside the match span for And_)."""

    inner: Ev

    def __init__(self, inner: Ev):
        if not isinstance(inner, Ev):
            raise ValueError("v1 supports Neg over a single event leaf")
        object.__setattr__(self, "inner", inner)

    @property
    def name(self):
        return self.inner.name

    def leaves(self):
        return []  # negated vars are not part of the output binding

    def __repr__(self):
        return f"Neg({self.inner!r})"


@dataclass(frozen=True)
class Pattern:
    """The full query: structure + global condition + time window.

    ``key`` partitions the stream (reference: implicit single stream; our
    streams are keyed by conversation/user).  ``ts_col``/``tiebreak_col``
    define the pinned total event order ``(ts, tiebreak)``.
    """

    structure: Node
    where: Cond = TRUE
    window: Optional[timedelta] = None
    key: str = "conv_id"
    ts_col: str = "ts"
    tiebreak_col: str = "turn_idx"
    pattern_id: str = "p0"

    def var_names(self) -> list[str]:
        return self.structure.var_names()

    def window_seconds(self) -> Optional[float]:
        return self.window.total_seconds() if self.window is not None else None
