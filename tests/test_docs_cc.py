"""Connected-component dedup: convergence-probe correctness.

Round-4 ADVICE (high): the original star-forest probe — "no node is
both a center and a leaf" — is NOT sufficient.  A leaf shared by two
centers passes it while still bridging two stars of one component, so
root extraction splits the component.  The fix additionally requires
every leaf to have exactly one center.

This file (1) exhaustively simulates the exact large-star/small-star
operators in pure Python over ALL graphs with n <= 6 nodes, asserting
the strengthened probe never declares convergence on an edge set whose
root extraction disagrees with true connectivity (and demonstrating
the old probe DOES fail), and (2) pins the concrete counter-example
through the real Spark `_cc_components`.
"""

from collections import Counter
from itertools import combinations

import pytest


# ---- pure-Python mirror of docs.py's star operators -------------------


def _sym(e):
    return e | {(v, u) for u, v in e}


def _canon(e):
    return {(min(u, v), max(u, v)) for u, v in e if u != v}


def _star(e, large):
    s = _sym(e)
    nbr = {}
    for u, v in s:
        nbr.setdefault(u, set()).add(v)
    m = {u: min(min(vs), u) for u, vs in nbr.items()}
    out = set()
    if large:
        for u, v in s:
            if v > u:
                out.add((v, m[u]))
    else:
        for u, v in s:
            if v <= u:
                out.add((v, m[u]))
        for u, v in s:
            out.add((u, m[u]))
    return _canon(out)


def _probe_old(e):
    us = {u for u, _ in e}
    vs = {v for _, v in e}
    return not (us & vs)


def _probe_new(e):
    # docs.py: leaf count > 1, or node both leaf and center, = violation
    us = {u for u, _ in e}
    c = Counter(v for _, v in e)
    return not (us & set(c)) and all(n == 1 for n in c.values())


def _true_roots(e, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in e:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


def _extract_roots(e):
    s = _sym(e)
    nbr = {}
    for u, v in s:
        nbr.setdefault(u, set()).add(v)
    return {u: min(min(vs), u) for u, vs in nbr.items()}


def _run(e0, probe, max_rounds=30):
    """Returns True if converged-and-correct, False if converged-wrong,
    None if the probe never fired."""
    nodes = {x for ed in e0 for x in ed}
    truth = _true_roots(e0, nodes)
    e = e0
    for _ in range(max_rounds):
        e = _star(_star(e, True), False)
        if probe(e):
            got = _extract_roots(e)
            return all(got[x] == truth[x] for x in nodes)
    return None


def _all_graphs(max_n):
    for n in range(2, max_n + 1):
        alle = list(combinations(range(n), 2))
        for mask in range(1, 1 << len(alle)):
            yield _canon(
                {alle[i] for i in range(len(alle)) if mask >> i & 1}
            )


def test_exhaustive_probe_n6():
    old_fail = new_fail = 0
    for e0 in _all_graphs(6):
        r_old = _run(e0, _probe_old)
        r_new = _run(e0, _probe_new)
        assert r_new is not None, f"no convergence with new probe: {e0}"
        if r_new is False:
            new_fail += 1
        if r_old is False:
            old_fail += 1
    assert new_fail == 0
    # the old probe really was broken — keep the demonstration honest
    assert old_fail > 0


COUNTER_EDGES = [(0, 4), (1, 3), (2, 3), (2, 4)]  # ONE component


def test_counterexample_spark(spark):
    from cep_spark.pipeline.docs import _cc_components

    edges = spark.createDataFrame(COUNTER_EDGES, "u long, v long")
    out = {
        r["doc_id"]: r["cluster_id"] for r in _cc_components(edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}


def test_two_components_spark(spark):
    from cep_spark.pipeline.docs import _cc_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (6, 7), (5, 7)], "u long, v long"
    )
    out = {
        r["doc_id"]: r["cluster_id"] for r in _cc_components(edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5}
