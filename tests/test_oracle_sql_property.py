"""Property test: the GENERATED DuckDB SQL (join_planner.oracle_sql_for)
≡ the brute-force replica on random pattern ASTs and random groups.

Spark-free (replica + DuckDB only), so hypothesis can sweep the SQL
generator's branches — order pairs, distinctness, window bands, all
four negation kinds, composite-Kleene arity unions, adjacency pairs —
far faster than the three-way Spark e2e tests."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cep_spark.compiler import compile_pattern
from cep_spark.join_planner import expand_fixed, oracle_sql_for
from oracle_cep import match_group
from test_property_random_patterns import ROLES, pattern


@st.composite
def sql_scenario(draw):
    pat = draw(pattern())
    n = draw(st.integers(3, 11))
    seed = draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    ts0 = pd.Timestamp("2026-01-01")
    gaps = rng.integers(0, 60, n)
    g = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": rng.choice(ROLES, n),
            "tool": rng.choice(["python", "sql"], n),
            "ts": (ts0 + pd.to_timedelta(np.cumsum(gaps), unit="s")).astype("datetime64[us]"),
            "value": rng.uniform(0, 100, n).round(1),
        }
    )
    return pat, g


def _replica_fixed(pat, g):
    """Replica matches flattened to the oracle's output rows:
    (alt_id, {var -> turn_idx}) with kleene vars as (len, first, last)."""
    cp = compile_pattern(pat)
    kleene_all = set()
    for a in cp.alternatives:
        kleene_all |= set(a.kleene_vars)
    all_vars = cp.all_vars()
    g2 = g.sort_values(["ts", "turn_idx"]).reset_index(drop=True)
    tb = g2["turn_idx"].to_numpy()
    out = []
    for b in match_group(pat, g2):
        alt = b.pop("_alt")
        row = [alt]
        for v in all_vars:
            p = b.get(v)
            if v in kleene_all:
                if p is None:
                    row += [None, None, None]
                else:
                    pp = p if isinstance(p, tuple) else (p,)
                    row += [len(pp), int(tb[pp[0]]), int(tb[pp[-1]])]
            else:
                row.append(None if p is None else int(tb[p]))
        out.append(tuple(row))
    return sorted(out, key=repr)


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(sc=sql_scenario())
def test_generated_sql_matches_replica(sc):
    pat, g = sc
    try:
        cp = compile_pattern(pat)
        expand_fixed(cp)  # unbounded kleene -> join lowering unsupported
    except ValueError:
        return
    sql = oracle_sql_for(cp, "events")
    con = duckdb.connect()
    con.register("events", g)
    o = con.execute(sql).df()
    # oracle columns: key, alt_id, then per-var columns in all_vars order
    got = sorted(
        (tuple(None if pd.isna(v) else int(v) for v in r[1:]) for r in
         o.itertuples(index=False, name=None)),
        key=repr,
    )
    want = _replica_fixed(pat, g)
    assert got == want, f"{pat.structure!r}\nsql rows={got}\nreplica={want}\n{g}"
