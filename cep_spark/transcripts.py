"""Deterministic synthetic transcript tables (FIXTURES.md §1).

The BASELINE input is an Iceberg/parquet table of multi-turn
conversation transcripts: (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp).  No driver-provided transcripts
exist, so tests/bench synthesize them here — seeded, pure NumPy, fully
reproducible (per-turn text equality is part of the parity invariant).

Variants:
* ``gen_transcripts``          — base table
* ``skew=...``                 — one hot conversation with a share of
                                 all turns (FIXTURES.md §1a), exercises
                                 salting / hot-key handling
* ``gen_disorder``             — arrival-shuffled + duplicated + late
                                 rows for streaming tests (§1b)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser", "sql", "none"])

__all__ = ["gen_transcripts", "gen_disorder", "write_parquet", "TRANSCRIPT_COLUMNS"]

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def gen_transcripts(
    n_conv: int = 100,
    seed: int = 42,
    start: str = "2026-01-01T00:00:00",
    mean_gap_s: float = 20.0,
    max_len: int = 200,
    skew: float | None = None,
    geom_p: float = 0.15,
) -> pd.DataFrame:
    """Deterministic transcripts; rows sorted by (conv_id, turn_idx).
    ``geom_p`` sets conversation length ~ 1+Geometric(p) (mean 1+1/p)."""
    rng = np.random.default_rng(seed)
    lens = 1 + rng.geometric(geom_p, size=n_conv)
    lens = np.minimum(lens, max_len)
    if skew is not None:
        # one hot conversation receives `skew` fraction of ALL turns
        total = int(lens.sum())
        lens[0] = max(int(skew * total / (1 - skew)), lens[0])
    n = int(lens.sum())

    conv_ids = np.repeat([f"c{i:08d}" for i in range(n_conv)], lens)
    starts = np.repeat(np.arange(n_conv), lens)  # conv index per row
    turn_idx = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)

    # roles: markovian-ish draw (vectorized: sample per-row, then force
    # turn 0 to "user" — deterministic function of the seed either way)
    role_draw = rng.random(n)
    prev_kind = np.zeros(n, dtype=np.int8)
    # simple cyclic tendency: user -> assistant (p=.9), assistant -> tool
    # (p=.35) else user, tool -> assistant (p=.95).  Vectorize by drawing
    # per-position uniforms and resolving the chain per conversation via
    # a scan on small alphabets (3 states) — cheap enough in NumPy chunks.
    roles = np.empty(n, dtype=object)
    r = role_draw
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    state = np.zeros(n_conv, dtype=np.int8)  # 0=user
    max_l = int(lens.max())
    roles_idx = np.zeros(n, dtype=np.int8)
    for t in range(max_l):
        active = lens > t
        pos = offs[active] + t
        s = state[active]
        u = r[pos]
        ns = np.where(
            s == 0,
            np.where(u < 0.9, 1, 0),  # user -> assistant else user
            np.where(
                s == 1,
                np.where(u < 0.35, 2, 0),  # assistant -> tool else user
                np.where(u < 0.95, 1, 0),  # tool -> assistant else user
            ),
        ).astype(np.int8)
        if t == 0:
            ns = np.zeros_like(ns)  # conversations start with a user turn
        roles_idx[pos] = ns
        state[active] = ns
    roles = ROLES[roles_idx]

    tool_draw = rng.zipf(1.5, size=n) - 1
    tool_vals = TOOLS[np.minimum(tool_draw, len(TOOLS) - 1)]
    tools = np.where(roles_idx == 2, tool_vals, None)

    conv_start = (
        np.datetime64(start)
        + (rng.random(n_conv) * 24 * 3600 * 1000).astype("timedelta64[ms]")
    )
    gaps_ms = np.maximum((rng.exponential(mean_gap_s, n) * 1000).astype(np.int64), 1)
    # cumulative within conversation: subtract the running total at offsets
    cum = np.cumsum(gaps_ms)
    base = np.repeat(cum[offs] - gaps_ms[offs], lens)
    rel_ms = cum - base
    ts = np.repeat(conv_start, lens) + rel_ms.astype("timedelta64[ms]")

    # deterministic text (vectorized string build)
    text = pd.Series(roles).str.cat(
        [
            pd.Series(["turn"] * n),
            pd.Series(turn_idx.astype(str)),
            pd.Series(["of"] * n),
            pd.Series(conv_ids),
        ],
        sep=" ",
    )
    filler_words = np.array(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
    fill = filler_words[rng.integers(0, len(filler_words), n)]
    text = text + " " + fill

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": text.to_numpy(),
            "tool": tools,
            "ts": ts.astype("datetime64[us]"),
        }
    )


def gen_disorder(
    base: pd.DataFrame,
    seed: int = 43,
    disorder_s: float = 60.0,
    dup_frac: float = 0.01,
    late_frac: float = 0.005,
    late_by_s: float = 3600.0,
):
    """Arrival-order variant (FIXTURES.md §1b): same rows, shuffled within
    a bounded disorder window, plus verbatim duplicates and a late set.

    Returns (arrival_df, late_expected_df).  ``arrival_df`` has an extra
    ``arrival_seq`` column defining file/arrival order; late rows appear
    at the very end with event-times older than any watermark will allow.
    """
    rng = np.random.default_rng(seed)
    n = len(base)
    ts_ns = base["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
    jitter = (rng.random(n) * disorder_s * 1e9).astype(np.int64)
    arrival_key = ts_ns + jitter

    dup_idx = rng.choice(n, max(int(n * dup_frac), 1), replace=False)
    dup = base.iloc[dup_idx].copy()
    dup_key = arrival_key[dup_idx] + int(1e9)

    late_idx = rng.choice(n, max(int(n * late_frac), 1), replace=False)
    late_key = arrival_key.max() + int(late_by_s * 1e9) + np.arange(len(late_idx))

    arr = pd.concat([base, dup], ignore_index=True)
    keys = np.concatenate([arrival_key, dup_key])
    # move the late originals to the end of the arrival order
    keys[late_idx] = late_key
    order = np.argsort(keys, kind="stable")
    arr = arr.iloc[order].reset_index(drop=True)
    arr["arrival_seq"] = np.arange(len(arr), dtype=np.int64)
    late_expected = base.iloc[late_idx][["conv_id", "turn_idx"]].reset_index(drop=True)
    return arr, late_expected


def write_parquet(df: pd.DataFrame, path: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
        + ([("arrival_seq", pa.int64())] if "arrival_seq" in df.columns else [])
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), path)
    return path
