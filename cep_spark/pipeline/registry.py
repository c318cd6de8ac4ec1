"""Registry of pipeline operators for the driver contract
(__spark_entry__.queries() / oracle_sql())."""

from __future__ import annotations

from . import docs, embeddings


def queries() -> dict:
    out = {}
    out.update(docs.QUERIES)
    out.update(embeddings.QUERIES)
    return out


def oracle_sql() -> dict:
    out = {}
    out.update(docs.ORACLES)
    out.update(embeddings.ORACLES)
    return out
