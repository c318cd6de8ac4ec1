"""Pipeline operators vs DuckDB oracle (sf0.001 for speed; the driver
re-runs the same pairs at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from cep_spark.pipeline import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return c


def _canon(rows):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r) for r in rows
    )


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_pipeline_vs_oracle(name, spark, con):
    df = registry.queries()[name](spark, SF)
    cols = df.columns
    s_rows = _canon(tuple(r) for r in df.collect())
    o = con.execute(registry.oracle_sql()[name]).df()
    o_rows = _canon(o[cols].itertuples(index=False, name=None))
    assert s_rows == o_rows, f"{name}: spark={len(s_rows)} oracle={len(o_rows)}"
    assert len(s_rows) > 0 or name in ("doc_ngram_jaccard", "doc_minhash_lsh")
