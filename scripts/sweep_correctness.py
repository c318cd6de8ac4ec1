"""Local stand-in for the driver's correctness sweep: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin in DuckDB over the same parquet tables, then compare row count,
schema (column names sorted), and canonicalized values.

Usage::

    python scripts/sweep_correctness.py [query ...]   # default: all
    SWEEP_SF_DIR=/root/testdata/sf0.01 python scripts/sweep_correctness.py

Exit status 1 if any entry mismatches or errors.
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; our oracles are designed exact, so
        # only normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 2**53:
            return float(v)
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_canon(r[i])) for i in order) for r in data
    ), [cols[i] for i in order]


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F  # noqa: F401 (session warm)

    import __spark_entry__ as entry
    from cep_spark.session import get_spark

    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark(os.environ.get("SWEEP_MASTER", "local[8]"),
                      shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        res = {"rows_match": None, "schema_match": None, "hash_match": None}
        try:
            sdf = fn(spark, sf_dir)
            srows, scols = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
            sql = oracles.get(name)
            if sql is None:
                res = {"rows_only": len(srows)}
                print(f"{name}: rows-only ({len(srows)})")
                continue
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows, ocols = _rows(ocols, cur.fetchall())
            res["rows_match"] = len(srows) == len(orows)
            res["schema_match"] = scols == ocols
            res["hash_match"] = srows == orows
            ok = all(res.values())
            bad += not ok
            tag = "OK " if ok else "FAIL"
            print(f"{tag} {name}: spark={len(srows)} oracle={len(orows)} "
                  f"schema={res['schema_match']} hash={res['hash_match']}")
            if not res["schema_match"]:
                print(f"     spark cols:  {scols}\n     oracle cols: {ocols}")
            if res["schema_match"] and not res["hash_match"]:
                sset, oset = set(srows), set(orows)
                for r in list(sset - oset)[:3]:
                    print(f"     spark-only: {r}")
                for r in list(oset - sset)[:3]:
                    print(f"     oracle-only: {r}")
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            bad += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(json.dumps({"failures": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
