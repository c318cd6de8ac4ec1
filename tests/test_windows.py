"""Window operators vs DuckDB + streaming tumbling parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cep_spark import windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _canon(rows):
    # streaming casts ts NTZ -> TIMESTAMP (UTC session): strip tzinfo so
    # batch (naive) and stream (aware-UTC) rows compare equal
    def norm(v):
        return v.replace(tzinfo=None) if hasattr(v, "tzinfo") and v.tzinfo else v

    return sorted(tuple(norm(v) for v in r) for r in rows)


@pytest.mark.parametrize("name", sorted(windows.QUERIES))
def test_windows_vs_oracle(name, spark, con):
    df = windows.QUERIES[name](spark, SF)
    cols = df.columns
    s = _canon(tuple(r) for r in df.collect())
    o = _canon(con.execute(windows.ORACLES[name]).df()[cols].itertuples(index=False, name=None))
    assert s == o and len(s) > 0


def test_stream_tumbling_parity(spark, tmp_path):
    """Streaming watermarked tumbling counts == batch counts for all
    windows sealed by the final watermark (flush row seals everything)."""
    ev = pd.read_parquet(f"{SF}/events.parquet")
    flush = ev.iloc[[0]].copy()
    flush["user_id"] = -1
    flush["ts"] = ev["ts"].max() + pd.Timedelta(days=30)
    allv = pd.concat([ev, flush], ignore_index=True).sort_values("ts").reset_index(drop=True)
    src = tmp_path / "src"
    src.mkdir()
    n = len(allv)
    for i in range(4):
        part = allv.iloc[i * n // 4 : (i + 1) * n // 4].copy()
        part["ts"] = part["ts"].astype("datetime64[us]")
        part.to_parquet(src / f"p{i:03d}.parquet", index=False)

    sdf = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windows.stream_tumbling_counts(sdf, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("wt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = _canon(
        tuple(r) for r in spark.sql("SELECT * FROM wt WHERE user_id != -1").collect()
    )
    batch = _canon(
        tuple(r)
        for r in windows.q_tumbling(spark, SF).collect()
    )
    assert got == batch and len(got) > 0


def test_stream_session_parity(spark, tmp_path):
    """Streaming session windows == batch session windows once the
    watermark (flush row) closes every session."""
    ev = pd.read_parquet(f"{SF}/events.parquet")
    flush = ev.iloc[[0]].copy()
    flush["user_id"] = -1
    flush["ts"] = ev["ts"].max() + pd.Timedelta(days=30)
    allv = pd.concat([ev, flush], ignore_index=True).sort_values("ts").reset_index(drop=True)
    src = tmp_path / "src"
    src.mkdir()
    n = len(allv)
    for i in range(3):
        part = allv.iloc[i * n // 3 : (i + 1) * n // 3].copy()
        part["ts"] = part["ts"].astype("datetime64[us]")
        part.to_parquet(src / f"p{i:03d}.parquet", index=False)
    sdf = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windows.stream_session_counts(sdf, watermark="0 seconds")
    q = (
        out.writeStream.format("memory").queryName("ws").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = _canon(tuple(r) for r in spark.sql("SELECT * FROM ws WHERE user_id != -1").collect())
    batch = _canon(tuple(r) for r in windows.q_session(spark, SF).collect())
    assert got == batch and len(got) > 0
