"""Multimodal plumbing: schema, mapInPandas batching, stubbed decode."""

from __future__ import annotations

import numpy as np
import pytest

from cep_spark.pipeline import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    pdf = mm.synth_media(200, seed=42)
    return spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA_DDL)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00\x01")


def test_fake_decode_deterministic():
    a = mm.decode_image(b"payload", fake=True)
    b = mm.decode_image(b"payload", fake=True)
    assert a.shape == (4, 4, 3) and a.dtype == np.uint8
    assert (a == b).all()


def test_media_features(spark, media_df):
    out = mm.media_features(media_df)
    rows = out.collect()
    assert len(rows) == 200
    r = {x["media_id"]: x for x in rows}
    pdf = mm.synth_media(200, seed=42)
    # deterministic: recompute one feature vector locally
    some = pdf.iloc[17]
    assert r[some["media_id"]]["features"] == mm.extract_features(some["payload"])
    assert r[some["media_id"]]["n_bytes"] == len(some["payload"])
    assert "payload" not in out.columns  # heavy column dropped at this stage


def test_sample_frames(spark, media_df):
    out = mm.sample_frames(media_df, every_ms=1000).collect()
    pdf = mm.synth_media(200, seed=42)
    vids = pdf[pdf["kind"] == "video"]
    expected = int(sum((d - 1) // 1000 + 1 for d in vids["duration_ms"]))
    assert len(out) == expected
    assert all(x["frame_ms"] % 1000 == 0 for x in out[:50])


def test_resize_plan(spark, media_df):
    out = {x["media_id"]: x for x in mm.resize_plan(media_df, max_side=64).collect()}
    pdf = mm.synth_media(200, seed=42)
    for _, row in pdf[pdf["kind"] != "audio"].head(20).iterrows():
        got = out[row["media_id"]]
        scale = min(1.0, 64 / max(row["width"], row["height"], 1))
        assert got["out_w"] == int(np.floor(row["width"] * scale))
        assert got["out_h"] == int(np.floor(row["height"] * scale))
        assert max(got["out_w"], got["out_h"]) <= 64
