"""Multimodal stage plumbing tests (decode stubbed per environment)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osm2gtfs_ray.stages.multimodal import (
    DecodeImage,
    ResizeMeta,
    media_dataset,
    synthesize_media_batch,
)


def test_synthesize_deterministic():
    a = synthesize_media_batch(0, 10)
    b = synthesize_media_batch(0, 10)
    assert a.equals(b)
    c = synthesize_media_batch(5, 2)
    assert a.slice(5, 2).to_pydict() == c.to_pydict()


def test_decode_stub_raises_without_fake():
    t = synthesize_media_batch(0, 2)
    with pytest.raises(NotImplementedError):
        DecodeImage()(t)


def test_fake_decode_deterministic_features():
    t = synthesize_media_batch(0, 8)
    d = DecodeImage(fake_decoder=True)
    f1 = d(t)["features"].to_pylist()
    f2 = d(t)["features"].to_pylist()
    assert f1 == f2
    assert len(f1[0]) == 64
    assert all(0.0 <= x < 1.0 for x in f1[0])


def test_resize_meta_aspect():
    t = synthesize_media_batch(0, 16)
    out = ResizeMeta(max_side=256)(t)
    w = out["target_width"].to_numpy()
    h = out["target_height"].to_numpy()
    assert (np.maximum(w, h) <= 256).all()
    # aspect preserved within rounding
    w0 = out["width"].to_numpy().astype(float)
    h0 = out["height"].to_numpy().astype(float)
    big = np.maximum(w0, h0) > 256
    np.testing.assert_allclose((w / h)[big], (w0 / h0)[big], rtol=0.05)


def test_pipeline_end_to_end(ray_session):
    ds = media_dataset(200, payload_bytes=2048, override_num_blocks=4)
    out = (
        ds.map_batches(ResizeMeta, batch_format="pyarrow", batch_size=64,
                       concurrency=(1, 2), fn_constructor_kwargs={"max_side": 128})
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 2), fn_constructor_kwargs={"fake_decoder": True})
    )
    df = out.to_pandas()
    assert len(df) == 200
    assert "payload" not in df.columns  # wide binary dropped at decode
    assert set(["media_id", "features", "target_width"]) <= set(df.columns)
