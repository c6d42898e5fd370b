"""Multimodal stage tests: real pure-numpy codecs + pipeline plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osm2gtfs_ray.stages.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    luma_features,
)
from osm2gtfs_ray.stages.multimodal import (
    DecodeImage,
    ResizeMeta,
    media_dataset,
    media_dims_for_ids,
    synthesize_media_batch,
)


def _rand_img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 33), (40, 17)])
def test_bmp_roundtrip(h, w):
    img = _rand_img(h, w, h * 100 + w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 33)])
def test_ppm_roundtrip(h, w):
    img = _rand_img(h, w, h * 100 + w)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 33), (64, 48)])
def test_png_roundtrip(h, w):
    img = _rand_img(h, w, h * 100 + w)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_all_filters_decode():
    """Hand-build a PNG using every filter type (0-4) and check the
    unfilter path against the reference reconstruction."""
    import struct
    import zlib

    from osm2gtfs_ray.stages.codecs import _PNG_SIG, _chunk

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    ch, stride = 3, 4 * 3
    rows = img.reshape(5, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            a = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - a) & 0xFF
        elif ftype == 2:
            enc = (cur - prev) & 0xFF
        elif ftype == 3:
            a = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - ((a + prev) >> 1)) & 0xFF
        else:
            a = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            c = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
            pred = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                p = a[x] + prev[x] - c[x]
                pa_, pb, pc_ = abs(p - a[x]), abs(p - prev[x]), abs(p - c[x])
                pred[x] = a[x] if (pa_ <= pb and pa_ <= pc_) else (prev[x] if pb <= pc_ else c[x])
            enc = (cur - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    assert np.array_equal(decode_png(png), img)


def test_synthesize_deterministic():
    a = synthesize_media_batch(0, 10)
    b = synthesize_media_batch(0, 10)
    assert a.equals(b)
    c = synthesize_media_batch(5, 2)
    assert a.slice(5, 2).to_pydict() == c.to_pydict()


def test_real_decode_roundtrips_dims_and_is_real_bytes():
    t = synthesize_media_batch(0, 16)
    # all four formats appear
    assert set(t["mime"].to_pylist()) == {
        "image/bmp", "image/x-portable-pixmap", "image/png", "image/jpeg"
    }
    out = DecodeImage()(t)
    assert out["decoded_width"].to_pylist() == t["width"].to_pylist()
    assert out["decoded_height"].to_pylist() == t["height"].to_pylist()
    f = np.array(out["features"].to_pylist())
    assert f.shape[1] == 64
    assert (f >= 0.0).all() and (f <= 1.0).all()
    # decoded pixels byte-equal the generator's pixel array for the
    # lossless formats; JPEG is checked for bounded error below
    from osm2gtfs_ray.stages.multimodal import _pixels_for_id

    mimes = t["mime"].to_pylist()
    ids = t["media_id"].to_pylist()
    w, h, _ = media_dims_for_ids(np.array(ids, dtype=np.uint64))
    k_lossless = next(i for i, m in enumerate(mimes) if m != "image/jpeg")
    img = decode_image(t["payload"][k_lossless].as_py())
    ref = _pixels_for_id(ids[k_lossless], int(w[k_lossless]), int(h[k_lossless]), 42)
    assert np.array_equal(img, ref)
    k_jpeg = next(i for i, m in enumerate(mimes) if m == "image/jpeg")
    img = decode_image(t["payload"][k_jpeg].as_py())
    ref = _pixels_for_id(ids[k_jpeg], int(w[k_jpeg]), int(h[k_jpeg]), 42)
    assert img.shape == ref.shape  # exact dims even for partial MCUs
    # random-noise pixels under 4:2:0 chroma averaging are the JPEG
    # absolute worst case (~45 observed); bounded, not exact
    assert np.abs(img.astype(int) - ref.astype(int)).mean() < 60


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        decode_image(b"GIF89a not supported")


def test_fake_decode_deterministic_features():
    t = synthesize_media_batch(0, 8)
    d = DecodeImage(fake_decoder=True)
    f1 = d(t)["features"].to_pylist()
    f2 = d(t)["features"].to_pylist()
    assert f1 == f2
    assert len(f1[0]) == 64


def test_luma_features_constant_image():
    img = np.full((32, 32, 3), 128, dtype=np.uint8)
    f = luma_features(img)
    np.testing.assert_allclose(f, 128 / 255.0, atol=1e-6)


def test_resize_meta_aspect():
    t = synthesize_media_batch(0, 16)
    out = ResizeMeta(max_side=24)(t)
    w = out["target_width"].to_numpy()
    h = out["target_height"].to_numpy()
    assert (np.maximum(w, h) <= 24).all()
    w0 = out["width"].to_numpy().astype(float)
    h0 = out["height"].to_numpy().astype(float)
    big = np.maximum(w0, h0) > 24
    np.testing.assert_allclose((w / h)[big], (w0 / h0)[big], rtol=0.2)


def test_pipeline_end_to_end(ray_session):
    ds = media_dataset(200, override_num_blocks=4)
    out = (
        ds.map_batches(ResizeMeta, batch_format="pyarrow", batch_size=64,
                       concurrency=(1, 2), fn_constructor_kwargs={"max_side": 128})
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 2))
    )
    df = out.to_pandas()
    assert len(df) == 200
    assert "payload" not in df.columns  # wide binary dropped at decode
    assert set(["media_id", "features", "target_width", "decoded_width"]) <= set(df.columns)
    assert (df["decoded_width"] == df["width"]).all()


def test_resize_pixels_exact_means(ray_session):
    """ResizePixels = decode -> nearest-neighbor resample -> channel
    means; verify against a direct driver-side computation."""
    from osm2gtfs_ray.stages.codecs import decode_image, resize_nearest
    from osm2gtfs_ray.stages.multimodal import ResizePixels, media_dataset

    ds = media_dataset(60, override_num_blocks=2)
    out = (
        ds.map_batches(ResizePixels, batch_format="pyarrow", batch_size=32,
                       concurrency=(1, 2), fn_constructor_kwargs={"max_side": 16})
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert (np.maximum(out["resized_width"], out["resized_height"]) <= 16).all()
    tbl = media_dataset(60, override_num_blocks=1).to_pandas().set_index("media_id")
    for mid in (0, 7, 31):
        img = decode_image(tbl.loc[mid, "payload"])
        h, w = img.shape[:2]
        s = min(1.0, 16 / max(w, h))
        small = resize_nearest(img, max(1, round(w * s)), max(1, round(h * s)))
        want = small.reshape(-1, 3).mean(axis=0)
        np.testing.assert_allclose(
            np.array(out.loc[mid, "mean_rgb"]), want, rtol=1e-5
        )


def test_frame_sampler_explodes_sampled_frames(ray_session):
    """Video payloads -> one row per sampled frame with correct count,
    indices, and per-frame features identical to direct decode."""
    import ray.data

    from osm2gtfs_ray.stages.codecs import luma_features
    from osm2gtfs_ray.stages.multimodal import (
        FrameSampler,
        decode_video_frames,
        encode_video,
    )

    rng = np.random.default_rng(3)
    vids, rows = [], []
    for mid, n_frames in ((0, 1), (1, 7), (2, 12)):
        frames = rng.integers(0, 256, size=(n_frames, 9, 11, 3), dtype=np.uint8)
        vids.append(frames)
        rows.append({"media_id": mid, "payload": encode_video(frames)})
    ds = ray.data.from_items(rows)
    out = (
        ds.map_batches(FrameSampler, batch_format="pyarrow", batch_size=2,
                       concurrency=(1, 2), fn_constructor_kwargs={"stride": 4})
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    # every 4th frame of each video, order as data
    want_idx = {0: [0], 1: [0, 4], 2: [0, 4, 8]}
    for mid, idxs in want_idx.items():
        sub = out[out["media_id"] == mid]
        assert sub["frame_idx"].tolist() == idxs
        for k in idxs:
            np.testing.assert_allclose(
                np.array(sub[sub["frame_idx"] == k]["features"].iloc[0]),
                luma_features(vids[mid][k], grid=8),
                rtol=1e-6,
            )
    # round-trip sanity of the codec itself
    rt = decode_video_frames(encode_video(vids[2]))
    np.testing.assert_array_equal(rt, vids[2])


# ------------------------------------------------------------------ pHash

def test_phash_deterministic_and_brightness_invariant():
    from osm2gtfs_ray.stages.codecs import encode_jpeg
    from osm2gtfs_ray.stages.phash import phash64

    def ham(a, b):
        return bin(a ^ b).count("1")

    prev = None
    for seed in range(8):
        img = _rand_img(24 + seed, 37 - seed, seed)
        h0 = phash64(img)
        assert h0 == phash64(img.copy())  # deterministic
        # +3 brightness (clipped) moves only clipped pixels + DC -> tiny
        pert = np.clip(img.astype(np.int16) + 3, 0, 255).astype(np.uint8)
        assert ham(h0, phash64(pert)) <= 3
        # lossy q90 4:2:0 JPEG round-trip stays perceptually close
        jp = decode_image(encode_jpeg(img, quality=90, subsampling="420"))
        assert ham(h0, phash64(jp)) <= 6
        # unrelated image is far (measured >=18 on the synthetic corpus)
        if prev is not None:
            assert ham(h0, prev) >= 10
        prev = h0


def test_phash_pairs_recovers_planted_dups(ray_session):
    import ray.data

    from osm2gtfs_ray.stages.dedup import banded_hamming_pairs
    from osm2gtfs_ray.stages.phash import (
        DUP_EVERY,
        DUP_OFFSET,
        PHashSigner,
        synthesize_media_with_dups,
    )

    ids = np.arange(60, dtype=np.uint64)
    media = ray.data.from_arrow(synthesize_media_with_dups(ids)).repartition(4)
    sigs = media.map_batches(PHashSigner, batch_format="pyarrow",
                             batch_size=32, concurrency=2)
    pairs = banded_hamming_pairs(sigs, sig_col="phash", id_col="media_id",
                                 max_hamming=3, n_bands=4).to_pandas()
    planted = {(int(i), int(i) + DUP_OFFSET) for i in ids[ids % DUP_EVERY == 0]}
    found = set(zip(pairs["a"].astype(int), pairs["b"].astype(int)))
    # recall over planted near-dups (a +3 perturbed copy occasionally
    # lands at hamming 4 and is legitimately outside the <=3 contract)
    assert len(found & planted) >= int(0.9 * len(planted))
    # no cross-pairs between unrelated images
    assert all(b - a == DUP_OFFSET for a, b in found)
    assert (pairs["hamming"] <= 3).all()
