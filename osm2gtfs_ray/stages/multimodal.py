"""Multimodal column stages: binary image payloads + typed metadata.

Images ride through the pipeline as `binary` columns with typed
metadata columns alongside (the web-scale pattern for the
`html: binary` column generalizes to any media payload).

Round-2: the decode stage is REAL — pure-numpy codecs for BMP24,
PPM P6 and PNG8 (stages/codecs.py; zlib is stdlib) decode actual
bytes-on-disk formats into pixel arrays, then an 8×8 block-mean luma
thumbnail becomes the feature vector. ``fake_decoder=True`` keeps the
old byte-seeded stand-in for plumbing tests. Formats beyond the three
(JPEG etc.) still raise — a deployment would plug a C codec into the
same actor ``__init__``.

Batch-size guidance (SURVEY.md §7.4 'wide binary rows'): payload
bytes × batch_size × concurrency must fit the worker heap — callers
pass small ``batch_size`` (e.g. 64) for megabyte-scale payloads and
let blocks stay small via ``target_max_block_size``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm2gtfs_ray.sources.pages import _uint, mix64
from osm2gtfs_ray.stages.codecs import (
    decode_image,
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_ppm,
    luma_features,
)

FEATURE_DIM = 64  # 8×8 luma grid

_FORMATS = ("bmp", "ppm", "png", "jpeg")
_MIMES = {
    "bmp": "image/bmp",
    "ppm": "image/x-portable-pixmap",
    "png": "image/png",
    "jpeg": "image/jpeg",
}


def _encode_jpeg_420(img):
    # 4:2:0 like most web JPEGs — exercises the decoder's interleaved
    # MCU walk and chroma upsample, not just the trivial 4:4:4 layout
    return encode_jpeg(img, quality=90, subsampling="420")


_ENCODERS = {
    "bmp": encode_bmp,
    "ppm": encode_ppm,
    "png": encode_png,
    "jpeg": _encode_jpeg_420,
}


def media_dims_for_ids(ids: np.ndarray, seed: int = 42):
    """(width, height, fmt_idx) per id — the pure-splitmix metadata
    formula (streams 7/8/9), mirrored by the SQL oracle."""
    ids = np.asarray(ids, dtype=np.uint64)
    w = (16 + _uint(ids, 7, seed, 48)).astype(np.int32)
    h = (16 + _uint(ids, 8, seed, 48)).astype(np.int32)
    fmt = _uint(ids, 9, seed, len(_FORMATS))
    return w, h, fmt


def _pixels_for_id(i: int, w: int, h: int, seed: int) -> np.ndarray:
    n_bytes = h * w * 3
    words = mix64(
        np.arange((n_bytes + 7) // 8, dtype=np.uint64)
        ^ np.uint64(i)
        ^ (np.uint64(seed) << np.uint64(17))
    )
    return (
        words.view(np.uint8)[:n_bytes].reshape(h, w, 3).copy()
    )


def synthesize_media_batch(start: int, count: int, payload_bytes: int = 0, seed: int = 42) -> pa.Table:
    """Deterministic media table: (media_id, payload: binary, mime,
    width, height) with REAL encoded image payloads (format cycles
    BMP/PPM/PNG per id). ``payload_bytes`` is accepted for backward
    compatibility and ignored — payload size is dims-driven."""
    return synthesize_media_for_ids(
        np.arange(start, start + count, dtype=np.uint64), payload_bytes, seed
    )


def synthesize_media_for_ids(ids: np.ndarray, payload_bytes: int = 0, seed: int = 42) -> pa.Table:
    """Rows for arbitrary ids (pure per-id function — batch-shape
    independent, see pages.make_pages_for_ids)."""
    ids = np.asarray(ids, dtype=np.uint64)
    w, h, fmt = media_dims_for_ids(ids, seed)
    payloads, mimes = [], []
    for k, i in enumerate(ids):
        img = _pixels_for_id(int(i), int(w[k]), int(h[k]), seed)
        name = _FORMATS[fmt[k]]
        payloads.append(_ENCODERS[name](img))
        mimes.append(_MIMES[name])
    return pa.table(
        {
            "media_id": pa.array(ids.astype(np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
        }
    )


class DecodeImage:
    """Actor-pool decode stage: payload bytes → decoded dims + an 8×8
    luma-grid feature vector. The codec dispatch table is built once
    per actor; ``fake_decoder=True`` swaps in the deterministic
    byte-seeded stand-in (plumbing tests / unsupported formats)."""

    def __init__(self, fake_decoder: bool = False):
        self.fake = fake_decoder

    def _fake(self, payload: bytes) -> np.ndarray:
        raw = np.frombuffer(payload[: FEATURE_DIM * 8], dtype=np.uint64)
        h = mix64(raw[:FEATURE_DIM])
        return (h >> np.uint64(11)).astype(np.float32) * np.float32(2.0**-53)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, dw, dh = [], [], []
        for p in batch["payload"].to_pylist():
            if self.fake:
                feats.append(self._fake(p))
                dw.append(-1)
                dh.append(-1)
            else:
                img = decode_image(p)
                feats.append(luma_features(img, grid=8))
                dh.append(img.shape[0])
                dw.append(img.shape[1])
        out = {n: batch[n] for n in batch.column_names if n != "payload"}
        out["decoded_width"] = pa.array(dw, pa.int32())
        out["decoded_height"] = pa.array(dh, pa.int32())
        out["features"] = pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        return pa.table(out)


class ResizeMeta:
    """Resize planning stage: target dims preserving aspect ratio (the
    pixel resample itself would run in the decode actor)."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "target_width", pa.array(np.rint(w * scale).astype(np.int32))
        ).append_column("target_height", pa.array(np.rint(h * scale).astype(np.int32)))


def media_dataset(n: int, payload_bytes: int = 0, seed: int = 42, override_num_blocks=None):
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        return synthesize_media_for_ids(batch["id"].to_numpy(), payload_bytes, seed)

    return ray.data.range(n, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=256
    )


class ResizePixels:
    """Actor-pool stage: decode → aspect-preserving nearest-neighbor
    resample to ``max_side`` → per-channel mean of the RESIZED pixels
    (deterministic, so tests can verify against a direct computation).
    The decode table and scale math live in the actor; batches should
    stay small for wide binary payloads (SURVEY.md §7.4)."""

    def __init__(self, max_side: int = 64):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osm2gtfs_ray.stages.codecs import decode_image, resize_nearest

        tw_l, th_l, means = [], [], []
        for p in batch["payload"].to_pylist():
            img = decode_image(p)
            h, w = img.shape[:2]
            scale = min(1.0, self.max_side / max(w, h))
            tw = max(1, int(round(w * scale)))
            th = max(1, int(round(h * scale)))
            small = resize_nearest(img, tw, th)
            tw_l.append(tw)
            th_l.append(th)
            means.append(small.reshape(-1, small.shape[2]).mean(axis=0))
        out = {n: batch[n] for n in batch.column_names if n != "payload"}
        out["resized_width"] = pa.array(tw_l, pa.int32())
        out["resized_height"] = pa.array(th_l, pa.int32())
        out["mean_rgb"] = pa.array(
            [m.astype(np.float32).tolist() for m in means], pa.list_(pa.float32())
        )
        return pa.table(out)


# ------------------------------------------------------------------ video --

_VID_MAGIC = b"GVID"


def encode_video(frames: np.ndarray) -> bytes:
    """(n, H, W, 3) uint8 → opaque payload: 16-byte header (magic,
    n_frames, H, W) + raw frame bytes. The synthetic 'video codec' —
    the Ray-side plumbing (schema, actor stage, explode layout) is the
    real deliverable; a production deploy swaps the codec fn."""
    n, h, w, _ = frames.shape
    head = _VID_MAGIC + np.array([n, h, w], dtype="<u4").tobytes()
    return head + np.ascontiguousarray(frames).tobytes()


def decode_video_frames(data: bytes):
    """payload → (n_frames, H, W, 3) uint8 view (zero-copy)."""
    if data[:4] != _VID_MAGIC:
        raise ValueError("unknown video format")
    n, h, w = np.frombuffer(data[4:16], dtype="<u4")
    return np.frombuffer(data, dtype=np.uint8, offset=16).reshape(int(n), int(h), int(w), 3)


class FrameSampler:
    """Actor-pool stage: video payload → one output row per SAMPLED
    frame (every ``stride``-th), each with its frame index and 8×8
    luma features — the flat_map-shaped video analogue of DecodeImage.
    Output rows fan out, so downstream batches re-block under the
    streaming executor (order carried by frame_idx, never block
    order)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osm2gtfs_ray.stages.codecs import luma_features

        ids, fidx, feats = [], [], []
        media_ids = batch["media_id"].to_numpy(zero_copy_only=False)
        for mid, p in zip(media_ids, batch["payload"].to_pylist()):
            frames = decode_video_frames(p)
            for k in range(0, len(frames), self.stride):
                ids.append(mid)
                fidx.append(k)
                feats.append(luma_features(frames[k], grid=8))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )
