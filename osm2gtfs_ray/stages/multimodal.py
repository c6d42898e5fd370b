"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with
typed metadata columns alongside (the web-scale pattern for the
`html: binary` column generalizes to any media payload). The Ray-side
plumbing — schema, small batch sizes for wide rows, actor-pool
signature, output layout — is real and tested; the actual codec work
is STUBBED because no image/audio libraries exist in this container:

* ``DecodeImage`` raises NotImplementedError unless
  ``fake_decoder=True``, in which case a deterministic fake decoder
  (seeded from the payload bytes) produces a fixed-size feature map —
  letting the distributed plumbing and downstream feature stages be
  exercised end to end.

Batch-size guidance (SURVEY.md §7.4 'wide binary rows'): payload
bytes × batch_size × concurrency must fit the worker heap — callers
pass small ``batch_size`` (e.g. 64) for megabyte-scale payloads and
let blocks stay small via ``target_max_block_size``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm2gtfs_ray.sources.pages import mix64

FEATURE_DIM = 64


def synthesize_media_batch(start: int, count: int, payload_bytes: int = 4096, seed: int = 42) -> pa.Table:
    """Deterministic fake media table: (media_id, payload: binary,
    mime, width, height)."""
    return synthesize_media_for_ids(
        np.arange(start, start + count, dtype=np.uint64), payload_bytes, seed
    )


def synthesize_media_for_ids(ids: np.ndarray, payload_bytes: int = 4096, seed: int = 42) -> pa.Table:
    """Rows for arbitrary ids (pure per-id function — batch-shape
    independent, see pages.make_pages_for_ids)."""
    ids = np.asarray(ids, dtype=np.uint64)
    count = len(ids)
    payloads = []
    for i in ids:
        h = mix64(np.arange(payload_bytes // 8, dtype=np.uint64) ^ i ^ np.uint64(seed))
        payloads.append(h.tobytes())
    w = (mix64(ids ^ np.uint64(7)) % np.uint64(1920)).astype(np.int32) + 16
    hgt = (mix64(ids ^ np.uint64(11)) % np.uint64(1080)).astype(np.int32) + 16
    return pa.table(
        {
            "media_id": pa.array(ids.astype(np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * count, pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(hgt, pa.int32()),
        }
    )


class DecodeImage:
    """Actor-pool decode stage. Real pipelines plug a codec library in
    ``__init__`` (loaded once per actor); this container has none, so
    the decode is a clearly-marked stub. With ``fake_decoder=True`` a
    deterministic byte-seeded feature extractor stands in."""

    def __init__(self, fake_decoder: bool = False):
        self.fake = fake_decoder

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires a codec library not present in "
                "this environment; construct with fake_decoder=True for "
                "the deterministic test decoder"
            )
        raw = np.frombuffer(payload[: FEATURE_DIM * 8], dtype=np.uint64)
        h = mix64(raw[:FEATURE_DIM])
        return (h >> np.uint64(11)).astype(np.float32) * np.float32(2.0**-53)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch["payload"].to_pylist()]
        out = {n: batch[n] for n in batch.column_names if n != "payload"}
        out["features"] = pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        return pa.table(out)


class ResizeMeta:
    """Resize stage (stub): recomputes target dims preserving aspect
    ratio — the metadata math is real; pixel work would happen in the
    codec stage."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "target_width", pa.array(np.rint(w * scale).astype(np.int32))
        ).append_column("target_height", pa.array(np.rint(h * scale).astype(np.int32)))


def media_dataset(n: int, payload_bytes: int = 4096, seed: int = 42, override_num_blocks=None):
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        return synthesize_media_for_ids(batch["id"].to_numpy(), payload_bytes, seed)

    return ray.data.range(n, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=256
    )
