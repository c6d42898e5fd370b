"""Perceptual image hashing (pHash) for image near-duplicate pairs.

The classic DCT perceptual hash (Zauner, "Implementation and
Benchmarking of Perceptual Image Hash Functions", 2010): grayscale →
32×32 → 2-D DCT-II → the 8×8 lowest-frequency block → one bit per
coefficient against the median. Two encodings of the same picture —
different container, lossy re-encode, small brightness shift — land
within a few bits, while unrelated pictures are ~32 bits apart, so the
exact hamming≤k banding machinery built for SimHash text near-dup
(stages/dedup.banded_hamming_pairs, the Manku/Jain/Sarma WWW'07
pigeonhole construction) applies verbatim to images.

Measured on the repo's synthetic media (noise pixels, dims 16..63):
a +3 brightness shift moves the hash 0–2 bits, a quality-90 4:2:0
JPEG round-trip 0–4 bits, and distinct images ≥18 bits — max_hamming=3
with 4 bands cleanly separates planted near-dups from everything else.

Determinism: luma is integer fixed-point BT.601 ((77R+150G+29B)>>8),
the 32×32 resample is exact box-average (downscale) / index-repeat
(upscale), and the DCT is a fixed float64 matrix product — the same
pixels hash identically on every worker. The SQL oracle never
recomputes the DCT; it re-derives the PAIRS from a signature snapshot
(bit_count(xor) self-join), same contract as simhash_pairs.

Reference parity note: the reference (osm2gtfs) has no media surface
at all; this operator is part of the LLM-training-data family the
brief adds on top (image near-dup dedup).

100 TB: the hash is a pure per-image map (actor pool, codec tables
built once per actor); the pair step is the banded shuffle — no
all-pairs stage anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm2gtfs_ray.stages.codecs import decode_image


def _dct_mat(n: int) -> np.ndarray:
    k = np.arange(n)
    c = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    c *= np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


_D32 = _dct_mat(32)


def _resample_axis(y: np.ndarray, axis: int) -> np.ndarray:
    """Deterministic 32-sample resample along ``axis``: exact
    box-average when the side is ≥32 (every bin non-empty), nearest
    index-repeat when upscaling (<32)."""
    n = y.shape[axis]
    if n >= 32:
        edges = (np.arange(32) * n) // 32
        cnt = np.diff(np.append(edges, n)).astype(np.float64)
        s = np.add.reduceat(y, edges, axis=axis)
        shape = [1, 1]
        shape[axis] = 32
        return s / cnt.reshape(shape)
    idx = (np.arange(32) * n) // 32
    return np.take(y, idx, axis=axis)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 image.

    Bit i is 1 when low-frequency DCT coefficient i exceeds the median
    of coefficients 1..63 (the DC term is excluded from the median so
    a global brightness shift cannot move the threshold; its own bit
    is then constantly 1 for any non-degenerate image — a 63-bit
    effective hash, harmless to the banding)."""
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    y = ((77 * r + 150 * g + 29 * b) >> 8).astype(np.float64)
    y = _resample_axis(_resample_axis(y, 0), 1)
    d = _D32 @ y @ _D32.T
    vals = d[:8, :8].ravel()
    med = np.median(vals[1:])
    bits = vals > med
    return int(np.packbits(bits, bitorder="little").view(np.uint64)[0])


class PHashSigner:
    """Actor-pool stage: (media_id, payload) → (media_id, phash).

    Decode + hash per image; the per-image Python loop is inherent to
    variable-size payloads (same shape as stages/multimodal.DecodeImage)
    — the codec dispatch and DCT matrix are module-level constants
    built once per worker process."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(len(batch), dtype=np.uint64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            out[i] = phash64(decode_image(p))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "phash": pa.array(out, pa.uint64()),
            }
        )


# planted near-dup ids live DUP_OFFSET above their originals so the
# (a, b) pair structure is checkable without a side table; 2^40 is far
# above any doc_id while keeping a + offset exact in int64/float64.
DUP_OFFSET = 1 << 40
DUP_EVERY = 5  # every 5th doc also emits a perturbed copy


def synthesize_media_with_dups(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """The synthetic media rows for ``ids`` plus, for every
    ``DUP_EVERY``-th id, a NEAR-DUPLICATE copy (+3 brightness, clipped,
    re-encoded lossless PNG) under ``id + DUP_OFFSET`` — a deterministic
    stand-in for the re-posts / re-encodes a web corpus actually
    contains. Pure per-id function: batch-shape independent."""
    from osm2gtfs_ray.stages.codecs import encode_png
    from osm2gtfs_ray.stages.multimodal import (
        _pixels_for_id,
        media_dims_for_ids,
        synthesize_media_for_ids,
    )

    ids = np.asarray(ids, dtype=np.uint64)
    base = synthesize_media_for_ids(ids, seed=seed)
    dup_ids = ids[ids % np.uint64(DUP_EVERY) == 0]
    if not len(dup_ids):
        return base
    w, h, _fmt = media_dims_for_ids(dup_ids, seed)
    payloads = []
    for k, i in enumerate(dup_ids):
        img = _pixels_for_id(int(i), int(w[k]), int(h[k]), seed)
        pert = np.clip(img.astype(np.int16) + 3, 0, 255).astype(np.uint8)
        payloads.append(encode_png(pert))
    dup = pa.table(
        {
            "media_id": pa.array(
                (dup_ids + np.uint64(DUP_OFFSET)).astype(np.int64)
            ),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * len(dup_ids), pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
        }
    )
    return pa.concat_tables([base, dup])
