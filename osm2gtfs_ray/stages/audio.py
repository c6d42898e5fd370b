"""Audio as an opaque binary column: PCM16 decode + waveform features.

Completes the multimodal triad (stages/multimodal.py images/video)
per the brief's image/audio/video requirement. Payloads are raw
little-endian PCM16 mono at a fixed rate; real compressed codecs
(mp3/flac) need libraries absent from this container — the PCM path
exercises the whole Ray-side contract (binary column in, feature
columns out, actor-pool decode stage, payload-aware batch sizes) and
the decode math is real.

Synthesis is deterministic from the id (splitmix64 streams 11/12,
mirrored bit-exactly in SQL by pipelines/media_queries) so the driver
oracle can recompute every feature: the engine decodes FROM THE BYTES
— a byte-order, width, or framing bug breaks the match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm2gtfs_ray.sources.pages import _uint

SAMPLE_RATE = 16_000
_LEN_STREAM = 11  # n_samples = _MIN_SAMPLES + uint % _LEN_MOD
_VAL_STREAM = 12  # sample    = uint % _VAL_MOD - _VAL_OFF
_SEED = 42
_MIN_SAMPLES = 256
_LEN_MOD = 1024
_VAL_MOD = 2001
_VAL_OFF = 1000
_K_MIX = np.uint64(1099511628211)  # FNV64 prime; k*prime stays < 2^63


def audio_samples_for_id(aid: int, n: int) -> np.ndarray:
    """The synthetic waveform: s_k = uint(aid ^ (k*FNV), stream 12) - 1000."""
    k = np.arange(n, dtype=np.uint64)
    idx = np.uint64(aid) ^ (k * _K_MIX)
    return (_uint(idx, _VAL_STREAM, _SEED, _VAL_MOD).astype(np.int64) - _VAL_OFF).astype(
        np.int16
    )


def synthesize_audio_for_ids(ids: np.ndarray) -> pa.Table:
    """(audio_id, payload: binary PCM16LE, sample_rate) rows."""
    ids = ids.astype(np.uint64)
    ns = (_MIN_SAMPLES + _uint(ids, _LEN_STREAM, _SEED, _LEN_MOD)).astype(np.int64)
    payloads = [
        audio_samples_for_id(int(a), int(n)).astype("<i2").tobytes()
        for a, n in zip(ids, ns)
    ]
    return pa.table(
        {
            "audio_id": pa.array(ids.astype(np.int64), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(np.full(len(ids), SAMPLE_RATE), pa.int64()),
        }
    )


class DecodeAudio:
    """Actor-pool decode stage: binary PCM16LE → waveform features.

    Vectorized ACROSS the batch: all payloads concatenate into one
    int16 array with offsets; sums/maxima via np.add/maximum.reduceat,
    zero crossings via one adjacent-product pass with segment
    boundaries masked out — no per-row Python beyond the buffer
    concat. Batch sizes are payload-aware (these clips are ≤2.5 KB;
    multi-MB audio would drop batch_size to O(16-64))."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch["payload"].combine_chunks() if isinstance(
            batch["payload"], pa.ChunkedArray
        ) else batch["payload"]
        # BinaryArray value offsets live in buffer 1 (int32), shifted
        # by the array's slice offset
        offs = np.frombuffer(pay.buffers()[1], np.int32)[
            pay.offset : pay.offset + len(pay) + 1
        ].astype(np.int64)
        data = np.frombuffer(pay.buffers()[2], np.uint8)
        # every PCM16 payload has even length, so all offsets are even
        seg = data[offs[0] : offs[-1]].view("<i2").astype(np.int64)
        so = (offs - offs[0]) // 2  # per-row sample offsets
        n = np.diff(so)
        nrows = len(n)
        absa = np.abs(seg)
        sum_abs = np.zeros(nrows, np.int64)
        peak = np.zeros(nrows, np.int64)
        ne = n > 0
        if ne.any():
            starts = so[:-1][ne]
            sum_abs[ne] = np.add.reduceat(absa, starts)
            peak[ne] = np.maximum.reduceat(absa, starts)
        # zero crossings: adjacent products < 0, both samples in the
        # same row (pair t spans rows iff t+1 == some row start)
        zc = np.zeros(nrows, np.int64)
        if len(seg) > 1:
            t = np.arange(len(seg) - 1)
            cross = (seg[1:] * seg[:-1]) < 0
            row = np.searchsorted(so, t, side="right") - 1
            valid = (t + 1) < so[row + 1]
            zc = np.bincount(row[valid & cross], minlength=nrows).astype(np.int64)
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "n_samples": pa.array(n, pa.int64()),
                "sum_abs": pa.array(sum_abs, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "zero_crossings": pa.array(zc, pa.int64()),
            }
        )
