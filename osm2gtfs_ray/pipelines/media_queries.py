"""Media pipeline driver query: real decode verified against a
splitmix SQL oracle.

The media table derives deterministically from the driver's documents
table (media_id = doc_id; dims/format from splitmix64 streams 7/8/9,
``stages/multimodal.media_dims_for_ids``). The engine synthesizes REAL
encoded payloads (BMP/PPM/PNG/baseline-JPEG-4:2:0), decodes them with
the pure-numpy codecs, and reports the dims read FROM THE DECODED
PIXELS — so a decode bug (stride, bottom-up order, filter unfiltering,
MCU interleave, chroma upsample) breaks the match. The oracle recomputes the expected dims with the bit-exact
splitmix64 SQL from pipelines/flagship_oracle. Pixel-level equality is
pytest-covered (tests/test_multimodal.py roundtrips).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint
from osm2gtfs_ray.sources.tables import read_table
from osm2gtfs_ray.stages.multimodal import DecodeImage, synthesize_media_for_ids


def q_media_decode(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        return synthesize_media_for_ids(t["doc_id"].to_numpy().astype(np.uint64))

    # batch sizes are payload-aware: these synthetic rasters are ≤64×64
    # (~12 KB encoded), so hundreds fit a batch; production-sized media
    # (multi-MB) would drop batch_size back to O(16-64) to bound actor
    # heap at batch_size × concurrency × payload. The JPEG entropy coder
    # is the per-image hot spot (~3-8 ms vs ~0.1 ms for the raw formats)
    # so the stage is parallelism-bound: the pool is sized FIXED from the
    # row count (~300 images per actor amortizes ~1 s actor startup) —
    # an autoscaling (2,16) pool measured 7.4 s vs 4.3 s fixed at sf0.1
    # because the ramp lags a job this short.
    n_docs = docs.count()  # parquet metadata — no scan
    pool = max(2, min(16, n_docs // 300 + 1))
    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=128)
    decoded = media.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=64, concurrency=pool
    )

    def proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": t["media_id"],
                "width": pc.cast(t["decoded_width"], pa.int64()),
                "height": pc.cast(t["decoded_height"], pa.int64()),
                "mime": t["mime"],
            }
        )

    return decoded.map_batches(proj, batch_format="pyarrow")


def sql_media_decode() -> str:
    return f"""
WITH ids AS (SELECT CAST(doc_id AS UBIGINT) AS mid FROM documents)
SELECT CAST(mid AS BIGINT) AS media_id,
       16 + ({_s_uint("mid", 7, 48)}) AS width,
       16 + ({_s_uint("mid", 8, 48)}) AS height,
       CASE ({_s_uint("mid", 9, 4)})
         WHEN 0 THEN 'image/bmp'
         WHEN 1 THEN 'image/x-portable-pixmap'
         WHEN 2 THEN 'image/png'
         ELSE 'image/jpeg' END AS mime
FROM ids
"""


# --------------------------------------------------------------------------
# Audio features: PCM16 decode + per-clip waveform stats, mirrored by
# a bit-exact splitmix SQL oracle (same pattern as q_media_decode —
# the engine computes features FROM THE DECODED BYTES, the oracle
# regenerates the waveform arithmetically; any byte-order/framing bug
# in the decode breaks the match).
# --------------------------------------------------------------------------

def q_audio_features(sf_dir: str):
    from osm2gtfs_ray.stages.audio import DecodeAudio, synthesize_audio_for_ids

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        return synthesize_audio_for_ids(t["doc_id"].to_numpy().astype(np.uint64))

    audio = docs.map_batches(synth, batch_format="pyarrow", batch_size=2048)
    return audio.map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=512, concurrency=(1, 8)
    )


def sql_audio_features() -> str:
    from osm2gtfs_ray.stages.audio import (
        _K_MIX,
        _LEN_MOD,
        _LEN_STREAM,
        _MIN_SAMPLES,
        _VAL_MOD,
        _VAL_OFF,
        _VAL_STREAM,
    )

    sample = (
        _s_uint(f"xor(aid, CAST(k AS UBIGINT) * {int(_K_MIX)})", _VAL_STREAM, _VAL_MOD)
        + f" - {_VAL_OFF}"
    )
    return f"""
WITH ids AS (SELECT CAST(doc_id AS UBIGINT) AS aid FROM documents),
n AS (SELECT aid, {_MIN_SAMPLES} + ({_s_uint("aid", _LEN_STREAM, _LEN_MOD)}) AS ns FROM ids),
samp AS (SELECT aid, ns, unnest(generate_series(0, ns - 1)) AS k FROM n),
vals AS (SELECT aid, ns, k, ({sample}) AS s FROM samp),
flags AS (
  SELECT aid, ns, s,
         CASE WHEN s * LAG(s) OVER (PARTITION BY aid ORDER BY k) < 0
              THEN 1 ELSE 0 END AS c
  FROM vals
)
SELECT CAST(aid AS BIGINT) AS audio_id,
       CAST(ANY_VALUE(ns) AS BIGINT) AS n_samples,
       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak,
       CAST(SUM(c) AS BIGINT) AS zero_crossings
FROM flags GROUP BY aid
"""


# --------------------------------------------------------------------------
# Image near-duplicate pairs via perceptual hash (pHash): DCT 8×8
# low-frequency median hash per image (stages/phash.py) → the exact
# hamming≤3 banding shuffle shared with simhash_pairs
# (stages/dedup.banded_hamming_pairs). The corpus plants a perturbed
# re-encoded copy of every 5th image (+3 brightness, PNG) under
# id + 2^40; the hash must pull those back out — the oracle re-derives
# the pairs from the signature SNAPSHOT (bit_count(xor) self-join,
# simhash_pairs' contract: the DCT is not SQL-reproducible, the
# banding + hamming verify over the same sigs is).
# --------------------------------------------------------------------------

PHASH_SIGS_SNAPSHOT = "/tmp/graft_phash_sigs"


def q_phash_pairs(sf_dir: str):
    import pyarrow.compute as pc

    from osm2gtfs_ray.stages.dedup import banded_hamming_pairs, snapshot_sigs
    from osm2gtfs_ray.stages.phash import PHashSigner, synthesize_media_with_dups

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()  # parquet metadata — no scan

    def synth(t: pa.Table) -> pa.Table:
        return synthesize_media_with_dups(t["doc_id"].to_numpy().astype(np.uint64))

    # decode+hash dominates (JPEG entropy decode ~3-8 ms/image), so the
    # pool is sized FIXED from the row count like q_media_decode — the
    # autoscaling ramp lags a seconds-long job (media_queries.py:36-41).
    pool = max(2, min(16, n_docs // 300 + 1))
    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=128)
    sigs = media.map_batches(
        PHashSigner, batch_format="pyarrow", batch_size=64, concurrency=pool
    )
    sigs = snapshot_sigs(sigs, PHASH_SIGS_SNAPSHOT, n_src=n_docs)
    pairs = banded_hamming_pairs(
        sigs, sig_col="phash", id_col="media_id", max_hamming=3, n_bands=4
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "hamming": pc.cast(t["hamming"], pa.int64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def sql_phash_pairs() -> str:
    from osm2gtfs_ray.state.snapshot import sql_guard

    return f"""
WITH sigs AS (
  SELECT media_id, CAST(phash AS UBIGINT) AS sig
  FROM read_parquet('{PHASH_SIGS_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(PHASH_SIGS_SNAPSHOT, "documents")} = 1
)
SELECT x.media_id AS a, y.media_id AS b,
       CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
FROM sigs x JOIN sigs y ON x.media_id < y.media_id
WHERE bit_count(xor(x.sig, y.sig)) <= 3
"""


# --------------------------------------------------------------------------
# Image near-dup GROUPS: pHash pairs -> connected components
# --------------------------------------------------------------------------
# Composes q_phash_pairs' exact hamming<=3 pair set with the
# distributed min-label components operator (ops/components.py) — the
# image counterpart of dedup_groups (MinHash text clusters) and
# embedding_dedup_groups. Same snapshot-oracle contract: the verified
# pair set is written to parquet inside the query and the oracle
# recomputes the grouping over that same file WITH RECURSIVE, so the
# clustering step is exactly driver-verified even though the DCT hash
# itself is not SQL-reproducible.

PHASH_GROUP_PAIRS_SNAPSHOT = "/tmp/graft_phash_group_pairs"


def q_phash_groups(sf_dir: str):
    """(node, component) for every media id that appears in a pHash
    hamming<=3 pair; component = min media id of its cluster."""
    import pyarrow.parquet as pq
    import ray.data

    from osm2gtfs_ray.ops.components import connected_components
    from osm2gtfs_ray.state.snapshot import write_snapshot

    n_src = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    snap = write_snapshot(
        q_phash_pairs(sf_dir).select_columns(["a", "b"]),
        PHASH_GROUP_PAIRS_SNAPSHOT,
        extra={"n_src": n_src},
    )
    pairs = ray.data.from_arrow(snap) if isinstance(snap, pa.Table) else snap
    return connected_components(pairs)
