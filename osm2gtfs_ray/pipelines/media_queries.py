"""Media pipeline driver query: real decode verified against a
splitmix SQL oracle.

The media table derives deterministically from the driver's documents
table (media_id = doc_id; dims/format from splitmix64 streams 7/8/9,
``stages/multimodal.media_dims_for_ids``). The engine synthesizes REAL
encoded payloads (BMP/PPM/PNG), decodes them with the pure-numpy
codecs, and reports the dims read FROM THE DECODED PIXELS — so a
decode bug (stride, bottom-up order, filter unfiltering) breaks the
match. The oracle recomputes the expected dims with the bit-exact
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
    # heap at batch_size × concurrency × payload.
    media = docs.map_batches(synth, batch_format="pyarrow", batch_size=2048)
    decoded = media.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
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
       CASE ({_s_uint("mid", 9, 3)})
         WHEN 0 THEN 'image/bmp'
         WHEN 1 THEN 'image/x-portable-pixmap'
         ELSE 'image/png' END AS mime
FROM ids
"""
