"""Geocode stage: assign cell keys to point rows (stateless map_batches).

The H3-res-9-equivalent cell assignment of the north_star: every
(lat, lon) row gets a uint64 ``cell`` (level 18, ~153 m) and a coarse
``cell_coarse`` used as the shuffle/partition key — ONE partitioning
key reused across the spatial join, kNN, assignment aggregate, and the
resumable output layout, so downstream stages never re-shuffle on a
new key.
"""

from __future__ import annotations

import pyarrow as pa

from osm2gtfs_ray.geo.cells import DEFAULT_LEVEL, cell_of, parent_cell

COARSE_LEVEL = 8  # distribution key (~60 km cells) — matches tiles.cell_prefix


def assign_cells(
    batch: pa.Table,
    lat_col: str = "lat",
    lon_col: str = "lon",
    level: int = DEFAULT_LEVEL,
    coarse_level: int = COARSE_LEVEL,
) -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    cell = cell_of(lat, lon, level)
    coarse = parent_cell(cell, steps=level - coarse_level)
    return batch.append_column("cell", pa.array(cell, pa.uint64())).append_column(
        "cell_coarse", pa.array(coarse, pa.uint64())
    )


def geocode(ds, lat_col: str = "lat", lon_col: str = "lon", level: int = DEFAULT_LEVEL):
    return ds.map_batches(
        lambda b: assign_cells(b, lat_col, lon_col, level),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
