"""Raster ↔ vector tile conversion (north_rule surface).

Rasterize: polygon tile → the set of grid cells (at a chosen level)
whose centers fall inside the ring — a per-tile fill over the same
Morton cell grid the rest of the engine keys on. Vectorize: the
inverse — a cell set → boundary segments → closed rings (grid-aligned
polygon reconstruction). Anchored on the reference's geometry-assembly
semantics (way stitching G3 / shape emission G7,
/root/reference/osm2gtfs/core/osm_connector.py:620-675 and
creators/trips_creator.py:161-176): order-sensitive assembly of small
per-key geometry, run per tile inside map_batches/flat_map — tiles are
independent, so the stage is embarrassingly parallel and needs no
shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.geo.cells import cell_to_center, ij_to_cell, latlon_to_ij
from osm2gtfs_ray.geo.pip import points_in_polygon

RASTER_LEVEL = 12  # ~9.8 km cells — coarse enough for test tiles


def rasterize_ring(ring_lat: np.ndarray, ring_lon: np.ndarray, level: int = RASTER_LEVEL) -> np.ndarray:
    """All level-`level` cells whose CENTER is inside the ring
    (deterministic center-sampling fill). Returns sorted uint64 keys."""
    s, n = float(np.min(ring_lat)), float(np.max(ring_lat))
    w, e = float(np.min(ring_lon)), float(np.max(ring_lon))
    ix0, iy0 = latlon_to_ij(np.array([s]), np.array([w]), level)
    ix1, iy1 = latlon_to_ij(np.array([n]), np.array([e]), level)
    xs = np.arange(ix0[0], ix1[0] + 1)
    ys = np.arange(iy0[0], iy1[0] + 1)
    if len(xs) == 0 or len(ys) == 0:
        return np.empty(0, np.uint64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    cand = ij_to_cell(gx.ravel(), gy.ravel())
    clat, clon = cell_to_center(cand, level)
    inside = points_in_polygon(clat, clon, ring_lat, ring_lon)
    return np.sort(cand[inside])


def boundary_cells(cells: np.ndarray, level: int = RASTER_LEVEL) -> np.ndarray:
    """Cells of a raster fill having at least one 4-neighbor outside
    the fill (the vector-back step's input)."""
    from osm2gtfs_ray.geo.cells import cell_to_ij

    if len(cells) == 0:
        return cells
    filled = set(int(c) for c in cells)
    ix, iy = cell_to_ij(cells)
    out = []
    for k in range(len(cells)):
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = int(ij_to_cell(np.array([ix[k] + dx]), np.array([iy[k] + dy]))[0])
            if nb not in filled:
                out.append(cells[k])
                break
    return np.array(out, dtype=np.uint64)


def vectorize_cells(cells: np.ndarray, level: int = RASTER_LEVEL) -> list[np.ndarray]:
    """Cell set → closed grid-aligned ring(s): marching-squares-style
    edge walk over the cell grid. Returns a list of (k, 2) [lat, lon]
    closed rings (outer boundaries; deterministic order: each ring
    starts at its lexicographically-smallest corner, walked
    counter-clockwise)."""
    from osm2gtfs_ray.geo.cells import cell_to_ij

    if len(cells) == 0:
        return []
    nx_cells = 1 << level
    ny_cells = 1 << (level - 1)
    dlon = 360.0 / nx_cells
    dlat = 180.0 / ny_cells
    ix, iy = cell_to_ij(cells)
    filled = set(zip(ix.tolist(), iy.tolist()))

    # collect boundary edges as directed segments (interior on the left)
    edges: dict[tuple, tuple] = {}
    for cx, cy in filled:
        # corners (grid coords): bl=(cx,cy) br=(cx+1,cy) tr=(cx+1,cy+1) tl=(cx,cy+1)
        if (cx, cy - 1) not in filled:  # bottom edge, walk right
            edges[(cx, cy)] = (cx + 1, cy)
        if (cx + 1, cy) not in filled:  # right edge, walk up
            edges[(cx + 1, cy)] = (cx + 1, cy + 1)
        if (cx, cy + 1) not in filled:  # top edge, walk left
            edges[(cx + 1, cy + 1)] = (cx, cy + 1)
        if (cx - 1, cy) not in filled:  # left edge, walk down
            edges[(cx, cy + 1)] = (cx, cy)

    rings = []
    while edges:
        start = min(edges.keys())
        ring = [start]
        cur = edges.pop(start)
        while cur != start:
            ring.append(cur)
            cur = edges.pop(cur)
        ring.append(start)  # close
        pts = np.array(
            [
                (gy * dlat - 90.0, gx * dlon - 180.0)
                for gx, gy in ring
            ]
        )
        rings.append(pts)
    return rings


def rasterize_tiles(tiles_ds, level: int = RASTER_LEVEL):
    """Dataset stage: tiles(ring,…) → (tile_id, cell) fill rows.
    flat_map semantics via map_batches (vectorized list building)."""

    def f(t: pa.Table) -> pa.Table:
        out_tid, out_cell = [], []
        rings = t["ring"].to_pylist()
        tids = t["tile_id"].to_pylist()
        for tid, ring in zip(tids, rings):
            rla = np.array([p["lat"] for p in ring[:-1]])
            rlo = np.array([p["lon"] for p in ring[:-1]])
            cells = rasterize_ring(rla, rlo, level)
            out_tid.extend([tid] * len(cells))
            out_cell.append(cells)
        return pa.table(
            {
                "tile_id": pa.array(out_tid, pa.string()),
                "cell": pa.array(
                    np.concatenate(out_cell) if out_cell else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
            }
        )

    return tiles_ds.map_batches(f, batch_format="pyarrow")
