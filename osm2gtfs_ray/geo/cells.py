"""Hierarchical lat/lon cell index with Morton (Z-order) keys.

H3/S2 replacement built from scratch in numpy (no geo libs in this
environment). Semantics mirror what the graft needs from H3 res 9
(~170 m edge): a fixed-resolution uint64 cell id per (lat, lon),
neighbor-ring enumeration (for radius searches, generalizing the 50 m
nearest-feature query of the reference, osm_connector.py:715-785), and
a parent/child prefix relation (coarser cells are key prefixes, like
S2's Hilbert-prefix hierarchy — we use Z-order, which has the same
prefix property and is cheaper to vectorize).

Grid layout at ``level`` L:
  nx = 2**L     longitude cells over [-180, 180)
  ny = 2**(L-1) latitude  cells over [-90, 90]
so cells are square in degrees (360/nx == 180/ny). At the default
L=18 the edge is 360/2**18 ≈ 0.00137° ≈ 153 m at the equator —
the "resolution 9"-equivalent. The cell key is the Morton interleave
of (ix, iy) padded to L bits each: parent at level L-1 is ``key >> 2``.

All functions are vectorized over numpy arrays and total (poles and
the antimeridian clamp/wrap rather than error).
"""

from __future__ import annotations

import numpy as np

DEFAULT_LEVEL = 18  # ~153 m cell edge, the H3-res-9 analogue

_B = [
    np.uint64(0x5555555555555555),
    np.uint64(0x3333333333333333),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0000FFFF0000FFFF),
]
_S = [np.uint64(1), np.uint64(2), np.uint64(4), np.uint64(8), np.uint64(16)]


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so there is a zero bit between each."""
    x = x.astype(np.uint64)
    x = (x | (x << _S[4])) & _B[4]
    x = (x | (x << _S[3])) & _B[3]
    x = (x | (x << _S[2])) & _B[2]
    x = (x | (x << _S[1])) & _B[1]
    x = (x | (x << _S[0])) & _B[0]
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather every other bit."""
    x = x.astype(np.uint64) & _B[0]
    x = (x | (x >> _S[0])) & _B[1]
    x = (x | (x >> _S[1])) & _B[2]
    x = (x | (x >> _S[2])) & _B[3]
    x = (x | (x >> _S[3])) & _B[4]
    x = (x | (x >> _S[4])) & np.uint64(0xFFFFFFFF)
    return x


def _grid_shape(level: int) -> tuple[int, int]:
    if not 2 <= level <= 30:
        raise ValueError(f"level must be in [2, 30], got {level}")
    return 1 << level, 1 << (level - 1)


def latlon_to_ij(
    lat: np.ndarray, lon: np.ndarray, level: int = DEFAULT_LEVEL
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize (lat, lon) degrees to integer grid coords (ix, iy)."""
    nx, ny = _grid_shape(level)
    lon = np.mod(np.asarray(lon, dtype=np.float64) + 180.0, 360.0)  # wrap
    lat = np.clip(np.asarray(lat, dtype=np.float64), -90.0, 90.0) + 90.0
    ix = np.minimum((lon / 360.0 * nx).astype(np.int64), nx - 1)
    iy = np.minimum((lat / 180.0 * ny).astype(np.int64), ny - 1)
    return ix, iy


def ij_to_cell(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Morton-interleave grid coords into a uint64 cell key."""
    return _part1by1(np.asarray(ix, dtype=np.uint64)) | (
        _part1by1(np.asarray(iy, dtype=np.uint64)) << np.uint64(1)
    )


def cell_to_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """De-interleave a cell key back to grid coords (ix, iy)."""
    cell = np.asarray(cell, dtype=np.uint64)
    return (
        _compact1by1(cell).astype(np.int64),
        _compact1by1(cell >> np.uint64(1)).astype(np.int64),
    )


def cell_of(lat: np.ndarray, lon: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """uint64 cell id for each (lat, lon) at the given level."""
    ix, iy = latlon_to_ij(lat, lon, level)
    return ij_to_cell(ix, iy)


def parent_cell(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Cell id `steps` levels coarser; Z-order gives the prefix relation."""
    return np.asarray(cell, dtype=np.uint64) >> np.uint64(2 * steps)


def cell_to_center(cell: np.ndarray, level: int = DEFAULT_LEVEL) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees of each cell's center."""
    nx, ny = _grid_shape(level)
    ix, iy = cell_to_ij(cell)
    lon = (ix + 0.5) / nx * 360.0 - 180.0
    lat = (iy + 0.5) / ny * 180.0 - 90.0
    return lat, lon


def cell_size_deg(level: int = DEFAULT_LEVEL) -> float:
    nx, _ = _grid_shape(level)
    return 360.0 / nx


def neighbor_ring(cell: np.ndarray, k: int = 1, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """All cells within Chebyshev distance k of each input cell (incl. self).

    Output shape: (n, (2k+1)**2). Longitude wraps at the antimeridian;
    latitude clamps at the poles (clamped rows duplicate the edge cell,
    which is harmless for ring-expansion joins — duplicates are deduped
    by the groupby that consumes them).
    """
    nx, ny = _grid_shape(level)
    ix, iy = cell_to_ij(np.asarray(cell, dtype=np.uint64))
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx, dy = dx.ravel(), dy.ravel()
    jx = np.mod(ix[:, None] + dx[None, :], nx)
    jy = np.clip(iy[:, None] + dy[None, :], 0, ny - 1)
    return ij_to_cell(jx, jy)
