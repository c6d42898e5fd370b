"""Point-in-polygon, vectorized ray casting over packed coordinate arrays.

Generalizes the reference's bbox spatial predicate
(/root/reference/osm2gtfs/core/osm_connector.py:38-41, used at query
time 570-616) — a degenerate PIP — to arbitrary polygon tiles, per
SURVEY.md G6. No shapely in this environment: "prepared geometry" is a
bbox prefilter plus the packed-edge crossing-number test below; the
STRtree is replaced by the sorted cell-interval index in
stages/spatial_join.py.

Edge rule: a point exactly on a boundary edge or vertex is resolved by
the half-open crossing rule below (consistent and deterministic across
runs/partitions — the determinism the FIXTURES.md edge/vertex cases
require), matching the common even-odd algorithm.
"""

from __future__ import annotations

import numpy as np


def polygon_bbox(ring_lat: np.ndarray, ring_lon: np.ndarray) -> tuple[float, float, float, float]:
    """(south, west, north, east) of a ring."""
    return (
        float(np.min(ring_lat)),
        float(np.min(ring_lon)),
        float(np.max(ring_lat)),
        float(np.max(ring_lon)),
    )


def points_in_polygon(
    plat: np.ndarray,
    plon: np.ndarray,
    ring_lat: np.ndarray,
    ring_lon: np.ndarray,
) -> np.ndarray:
    """Even-odd crossing test of n points against one ring, vectorized n×m.

    The ring may be open (first != last) — closure is implicit. Uses
    planar lat/lon geometry (tiles are small relative to the globe; the
    same convention the reference uses for its bbox test).
    """
    plat = np.asarray(plat, dtype=np.float64)[:, None]
    plon = np.asarray(plon, dtype=np.float64)[:, None]
    y1 = np.asarray(ring_lat, dtype=np.float64)[None, :]
    x1 = np.asarray(ring_lon, dtype=np.float64)[None, :]
    y2 = np.roll(ring_lat, -1).astype(np.float64)[None, :]
    x2 = np.roll(ring_lon, -1).astype(np.float64)[None, :]

    # Half-open rule: edge counts when it spans the point's latitude.
    cond = (y1 > plat) != (y2 > plat)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1 + (plat - y1) / (y2 - y1) * (x2 - x1)
    crossing = cond & (plon < x_int)
    return (np.count_nonzero(crossing, axis=1) % 2).astype(bool)


def bbox_contains(
    plat: np.ndarray,
    plon: np.ndarray,
    south: float,
    west: float,
    north: float,
    east: float,
) -> np.ndarray:
    """Vectorized bbox predicate (the reference's G6 semantics).

    A wrapped box (west > east) crosses the antimeridian: the lon test
    becomes a disjunction of the two half-ranges."""
    plat = np.asarray(plat, dtype=np.float64)
    plon = np.asarray(plon, dtype=np.float64)
    lat_ok = (plat >= south) & (plat <= north)
    if west > east:
        return lat_ok & ((plon >= west) | (plon <= east))
    return lat_ok & (plon >= west) & (plon <= east)
