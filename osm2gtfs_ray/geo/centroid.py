"""Spherical centroid (3D unit-vector mean).

Re-expresses the reference's way/station centroid
(/root/reference/osm2gtfs/core/helper.py:28-54, callers
osm_connector.py:444-446 and 542-543) as a vectorized kernel with a
mergeable partial form (Σx, Σy, Σz, n) so it can run as a distributed
groupby aggregate (SURVEY.md A1).
"""

from __future__ import annotations

import numpy as np


def _to_xyz(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    cl = np.cos(lat_r)
    return cl * np.cos(lon_r), cl * np.sin(lon_r), np.sin(lat_r)


def centroid_partials(lat: np.ndarray, lon: np.ndarray) -> tuple[float, float, float, int]:
    """Mergeable partial accumulator (Σx, Σy, Σz, n) for a point set."""
    x, y, z = _to_xyz(lat, lon)
    return float(x.sum()), float(y.sum()), float(z.sum()), int(np.size(x))


def centroid_from_partials(sx: float, sy: float, sz: float, n: int) -> tuple[float, float]:
    """Finalize partials to a (lat, lon) in degrees."""
    if n == 0:
        return float("nan"), float("nan")
    x, y, z = sx / n, sy / n, sz / n
    lon = np.degrees(np.arctan2(y, x))
    hyp = np.sqrt(x * x + y * y)
    lat = np.degrees(np.arctan2(z, hyp))
    return float(lat), float(lon)


def spherical_centroid(lat: np.ndarray, lon: np.ndarray) -> tuple[float, float]:
    """(lat, lon) centroid of a point set on the unit sphere."""
    return centroid_from_partials(*centroid_partials(lat, lon))


def grouped_centroid(
    lat: np.ndarray, lon: np.ndarray, group_codes: np.ndarray, n_groups: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-group spherical centroid via bincount.

    ``group_codes`` are dense ints in [0, n_groups). Returns arrays of
    (lat, lon) per group — the segment-reduce form used inside
    map_batches for way/station centroids without a per-group Python
    loop.
    """
    x, y, z = _to_xyz(lat, lon)
    sx = np.bincount(group_codes, weights=x, minlength=n_groups)
    sy = np.bincount(group_codes, weights=y, minlength=n_groups)
    sz = np.bincount(group_codes, weights=z, minlength=n_groups)
    n = np.bincount(group_codes, minlength=n_groups).astype(np.float64)
    n = np.where(n == 0, np.nan, n)
    mx, my, mz = sx / n, sy / n, sz / n
    lon_out = np.degrees(np.arctan2(my, mx))
    lat_out = np.degrees(np.arctan2(mz, np.sqrt(mx * mx + my * my)))
    return lat_out, lon_out
