"""TileIndex determinism cases from FIXTURES.md §4: points exactly on
tile edges/vertices, kNN ties broken by lowest tile_id, and the
neighbor-ring-only candidate path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osm2gtfs_ray.geo.cells import cell_of
from osm2gtfs_ray.stages.spatial_join import TileIndex

RING_T = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))


def _tiles(*specs) -> pa.Table:
    """specs: (tile_id, [(lat, lon), ...]) closed automatically."""
    ids, rings = [], []
    for tid, pts in specs:
        ids.append(tid)
        ring = [{"lat": la, "lon": lo} for la, lo in pts]
        ring.append(ring[0])
        rings.append(ring)
    return pa.table(
        {
            "tile_id": pa.array(ids, pa.string()),
            "cell_prefix": pa.array([0] * len(ids), pa.uint64()),
            "ring": pa.array(rings, RING_T),
            "tags": pa.array([[]] * len(ids), pa.map_(pa.string(), pa.string())),
        }
    )


SQUARE = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]


class TestEdgeDeterminism:
    def test_edge_and_vertex_points_stable(self):
        idx = TileIndex(_tiles(("t0", SQUARE)))
        lat = np.array([0.0, 0.0, 0.5, 1.0])
        lon = np.array([0.5, 0.0, 0.0, 1.0])
        coarse = cell_of(lat, lon, idx.index_level)
        r1 = idx.pip_matches(lat, lon, coarse)
        r2 = idx.pip_matches(lat, lon, coarse)
        np.testing.assert_array_equal(r1[0], r2[0])
        np.testing.assert_array_equal(r1[1], r2[1])

    def test_point_in_overlapping_tiles_gets_both(self):
        idx = TileIndex(_tiles(("a", SQUARE), ("b", [(0.5, 0.5), (0.5, 1.5), (1.5, 1.5), (1.5, 0.5)])))
        lat = np.array([0.75])
        lon = np.array([0.75])
        p, t = idx.pip_matches(lat, lon, cell_of(lat, lon, idx.index_level))
        assert sorted(idx.tile_ids[i] for i in t) == ["a", "b"]


class TestKnnTieBreak:
    def test_equal_distance_lowest_tile_id_wins(self):
        # two identical small tiles mirrored around the query point:
        # centers equidistant → lowest tile_id must win (the
        # sorted-by-osm_id determinism, stops_creator_gh_accra.py:48)
        sq = lambda la, lo: [(la, lo), (la, lo + 0.1), (la + 0.1, lo + 0.1), (la + 0.1, lo)]
        idx = TileIndex(_tiles(("zz", sq(0.0, -1.0)), ("aa", sq(0.0, 0.9))))
        t, d = idx.knn_nearest(np.array([0.05]), np.array([0.0]), radius_m=500_000)
        assert idx.tile_ids[t[0]] == "aa"
        # and independent of insertion order
        idx2 = TileIndex(_tiles(("aa", sq(0.0, 0.9)), ("zz", sq(0.0, -1.0))))
        t2, _ = idx2.knn_nearest(np.array([0.05]), np.array([0.0]), radius_m=500_000)
        assert idx2.tile_ids[t2[0]] == "aa"

    def test_ring_expansion_path(self):
        # candidate lives several coarse cells away: found only through
        # ring expansion; outside the radius: not found
        sq = [(5.0, 5.0), (5.0, 5.1), (5.1, 5.1), (5.1, 5.0)]
        idx = TileIndex(_tiles(("far", sq)))
        t, d = idx.knn_nearest(np.array([3.0]), np.array([5.0]), radius_m=300_000)
        assert idx.tile_ids[t[0]] == "far"
        t2, _ = idx.knn_nearest(np.array([3.0]), np.array([5.0]), radius_m=100_000)
        assert t2[0] == -1

    def test_empty_cell_no_crash(self):
        idx = TileIndex(_tiles(("t", SQUARE)))
        t, d = idx.knn_nearest(np.array([-80.0]), np.array([170.0]), radius_m=50_000)
        assert t[0] == -1 and np.isinf(d[0])


def test_antimeridian_tile_pip_and_knn():
    """A tile crossing ±180 must be indexed (covering_cells split) and
    match points on BOTH sides of the antimeridian via PIP."""
    import pyarrow as pa

    from osm2gtfs_ray.stages.spatial_join import TileIndex, covering_cells

    ring = [
        {"lat": -1.0, "lon": 179.5},
        {"lat": -1.0, "lon": -179.5},
        {"lat": 1.0, "lon": -179.5},
        {"lat": 1.0, "lon": 179.5},
        {"lat": -1.0, "lon": 179.5},
    ]
    ring_type = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))
    tiles = pa.table(
        {"tile_id": pa.array(["t_am"]), "ring": pa.array([ring], ring_type)}
    )
    idx = TileIndex(tiles, index_level=8)
    # wrapped bbox registered with west > east
    assert idx.bboxes[0, 1] > idx.bboxes[0, 3]
    # covering cells nonzero (split across the seam)
    assert len(covering_cells(idx.bboxes[0], 8)) > 0
    lat = np.array([0.0, 0.0, 0.0, 0.0])
    lon = np.array([179.8, -179.8, 178.0, -178.0])  # in, in, out, out
    from osm2gtfs_ray.geo.cells import cell_of

    coarse = cell_of(lat, lon, 8)
    p, t = idx.pip_matches(lat, lon, coarse)
    assert set(p.tolist()) == {0, 1}
    assert all(ti == 0 for ti in t)


def test_knn_ring_covers_radius_at_high_latitude():
    """At lat 75° the E-W cell width shrinks ~4×: a tile center 90 km
    due east must still be found within a 100 km radius."""
    import pyarrow as pa

    from osm2gtfs_ray.geo.haversine import haversine_m
    from osm2gtfs_ray.stages.spatial_join import TileIndex

    clat, clon = 75.0, 10.0 + 90_000.0 / (111_320.0 * np.cos(np.radians(75.0)))
    ring = [
        {"lat": clat + dy, "lon": clon + dx}
        for dy, dx in [(-0.01, -0.01), (-0.01, 0.01), (0.01, 0.01), (0.01, -0.01), (-0.01, -0.01)]
    ]
    ring_type = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))
    tiles = pa.table(
        {"tile_id": pa.array(["t_hi"]), "ring": pa.array([ring], ring_type)}
    )
    idx = TileIndex(tiles, index_level=8)
    d = haversine_m(75.0, 10.0, idx.center_lat[0], idx.center_lon[0])
    assert d < 100_000.0  # fixture sanity: within the kNN radius
    best_t, best_d = idx.knn_nearest(np.array([75.0]), np.array([10.0]), 100_000.0)
    assert best_t[0] == 0
