"""Property-based tests (hypothesis) for the geometry kernels + the
OSM XML source round-trip."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from osm2gtfs_ray.geo import cells, haversine, pip
from osm2gtfs_ray.sources import osm_fixtures as fx
from osm2gtfs_ray.sources.osm_xml import parse_osm_xml, to_osm_xml


lat_s = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=4, max_value=24))
def test_cell_roundtrip_property(lat, lon, level):
    key = cells.cell_of(np.array([lat]), np.array([lon]), level)
    clat, clon = cells.cell_to_center(key, level)
    # re-keying the center is idempotent
    assert cells.cell_of(clat, clon, level)[0] == key[0]
    # center is within one cell size of the input
    sz = cells.cell_size_deg(level)
    assert abs(clat[0] - lat) <= sz and abs(clon[0] - lon) <= sz


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=4, max_value=20),
       steps=st.integers(min_value=1, max_value=3))
def test_parent_prefix_property(lat, lon, level, steps):
    if level - steps < 2:
        return
    fine = cells.cell_of(np.array([lat]), np.array([lon]), level)
    coarse = cells.cell_of(np.array([lat]), np.array([lon]), level - steps)
    assert cells.parent_cell(fine, steps)[0] == coarse[0]


@settings(max_examples=100, deadline=None)
@given(a=st.tuples(lat_s, lon_s), b=st.tuples(lat_s, lon_s))
def test_haversine_metric_properties(a, b):
    d_ab = haversine.haversine_m(a[0], a[1], b[0], b[1])
    d_ba = haversine.haversine_m(b[0], b[1], a[0], a[1])
    assert abs(d_ab - d_ba) < 1e-6  # symmetry
    assert d_ab >= 0
    assert d_ab <= np.pi * haversine.EARTH_RADIUS_M + 1


@settings(max_examples=50, deadline=None)
@given(
    pts=st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=20),
    nv=st.integers(min_value=3, max_value=9),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_pip_convex_polygon_property(pts, nv, seed):
    """For a convex polygon, the even-odd test must agree with the
    half-plane (cross-product sign) test for interior points."""
    rng = np.random.default_rng(seed)
    clat, clon = rng.uniform(-10, 10), rng.uniform(-10, 10)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    if len(np.unique(ang)) < 3:
        return
    r = rng.uniform(1.0, 5.0)
    ring_lat = clat + r * np.sin(ang)
    ring_lon = clon + r * np.cos(ang)
    plat = np.array([p[0] for p in pts])
    plon = np.array([p[1] for p in pts])
    got = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
    # convex half-plane oracle (CCW winding by construction)
    x1, y1 = ring_lon, ring_lat
    x2, y2 = np.roll(ring_lon, -1), np.roll(ring_lat, -1)
    cross = (x2 - x1)[None, :] * (plat[:, None] - y1[None, :]) - (y2 - y1)[None, :] * (
        plon[:, None] - x1[None, :]
    )
    strict_inside = (cross > 1e-12).all(axis=1)
    strict_outside = (cross < -1e-12).any(axis=1)
    assert not (got & strict_outside).any()
    assert not (~got & strict_inside).any()


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=4, max_value=24),
       k=st.integers(min_value=-3, max_value=3))
def test_antimeridian_wrap_property(lat, lon, level, k):
    """±180 name the same meridian, and any 360° shift is identity."""
    a = cells.cell_of(np.array([lat]), np.array([lon]), level)
    b = cells.cell_of(np.array([lat]), np.array([lon + 360.0 * k]), level)
    assert a[0] == b[0]
    east = cells.cell_of(np.array([lat]), np.array([180.0]), level)
    west = cells.cell_of(np.array([lat]), np.array([-180.0]), level)
    assert east[0] == west[0]


@settings(max_examples=100, deadline=None)
@given(lon=lon_s, level=st.integers(min_value=4, max_value=24),
       south=st.booleans())
def test_pole_cells_property(lon, level, south):
    """Exact poles quantize into the edge row (clamped, never error),
    and every pole cell's center re-keys to itself."""
    lat = -90.0 if south else 90.0
    key = cells.cell_of(np.array([lat]), np.array([lon]), level)
    _, iy = cells.cell_to_ij(key)
    ny = 1 << (level - 1)
    assert iy[0] == (0 if south else ny - 1)
    clat, clon = cells.cell_to_center(key, level)
    assert cells.cell_of(clat, clon, level)[0] == key[0]
    # slightly past the pole (bad GPS fix) clamps to the same row
    key2 = cells.cell_of(np.array([lat * 1.0001]), np.array([lon]), level)
    _, iy2 = cells.cell_to_ij(key2)
    assert iy2[0] == iy[0]


@settings(max_examples=60, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=4, max_value=20),
       k=st.integers(min_value=1, max_value=2))
def test_neighbor_ring_wrap_clamp_property(lat, lon, level, k):
    """Every ring member is within wrap-aware Chebyshev distance k
    (longitude wraps, latitude clamps); the center is always included;
    the ring is exactly (2k+1)² wide."""
    nx, ny = 1 << level, 1 << (level - 1)
    cell = cells.cell_of(np.array([lat]), np.array([lon]), level)
    ring = cells.neighbor_ring(cell, k=k, level=level)
    assert ring.shape == (1, (2 * k + 1) ** 2)
    assert cell[0] in ring[0]
    ix, iy = cells.cell_to_ij(cell)
    jx, jy = cells.cell_to_ij(ring[0])
    dx = np.abs(jx - ix[0])
    dx = np.minimum(dx, nx - dx)  # wrap distance
    assert (dx <= k).all()
    assert (np.abs(jy - iy[0]) <= k).all()
    assert (jy >= 0).all() and (jy < ny).all()
    # a cell on the antimeridian column must reach the opposite column
    edge = cells.ij_to_cell(np.array([0]), iy)
    jx_e, _ = cells.cell_to_ij(cells.neighbor_ring(edge, k=k, level=level)[0])
    assert (jx_e >= nx - k).any() and (jx_e <= k - 1).any() or k == 0


@settings(max_examples=60, deadline=None)
@given(
    pts=st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_pip_degenerate_ring_property(pts, seed):
    """Zero-area (collinear) rings contain nothing off their line, and
    duplicate-vertex insertion never changes the verdict."""
    rng = np.random.default_rng(seed)
    # collinear ring: three points on a line plus the way back
    t = np.sort(rng.uniform(-5, 5, 4))
    a, b = rng.uniform(-1, 1, 2)
    ring_lat = a * t + b
    ring_lon = t
    plat = np.array([p[0] for p in pts])
    plon = np.array([p[1] for p in pts])
    off_line = np.abs(plat - (a * plon + b)) > 1e-6
    got = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
    assert not (got & off_line).any()


@settings(max_examples=60, deadline=None)
@given(
    pts=st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=12),
    nv=st.integers(min_value=3, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
    dup_at=st.integers(min_value=0, max_value=7),
    rot=st.integers(min_value=0, max_value=7),
)
def test_pip_vertex_dup_and_rotation_invariance(pts, nv, seed, dup_at, rot):
    """PIP verdicts are invariant to duplicating a vertex and to
    rotating the ring's start vertex."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    if len(np.unique(ang)) < 3:
        return
    r = rng.uniform(1.0, 5.0)
    ring_lat = r * np.sin(ang)
    ring_lon = r * np.cos(ang)
    plat = np.array([p[0] for p in pts])
    plon = np.array([p[1] for p in pts])
    base = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
    i = dup_at % nv
    dup_lat = np.insert(ring_lat, i, ring_lat[i])
    dup_lon = np.insert(ring_lon, i, ring_lon[i])
    assert (pip.points_in_polygon(plat, plon, dup_lat, dup_lon) == base).all()
    j = rot % nv
    rot_lat = np.roll(ring_lat, j)
    rot_lon = np.roll(ring_lon, j)
    assert (pip.points_in_polygon(plat, plon, rot_lat, rot_lon) == base).all()


def test_osm_xml_roundtrip():
    tables = fx.make_osm_tables()
    xml = to_osm_xml(tables)
    back = parse_osm_xml(xml)
    for name in tables:
        assert back[name].equals(tables[name]), name
