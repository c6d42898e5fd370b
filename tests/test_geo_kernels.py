"""Unit tests for pure-numpy geometry kernels vs brute-force oracles."""

from __future__ import annotations

import numpy as np
import pytest

from osm2gtfs_ray.geo import cells, haversine, centroid, pip


RNG = np.random.default_rng(42)


class TestCells:
    def test_roundtrip_ij(self):
        ix = RNG.integers(0, 2**18, size=1000)
        iy = RNG.integers(0, 2**17, size=1000)
        key = cells.ij_to_cell(ix, iy)
        jx, jy = cells.cell_to_ij(key)
        np.testing.assert_array_equal(ix, jx)
        np.testing.assert_array_equal(iy, jy)

    def test_cell_center_within_cell(self):
        lat = RNG.uniform(-89, 89, size=500)
        lon = RNG.uniform(-180, 180, size=500)
        key = cells.cell_of(lat, lon)
        clat, clon = cells.cell_to_center(key)
        sz = cells.cell_size_deg()
        assert np.all(np.abs(clat - lat) <= sz)
        assert np.all(np.abs(clon - lon) <= sz)
        # re-keying the center returns the same cell
        np.testing.assert_array_equal(cells.cell_of(clat, clon), key)

    def test_parent_prefix(self):
        lat = RNG.uniform(-89, 89, size=200)
        lon = RNG.uniform(-180, 180, size=200)
        fine = cells.cell_of(lat, lon, level=18)
        coarse = cells.cell_of(lat, lon, level=15)
        np.testing.assert_array_equal(cells.parent_cell(fine, steps=3), coarse)

    def test_neighbor_ring_contains_nearby_point(self):
        # a point ~100m east must fall in the 1-ring at level 18 (~153m cells)
        lat = np.array([47.5])
        lon = np.array([8.5])
        d = 100.0 / 111_320.0  # ~100 m in degrees at equator scale
        near = cells.cell_of(lat, lon + d)
        ring = cells.neighbor_ring(cells.cell_of(lat, lon), k=1)
        assert near[0] in ring[0]

    def test_neighbor_ring_wraps_antimeridian(self):
        cell = cells.cell_of(np.array([0.0]), np.array([179.9999]))
        ring = cells.neighbor_ring(cell, k=1)
        other_side = cells.cell_of(np.array([0.0]), np.array([-179.9999]))
        assert other_side[0] in ring[0]

    def test_pole_clamp(self):
        cell = cells.cell_of(np.array([90.0, -90.0]), np.array([0.0, 0.0]))
        ring = cells.neighbor_ring(cell, k=1)
        assert ring.shape == (2, 9)  # no crash, duplicates allowed


class TestHaversine:
    def test_known_distance(self):
        # Paris -> London ~343.5 km
        d = haversine.haversine_m(48.8566, 2.3522, 51.5074, -0.1278)
        assert abs(d - 343_500) < 1500

    def test_zero(self):
        assert haversine.haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0

    def test_broadcast_matrix(self):
        lat = RNG.uniform(-80, 80, size=10)
        lon = RNG.uniform(-180, 180, size=10)
        m = haversine.haversine_m(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
        assert m.shape == (10, 10)
        np.testing.assert_allclose(np.diag(m), 0.0, atol=1e-6)
        np.testing.assert_allclose(m, m.T, rtol=1e-12)


class TestCentroid:
    def test_simple_mean(self):
        lat, lon = centroid.spherical_centroid(
            np.array([10.0, 10.0, 12.0, 12.0]), np.array([20.0, 22.0, 20.0, 22.0])
        )
        assert abs(lat - 11.0) < 0.01
        assert abs(lon - 21.0) < 0.01

    def test_partials_merge(self):
        la = RNG.uniform(-60, 60, size=100)
        lo = RNG.uniform(-170, 170, size=100)
        full = centroid.spherical_centroid(la, lo)
        p1 = centroid.centroid_partials(la[:40], lo[:40])
        p2 = centroid.centroid_partials(la[40:], lo[40:])
        merged = centroid.centroid_from_partials(
            p1[0] + p2[0], p1[1] + p2[1], p1[2] + p2[2], p1[3] + p2[3]
        )
        assert abs(full[0] - merged[0]) < 1e-9
        assert abs(full[1] - merged[1]) < 1e-9

    def test_grouped_matches_loop(self):
        la = RNG.uniform(-60, 60, size=200)
        lo = RNG.uniform(-170, 170, size=200)
        codes = RNG.integers(0, 5, size=200)
        glat, glon = centroid.grouped_centroid(la, lo, codes, 5)
        for g in range(5):
            m = codes == g
            want = centroid.spherical_centroid(la[m], lo[m])
            assert abs(glat[g] - want[0]) < 1e-9
            assert abs(glon[g] - want[1]) < 1e-9


def _brute_pip(px, py, rx, ry):
    """Classic scalar even-odd point-in-polygon for oracle comparison."""
    n = len(rx)
    inside = False
    j = n - 1
    for i in range(n):
        if (ry[i] > py) != (ry[j] > py):
            xin = rx[i] + (py - ry[i]) / (ry[j] - ry[i]) * (rx[j] - rx[i])
            if px < xin:
                inside = not inside
        j = i
    return inside


class TestPIP:
    def test_square(self):
        ring_lat = np.array([0.0, 0.0, 1.0, 1.0])
        ring_lon = np.array([0.0, 1.0, 1.0, 0.0])
        plat = np.array([0.5, 1.5, -0.1, 0.999])
        plon = np.array([0.5, 0.5, 0.5, 0.999])
        got = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
        np.testing.assert_array_equal(got, [True, False, False, True])

    def test_star_polygon_vs_brute(self):
        # non-convex star
        ang = np.linspace(0, 2 * np.pi, 10, endpoint=False)
        r = np.where(np.arange(10) % 2 == 0, 1.0, 0.4)
        ring_lat = r * np.sin(ang)
        ring_lon = r * np.cos(ang)
        plat = RNG.uniform(-1.2, 1.2, size=300)
        plon = RNG.uniform(-1.2, 1.2, size=300)
        got = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
        want = np.array(
            [_brute_pip(x, y, ring_lon, ring_lat) for x, y in zip(plon, plat)]
        )
        np.testing.assert_array_equal(got, want)

    def test_edge_and_vertex_deterministic(self):
        ring_lat = np.array([0.0, 0.0, 1.0, 1.0])
        ring_lon = np.array([0.0, 1.0, 1.0, 0.0])
        # exactly on edge / vertex: result is stable across repeated calls
        plat = np.array([0.0, 0.0, 0.5])
        plon = np.array([0.5, 0.0, 0.0])
        a = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
        b = pip.points_in_polygon(plat, plon, ring_lat, ring_lon)
        np.testing.assert_array_equal(a, b)

    def test_bbox(self):
        got = pip.bbox_contains(
            np.array([0.5, 2.0]), np.array([0.5, 0.5]), 0.0, 0.0, 1.0, 1.0
        )
        np.testing.assert_array_equal(got, [True, False])


class TestCellPyramid:
    def test_levels_consistent(self, ray_session):
        """Every zoom level holds the same total mass, and rolling the
        fine level up by hand reproduces the coarser levels exactly."""
        import pandas as pd

        from osm2gtfs_ray.pipelines.geo_queries import (
            CELL_LEVEL,
            PYRAMID_LEVELS,
            q_cell_pyramid,
        )

        df = q_cell_pyramid("/root/testdata/sf0.001").to_pandas()
        totals = df.groupby("level")["n"].sum()
        assert len(set(totals.tolist())) == 1  # same mass at every zoom

        fine = df[df["level"] == PYRAMID_LEVELS[0]]
        for level in PYRAMID_LEVELS[1:]:
            shift = 2 * (PYRAMID_LEVELS[0] - level)
            fnx, pnx = 1 << PYRAMID_LEVELS[0], 1 << level
            ix = fine["cell_rm"].to_numpy() % fnx
            iy = fine["cell_rm"].to_numpy() // fnx
            pkey = (iy >> shift // 2) * pnx + (ix >> shift // 2)
            want = (
                pd.DataFrame({"cell_rm": pkey, "n": fine["n"].to_numpy()})
                .groupby("cell_rm")["n"]
                .sum()
                .sort_index()
            )
            got = (
                df[df["level"] == level]
                .set_index("cell_rm")["n"]
                .sort_index()
            )
            assert (got.index == want.index).all()
            assert (got.to_numpy() == want.to_numpy()).all()

    def test_local_and_cascade_plans_agree(self, ray_session, monkeypatch):
        """Forcing the per-level cascade (as if the pyramid were too
        deep for one block) must reproduce the local-pass result."""
        from osm2gtfs_ray.pipelines import geo_queries

        local = (
            geo_queries.q_cell_pyramid("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["level", "cell_rm"])
            .reset_index(drop=True)
        )
        monkeypatch.setattr(geo_queries, "LOCAL_PYRAMID_CELLS", 0)
        cascade = (
            geo_queries.q_cell_pyramid("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["level", "cell_rm"])
            .reset_index(drop=True)
        )
        assert local.equals(cascade)


class TestTileGeometry:
    """Integer shoelace kernel (pipelines/geo_queries.tile_geometry_batch):
    hand-computed areas, winding, slice rebasing — the SQL gate
    (tile_geometry) is the independent DuckDB recomputation."""

    @staticmethod
    def _ring_table(rings):
        import pyarrow as pa

        ring_type = pa.list_(
            pa.struct([("lat", pa.float64()), ("lon", pa.float64())])
        )
        return pa.table(
            {
                "tile_id": [f"t{i}" for i in range(len(rings))],
                "ring": pa.array(
                    [
                        [{"lat": la, "lon": lo} for la, lo in r]
                        for r in rings
                    ],
                    ring_type,
                ),
            }
        )

    def test_unit_square_ccw(self):
        from osm2gtfs_ray.pipelines.geo_queries import tile_geometry_batch

        # 1°x1° square, CCW in the (lon, lat) plane, closed
        sq = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
        out = tile_geometry_batch(self._ring_table([sq])).to_pandas().iloc[0]
        assert out["n_vertices"] == 4
        assert out["area2_e12"] == 2 * 10**6 * 10**6  # 2 * (1e6)^2
        assert out["orientation"] == "ccw"
        assert (out["s_e6"], out["w_e6"], out["n_e6"], out["e_e6"]) == (
            0, 0, 10**6, 10**6,
        )

    def test_reversed_ring_is_cw_same_area(self):
        from osm2gtfs_ray.pipelines.geo_queries import tile_geometry_batch

        sq = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
        rev = sq[::-1]
        out = tile_geometry_batch(self._ring_table([sq, rev])).to_pandas()
        assert out["area2_e12"].iloc[0] == out["area2_e12"].iloc[1]
        assert list(out["orientation"]) == ["ccw", "cw"]

    def test_translation_invariance_far_from_origin(self):
        from osm2gtfs_ray.pipelines.geo_queries import tile_geometry_batch

        # same square shifted to the antimeridian corner: the raw
        # cross products would overflow int64 without the per-ring
        # translation; the area must not change
        sq = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
        far = [(la + 88.0, lo + 178.0) for la, lo in sq]
        out = tile_geometry_batch(self._ring_table([sq, far])).to_pandas()
        assert out["area2_e12"].iloc[0] == out["area2_e12"].iloc[1]

    def test_sliced_block_rebases_offsets(self):
        from osm2gtfs_ray.pipelines.geo_queries import tile_geometry_batch

        sq = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
        tri = [(0, 0), (0, 2), (2, 0), (0, 0)]
        t = self._ring_table([tri, sq])
        full = tile_geometry_batch(t).to_pandas()
        sliced = tile_geometry_batch(t.slice(1)).to_pandas()
        assert sliced.iloc[0].equals(full.iloc[1])

    def test_fixture_tiles_all_ccw_positive_area(self, ray_session):
        from osm2gtfs_ray.pipelines.geo_queries import q_tile_geometry

        out = q_tile_geometry("unused").to_pandas()
        assert len(out) == 64
        assert (out["orientation"] == "ccw").all()
        assert (out["area2_e12"] > 0).all()
        assert (out["n_vertices"] >= 5).all()  # grid 5..8 verts, hot 8


class TestSimplifyShapes:
    """Douglas-Peucker kernel (ops/simplify.py): fuzz vs the recursive
    reference, degenerate chords, extent guard, depth cap. The SQL gate
    (simplify_shapes) is the bit-exact unrolled-CTE oracle."""

    def test_fuzz_vs_recursive_reference(self):
        import numpy as np

        from osm2gtfs_ray.ops.simplify import dp_keep_mask, dp_reference

        rng = np.random.default_rng(7)
        for _ in range(60):
            offs, xs, ys, per = [0], [], [], []
            for _s in range(int(rng.integers(1, 5))):
                m = int(rng.integers(2, 30))
                x = rng.integers(-5000, 5000, m)
                y = rng.integers(-5000, 5000, m)
                xs.append(x); ys.append(y); per.append((x, y))
                offs.append(offs[-1] + m)
            eps = int(rng.integers(0, 3000))
            mask = dp_keep_mask(
                np.array(offs), np.concatenate(xs), np.concatenate(ys), eps
            )
            want = np.concatenate(
                [
                    np.array(dp_reference(list(zip(x.tolist(), y.tolist())), eps))
                    for x, y in per
                ]
            )
            assert (mask == want).all()

    def test_degenerate_chord_and_identical_points(self):
        import numpy as np

        from osm2gtfs_ray.ops.simplify import dp_keep_mask, dp_reference

        x = np.array([0, 100, 0, 0]); y = np.array([0, 0, 50, 0])
        m = dp_keep_mask(np.array([0, 4]), x, y, 10)
        assert (m == np.array(dp_reference([(0, 0), (100, 0), (0, 50), (0, 0)], 10))).all()
        z = np.zeros(5, dtype=np.int64)
        m = dp_keep_mask(np.array([0, 5]), z, z, 3)
        assert m.tolist() == [True, False, False, False, True]

    def test_extent_guard_raises(self):
        import numpy as np
        import pytest as _pytest

        from osm2gtfs_ray.ops.simplify import dp_keep_mask

        x = np.array([0, 100_000, 0])
        y = np.array([0, 0, 1])
        with _pytest.raises(ValueError, match="extent"):
            dp_keep_mask(np.array([0, 3]), x, y, 10)

    def test_depth_cap_raises_and_fixture_fits_oracle_unroll(self):
        import numpy as np
        import pytest as _pytest

        from osm2gtfs_ray.ops.simplify import dp_keep_mask
        from osm2gtfs_ray.pipelines.geo_queries import (
            DP_EPS_E4,
            DP_SQL_LEVELS,
            synth_shape_points,
        )

        # a strictly convex arc with eps=0 splits one level per point
        n = 12
        t = np.arange(n, dtype=np.int64)
        x, y = t, t * t
        with _pytest.raises(RuntimeError, match="max_levels"):
            dp_keep_mask(np.array([0, n]), x, y, 0, max_levels=2)
        # the registered fixture must fit the SQL oracle's unroll at
        # every testdata size (point set is capped per shape)
        for n_events in (1000, 1200, 10000, 100000):
            sid, seq, xx, yy = synth_shape_points(
                np.arange(n_events, dtype=np.uint64)
            )
            o = np.lexsort((seq, sid))
            sid, xx, yy = sid[o], xx[o], yy[o]
            starts = np.nonzero(np.diff(sid, prepend=sid[0] - 1))[0]
            offsets = np.concatenate([starts, [len(sid)]])
            dp_keep_mask(offsets, xx, yy, DP_EPS_E4, max_levels=DP_SQL_LEVELS)

    def test_endpoints_always_kept_eps_huge(self):
        import numpy as np

        from osm2gtfs_ray.ops.simplify import dp_keep_mask

        rng = np.random.default_rng(3)
        x = rng.integers(-5000, 5000, 20); y = rng.integers(-5000, 5000, 20)
        m = dp_keep_mask(np.array([0, 20]), x, y, 30_000)
        assert m[0] and m[-1] and m.sum() == 2


class TestCellSmooth:
    """3x3 k-ring smoothing: lon wrap / lat clamp semantics on a tiny
    hand grid, plan equivalence local vs shuffle. The SQL gate
    (cell_smooth) is the bit-exact oracle at corpus scale."""

    def test_plan_equivalence(self, ray_session):
        from osm2gtfs_ray.pipelines.geo_queries import q_cell_smooth

        sf = "/root/testdata/sf0.001"

        def canon(df):
            return df.sort_values("cell_rm").reset_index(drop=True)

        a = canon(q_cell_smooth(sf, plan="local").to_pandas())
        b = canon(q_cell_smooth(sf, plan="shuffle").to_pandas())
        assert a.equals(b.astype(a.dtypes.to_dict()))

    def test_wrap_and_clamp_semantics(self):
        """Drive the local convolution kernel directly: one event at
        (iy=0, ix=0) must smooth into its 6 in-grid neighbors (lat
        clamped below row 0), including the antimeridian columns."""
        import numpy as np

        nx, ny = 256, 128
        grid = np.zeros((ny, nx), dtype=np.int64)
        grid[0, 0] = 1
        sm = np.zeros_like(grid)
        for dy in (-1, 0, 1):
            if dy < 0:
                src, dst = grid[1:], sm[:-1]
            elif dy > 0:
                src, dst = grid[:-1], sm[1:]
            else:
                src, dst = grid, sm
            for dx in (-1, 0, 1):
                dst += np.roll(src, dx, axis=1)
        hit = set(zip(*np.nonzero(sm)))
        assert hit == {
            (0, 0), (0, 1), (0, 255), (1, 0), (1, 1), (1, 255)
        }
        assert sm.sum() == 6  # 9 offsets minus the 3 clamped below row 0


class TestSnapPoints:
    """Point->segment snap vs a cell-free brute argmin over ALL
    segments (validates the cell replication/co-partition logic
    independently); plus exact-metric edge cases. SQL gate:
    `snap_points` (brute bbox join + ROW_NUMBER argmin)."""

    def test_matches_cellfree_brute(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.geo_queries import (
            N_SHAPES,
            SHAPE_PTS,
            SNAP_R,
            _snap_d2,
            q_snap_points,
            synth_shape_points,
            synth_snap_points,
        )

        n_ev = N_SHAPES * SHAPE_PTS + 37  # extra ids past the cap ignored
        pq.write_table(
            pa.table({"event_id": np.arange(n_ev, dtype=np.int64)}),
            tmp_path / "events.parquet",
        )
        got = (
            q_snap_points(str(tmp_path))
            .to_pandas()
            .sort_values("point_id")
            .reset_index(drop=True)
        )

        ids = np.arange(n_ev, dtype=np.uint64)
        sid, seq, x, y = synth_shape_points(ids)
        pid, px, py = synth_snap_points(ids)
        o = np.lexsort((seq, sid))
        sid, seq, x, y = sid[o], seq[o], x[o], y[o]
        m = (sid[1:] == sid[:-1]) & (seq[1:] == seq[:-1] + 1)
        i = np.flatnonzero(m)
        rows = []
        for k in range(len(pid)):
            ok = (
                (px[k] >= np.minimum(x[i], x[i + 1]) - SNAP_R)
                & (px[k] <= np.maximum(x[i], x[i + 1]) + SNAP_R)
                & (py[k] >= np.minimum(y[i], y[i + 1]) - SNAP_R)
                & (py[k] <= np.maximum(y[i], y[i + 1]) + SNAP_R)
            )
            j = i[ok]
            if not len(j):
                continue
            d2 = _snap_d2(px[k], py[k], x[j], y[j], x[j + 1], y[j + 1])
            order = np.lexsort((seq[j], sid[j], d2))
            b = order[0]
            rows.append((int(pid[k]), int(sid[j][b]), int(seq[j][b]), int(d2[b])))
        import pandas as pd

        want = (
            pd.DataFrame(rows, columns=["point_id", "shape_id", "seq", "d2"])
            .sort_values("point_id")
            .reset_index(drop=True)
        )
        assert got.astype(want.dtypes.to_dict()).equals(want)
        assert len(got) > 0

    def test_metric_edge_cases(self):
        from osm2gtfs_ray.pipelines.geo_queries import _snap_d2

        a = np.array([0], dtype=np.int64)
        # interior projection: p=(5,3) onto x-axis segment (0,0)-(10,0)
        assert _snap_d2(a + 5, a + 3, a, a, a + 10, a)[0] == 9
        # before start -> endpoint a
        assert _snap_d2(a - 4, a + 3, a, a, a + 10, a)[0] == 25
        # past end -> endpoint b
        assert _snap_d2(a + 14, a + 3, a, a, a + 10, a)[0] == 25
        # degenerate zero-length segment -> plain point distance
        assert _snap_d2(a + 3, a + 4, a, a, a, a)[0] == 25
        # floored interior term: p=(1,1) on (0,0)-(3,1): d_a=2,
        # t_num=4, t_den=10 -> 2 - 16//10 = 1 (exact would be 0.4)
        assert _snap_d2(a + 1, a + 1, a, a, a + 3, a + 1)[0] == 1


class TestShapeLength:
    """Exact corrected-isqrt polyline length vs a scalar reference;
    isqrt fuzz vs math.isqrt. SQL gate: `shape_length`."""

    def test_isqrt_correction_exact(self):
        import math

        rng = np.random.default_rng(3)
        x = np.concatenate(
            [rng.integers(0, 2 * 10**8, 50_000),
             np.array([0, 1, 2, 3, 4, 2 * 10**8 - 1])]
        ).astype(np.int64)
        r = np.floor(np.sqrt(x.astype(np.float64))).astype(np.int64)
        r = r - (r * r > x) + ((r + 1) * (r + 1) <= x)
        want = np.array([math.isqrt(int(v)) for v in x[:200]])
        assert (r[:200] == want).all()
        assert ((r * r <= x) & ((r + 1) * (r + 1) > x)).all()

    def test_matches_scalar_reference(self, ray_session, tmp_path):
        import math

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.geo_queries import (
            N_SHAPES,
            SHAPE_PTS,
            q_shape_length,
            synth_shape_points,
        )

        n_ev = N_SHAPES * SHAPE_PTS
        pq.write_table(
            pa.table({"event_id": np.arange(n_ev, dtype=np.int64)}),
            tmp_path / "events.parquet",
        )
        got = (
            q_shape_length(str(tmp_path))
            .to_pandas()
            .sort_values("shape_id")
            .reset_index(drop=True)
        )
        sid, seq, x, y = synth_shape_points(np.arange(n_ev, dtype=np.uint64))
        o = np.lexsort((seq, sid))
        sid, x, y = sid[o], x[o], y[o]
        want = {}
        for s in np.unique(sid):
            m = sid == s
            xs, ys = x[m], y[m]
            tot = sum(
                math.isqrt(int((xs[i + 1] - xs[i]) ** 2 + (ys[i + 1] - ys[i]) ** 2))
                for i in range(len(xs) - 1)
            )
            want[int(s)] = (len(xs) - 1, tot)
        assert len(got) == len(want)
        for _, row in got.iterrows():
            ns, ln = want[int(row["shape_id"])]
            assert row["n_segs"] == ns and row["len_e4"] == ln


class TestHotspots:
    """NMS density peaks: plan equivalence, hot-center recovery, and
    tie/suppression semantics on a hand grid. SQL gate: `hotspots`."""

    def test_finds_hot_centers_and_plans_agree(self, ray_session):
        from osm2gtfs_ray.pipelines.geo_queries import CELL_LEVEL, q_hotspots
        from osm2gtfs_ray.sources.pages import HOT_CENTERS

        sf = "/root/testdata/sf0.001"
        nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)

        def canon(ds):
            return ds.to_pandas().sort_values("cell_rm").reset_index(drop=True)

        a = canon(q_hotspots(sf, plan="local"))
        b = canon(q_hotspots(sf, plan="shuffle"))
        assert b.astype(a.dtypes.to_dict()).equals(a)
        # every hot center's cell is among the detected peaks
        want = set()
        for lat, lon in HOT_CENTERS:
            ix = min(int(((lon + 180.0) / 360.0) * nx), nx - 1)
            iy = min(int(((lat + 90.0) / 180.0) * ny), ny - 1)
            want.add(iy * nx + ix)
        assert want <= set(a["cell_rm"].tolist())

    def test_tie_break_suppression(self):
        """Two adjacent equal-count peaks: only the lower cell id
        survives (the deterministic plateau rule)."""
        nx, ny = 256, 128
        grid = np.zeros((ny, nx), dtype=np.int64)
        grid[10, 10] = 7
        grid[10, 11] = 7  # adjacent tie
        grid[50, 50] = 7  # isolated peak
        cid = (np.arange(ny)[:, None] * nx + np.arange(nx)[None, :]).astype(np.int64)
        beaten = np.zeros((ny, nx), dtype=bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nbv = np.zeros_like(grid)
                nbi = np.full((ny, nx), np.int64(1) << 60)
                sv = np.roll(grid, -dx, axis=1)
                si = np.roll(cid, -dx, axis=1)
                if dy < 0:
                    nbv[1:], nbi[1:] = sv[:-1], si[:-1]
                elif dy > 0:
                    nbv[:-1], nbi[:-1] = sv[1:], si[1:]
                else:
                    nbv, nbi = sv, si
                beaten |= (nbv > grid) | ((nbv == grid) & (nbi < cid))
        hot = (grid >= 5) & ~beaten
        assert set(zip(*np.nonzero(hot))) == {(10, 10), (50, 50)}


class TestGridClusters:
    """DBSCAN-lite cluster invariants via an independent flood fill
    over the core-cell set. SQL gate: `grid_clusters` (recursive-CTE
    transitive closure)."""

    def test_flood_fill_reference(self, ray_session):
        from collections import deque

        from osm2gtfs_ray.pipelines.geo_queries import (
            CELL_LEVEL,
            q_grid_clusters,
        )

        nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
        got = (
            q_grid_clusters("/root/testdata/sf0.01")
            .to_pandas()
            .sort_values("cell_rm")
            .reset_index(drop=True)
        )
        cells = set(got["cell_rm"].tolist())
        # independent BFS flood fill with wrap/clamp adjacency
        label = {}
        for start in sorted(cells):
            if start in label:
                continue
            comp = [start]
            q, seen = deque([start]), {start}
            while q:
                c = q.popleft()
                iy, ix = c // nx, c % nx
                for dy in (-1, 0, 1):
                    if not (0 <= iy + dy < ny):
                        continue
                    for dx in (-1, 0, 1):
                        nb = (iy + dy) * nx + (ix + dx + nx) % nx
                        if nb in cells and nb not in seen:
                            seen.add(nb)
                            q.append(nb)
                            comp.append(nb)
            root = min(comp)
            for c in comp:
                label[c] = root
        want = got["cell_rm"].map(label)
        assert (got["cluster_id"] == want).all()
        assert (got["n"] >= 2).all()
        # at least one multi-cell cluster exists at this sf
        assert got["cluster_id"].duplicated().any()


class TestTileDelta:
    """Per-tile snapshot delta invariants vs the doc-level crawl
    delta: tile-level totals must equal the entity counts of each
    snapshot's doc set. SQL gate: `tile_delta`."""

    def test_totals_match_doc_membership(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.geo_queries import q_tile_delta
        from osm2gtfs_ray.pipelines.web_queries import _S_IN_A, _S_IN_B
        from osm2gtfs_ray.sources.pages import _uint

        sf = "/root/testdata/sf0.001"
        got = q_tile_delta(sf).to_pandas()
        did = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy().astype(np.uint64)
        n_ent = _uint(did, 3, 42, 4)
        in_a = _uint(did, _S_IN_A, 42, 10) != 0
        in_b = _uint(did, _S_IN_B, 42, 10) != 0
        assert got["n_a"].sum() == n_ent[in_a].sum()
        assert got["n_b"].sum() == n_ent[in_b].sum()
        assert (got[["n_a", "n_b"]].sum(axis=1) > 0).all()
        # an incremental recrawl actually changes some tiles
        assert (got["n_a"] != got["n_b"]).any()


class TestODFlows:
    """OD transition conservation + a scalar per-user reference on a
    crafted table with ts ties. SQL gate: `od_flows` (LAG window)."""

    def test_conservation_and_reference(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines.geo_queries import OD_LEVEL, q_od_flows

        rng = np.random.default_rng(9)
        n, users = 600, 25
        uid = rng.integers(0, users, n)
        # duplicate timestamps force the (ts, event_id) tie-break
        ts = pd.to_datetime(rng.integers(0, 50, n), unit="h")
        pq.write_table(
            pa.table(
                {
                    "event_id": np.arange(n, dtype=np.int64),
                    "ts": pa.array(ts),
                    "user_id": uid.astype(np.int64),
                }
            ),
            tmp_path / "events.parquet",
        )
        got = q_od_flows(str(tmp_path)).to_pandas()
        n_users_present = len(np.unique(uid))
        assert got["n"].sum() == n - n_users_present  # flow conservation

        # scalar reference
        nx, ny = 1 << OD_LEVEL, 1 << (OD_LEVEL - 1)
        from collections import Counter

        def cell(e):
            lat = ((e * 7919) % 18000) / 100.0 - 90.0
            lon = ((e * 104729) % 36000) / 100.0 - 180.0
            ix = min(int(((lon + 180.0) / 360.0) * nx), nx - 1)
            iy = min(int(((lat + 90.0) / 180.0) * ny), ny - 1)
            return iy * nx + ix

        cnt = Counter()
        df = pd.DataFrame({"u": uid, "t": ts, "e": np.arange(n)})
        for _, g in df.sort_values(["t", "e"]).groupby("u"):
            es = g["e"].tolist()
            for a, b in zip(es, es[1:]):
                cnt[(cell(a), cell(b))] += 1
        want = (
            pd.DataFrame(
                [(a, b, c) for (a, b), c in cnt.items()],
                columns=["cell_from", "cell_to", "n"],
            )
            .sort_values(["cell_from", "cell_to"])
            .reset_index(drop=True)
        )
        got = got.sort_values(["cell_from", "cell_to"]).reset_index(drop=True)
        assert got.astype(want.dtypes.to_dict()).equals(want)


class TestStayPoints:
    """Greedy stay-point detection (geo_queries.q_stay_points)."""

    SF = "/root/testdata/sf0.001"

    def _positions(self):
        """Scalar replay of the synthetic per-user walk."""
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import geo_queries as gq
        from osm2gtfs_ray.sources.pages import _uint

        t = pq.read_table(
            f"{self.SF}/events.parquet", columns=["user_id", "event_id", "ts"]
        ).to_pandas().sort_values(["user_id", "ts", "event_id"])
        traj = {}
        for uid, g in t.groupby("user_id", sort=True):
            uid = int(uid)
            uk = np.array([uid], dtype=np.uint64)
            x = gq._ST_OFF + int(_uint(uk, gq._ST_X0, 42, 2_000_000)[0])
            y = gq._ST_OFF + int(_uint(uk, gq._ST_Y0, 42, 2_000_000)[0])
            xs, ys = [x], [y]
            for seq in range(2, len(g) + 1):
                k = np.array([uid * gq._ST_KMUL + seq], dtype=np.uint64)
                if int(_uint(k, gq._ST_MODE, 42, 4)[0]) > 0:
                    x += int(_uint(k, gq._ST_DXS, 42, 41)[0]) - 20
                    y += int(_uint(k, gq._ST_DYS, 42, 41)[0]) - 20
                else:
                    x += int(_uint(k, gq._ST_DXL, 42, 801)[0]) - 400
                    y += int(_uint(k, gq._ST_DYL, 42, 801)[0]) - 400
                xs.append(x)
                ys.append(y)
            traj[uid] = (xs, ys)
        return traj

    def test_matches_scalar_greedy_replay(self, ray_session):
        from osm2gtfs_ray.pipelines import geo_queries as gq

        got = (
            gq.q_stay_points(self.SF)
            .to_pandas()
            .sort_values(["user_id", "start_seq"])
            .reset_index(drop=True)
        )
        want_rows = []
        for uid, (xs, ys) in sorted(self._positions().items()):
            n, a = len(xs), 0
            while a < n:
                run = 1
                while (
                    a + run < n
                    and max(abs(xs[a + run] - xs[a]), abs(ys[a + run] - ys[a]))
                    <= gq.STAY_R
                ):
                    run += 1
                if run >= gq.STAY_MIN_PTS:
                    want_rows.append(
                        (
                            uid, a + 1, run,
                            sum(xs[a:a + run]) // run,
                            sum(ys[a:a + run]) // run,
                        )
                    )
                a += run
        import pandas as pd

        want = pd.DataFrame(
            want_rows,
            columns=["user_id", "start_seq", "n_pts", "cx_e4", "cy_e4"],
        )
        assert len(want) > 20  # the walk really produces dwells
        assert got.astype("int64").equals(want.astype("int64"))

    def test_stay_invariants(self, ray_session):
        from osm2gtfs_ray.pipelines import geo_queries as gq

        got = gq.q_stay_points(self.SF).to_pandas()
        traj = self._positions()
        assert (got["n_pts"] >= gq.STAY_MIN_PTS).all()
        for r in got.itertuples():
            xs, ys = traj[int(r.user_id)]
            a = int(r.start_seq) - 1
            for i in range(a, a + int(r.n_pts)):
                assert max(abs(xs[i] - xs[a]), abs(ys[i] - ys[a])) <= gq.STAY_R
            # maximality: the next point (if any) breaks the radius
            j = a + int(r.n_pts)
            if j < len(xs):
                assert max(abs(xs[j] - xs[a]), abs(ys[j] - ys[a])) > gq.STAY_R


class TestCoTravelers:
    """Spatio-temporal co-location pairs (geo_queries.q_co_travelers)."""

    SF = "/root/testdata/sf0.001"

    def _presence(self):
        """Scalar replay of the synthetic presence set."""
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import geo_queries as gq
        from osm2gtfs_ray.sources.pages import _uint

        t = pq.read_table(
            f"{self.SF}/events.parquet", columns=["user_id", "ts"]
        ).to_pandas()
        pres = set()
        for r in t.itertuples():
            uid = int(r.user_id)
            hourb = int(r.ts.value // 1000) // gq._CT_HOUR_US
            k = np.array([uid * gq._CT_KMUL + hourb], dtype=np.uint64)
            if int(_uint(k, gq._CT_MODE, 42, 4)[0]) == 0:
                cell = int(_uint(np.array([hourb], dtype=np.uint64),
                                 gq._CT_VEN, 42, gq.CT_CELLS)[0])
            else:
                cell = int(_uint(np.array([uid], dtype=np.uint64),
                                 gq._CT_HOME, 42, gq.CT_CELLS)[0])
            pres.add((uid, hourb, cell))
        return pres

    def test_matches_scalar_pair_count(self, ray_session):
        from collections import Counter

        from osm2gtfs_ray.pipelines import geo_queries as gq

        got = (
            gq.q_co_travelers(self.SF)
            .to_pandas()
            .sort_values(["user_a", "user_b"])
            .reset_index(drop=True)
        )
        buckets: dict[tuple[int, int], list[int]] = {}
        for uid, hourb, cell in self._presence():
            buckets.setdefault((hourb, cell), []).append(uid)
        counts: Counter[tuple[int, int]] = Counter()
        for users in buckets.values():
            us = sorted(set(users))
            for i in range(len(us)):
                for j in range(i + 1, len(us)):
                    counts[(us[i], us[j])] += 1
        want_rows = sorted(
            (a, b, n) for (a, b), n in counts.items() if n >= gq.CT_MIN_SHARED
        )
        import pandas as pd

        want = pd.DataFrame(
            want_rows, columns=["user_a", "user_b", "n_shared"]
        )
        assert len(want) > 0  # pairs really exist at sf0.001
        assert got.astype("int64").equals(want.astype("int64"))

    def test_pair_invariants(self, ray_session):
        from osm2gtfs_ray.pipelines import geo_queries as gq

        got = gq.q_co_travelers(self.SF).to_pandas()
        assert (got["user_a"] < got["user_b"]).all()
        assert (got["n_shared"] >= gq.CT_MIN_SHARED).all()
        # pairs are unique
        assert not got.duplicated(["user_a", "user_b"]).any()


class TestRadiusGyration:
    """Exact integer radius of gyration (geo_queries.q_radius_gyration)."""

    SF = "/root/testdata/sf0.001"

    def test_scalar_replay(self, ray_session):
        import math

        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import geo_queries as gq

        got = (
            gq.q_radius_gyration(self.SF)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        ev = pq.read_table(
            f"{self.SF}/events.parquet", columns=["event_id", "user_id"]
        ).to_pandas()
        want = {}
        for eid, uid in zip(ev["event_id"], ev["user_id"]):
            x = (int(eid) * 104729) % 36000 - 18000
            y = (int(eid) * 7919) % 18000 - 9000
            n, sx, sy, sq = want.get(int(uid), (0, 0, 0, 0))
            want[int(uid)] = (n + 1, sx + x, sy + y, sq + x * x + y * y)
        assert len(got) == len(want)
        for r in got.itertuples():
            n, sx, sy, sq = want[int(r.user_id)]
            num = n * sq - sx * sx - sy * sy
            assert num >= 0  # Cauchy-Schwarz: always a true square sum
            assert int(r.n_events) == n
            assert int(r.rog_fp) == math.isqrt(num * gq.ROG_SCALE // (n * n))

    def test_single_point_user_is_zero(self):
        """A user with one event has zero spread by definition."""
        import math

        n, x, y = 1, 17000, -8000
        num = n * (x * x + y * y) - x * x - y * y
        assert num == 0
        assert math.isqrt(num) == 0
