"""Trajectory-similarity operators (pipelines/trajsim_queries.py):
LCSS with spatial tolerance and discrete Hausdorff — each checked
against an independent brute-force reference at sf0.001. The LCSS
reference is the textbook O(K^2) cell-by-cell DP, deliberately NOT
the running-max factorization the engine uses, so the scan identity
itself is under test."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_trajectories():
    from osm2gtfs_ray.pipelines.trajsim_queries import TRAJ_K

    t = (
        pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "event_id", "ts"])
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    out = {}
    for u, g in t.groupby("user_id", sort=True):
        eid = g["event_id"].to_numpy(np.int64)[:TRAJ_K]
        out[int(u)] = ((eid * 104729) % 36000, (eid * 7919) % 18000)
    return out


def _pairs(trajs):
    for ua in sorted(trajs):
        if ua % 2 == 0 and ua + 1 in trajs:
            yield ua, ua + 1


def _cheb_matrix(trajs, ua, ub):
    ax, ay = trajs[ua]
    bx, by = trajs[ub]
    return np.maximum(
        np.abs(ax[:, None] - bx[None, :]), np.abs(ay[:, None] - by[None, :])
    )


class TestLCSS:
    def test_matches_textbook_dp(self, ray_session):
        from osm2gtfs_ray.pipelines.trajsim_queries import (
            LCSS_EPS,
            LCSS_SCALE,
            q_lcss_similarity,
        )

        trajs = _brute_trajectories()
        ref = {}
        for ua, ub in _pairs(trajs):
            m = _cheb_matrix(trajs, ua, ub) <= LCSS_EPS
            na, nb = m.shape
            c = np.zeros((na + 1, nb + 1), dtype=np.int64)
            for i in range(1, na + 1):
                for j in range(1, nb + 1):
                    c[i][j] = (
                        c[i - 1][j - 1] + 1
                        if m[i - 1][j - 1]
                        else max(c[i - 1][j], c[i][j - 1])
                    )
            ref[(ua, ub)] = (na, nb, int(c[na][nb]))
        got = q_lcss_similarity(SF).to_pandas()
        assert len(got) == len(ref) > 0
        for _, r in got.iterrows():
            na, nb, lcss = ref[(int(r["user_a"]), int(r["user_b"]))]
            assert (int(r["n_a"]), int(r["n_b"]), int(r["lcss"])) == (
                na, nb, lcss,
            )
            assert int(r["sim_fp"]) == lcss * LCSS_SCALE // min(na, nb)

    def test_lcss_bounded_by_lengths(self, ray_session):
        from osm2gtfs_ray.pipelines.trajsim_queries import q_lcss_similarity

        got = q_lcss_similarity(SF).to_pandas()
        assert (got["lcss"] <= np.minimum(got["n_a"], got["n_b"])).all()
        assert (got["lcss"] >= 0).all()


class TestHausdorff:
    def test_matches_bruteforce(self, ray_session):
        from osm2gtfs_ray.pipelines.trajsim_queries import q_hausdorff_pairs

        trajs = _brute_trajectories()
        got = q_hausdorff_pairs(SF).to_pandas()
        ref_pairs = list(_pairs(trajs))
        assert len(got) == len(ref_pairs) > 0
        for _, r in got.iterrows():
            ua, ub = int(r["user_a"]), int(r["user_b"])
            d = _cheb_matrix(trajs, ua, ub)
            h_ab = int(d.min(axis=1).max())
            h_ba = int(d.min(axis=0).max())
            assert int(r["h_ab"]) == h_ab
            assert int(r["h_ba"]) == h_ba
            assert int(r["hausdorff"]) == max(h_ab, h_ba)

    def test_symmetric_dominates_directed(self, ray_session):
        from osm2gtfs_ray.pipelines.trajsim_queries import q_hausdorff_pairs

        got = q_hausdorff_pairs(SF).to_pandas()
        assert (got["hausdorff"] == np.maximum(got["h_ab"], got["h_ba"])).all()
        # directed Hausdorff to a non-identical set is > 0 on this data
        assert (got["hausdorff"] > 0).all()


class TestFrechet:
    def test_matches_textbook_dp(self, ray_session):
        """Engine (max/min scan expansion) vs the classic cell-by-cell
        three-predecessor DP — the closed-form identity is under test."""
        from osm2gtfs_ray.pipelines.trajsim_queries import q_frechet_pairs

        trajs = _brute_trajectories()
        ref = {}
        for ua, ub in _pairs(trajs):
            d = _cheb_matrix(trajs, ua, ub)
            na, nb = d.shape
            big = np.int64(2**62)
            c = np.full((na + 1, nb + 1), big, dtype=np.int64)
            for i in range(1, na + 1):
                for j in range(1, nb + 1):
                    prev = (
                        d[0][0]
                        if (i, j) == (1, 1)
                        else min(c[i - 1][j], c[i - 1][j - 1], c[i][j - 1])
                    )
                    c[i][j] = max(d[i - 1][j - 1], prev)
            ref[(ua, ub)] = (na, nb, int(c[na][nb]))
        got = q_frechet_pairs(SF).to_pandas()
        assert len(got) == len(ref) > 0
        for _, r in got.iterrows():
            na, nb, fr = ref[(int(r["user_a"]), int(r["user_b"]))]
            assert (int(r["n_a"]), int(r["n_b"]), int(r["frechet"])) == (
                na, nb, fr,
            )

    def test_hausdorff_frechet_dtw_triangle(self, ray_session):
        """hausdorff <= frechet <= dtw on every pair: the Fréchet
        coupling is ordered (so it dominates the unordered Hausdorff)
        and takes the max step (so the DTW sum dominates it)."""
        from osm2gtfs_ray.pipelines.geo_queries import q_trajectory_dtw
        from osm2gtfs_ray.pipelines.trajsim_queries import (
            q_frechet_pairs,
            q_hausdorff_pairs,
        )

        fr = q_frechet_pairs(SF).to_pandas().set_index("user_a")
        ha = q_hausdorff_pairs(SF).to_pandas().set_index("user_a")
        dt = q_trajectory_dtw(SF).to_pandas().set_index("user_a")
        assert len(fr) == len(ha) == len(dt) > 0
        j = fr.join(ha, rsuffix="_h").join(dt, rsuffix="_d")
        assert (j["hausdorff"] <= j["frechet"]).all()
        assert (j["frechet"] <= j["dtw"]).all()


class TestEDR:
    def test_matches_textbook_dp(self, ray_session):
        from osm2gtfs_ray.pipelines.trajsim_queries import (
            EDR_EPS,
            LCSS_SCALE,
            q_edr_similarity,
        )

        trajs = _brute_trajectories()
        ref = {}
        for ua, ub in _pairs(trajs):
            m = _cheb_matrix(trajs, ua, ub) <= EDR_EPS
            na, nb = m.shape
            # textbook O(K^2) cell DP — NOT the min-plus scan
            e = np.zeros((na + 1, nb + 1), dtype=np.int64)
            e[0, :] = np.arange(nb + 1)
            e[:, 0] = np.arange(na + 1)
            for i in range(1, na + 1):
                for j in range(1, nb + 1):
                    sub = 0 if m[i - 1][j - 1] else 1
                    e[i][j] = min(
                        e[i - 1][j - 1] + sub, e[i - 1][j] + 1,
                        e[i][j - 1] + 1,
                    )
            ref[(ua, ub)] = (na, nb, int(e[na][nb]))
        got = q_edr_similarity(SF).to_pandas()
        assert len(got) == len(ref) > 0
        for _, r in got.iterrows():
            na, nb, edr = ref[(int(r["user_a"]), int(r["user_b"]))]
            assert (int(r["n_a"]), int(r["n_b"]), int(r["edr"])) == (
                na, nb, edr,
            )
            mx = max(na, nb)
            assert int(r["sim_fp"]) == (mx - edr) * LCSS_SCALE // mx

    def test_edit_distance_bounds(self, ray_session):
        from osm2gtfs_ray.pipelines.trajsim_queries import q_edr_similarity

        got = q_edr_similarity(SF).to_pandas()
        # |n_a - n_b| <= edr <= max(n_a, n_b)
        lo = np.abs(got["n_a"] - got["n_b"])
        hi = np.maximum(got["n_a"], got["n_b"])
        assert (got["edr"] >= lo).all()
        assert (got["edr"] <= hi).all()
