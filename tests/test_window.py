"""Distributed prefix scan (ops/scan.py) and windowed aggregates
(ops/window.py) vs single-process brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


class TestDistributedCumsum:
    def _fixture(self, n=500, seed=3):
        rng = np.random.default_rng(seed)
        keys = rng.permutation(n * 3)[:n]  # sparse, shuffled, unique
        vals = rng.integers(1, 50, size=n)
        return pd.DataFrame({"k": keys, "v": vals})

    def test_matches_sorted_cumsum(self, rd):
        from osm2gtfs_ray.ops.scan import distributed_cumsum

        df = self._fixture()
        # many small blocks so shards genuinely span block boundaries
        ds = rd.from_pandas(df).repartition(13)
        got = (
            distributed_cumsum(ds, "k", "v", out_col="off", n_shards=7)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = df.sort_values("k").reset_index(drop=True)
        want["off"] = want["v"].cumsum() - want["v"]  # exclusive
        assert got["k"].tolist() == want["k"].tolist()
        assert got["off"].tolist() == want["off"].tolist()

    def test_inclusive_and_known_key_max(self, rd):
        from osm2gtfs_ray.ops.scan import distributed_cumsum

        df = self._fixture(n=100, seed=4)
        ds = rd.from_pandas(df)
        got = (
            distributed_cumsum(
                ds, "k", "v", out_col="cs", n_shards=5,
                key_max=int(df["k"].max()), exclusive=False,
            )
            .to_pandas()
            .sort_values("k")
        )
        want = df.sort_values("k")["v"].cumsum().tolist()
        assert got["cs"].tolist() == want


class TestRolling:
    def test_partitioned_rolling_matches_pandas(self, rd):
        from osm2gtfs_ray.ops.window import partitioned_rolling

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "uid": rng.integers(0, 20, size=400),
                "ts": rng.permutation(400),
                "v": rng.normal(size=400),
            }
        )
        got = (
            partitioned_rolling(
                rd.from_pandas(df).repartition(9), "uid", ["ts"], "v", window=3
            )
            .to_pandas()
            .sort_values(["uid", "ts"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["uid", "ts"]).reset_index(drop=True)
        r = want.groupby("uid")["v"].rolling(3, min_periods=1)
        want["roll_sum"] = r.sum().reset_index(level=0, drop=True)
        want["roll_n"] = r.count().reset_index(level=0, drop=True).astype(np.int64)
        assert got["roll_n"].tolist() == want["roll_n"].tolist()
        assert np.allclose(got["roll_sum"], want["roll_sum"])

    def _brute_time_roll(self, df, window):
        df = df.sort_values("t").reset_index(drop=True)
        sums, ns = [], []
        for _, row in df.iterrows():
            w = df[(df["t"] > row["t"] - window) & (df["t"] <= row["t"])]
            sums.append(w["v"].sum())
            ns.append(len(w))
        df["roll_sum"], df["roll_n"] = sums, ns
        return df

    def test_time_bucket_rolling_matches_brute(self, rd):
        from osm2gtfs_ray.ops.window import time_bucket_rolling

        rng = np.random.default_rng(9)
        # sparse timeline crossing many bucket boundaries
        t = np.sort(rng.choice(np.arange(1000), size=300, replace=False))
        df = pd.DataFrame({"t": t, "v": rng.normal(size=300)})
        got = (
            time_bucket_rolling(
                rd.from_pandas(df).repartition(7), "t", "v", window=7, bucket=16
            )
            .to_pandas()
            .sort_values("t")
            .reset_index(drop=True)
        )
        want = self._brute_time_roll(df, 7)
        assert got["t"].tolist() == want["t"].tolist()
        assert got["roll_n"].tolist() == want["roll_n"].tolist()
        assert np.allclose(got["roll_sum"], want["roll_sum"])
        # exactly one output row per input row (context copies dropped)
        assert len(got) == len(df)

    def test_time_bucket_rolling_rejects_narrow_bucket(self, rd):
        from osm2gtfs_ray.ops.window import time_bucket_rolling

        with pytest.raises(ValueError):
            time_bucket_rolling(
                rd.from_items([{"t": 1, "v": 1.0}]), "t", "v", window=8, bucket=4
            )


class TestDistributedRank:
    def test_matches_lexsort_row_number(self, rd):
        from osm2gtfs_ray.ops.scan import distributed_rank

        rng = np.random.default_rng(21)
        # heavy ties + skew: half the values identical
        vals = np.concatenate([np.full(100, 5.0), rng.normal(5, 3, size=200)])
        ids = rng.permutation(300)
        df = pd.DataFrame({"id": ids, "v": vals})
        ranked, n = distributed_rank(
            rd.from_pandas(df).repartition(11), "v", ["id"], n_shards=9
        )
        got = ranked.to_pandas().sort_values("rank")
        assert n == 300
        assert got["rank"].tolist() == list(range(1, 301))
        order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
        assert got["id"].tolist() == df["id"].to_numpy()[order].tolist()

    def test_constant_values_single_bucket(self, rd):
        from osm2gtfs_ray.ops.scan import distributed_rank

        df = pd.DataFrame({"id": range(50), "v": [1.0] * 50})
        ranked, n = distributed_rank(rd.from_pandas(df), "v", ["id"])
        got = ranked.to_pandas().sort_values("rank")
        assert n == 50
        assert got["id"].tolist() == list(range(50))

    def test_zipf_skew_bounded_shards(self, rd):
        """Quantile bucket edges keep shard sizes bounded under a
        Zipfian value distribution (equi-width edges would send ~all
        rows to shard 0) while ranks stay exact."""
        from osm2gtfs_ray.ops.scan import _quantile_edges, distributed_rank

        rng = np.random.default_rng(17)
        n, n_shards = 20_000, 16
        # Zipf: min 1, a handful of values out at 1e5+ — equi-width
        # over [1, max] puts >99% of rows in the first bucket
        vals = rng.zipf(1.3, size=n).astype(np.float64)
        df = pd.DataFrame({"id": np.arange(n), "v": vals})
        ds = rd.from_pandas(df).repartition(13)

        edges = _quantile_edges(ds.materialize(), "v", n_shards)
        shard = np.searchsorted(edges, vals, side="right")
        counts = np.bincount(shard, minlength=len(edges) + 1)
        # every shard ≤ max(tie multiplicity, 3× the balanced size)
        ties = pd.Series(vals).value_counts().max()
        assert counts.max() <= max(ties, 3 * n // n_shards)
        assert len(edges) > 3  # genuinely multi-shard despite skew

        ranked, total = distributed_rank(ds, "v", ["id"], n_shards=n_shards)
        got = ranked.to_pandas().sort_values("rank")
        assert total == n
        order = np.lexsort((df["id"].to_numpy(), vals))
        assert got["id"].tolist() == df["id"].to_numpy()[order].tolist()

    def test_cumsum_rejects_negative_keys(self, rd):
        from osm2gtfs_ray.ops.scan import distributed_cumsum

        df = pd.DataFrame({"k": [3, -1, 5], "v": [1, 1, 1]})
        with pytest.raises(Exception, match="negative"):
            distributed_cumsum(rd.from_pandas(df), "k", "v").materialize()


class TestBloomSemi:
    def test_matches_exact_semi_and_filters(self, rd):
        from osm2gtfs_ray.ops.joins import bloom_bits, bloom_semi, _bloom_positions

        rng = np.random.default_rng(31)
        big = pd.DataFrame({"k": rng.integers(0, 10_000, size=5000), "v": rng.normal(size=5000)})
        small = pd.DataFrame({"k": rng.choice(10_000, size=200, replace=False)})
        got = (
            bloom_semi(rd.from_pandas(big).repartition(7), rd.from_pandas(small), "k",
                       m_bits=1 << 14)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        want = (
            big[big["k"].isin(set(small["k"]))]
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == want["k"].tolist()
        assert np.allclose(got["v"], want["v"])
        # the bloom itself admits every true key (no false negatives)
        bits = bloom_bits(rd.from_pandas(small), "k", m_bits=1 << 14)
        for pos in _bloom_positions(small["k"].to_numpy(), 1 << 14):
            assert ((bits[pos // 8] >> (pos % 8)) & 1).all()


class TestDistributedRunningMax:
    def _fixture(self, n=600, seed=7):
        rng = np.random.default_rng(seed)
        order = rng.permutation(n * 5)[:n]  # sparse unique arrival keys
        vals = rng.integers(-1000, 10_000, size=n)
        tie = np.arange(n)
        return pd.DataFrame({"a": order, "eid": tie, "v": vals})

    def test_matches_sorted_exclusive_cummax(self, rd):
        from osm2gtfs_ray.ops.scan import (
            RUNNING_MAX_NEG,
            distributed_running_max,
        )

        df = self._fixture()
        ds = rd.from_pandas(df).repartition(11)
        got = (
            distributed_running_max(
                ds, ["a", "eid"], "v", out_col="pm", n_shards=9
            )
            .to_pandas()
            .sort_values(["a", "eid"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["a", "eid"]).reset_index(drop=True)
        run = np.maximum.accumulate(want["v"].to_numpy(np.int64))
        pm = np.r_[np.int64(RUNNING_MAX_NEG), run[:-1]]
        assert got["a"].tolist() == want["a"].tolist()
        assert got["pm"].tolist() == pm.tolist()

    def test_ties_on_leading_key_break_by_tie_col(self, rd):
        from osm2gtfs_ray.ops.scan import (
            RUNNING_MAX_NEG,
            distributed_running_max,
        )

        # heavy ties: only 4 distinct arrival keys
        df = pd.DataFrame(
            {"a": [1, 1, 1, 2, 2, 3, 3, 3, 4, 4],
             "eid": list(range(10)),
             "v": [5, 3, 9, 1, 7, 2, 8, 0, 6, 4]}
        )
        ds = rd.from_pandas(df).repartition(3)
        got = (
            distributed_running_max(
                ds, ["a", "eid"], "v", out_col="pm", n_shards=4
            )
            .to_pandas()
            .sort_values(["a", "eid"])
            .reset_index(drop=True)
        )
        run = np.maximum.accumulate(df["v"].to_numpy(np.int64))
        pm = np.r_[np.int64(RUNNING_MAX_NEG), run[:-1]]
        assert got["pm"].tolist() == pm.tolist()


class TestWatermarkLate:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_watermark_replay(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import analytics_queries as aq
        from osm2gtfs_ray.sources.pages import _uint

        got = (
            aq.q_watermark_late(self.SF)
            .to_pandas()
            .sort_values("hourb")
            .reset_index(drop=True)
        )
        t = pq.read_table(
            f"{self.SF}/events.parquet", columns=["event_id", "ts"]
        ).to_pandas()
        eid = t["event_id"].to_numpy(np.int64)
        t_us = t["ts"].to_numpy("datetime64[us]").astype(np.int64)
        d_us = _uint(
            eid.astype(np.uint64), aq._WM_DELAY_STREAM, 42, aq.WM_MAX_DELAY_S
        ) * 1_000_000
        order = np.lexsort((eid, t_us + d_us))
        on_time: dict[int, int] = {}
        late: dict[int, int] = {}
        wm = None
        for i in order:
            h = int(t_us[i]) // aq._WM_HOUR_US
            is_late = wm is not None and t_us[i] < wm - aq.WM_LATENESS_S * 1_000_000
            (late if is_late else on_time)[h] = (
                (late if is_late else on_time).get(h, 0) + 1
            )
            wm = int(t_us[i]) if wm is None else max(wm, int(t_us[i]))
        hours = sorted(set(on_time) | set(late))
        want = pd.DataFrame(
            {
                "hourb": hours,
                "n_on_time": [on_time.get(h, 0) for h in hours],
                "n_late": [late.get(h, 0) for h in hours],
            }
        )
        assert (want["n_late"].sum() > 0) and (want["n_on_time"].sum() > 0)
        assert got.astype("int64").equals(want.astype("int64"))


class TestSpikeDays:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_sigma_test(self, ray_session):
        import math

        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import analytics_queries as aq

        got = (
            aq.q_spike_days(self.SF)
            .to_pandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        t = pq.read_table(
            f"{self.SF}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        t["day"] = (
            t["ts"].to_numpy("datetime64[us]").astype("int64")
            // aq._SPIKE_DAY_US
        )
        daily = t.groupby(["event_type", "day"]).size()
        rows = []
        for et in sorted(t["event_type"].unique()):
            cs = daily[et]
            n = len(cs)
            mean = cs.sum() / n
            sigma = math.sqrt(((cs - mean) ** 2).sum() / n)
            for day, c in cs.items():
                if c > mean + 1.5 * sigma:
                    rows.append((et, int(day), int(c)))
        want = pd.DataFrame(rows, columns=["event_type", "day", "c"])
        assert len(want) > 0
        assert got["event_type"].tolist() == want["event_type"].tolist()
        assert got["day"].tolist() == want["day"].tolist()
        assert got["c"].tolist() == want["c"].tolist()

    def test_integer_form_equals_float_form_on_boundary(self):
        # the integer rearrangement must agree with the float sigma
        # test even for adversarially large counts where float64 loses
        # integer resolution only in the FLOAT version
        import math

        cs = [10**9 + 3, 10**9, 10**9 + 51_000, 10**9 - 7]
        n, s = len(cs), sum(cs)
        q = sum(c * c for c in cs)
        for c in cs:
            d = n * c - s
            int_spike = d > 0 and 4 * d * d > 9 * (n * q - s * s)
            mean = s / n
            sigma = math.sqrt(max(0.0, (q / n) - mean * mean))
            float_spike = c > mean + 1.5 * sigma
            assert int_spike == float_spike


class TestSkylineDocs:
    SF = "/root/testdata/sf0.001"

    def test_matches_brute_force_dominance(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import analytics_queries as aq

        got = (
            aq.q_skyline_docs(self.SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        t = pq.read_table(
            f"{self.SF}/documents.parquet",
            columns=["doc_id", "n_chars", "text"],
        ).to_pandas()
        pts = [
            (int(r.doc_id), int(r.n_chars), len(set(r.text.split(" "))))
            for r in t.itertuples()
        ]
        sky = [
            (d, x, y)
            for d, x, y in pts
            if not any(
                bx >= x and by >= y and (bx > x or by > y)
                for _, bx, by in pts
            )
        ]
        want = pd.DataFrame(
            sorted(sky), columns=["doc_id", "n_chars", "n_distinct"]
        )
        assert len(want) > 0
        assert got.astype("int64").equals(want.astype("int64"))

    def test_scan_keeps_equal_points_and_partition_invariance(self, ray_session):
        from osm2gtfs_ray.pipelines.analytics_queries import _skyline_scan

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "n_chars": [10, 10, 9, 8, 10],
                "n_distinct": [5, 5, 6, 7, 4],
            }
        )
        out = _skyline_scan(df).sort_values("doc_id")
        # (10,5) twice: equal points co-survive; (10,4) dominated;
        # (9,6) and (8,7) undominated
        assert out["doc_id"].tolist() == [1, 2, 3, 4]
        # two-phase equivalence: skyline(union of per-half skylines)
        # == skyline(whole)
        h1, h2 = df.iloc[:2], df.iloc[2:]
        pooled = pd.concat([_skyline_scan(h1), _skyline_scan(h2)])
        again = _skyline_scan(pooled).sort_values("doc_id")
        assert again["doc_id"].tolist() == out["doc_id"].tolist()


class TestMedianUserValue:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_lower_median(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import analytics_queries as aq

        got = (
            aq.q_median_user_value(self.SF)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        t = pq.read_table(
            f"{self.SF}/events.parquet", columns=["user_id", "value"]
        ).to_pandas()
        rows = []
        for uid, g in t.groupby("user_id", sort=True):
            vs = sorted(g["value"].tolist())
            rows.append((int(uid), vs[(len(vs) - 1) // 2]))
        want = pd.DataFrame(rows, columns=["user_id", "median_value"])
        assert got["user_id"].tolist() == want["user_id"].tolist()
        # element selection: values must be EXACTLY equal (no
        # interpolation arithmetic ever happens)
        assert got["median_value"].tolist() == want["median_value"].tolist()

    def test_even_group_picks_lower_element(self, ray_session):
        # the (n-1)//2 rule on an even-sized group picks the LOWER of
        # the two central elements (quantile_disc semantics)
        vs = [4.0, 1.0, 3.0, 2.0]
        assert sorted(vs)[(len(vs) - 1) // 2] == 2.0


class TestTypeLift:
    SF = "/root/testdata/sf0.001"

    def test_matches_scalar_basket_lift(self, ray_session):
        import pyarrow.parquet as pq

        from osm2gtfs_ray.pipelines import analytics_queries as aq

        got = (
            aq.q_type_lift(self.SF)
            .to_pandas()
            .sort_values(["type_a", "type_b"])
            .reset_index(drop=True)
        )
        t = pq.read_table(
            f"{self.SF}/events.parquet", columns=["user_id", "event_type"]
        ).to_pandas()
        baskets = t.groupby("user_id")["event_type"].agg(set)
        nu = len(baskets)
        types = sorted(t["event_type"].unique())
        singles = {ty: sum(ty in b for b in baskets) for ty in types}
        rows = []
        for i, a in enumerate(types):
            for b in types[i + 1:]:
                cab = sum(a in s and b in s for s in baskets)
                if cab:
                    lift = (cab * nu * aq.LIFT_SCALE) // (
                        singles[a] * singles[b]
                    )
                    rows.append((a, b, singles[a], singles[b], cab, lift))
        want = pd.DataFrame(
            rows,
            columns=["type_a", "type_b", "n_a", "n_b", "n_ab", "lift_fp"],
        )
        assert len(want) > 0
        for c in want.columns:
            assert got[c].tolist() == want[c].tolist()

    def test_lift_identity_when_independent(self):
        # if every user has both types, lift == 1.0 exactly
        from osm2gtfs_ray.pipelines.analytics_queries import LIFT_SCALE

        nu, na, nb, nab = 100, 100, 100, 100
        assert (nab * nu * LIFT_SCALE) // (na * nb) == LIFT_SCALE
