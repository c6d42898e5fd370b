"""GTFS-parity pipeline tests over the deterministic OSM-shaped fixtures.

Mirrors the reference's test strategy (SURVEY.md §5): operator-level
acceptance with fixture inputs + count assertions + exact stop_times
verification for one designated route
(/root/reference/osm2gtfs/tests/creators/creators_tests.py:148-354).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm2gtfs_ray.sources import osm_fixtures as fx
from osm2gtfs_ray.pipelines import gtfs
from osm2gtfs_ray.ops.stitch import stitch_ways
from osm2gtfs_ray.ops.cluster import greedy_cluster_group
from osm2gtfs_ray.ops.alignment import (
    align_stops_to_schedule,
    interpolate_times,
    parse_hm,
    parse_service,
)


@pytest.fixture(scope="module")
def tables():
    t = fx.make_osm_tables()
    t["schedule"] = fx.make_schedule_table()
    return t


@pytest.fixture(scope="module")
def ds(tables, ray_session):
    import ray.data

    return {
        "nodes": ray.data.from_arrow(tables["osm_nodes"]),
        "ways": ray.data.from_arrow(tables["osm_ways"]),
        "relations": ray.data.from_arrow(tables["osm_relations"]),
    }


class TestStitch:
    def test_orders_and_reverses(self):
        a = np.array([[0.0, 0.0], [0.0, 1.0]])
        b = np.array([[0.0, 2.0], [0.0, 1.0]])  # reversed
        c = np.array([[0.0, 2.0], [0.0, 3.0]])
        chain, used = stitch_ways([a, b, c])
        assert used == 3
        np.testing.assert_array_equal(chain[:, 1], [0, 1, 2, 3])

    def test_prepend(self):
        a = np.array([[0.0, 1.0], [0.0, 2.0]])
        b = np.array([[0.0, 0.0], [0.0, 1.0]])
        chain, used = stitch_ways([a, b])
        assert used == 2
        np.testing.assert_array_equal(chain[:, 1], [0, 1, 2])

    def test_disconnected_dropped(self):
        a = np.array([[0.0, 0.0], [0.0, 1.0]])
        b = np.array([[5.0, 5.0], [5.0, 6.0]])
        chain, used = stitch_ways([a, b])
        assert used == 1
        assert len(chain) == 2


class TestCluster:
    def test_greedy_order_matters(self):
        # three same-name stops on a line, 400m apart: greedy scan by
        # osm_id puts 1+2 together (400m), 3 into a new cluster (800m
        # from seed 1) — exactly the reference's online semantics
        d = 400.0 / 111_320.0
        g = pd.DataFrame(
            {
                "osm_id": [1, 2, 3],
                "name": ["X"] * 3,
                "lat": [0.0, d, 2 * d],
                "lon": [0.0, 0.0, 0.0],
            }
        )
        out = greedy_cluster_group(g, threshold_m=500.0)
        assert out["cluster_seq"].tolist() == [0, 0, 1]
        assert out["cluster_seed_id"].tolist() == [1, 1, 3]

    def test_sorted_by_osm_id_determinism(self):
        d = 400.0 / 111_320.0
        g = pd.DataFrame(
            {
                "osm_id": [3, 1, 2],
                "name": ["X"] * 3,
                "lat": [2 * d, 0.0, d],
                "lon": [0.0, 0.0, 0.0],
            }
        )
        out = greedy_cluster_group(g, threshold_m=500.0)
        # identical result regardless of input row order
        assert out.sort_values("osm_id")["cluster_seq"].tolist() == [0, 0, 1]


class TestAlignment:
    def test_cursor_and_last_stop_rule(self):
        stops = ["A", "B", "C", "D"]
        assert align_stops_to_schedule(stops, ["A", "C", "D"]) == [0, -1, 1, 2]
        # last stop not matching last station → None
        assert align_stops_to_schedule(stops, ["A", "C"]) is None
        # monotone cursor: a repeated name matches the NEXT occurrence
        assert align_stops_to_schedule(["A", "B", "A"], ["A", "B", "A"]) == [0, 1, 2]

    def test_interpolation(self):
        got = interpolate_times(np.array([600, -1, -1, 900]))
        assert got.tolist() == [600, 700, 800, 900]

    def test_parse_hm(self):
        assert parse_hm("06:30") == 6 * 3600 + 30 * 60
        assert parse_hm("6:05") == 6 * 3600 + 300
        assert parse_hm("25:00") == 25 * 3600  # GTFS allows >24h
        assert parse_hm("nope") is None
        assert parse_hm("06:99") is None

    def test_parse_service(self):
        assert parse_service("Mo-Fr")[0] == (1, 1, 1, 1, 1, 0, 0)
        assert parse_service("2026-01-01")[1] == "2026-01-01"
        assert parse_service("weird") is None


class TestStops:
    def test_node_stops_filter_and_defaults(self, ds):
        stops = gtfs.build_node_stops(ds["nodes"]).to_pandas()
        # 4 lines x 6 platforms; cafes filtered out
        assert len(stops) == 24
        assert (stops["name"] == gtfs.NO_NAME).sum() == 1
        # M9 precedence
        byid = stops.set_index("osm_id")
        r11 = byid[byid["name"] == "Stop 1-1"].iloc[0]
        assert r11["stop_id"] == "R11"
        r12 = byid[byid["name"] == "Stop 1-2"].iloc[0]
        assert r12["stop_id"] == "G12"  # ref:gtfs beats ref

    def test_way_stop_centroid(self, ds, tables):
        ws = gtfs.build_way_stops(ds["ways"], ds["nodes"]).to_pandas()
        assert len(ws) == 1
        assert ws.iloc[0]["name"] == "Way Platform 2"
        # centroid inside the platform's tiny bbox
        assert abs(ws.iloc[0]["lat"] - (fx.BASE_LAT + 2 * 0.05 + 0.00025)) < 1e-4

    def test_stations_and_parenting(self, ds):
        stops = gtfs.build_stops(ds["nodes"], ds["ways"])
        stations, membership = gtfs.build_stations(ds["relations"], stops)
        st = stations.to_pandas()
        assert len(st) == 1  # 1-member area discarded (J4)
        assert st.iloc[0]["name"] == "Area Zero"
        parented = gtfs.assign_parent_stations(stops, membership).to_pandas()
        linked = parented[parented["parent_station"].notna()]
        assert sorted(linked["name"]) == ["Stop 0-0", "Stop 0-1"]


class TestLines:
    @pytest.fixture(scope="class")
    def itins(self, ds, tables):
        coords = gtfs.ways_coord_table(tables["osm_ways"], tables["osm_nodes"])
        return gtfs.build_lines_and_itineraries(ds["relations"], coords).to_pandas()

    def test_master_variant_join(self, itins):
        # 4 lines x 2 variants each; line 3 promoted from leftovers (J2)
        assert len(itins) == 8
        assert set(itins["route_id"]) == {"L0", "L1", "L2", "L3"}
        # J3: the duplicate master never becomes a line id
        l0 = itins[itins["route_id"] == "L0"]
        assert l0["line_id"].nunique() == 1

    def test_route_type_and_colors(self, itins):
        l1 = itins[itins["route_id"] == "L1"].iloc[0]
        assert l1["route_type"] == "Tram"
        # colour tag sits on the dir-0 variant in the fixture
        colored = itins[itins["route_color"].notna()].set_index("route_id")
        assert colored.loc["L0", "route_color"] == "#A2F3B1"  # hex normalized upper
        assert colored.loc["L1", "route_color"] == "#FF0000"  # css name
        assert colored.loc["L0", "route_text_color"] == "#000000"  # light bg → black
        assert colored.loc["L1", "route_text_color"] == "#ffffff"  # red bg → white

    def test_shape_stitching(self, itins):
        # lines 0-2: all 5 segments stitched despite mixed orientation
        for rid in ["L0", "L1", "L2"]:
            row = itins[itins["route_id"] == rid].iloc[0]
            assert row["shape_segments_used"] == 5
            assert len(row["shape_lat"]) == 6
            lon = np.array(row["shape_lon"])
            assert (np.diff(lon) > 0).all() or (np.diff(lon) < 0).all()
        # line 3 has a gap: only the first chain assembles (G3 break)
        row3 = itins[itins["route_id"] == "L3"].iloc[0]
        assert row3["shape_segments_used"] < 5

    def test_stop_order_preserved(self, itins):
        fwd = itins[(itins["route_id"] == "L0") & (itins["fr"] == "Stop 0-0")].iloc[0]
        assert fwd["stop_refs"][0].endswith("1000")
        bwd = itins[(itins["route_id"] == "L0") & (itins["fr"] == "Stop 0-5")].iloc[0]
        assert bwd["stop_refs"][0] == fwd["stop_refs"][-1]


class TestTrips:
    @pytest.fixture(scope="class")
    def stop_times(self, ds, tables):
        import ray

        coords = gtfs.ways_coord_table(tables["osm_ways"], tables["osm_nodes"])
        itins = gtfs.build_lines_and_itineraries(ds["relations"], coords)
        stops_table = pa.Table.from_pandas(
            gtfs.build_stops(ds["nodes"], ds["ways"]).to_pandas(), preserve_index=False
        )
        trips = gtfs.build_trips(itins, stops_table, tables["schedule"])
        return trips.to_pandas()

    def test_trip_counts(self, stop_times):
        # schedule: per line 2 directions x 3 departures; every variant
        # matches exactly one schedule row by (route_id, from, to, via)
        trips = stop_times.drop_duplicates("trip_id")
        assert len(trips) == 4 * 2 * 3

    def test_exact_stop_times_designated_route(self, stop_times):
        """The reference's exact stop_times check
        (creators_tests.py:252-354) for route L0, first departure."""
        t = stop_times[
            (stop_times["route_id"] == "L0")
            & (stop_times["trip_id"].str.endswith(".0"))
        ]
        fwd = t[t["stop_sequence"] == 0].iloc[0]
        trip = stop_times[stop_times["trip_id"] == fwd["trip_id"]].sort_values(
            "stop_sequence"
        )
        assert len(trip) == 6
        # schedule: 06:00 at stop0, 06:10 at stop3 (middle), 06:25 at stop5
        got = trip["arrival_sec"].tolist()
        assert got[0] == 6 * 3600
        assert got[3] == 6 * 3600 + 600
        assert got[5] == 6 * 3600 + 1500
        # interpolation between known points is monotone and evenly spaced
        assert got == sorted(got)
        np.testing.assert_allclose(np.diff(got[:4]), 200, atol=1)

    def test_cleanup_anti_joins(self, ds, tables, stop_times):
        import ray.data

        stops = gtfs.build_stops(ds["nodes"], ds["ways"])
        st_ds = ray.data.from_pandas(stop_times)
        routes = ray.data.from_items(
            [{"route_id": r} for r in ["L0", "L1", "L2", "L3", "ghost"]]
        )
        kept_stops, kept_routes = gtfs.remove_unused(stops, routes, st_ds)
        kr = kept_routes.to_pandas()
        assert sorted(kr["route_id"]) == ["L0", "L1", "L2", "L3"]
        ks = kept_stops.to_pandas()
        # way platform is not part of any trip's stop list? it IS in
        # line 2's stop_refs, so it must survive; cafes were never stops
        assert len(ks) <= 25
        assert (ks["name"] == "Way Platform 2").any()
