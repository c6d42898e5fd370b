"""Frequencies stage + GTFS CSV sink + config loader tests."""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pytest

from osm2gtfs_ray.sources import osm_fixtures as fx
from osm2gtfs_ray.sources.config import ConfigError, load_config
from osm2gtfs_ray.pipelines import gtfs


class TestFrequencies:
    def test_variant_hours_to_frequency_rows(self, ray_session):
        import ray.data

        rel = ray.data.from_arrow(fx.make_osm_tables()["osm_relations"])
        out = gtfs.build_frequencies(rel).to_pandas()
        # line 2 has 2 variants x 2 windows each
        assert len(out) == 4
        assert set(out["service_id"]) == {"Mo-Fr", "Sa-Su"}
        assert (out["headway_s"] == 900).all()
        mf = out[out["service_id"] == "Mo-Fr"].iloc[0]
        assert (mf["start_s"], mf["end_s"]) == (6 * 3600, 20 * 3600)


class TestGtfsTime:
    def test_format(self):
        col = pa.array([0, 6 * 3600 + 5 * 60 + 9, 25 * 3600], pa.int64())
        got = gtfs.sec_to_gtfs_time(col).to_pylist()
        assert got == ["00:00:00", "06:05:09", "25:00:00"]


class TestWriter:
    def test_write_csv_tables(self, ray_session, tmp_path):
        import ray.data

        st = ray.data.from_items(
            [
                {
                    "trip_id": "t1",
                    "stop_id": "s1",
                    "stop_sequence": 0,
                    "arrival_sec": 21600,
                    "departure_sec": 21600,
                }
            ]
        )
        stops = ray.data.from_items([{"stop_id": "s1", "name": "A"}])
        counts = gtfs.write_gtfs_tables(
            {"stop_times": st, "stops": stops}, str(tmp_path)
        )
        assert counts == {"stop_times": 1, "stops": 1}
        files = glob.glob(str(tmp_path / "stop_times" / "*"))
        assert files
        df = pd.concat(pd.read_csv(f) for f in files)
        assert df.iloc[0]["arrival_time"] == "06:00:00"
        assert "arrival_sec" not in df.columns


class TestConfig:
    BASE = {
        "query": {"bbox": {"n": 1.0, "s": 0.0, "e": 2.0, "w": 1.0}},
        "output_file": "~/out.zip",
    }

    def test_defaults(self):
        cfg = load_config(dict(self.BASE), today=dt.date(2026, 8, 17))
        assert cfg["feed_info"]["start_date"] == "2026-08-01"
        assert cfg["feed_info"]["end_date"] == "2027-08-01"
        assert cfg["selector"] == "default"
        assert cfg["output_file"].endswith("out.zip")
        assert not cfg["output_file"].startswith("~")

    def test_validation_errors(self):
        with pytest.raises(ConfigError):
            load_config({"query": {}})  # missing output_file
        bad = dict(self.BASE)
        bad["query"] = {"bbox": {"n": 0.0, "s": 5.0, "e": 1.0, "w": 0.0}}
        with pytest.raises(ConfigError):
            load_config(bad)
        bad2 = dict(self.BASE)
        bad2["feed_info"] = {"start_date": "17-08-2026"}
        with pytest.raises(ConfigError):
            load_config(bad2)
        bad3 = dict(self.BASE)
        bad3["feed_info"] = {"start_date": "2026-08-01", "end_date": "2025-01-01"}
        with pytest.raises(ConfigError):
            load_config(bad3)


class TestDriverContract:
    """Smoke the driver's exact calling pattern: ray already up, import
    module, call entry()/queries()/oracle_sql()."""

    def test_entry_and_registry(self, ray_session):
        import importlib
        import sys

        sys.path.insert(0, "/root/repo")
        mod = importlib.import_module("__ray_entry__")
        res = mod.entry()
        import ray.data

        assert isinstance(res, ray.data.Dataset)
        df = res.to_pandas()
        assert len(df) >= 0
        assert set(df.columns) == {"entity_cell", "tile_id", "count"}
        qs, sqls = mod.queries(), mod.oracle_sql()
        assert set(sqls) <= set(qs)
        assert len(qs) >= 25


class TestProfiles:
    """§2.9 user-extension surface: selector-driven hook overrides."""

    def test_override_and_default(self, ray_session):
        import ray.data

        from osm2gtfs_ray.pipelines import profiles

        nodes = ray.data.from_arrow(fx.make_osm_tables()["osm_nodes"])
        default = gtfs.build_node_stops(nodes).to_pandas().set_index("osm_id")
        bare = gtfs.build_node_stops(nodes, selector="bare_ids").to_pandas().set_index("osm_id")
        # default: tag precedence; override: bare osm id (the
        # br_florianopolis-style specialization)
        named = default[default["name"] == "Stop 1-1"].index[0]
        assert default.loc[named, "stop_id"] == "R11"
        assert bare.loc[named, "stop_id"] == str(named)

    def test_register_custom_profile(self, ray_session):
        import pyarrow.compute as pc
        import ray.data

        from osm2gtfs_ray.pipelines import profiles

        profiles.register_profile(
            "test_prefixed",
            stop_id=lambda t, osm_type: pc.binary_join_element_wise(
                pa.array(["X"] * len(t)), pc.cast(t["id"], pa.string()), "-"
            ),
        )
        nodes = ray.data.from_arrow(fx.make_osm_tables()["osm_nodes"])
        out = gtfs.build_node_stops(nodes, selector="test_prefixed").to_pandas()
        assert out["stop_id"].str.startswith("X-").all()


class TestSmallOps:
    def test_split_route_relations(self, ray_session):
        import ray.data

        rel = ray.data.from_arrow(fx.make_osm_tables()["osm_relations"])
        masters, variants = gtfs.split_route_relations(rel)
        # 4 lines: masters for lines 0-2 + the duplicate-ref master = 4
        assert masters.count() == 4
        assert variants.count() == 8

    def test_filter_blacklist(self, ray_session):
        import ray.data

        ds = ray.data.from_items([{"ref": r} for r in ["L0", "L1", "L2", None]])
        out = gtfs.filter_blacklist(ds, "ref", ["L1"]).to_pandas()
        assert sorted(out["ref"].dropna()) == ["L0", "L2"]
        assert len(out) == 3  # null ref kept

    def test_assign_direction_ids(self, ray_session):
        import ray.data

        tables = fx.make_osm_tables()
        coords = gtfs.ways_coord_table(tables["osm_ways"], tables["osm_nodes"])
        rel = ray.data.from_arrow(tables["osm_relations"])
        itins = gtfs.build_lines_and_itineraries(rel, coords)
        out = gtfs.assign_direction_ids(itins).to_pandas()
        per_route = out.groupby("route_id")["direction_id"].apply(sorted)
        assert all(v == [0, 1] for v in per_route)

    def test_build_agencies(self, ray_session):
        import ray.data

        rels = ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array([3, 1, 2, 4], pa.int64()),
                    "tags": pa.array(
                        [
                            [("network", "SOTRA")],
                            [("network", "SOTRA")],
                            [("network", "STL")],
                            [("name", "no-network")],
                        ],
                        fx.TAGS_TYPE,
                    ),
                }
            )
        )
        out = gtfs.build_agencies(rels).to_pandas().sort_values("agency_name")
        assert out["agency_name"].tolist() == ["SOTRA", "STL"]
        # get-or-create: first (lowest relation id) wins as agency id
        assert out[out["agency_name"] == "SOTRA"]["agency_id"].iloc[0] == "agency_1"


class TestScheduleLoader:
    def test_load_standard_format(self, tmp_path):
        import json

        from osm2gtfs_ray.sources.schedule import ScheduleError, load_schedule

        doc = {
            "lines": {
                "L1": [
                    {
                        "from": "A",
                        "to": "C",
                        "services": ["Mo-Fr", "Sa"],
                        "stations": ["A", "B", "C"],
                        "times": [["06:00", "06:10", "06:20"]],
                    }
                ]
            }
        }
        p = tmp_path / "sched.json"
        p.write_text(json.dumps(doc))
        t = load_schedule(str(p))
        assert t.num_rows == 2  # one row per service
        assert t["service"].to_pylist() == ["Mo-Fr", "Sa"]
        import pytest as _pt

        with _pt.raises(ScheduleError):
            load_schedule({"nope": 1})
        bad = dict(doc)
        bad["lines"] = {"L1": [{"from": "A", "to": "C", "stations": ["A"], "times": [["06:00", "06:10"]]}]}
        with _pt.raises(ScheduleError):
            load_schedule(bad)

    def test_partition_horarios(self):
        from osm2gtfs_ray.sources.schedule import partition_horarios

        got = partition_horarios(
            {
                "Dias Úteis - Saída": ["06:00"],
                "Sábado": ["07:00"],
                "Domingo e Feriados": ["08:00"],
                "???": ["09:00"],
            }
        )
        assert got == {"Mo-Fr": ["06:00"], "Sa": ["07:00"], "Su": ["08:00"]}


class TestCLI:
    """Reference CLI parity: config → XML input → GTFS CSV output."""

    def test_cli_end_to_end(self, ray_session, tmp_path):
        import json

        from osm2gtfs_ray import cli
        from osm2gtfs_ray.sources.osm_xml import to_osm_xml

        tables = fx.make_osm_tables()
        xml_path = tmp_path / "city.xml"
        xml_path.write_text(to_osm_xml(tables))
        sched_rows = fx.make_schedule_table().to_pylist()
        lines: dict = {}
        for r in sched_rows:
            entries = lines.setdefault(r["route_id"], [])
            for e in entries:
                if e["from"] == r["from_stop"] and e["to"] == r["to_stop"]:
                    if r["service"] not in e["services"]:
                        e["services"].append(r["service"])
                    break
            else:
                entries.append(
                    {"from": r["from_stop"], "to": r["to_stop"],
                     "services": [r["service"]], "stations": r["station_names"],
                     "times": r["times"]}
                )
        sched_path = tmp_path / "timetable.json"
        sched_path.write_text(json.dumps({"lines": lines}))
        cfg = {
            "query": {"bbox": {"n": 1.0, "s": -2.0, "e": 38.0, "w": 36.0}},
            "input": str(xml_path),
            "schedule_source": str(sched_path),
            "output_file": str(tmp_path / "gtfs_out"),
        }
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = cli.main(["-c", str(cfg_path)])
        assert rc == 0
        out = tmp_path / "gtfs_out"
        assert {p.name for p in out.iterdir()} >= {
            "stops", "routes", "stop_times", "shapes", "frequencies", "agencies"
        }
        st = pd.concat(pd.read_csv(f) for f in (out / "stop_times").iterdir())
        assert len(st) == 147
        assert st["arrival_time"].str.match(r"^\d{2}:\d{2}:\d{2}$").all()


class TestFeedZipValidate:
    """Zip sink + referential validation + schedule fetch cache."""

    def _write_config(self, tmp_path, extra=None):
        import json

        from osm2gtfs_ray.sources.osm_xml import to_osm_xml

        tables = fx.make_osm_tables()
        xml_path = tmp_path / "city.xml"
        xml_path.write_text(to_osm_xml(tables))
        sched_rows = fx.make_schedule_table().to_pylist()
        lines: dict = {}
        for r in sched_rows:
            entries = lines.setdefault(r["route_id"], [])
            for e in entries:
                if e["from"] == r["from_stop"] and e["to"] == r["to_stop"]:
                    if r["service"] not in e["services"]:
                        e["services"].append(r["service"])
                    break
            else:
                entries.append(
                    {"from": r["from_stop"], "to": r["to_stop"],
                     "services": [r["service"]], "stations": r["station_names"],
                     "times": r["times"]}
                )
        sched_path = tmp_path / "timetable.json"
        sched_path.write_text(json.dumps({"lines": lines}))
        cfg = {
            "query": {"bbox": {"n": 1.0, "s": -2.0, "e": 38.0, "w": 36.0}},
            "input": str(xml_path),
            "schedule_source": str(sched_path),
            "output_file": str(tmp_path / "gtfs_out"),
        }
        if extra:
            cfg.update(extra)
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(cfg))
        return cfg_path

    def test_zip_and_validate_end_to_end(self, ray_session, tmp_path):
        import io
        import zipfile

        from osm2gtfs_ray import cli

        cfg_path = self._write_config(tmp_path)
        zip_path = tmp_path / "feed.zip"
        rc = cli.main(["-c", str(cfg_path), "--validate", "--zip", str(zip_path)])
        assert rc == 0
        with zipfile.ZipFile(zip_path) as zf:
            names = set(zf.namelist())
            assert {"stops.txt", "routes.txt", "stop_times.txt"} <= names
            st = pd.read_csv(io.BytesIO(zf.read("stop_times.txt")))
            assert len(st) == 147
            stops = pd.read_csv(io.BytesIO(zf.read("stops.txt")))
            # every stop_time references a stop present in the zip
            assert set(st["stop_id"]) <= set(stops["stop_id"])

    def test_validate_catches_dangling_reference(self, ray_session):
        import ray.data

        from osm2gtfs_ray.pipelines.gtfs_feed import validate_feed

        tables = {
            "stops": ray.data.from_items([{"stop_id": "s1"}]),
            "routes": ray.data.from_items([{"route_id": "r1"}]),
            "stop_times": ray.data.from_items(
                [
                    {"trip_id": "t", "route_id": "r1", "stop_id": "s1"},
                    {"trip_id": "t", "route_id": "rX", "stop_id": "sX"},
                ]
            ),
        }
        report = validate_feed(tables)
        assert report["stop_times_missing_stop"] == 1
        assert report["stop_times_missing_route"] == 1
        assert report["ok"] is False

    def test_schedule_fetch_cache_and_refresh(self, tmp_path):
        from osm2gtfs_ray.sources.schedule import (
            ScheduleError,
            fetch_schedule_source,
        )

        src = tmp_path / "sched.json"
        src.write_text('{"lines": {}}')
        cache = tmp_path / "cache"
        # first load reads the file and caches
        t1 = fetch_schedule_source(str(src), str(cache), "city")
        assert t1 == '{"lines": {}}'
        assert (cache / "city-schedule").read_text() == t1
        # source changes; cached copy still served without refresh
        src.write_text('{"lines": {"A": []}}')
        assert fetch_schedule_source(str(src), str(cache), "city") == t1
        # refresh bypasses the cache and rewrites it
        t3 = fetch_schedule_source(str(src), str(cache), "city", refresh=True)
        assert t3 == '{"lines": {"A": []}}'
        assert (cache / "city-schedule").read_text() == t3
        # URL-shaped source without a fetcher raises; with one, fetches
        with pytest.raises(ScheduleError):
            fetch_schedule_source(
                "https://example.org/sched.json", str(cache), "web"
            )
        got = fetch_schedule_source(
            "https://example.org/sched.json", str(cache), "web",
            fetcher=lambda url: b'{"lines": {}}',
        )
        assert got == '{"lines": {}}'

    def test_load_schedule_accepts_raw_json_text(self):
        from osm2gtfs_ray.sources.schedule import load_schedule

        t = load_schedule('{"lines": {}}')
        assert t.num_rows == 0
