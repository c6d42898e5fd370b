"""Deterministic OSM-shaped fixture tables (FIXTURES.md §2).

Synthesizes the reference's test-corpus shape — Overpass XML fixtures
(/root/reference/osm2gtfs/tests/creators/creators_tests.py:116-120) —
as Arrow tables: osm_nodes / osm_ways / osm_relations / schedule_trips,
with all the edge cases the reference's builders exercise:

* unnamed platform (name default path, osm_connector.py:440-441)
* non-platform nodes to be filtered out (M1, :677-694)
* platform WAY (centroid path, :444-446)
* route variant without master (J2 promotion, :184-204)
* two masters with the same ref (J3 uniqueness guard, :173-179)
* variant referenced by two masters (J1 consume-once, :146-156)
* stop_areas incl. a 1-member discard case (J4, :519-530)
* shape ways with shared endpoints in mixed orientation + one
  disconnected segment (G3 stitcher, :649-670)
* schedule trips in the standard timetable format
  (trips_creator.py:84-95, 334-376) honoring the last-stop rule
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TAGS_TYPE = pa.map_(pa.string(), pa.string())
MEMBERS_TYPE = pa.list_(
    pa.struct([("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())])
)

BASE_LAT, BASE_LON = -1.20, 36.80  # synthetic city
STEP = 0.004  # ~440 m between consecutive stops

N_LINES = 4
STOPS_PER_LINE = 6


def _tags(d: dict[str, str]):
    return list(d.items())


def make_osm_tables(n_lines: int = N_LINES, stops_per_line: int = STOPS_PER_LINE):
    """Returns dict of pa.Table: osm_nodes, osm_ways, osm_relations."""
    nodes = []  # (id, lat, lon, tags)
    ways = []  # (id, node_ids, tags)
    rels = []  # (id, members, tags)

    nid = 1000
    wid = 5000
    rid = 9000

    line_variants: dict[int, list[int]] = {}
    stop_ids_by_line: dict[int, list[int]] = {}

    for ln in range(n_lines):
        lat0 = BASE_LAT + ln * 0.05
        stop_nodes = []
        for s in range(stops_per_line):
            lat, lon = lat0, BASE_LON + s * STEP
            tags = {"public_transport": "platform", "highway": "bus_stop"}
            if not (ln == 0 and s == 3):  # one unnamed stop → "[<no-name>]" path
                tags["name"] = f"Stop {ln}-{s}"
            if ln == 1 and s == 1:
                tags["ref"] = f"R{ln}{s}"  # stop_id precedence path (M9)
            if ln == 1 and s == 2:
                tags["ref:gtfs"] = f"G{ln}{s}"
                tags["ref"] = "shadowed"
            nodes.append((nid, lat, lon, _tags(tags)))
            stop_nodes.append(nid)
            nid += 1
        stop_ids_by_line[ln] = stop_nodes

        # a platform WAY on line 2 (centroid path): 4 corner nodes + way
        if ln == 2:
            corners = []
            for dy, dx in ((0, 0), (0, 1), (1, 1), (1, 0)):
                nodes.append(
                    (nid, lat0 + 0.0002 + dy * 0.0001, BASE_LON - STEP + dx * 0.0001, _tags({}))
                )
                corners.append(nid)
                nid += 1
            ways.append((wid, corners + [corners[0]], _tags({"public_transport": "platform", "name": "Way Platform 2"})))
            platform_way_id = wid
            wid += 1

        # noise nodes that M1 must filter out
        nodes.append((nid, lat0 + 0.01, BASE_LON - 0.01, _tags({"amenity": "cafe", "name": f"Cafe {ln}"})))
        nid += 1

        # route geometry ways: consecutive stop-to-stop segments, every
        # second one reversed (stitch fixture); line 3 gets a gap
        geom_nodes = []
        for s in range(stops_per_line):
            nodes.append((nid, lat0 + 0.0005, BASE_LON + s * STEP, _tags({})))
            geom_nodes.append(nid)
            nid += 1
        way_ids = []
        for s in range(stops_per_line - 1):
            seq = [geom_nodes[s], geom_nodes[s + 1]]
            if s % 2 == 1:
                seq = seq[::-1]  # mixed orientation
            if ln == 3 and s == 2:
                continue  # disconnected chain on line 3
            ways.append((wid, seq, _tags({"highway": "service"})))
            way_ids.append(wid)
            wid += 1

        # two variants per line (forward/backward) + master
        variants = []
        for d in range(2):
            snodes = stop_nodes if d == 0 else stop_nodes[::-1]
            members = [("node", n, "platform") for n in snodes]
            if ln == 2 and d == 0:
                members.insert(1, ("way", platform_way_id, "platform"))
            members += [("way", w, "") for w in way_ids]
            tags = {
                "type": "route",
                "route": "bus" if ln != 1 else "tram",
                "ref": f"L{ln}",
                "name": f"Line {ln} dir {d}",
                "from": f"Stop {ln}-0" if d == 0 else f"Stop {ln}-{stops_per_line-1}",
                "to": f"Stop {ln}-{stops_per_line-1}" if d == 0 else f"Stop {ln}-0",
            }
            if ln == 0 and d == 0:
                tags["colour"] = "#A2F3b1"  # normalizes to upper-case hex
            if ln == 1 and d == 0:
                tags["colour"] = "red"  # CSS-name path
            if ln == 2:
                # M17 frequencies fixture (Abidjan-style headway service)
                tags["opening_hours"] = "Mo-Fr 06:00-20:00; Sa-Su 08:00-18:00"
                tags["interval"] = "00:15"
            rels.append((rid, [{"type": t, "ref": r, "role": ro} for t, r, ro in members], _tags(tags)))
            variants.append(rid)
            rid += 1
        line_variants[ln] = variants

        if ln != 3:  # line 3's variants stay masterless (J2 promotion)
            members = [{"type": "relation", "ref": v, "role": ""} for v in variants]
            tags = {
                "type": "route_master",
                "route_master": "bus" if ln != 1 else "tram",
                "ref": f"L{ln}",
                "name": f"Line {ln}",
                "network": "MetroCo" if ln < 2 else "BusCo",  # J11 fixture
            }
            rels.append((rid, members, _tags(tags)))
            rid += 1

    # J3: a second master re-using ref L0 (skipped by uniqueness guard)
    rels.append(
        (
            rid,
            [{"type": "relation", "ref": line_variants[0][0], "role": ""}],
            _tags({"type": "route_master", "route_master": "bus", "ref": "L0", "name": "Dup master"}),
        )
    )
    rid += 1

    # stop_areas: valid 2-member area on line 0; 1-member discard case
    rels.append(
        (
            rid,
            [
                {"type": "node", "ref": stop_ids_by_line[0][0], "role": "platform"},
                {"type": "node", "ref": stop_ids_by_line[0][1], "role": "platform"},
            ],
            _tags({"type": "public_transport", "public_transport": "stop_area", "name": "Area Zero"}),
        )
    )
    rid += 1
    rels.append(
        (
            rid,
            [{"type": "node", "ref": stop_ids_by_line[1][0], "role": "platform"}],
            _tags({"type": "public_transport", "public_transport": "stop_area", "name": "Tiny Area"}),
        )
    )
    rid += 1

    osm_nodes = pa.table(
        {
            "id": pa.array([n[0] for n in nodes], pa.int64()),
            "lat": pa.array([n[1] for n in nodes], pa.float64()),
            "lon": pa.array([n[2] for n in nodes], pa.float64()),
            "tags": pa.array([n[3] for n in nodes], TAGS_TYPE),
        }
    )
    osm_ways = pa.table(
        {
            "id": pa.array([w[0] for w in ways], pa.int64()),
            "node_ids": pa.array([w[1] for w in ways], pa.list_(pa.int64())),
            "tags": pa.array([w[2] for w in ways], TAGS_TYPE),
        }
    )
    osm_relations = pa.table(
        {
            "id": pa.array([r[0] for r in rels], pa.int64()),
            "members": pa.array([r[1] for r in rels], MEMBERS_TYPE),
            "tags": pa.array([r[2] for r in rels], TAGS_TYPE),
        }
    )
    return {"osm_nodes": osm_nodes, "osm_ways": osm_ways, "osm_relations": osm_relations}


def make_schedule_table(n_lines: int = N_LINES, stops_per_line: int = STOPS_PER_LINE) -> pa.Table:
    """Standard-format schedule: per route, from/to + station subset +
    aligned time columns (trips_creator.py:334-376 shape)."""
    rows = []
    for ln in range(n_lines):
        names = [f"Stop {ln}-{s}" for s in range(stops_per_line)]
        if ln == 0:
            names[3] = "[<no-name>]"  # unnamed stop placeholder
        # schedule knows first, middle, last station (others interpolated)
        stations = [names[0], names[stops_per_line // 2], names[-1]]
        deps = ["06:00", "07:30", "09:15"]
        for d in range(2):
            st = stations if d == 0 else stations[::-1]
            times = [[t, _add_min(t, 10), _add_min(t, 25)] for t in deps]
            rows.append(
                {
                    "route_id": f"L{ln}",
                    "from_stop": st[0],
                    "to_stop": st[-1],
                    "via": None,
                    "service": "Mo-Fr" if ln != 2 else "Sa-Su",
                    "station_names": st,
                    "times": times,
                }
            )
    return pa.table(
        {
            "route_id": pa.array([r["route_id"] for r in rows], pa.string()),
            "from_stop": pa.array([r["from_stop"] for r in rows], pa.string()),
            "to_stop": pa.array([r["to_stop"] for r in rows], pa.string()),
            "via": pa.array([r["via"] for r in rows], pa.string()),
            "service": pa.array([r["service"] for r in rows], pa.string()),
            "station_names": pa.array([r["station_names"] for r in rows], pa.list_(pa.string())),
            "times": pa.array([r["times"] for r in rows], pa.list_(pa.list_(pa.string()))),
        }
    )


def _add_min(hm: str, minutes: int) -> str:
    h, m = map(int, hm.split(":"))
    total = h * 60 + m + minutes
    return f"{total // 60:02d}:{total % 60:02d}"
