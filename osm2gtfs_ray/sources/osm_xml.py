"""Overpass/OSM XML → Arrow tables (SURVEY.md S8 / S1 ingest parity).

The reference consumes Overpass XML both live and as test fixtures
(/root/reference/osm2gtfs/tests/creators/creators_tests.py:116-120 via
overpy.parse_xml). This parser turns the same XML shape —
<node id lat lon><tag k v/></node>, <way id><nd ref/><tag/></way>,
<relation id><member type ref role/><tag/></relation> — into the
engine's osm_nodes / osm_ways / osm_relations Arrow tables.

Driver-side for fixture-size documents; for planet-scale dumps the
file is split by top-level element ranges and this same per-chunk
parser runs inside read_binary_files → map_batches.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from osm2gtfs_ray.sources.osm_fixtures import MEMBERS_TYPE, TAGS_TYPE


def parse_osm_xml(xml_text: str | bytes) -> dict[str, pa.Table]:
    root = ET.fromstring(xml_text)

    n_id, n_lat, n_lon, n_tags = [], [], [], []
    w_id, w_nodes, w_tags = [], [], []
    r_id, r_members, r_tags = [], [], []

    def tags_of(el):
        return [(t.get("k"), t.get("v")) for t in el.findall("tag")]

    for el in root.findall("node"):
        n_id.append(int(el.get("id")))
        n_lat.append(float(el.get("lat")))
        n_lon.append(float(el.get("lon")))
        n_tags.append(tags_of(el))
    for el in root.findall("way"):
        w_id.append(int(el.get("id")))
        w_nodes.append([int(nd.get("ref")) for nd in el.findall("nd")])
        w_tags.append(tags_of(el))
    for el in root.findall("relation"):
        r_id.append(int(el.get("id")))
        r_members.append(
            [
                {"type": m.get("type"), "ref": int(m.get("ref")), "role": m.get("role", "")}
                for m in el.findall("member")
            ]
        )
        r_tags.append(tags_of(el))

    return {
        "osm_nodes": pa.table(
            {
                "id": pa.array(n_id, pa.int64()),
                "lat": pa.array(n_lat, pa.float64()),
                "lon": pa.array(n_lon, pa.float64()),
                "tags": pa.array(n_tags, TAGS_TYPE),
            }
        ),
        "osm_ways": pa.table(
            {
                "id": pa.array(w_id, pa.int64()),
                "node_ids": pa.array(w_nodes, pa.list_(pa.int64())),
                "tags": pa.array(w_tags, TAGS_TYPE),
            }
        ),
        "osm_relations": pa.table(
            {
                "id": pa.array(r_id, pa.int64()),
                "members": pa.array(r_members, MEMBERS_TYPE),
                "tags": pa.array(r_tags, TAGS_TYPE),
            }
        ),
    }


def to_osm_xml(tables: dict[str, pa.Table]) -> str:
    """Inverse (fixture writer): tables → Overpass-shaped XML."""
    out = ["<?xml version='1.0'?>", "<osm version='0.6'>"]
    t = tables["osm_nodes"]
    for i in range(t.num_rows):
        out.append(
            f"<node id='{t['id'][i]}' lat='{t['lat'][i]}' lon='{t['lon'][i]}'>"
        )
        for k, v in t["tags"][i].as_py():
            out.append(f"<tag k='{k}' v='{v}'/>")
        out.append("</node>")
    t = tables["osm_ways"]
    for i in range(t.num_rows):
        out.append(f"<way id='{t['id'][i]}'>")
        for ref in t["node_ids"][i].as_py():
            out.append(f"<nd ref='{ref}'/>")
        for k, v in t["tags"][i].as_py():
            out.append(f"<tag k='{k}' v='{v}'/>")
        out.append("</way>")
    t = tables["osm_relations"]
    for i in range(t.num_rows):
        out.append(f"<relation id='{t['id'][i]}'>")
        for m in t["members"][i].as_py():
            out.append(
                f"<member type='{m['type']}' ref='{m['ref']}' role='{m['role']}'/>"
            )
        for k, v in t["tags"][i].as_py():
            out.append(f"<tag k='{k}' v='{v}'/>")
        out.append("</relation>")
    out.append("</osm>")
    return "\n".join(out)
