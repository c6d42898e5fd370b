"""GTFS-parity pipeline: the reference's full creator chain re-expressed
as Ray Data stages over OSM-shaped Arrow tables.

Reference lifecycle (/root/reference/osm2gtfs/osm2gtfs.py:42-95):
stops → routes → schedule → trips → cleanup. Here each creator is a
Dataset transform; containers (routes/stops dicts) become flat tables
joined by key; the mutable transitfeed.Schedule sink becomes per-table
Datasets (SURVEY.md §3.1 'Rebuild shape').

Physical notes per stage are inline. Small dimension sides (route
relations, schedule) are broadcast; the node→way coordinate resolution
is a hash join because OSM nodes are the big side at planet scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.geo.centroid import spherical_centroid
from osm2gtfs_ray.ops.alignment import (
    align_stops_to_schedule,
    interpolate_times,
    parse_hm,
    parse_service,
)
from osm2gtfs_ray.ops.stitch import stitch_ways

NO_NAME = "[<no-name>]"  # default for unnamed stops (osm_connector.py:440-441)

# M7 route-type normalization (elements.py:67-83); default Bus
ROUTE_TYPES = {
    "tram": "Tram",
    "light_rail": "Tram",
    "subway": "Subway",
    "train": "Rail",
    "railway": "Rail",
    "rail": "Rail",
    "bus": "Bus",
    "trolleybus": "Bus",
    "ferry": "Ferry",
    "boat": "Ferry",
}

# Full CSS3 extended color keywords (public W3C spec — the same
# table the reference reads from the webcolors package, M6).
CSS_COLORS = {
    "aliceblue": "#F0F8FF", "antiquewhite": "#FAEBD7", "aqua": "#00FFFF", "aquamarine": "#7FFFD4",
    "azure": "#F0FFFF", "beige": "#F5F5DC", "bisque": "#FFE4C4", "black": "#000000",
    "blanchedalmond": "#FFEBCD", "blue": "#0000FF", "blueviolet": "#8A2BE2", "brown": "#A52A2A",
    "burlywood": "#DEB887", "cadetblue": "#5F9EA0", "chartreuse": "#7FFF00", "chocolate": "#D2691E",
    "coral": "#FF7F50", "cornflowerblue": "#6495ED", "cornsilk": "#FFF8DC", "crimson": "#DC143C",
    "cyan": "#00FFFF", "darkblue": "#00008B", "darkcyan": "#008B8B", "darkgoldenrod": "#B8860B",
    "darkgray": "#A9A9A9", "darkgreen": "#006400", "darkgrey": "#A9A9A9", "darkkhaki": "#BDB76B",
    "darkmagenta": "#8B008B", "darkolivegreen": "#556B2F", "darkorange": "#FF8C00", "darkorchid": "#9932CC",
    "darkred": "#8B0000", "darksalmon": "#E9967A", "darkseagreen": "#8FBC8F", "darkslateblue": "#483D8B",
    "darkslategray": "#2F4F4F", "darkslategrey": "#2F4F4F", "darkturquoise": "#00CED1", "darkviolet": "#9400D3",
    "deeppink": "#FF1493", "deepskyblue": "#00BFFF", "dimgray": "#696969", "dimgrey": "#696969",
    "dodgerblue": "#1E90FF", "firebrick": "#B22222", "floralwhite": "#FFFAF0", "forestgreen": "#228B22",
    "fuchsia": "#FF00FF", "gainsboro": "#DCDCDC", "ghostwhite": "#F8F8FF", "gold": "#FFD700",
    "goldenrod": "#DAA520", "gray": "#808080", "green": "#008000", "greenyellow": "#ADFF2F",
    "grey": "#808080", "honeydew": "#F0FFF0", "hotpink": "#FF69B4", "indianred": "#CD5C5C",
    "indigo": "#4B0082", "ivory": "#FFFFF0", "khaki": "#F0E68C", "lavender": "#E6E6FA",
    "lavenderblush": "#FFF0F5", "lawngreen": "#7CFC00", "lemonchiffon": "#FFFACD", "lightblue": "#ADD8E6",
    "lightcoral": "#F08080", "lightcyan": "#E0FFFF", "lightgoldenrodyellow": "#FAFAD2", "lightgray": "#D3D3D3",
    "lightgreen": "#90EE90", "lightgrey": "#D3D3D3", "lightpink": "#FFB6C1", "lightsalmon": "#FFA07A",
    "lightseagreen": "#20B2AA", "lightskyblue": "#87CEFA", "lightslategray": "#778899", "lightslategrey": "#778899",
    "lightsteelblue": "#B0C4DE", "lightyellow": "#FFFFE0", "lime": "#00FF00", "limegreen": "#32CD32",
    "linen": "#FAF0E6", "magenta": "#FF00FF", "maroon": "#800000", "mediumaquamarine": "#66CDAA",
    "mediumblue": "#0000CD", "mediumorchid": "#BA55D3", "mediumpurple": "#9370DB", "mediumseagreen": "#3CB371",
    "mediumslateblue": "#7B68EE", "mediumspringgreen": "#00FA9A", "mediumturquoise": "#48D1CC", "mediumvioletred": "#C71585",
    "midnightblue": "#191970", "mintcream": "#F5FFFA", "mistyrose": "#FFE4E1", "moccasin": "#FFE4B5",
    "navajowhite": "#FFDEAD", "navy": "#000080", "oldlace": "#FDF5E6", "olive": "#808000",
    "olivedrab": "#6B8E23", "orange": "#FFA500", "orangered": "#FF4500", "orchid": "#DA70D6",
    "palegoldenrod": "#EEE8AA", "palegreen": "#98FB98", "paleturquoise": "#AFEEEE", "palevioletred": "#DB7093",
    "papayawhip": "#FFEFD5", "peachpuff": "#FFDAB9", "peru": "#CD853F", "pink": "#FFC0CB",
    "plum": "#DDA0DD", "powderblue": "#B0E0E6", "purple": "#800080", "red": "#FF0000",
    "rosybrown": "#BC8F8F", "royalblue": "#4169E1", "saddlebrown": "#8B4513", "salmon": "#FA8072",
    "sandybrown": "#F4A460", "seagreen": "#2E8B57", "seashell": "#FFF5EE", "sienna": "#A0522D",
    "silver": "#C0C0C0", "skyblue": "#87CEEB", "slateblue": "#6A5ACD", "slategray": "#708090",
    "slategrey": "#708090", "snow": "#FFFAFA", "springgreen": "#00FF7F", "steelblue": "#4682B4",
    "tan": "#D2B48C", "teal": "#008080", "thistle": "#D8BFD8", "tomato": "#FF6347",
    "turquoise": "#40E0D0", "violet": "#EE82EE", "wheat": "#F5DEB3", "white": "#FFFFFF",
    "whitesmoke": "#F5F5F5", "yellow": "#FFFF00", "yellowgreen": "#9ACD32",
}


def _tag(tags_col, key: str):
    """Vectorized open-map lookup (first occurrence)."""
    got = pc.map_lookup(tags_col, query_key=key, occurrence="first")
    return got


def normalize_color(c: str | None) -> str | None:
    """M6 (osm_connector.py:343-355): hex upper-cased; CSS name → hex;
    invalid → None (reference warns + drops)."""
    if c is None:
        return None
    c = c.strip()
    if c.startswith("#") and len(c) == 7:
        try:
            int(c[1:], 16)
            return c.upper()
        except ValueError:
            return None
    return CSS_COLORS.get(c.lower())


def text_color_for(c: str | None) -> str | None:
    """M12 contrast color (helper.py:95-114): sqrt-weighted perceived
    brightness (.241/.691/.068) with the reference's <=130 white
    threshold and lowercase output, for byte parity."""
    if not c:
        return None
    r, g, b = int(c[1:3], 16), int(c[3:5], 16), int(c[5:7], 16)
    brightness = (r * r * 0.241 + g * g * 0.691 + b * b * 0.068) ** 0.5
    return "#ffffff" if brightness <= 130 else "#000000"


# --------------------------------------------------------------------------
# Stops (M1 filter, M3 build, M9 stop_id, G1 way centroid)
# --------------------------------------------------------------------------

def is_stop_mask(tags_col) -> pa.Array:
    """M1 predicate (osm_connector.py:677-694): public_transport in
    {platform, station} or highway=bus_stop or amenity=bus_station."""
    pt = _tag(tags_col, "public_transport")
    hw = _tag(tags_col, "highway")
    am = _tag(tags_col, "amenity")
    # or_kleene: TRUE | NULL = TRUE (plain or_ would null out rows
    # where one of the looked-up tags is absent)
    return pc.or_kleene(
        pc.or_kleene(
            pc.is_in(pt, value_set=pa.array(["platform", "station"])),
            pc.fill_null(pc.equal(hw, pa.scalar("bus_stop")), False),
        ),
        pc.fill_null(pc.equal(am, pa.scalar("bus_station")), False),
    ).combine_chunks()


def _stop_projection(t: pa.Table, osm_type: str, lat, lon, hooks: dict | None = None) -> pa.Table:
    """M3+M9/M10 via the profile registry (SURVEY.md §2.9): the
    resolved hook table provides stop_id / stop_name variants; default
    is the ref:gtfs > ref > 'type/id' precedence
    (stops_creator.py:105-124)."""
    if hooks is None:
        from osm2gtfs_ray.pipelines.profiles import get_profile

        hooks = get_profile("default")
    name = hooks["stop_name"](pc.coalesce(_tag(t["tags"], "name"), pa.scalar(NO_NAME)))
    stop_id = hooks["stop_id"](t, osm_type)
    return pa.table(
        {
            "osm_id": t["id"],
            "osm_type": pa.array([osm_type] * len(t), pa.string()),
            "stop_id": stop_id,
            "name": name,
            "lat": lat,
            "lon": lon,
        }
    )


def build_node_stops(nodes_ds, selector: str = "default"):
    # resolve the profile ON THE DRIVER and ship the hook table in the
    # task closure — workers have their own module state, so resolving
    # the selector there would miss runtime-registered profiles
    from osm2gtfs_ray.pipelines.profiles import get_profile

    hooks = get_profile(selector)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(is_stop_mask(t["tags"]))
        return _stop_projection(t, "node", t["lat"], t["lon"], hooks)

    return nodes_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def build_way_stops(ways_ds, nodes_ds, num_partitions: int = 8):
    """Platform ways → centroid stops (osm_connector.py:444-446).

    Way→node coordinate resolution is a HASH JOIN (explode node_ids,
    join on node id): at planet scale both sides are large, so no
    broadcast. Centroid = groupby(way) spherical mean (A1)."""
    from osm2gtfs_ray.ops.joins import hash_join

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(is_stop_mask(t["tags"]))
        ids = t["node_ids"].combine_chunks()
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        lens = pc.list_value_length(ids).fill_null(0).to_numpy().astype(np.int64)
        widx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        name = pc.coalesce(_tag(t["tags"], "name"), pa.scalar(NO_NAME))
        return pa.table(
            {
                "way_id": t["id"].take(pa.array(widx)),
                "way_name": name.take(pa.array(widx)),
                "node_id": pc.list_flatten(ids),
            }
        )

    members = ways_ds.map_batches(explode, batch_format="pyarrow")
    coords = nodes_ds.map_batches(
        lambda t: t.select(["id", "lat", "lon"]).rename_columns(["node_id", "lat", "lon"]),
        batch_format="pyarrow",
    )
    joined = hash_join(members, coords, keys="node_id", num_partitions=num_partitions)

    def centroid(g: pd.DataFrame) -> pd.DataFrame:
        la, lo = spherical_centroid(g["lat"].to_numpy(), g["lon"].to_numpy())
        wid = int(g["way_id"].iloc[0])
        return pd.DataFrame(
            {
                "osm_id": [wid],
                "osm_type": ["way"],
                "stop_id": [f"way/{wid}"],
                "name": [g["way_name"].iloc[0]],
                "lat": [la],
                "lon": [lo],
            }
        )

    return joined.groupby("way_id").map_groups(centroid, batch_format="pandas")


def build_stops(nodes_ds, ways_ds, selector: str = "default"):
    return build_node_stops(nodes_ds, selector).union(build_way_stops(ways_ds, nodes_ds))


# --------------------------------------------------------------------------
# Stations (J4 member join + count filter, A1 centroid, J5 parent wiring)
# --------------------------------------------------------------------------

def build_stations(relations_ds, stops_ds):
    """stop_area relations → stations (osm_connector.py:497-530):
    explode platform members, resolve against stops (hash semi-join),
    discard areas with <2 resolved members, centroid the rest. Returns
    (stations_ds, membership_ds)."""

    def explode_areas(t: pa.Table) -> pa.Table:
        pt = _tag(t["tags"], "public_transport")
        t = t.filter(pc.equal(pt, pa.scalar("stop_area")))
        mem = t["members"].combine_chunks()
        if isinstance(mem, pa.ChunkedArray):
            mem = mem.combine_chunks()
        lens = pc.list_value_length(mem).fill_null(0).to_numpy().astype(np.int64)
        ridx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        flat = pc.list_flatten(mem)
        name = pc.coalesce(_tag(t["tags"], "name"), pa.scalar(NO_NAME))
        out = pa.table(
            {
                "area_id": t["id"].take(pa.array(ridx)),
                "area_name": name.take(pa.array(ridx)),
                "m_type": pc.struct_field(flat, "type"),
                "m_ref": pc.struct_field(flat, "ref"),
                "m_role": pc.struct_field(flat, "role"),
            }
        )
        return out.filter(pc.equal(out["m_role"], pa.scalar("platform")))

    members = relations_ds.map_batches(explode_areas, batch_format="pyarrow")

    # resolve member stops: join on (osm_type, osm_id)
    from osm2gtfs_ray.ops.joins import broadcast_join

    resolved = broadcast_join(
        members,
        stops_ds.select_columns(["osm_type", "osm_id", "stop_id", "lat", "lon"]),
        keys=["m_type", "m_ref"],
        right_keys=["osm_type", "osm_id"],
    )

    def per_area(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:  # discard areas with <2 resolved members (:519-530)
            return pd.DataFrame(
                columns=["area_id", "name", "station_id", "lat", "lon", "member_stop_ids"]
            )
        la, lo = spherical_centroid(g["lat"].to_numpy(), g["lon"].to_numpy())
        aid = int(g["area_id"].iloc[0])
        return pd.DataFrame(
            {
                "area_id": [aid],
                "name": [g["area_name"].iloc[0]],
                "station_id": [f"relation/{aid}"],
                "lat": [la],
                "lon": [lo],
                "member_stop_ids": [sorted(g["stop_id"].tolist())],
            }
        )

    stations = resolved.groupby("area_id").map_groups(per_area, batch_format="pandas")

    def membership(t: pa.Table) -> pa.Table:
        sid = t["member_stop_ids"].combine_chunks()
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        lens = pc.list_value_length(sid).fill_null(0).to_numpy().astype(np.int64)
        ridx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        return pa.table(
            {
                "stop_id": pc.list_flatten(sid),
                "parent_station": t["station_id"].take(pa.array(ridx)),
                "area_id": t["area_id"].take(pa.array(ridx)),
            }
        )

    membership_ds = stations.map_batches(membership, batch_format="pyarrow")
    return stations, membership_ds


def assign_parent_stations(stops_ds, membership_ds):
    """J5 (stops_creator.py:28-37 + elements.py:192-201): each member
    stop gets parent_station; FIRST write wins — deterministic via
    keep-first on ascending area_id."""
    from osm2gtfs_ray.ops.dedupe import keep_first
    from osm2gtfs_ray.ops.joins import broadcast_join

    first = keep_first(membership_ds, key="stop_id", order_by="area_id")
    return broadcast_join(
        stops_ds,
        first.select_columns(["stop_id", "parent_station"]),
        keys="stop_id",
        join_type="left outer",
    )


# --------------------------------------------------------------------------
# Lines / itineraries (M2 partition, J1/J2/J3, M4-M8, G3 shapes)
# --------------------------------------------------------------------------

def _relation_kind(tags_col) -> pa.Array:
    typ = _tag(tags_col, "type")
    return pc.case_when(
        pc.make_struct(
            pc.equal(typ, pa.scalar("route_master")), pc.equal(typ, pa.scalar("route"))
        ),
        pa.scalar("master"),
        pa.scalar("variant"),
        pa.scalar("other"),
    )


VARIANT_SCHEMA = pa.schema(
    [
        ("variant_id", pa.int64()),
        ("ref", pa.string()),
        ("name", pa.string()),
        ("fr", pa.string()),
        ("via", pa.string()),
        ("to", pa.string()),
        ("route_tag", pa.string()),
        ("colour", pa.string()),
        ("stop_refs", pa.list_(pa.string())),
        ("way_refs", pa.list_(pa.int64())),
    ]
)

ITINERARY_SCHEMA = pa.schema(
    [
        ("variant_id", pa.int64()),
        ("line_id", pa.int64()),
        ("route_id", pa.string()),
        ("route_name", pa.string()),
        ("route_type", pa.string()),
        ("route_color", pa.string()),
        ("route_text_color", pa.string()),
        ("fr", pa.string()),
        ("via", pa.string()),
        ("to", pa.string()),
        ("stop_refs", pa.list_(pa.string())),
        ("shape_lat", pa.list_(pa.float64())),
        ("shape_lon", pa.list_(pa.float64())),
        ("shape_segments_used", pa.int64()),
    ]
)


def split_route_relations(relations_ds):
    """M2 (osm_connector.py:123-130): one pass adds `kind`; masters and
    variants are two filtered views of the same Dataset."""

    def f(t: pa.Table) -> pa.Table:
        return t.append_column("kind", _relation_kind(t["tags"]))

    tagged = relations_ds.map_batches(f, batch_format="pyarrow")
    masters = tagged.filter(lambda r: r["kind"] == "master")
    variants = tagged.filter(lambda r: r["kind"] == "variant")
    return masters, variants


def build_lines_and_itineraries(relations_ds, ways_table: pa.Table):
    """The route assembly (osm_connector.py:124-209) as batch
    transforms + deterministic joins. The relation set is small
    relative to nodes/pages (≈10^5 per metro), so variants are
    processed per-batch and the master⋈variant join is a broadcast;
    consume-once/uniqueness are keep-first dedups on explicit sort
    keys (ascending master id — the deterministic stand-in for the
    reference's dict insertion order).

    ways_table: id → node coord arrays for shape stitching (G3),
    broadcast once via ray.put.
    """
    import ray

    ways_ref = ray.put(ways_table)

    def masters_rows(t: pa.Table) -> pa.Table:
        typ = _tag(t["tags"], "type")
        t = t.filter(pc.equal(typ, pa.scalar("route_master")))
        mem = t["members"].combine_chunks()
        if isinstance(mem, pa.ChunkedArray):
            mem = mem.combine_chunks()
        lens = pc.list_value_length(mem).fill_null(0).to_numpy().astype(np.int64)
        ridx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        flat = pc.list_flatten(mem)
        out = pa.table(
            {
                "master_id": t["id"].take(pa.array(ridx)),
                "master_ref": _tag(t["tags"], "ref").take(pa.array(ridx)),
                "master_name": pc.coalesce(_tag(t["tags"], "name"), _tag(t["tags"], "ref")).take(pa.array(ridx)),
                "master_type_tag": pc.coalesce(
                    _tag(t["tags"], "route_master"), pa.scalar("bus")
                ).take(pa.array(ridx)),
                "m_type": pc.struct_field(flat, "type"),
                "variant_id": pc.struct_field(flat, "ref"),
            }
        )
        return out.filter(pc.equal(out["m_type"], pa.scalar("relation"))).drop_columns(["m_type"])

    def variant_rows(t: pa.Table) -> pa.Table:
        typ = _tag(t["tags"], "type")
        t = t.filter(pc.equal(typ, pa.scalar("route")))
        rows = []
        members_col = t["members"].to_pylist()
        tags_col = t["tags"].to_pylist()
        ids = t["id"].to_pylist()
        for rel_id, members, tag_pairs in zip(ids, members_col, tags_col):
            tags = dict(tag_pairs)
            stop_refs, way_refs = [], []
            for m in members:
                if m["role"] == "platform":
                    stop_refs.append(f"{m['type']}/{m['ref']}")
                elif m["type"] == "way" and m["role"] in ("", "forward", "backward"):
                    way_refs.append(m["ref"])
            rows.append(
                {
                    "variant_id": rel_id,
                    "ref": tags.get("ref"),
                    "name": tags.get("name"),
                    "fr": tags.get("from"),
                    "via": tags.get("via"),
                    "to": tags.get("to"),
                    "route_tag": tags.get("route", "bus"),
                    "colour": tags.get("colour"),
                    "stop_refs": stop_refs,
                    "way_refs": way_refs,
                }
            )
        return pa.Table.from_pylist(rows, schema=VARIANT_SCHEMA)

    masters = relations_ds.map_batches(masters_rows, batch_format="pyarrow")
    variants = relations_ds.map_batches(variant_rows, batch_format="pyarrow")

    from osm2gtfs_ray.ops.dedupe import keep_first
    from osm2gtfs_ray.ops.joins import broadcast_anti, broadcast_join

    # J3: route_id (ref) uniqueness — keep the lowest master_id per ref
    master_dim = keep_first(
        masters.select_columns(["master_id", "master_ref", "master_name", "master_type_tag"])
        .groupby("master_id")
        .map_groups(lambda g: g.head(1), batch_format="pandas"),
        key="master_ref",
        order_by="master_id",
    )
    surviving = masters  # membership rows; filtered against master_dim below
    surviving = broadcast_join(
        surviving.select_columns(["master_id", "variant_id"]),
        master_dim,
        keys="master_id",
    )
    # J1 consume-once: a variant claimed by several masters goes to the
    # lowest master_id (reference: first master wins, :146-156)
    claimed = keep_first(surviving, key="variant_id", order_by="master_id")

    matched = broadcast_join(variants, claimed, keys="variant_id")

    # J2: leftover variants promoted to their own line, skipping refs
    # already taken by a master line (:184-204)
    leftovers = broadcast_anti(variants, claimed, key="variant_id")
    leftovers = broadcast_anti(leftovers, master_dim, key="ref", right_key="master_ref")

    def promote(t: pa.Table) -> pa.Table:
        return (
            t.append_column("master_id", pc.cast(t["variant_id"], pa.int64()))
            .append_column("master_ref", t["ref"])
            .append_column("master_name", pc.coalesce(t["name"], t["ref"]))
            .append_column("master_type_tag", t["route_tag"])
        )

    itineraries = matched.union(leftovers.map_batches(promote, batch_format="pyarrow"))

    class Finish:
        """Per-variant finishing: colour/type normalization (M5-M7,
        M12) + shape stitching (G3) against the broadcast ways table.

        Scale note: the per-relation assembly below is row-wise by
        design — route/variant counts are city-scale (hundreds, see
        SURVEY.md §6) and stitching is inherently sequential per
        relation; this stage is OFF the 100-TB path (the corpus-scale
        pipelines are flagship/dedup/ANN, all batch-vectorized)."""

        def __init__(self):
            t = ray.get(ways_ref)
            self.way_coords = {}
            nodes = {}
            # ways_table carries node_ids and a parallel coords list
            for wid, lats, lons in zip(
                t["id"].to_pylist(), t["lat_seq"].to_pylist(), t["lon_seq"].to_pylist()
            ):
                self.way_coords[wid] = np.column_stack([lats, lons])

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            out = []
            for r in rows:
                color = normalize_color(r.get("colour"))
                segs = [self.way_coords[w] for w in r["way_refs"] if w in self.way_coords]
                shape, n_used = stitch_ways(segs) if segs else (np.empty((0, 2)), 0)
                out.append(
                    {
                        "variant_id": r["variant_id"],
                        "line_id": r["master_id"],
                        "route_id": r["master_ref"] or (r["ref"] or f"relation/{r['variant_id']}"),
                        "route_name": r["master_name"],
                        "route_type": ROUTE_TYPES.get(r["master_type_tag"], "Bus"),
                        "route_color": color,
                        "route_text_color": text_color_for(color),
                        "fr": r["fr"],
                        "via": r["via"],
                        "to": r["to"],
                        "stop_refs": r["stop_refs"],
                        "shape_lat": shape[:, 0].tolist() if len(shape) else [],
                        "shape_lon": shape[:, 1].tolist() if len(shape) else [],
                        "shape_segments_used": n_used,
                    }
                )
            return pa.Table.from_pylist(out, schema=ITINERARY_SCHEMA)

    return itineraries.map_batches(Finish, batch_format="pyarrow", concurrency=(1, 4))


def ways_coord_table(ways_table: pa.Table, nodes_table: pa.Table) -> pa.Table:
    """Driver-side helper: resolve each way's node_ids to coordinate
    sequences (small fixture scale; the distributed path is the hash
    join in build_way_stops)."""
    lat = dict(zip(nodes_table["id"].to_pylist(), nodes_table["lat"].to_pylist()))
    lon = dict(zip(nodes_table["id"].to_pylist(), nodes_table["lon"].to_pylist()))
    lat_seq, lon_seq = [], []
    for ids in ways_table["node_ids"].to_pylist():
        lat_seq.append([lat[i] for i in ids if i in lat])
        lon_seq.append([lon[i] for i in ids if i in lon])
    return pa.table(
        {
            "id": ways_table["id"],
            "lat_seq": pa.array(lat_seq, pa.list_(pa.float64())),
            "lon_seq": pa.array(lon_seq, pa.list_(pa.float64())),
        }
    )


# --------------------------------------------------------------------------
# Trips (J7 schedule join, J10 alignment, M15/M16, shapes G7)
# --------------------------------------------------------------------------

STOP_TIMES_SCHEMA = pa.schema(
    [
        ("trip_id", pa.string()),
        ("route_id", pa.string()),
        ("variant_id", pa.int64()),
        ("service_id", pa.string()),
        ("stop_id", pa.string()),
        ("stop_sequence", pa.int64()),
        ("arrival_sec", pa.int64()),
        ("departure_sec", pa.int64()),
    ]
)


def build_trips(itineraries_ds, stops_table: pa.Table, schedule_table: pa.Table):
    """J7: itineraries ⋈ schedule on (route_id, from, to[, via]) —
    schedule broadcast (≪ OSM side, trips_creator.py:84-95). Then per
    match the J10 cursor alignment + interpolation emits stop_times.

    Returns Dataset of trips with nested stop_times (exploded by
    caller). Stop name resolution (J6) is a broadcast lookup."""
    import ray

    sched_ref = ray.put(schedule_table)
    stops_ref = ray.put(stops_table)

    class TripBuilder:
        def __init__(self):
            sched = ray.get(sched_ref)
            self.by_key: dict[tuple, list[dict]] = {}
            for row in sched.to_pylist():
                key = (row["route_id"], row["from_stop"], row["to_stop"], row.get("via"))
                self.by_key.setdefault(key, []).append(row)
            st = ray.get(stops_ref)
            self.stop_name = dict(
                zip(
                    (f"{t}/{i}" for t, i in zip(st["osm_type"].to_pylist(), st["osm_id"].to_pylist())),
                    st["name"].to_pylist(),
                )
            )
            self.stop_gtfs_id = dict(
                zip(
                    (f"{t}/{i}" for t, i in zip(st["osm_type"].to_pylist(), st["osm_id"].to_pylist())),
                    st["stop_id"].to_pylist(),
                )
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for r in batch.to_pylist():
                names = [self.stop_name.get(s, NO_NAME) for s in r["stop_refs"]]
                gtfs_ids = [self.stop_gtfs_id.get(s) for s in r["stop_refs"]]
                for cand in self.by_key.get(
                    (r["route_id"], r["fr"], r["to"], r["via"]), []
                ):
                    align = align_stops_to_schedule(names, cand["station_names"])
                    if align is None:
                        continue  # last-stop rule failed → unmatched
                    svc = parse_service(cand["service"])
                    if svc is None:
                        continue
                    day_flags, exc_date = svc
                    for k, col in enumerate(cand["times"]):
                        secs = np.full(len(names), -1, dtype=np.int64)
                        valid = True
                        for i, a in enumerate(align):
                            if a >= 0:
                                s = parse_hm(col[a])
                                if s is None:  # M15: invalid time → trip dropped
                                    valid = False
                                    break
                                secs[i] = s
                        if not valid:
                            continue
                        times = interpolate_times(secs)
                        trip_id = f"{r['route_id']}.{r['variant_id']}.{cand['service']}.{k}"
                        for seq, (sid, sec) in enumerate(zip(gtfs_ids, times)):
                            if sec < 0:
                                # leading stops before the first matched
                                # schedule station have no time; the
                                # reference refuses to add them
                                # (trips_creator.py:237-241 warn+skip) —
                                # emitting would render "00:00:-1"
                                continue
                            out.append(
                                {
                                    "trip_id": trip_id,
                                    "route_id": r["route_id"],
                                    "variant_id": r["variant_id"],
                                    "service_id": cand["service"],
                                    "stop_id": sid,
                                    "stop_sequence": seq,
                                    "arrival_sec": int(sec),
                                    "departure_sec": int(sec),
                                }
                            )
            return pa.Table.from_pylist(out, schema=STOP_TIMES_SCHEMA)

    return itineraries_ds.map_batches(TripBuilder, batch_format="pyarrow", concurrency=(1, 4))


def shape_rows(itineraries_ds):
    """G7 shape point emitter: explode stitched polylines with
    sequence numbers; dedup by shape_id keep-first is upstream (one
    row per variant)."""

    def f(t: pa.Table) -> pa.Table:
        out = {"shape_id": [], "shape_pt_lat": [], "shape_pt_lon": [], "shape_pt_sequence": []}
        for r in t.to_pylist():
            for i, (la, lo) in enumerate(zip(r["shape_lat"], r["shape_lon"])):
                out["shape_id"].append(f"shape.{r['variant_id']}")
                out["shape_pt_lat"].append(la)
                out["shape_pt_lon"].append(lo)
                out["shape_pt_sequence"].append(i)
        return pa.table(
            {
                "shape_id": pa.array(out["shape_id"], pa.string()),
                "shape_pt_lat": pa.array(out["shape_pt_lat"], pa.float64()),
                "shape_pt_lon": pa.array(out["shape_pt_lon"], pa.float64()),
                "shape_pt_sequence": pa.array(out["shape_pt_sequence"], pa.int64()),
            }
        )

    return itineraries_ds.map_batches(f, batch_format="pyarrow")


def filter_blacklist(ds, col: str, blacklist: list):
    """M20 (trips_creator_br_florianopolis.py:13-18,76): drop rows
    whose `col` is in the blacklist — broadcast key-set filter."""
    bl = pa.array(blacklist)

    def f(t: pa.Table) -> pa.Table:
        if pa.types.is_null(t[col].type):  # all-null block: nothing matches
            return t
        return t.filter(pc.invert(pc.fill_null(pc.is_in(t[col], value_set=bl), False)))

    return ds.map_batches(f, batch_format="pyarrow")


def assign_direction_ids(itineraries_ds):
    """M21 (trips_creator_gh_accra.py:44-47): alternate direction_id
    0/1 per line, deterministic by ascending variant_id within each
    route (the rebuild of 'index % 2' with order carried as data).

    The group pass runs on a SCALAR projection (route_id, variant_id)
    — itinerary list columns (stop_refs/shape) don't round-trip
    through pandas blocks — and the ids join back broadcast."""
    from osm2gtfs_ray.ops.joins import broadcast_join

    def per_route(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("variant_id", kind="mergesort").reset_index(drop=True)
        g["direction_id"] = (g.index % 2).astype("int64")
        return g

    dirs = (
        itineraries_ds.select_columns(["route_id", "variant_id"])
        .groupby("route_id")
        .map_groups(per_route, batch_format="pandas")
        .select_columns(["variant_id", "direction_id"])
    )
    return broadcast_join(itineraries_ds, dirs, keys="variant_id")


def build_agencies(relations_ds):
    """J11 (trips_creator_ci_abidjan.py:99-117): get-or-create agency
    from the `network` tag — distinct(network) with first-occurrence
    ids (deterministic: ascending first relation id per network)."""

    def extract(t: pa.Table) -> pa.Table:
        net = _tag(t["tags"], "network")
        out = pa.table({"network": net, "rel_id": t["id"]})
        return out.filter(pc.is_valid(out["network"]))

    nets = relations_ds.map_batches(extract, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rel_id", kind="mergesort").head(1)
        return pd.DataFrame(
            {
                "agency_id": [f"agency_{g['rel_id'].iloc[0]}"],
                "agency_name": [g["network"].iloc[0]],
            }
        )

    return nets.groupby("network").map_groups(first, batch_format="pandas")


def build_frequencies(relations_ds):
    """M17/M18 (trips_creator_ci_abidjan.py:81-89, 132-137): route
    variants carrying OSM opening_hours + interval tags become GTFS
    frequency rows with canonical service ids — a flat_map (one
    relation explodes to N windows) over a stateless parser."""
    from osm2gtfs_ray.ops.hours import parse_opening_hours, service_id_for

    def f(t: pa.Table) -> pa.Table:
        typ = _tag(t["tags"], "type")
        t = t.filter(pc.equal(typ, pa.scalar("route")))
        oh = _tag(t["tags"], "opening_hours").to_pylist() if len(t) else []
        iv = _tag(t["tags"], "interval").to_pylist() if len(t) else []
        ids = t["id"].to_pylist()
        rows = []
        for rel_id, o, i in zip(ids, oh, iv):
            if not o or not i:
                continue
            for w in parse_opening_hours(o, i):
                rows.append(
                    {
                        "variant_id": rel_id,
                        "service_id": service_id_for(w["day_flags"]),
                        "start_s": w["start_s"],
                        "end_s": w["end_s"],
                        "headway_s": w["headway_s"],
                    }
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("variant_id", pa.int64()),
                    ("service_id", pa.string()),
                    ("start_s", pa.int64()),
                    ("end_s", pa.int64()),
                    ("headway_s", pa.int64()),
                ]
            ),
        )

    return relations_ds.map_batches(f, batch_format="pyarrow")


def sec_to_gtfs_time(col) -> pa.Array:
    """seconds → 'HH:MM:SS' (GTFS allows hours ≥ 24), vectorized."""
    s = pc.cast(col, pa.int64())
    h = pc.divide(s, 3600)
    m = pc.divide(pc.subtract(s, pc.multiply(h, 3600)), 60)
    sec = pc.subtract(s, pc.add(pc.multiply(h, 3600), pc.multiply(m, 60)))

    def pad(x):
        return pc.utf8_lpad(pc.cast(x, pa.string()), 2, "0")

    return pc.binary_join_element_wise(pad(h), pad(m), pad(sec), ":")


def write_gtfs_tables(tables: dict, out_dir: str) -> dict:
    """S7 (osm2gtfs.py:93): write each GTFS component as a directory of
    CSV part files (the distributed analogue of the zip-of-CSVs sink;
    stop_times seconds are rendered as GTFS HH:MM:SS). Returns row
    counts per table."""
    import os

    def flatten_lists(t: pa.Table) -> pa.Table:
        # CSV has no list type: join list columns as ';'-separated text
        for idx, f in enumerate(t.schema):
            if pa.types.is_list(f.type) or pa.types.is_large_list(f.type):
                joined = pa.array(
                    [None if v is None else ";".join(str(x) for x in v)
                     for v in t[f.name].to_pylist()],
                    pa.string(),
                )
                t = t.set_column(idx, f.name, joined)
        return t

    counts = {}
    for name, ds in tables.items():
        ds = ds.map_batches(flatten_lists, batch_format="pyarrow")
        if name == "stop_times":
            def fmt(t: pa.Table) -> pa.Table:
                t = t.append_column("arrival_time", sec_to_gtfs_time(t["arrival_sec"]))
                t = t.append_column("departure_time", sec_to_gtfs_time(t["departure_sec"]))
                return t.drop_columns(["arrival_sec", "departure_sec"])

            ds = ds.map_batches(fmt, batch_format="pyarrow")
        path = os.path.join(out_dir, name)
        ds = ds.materialize()  # one execution serves both write and count
        ds.write_csv(path)
        counts[name] = ds.count()
    return counts


def remove_unused(stops_ds, routes_ds, stop_times_ds):
    """A6/A7 cleanup (stops_creator.py:45-61, routes_creator.py:42-58):
    anti-join stops against used stop_ids, routes against used
    route_ids."""
    from osm2gtfs_ray.ops.joins import broadcast_semi

    used_stops = stop_times_ds.select_columns(["stop_id"])
    used_routes = stop_times_ds.select_columns(["route_id"])
    kept_stops = broadcast_semi(stops_ds, used_stops, key="stop_id")
    kept_routes = broadcast_semi(routes_ds, used_routes, key="route_id")
    return kept_stops, kept_routes


# --------------------------------------------------------------------------
# Full chain (the reference's creator lifecycle, osm2gtfs.py:42-95)
# --------------------------------------------------------------------------

def run_gtfs_pipeline(nodes_ds, ways_ds, relations_ds, ways_coords: pa.Table,
                      stops_table: pa.Table | None, schedule_table: pa.Table,
                      selector: str = "default"):
    """stops → stations → routes → trips → cleanup, as lazy Datasets.

    ``ways_coords``: way id → coordinate sequences (driver-resolved at
    fixture scale; the distributed path is the hash join in
    build_way_stops). ``stops_table``: materialized stops for the
    broadcast lookups in the trip builder (computed here if None).
    """
    import ray

    stops = build_stops(nodes_ds, ways_ds, selector)
    if stops_table is None:
        stops_table = pa.Table.from_pandas(stops.to_pandas(), preserve_index=False)

    stations, membership = build_stations(relations_ds, stops)
    stops_parented = assign_parent_stations(stops, membership)

    itineraries = build_lines_and_itineraries(relations_ds, ways_coords)
    itineraries = assign_direction_ids(itineraries)

    stop_times = build_trips(itineraries, stops_table, schedule_table)
    shapes = shape_rows(itineraries)
    frequencies = build_frequencies(relations_ds)
    agencies = build_agencies(relations_ds)

    def routes_rows(t: pa.Table) -> pa.Table:
        return t.select(
            ["route_id", "route_name", "route_type", "route_color", "route_text_color"]
        )

    from osm2gtfs_ray.ops.dedupe import keep_first

    routes = keep_first(
        itineraries.map_batches(routes_rows, batch_format="pyarrow"),
        key="route_id",
        order_by=["route_name", "route_type", "route_color"],
    )

    kept_stops, kept_routes = remove_unused(stops_parented, routes, stop_times)
    return {
        "stops": kept_stops.sort("stop_id"),
        "stations": stations,
        "routes": kept_routes.sort("route_id"),   # O1 deterministic order
        "itineraries": itineraries,
        "stop_times": stop_times.sort(["trip_id", "stop_sequence"]),
        "shapes": shapes.sort(["shape_id", "shape_pt_sequence"]),
        "frequencies": frequencies.sort(["variant_id", "service_id", "start_s"]),
        "agencies": agencies,
    }
