"""Geo operator queries with SQL oracles.

The driver's DuckDB views have no geometry tables, so each query
derives deterministic synthetic (lat, lon) columns from integer keys
with EXPRESSION-IDENTICAL arithmetic on both sides (same IEEE-double
operation order) — making the geo kernels (G1 centroid, G2 haversine,
G6 bbox, cell quantization) SQL-checkable. The oracle-side grid key is
row-major (iy*nx+ix) because Morton interleaving isn't expressible in
SQL; the Morton key itself is covered by tests/test_geo_kernels.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from osm2gtfs_ray.geo.haversine import haversine_m
from osm2gtfs_ray.sources.tables import read_table

# synthetic position: lat ∈ [-90, 90), lon ∈ [-180, 180), two decimals
_LAT_SQL = "(((({k} * 7919) % 18000) / 100.0) - 90.0)"
_LON_SQL = "(((({k} * 104729) % 36000) / 100.0) - 180.0)"


def _synth_latlon(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.int64)
    lat = ((k * 7919) % 18000) / 100.0 - 90.0
    lon = ((k * 104729) % 36000) / 100.0 - 180.0
    return lat, lon


# --------------------------------------------------------------------------
# G1/A1: grouped spherical centroid as a distributed partial aggregate
# --------------------------------------------------------------------------

def q_nation_centroid(sf_dir: str):
    """Per-nation spherical centroid of synthetic customer positions.

    Re-expresses the reference's way/station centroid
    (/root/reference/osm2gtfs/core/helper.py:28-54 via
    osm_connector.py:444-446, 542-543) as the mergeable 4-accumulator
    (Σx, Σy, Σz, n): partials per batch in map_batches, tiny groupby
    over partials, finalize with atan2 — no row shuffle."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def partials(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["c_custkey"].to_numpy())
        lat_r, lon_r = np.radians(lat), np.radians(lon)
        cl = np.cos(lat_r)
        g = pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "x": pa.array(cl * np.cos(lon_r)),
                "y": pa.array(cl * np.sin(lon_r)),
                "z": pa.array(np.sin(lat_r)),
            }
        ).group_by("c_nationkey").aggregate([("x", "sum"), ("y", "sum"), ("z", "sum"), ([], "count_all")])
        return g.rename_columns(["c_nationkey", "sx", "sy", "sz", "n"])

    agg = (
        cust.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_nationkey")
        .aggregate(
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sz", alias_name="sz"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        x = t["sx"].to_numpy() / n
        y = t["sy"].to_numpy() / n
        z = t["sz"].to_numpy() / n
        lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
        lon = np.degrees(np.arctan2(y, x))
        return pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "lat_e6": pa.array(np.rint(lat * 1e6).astype(np.int64)),
                "lon_e6": pa.array(np.rint(lon * 1e6).astype(np.int64)),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_NATION_CENTROID = f"""
WITH pts AS (
  SELECT c_nationkey,
         radians({_LAT_SQL.format(k='c_custkey')}) AS lat_r,
         radians({_LON_SQL.format(k='c_custkey')}) AS lon_r
  FROM customer
), sums AS (
  SELECT c_nationkey,
         AVG(cos(lat_r) * cos(lon_r)) AS x,
         AVG(cos(lat_r) * sin(lon_r)) AS y,
         AVG(sin(lat_r)) AS z,
         COUNT(*) AS n
  FROM pts GROUP BY c_nationkey
)
SELECT c_nationkey,
       CAST(ROUND(degrees(atan2(z, sqrt(x*x + y*y))) * 1000000) AS BIGINT) AS lat_e6,
       CAST(ROUND(degrees(atan2(y, x)) * 1000000) AS BIGINT) AS lon_e6,
       n
FROM sums
"""


# --------------------------------------------------------------------------
# G6: bbox predicate filter (degenerate PIP) + grouped count
# --------------------------------------------------------------------------

BBOX = dict(south=-30.0, west=-60.0, north=30.0, east=60.0)


def q_bbox_events(sf_dir: str):
    """Count events per type whose synthetic position falls in a bbox
    (the reference's query-time bbox filter, osm_connector.py:38-41)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def f(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["event_id"].to_numpy())
        keep = (
            (lat >= BBOX["south"]) & (lat <= BBOX["north"])
            & (lon >= BBOX["west"]) & (lon <= BBOX["east"])
        )
        return pa.table({"event_type": t["event_type"].filter(pa.array(keep))})

    agg = ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "event_type"
    ).aggregate(Count(alias_name="n_inside"))
    return agg.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "n_inside": pc.cast(t["n_inside"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


SQL_BBOX_EVENTS = f"""
SELECT event_type, COUNT(*) AS n_inside
FROM (
  SELECT event_type,
         {_LAT_SQL.format(k='event_id')} AS lat,
         {_LON_SQL.format(k='event_id')} AS lon
  FROM events
)
WHERE lat >= {BBOX['south']} AND lat <= {BBOX['north']}
  AND lon >= {BBOX['west']} AND lon <= {BBOX['east']}
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Cell quantization (geocode stage) + grouped count — row-major oracle key
# --------------------------------------------------------------------------

CELL_LEVEL = 8  # nx=256, ny=128


def q_cell_histogram(sf_dir: str):
    """Events per coarse grid cell: the geocode quantization (H3-res-9
    analogue, coarse level) as a SQL-checkable row-major key."""
    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def f(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["event_id"].to_numpy())
        ix = np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64)
        iy = np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64)
        ix = np.minimum(ix, nx - 1)
        iy = np.minimum(iy, ny - 1)
        key = iy * nx + ix
        g = pa.table({"cell_rm": pa.array(key)}).group_by("cell_rm").aggregate([([], "count_all")])
        return g.rename_columns(["cell_rm", "partial"])

    agg = (
        ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell_rm")
        .aggregate(Sum("partial", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: pa.table({"cell_rm": t["cell_rm"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
    )


SQL_CELL_HISTOGRAM = f"""
SELECT CAST(
         LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * 128) AS BIGINT), 127) * 256
         + LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * 256) AS BIGINT), 255)
       AS BIGINT) AS cell_rm,
       COUNT(*) AS n
FROM (
  SELECT {_LAT_SQL.format(k='event_id')} AS lat,
         {_LON_SQL.format(k='event_id')} AS lon
  FROM events
)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# G2 + O4: haversine distance top-k (k nearest events to a fixed point)
# --------------------------------------------------------------------------

_REF_LAT, _REF_LON = 0.5, 10.25
_TOPK = 10


def q_nearest_events(sf_dir: str):
    """Top-10 events nearest a reference point by haversine — per-batch
    local top-k (vectorized) then a tiny global sort, the distributed
    argmin generalizing osm_connector.py:760-785."""
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def local_topk(t: pa.Table) -> pa.Table:
        keys = t["event_id"].to_numpy()
        lat, lon = _synth_latlon(keys)
        d = np.rint(haversine_m(lat, lon, _REF_LAT, _REF_LON)).astype(np.int64)
        k = min(_TOPK, len(d))
        # local top-k under the SAME (dist_m, event_id) order as the
        # global sort and the SQL oracle, so boundary ties are stable
        part = np.lexsort((keys, d))[:k]
        return pa.table({"event_id": pa.array(keys[part]), "dist_m": pa.array(d[part])})

    parts = ev.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return parts.sort(["dist_m", "event_id"]).limit(_TOPK)


SQL_NEAREST_EVENTS = f"""
SELECT event_id,
       CAST(ROUND(2.0 * 6371000.0 * asin(LEAST(1.0, sqrt(
           pow(sin((radians(lat) - radians({_REF_LAT})) / 2.0), 2)
           + cos(radians({_REF_LAT})) * cos(radians(lat))
             * pow(sin((radians(lon) - radians({_REF_LON})) / 2.0), 2)
       )))) AS BIGINT) AS dist_m
FROM (
  SELECT event_id,
         {_LAT_SQL.format(k='event_id')} AS lat,
         {_LON_SQL.format(k='event_id')} AS lon
  FROM events
)
ORDER BY dist_m, event_id
LIMIT {_TOPK}
"""


# --------------------------------------------------------------------------
# Tile pyramid: multi-zoom cell rollup cascade
# --------------------------------------------------------------------------
# The slippy-map / tile-server aggregation shape: per-cell counts at a
# fine zoom, then each coarser zoom derived from the NEXT-FINER
# AGGREGATED table (parent cell = coordinates >> 2, the geo/cells.py
# Morton-prefix relation in row-major form). Only the fine level
# touches the corpus — one shuffle over events; every coarser level
# rolls up a bounded table (<= nx*ny rows), so the cascade costs
# O(corpus) once + O(cells) per extra zoom regardless of input size.
# Reference analogue: zoom-level aggregation over the stop/route maps
# the reference renders (stops_creator's per-map grouping), generalized
# to the raster pyramid a web-scale tile service builds.

PYRAMID_LEVELS = (8, 6, 4)  # fine -> coarse, step 2 (factor-4 per axis)
# fine tables at or below this many potential cells (8 B key + 8 B
# count = 64 MB at the bound) roll up in ONE local pass after the
# corpus shuffle; deeper pyramids run the per-level cascade
LOCAL_PYRAMID_CELLS = 1 << 22


def q_cell_pyramid(sf_dir: str):
    """Events per grid cell at three zoom levels. Output one row per
    (level, cell_rm) with the contained event count."""
    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def fine(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["event_id"].to_numpy())
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        g = (
            pa.table({"cell_rm": iy * nx + ix})
            .group_by("cell_rm")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell_rm", "partial"])

    cur = (
        ev.map_batches(fine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell_rm")
        .aggregate(Sum("partial", alias_name="n"))
    )

    if nx * ny <= LOCAL_PYRAMID_CELLS:
        # bounded fine table: ONE corpus shuffle, then every level in a
        # single local pass over the one merged block
        def all_levels(t: pa.Table) -> pa.Table:
            key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
            n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
            lvs, keys, ns = [], [], []
            cnx = nx
            for li, level in enumerate(PYRAMID_LEVELS):
                if li > 0:
                    pnx = cnx >> 2
                    pkey = (key // cnx >> 2) * pnx + (key % cnx >> 2)
                    order = np.argsort(pkey, kind="stable")
                    uk, start = np.unique(pkey[order], return_index=True)
                    key = uk
                    n = np.add.reduceat(n[order], start)
                    cnx = pnx
                lvs.append(np.full(len(key), level, dtype=np.int64))
                keys.append(key)
                ns.append(n.astype(np.int64))
            return pa.table(
                {
                    "level": np.concatenate(lvs),
                    "cell_rm": np.concatenate(keys),
                    "n": np.concatenate(ns),
                }
            )

        return cur.repartition(1).map_batches(
            all_levels, batch_format="pyarrow", batch_size=None
        )

    level_tbls = []
    cur_nx = nx
    for li, level in enumerate(PYRAMID_LEVELS):
        if li > 0:
            # roll up the previous (already aggregated, bounded) level:
            # parent coords = child coords >> 2 at a 2-level zoom step
            pnx = cur_nx >> 2

            def rollup(t: pa.Table, _nx=cur_nx, _pnx=pnx) -> pa.Table:
                key = t["cell_rm"].to_numpy(zero_copy_only=False)
                n = t["n"].to_numpy(zero_copy_only=False)
                pkey = (key // _nx >> 2) * _pnx + (key % _nx >> 2)
                g = (
                    pa.table({"cell_rm": pkey, "partial": n})
                    .group_by("cell_rm")
                    .aggregate([("partial", "sum")])
                )
                return g.rename_columns(["cell_rm", "partial"])

            cur = (
                cur.map_batches(rollup, batch_format="pyarrow")
                .groupby("cell_rm")
                .aggregate(Sum("partial", alias_name="n"))
            )
            cur_nx = pnx

        def emit(t: pa.Table, _lv=level) -> pa.Table:
            return pa.table(
                {
                    "level": pa.array(np.full(len(t), _lv, dtype=np.int64)),
                    "cell_rm": pc.cast(t["cell_rm"], pa.int64()),
                    "n": pc.cast(t["n"], pa.int64()),
                }
            )

        cur = cur.materialize()  # rollup source AND emit source: read once
        level_tbls.append(cur.map_batches(emit, batch_format="pyarrow"))

    out = level_tbls[0]
    for extra in level_tbls[1:]:
        out = out.union(extra)
    return out


def _sql_pyramid_level(level: int) -> str:
    nx, ny = 1 << level, 1 << (level - 1)
    return f"""
SELECT CAST({level} AS BIGINT) AS level,
       CAST(
         LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * {ny}) AS BIGINT), {ny - 1}) * {nx}
         + LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * {nx}) AS BIGINT), {nx - 1})
       AS BIGINT) AS cell_rm,
       COUNT(*) AS n
FROM pts GROUP BY 2"""


SQL_CELL_PYRAMID = f"""
WITH pts AS (
  SELECT {_LAT_SQL.format(k='event_id')} AS lat,
         {_LON_SQL.format(k='event_id')} AS lon
  FROM events
)
{" UNION ALL ".join(_sql_pyramid_level(lv) for lv in PYRAMID_LEVELS)}
"""


# --------------------------------------------------------------------------
# Per-tile polygon geometry: integer shoelace area, winding, bbox
# --------------------------------------------------------------------------
# The vector-tile audit pass a spatial engine runs over its polygon
# layer before serving it: vertex count, signed shoelace area
# (quantized to e6 integer coordinates, so the arithmetic is EXACT —
# no float-summation-order hazard between engine and oracle), winding
# orientation (OSM rings are CCW-outer by convention; a 'cw' row is a
# data bug), and the e6 bbox. Reference analogue: osm2gtfs's shape
# builder validating/ordering way geometry before emitting shapes.txt
# (creators/trips_creator*.py shape handling, core/osm_connector.py
# way node walks).
#
# Scale plan: pure per-batch map over the tiles table — zero shuffles,
# ListArray offsets + np.add.reduceat kernels, no Python per ring. At
# planet scale (~10^7 OSM polygons) this streams; the e6 quantization
# is done per batch and each ring is translated to its first vertex
# before the cross products so int64 never overflows (shoelace is
# exactly translation-invariant in integer arithmetic).

def _ring_components(t: pa.Table):
    """(offsets, flat lat_e6, flat lon_e6) from a ring list column —
    buffer-level access, no per-ring Python."""
    ring = t["ring"].combine_chunks()
    if isinstance(ring, pa.ChunkedArray):
        ring = ring.combine_chunks()
    offs = ring.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]  # rebase: sliced blocks carry parent offsets
    flat = ring.flatten()
    lat = flat.field("lat").to_numpy(zero_copy_only=False)
    lon = flat.field("lon").to_numpy(zero_copy_only=False)
    return offs, np.rint(lat * 1e6).astype(np.int64), np.rint(lon * 1e6).astype(np.int64)


def tile_geometry_batch(t: pa.Table) -> pa.Table:
    """Vectorized per-ring geometry kernel (no Ray): integer shoelace
    over rings translated to their first vertex, reduceat bboxes."""
    offs, y, x = _ring_components(t)  # y = lat_e6, x = lon_e6
    starts, ends = offs[:-1], offs[1:]
    # translate each ring to its first vertex (exact, avoids
    # int64 overflow in the cross products)
    xs = x - np.repeat(x[starts], ends - starts)
    ys = y - np.repeat(y[starts], ends - starts)
    # consecutive-pair cross products over the flat arrays; the
    # pair at each ring's END (last of ring k with first of k+1)
    # is excluded by summing only [start, end-1) per ring
    cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
    csum = np.concatenate([[0], np.cumsum(cross)])
    area2 = csum[ends - 1] - csum[starts]
    nv = ends - starts - 1  # rings are closed: last == first
    return pa.table(
        {
            "tile_id": t["tile_id"],
            "n_vertices": nv,
            "area2_e12": np.abs(area2),
            "orientation": np.where(area2 > 0, "ccw", "cw"),
            "s_e6": np.minimum.reduceat(y, starts),
            "w_e6": np.minimum.reduceat(x, starts),
            "n_e6": np.maximum.reduceat(y, starts),
            "e_e6": np.maximum.reduceat(x, starts),
        }
    )


def q_tile_geometry(sf_dir: str, n_tiles: int = 64):
    """(tile_id, n_vertices, area2_e12, orientation, s_e6, w_e6,
    n_e6, e_e6) per polygon tile. area2_e12 = |2 * shoelace area| in
    e6-coordinate units; orientation 'ccw' iff the signed area is
    positive in the (lon, lat) plane."""
    import ray.data

    from osm2gtfs_ray.sources.pages import make_tiles_table

    tiles = ray.data.from_arrow(make_tiles_table(n_tiles, seed=42))
    return tiles.map_batches(
        tile_geometry_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _tile_ring_literals(n_tiles: int = 64) -> str:
    """Quantized UNCLOSED ring vertices as SQL VALUES rows
    (tile_id, seq, x, y) — the op's input encoding; the geometry
    itself is recomputed by DuckDB independently."""
    from osm2gtfs_ray.sources.pages import make_tiles_table
    from osm2gtfs_ray.stages.spatial_join import _unpack_tiles

    tiles = make_tiles_table(n_tiles, seed=42)
    tile_ids, lats, lons, _ = _unpack_tiles(tiles)
    rows = []
    for ti, tid in enumerate(tile_ids):
        la = np.rint(lats[ti][:-1] * 1e6).astype(np.int64)
        lo = np.rint(lons[ti][:-1] * 1e6).astype(np.int64)
        for i in range(len(la)):
            rows.append(f"('{tid}', {i}, {lo[i]}, {la[i]})")
    return ",\n".join(rows)


def sql_tile_geometry(n_tiles: int = 64) -> str:
    return f"""
WITH ring_t(tile_id, seq, x, y) AS (VALUES {_tile_ring_literals(n_tiles)}),
m_t AS (SELECT tile_id, COUNT(*) AS m FROM ring_t GROUP BY tile_id),
pair AS (
  SELECT r1.tile_id, r1.x AS x1, r1.y AS y1, r2.x AS x2, r2.y AS y2
  FROM ring_t r1
  JOIN m_t USING (tile_id)
  JOIN ring_t r2 ON r2.tile_id = r1.tile_id
                AND r2.seq = (r1.seq + 1) % m_t.m
),
g AS (
  SELECT tile_id,
         SUM(CAST(x1 AS HUGEINT) * y2 - CAST(x2 AS HUGEINT) * y1) AS area2
  FROM pair GROUP BY tile_id
)
SELECT r.tile_id,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(ABS(g.area2) AS BIGINT) AS area2_e12,
       CASE WHEN g.area2 > 0 THEN 'ccw' ELSE 'cw' END AS orientation,
       CAST(MIN(r.y) AS BIGINT) AS s_e6,
       CAST(MIN(r.x) AS BIGINT) AS w_e6,
       CAST(MAX(r.y) AS BIGINT) AS n_e6,
       CAST(MAX(r.x) AS BIGINT) AS e_e6
FROM ring_t r JOIN g USING (tile_id)
GROUP BY r.tile_id, g.area2
ORDER BY r.tile_id
"""


# --------------------------------------------------------------------------
# Shape simplification: Douglas-Peucker over per-route polylines
# --------------------------------------------------------------------------
# The post-pass a feed/tile service runs on emitted shapes before
# serving them (the reference emits raw way geometry as shape points —
# creators/trips_creator*.py; production simplifies those polylines).
# Coordinates are synthesized as INTEGER e4 units on both sides (base
# point per shape + bounded wander per vertex, splitmix streams), and
# ops/simplify.py decides keep/drop with exact integer cross-product
# comparisons — so the oracle (the DP recursion unrolled as K split
# levels, one CTE pair per level) matches bit-for-bit, tie-breaks
# included. Scale plan: ONE shape_id-hash shuffle, then the level-BFS
# kernel simplifies every shape of a shard simultaneously (vectorized
# across segments, no per-shape Python).

N_SHAPES = 50
SHAPE_PTS = 24  # per-shape vertex cap
DP_EPS_E4 = 2000  # 0.2 degrees
# SQL unroll depth: the fixture's measured BFS split depth is <= 11 at
# every testdata size (the point set is identical for any events table
# with >= N_SHAPES*SHAPE_PTS rows); 14 gives margin, and the engine
# passes max_levels=DP_SQL_LEVELS so a depth divergence raises instead
# of silently disagreeing with the unrolled oracle.
DP_SQL_LEVELS = 14
_S_SLAT, _S_SLON, _S_WLAT, _S_WLON = 260, 261, 262, 263
_WANDER = 10001  # +/- 0.5 deg in e4 units


def synth_shape_points(event_ids: np.ndarray):
    """(shape_id, seq, x_e4, y_e4) per event id — integer coords only."""
    from osm2gtfs_ray.sources.pages import _uint

    eid = np.asarray(event_ids, dtype=np.uint64)
    sid = (eid % np.uint64(N_SHAPES)).astype(np.int64)
    seq = (eid // np.uint64(N_SHAPES)).astype(np.int64)
    m = seq < SHAPE_PTS
    eid, sid, seq = eid[m], sid[m], seq[m]
    sid_u = sid.astype(np.uint64)
    base_y = _uint(sid_u, _S_SLAT, 42, 1_200_000) - 600_000
    base_x = _uint(sid_u, _S_SLON, 42, 3_400_000) - 1_700_000
    y = base_y + _uint(eid, _S_WLAT, 42, _WANDER) - 5000
    x = base_x + _uint(eid, _S_WLON, 42, _WANDER) - 5000
    return sid, seq, x, y


def q_simplify_shapes(sf_dir: str):
    """Kept shape vertices after integer Douglas-Peucker
    (eps = 0.2 deg): (shape_id, seq, x_e4, y_e4)."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.ops.simplify import dp_keep_mask

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def synth(t: pa.Table) -> pa.Table:
        sid, seq, x, y = synth_shape_points(t["event_id"].to_numpy())
        return pa.table({"shape_id": sid, "seq": seq, "x_e4": x, "y_e4": y})

    pts = ev.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)

    def simplify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shape_id", "seq"], kind="mergesort")
        sid = g["shape_id"].to_numpy(np.int64)
        starts = np.nonzero(np.diff(sid, prepend=sid[0] - 1))[0]
        offsets = np.concatenate([starts, [len(sid)]])
        keep = dp_keep_mask(
            offsets,
            g["x_e4"].to_numpy(np.int64),
            g["y_e4"].to_numpy(np.int64),
            DP_EPS_E4,
            max_levels=DP_SQL_LEVELS,
        )
        return g[keep]

    return sharded_map_groups(pts, "shape_id", simplify)


def _sql_dp_level(i: int) -> str:
    eps2 = DP_EPS_E4 * DP_EPS_E4
    d2 = """CASE WHEN (CAST(b.x_e4 - a.x_e4 AS HUGEINT) * (b.x_e4 - a.x_e4)
                 + CAST(b.y_e4 - a.y_e4 AS HUGEINT) * (b.y_e4 - a.y_e4)) = 0
            THEN CAST(p.x_e4 - a.x_e4 AS HUGEINT) * (p.x_e4 - a.x_e4)
                 + CAST(p.y_e4 - a.y_e4 AS HUGEINT) * (p.y_e4 - a.y_e4)
            ELSE (CAST(p.x_e4 - a.x_e4 AS HUGEINT) * (b.y_e4 - a.y_e4)
                  - CAST(p.y_e4 - a.y_e4 AS HUGEINT) * (b.x_e4 - a.x_e4))
                 * (CAST(p.x_e4 - a.x_e4 AS HUGEINT) * (b.y_e4 - a.y_e4)
                    - CAST(p.y_e4 - a.y_e4 AS HUGEINT) * (b.x_e4 - a.x_e4))
            END"""
    s2 = """GREATEST(CAST(b.x_e4 - a.x_e4 AS HUGEINT) * (b.x_e4 - a.x_e4)
                 + CAST(b.y_e4 - a.y_e4 AS HUGEINT) * (b.y_e4 - a.y_e4), 1)"""
    return f"""
c{i} AS MATERIALIZED (
  SELECT s.shape_id, s.i0, s.i1, p.seq, {d2} AS d2num, {s2} AS seglen2,
         ROW_NUMBER() OVER (PARTITION BY s.shape_id, s.i0, s.i1
                            ORDER BY {d2} DESC, p.seq) AS rn
  FROM s{i} s
  JOIN pts a ON a.shape_id = s.shape_id AND a.seq = s.i0
  JOIN pts b ON b.shape_id = s.shape_id AND b.seq = s.i1
  JOIN pts p ON p.shape_id = s.shape_id AND p.seq > s.i0 AND p.seq < s.i1
),
k{i} AS MATERIALIZED (SELECT shape_id, seq FROM c{i}
         WHERE rn = 1 AND d2num > {eps2} * seglen2),
s{i + 1} AS MATERIALIZED (
  SELECT c.shape_id, c.i0, c.seq AS i1 FROM c{i} c
  WHERE c.rn = 1 AND c.d2num > {eps2} * c.seglen2 AND c.seq - c.i0 >= 2
  UNION ALL
  SELECT c.shape_id, c.seq AS i0, c.i1 FROM c{i} c
  WHERE c.rn = 1 AND c.d2num > {eps2} * c.seglen2 AND c.i1 - c.seq >= 2
)"""


def sql_simplify_shapes() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    base_y = _s_uint("sidu", _S_SLAT, 1_200_000)
    base_x = _s_uint("sidu", _S_SLON, 3_400_000)
    wy = _s_uint("eid", _S_WLAT, _WANDER)
    wx = _s_uint("eid", _S_WLON, _WANDER)
    k = DP_SQL_LEVELS
    levels = ",".join(_sql_dp_level(i) for i in range(k))
    kept = " UNION ALL ".join(f"SELECT shape_id, seq FROM k{i}" for i in range(k))
    return f"""
WITH raw AS (
  SELECT CAST(event_id AS UBIGINT) AS eid,
         CAST(event_id % {N_SHAPES} AS UBIGINT) AS sidu,
         CAST(event_id % {N_SHAPES} AS BIGINT) AS shape_id,
         CAST(event_id // {N_SHAPES} AS BIGINT) AS seq
  FROM events WHERE event_id // {N_SHAPES} < {SHAPE_PTS}
),
pts AS MATERIALIZED (
  SELECT shape_id, seq,
         ({base_x}) - 1700000 + ({wx}) - 5000 AS x_e4,
         ({base_y}) - 600000 + ({wy}) - 5000 AS y_e4
  FROM raw
),
ends AS (SELECT shape_id, MAX(seq) AS last FROM pts GROUP BY shape_id),
s0 AS (SELECT shape_id, 0 AS i0, last AS i1 FROM ends WHERE last >= 2),
{levels},
kept AS (
  SELECT shape_id, 0 AS seq FROM ends
  UNION ALL SELECT shape_id, last FROM ends WHERE last > 0
  UNION ALL {kept}
)
SELECT p.shape_id, p.seq, CAST(p.x_e4 AS BIGINT) AS x_e4,
       CAST(p.y_e4 AS BIGINT) AS y_e4
FROM pts p JOIN kept USING (shape_id, seq)
ORDER BY p.shape_id, p.seq
"""


# --------------------------------------------------------------------------
# k-ring density smoothing: 3x3 cell convolution (heatmap render pass)
# --------------------------------------------------------------------------
# The raster smoothing a tile service applies before rendering a
# density layer: each cell's smoothed mass = the sum of raw counts
# over its 3x3 neighborhood, with longitude WRAPPING at the
# antimeridian and latitude rows CLAMPED at the poles (no phantom
# neighbors past the edge row). Reference analogue: the reference
# renders stop density per map region (stops_creator grouping);
# smoothing is the standard render-side convolution on that grid.
#
# Scale plan: the corpus is touched by exactly ONE shuffle (the
# per-cell count groupby — same shape as q_cell_histogram); the
# convolution then runs over the BOUNDED cell table. Two plans, same
# result (plan-equivalence pytest): 'local' densifies the <= nx*ny
# grid in one block and sums 9 shifted views (np.roll for the lon
# wrap); 'shuffle' emits 9 (neighbor_cell, partial) rows per non-zero
# cell inside map_batches and re-groups — the path for grids too fine
# to densify on one worker.

# below this corpus row count the bounded-key cell merges happen on
# the driver (ops/sharded.bounded_key_sum — partials are <=
# min(block_rows, grid size) each) instead of paying a Ray all-to-all
# whose fixed cost dwarfs the 32k-cell key space; above it the Ray
# groupby exchange runs (the many-block scale path)
_GRID_DRIVER_ROWS = 200_000


def _n_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _smooth_counts(sf_dir: str):
    """Raw per-cell counts at CELL_LEVEL (one corpus pass; bounded
    cell merge driver-side under _GRID_DRIVER_ROWS)."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def f(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["event_id"].to_numpy())
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        g = (
            pa.table({"cell_rm": iy * nx + ix})
            .group_by("cell_rm")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell_rm", "partial"])

    return bounded_key_sum(
        ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        "cell_rm", ["partial"],
        driver=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
        out_names=["n"],
    )


def q_cell_smooth(sf_dir: str, plan: str = "local"):
    """(cell_rm, n_smooth) for every cell whose 3x3 neighborhood holds
    at least one event; lon wraps, lat clamps."""
    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    counts = _smooth_counts(sf_dir)

    if plan == "local":

        def convolve(t: pa.Table) -> pa.Table:
            key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
            n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
            grid = np.zeros((ny, nx), dtype=np.int64)
            grid[key // nx, key % nx] = n
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
            iy, ix = np.nonzero(sm)
            return pa.table(
                {"cell_rm": iy * nx + ix, "n_smooth": sm[iy, ix]}
            )

        return counts.repartition(1).map_batches(
            convolve, batch_format="pyarrow", batch_size=None
        )

    # shuffle plan: emit the 9 neighbor partials per cell, re-group
    def emit(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
        iy, ix = key // nx, key % nx
        outs_k, outs_n = [], []
        for dy in (-1, 0, 1):
            ny_ok = (iy + dy >= 0) & (iy + dy < ny)
            for dx in (-1, 0, 1):
                k = (iy[ny_ok] + dy) * nx + (ix[ny_ok] + dx + nx) % nx
                outs_k.append(k)
                outs_n.append(n[ny_ok])
        return pa.table(
            {"cell_rm": np.concatenate(outs_k), "p": np.concatenate(outs_n)}
        )

    out = (
        counts.map_batches(emit, batch_format="pyarrow")
        .groupby("cell_rm")
        .aggregate(Sum("p", alias_name="n_smooth"))
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "cell_rm": pc.cast(t["cell_rm"], pa.int64()),
                "n_smooth": pc.cast(t["n_smooth"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_CELL_SMOOTH = f"""
WITH c AS (
  SELECT CAST(
           LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * 128) AS BIGINT), 127) AS BIGINT
         ) AS iy,
         CAST(
           LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * 256) AS BIGINT), 255) AS BIGINT
         ) AS ix,
         COUNT(*) AS n
  FROM (
    SELECT {_LAT_SQL.format(k='event_id')} AS lat,
           {_LON_SQL.format(k='event_id')} AS lon
    FROM events
  )
  GROUP BY 1, 2
),
o(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
SELECT (c.iy + o.dy) * 256 + ((c.ix + o.dx + 256) % 256) AS cell_rm,
       CAST(SUM(c.n) AS BIGINT) AS n_smooth
FROM c JOIN o ON c.iy + o.dy >= 0 AND c.iy + o.dy < 128
GROUP BY 1
"""


# --------------------------------------------------------------------------
# GPS-sample -> polyline snap (map-matching lite): each sample snaps
# to the nearest SEGMENT of the shape network within radius R
# --------------------------------------------------------------------------
# The reference's stop<->way matching (osm2gtfs stops_creator snaps
# stop positions onto way geometry) lifted to scale: samples are
# shape vertices + jitter (a GPS trace around the route), segments
# are consecutive-vertex pairs, and the snap minimizes an EXACT
# integer distance. The defined metric avoids cross-multiplying
# rationals: d2 = |p-a|^2 - (t_num^2 // t_den) for interior
# projections (floored once — a deterministic sub-unit quantization
# both sides replicate), endpoint distances otherwise. Radius-bounded
# candidates keep every intermediate product inside int64:
# |p-a| <= R + segdiag ~ 9.2e4 so |p-a|^2 * 1 and t_num^2 <= 1.7e18.
#
# Scale plan: segments are replicated to each 2^17-e4 grid cell their
# R-expanded bbox touches (<= 4 cells typical — bounded by segment
# length, never data volume); each sample lives in exactly ONE cell,
# so a single cell-hash co-partition makes the per-point argmin
# complete within its shard. No all-pairs stage exists anywhere: the
# bbox predicate prunes inside the shard before the distance kernel.
# Unmatched samples (nothing within R) emit no row — the reference's
# unmatched-stop semantics.

_S_PX, _S_PY = 264, 265
SNAP_JITTER = 40001  # +/- 2.0 deg e4 jitter around the true vertex
SNAP_R = 50_000  # snap radius, e4 units (5 deg — covers the jitter)
SNAP_CELLW = 1 << 17


def synth_snap_points(event_ids: np.ndarray):
    """(point_id, px, py): jittered GPS samples around shape vertices."""
    from osm2gtfs_ray.sources.pages import _uint

    sid, seq, x, y = synth_shape_points(event_ids)
    eid = (sid + np.int64(N_SHAPES) * seq).astype(np.uint64)
    px = x + _uint(eid, _S_PX, 42, SNAP_JITTER) - (SNAP_JITTER - 1) // 2
    py = y + _uint(eid, _S_PY, 42, SNAP_JITTER) - (SNAP_JITTER - 1) // 2
    return eid.astype(np.int64), px, py


def _snap_d2(px, py, x1, y1, x2, y2):
    """Exact int64 point-to-segment metric (floored interior term)."""
    dx, dy = x2 - x1, y2 - y1
    t_den = dx * dx + dy * dy
    wx, wy = px - x1, py - y1
    t_num = wx * dx + wy * dy
    d_a = wx * wx + wy * wy
    vx, vy = px - x2, py - y2
    d_b = vx * vx + vy * vy
    interior = d_a - (t_num * t_num) // np.maximum(t_den, 1)
    return np.where(
        (t_num <= 0) | (t_den == 0), d_a,
        np.where(t_num >= t_den, d_b, interior),
    )


def q_snap_points(sf_dir: str):
    """(point_id, shape_id, seq, d2) — nearest segment within SNAP_R
    per GPS sample; ties broken by (d2, shape_id, seq)."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _flat_ranges

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def points(t: pa.Table) -> pa.Table:
        pid, px, py = synth_snap_points(t["event_id"].to_numpy())
        cell = (px // SNAP_CELLW) * np.int64(1 << 16) + (py // SNAP_CELLW)
        z = np.zeros(len(pid), dtype=np.int64)
        return pa.table(
            {"cell": cell, "kind": z, "id": pid, "seq": z,
             "x1": px, "y1": py, "x2": z, "y2": z}
        )

    def segments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shape_id", "seq"], kind="mergesort")
        sid = g["shape_id"].to_numpy(np.int64)
        seq = g["seq"].to_numpy(np.int64)
        x = g["x_e4"].to_numpy(np.int64)
        y = g["y_e4"].to_numpy(np.int64)
        # adjacent-in-shape pairs: same shape AND consecutive seq
        m = (sid[1:] == sid[:-1]) & (seq[1:] == seq[:-1] + 1)
        i = np.flatnonzero(m)
        out = pd.DataFrame(
            {"shape_id": sid[i], "seq": seq[i],
             "x1": x[i], "y1": y[i], "x2": x[i + 1], "y2": y[i + 1]}
        )
        # replicate to every cell the R-expanded bbox touches
        cx0 = (np.minimum(out["x1"], out["x2"]).to_numpy() - SNAP_R) // SNAP_CELLW
        cx1 = (np.maximum(out["x1"], out["x2"]).to_numpy() + SNAP_R) // SNAP_CELLW
        cy0 = (np.minimum(out["y1"], out["y2"]).to_numpy() - SNAP_R) // SNAP_CELLW
        cy1 = (np.maximum(out["y1"], out["y2"]).to_numpy() + SNAP_R) // SNAP_CELLW
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nx * ny
        r = out.loc[out.index.repeat(rep)].reset_index(drop=True)
        off = _flat_ranges(rep)
        nyr = np.repeat(ny.to_numpy() if hasattr(ny, "to_numpy") else ny, rep)
        cx = np.repeat(cx0, rep) + off // nyr
        cy = np.repeat(cy0, rep) + off % nyr
        return pd.DataFrame(
            {"cell": cx * np.int64(1 << 16) + cy,
             "kind": np.ones(len(r), dtype=np.int64),
             "id": r["shape_id"].to_numpy(np.int64),
             "seq": r["seq"].to_numpy(np.int64),
             "x1": r["x1"].to_numpy(np.int64),
             "y1": r["y1"].to_numpy(np.int64),
             "x2": r["x2"].to_numpy(np.int64),
             "y2": r["y2"].to_numpy(np.int64)}
        )

    def synth(t: pa.Table) -> pa.Table:
        sid, seq, x, y = synth_shape_points(t["event_id"].to_numpy())
        return pa.table({"shape_id": sid, "seq": seq, "x_e4": x, "y_e4": y})

    seg_ds = sharded_map_groups(
        ev.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True),
        "shape_id", segments,
    )
    pt_ds = ev.map_batches(points, batch_format="pyarrow", zero_copy_batch=True)

    def snap_shard(g: pd.DataFrame) -> pd.DataFrame:
        pts = g[g["kind"] == 0]
        segs = g[g["kind"] == 1]
        cols = ["doc", "shape_id", "seq", "d2"]
        if pts.empty or segs.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols}
                                ).rename(columns={"doc": "point_id"})
        m = pts[["cell", "id", "x1", "y1"]].rename(
            columns={"id": "point_id", "x1": "px", "y1": "py"}
        ).merge(
            segs[["cell", "id", "seq", "x1", "y1", "x2", "y2"]].rename(
                columns={"id": "shape_id"}
            ),
            on="cell",
        )
        if m.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols}
                                ).rename(columns={"doc": "point_id"})
        px, py = m["px"].to_numpy(np.int64), m["py"].to_numpy(np.int64)
        x1, y1 = m["x1"].to_numpy(np.int64), m["y1"].to_numpy(np.int64)
        x2, y2 = m["x2"].to_numpy(np.int64), m["y2"].to_numpy(np.int64)
        ok = (
            (px >= np.minimum(x1, x2) - SNAP_R)
            & (px <= np.maximum(x1, x2) + SNAP_R)
            & (py >= np.minimum(y1, y2) - SNAP_R)
            & (py <= np.maximum(y1, y2) + SNAP_R)
        )
        m = m[ok]
        d2 = _snap_d2(
            m["px"].to_numpy(np.int64), m["py"].to_numpy(np.int64),
            m["x1"].to_numpy(np.int64), m["y1"].to_numpy(np.int64),
            m["x2"].to_numpy(np.int64), m["y2"].to_numpy(np.int64),
        )
        out = pd.DataFrame(
            {"point_id": m["point_id"].to_numpy(np.int64),
             "shape_id": m["shape_id"].to_numpy(np.int64),
             "seq": m["seq"].to_numpy(np.int64), "d2": d2}
        )
        out = out.sort_values(
            ["point_id", "d2", "shape_id", "seq"], kind="mergesort"
        ).drop_duplicates("point_id")
        return out

    return sharded_map_groups(pt_ds.union(seg_ds), "cell", snap_shard)


def sql_snap_points() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    base_y = _s_uint("sidu", _S_SLAT, 1_200_000)
    base_x = _s_uint("sidu", _S_SLON, 3_400_000)
    wy = _s_uint("eid", _S_WLAT, _WANDER)
    wx = _s_uint("eid", _S_WLON, _WANDER)
    jx = _s_uint("eid", _S_PX, SNAP_JITTER)
    jy = _s_uint("eid", _S_PY, SNAP_JITTER)
    half = (SNAP_JITTER - 1) // 2
    t_den = "(CAST(s.x2 - s.x1 AS HUGEINT) * (s.x2 - s.x1) + CAST(s.y2 - s.y1 AS HUGEINT) * (s.y2 - s.y1))"
    t_num = "(CAST(p.px - s.x1 AS HUGEINT) * (s.x2 - s.x1) + CAST(p.py - s.y1 AS HUGEINT) * (s.y2 - s.y1))"
    d_a = "(CAST(p.px - s.x1 AS HUGEINT) * (p.px - s.x1) + CAST(p.py - s.y1 AS HUGEINT) * (p.py - s.y1))"
    d_b = "(CAST(p.px - s.x2 AS HUGEINT) * (p.px - s.x2) + CAST(p.py - s.y2 AS HUGEINT) * (p.py - s.y2))"
    return f"""
WITH raw AS (
  SELECT CAST(event_id AS UBIGINT) AS eid,
         CAST(event_id % {N_SHAPES} AS UBIGINT) AS sidu,
         CAST(event_id % {N_SHAPES} AS BIGINT) AS shape_id,
         CAST(event_id // {N_SHAPES} AS BIGINT) AS seq
  FROM events WHERE event_id // {N_SHAPES} < {SHAPE_PTS}
),
pts AS MATERIALIZED (
  SELECT eid, shape_id, seq,
         ({base_x}) - 1700000 + ({wx}) - 5000 AS x_e4,
         ({base_y}) - 600000 + ({wy}) - 5000 AS y_e4
  FROM raw
),
seg AS MATERIALIZED (
  SELECT a.shape_id, a.seq, a.x_e4 AS x1, a.y_e4 AS y1,
         b.x_e4 AS x2, b.y_e4 AS y2
  FROM pts a JOIN pts b ON b.shape_id = a.shape_id AND b.seq = a.seq + 1
),
qp AS MATERIALIZED (
  SELECT CAST(eid AS BIGINT) AS point_id,
         x_e4 + ({jx}) - {half} AS px,
         y_e4 + ({jy}) - {half} AS py
  FROM pts
),
cand AS (
  SELECT p.point_id, s.shape_id, s.seq,
         CASE WHEN {t_num} <= 0 OR {t_den} = 0 THEN {d_a}
              WHEN {t_num} >= {t_den} THEN {d_b}
              ELSE {d_a} - ({t_num} * {t_num}) // {t_den} END AS d2
  FROM qp p JOIN seg s
    ON p.px >= LEAST(s.x1, s.x2) - {SNAP_R}
   AND p.px <= GREATEST(s.x1, s.x2) + {SNAP_R}
   AND p.py >= LEAST(s.y1, s.y2) - {SNAP_R}
   AND p.py <= GREATEST(s.y1, s.y2) + {SNAP_R}
),
best AS (
  SELECT point_id, shape_id, seq, CAST(d2 AS BIGINT) AS d2,
         ROW_NUMBER() OVER (PARTITION BY point_id
                            ORDER BY d2, shape_id, seq) AS rn
  FROM cand
)
SELECT point_id, shape_id, seq, d2 FROM best WHERE rn = 1
ORDER BY point_id
"""


# --------------------------------------------------------------------------
# Per-shape polyline length — exact integer metric via corrected isqrt
# --------------------------------------------------------------------------
# The route-length rollup (reference: shapes_creator emits per-route
# shape geometry; length is its first derived stat). Exact semantics:
# len_e4 = sum over segments of isqrt(dx^2 + dy^2) — the floored
# integer square root per segment. Both sides compute isqrt EXACTLY:
# float sqrt gives a seed r = floor(sqrt(x)) that can be off by one
# ULP; the +/-1 correction (r -= r*r > x; r += (r+1)^2 <= x) makes it
# the true integer root for any x < 2^52, which seg_len2 <= 2e8 is
# comfortably under (agreement fuzz-tested in tests + the SQL gate).
# One shape-hash shuffle; adjacent-pair diffs vectorized per shard.

def q_shape_length(sf_dir: str):
    """(shape_id, n_segs, len_e4) per synthetic shape."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def synth(t: pa.Table) -> pa.Table:
        sid, seq, x, y = synth_shape_points(t["event_id"].to_numpy())
        return pa.table({"shape_id": sid, "seq": seq, "x_e4": x, "y_e4": y})

    pts = ev.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)

    def lengths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shape_id", "seq"], kind="mergesort")
        sid = g["shape_id"].to_numpy(np.int64)
        seq = g["seq"].to_numpy(np.int64)
        x = g["x_e4"].to_numpy(np.int64)
        y = g["y_e4"].to_numpy(np.int64)
        m = (sid[1:] == sid[:-1]) & (seq[1:] == seq[:-1] + 1)
        i = np.flatnonzero(m)
        dx, dy = x[i + 1] - x[i], y[i + 1] - y[i]
        d2 = dx * dx + dy * dy
        r = np.floor(np.sqrt(d2.astype(np.float64))).astype(np.int64)
        r = r - (r * r > d2) + ((r + 1) * (r + 1) <= d2)
        out = pd.DataFrame({"shape_id": sid[i], "len": r})
        agg = out.groupby("shape_id", sort=False)["len"].agg(["size", "sum"])
        return pd.DataFrame(
            {
                "shape_id": agg.index.to_numpy(np.int64),
                "n_segs": agg["size"].to_numpy(np.int64),
                "len_e4": agg["sum"].to_numpy(np.int64),
            }
        )

    return sharded_map_groups(pts, "shape_id", lengths)


def sql_shape_length() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    base_y = _s_uint("sidu", _S_SLAT, 1_200_000)
    base_x = _s_uint("sidu", _S_SLON, 3_400_000)
    wy = _s_uint("eid", _S_WLAT, _WANDER)
    wx = _s_uint("eid", _S_WLON, _WANDER)
    d2 = ("(CAST(b.x_e4 - a.x_e4 AS BIGINT) * (b.x_e4 - a.x_e4)"
          " + CAST(b.y_e4 - a.y_e4 AS BIGINT) * (b.y_e4 - a.y_e4))")
    r0 = f"CAST(FLOOR(SQRT(CAST({d2} AS DOUBLE))) AS BIGINT)"
    return f"""
WITH raw AS (
  SELECT CAST(event_id AS UBIGINT) AS eid,
         CAST(event_id % {N_SHAPES} AS UBIGINT) AS sidu,
         CAST(event_id % {N_SHAPES} AS BIGINT) AS shape_id,
         CAST(event_id // {N_SHAPES} AS BIGINT) AS seq
  FROM events WHERE event_id // {N_SHAPES} < {SHAPE_PTS}
),
pts AS MATERIALIZED (
  SELECT shape_id, seq,
         ({base_x}) - 1700000 + ({wx}) - 5000 AS x_e4,
         ({base_y}) - 600000 + ({wy}) - 5000 AS y_e4
  FROM raw
),
seg AS (
  SELECT a.shape_id,
         {r0} - CASE WHEN {r0} * {r0} > {d2} THEN 1 ELSE 0 END
              + CASE WHEN ({r0} + 1) * ({r0} + 1) <= {d2} THEN 1 ELSE 0 END
           AS seg_len
  FROM pts a JOIN pts b ON b.shape_id = a.shape_id AND b.seq = a.seq + 1
)
SELECT shape_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(seg_len) AS BIGINT) AS len_e4
FROM seg GROUP BY shape_id ORDER BY shape_id
"""


# --------------------------------------------------------------------------
# Hotspot detection: non-maximum suppression over the density grid
# --------------------------------------------------------------------------
# A cell is a hotspot iff its GEO-ENTITY count is >= HOT_MIN and no
# cell of its 8-neighborhood (lon wraps, lat clamps — off-grid
# neighbors hold 0) beats it, where "beats" is the deterministic
# lexicographic order (n, lower cell id wins ties) — plateau ties
# can't yield two adjacent hotspots. Entities (the flagship's
# hot-centered page positions, sources/pages._entity_latlon) actually
# CLUSTER, so the NMS has real peaks to find — the event stream is
# uniform by construction and would be vacuous here.
#
# Plans: 'local' densifies the bounded grid once and compares 8
# shifted (value, id) views; 'shuffle' emits each cell's (n, id) to
# its 9 neighbor targets and resolves per target in ONE bounded
# groupby — the grid-too-fine-to-densify path. Corpus is touched by
# exactly one shuffle (the per-cell count groupby).

HOT_MIN = 5


def _entity_cell_counts(sf_dir: str):
    """(cell_rm, n): per-grid-cell count of synthesized geo entities
    (same fan / position streams as the flagship + its SQL oracle)."""
    from osm2gtfs_ray.sources import pages as pg
    from osm2gtfs_ray.sources.pages import _flat_ranges, _uint

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n_ent = _uint(did, 3, 42, 4)
        d = np.repeat(did, n_ent)
        j = _flat_ranges(n_ent).astype(np.uint64)
        eidx = d * np.uint64(8) + j
        lat, lon = pg._entity_latlon(eidx, 42)
        lat, lon = np.round(lat, 6), np.round(lon, 6)
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        g = (
            pa.table({"cell_rm": iy * nx + ix})
            .group_by("cell_rm")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell_rm", "partial"])

    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    return bounded_key_sum(
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        "cell_rm", ["partial"],
        driver=_n_rows(sf_dir, "documents") <= _GRID_DRIVER_ROWS,
        out_names=["n"],
    )


def q_hotspots(sf_dir: str, plan: str = "local"):
    """(cell_rm, n) for every NMS-surviving density peak."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    counts = _entity_cell_counts(sf_dir)  # one corpus shuffle

    if plan == "local":

        def nms(t: pa.Table) -> pa.Table:
            key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
            n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
            grid = np.zeros((ny, nx), dtype=np.int64)
            grid[key // nx, key % nx] = n
            cid = (np.arange(ny)[:, None] * nx + np.arange(nx)[None, :]).astype(
                np.int64
            )
            beaten = np.zeros((ny, nx), dtype=bool)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    nbv = np.zeros_like(grid)
                    nbi = np.full((ny, nx), np.int64(1) << 60)
                    src_v = np.roll(grid, -dx, axis=1)
                    src_i = np.roll(cid, -dx, axis=1)
                    if dy < 0:
                        nbv[1:], nbi[1:] = src_v[:-1], src_i[:-1]
                    elif dy > 0:
                        nbv[:-1], nbi[:-1] = src_v[1:], src_i[1:]
                    else:
                        nbv, nbi = src_v, src_i
                    beaten |= (nbv > grid) | ((nbv == grid) & (nbi < cid))
            hot = (grid >= HOT_MIN) & ~beaten
            iy, ix = np.nonzero(hot)
            return pa.table(
                {"cell_rm": iy * nx + ix, "n": grid[iy, ix]}
            )

        return counts.repartition(1).map_batches(
            nms, batch_format="pyarrow", batch_size=None
        )

    # shuffle plan: every cell sends (n, id) to its 9 targets
    def emit(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
        iy, ix = key // nx, key % nx
        tk, sv, si, ctr = [], [], [], []
        for dy in (-1, 0, 1):
            ok = (iy + dy >= 0) & (iy + dy < ny)
            for dx in (-1, 0, 1):
                tgt = (iy[ok] + dy) * nx + (ix[ok] + dx + nx) % nx
                tk.append(tgt)
                sv.append(n[ok])
                si.append(key[ok])
                ctr.append(
                    np.full(ok.sum(), dy == 0 and dx == 0, dtype=bool)
                )
        return pa.table(
            {
                "tgt": np.concatenate(tk),
                "v": np.concatenate(sv),
                "src": np.concatenate(si),
                "is_center": np.concatenate(ctr),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        c = g[g["is_center"] & (g["tgt"] == g["src"])]
        nb = g[~g["is_center"]]
        cv = c.set_index("tgt")["v"]
        m = nb.merge(cv.rename("cv"), left_on="tgt", right_index=True)
        beat = (m["v"] > m["cv"]) | ((m["v"] == m["cv"]) & (m["src"] < m["tgt"]))
        beaten = set(m.loc[beat, "tgt"].to_numpy())
        keep = c[(c["v"] >= HOT_MIN) & ~c["tgt"].isin(beaten)]
        return pd.DataFrame(
            {
                "cell_rm": keep["tgt"].to_numpy(np.int64),
                "n": keep["v"].to_numpy(np.int64),
            }
        )

    return sharded_map_groups(
        counts.map_batches(emit, batch_format="pyarrow"), "tgt", resolve
    )


SQL_HOTSPOTS_TEMPLATE = """
WITH {entities},
c AS MATERIALIZED (
  SELECT LEAST(CAST(FLOOR(((p.lat + 90.0) / 180.0) * 128) AS BIGINT), 127) AS iy,
         LEAST(CAST(FLOOR(((p.lon + 180.0) / 360.0) * 256) AS BIGINT), 255) AS ix,
         COUNT(*) AS n
  FROM pts p GROUP BY 1, 2
),
o(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1))
SELECT c.iy * 256 + c.ix AS cell_rm, CAST(c.n AS BIGINT) AS n
FROM c
WHERE c.n >= {hot_min} AND NOT EXISTS (
  SELECT 1 FROM o JOIN c nb
    ON nb.iy = c.iy + o.dy
   AND nb.ix = (c.ix + o.dx + 256) % 256
  WHERE nb.n > c.n
     OR (nb.n = c.n AND nb.iy * 256 + nb.ix < c.iy * 256 + c.ix)
)
ORDER BY cell_rm
"""


def sql_hotspots() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _entity_ctes

    return SQL_HOTSPOTS_TEMPLATE.format(
        entities=_entity_ctes(), hot_min=HOT_MIN
    )


# --------------------------------------------------------------------------
# Grid-density clustering (DBSCAN-lite): connected components of core
# cells under 8-adjacency
# --------------------------------------------------------------------------
# Core cells = grid cells holding >= CLUSTER_MINPTS entities; clusters
# = 8-connected components of core cells (lon wraps, lat clamps), the
# grid formulation of density clustering (each cluster labeled by its
# min cell id — deterministic). Reference analogue: the reference's
# greedy 500 m stop clustering (ops/cluster.py, G5) is the pointwise
# version; this is the raster version that scales to planetary grids.
#
# Scale plan: ONE corpus shuffle (entity cell counts); the core-cell
# table is bounded by the GRID (32768 cells at level 8), never the
# corpus, so the 9-target adjacency emit + per-target shard resolve +
# ops/components CC all run on bounded data no matter the input size.

CLUSTER_MINPTS = 2


def q_grid_clusters(sf_dir: str):
    """(cell_rm, cluster_id, n) per core cell; cluster_id = min cell
    of its 8-connected core component."""
    import pandas as pd

    from osm2gtfs_ray.ops.components import connected_components
    from osm2gtfs_ray.ops.joins import broadcast_join
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    core = _entity_cell_counts(sf_dir).filter(
        expr=f"n >= {CLUSTER_MINPTS}"
    ).materialize()  # bounded by the grid; reused by CC + final join

    def emit(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        iy, ix = key // nx, key % nx
        tk, sk = [], []
        for dy in (-1, 0, 1):
            ok = (iy + dy >= 0) & (iy + dy < ny)
            for dx in (-1, 0, 1):
                tk.append((iy[ok] + dy) * nx + (ix[ok] + dx + nx) % nx)
                sk.append(key[ok])
        return pa.table({"tgt": np.concatenate(tk), "src": np.concatenate(sk)})

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # a (tgt, src) row is an adjacency edge iff tgt is itself core;
        # the (0,0) self-emission marks exactly the core targets
        is_core = set(g.loc[g["tgt"] == g["src"], "tgt"].to_numpy())
        keep = g[g["tgt"].isin(is_core)]
        return pd.DataFrame(
            {"a": keep["tgt"].to_numpy(np.int64),
             "b": keep["src"].to_numpy(np.int64)}
        )

    pairs = sharded_map_groups(
        core.map_batches(emit, batch_format="pyarrow"), "tgt", resolve
    )
    labels = connected_components(pairs)

    out = broadcast_join(
        labels.map_batches(
            lambda t: pa.table(
                {
                    "cell_rm": pc.cast(t["node"], pa.int64()),
                    "cluster_id": pc.cast(t["component"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        core,  # grid-bounded small side
        "cell_rm",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "cell_rm": pc.cast(t["cell_rm"], pa.int64()),
                "cluster_id": pc.cast(t["cluster_id"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_GRID_CLUSTERS_TEMPLATE = """
WITH RECURSIVE {entities},
c AS MATERIALIZED (
  SELECT LEAST(CAST(FLOOR(((p.lat + 90.0) / 180.0) * 128) AS BIGINT), 127) AS iy,
         LEAST(CAST(FLOOR(((p.lon + 180.0) / 360.0) * 256) AS BIGINT), 255) AS ix,
         COUNT(*) AS n
  FROM pts p GROUP BY 1, 2
),
core AS MATERIALIZED (
  SELECT iy * 256 + ix AS cell, iy, ix, n FROM c WHERE n >= {minpts}
),
o(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
adj AS MATERIALIZED (
  SELECT a.cell AS a, b.cell AS b
  FROM core a JOIN o ON TRUE
  JOIN core b ON b.iy = a.iy + o.dy AND b.ix = (a.ix + o.dx + 256) % 256
),
reach(node, m) AS (
  SELECT a, b FROM adj
  UNION
  SELECT r.node, s.b FROM reach r JOIN adj s ON r.m = s.a
)
SELECT r.node AS cell_rm, CAST(MIN(r.m) AS BIGINT) AS cluster_id,
       CAST(core.n AS BIGINT) AS n
FROM reach r JOIN core ON core.cell = r.node
GROUP BY r.node, core.n ORDER BY cell_rm
"""


def sql_grid_clusters() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _entity_ctes

    return SQL_GRID_CLUSTERS_TEMPLATE.format(
        entities=_entity_ctes(), minpts=CLUSTER_MINPTS
    )


# --------------------------------------------------------------------------
# Per-tile crawl delta: incremental tile maintenance between snapshots
# --------------------------------------------------------------------------
# The web-delta x geo-tile composition: for every density cell, how
# many geo entities belong to crawl snapshot A vs snapshot B (the
# SAME membership streams web_queries.crawl_delta diffs doc-by-doc),
# i.e. which map tiles need re-rendering after an incremental
# recrawl. One corpus pass computes both memberships per entity; the
# single shuffle is the bounded per-cell groupby; cells untouched by
# either snapshot emit nothing.

def q_tile_delta(sf_dir: str):
    """(cell_rm, n_a, n_b) per cell occupied by either snapshot."""
    from osm2gtfs_ray.pipelines.web_queries import _S_IN_A, _S_IN_B
    from osm2gtfs_ray.sources import pages as pg
    from osm2gtfs_ray.sources.pages import _flat_ranges, _uint

    nx, ny = 1 << CELL_LEVEL, 1 << (CELL_LEVEL - 1)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        in_a = (_uint(did, _S_IN_A, 42, 10) != 0).astype(np.int64)
        in_b = (_uint(did, _S_IN_B, 42, 10) != 0).astype(np.int64)
        n_ent = _uint(did, 3, 42, 4)
        d = np.repeat(did, n_ent)
        a = np.repeat(in_a, n_ent)
        b = np.repeat(in_b, n_ent)
        j = _flat_ranges(n_ent).astype(np.uint64)
        eidx = d * np.uint64(8) + j
        lat, lon = pg._entity_latlon(eidx, 42)
        lat, lon = np.round(lat, 6), np.round(lon, 6)
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        g = (
            pa.table({"cell_rm": iy * nx + ix, "a": a, "b": b})
            .group_by("cell_rm")
            .aggregate([("a", "sum"), ("b", "sum")])
        )
        return g.rename_columns(["cell_rm", "pa_", "pb_"])

    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    agg = bounded_key_sum(
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        "cell_rm", ["pa_", "pb_"],
        driver=_n_rows(sf_dir, "documents") <= _GRID_DRIVER_ROWS,
        out_names=["n_a", "n_b"],
    )

    def finish(t: pa.Table) -> pa.Table:
        na = pc.cast(t["n_a"], pa.int64())
        nb = pc.cast(t["n_b"], pa.int64())
        keep = pc.or_(pc.not_equal(na, 0), pc.not_equal(nb, 0))
        out = pa.table(
            {"cell_rm": pc.cast(t["cell_rm"], pa.int64()), "n_a": na, "n_b": nb}
        ).filter(keep)
        return out

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_TILE_DELTA_TEMPLATE = """
WITH {entities},
m AS (SELECT did,
             ({in_a}) <> 0 AS in_a,
             ({in_b}) <> 0 AS in_b
      FROM docs),
c AS (
  SELECT LEAST(CAST(FLOOR(((p.lat + 90.0) / 180.0) * 128) AS BIGINT), 127) AS iy,
         LEAST(CAST(FLOOR(((p.lon + 180.0) / 360.0) * 256) AS BIGINT), 255) AS ix,
         CAST(SUM(CASE WHEN m.in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN m.in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM pts p JOIN m ON m.did = p.did
  GROUP BY 1, 2
)
SELECT iy * 256 + ix AS cell_rm, n_a, n_b
FROM c WHERE n_a <> 0 OR n_b <> 0
ORDER BY cell_rm
"""


def sql_tile_delta() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _entity_ctes, _s_uint
    from osm2gtfs_ray.pipelines.web_queries import _S_IN_A, _S_IN_B

    return SQL_TILE_DELTA_TEMPLATE.format(
        entities=_entity_ctes(),
        in_a=_s_uint("did", _S_IN_A, 10),
        in_b=_s_uint("did", _S_IN_B, 10),
    )


# --------------------------------------------------------------------------
# Origin-destination cell flows: per-user consecutive event transitions
# --------------------------------------------------------------------------
# The mobility-analytics OD matrix: order each user's events by
# (ts, event_id), pair consecutive positions, and count transitions
# between coarse grid cells (OD_LEVEL = 5: 32x16 — the flow-map zoom).
# Reference analogue: consecutive stops of an itinerary ARE the
# reference's OD pairs (stop_times sequencing); this is the same
# sequencing semantic over user event streams at corpus scale.
#
# Scale plan: ONE user-hash shuffle co-locates each user's events;
# pairing is the sessionize adjacency mask (vectorized, no per-row
# Python); per-shard partial counts shrink the output to the bounded
# (from, to) key space before the driver/groupby merge.

OD_LEVEL = 5


def q_od_flows(sf_dir: str):
    """(cell_from, cell_to, n): consecutive-event cell transitions."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import bounded_key_sum, sharded_map_groups

    nx, ny = 1 << OD_LEVEL, 1 << (OD_LEVEL - 1)
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def cells_of(eid: np.ndarray) -> np.ndarray:
        lat, lon = _synth_latlon(eid)
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        return iy * nx + ix

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        i = np.flatnonzero(same)
        c = cells_of(eid)
        out = pd.DataFrame({"cell_from": c[i], "cell_to": c[i + 1],
                            "p": np.ones(len(i), dtype=np.int64)})
        return out.groupby(["cell_from", "cell_to"], sort=False,
                           as_index=False)["p"].sum()

    parts = sharded_map_groups(ev, "user_id", pairs)
    return bounded_key_sum(
        parts, ["cell_from", "cell_to"], ["p"],
        driver=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
        out_names=["n"],
    )


SQL_OD_FLOWS = f"""
WITH e AS (
  SELECT user_id, event_id,
         LAG(event_id) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_id
  FROM events
),
p AS (
  SELECT CAST(prev_id AS BIGINT) AS a, CAST(event_id AS BIGINT) AS b
  FROM e WHERE prev_id IS NOT NULL
),
c AS (
  SELECT
    LEAST(CAST(FLOOR(((({_LAT_SQL.format(k='a')}) + 90.0) / 180.0) * 16) AS BIGINT), 15)
      * 32
    + LEAST(CAST(FLOOR(((({_LON_SQL.format(k='a')}) + 180.0) / 360.0) * 32) AS BIGINT), 31)
      AS cell_from,
    LEAST(CAST(FLOOR(((({_LAT_SQL.format(k='b')}) + 90.0) / 180.0) * 16) AS BIGINT), 15)
      * 32
    + LEAST(CAST(FLOOR(((({_LON_SQL.format(k='b')}) + 180.0) / 360.0) * 32) AS BIGINT), 31)
      AS cell_to
  FROM p
)
SELECT cell_from, cell_to, CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY cell_from, cell_to ORDER BY cell_from, cell_to
"""


# --------------------------------------------------------------------------
# Stay-point (dwell) detection over user trajectories
# --------------------------------------------------------------------------
# The classic trajectory-mining primitive (Li et al., "Mining user
# similarity based on location history", ACM GIS 2008): scan each
# user's time-ordered points with a greedy anchor — a stay point is a
# maximal run of consecutive points all within distance R of the run's
# FIRST point, lasting >= MIN_PTS points; the first point that breaks
# R becomes the next run's anchor. The reference's stop-clustering
# (ops/cluster.py greedy 500 m, osm2gtfs stops merging) is the spatial
# half; this adds the temporal-order half.
#
# Determinism/exactness: positions are a synthetic per-user walk in
# integer e4 units (splitmix-derived, 3/4 small dwell steps <= 20,
# 1/4 travel jumps <= 400 — so real dwell runs exist), the stay test
# is integer Chebyshev (max(|dx|,|dy|) <= R, no sqrt), and centroids
# are floor-divided integer sums (positions are offset strictly
# positive so numpy floor == DuckDB truncating //). The oracle replays
# the greedy scan as a RECURSIVE CTE carrying (user, seq, anchor) —
# depth = max points per user (<= ~100 at every test sf; a corpus
# with million-point trajectories caps oracle depth, not the engine).
#
# Scale shape: ONE user-hash shuffle (sessionize's shape), then every
# user's seq-numbering, walk synthesis and greedy scan run vectorized
# inside its shard; the per-user anchor loop iterates once per RUN,
# not per point. Output is stays only — corpus-sized input, bounded
# output per user.

STAY_R = 100        # Chebyshev radius, e4 units (~11 m at the equator)
STAY_MIN_PTS = 4
_ST_X0, _ST_Y0, _ST_MODE = 280, 281, 282
_ST_DXS, _ST_DYS, _ST_DXL, _ST_DYL = 283, 284, 285, 286
_ST_OFF = 10_000_000  # keeps every coordinate strictly positive
_ST_KMUL = 1_000_003  # step key: user_id * KMUL + seq


def q_stay_points(sf_dir: str):
    """(user_id, start_seq, n_pts, cx_e4, cy_e4) per detected stay."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _uint

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def stays_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lengths = np.diff(np.r_[starts, n])
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths) + 1

        k = uid.astype(np.uint64) * np.uint64(_ST_KMUL) + seq.astype(np.uint64)
        uk = uid.astype(np.uint64)
        dwell = _uint(k, _ST_MODE, 42, 4) > 0
        dx = np.where(dwell, _uint(k, _ST_DXS, 42, 41) - 20,
                      _uint(k, _ST_DXL, 42, 801) - 400)
        dy = np.where(dwell, _uint(k, _ST_DYS, 42, 41) - 20,
                      _uint(k, _ST_DYL, 42, 801) - 400)
        first = seq == 1
        dx[first] = 0
        dy[first] = 0
        # per-user cumsum: global cumsum minus the pre-segment base
        cx, cy = np.cumsum(dx), np.cumsum(dy)
        x = (_ST_OFF + _uint(uk, _ST_X0, 42, 2_000_000)
             + cx - np.repeat(cx[starts] - dx[starts], lengths))
        y = (_ST_OFF + _uint(uk, _ST_Y0, 42, 2_000_000)
             + cy - np.repeat(cy[starts] - dy[starts], lengths))

        rows: list[tuple[int, int, int, int, int]] = []
        for s, ln in zip(starts, lengths):
            xs, ys = x[s:s + ln], y[s:s + ln]
            a = 0
            while a < ln:
                brk = (np.abs(xs[a:] - xs[a]) > STAY_R) | (
                    np.abs(ys[a:] - ys[a]) > STAY_R
                )
                j = int(np.argmax(brk))
                run = j if brk[j] else ln - a  # brk[0] is always False
                if run >= STAY_MIN_PTS:
                    rows.append(
                        (
                            int(uid[s]), a + 1, run,
                            int(xs[a:a + run].sum()) // run,
                            int(ys[a:a + run].sum()) // run,
                        )
                    )
                a += run
        return pd.DataFrame(
            rows, columns=["user_id", "start_seq", "n_pts", "cx_e4", "cy_e4"]
        ).astype(np.int64)

    return sharded_map_groups(ev, "user_id", stays_shard)


def sql_stay_points() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    kx = "CAST(user_id * 1000003 + seq AS UBIGINT)"
    uk = "CAST(user_id AS UBIGINT)"
    return f"""
WITH RECURSIVE seqd AS (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS BIGINT) AS seq
  FROM events
),
steps AS (
  SELECT user_id, seq,
         CASE WHEN seq = 1 THEN 0
              WHEN ({_s_uint(kx, _ST_MODE, 4)}) > 0
                THEN ({_s_uint(kx, _ST_DXS, 41)}) - 20
              ELSE ({_s_uint(kx, _ST_DXL, 801)}) - 400 END AS dx,
         CASE WHEN seq = 1 THEN 0
              WHEN ({_s_uint(kx, _ST_MODE, 4)}) > 0
                THEN ({_s_uint(kx, _ST_DYS, 41)}) - 20
              ELSE ({_s_uint(kx, _ST_DYL, 801)}) - 400 END AS dy,
         {_ST_OFF} + ({_s_uint(uk, _ST_X0, 2_000_000)}) AS x0,
         {_ST_OFF} + ({_s_uint(uk, _ST_Y0, 2_000_000)}) AS y0
  FROM seqd
),
pts AS MATERIALIZED (
  SELECT user_id, seq,
         x0 + SUM(dx) OVER (PARTITION BY user_id ORDER BY seq
                            ROWS UNBOUNDED PRECEDING) AS x,
         y0 + SUM(dy) OVER (PARTITION BY user_id ORDER BY seq
                            ROWS UNBOUNDED PRECEDING) AS y
  FROM steps
),
rec(user_id, seq, anchor) AS (
  SELECT user_id, CAST(1 AS BIGINT), CAST(1 AS BIGINT) FROM pts WHERE seq = 1
  UNION ALL
  SELECT r.user_id, p.seq,
         CASE WHEN GREATEST(ABS(p.x - a.x), ABS(p.y - a.y)) > {STAY_R}
              THEN p.seq ELSE r.anchor END
  FROM rec r
  JOIN pts p ON p.user_id = r.user_id AND p.seq = r.seq + 1
  JOIN pts a ON a.user_id = r.user_id AND a.seq = r.anchor
)
SELECT r.user_id, CAST(r.anchor AS BIGINT) AS start_seq,
       CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(SUM(p.x) // COUNT(*) AS BIGINT) AS cx_e4,
       CAST(SUM(p.y) // COUNT(*) AS BIGINT) AS cy_e4
FROM rec r JOIN pts p ON p.user_id = r.user_id AND p.seq = r.seq
GROUP BY r.user_id, r.anchor
HAVING COUNT(*) >= {STAY_MIN_PTS}
ORDER BY r.user_id, start_seq
"""


# --------------------------------------------------------------------------
# Co-traveler detection (repeated spatio-temporal co-location)
# --------------------------------------------------------------------------
# The standard co-location / co-traveler primitive from trajectory
# mining: two users are co-travelers if they occupy the same grid cell
# in the same hour bucket at least CT_MIN_SHARED DISTINCT times. It is
# the pairwise counterpart of q_stay_points (dwell on one trajectory)
# and of the reference's stop clustering (ops/cluster.py greedy merge:
# spatial proximity only) — here proximity must REPEAT across time to
# count, which is what separates co-travel from coincidence.
#
# Synthetic presence (deterministic, splitmix-derived, both sides
# expression-identical): each (user, hour-of-event) is at the user's
# HOME cell 3/4 of the time, else at that hour's global VENUE cell —
# so repeated pairs arise both from shared home cells and from
# co-attendance at venues. Hour bucket = epoch_us // 3.6e9 (exact
# integer on both sides; SQL uses epoch_us(), never double epoch()).
#
# Scale shape: per-batch dedupe of (user, cell, hour) presence rows →
# ONE shuffle keyed by (cell, hour) bucket hash → per-bucket pair
# emission (np.triu_indices over the bucket's distinct users, one
# vectorized call per bucket) → second pair-hash-sharded sum with a
# map-side combine → threshold filter. Pair emission is quadratic in
# BUCKET occupancy only — the grid resolution bounds it (CT_MAX_BUCKET
# guard raises rather than silently emitting O(L^2) rows; at 100 TB
# raise CT_CELLS so occupancy stays bounded, exactly like the
# co-citation per-target cap in graph_queries.py).

_CT_MODE, _CT_HOME, _CT_VEN = 290, 291, 292
CT_CELLS = 16
CT_MIN_SHARED = 4
CT_MAX_BUCKET = 4096  # per-(cell,hour) occupancy guard (pairs <= ~8.4M)
_CT_KMUL = 1_000_003  # > max hour bucket (~474k for 2024 hours)
_CT_HOUR_US = 3_600_000_000


def q_co_travelers(sf_dir: str):
    """(user_a, user_b, n_shared) for pairs sharing >= CT_MIN_SHARED
    distinct (cell, hour) presence buckets."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _uint

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def presence(b: pd.DataFrame) -> pd.DataFrame:
        uid = b["user_id"].to_numpy(np.int64)
        hourb = b["ts"].to_numpy("datetime64[us]").astype(np.int64) // _CT_HOUR_US
        k = (uid * _CT_KMUL + hourb).astype(np.uint64)
        traveling = _uint(k, _CT_MODE, 42, 4) == 0
        cell = np.where(
            traveling,
            _uint(hourb.astype(np.uint64), _CT_VEN, 42, CT_CELLS),
            _uint(uid.astype(np.uint64), _CT_HOME, 42, CT_CELLS),
        )
        out = pd.DataFrame({"user_id": uid, "hourb": hourb, "cell": cell})
        return out.drop_duplicates()  # map-side combine: presence is a set

    def pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        g = g.sort_values(["cell", "hourb", "user_id"], kind="mergesort")
        cells = g["cell"].to_numpy(np.int64)
        hrs = g["hourb"].to_numpy(np.int64)
        us = g["user_id"].to_numpy(np.int64)
        gk = cells * (1 << 32) + hrs
        starts = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1]])
        lengths = np.diff(np.r_[starts, len(g)])
        if lengths.size and int(lengths.max()) > CT_MAX_BUCKET:
            raise ValueError(
                f"bucket occupancy {int(lengths.max())} > {CT_MAX_BUCKET}; "
                "raise CT_CELLS to keep pair emission bounded"
            )
        a_parts, b_parts = [], []
        for s, ln in zip(starts, lengths):  # one vectorized call per BUCKET
            if ln < 2:
                continue
            ia, ib = np.triu_indices(int(ln), k=1)
            a_parts.append(us[s + ia])
            b_parts.append(us[s + ib])
        if not a_parts:
            return pd.DataFrame(
                {"user_a": pd.Series([], dtype=np.int64),
                 "user_b": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        out = pd.DataFrame(
            {"user_a": np.concatenate(a_parts), "user_b": np.concatenate(b_parts)}
        )
        # each bucket contributes ONE distinct co-occurrence per pair
        return out.groupby(["user_a", "user_b"], as_index=False).agg(
            n=("user_b", "size")
        )

    def sum_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_a", "user_b"], as_index=False)["n"].sum()
        g = g[g["n"] >= CT_MIN_SHARED]
        return g.rename(columns={"n": "n_shared"}).astype(np.int64)

    pres = ev.map_batches(presence, batch_format="pandas")
    pairs = sharded_map_groups(pres, ["cell", "hourb"], pairs_shard)
    return sharded_map_groups(pairs, ["user_a", "user_b"], sum_shard)


def sql_co_travelers() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    kx = f"CAST(user_id * {_CT_KMUL} + hourb AS UBIGINT)"
    hx = "CAST(hourb AS UBIGINT)"
    ux = "CAST(user_id AS UBIGINT)"
    return f"""
WITH pres AS (
  SELECT DISTINCT user_id, hourb,
         CASE WHEN ({_s_uint(kx, _CT_MODE, 4)}) = 0
              THEN ({_s_uint(hx, _CT_VEN, CT_CELLS)})
              ELSE ({_s_uint(ux, _CT_HOME, CT_CELLS)}) END AS cell
  FROM (SELECT user_id, epoch_us(ts) // {_CT_HOUR_US} AS hourb FROM events)
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pres a
JOIN pres b ON a.cell = b.cell AND a.hourb = b.hourb
           AND a.user_id < b.user_id
GROUP BY 1, 2
HAVING COUNT(*) >= {CT_MIN_SHARED}
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Radius of gyration per user — the classic mobility-range metric
# --------------------------------------------------------------------------
# rog(u) = sqrt( (1/n) * sum_i |r_i - r_mean|^2 ) over user u's event
# positions (Gonzalez et al. 2008, "Understanding individual human
# mobility patterns"). Exact integer form on the e2 planar grid
# (lat_e2/lon_e2 are integers by construction of _synth_latlon):
#
#   num   = n * sum(x^2 + y^2) - (sum x)^2 - (sum y)^2   (= n^2 * rog^2)
#   rog_fp = isqrt( num * 10^8 // n^2 )                  (rog_e2 * 10^4)
#
# One user-hash shuffle (sharded_map_groups) with a vectorized int64
# per-shard group reduce; the per-user finalize (num, floor-div,
# isqrt) runs with PYTHON BIG INTS over the shard's own user rows —
# n * sq wraps int64 past ~150k max-spread events per user, and the
# output cardinality IS the user count, so the O(users-in-shard)
# big-int pass is the work any engine must do (the q_median_user_value
# / q_type_lift finalize discipline). math.isqrt is exact; the SQL
# oracle uses HUGEINT + the float-seeded ±1-corrected isqrt idiom
# (sql_shape_length — seed error ≪ 1 for num*1e8 ≲ 1e21, so the ±1
# window holds).
#
# Reference semantics analogue: the stop-clustering radius rule
# (/root/reference/osm2gtfs/core/osm_connector.py greedy 500 m merge,
# ops/cluster.py here) measures spatial spread per name group; rog is
# the per-entity generalization over trajectories.

ROG_SCALE = 10**8  # (1e4)^2 — four fixed-point digits on the e2 grid


def q_radius_gyration(sf_dir: str):
    """(user_id, n_events, rog_fp): exact integer radius of gyration
    of each user's synthetic event positions; rog_fp = floor(rog_e2 *
    10^4) with rog_e2 in centidegree planar units."""
    import math

    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def local_pre(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy(np.int64)
        x = (eid * 104729) % 36000 - 18000
        y = (eid * 7919) % 18000 - 9000
        part = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "n": np.ones(len(g), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sq": x * x + y * y,
            }
        )
        return part.groupby("user_id", sort=False, as_index=False).sum()

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", sort=False, as_index=False).sum()
        rog = [
            math.isqrt(
                ((int(n) * int(sq) - int(sx) ** 2 - int(sy) ** 2) * ROG_SCALE)
                // (int(n) * int(n))
            )
            for n, sx, sy, sq in zip(a["n"], a["sx"], a["sy"], a["sq"])
        ]
        return pd.DataFrame(
            {
                "user_id": a["user_id"].astype(np.int64),
                "n_events": a["n"].astype(np.int64),
                "rog_fp": pd.Series(rog, dtype=np.int64),
            }
        )

    return sharded_map_groups(ev, "user_id", finalize, local_pre=local_pre)


def sql_radius_gyration() -> str:
    num = "(n * sq - sx * sx - sy * sy)"
    v = f"(({num} * {ROG_SCALE}) // (n * n))"
    r0 = f"CAST(FLOOR(SQRT(CAST({v} AS DOUBLE))) AS HUGEINT)"
    return f"""
WITH pos AS (
  SELECT user_id,
         CAST((event_id * 104729) % 36000 - 18000 AS HUGEINT) AS x,
         CAST((event_id * 7919) % 18000 - 9000 AS HUGEINT) AS y
  FROM events
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x + y * y) AS sq
  FROM pos GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST({r0} - CASE WHEN {r0} * {r0} > {v} THEN 1 ELSE 0 END
                 + CASE WHEN ({r0} + 1) * ({r0} + 1) <= {v} THEN 1 ELSE 0 END
            AS BIGINT) AS rog_fp
FROM agg ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Hierarchical cell-set compaction (H3 `compact` analogue)
# --------------------------------------------------------------------------
# Given the set of occupied fine cells, replace every COMPLETE 4x4
# sibling block with its parent cell two levels up (the Morton-prefix
# parent relation of geo/cells.py parent_cell(steps=2), row-major here
# so the oracle can express it). This is the index-size reducer every
# hierarchical tile store runs before serving coverage sets — H3's
# compactCells, S2's CellUnion.Normalize.
#
# Scale shape: ONE corpus shuffle to the distinct fine-cell set
# (bounded by the grid, <= nx*ny rows), then compaction keyed by
# parent. Both plans implemented (cell_smooth discipline): `local`
# compacts the bounded grid table in one pass; `shuffle` re-keys by
# parent hash (sharded_map_groups) so no single process ever holds the
# full cell set — the plan a deeper pyramid (res-15 grids, billions of
# cells) requires. Plan equivalence is pytested.
#
# Reference semantics analogue: osm2gtfs renders per-zoom stop/route
# maps (stops_creator per-map grouping); compaction is the coverage-
# set normalization a tile service applies before publishing.

CPT_LEVEL = 7          # fine grid: nx=128, ny=64
CPT_STEP = 2           # parent two levels up -> 4x4 = 16 children


def _occupied_cells(sf_dir: str, level: int):
    """Distinct occupied row-major cells of `events` at `level` (one
    corpus pass; bounded-key merge gated like _smooth_counts)."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    nx, ny = 1 << level, 1 << (level - 1)
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def f(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["event_id"].to_numpy())
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        cells = np.unique(iy * nx + ix)  # map-side combine: presence is a set
        return pa.table({"cell_rm": cells, "partial": np.ones(len(cells), np.int64)})

    return bounded_key_sum(
        ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True),
        "cell_rm", ["partial"],
        driver=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
        out_names=["n"],
    )


def q_cell_compact(sf_dir: str, plan: str = "local"):
    """(level, cell_rm): compacted cover of the occupied fine cells —
    parent rows (level CPT_LEVEL-2) where all 16 children are
    occupied, fine rows (level CPT_LEVEL) elsewhere."""
    import pandas as pd

    nx = 1 << CPT_LEVEL
    pnx = nx >> CPT_STEP
    occ = _occupied_cells(sf_dir, CPT_LEVEL)

    def compact_pd(g: pd.DataFrame) -> pd.DataFrame:
        key = g["cell_rm"].to_numpy(np.int64)
        iy, ix = key // nx, key % nx
        pk = (iy >> CPT_STEP) * pnx + (ix >> CPT_STEP)
        order = np.argsort(pk, kind="stable")
        pk, key = pk[order], key[order]
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        counts = np.diff(np.r_[starts, len(pk)])
        full = counts == (1 << CPT_STEP) ** 2
        out_lvl = [np.full(int(full.sum()), CPT_LEVEL - CPT_STEP, np.int64)]
        out_key = [pk[starts[full]]]
        keep = np.repeat(~full, counts)
        out_lvl.append(np.full(int(keep.sum()), CPT_LEVEL, np.int64))
        out_key.append(key[keep])
        return pd.DataFrame(
            {"level": np.concatenate(out_lvl), "cell_rm": np.concatenate(out_key)}
        )

    if plan == "local":
        def compact(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(
                compact_pd(t.select(["cell_rm"]).to_pandas()), preserve_index=False
            )

        return occ.repartition(1).map_batches(
            compact, batch_format="pyarrow", batch_size=None
        )

    # shuffle plan: parent-hash sharding co-locates every sibling set
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    def add_parent(b: pd.DataFrame) -> pd.DataFrame:
        key = b["cell_rm"].to_numpy(np.int64)
        iy, ix = key // nx, key % nx
        return pd.DataFrame(
            {"cell_rm": key,
             "parent": (iy >> CPT_STEP) * pnx + (ix >> CPT_STEP)}
        )

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        return compact_pd(g[["cell_rm"]])

    return sharded_map_groups(occ, "parent", shard, local_pre=add_parent)


def _sql_fine_cells(level: int) -> str:
    nx, ny = 1 << level, 1 << (level - 1)
    return f"""
  SELECT DISTINCT
         LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * {ny}) AS BIGINT), {ny - 1}) AS iy,
         LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * {nx}) AS BIGINT), {nx - 1}) AS ix
  FROM (
    SELECT {_LAT_SQL.format(k='event_id')} AS lat,
           {_LON_SQL.format(k='event_id')} AS lon
    FROM events
  )"""


def sql_cell_compact() -> str:
    nx = 1 << CPT_LEVEL
    pnx = nx >> CPT_STEP
    kids = (1 << CPT_STEP) ** 2
    return f"""
WITH f AS ({_sql_fine_cells(CPT_LEVEL)}),
p AS (
  SELECT iy // 4 AS py, ix // 4 AS px, COUNT(*) AS c
  FROM f GROUP BY 1, 2
)
SELECT CAST({CPT_LEVEL - CPT_STEP} AS BIGINT) AS level,
       py * {pnx} + px AS cell_rm
FROM p WHERE c = {kids}
UNION ALL
SELECT CAST({CPT_LEVEL} AS BIGINT), f.iy * {nx} + f.ix
FROM f JOIN p ON f.iy // 4 = p.py AND f.ix // 4 = p.px
WHERE p.c < {kids}
"""


# --------------------------------------------------------------------------
# Morphological cell-set dilation (grid buffer)
# --------------------------------------------------------------------------
# The raster buffer operation: grow the occupied cell set by one
# Chebyshev ring (8-neighborhood), longitude wrapping and latitude
# clamping exactly like q_cell_smooth's kernel. Output marks each
# dilated cell as core (was occupied) or halo (added by the buffer) —
# the coverage expansion a geofence or service-area query applies to a
# point set before a PIP pass. Same dual-plan shape as cell_smooth:
# `local` on the grid-bounded distinct table, `shuffle` emits the 9
# neighbor keys per cell and re-groups with MAX(core).

BUF_LEVEL = CELL_LEVEL  # reuse the res-8 analogue grid (256 x 128)


def q_cell_buffer(sf_dir: str, plan: str = "local"):
    """(cell_rm, is_core): 1-ring Chebyshev dilation of the occupied
    cell set; is_core = 1 for originally occupied cells, 0 for halo."""
    nx, ny = 1 << BUF_LEVEL, 1 << (BUF_LEVEL - 1)
    occ = _occupied_cells(sf_dir, BUF_LEVEL)

    if plan == "local":
        def dilate(t: pa.Table) -> pa.Table:
            key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
            grid = np.zeros((ny, nx), dtype=bool)
            grid[key // nx, key % nx] = True
            dil = np.zeros_like(grid)
            for dy in (-1, 0, 1):
                if dy < 0:
                    src, dst = grid[1:], dil[:-1]
                elif dy > 0:
                    src, dst = grid[:-1], dil[1:]
                else:
                    src, dst = grid, dil
                for dx in (-1, 0, 1):
                    dst |= np.roll(src, dx, axis=1)
            iy, ix = np.nonzero(dil)
            return pa.table(
                {"cell_rm": iy * nx + ix,
                 "is_core": grid[iy, ix].astype(np.int64)}
            )

        return occ.repartition(1).map_batches(
            dilate, batch_format="pyarrow", batch_size=None
        )

    # shuffle plan: emit 9 neighbor keys per occupied cell, MAX(core)
    from ray.data.aggregate import Max

    def emit(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        iy, ix = key // nx, key % nx
        ks, cs = [], []
        for dy in (-1, 0, 1):
            ok = (iy + dy >= 0) & (iy + dy < ny)
            for dx in (-1, 0, 1):
                ks.append((iy[ok] + dy) * nx + (ix[ok] + dx + nx) % nx)
                cs.append(
                    np.full(int(ok.sum()), 1 if dx == 0 and dy == 0 else 0, np.int64)
                )
        return pa.table({"cell_rm": np.concatenate(ks), "c": np.concatenate(cs)})

    out = (
        occ.map_batches(emit, batch_format="pyarrow")
        .groupby("cell_rm")
        .aggregate(Max("c", alias_name="is_core"))
    )
    return out.map_batches(
        lambda t: pa.table(
            {"cell_rm": pc.cast(t["cell_rm"], pa.int64()),
             "is_core": pc.cast(t["is_core"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def sql_cell_buffer() -> str:
    nx, ny = 1 << BUF_LEVEL, 1 << (BUF_LEVEL - 1)
    return f"""
WITH c AS ({_sql_fine_cells(BUF_LEVEL)}),
o(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
SELECT (c.iy + o.dy) * {nx} + ((c.ix + o.dx + {nx}) % {nx}) AS cell_rm,
       CAST(MAX(CASE WHEN o.dy = 0 AND o.dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS is_core
FROM c JOIN o ON c.iy + o.dy >= 0 AND c.iy + o.dy < {ny}
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Geofence entry/exit transitions per user
# --------------------------------------------------------------------------
# The streaming geofence primitive: order each user's events in time,
# flag which positions fall inside a fixed fence bbox (the reference's
# G6 bbox predicate, geo/pip.py, applied per ping), and emit a row at
# every state CHANGE — enter (outside->inside) or exit — with the
# user's initial state defined as outside. One user-hash shuffle
# (sharded_map_groups), vectorized lag within the shard's sorted runs
# (the stay_points starts/lengths idiom); output cardinality is the
# transition count, not the corpus.

GF_LAT = (-30.0, 30.0)   # fence bbox, half-open like geo/pip.bbox
GF_LON = (-60.0, 60.0)


def q_geofence_transitions(sf_dir: str):
    """(user_id, seq, dir): dir=1 enter / -1 exit at the user's seq-th
    event (1-based, ordered by ts then event_id)."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        lat, lon = _synth_latlon(g["event_id"].to_numpy())
        inside = (
            (lat >= GF_LAT[0]) & (lat < GF_LAT[1])
            & (lon >= GF_LON[0]) & (lon < GF_LON[1])
        )
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lengths = np.diff(np.r_[starts, n])
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths) + 1
        prev = np.r_[False, inside[:-1]]
        prev[starts] = False  # initial state: outside
        m = inside != prev
        return pd.DataFrame(
            {
                "user_id": uid[m],
                "seq": seq[m],
                "dir": np.where(inside[m], 1, -1).astype(np.int64),
            }
        )

    return sharded_map_groups(ev, "user_id", shard)


def sql_geofence_transitions() -> str:
    return f"""
WITH s AS (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS BIGINT) AS seq,
         CASE WHEN lat >= {GF_LAT[0]} AND lat < {GF_LAT[1]}
               AND lon >= {GF_LON[0]} AND lon < {GF_LON[1]}
              THEN 1 ELSE 0 END AS inside
  FROM (
    SELECT user_id, ts, event_id,
           {_LAT_SQL.format(k='event_id')} AS lat,
           {_LON_SQL.format(k='event_id')} AS lon
    FROM events
  )
)
SELECT user_id, seq, CAST(2 * inside - 1 AS BIGINT) AS dir
FROM (
  SELECT user_id, seq, inside,
         LAG(inside, 1, 0) OVER (PARTITION BY user_id ORDER BY seq) AS p
  FROM s
)
WHERE inside <> p
ORDER BY user_id, seq
"""


# --------------------------------------------------------------------------
# Per-leg travel speed (trajectory kinematics)
# --------------------------------------------------------------------------
# Consecutive-ping displacement over elapsed time, per user — the
# GPS-trace speed screen every map-matching / anomaly filter runs
# before snapping (the reference's stop<->way distance rule applied to
# a trace's own legs). Exact integer form on the e2 planar grid:
# positions x=(id*104729)%36000, y=(id*7919)%18000 (the _synth_latlon
# lattice in integer centidegrees), squared leg length d2 = dx^2+dy^2
# (<= 1.6e9, int64-safe), elapsed dt_s = max(epoch_us diff // 1e6, 1),
# and the reported figure v2_fp = d2 * 10^6 // dt_s^2 — the squared
# speed in fixed point, so no isqrt is needed on either side
# (d2 * 10^6 <= 1.6e15 < 2^63). Users with a single event emit
# nothing. One user-hash shuffle, vectorized diff per shard.

V2_SCALE = 10**6


def q_ping_speed(sf_dir: str):
    """(user_id, n_legs, v2max_fp): per-user leg count and max squared
    leg speed (centidegree^2 * 10^6 / s^2, floor division)."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        tu = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        n = len(g)
        legs = np.r_[False, uid[1:] == uid[:-1]]  # row i closes leg (i-1, i)
        dx = np.r_[0, np.diff(x)][legs]
        dy = np.r_[0, np.diff(y)][legs]
        dt = np.maximum(np.r_[0, np.diff(tu)][legs] // 1_000_000, 1)
        v2 = (dx * dx + dy * dy) * V2_SCALE // (dt * dt)
        out = pd.DataFrame({"user_id": uid[legs], "v2": v2})
        agg = out.groupby("user_id", sort=False, as_index=False).agg(
            n_legs=("v2", "size"), v2max_fp=("v2", "max")
        )
        return agg.astype(np.int64)

    return sharded_map_groups(ev, "user_id", shard)


def sql_ping_speed() -> str:
    return f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS tu,
         (event_id * 104729) % 36000 AS x,
         (event_id * 7919) % 18000 AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events
),
legs AS (
  SELECT user_id,
         x - LAG(x) OVER w AS dx,
         y - LAG(y) OVER w AS dy,
         GREATEST((tu - LAG(tu) OVER w) // 1000000, 1) AS dt
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY seq)
)
SELECT user_id,
       CAST(COUNT(dx) AS BIGINT) AS n_legs,
       CAST(MAX((dx * dx + dy * dy) * {V2_SCALE} // (dt * dt)) AS BIGINT)
         AS v2max_fp
FROM legs
WHERE dx IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Segment-crossing counts per tile (exact integer intersection tests)
# --------------------------------------------------------------------------
# The line-intersection primitive under every overlay/conflation job
# (way self-intersection checks, route-network validation — the
# reference's shape builder assumes stitched ways don't cross, G3).
# Each event spawns one segment on the integer e2 lattice: endpoint A
# = ((id*104729)%36000, (id*7919)%18000), endpoint B = A + a splitmix
# jitter in [-400, 400]^2. Two segments cross (PROPERLY — strict sign
# test, collinear touches don't count; the hashed lattice makes exact
# degeneracy measure-zero, and both sides run the identical integer
# arithmetic regardless) iff the endpoints of each straddle the other:
# sign(cross(B-A, C-A)) * sign(cross(B-A, D-A)) < 0, both ways. Cross
# products stay under 2^63 (coords <= 36400, diffs <= 37k, products
# <= 1.4e9 * 2).
#
# Scale shape: pair generation is bounded by TILE, not corpus — one
# tile-hash shuffle (sharded_map_groups), per-tile vectorized
# triu_indices pair test, SX_MAX_TILE occupancy guard that RAISES
# rather than silently emitting O(L^2) pairs (the co_travelers /
# cocitation cap discipline: at denser corpora raise SX_TILES so
# occupancy stays bounded). Cross-tile pairs are out of contract by
# construction (each segment belongs to the tile of endpoint A) —
# the partitioning assumption is part of the operator's definition,
# like any grid-blocked spatial self-join.

_SX_DX, _SX_DY = 300, 301
SX_TILE_LEVEL = 4          # 16 x 8 tiles over the e2 lattice
SX_MAX_TILE = 4096


def _synth_segments(eid: np.ndarray):
    from osm2gtfs_ray.sources.pages import _uint

    eid = np.asarray(eid, dtype=np.int64)
    ax = (eid * 104729) % 36000
    ay = (eid * 7919) % 18000
    k = eid.astype(np.uint64)
    bx = ax + _uint(k, _SX_DX, 42, 801) - 400
    by = ay + _uint(k, _SX_DY, 42, 801) - 400
    ntx = 1 << SX_TILE_LEVEL
    tile = (ay // (18000 // (ntx >> 1))) * ntx + ax // (36000 // ntx)
    return ax, ay, bx, by, tile


def q_segment_crossings(sf_dir: str):
    """(tile, n_crossings): count of properly-intersecting segment
    pairs whose A-endpoints share the tile; tiles with zero crossings
    are omitted."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        ax, ay, bx, by, tile = _synth_segments(b["event_id"].to_numpy())
        return pd.DataFrame(
            {"tile": tile, "ax": ax, "ay": ay, "bx": bx, "by": by}
        )

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("tile", kind="mergesort")
        tile = g["tile"].to_numpy(np.int64)
        ax, ay = g["ax"].to_numpy(np.int64), g["ay"].to_numpy(np.int64)
        bx, by = g["bx"].to_numpy(np.int64), g["by"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
        lengths = np.diff(np.r_[starts, len(g)])
        if lengths.size and int(lengths.max()) > SX_MAX_TILE:
            raise ValueError(
                f"tile occupancy {int(lengths.max())} > {SX_MAX_TILE}; "
                "raise SX_TILE_LEVEL to keep pair testing bounded"
            )
        rows = []
        for s, ln in zip(starts, lengths):  # one vectorized pass per TILE
            if ln < 2:
                continue
            i, j = np.triu_indices(int(ln), k=1)
            i, j = i + s, j + s
            d1x, d1y = bx[i] - ax[i], by[i] - ay[i]
            o1 = np.sign(d1x * (ay[j] - ay[i]) - d1y * (ax[j] - ax[i]))
            o2 = np.sign(d1x * (by[j] - ay[i]) - d1y * (bx[j] - ax[i]))
            d2x, d2y = bx[j] - ax[j], by[j] - ay[j]
            o3 = np.sign(d2x * (ay[i] - ay[j]) - d2y * (ax[i] - ax[j]))
            o4 = np.sign(d2x * (by[i] - ay[j]) - d2y * (bx[i] - ax[j]))
            c = int(((o1 * o2 < 0) & (o3 * o4 < 0)).sum())
            if c:
                rows.append((int(tile[s]), c))
        return pd.DataFrame(rows, columns=["tile", "n_crossings"]).astype(np.int64)

    segs = ev.map_batches(synth, batch_format="pandas")
    return sharded_map_groups(segs, "tile", shard)


def sql_segment_crossings() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    k = "CAST(event_id AS UBIGINT)"
    ntx = 1 << SX_TILE_LEVEL
    return f"""
WITH seg AS (
  SELECT event_id AS sid,
         (event_id * 104729) % 36000 AS ax,
         (event_id * 7919) % 18000 AS ay,
         (event_id * 104729) % 36000 + ({_s_uint(k, _SX_DX, 801)}) - 400 AS bx,
         (event_id * 7919) % 18000 + ({_s_uint(k, _SX_DY, 801)}) - 400 AS by,
         (((event_id * 7919) % 18000) // {18000 // (ntx >> 1)}) * {ntx}
           + ((event_id * 104729) % 36000) // {36000 // ntx} AS tile
  FROM events
)
SELECT a.tile, CAST(COUNT(*) AS BIGINT) AS n_crossings
FROM seg a JOIN seg b ON a.tile = b.tile AND a.sid < b.sid
WHERE sign((a.bx - a.ax) * (b.ay - a.ay) - (a.by - a.ay) * (b.ax - a.ax))
    * sign((a.bx - a.ax) * (b.by - a.ay) - (a.by - a.ay) * (b.bx - a.ax)) < 0
  AND sign((b.bx - b.ax) * (a.ay - b.ay) - (b.by - b.ay) * (a.ax - b.ax))
    * sign((b.bx - b.ax) * (a.by - b.ay) - (b.by - b.ay) * (a.bx - b.ax)) < 0
GROUP BY a.tile
ORDER BY a.tile
"""


# --------------------------------------------------------------------------
# Per-user extent envelope (ST_Extent / ST_Envelope aggregate)
# --------------------------------------------------------------------------
# The bounding-box aggregate every spatial engine ships: min/max corner
# of each user's positions on the integer e2 lattice, plus the derived
# width/height/area — the cheap prefilter a spatial join runs before
# exact PIP (the reference's bbox predicate, geo/pip.py / G6, turned
# into a grouped aggregate). Fully mergeable partials (min/min/max/max)
# via map-side combine + ONE groupby shuffle; area in HUGEINT-safe
# int64 (<= 36000 * 18000 * 10^0 = 6.5e8).

def q_user_envelope(sf_dir: str):
    """(user_id, x_min, y_min, x_max, y_max, area): extent of each
    user's positions; area = (x_max-x_min)*(y_max-y_min) in e2^2."""
    from ray.data.aggregate import Max, Min

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def partials(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        g = (
            pa.table({"user_id": t["user_id"], "x": x, "y": y, "x2": x, "y2": y})
            .group_by("user_id")
            .aggregate([("x", "min"), ("y", "min"), ("x2", "max"), ("y2", "max")])
        )
        return g.rename_columns(["user_id", "px_min", "py_min", "px_max", "py_max"])

    agg = (
        ev.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Min("px_min", alias_name="x_min"),
            Min("py_min", alias_name="y_min"),
            Max("px_max", alias_name="x_max"),
            Max("py_max", alias_name="y_max"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {c: pc.cast(t[c], pa.int64()) for c in
                ["user_id", "x_min", "y_min", "x_max", "y_max"]}
        w = pc.subtract(cols["x_max"], cols["x_min"])
        h = pc.subtract(cols["y_max"], cols["y_min"])
        cols["area"] = pc.multiply(w, h)
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_USER_ENVELOPE = """
SELECT user_id,
       MIN(x) AS x_min, MIN(y) AS y_min,
       MAX(x) AS x_max, MAX(y) AS y_max,
       (MAX(x) - MIN(x)) * (MAX(y) - MIN(y)) AS area
FROM (
  SELECT user_id,
         (event_id * 104729) % 36000 AS x,
         (event_id * 7919) % 18000 AS y
  FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Trajectory similarity: exact integer DTW between paired users
# --------------------------------------------------------------------------
# Dynamic-time-warping distance — the standard trajectory-similarity
# measure (Berndt & Clifford 1994) behind map-matching QA and
# co-movement verification (the exact-cost step a co_travelers
# candidate pair would be verified with). Trajectories are each
# user's first DTW_K events ordered by (ts, event_id) on the integer
# e2 lattice; ground distance is Chebyshev (exact int); pairs are the
# deterministic (u, u+1) for even u, so both sides derive the same
# pairing arithmetically. Classic step set {down, right, diagonal}.
#
# Exactness: the DP row recurrence c[i][j] = d[i][j] +
# min(c[i-1][j], c[i-1][j-1], c[i][j-1]) factors into a min-plus
# PREFIX SCAN per row — c[i][j] = D[j] + min_{k<=j}(am[k] - D[k-1])
# with am[k] = min(c[i-1][k], c[i-1][k-1]) and D the row prefix sum
# of d — so each DP row is one np.minimum.accumulate on the engine
# side and one MIN() OVER (ORDER BY k) window on the oracle side,
# unrolled to DTW_K CTEs (the pagerank/bfs unrolled-round
# discipline applied to dynamic programming). All integer, bit-exact.
#
# Scale shape: per-user top-K capping inside one user-hash shuffle,
# then ONE pair-key shuffle (each user belongs to exactly one pair:
# pair = user_id // 2) and an O(K^2) vectorized DP per pair — the
# corpus never fans out, and K bounds memory per group. At 100 TB
# the same plan runs with the pair list coming from a candidate
# generator (co_travelers buckets) instead of the arithmetic rule.

DTW_K = 12


def q_trajectory_dtw(sf_dir: str):
    """(user_a, user_b, n_a, n_b, dtw): exact integer Chebyshev-DTW
    cost between the first DTW_K points of users (2m, 2m+1)."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def topk_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lengths = np.diff(np.r_[starts, n])
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths) + 1
        m = seq <= DTW_K
        eid = g["event_id"].to_numpy(np.int64)[m]
        return pd.DataFrame(
            {
                "pair": uid[m] // 2,
                "role": uid[m] % 2,
                "seq": seq[m],
                "x": (eid * 104729) % 36000,
                "y": (eid * 7919) % 18000,
            }
        )

    def dtw_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair", "role", "seq"], kind="mergesort")
        rows = []
        for pair_id, gp in g.groupby("pair", sort=False):
            a = gp[gp["role"] == 0]
            b = gp[gp["role"] == 1]
            if len(a) == 0 or len(b) == 0:
                continue
            ax, ay = a["x"].to_numpy(np.int64), a["y"].to_numpy(np.int64)
            bx, by = b["x"].to_numpy(np.int64), b["y"].to_numpy(np.int64)
            d = np.maximum(
                np.abs(ax[:, None] - bx[None, :]),
                np.abs(ay[:, None] - by[None, :]),
            )
            c = np.cumsum(d[0])  # row 1: horizontal-only prefix
            for i in range(1, len(ax)):
                am = np.minimum(c, np.r_[c[0], c[:-1]])
                D = np.cumsum(d[i])
                c = D + np.minimum.accumulate(am - (D - d[i]))
            rows.append(
                (
                    int(pair_id) * 2, int(pair_id) * 2 + 1,
                    len(ax), len(bx), int(c[-1]),
                )
            )
        return pd.DataFrame(
            rows, columns=["user_a", "user_b", "n_a", "n_b", "dtw"]
        ).astype(np.int64)

    pts = sharded_map_groups(ev, "user_id", topk_shard)
    return sharded_map_groups(pts, "pair", dtw_shard)


def sql_trajectory_dtw() -> str:
    rows = []
    for i in range(2, DTW_K + 1):
        rows.append(f"""
r{i} AS (
  SELECT ua, j, D + MIN(am - Dprev) OVER (
           PARTITION BY ua ORDER BY j ROWS UNBOUNDED PRECEDING
         ) AS c
  FROM (
    SELECT dd.ua, dd.j,
           SUM(dd.d) OVER (PARTITION BY dd.ua ORDER BY dd.j
                           ROWS UNBOUNDED PRECEDING) AS D,
           SUM(dd.d) OVER (PARTITION BY dd.ua ORDER BY dd.j
                           ROWS UNBOUNDED PRECEDING) - dd.d AS Dprev,
           LEAST(p.c, COALESCE(LAG(p.c) OVER (PARTITION BY dd.ua ORDER BY dd.j),
                               p.c)) AS am
    FROM d dd JOIN r{i - 1} p ON p.ua = dd.ua AND p.j = dd.j
    WHERE dd.i = {i}
  )
)""")
    finals = " UNION ALL ".join(
        f"SELECT p.ua AS user_a, p.ub AS user_b, p.na AS n_a, p.nb AS n_b, "
        f"r.c AS dtw FROM pairs p JOIN r{i} r ON r.ua = p.ua AND r.j = p.nb "
        f"WHERE p.na = {i}"
        for i in range(1, DTW_K + 1)
    )
    return f"""
WITH pts AS (
  SELECT user_id, seq, x, y FROM (
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS seq,
           (event_id * 104729) % 36000 AS x,
           (event_id * 7919) % 18000 AS y
    FROM events
  ) WHERE seq <= {DTW_K}
),
n AS (SELECT user_id, MAX(seq) AS n FROM pts GROUP BY user_id),
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub, a.n AS na, b.n AS nb
  FROM n a JOIN n b ON b.user_id = a.user_id + 1
  WHERE a.user_id % 2 = 0
),
d AS (
  SELECT p.ua, pa.seq AS i, pb.seq AS j,
         GREATEST(ABS(pa.x - pb.x), ABS(pa.y - pb.y)) AS d
  FROM pairs p
  JOIN pts pa ON pa.user_id = p.ua
  JOIN pts pb ON pb.user_id = p.ub
),
r1 AS (
  SELECT ua, j, SUM(d) OVER (PARTITION BY ua ORDER BY j
                             ROWS UNBOUNDED PRECEDING) AS c
  FROM d WHERE i = 1
),{",".join(rows)}
SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(dtw AS BIGINT) AS dtw
FROM ({finals})
ORDER BY user_a
"""


# --------------------------------------------------------------------------
# Z-order range scan: quadtree bbox decomposition over the Morton index
# --------------------------------------------------------------------------
# The index-scan primitive behind every Z-ordered spatial table
# (BigQuery/Delta Z-ORDER BY, S2/H3 range covers): decompose a query
# bbox into the minimal set of ALIGNED quadtree squares — each of
# which is one CONTIGUOUS Morton key range [morton(corner), +s^2) —
# then scan with pure range predicates on the cell key. That is what
# lets a sorted-by-cell Parquet layout prune row groups by min/max
# stats instead of evaluating a 2-D predicate per row. The bbox is
# deliberately unaligned so the decomposition is non-trivial (~O(p)
# ranges for perimeter p). Engine side filters on the ranges ONLY
# (searchsorted over range starts — no ix/iy comparison in the scan
# path); the oracle evaluates the rectangle directly, so the gate
# proves the decomposition covers the rectangle exactly.

ZS_LEVEL = CELL_LEVEL                      # 256 x 128 grid
ZS_RECT = (77, 203, 23, 101)               # half-open [x0,x1) x [y0,y1)


def z_cover_ranges(x0: int, x1: int, y0: int, y1: int, size: int) -> list[tuple[int, int]]:
    """Maximal aligned-quadtree cover of the half-open rect as sorted,
    merged, half-open Morton ranges."""
    from osm2gtfs_ray.geo.cells import ij_to_cell

    out: list[tuple[int, int]] = []

    def rec(cx: int, cy: int, s: int) -> None:
        if cx >= x1 or cx + s <= x0 or cy >= y1 or cy + s <= y0:
            return
        if x0 <= cx and cx + s <= x1 and y0 <= cy and cy + s <= y1:
            base = int(ij_to_cell(np.array([cx]), np.array([cy]))[0])
            out.append((base, base + s * s))
            return
        h = s // 2
        for q in range(4):  # Z order: children emit in ascending key order
            rec(cx + (q & 1) * h, cy + (q >> 1) * h, h)

    rec(0, 0, size)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and merged[-1][1] == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def q_zorder_scan(sf_dir: str):
    """(event_id, ix, iy) of events whose cell falls in ZS_RECT,
    selected purely by Morton range predicates."""
    from osm2gtfs_ray.geo.cells import ij_to_cell

    nx, ny = 1 << ZS_LEVEL, 1 << (ZS_LEVEL - 1)
    x0, x1, y0, y1 = ZS_RECT
    ranges = z_cover_ranges(x0, x1, y0, y1, nx)
    starts = np.array([r[0] for r in ranges], dtype=np.uint64)
    ends = np.array([r[1] for r in ranges], dtype=np.uint64)
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def scan(t: pa.Table) -> pa.Table:
        lat, lon = _synth_latlon(t["event_id"].to_numpy())
        ix = np.minimum(np.floor(((lon + 180.0) / 360.0) * nx).astype(np.int64), nx - 1)
        iy = np.minimum(np.floor(((lat + 90.0) / 180.0) * ny).astype(np.int64), ny - 1)
        m = ij_to_cell(ix, iy)
        pos = np.searchsorted(starts, m, side="right") - 1
        keep = (pos >= 0) & (m < ends[np.maximum(pos, 0)])
        return pa.table(
            {
                "event_id": t["event_id"].to_numpy(zero_copy_only=False)[keep],
                "ix": ix[keep],
                "iy": iy[keep],
            }
        )

    return ev.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def sql_zorder_scan() -> str:
    nx, ny = 1 << ZS_LEVEL, 1 << (ZS_LEVEL - 1)
    x0, x1, y0, y1 = ZS_RECT
    return f"""
SELECT event_id, ix, iy FROM (
  SELECT event_id,
         LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * {nx}) AS BIGINT), {nx - 1}) AS ix,
         LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * {ny}) AS BIGINT), {ny - 1}) AS iy
  FROM (
    SELECT event_id,
           {_LAT_SQL.format(k='event_id')} AS lat,
           {_LON_SQL.format(k='event_id')} AS lon
    FROM events
  )
)
WHERE ix >= {x0} AND ix < {x1} AND iy >= {y0} AND iy < {y1}
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Convex-hull boundary membership per user (exact integer orientation)
# --------------------------------------------------------------------------
# For each user's first HULL_K positions: how many lie ON the convex
# hull boundary — the shape-complexity statistic behind coverage-area
# estimation and outlier screening (the hull is what q_user_envelope's
# bbox over-approximates). Definition (deterministic on the integer
# lattice, duplicates and collinear runs included): p is a boundary
# point iff there exists q at a different position with NO point
# strictly left of the directed line p->q (all cross products <= 0).
# Exact int64 orientation tests on both sides; no epsilon anywhere.
#
# Scale shape: one user-hash shuffle after a per-user HULL_K cap, then
# an O(K^3) broadcast-tensor test per user (K=24 -> 13.8k cells, ~110KB
# per user) — bounded per group, embarrassingly parallel across
# shards. The oracle is the same exists/not-exists quantifier pair as
# a correlated anti-join.

HULL_K = 24


def q_hull_points(sf_dir: str):
    """(user_id, n_points, n_hull): capped point count and how many of
    those points lie on the convex hull boundary."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lengths = np.diff(np.r_[starts, n])
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)
        keep = seq < HULL_K
        uid, eid = uid[keep], eid[keep]
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        rows = []
        bs = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        bl = np.diff(np.r_[bs, len(uid)])
        for s, ln in zip(bs, bl):
            px, py = x[s:s + ln], y[s:s + ln]
            # cross[i,j,k] = (pj-pi) x (pk-pi); strict-left exists -> bad edge
            dxj = px[None, :, None] - px[:, None, None]
            dyj = py[None, :, None] - py[:, None, None]
            dxk = px[None, None, :] - px[:, None, None]
            dyk = py[None, None, :] - py[:, None, None]
            bad = ((dxj * dyk - dyj * dxk) > 0).any(axis=2)
            distinct = (px[None, :] != px[:, None]) | (py[None, :] != py[:, None])
            hull = (~bad & distinct).any(axis=1)
            if ln == 1 or not distinct.any():
                hull = np.ones(ln, dtype=bool)  # all points coincide
            rows.append((int(uid[s]), int(ln), int(hull.sum())))
        return pd.DataFrame(
            rows, columns=["user_id", "n_points", "n_hull"]
        ).astype(np.int64)

    return sharded_map_groups(ev, "user_id", shard)


def sql_hull_points() -> str:
    return f"""
WITH pts AS (
  SELECT user_id, seq AS pid, x, y FROM (
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS seq,
           (event_id * 104729) % 36000 AS x,
           (event_id * 7919) % 18000 AS y
    FROM events
  ) WHERE seq <= {HULL_K}
),
counts AS (SELECT user_id, COUNT(*) AS n_points FROM pts GROUP BY user_id),
degenerate AS (
  SELECT user_id FROM pts GROUP BY user_id
  HAVING COUNT(DISTINCT (x, y)) = 1
),
hull AS (
  SELECT DISTINCT p.user_id, p.pid
  FROM pts p JOIN pts q
    ON q.user_id = p.user_id AND (q.x <> p.x OR q.y <> p.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts r
    WHERE r.user_id = p.user_id
      AND (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) > 0
  )
)
SELECT c.user_id, c.n_points,
       CASE WHEN d.user_id IS NOT NULL THEN c.n_points
            ELSE (SELECT COUNT(*) FROM hull h WHERE h.user_id = c.user_id)
       END AS n_hull
FROM counts c LEFT JOIN degenerate d ON d.user_id = c.user_id
ORDER BY c.user_id
"""


# --------------------------------------------------------------------------
# Morphological cell-set erosion (complement of q_cell_buffer)
# --------------------------------------------------------------------------
# Keep only occupied cells whose FULL 8-neighborhood (lon wrap, lat
# clamp: out-of-grid rows count as unoccupied, matching the buffer's
# clamp) is also occupied — the interior extraction that pairs with
# dilation to build morphological opening/closing over coverage
# rasters. Same dual plans as cell_buffer. Runs at the COARSER
# ER_LEVEL grid: erosion is only meaningful where occupancy is dense
# enough for full neighborhoods to exist (at the res-8 grid the
# test-scale point sets are ~30% occupied and the interior is
# provably empty; density, not the operator, picks the level).

ER_LEVEL = 6  # 64 x 32 grid


def q_cell_erode(sf_dir: str, plan: str = "local"):
    """(cell_rm): occupied cells all of whose 8 Chebyshev neighbors
    are occupied (lat-edge cells never qualify)."""
    nx, ny = 1 << ER_LEVEL, 1 << (ER_LEVEL - 1)
    occ = _occupied_cells(sf_dir, ER_LEVEL)

    if plan == "local":
        def erode(t: pa.Table) -> pa.Table:
            key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
            grid = np.zeros((ny, nx), dtype=bool)
            grid[key // nx, key % nx] = True
            core = np.ones_like(grid)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    shifted = np.roll(grid, dx, axis=1)
                    if dy < 0:
                        sh = np.zeros_like(grid)
                        sh[:-1] = shifted[1:]
                    elif dy > 0:
                        sh = np.zeros_like(grid)
                        sh[1:] = shifted[:-1]
                    else:
                        sh = shifted
                    core &= sh
            iy, ix = np.nonzero(core)
            return pa.table({"cell_rm": iy * nx + ix})

        return occ.repartition(1).map_batches(
            erode, batch_format="pyarrow", batch_size=None
        )

    # shuffle plan: each occupied cell votes for its 9 neighbors;
    # a cell erodes-in iff it collects all 9 votes
    from ray.data.aggregate import Sum

    def emit(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        iy, ix = key // nx, key % nx
        ks = []
        for dy in (-1, 0, 1):
            ok = (iy + dy >= 0) & (iy + dy < ny)
            for dx in (-1, 0, 1):
                ks.append((iy[ok] + dy) * nx + (ix[ok] + dx + nx) % nx)
        k = np.concatenate(ks)
        return pa.table({"cell_rm": k, "v": np.ones(len(k), np.int64)})

    votes = (
        occ.map_batches(emit, batch_format="pyarrow")
        .groupby("cell_rm")
        .aggregate(Sum("v", alias_name="nv"))
    )

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.cast(t["nv"], pa.int64()), 9))
        return pa.table({"cell_rm": pc.cast(t["cell_rm"], pa.int64())})

    return votes.map_batches(keep, batch_format="pyarrow")


def sql_cell_erode() -> str:
    nx, ny = 1 << ER_LEVEL, 1 << (ER_LEVEL - 1)
    return f"""
WITH c AS ({_sql_fine_cells(ER_LEVEL)}),
o(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
SELECT (c.iy + o.dy) * {nx} + ((c.ix + o.dx + {nx}) % {nx}) AS cell_rm
FROM c JOIN o ON c.iy + o.dy >= 0 AND c.iy + o.dy < {ny}
GROUP BY 1 HAVING COUNT(*) = 9
"""


# --------------------------------------------------------------------------
# Moran's I spatial autocorrelation over the event-count raster
# --------------------------------------------------------------------------
# The canonical global clustering statistic (Moran 1950): with x the
# per-cell event count over the FULL nx x ny grid (zeros included),
# rook adjacency W (lon wraps, lat clamps — the cell_smooth kernel's
# contract minus diagonals),
#
#   I = (N / SUM(W)) * sum_ij w_ij (x_i - m)(x_j - m) / sum_i (x_i - m)^2
#
# Made EXACT by clearing denominators with m = S/N:
#   num_raw = N^2 * P - 2*N*S*D + S^2 * SW      (ordered-pair form)
#   den_raw = N^2 * Q - N * S^2
#   i_fp    = floor(10^6 * N * num_raw / (SW * den_raw))
# where S = total events, Q = sum x^2, P = sum over ordered adjacent
# nonzero pairs of x_i*x_j, D = sum x_i * deg(i), and SW / deg have
# closed forms on the wrapped-clamped grid (zero cells contribute to
# every term only through S, N, SW — so only the NONZERO cell table is
# ever touched). The final scalar uses Python big ints (num_raw scales
# like N^2*S^2 — past int64 long before any real corpus; SQL uses
# HUGEINT), after one corpus shuffle to grid-bounded counts.

MORAN_LEVEL = CELL_LEVEL  # 256 x 128
MORAN_SCALE = 10**6


def q_morans_i(sf_dir: str):
    """Single row (n_cells, sum_w, s_events, i_fp): exact fixed-point
    global Moran's I of the event-count raster."""
    counts = _smooth_counts(sf_dir)  # (cell_rm, n) nonzero cells
    nx, ny = 1 << MORAN_LEVEL, 1 << (MORAN_LEVEL - 1)
    N = nx * ny
    SW = 2 * (ny * nx + (ny - 1) * nx)  # ordered rook pairs: wrap lon, clamp lat

    def finalize(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
        grid = np.zeros((ny, nx), dtype=np.int64)
        grid[key // nx, key % nx] = n
        S = int(n.sum())
        Q = int((n.astype(object) ** 2).sum())
        deg = np.full((ny, nx), 4, dtype=np.int64)
        deg[0, :] -= 1
        deg[-1, :] -= 1
        og = grid.astype(object)  # big-int products: x_i*x_j can pass
        D = int((og * deg)[key // nx, key % nx].sum())
        # ordered adjacent products: horizontal wraps, vertical clamps
        P = 2 * int((og * np.roll(og, 1, axis=1)).sum())
        P += 2 * int((og[1:] * og[:-1]).sum())
        num_raw = N * N * P - 2 * N * S * D + S * S * SW
        den_raw = N * N * Q - N * S * S
        i_fp = (MORAN_SCALE * N * num_raw) // (SW * den_raw)
        return pa.table(
            {
                "n_cells": pa.array([N], pa.int64()),
                "sum_w": pa.array([SW], pa.int64()),
                "s_events": pa.array([S], pa.int64()),
                "i_fp": pa.array([int(i_fp)], pa.int64()),
            }
        )

    # grid-bounded final stage (<= nx*ny rows), the cell_smooth
    # local-plan rule; everything corpus-sized already reduced by
    # _smooth_counts' one shuffle
    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def sql_morans_i() -> str:
    nx, ny = 1 << MORAN_LEVEL, 1 << (MORAN_LEVEL - 1)
    N = nx * ny
    SW = 2 * (ny * nx + (ny - 1) * nx)
    return f"""
WITH c AS (
  SELECT iy, ix, CAST(COUNT(*) AS HUGEINT) AS x
  FROM ({_sql_fine_cells(MORAN_LEVEL).replace("SELECT DISTINCT", "SELECT")})
  GROUP BY 1, 2
),
s AS (
  SELECT CAST(SUM(x) AS HUGEINT) AS S, CAST(SUM(x * x) AS HUGEINT) AS Q,
         CAST(SUM(x * (4 - CASE WHEN iy = 0 THEN 1 ELSE 0 END
                            - CASE WHEN iy = {ny - 1} THEN 1 ELSE 0 END))
              AS HUGEINT) AS D
  FROM c
),
p AS (
  SELECT CAST(COALESCE(SUM(a.x * b.x), 0) AS HUGEINT) AS P
  FROM c a JOIN c b
    ON (a.iy = b.iy AND ((a.ix + 1) % {nx}) = b.ix)
    OR (a.ix = b.ix AND a.iy + 1 = b.iy)
),
f AS (
  SELECT CAST({N} AS HUGEINT) AS N, CAST({SW} AS HUGEINT) AS SW,
         S, Q, D, 2 * P AS P2
  FROM s CROSS JOIN p
)
SELECT CAST(N AS BIGINT) AS n_cells, CAST(SW AS BIGINT) AS sum_w,
       CAST(S AS BIGINT) AS s_events,
       -- exact FLOOR division (num may be negative; DuckDB // truncates):
       -- subtract the canonical non-negative residue first
       CAST((num - (((num % den) + den) % den)) // den AS BIGINT) AS i_fp
FROM (
  SELECT N, SW, S,
         {MORAN_SCALE} * N * (N * N * P2 - 2 * N * S * D + S * S * SW) AS num,
         SW * (N * N * Q - N * S * S) AS den
  FROM f
)
"""


# --------------------------------------------------------------------------
# Per-tile event-type diversity (Gini-Simpson over the spatial grid)
# --------------------------------------------------------------------------
# The spatial-diversity raster behind land-use / activity-mix maps:
# for each coarse tile, the Gini-Simpson index 1 - sum(c_t^2)/n^2 of
# its event-type mix, exact in fixed point (the q_vocab_diversity
# integer discipline applied per tile): gini_fp = ((n^2 - sum c^2)
# * 10^6) // n^2 with PYTHON BIG INTS in the tile-bounded finalize —
# n^2 wraps int64 past ~3e9 events per tile, and the output
# cardinality is the tile count, so the O(tiles) big-int pass is the
# work any engine must do. One (tile, type) shuffle with map-side
# combine; the finalize sees <= tiles x types rows.

TE_LEVEL = 4  # 16 x 8 tiles
TE_SCALE = 10**6


def q_tile_entropy(sf_dir: str):
    """(tile, n, n_types, gini_fp): event count, distinct types, and
    exact Gini-Simpson diversity per coarse tile."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ntx = 1 << TE_LEVEL
    ev = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        part = pd.DataFrame(
            {
                "tile": (y // (18000 // (ntx >> 1))) * ntx + x // (36000 // ntx),
                "event_type": b["event_type"].to_numpy(),
                "c": np.ones(len(b), np.int64),
            }
        )
        return part.groupby(["tile", "event_type"], sort=False, as_index=False).sum()

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["tile", "event_type"], sort=False, as_index=False)["c"].sum()
        rows = []
        for tile, gt in g.groupby("tile", sort=False):
            n = int(gt["c"].sum())
            sq = sum(int(c) ** 2 for c in gt["c"])
            rows.append(
                (int(tile), n, len(gt), ((n * n - sq) * TE_SCALE) // (n * n))
            )
        return pd.DataFrame(
            rows, columns=["tile", "n", "n_types", "gini_fp"]
        ).astype(np.int64)

    return sharded_map_groups(ev, "tile", finalize, local_pre=pre)


SQL_TILE_ENTROPY = f"""
WITH c AS (
  SELECT (((event_id * 7919) % 18000) // {18000 // (1 << (TE_LEVEL - 1))}) * {1 << TE_LEVEL}
           + ((event_id * 104729) % 36000) // {36000 // (1 << TE_LEVEL)} AS tile,
         event_type, CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT tile, CAST(SUM(c) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(((SUM(c) * SUM(c) - SUM(c * c)) * {TE_SCALE})
            // (SUM(c) * SUM(c)) AS BIGINT) AS gini_fp
FROM c GROUP BY tile ORDER BY tile
"""


# --------------------------------------------------------------------------
# Movement-direction octant histogram (exact integer bearings)
# --------------------------------------------------------------------------
# Movement anisotropy: each consecutive same-user leg contributes its
# compass OCTANT, decided purely by integer sign/magnitude tests (no
# atan2 anywhere): octants 0..7 = E, NE, N, NW, W, SW, S, SE under
# half-open boundaries (|dx| > |dy| -> horizontal-dominant; ties go to
# the diagonal; zero legs dropped). The same LAG machinery as
# q_ping_speed, aggregated to an 8-row histogram — partial counts per
# shard, bounded merge.

def q_bearing_hist(sf_dir: str):
    """(octant, n): global count of movement legs per compass octant."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import bounded_key_sum, sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        legs = np.r_[False, uid[1:] == uid[:-1]]
        dx = np.r_[0, np.diff(x)][legs]
        dy = np.r_[0, np.diff(y)][legs]
        nz = (dx != 0) | (dy != 0)
        dx, dy = dx[nz], dy[nz]
        ax, ay = np.abs(dx), np.abs(dy)
        diag = ax <= ay  # vertical-dominant or tie -> N/S/diagonal band
        horiz = ay <= ax
        octant = np.where(
            horiz & ~diag, np.where(dx > 0, 0, 4),          # E / W
            np.where(
                diag & ~horiz, np.where(dy > 0, 2, 6),      # N / S
                np.where(                                    # exact diagonal
                    dy > 0, np.where(dx > 0, 1, 3),          # NE / NW
                    np.where(dx > 0, 7, 5),                  # SE / SW
                ),
            ),
        )
        part = pd.DataFrame({"octant": octant.astype(np.int64)})
        out = part.groupby("octant", as_index=False).agg(partial=("octant", "size"))
        out["partial"] = out["partial"].astype(np.int64)
        return out

    parts = sharded_map_groups(ev, "user_id", shard)
    out = bounded_key_sum(parts, ["octant"], ["partial"],
                          driver=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
                          out_names=["n"])
    return out.map_batches(
        lambda t: pa.table({"octant": pc.cast(t["octant"], pa.int64()),
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
    )


SQL_BEARING_HIST = """
WITH s AS (
  SELECT user_id,
         (event_id * 104729) % 36000 AS x,
         (event_id * 7919) % 18000 AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events
),
legs AS (
  SELECT x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY seq)
)
SELECT CASE
         WHEN ABS(dy) < ABS(dx) AND dx > 0 THEN 0
         WHEN ABS(dy) < ABS(dx) THEN 4
         WHEN ABS(dx) < ABS(dy) AND dy > 0 THEN 2
         WHEN ABS(dx) < ABS(dy) THEN 6
         WHEN dy > 0 AND dx > 0 THEN 1
         WHEN dy > 0 THEN 3
         WHEN dx > 0 THEN 7
         ELSE 5
       END AS octant,
       COUNT(*) AS n
FROM legs
WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Local Moran's I numerator map (LISA hot/cold-spot raster)
# --------------------------------------------------------------------------
# Anselin's Local Indicator of Spatial Association, the per-cell
# companion of q_morans_i: I_i ∝ (x_i - m) * sum_{j in rook(i)}
# (x_j - m). Cleared of the mean by the same N-scaling (m = S/N):
#
#   li_raw(i) = (N*x_i - S) * ( N * sum_{nonzero rook nbrs} x_j
#                               - S * deg(i) )
#
# — zero neighbors enter ONLY through the -S*deg(i) closed form, so
# the computation touches just the nonzero cell table. Positive
# li_raw = cell agrees with its neighborhood (hot-hot or cold-cold),
# negative = spatial outlier. Output one row per NONZERO cell
# (standardization by the global variance is a constant factor,
# q_morans_i's den_raw — left unapplied so the map stays integral).
# Same grid/adjacency contract as q_morans_i (lon wraps, lat clamps);
# Python big ints in the grid-bounded finalize.

def q_local_moran(sf_dir: str):
    """(cell_rm, x, li_raw): count and exact integer local-Moran
    numerator for every nonzero cell."""
    counts = _smooth_counts(sf_dir)
    nx, ny = 1 << MORAN_LEVEL, 1 << (MORAN_LEVEL - 1)
    N = nx * ny

    def finalize(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
        grid = np.zeros((ny, nx), dtype=np.int64)
        iy, ix = key // nx, key % nx
        grid[iy, ix] = n
        S = int(n.sum())
        og = grid.astype(object)
        nbr = np.roll(og, 1, axis=1) + np.roll(og, -1, axis=1)
        nbr[1:] += og[:-1]
        nbr[:-1] += og[1:]
        deg = np.full((ny, nx), 4, dtype=np.int64)
        deg[0, :] -= 1
        deg[-1, :] -= 1
        li = (og[iy, ix] * N - S) * (nbr[iy, ix] * N - S * deg[iy, ix])
        return pa.table(
            {
                "cell_rm": key,
                "x": n,
                "li_raw": pa.array([int(v) for v in li], pa.int64()),
            }
        )

    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def sql_local_moran() -> str:
    nx, ny = 1 << MORAN_LEVEL, 1 << (MORAN_LEVEL - 1)
    N = nx * ny
    return f"""
WITH c AS (
  SELECT iy, ix, CAST(COUNT(*) AS HUGEINT) AS x
  FROM ({_sql_fine_cells(MORAN_LEVEL).replace("SELECT DISTINCT", "SELECT")})
  GROUP BY 1, 2
),
s AS (SELECT CAST(SUM(x) AS HUGEINT) AS S FROM c),
o(dy, dx) AS (VALUES (-1, 0), (1, 0), (0, -1), (0, 1)),
nz AS (
  SELECT a.iy, a.ix,
         CAST(COALESCE(SUM(b.x), 0) AS HUGEINT) AS nbr
  FROM c a
  CROSS JOIN o
  LEFT JOIN c b ON b.iy = a.iy + o.dy
               AND b.ix = (a.ix + o.dx + {nx}) % {nx}
               AND a.iy + o.dy >= 0 AND a.iy + o.dy < {ny}
  GROUP BY 1, 2
)
SELECT CAST(c.iy * {nx} + c.ix AS BIGINT) AS cell_rm,
       CAST(c.x AS BIGINT) AS x,
       CAST((c.x * {N} - s.S)
            * (nz.nbr * {N}
               - s.S * (4 - CASE WHEN c.iy = 0 THEN 1 ELSE 0 END
                          - CASE WHEN c.iy = {ny - 1} THEN 1 ELSE 0 END))
            AS BIGINT) AS li_raw
FROM c JOIN nz ON nz.iy = c.iy AND nz.ix = c.ix
CROSS JOIN s
ORDER BY cell_rm
"""


# --------------------------------------------------------------------------
# Nearest-neighbor distance sums per tile (Clark-Evans numerator)
# --------------------------------------------------------------------------
# The point-pattern clustering statistic (Clark & Evans 1954): the
# mean distance from each point to its nearest neighbor, compared to
# the expectation under CSR. Computed here as the exact integer
# numerator per tile — nn_sum_fp = sum over points of
# isqrt(d2min * 10^4) (fixed-point e2*10^2 lattice distance, exact
# math.isqrt; the SQL side uses the ±1-corrected float-seeded isqrt
# idiom of sql_shape_length — seed error ≪ 1 at d2*10^4 ≲ 1.6e13).
# NN search is TILE-BOUNDED (each point's neighbor set is its tile,
# the same partitioning contract as q_segment_crossings — a real
# engine's grid-blocked NN with halo exchange would widen the
# neighborhood; the tile-local definition keeps the oracle exact).
# Tile-hash shuffle, O(L^2) vectorized min per tile, SX_MAX_TILE
# occupancy guard shared with segment_crossings.

def q_nn_distance(sf_dir: str):
    """(tile, n_pts, nn_sum_fp) for tiles holding >= 2 points."""
    import math

    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def synth(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        ntx = 1 << SX_TILE_LEVEL
        tile = (y // (18000 // (ntx >> 1))) * ntx + x // (36000 // ntx)
        return pd.DataFrame({"tile": tile, "x": x, "y": y})

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("tile", kind="mergesort")
        tile = g["tile"].to_numpy(np.int64)
        x, y = g["x"].to_numpy(np.int64), g["y"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
        lengths = np.diff(np.r_[starts, len(g)])
        if lengths.size and int(lengths.max()) > SX_MAX_TILE:
            raise ValueError(
                f"tile occupancy {int(lengths.max())} > {SX_MAX_TILE}; "
                "raise SX_TILE_LEVEL to keep NN search bounded"
            )
        rows = []
        for s, ln in zip(starts, lengths):
            if ln < 2:
                continue
            px, py = x[s:s + ln], y[s:s + ln]
            d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
            np.fill_diagonal(d2, np.iinfo(np.int64).max)
            mins = d2.min(axis=1)
            nn_sum = sum(math.isqrt(int(m) * 10_000) for m in mins)
            rows.append((int(tile[s]), int(ln), nn_sum))
        return pd.DataFrame(
            rows, columns=["tile", "n_pts", "nn_sum_fp"]
        ).astype(np.int64)

    pts = ev.map_batches(synth, batch_format="pandas")
    return sharded_map_groups(pts, "tile", shard)


def sql_nn_distance() -> str:
    ntx = 1 << SX_TILE_LEVEL
    r0 = "CAST(FLOOR(SQRT(CAST(v AS DOUBLE))) AS HUGEINT)"
    corr = (f"{r0} - CASE WHEN {r0} * {r0} > v THEN 1 ELSE 0 END"
            f" + CASE WHEN ({r0} + 1) * ({r0} + 1) <= v THEN 1 ELSE 0 END")
    return f"""
WITH pt AS (
  SELECT event_id AS pid,
         (event_id * 104729) % 36000 AS x,
         (event_id * 7919) % 18000 AS y,
         (((event_id * 7919) % 18000) // {18000 // (ntx >> 1)}) * {ntx}
           + ((event_id * 104729) % 36000) // {36000 // ntx} AS tile
  FROM events
),
nn AS (
  SELECT a.tile, a.pid,
         CAST(MIN((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
              AS HUGEINT) * 10000 AS v
  FROM pt a JOIN pt b ON a.tile = b.tile AND a.pid <> b.pid
  GROUP BY 1, 2
)
SELECT tile, CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(SUM({corr}) AS BIGINT) AS nn_sum_fp
FROM nn GROUP BY tile ORDER BY tile
"""


# --------------------------------------------------------------------------
# Per-cell temporal trend (emerging hot-spot analysis primitive)
# --------------------------------------------------------------------------
# The space-time-cube trend step (ArcGIS "emerging hot spots", lite):
# for each grid cell, the least-squares slope of its DAILY event
# counts over the fixed TREND_DAYS-day window —
#
#   slope = (T * sum_t(t * x_t) - (sum t) * S_cell) / (T * sum t^2 -
#           (sum t)^2)
#
# Days with zero events enter only through the closed-form constants
# (their x_t = 0 kills their product terms), so only nonzero
# (cell, day) rows are ever touched; the denominator is a window
# constant. Exact fixed point: slope_fp = floor(num * 10^6 / den)
# with Python floor on the engine side and the canonical-residue
# floor-division identity in SQL (num may be negative — the
# q_morans_i fix). One (cell, day) shuffle with map-side combine,
# then a grid-bounded per-cell finalize.

TREND_DAYS = 30
TREND_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
TREND_SCALE = 10**6
TREND_LEVEL = 6  # 64 x 32 cells — dense enough for per-day series


def q_cell_trend(sf_dir: str):
    """(cell_rm, n_events, n_days, slope_fp): total count, distinct
    active days, and exact fixed-point daily-count trend per cell."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    nx, ny = 1 << TREND_LEVEL, 1 << (TREND_LEVEL - 1)
    T = TREND_DAYS
    st = T * (T - 1) // 2                      # sum of t over 0..T-1
    st2 = (T - 1) * T * (2 * T - 1) // 6       # sum of t^2
    den = T * st2 - st * st
    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        lat = ((eid * 7919) % 18000) / 100.0 - 90.0
        lon = ((eid * 104729) % 36000) / 100.0 - 180.0
        ix = np.minimum(((lon + 180.0) / 360.0 * nx).astype(np.int64), nx - 1)
        iy = np.minimum(((lat + 90.0) / 180.0 * ny).astype(np.int64), ny - 1)
        tu = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        day = (tu - TREND_EPOCH_US) // 86_400_000_000
        part = pd.DataFrame(
            {"cell_rm": iy * nx + ix, "day": day, "c": np.ones(len(b), np.int64)}
        )
        return part.groupby(["cell_rm", "day"], sort=False, as_index=False).sum()

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cell_rm", "day"], sort=False, as_index=False)["c"].sum()
        rows = []
        for cell, gc in g.groupby("cell_rm", sort=False):
            s = int(gc["c"].sum())
            stx = sum(int(d) * int(c) for d, c in zip(gc["day"], gc["c"]))
            num = (T * stx - st * s) * TREND_SCALE
            rows.append((int(cell), s, len(gc), num // den))
        return pd.DataFrame(
            rows, columns=["cell_rm", "n_events", "n_days", "slope_fp"]
        ).astype(np.int64)

    return sharded_map_groups(ev, "cell_rm", finalize, local_pre=pre)


def sql_cell_trend() -> str:
    nx, ny = 1 << TREND_LEVEL, 1 << (TREND_LEVEL - 1)
    T = TREND_DAYS
    st = T * (T - 1) // 2
    st2 = (T - 1) * T * (2 * T - 1) // 6
    den = T * st2 - st * st
    return f"""
WITH cd AS (
  SELECT LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * {ny}) AS BIGINT), {ny - 1})
           * {nx}
         + LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * {nx}) AS BIGINT), {nx - 1})
           AS cell_rm,
         day, CAST(COUNT(*) AS HUGEINT) AS c
  FROM (
    SELECT {_LAT_SQL.format(k='event_id')} AS lat,
           {_LON_SQL.format(k='event_id')} AS lon,
           (epoch_us(ts) - {TREND_EPOCH_US}) // 86400000000 AS day
    FROM events
  )
  GROUP BY 1, 2
),
agg AS (
  SELECT cell_rm, CAST(SUM(c) AS HUGEINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(day * c) AS HUGEINT) AS stx
  FROM cd GROUP BY cell_rm
)
SELECT cell_rm, CAST(s AS BIGINT) AS n_events, n_days,
       CAST((num - (((num % {den}) + {den}) % {den})) // {den} AS BIGINT)
         AS slope_fp
FROM (
  SELECT cell_rm, s, n_days,
         ({T} * stx - {st} * s) * {TREND_SCALE} AS num
  FROM agg
)
ORDER BY cell_rm
"""


# --------------------------------------------------------------------------
# Polyline densification at a fixed interval (inverse of DP simplify)
# --------------------------------------------------------------------------
# The shape-point emitter's refinement step (reference: shape builders
# emit per-vertex GTFS shape rows; real feeds densify long segments so
# map renderers and stop-snapping see bounded gaps): every consecutive
# segment is split into m = 1 + seg_len // DENSIFY_D equal parametric
# parts and the interior points are emitted alongside the segment
# start. Exact integers end to end: seg_len is the corrected isqrt
# (sql_shape_length idiom) and each interpolated coordinate is
# x + floor(dx * j / m) — numpy's int64 // floors, and the SQL side
# applies the canonical-residue floor identity because dx may be
# negative (the q_morans_i rule). Per-shape final vertices are not
# re-emitted (each row belongs to the segment it subdivides). One
# shape-hash shuffle; the expansion factor is bounded by
# max_seg/DENSIFY_D.

DENSIFY_D = 2000  # e4 units (0.2 deg) between interpolated points


def q_shape_densify(sf_dir: str):
    """(shape_id, seq, j, x_e4, y_e4): segment-start (j=0) plus
    interior points j=1..m-1 for every consecutive shape segment."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def synth(t: pa.Table) -> pa.Table:
        sid, seq, x, y = synth_shape_points(t["event_id"].to_numpy())
        return pa.table({"shape_id": sid, "seq": seq, "x_e4": x, "y_e4": y})

    pts = ev.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)

    def densify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shape_id", "seq"], kind="mergesort")
        sid = g["shape_id"].to_numpy(np.int64)
        seq = g["seq"].to_numpy(np.int64)
        x = g["x_e4"].to_numpy(np.int64)
        y = g["y_e4"].to_numpy(np.int64)
        m = (sid[1:] == sid[:-1]) & (seq[1:] == seq[:-1] + 1)
        i = np.flatnonzero(m)
        dx, dy = x[i + 1] - x[i], y[i + 1] - y[i]
        d2 = dx * dx + dy * dy
        r = np.floor(np.sqrt(d2.astype(np.float64))).astype(np.int64)
        r = r - (r * r > d2) + ((r + 1) * (r + 1) <= d2)
        parts = 1 + r // DENSIFY_D
        total = int(parts.sum())
        rep = np.repeat(np.arange(len(i)), parts)
        j = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(parts) - parts, parts
        )
        mm = parts[rep]
        out = pd.DataFrame(
            {
                "shape_id": sid[i][rep],
                "seq": seq[i][rep],
                "j": j,
                "x_e4": x[i][rep] + (dx[rep] * j) // mm,  # int64 //: floor
                "y_e4": y[i][rep] + (dy[rep] * j) // mm,
            }
        )
        return out.astype(np.int64)

    return sharded_map_groups(pts, "shape_id", densify)


def sql_shape_densify() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    base_y = _s_uint("sidu", _S_SLAT, 1_200_000)
    base_x = _s_uint("sidu", _S_SLON, 3_400_000)
    wy = _s_uint("eid", _S_WLAT, _WANDER)
    wx = _s_uint("eid", _S_WLON, _WANDER)
    d2 = ("(CAST(b.x_e4 - a.x_e4 AS BIGINT) * (b.x_e4 - a.x_e4)"
          " + CAST(b.y_e4 - a.y_e4 AS BIGINT) * (b.y_e4 - a.y_e4))")
    r0 = f"CAST(FLOOR(SQRT(CAST({d2} AS DOUBLE))) AS BIGINT)"
    rlen = (f"{r0} - CASE WHEN {r0} * {r0} > {d2} THEN 1 ELSE 0 END"
            f" + CASE WHEN ({r0} + 1) * ({r0} + 1) <= {d2} THEN 1 ELSE 0 END")
    fdx = "(dx * j - (((dx * j) % m + m) % m)) // m"
    fdy = "(dy * j - (((dy * j) % m + m) % m)) // m"
    return f"""
WITH raw AS (
  SELECT CAST(event_id AS UBIGINT) AS eid,
         CAST(CAST(event_id % {N_SHAPES} AS BIGINT) AS UBIGINT) AS sidu,
         CAST(event_id % {N_SHAPES} AS BIGINT) AS shape_id,
         CAST(event_id // {N_SHAPES} AS BIGINT) AS seq
  FROM events WHERE event_id // {N_SHAPES} < {SHAPE_PTS}
),
pts AS MATERIALIZED (
  SELECT shape_id, seq,
         ({base_x}) - 1700000 + ({wx}) - 5000 AS x_e4,
         ({base_y}) - 600000 + ({wy}) - 5000 AS y_e4
  FROM raw
),
seg AS (
  SELECT a.shape_id, a.seq, a.x_e4, a.y_e4,
         CAST(b.x_e4 - a.x_e4 AS BIGINT) AS dx,
         CAST(b.y_e4 - a.y_e4 AS BIGINT) AS dy,
         1 + ({rlen}) // {DENSIFY_D} AS m
  FROM pts a JOIN pts b ON b.shape_id = a.shape_id AND b.seq = a.seq + 1
)
SELECT shape_id, seq, CAST(j AS BIGINT) AS j,
       CAST(x_e4 + {fdx} AS BIGINT) AS x_e4,
       CAST(y_e4 + {fdy} AS BIGINT) AS y_e4
FROM (SELECT *, unnest(generate_series(0, m - 1)) AS j FROM seg)
ORDER BY shape_id, seq, j
"""


# --------------------------------------------------------------------------
# IDW interpolation surface (inverse-distance-weighted, exact integer)
# --------------------------------------------------------------------------

# Classic geostatistics gridding (Shepard 1968): a sparse set of
# "station" points carries a measured value; every grid cell gets the
# IDW estimate over the stations in its 3x3 cell neighborhood (the
# bounded-support variant — global IDW is an all-pairs scan and never
# ships at corpus scale). All arithmetic is exact integer: positions
# on the e4 grid, weight = WSCALE // (d2 + EPS) (floor), estimate =
# num * PSCALE // den computed in Python big-ints on the final
# grid-bounded table (<= nx*ny rows), so no intermediate can wrap.
# Lon wraps (minimal angular difference), lat clamps — the
# q_cell_smooth neighborhood convention.
IDW_LEVEL = 6                       # nx=64, ny=32
IDW_CW = 3600000 // (1 << IDW_LEVEL)  # 56250 e4 units/cell, both axes
IDW_EPS = 10**6                     # smoothing ~ (100 e4-units)^2
IDW_WSCALE = 10**12                 # w <= 1e6 per point
IDW_PSCALE = 10**6                  # fixed-point digits of the estimate
_S_IDW_SEL, _S_IDW_VAL = 340, 341
IDW_PCT = 5                         # ~5% of events are stations


def q_idw_surface(sf_dir: str):
    """(cell_rm, num, den, pred_fp) for every cell with >= 1 station
    in its 3x3 neighborhood: the exact-integer IDW estimate.

    One corpus pass emits 9 grid-bounded (cell, v*w, w) partials per
    station; the merge is grid-bounded (bounded_key_sum), and the
    final division runs in Python big-ints over <= nx*ny rows.

    Reference semantics analogue: osm2gtfs interpolates missing stop
    times between timed stops (`osm2gtfs/creators/trips_creator.py`
    linear interpolation); IDW is the spatial-field form of the same
    fill-from-neighbors estimate.
    """
    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.sources.pages import _uint

    nx, ny = 1 << IDW_LEVEL, 1 << (IDW_LEVEL - 1)

    def emit(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sel = _uint(ids, _S_IDW_SEL, 42, 100) < IDW_PCT
        ids = ids[sel]
        v = _uint(ids, _S_IDW_VAL, 42, 1000) + 1  # value in 1..1000
        k = ids.astype(np.int64)
        y = ((k * 7919) % 18000 - 9000) * 100    # e4 lat, exact int
        x = ((k * 104729) % 36000 - 18000) * 100  # e4 lon, exact int
        ix = (x + 1800000) // IDW_CW
        iy = (y + 900000) // IDW_CW
        ks, nums, dens = [], [], []
        for dy in (-1, 0, 1):
            ok = (iy + dy >= 0) & (iy + dy < ny)
            jy = iy[ok] + dy
            cy = jy * IDW_CW + IDW_CW // 2 - 900000
            for dx in (-1, 0, 1):
                jx = (ix[ok] + dx + nx) % nx
                cx = jx * IDW_CW + IDW_CW // 2 - 1800000
                dxd = ((cx - x[ok] + 5400000) % 3600000) - 1800000
                dyd = cy - y[ok]
                w = IDW_WSCALE // (dxd * dxd + dyd * dyd + IDW_EPS)
                ks.append(jy * nx + jx)
                nums.append(v[ok] * w)
                dens.append(w)
        return pa.table(
            {
                "cell_rm": np.concatenate(ks),
                "num": np.concatenate(nums),
                "den": np.concatenate(dens),
            }
        )

    ev = read_table(sf_dir, "events", columns=["event_id"])
    agg = bounded_key_sum(
        ev.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        "cell_rm", ["num", "den"],
        driver=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
    )

    def finalize(t: pa.Table) -> pa.Table:
        num = t["num"].to_numpy(zero_copy_only=False)
        den = t["den"].to_numpy(zero_copy_only=False)
        # grid-bounded stage (<= nx*ny rows): Python big-ints so
        # num * PSCALE can never wrap regardless of station density
        pred = np.fromiter(
            ((int(n) * IDW_PSCALE) // int(d) for n, d in zip(num, den)),
            dtype=np.int64, count=len(num),
        )
        return pa.table(
            {
                "cell_rm": pc.cast(t["cell_rm"], pa.int64()),
                "num": pc.cast(t["num"], pa.int64()),
                "den": pc.cast(t["den"], pa.int64()),
                "pred_fp": pred,
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def sql_idw_surface() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    nx, ny = 1 << IDW_LEVEL, 1 << (IDW_LEVEL - 1)
    sel = _s_uint("eid", _S_IDW_SEL, 100)
    val = _s_uint("eid", _S_IDW_VAL, 1000)
    return f"""
WITH
pts AS (
  SELECT CAST(event_id AS BIGINT) AS k, CAST(event_id AS UBIGINT) AS eid
  FROM events
  WHERE ({sel}) < {IDW_PCT}
),
pv AS (
  SELECT 1 + ({val}) AS v,
         ((k * 7919) % 18000 - 9000) * 100 AS y,
         ((k * 104729) % 36000 - 18000) * 100 AS x
  FROM pts
),
cells AS (
  SELECT *, (x + 1800000) // {IDW_CW} AS ix, (y + 900000) // {IDW_CW} AS iy
  FROM pv
),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                        (1,-1),(1,0),(1,1)),
contrib AS (
  SELECT (iy + dy) * {nx} + ((ix + dx + {nx}) % {nx}) AS cell_rm,
         v,
         ((((ix + dx + {nx}) % {nx}) * {IDW_CW} + {IDW_CW // 2} - 1800000
           - x + 5400000) % 3600000) - 1800000 AS dxd,
         (iy + dy) * {IDW_CW} + {IDW_CW // 2} - 900000 - y AS dyd
  FROM cells CROSS JOIN offs
  WHERE iy + dy >= 0 AND iy + dy < {ny}
),
wt AS (
  SELECT cell_rm, v,
         CAST({IDW_WSCALE} AS HUGEINT)
           // (dxd * dxd + dyd * dyd + {IDW_EPS}) AS wgt
  FROM contrib
)
SELECT CAST(cell_rm AS BIGINT) AS cell_rm,
       CAST(SUM(v * wgt) AS BIGINT) AS num,
       CAST(SUM(wgt) AS BIGINT) AS den,
       CAST((SUM(v * wgt) * {IDW_PSCALE}) // SUM(wgt) AS BIGINT) AS pred_fp
FROM wt
GROUP BY cell_rm
ORDER BY cell_rm"""


# --------------------------------------------------------------------------
# Getis-Ord Gi* hot/cold-spot statistic (exact integer numerator)
# --------------------------------------------------------------------------

# The other canonical LISA statistic next to local Moran's I
# (q_local_moran): Gi*(i) compares the 3x3-ring sum around cell i
# (INCLUDING i — the star variant) against the expectation under the
# global mean, flagging concentration of high values (hot) or low
# values (cold). With x_j the per-cell event count, N = nx*ny study
# cells and W_i the realized ring size (9 interior, 6 on a lat edge;
# lon wraps), the exact integer score is
#   gi_num(i) = N * ringsum(i) - W_i * total
# (the z-score numerator scaled by N — sign and ordering preserved,
# no division, no float). int64 bound: N = 32768 cells, so
# gi_num <= N * total — safe while total events < 2.8e14 per run.
# Cells with an empty ring score gi_num = -W_i * total < 0 but carry
# no observed mass; like q_cell_smooth we emit only ringsum > 0 cells
# (the oracle mirrors the same support).
_GIS_LEVEL = CELL_LEVEL  # 256 x 128, reuse the smooth-grid counts


def q_gi_star(sf_dir: str):
    """(cell_rm, w, ringsum, gi_num) per cell with >= 1 event in its
    3x3 ring: the exact Getis-Ord Gi* numerator (hot > 0 > cold)."""
    nx, ny = 1 << _GIS_LEVEL, 1 << (_GIS_LEVEL - 1)
    counts = _smooth_counts(sf_dir)  # one corpus pass, grid-bounded
    total = counts.sum("n")  # grid-bounded aggregate (<= nx*ny rows)
    n_cells = nx * ny

    def emit(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.cast(t["n"], pa.int64()).to_numpy(zero_copy_only=False)
        iy, ix = key // nx, key % nx
        ks, ps = [], []
        for dy in (-1, 0, 1):
            ok = (iy + dy >= 0) & (iy + dy < ny)
            for dx in (-1, 0, 1):
                ks.append((iy[ok] + dy) * nx + (ix[ok] + dx + nx) % nx)
                ps.append(n[ok])
        return pa.table(
            {"cell_rm": np.concatenate(ks), "p": np.concatenate(ps)}
        )

    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    rings = bounded_key_sum(
        counts.map_batches(emit, batch_format="pyarrow"),
        "cell_rm", ["p"],
        driver=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
        out_names=["ringsum"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        key = pc.cast(t["cell_rm"], pa.int64()).to_numpy(zero_copy_only=False)
        ring = pc.cast(t["ringsum"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        iy = key // nx
        w = np.where((iy == 0) | (iy == ny - 1), 6, 9).astype(np.int64)
        return pa.table(
            {
                "cell_rm": key,
                "w": w,
                "ringsum": ring,
                "gi_num": n_cells * ring - w * total,
            }
        )

    return rings.map_batches(finalize, batch_format="pyarrow")


def sql_gi_star() -> str:
    nx, ny = 1 << _GIS_LEVEL, 1 << (_GIS_LEVEL - 1)
    return f"""
WITH c AS (
  SELECT CAST(
           LEAST(CAST(FLOOR(((lat + 90.0) / 180.0) * {ny}) AS BIGINT),
                 {ny - 1}) AS BIGINT) AS iy,
         CAST(
           LEAST(CAST(FLOOR(((lon + 180.0) / 360.0) * {nx}) AS BIGINT),
                 {nx - 1}) AS BIGINT) AS ix,
         COUNT(*) AS n
  FROM (
    SELECT {_LAT_SQL.format(k='event_id')} AS lat,
           {_LON_SQL.format(k='event_id')} AS lon
    FROM events
  )
  GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS total FROM c),
o(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)),
ring AS (
  SELECT (c.iy + o.dy) * {nx} + ((c.ix + o.dx + {nx}) % {nx}) AS cell_rm,
         CAST(SUM(c.n) AS BIGINT) AS ringsum
  FROM c JOIN o ON c.iy + o.dy >= 0 AND c.iy + o.dy < {ny}
  GROUP BY 1
)
SELECT cell_rm,
       CAST(CASE WHEN cell_rm // {nx} IN (0, {ny - 1}) THEN 6 ELSE 9 END
            AS BIGINT) AS w,
       ringsum,
       CAST({nx * ny} * ringsum
            - (CASE WHEN cell_rm // {nx} IN (0, {ny - 1}) THEN 6 ELSE 9 END)
              * tot.total AS BIGINT) AS gi_num
FROM ring, tot
ORDER BY cell_rm"""
