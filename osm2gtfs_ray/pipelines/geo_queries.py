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
