"""Spatial-statistics operators with SQL oracles.

Four classic geo-engine operations the reference's spatial layer
implies but Ray Data lacks natively, each expressed Ray-Data-first
over the driver's integer-keyed synthetic geometry (the geo_queries
convention: coordinates derived from keys with EXPRESSION-IDENTICAL
arithmetic on both sides, everything integer-exact):

- Ripley's K pair counts (point-pattern clustering statistic): PBSM
  cell partition + 3x3 neighbor replication, per-cell vectorized pair
  counting, bounded (4-row) global reduce. Reference analogue: the
  kNN/cluster distance scans (osm2gtfs/core/osm_connector.py ~540s
  use distance thresholds over stop sets).
- Envelope overlap join (rectangle intersection self-join): the
  PBSM (Partition-Based Spatial Merge) grid join with the classic
  min-corner deduplication rule — the standard distributed spatial
  join building block.
- Quadkey tiling (Bing-style tile addressing): per-event quadkey at a
  fixed zoom, bounded-key count. Complements the Morton cell index
  (geo/cells.py) with the string-addressed pyramid form.
- DDA line rasterization: polyline segments -> grid cell hit counts
  (raster<->vector north-rule family, the line-drawing complement of
  stages/rasterize.py's polygon fill).

Every operator is a map_batches synthesis + one bounded shuffle; no
driver-side row loops; all arithmetic int64-exact with canonical-
residue floor division on the SQL side for negative operands (the
q_morans_i rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.sources.tables import read_table


def _events_n(sf_dir: str) -> int:
    """Events row count from parquet metadata only (no scan)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows


# --------------------------------------------------------------------------
# Ripley's K pair counts at multiple radii
# --------------------------------------------------------------------------
# Points are hash-scattered over the e2 grid (splitmix via
# sources.pages._uint — NOT the (eid*prime)%mod lattice used by the
# bbox/envelope family: that lattice's minimum pair distance exceeds
# RIP_RMAX at small n, making every count zero; a point-pattern
# statistic needs genuine uniform scatter). Distributed
# plan: grid cells of side RIP_RMAX; each point is replicated to its
# 3x3 neighborhood ("guest" rows) and kept once as a "home" row; a
# qualifying unordered pair (a,b), id_a < id_b, d <= r <= RIP_RMAX is
# counted exactly once — in the home cell of a, where b is guaranteed
# present (either home or guest). Per-cell counting is an O(k^2)
# numpy broadcast (k is bounded by density x cell area; at planetary
# density raise the grid level and widen the guest ring accordingly —
# the ring span in cells must stay >= RIP_RMAX / cell_side).
# K(r) = AREA * 2 * n_pairs / (n * (n-1)) in 1e9 fixed point, exact
# via Python big ints on the final 4-row table.

RIP_RADII = (25, 50, 100, 200)  # e2 units (0.25 .. 2 deg)
_RIP_SX, _RIP_SY = 320, 321
RIP_RMAX = 200
_RIP_NCX = 36000 // RIP_RMAX    # 180
_RIP_NCY = 18000 // RIP_RMAX    # 90
_RIP_AREA = 36000 * 18000
RIP_SCALE = 10**9


def q_ripley_k(sf_dir: str):
    """(r, n_pairs, k_fp): unordered point pairs within r, and the
    Ripley K estimate AREA*2*n_pairs/(n*(n-1)) in 1e9 fixed point."""
    from ray.data.aggregate import Sum

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _uint

    n_total = _events_n(sf_dir)
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def replicate(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ek = eid.astype(np.uint64)
        x = _uint(ek, _RIP_SX, 42, 36000)
        y = _uint(ek, _RIP_SY, 42, 18000)
        cx, cy = x // RIP_RMAX, y // RIP_RMAX
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = cx + dx, cy + dy
                m = (gx >= 0) & (gx < _RIP_NCX) & (gy >= 0) & (gy < _RIP_NCY)
                parts.append(
                    pd.DataFrame(
                        {
                            "cell": gy[m] * _RIP_NCX + gx[m],
                            "pid": eid[m],
                            "x": x[m],
                            "y": y[m],
                            "home": np.full(
                                int(m.sum()), dx == 0 and dy == 0, dtype=bool
                            ),
                        }
                    )
                )
        return pd.concat(parts, ignore_index=True)

    pts = ev.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    radii = np.asarray(RIP_RADII, dtype=np.int64)

    def count_shard(g: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(radii), dtype=np.int64)
        for _, gc in g.groupby("cell", sort=False):
            hm = gc["home"].to_numpy()
            if not hm.any():
                continue
            pid = gc["pid"].to_numpy(np.int64)
            x = gc["x"].to_numpy(np.int64)
            y = gc["y"].to_numpy(np.int64)
            ha = np.flatnonzero(hm)
            dx = x[ha][:, None] - x[None, :]
            dy = y[ha][:, None] - y[None, :]
            d2 = dx * dx + dy * dy
            newer = pid[None, :] > pid[ha][:, None]
            for i, r in enumerate(radii):
                counts[i] += int((newer & (d2 <= r * r)).sum())
        return pd.DataFrame({"r": radii, "n_pairs": counts})

    parts = sharded_map_groups(pts, "cell", count_shard)
    agg = parts.groupby("r").aggregate(Sum("n_pairs", alias_name="n_pairs"))

    def finalize(t: pa.Table) -> pa.Table:
        r = t["r"].to_pylist()
        np_ = t["n_pairs"].to_pylist()
        k_fp = [
            (2 * _RIP_AREA * int(c) * RIP_SCALE) // (n_total * (n_total - 1))
            for c in np_
        ]
        return pa.table(
            {
                "r": pa.array([int(v) for v in r], pa.int64()),
                "n_pairs": pa.array([int(v) for v in np_], pa.int64()),
                "k_fp": pa.array(k_fp, pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("r")


def sql_ripley_k() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    vals = ",".join(f"({r})" for r in RIP_RADII)
    sx = _s_uint("CAST(event_id AS UBIGINT)", _RIP_SX, 36000)
    sy = _s_uint("CAST(event_id AS UBIGINT)", _RIP_SY, 18000)
    return f"""
WITH p AS (
  SELECT event_id AS pid, ({sx}) AS x, ({sy}) AS y
  FROM events
),
pr AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM p a JOIN p b
    ON b.pid > a.pid
   AND b.x BETWEEN a.x - {RIP_RMAX} AND a.x + {RIP_RMAX}
   AND b.y BETWEEN a.y - {RIP_RMAX} AND a.y + {RIP_RMAX}
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {RIP_RMAX * RIP_RMAX}
),
n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM events),
cnt AS (
  SELECT rr.r, CAST(COUNT(pr.d2) AS HUGEINT) AS n_pairs
  FROM (VALUES {vals}) rr(r) LEFT JOIN pr ON pr.d2 <= rr.r * rr.r
  GROUP BY rr.r
)
SELECT CAST(cnt.r AS BIGINT) AS r,
       CAST(cnt.n_pairs AS BIGINT) AS n_pairs,
       CAST((2::HUGEINT * {_RIP_AREA} * cnt.n_pairs * {RIP_SCALE})
            // (n.n * (n.n - 1)) AS BIGINT) AS k_fp
FROM cnt, n
ORDER BY r
"""


# --------------------------------------------------------------------------
# Envelope overlap join (PBSM rectangle intersection self-join)
# --------------------------------------------------------------------------
# Each user gets a home (hx, hy) uniform in [0, ENV_DOM)^2 and every
# ping deviates by at most ENV_W from it, so the per-user envelope is
# a box of side <= 2*ENV_W. The join finds user pairs whose envelopes
# intersect (touching counts; width/height >= 0). Distributed plan:
# coarse grid of side ENV_CELL > 2*ENV_W (every box touches <= 2x2
# cells); each envelope is replicated to the cells it covers; a pair
# is reported only in the cell containing the intersection's min
# corner (GREATEST(x_min), GREATEST(y_min)) — the PBSM dedup rule, so
# one output row per pair with no post-shuffle distinct. Within-cell
# matching is an O(k^2) broadcast; k is users-per-cell — at planetary
# user counts shrink ENV_CELL toward 2*ENV_W and/or sweep by x_min.

ENV_DOM = 500_000            # e4 units (~50 deg-equivalents, planar)
ENV_W = 30_000               # max ping deviation from home
ENV_CELL = 125_000           # PBSM grid cell side (> 2*ENV_W)
_ENV_NC = ENV_DOM // ENV_CELL  # 4 (grid is _ENV_NC x _ENV_NC)
_ENV_HX, _ENV_HY, _ENV_DX, _ENV_DY = 310, 311, 312, 313


def q_envelope_overlaps(sf_dir: str):
    """(u1, u2, ix_w, iy_h, ix_area): user pairs with intersecting
    ping envelopes and the intersection rectangle's dimensions."""
    from ray.data.aggregate import Max, Min

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _uint

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def partials(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dx = _uint(eid, _ENV_DX, 42, 2 * ENV_W + 1) - ENV_W
        dy = _uint(eid, _ENV_DY, 42, 2 * ENV_W + 1) - ENV_W
        g = (
            pa.table(
                {"user_id": t["user_id"], "a": dx, "b": dy, "c": dx, "d": dy}
            )
            .group_by("user_id")
            .aggregate([("a", "min"), ("b", "min"), ("c", "max"), ("d", "max")])
        )
        return g.rename_columns(
            ["user_id", "dx_min", "dy_min", "dx_max", "dy_max"]
        )

    env = (
        ev.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Min("dx_min", alias_name="dx_min"),
            Min("dy_min", alias_name="dy_min"),
            Max("dx_max", alias_name="dx_max"),
            Max("dy_max", alias_name="dy_max"),
        )
    )

    def to_cells(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk = uid.astype(np.uint64)
        hx = _uint(uk, _ENV_HX, 42, ENV_DOM)
        hy = _uint(uk, _ENV_HY, 42, ENV_DOM)
        x0 = hx + t["dx_min"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = hx + t["dx_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        y0 = hy + t["dy_min"].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = hy + t["dy_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        # coordinates may exit [0, ENV_DOM) by < ENV_W: clip cell ids
        cx0 = np.clip(x0 // ENV_CELL, 0, _ENV_NC - 1)
        cx1 = np.clip(x1 // ENV_CELL, 0, _ENV_NC - 1)
        cy0 = np.clip(y0 // ENV_CELL, 0, _ENV_NC - 1)
        cy1 = np.clip(y1 // ENV_CELL, 0, _ENV_NC - 1)
        parts = []
        for ox in (0, 1):
            for oy in (0, 1):
                gx, gy = cx0 + ox, cy0 + oy
                m = (gx <= cx1) & (gy <= cy1)
                parts.append(
                    pd.DataFrame(
                        {
                            "cell": gy[m] * _ENV_NC + gx[m],
                            "user_id": uid[m],
                            "x_min": x0[m],
                            "y_min": y0[m],
                            "x_max": x1[m],
                            "y_max": y1[m],
                        }
                    )
                )
        return pd.concat(parts, ignore_index=True)

    boxes = env.map_batches(to_cells, batch_format="pyarrow")

    def join_shard(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell, gc in g.groupby("cell", sort=False):
            if len(gc) < 2:
                continue
            uid = gc["user_id"].to_numpy(np.int64)
            x0 = gc["x_min"].to_numpy(np.int64)
            y0 = gc["y_min"].to_numpy(np.int64)
            x1 = gc["x_max"].to_numpy(np.int64)
            y1 = gc["y_max"].to_numpy(np.int64)
            lt = uid[:, None] < uid[None, :]
            hit = (
                lt
                & (x0[:, None] <= x1[None, :])
                & (x0[None, :] <= x1[:, None])
                & (y0[:, None] <= y1[None, :])
                & (y0[None, :] <= y1[:, None])
            )
            mx = np.maximum(x0[:, None], x0[None, :])
            my = np.maximum(y0[:, None], y0[None, :])
            cellx, celly = int(cell) % _ENV_NC, int(cell) // _ENV_NC
            owns = (
                (np.clip(mx // ENV_CELL, 0, _ENV_NC - 1) == cellx)
                & (np.clip(my // ENV_CELL, 0, _ENV_NC - 1) == celly)
            )
            ai, bi = np.nonzero(hit & owns)
            if len(ai) == 0:
                continue
            w = np.minimum(x1[ai], x1[bi]) - mx[ai, bi]
            h = np.minimum(y1[ai], y1[bi]) - my[ai, bi]
            outs.append(
                pd.DataFrame(
                    {
                        "u1": uid[ai],
                        "u2": uid[bi],
                        "ix_w": w,
                        "iy_h": h,
                        "ix_area": w * h,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    c: pd.Series(dtype=np.int64)
                    for c in ["u1", "u2", "ix_w", "iy_h", "ix_area"]
                }
            )
        return pd.concat(outs, ignore_index=True)

    return sharded_map_groups(boxes, "cell", join_shard).sort(["u1", "u2"])


def sql_envelope_overlaps() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    dx = _s_uint("CAST(event_id AS UBIGINT)", _ENV_DX, 2 * ENV_W + 1)
    dy = _s_uint("CAST(event_id AS UBIGINT)", _ENV_DY, 2 * ENV_W + 1)
    hx = _s_uint("CAST(user_id AS UBIGINT)", _ENV_HX, ENV_DOM)
    hy = _s_uint("CAST(user_id AS UBIGINT)", _ENV_HY, ENV_DOM)
    return f"""
WITH pings AS (
  SELECT user_id, ({dx}) - {ENV_W} AS dx, ({dy}) - {ENV_W} AS dy
  FROM events
),
env AS (
  SELECT user_id,
         ({hx}) + MIN(dx) AS x_min, ({hx}) + MAX(dx) AS x_max,
         ({hy}) + MIN(dy) AS y_min, ({hy}) + MAX(dy) AS y_max
  FROM pings GROUP BY user_id
)
SELECT a.user_id AS u1, b.user_id AS u2,
       LEAST(a.x_max, b.x_max) - GREATEST(a.x_min, b.x_min) AS ix_w,
       LEAST(a.y_max, b.y_max) - GREATEST(a.y_min, b.y_min) AS iy_h,
       (LEAST(a.x_max, b.x_max) - GREATEST(a.x_min, b.x_min))
       * (LEAST(a.y_max, b.y_max) - GREATEST(a.y_min, b.y_min)) AS ix_area
FROM env a JOIN env b
  ON b.user_id > a.user_id
 AND a.x_min <= b.x_max AND b.x_min <= a.x_max
 AND a.y_min <= b.y_max AND b.y_min <= a.y_max
ORDER BY u1, u2
"""


# --------------------------------------------------------------------------
# Quadkey tiling (Bing-style string tile addresses)
# --------------------------------------------------------------------------
# Per-event tile at zoom QK_Z over the normalized [0,1)^2 domain
# (ix = x * 2^z // 36000, iy = y * 2^z // 18000 — exact integer), then
# the standard quadkey digit interleave d_k = bit_k(ix) + 2*bit_k(iy),
# MSB first. The digit string is built as a decimal code (digits are
# 0..3, so base-10 positional packing is collision-free) and LPAD'ed —
# identical on both sides. Count per quadkey is a bounded-key (4^z)
# partial-then-global aggregate: the shuffle moves <= 4^z rows per
# block, never the events.

QK_Z = 6


def q_quadkey_counts(sf_dir: str):
    """(quadkey, n): events per Bing-style quadkey at zoom QK_Z."""
    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", columns=["event_id"])
    side = 1 << QK_Z

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 104729) % 36000
        y = (eid * 7919) % 18000
        ix = x * side // 36000
        iy = y * side // 18000
        code = np.zeros(len(eid), dtype=np.int64)
        for k in range(QK_Z - 1, -1, -1):
            d = ((ix >> k) & 1) + 2 * ((iy >> k) & 1)
            code = code * 10 + d
        g = (
            pa.table({"qk_code": code})
            .group_by("qk_code")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["qk_code", "n"])

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qk_code")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        qk = pc.utf8_lpad(
            pc.cast(pc.cast(t["qk_code"], pa.int64()), pa.string()), QK_Z, "0"
        )
        return pa.table({"quadkey": qk, "n": pc.cast(t["n"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("quadkey")


def sql_quadkey_counts() -> str:
    side = 1 << QK_Z
    digits = " || ".join(
        f"CAST(((ix // {1 << k}) % 2) + 2 * ((iy // {1 << k}) % 2) AS VARCHAR)"
        for k in range(QK_Z - 1, -1, -1)
    )
    return f"""
WITH t AS (
  SELECT (((event_id * 104729) % 36000) * {side}) // 36000 AS ix,
         (((event_id * 7919) % 18000) * {side}) // 18000 AS iy
  FROM events
)
SELECT {digits} AS quadkey, CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY 1 ORDER BY quadkey
"""


# --------------------------------------------------------------------------
# DDA line rasterization: polyline segments -> cell hit counts
# --------------------------------------------------------------------------
# The line-drawing complement of stages/rasterize.py's polygon fill:
# every consecutive shape segment (synth_shape_points geometry, the
# shape_length/simplify/densify family) is rasterized onto a RES-unit
# grid with the integer DDA — s = max(|dcx|, |dcy|) steps, each minor
# axis advanced by round(d*t/s) computed as floor((2*d*t + s)/(2*s))
# with the canonical-residue floor identity on the SQL side (d may be
# negative). Exactly one cell per step per segment (the major axis
# advances by 1 each step), so the emission count per segment is
# s + 1; shared endpoints of consecutive segments are counted per
# segment, deterministically. Output is the bounded grid histogram —
# partial counts per batch-group, then a small key-hash shuffle.

RAST_RES = 500  # e4 units per cell (0.05 deg)


def q_raster_lines(sf_dir: str):
    """(cell_x, cell_y, n_hits): DDA-rasterized shape segment hits
    per RES-unit grid cell."""
    from ray.data.aggregate import Sum

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.pipelines.geo_queries import synth_shape_points

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def synth(t: pa.Table) -> pa.Table:
        sid, seq, x, y = synth_shape_points(t["event_id"].to_numpy())
        return pa.table({"shape_id": sid, "seq": seq, "x_e4": x, "y_e4": y})

    pts = ev.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)

    def rasterize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shape_id", "seq"], kind="mergesort")
        sid = g["shape_id"].to_numpy(np.int64)
        seq = g["seq"].to_numpy(np.int64)
        cx = g["x_e4"].to_numpy(np.int64) // RAST_RES  # // floors
        cy = g["y_e4"].to_numpy(np.int64) // RAST_RES
        m = (sid[1:] == sid[:-1]) & (seq[1:] == seq[:-1] + 1)
        i = np.flatnonzero(m)
        dx, dy = cx[i + 1] - cx[i], cy[i + 1] - cy[i]
        s = np.maximum(np.abs(dx), np.abs(dy))
        parts = s + 1
        total = int(parts.sum())
        rep = np.repeat(np.arange(len(i)), parts)
        t = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(parts) - parts, parts
        )
        sr = s[rep]
        live = sr > 0
        ox = np.zeros(total, dtype=np.int64)
        oy = np.zeros(total, dtype=np.int64)
        # int64 //: floor, matching the SQL canonical-residue form
        ox[live] = (2 * dx[rep][live] * t[live] + sr[live]) // (2 * sr[live])
        oy[live] = (2 * dy[rep][live] * t[live] + sr[live]) // (2 * sr[live])
        out = pd.DataFrame(
            {
                "cell_x": cx[i][rep] + ox,
                "cell_y": cy[i][rep] + oy,
                "n_hits": np.ones(total, np.int64),
            }
        )
        return out.groupby(["cell_x", "cell_y"], sort=False, as_index=False).sum()

    parts = sharded_map_groups(pts, "shape_id", rasterize)
    return (
        parts.groupby(["cell_x", "cell_y"])
        .aggregate(Sum("n_hits", alias_name="n_hits"))
        .sort(["cell_x", "cell_y"])
    )


def sql_raster_lines() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint
    from osm2gtfs_ray.pipelines.geo_queries import (
        _S_SLAT,
        _S_SLON,
        _S_WLAT,
        _S_WLON,
        _WANDER,
        N_SHAPES,
        SHAPE_PTS,
    )

    base_y = _s_uint("sidu", _S_SLAT, 1_200_000)
    base_x = _s_uint("sidu", _S_SLON, 3_400_000)
    wy = _s_uint("eid", _S_WLAT, _WANDER)
    wx = _s_uint("eid", _S_WLON, _WANDER)
    R = RAST_RES

    def fdiv(n: str, d: str) -> str:
        return f"(({n}) - (((({n}) % ({d})) + ({d})) % ({d}))) // ({d})"

    cell = lambda e: fdiv(e, str(R))  # noqa: E731
    ox = fdiv("2 * dx * t + s", "2 * s")
    oy = fdiv("2 * dy * t + s", "2 * s")
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
         {cell(f"({base_x}) - 1700000 + ({wx}) - 5000")} AS cx,
         {cell(f"({base_y}) - 600000 + ({wy}) - 5000")} AS cy
  FROM raw
),
seg AS (
  SELECT a.cx, a.cy, b.cx - a.cx AS dx, b.cy - a.cy AS dy,
         GREATEST(ABS(b.cx - a.cx), ABS(b.cy - a.cy)) AS s
  FROM pts a JOIN pts b ON b.shape_id = a.shape_id AND b.seq = a.seq + 1
),
hits AS (
  SELECT cx + CASE WHEN s > 0 THEN {ox} ELSE 0 END AS cell_x,
         cy + CASE WHEN s > 0 THEN {oy} ELSE 0 END AS cell_y
  FROM (SELECT *, unnest(generate_series(0, s)) AS t FROM seg)
)
SELECT CAST(cell_x AS BIGINT) AS cell_x, CAST(cell_y AS BIGINT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_hits
FROM hits GROUP BY 1, 2 ORDER BY cell_x, cell_y
"""
