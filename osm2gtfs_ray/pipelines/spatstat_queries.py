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

# Shared e2-lattice grid for the KDE / region operators below: the
# (event_id * prime) % extent scatter used by quadkey/user_envelope,
# bucketed at GRID_RES into a bounded GRID_NX x GRID_NY raster.
GRID_RES = 500
GRID_NX = 36000 // GRID_RES   # 72
GRID_NY = 18000 // GRID_RES   # 36


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


# --------------------------------------------------------------------------
# Discrete KDE: triangular-kernel density surface over the event grid
# --------------------------------------------------------------------------
# The heatmap/kernel-density primitive (hotspot mapping, the weighted
# generalization of q_cell_smooth's 3x3 box sum): every occupied cell
# scatters its count to the (2*KDE_R+1)^2 neighborhood with integer
# triangular weights w = KDE_R + 1 - chebyshev(offset), border-clipped
# (no wrap). Distributed plan: per-batch cell partials (map-side
# combine), 25-offset weighted emission over the BOUNDED cell partial
# table, then a bounded-key sum — the corpus is touched exactly once
# and the shuffle moves <= grid-size rows per block.

KDE_R = 2  # kernel radius in cells; weights KDE_R+1 .. 1


def q_kde_density(sf_dir: str):
    """(cell_x, cell_y, kde): integer triangular-kernel density — sum
    over events within Chebyshev ring KDE_R of (KDE_R+1 - ring)."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = ((eid * 104729) % 36000) // GRID_RES
        cy = ((eid * 7919) % 18000) // GRID_RES
        g = (
            pa.table({"cell": cy * GRID_NX + cx})
            .group_by("cell")
            .aggregate([([], "count_all")])
        )
        cell = g["cell"].to_numpy(zero_copy_only=False)
        n = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        bx, by = cell % GRID_NX, cell // GRID_NX
        ks, ws = [], []
        for dx in range(-KDE_R, KDE_R + 1):
            for dy in range(-KDE_R, KDE_R + 1):
                gx, gy = bx + dx, by + dy
                m = (gx >= 0) & (gx < GRID_NX) & (gy >= 0) & (gy < GRID_NY)
                ks.append(gy[m] * GRID_NX + gx[m])
                ws.append(n[m] * (KDE_R + 1 - max(abs(dx), abs(dy))))
        out = (
            pa.table({"cell": np.concatenate(ks), "w": np.concatenate(ws)})
            .group_by("cell")
            .aggregate([("w", "sum")])
        )
        return out.rename_columns(["cell", "partial"])

    agg = bounded_key_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "cell", ["partial"],
        driver=_events_n(sf_dir) <= _GRID_DRIVER_ROWS,
        out_names=["kde"],
    )

    def finish(t: pa.Table) -> pa.Table:
        cell = (
            pc.cast(t["cell"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "cell_x": cell % GRID_NX,
                "cell_y": cell // GRID_NX,
                "kde": pc.cast(t["kde"], pa.int64()),
            }
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["cell_x", "cell_y"])
    )


def sql_kde_density() -> str:
    return f"""
WITH cnt AS (
  SELECT ((event_id * 104729) % 36000) // {GRID_RES} AS cx,
         ((event_id * 7919) % 18000) // {GRID_RES} AS cy,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
hits AS (
  SELECT c.cx + o1.dx AS cell_x, c.cy + o2.dy AS cell_y,
         c.n * ({KDE_R + 1} - GREATEST(ABS(o1.dx), ABS(o2.dy))) AS w
  FROM cnt c
  CROSS JOIN generate_series(-{KDE_R}, {KDE_R}) o1(dx)
  CROSS JOIN generate_series(-{KDE_R}, {KDE_R}) o2(dy)
  WHERE c.cx + o1.dx BETWEEN 0 AND {GRID_NX - 1}
    AND c.cy + o2.dy BETWEEN 0 AND {GRID_NY - 1}
)
SELECT CAST(cell_x AS BIGINT) AS cell_x, CAST(cell_y AS BIGINT) AS cell_y,
       CAST(SUM(w) AS BIGINT) AS kde
FROM hits GROUP BY 1, 2 ORDER BY cell_x, cell_y
"""


# --------------------------------------------------------------------------
# Raster regions: connected components of a percolation mask
# --------------------------------------------------------------------------
# The raster region-labeling primitive (GIS "clump"/zonal statistics):
# a deterministic site-percolation mask over the bounded grid (cell
# occupied iff splitmix(cid) % 100 < RR_P; RR_P below the 2D site
# percolation threshold ~59.3 so regions stay small), 4-connected
# components labeled by MIN cell id, then zonal event counts per
# region. The mask and its labeling are pure functions of GRID
# CONSTANTS (zero data touched; recomputed identically on any node at
# ~microsecond cost), so the label table rides into map_batches as a
# broadcast constant; the data-side work — event -> cell -> region ->
# count — is one pass of bounded-key partials plus a bounded-key sum.
# The SQL oracle re-derives mask, components (recursive min-label
# closure, the _sql_components_over discipline) and zonal counts from
# scratch.

RR_P = 45        # occupancy percentage (subcritical: pc ~ 59.3)
_RR_STREAM = 330


def _region_labels() -> np.ndarray:
    """label[cid] = min cell id of cid's 4-connected occupied region,
    -1 for unoccupied cells. Pure function of grid constants."""
    from osm2gtfs_ray.sources.pages import _uint

    cid = np.arange(GRID_NX * GRID_NY, dtype=np.int64)
    occ = (_uint(cid.astype(np.uint64), _RR_STREAM, 42, 100) < RR_P).reshape(
        GRID_NY, GRID_NX
    )
    lbl = np.where(occ, cid.reshape(GRID_NY, GRID_NX), np.int64(2**62))
    while True:
        nxt = lbl.copy()
        nxt[1:] = np.minimum(nxt[1:], lbl[:-1])
        nxt[:-1] = np.minimum(nxt[:-1], lbl[1:])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], lbl[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], lbl[:, 1:])
        nxt = np.where(occ, nxt, np.int64(2**62))
        if (nxt == lbl).all():
            break
        lbl = nxt
    return np.where(occ, lbl, np.int64(-1)).ravel()


def q_raster_regions(sf_dir: str):
    """(region, n_cells, n_events): 4-connected percolation regions
    (labeled by min cell id) with cell and zonal event counts; regions
    with zero events included."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS

    labels = _region_labels()
    ev = read_table(sf_dir, "events", columns=["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = ((eid * 104729) % 36000) // GRID_RES
        cy = ((eid * 7919) % 18000) // GRID_RES
        reg = labels[cy * GRID_NX + cx]
        g = (
            pa.table({"region": reg[reg >= 0]})
            .group_by("region")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["region", "partial"])

    agg = bounded_key_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "region", ["partial"],
        driver=_events_n(sf_dir) <= _GRID_DRIVER_ROWS,
        out_names=["n_events"],
    )

    occ = labels[labels >= 0]
    regs, n_cells = np.unique(occ, return_counts=True)
    sizes = pd.DataFrame(
        {"region": regs, "n_cells": n_cells.astype(np.int64)}
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = sizes.merge(df, on="region", how="left")
        out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
        return out

    return (
        agg.repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
        .sort("region")
    )


def sql_raster_regions() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    occ_pred = _s_uint("CAST(i AS UBIGINT)", _RR_STREAM, 100)
    nc = GRID_NX * GRID_NY
    return f"""
WITH RECURSIVE
occ AS (
  SELECT i AS cid FROM generate_series(0, {nc - 1}) t(i)
  WHERE ({occ_pred}) < {RR_P}
),
adj AS (
  SELECT a.cid AS a, b.cid AS b FROM occ a JOIN occ b
    ON (b.cid = a.cid + 1 AND a.cid % {GRID_NX} < {GRID_NX - 1})
    OR (b.cid = a.cid - 1 AND a.cid % {GRID_NX} > 0)
    OR b.cid = a.cid + {GRID_NX} OR b.cid = a.cid - {GRID_NX}
),
reach(node, m) AS (
  SELECT cid, cid FROM occ
  UNION
  SELECT r.node, a.b FROM reach r JOIN adj a ON a.a = r.m
),
comp AS (SELECT node, MIN(m) AS region FROM reach GROUP BY node),
sizes AS (SELECT region, COUNT(*) AS n_cells FROM comp GROUP BY region),
ev AS (
  SELECT (((event_id * 7919) % 18000) // {GRID_RES}) * {GRID_NX}
         + ((event_id * 104729) % 36000) // {GRID_RES} AS cid
  FROM events
),
evc AS (
  SELECT c.region, COUNT(*) AS n_events
  FROM ev JOIN comp c ON c.node = ev.cid GROUP BY c.region
)
SELECT CAST(s.region AS BIGINT) AS region,
       CAST(s.n_cells AS BIGINT) AS n_cells,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events
FROM sizes s LEFT JOIN evc e ON e.region = s.region
ORDER BY region
"""


# --------------------------------------------------------------------------
# Theil-Sen robust trend per cell (median of pairwise slopes)
# --------------------------------------------------------------------------
# The robust companion to q_cell_trend's least-squares slope (emerging
# hot-spot analysis uses exactly this pair: OLS slope + Mann-Kendall /
# Theil-Sen confirmation). Per cell: daily event counts over nonzero
# days, all C(n_days, 2) pairwise slopes quantized to fixed point
# (floor((c2-c1)*SCALE/(d2-d1)), canonical-residue floor in SQL for
# negative numerators), LOWER MEDIAN (index (k-1)//2 of the sorted
# slopes; the SQL picks ROW_NUMBER (k+1)//2 — same element). Active
# days per cell are bounded by the window, so pairs per cell are
# O(days^2) bounded and the shape is ONE (cell, day) map-side-combined
# shuffle + grid-bounded finalize — the q_cell_trend plan with a
# different per-cell kernel.

TS_SCALE = 10**6
TS_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def q_theil_sen(sf_dir: str):
    """(cell, n_days, n_pairs, theil_fp): per-cell lower-median
    pairwise daily-count slope in 1e6 fixed point (cells with >= 2
    active days)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        cx = ((eid * 104729) % 36000) // GRID_RES
        cy = ((eid * 7919) % 18000) // GRID_RES
        tu = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        day = (tu - TS_EPOCH_US) // 86_400_000_000
        part = pd.DataFrame(
            {
                "cell": cy * GRID_NX + cx,
                "day": day,
                "c": np.ones(len(b), np.int64),
            }
        )
        return part.groupby(["cell", "day"], sort=False, as_index=False).sum()

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cell", "day"], sort=False, as_index=False)["c"].sum()
        rows = []
        for cell, gc in g.groupby("cell", sort=False):
            d = gc["day"].to_numpy(np.int64)
            c = gc["c"].to_numpy(np.int64)
            if len(d) < 2:
                continue
            o = np.argsort(d, kind="stable")
            d, c = d[o], c[o]
            i, j = np.triu_indices(len(d), k=1)
            # d strictly increasing after sort: d[j] > d[i]
            sl = np.sort(
                ((c[j] - c[i]) * TS_SCALE) // (d[j] - d[i])
            )
            k = len(sl)
            rows.append((int(cell), len(d), k, int(sl[(k - 1) // 2])))
        return pd.DataFrame(
            rows, columns=["cell", "n_days", "n_pairs", "theil_fp"]
        ).astype(np.int64)

    return sharded_map_groups(ev, "cell", finalize, local_pre=pre).sort("cell")


def sql_theil_sen() -> str:
    num = f"(b.c - a.c) * {TS_SCALE}"
    den = "(b.day - a.day)"
    floor_div = (
        f"(({num}) - (((({num}) % ({den})) + ({den})) % ({den}))) // ({den})"
    )
    return f"""
WITH cd AS (
  SELECT (((event_id * 7919) % 18000) // {GRID_RES}) * {GRID_NX}
         + ((event_id * 104729) % 36000) // {GRID_RES} AS cell,
         (epoch_us(ts) - {TS_EPOCH_US}) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
sl AS (
  SELECT a.cell, {floor_div} AS slope_fp
  FROM cd a JOIN cd b ON b.cell = a.cell AND b.day > a.day
),
rk AS (
  SELECT cell, slope_fp,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY slope_fp) AS rn,
         COUNT(*) OVER (PARTITION BY cell) AS k
  FROM sl
),
nd AS (SELECT cell, COUNT(*) AS n_days FROM cd GROUP BY cell)
SELECT CAST(r.cell AS BIGINT) AS cell,
       CAST(n.n_days AS BIGINT) AS n_days,
       CAST(r.k AS BIGINT) AS n_pairs,
       CAST(r.slope_fp AS BIGINT) AS theil_fp
FROM rk r JOIN nd n ON n.cell = r.cell
WHERE r.rn = (r.k + 1) // 2
ORDER BY cell
"""


# --------------------------------------------------------------------------
# MAD outlier cells (median absolute deviation over the grid)
# --------------------------------------------------------------------------
# The robust-zscore spatial-anomaly primitive (the distribution-free
# companion to q_zscore_events / q_hotspots): per-cell event counts
# over the bounded grid, global LOWER MEDIAN m of the occupied-cell
# counts, MAD = lower median of |n - m|, flag cells with
# |n - m| > MAD_K * MAD. All order statistics are exact integers on a
# GRID-BOUNDED table: the corpus contributes one map-side-combined
# counting pass; medians + filter run on <= grid-size rows.
#
# MAD_K = 2 (not the textbook 3): the prime-lattice scatter gives
# near-uniform cell counts (tiny MAD), and K=3 flags nothing at the
# gate scales — an all-empty result then loses its column schema
# through Ray's empty-block path and fails the driver's schema
# compare. K=2 flags both hot and dead cells at every tested sf.

MAD_K = 2


def q_mad_outliers(sf_dir: str):
    """(cell_x, cell_y, n, dev): occupied cells whose count deviates
    from the grid median by more than MAD_K * MAD."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = ((eid * 104729) % 36000) // GRID_RES
        cy = ((eid * 7919) % 18000) // GRID_RES
        g = (
            pa.table({"cell": cy * GRID_NX + cx})
            .group_by("cell")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell", "partial"])

    agg = bounded_key_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "cell", ["partial"],
        driver=_events_n(sf_dir) <= _GRID_DRIVER_ROWS,
        out_names=["n"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        med = int(np.sort(n)[(len(n) - 1) // 2])
        dev = np.abs(n - med)
        mad = int(np.sort(dev)[(len(dev) - 1) // 2])
        out = df.assign(dev=dev)[dev > MAD_K * mad]
        cell = out["cell"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "cell_x": cell % GRID_NX,
                "cell_y": cell // GRID_NX,
                "n": out["n"].to_numpy(np.int64),
                "dev": out["dev"].to_numpy(np.int64),
            }
        )

    return (
        agg.repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
        .sort(["cell_x", "cell_y"])
    )


def sql_mad_outliers() -> str:
    return f"""
WITH cnt AS (
  SELECT (((event_id * 7919) % 18000) // {GRID_RES}) * {GRID_NX}
         + ((event_id * 104729) % 36000) // {GRID_RES} AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
med AS (
  SELECT n AS m FROM (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn,
           COUNT(*) OVER () AS k
    FROM cnt
  ) WHERE rn = (k + 1) // 2
),
dv AS (SELECT c.cell, c.n, ABS(c.n - m.m) AS dev FROM cnt c, med m),
mad AS (
  SELECT dev AS mad FROM (
    SELECT dev, ROW_NUMBER() OVER (ORDER BY dev) AS rn,
           COUNT(*) OVER () AS k
    FROM dv
  ) WHERE rn = (k + 1) // 2
)
SELECT CAST(d.cell % {GRID_NX} AS BIGINT) AS cell_x,
       CAST(d.cell // {GRID_NX} AS BIGINT) AS cell_y,
       d.n, d.dev
FROM dv d, mad
WHERE d.dev > {MAD_K} * mad.mad
ORDER BY cell_x, cell_y
"""
