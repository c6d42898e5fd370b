"""Trajectory-similarity operators beyond DTW, with SQL oracles.

Two classic trajectory measures complementing q_trajectory_dtw
(geo_queries.py) — same deterministic setup so all three are directly
comparable: trajectories are each user's first TRAJ_K events ordered
by (ts, event_id) on the integer e2 lattice (x = eid*104729 % 36000,
y = eid*7919 % 18000), ground distance Chebyshev (exact int), pairs
the arithmetic (2m, 2m+1) rule. Reference analogue: the stop-sequence
comparison the reference's itinerary builder performs when matching
schedule stop lists to OSM stop sequences (osm2gtfs route matching).

- LCSS (longest common subsequence with spatial tolerance eps;
  Vlachos et al., ICDE 2002): the noise-robust alternative to DTW.
  Exactness: the row recurrence c[i][j] = prev[j-1]+1 on a match else
  max(prev[j], c[i][j-1]) factors into a RUNNING MAX per row — on a
  match, prev[j-1]+1 dominates both alternatives (adjacent LCS cells
  differ by <= 1), so c[i][j] = max_{t<=j} b[t] with b[t] =
  prev[t-1]+1 if match(i,t) else prev[t]. Engine: one
  np.maximum.accumulate per row; oracle: MAX() OVER (ORDER BY j)
  unrolled to TRAJ_K CTEs — the q_trajectory_dtw min-plus-scan
  discipline applied to the max-recurrence.
- Discrete Hausdorff distance (directed both ways + symmetric): the
  set-similarity measure (no ordering) behind shape-conflation QA.
  max-of-min over the pair distance matrix; trivially exact.

Scale shape (both): per-user top-K capping inside one user-hash
shuffle, then ONE pair-key shuffle and an O(K^2) vectorized kernel
per pair — the corpus never fans out; K bounds group memory. At
100 TB the pair list comes from a candidate generator (co_travelers
buckets) instead of the arithmetic rule, same two-shuffle plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from osm2gtfs_ray.sources.tables import read_table

TRAJ_K = 12
LCSS_EPS = 3000          # Chebyshev match tolerance, e2 units (30 deg/100)
LCSS_SCALE = 10**6       # similarity fixed point


def _topk_shard(g: pd.DataFrame) -> pd.DataFrame:
    """First TRAJ_K points per user by (ts, event_id) -> pair/role rows
    (identical rule to q_trajectory_dtw's capping stage)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = g["user_id"].to_numpy(np.int64)
    n = len(g)
    starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    lengths = np.diff(np.r_[starts, n])
    seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths) + 1
    m = seq <= TRAJ_K
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


def _pair_matrices(gp: pd.DataFrame):
    """(pair_id group) -> Chebyshev distance matrix + lengths, or None."""
    a = gp[gp["role"] == 0]
    b = gp[gp["role"] == 1]
    if len(a) == 0 or len(b) == 0:
        return None
    ax, ay = a["x"].to_numpy(np.int64), a["y"].to_numpy(np.int64)
    bx, by = b["x"].to_numpy(np.int64), b["y"].to_numpy(np.int64)
    d = np.maximum(
        np.abs(ax[:, None] - bx[None, :]), np.abs(ay[:, None] - by[None, :])
    )
    return d


def _pts_pairs_sql() -> str:
    """Shared CTE prefix: capped points, pair list, distance table."""
    return f"""
pts AS (
  SELECT user_id, seq, x, y FROM (
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS seq,
           (event_id * 104729) % 36000 AS x,
           (event_id * 7919) % 18000 AS y
    FROM events
  ) WHERE seq <= {TRAJ_K}
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
)"""


# --------------------------------------------------------------------------
# LCSS with spatial tolerance
# --------------------------------------------------------------------------


def q_lcss_similarity(sf_dir: str):
    """(user_a, user_b, n_a, n_b, lcss, sim_fp): spatial-tolerance
    LCSS length between users (2m, 2m+1) and lcss*1e6//min(n_a,n_b)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def lcss_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair", "role", "seq"], kind="mergesort")
        rows = []
        for pair_id, gp in g.groupby("pair", sort=False):
            d = _pair_matrices(gp)
            if d is None:
                continue
            m = d <= LCSS_EPS
            na, nb = d.shape
            c = np.zeros(nb, dtype=np.int64)
            for i in range(na):
                b = np.where(m[i], np.r_[0, c[:-1]] + 1, c)
                c = np.maximum.accumulate(b)
            lcss = int(c[-1])
            rows.append(
                (
                    int(pair_id) * 2, int(pair_id) * 2 + 1,
                    na, nb, lcss,
                    lcss * LCSS_SCALE // min(na, nb),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["user_a", "user_b", "n_a", "n_b", "lcss", "sim_fp"],
        ).astype(np.int64)

    pts = sharded_map_groups(ev, "user_id", _topk_shard)
    return sharded_map_groups(pts, "pair", lcss_shard).sort("user_a")


def sql_lcss_similarity() -> str:
    # Row CTEs: c_i[j] = running max of b[j]; b[j] = prev[j-1]+1 on a
    # match (LAG of prior row, 0 at j=1) else prev[j]. Row 1 uses the
    # implicit zero row 0.
    rows = [f"""
r1 AS (
  SELECT ua, j, MAX(CASE WHEN d <= {LCSS_EPS} THEN 1 ELSE 0 END)
           OVER (PARTITION BY ua ORDER BY j ROWS UNBOUNDED PRECEDING) AS c
  FROM d WHERE i = 1
)"""]
    for i in range(2, TRAJ_K + 1):
        rows.append(f"""
r{i} AS (
  SELECT ua, j, MAX(b) OVER (
           PARTITION BY ua ORDER BY j ROWS UNBOUNDED PRECEDING
         ) AS c
  FROM (
    SELECT dd.ua, dd.j,
           CASE WHEN dd.d <= {LCSS_EPS}
                THEN COALESCE(LAG(p.c) OVER (
                       PARTITION BY dd.ua ORDER BY dd.j), 0) + 1
                ELSE p.c END AS b
    FROM d dd JOIN r{i - 1} p ON p.ua = dd.ua AND p.j = dd.j
    WHERE dd.i = {i}
  )
)""")
    finals = " UNION ALL ".join(
        f"SELECT p.ua AS user_a, p.ub AS user_b, p.na AS n_a, p.nb AS n_b, "
        f"r.c AS lcss FROM pairs p JOIN r{i} r ON r.ua = p.ua AND r.j = p.nb "
        f"WHERE p.na = {i}"
        for i in range(1, TRAJ_K + 1)
    )
    return f"""
WITH {_pts_pairs_sql().lstrip()},{",".join(rows)}
SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(lcss AS BIGINT) AS lcss,
       CAST((lcss * {LCSS_SCALE}) // LEAST(n_a, n_b) AS BIGINT) AS sim_fp
FROM ({finals})
ORDER BY user_a
"""


# --------------------------------------------------------------------------
# Discrete Hausdorff distance (directed + symmetric)
# --------------------------------------------------------------------------


def q_hausdorff_pairs(sf_dir: str):
    """(user_a, user_b, h_ab, h_ba, hausdorff): directed Chebyshev
    Hausdorff distances between the capped point sets of users
    (2m, 2m+1), and their max (the symmetric distance)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def haus_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair", "role", "seq"], kind="mergesort")
        rows = []
        for pair_id, gp in g.groupby("pair", sort=False):
            d = _pair_matrices(gp)
            if d is None:
                continue
            h_ab = int(d.min(axis=1).max())
            h_ba = int(d.min(axis=0).max())
            rows.append(
                (
                    int(pair_id) * 2, int(pair_id) * 2 + 1,
                    h_ab, h_ba, max(h_ab, h_ba),
                )
            )
        return pd.DataFrame(
            rows, columns=["user_a", "user_b", "h_ab", "h_ba", "hausdorff"]
        ).astype(np.int64)

    pts = sharded_map_groups(ev, "user_id", _topk_shard)
    return sharded_map_groups(pts, "pair", haus_shard).sort("user_a")


def sql_hausdorff_pairs() -> str:
    return f"""
WITH {_pts_pairs_sql().lstrip()},
mins_a AS (SELECT ua, i, MIN(d) AS md FROM d GROUP BY ua, i),
mins_b AS (SELECT ua, j, MIN(d) AS md FROM d GROUP BY ua, j),
h AS (
  SELECT a.ua, a.h_ab, b.h_ba
  FROM (SELECT ua, MAX(md) AS h_ab FROM mins_a GROUP BY ua) a
  JOIN (SELECT ua, MAX(md) AS h_ba FROM mins_b GROUP BY ua) b
    ON b.ua = a.ua
)
SELECT CAST(p.ua AS BIGINT) AS user_a, CAST(p.ub AS BIGINT) AS user_b,
       CAST(h.h_ab AS BIGINT) AS h_ab, CAST(h.h_ba AS BIGINT) AS h_ba,
       CAST(GREATEST(h.h_ab, h.h_ba) AS BIGINT) AS hausdorff
FROM pairs p JOIN h ON h.ua = p.ua
ORDER BY user_a
"""


# --------------------------------------------------------------------------
# Discrete Fréchet distance (Eiter & Mannila 1994)
# --------------------------------------------------------------------------
# The "dog-leash" coupling distance — the ordered counterpart of
# Hausdorff and the bottleneck (max) counterpart of DTW (sum):
# hausdorff <= frechet <= dtw holds pointwise on every pair, and the
# pytest asserts that triangle across all three operators. DP:
#   c[i][j] = max(d[i][j], min(c[i-1][j], c[i-1][j-1], c[i][j-1]))
# with c[i][1] = max(c[i-1][1], d[i][1]) and row 1 a running max.
#
# Exactness/factorization: within a row let am[k] =
# min(prev[k], prev[k-1]) (prev[0] = +inf). The first-order recurrence
# c[j] = max(d[j], min(am[j], c[j-1])) expands — max distributes over
# min — to the closed form
#   c[j] = min_{k<=j} max(am[k], max_{t=k..j} d[t]),
# so the engine computes each row as ONE O(K^2) numpy expression (a
# masked running-max matrix against the am vector) and the oracle as a
# range self-join + GROUP BY MIN per unrolled row CTE — the
# q_trajectory_dtw unrolled-DP discipline applied to the max-min
# recurrence. All integer, bit-exact.
#
# Scale shape: identical two-shuffle plan to DTW/LCSS (per-user top-K
# cap in one user-hash shuffle, then ONE pair-key shuffle with an
# O(K^2)-bounded kernel per pair).


def q_frechet_pairs(sf_dir: str):
    """(user_a, user_b, n_a, n_b, frechet): discrete Chebyshev Fréchet
    distance between the capped trajectories of users (2m, 2m+1)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def frechet_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair", "role", "seq"], kind="mergesort")
        rows = []
        for pair_id, gp in g.groupby("pair", sort=False):
            d = _pair_matrices(gp)
            if d is None:
                continue
            na, nb = d.shape
            big = np.int64(2**62)
            k_idx = np.arange(nb)
            below = k_idx[:, None] > k_idx[None, :]      # k > j: invalid
            c = np.maximum.accumulate(d[0])              # row 1: running max
            for i in range(1, na):
                am = np.minimum(c, np.r_[big, c[:-1]])   # prev[0] = +inf
                run = np.where(below, np.int64(-1), d[i][None, :])
                run = np.maximum.accumulate(run, axis=1)  # dmax[k..j]
                v = np.maximum(am[:, None], run)
                c = np.where(below, big, v).min(axis=0)
            rows.append(
                (int(pair_id) * 2, int(pair_id) * 2 + 1, na, nb, int(c[-1]))
            )
        return pd.DataFrame(
            rows, columns=["user_a", "user_b", "n_a", "n_b", "frechet"]
        ).astype(np.int64)

    pts = sharded_map_groups(ev, "user_id", _topk_shard)
    return sharded_map_groups(pts, "pair", frechet_shard).sort("user_a")


def sql_frechet_pairs() -> str:
    # Per row i >= 2: am_k from the prior row CTE, dmax[k..j] via a
    # bounded range self-join on d (row i only), then MIN over k <= j
    # of GREATEST(am[k], dmax[k..j]) grouped by j.
    rows = [f"""
r1 AS (
  SELECT ua, j, MAX(d) OVER (PARTITION BY ua ORDER BY j
                             ROWS UNBOUNDED PRECEDING) AS c
  FROM d WHERE i = 1
)"""]
    for i in range(2, TRAJ_K + 1):
        rows.append(f"""
r{i} AS (
  SELECT dm.ua, dm.j, MIN(GREATEST(am.am, dm.mx)) AS c
  FROM (
    SELECT k.ua, k.j AS k, jj.j AS j, MAX(t.d) AS mx
    FROM d k
    JOIN d jj ON jj.ua = k.ua AND jj.i = {i} AND jj.j >= k.j
    JOIN d t  ON t.ua = k.ua AND t.i = {i}
            AND t.j BETWEEN k.j AND jj.j
    WHERE k.i = {i}
    GROUP BY k.ua, k.j, jj.j
  ) dm
  JOIN (
    SELECT ua, j AS k,
           LEAST(c, COALESCE(LAG(c) OVER (PARTITION BY ua ORDER BY j),
                             c)) AS am
    FROM r{i - 1}
  ) am ON am.ua = dm.ua AND am.k = dm.k
  GROUP BY dm.ua, dm.j
)""")
    finals = " UNION ALL ".join(
        f"SELECT p.ua AS user_a, p.ub AS user_b, p.na AS n_a, p.nb AS n_b, "
        f"r.c AS frechet FROM pairs p JOIN r{i} r ON r.ua = p.ua "
        f"AND r.j = p.nb WHERE p.na = {i}"
        for i in range(1, TRAJ_K + 1)
    )
    return f"""
WITH {_pts_pairs_sql().lstrip()},{",".join(rows)}
SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(frechet AS BIGINT) AS frechet
FROM ({finals})
ORDER BY user_a
"""


# --------------------------------------------------------------------------
# EDR: edit distance on real sequences (Chen et al., VLDB 2005)
# --------------------------------------------------------------------------

# The edit-distance member of the trajectory-similarity family (DTW
# accumulates cost, LCSS counts matches, EDR counts EDITS with a
# spatial match tolerance — robust to both noise and sampling-rate
# differences). Recurrence
#   e[i][j] = min(e[i-1][j-1] + sub(i,j), e[i-1][j] + 1, e[i][j-1] + 1)
# with sub = 0 iff Chebyshev(a_i, b_j) <= eps, boundaries e[0][j] = j,
# e[i][0] = i. The in-row left dependency factors into a min-plus
# scan: with a[j] = min(prev[j-1] + sub, prev[j] + 1),
#   c[j] = j + min(i, min_{t<=j}(a[t] - t))
# — one np.minimum.accumulate per row in the engine, MIN() OVER
# (ORDER BY j) unrolled to TRAJ_K CTEs in the oracle (the
# q_trajectory_dtw min-plus-scan discipline applied to edit costs).
EDR_EPS = LCSS_EPS  # same tolerance as LCSS: the measures compare


def q_edr_similarity(sf_dir: str):
    """(user_a, user_b, n_a, n_b, edr, sim_fp): EDR edit count between
    users (2m, 2m+1) and (max(n)-edr)*1e6//max(n) similarity."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def edr_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair", "role", "seq"], kind="mergesort")
        rows = []
        for pair_id, gp in g.groupby("pair", sort=False):
            d = _pair_matrices(gp)
            if d is None:
                continue
            m = d <= EDR_EPS
            na, nb = d.shape
            t = np.arange(1, nb + 1, dtype=np.int64)
            prev = t.copy()  # row 0: e[0][j] = j
            for i in range(1, na + 1):
                sub = (~m[i - 1]).astype(np.int64)
                diag = np.r_[i - 1, prev[:-1]]
                a = np.minimum(diag + sub, prev + 1)
                prev = t + np.minimum(np.minimum.accumulate(a - t), i)
            edr = int(prev[-1])
            mx = max(na, nb)
            rows.append(
                (
                    int(pair_id) * 2, int(pair_id) * 2 + 1,
                    na, nb, edr,
                    (mx - edr) * LCSS_SCALE // mx,
                )
            )
        return pd.DataFrame(
            rows,
            columns=["user_a", "user_b", "n_a", "n_b", "edr", "sim_fp"],
        ).astype(np.int64)

    pts = sharded_map_groups(ev, "user_id", _topk_shard)
    return sharded_map_groups(pts, "pair", edr_shard).sort("user_a")


def sql_edr_similarity() -> str:
    # r{i}[j] = j + LEAST(i, MIN(b - j) OVER running) with
    # b = LEAST(diag + sub, prev + 1); row 1's prev row is e[0][j] = j
    rows = [f"""
r1 AS (
  SELECT ua, j,
         j + LEAST(1, MIN(
           LEAST(j - 1 + CASE WHEN d <= {EDR_EPS} THEN 0 ELSE 1 END,
                 j + 1) - j
         ) OVER (PARTITION BY ua ORDER BY j ROWS UNBOUNDED PRECEDING)) AS c
  FROM d WHERE i = 1
)"""]
    for i in range(2, TRAJ_K + 1):
        rows.append(f"""
r{i} AS (
  SELECT ua, j, j + LEAST({i}, MIN(b - j) OVER (
           PARTITION BY ua ORDER BY j ROWS UNBOUNDED PRECEDING
         )) AS c
  FROM (
    SELECT dd.ua, dd.j,
           LEAST(COALESCE(LAG(p.c) OVER (
                   PARTITION BY dd.ua ORDER BY dd.j), {i - 1})
                 + CASE WHEN dd.d <= {EDR_EPS} THEN 0 ELSE 1 END,
                 p.c + 1) AS b
    FROM d dd JOIN r{i - 1} p ON p.ua = dd.ua AND p.j = dd.j
    WHERE dd.i = {i}
  )
)""")
    finals = " UNION ALL ".join(
        f"SELECT p.ua AS user_a, p.ub AS user_b, p.na AS n_a, p.nb AS n_b, "
        f"r.c AS edr FROM pairs p JOIN r{i} r ON r.ua = p.ua AND r.j = p.nb "
        f"WHERE p.na = {i}"
        for i in range(1, TRAJ_K + 1)
    )
    return f"""
WITH {_pts_pairs_sql().lstrip()},{",".join(rows)}
SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(edr AS BIGINT) AS edr,
       CAST(((GREATEST(n_a, n_b) - edr) * {LCSS_SCALE})
            // GREATEST(n_a, n_b) AS BIGINT) AS sim_fp
FROM ({finals})
ORDER BY user_a
"""
