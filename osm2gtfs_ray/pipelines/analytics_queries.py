"""Windowed / multi-level / statistical aggregates over the event and
order tables — the analytics operator family (SURVEY.md §2.5/A plus
the windowed-aggregate custom-operator class): grouped mode,
grouped Pearson correlation from mergeable partials, pivot,
ROLLUP-style multi-level totals, per-key ROWS-frame rolling windows
and a global RANGE-frame time rolling window.

Every query follows the repo encoding rules (pipelines/queries.py
module docstring): float aggregates emitted as scaled BIGINTs on both
sides, timestamps as epoch units.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.sources.tables import read_table

# event_type domain is closed (synthetic generator emits exactly these);
# the pivot's output schema must be static for the driver's schema check
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# Grouped MODE (most frequent value per key, deterministic tie-break)
# — reference analogue: the "most common name wins" stop-name merge
# (osm2gtfs/core/osm_stops.py group naming); classic heavy-hitter-per-
# key. Plan: map-side (user,type) count partials → user-hash sharded
# shuffle of PARTIALS (≤ |users|×5 rows, never raw events) → per-shard
# vectorized argmax.
# --------------------------------------------------------------------------

def q_mode_event_type(sf_dir: str):
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            t.group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["user_id", "event_type", "n_part"])
        )
        return g.to_pandas()

    parts = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def shard_mode(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["user_id", "event_type"], sort=False)["n_part"]
            .sum()
            .reset_index(name="n")
        )
        # count desc, type asc: first row per user after one C-level sort
        agg = agg.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = agg.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy(),
                "mode_type": top["event_type"].to_numpy(),
                "n": top["n"].to_numpy(dtype=np.int64),
            }
        )

    return sharded_map_groups(parts, "user_id", shard_mode)


SQL_MODE_EVENT_TYPE = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
ranked AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type ASC) AS r
  FROM counts
)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
FROM ranked WHERE r = 1
"""


# --------------------------------------------------------------------------
# Grouped Pearson correlation from mergeable moment partials
# (n, Σx, Σy, Σxx, Σyy, Σxy per batch → one tiny groupby → closed form)
# — the distributed-statistics shape: nothing row-sized leaves a batch.
# --------------------------------------------------------------------------

def q_corr_qty_price(sf_dir: str):
    li = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def moments(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "g": t["l_returnflag"].to_numpy(zero_copy_only=False),
                "x": t["l_quantity"].to_numpy(zero_copy_only=False),
                "y": t["l_extendedprice"].to_numpy(zero_copy_only=False),
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        df["n"] = 1
        return df.groupby("g", sort=False).sum().reset_index()

    parts = li.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
    tot = parts.groupby("g").sum(["x", "y", "xx", "yy", "xy", "n"]).to_pandas()
    n = tot["sum(n)"].to_numpy(np.float64)
    sx, sy = tot["sum(x)"].to_numpy(), tot["sum(y)"].to_numpy()
    sxx, syy, sxy = (
        tot["sum(xx)"].to_numpy(),
        tot["sum(yy)"].to_numpy(),
        tot["sum(xy)"].to_numpy(),
    )
    corr = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx**2) * (n * syy - sy**2))
    out = pd.DataFrame(
        {
            "l_returnflag": tot["g"],
            "n": n.astype(np.int64),
            # half-away-from-zero to match DuckDB ROUND (corr can be < 0)
            "corr_e6": np.trunc(corr * 1e6 + np.copysign(0.5, corr)).astype(np.int64),
        }
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_CORR_QTY_PRICE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(corr(l_quantity, l_extendedprice) * 1e6) AS BIGINT) AS corr_e6
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Pivot: per-day event counts, one column per event type (the closed
# 5-value domain makes the output schema static). Plan: ONE grouped
# count on (day, type) — long form, pre-aggregated map-side by Ray's
# hash aggregate — then the wide reshape happens on the tiny result.
# --------------------------------------------------------------------------

def q_event_pivot(sf_dir: str):
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def day_type(t: pa.Table) -> pa.Table:
        # integer epoch-micros // day (epochs here are positive, so
        # truncating division == floor, matching the SQL's FLOOR);
        # a direct cast to timestamp[s] rejects sub-second precision
        micros = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"day": day, "event_type": t["event_type"]})

    long = (
        ev.map_batches(day_type, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .count()
        .to_pandas()
    )
    wide = long.pivot_table(
        index="day", columns="event_type", values="count()", fill_value=0
    )
    out = pd.DataFrame({"day": wide.index.to_numpy(dtype=np.int64)})
    for t in EVENT_TYPES:
        out[f"n_{t}"] = (
            wide[t].to_numpy(dtype=np.int64) if t in wide else np.int64(0)
        )
    return out.sort_values("day").reset_index(drop=True)


def _sql_event_pivot() -> str:
    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
       {cols}
FROM events GROUP BY 1 ORDER BY 1
"""


SQL_EVENT_PIVOT = _sql_event_pivot()


# --------------------------------------------------------------------------
# ROLLUP multi-level totals: (flag, status) + per-flag + grand total in
# one pass. Plan: ONE distributed groupby at the finest level; the
# coarser levels re-aggregate the finest RESULT (≤ |flag|×|status|
# rows) — never a second corpus scan. NULL group markers become 'ALL'
# on both sides (drivers hash NULLs differently across engines).
# --------------------------------------------------------------------------

def q_revenue_rollup(sf_dir: str):
    li = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "f": t["l_returnflag"].to_numpy(zero_copy_only=False),
                "s": t["l_linestatus"].to_numpy(zero_copy_only=False),
                "v": t["l_extendedprice"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["f", "s"], sort=False)["v"].agg(["sum", "count"])
        return g.reset_index().rename(columns={"sum": "rev", "count": "n"})

    fine = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["f", "s"])
        .sum(["rev", "n"])
        .to_pandas()
        .rename(columns={"sum(rev)": "rev", "sum(n)": "n"})
    )
    mid = fine.groupby("f", as_index=False)[["rev", "n"]].sum()
    mid["s"] = "ALL"
    top = pd.DataFrame(
        {"f": ["ALL"], "s": ["ALL"], "rev": [fine["rev"].sum()], "n": [fine["n"].sum()]}
    )
    allrows = pd.concat([fine, mid, top], ignore_index=True)
    out = pd.DataFrame(
        {
            "l_returnflag": allrows["f"],
            "l_linestatus": allrows["s"],
            "revenue_cents": np.floor(allrows["rev"].to_numpy() * 100 + 0.5).astype(
                np.int64
            ),
            "n": allrows["n"].to_numpy(dtype=np.int64),
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_REVENUE_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Per-key ROWS-frame rolling window: each user's trailing-3-event mean
# value (ops/window.partitioned_rolling; one key-hash shuffle, every
# frame computed in one vectorized pandas pass per shard).
# --------------------------------------------------------------------------

def q_rolling_user_value(sf_dir: str):
    from osm2gtfs_ray.ops.window import partitioned_rolling

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    rolled = partitioned_rolling(
        ev, "user_id", ["ts", "event_id"], "value", window=3
    )

    def finish(t: pa.Table) -> pa.Table:
        mean = pc.divide(t["roll_sum"], pc.cast(t["roll_n"], pa.float64()))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "roll_n": pc.cast(t["roll_n"], pa.int64()),
                "roll_mean_e6": pc.cast(
                    pc.round(
                        pc.multiply(mean, pa.scalar(1e6)),
                        ndigits=0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return rolled.map_batches(finish, batch_format="pyarrow")


SQL_ROLLING_USER_VALUE = """
SELECT event_id, user_id,
       CAST(COUNT(value) OVER w AS BIGINT) AS roll_n,
       CAST(ROUND(AVG(value) OVER w * 1e6) AS BIGINT) AS roll_mean_e6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Global RANGE-frame time rolling: 7-day moving average of daily order
# revenue. Daily totals come from one distributed groupby; the rolling
# pass is ops/window.time_bucket_rolling (month-wide buckets, trailing
# 6 days replicated into the successor bucket — no sequential pass).
# --------------------------------------------------------------------------

def q_rolling_daily_revenue(sf_dir: str):
    import ray.data

    from osm2gtfs_ray.ops.window import time_bucket_rolling

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def day_rev(t: pa.Table) -> pa.Table:
        # Arrow out (see q_spend_rank partial note)
        secs = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("s")), pa.int64())
        day = pc.divide(secs, pa.scalar(86400, pa.int64()))
        g = (
            pa.table({"day": day, "rev": t["o_totalprice"]})
            .group_by("day")
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["day", "rev"])

    daily = (
        orders.map_batches(day_rev, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("rev")
        .to_pandas()
        .rename(columns={"sum(rev)": "rev"})
    )
    rolled = time_bucket_rolling(
        ray.data.from_pandas(daily), "day", "rev", window=7, bucket=32
    )

    def finish(t: pa.Table) -> pa.Table:
        # hash the window SUM (cent-quantized source values → never a
        # .5 knife-edge), not the mean: sparse windows with n=2/4 put
        # the mean exactly on .5 cents where the two engines' fp
        # round-trips disagree. Consumers derive the mean from the pair.
        return pa.table(
            {
                "day": pc.cast(t["day"], pa.int64()),
                "revenue_cents": pc.cast(
                    pc.round(
                        pc.multiply(t["rev"], pa.scalar(100.0)),
                        ndigits=0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
                "n_days_in_window": pc.cast(t["roll_n"], pa.int64()),
                "win_rev_cents": pc.cast(
                    pc.round(
                        pc.multiply(t["roll_sum"], pa.scalar(100.0)),
                        ndigits=0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return rolled.map_batches(finish, batch_format="pyarrow")


SQL_ROLLING_DAILY_REVENUE = """
WITH daily AS (
  SELECT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(ROUND(rev * 100) AS BIGINT) AS revenue_cents,
       CAST(COUNT(rev) OVER w AS BIGINT) AS n_days_in_window,
       CAST(ROUND(SUM(rev) OVER w * 100) AS BIGINT) AS win_rev_cents
FROM daily
WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Global rank / ntile over an aggregate: per-customer total spend →
# global ROW_NUMBER in (spend, custkey) order via
# ops/scan.distributed_rank (value-range buckets + driver prefix of
# per-bucket counts — a global sort's ordering without a global sort's
# materialization). The quartile uses an EXPLICIT integer formula
# ((rank-1)*4 // n + 1) computed identically in SQL — independent of
# engine NTILE remainder conventions.
# --------------------------------------------------------------------------

def q_spend_rank(sf_dir: str):
    from osm2gtfs_ray.ops.scan import distributed_rank

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow in, Arrow OUT: a pandas-block output here makes Ray's
        # downstream sort-aggregate ~11x slower (19.6 s vs 1.8 s
        # measured at sf0.1 on a quiet host)
        g = t.group_by("o_custkey").aggregate([("o_totalprice", "sum")])
        return g.rename_columns(["o_custkey", "spend"])

    spend = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .sum("spend")
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "spend_cents": pc.cast(
                    pc.round(
                        pc.multiply(t["sum(spend)"], pa.scalar(100.0)),
                        ndigits=0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    spend = spend.map_batches(cents, batch_format="pyarrow")
    ranked, n = distributed_rank(spend, "spend_cents", ["o_custkey"])

    def finish(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "spend_cents": pc.cast(t["spend_cents"], pa.int64()),
                "rank": pa.array(r, pa.int64()),
                "quartile": pa.array((r - 1) * 4 // n + 1, pa.int64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


SQL_SPEND_RANK = """
WITH spend AS (
  SELECT o_custkey,
         CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS spend_cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT o_custkey, spend_cents,
         ROW_NUMBER() OVER (ORDER BY spend_cents, o_custkey) AS rank,
         COUNT(*) OVER () AS n
  FROM spend
)
SELECT o_custkey, spend_cents, CAST(rank AS BIGINT) AS rank,
       CAST((rank - 1) * 4 // n + 1 AS BIGINT) AS quartile
FROM r
"""


# --------------------------------------------------------------------------
# Feature standardization (z-score per group): two-pass — grouped
# moment partials reduce to a KB-sized (group → mean, stddev_pop)
# table, broadcast via ray.put, then one pure map standardizes every
# row. The classic normalize-before-training stage; no second shuffle.
# --------------------------------------------------------------------------

def q_zscore_events(sf_dir: str):
    import ray

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "g": t["event_type"].to_numpy(zero_copy_only=False),
                "x": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["n"] = 1
        return df.groupby("g", sort=False).sum().reset_index()

    tot = (
        ev.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .sum(["x", "xx", "n"])
        .to_pandas()
    )
    n = tot["sum(n)"].to_numpy(np.float64)
    mean = tot["sum(x)"].to_numpy() / n
    var = tot["sum(xx)"].to_numpy() / n - mean**2
    stats = {
        g: (m, np.sqrt(v)) for g, m, v in zip(tot["g"], mean, np.maximum(var, 0.0))
    }
    ref = ray.put(stats)

    def standardize(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        st = _ref if isinstance(_ref, dict) else _ray.get(_ref)
        g = t["event_type"].to_pylist()
        mu = np.array([st[k][0] for k in g])
        sd = np.array([st[k][1] for k in g])
        z = (t["value"].to_numpy(zero_copy_only=False) - mu) / sd
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "z_e4": pa.array(
                    np.trunc(z * 1e4 + np.copysign(0.5, z)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return ev.map_batches(standardize, batch_format="pyarrow")


SQL_ZSCORE_EVENTS = """
WITH stats AS (
  SELECT event_type,
         AVG(value) AS mu,
         SQRT(GREATEST(AVG(value * value) - AVG(value) * AVG(value), 0)) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CAST(ROUND((e.value - s.mu) / s.sd * 1e4) AS BIGINT) AS z_e4
FROM events e JOIN stats s USING (event_type)
"""


# --------------------------------------------------------------------------
# Numeric histogram (fixed-width binning, closed bucket domain) —
# the distribution-profiling primitive every corpus audit starts with.
# Scale shape: map-side per-batch bincount partials (≤ N_BUCKETS rows
# leave any batch), one tiny groupby merge. Values outside [lo, hi)
# clamp into the end buckets, so the output schema is static.
# --------------------------------------------------------------------------

_HIST_WIDTH = 5.0
_HIST_BUCKETS = 40  # domain [0, 200) + clamp


def q_value_histogram(sf_dir: str):
    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.clip(np.floor(v / _HIST_WIDTH).astype(np.int64), 0, _HIST_BUCKETS - 1)
        cnt = np.bincount(b, minlength=_HIST_BUCKETS)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "n_part": pa.array(cnt[nz], pa.int64())}
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        w = int(_HIST_WIDTH * 100)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "lo_cents": pa.array(b * w, pa.int64()),
                "hi_cents": pa.array((b + 1) * w, pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("bucket")


SQL_VALUE_HISTOGRAM = f"""
SELECT bucket,
       bucket * {int(_HIST_WIDTH * 100)} AS lo_cents,
       (bucket + 1) * {int(_HIST_WIDTH * 100)} AS hi_cents,
       COUNT(*) AS n
FROM (
  SELECT LEAST(GREATEST(CAST(FLOOR(value / {_HIST_WIDTH}) AS BIGINT), 0),
               {_HIST_BUCKETS - 1}) AS bucket
  FROM events
)
GROUP BY bucket ORDER BY bucket
"""


# --------------------------------------------------------------------------
# Interval merge (union of overlapping per-key intervals — the
# islands-and-gaps operator): each event opens a fixed 10-minute
# activity interval; overlapping/touching intervals of the same user
# merge into one. Reference analogue: service-period union per
# itinerary (osm2gtfs/creators/trips_creator.py service handling),
# generalized to time intervals.
# Scale shape: key-hash sharded shuffle, then ONE vectorized pandas
# pass per shard (sort + grouped cummax/shift + cumsum island ids) —
# the same C-level shape as q_sessionize.
# --------------------------------------------------------------------------

_IVL_LEN_S = 600


def q_interval_merge(sf_dir: str):
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g["ts"].astype("int64").to_numpy() // 1_000_000
        d = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "s": s})
        d = d.sort_values(["user_id", "s"], kind="mergesort").reset_index(drop=True)
        d["e"] = d["s"] + _IVL_LEN_S
        gb = d.groupby("user_id", sort=False)
        prev_max = gb["e"].cummax().groupby(d["user_id"], sort=False).shift(1)
        new = prev_max.isna() | (d["s"] > prev_max)
        d["island"] = new.astype(np.int64).groupby(d["user_id"], sort=False).cumsum()
        out = d.groupby(["user_id", "island"], as_index=False, sort=False).agg(
            start_s=("s", "min"), end_s=("e", "max"), n_events=("s", "size")
        )
        return out[["user_id", "start_s", "end_s", "n_events"]]

    merged = sharded_map_groups(ev, "user_id", merge_shard)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "start_s": pc.cast(t["start_s"], pa.int64()),
                "end_s": pc.cast(t["end_s"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow").sort(
        ["user_id", "start_s"]
    )


SQL_INTERVAL_MERGE = f"""
WITH iv AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(epoch(ts)) AS BIGINT) + {_IVL_LEN_S} AS e
  FROM events
),
ord AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
  FROM ord
)
SELECT user_id, MIN(s) AS start_s, MAX(e) AS end_s,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM isl GROUP BY user_id, island
ORDER BY user_id, start_s
"""


# --------------------------------------------------------------------------
# Cohort retention: users are cohorted by their first active day; for
# each (cohort_day, day offset) count how many of the cohort's users
# were active. Scale shape: map-side per-(user, day) distinct, ONE
# user-keyed sharded shuffle in which each shard derives its users'
# cohorts AND offsets in one vectorized pass (no second join), then a
# tiny (cohort, offset) count groupby with map-side partials.
# --------------------------------------------------------------------------

def q_cohort_retention(sf_dir: str):
    from ray.data.aggregate import Sum
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def user_days(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "day": b["ts"].dt.floor("D")}
        )
        return d.drop_duplicates()

    def cohort_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "day"])
        first = d.groupby("user_id", sort=False)["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": first.dt.date,
                "offset_days": (d["day"] - first).dt.days.astype(np.int64),
                "n_part": np.ones(len(d), np.int64),
            }
        )
        return out.groupby(["cohort_day", "offset_days"], as_index=False, sort=False)[
            "n_part"
        ].sum()

    parts = sharded_map_groups(
        ev.map_batches(user_days, batch_format="pandas"), "user_id", cohort_shard
    )
    agg = parts.groupby(["cohort_day", "offset_days"]).aggregate(
        Sum("n_part", alias_name="n_users")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": pc.cast(t["cohort_day"], pa.date32()),
                "offset_days": pc.cast(t["offset_days"], pa.int64()),
                "n_users": pc.cast(t["n_users"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["cohort_day", "offset_days"]
    )


SQL_COHORT_RETENTION = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
fc AS (SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id)
SELECT fc.cohort AS cohort_day,
       CAST(date_diff('day', fc.cohort, ud.day) AS BIGINT) AS offset_days,
       COUNT(*) AS n_users
FROM ud JOIN fc USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Funnel conversion (click → purchase in order): per user, the first
# click and first purchase second; converted iff both exist and the
# click strictly precedes the purchase (on floored-second timestamps,
# identical on both sides). Scale shape: map-side per-(user, stage)
# min partials (≤ 2 rows per user per batch leave the map), one
# user-keyed sharded shuffle, vectorized per-shard pivot.
# --------------------------------------------------------------------------

_FUNNEL_A, _FUNNEL_B = "click", "purchase"


def q_funnel_conversion(sf_dir: str):
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def stage_mins(b: pd.DataFrame) -> pd.DataFrame:
        d = b[b["event_type"].isin([_FUNNEL_A, _FUNNEL_B])]
        s = pd.DataFrame(
            {
                "user_id": d["user_id"].to_numpy(),
                "event_type": d["event_type"].to_numpy(),
                "ts_s": d["ts"].astype("int64").to_numpy() // 1_000_000,
            }
        )
        return s.groupby(["user_id", "event_type"], as_index=False, sort=False)[
            "ts_s"
        ].min()

    def funnel_shard(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["user_id", "event_type"], as_index=False, sort=False)[
            "ts_s"
        ].min()
        p = m.pivot_table(index="user_id", columns="event_type", values="ts_s",
                          aggfunc="min")
        fc = p[_FUNNEL_A] if _FUNNEL_A in p else pd.Series(np.nan, index=p.index)
        fp = p[_FUNNEL_B] if _FUNNEL_B in p else pd.Series(np.nan, index=p.index)
        keep = fc.notna()
        fc, fp = fc[keep], fp[keep]
        conv = (fp.notna() & (fc < fp)).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": fc.index.to_numpy(np.int64),
                "first_click_s": fc.to_numpy(np.int64),
                "first_purchase_s": fp.fillna(-1).to_numpy(np.int64),
                "converted": conv.to_numpy(np.int64),
            }
        )

    out = sharded_map_groups(
        ev.map_batches(stage_mins, batch_format="pandas"), "user_id", funnel_shard
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "first_click_s": pc.cast(t["first_click_s"], pa.int64()),
                "first_purchase_s": pc.cast(t["first_purchase_s"], pa.int64()),
                "converted": pc.cast(t["converted"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("user_id")


SQL_FUNNEL_CONVERSION = f"""
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{_FUNNEL_A}'
                  THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS fc,
         MIN(CASE WHEN event_type = '{_FUNNEL_B}'
                  THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS fp
  FROM events GROUP BY user_id
)
SELECT user_id, fc AS first_click_s, COALESCE(fp, -1) AS first_purchase_s,
       CAST(CASE WHEN fp IS NOT NULL AND fc < fp THEN 1 ELSE 0 END AS BIGINT)
         AS converted
FROM f WHERE fc IS NOT NULL ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Count-Min Sketch frequency estimates (ops/sketch.py cms_*) — the
# mergeable-sketch family's point-query member. The sketch counters
# are splitmix-hashed, so the ORACLE REBUILDS THE SKETCH ITSELF with
# GROUP BY arithmetic and takes the same min-over-rows point query —
# est_n is hash-verified, not just rows-checked. true_n rides along
# so the output exhibits the CMS one-sided error (est >= true,
# pytest-pinned). Corpus is streamed twice over the single pruned
# int column (sketch build + exact probe counts); everything after is
# bounded by DEPTH x WIDTH = 4096 rows.
# --------------------------------------------------------------------------

CMS_PROBE_STEP = 5
CMS_PROBE_MAX = 150


def q_cms_user_counts(sf_dir: str):
    """(user_id, est_n, true_n) for the probe users: CMS point
    estimate next to the exact count."""
    import ray.data

    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.ops.sketch import cms_estimate, cms_partials

    probes = np.arange(0, CMS_PROBE_MAX, CMS_PROBE_STEP, dtype=np.int64)
    ev = read_table(sf_dir, "events", columns=["user_id"])

    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS, _n_rows

    counters = _as_arrow(cms_partials(
        ev, "user_id",
        driver_merge=_n_rows(sf_dir, "events") <= _GRID_DRIVER_ROWS,
    ))
    est = cms_estimate(counters, probes)

    probe_set = set(probes.tolist())

    def true_partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        m = np.isin(u, probes)
        vu, vc = np.unique(u[m], return_counts=True)
        return pa.table({"user_id": vu, "p": vc.astype(np.int64)})

    tp = _as_arrow(
        ev.map_batches(true_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    true_n = np.zeros(len(probes), dtype=np.int64)
    idx = {int(p): i for i, p in enumerate(probes)}
    for u, c in zip(tp["user_id"].to_pylist(), tp["p"].to_pylist()):
        if u in probe_set:
            true_n[idx[u]] += c
    return ray.data.from_arrow(
        pa.table({"user_id": probes, "est_n": est, "true_n": true_n})
    )


def sql_cms_user_counts() -> str:
    from osm2gtfs_ray.ops.sketch import CMS_STREAMS, CMS_WIDTH
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    arms = "\n    UNION ALL ".join(
        f"SELECT {d} AS d, ({_s_uint('uid', s, CMS_WIDTH)}) AS w FROM ev"
        for d, s in enumerate(CMS_STREAMS)
    )
    probe_vals = ",".join(
        f"({v})" for v in range(0, CMS_PROBE_MAX, CMS_PROBE_STEP)
    )
    parms = "\n    UNION ALL ".join(
        f"SELECT user_id, {d} AS d, ({_s_uint('pu', s, CMS_WIDTH)}) AS w FROM pr"
        for d, s in enumerate(CMS_STREAMS)
    )
    return f"""
WITH ev AS (SELECT CAST(user_id AS UBIGINT) AS uid FROM events),
ctr AS MATERIALIZED (
  SELECT d, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({arms})
  GROUP BY d, w
),
pr AS (SELECT CAST(user_id AS BIGINT) AS user_id,
              CAST(user_id AS UBIGINT) AS pu
       FROM (VALUES {probe_vals}) p(user_id)),
ph AS ({parms}),
est AS (
  SELECT ph.user_id, MIN(COALESCE(ctr.c, 0)) AS est_n
  FROM ph LEFT JOIN ctr ON ctr.d = ph.d AND ctr.w = ph.w
  GROUP BY ph.user_id
),
tru AS (SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS true_n
        FROM events GROUP BY user_id)
SELECT e.user_id, CAST(e.est_n AS BIGINT) AS est_n,
       COALESCE(t.true_n, 0) AS true_n
FROM est e LEFT JOIN tru t ON t.user_id = e.user_id
ORDER BY e.user_id
"""


# --------------------------------------------------------------------------
# Event-time watermark with late-data accounting (streaming semantics)
# --------------------------------------------------------------------------
# The Flink/Beam watermark model replayed deterministically over a
# batch: events ARRIVE in (arrival_ts, event_id) order, where
# arrival_ts = event_ts + a bounded synthetic ingestion delay
# (splitmix-derived from event_id, expression-identical both sides);
# the watermark after each arrival is the max EVENT time seen so far;
# an event is LATE (dropped from its window) when its event time is
# older than the pre-arrival watermark minus the allowed lateness.
# Output: per tumbling event-time hour, on-time vs dropped-late counts
# — the accounting every streaming sink needs to reconcile against
# its batch backfill.
#
# Scale shape: the watermark is an EXCLUSIVE running max over global
# arrival order — ops/scan.distributed_running_max (two-phase scan:
# quantile-range shards, map-side max partials, driver prefix-max of
# n_shards ints, one shuffle + local sorted cummax). The final
# per-hour rollup is a bounded-key sum (<= hours in the corpus).
#
# Reference analogue: the schedule-vs-OSM alignment cursor
# (ops/alignment.py J10) is the sequential form of "consume in one
# order, account against another"; this is its cluster-parallel,
# event-time generalization.

_WM_DELAY_STREAM = 293
WM_MAX_DELAY_S = 3600       # ingestion delay in [0, 1h)
WM_LATENESS_S = 900         # allowed lateness: 15 min
_WM_HOUR_US = 3_600_000_000


def q_watermark_late(sf_dir: str):
    """(hourb, n_on_time, n_late) per tumbling event-time hour."""
    from osm2gtfs_ray.ops.scan import RUNNING_MAX_NEG, distributed_running_max
    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.sources.pages import _uint

    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def arrivals(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(np.int64)
        t_us = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        delay_us = _uint(eid.astype(np.uint64), _WM_DELAY_STREAM, 42,
                         WM_MAX_DELAY_S) * 1_000_000
        return pd.DataFrame(
            {"event_id": eid, "t_us": t_us, "a_us": t_us + delay_us}
        )

    arr = ev.map_batches(arrivals, batch_format="pandas")
    wm = distributed_running_max(
        arr, order_cols=["a_us", "event_id"], value_col="t_us",
        out_col="prior_max",
    )

    late_cut_us = WM_LATENESS_S * 1_000_000

    def window_partials(b: pd.DataFrame) -> pd.DataFrame:
        t = b["t_us"].to_numpy(np.int64)
        late = t < b["prior_max"].to_numpy(np.int64) - late_cut_us
        out = pd.DataFrame(
            {
                "hourb": t // _WM_HOUR_US,
                "n_on_time": (~late).astype(np.int64),
                "n_late": late.astype(np.int64),
            }
        )
        return out.groupby("hourb", as_index=False).sum()  # map-side combine

    parts = wm.map_batches(window_partials, batch_format="pandas")
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    res = bounded_key_sum(
        parts, "hourb", ["n_on_time", "n_late"], driver=n_rows <= 200_000
    )
    return res.sort("hourb")


def sql_watermark_late() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    ex = "CAST(event_id AS UBIGINT)"
    return f"""
WITH arr AS (
  SELECT event_id, epoch_us(ts) AS t_us,
         epoch_us(ts)
           + CAST(({_s_uint(ex, _WM_DELAY_STREAM, WM_MAX_DELAY_S)}) AS BIGINT)
             * 1000000 AS a_us
  FROM events
),
wm AS (
  SELECT *, MAX(t_us) OVER (ORDER BY a_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
  FROM arr
)
SELECT t_us // {_WM_HOUR_US} AS hourb,
       CAST(SUM(CASE WHEN prior_max IS NULL
                       OR t_us >= prior_max - {WM_LATENESS_S * 1_000_000}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
       CAST(SUM(CASE WHEN prior_max IS NOT NULL
                      AND t_us < prior_max - {WM_LATENESS_S * 1_000_000}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM wm GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Daily spike (anomaly) detection per event type — integer-exact 1.5σ
# --------------------------------------------------------------------------
# Time-series anomaly primitive: a (event_type, day) cell spikes when
# its count exceeds the type's mean daily count by more than 1.5
# standard deviations. Exact in integers on both sides: with n days,
# S = Σc, Q = Σc², the test  c − S/n > 1.5·σ  (σ² = (nQ − S²)/n²)
# rearranges to  n·c > S  AND  4(n·c − S)² > 9(nQ − S²)  — no floats,
# no sqrt. The quadratic is evaluated with PYTHON INTS on the final
# bounded table (types × days rows — never corpus-sized), so it cannot
# wrap however large the daily counts get (the vocab-diversity gini
# lesson: int64 quadratics over corpus-scale counts silently overflow;
# SQL side uses HUGEINT for the same reason).
#
# Scale shape: per-batch partial counts on a BOUNDED key space
# (types × days) → bounded_key_sum (driver-merge under the corpus-rows
# gate, Ray groupby exchange above it) → the driver-side quadratic on
# the bounded stats table.

_SPIKE_DAY_US = 86_400_000_000


def q_spike_days(sf_dir: str):
    """(event_type, day, c) for daily counts > mean + 1.5σ of their
    event type's daily series."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].to_numpy("datetime64[us]").astype(np.int64)
                // _SPIKE_DAY_US,
            }
        )
        out["c"] = np.int64(1)
        return out.groupby(["event_type", "day"], as_index=False)["c"].sum()

    parts = ev.map_batches(partials, batch_format="pandas")
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    daily = bounded_key_sum(
        parts, ["event_type", "day"], ["c"], driver=n_rows <= 200_000
    ).to_pandas()  # bounded: |types| x |days|

    rows = []
    for et, g in daily.groupby("event_type", sort=True):
        cs = [int(x) for x in g["c"]]
        n, s = len(cs), sum(cs)
        q = sum(c * c for c in cs)
        for day, c in zip(g["day"], cs):
            d = n * c - s  # Python ints: exact at any corpus size
            if d > 0 and 4 * d * d > 9 * (n * q - s * s):
                rows.append((et, int(day), c))
    out = pd.DataFrame(rows, columns=["event_type", "day", "c"])
    out = out.sort_values(["event_type", "day"]).reset_index(drop=True)
    out["day"] = out["day"].astype(np.int64)
    out["c"] = out["c"].astype(np.int64)
    import ray.data

    return ray.data.from_pandas(out)


def sql_spike_days() -> str:
    return f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_SPIKE_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s, CAST(SUM(c * c) AS HUGEINT) AS q
  FROM d GROUP BY 1
)
SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.c
FROM d JOIN st USING (event_type)
WHERE n * c > s AND 4 * (n * c - s) * (n * c - s) > 9 * (n * q - s * s)
ORDER BY d.event_type, day
"""


# --------------------------------------------------------------------------
# Skyline (Pareto frontier) of documents — maximize (n_chars, n_distinct)
# --------------------------------------------------------------------------
# The classic multi-criteria operator (Börzsönyi et al., ICDE 2001):
# keep every document no other document dominates (>= in both
# dimensions, > in at least one; identical points never dominate each
# other, so exact duplicates co-survive). Dimensions here: raw length
# (n_chars) and lexical diversity (distinct token count) — the
# "longest AND most diverse" corpus-curation frontier.
#
# Scale shape: the textbook two-phase plan. Each block computes its
# LOCAL skyline (two C-level groupbys for the distinct count, then a
# sort + per-x-group running-max scan — no per-row Python); the union
# of local skylines provably contains the global skyline (dominance is
# transitive), and for independent-ish dimensions a local skyline is
# O(log block_rows) points, so the pooled candidate set is tiny and
# the final exact pass runs on the driver. A dependent-dimension
# adversary (every point on the frontier) degrades to the sort-based
# sweep, not a quadratic blowup.

def _skyline_scan(df: pd.DataFrame) -> pd.DataFrame:
    """Exact skyline of (n_chars max, n_distinct max) — vectorized
    sweep: within an equal-n_chars group only max-n_distinct points
    survive; sweeping n_chars descending, a group survives iff its
    max n_distinct strictly exceeds every larger-n_chars group's."""
    g = (
        df.groupby("n_chars", as_index=False)["n_distinct"]
        .max()
        .sort_values("n_chars", ascending=False)
    )
    ymax = g["n_distinct"].to_numpy(np.int64)
    prev = np.r_[np.int64(-1), np.maximum.accumulate(ymax)[:-1]]
    keep_x = g["n_chars"].to_numpy(np.int64)[ymax > prev]
    keep_y = ymax[ymax > prev]
    lim = pd.DataFrame({"n_chars": keep_x, "n_distinct": keep_y})
    return df.merge(lim, on=["n_chars", "n_distinct"])


def q_skyline_docs(sf_dir: str):
    """(doc_id, n_chars, n_distinct) for Pareto-optimal documents."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars", "text"])

    def local_skyline(t: pa.Table) -> pd.DataFrame:
        words = pc.split_pattern(t["text"].combine_chunks(), " ")
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        per_doc = (
            pa.table({"p": parent, "w": flat})
            .group_by(["p", "w"])
            .aggregate([])
            .group_by("p")
            .aggregate([([], "count_all")])
        )
        nd = np.zeros(len(t), dtype=np.int64)
        nd[per_doc["p"].to_numpy()] = per_doc["count_all"].to_numpy()
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "n_chars": t["n_chars"].to_numpy(),
                "n_distinct": nd,
            }
        )
        return _skyline_scan(df)

    cand = docs.map_batches(local_skyline, batch_format="pyarrow").to_pandas()
    out = (
        _skyline_scan(cand)
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    return ray.data.from_pandas(out)


SQL_SKYLINE_DOCS = """
WITH d AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_distinct
  FROM documents
)
SELECT a.doc_id, a.n_chars, a.n_distinct
FROM d a
WHERE NOT EXISTS (
  SELECT 1 FROM d b
  WHERE b.n_chars >= a.n_chars AND b.n_distinct >= a.n_distinct
    AND (b.n_chars > a.n_chars OR b.n_distinct > a.n_distinct)
)
ORDER BY a.doc_id
"""


# --------------------------------------------------------------------------
# Exact per-group discrete median (lower median, element selection)
# --------------------------------------------------------------------------
# The grouped exact-quantile operator: unlike the sketch path
# (q_quantile_price_sketch, bounded error) this SELECTS the true
# median ELEMENT per group — lower median, the value at sorted index
# (n-1)//2, which DuckDB's quantile_disc(x, 0.5) implements exactly
# (probed; element selection means no float arithmetic happens, so
# engine and oracle agree bit-for-bit on doubles). Scale shape: ONE
# user-hash shuffle, then a vectorized per-shard sort + group-start
# index pick — the groups of a shard are handled in one C-level pass,
# never one Python call per user.

def q_median_user_value(sf_dir: str):
    """(user_id, median_value): lower-median event value per user."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "value"])

    def med_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        val = g["value"].to_numpy(np.float64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lengths = np.diff(np.r_[starts, len(g)])
        pick = starts + (lengths - 1) // 2
        return pd.DataFrame(
            {"user_id": uid[starts], "median_value": val[pick]}
        )

    return sharded_map_groups(ev, "user_id", med_shard)


SQL_MEDIAN_USER_VALUE = """
SELECT user_id, quantile_disc(value, 0.5) AS median_value
FROM events GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Association-rule lift over per-user event-type baskets
# --------------------------------------------------------------------------
# Market-basket analysis: basket = the set of event types a user ever
# emitted; for each unordered type pair, lift = P(a,b)/(P(a)P(b)) =
# n_ab·N / (n_a·n_b) in fixed point (·10^6, floor). The type domain is
# closed (EVENT_TYPES), so every aggregate lands in a BOUNDED key
# space: per-batch (user, type) dedupe → ONE user-hash shuffle for the
# exact per-user distinct sets → per-shard vectorized single/pair/user
# partial counts (<= 5 + 10 + 1 keys) → driver merge, with the final
# lift quotient computed in PYTHON INTS over <= 10 rows (n_ab·N·10^6
# would wrap int64 near ~3e6 users — the spike_days lesson; SQL side
# uses HUGEINT).

LIFT_SCALE = 1_000_000


def q_type_lift(sf_dir: str):
    """(type_a, type_b, n_a, n_b, n_ab, lift_fp) per co-occurring
    unordered event-type pair."""
    import ray.data

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def count_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        rows: list[tuple[str, str, int]] = []
        nu = g["user_id"].nunique()
        rows.append(("__users__", "", int(nu)))
        singles = g.groupby("event_type").size()
        rows.extend((t, "", int(c)) for t, c in singles.items())
        m = g.merge(g, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"]).size()
        rows.extend((a, b, int(c)) for (a, b), c in pairs.items())
        return pd.DataFrame(rows, columns=["ka", "kb", "c"])

    parts = sharded_map_groups(
        ev.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas"),
        "user_id",
        count_shard,
    ).to_pandas()
    agg = parts.groupby(["ka", "kb"], sort=True)["c"].sum()
    nu = int(agg.get(("__users__", ""), 0))
    singles = {k[0]: int(v) for k, v in agg.items() if k[1] == "" and k[0] != "__users__"}
    out_rows = []
    for (a, b), cab in agg.items():
        if b == "":
            continue
        cab = int(cab)
        lift = (cab * nu * LIFT_SCALE) // (singles[a] * singles[b])
        out_rows.append((a, b, singles[a], singles[b], cab, lift))
    out = pd.DataFrame(
        sorted(out_rows),
        columns=["type_a", "type_b", "n_a", "n_b", "n_ab", "lift_fp"],
    )
    for c in ["n_a", "n_b", "n_ab", "lift_fp"]:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_pandas(out)


SQL_TYPE_LIFT = f"""
WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS nu FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
p AS (
  SELECT a.event_type AS ta, b2.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS cab
  FROM b a JOIN b b2
    ON a.user_id = b2.user_id AND a.event_type < b2.event_type
  GROUP BY 1, 2
)
SELECT p.ta AS type_a, p.tb AS type_b, sa.c AS n_a, sb.c AS n_b,
       p.cab AS n_ab,
       CAST((CAST(p.cab AS HUGEINT) * nu * {LIFT_SCALE})
            // (CAST(sa.c AS HUGEINT) * sb.c) AS BIGINT) AS lift_fp
FROM p
JOIN s sa ON sa.event_type = p.ta
JOIN s sb ON sb.event_type = p.tb
CROSS JOIN n
ORDER BY type_a, type_b
"""


# --------------------------------------------------------------------------
# Inter-arrival histogram: log2-bucketed gap distribution per type
# --------------------------------------------------------------------------
# The burstiness diagnostic behind rate-limit tuning and session-gap
# calibration (the same gap statistic q_sessionize thresholds at 30
# min, histogrammed instead of cut): for each (user, event_type) run
# ordered by time, the gap to the previous event in whole seconds,
# bucketed by b = floor(log2(gap_s + 1)) and counted per event_type.
# log2 on an exact small integer is IEEE-exact at powers of two and
# irrational (nowhere near an integer) otherwise, so the float floor
# is integer-exact on both sides — the repo's vocab_diversity rule.
# One user-hash shuffle (gaps are per-user-run local), per-shard
# partial histograms, then a bounded (type x ~40 buckets) merge.

def q_interarrival_hist(sf_dir: str):
    """(event_type, bucket, n): count of consecutive same-type gaps per
    user falling in [2^b - 1, 2^(b+1) - 1) seconds."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum, sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        typ = g["event_type"].to_numpy()
        tu = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = np.r_[False, (uid[1:] == uid[:-1]) & (typ[1:] == typ[:-1])]
        gap = (np.r_[0, np.diff(tu)][same]) // 1_000_000
        bucket = np.floor(np.log2(gap + 1)).astype(np.int64)
        part = pd.DataFrame({"event_type": typ[same], "bucket": bucket})
        out = part.groupby(["event_type", "bucket"], sort=False,
                           as_index=False).agg(partial=("bucket", "size"))
        out["partial"] = out["partial"].astype(np.int64)
        return out

    parts = sharded_map_groups(ev, "user_id", shard)
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    out = bounded_key_sum(parts, ["event_type", "bucket"], ["partial"],
                          driver=n_rows <= 200_000, out_names=["n"])
    return out.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "bucket": pc.cast(t["bucket"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


SQL_INTERARRIVAL_HIST = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
          )) // 1000000 AS gap
  FROM events
)
SELECT event_type, CAST(FLOOR(LOG2(gap + 1)) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM g WHERE gap IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Ordered behavior-sequence extraction per user
# --------------------------------------------------------------------------
# The sequence-building step of behavioral/session modeling (and of
# sequence-LM training corpora): each user's first SEQ_N event types
# in time order, serialized to one delimited string — the ordered
# collect_list every feature store ships. One user-hash shuffle; the
# per-shard pass is a single sorted groupby + capped string join
# (C-level pandas), never a per-user Python dispatch.

SEQ_N = 10


def q_event_sequences(sf_dir: str):
    """(user_id, n_events, seq): total event count and the '>'-joined
    first SEQ_N event types ordered by (ts, event_id)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lengths = np.diff(np.r_[starts, n])
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)
        head = g[seq < SEQ_N]
        agg = head.groupby("user_id", sort=False).agg(
            seq=("event_type", ">".join)
        )
        agg["n_events"] = pd.Series(lengths, index=uid[starts])
        return agg.reset_index().rename(columns={"index": "user_id"})[
            ["user_id", "n_events", "seq"]
        ]

    return sharded_map_groups(ev, "user_id", shard)


SQL_EVENT_SEQUENCES = f"""
WITH s AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id, CAST(ANY_VALUE(n_events) AS BIGINT) AS n_events,
       STRING_AGG(event_type, '>' ORDER BY rn) AS seq
FROM s WHERE rn <= {SEQ_N}
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Exponential time-decay engagement score (exact power-of-two decay)
# --------------------------------------------------------------------------
# The recency-weighted engagement counter behind feed ranking and
# churn features — sum over a user's events of 2^-(age_days) with a
# one-day half-life, made EXACT by scaling to w = 2^(DECAY_K - age):
# every weight is an integer power of two, so the score is an exact
# int64 sum (bound: events-in-window * 2^30 < 2^63 holds to ~8.6e9
# events per user) and fully mergeable — per-batch partial sums, one
# groupby Sum, no window ordering needed at all. Reference epoch is a
# fixed constant one day past the corpus range so age >= 0.

DECAY_K = 30                                    # window length in days
DECAY_REF_US = 1_706_659_200_000_000            # 2024-01-31T00:00:00Z
_DAY_US = 86_400_000_000


def q_decayed_engagement(sf_dir: str):
    """(user_id, n_recent, score_fp): events within the DECAY_K-day
    window and the exact 2^(K-age_days)-weighted sum."""
    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        tu = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        age = (DECAY_REF_US - tu) // _DAY_US
        w = np.where((age >= 0) & (age <= DECAY_K),
                     np.int64(1) << np.minimum(np.maximum(DECAY_K - age, 0), DECAY_K),
                     0)
        g = (
            pa.table({
                "user_id": t["user_id"],
                "w": w,
                "c": (w > 0).astype(np.int64),
            })
            .group_by("user_id")
            .aggregate([("w", "sum"), ("c", "sum")])
        )
        return g.rename_columns(["user_id", "pw", "pc"])

    agg = (
        ev.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("pc", alias_name="n_recent"), Sum("pw", alias_name="score_fp"))
    )
    return agg.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_recent": pc.cast(t["n_recent"], pa.int64()),
            "score_fp": pc.cast(t["score_fp"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


SQL_DECAYED_ENGAGEMENT = f"""
SELECT user_id,
       CAST(COUNT(*) FILTER (age BETWEEN 0 AND {DECAY_K}) AS BIGINT) AS n_recent,
       CAST(COALESCE(SUM(CASE WHEN age BETWEEN 0 AND {DECAY_K}
                              THEN CAST(1 AS BIGINT) << ({DECAY_K} - age)
                              ELSE 0 END), 0) AS BIGINT) AS score_fp
FROM (
  SELECT user_id, ({DECAY_REF_US} - epoch_us(ts)) // {_DAY_US} AS age
  FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts)
# --------------------------------------------------------------------------
# The behavior-model counterpart of q_event_sequences: how often does
# a user's event of type A immediately precede one of type B — the
# transition-count matrix that seeds Markov session models and
# next-action features (and the ordered counterpart of q_type_lift's
# unordered co-occurrence). Same one-user-hash-shuffle LAG machinery
# as q_ping_speed; the (from_type, to_type) merge is bounded by the
# type-vocabulary square.

def q_type_transitions(sf_dir: str):
    """(from_type, to_type, n): count of consecutive same-user event
    pairs, ordered by (ts, event_id)."""
    from osm2gtfs_ray.ops.sharded import bounded_key_sum, sharded_map_groups

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "event_id", "ts"])

    def shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        typ = g["event_type"].to_numpy()
        legs = np.r_[False, uid[1:] == uid[:-1]]
        part = pd.DataFrame(
            {"from_type": np.r_[[""], typ[:-1]][legs], "to_type": typ[legs]}
        )
        out = part.groupby(["from_type", "to_type"], sort=False,
                           as_index=False).agg(partial=("to_type", "size"))
        out["partial"] = out["partial"].astype(np.int64)
        return out

    parts = sharded_map_groups(ev, "user_id", shard)
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    out = bounded_key_sum(parts, ["from_type", "to_type"], ["partial"],
                          driver=n_rows <= 200_000, out_names=["n"])
    return out.map_batches(
        lambda t: pa.table({
            "from_type": t["from_type"],
            "to_type": t["to_type"],
            "n": pc.cast(t["n"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


SQL_TYPE_TRANSITIONS = """
WITH s AS (
  SELECT event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# CUBE aggregate over (event_type, day-of-week): all four grouping
# sets in one pass. Reference semantics analogue: osm2gtfs's trip
# counting rolls service totals up per route AND per day-of-week
# keyword (creators/trips_creator.py service handling); the cube is
# the relational generalization.
#
# Scale plan: values are quantized to int64 1e-6 units PER ROW (the
# value_e6 convention), partial-aggregated per batch on the finest
# (type, dow) grain, merged through bounded_key_sum (key space =
# |types| x 7, never corpus-sized); the three coarser grouping sets
# are pure arithmetic on that bounded table - ONE exchange total, no
# second pass over events. dow is epoch-day arithmetic ((day + 4) % 7,
# 0 = Sunday), identical integer expressions on both sides - no
# calendar library in either engine.

_CUBE_DAY_US = 86_400_000_000
_CUBE_ALL_TYPE = "ALL"  # sentinel for the rolled-up type dimension
_CUBE_ALL_DOW = -1  # sentinel for the rolled-up dow dimension


def q_event_cube(sf_dir: str):
    """(event_type, dow, n_events, sum_value_e6) for GROUPING SETS
    ((type, dow), (type), (dow), ()) with 'ALL'/-1 sentinels."""
    import pyarrow.parquet as _pq

    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        out = pd.DataFrame(
            {
                "event_type": b["event_type"],
                "dow": (
                    b["ts"].to_numpy("datetime64[us]").astype(np.int64)
                    // _CUBE_DAY_US
                    + 4
                )
                % 7,
                "v": np.trunc(v * 1e6 + np.copysign(0.5, v)).astype(np.int64),
            }
        )
        out["n"] = np.int64(1)
        return out.groupby(["event_type", "dow"], as_index=False).agg(
            n=("n", "sum"), v=("v", "sum")
        )

    parts = ev.map_batches(partials, batch_format="pandas")
    n_rows = _pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    fine = bounded_key_sum(
        parts, ["event_type", "dow"], ["n", "v"], driver=n_rows <= 200_000
    ).to_pandas()  # bounded: |types| x 7 rows
    fine = fine.rename(columns={"n": "n_events", "v": "sum_value_e6"})
    fine["dow"] = fine["dow"].astype(np.int64)

    def roll(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if keys:
            g = df.groupby(keys, as_index=False)[
                ["n_events", "sum_value_e6"]
            ].sum()
        else:
            g = df[["n_events", "sum_value_e6"]].sum().to_frame().T
        if "event_type" not in keys:
            g["event_type"] = _CUBE_ALL_TYPE
        if "dow" not in keys:
            g["dow"] = np.int64(_CUBE_ALL_DOW)
        return g

    cols = ["event_type", "dow", "n_events", "sum_value_e6"]
    out = pd.concat(
        [
            fine[cols],
            roll(fine, ["event_type"])[cols],
            roll(fine, ["dow"])[cols],
            roll(fine, [])[cols],
        ],
        ignore_index=True,
    )
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value_e6"] = out["sum_value_e6"].astype(np.int64)
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


SQL_EVENT_CUBE = f"""
WITH base AS (
  SELECT event_type,
         (epoch_us(ts) // {_CUBE_DAY_US} + 4) % 7 AS dow,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v
  FROM events
)
SELECT COALESCE(event_type, '{_CUBE_ALL_TYPE}') AS event_type,
       CAST(COALESCE(dow, {_CUBE_ALL_DOW}) AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(v) AS BIGINT) AS sum_value_e6
FROM base
GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow), ())
ORDER BY 1, 2
"""
