"""Set-op + string-normalization queries (SURVEY.md A8, §2.7 union,
M13) with SQL oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count

from osm2gtfs_ray.ops.dedupe import distinct
from osm2gtfs_ray.ops.joins import broadcast_anti
from osm2gtfs_ray.sources.tables import read_table


# --------------------------------------------------------------------------
# EXCEPT: users who click but never purchase (A8 set-difference,
# trips_creator_br_florianopolis.py:120-134 exception-date diff)
# --------------------------------------------------------------------------

def q_click_not_purchase(sf_dir: str):
    """(user, day) pairs that clicked but did not purchase that day —
    EXCEPT on a composite key (day derived as epoch-day int)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def keyed(t: pa.Table, etype: str) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], pa.scalar(etype)))
        us = pc.cast(t["ts"], pa.int64())  # µs since epoch
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        uid = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "day": day,
                "ukey": pc.add(pc.multiply(uid, pa.scalar(1_000_000, pa.int64())), day),
            }
        )

    clicks = distinct(
        ev.map_batches(lambda t: keyed(t, "click"), batch_format="pyarrow"),
        ["user_id", "day", "ukey"],
    )
    buys = ev.map_batches(lambda t: keyed(t, "purchase"), batch_format="pyarrow")
    out = broadcast_anti(clicks, buys, key="ukey")
    return out.select_columns(["user_id", "day"])


SQL_CLICK_NOT_PURCHASE = """
SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
FROM events WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# UNION + distinct (§2.7: Overpass result-set unions → ds.union)
# --------------------------------------------------------------------------

def q_union_actors(sf_dir: str):
    """Distinct ids active as big customers OR recent event users —
    two filtered streams unioned then deduped (the reference's query
    union semantics, osm_connector.py:581-584)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    rich = cust.map_batches(
        lambda t: pa.table(
            {"actor_id": pc.cast(t.filter(pc.greater(t["c_acctbal"], pa.scalar(9000.0)))["c_custkey"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    signups = ev.map_batches(
        lambda t: pa.table(
            {"actor_id": pc.cast(t.filter(pc.equal(t["event_type"], pa.scalar("signup")))["user_id"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return distinct(rich.union(signups), "actor_id")


SQL_UNION_ACTORS = """
SELECT CAST(c_custkey AS BIGINT) AS actor_id FROM customer WHERE c_acctbal > 9000.0
UNION
SELECT CAST(user_id AS BIGINT) AS actor_id FROM events WHERE event_type = 'signup'
"""


# --------------------------------------------------------------------------
# M13: regex string normalization (the Floripa terminal-code rule,
# trips_creator_br_florianopolis.py:289-298) — vectorized re2 kernel
# --------------------------------------------------------------------------

def q_normalize_names(sf_dir: str):
    """Normalize part names: collapse the leading color word to a
    canonical code + literal replacements, grouped count — the M13
    normalize-then-group pattern."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])

    def f(t: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(t["p_name"], r"^(\w+)\s.*$", r"\1")
        norm = pc.utf8_upper(norm)
        norm = pc.replace_substring(norm, "BLUSH", "PINK")
        return pa.table({"name_code": norm})

    agg = part.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "name_code"
    ).aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"name_code": t["name_code"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
    )


SQL_NORMALIZE_NAMES = r"""
SELECT replace(upper(regexp_replace(p_name, '^(\w+)\s.*$', '\1')), 'BLUSH', 'PINK') AS name_code,
       COUNT(*) AS n
FROM part GROUP BY 1
"""


# --------------------------------------------------------------------------
# Gap-based sessionization (streaming-shaped; SQL window oracle)
# --------------------------------------------------------------------------

_SESSION_GAP_S = 1800


def q_sessionize(sf_dir: str):
    """Per-user gap sessionization (30 min): session boundaries where
    the inter-event gap exceeds the threshold, then per-session stats.
    Batch re-expression of a session window: groupby(user) →
    sorted map_groups cumsum (order carried by ts, ray_guide
    'Streaming-shaped workloads')."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def sess_shard(g: pd.DataFrame) -> pd.DataFrame:
        """All users of one hash shard in a single vectorized pass:
        sort (user, ts, event_id), flag gaps > threshold OR user
        boundaries, per-user cumsum via pandas groupby (C-level)."""
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("int64").to_numpy() // 1_000_000
        uid = g["user_id"].to_numpy()
        new = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            new[1:] = ((np.diff(us) > _SESSION_GAP_S) & (uid[1:] == uid[:-1])).astype(
                np.int64
            )
        sid = (
            pd.Series(new)
            .groupby(pd.Series(uid), sort=False)
            .cumsum()
            .to_numpy()
        )
        out = pd.DataFrame({"user_id": uid, "session_id": sid, "n": 1})
        agg = out.groupby(["user_id", "session_id"], as_index=False, sort=False)["n"].sum()
        return agg.rename(columns={"n": "n_events"})

    return sharded_map_groups(ev, "user_id", sess_shard)


SQL_SESSIONIZE = f"""
SELECT user_id, session_id, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                     > {_SESSION_GAP_S} THEN 1 ELSE 0 END AS is_new
    FROM events
  )
)
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# As-of join (general operator; DuckDB native ASOF JOIN oracle)
# --------------------------------------------------------------------------

def q_asof_last_order(sf_dir: str):
    """Each event joined to the user's most recent order at-or-before
    the event time (ops/asof.py; the J10 cursor as a relational
    operator). Emits the matched order DATE (ties on identical
    (custkey, date) are value-equal, keeping the result deterministic)."""
    import pyarrow.parquet as pq

    from osm2gtfs_ray.ops.asof import asof_join_broadcast
    from osm2gtfs_ray.sources.tables import table_path

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = (
        pq.read_table(table_path(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])
        .to_pandas()
        .rename(columns={"o_custkey": "user_id"})
    )

    joined = asof_join_broadcast(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=[],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "last_order_epoch": pc.cast(
                    pc.cast(t["o_orderdate"], pa.timestamp("s")), pa.int64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ASOF_LAST_ORDER = """
SELECT e.event_id,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS last_order_epoch
FROM events e ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""
