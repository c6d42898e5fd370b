"""Query registry: one entry per implemented operator (SURVEY.md §2),
each returning a Ray result plus (where SQL-expressible) a DuckDB
oracle with IDENTICAL column names and value encodings.

Encoding rules for driver value-hash parity (CORRECTNESS gate):
* float aggregates are emitted as scaled BIGINTs (``round(x * 10^k)``)
  on BOTH sides — fp summation-order noise (≪ the rounding grain)
  cannot flip the hash, and integers hash identically everywhere.
* timestamps in aggregates are emitted as epoch-second BIGINTs.
* per-row float columns that must stay float (lat/lon) are rounded to
  a fixed grain on both sides.

Each query docstring names the reference operator(s) it re-expresses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from osm2gtfs_ray.ops.joins import broadcast_anti, broadcast_join, broadcast_semi
from osm2gtfs_ray.ops.dedupe import distinct, keep_first, keep_top_k
from osm2gtfs_ray.sources.tables import read_table


def _epoch_s(arr) -> pa.Array:
    """timestamp (any unit) → epoch seconds int64 (DuckDB epoch())."""
    return pc.cast(pc.cast(arr, pa.timestamp("s")), pa.int64())


def _scaled_int(arr, scale: float) -> pa.Array:
    """round(x*scale) → int64, half towards infinity (matches DuckDB ROUND)."""
    x = pc.multiply(pc.cast(arr, pa.float64()), pa.scalar(float(scale)))
    return pc.cast(pc.round(x, ndigits=0, round_mode="half_towards_infinity"), pa.int64())


# --------------------------------------------------------------------------
# Q1-style pricing summary: filter → projection → grouped aggregate
# (reference semantics: A-family grouped aggregates, SURVEY.md §2.5;
#  pre-aggregation happens inside Ray's hash aggregate per block)
# --------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """Filter + multi-aggregate groupby (vectorized Arrow kernels)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    cutoff = pa.scalar(np.datetime64("1997-06-01", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty_raw"),
            Sum("l_extendedprice", alias_name="sum_base_raw"),
            Sum("disc_price", alias_name="sum_disc_raw"),
            Count(alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": _scaled_int(t["sum_qty_raw"], 100),
                "sum_base_price": _scaled_int(t["sum_base_raw"], 100),
                "sum_disc_price": _scaled_int(t["sum_disc_raw"], 100),
                "count_order": pc.cast(t["count_order"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT)       AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT)  AS sum_base_price,
       CAST(ROUND(SUM(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-06-01'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Broadcast multi-join + top-k (reference J7 multi-key join + O4 top-k)
# --------------------------------------------------------------------------

def q_top_orders(sf_dir: str):
    """customer ⋈ orders ⋈ lineitem, revenue per order, top 10.

    Both dims broadcast (ray.put once), probe side streams — the J7
    'broadcast the small side' plan (SURVEY.md §7.3)."""
    import pyarrow.parquet as pq

    from osm2gtfs_ray.sources.tables import table_path

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    # dimension prep happens driver-side with plain pyarrow: these
    # tables are the BROADCAST side (they must fit in one object
    # anyway), so composing them locally costs one read instead of two
    # extra Ray executions; only the probe side (lineitem) streams.
    cust = pq.read_table(table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    cust_b = cust.filter(pc.equal(cust["c_mktsegment"], pa.scalar("BUILDING")))
    orders = pq.read_table(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    orders_dim = orders.join(
        cust_b.select(["c_custkey"]), keys=["o_custkey"], right_keys=["c_custkey"],
        join_type="inner",
    )
    li_j = broadcast_join(li, orders_dim.select(["o_orderkey", "o_orderdate"]),
                          keys="l_orderkey", right_keys="o_orderkey")

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "o_orderdate": t["o_orderdate"], "rev": r}
        )

    agg = (
        li_j.map_batches(rev, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev", alias_name="rev_raw"))
    )
    top = agg.sort("rev_raw", descending=True).limit(10)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "odate": _epoch_s(t["o_orderdate"]),
                "revenue": _scaled_int(t["rev_raw"], 100),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


SQL_TOP_ORDERS = """
SELECT l_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS odate,
       CAST(ROUND(SUM(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(l_extendedprice * (1.0 - l_discount)) DESC
LIMIT 10
"""


# --------------------------------------------------------------------------
# 5-way star join (broadcast dims) — revenue per nation
# --------------------------------------------------------------------------

def q_nation_revenue(sf_dir: str):
    """lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (all dims broadcast)."""
    import pyarrow.parquet as pq

    from osm2gtfs_ray.sources.tables import table_path

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    # dim chain composed driver-side (broadcast side must fit in one
    # object regardless); the fact stream joins it in ONE execution
    orders = pq.read_table(table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(
        table_path(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(table_path(sf_dir, "region"), columns=["r_regionkey", "r_name"])

    nat = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    cust_dim = cust.join(nat, keys=["c_nationkey"], right_keys=["n_nationkey"])
    ord_dim = orders.join(cust_dim, keys=["o_custkey"], right_keys=["c_custkey"])
    li_j = broadcast_join(
        li,
        ord_dim.select(["o_orderkey", "n_name", "r_name"]),
        keys="l_orderkey",
        right_keys="o_orderkey",
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"n_name": t["n_name"], "r_name": t["r_name"], "rev": r})

    agg = (
        li_j.map_batches(rev, batch_format="pyarrow")
        .groupby(["n_name", "r_name"])
        .aggregate(Sum("rev", alias_name="rev_raw"), Count(alias_name="n_items"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t["n_name"],
                "r_name": t["r_name"],
                "revenue": _scaled_int(t["rev_raw"], 100),
                "n_items": pc.cast(t["n_items"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_NATION_REVENUE = """
SELECT n_name, r_name,
       CAST(ROUND(SUM(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# --------------------------------------------------------------------------
# Anti / semi joins (reference A6/A7 unused-stop/route removal)
# --------------------------------------------------------------------------

def q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no URGENT-priority order
    (re-expresses stops_creator.py:45-61 unused-stop removal: the
    broadcast-key-set anti-semi-join, A6/A7)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))),
        batch_format="pyarrow",
    )
    return broadcast_anti(cust, urgent, key="c_custkey", right_key="o_custkey")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def q_suppliers_with_sales(sf_dir: str):
    """Semi-join: suppliers appearing in lineitem (A6 inverse)."""
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal"])
    li = read_table(sf_dir, "lineitem", columns=["l_suppkey"])
    out = broadcast_semi(sup, li, key="s_suppkey", right_key="l_suppkey")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_name": t["s_name"],
                "acctbal": _scaled_int(t["s_acctbal"], 100),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_SUPPLIERS_WITH_SALES = """
SELECT s_suppkey, s_name, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal
FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
"""


# --------------------------------------------------------------------------
# Keep-first dedup (reference J1 consume-once / J3 route_id guard)
# --------------------------------------------------------------------------

def q_first_order_per_customer(sf_dir: str):
    """Deterministic keep-first per key: earliest (o_orderdate,
    o_orderkey) order per customer — the J1/J3 first-wins semantics
    as hash-partition + per-group sorted head(1)."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    first = keep_first(orders, key="o_custkey", order_by=["o_orderdate", "o_orderkey"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "odate": _epoch_s(t["o_orderdate"]),
            }
        )

    return first.map_batches(finish, batch_format="pyarrow")


SQL_FIRST_ORDER = """
SELECT o_custkey, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS odate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Distinct + grouped count (reference A2/A9 count stats)
# --------------------------------------------------------------------------

def q_event_type_counts(sf_dir: str):
    ev = read_table(sf_dir, "events", columns=["event_type"])
    agg = ev.groupby("event_type").aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"event_type": t["event_type"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
    )


SQL_EVENT_TYPE_COUNTS = "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"


# --------------------------------------------------------------------------
# Tumbling window (streaming-shaped: events bucketed by hour)
# --------------------------------------------------------------------------

def q_hourly_event_stats(sf_dir: str):
    """Tumbling 1h window per event_type: derived window key + grouped
    aggregate (the batch re-expression of a streaming window;
    ray_guide 'Streaming-shaped workloads')."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.multiply(pc.divide(us, 3_600_000_000), pa.scalar(3600, pa.int64()))
        return pa.table({"event_type": t["event_type"], "hour_start": hour, "value": t["value"]})

    agg = (
        ev.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="val_raw"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour_start": t["hour_start"],
                "n": pc.cast(t["n"], pa.int64()),
                "sum_value": _scaled_int(t["val_raw"], 10_000),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_HOURLY_EVENT_STATS = """
SELECT event_type,
       CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_start,
       COUNT(*) AS n,
       CAST(ROUND(SUM(value) * 10000) AS BIGINT) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Top-k per group (windowed rank): ops/dedupe.keep_top_k — map-side
# combine keeps ≤k rows per key per batch, so hot keys never inflate
# the shuffle. ROW_NUMBER() <= k semantics with a total order.
# --------------------------------------------------------------------------

def q_top_orders_per_customer(sf_dir: str):
    """Each customer's top-3 orders by price (tie-break o_orderkey)."""
    ords = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        # negate price so a single ascending sort gives (price desc,
        # orderkey asc) — pandas multi-col sorts need uniform direction
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "neg_price_c": pc.multiply(
                    _scaled_int(t["o_totalprice"], 100), pa.scalar(-1, pa.int64())
                ),
            }
        )

    top = keep_top_k(
        ords.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        key="o_custkey",
        order_by=["neg_price_c", "o_orderkey"],
        k=3,
    )

    def finish(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": t["o_custkey"].astype("int64"),
                "o_orderkey": t["o_orderkey"].astype("int64"),
                "price_c": (-t["neg_price_c"]).astype("int64"),
                "rnk": t["rnk"].astype("int64"),
            }
        )

    return top.map_batches(finish, batch_format="pandas")


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
       rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY ROUND(o_totalprice * 100) DESC, o_orderkey
         ) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# Grouped exact COUNT(DISTINCT): the DAU pattern. Distinct is the
# expensive half (per-batch local dedup → one sharded hash shuffle,
# ops/dedupe.distinct); the count is then a per-batch partial + tiny
# groupby. COUNT(DISTINCT) never sees raw event rows post-shuffle.
# --------------------------------------------------------------------------

def q_daily_active_users(sf_dir: str):
    ev = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def day_user(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.multiply(pc.divide(us, 86_400_000_000), pa.scalar(86_400, pa.int64()))
        return pa.table({"day_start": day, "user_id": t["user_id"]})

    uniq = distinct(ev.map_batches(day_user, batch_format="pyarrow"),
                    ["day_start", "user_id"])

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by("day_start").aggregate([([], "count_all")])
        return g.rename_columns(["day_start", "n_part"])

    agg = (
        uniq.map_batches(pre, batch_format="pyarrow")
        .groupby("day_start")
        .aggregate(Sum("n_part", alias_name="dau"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"day_start": t["day_start"], "dau": pc.cast(t["dau"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


SQL_DAILY_ACTIVE_USERS = """
SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# Approximate DAU via HyperLogLog sketch (ops/sketch.py): the
# corpus-scale path for q_daily_active_users — fixed 2^10 bytes per
# (day, batch) move instead of one row per distinct user. The estimate
# is approximate vs the TRUE count (~3% bound, pytest-asserted in
# tests/test_ops.py::TestHLL) but DETERMINISTIC given the hash, so the
# whole sketch re-derives in SQL: splitmix64 per user_id, register =
# top 10 hash bits, rho = leading zeros of the low 54 bits + 1
# (exact integer bit-length via bin()-string, no float log2), per-day
# register MAX, then the bias-corrected harmonic estimate with the
# linear-counting small-range branch — SQL_DAU_APPROX below.
# --------------------------------------------------------------------------

def q_dau_approx(sf_dir: str):
    from osm2gtfs_ray.ops.sketch import hll_count_distinct

    ev = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def day_user(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.multiply(pc.divide(us, 86_400_000_000), pa.scalar(86_400, pa.int64()))
        return pa.table({"day_start": day, "user_id": t["user_id"]})

    est = hll_count_distinct(
        ev.map_batches(day_user, batch_format="pyarrow"), "day_start", "user_id"
    )
    return pd.DataFrame(
        {
            "day_start": est["day_start"].astype("int64"),
            "dau_est": est["estimate"].astype("int64"),
        }
    )


def _sql_dau_approx() -> str:
    """Bit-exact SQL re-derivation of the HLL pipeline (ops/sketch.py,
    P=10). Register state is integer-exact (verified register-identical
    vs numpy at sf0.01); the only float steps are the harmonic sum and
    ln(), where an ulp-level summation-order difference could in theory
    flip ROUND at an exact .5 boundary — never observed, and the
    estimate values (ratios of irrational logs) essentially cannot land
    on .5 exactly."""
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_mix64

    h = _s_mix64("CAST(user_id AS UBIGINT)")
    low54 = (1 << 54) - 1
    return f"""
WITH hashed AS (
  SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
         ({h}) AS h
  FROM events
),
regs AS (
  SELECT day_start,
         CAST(h >> 54 AS BIGINT) AS reg,
         MAX(CASE WHEN (h & CAST({low54} AS UBIGINT)) = CAST(0 AS UBIGINT) THEN 55
              ELSE 55 - length(ltrim(bin(h & CAST({low54} AS UBIGINT)), '0')) END) AS rho
  FROM hashed GROUP BY 1, 2
),
folded AS (
  SELECT day_start,
         SUM(POWER(2.0, -rho)) + (1024 - COUNT(*)) AS s,
         1024 - COUNT(*) AS zeros
  FROM regs GROUP BY day_start
),
est AS (
  SELECT day_start, zeros,
         (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024 / s AS e
  FROM folded
)
SELECT day_start,
       CAST(ROUND(CASE WHEN e <= 2560.0 AND zeros > 0
                       THEN 1024 * LN(1024.0 / zeros) ELSE e END) AS BIGINT) AS dau_est
FROM est
"""


SQL_DAU_APPROX = _sql_dau_approx()


# --------------------------------------------------------------------------
# Grouped quantiles via counting sketch (distributed order statistics
# without a sort — ops/quantile.py; exact for the bounded l_quantity
# domain, so DuckDB quantile_cont IS the oracle)
# --------------------------------------------------------------------------

def q_quantile_qty(sf_dir: str):
    """Median + p95 of l_quantity per return flag: per-batch count
    partials → one sketch-sized groupby — no distributed sort ever
    touches the 6·SF-million-row fact table."""
    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.ops.quantile import (
        grouped_quantile_counts,
        quantiles_from_counts,
    )

    li = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    sketch = _as_arrow(grouped_quantile_counts(li, ["l_returnflag"], "l_quantity"))
    qdf = quantiles_from_counts(sketch, ["l_returnflag"], "l_quantity", [0.5, 0.95])
    return pd.DataFrame(
        {
            "l_returnflag": qdf["l_returnflag"],
            "med_qty": np.floor(qdf["q50"].to_numpy() * 100 + 0.5).astype(np.int64),
            "p95_qty": np.floor(qdf["q95"].to_numpy() * 100 + 0.5).astype(np.int64),
        }
    )


SQL_QUANTILE_QTY = """
SELECT l_returnflag,
       CAST(ROUND(quantile_cont(l_quantity, 0.5) * 100) AS BIGINT) AS med_qty,
       CAST(ROUND(quantile_cont(l_quantity, 0.95) * 100) AS BIGINT) AS p95_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_quantile_price_sketch(sf_dir: str):
    """Median + p95 of l_extendedprice (CONTINUOUS domain) per return
    flag via the mergeable log-bucket sketch (ops/quantile.dd_sketch)
    — the documented unbounded-domain swap for the counting sketch.
    Approximate vs the TRUE order statistic (relative error ≤
    alpha=0.005, pytest-enforced with partition invariance in
    tests/test_ops.py) but DETERMINISTIC given the bucket mapping, so
    the whole sketch re-derives in SQL: k = ceil(ln(v)/ln(gamma))
    (verified bucket-identical vs numpy over all sf0.01 rows), grouped
    cumulative counts, rank r = floor((n-1)·q), representative
    2·gamma^k/(gamma+1), emitted as scaled cents on both sides."""
    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.ops.quantile import dd_quantiles, dd_sketch

    li = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    sketch = _as_arrow(dd_sketch(li, ["l_returnflag"], "l_extendedprice", alpha=0.005))
    qdf = dd_quantiles(sketch, ["l_returnflag"], [0.5, 0.95], alpha=0.005)
    return pd.DataFrame(
        {
            "l_returnflag": qdf["l_returnflag"],
            "med_price_cents": np.floor(
                qdf["q50"].to_numpy() * 100 + 0.5
            ).astype(np.int64),
            "p95_price_cents": np.floor(
                qdf["q95"].to_numpy() * 100 + 0.5
            ).astype(np.int64),
        }
    )


def _sql_quantile_price_sketch() -> str:
    alpha = 0.005
    span = 1 << 32
    gamma = f"(({1 + alpha}) / ({1 - alpha}))"
    rep = (
        f"CAST(ROUND(2.0 * POWER({gamma}, bkt - {span}) / ({gamma} + 1.0)"
        f" * 100) AS BIGINT)"
    )
    return f"""
WITH b AS (
  SELECT l_returnflag,
         CAST({span} + CEIL(LN(l_extendedprice) / LN({gamma})) AS BIGINT) AS bucket
  FROM lineitem
),
counts AS (
  SELECT l_returnflag, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, bucket,
         SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
         SUM(n) OVER (PARTITION BY l_returnflag) AS total
  FROM counts
),
sel AS (
  SELECT l_returnflag,
         MIN(CASE WHEN cum > FLOOR((total - 1) * 0.5)  THEN bucket END) AS b50,
         MIN(CASE WHEN cum > FLOOR((total - 1) * 0.95) THEN bucket END) AS b95
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       {rep.replace('bkt', 'b50')} AS med_price_cents,
       {rep.replace('bkt', 'b95')} AS p95_price_cents
FROM sel
"""


SQL_QUANTILE_PRICE_SKETCH = _sql_quantile_price_sketch()


# --------------------------------------------------------------------------
# Sliding window via range join (overlapping intervals — each event
# lands in up to ceil(7/3)=3 windows, so a plain groupby can't express
# it; ops/range_join.py broadcast-interval operator)
# --------------------------------------------------------------------------

_WIN_EPOCH_S = 1_704_067_200  # 2024-01-01 00:00:00 UTC, the events epoch
_WIN_STRIDE_D, _WIN_LEN_D, _WIN_COUNT = 3, 7, 10


def q_window_event_stats(sf_dir: str):
    """7-day windows sliding by 3 days over January 2024: per window,
    event count and scaled value sum. The overlap (each event in ~2.3
    windows) exercises the interval-containment join; the aggregate is
    map-side pre-combined into ≤10 partials per batch."""
    from osm2gtfs_ray.ops.range_join import range_join

    day_us = 86_400_000_000
    w = np.arange(_WIN_COUNT, dtype=np.int64)
    windows = pa.table(
        {
            "window_id": pa.array(w),
            "start": pa.array(_WIN_EPOCH_S * 1_000_000 + w * _WIN_STRIDE_D * day_us),
            "end": pa.array(
                _WIN_EPOCH_S * 1_000_000 + (w * _WIN_STRIDE_D + _WIN_LEN_D) * day_us
            ),
        }
    )
    ev = read_table(sf_dir, "events", columns=["ts", "value"])
    joined = range_join(ev, windows, ts_col="ts", range_id_col="window_id")

    def pre(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"window_id": t["window_id"], "value": t["value"]})
            .group_by("window_id")
            .aggregate([("value", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["window_id", "val_part", "n_part"])

    agg = (
        joined.map_batches(pre, batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(Sum("n_part", alias_name="n"), Sum("val_part", alias_name="val_raw"))
    )

    def finish(t: pa.Table) -> pa.Table:
        wid = pc.cast(t["window_id"], pa.int64())
        ws = pc.add(
            pa.scalar(_WIN_EPOCH_S, pa.int64()),
            pc.multiply(wid, pa.scalar(_WIN_STRIDE_D * 86_400, pa.int64())),
        )
        return pa.table(
            {
                "window_id": wid,
                "window_start": ws,
                "n": pc.cast(t["n"], pa.int64()),
                "sum_value": _scaled_int(t["val_raw"], 10_000),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_WINDOW_EVENT_STATS = f"""
WITH w AS (
  SELECT CAST(x AS BIGINT) AS window_id,
         TIMESTAMP '2024-01-01 00:00:00' + x * INTERVAL {_WIN_STRIDE_D} DAY AS ws,
         TIMESTAMP '2024-01-01 00:00:00' + x * INTERVAL {_WIN_STRIDE_D} DAY
           + INTERVAL {_WIN_LEN_D} DAY AS we
  FROM generate_series(0, {_WIN_COUNT - 1}) t(x)
)
SELECT w.window_id,
       CAST(epoch(w.ws) AS BIGINT) AS window_start,
       COUNT(*) AS n,
       CAST(ROUND(SUM(e.value) * 10000) AS BIGINT) AS sum_value
FROM w JOIN events e ON e.ts >= w.ws AND e.ts < w.we
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# As-of / previous-row alignment (reference J10 ordered cursor alignment)
# --------------------------------------------------------------------------

def q_prev_order_gap(sf_dir: str):
    """Per-customer ordered sequence alignment: each order joined to
    the customer's previous order (the as-of pattern re-expressing
    J10's monotone cursor, trips_creator.py:195-245) as sorted
    map_groups — order carried as data, not block order."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def prev_shard(g: pd.DataFrame) -> pd.DataFrame:
        """All customers of one hash shard in a single vectorized pass:
        sort (cust, date, key); prev = shift(1) masked at customer
        boundaries — no per-customer Python dispatch."""
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        ep = (g["o_orderdate"].astype("int64") // 1_000_000).to_numpy()
        cust = g["o_custkey"].to_numpy()
        prev = np.empty(len(g), dtype=np.float64)
        prev[0] = np.nan
        if len(g) > 1:
            prev[1:] = np.where(cust[1:] == cust[:-1], ep[:-1], np.nan)
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(), "prev_odate": prev}
        )

    res = sharded_map_groups(orders, "o_custkey", prev_shard)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "prev_odate": pc.cast(t["prev_odate"], pa.int64()),
            }
        )

    return res.map_batches(finish, batch_format="pyarrow")


SQL_PREV_ORDER_GAP = """
SELECT o_orderkey,
       CAST(epoch(LAG(o_orderdate) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS prev_odate
FROM orders
"""


# --------------------------------------------------------------------------
# Stratified deterministic sampling: per-stratum rates, hash-keyed on
# the row id — the downsampling pass a training-data pipeline runs to
# rebalance strata (here: order priorities) without a shuffle or any
# global state. Pure map stage; the same splitmix64 the synthesizer
# and the split/flagship oracles use, so the SQL oracle reproduces the
# kept set bit-exactly.
# --------------------------------------------------------------------------

_STRAT_STREAM = 91
_STRAT_RATES = {  # percent kept per o_orderpriority stratum
    "1-URGENT": 50,
    "2-HIGH": 25,
    "3-MEDIUM": 10,
    "4-NOT SPECIFIED": 5,
    "5-LOW": 2,
}


def q_stratified_sample(sf_dir: str):
    """Keep an order iff splitmix64(o_orderkey) % 100 < rate(priority).
    Embarrassingly parallel (no shuffle, no state); at 10^12 rows this
    is a filter fused into the read. Deterministic: re-runs keep the
    identical row set, which is what makes the sample resumable and
    the train corpus reproducible."""
    from osm2gtfs_ray.sources.pages import _uint

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    rates = dict(_STRAT_RATES)

    def sample(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        h = _uint(keys.astype(np.uint64), _STRAT_STREAM, 42, 100)
        prio = t["o_orderpriority"].to_pandas()
        rate = prio.map(rates).fillna(0).to_numpy(np.int64)
        keep = pa.array(h < rate)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(keep),
                "o_orderpriority": t["o_orderpriority"].filter(keep),
                "price_cents": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"].filter(keep), 100.0)),
                    pa.int64(),
                ),
            }
        )

    return orders.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def _sql_stratified_sample() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    h = _s_uint("CAST(o_orderkey AS UBIGINT)", _STRAT_STREAM, 100)
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _STRAT_RATES.items()
    )
    return f"""
SELECT o_orderkey, o_orderpriority,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
WHERE ({h}) < (CASE o_orderpriority {cases} ELSE 0 END)
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


# --------------------------------------------------------------------------
# Bloom-prefiltered semi join (large×large scale path): orders having
# at least one lineitem. The exact answer comes from the hash semi
# join; the distributed bloom (ops/joins.bloom_semi) only shrinks what
# reaches that shuffle — the standard big-data semi-join shape when
# the key set outgrows a broadcast but its bloom bits don't.
# --------------------------------------------------------------------------

def q_orders_with_lineitem(sf_dir: str):
    from osm2gtfs_ray.ops.joins import bloom_semi

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    out = bloom_semi(orders, li, "o_orderkey", right_key="l_orderkey")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "total_cents": _scaled_int(t["o_totalprice"], 100.0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_WITH_LINEITEM = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
"""


# --------------------------------------------------------------------------
# LEFT OUTER enrichment join: every event keeps its row; events whose
# user is not in the (filtered) customer dimension get a NONE segment.
# The dimension is pruned AND filtered at the parquet read (predicate
# pushdown), broadcast once via ray.put, joined per batch by acero —
# the missing-right branch of the join family (inner/semi/anti/asof
# are covered by the sibling queries).
# --------------------------------------------------------------------------

def q_event_segment(sf_dir: str):
    import pyarrow.dataset as pads

    from osm2gtfs_ray.ops.joins import broadcast_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    cust = read_table(
        sf_dir,
        "customer",
        columns=["c_custkey", "c_mktsegment"],
        filter_expr=(pads.field("c_mktsegment") == "BUILDING"),
    )
    joined = broadcast_join(
        ev, cust, keys="user_id", right_keys="c_custkey", join_type="left outer"
    )

    def finish(t: pa.Table) -> pa.Table:
        seg = pc.fill_null(t["c_mktsegment"], "NONE")
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "segment": seg,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_EVENT_SEGMENT = """
SELECT e.event_id, e.user_id,
       COALESCE(c.c_mktsegment, 'NONE') AS segment
FROM events e
LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_mktsegment = 'BUILDING') c
  ON e.user_id = c.c_custkey
"""
