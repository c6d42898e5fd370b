"""Distributed windowed aggregates (rolling / sliding frames).

Two scale shapes, both shuffle-once:

* ``partitioned_rolling`` — PARTITION BY key ORDER BY ts ROWS BETWEEN
  n-1 PRECEDING: every frame lives wholly inside one partition, so a
  key-hash sharded shuffle co-locates each partition and a single
  vectorized pandas pass computes every key's rolling frame in the
  shard (C-level groupby().rolling(), no per-key dispatch — same
  sharding contract as ops/sharded.py).

* ``time_bucket_rolling`` — a GLOBAL time-ordered frame (RANGE BETWEEN
  w-1 units PRECEDING) over a series too large for one process: rows
  are bucketed by a coarse time unit (e.g. month) and, because the
  frame width is bounded in TIME, the only foreign rows a bucket can
  ever need are the trailing w-1 units of its predecessor — decidable
  ROW-WISE from the calendar. The map stage therefore emits each row
  once for its own bucket plus once as read-only context for the next
  bucket; one groupby computes every frame exactly, and context rows
  are dropped on emit. No sequential pass, no driver loop, overlap
  replication factor ≤ (w-1)/bucket_width.

Generalizes the reference's in-memory ordered walks (stop_times
cursor alignment, osm2gtfs/core/trip builders) to cluster scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def partitioned_rolling(
    ds,
    part_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_sum: str = "roll_sum",
    out_n: str = "roll_n",
    n_shards: int = 64,
):
    """ROWS-frame rolling sum+count per partition (min_periods=1).

    Emits every input row plus ``out_sum``/``out_n`` over the trailing
    ``window`` rows of its partition in ``order_cols`` order. Callers
    derive mean/ratio from the pair (keeps this kernel agg-agnostic
    and the driver-hash encoding decision at the query layer).
    """
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    def shard_roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([part_col, *order_cols], kind="mergesort")
        r = g.groupby(part_col, sort=False)[value_col].rolling(
            window, min_periods=1
        )
        g[out_sum] = r.sum().to_numpy()
        g[out_n] = r.count().to_numpy().astype(np.int64)
        return g

    return sharded_map_groups(ds, part_col, shard_roll, n_shards=n_shards)


def time_bucket_rolling(
    ds,
    time_col: str,
    value_col: str,
    window: int,
    bucket: int,
    out_sum: str = "roll_sum",
    out_n: str = "roll_n",
):
    """RANGE-frame rolling sum+count over a GLOBAL integer timeline:
    frame of row t = rows with time in (t - window, t].

    ``time_col`` must be integer time units (e.g. epoch days) with at
    most one row per unit (pre-aggregate first); ``bucket`` is the
    shard width in the same units and must be >= window so one
    predecessor's tail always covers the frame.
    """
    if bucket < window:
        raise ValueError("bucket width must be >= window")

    def replicate(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[time_col].to_numpy(dtype=np.int64)
        b = t // bucket
        own = batch.copy(deep=False)
        own["__bucket__"] = b
        own["__ctx__"] = False
        # tail rows additionally ship to the NEXT bucket as context:
        # needed iff within window-1 units of the bucket's end
        tail = t % bucket >= bucket - (window - 1)
        ctx = batch[tail].copy(deep=False)
        ctx["__bucket__"] = b[tail] + 1
        ctx["__ctx__"] = True
        return pd.concat([own, ctx], ignore_index=True)

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(time_col, kind="mergesort")
        t = g[time_col].to_numpy(dtype=np.int64)
        v = g[value_col].to_numpy(dtype=np.float64)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        cn = np.arange(len(t) + 1, dtype=np.int64)
        lo = np.searchsorted(t, t - (window - 1), side="left")
        hi = np.arange(1, len(t) + 1)
        g[out_sum] = cs[hi] - cs[lo]
        g[out_n] = (cn[hi] - cn[lo]).astype(np.int64)
        keep = ~g["__ctx__"].to_numpy()
        return g[keep].drop(columns=["__bucket__", "__ctx__"])

    return (
        ds.map_batches(replicate, batch_format="pandas")
        .groupby("__bucket__")
        .map_groups(roll_bucket, batch_format="pandas")
    )
