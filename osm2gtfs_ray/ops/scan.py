"""Distributed prefix scan (cumulative sum over a global key order).

A cumulative sum ordered by a key is inherently sequential row-to-row,
but decomposes into the classic two-phase parallel scan:

1. bucket every row into a RANGE shard that is monotone in the key
   (shard i holds only keys smaller than every key of shard i+1);
2. reduce each shard to its value total (map-side combine — only
   n_shards partial rows reach the driver);
3. exclusive-prefix the tiny per-shard totals on the driver and
   broadcast the n_shards base offsets;
4. one shuffle co-locates each shard, which sorts locally by key and
   adds ``base[shard] + local_exclusive_cumsum``.

The corpus streams twice (once to size the shards, once to emit), no
process ever holds more than one shard, and the only driver-side state
is the n_shards-long offset vector — the same shape DuckDB/Spark use
for window SUM OVER (ORDER BY ...) at scale.

Generalizes the reference's sequential accumulation passes (e.g.
osm2gtfs/core/osm_connector.py route-member walks) into a
cluster-parallel primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SHARDS = 64


def distributed_cumsum(
    ds,
    key_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_shards: int = DEFAULT_SHARDS,
    key_max: int | None = None,
    exclusive: bool = True,
):
    """Attach ``out_col`` = cumulative sum of ``value_col`` in global
    ``key_col`` order (exclusive by default: the row's own value is not
    included — the natural form for offsets/packing).

    ``key_col`` must be integer-typed with unique values; shards are
    fixed-width key ranges (monotone by construction). ``key_max``
    skips the sizing pass when the caller knows the key range (dense
    ids); otherwise one cheap single-column max() scan derives it.
    """
    if key_max is None:
        key_max = ds.select_columns([key_col]).max(key_col)
    width = max(1, int(key_max) // n_shards + 1)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        out["__shard__"] = (
            batch[key_col].to_numpy(dtype=np.int64) // width
        ).astype(np.int64)
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")

    # phase 1: per-shard totals (map-side combine, then a tiny groupby)
    def shard_partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("__shard__", sort=False)[value_col].sum()
        return g.reset_index(name="__part__")

    totals = (
        tagged.map_batches(shard_partials, batch_format="pandas")
        .groupby("__shard__")
        .sum("__part__")
        .to_pandas()
    )
    base = np.zeros(n_shards + 1, dtype=np.int64)
    sid = totals["__shard__"].to_numpy(dtype=np.int64)
    base[sid + 1] = totals["sum(__part__)"].to_numpy(dtype=np.int64)
    base = np.cumsum(base)  # base[s] = total of all shards < s

    # phase 2: co-locate each shard, local sort + cumsum + broadcast base
    def scan_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = int(g["__shard__"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort").drop(columns="__shard__")
        v = g[value_col].to_numpy(dtype=np.int64)
        cs = np.cumsum(v)
        g[out_col] = base[s] + (cs - v if exclusive else cs)
        return g

    return tagged.groupby("__shard__").map_groups(scan_shard, batch_format="pandas")


def distributed_rank(
    ds,
    value_col: str,
    tie_cols: list[str],
    out_col: str = "rank",
    n_shards: int = DEFAULT_SHARDS,
    value_range: tuple[float, float] | None = None,
):
    """Attach ``out_col`` = 1-based global ROW_NUMBER() in
    (value_col, *tie_cols) ascending order — the distributed ranking /
    ntile primitive. Same two-phase shape as distributed_cumsum but
    bucketed by VALUE range (monotone in sort order): per-bucket counts
    → exclusive prefix on the driver (n_shards ints) → one shuffle,
    local sort, rank = bucket base + local position. ``tie_cols`` must
    make rows unique within equal values (deterministic total order).

    ``value_range``: optional (min, max) to skip the sizing pass.
    """
    if value_range is None:
        vmin = ds.select_columns([value_col]).min(value_col)
        vmax = ds.select_columns([value_col]).max(value_col)
    else:
        vmin, vmax = value_range
    span = float(vmax) - float(vmin)
    width = span / n_shards if span > 0 else 1.0

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        b = np.floor(
            (batch[value_col].to_numpy(dtype=np.float64) - float(vmin)) / width
        ).astype(np.int64)
        out["__shard__"] = np.clip(b, 0, n_shards - 1)
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")

    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("__shard__", sort=False).size()
        return g.reset_index(name="__part__")

    counts = (
        tagged.map_batches(bucket_counts, batch_format="pandas")
        .groupby("__shard__")
        .sum("__part__")
        .to_pandas()
    )
    base = np.zeros(n_shards + 1, dtype=np.int64)
    sid = counts["__shard__"].to_numpy(dtype=np.int64)
    base[sid + 1] = counts["sum(__part__)"].to_numpy(dtype=np.int64)
    base = np.cumsum(base)

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = int(g["__shard__"].iloc[0])
        g = g.sort_values([value_col, *tie_cols], kind="mergesort").drop(
            columns="__shard__"
        )
        g[out_col] = base[s] + 1 + np.arange(len(g), dtype=np.int64)
        return g

    ranked = tagged.groupby("__shard__").map_groups(
        rank_shard, batch_format="pandas"
    )
    return ranked, int(base[-1])
