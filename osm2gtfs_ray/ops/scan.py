"""Distributed prefix scan (cumulative sum over a global key order)
and distributed rank (global ROW_NUMBER over a value order).

Both are inherently multi-pass (a sizing/count pass, then the emit
pass), so the input Dataset is MATERIALIZED once up front — otherwise
Ray's lazy recompute re-executes the whole upstream pipeline (often an
expensive groupby) once per pass. The materialized input is the
operator's working set (for rank/pack workloads it is an aggregate —
a few int64 columns per row — which plasma spills if needed); every
subsequent pass is a cheap scan of those blocks.

A cumulative sum ordered by a key decomposes into the classic
two-phase parallel scan:

1. bucket every row into a RANGE shard that is monotone in the key
   (shard i holds only keys smaller than every key of shard i+1);
2. reduce each shard to its value total map-side — only
   n_shards-sized partial vectors reach the driver, which
   exclusive-prefixes them into base offsets (KBs);
3. one shuffle co-locates each shard, which sorts locally by key and
   adds ``base[shard] + local_exclusive_cumsum``.

No process ever holds more than one shard, and the only driver-side
state is the n_shards-long offset vector — the same shape
DuckDB/Spark use for window SUM OVER (ORDER BY ...) at scale.

Generalizes the reference's sequential accumulation passes (e.g.
osm2gtfs/core/osm_connector.py route-member walks) into
cluster-parallel primitives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SHARDS = 64

# cap on how many sampled values the driver ingests when deriving
# quantile bucket edges; above it the sample itself is re-sampled
# distributed until it fits (each pass shrinks by ~batch_size/512)
_SAMPLE_CAP = 262_144
_SAMPLE_PER_BATCH = 512


def _quantile_edges(ds, value_col: str, n_shards: int) -> np.ndarray:
    """Deterministic approximate-quantile bucket edges for
    ``value_col``: each batch contributes ≤ ``_SAMPLE_PER_BATCH``
    evenly-spaced local order statistics (no randomness), re-sampled
    distributed until the pooled sample fits ``_SAMPLE_CAP``, then the
    driver takes interior quantiles of the pooled sample. Returns a
    strictly-increasing edge vector (≤ n_shards-1 long; duplicates from
    heavy ties are collapsed — equal values must share a bucket
    anyway). Bucket id = searchsorted(edges, v, side='right')."""

    def local_sample(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(batch[value_col].to_numpy(dtype=np.float64))
        if len(v) > _SAMPLE_PER_BATCH:
            idx = np.linspace(0, len(v) - 1, _SAMPLE_PER_BATCH).astype(np.int64)
            v = v[idx]
        return pd.DataFrame({value_col: v})

    samp = ds.select_columns([value_col]).map_batches(
        local_sample, batch_format="pandas"
    )
    while samp.count() > _SAMPLE_CAP:
        samp = samp.map_batches(local_sample, batch_format="pandas")
    pooled = np.sort(samp.to_pandas()[value_col].to_numpy(dtype=np.float64))
    qs = np.linspace(0.0, 1.0, n_shards + 1)[1:-1]
    edges = np.quantile(pooled, qs, method="nearest")
    return np.unique(edges)


def _driver_bucket_totals(tagged, value_col: str | None, n_shards: int) -> np.ndarray:
    """One scan: per-batch per-shard partials (n_shards-sized vectors)
    merged on the driver — no all-to-all; returns exclusive prefix
    ``base`` with base[s] = total of all shards < s. ``value_col``
    None means count rows instead of summing a column."""

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.zeros(n_shards, dtype=np.int64)
        sid = batch["__shard__"].to_numpy(dtype=np.int64)
        if value_col is None:
            np.add.at(v, sid, 1)
        else:
            np.add.at(v, sid, batch[value_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({"s": np.arange(n_shards, dtype=np.int64), "v": v})

    parts = tagged.map_batches(partials, batch_format="pandas").to_pandas()
    base = np.zeros(n_shards + 1, dtype=np.int64)
    tot = parts.groupby("s", sort=True)["v"].sum()
    base[tot.index.to_numpy(dtype=np.int64) + 1] = tot.to_numpy(dtype=np.int64)
    return np.cumsum(base)


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
    ds = ds.materialize()
    if key_max is None:
        key_max = ds.select_columns([key_col]).max(key_col)
    width = max(1, int(key_max) // n_shards + 1)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        k = batch[key_col].to_numpy(dtype=np.int64)
        if len(k) and k.min() < 0:
            raise ValueError(
                f"distributed_cumsum: {key_col} has negative values "
                f"(min {k.min()}); keys must be non-negative integers"
            )
        out["__shard__"] = (k // width).astype(np.int64)
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")
    base = _driver_bucket_totals(tagged, value_col, n_shards)

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
    bucketed by VALUE order (monotone in sort order; equal values
    always share a bucket, so ties never split): per-bucket counts →
    exclusive prefix on the driver (n_shards ints) → one shuffle,
    local sort, rank = bucket base + local position. ``tie_cols`` must
    make rows unique within equal values (deterministic total order).

    Bucket edges are approximate QUANTILES from a deterministic
    sampling pass (:func:`_quantile_edges`), so a Zipfian value column
    still yields near-balanced shards — except ties on one hot value,
    which inherently co-locate. Passing ``value_range`` (min, max)
    skips the sampling pass and uses equi-width edges instead — only
    for callers that know the values are near-uniform on that range.
    Returns (ranked dataset, total row count).
    """
    ds = ds.materialize()
    if value_range is None:
        edges = _quantile_edges(ds, value_col, n_shards)
    else:
        vmin, vmax = value_range
        span = float(vmax) - float(vmin)
        width = span / n_shards if span > 0 else 1.0
        edges = np.unique(float(vmin) + width * np.arange(1, n_shards))
    n_buckets = len(edges) + 1

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        v = batch[value_col].to_numpy(dtype=np.float64)
        out["__shard__"] = np.searchsorted(edges, v, side="right").astype(np.int64)
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")
    base = _driver_bucket_totals(tagged, None, n_buckets)

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


# int64 sentinel for "no prior row" in the exclusive running max —
# far below any epoch-microsecond value but safe to subtract from.
RUNNING_MAX_NEG = -(1 << 62)


def distributed_running_max(
    ds,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prior_max",
    n_shards: int = DEFAULT_SHARDS,
):
    """Attach ``out_col`` = EXCLUSIVE running max of ``value_col`` in
    global ``order_cols`` order: each row sees the max over all
    strictly earlier rows (the watermark primitive of every streaming
    engine — Flink/Beam event-time watermarks are exactly this scan
    over arrival order); the globally first row gets
    ``RUNNING_MAX_NEG``.

    Same two-phase shape as :func:`distributed_cumsum`, but bucketed
    by quantile RANGES of the leading order column (arrival keys are
    not dense): map-side per-shard MAX partials → driver exclusive
    prefix-max (n_shards ints) → one shuffle, local sort by
    ``order_cols``, exclusive cummax combined with the shard base.
    Ties on the leading column always share a shard (searchsorted on
    edge values), so intra-tie ordering by the remaining ``order_cols``
    is entirely local. ``order_cols`` must form a total order;
    ``value_col`` must be int64."""
    lead = order_cols[0]
    ds = ds.materialize()
    edges = _quantile_edges(ds, lead, n_shards)
    n_buckets = len(edges) + 1

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        v = batch[lead].to_numpy(dtype=np.float64)
        out["__shard__"] = np.searchsorted(edges, v, side="right").astype(np.int64)
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")

    def max_partials(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.full(n_buckets, RUNNING_MAX_NEG, dtype=np.int64)
        sid = batch["__shard__"].to_numpy(dtype=np.int64)
        np.maximum.at(v, sid, batch[value_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({"s": np.arange(n_buckets, dtype=np.int64), "v": v})

    parts = tagged.map_batches(max_partials, batch_format="pandas").to_pandas()
    shard_max = np.full(n_buckets, RUNNING_MAX_NEG, dtype=np.int64)
    agg = parts.groupby("s", sort=True)["v"].max()
    shard_max[agg.index.to_numpy(dtype=np.int64)] = agg.to_numpy(dtype=np.int64)
    base = np.full(n_buckets, RUNNING_MAX_NEG, dtype=np.int64)
    base[1:] = np.maximum.accumulate(shard_max)[:-1]

    def scan_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = int(g["__shard__"].iloc[0])
        g = g.sort_values(order_cols, kind="mergesort").drop(columns="__shard__")
        v = g[value_col].to_numpy(dtype=np.int64)
        run = np.maximum.accumulate(v)
        prior = np.r_[np.int64(RUNNING_MAX_NEG), run[:-1]]
        g[out_col] = np.maximum(prior, base[s])
        return g

    return tagged.groupby("__shard__").map_groups(scan_shard, batch_format="pandas")
