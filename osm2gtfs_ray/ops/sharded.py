"""Shard-keyed groupby: the scale-safe replacement for per-key map_groups.

`groupby(key).map_groups(fn)` dispatches ONE Python/pandas call per
distinct key — at corpus scale (millions of distinct texts/users) the
per-call overhead dominates by orders of magnitude. The fix, applied
uniformly here (same pattern as stages/dedup.lsh_candidate_pairs):

1. optional per-batch LOCAL pre-reduce inside map_batches (so the
   shuffle moves partials, not raw rows);
2. add ``__shard__ = stable_hash(key) % n_shards`` (process-stable
   hash — never Python ``hash()``, which is salted per process);
3. ``groupby(__shard__).map_groups`` with a function that handles ALL
   keys of the shard in one vectorized pandas pass (sort + groupby /
   drop_duplicates / cumsum — C-level, no per-key dispatch).

n_shards bounds group size at rows/n_shards; at cluster scale raise it
to ~4× total cores so every core gets work and stragglers stay small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SHARDS = 64


def stable_row_hash(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """Process-stable uint64 per row over `cols` (pandas' fixed-key
    SipHash via hash_pandas_object; deterministic across workers)."""
    if len(cols) == 1:
        h = pd.util.hash_pandas_object(df[cols[0]], index=False)
    else:
        h = pd.util.hash_pandas_object(df[cols], index=False)
    return h.to_numpy(dtype=np.uint64)


def sharded_map_groups(
    ds,
    key_cols: list[str] | str,
    shard_fn,
    n_shards: int = DEFAULT_SHARDS,
    local_pre=None,
):
    """Shuffle rows by key-hash shard, apply ``shard_fn`` (vectorized
    over all keys of the shard) once per shard.

    ``local_pre``: optional per-batch reducer applied BEFORE the
    shuffle (map-side combine). Both callables take and return pandas
    DataFrames; ``shard_fn`` must not rely on input row order.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if local_pre is not None:
            batch = local_pre(batch)
        out = batch.copy(deep=False)
        out["__shard__"] = (
            stable_row_hash(batch, key_cols) % np.uint64(n_shards)
        ).astype(np.int64)
        return out

    def run_shard(g: pd.DataFrame) -> pd.DataFrame:
        return shard_fn(g.drop(columns="__shard__"))

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("__shard__")
        .map_groups(run_shard, batch_format="pandas")
    )


def bounded_key_sum(parts_ds, key_cols, sum_cols, driver: bool,
                    out_names: list[str] | None = None):
    """Sum `sum_cols` per `key_cols` over a PARTIAL-aggregate Dataset
    whose key space is BOUNDED (a grid, a language set, a sketch
    counter table — never corpus-sized).

    driver=True is the ops/pagerank.py DRIVER_MERGE rule applied to
    grouped partials: collect the block partials (each bounded by
    min(block_rows, |key space|)) and merge with one pandas groupby —
    skipping a Ray all-to-all whose fixed cost (~2-6 s at 32 CPUs)
    dwarfs these key spaces. Callers gate `driver` on corpus size so
    block count x key bound stays driver-safe; driver=False keeps the
    Ray groupby exchange (the many-block scale path).
    """
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sum_cols = list(sum_cols)
    out_names = out_names or sum_cols
    if driver:
        from osm2gtfs_ray.ops.joins import _as_arrow

        df = _as_arrow(parts_ds).to_pandas()
        agg = df.groupby(key_cols, sort=False, as_index=False)[sum_cols].sum()
        agg = agg.rename(columns=dict(zip(sum_cols, out_names)))
        for c in out_names:
            agg[c] = agg[c].astype("int64")
        return ray.data.from_arrow(pa.Table.from_pandas(
            agg, preserve_index=False
        ))
    g = parts_ds.groupby(key_cols[0] if len(key_cols) == 1 else key_cols)
    return g.aggregate(
        *[Sum(c, alias_name=o) for c, o in zip(sum_cols, out_names)]
    )
