"""Exact dedup / keep-first operators (shard-keyed, vectorized).

The reference's first-wins semantics (SURVEY.md §2.7): consume-once
variant join (osm_connector.py:133-165), route_id uniqueness guard
(:173-179), shape_id dedup (trips_creator.py:161-176), get-or-create
agency (trips_creator_ci_abidjan.py:99-117) — all are
hash-partition-by-key + deterministic per-group first. Determinism
comes from an explicit order column, never block order.

Physical plan (round-2 rewrite): per-batch local first/distinct (map-
side combine — the shuffle moves at most one row per key per batch),
then a key-hash SHARD groupby with one vectorized pandas pass per
shard (ops/sharded.py) — never one Python call per distinct key.
"""

from __future__ import annotations

import pandas as pd

from osm2gtfs_ray.ops.sharded import DEFAULT_SHARDS, sharded_map_groups


def keep_first(ds, key, order_by, ascending: bool = True, n_shards: int = DEFAULT_SHARDS):
    """One row per key: the first under ``order_by`` (deterministic)."""
    key = [key] if isinstance(key, str) else list(key)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(order_by, ascending=ascending, kind="mergesort").drop_duplicates(
            key, keep="first"
        )

    return sharded_map_groups(ds, key, local_first, n_shards=n_shards, local_pre=local_first)


def keep_top_k(ds, key, order_by, k: int, ascending: bool = True,
               n_shards: int = DEFAULT_SHARDS):
    """Top-k rows per key under ``order_by`` (the windowed-rank
    generalization of keep_first; ROW_NUMBER <= k semantics with a
    deterministic total order). Same map-side-combine shape: each
    batch keeps at most k rows per key before the shard shuffle, so
    the exchange moves O(k · keys-per-batch) rows regardless of group
    sizes — hot keys cannot blow up a shard."""
    key = [key] if isinstance(key, str) else list(key)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(order_by, ascending=ascending, kind="mergesort")
        return s.groupby(key, sort=False).head(k)

    def shard_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(order_by, ascending=ascending, kind="mergesort").reset_index(
            drop=True
        )
        out = s.groupby(key, sort=False).head(k).copy()
        out["rnk"] = out.groupby(key, sort=False).cumcount().astype("int64") + 1
        return out

    return sharded_map_groups(ds, key, shard_top, n_shards=n_shards, local_pre=local_top)


def distinct(ds, cols, n_shards: int = DEFAULT_SHARDS):
    """Distinct rows over `cols` (exact dedup, sharded hash shuffle)."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def local_uniq(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    def shard_uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates().sort_values(cols, kind="mergesort")

    return sharded_map_groups(
        ds.select_columns(cols), cols, shard_uniq, n_shards=n_shards, local_pre=local_uniq
    )
