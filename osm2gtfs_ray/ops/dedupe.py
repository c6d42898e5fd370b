"""Exact dedup / keep-first operators.

The reference's first-wins semantics (SURVEY.md §2.7): consume-once
variant join (osm_connector.py:133-165), route_id uniqueness guard
(:173-179), shape_id dedup (trips_creator.py:161-176), get-or-create
agency (trips_creator_ci_abidjan.py:99-117) — all are
hash-partition-by-key + deterministic per-group first. Determinism
comes from an explicit order column, never block order.
"""

from __future__ import annotations

import pandas as pd


def keep_first(ds, key, order_by, ascending: bool = True):
    """One row per key: the first under ``order_by`` (deterministic).

    Shuffle = groupby(key); per group a vectorized pandas sort+head.
    """
    key = [key] if isinstance(key, str) else list(key)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, ascending=ascending, kind="mergesort").head(1)

    return ds.groupby(key[0] if len(key) == 1 else key).map_groups(
        first, batch_format="pandas"
    )


def distinct(ds, cols):
    """Distinct rows over `cols` (exact dedup, hash shuffle)."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g[cols].drop_duplicates().sort_values(cols, kind="mergesort")

    return ds.select_columns(cols).groupby(cols[0] if len(cols) == 1 else cols).map_groups(
        uniq, batch_format="pandas"
    )
