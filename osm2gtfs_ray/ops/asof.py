"""As-of join (SURVEY.md J10's closest relational analogue, exposed as
a general operator).

``asof_join_broadcast``: each left row matches the LATEST right row
with the same key and right_ts <= left_ts — pd.merge_asof per
key-group, right side broadcast (ray.put once). For right sides too
large to broadcast, the same per-group function runs after a
hash-partitioned groupby co-locating both sides (bucketed variant not
needed at current scales; the partitioning assumption is: all rows of
one key fit one group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def asof_join_broadcast(left_ds, right_df: pd.DataFrame, key: str, left_ts: str,
                        right_ts: str, right_cols: list[str]):
    """left ⟕asof right on (key, ts). Right side sorted + broadcast."""
    import ray

    # merge_asof wants the on-column globally sorted; the by-key joins
    # within groups. Right key column renamed to the left's name.
    right_df = (
        right_df.rename(columns={right_df.columns[right_df.columns.get_loc(key)]: key})
        if key in right_df.columns
        else right_df
    )
    right_df = right_df.sort_values(right_ts, kind="mergesort")
    ref = ray.put(right_df)

    class AsofBatch:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.sort_values(left_ts, kind="mergesort")
            out = pd.merge_asof(
                b,
                self.right[[key, right_ts] + right_cols],
                left_on=left_ts,
                right_on=right_ts,
                by=key,
                direction="backward",
            )
            return out

    return left_ds.map_batches(AsofBatch, batch_format="pandas", concurrency=(1, 4))
