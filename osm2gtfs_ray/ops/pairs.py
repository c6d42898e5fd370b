"""Vectorized within-group pair enumeration for the LSH candidate
generators (stages/dedup.py, stages/ann.py).

The naive shape — ``for _, grp in df.groupby(bucket): np.triu_indices``
— dispatches one Python call per colliding bucket; at corpus scale a
shard holds millions of buckets and the dispatch dominates. Here the
only Python loop is over DISTINCT GROUP SIZES (a handful — bucket
sizes are small by LSH design), and every group of the same size is
expanded in one broadcasted index computation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_EMPTY = np.empty(0, dtype=np.int64)


def new_group_mask(df: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    """Boolean mask marking the first row of each key group. ``df``
    must already be sorted so equal keys are contiguous."""
    if not len(df):
        return np.empty(0, dtype=bool)
    k = df[key_cols]
    new = k.ne(k.shift()).any(axis=1).to_numpy()
    new[0] = True
    return new


def intra_group_pair_indices(new_group: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group (i, j) position pairs with i < j in row order.

    ``new_group[r]`` is True iff row r starts a new group (rows of a
    group are contiguous). Returns two int64 position arrays into the
    same row order; callers gather ids / payload columns with them.
    """
    n = len(new_group)
    if n == 0:
        return _EMPTY, _EMPTY
    starts = np.flatnonzero(new_group)
    sizes = np.diff(np.append(starts, n))
    ai, bi = [], []
    for k in np.unique(sizes):
        if k < 2:
            continue
        st = starts[sizes == k]
        i, j = np.triu_indices(int(k), 1)
        ai.append((st[:, None] + i[None, :]).ravel())
        bi.append((st[:, None] + j[None, :]).ravel())
    if not ai:
        return _EMPTY, _EMPTY
    return np.concatenate(ai), np.concatenate(bi)


def bucket_pairs(
    df: pd.DataFrame, key_cols: list[str], id_col: str
) -> tuple[pd.DataFrame, np.ndarray, np.ndarray]:
    """Sort ``df`` by (key_cols..., id_col) and enumerate all
    within-bucket pairs. Returns (sorted_df, ai, bi) — positions into
    sorted_df with sorted_df[id_col][ai] < sorted_df[id_col][bi]
    within every pair (ids ascend inside each bucket)."""
    d = df.sort_values([*key_cols, id_col], kind="mergesort").reset_index(drop=True)
    ai, bi = intra_group_pair_indices(new_group_mask(d, key_cols))
    return d, ai, bi
