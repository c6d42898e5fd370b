"""Grouped quantiles via a distributed counting sketch.

A distributed exact quantile normally needs a full sort; the sketch
plan moves only (group, value) COUNT partials instead:

1. map_batches: per-batch ``group_by(group_cols + [value]).count()``
   — the map-side combine collapses each batch to at most
   |groups|·|distinct values| rows regardless of row count;
2. one small groupby-sum merges the partials (the only shuffle, over
   sketch-sized data);
3. the merged sketch (size |groups|·|domain|, independent of input
   rows — that's what makes it a sketch) computes order statistics
   with the same linear interpolation as DuckDB / Postgres
   ``quantile_cont``: h = (n-1)·q, v = v⌊h⌋ + (h-⌊h⌋)·(v⌊h⌋₊₁-v⌊h⌋).

For a BOUNDED value domain (counts, ratings, quantities, bucketed
floats) the sketch is EXACT — the oracle is DuckDB ``quantile_cont``
itself. For unbounded continuous domains, pre-bucket the value column
(losing sub-bucket resolution) or swap step 1 for a mergeable t-digest
/ KLL; the shuffle shape stays identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_quantile_counts(ds, group_cols: list[str], value_col: str):
    """Dataset → merged counting sketch as a Dataset of
    (group_cols..., value, n) — the distributed part of the plan."""
    from ray.data.aggregate import Sum

    keys = list(group_cols) + [value_col]

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["n_part"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(Sum("n_part", alias_name="n"))
    )


def quantiles_from_counts(
    sketch: pa.Table | pd.DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> pd.DataFrame:
    """Sketch-sized final step: per group, quantile_cont-compatible
    interpolated order statistics from (value, count) pairs."""
    df = sketch.to_pandas() if isinstance(sketch, pa.Table) else sketch
    out_rows = []
    for gkey, g in df.groupby(group_cols, sort=True):
        g = g.sort_values(value_col, kind="mergesort")
        vals = g[value_col].to_numpy(np.float64)
        cnt = g["n"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        row = list(gkey) if isinstance(gkey, tuple) else [gkey]
        for q in qs:
            h = (n - 1) * q
            lo = int(np.floor(h))
            frac = h - lo
            # value at rank r (0-based) = first value with cum > r
            v_lo = vals[np.searchsorted(cum, lo, side="right")]
            v_hi = vals[np.searchsorted(cum, min(lo + 1, n - 1), side="right")]
            row.append(v_lo + frac * (v_hi - v_lo))
        out_rows.append(row)
    cols = list(group_cols) + [f"q{int(round(q * 100))}" for q in qs]
    return pd.DataFrame(out_rows, columns=cols)
