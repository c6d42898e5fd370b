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
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile q must be in [0, 1], got {q}")
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


# --------------------------------------------------------------------------
# Log-bucket (DDSketch-style) quantile sketch for UNBOUNDED domains
# --------------------------------------------------------------------------
#
# The counting sketch above is exact but its size is |distinct values| —
# unusable for continuous floats (one row per distinct value). This is
# the documented swap: a relative-error-alpha log-bucket sketch after
# the DDSketch design (Masson, Rim, Lee, "DDSketch: a fast and fully-
# mergeable quantile sketch with relative-error guarantees", VLDB 2019
# — public work). Values map to geometric buckets gamma^k with
# gamma = (1+alpha)/(1-alpha); the sketch is (group, bucket) -> count.
#
# Merge = bucket-count addition — COMMUTATIVE and ASSOCIATIVE, so the
# result is exactly partition-invariant (unlike KLL / t-digest, whose
# output depends on merge order). Size per group is O(log(max/min)/
# alpha) sparse buckets (~a few thousand for real data), independent
# of row count. Guarantee: every returned quantile value is within
# relative error alpha of an exact order statistic of the input.

_DD_STORE_SPAN = np.int64(1) << np.int64(32)  # disjoint ranges per sign store


def _dd_bucket(vals: np.ndarray, gamma: float) -> np.ndarray:
    """value -> monotone int64 bucket id.

    Positive store: k = ceil(log_gamma(v)) encoded as +SPAN + k;
    negative store mirrored as -SPAN - k (more negative value -> more
    negative id); exact zeros get bucket 0. The encoding is strictly
    monotone in the value, so per-group bucket sort = value sort."""
    out = np.zeros(len(vals), dtype=np.int64)
    lg = np.log(gamma)
    pos = vals > 0
    neg = vals < 0
    with np.errstate(divide="ignore"):
        if pos.any():
            k = np.ceil(np.log(vals[pos]) / lg).astype(np.int64)
            out[pos] = _DD_STORE_SPAN + k
        if neg.any():
            k = np.ceil(np.log(-vals[neg]) / lg).astype(np.int64)
            out[neg] = -_DD_STORE_SPAN - k
    return out


def _dd_value(buckets: np.ndarray, gamma: float) -> np.ndarray:
    """bucket id -> representative value (midpoint 2*gamma^k/(gamma+1);
    relative error <= (gamma-1)/(gamma+1) = alpha)."""
    out = np.zeros(len(buckets), dtype=np.float64)
    pos = buckets > 0
    neg = buckets < 0
    k_pos = (buckets[pos] - _DD_STORE_SPAN).astype(np.float64)
    k_neg = (-buckets[neg] - _DD_STORE_SPAN).astype(np.float64)
    out[pos] = 2.0 * np.power(gamma, k_pos) / (gamma + 1.0)
    out[neg] = -2.0 * np.power(gamma, k_neg) / (gamma + 1.0)
    return out


def dd_sketch(ds, group_cols: list[str], value_col: str, alpha: float = 0.01):
    """Dataset -> merged log-bucket sketch as a Dataset of
    (group_cols..., bucket, n). Same two-step shuffle shape as
    grouped_quantile_counts: per-batch combine (at most |groups| x
    |touched buckets| rows leave a batch), then one sketch-sized
    groupby-sum."""
    from ray.data.aggregate import Sum

    gamma = (1.0 + alpha) / (1.0 - alpha)
    keys = list(group_cols) + ["bucket"]

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {c: t[c].to_numpy(zero_copy_only=False) for c in group_cols}
        cols["bucket"] = _dd_bucket(vals, gamma)
        df = pd.DataFrame(cols)
        g = df.groupby(keys, sort=False, as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n_part"}), preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(Sum("n_part", alias_name="n"))
    )


def dd_quantiles(
    sketch: pa.Table | pd.DataFrame,
    group_cols: list[str],
    qs: list[float],
    alpha: float = 0.01,
) -> pd.DataFrame:
    """Sketch-sized final step: per group, rank into the cumulative
    bucket counts and return the bucket's representative value
    (within relative error alpha of the exact order statistic)."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile q must be in [0, 1], got {q}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    df = sketch.to_pandas() if isinstance(sketch, pa.Table) else sketch
    out_rows = []
    for gkey, g in df.groupby(group_cols, sort=True):
        g = g.sort_values("bucket", kind="mergesort")
        reps = _dd_value(g["bucket"].to_numpy(np.int64), gamma)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = int(cum[-1])
        row = list(gkey) if isinstance(gkey, tuple) else [gkey]
        for q in qs:
            r = int(np.floor((n - 1) * q))  # 0-based lower order statistic
            row.append(reps[np.searchsorted(cum, r, side="right")])
        out_rows.append(row)
    cols = list(group_cols) + [f"q{int(round(q * 100))}" for q in qs]
    return pd.DataFrame(out_rows, columns=cols)
