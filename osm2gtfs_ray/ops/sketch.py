"""HyperLogLog-style approximate COUNT(DISTINCT) — the corpus-scale
companion to the exact plan in queries.q_daily_active_users.

The exact plan shuffles one row per distinct (group, value); at 10^12
rows with high-cardinality values that IS the data. This sketch moves
a FIXED 2^p bytes per (group, batch) instead:

1. map_batches: per batch, per group — mix64 the values, bucket by the
   top p hash bits, track the max leading-zero rank per bucket; emit
   one (group, packed 2^p-byte registers) row per group per batch;
2. merge = element-wise byte MAX — associative + commutative +
   idempotent, so partials combine in any order/any tree (here: a
   driver-side fold over the sketch-sized stream; at larger group
   cardinality the same fold runs per shard in a groupby);
3. estimate with the standard HLL bias-corrected harmonic mean +
   linear-counting small-range correction.

Deterministic: the hash is the repo's splitmix64 (sources/pages.mix64)
— same input always yields the same estimate, on any partitioning
(register max is order-independent). Expected relative error is
~1.04/sqrt(2^p) (p=10 → ~3%); pytest asserts the bound empirically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm2gtfs_ray.sources.pages import mix64

P = 10
M = 1 << P  # registers
_MAX_RHO = 64 - P + 1


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def _rho(h: np.ndarray) -> np.ndarray:
    """1 + leading zeros of the low (64-P) bits of h, vectorized exact
    bit-length via 6-step binary search (no float log2 — values exceed
    float64's 52-bit mantissa)."""
    w = h & np.uint64((1 << (64 - P)) - 1)
    bl = np.zeros(len(w), dtype=np.int64)  # bit length of w
    cur = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        cur[big] >>= np.uint64(shift)
    bl[w > 0] += 1
    rho = (64 - P) - bl + 1
    rho[w == 0] = _MAX_RHO
    return rho


def hll_partials(ds, group_col: str, value_col: str):
    """Dataset → one (group, registers: 2^P bytes) partial per group
    per batch."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], t.schema.field(group_col).type),
                 "registers": pa.array([], pa.binary())}
            )
        col = t[value_col]
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
                or pa.types.is_binary(col.type):
            # string/binary keys (the common COUNT DISTINCT case):
            # process-stable vectorized SipHash, then mix as usual
            vals = pd.util.hash_pandas_object(
                col.to_pandas(), index=False
            ).to_numpy(dtype=np.uint64)
        else:
            raise TypeError(
                f"hll sketch needs an integer or string value column; "
                f"{value_col!r} is {col.type} (floats would truncate silently "
                f"— cast or hash explicitly first)"
            )
        h = mix64(vals)
        reg = (h >> np.uint64(64 - P)).astype(np.int64)
        rho = _rho(h)
        df = pd.DataFrame(
            {"g": t[group_col].to_numpy(zero_copy_only=False), "reg": reg, "rho": rho}
        )
        groups, regs = [], []
        for g, sub in df.groupby("g", sort=False):
            r = np.zeros(M, dtype=np.int64)
            np.maximum.at(r, sub["reg"].to_numpy(), sub["rho"].to_numpy())
            groups.append(g)
            regs.append(r.astype(np.uint8).tobytes())
        return pa.table(
            {group_col: pa.array(groups), "registers": pa.array(regs, pa.binary())}
        )

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def hll_estimate(registers: np.ndarray) -> float:
    """Registers (uint8[M]) → cardinality estimate."""
    r = registers.astype(np.float64)
    e = _alpha(M) * M * M / np.sum(np.exp2(-r))
    zeros = int((registers == 0).sum())
    if e <= 2.5 * M and zeros > 0:
        e = M * np.log(M / zeros)
    return float(e)


def hll_count_distinct(ds, group_col: str, value_col: str) -> pd.DataFrame:
    """(group, estimate) — partials fold driver-side (sketch-sized:
    |groups| × 2^P bytes; shard the fold when groups outgrow that)."""
    merged: dict = {}
    for t in hll_partials(ds, group_col, value_col).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for g, buf in zip(t[group_col].to_pylist(), t["registers"].to_pylist()):
            r = np.frombuffer(buf, dtype=np.uint8)
            if g in merged:
                np.maximum(merged[g], r, out=merged[g])
            else:
                merged[g] = r.copy()
    rows = [(g, int(round(hll_estimate(r)))) for g, r in sorted(merged.items())]
    return pd.DataFrame(rows, columns=[group_col, "estimate"])


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters: a mergeable frequent-items summary of
# fixed size k. Per-batch: exact term counts, then ONE decrement step
# (subtract the (k+1)-th largest count, drop <= 0) — the counted-batch
# form of the classic one-pass algorithm. Each surviving count is a
# LOWER bound on the batch-true count, under-counting by at most
# batch_total/(k+1); summing summaries across batches keeps both
# properties (Agarwal et al., "Mergeable Summaries"), so the global
# estimate e(t) satisfies  true(t) - N/(k+1) <= e(t) <= true(t).
# Every term with frequency > N/(k+1) is guaranteed to survive.
# --------------------------------------------------------------------------

def mg_compress(counts: pd.DataFrame, k: int, term_col: str = "term",
                n_col: str = "n") -> pd.DataFrame:
    """Compress exact (term, n) counts to at most k rows (Misra-Gries
    decrement). Returns the input untouched when it already fits."""
    if len(counts) <= k:
        return counts
    n = counts[n_col].to_numpy()
    # (k+1)-th largest via partition (no full sort)
    d = np.partition(n, len(n) - (k + 1))[len(n) - (k + 1)]
    out = counts.loc[n - d > 0].copy(deep=False)
    out[n_col] = out[n_col] - d
    return out


def mg_heavy_hitters(ds, text_col: str, k: int, n_shards: int = 64):
    """Frequent terms of a text corpus with guaranteed-lower-bound
    estimated counts: per-batch exact counts + MG compression (at most
    k rows leave any batch) → term-hash sharded exact sum. Returns a
    pandas DataFrame (term, n_est) — at most k*n_batches rows reach
    the shuffle and at most vocab∧(k·batches) the driver."""
    import pyarrow.compute as pc

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    def partial(t: pa.Table) -> pd.DataFrame:
        words = pc.list_flatten(
            pc.split_pattern_regex(t[text_col].combine_chunks(), r"\s+")
        )
        words = words.filter(pc.not_equal(words, ""))
        g = (
            pa.table({"term": words})
            .group_by("term")
            .aggregate([([], "count_all")])
            .rename_columns(["term", "n"])
            .to_pandas()
        )
        return mg_compress(g, k)

    def shard_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False)["n"].sum().reset_index(name="n_est")
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_map_groups(parts, "term", shard_sum, n_shards=n_shards).to_pandas()


# ---------------------------------------------------------------------------
# Count-Min Sketch: mergeable frequency sketch with point queries
# ---------------------------------------------------------------------------
# The third mergeable sketch of this module (HLL = distinct count,
# Misra-Gries = heavy hitters, CMS = per-key frequency): a depth x
# width counter grid where row d counts keys by hash_d(key) % width.
# Point estimate = min over rows — never an underestimate, and the
# whole structure is a SUM-mergeable array, so partial sketches built
# per batch combine associatively in one bounded groupby (the same
# shape as hll_partials' register merge). Hashes are the corpus
# splitmix streams, so a SQL oracle rebuilds the identical counters
# with GROUP BY arithmetic — the sketch itself is hash-verifiable.

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_STREAMS = (270, 271, 272, 273)  # one splitmix stream per row
CMS_SEED = 42


def cms_partials(ds, key_col: str, driver_merge: bool = False):
    """Per-batch partial counters -> one bounded merge: Dataset of
    (d, w, c) with c summed; at most DEPTH*WIDTH rows total.
    driver_merge applies the ops/sharded.bounded_key_sum DRIVER rule
    (callers gate it on corpus size)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from osm2gtfs_ray.sources.pages import _uint

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ds_, ws_, cs_ = [], [], []
        for d, stream in enumerate(CMS_STREAMS):
            w = _uint(keys, stream, CMS_SEED, CMS_WIDTH)
            counts = np.bincount(w, minlength=CMS_WIDTH)
            nz = np.flatnonzero(counts)
            ds_.append(np.full(len(nz), d, dtype=np.int64))
            ws_.append(nz.astype(np.int64))
            cs_.append(counts[nz].astype(np.int64))
        return pa.table(
            {"d": np.concatenate(ds_), "w": np.concatenate(ws_),
             "c": np.concatenate(cs_)}
        )

    from osm2gtfs_ray.ops.sharded import bounded_key_sum

    return bounded_key_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["d", "w"], ["c"], driver=driver_merge,
    )


def cms_estimate(counters, probes: np.ndarray) -> np.ndarray:
    """Point estimates for `probes` from a collected (d, w, c) table:
    min over depth rows; absent counters are zero."""
    from osm2gtfs_ray.sources.pages import _uint

    grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    d = counters["d"].to_numpy(zero_copy_only=False)
    w = counters["w"].to_numpy(zero_copy_only=False)
    c = counters["c"].to_numpy(zero_copy_only=False)
    grid[d, w] = c
    probes = np.asarray(probes, dtype=np.uint64)
    est = np.full(len(probes), np.iinfo(np.int64).max, dtype=np.int64)
    for row, stream in enumerate(CMS_STREAMS):
        est = np.minimum(est, grid[row, _uint(probes, stream, CMS_SEED, CMS_WIDTH)])
    return est
