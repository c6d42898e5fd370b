"""Range (interval) join: facts(ts) ⋈ ranges[start, end).

Ray Data has equi-joins only; intervals need their own operator (the
custom-operator family alongside ops/asof.py — reference semantics:
the G6 bbox predicate of `osm_connector.py:570-616` is the 2-D
analogue of this 1-D interval containment).

Physical plan — broadcast-interval join:

* the range table (small side: windows, promo periods, calendar
  buckets) is sorted by ``start`` and rides the object store once
  (``ray.put``), like every other small-side join in ops/joins.py;
* each fact batch locates its covering intervals with two vectorized
  ``searchsorted`` passes: candidates for ts are the ranges with
  ``start ∈ (ts - max_len, ts]`` where ``max_len = max(end - start)``
  — a contiguous slice of the sorted table;
* the slice is walked with a loop over *candidate offsets* (bounded by
  W = the max number of ranges whose starts fall within any
  ``max_len`` span — e.g. ceil(length/stride) for sliding windows),
  each iteration fully vectorized over the batch. Matches emit
  fact-row gathers with ``range_id`` appended. Per-batch cost is
  O(rows · W), never O(rows · ranges).

Scale path: when the range table outgrows one object, bucket BOTH
sides by coarse time bucket (floor(ts / max_len)) — each fact lands in
exactly 2 buckets worth of candidate ranges — and run this same kernel
per bucket group; the partitioning assumption is that ``max_len`` is
bounded (true for windows/sessions, not for open-ended intervals).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_int64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def range_join(
    facts_ds,
    ranges: pa.Table,
    ts_col: str,
    range_id_col: str = "range_id",
    start_col: str = "start",
    end_col: str = "end",
):
    """facts ⋈ ranges on ``start <= ts < end``; output = fact columns +
    ``range_id`` (one row per match; facts matching nothing drop out,
    facts in k overlapping ranges appear k times).

    ``ranges`` is a driver-side pa.Table (the broadcast side); ``ts``
    and the range bounds may be int64 or timestamp (compared on the
    timestamp's int64 representation).
    """
    import ray

    starts = _as_int64(ranges[start_col])
    ends = _as_int64(ranges[end_col])
    rids = _as_int64(ranges[range_id_col])
    if np.any(ends < starts):
        raise ValueError("range_join: end < start")
    order = np.argsort(starts, kind="stable")
    starts, ends, rids = starts[order], ends[order], rids[order]
    max_len = int((ends - starts).max()) if len(starts) else 0
    ref = ray.put((starts, ends, rids, max_len))

    def join_batch(t: pa.Table, _ref=ref) -> pa.Table:
        starts, ends, rids, max_len = ray.get(_ref)
        ts = _as_int64(t[ts_col])
        if len(ts) == 0 or len(starts) == 0:
            return t.slice(0, 0).append_column(
                range_id_col, pa.array([], pa.int64())
            )
        hi = np.searchsorted(starts, ts, side="right")
        lo = np.searchsorted(starts, ts - max_len, side="right")
        width = int((hi - lo).max())
        take_rows, take_rids = [], []
        for off in range(width):
            j = lo + off
            ok = j < hi
            jj = np.where(ok, j, 0)
            ok &= ts < ends[jj]
            idx = np.nonzero(ok)[0]
            if len(idx):
                take_rows.append(idx)
                take_rids.append(rids[jj[idx]])
        if not take_rows:
            return t.slice(0, 0).append_column(
                range_id_col, pa.array([], pa.int64())
            )
        rows = np.concatenate(take_rows)
        out = t.take(pa.array(rows))
        return out.append_column(
            range_id_col, pa.array(np.concatenate(take_rids), pa.int64())
        )

    return facts_ds.map_batches(join_batch, batch_format="pyarrow")
