"""Oracle snapshot writes: parquet DIRECTORIES with a staleness guard.

Snapshot-based oracles (minhash/cosine candidate pairs, simhash
signatures, k-means centroids, dedup pair sets) verify a
non-SQL-expressible artifact by writing it to parquet inside the query
and letting the DuckDB oracle recompute the downstream steps over the
SAME rows. Two hazards with a bare fixed ``/tmp`` file (round-3
advice): a query branch that skips the write leaves a stale file for
the oracle to mis-verify, and two runs at different sf interleaving on
the same path cross-contaminate silently.

Scheme here:

- every snapshot is a **directory** of parquet part files — oracles
  read ``'<path>/*.parquet'`` — so large artifacts switch to a
  partitioned distributed ``Dataset.write_parquet`` above
  ``threshold`` rows with no SQL change (and a resumable, multi-file
  layout instead of one driver-side giant file);
- every snapshot carries constant metadata columns: ``n_src`` (row
  count of the source table at write time) plus any query parameters
  (e.g. ``tau_e6``); the oracle SQL selects parameters from the
  snapshot itself and asserts ``n_src`` equals ``COUNT(*)`` of the
  live source view via :func:`sql_guard` — a snapshot written against
  a different sf fails LOUDLY through DuckDB ``error()`` instead of
  producing a plausible wrong verification.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_THRESHOLD = 1_000_000


def write_snapshot(obj, path: str, extra: dict | None = None,
                   threshold: int = DEFAULT_THRESHOLD):
    """Write ``obj`` (``pa.Table`` or ``ray.data.Dataset``) as an
    oracle snapshot directory at ``path``.

    Small artifacts (≤ ``threshold`` rows) are collected and written
    driver-side as one part file; larger Datasets are written with a
    distributed partitioned ``write_parquet`` (one file per block —
    the rows never land in one process). ``extra`` scalar columns are
    appended to every row in the FILE only.

    Returns a ``pa.Table`` (without the extra columns) on the small
    path so callers can keep working with the collected rows, or the
    input Dataset unchanged on the partitioned path.
    """
    import ray.data

    extra = extra or {}
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    if isinstance(obj, ray.data.Dataset):
        obj = obj.materialize()  # count + write + caller reuse: one execution
        if obj.count() > threshold:

            def _add_extras(t: pa.Table) -> pa.Table:
                for k, v in extra.items():
                    t = t.append_column(k, pa.array([v] * t.num_rows))
                return t

            (obj.map_batches(_add_extras, batch_format="pyarrow")
                if extra else obj).write_parquet(path)
            return obj
        from osm2gtfs_ray.ops.joins import _as_arrow

        tbl = _as_arrow(obj)
    else:
        tbl = obj

    out = tbl
    for k, v in extra.items():
        out = out.append_column(k, pa.array([v] * out.num_rows))
    pq.write_table(out, os.path.join(path, "part-0.parquet"))
    return tbl


def sql_guard(path: str, src_view: str) -> str:
    """Scalar SQL fragment: 1 when the snapshot directory at ``path``
    was written against the current contents of ``src_view`` (matched
    by row count), else a loud DuckDB ``error()``. Use as
    ``WHERE {sql_guard(...)} = 1`` in the snapshot-reading CTE."""
    return (
        f"(SELECT CASE WHEN (SELECT MIN(n_src) FROM read_parquet('{path}/*.parquet'))"
        f" = (SELECT COUNT(*) FROM {src_view}) THEN 1"
        f" ELSE error('stale snapshot {path}: n_src differs from {src_view}"
        f" — re-run the query at this sf before its oracle') END)"
    )
