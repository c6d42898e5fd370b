"""Oracle snapshot directories: partitioned writes + staleness guard
(state/snapshot.py)."""

import glob
import os

import duckdb
import pyarrow as pa
import pytest

from osm2gtfs_ray.state.snapshot import write_snapshot, sql_guard


def test_partitioned_write_above_threshold(ray_session):
    """>1M-row snapshot switches to a distributed partitioned
    write_parquet (multiple part files, rows never collected whole) and
    the oracle-side glob read sees every row plus the extra columns."""
    import ray.data

    n = 1_200_000
    path = "/tmp/graft_test_snapshot_big"

    def to_pairs(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["id"], "b": b["id"]})

    ds = ray.data.range(n, override_num_blocks=8).map_batches(
        to_pairs, batch_format="pyarrow"
    )
    out = write_snapshot(ds, path, extra={"n_src": n, "tau_e6": 400000})
    assert isinstance(out, ray.data.Dataset)  # caller keeps streaming
    parts = glob.glob(os.path.join(path, "*.parquet"))
    assert len(parts) > 1, "expected a multi-file partitioned snapshot"

    con = duckdb.connect()
    cnt, n_src, tau = con.execute(
        f"SELECT COUNT(*), MIN(n_src), MIN(tau_e6) FROM read_parquet('{path}/*.parquet')"
    ).fetchone()
    assert (cnt, n_src, tau) == (n, n, 400000)
    # returned Dataset does NOT carry the metadata columns
    assert set(out.schema().names) == {"a", "b"}


def test_small_write_returns_table(ray_session):
    import ray.data

    path = "/tmp/graft_test_snapshot_small"
    ds = ray.data.from_arrow(pa.table({"a": [1, 2, 3], "b": [4, 5, 6]}))
    out = write_snapshot(ds, path, extra={"n_src": 3})
    assert isinstance(out, pa.Table) and out.column_names == ["a", "b"]
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 1
    con = duckdb.connect()
    assert con.execute(
        f"SELECT COUNT(*), MIN(n_src) FROM read_parquet('{path}/*.parquet')"
    ).fetchone() == (3, 3)


def test_guard_fails_loudly_on_stale_snapshot():
    path = "/tmp/graft_test_snapshot_guard"
    write_snapshot(pa.table({"a": [1, 2]}), path, extra={"n_src": 2})
    con = duckdb.connect()
    con.execute("CREATE VIEW src AS SELECT * FROM (VALUES (1), (2)) t(x)")
    con.execute("CREATE VIEW src3 AS SELECT * FROM (VALUES (1), (2), (3)) t(x)")
    q = f"SELECT COUNT(*) FROM read_parquet('{path}/*.parquet') WHERE {sql_guard(path, 'src')} = 1"
    assert con.execute(q).fetchone()[0] == 2
    stale = f"SELECT COUNT(*) FROM read_parquet('{path}/*.parquet') WHERE {sql_guard(path, 'src3')} = 1"
    with pytest.raises(duckdb.Error, match="stale snapshot"):
        con.execute(stale).fetchone()


def test_rewrite_clears_previous_parts():
    """A re-run must not leave old part files behind (the interleaved
    two-sf hazard)."""
    path = "/tmp/graft_test_snapshot_rewrite"
    write_snapshot(pa.table({"a": [1, 2, 3]}), path, extra={"n_src": 3})
    write_snapshot(pa.table({"a": [9]}), path, extra={"n_src": 1})
    con = duckdb.connect()
    assert con.execute(
        f"SELECT COUNT(*), MIN(n_src) FROM read_parquet('{path}/*.parquet')"
    ).fetchone() == (1, 1)
