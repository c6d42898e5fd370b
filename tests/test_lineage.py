"""Resumable partitioned output + lineage tests."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from osm2gtfs_ray.state import lineage


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _ds(rd, n=100):
    return rd.from_items([{"part": i % 4, "v": i} for i in range(n)])


def test_write_and_manifest(ray_session, out_dir):
    import ray.data as rd

    res = lineage.write_partitioned(_ds(rd), out_dir, "part")
    assert len(res) == 4
    assert not res["skipped"].any()
    man = lineage.read_manifest(out_dir)
    assert man["rows"].sum() == 100
    # data readable per partition
    t = pq.read_table(os.path.join(out_dir, "part=0", "data.parquet"))
    assert t.num_rows == 25


def test_resume_skips_done_partitions(ray_session, out_dir):
    import ray.data as rd

    lineage.write_partitioned(_ds(rd), out_dir, "part")
    # simulate a failed partition: remove its lineage marker
    os.remove(os.path.join(out_dir, "part=2", lineage.LINEAGE_FILE))
    assert lineage.done_partitions(out_dir) == {"0", "1", "3"}
    res = lineage.write_partitioned(_ds(rd), out_dir, "part", resume=True)
    by_part = res.set_index("partition")
    assert by_part.loc["2", "skipped"] == False  # noqa: E712 — rewritten
    assert bool(by_part.loc["0", "skipped"]) and bool(by_part.loc["3", "skipped"])
    assert lineage.done_partitions(out_dir) == {"0", "1", "2", "3"}


def test_content_hash_order_insensitive(ray_session, out_dir):
    df1 = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df2 = df1.iloc[[2, 0, 1]].reset_index(drop=True)
    assert lineage._content_hash(df1) == lineage._content_hash(df2)


def test_rerun_is_idempotent(ray_session, out_dir):
    import ray.data as rd

    lineage.write_partitioned(_ds(rd), out_dir, "part")
    h1 = lineage.read_manifest(out_dir).set_index("partition")["content_hash"].to_dict()
    lineage.write_partitioned(_ds(rd), out_dir, "part", resume=False)  # force rewrite
    h2 = lineage.read_manifest(out_dir).set_index("partition")["content_hash"].to_dict()
    assert h1 == h2
