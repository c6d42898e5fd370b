"""Per-partition lineage records + resumable partitioned Parquet output.

The north_rule's checkpoint/resume surface (replacing the reference's
all-or-nothing pickle cache, /root/reference/osm2gtfs/core/cache.py:13-40
and osm_connector.py:107-118):

* Output layout: ``out_dir/part=<key>/data.parquet`` — one directory
  per partition key (cell range / input shard), written ATOMICALLY
  (temp file + rename) so a crashed run never leaves a torn partition.
* Each partition carries ``_lineage.json``: row count, order-insensitive
  content hash, the writing code version, and wall-clock duration —
  the audit trail + resume marker.
* Resume: ``done_partitions(out_dir)`` enumerates finished keys; the
  writer skips them (anti-join of the work list), so a rerun only
  recomputes missing/failed partitions.

Partition writes happen inside ``groupby(part_col).map_groups`` — the
shuffle co-locates each partition's rows on one worker, the write is
idempotent per partition, and retried tasks simply overwrite their own
temp file.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd


LINEAGE_FILE = "_lineage.json"
ENGINE_VERSION = "0.1.0"


def _content_hash(df: pd.DataFrame) -> str:
    """Order-insensitive, partition-independent content hash: md5 over
    the sorted canonical CSV of the partition."""
    cols = sorted(df.columns)
    canon = df[cols].astype(str).sort_values(cols, kind="mergesort")
    return hashlib.md5(canon.to_csv(index=False).encode()).hexdigest()


def partition_dir(out_dir: str, key) -> str:
    return os.path.join(out_dir, f"part={key}")


def done_partitions(out_dir: str) -> set[str]:
    """Keys of partitions whose lineage record exists (= fully written)."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(out_dir, name, LINEAGE_FILE)
        ):
            done.add(name[len("part=") :])
    return done


def write_partition(df: pd.DataFrame, out_dir: str, key) -> dict:
    """Idempotent atomic write of one partition + lineage record."""
    pdir = partition_dir(out_dir, key)
    os.makedirs(pdir, exist_ok=True)
    t0 = time.perf_counter()
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    final = os.path.join(pdir, "data.parquet")
    df.to_parquet(tmp, index=False)
    os.replace(tmp, final)  # atomic on POSIX
    lineage = {
        "partition": str(key),
        "rows": int(len(df)),
        "content_hash": _content_hash(df),
        "engine_version": ENGINE_VERSION,
        "write_sec": round(time.perf_counter() - t0, 4),
    }
    ltmp = os.path.join(pdir, "." + LINEAGE_FILE + ".tmp")
    with open(ltmp, "w") as f:
        json.dump(lineage, f, sort_keys=True)
    os.replace(ltmp, os.path.join(pdir, LINEAGE_FILE))
    return lineage


def write_partitioned(ds, out_dir: str, part_col: str, resume: bool = True):
    """Write a Dataset partitioned by ``part_col`` with lineage; skips
    already-done partitions when resume=True. Returns the lineage
    records of partitions written in THIS run (as a pandas DataFrame).
    """
    os.makedirs(out_dir, exist_ok=True)
    skip = done_partitions(out_dir) if resume else set()

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        key = g[part_col].iloc[0]
        if str(key) in skip:
            return pd.DataFrame(
                {"partition": [str(key)], "rows": [len(g)], "skipped": [True]}
            )
        lineage = write_partition(g, out_dir, key)
        lineage["skipped"] = False
        return pd.DataFrame({k: [v] for k, v in lineage.items()})

    return ds.groupby(part_col).map_groups(write_group, batch_format="pandas").to_pandas()


def checkpoint_stage(ds_factory, ckpt_dir: str, refresh: bool = False):
    """Per-stage Parquet checkpoint (the reference's pickle-cache
    semantics made Arrow-native + resumable, cache.py:13-40 /
    osm_connector.py:107-118): if a completed checkpoint exists, READ
    it instead of recomputing the stage; otherwise run ``ds_factory()``,
    write it, and read back. ``refresh=True`` mirrors the reference's
    --refresh-* flags (recompute + overwrite)."""
    import ray.data

    done_marker = os.path.join(ckpt_dir, "_COMPLETE")
    if refresh and os.path.isdir(ckpt_dir):
        import shutil

        shutil.rmtree(ckpt_dir)
    if not os.path.exists(done_marker):
        os.makedirs(ckpt_dir, exist_ok=True)
        ds = ds_factory()
        ds.write_parquet(os.path.join(ckpt_dir, "data"))
        with open(done_marker + ".tmp", "w") as f:
            f.write(ENGINE_VERSION)
        os.replace(done_marker + ".tmp", done_marker)
    return ray.data.read_parquet(os.path.join(ckpt_dir, "data"))


def read_manifest(out_dir: str) -> pd.DataFrame:
    """All lineage records currently on disk (the run manifest)."""
    rows = []
    for key in sorted(done_partitions(out_dir)):
        with open(os.path.join(partition_dir(out_dir, key), LINEAGE_FILE)) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows)
