"""`ray job submit` entrypoint — the north_rule's cluster execution
path for the flagship spatial join.

    ray job submit --working-dir /root/repo -- \
        python -m osm2gtfs_ray.job --pages 200000 --out /tmp/flagship_job

Inside a submitted job the runtime exports RAY_ADDRESS pointing at the
hosting cluster, so the bare ``ray.init()`` below CONNECTS to it
rather than starting a private session (cli.py / bench.py own local
sessions on purpose; this module is the one entry meant to run under
the job supervisor — same picture on a real fixed-size multi-node
cluster).

Output is resumable partitioned Parquet with per-partition lineage
records (state/lineage.py): resubmitting the SAME command after a
failure skips finished partitions and completes the remainder. The
final line on stdout is one JSON metrics record (rows, partitions,
wall seconds, throughput) — `ray job logs` / the job driver log is the
metrics channel.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="osm2gtfs_ray.job")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", type=int, help="synthetic corpus: page count")
    src.add_argument("--sf-dir", help="documents-derived pages from this testdata dir")
    p.add_argument("--out", required=True, help="partitioned Parquet output dir")
    p.add_argument("--tiles", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--part-level", type=int, default=4,
                   help="cell level delta for output partitions")
    p.add_argument("--entity-ckpt", default=None,
                   help="optional per-stage checkpoint dir for the entity table")
    p.add_argument("--no-resume", action="store_true",
                   help="rewrite all partitions, ignoring lineage records")
    args = p.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        # no address: honors RAY_ADDRESS from the job supervisor
        ray.init(include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        return _run(args)
    finally:
        if owns_ray:
            ray.shutdown()


def _run(args) -> int:
    from osm2gtfs_ray.pipelines.flagship import (
        flagship_to_checkpoint,
        pages_from_documents,
    )
    from osm2gtfs_ray.sources.pages import make_tiles_table, pages_dataset
    from osm2gtfs_ray.state.lineage import done_partitions

    done_before = set() if args.no_resume else done_partitions(args.out)
    t0 = time.time()
    if args.sf_dir:
        pages = pages_from_documents(args.sf_dir)
    else:
        pages = pages_dataset(args.pages, seed=args.seed)
    tiles = make_tiles_table(args.tiles, seed=args.seed)

    manifest = flagship_to_checkpoint(
        pages,
        tiles,
        args.out,
        concurrency=args.concurrency,
        batch_size=args.batch_size,
        part_level=args.part_level,
        resume=not args.no_resume,
        entity_ckpt_dir=args.entity_ckpt,
    )
    wall = time.time() - t0
    written = manifest[~manifest["skipped"]] if len(manifest) else manifest
    rows = int(written["rows"].sum()) if len(written) else 0
    metrics = {
        "metric": "flagship join rows written (resumable partitioned parquet)",
        "out": args.out,
        "rows_written": rows,
        "partitions_written": int(len(written)),
        "partitions_skipped_resume": len(done_before),
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
