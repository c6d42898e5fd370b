"""CLI entry point — the reference's `osm2gtfs -c config.json` parity
(/root/reference/osm2gtfs/osm2gtfs.py:20-41 arg parsing, 42-95 run).

    python -m osm2gtfs_ray.cli -c config.json [--refresh-routes|--refresh-stops]

Config (see sources/config.py): `input` points at either a directory
of osm_{nodes,ways,relations}.parquet or an Overpass XML file;
`schedule_source` at a standard-format timetable JSON; `output_file`
at the GTFS output directory (CSV per table). `--refresh-*` clears the
corresponding checkpoint partitions so the next run recomputes them
(the reference's cache-refresh entry point, osm2gtfs.py:51-63).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="osm2gtfs_ray")
    p.add_argument("--config", "-c", required=True)
    p.add_argument("--refresh-routes", action="store_true")
    p.add_argument("--refresh-stops", action="store_true")
    p.add_argument("--refresh-schedule", action="store_true",
                   help="refetch schedule_source, bypassing the disk cache")
    p.add_argument("--selector", default=None, help="profile override")
    p.add_argument("--zip", dest="zip_out", default=None,
                   help="assemble the CSV tables into a GTFS .zip at this path")
    p.add_argument("--validate", action="store_true",
                   help="run referential-integrity validation and print the report")
    args = p.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        # no explicit address: honors RAY_ADDRESS (preset "local" in the
        # sandbox; the cluster address when run under `ray job submit`)
        ray.init(
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        return _run(args)
    finally:
        if owns_ray:
            ray.shutdown()


def _run(args) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from osm2gtfs_ray.sources.config import load_config
    from osm2gtfs_ray.sources.schedule import load_schedule
    from osm2gtfs_ray.pipelines import gtfs

    cfg = load_config(args.config)
    selector = args.selector or cfg.get("selector", "default")
    out_dir = cfg["output_file"]
    ckpt = cfg.get("checkpoint_dir")
    if ckpt:
        for flag, name in ((args.refresh_routes, "routes"), (args.refresh_stops, "stops")):
            path = os.path.join(ckpt, name)
            if flag and os.path.isdir(path):
                shutil.rmtree(path)

    src = cfg["input"]
    if src.endswith(".xml"):
        from osm2gtfs_ray.sources.osm_xml import parse_osm_xml

        with open(src) as f:
            tables = parse_osm_xml(f.read())
    else:
        tables = {
            name: pq.read_table(os.path.join(src, f"{name}.parquet"))
            for name in ("osm_nodes", "osm_ways", "osm_relations")
        }

    sched_src = cfg["schedule_source"]
    if ckpt and isinstance(sched_src, str):
        # URL-or-path source with disk cache (configuration.py:40-90)
        from osm2gtfs_ray.sources.schedule import fetch_schedule_source

        sched_src = fetch_schedule_source(
            sched_src, ckpt, selector, refresh=args.refresh_schedule
        )
    schedule = load_schedule(sched_src)
    coords = gtfs.ways_coord_table(tables["osm_ways"], tables["osm_nodes"])
    out = gtfs.run_gtfs_pipeline(
        ray.data.from_arrow(tables["osm_nodes"]),
        ray.data.from_arrow(tables["osm_ways"]),
        ray.data.from_arrow(tables["osm_relations"]),
        coords,
        None,
        schedule,
        selector=selector,
    )
    if args.validate:
        from osm2gtfs_ray.pipelines.gtfs_feed import validate_feed

        report = validate_feed(out)
        for k, v in sorted(report.items()):
            print(f"validate {k}: {v}")
        if not report["ok"]:
            print("validation FAILED", file=sys.stderr)
            return 2

    counts = gtfs.write_gtfs_tables(
        {k: v for k, v in out.items() if k != "itineraries"}, out_dir
    )
    for name, n in sorted(counts.items()):
        print(f"{name}: {n} rows")

    if args.zip_out:
        from osm2gtfs_ray.pipelines.gtfs_feed import zip_feed

        path = zip_feed(out_dir, args.zip_out)
        print(f"feed zip: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
