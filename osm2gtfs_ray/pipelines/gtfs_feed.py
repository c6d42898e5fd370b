"""GTFS feed assembly: zip sink + referential-integrity validation.

Re-expresses the reference's feed finalization
(/root/reference/osm2gtfs/osm2gtfs.py:90-93 — ``feed.Validate(...)``
then ``feed.WriteGoogleTransitFeed(zip)``) for the distributed writer:

* ``validate_feed`` runs the transitfeed-style referential checks as
  DISTRIBUTED anti-join counts (broadcast key sets, no driver
  materialization of fact tables): every stop_time references an
  existing stop and trip-id prefix route, every route is used, parent
  stations resolve.
* ``zip_feed`` assembles the per-table CSV part directories written by
  ``write_gtfs_tables`` into one consumable ``.zip`` (one csv per
  table, single header), the format every GTFS consumer expects.
"""

from __future__ import annotations

import os
import zipfile

import pyarrow as pa
import pyarrow.compute as pc


def _key_violations(ds, col: str, valid_ds, valid_col: str) -> int:
    """Distributed count of rows whose ``col`` is absent from the valid
    key set (the transitfeed missing-reference check)."""
    import ray

    from osm2gtfs_ray.ops.joins import _as_arrow

    keys = pc.unique(_as_arrow(valid_ds.select_columns([valid_col]))[valid_col])
    ref = ray.put(keys)

    def part(t: pa.Table) -> pa.Table:
        bad = pc.sum(
            pc.cast(
                pc.invert(pc.fill_null(pc.is_in(t[col], value_set=ray.get(ref)), False)),
                pa.int64(),
            )
        ).as_py()
        return pa.table({"bad": pa.array([int(bad or 0)])})

    return int(ds.map_batches(part, batch_format="pyarrow").sum("bad") or 0)


def validate_feed(tables: dict) -> dict:
    """Referential-integrity report over the lazy GTFS Datasets.

    Returns {check: violation_count} plus ``ok``. Checks mirror the
    transitfeed validations the reference runs (osm2gtfs.py:91):
    dangling stop/route references, unparented stations, empty
    mandatory tables.
    """
    report: dict[str, int | bool] = {}
    st = tables["stop_times"]
    report["stop_times_missing_stop"] = _key_violations(
        st, "stop_id", tables["stops"], "stop_id"
    )
    report["stop_times_missing_route"] = _key_violations(
        st, "route_id", tables["routes"], "route_id"
    )
    if "stations" in tables:
        # parent_station values must be real station ids
        stops_with_parent = tables["stops"].map_batches(
            lambda t: t.filter(pc.is_valid(t["parent_station"])),
            batch_format="pyarrow",
        )
        report["stops_missing_parent_station"] = _key_violations(
            stops_with_parent, "parent_station", tables["stations"], "station_id"
        )
    for mandatory in ("stops", "routes", "stop_times"):
        report[f"{mandatory}_nonempty"] = tables[mandatory].count() > 0
    report["ok"] = all(
        bool(v) if isinstance(v, bool) else (v == 0)
        for k, v in report.items()
        if k != "ok"
    )
    return report


def zip_feed(out_dir: str, zip_path: str, tables: list[str] | None = None) -> str:
    """Merge the per-table CSV part directories under ``out_dir`` into
    a single GTFS zip (one ``<table>.txt`` per table, one header).

    Part files are concatenated in sorted filename order — the sinks
    sort their Datasets (O1), so the merged order is deterministic.
    """
    names = tables or sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in names:
            part_dir = os.path.join(out_dir, name)
            parts = sorted(
                f for f in os.listdir(part_dir) if f.endswith(".csv")
            )
            if not parts:
                continue
            chunks: list[str] = []
            header = None
            for p in parts:
                with open(os.path.join(part_dir, p)) as f:
                    lines = f.read().splitlines()
                if not lines:
                    continue
                if header is None:
                    header = lines[0]
                    chunks.append(header)
                chunks.extend(lines[1:])
            zf.writestr(f"{name}.txt", "\n".join(chunks) + "\n")
    return zip_path
