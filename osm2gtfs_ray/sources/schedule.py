"""Schedule source loading (SURVEY.md S4/S5).

Re-expresses the reference's schedule handling: source fetch + cache
(/root/reference/osm2gtfs/core/configuration.py:40-90) and strict JSON
parse (/root/reference/osm2gtfs/creators/schedule_creator.py:33-54).
The schedule is tiny relative to the OSM/pages side, so it loads
driver-side and is broadcast (ray.put) into the trip-building stage —
never shuffled.

Standard format (trips_creator.py:84-95, 334-376):
  {"lines": {route_id: [ {"from": .., "to": .., "via"?: ..,
                          "services": [..], "stations": [names..],
                          "times": [[..], ..]} ]}}
→ one Arrow row per (route_id, variant-entry, service).
"""

from __future__ import annotations

import json

import pyarrow as pa

SCHEDULE_SCHEMA = pa.schema(
    [
        ("route_id", pa.string()),
        ("from_stop", pa.string()),
        ("to_stop", pa.string()),
        ("via", pa.string()),
        ("service", pa.string()),
        ("station_names", pa.list_(pa.string())),
        ("times", pa.list_(pa.list_(pa.string()))),
    ]
)


class ScheduleError(ValueError):
    pass


def load_schedule(path_or_dict) -> pa.Table:
    """Load + validate a standard-format schedule into the flat Arrow
    table the trip builder broadcasts. Invalid structure raises
    ScheduleError (the reference exits, schedule_creator.py:44-54)."""
    if isinstance(path_or_dict, dict):
        doc = path_or_dict
    elif isinstance(path_or_dict, str) and path_or_dict.lstrip()[:1] == "{":
        # raw JSON text (the fetch_schedule_source output)
        try:
            doc = json.loads(path_or_dict)
        except json.JSONDecodeError as e:
            raise ScheduleError(f"invalid schedule JSON: {e}") from e
    else:
        with open(path_or_dict) as f:
            try:
                doc = json.load(f)
            except json.JSONDecodeError as e:
                raise ScheduleError(f"invalid schedule JSON: {e}") from e
    if "lines" not in doc or not isinstance(doc["lines"], dict):
        raise ScheduleError("schedule missing 'lines' mapping")
    rows = []
    for route_id, entries in sorted(doc["lines"].items()):
        if not isinstance(entries, list):
            raise ScheduleError(f"route {route_id}: entries must be a list")
        for e in entries:
            for k in ("from", "to", "stations", "times"):
                if k not in e:
                    raise ScheduleError(f"route {route_id}: entry missing '{k}'")
            # times come station-major in the wire format; keep the
            # trip-major orientation used by the trip builder
            times = e["times"]
            if times and any(len(t) != len(e["stations"]) for t in times):
                raise ScheduleError(f"route {route_id}: times width != stations")
            for service in e.get("services", ["Mo-Su"]):
                rows.append(
                    {
                        "route_id": str(route_id),
                        "from_stop": e["from"],
                        "to_stop": e["to"],
                        "via": e.get("via"),
                        "service": service,
                        "station_names": list(e["stations"]),
                        "times": [list(t) for t in times],
                    }
                )
    return pa.Table.from_pylist(rows, schema=SCHEDULE_SCHEMA)


# M19 (trips_creator_br_florianopolis.py:105-118): provider-specific
# day-keyed horarios → canonical service keywords
_HORARIO_PREFIXES = [
    ("Dias Úteis", "Mo-Fr"),
    ("Sábado", "Sa"),
    ("Domingo", "Su"),
]


def partition_horarios(horarios: dict) -> dict[str, list]:
    """Split a {day-label: [times..]} dict into canonical service
    buckets by label prefix; unknown labels are dropped (the
    reference's else-branch ignores them)."""
    out: dict[str, list] = {}
    for label, times in sorted(horarios.items()):
        for prefix, service in _HORARIO_PREFIXES:
            if label.startswith(prefix):
                out.setdefault(service, []).extend(times)
                break
    return out


# --------------------------------------------------------------------------
# Schedule source fetch + disk cache (configuration.py:40-90)
# --------------------------------------------------------------------------

def fetch_schedule_source(
    source: str,
    cache_dir: str,
    selector: str,
    refresh: bool = False,
    fetcher=None,
) -> str:
    """Schedule source text from a local path or URL, with disk cache.

    Mirrors the reference's get_schedule_source
    (configuration.py:40-90): prefer the cached copy unless ``refresh``
    is set; a local file path is read directly; otherwise the source is
    treated as a URL and fetched via the pluggable ``fetcher(url) ->
    str`` (this sandbox has no network, so the default fetcher raises
    ScheduleError — deployments pass e.g. urllib). The fetched text is
    written to ``{cache_dir}/{selector}-schedule`` after every
    non-cached load (Cache.write_file semantics).
    """
    import os

    cached_file = os.path.join(cache_dir, f"{selector}-schedule")
    if not refresh and os.path.isfile(cached_file):
        with open(cached_file) as f:
            text = f.read()
        if text:
            return text

    if os.path.isfile(source):
        with open(source) as f:
            text = f.read()
    else:
        if fetcher is None:
            raise ScheduleError(
                f"schedule_source {source!r} is not a local file and no "
                "fetcher was provided (no network in this environment)"
            )
        text = fetcher(source)
        if isinstance(text, bytes):
            text = text.decode("utf-8")

    os.makedirs(cache_dir, exist_ok=True)
    with open(cached_file, "w") as f:
        f.write(text)
    return text
