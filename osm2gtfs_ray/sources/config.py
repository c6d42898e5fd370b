"""Pipeline configuration: load, validate, default (SURVEY.md S3/O5).

Re-expresses the reference's Configuration
(/root/reference/osm2gtfs/core/configuration.py:92-208): JSON config
with a spatial query (bbox + tag selector), agency/feed_info blocks,
schedule source and output path; feed date-range validation with
first-of-month defaulting. Driver-side plain Python — config is not a
Dataset. The `selector` picks per-profile UDF overrides (the rebuild
of the creator plugin system, SURVEY.md §2.9) from a registry instead
of dynamic imports.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

REQUIRED_KEYS = ("query", "output_file")


class ConfigError(ValueError):
    pass


def load_config(path_or_dict, today: _dt.date | None = None) -> dict:
    """Load + validate + default a pipeline config."""
    if isinstance(path_or_dict, dict):
        cfg = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            cfg = json.load(f)

    for k in REQUIRED_KEYS:
        if k not in cfg:
            raise ConfigError(f"missing required config key: {k}")

    q = cfg["query"]
    if "bbox" in q:
        b = q["bbox"]
        for side in ("n", "s", "e", "w"):
            if side not in b:
                raise ConfigError(f"bbox missing side: {side}")
        if not (-90 <= b["s"] <= b["n"] <= 90):
            raise ConfigError("bbox latitude bounds invalid")

    cfg["selector"] = cfg.get("selector", "default")
    cfg.setdefault("agency", {})
    cfg["feed_info"] = _default_dates(cfg.get("feed_info", {}), today)
    cfg["output_file"] = os.path.expanduser(cfg["output_file"])
    return cfg


def _default_dates(fi: dict, today: _dt.date | None) -> dict:
    """O5 (configuration.py:147-208): missing start → first of current
    month; missing end → start + 1 year; validate format and order."""
    today = today or _dt.date.today()
    fi = dict(fi)
    if "start_date" not in fi:
        fi["start_date"] = today.replace(day=1).isoformat()
    if not _DATE_RE.match(fi["start_date"]):
        raise ConfigError(f"invalid start_date: {fi['start_date']}")
    start = _dt.date.fromisoformat(fi["start_date"])
    if "end_date" not in fi:
        try:
            fi["end_date"] = start.replace(year=start.year + 1).isoformat()
        except ValueError:  # Feb 29
            fi["end_date"] = start.replace(year=start.year + 1, day=28).isoformat()
    if not _DATE_RE.match(fi["end_date"]):
        raise ConfigError(f"invalid end_date: {fi['end_date']}")
    if _dt.date.fromisoformat(fi["end_date"]) < start:
        raise ConfigError("end_date before start_date")
    return fi
