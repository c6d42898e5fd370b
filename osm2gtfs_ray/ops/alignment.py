"""Ordered stop↔schedule-time alignment + interpolation (SURVEY.md J10).

Re-expresses the reference's trip builder cursor walk
(/root/reference/osm2gtfs/creators/trips_creator.py:195-245): walk the
itinerary's stops in sequence; a monotone cursor scans the schedule's
station list; a stop matches the next schedule station at-or-after the
cursor (the as-of alignment). The invariant from :237-241 — the LAST
itinerary stop must align with the LAST schedule station, else the
trip is treated as unmatched — is preserved. Unmatched intermediate
stops get times interpolated evenly between the surrounding matched
stops (re-expressing helper.py:56-67).

Pure per-trip function; runs inside map_groups / map_batches — order
is carried by the stop_sequence data, never by block order.
"""

from __future__ import annotations

import numpy as np


def align_stops_to_schedule(
    stop_names: list[str], station_names: list[str]
) -> list[int] | None:
    """Monotone cursor alignment: for each itinerary stop, the index of
    the matched schedule station or -1. Returns None if the last-stop
    invariant fails (trip unmatched)."""
    out = []
    cursor = 0
    for name in stop_names:
        try:
            idx = station_names.index(name, cursor)
        except ValueError:
            out.append(-1)
            continue
        out.append(idx)
        cursor = idx + 1
    if not out:
        return None
    # last itinerary stop must align with last schedule station
    if out[-1] != len(station_names) - 1:
        return None
    return out


def interpolate_times(matched_sec: np.ndarray) -> np.ndarray:
    """Fill -1 gaps with evenly spaced times between surrounding known
    stops (helper.py:56-67 semantics). First/last must be known."""
    t = matched_sec.astype(np.float64)
    known = np.nonzero(t >= 0)[0]
    for a, b in zip(known[:-1], known[1:]):
        if b - a > 1:
            t[a : b + 1] = np.linspace(t[a], t[b], b - a + 1)
    return np.rint(t).astype(np.int64)


def parse_hm(s: str) -> int | None:
    """'H:MM' wall time → seconds; None on invalid (M15 row-drop)."""
    parts = s.split(":")
    if len(parts) != 2:
        return None
    try:
        h, m = int(parts[0]), int(parts[1])
    except ValueError:
        return None
    if not (0 <= m < 60) or h < 0:
        return None
    return h * 3600 + m * 60


SERVICE_DAYS = {
    "Mo-Fr": (1, 1, 1, 1, 1, 0, 0),
    "Mo-Sa": (1, 1, 1, 1, 1, 1, 0),
    "Mo-Su": (1, 1, 1, 1, 1, 1, 1),
    "Sa": (0, 0, 0, 0, 0, 1, 0),
    "Su": (0, 0, 0, 0, 0, 0, 1),
    "Sa-Su": (0, 0, 0, 0, 0, 1, 1),
}

import re

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def parse_service(keyword: str):
    """Service keyword → (day_flags 7-tuple, exception_date or None)
    (M16, trips_creator.py:280-332): known day ranges, else a
    YYYY-MM-DD exception date, else None (dropped with diagnostic)."""
    if keyword in SERVICE_DAYS:
        return SERVICE_DAYS[keyword], None
    if _DATE_RE.match(keyword):
        return (0, 0, 0, 0, 0, 0, 0), keyword
    return None
