"""opening_hours → GTFS frequencies conversion (SURVEY.md M17/M18).

Re-expresses the reference's Abidjan creator, which delegates to the
public `transporthours` library
(/root/reference/osm2gtfs/creators/ci_abidjan/trips_creator_ci_abidjan.py:81-89,
132-137): OSM `opening_hours` + `interval` tags become
{start_time, end_time, headway, day-flags} rows, and day-flag sets get
canonical service ids (`Mo-Su`, `Mo-Fr`, `Sa-Su`, else comma list —
:32-53). Implemented from scratch for the common grammar subset:

    opening_hours = "<days> <hh:mm>-<hh:mm>[, ...]; ..." with
    days ∈ {Mo,Tu,We,Th,Fr,Sa,Su} singles or ranges (Mo-Fr), comma
    lists (Mo,We,Fr); interval = "hh:mm" | "hh:mm:ss" | minutes int.

Pure functions → used inside flat_map-style map_batches (one input
row explodes to N frequency rows).
"""

from __future__ import annotations

import re

DAYS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
_DAY_IDX = {d: i for i, d in enumerate(DAYS)}

_TIME_RE = re.compile(r"^(\d{1,2}):(\d{2})(?::(\d{2}))?$")


def parse_time_s(t: str) -> int | None:
    m = _TIME_RE.match(t.strip())
    if not m:
        return None
    h, mi = int(m.group(1)), int(m.group(2))
    s = int(m.group(3) or 0)
    if mi >= 60 or s >= 60:
        return None
    return h * 3600 + mi * 60 + s


def parse_interval_s(v: str) -> int | None:
    """interval tag → seconds: 'hh:mm'/'hh:mm:ss' or bare minutes."""
    v = v.strip()
    if _TIME_RE.match(v):
        return parse_time_s(v)
    if v.isdigit():
        return int(v) * 60
    return None


def _parse_day_spec(spec: str) -> tuple[int, ...] | None:
    """'Mo-Fr' / 'Sa' / 'Mo,We,Fr' → 7 day flags."""
    flags = [0] * 7
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            a, _, b = part.partition("-")
            if a not in _DAY_IDX or b not in _DAY_IDX:
                return None
            ia, ib = _DAY_IDX[a], _DAY_IDX[b]
            idxs = range(ia, ib + 1) if ia <= ib else list(range(ia, 7)) + list(range(0, ib + 1))
            for i in idxs:
                flags[i] = 1
        else:
            if part not in _DAY_IDX:
                return None
            flags[_DAY_IDX[part]] = 1
    return tuple(flags)


def parse_opening_hours(oh: str, interval: str) -> list[dict]:
    """→ [{day_flags, start_s, end_s, headway_s}] rows; unparseable
    rules are skipped (the reference lets the library drop them)."""
    headway = parse_interval_s(interval)
    if headway is None or not oh:
        return []
    out = []
    for rule in oh.split(";"):
        rule = rule.strip()
        if not rule:
            continue
        m = re.match(r"^([A-Za-z,\-]+)\s+(.+)$", rule)
        if not m:
            continue
        flags = _parse_day_spec(m.group(1))
        if flags is None:
            continue
        for span in m.group(2).split(","):
            span = span.strip()
            if "-" not in span:
                continue
            a, _, b = span.partition("-")
            sa, sb = parse_time_s(a), parse_time_s(b)
            if sa is None or sb is None:
                continue
            if sb <= sa:
                sb += 24 * 3600  # crosses midnight
            out.append(
                {"day_flags": flags, "start_s": sa, "end_s": sb, "headway_s": headway}
            )
    return out


def service_id_for(day_flags: tuple[int, ...]) -> str:
    """M18 canonical id (trips_creator_ci_abidjan.py:32-53)."""
    if day_flags == (1, 1, 1, 1, 1, 1, 1):
        return "Mo-Su"
    if day_flags == (1, 1, 1, 1, 1, 0, 0):
        return "Mo-Fr"
    if day_flags == (0, 0, 0, 0, 0, 1, 1):
        return "Sa-Su"
    return ",".join(d for d, f in zip(DAYS, day_flags) if f)


def parse_duration_approx(v: str) -> int | None:
    """M14 (trips_creator_br_florianopolis.py:80-87): '00:19 aproximado'
    → seconds; 'não encontrado' / invalid → None (row skipped)."""
    m = re.match(r"^(\d{1,2}):(\d{2})", v.strip())
    if not m:
        return None
    return int(m.group(1)) * 3600 + int(m.group(2)) * 60
