"""Profile registry: the user-extension surface (SURVEY.md §2.9).

The reference's creator plugin system dynamically imports
``osm2gtfs/creators/<selector>/<kind>_creator_<selector>.py`` and
instantiates ``<Kind>Creator<CamelSelector>`` with template-method
hooks (/root/reference/osm2gtfs/core/creator_factory.py:30-133;
hooks stops_creator.py:105-131, routes_creator.py:60-119). The rebuild
replaces dynamic imports with a plain registry: a named profile maps
hook names to batch-UDF variants; config's ``selector`` picks the
profile; unset hooks fall back to the default.

Hooks (all operate on/return Arrow data):
  stop_id(t: pa.Table, osm_type: str) -> pa.Array   # M9
  stop_name(name: pa.Array) -> pa.Array             # M10
  route_id(...), route_color(...)                    # M11/M6 variants
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _default_stop_id(t: pa.Table, osm_type: str) -> pa.Array:
    """M9 default precedence: ref:gtfs > ref > '<type>/<id>'
    (stops_creator.py:105-124)."""
    from osm2gtfs_ray.pipelines.gtfs import _tag

    fallback = pc.binary_join_element_wise(
        pa.array([osm_type] * len(t)), pc.cast(t["id"], pa.string()), "/"
    )
    return pc.coalesce(_tag(t["tags"], "ref:gtfs"), _tag(t["tags"], "ref"), fallback)


def _bare_osm_id_stop_id(t: pa.Table, osm_type: str) -> pa.Array:
    """City-override variant: bare osm id, no type prefix
    (stops_creator_br_florianopolis.py:8-13)."""
    return pc.cast(t["id"], pa.string())


def _default_stop_name(name: pa.Array) -> pa.Array:
    """M10: identity (stops_creator.py:126-131)."""
    return name


def _upper_stop_name(name: pa.Array) -> pa.Array:
    return pc.utf8_upper(name)


DEFAULT_PROFILE = {
    "stop_id": _default_stop_id,
    "stop_name": _default_stop_name,
}

PROFILES: dict[str, dict] = {
    "default": {},
    # city-style override profiles (examples mirroring the reference's
    # br_florianopolis / gh_accra specializations)
    "bare_ids": {"stop_id": _bare_osm_id_stop_id},
    "upper_names": {"stop_name": _upper_stop_name},
}


def get_profile(selector: str) -> dict:
    """Resolved hook table: named profile over the defaults. Unknown
    selectors fall back to default (the reference raises; we prefer
    explicit fallback + the registry test asserts known names)."""
    hooks = dict(DEFAULT_PROFILE)
    hooks.update(PROFILES.get(selector, {}))
    return hooks


def register_profile(name: str, **hooks) -> None:
    """User entry point: register a profile programmatically (the
    config `selector` then selects it)."""
    PROFILES[name] = dict(hooks)
