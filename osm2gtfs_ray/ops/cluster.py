"""Greedy distance-threshold clustering (SURVEY.md G5).

Re-expresses the reference's Accra stop-area builder
(/root/reference/osm2gtfs/creators/gh_accra/stops_creator_gh_accra.py:36-63):
stops grouped by identical name, scanned in ascending osm_id order,
each assigned to the FIRST existing cluster whose seed is within the
threshold, else it seeds a new cluster. The greedy online order is the
semantics — this must stay a deterministic per-group sequential scan
(never a commutative aggregate), run inside groupby(name).map_groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from osm2gtfs_ray.geo.haversine import haversine_m


def greedy_cluster_group(g: pd.DataFrame, threshold_m: float = 500.0) -> pd.DataFrame:
    """One name-group of stops → cluster ids. Input columns: osm_id,
    lat, lon (+ passthrough). Adds ``cluster_seq`` (0-based per group,
    in seed order) and ``cluster_seed_id`` (osm_id of the seed)."""
    g = g.sort_values("osm_id", kind="mergesort").reset_index(drop=True)
    lat = g["lat"].to_numpy()
    lon = g["lon"].to_numpy()
    seed_lat: list[float] = []
    seed_lon: list[float] = []
    seed_id: list[int] = []
    assign = np.empty(len(g), dtype=np.int64)
    for i in range(len(g)):
        placed = False
        for c in range(len(seed_lat)):  # first within threshold wins
            if haversine_m(lat[i], lon[i], seed_lat[c], seed_lon[c]) <= threshold_m:
                assign[i] = c
                placed = True
                break
        if not placed:
            assign[i] = len(seed_lat)
            seed_lat.append(lat[i])
            seed_lon.append(lon[i])
            seed_id.append(int(g["osm_id"].iloc[i]))
    out = g.copy()
    out["cluster_seq"] = assign
    out["cluster_seed_id"] = [seed_id[c] for c in assign]
    return out


def greedy_cluster(stops_ds, threshold_m: float = 500.0):
    """groupby(name) → deterministic greedy scan per group."""
    return stops_ds.groupby("name").map_groups(
        lambda g: greedy_cluster_group(g, threshold_m), batch_format="pandas"
    )
