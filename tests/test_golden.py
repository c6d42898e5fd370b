"""End-to-end golden test (the reference's layer-3 strategy:
full chain from fixtures → exact comparison against committed golden
outputs, creators_tests.py:148-218). Order-insensitive: both sides are
canonicalized (sorted columns + rows) before exact equality."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from osm2gtfs_ray.sources import osm_fixtures as fx
from osm2gtfs_ray.pipelines import gtfs

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

TABLES = [
    "stops", "stations", "routes", "itineraries",
    "stop_times", "shapes", "frequencies", "agencies",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: ";".join(str(x) for x in v))
        elif df[c].dtype == np.float64:
            df[c] = df[c].round(9)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def pipeline_out(ray_session):
    import ray.data

    t = fx.make_osm_tables()
    sched = fx.make_schedule_table()
    coords = gtfs.ways_coord_table(t["osm_ways"], t["osm_nodes"])
    return gtfs.run_gtfs_pipeline(
        ray.data.from_arrow(t["osm_nodes"]),
        ray.data.from_arrow(t["osm_ways"]),
        ray.data.from_arrow(t["osm_relations"]),
        coords,
        None,
        sched,
    )


@pytest.mark.parametrize("table", TABLES)
def test_golden_exact(pipeline_out, table):
    got = canon(pipeline_out[table].to_pandas())
    want = pd.read_csv(os.path.join(GOLDEN_DIR, f"{table}.csv"))
    # CSV round-trip: compare as strings with normalized nulls
    def strings(df):
        return df.astype(str).replace({"None": "∅", "nan": "∅", "<NA>": "∅"}).reset_index(drop=True)

    got_s = strings(got)
    want_s = strings(canon(want))
    assert list(got_s.columns) == list(want_s.columns), table
    assert len(got_s) == len(want_s), f"{table}: {len(got_s)} vs {len(want_s)} rows"
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
