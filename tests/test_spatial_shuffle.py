"""Shuffle-plan spatial join: must match the broadcast plan exactly,
including under forced hot-cell salting (SURVEY.md §7.4: salting must
preserve exact join results)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osm2gtfs_ray.sources import pages as pg
from osm2gtfs_ray.pipelines import flagship
from osm2gtfs_ray.stages.spatial_join import spatial_join_shuffle


N_PAGES = 300


@pytest.fixture(scope="module")
def plans(ray_session):
    tiles = pg.make_tiles_table(40, seed=42)
    pages = pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=4)
    res = flagship.run_flagship(pages, tiles, concurrency=1, batch_size=128)
    broadcast_join_rows = res["join_rows"].to_pandas()
    entities = flagship.entities_stage(
        flagship.extract_stage(
            pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=4), concurrency=1,
            batch_size=128,
        )
    )
    return tiles, entities, broadcast_join_rows


def _rows(df: pd.DataFrame) -> set:
    """Full logical result: every (url, entity, tile_id, method) row —
    pip, knn AND none must agree across physical plans."""
    return set(
        zip(df["url"], df["entity"], df["tile_id"].fillna("∅"), df["method"])
    )


def test_shuffle_plan_matches_broadcast(plans):
    tiles, entities, bc = plans
    sh = spatial_join_shuffle(entities, tiles).to_pandas()
    assert _rows(sh) == _rows(bc)
    assert (sh["method"] == "knn").sum() == (bc["method"] == "knn").sum() > 0


def test_salting_preserves_results(plans):
    tiles, entities, bc = plans
    # force EVERY cell hot with many salts: results must be identical
    sh = spatial_join_shuffle(entities, tiles, hot_threshold=0, n_salt=8).to_pandas()
    assert _rows(sh) == _rows(bc)
