"""End-to-end flagship pipeline tests on the synthetic pages corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osm2gtfs_ray.sources import pages as pg
from osm2gtfs_ray.stages.extract import TextExtractor, explode_entities, extract_text_arrow
from osm2gtfs_ray.geo.pip import points_in_polygon
from osm2gtfs_ray.pipelines import flagship


N_PAGES = 400


def test_generator_deterministic():
    a = pg.make_pages_batch(0, 50)
    b = pg.make_pages_batch(0, 50)
    assert a.equals(b)
    # partition-independent: rows 10..20 generated alone match the slice
    c = pg.make_pages_batch(10, 10)
    assert a.slice(10, 10).to_pydict() == c.to_pydict()


def test_extract_invariant_byte_identical():
    t = pg.make_pages_batch(0, 200)
    got = extract_text_arrow(t["html"].combine_chunks())
    want = t["text"]
    assert got.to_pylist() == want.to_pylist()


def test_extractor_entities_match_oracle():
    t = pg.make_pages_batch(0, 100)
    ex = TextExtractor()(t)
    flat = explode_entities(ex)
    oracle = pg.make_entities_batch(0, 100)
    assert flat.to_pydict() == oracle.to_pydict()


def _brute_join(entities: pa.Table, tiles: pa.Table):
    """Brute-force PIP oracle: every point against every tile."""
    out = set()
    rings = tiles["ring"].to_pylist()
    tids = tiles["tile_id"].to_pylist()
    lat = entities["lat"].to_numpy()
    lon = entities["lon"].to_numpy()
    urls = entities["url"].to_pylist()
    ents = entities["entity"].to_pylist()
    for t, ring in enumerate(rings):
        rla = np.array([p["lat"] for p in ring[:-1]])
        rlo = np.array([p["lon"] for p in ring[:-1]])
        inside = points_in_polygon(lat, lon, rla, rlo)
        for i in np.nonzero(inside)[0]:
            out.add((urls[i], ents[i], tids[t]))
    return out


def test_flagship_end_to_end(ray_session):
    import ray.data

    tiles = pg.make_tiles_table(40, seed=42)
    pages = pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=8)
    res = flagship.run_flagship(pages, tiles, concurrency=1, batch_size=128)

    assert flagship.invariant_mismatches(res["extracted"]) == 0

    join = res["join_rows"].to_pandas()
    oracle_entities = pg.make_entities_batch(0, N_PAGES)
    # every entity appears (pip rows may duplicate per overlapping tile)
    assert set(join["url"]) == set(oracle_entities["url"].to_pylist())

    pip_rows = join[join["method"] == "pip"]
    got = set(zip(pip_rows["url"], pip_rows["entity"], pip_rows["tile_id"]))
    want = _brute_join(oracle_entities, tiles)
    assert got == want

    # knn rows: point not in any polygon, tile_id is the nearest center
    knn_rows = join[join["method"] == "knn"]
    assert (set(zip(knn_rows["url"], knn_rows["entity"])) & {(u, e) for u, e, _ in want}) == set()

    asn = res["assignments"].to_pandas()
    assert (asn["count"] > 0).all()
    # total assignment count equals matched join rows
    matched = join[join["tile_id"].notna()]
    assert asn["count"].sum() == len(matched)


def test_flagship_hot_cells_present(ray_session):
    """The skew fixture: hot tiles collect ~HOT_FRACTION of entities."""
    tiles = pg.make_tiles_table(40, seed=42)
    pages = pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=4)
    res = flagship.run_flagship(pages, tiles, concurrency=1, batch_size=128)
    join = res["join_rows"].to_pandas()
    hot = join[join["tile_id"].astype(str).str.startswith("tile_hot")]
    assert len(hot) > 0.3 * len(join)


def test_flagship_fused_equals_unfused(ray_session):
    """FusedExtractJoin must produce exactly the join rows + assignments
    of the two-pool layout (fusion is an execution optimization, not a
    semantic change)."""
    tiles = pg.make_tiles_table(40, seed=42)

    pages_a = pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=8)
    base = flagship.run_flagship(pages_a, tiles, concurrency=1, batch_size=128)
    want = base["join_rows"].to_pandas()

    pages_b = pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=8)
    fused = flagship.run_flagship_fused(pages_b, tiles, concurrency=2, batch_size=96)
    got = fused["join_rows"].to_pandas()

    key = ["url", "entity", "method", "tile_id"]
    want_s = want.fillna({"tile_id": ""}).sort_values(key).reset_index(drop=True)
    got_s = got.fillna({"tile_id": ""}).sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    for col in ["url", "entity", "method", "tile_id", "cell", "cell_coarse"]:
        assert (got_s[col].values == want_s[col].values).all(), col

    asn_a = base["assignments"].to_pandas().sort_values(["entity_cell", "tile_id"]).reset_index(drop=True)
    asn_b = fused["assignments"].to_pandas().sort_values(["entity_cell", "tile_id"]).reset_index(drop=True)
    assert asn_a.equals(asn_b)


def test_flagship_fused_invariant_raises(ray_session):
    """Fused path enforces the per-row text invariant inline: a page
    whose oracle text disagrees with the extraction must fail the run."""
    import pytest as _pytest
    import ray.data

    tiles = pg.make_tiles_table(8, seed=42)
    tbl = pg.make_pages_for_ids(np.arange(64, dtype=np.uint64), 42)
    texts = tbl["text"].to_pylist()
    texts[13] = texts[13] + " CORRUPTED"
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text", pa.array(texts))
    ds = ray.data.from_arrow(tbl)
    res = flagship.run_flagship_fused(ds, tiles, concurrency=1, batch_size=32)
    with _pytest.raises(Exception, match="invariant"):
        res["join_rows"].materialize()


def test_flagship_fused_emit_assignments(ray_session):
    """emit='assignments' (map-side combine inside the actor + driver
    reduce of the tiny partials) must reproduce assignments_stage
    exactly, and its tile_id='' groups must account for every unmatched
    join row."""
    import pyarrow.compute as pc

    tiles = pg.make_tiles_table(40, seed=42)

    base = flagship.run_flagship(
        pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=8),
        tiles, concurrency=1, batch_size=128,
    )
    want_asn = base["assignments"].to_pandas().sort_values(
        ["entity_cell", "tile_id"]).reset_index(drop=True)
    join = base["join_rows"].to_pandas()

    res = flagship.run_flagship_fused(
        pg.pages_dataset(N_PAGES, seed=42, override_num_blocks=8),
        tiles, concurrency=2, batch_size=96, emit="assignments",
    )
    tbl = flagship.reduce_assignment_partials(res["partials"])
    assert int(pc.sum(tbl["count"]).as_py()) == len(join)
    matched = tbl.filter(pc.not_equal(tbl["tile_id"], "")).to_pandas()
    got = matched.sort_values(["entity_cell", "tile_id"]).reset_index(drop=True)
    assert len(got) == len(want_asn)
    for col in ("entity_cell", "tile_id", "count"):
        assert (
            got[col].to_numpy().astype(want_asn[col].to_numpy().dtype)
            == want_asn[col].to_numpy()
        ).all(), col
