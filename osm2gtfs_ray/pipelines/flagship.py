"""Flagship pipeline: pages → extract → geocode → spatial join → assignments.

The north_star pipeline over the `input_hint` pages table:

    pages ─ map_batches(TextExtractor, actor pool)      # html → text + geo entities
          ─ map_batches(explode_entities)               # 1 row per entity
          ─ map_batches(assign_cells)                   # H3-res-9-equivalent cell keys
          ─ map_batches(SpatialJoiner, actor pool)      # PIP + kNN vs broadcast tiles
          ─ per-batch partial count → groupby((cell, tile)).sum   # tile assignments

Streaming end to end: nothing materializes the full corpus; the only
shuffle is the final small aggregate over per-batch partials. The html
column is dropped inside the extractor (projection pushdown for the
wide binary column, SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.stages.extract import TextExtractor, explode_entities
from osm2gtfs_ray.stages.geocode import COARSE_LEVEL, assign_cells
from osm2gtfs_ray.stages.spatial_join import SpatialJoiner


def _pool(concurrency):
    """Actor-pool sizing: always autoscaling (1, n) so the pool cannot
    reserve every CPU and starve the stateless read/shuffle tasks (two
    fixed pools of ncpu/2 each deadlock the streaming executor)."""
    return (1, concurrency) if isinstance(concurrency, int) else concurrency


def extract_stage(pages_ds, concurrency=4, batch_size=1024):
    return pages_ds.map_batches(
        TextExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(concurrency),
        zero_copy_batch=True,
    )


def invariant_mismatches(extracted_ds) -> int:
    """Count rows violating the per-row invariant (extracted text must
    byte-equal the oracle `text` column). Distributed count, no
    materialization."""

    def check(batch: pa.Table) -> pa.Table:
        bad = pc.invert(pc.equal(batch["text_extracted"], batch["text"]))
        return pa.table({"bad": pa.array([int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)])})

    parts = extracted_ds.map_batches(check, batch_format="pyarrow")
    return int(parts.sum("bad") or 0)


def entities_stage(extracted_ds):
    ds = extracted_ds.select_columns(["url", "entities"])
    ds = ds.map_batches(explode_entities, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(assign_cells, batch_format="pyarrow", zero_copy_batch=True)


def join_stage(entities_ds, tiles: pa.Table, concurrency=4, batch_size=4096, knn_radius_m=None):
    import ray

    tiles_ref = ray.put(tiles)
    kwargs = {"tiles_ref": tiles_ref}
    if knn_radius_m is not None:
        kwargs["knn_radius_m"] = knn_radius_m
    return entities_ds.map_batches(
        SpatialJoiner,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(concurrency),
        fn_constructor_kwargs=kwargs,
        zero_copy_batch=True,
    )


def assignments_stage(join_rows_ds, keep_unmatched: bool = False):
    """tile_assignments(entity_cell, tile_id, count): partial count per
    batch inside map_batches, then a tiny groupby over partials — the
    pre-aggregated shuffle pattern (SURVEY.md §7.3).

    With ``keep_unmatched=True`` the null-tile (method='none') rows are
    kept as tile_id='' groups, so the single aggregate also carries the
    TOTAL join-row count — the fully-streaming consumption shape (no
    join-row materialization anywhere; bench uses this)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["cell_coarse", "tile_id"]).rename_columns(
            ["entity_cell", "tile_id"]
        )
        if keep_unmatched:
            t = t.set_column(
                1, "tile_id", pc.fill_null(t["tile_id"], "")
            )
        else:
            t = t.filter(pc.is_valid(t["tile_id"]))
        g = t.group_by(["entity_cell", "tile_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["entity_cell", "tile_id", "partial"])

    parts = join_rows_ds.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby(["entity_cell", "tile_id"]).sum("partial")
    return out.map_batches(
        lambda b: b.rename_columns(["entity_cell", "tile_id", "count"]),
        batch_format="pyarrow",
    )


def run_flagship(
    pages_ds,
    tiles: pa.Table,
    concurrency: int = 4,
    batch_size: int = 1024,
    join_concurrency: int | None = None,
):
    """Full pipeline; returns dict of (lazy) Datasets.

    Pool sizing: the extractor does ~4× the per-row work of the join
    stage (BASELINE.md per-stage profile), so the join pool defaults to
    a quarter of the extract pool — sizing both equal starves the
    extractor and idles join actors."""
    if join_concurrency is None:
        join_concurrency = max(2, concurrency // 4)
    extracted = extract_stage(pages_ds, concurrency=concurrency, batch_size=batch_size)
    entities = entities_stage(extracted)
    join_rows = join_stage(entities, tiles, concurrency=join_concurrency)
    assignments = assignments_stage(join_rows)
    return {"extracted": extracted, "entities": entities, "join_rows": join_rows,
            "assignments": assignments}


class FusedExtractJoin:
    """Single actor-pool stage fusing extract → explode → geocode →
    spatial join per batch.

    Rationale (BASELINE.md plasma note): the two-pool layout ships the
    full extractor output — including the wide text columns — through
    the object store twice (extract write + entities read), and on a
    single node the shared plasma store becomes the bottleneck past ~8
    actors. Fusing the four per-batch transforms into ONE actor keeps
    the wide columns inside the actor heap; only narrow join-row
    batches ever hit the store. On a real multi-node cluster the same
    fusion removes a cross-node exchange of corpus-sized text.

    The per-row invariant (byte-identical extracted text per url,
    BASELINE.json input_hint) is enforced INLINE when the oracle
    ``text`` column is present: any mismatch raises, so a fused run
    that completes has verified every page.
    """

    def __init__(self, tiles_ref=None, tiles=None, knn_radius_m=None,
                 verify_text: bool = True, emit: str = "join_rows"):
        self.extractor = TextExtractor()
        kwargs = {}
        if knn_radius_m is not None:
            kwargs["knn_radius_m"] = knn_radius_m
        self.joiner = SpatialJoiner(tiles_ref=tiles_ref, tiles=tiles, **kwargs)
        self.verify_text = verify_text
        if emit not in ("join_rows", "assignments"):
            raise ValueError(f"emit must be join_rows|assignments, got {emit!r}")
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        ext = self.extractor(batch)
        if self.verify_text and "text" in ext.column_names:
            bad = pc.sum(
                pc.cast(pc.invert(pc.equal(ext["text_extracted"], ext["text"])), pa.int64())
            ).as_py()
            if bad:
                raise ValueError(
                    f"per-row text invariant violated for {bad} rows in batch"
                )
        ents = explode_entities(ext.select(["url", "entities"]))
        joined = self.joiner(assign_cells(ents))
        if self.emit == "join_rows":
            return joined
        # emit='assignments': map-side combine — per-batch partial group
        # counts ((cell, tile) plus tile_id='' for unmatched rows, so the
        # partials also carry the total join-row count); join rows never
        # leave the actor at all. The tiny partials are reduced by a
        # small groupby (or driver-side concat when the group space is
        # known-small, see reduce_assignment_partials).
        t = joined.select(["cell_coarse", "tile_id"]).rename_columns(
            ["entity_cell", "tile_id"]
        )
        t = t.set_column(1, "tile_id", pc.fill_null(t["tile_id"], ""))
        g = t.group_by(["entity_cell", "tile_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["entity_cell", "tile_id", "partial"])


def run_flagship_fused(
    pages_ds,
    tiles: pa.Table,
    concurrency: int = 8,
    batch_size: int = 1024,
    knn_radius_m=None,
    verify_text: bool = True,
    emit: str = "join_rows",
):
    """Flagship via the fused single-pool stage. Same join rows and
    assignments as run_flagship (tests assert equality); one actor pool
    sized to the whole node since all per-row work is co-located.

    emit='assignments' returns {'partials': Dataset} of per-batch
    partial counts instead (map-side combine inside the actor; see
    reduce_assignment_partials)."""
    import ray

    tiles_ref = ray.put(tiles)
    kwargs = {"tiles_ref": tiles_ref, "verify_text": verify_text, "emit": emit}
    if knn_radius_m is not None:
        kwargs["knn_radius_m"] = knn_radius_m
    out = pages_ds.map_batches(
        FusedExtractJoin,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(concurrency),
        fn_constructor_kwargs=kwargs,
        zero_copy_batch=True,
    )
    if emit == "assignments":
        return {"partials": out}
    return {"join_rows": out, "assignments": assignments_stage(out)}


def reduce_assignment_partials(partials_ds) -> pa.Table:
    """Final reduce of the per-batch partial counts: the partial table
    is tiny (≤ blocks × |cells×tiles| rows), so a driver-side Arrow
    group_by beats a distributed sort-shuffle by seconds of fixed
    latency. Returns (entity_cell, tile_id, count) with tile_id='' rows
    carrying the unmatched join-row count; at a group cardinality where
    this wouldn't fit one process, use assignments_stage instead.

    Consumes via iter_batches, NOT to_arrow_refs: to_arrow_refs calls
    Dataset.schema(fetch_if_missing=True) after the streaming pass,
    which for a non-materialized pipeline launches a second limit-1
    execution of the whole upstream DAG (measured ~5 s — a fixed cost
    that lands on every leg of the scaling bench)."""
    tables = list(partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return pa.table(
            {"entity_cell": pa.array([], pa.uint64()),
             "tile_id": pa.array([], pa.string()),
             "count": pa.array([], pa.int64())}
        )
    t = pa.concat_tables([t for t in tables if t.num_rows] or tables)
    g = t.group_by(["entity_cell", "tile_id"]).aggregate([("partial", "sum")])
    return g.rename_columns(["entity_cell", "tile_id", "count"])


def flagship_to_checkpoint(
    pages_ds,
    tiles: pa.Table,
    out_dir: str,
    concurrency: int = 4,
    batch_size: int = 1024,
    part_level: int = 4,
    resume: bool = True,
    entity_ckpt_dir: str | None = None,
    join_plan: str = "auto",
    shuffle_tile_threshold: int = 2_000_000,
):
    """Run the flagship join and write join rows as RESUMABLE
    partitioned Parquet: one partition per level-`part_level` cell
    range (the same key hierarchy as the geocode stage), each with a
    `_lineage.json` record; a rerun skips finished partitions
    (north_rule checkpoint/resume; see state/lineage.py).

    ``join_plan``: 'broadcast' (actor-pool TileIndex — the default
    physical plan), 'shuffle' (cell-keyed partitioned join for tile
    sets too big to broadcast, stages/spatial_join.spatial_join_shuffle
    — identical logical output incl. kNN fallback), or 'auto' (shuffle
    when the tile table exceeds ``shuffle_tile_threshold`` rows)."""
    from osm2gtfs_ray.geo.cells import parent_cell
    from osm2gtfs_ray.stages.geocode import COARSE_LEVEL
    from osm2gtfs_ray.state.lineage import done_partitions, write_partitioned

    def add_part(t: pa.Table) -> pa.Table:
        part = parent_cell(
            t["cell_coarse"].to_numpy(zero_copy_only=False), COARSE_LEVEL - part_level
        )
        return t.append_column("part", pa.array(part, pa.uint64()))

    def build_entities():
        extracted = extract_stage(pages_ds, concurrency=concurrency, batch_size=batch_size)
        return entities_stage(extracted).map_batches(add_part, batch_format="pyarrow")

    if entity_ckpt_dir:
        # per-stage checkpoint: a resumed run reads the entity table
        # instead of re-extracting every page (state/lineage.py)
        from osm2gtfs_ray.state.lineage import checkpoint_stage

        entities = checkpoint_stage(build_entities, entity_ckpt_dir, refresh=not resume)
    else:
        entities = build_entities()

    # resume pruning BEFORE the join: entities whose partition already
    # has a lineage record never reach the spatial join (the rerun =
    # anti-join-done-partitions plan, SURVEY.md §4). Extraction still
    # runs (entities must be recomputed to know their keys); at real
    # scale the entity table itself would be a checkpointed stage.
    done = done_partitions(out_dir) if resume else set()
    if done:
        done_arr = pa.array(np.array(sorted(int(d) for d in done), dtype=np.uint64))

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(t["part"], value_set=done_arr))
            )

        entities = entities.map_batches(prune, batch_format="pyarrow")

    if join_plan not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"join_plan must be auto|broadcast|shuffle, got {join_plan!r}")
    if join_plan == "auto":
        join_plan = "shuffle" if tiles.num_rows > shuffle_tile_threshold else "broadcast"
    if join_plan == "shuffle":
        from osm2gtfs_ray.stages.spatial_join import spatial_join_shuffle

        join_rows = spatial_join_shuffle(entities, tiles)
    else:
        join_rows = join_stage(entities, tiles, concurrency=concurrency)
    manifest = write_partitioned(join_rows, out_dir, "part", resume=resume)
    return manifest


def pages_from_documents(sf_dir: str):
    """Deterministic `input_hint`-shaped pages table derived from the
    driver's documents table: each doc's text is wrapped in synthetic
    html (with geo-entity markers keyed off doc_id) such that the
    extractor inverts it byte-identically. No external data."""
    from osm2gtfs_ray.sources.tables import read_table
    from osm2gtfs_ray.sources import pages as pg

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    seed = 42

    def render(batch: pa.Table) -> pa.Table:
        """Entity metadata (count, names, positions, highlight index)
        is derived VECTORIZED across the batch with the same splitmix
        streams as the scalar oracle (pages._page_text_and_entities);
        only the final string assembly is per row."""
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()

        n_ent = pg._uint(ids, 3, seed, 4)
        e_off = np.concatenate([[0], np.cumsum(n_ent)])
        eidx = np.repeat(ids, n_ent) * np.uint64(8) + pg._flat_ranges(n_ent).astype(
            np.uint64
        )
        name_ids = pg._uint(eidx, 4, seed, len(pg.ENTITY_NAMES))
        elat, elon = pg._entity_latlon(eidx, seed)
        elat_r, elon_r = np.round(elat, 6), np.round(elon, 6)
        ent_names = np.array(pg.ENTITY_NAMES, dtype=object)[name_ids]
        k_hash = pg._uhash(ids, 5, seed)

        urls, ts, htmls = [], [], []
        for n, i in enumerate(ids):
            i = int(i)
            words = texts[n].split(" ")
            ents = [
                (ent_names[e], float(elat_r[e]), float(elon_r[e]))
                for e in range(e_off[n], e_off[n + 1])
            ]
            esc = [pg._escape(w) for w in words]
            k = int(k_hash[n] % np.uint64(max(1, len(words))))
            urls.append(f"https://docs.example/{i:010d}")
            ts.append(pg.BASE_TS + np.timedelta64(i, "s"))
            htmls.append(pg._render_html_fast(i, esc, ents, seed, k))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(ts, dtype="datetime64[us]")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return docs.map_batches(render, batch_format="pyarrow")


def flagship_from_documents(sf_dir: str, concurrency: int = 2, batch_size: int = 1024):
    """Flagship over documents-derived pages + the deterministic tile
    set — the driver-facing entry/queries surface."""
    from osm2gtfs_ray.sources import pages as pg

    tiles = pg.make_tiles_table(64, seed=42)
    pages = pages_from_documents(sf_dir)
    return run_flagship(pages, tiles, concurrency=concurrency, batch_size=batch_size)
