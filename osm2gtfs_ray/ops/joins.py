"""Join operator library, Ray-Data-first.

Physical strategies (SURVEY.md §2.4, ray_guide "Joins and lookups"):

* ``broadcast_join`` — the default for star-schema / dimension joins
  (the reference's J7 schedule join, J9/J11 dict lookups): the small
  side is ``ray.put`` ONCE; every map task joins its Arrow batch
  against it with pyarrow's acero hash join. Zero shuffle; scales
  linearly with probe blocks.
* ``broadcast_semi`` / ``broadcast_anti`` — key-set membership filters
  (the reference's unused-stop/route removal A6/A7,
  /root/reference/osm2gtfs/creators/stops_creator.py:45-61 and
  routes_creator.py:42-58): broadcast the distinct key set, filter with
  ``pc.is_in`` inside map_batches.
* ``hash_join`` — both sides large: delegates to ``Dataset.join``
  (hash-partitioned shuffle join, available in this Ray version);
  callers choose the partition count.

All helpers keep probe-side streaming; only the small side
materializes (bounded by the caller).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_arrow(small) -> pa.Table:
    import pandas as pd
    import ray.data

    if isinstance(small, pa.Table):
        return small
    if isinstance(small, pd.DataFrame):
        return pa.Table.from_pandas(small, preserve_index=False)
    if isinstance(small, ray.data.Dataset):
        # caller asserts this side is small. iter_batches, not
        # to_arrow_refs: the latter re-executes the upstream plan with
        # limit=1 just to fetch the schema (see
        # flagship.reduce_assignment_partials).
        tables = list(small.iter_batches(batch_size=None, batch_format="pyarrow"))
        tables = [t for t in tables if t.num_rows > 0] or tables[:1]
        if not tables:  # fully-empty dataset: schema via the (cached) plan
            return pa.Table.from_pylist([], schema=small.schema().base_schema)
        return pa.concat_tables(tables, promote_options="default")
    raise TypeError(type(small))


def broadcast_join(
    big_ds,
    small,
    keys: list[str] | str,
    join_type: str = "inner",
    right_keys: list[str] | str | None = None,
    right_suffix: str = "_r",
):
    """big ⋈ small without a shuffle: small side in the object store
    once, acero hash join per Arrow batch."""
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = (
        keys if right_keys is None
        else [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    small_ref = ray.put(_as_arrow(small))

    def _nested(f: pa.Field) -> bool:
        return pa.types.is_nested(f.type)

    def join_batch(batch: pa.Table) -> pa.Table:
        """Acero hash join per batch — a STATELESS task: the broadcast
        side is a ray.get of the shared ObjectRef (zero-copy plasma
        read per task, no actor startup cost). Acero rejects nested
        (list/map/struct) payload columns, so nested columns are
        detached before the join and re-attached via row-ordinal
        takes."""
        small_full = ray.get(small_ref)
        r_nested = [
            f.name for f in small_full.schema if _nested(f) and f.name not in right_keys
        ]
        small = small_full.drop_columns(r_nested)
        if r_nested:
            small = small.append_column(
                "__ridx__", pa.array(range(small_full.num_rows), pa.int64())
            )
        l_nested = [f.name for f in batch.schema if _nested(f) and f.name not in keys]
        left = batch.drop_columns(l_nested)
        if l_nested:
            left = left.append_column(
                "__lidx__", pa.array(range(batch.num_rows), pa.int64())
            )
        out = left.join(
            small,
            keys=keys,
            right_keys=right_keys,
            join_type=join_type,
            right_suffix=right_suffix,
        )
        if l_nested:
            lidx = out["__lidx__"]
            for name in l_nested:
                out = out.append_column(name, batch[name].take(lidx))
            out = out.drop_columns(["__lidx__"])
        if r_nested:
            ridx = out["__ridx__"]
            for name in r_nested:
                col_name = name if name not in out.column_names else name + right_suffix
                out = out.append_column(col_name, small_full[name].take(ridx))
            out = out.drop_columns(["__ridx__"])
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow")


def _key_set_ref(small, key: str):
    import ray

    tbl = _as_arrow(small)
    return ray.put(pc.unique(tbl[key]))


def broadcast_semi(big_ds, small, key: str, right_key: str | None = None):
    """Rows of big whose key appears in small (semi join, no shuffle)."""
    import ray

    ref = _key_set_ref(small, right_key or key)

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key], value_set=ray.get(ref)))

    return big_ds.map_batches(fn, batch_format="pyarrow")


def broadcast_anti(big_ds, small, key: str, right_key: str | None = None):
    """Rows of big whose key does NOT appear in small (anti join —
    the A6/A7 unused-stop/route semantics)."""
    import ray

    ref = _key_set_ref(small, right_key or key)

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch[key], value_set=ray.get(ref))))

    return big_ds.map_batches(fn, batch_format="pyarrow")


def hash_join(left_ds, right_ds, keys, join_type: str = "inner", num_partitions: int = 16):
    """Large ⋈ large: Ray Data's hash-partitioned shuffle join."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return left_ds.join(
        right_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(keys),
    )


def compact_for_join(ds, num_blocks: int = 16):
    """Workaround for a Ray 2.49 hash-join defect: the shuffle
    broadcasts each input's schema to ALL aggregators only with that
    input's FIRST block (``send_empty_blocks`` in
    ray/data/_internal/execution/operators/hash_shuffle.py), but
    ``_shuffle_block`` early-returns on zero-row blocks BEFORE the
    broadcast — so an input whose first block is empty (a filtered
    frontier, a sparse groupby output) leaves schema-less empty
    partitions and ``Dataset.join`` dies with ArrowInvalid
    ("No match ... for key field reference" at finalize).

    ``repartition(k)`` fills blocks front-first (k blocks of
    ceil(n/k) then the remainder empty), so the first block is
    non-empty whenever the dataset is, at the cost of one extra pass
    over ``ds`` — call it on SMALL join inputs (frontiers, per-round
    deltas) that may produce empty leading blocks, never on the big
    side (whose first block is organically non-empty)."""
    return ds.repartition(num_blocks)


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join: the large×large scale path when the
# "small" side's key SET no longer fits a broadcast but its BLOOM BITS
# do (8 bits/key vs ≥8 bytes/key — one order of magnitude more keys
# per GB of broadcast). The filter is built distributed — per-batch
# fixed-size bit arrays, OR-merged (associative/commutative/idempotent,
# same mergeable shape as ops/sketch.py's HLL registers) — broadcast
# once via ray.put, and applied map-side so only bloom-passing rows
# (true matches + ~fp_rate false positives) enter the exact shuffle
# semi join. Correctness always comes from the exact join; the bloom
# only shrinks the shuffle.
# ---------------------------------------------------------------------------

_BLOOM_HASHES = 4


def _bloom_positions(keys: np.ndarray, m_bits: int):
    """k=4 derived positions per key via double hashing of mix64."""
    from osm2gtfs_ray.sources.pages import mix64

    h1 = mix64(keys.astype(np.uint64))
    h2 = mix64(h1) | np.uint64(1)
    return [
        ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        for i in range(_BLOOM_HASHES)
    ]


def bloom_bits(ds, key: str, m_bits: int = 1 << 20) -> np.ndarray:
    """Distributed bloom build: per-batch m_bits/8-byte partials,
    OR-folded on the driver (KB–MB sized regardless of row count)."""

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        # null keys never match a semi join — drop them BEFORE the cast
        # (casting nulls yields float64 NaN, and NaN→uint64 is UB that
        # would set arbitrary bloom positions)
        k = pc.cast(
            pc.drop_null(t[key]), pa.int64()
        ).to_numpy(zero_copy_only=False)
        for pos in _bloom_positions(k, m_bits):
            np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for raw in b["bits"].to_pylist():
            out |= np.frombuffer(raw, dtype=np.uint8)
    return out


def bloom_semi(big_ds, small_ds, key: str, right_key: str | None = None,
               m_bits: int = 1 << 20, num_partitions: int = 16):
    """Exact semi join with a bloom prefilter: big rows failing the
    bloom are dropped map-side (no network); survivors go through the
    exact hash semi join against the small side's distinct keys."""
    import ray

    rk = right_key or key
    bits = bloom_bits(small_ds, rk, m_bits)
    ref = ray.put(bits)

    def prefilter(t: pa.Table) -> pa.Table:
        bb = ray.get(ref)
        # null-keyed rows can never semi-match: mask them out directly
        # (and fill before the cast so no NaN→uint64 UB in the hash)
        valid = pc.is_valid(t[key]).to_numpy(zero_copy_only=False)
        k = pc.cast(
            pc.fill_null(t[key], 0), pa.int64()
        ).to_numpy(zero_copy_only=False)
        mask = valid.copy()
        for pos in _bloom_positions(k, m_bits):
            mask &= (bb[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        return t.filter(pa.array(mask))

    passed = big_ds.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )

    def distinct_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {rk: pc.unique(pc.cast(pc.drop_null(t[rk]), pa.int64()))}
        )

    keys_ds = small_ds.map_batches(
        distinct_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    if rk != key:
        keys_ds = keys_ds.map_batches(
            lambda t: t.rename_columns([key]), batch_format="pyarrow"
        )
    joined = hash_join(
        passed,
        keys_ds,
        key,
        join_type="left_semi",
        num_partitions=num_partitions,
    )
    return joined
