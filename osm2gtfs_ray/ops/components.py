"""Distributed connected components over an edge list.

Groups near-duplicate pairs (MinHash/SimHash/cosine output) into dedup
clusters: iterative min-label propagation with pointer jumping
(label-of-label each round → O(log diameter) rounds).

Two physical plans, same logical result (mirroring ops/joins.py):

* **Broadcast plan** — when the label table (one row per distinct
  node) fits a single object (≤ BROADCAST_LABEL_ROWS). The EDGE list —
  the big side — streams through one ``map_batches`` + groupby-min
  exchange per round; the label table rides the object store
  (``ray.put`` once per round) and the pointer-jump / convergence
  check are vectorized numpy on the driver copy. One distributed
  execution per round.

* **Shuffle plan** (``broadcast=False``) — labels too big for one
  object: both endpoint joins and the pointer jump run as
  hash-partitioned shuffle joins; convergence is a DISTRIBUTED count
  of changed labels (min-label propagation is monotone non-increasing,
  so "no label changed" == fixpoint). Nothing corpus-sized ever lands
  on the driver.

The label table is repartitioned to a bounded block count between
rounds — without the cap the per-round unions compound the block count
geometrically (groupby emits as many blocks as it consumes), which
multiplies scheduling overhead every round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Max, Min

# labels tables at or below this row count ride the object store whole;
# larger ones go through the shuffle join (both sides hash-partitioned)
BROADCAST_LABEL_ROWS = 2_000_000

# edge lists at or below this row count converge entirely on the driver
# (vectorized numpy min-label propagation — microseconds per round vs
# ~2 s of fixed Ray stage latency per distributed round). 500k edges ≈
# 8 MB; the same size-aware plan-selection rule as the broadcast/shuffle
# split above, one level down.
DRIVER_EDGE_ROWS = 500_000


def _cc_driver(edges_tbl: pa.Table) -> pa.Table:
    """In-memory plan: min-label propagation + pointer jumping over
    index-space labels (nodes sorted ascending, so min index == min
    node id — identical output to the distributed plans)."""
    a = edges_tbl["a"].to_numpy().astype(np.int64)
    b = edges_tbl["b"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
        )
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lbl.copy()
        np.minimum.at(new, ia, lbl[ib])
        np.minimum.at(new, ib, lbl[ia])
        new = new[new]  # pointer jump
        if np.array_equal(new, lbl):
            break
        lbl = new
    return pa.table(
        {"node": pa.array(nodes), "component": pa.array(nodes[lbl])}
    )


def _initial_labels(pairs_ds):
    def expand(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        node = np.concatenate([a, b, a, b])
        nbr = np.concatenate([b, a, a, b])
        return pa.table({"node": pa.array(node), "label": pa.array(nbr)})

    return (
        pairs_ds.map_batches(expand, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )


def connected_components(
    pairs_ds,
    max_rounds: int = 50,
    broadcast: bool | None = None,
    num_partitions: int | None = None,
):
    """pairs(a: int64, b: int64) → (node, component) with component =
    min node id of the component. Deterministic."""
    edges = pairs_ds.materialize()  # static; reused every round AND by
    # _initial_labels — deriving labels from the un-materialized input
    # would re-execute the caller's whole edge-producing DAG a 2nd time
    # the driver fast path only triggers when the caller expressed NO
    # plan preference: an explicit num_partitions (or broadcast=False)
    # must get the distributed plan it asked for
    if broadcast is None and num_partitions is None and edges.count() <= DRIVER_EDGE_ROWS:
        import ray.data

        from osm2gtfs_ray.ops.joins import _as_arrow

        return ray.data.from_arrow(_cc_driver(_as_arrow(edges)))
    if num_partitions is None:
        num_partitions = max(8, min(256, edges.num_blocks()))
    labels = (
        _initial_labels(edges).repartition(num_partitions).materialize()
    )
    if broadcast is None:
        broadcast = labels.count() <= BROADCAST_LABEL_ROWS
    if broadcast:
        return _cc_broadcast(edges, labels, max_rounds)
    return _cc_shuffle(edges, labels, max_rounds, num_partitions)


def _cc_broadcast(edges, labels_ds, max_rounds: int):
    """Label table rides the object store; edges stream once per round."""
    import ray
    import ray.data

    from osm2gtfs_ray.ops.joins import _as_arrow

    tbl = _as_arrow(labels_ds).combine_chunks()
    node = tbl["node"].to_numpy().astype(np.int64)
    order = np.argsort(node, kind="stable")
    node = node[order]
    lbl = tbl["label"].to_numpy().astype(np.int64)[order]

    for rnd in range(max_rounds):
        # pointer jump on the driver copy: label(label(v)). Every label
        # is itself a node id present in the table, so the lookup is a
        # searchsorted into the sorted node array.
        pos = np.searchsorted(node, lbl)
        lbl = np.minimum(lbl, lbl[pos])

        lab_ref = ray.put(pa.table({"node": pa.array(node), "label": pa.array(lbl)}))

        def nbr_min(t: pa.Table, _ref=lab_ref) -> pa.Table:
            """Edge batch → per-node local min of neighbor labels
            (map-side combine before the small groupby exchange)."""
            lt = ray.get(_ref)
            n = lt["node"].to_numpy()
            lb = lt["label"].to_numpy()
            a = t["a"].to_numpy().astype(np.int64)
            b = t["b"].to_numpy().astype(np.int64)
            la = lb[np.searchsorted(n, a)]
            lb_b = lb[np.searchsorted(n, b)]
            out_node = np.concatenate([b, a])
            out_lbl = np.concatenate([la, lb_b])
            g = (
                pa.table({"node": pa.array(out_node), "label": pa.array(out_lbl)})
                .group_by("node")
                .aggregate([("label", "min")])
            )
            return g.rename_columns(["node", "label"])

        # per-batch partials merge DRIVER-side (np.minimum.at) — in this
        # plan the label table is driver-held by definition, so a
        # distributed groupby here would only add a shuffle's fixed
        # latency per round. One map-only execution per round.
        new_lbl = lbl.copy()
        for t in edges.map_batches(nbr_min, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            if t.num_rows == 0:
                continue
            an = t["node"].to_numpy().astype(np.int64)
            al = t["label"].to_numpy().astype(np.int64)
            pos = np.searchsorted(node, an)
            np.minimum.at(new_lbl, pos, al)
        if np.array_equal(new_lbl, lbl):
            import ray.data

            return ray.data.from_arrow(
                pa.table({"node": pa.array(node), "component": pa.array(lbl)})
            )
        lbl = new_lbl
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def _cc_shuffle(edges, labels, max_rounds: int, num_partitions: int):
    """Fully distributed plan: ONE shuffle join per round + distributed
    convergence. Message formulation: expanded edges (src, dst) carry
    label(src) to dst; the pointer jump rides the same join as extra
    (src=label(v), dst=v) edges, so concurrent join operators never
    compete for actors (multiple simultaneous Dataset.joins starve each
    other's aggregator pools in the streaming executor)."""
    from osm2gtfs_ray.ops.joins import hash_join

    def expand(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    expanded = edges.map_batches(expand, batch_format="pyarrow").materialize()

    for rnd in range(max_rounds):
        jump_edges = labels.map_batches(
            lambda t: pa.table({"src": t["label"], "dst": t["node"]}),
            batch_format="pyarrow",
        )
        msgs = hash_join(
            expanded.union(jump_edges),
            labels.rename_columns(["src", "label"]),
            keys="src",
            num_partitions=num_partitions,
        )
        nbr = msgs.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )

        # self rows carry the previous label in `old` so convergence is
        # checkable from the aggregate itself (no second join)
        def with_old(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "label": t["label"], "old": t["label"]})

        def no_old(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "label": t["label"],
                    "old": pa.nulls(t.num_rows, pa.int64()),
                }
            )

        merged = (
            nbr.map_batches(no_old, batch_format="pyarrow")
            .union(labels.map_batches(with_old, batch_format="pyarrow"))
            .repartition(num_partitions)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"), Max("old", alias_name="old"))
            .materialize()
        )

        def changed_partial(t: pa.Table) -> pa.Table:
            neq = pc.sum(pc.cast(pc.not_equal(t["label"], t["old"]), pa.int64())).as_py()
            return pa.table({"changed": pa.array([int(neq or 0)])})

        n_changed = int(
            merged.map_batches(changed_partial, batch_format="pyarrow").sum("changed") or 0
        )
        labels = merged.select_columns(["node", "label"])
        if n_changed == 0:
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "component"]),
                batch_format="pyarrow",
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )
