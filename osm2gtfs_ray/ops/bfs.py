"""Distributed multi-source BFS over an edge list — hop distance.

The frontier-expansion operator class: K rounds of reachability from a
seed set, labeling every reached node with its hop distance (the
minimum path length from any seed). Web-corpus use: crawl-depth
assignment from a seed list, spam-neighborhood marking, and
link-distance features for quality models.

All state is integer (hop labels), so the result is bit-exact
regardless of partitioning or visit order — a node's label is the
ROUND it is first reached, and round boundaries are global barriers in
both plans.

Two physical plans, same result (the ops/pagerank.py pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_DIST_ROWS): the int64
  distance vector rides the object store via one ``ray.put`` per
  round; edges — the big side — stream through ``map_batches`` which
  emits each block's UNIQUE newly-reached dsts, a ``groupby`` dedupes
  them globally, and the driver stamps the round. Per-round driver
  traffic is O(newly reached nodes), never O(edges).

* **Shuffle plan** (``broadcast=False``): the distance table is a
  Dataset. Each round: frontier (dist == round-1) ⋈ edges on src →
  distinct dst → LEFT OUTER onto the distance table, filling nulls
  (i.e. not-yet-reached nodes in the frontier's neighborhood) with
  the round number. On a real cluster, hash-partitioning edges by src
  once would amortize the join exchange across all K rounds.

Reference semantics analogue: osm2gtfs's itinerary walk
(`osm2gtfs/creators/routes_creator.py`) follows member chains
hop-by-hop from route masters; BFS is the crawl-scale generalization
(frontier expansion over the page link graph).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_DIST_ROWS = 2_000_000  # same bound as ops/pagerank.py ranks
# below this node count the per-round frontier dedupe happens on the
# driver (np.unique over collected block-local-unique dsts; stamping
# is idempotent so duplicates are harmless) instead of paying a Ray
# groupby exchange per round (the ops/pagerank.py DRIVER_MERGE rule)
DRIVER_MERGE_NODES = 200_000


def _collect_arrow(ds) -> pa.Table:
    import ray

    refs = ds.to_arrow_refs()
    tables = [ray.get(r) for r in refs]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table({"node": pa.array([], pa.int64())})
    return pa.concat_tables(tables).combine_chunks()


def bfs_broadcast(edges, n_nodes: int, seeds: np.ndarray, iters: int = 4):
    """Broadcast plan: driver-held int64 distance vector (bounded by
    BROADCAST_DIST_ROWS), one distributed pass over edges per round."""
    import ray
    import ray.data

    dist = np.full(n_nodes, -1, dtype=np.int64)
    dist[np.asarray(seeds, dtype=np.int64)] = 0
    edges = edges.materialize()  # read once, iterate K times
    if n_nodes <= DRIVER_MERGE_NODES and edges.num_blocks() > 8:
        # compact tiny read blocks once; per-round dispatch dominates
        edges = edges.repartition(8).materialize()

    for rnd in range(1, iters + 1):
        ref = ray.put(dist)

        def frontier_dsts(t: pa.Table, _ref=ref, _r=rnd) -> pa.Table:
            d = ray.get(_ref)  # zero-copy plasma view
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            new = dst[(d[src] == _r - 1) & (d[dst] == -1)]
            return pa.table({"node": np.unique(new)})

        parts = edges.map_batches(frontier_dsts, batch_format="pyarrow")
        if n_nodes <= DRIVER_MERGE_NODES:
            nodes = np.unique(
                _collect_arrow(parts)["node"].to_numpy(zero_copy_only=False)
            )
        else:
            new_nodes = _collect_arrow(
                parts.groupby("node").count().select_columns(["node"])
            )
            nodes = new_nodes["node"].to_numpy(zero_copy_only=False)
        if len(nodes) == 0:
            break  # frontier exhausted — later rounds are no-ops
        dist[nodes] = rnd

    reached = np.flatnonzero(dist >= 0).astype(np.int64)
    return ray.data.from_arrow(
        pa.table({"doc_id": reached, "hops": dist[reached]})
    )


def bfs_shuffle(edges, n_nodes: int, seeds: np.ndarray, iters: int = 4,
                num_partitions: int = 16):
    """Shuffle plan: the distance table is a Dataset; per round one
    src-keyed join and one dst-keyed LEFT OUTER merge."""
    import ray.data

    seeds = np.asarray(seeds, dtype=np.int64)
    dist = ray.data.from_arrow(
        pa.table(
            {
                "node": np.arange(n_nodes, dtype=np.int64),
                "hops": np.where(
                    np.isin(np.arange(n_nodes, dtype=np.int64), seeds), 0, -1
                ).astype(np.int64),
            }
        )
    ).materialize()
    edges = edges.materialize()

    for rnd in range(1, iters + 1):
        def front_batch(t: pa.Table, _r=rnd) -> pa.Table:
            f = t.filter(pc.equal(t["hops"], _r - 1))
            return pa.table({"src": pc.cast(f["node"], pa.int64())})

        front = dist.map_batches(front_batch, batch_format="pyarrow")
        touched = edges.join(
            front, join_type="inner", num_partitions=num_partitions, on=("src",)
        )

        def uniq(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": np.unique(
                        t["dst"].to_numpy(zero_copy_only=False)
                    )
                }
            )

        new = (
            touched.map_batches(uniq, batch_format="pyarrow")
            .groupby("node")
            .count()
            .map_batches(
                lambda t: pa.table(
                    {"node": pc.cast(t["node"], pa.int64()),
                     "reach": np.ones(len(t), dtype=np.int64)}
                ),
                batch_format="pyarrow",
            )
        )
        merged = dist.join(
            new, join_type="left_outer", num_partitions=num_partitions,
            on=("node",),
        )

        def update(t: pa.Table, _r=rnd) -> pa.Table:
            hops = t["hops"].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = pc.fill_null(pc.cast(t["reach"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
            hops = np.where((hops < 0) & (hit > 0), _r, hops)
            return pa.table(
                {"node": pc.cast(t["node"], pa.int64()), "hops": hops}
            )

        dist = merged.map_batches(update, batch_format="pyarrow").materialize()

    def emit(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["hops"], 0))
        return pa.table(
            {"doc_id": pc.cast(f["node"], pa.int64()),
             "hops": pc.cast(f["hops"], pa.int64())}
        )

    return dist.map_batches(emit, batch_format="pyarrow")


def bfs_hops(edges, n_nodes: int, seeds: np.ndarray, iters: int = 4,
             broadcast: bool | None = None, num_partitions: int = 16):
    """Size-aware plan selection (the ops/pagerank.py rule)."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_DIST_ROWS
    if broadcast:
        return bfs_broadcast(edges, n_nodes, seeds, iters=iters)
    return bfs_shuffle(edges, n_nodes, seeds, iters=iters,
                       num_partitions=num_partitions)


def reach_shuffle(edges, n_nodes: int, seeds, max_rounds: int = 200,
                  num_partitions: int = 16):
    """Full-reachability FIXPOINT with a Dataset frontier: the set of
    nodes reachable from ``seeds`` (seeds included), as a Dataset with
    one int64 column ``node``. No driver-held n-sized state: seeds
    arrive as a Dataset (column ``node``), the distance table is a
    Dataset seeded by a hash join, and each round is one src-keyed
    join + one node-keyed LEFT OUTER merge (ops/bfs.bfs_shuffle's
    round shape). Early-stops when a round stamps nothing new; RAISES
    past ``max_rounds`` (the ops/kcore.py budget discipline — rounds
    are data-dependent, divergence must be loud).

    The per-round early-stop scalar (count of newly stamped nodes) is
    an aggregate over the materialized distance table — a driver
    scalar, not driver state."""
    import ray.data

    from osm2gtfs_ray.ops.joins import compact_for_join

    if not isinstance(seeds, ray.data.Dataset):
        seeds = ray.data.from_arrow(
            pa.table({"node": np.asarray(seeds, dtype=np.int64)})
        )

    seed_keyed = compact_for_join(
        seeds.map_batches(
            lambda t: pa.table(
                {"node": pc.cast(t["node"], pa.int64()),
                 "is_seed": np.ones(len(t), dtype=np.int64)}
            ),
            batch_format="pyarrow",
        ),
        num_partitions,
    )

    def init(t: pa.Table) -> pa.Table:
        hit = pc.fill_null(pc.cast(t["is_seed"], pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "hops": np.where(hit > 0, 0, -1).astype(np.int64),
            }
        )

    nodes = ray.data.range(n_nodes).map_batches(
        lambda t: pa.table({"node": pc.cast(t["id"], pa.int64())}),
        batch_format="pyarrow",
    )
    dist = nodes.join(
        seed_keyed, join_type="left_outer", num_partitions=num_partitions,
        on=("node",),
    ).map_batches(init, batch_format="pyarrow").materialize()
    edges = edges.materialize()

    for rnd in range(1, max_rounds + 1):
        def front_batch(t: pa.Table, _r=rnd) -> pa.Table:
            f = t.filter(pc.equal(t["hops"], _r - 1))
            return pa.table({"src": pc.cast(f["node"], pa.int64())})

        front = compact_for_join(
            dist.map_batches(front_batch, batch_format="pyarrow"),
            num_partitions,
        ).materialize()
        if front.count() == 0:
            break  # empty seed set (the loop invariant covers later rounds)
        touched = edges.join(
            front, join_type="inner", num_partitions=num_partitions,
            on=("src",),
        )

        def uniq(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": np.unique(t["dst"].to_numpy(zero_copy_only=False))}
            )

        new = compact_for_join(
            touched.map_batches(uniq, batch_format="pyarrow")
            .groupby("node")
            .count()
            .map_batches(
                lambda t: pa.table(
                    {"node": pc.cast(t["node"], pa.int64()),
                     "reach": np.ones(len(t), dtype=np.int64)}
                ),
                batch_format="pyarrow",
            ),
            num_partitions,
        ).materialize()
        if new.count() == 0:
            break  # frontier has no out-edges — fixpoint reached
        merged = dist.join(
            new, join_type="left_outer", num_partitions=num_partitions,
            on=("node",),
        )

        def update(t: pa.Table, _r=rnd) -> pa.Table:
            hops = t["hops"].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = pc.fill_null(pc.cast(t["reach"], pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )
            hops = np.where((hops < 0) & (hit > 0), _r, hops)
            return pa.table(
                {"node": pc.cast(t["node"], pa.int64()), "hops": hops}
            )

        dist = merged.map_batches(update, batch_format="pyarrow").materialize()
        stamped = int(
            dist.map_batches(
                lambda t, _r=rnd: pa.table(
                    {"c": [int(pc.sum(
                        pc.cast(pc.equal(t["hops"], _r), pa.int64())
                    ).as_py() or 0)]}
                ),
                batch_format="pyarrow",
            ).sum("c")
            or 0
        )
        if stamped == 0:
            break
    else:
        raise RuntimeError(
            f"reach_shuffle exceeded max_rounds={max_rounds}; "
            "raise the budget"
        )

    def emit(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["hops"], 0))
        return pa.table({"node": pc.cast(f["node"], pa.int64())})

    return dist.map_batches(emit, batch_format="pyarrow")
