"""Distributed k-core decomposition over an undirected edge list —
iterative peeling to the maximal subgraph of minimum degree k.

The fixpoint-peeling operator class (the ops/bfs.py frontier dual):
each round deletes every surviving node whose degree AMONG SURVIVORS
is < k; the fixpoint is the k-core. Web-corpus use: link-farm /
spam-cluster isolation (dense cores), crawl frontier prioritization,
and the standard "dense subgraph" feature for page-quality models.

All state is boolean/integer (alive set, integer degrees), so the
result is bit-exact under any partitioning — round boundaries are
global barriers in both plans. Convergence is data-dependent; both
plans iterate to the TRUE fixpoint and raise if it is not reached
within ``max_rounds``, which pins the engine to the unrolled SQL
oracle's round budget (the ops/simplify.py DP_SQL_LEVELS discipline:
divergence raises instead of silently disagreeing).

Two physical plans, same result (the ops/pagerank.py size-aware
pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_CORE_ROWS): the alive
  bitmap (1 B/node) rides the object store via one ``ray.put`` per
  round; the deduped edge list streams through ``map_batches`` which
  emits block-local degree partials over alive-alive edges (bounded
  by min(2·block_edges, n) rows), merged on the driver.

* **Shuffle plan** (``broadcast=False``): the alive set is a
  Dataset; each round is two hash semi-joins (both endpoints alive),
  a degree groupby, and a >= k filter. On a real cluster,
  hash-partitioning edges once would amortize the join exchange
  across rounds — documented as the cluster-scale optimization.

Reference semantics analogue: osm2gtfs's unused-stop/route removal
(A6/A7, `creators/stops_creator.py` cleanup) iterates "drop objects
with too few references" to a fixpoint — the same peeling shape this
operator runs on the crawl graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_CORE_ROWS = 2_000_000  # same bound as ops/pagerank.py


def _collect_arrow(ds) -> pa.Table:
    import ray

    # blocks may surface as pandas if an upstream stage produced
    # pandas blocks and a pass-through optimization kept them
    raw = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(
            t, preserve_index=False
        )
        for t in raw
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table({"node": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    return pa.concat_tables(tables).combine_chunks()


def _deg_partial_factory(ref):
    import ray

    def partial(t: pa.Table) -> pa.Table:
        alive = ray.get(ref)  # zero-copy plasma view
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        m = alive[a] & alive[b]
        nodes = np.concatenate([a[m], b[m]])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": u, "c": c.astype(np.int64)})

    return partial


def kcore_broadcast(und, n_nodes: int, k: int, max_rounds: int = 24):
    """Broadcast plan: driver-held alive bitmap; one distributed
    degree pass per peeling round. ``und`` must be the DEDUPED
    undirected edge list (a < b columns)."""
    import ray
    import ray.data

    und = und.materialize()  # read once, iterate R times
    if n_nodes <= 200_000 and und.num_blocks() > 8:
        # compact tiny shard blocks once; per-round dispatch dominates
        und = und.repartition(8).materialize()
    alive = np.ones(n_nodes, dtype=bool)
    rounds = 0
    while True:
        ref = ray.put(alive)
        t = _collect_arrow(
            und.map_batches(_deg_partial_factory(ref), batch_format="pyarrow")
        )
        deg = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(
            deg,
            t["node"].to_numpy(zero_copy_only=False),
            t["c"].to_numpy(zero_copy_only=False),
        )
        drop = alive & (deg < k)
        if not drop.any():
            break
        rounds += 1
        if rounds >= max_rounds:
            raise RuntimeError(
                f"k-core peeling exceeded max_rounds={max_rounds}; "
                "raise the unrolled-oracle round budget"
            )
        alive &= ~drop
    ids = np.flatnonzero(alive)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "deg_core": deg[ids],
            }
        )
    )


def kcore_shuffle(und, k: int, max_rounds: int = 24, num_partitions: int = 4):
    """Shuffle plan: the alive set is a Dataset; two endpoint
    semi-joins + one degree groupby per round."""
    from ray.data.aggregate import Sum

    und = und.materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        nodes = np.unique(
            np.concatenate(
                [
                    t["a"].to_numpy(zero_copy_only=False),
                    t["b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": nodes, "p": np.ones(len(nodes), np.int64)})

    alive = (
        und.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("p", alias_name="p"))
        .map_batches(
            lambda t: pa.table({"node": pc.cast(t["node"], pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_alive = alive.count()
    deg = None
    for _ in range(max_rounds + 1):
        aa = alive.map_batches(
            lambda t: pa.table({"a": pc.cast(t["node"], pa.int64())}),
            batch_format="pyarrow",
        )
        ab = alive.map_batches(
            lambda t: pa.table({"b": pc.cast(t["node"], pa.int64())}),
            batch_format="pyarrow",
        )
        e = und.join(
            aa, join_type="inner", num_partitions=num_partitions, on=("a",)
        ).join(ab, join_type="inner", num_partitions=num_partitions, on=("b",))

        def both(t: pa.Table) -> pa.Table:
            nodes = np.concatenate(
                [
                    t["a"].to_numpy(zero_copy_only=False),
                    t["b"].to_numpy(zero_copy_only=False),
                ]
            )
            u, c = np.unique(nodes, return_counts=True)
            return pa.table({"node": u, "p": c.astype(np.int64)})

        deg = (
            e.map_batches(both, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("p", alias_name="dg"))
            .materialize()
        )
        survivors = deg.filter(expr=f"dg >= {k}").materialize()
        n_next = survivors.count()
        if n_next == n_alive:
            break
        alive = survivors.map_batches(
            lambda t: pa.table({"node": pc.cast(t["node"], pa.int64())}),
            batch_format="pyarrow",
        ).materialize()
        n_alive = n_next
    else:
        raise RuntimeError(
            f"k-core peeling exceeded max_rounds={max_rounds}; "
            "raise the unrolled-oracle round budget"
        )

    def emit(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t["dg"], k))
        return pa.table(
            {
                "doc_id": pc.cast(keep["node"], pa.int64()),
                "deg_core": pc.cast(keep["dg"], pa.int64()),
            }
        )

    return deg.map_batches(emit, batch_format="pyarrow")


def kcore(und, n_nodes: int, k: int, max_rounds: int = 24,
          broadcast: bool | None = None, num_partitions: int = 4):
    """Size-aware plan selection (the ops/pagerank.py rule)."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_CORE_ROWS
    if broadcast:
        return kcore_broadcast(und, n_nodes, k, max_rounds=max_rounds)
    return kcore_shuffle(und, k, max_rounds=max_rounds,
                         num_partitions=num_partitions)
