"""Distributed weighted single-source shortest paths (Bellman-Ford,
bounded rounds) over an edge list.

The relaxation operator class — the weighted generalization of
ops/bfs.py's frontier expansion: K global relaxation rounds, after
which every node holds the exact minimum-weight path from the seed set
using AT MOST K edges (the standard bounded-hop SSSP semantics; a
fixed K keeps the result SQL-unrollable exactly like BFS_ITERS /
PR_ITERS). Weights are small positive integers, so all state is int64
and the result is bit-exact under any partitioning: per round

    dist'[v] = min(dist[v], min over edges (u,v): dist[u] + w(u,v))

Web/geo-corpus use: weighted crawl distance (latency-weighted link
graph), road-network reach from depot seeds (the reference's stop →
route alignment distances, ops/alignment.py, are the sequential
analogue).

Two physical plans, same bit-exact result (the ops/pagerank.py /
ops/bfs.py pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_DIST_ROWS): the int64
  distance vector rides the object store via one ``ray.put`` per
  round; edges stream through ``map_batches`` emitting block-local
  per-dst MIN candidates (the map-side combine), merged on the driver
  with ``np.minimum.at`` under the DRIVER_MERGE rule, or through a
  ``groupby().min()`` exchange above it. Early-exit when a round
  changes nothing (idempotent thereafter).

* **Shuffle plan** (``broadcast=False``): the distance table is a
  Dataset. Each round: reached rows ⋈ edges on src → (dst, cand) →
  groupby(dst).min → LEFT OUTER onto the distance table → LEAST.
  Hash-partitioning edges by src once would amortize the join
  exchange across rounds on a real cluster (Ray Data re-partitions
  per call; documented as the cluster-scale optimization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_DIST_ROWS = 2_000_000
DRIVER_MERGE_NODES = 200_000
INF = np.int64(1 << 62)


def _collect_arrow(ds) -> pa.Table:
    import ray

    refs = ds.to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in refs) if t.num_rows]
    if not tables:
        return pa.table(
            {"node": pa.array([], pa.int64()), "cand": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables).combine_chunks()


def sssp_broadcast(edges, n_nodes: int, seeds: np.ndarray, iters: int = 6):
    """Broadcast plan. ``edges`` must carry int64 src, dst, w >= 1."""
    import ray
    import ray.data
    from ray.data.aggregate import Min

    dist = np.full(n_nodes, INF, dtype=np.int64)
    dist[np.asarray(seeds, dtype=np.int64)] = 0
    edges = edges.materialize()
    if n_nodes <= DRIVER_MERGE_NODES and edges.num_blocks() > 8:
        edges = edges.repartition(8).materialize()

    for _ in range(iters):
        ref = ray.put(dist)

        def relax(t: pa.Table, _ref=ref) -> pa.Table:
            d = ray.get(_ref)  # zero-copy plasma view
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            w = t["w"].to_numpy(zero_copy_only=False)
            ds_ = d[src]
            m = (ds_ < INF) & (ds_ + w < d[dst])
            if not m.any():
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     "cand": pa.array([], pa.int64())}
                )
            g = (
                pa.table({"node": dst[m], "cand": ds_[m] + w[m]})
                .group_by("node")
                .aggregate([("cand", "min")])
            )
            return g.rename_columns(["node", "cand"])

        parts = edges.map_batches(relax, batch_format="pyarrow")
        if n_nodes <= DRIVER_MERGE_NODES:
            cand = _collect_arrow(parts)
        else:
            cand = _collect_arrow(
                parts.groupby("node").aggregate(Min("cand", alias_name="cand"))
            )
        if cand.num_rows == 0:
            break  # converged — later rounds are no-ops
        nodes = cand["node"].to_numpy(zero_copy_only=False)
        vals = cand["cand"].to_numpy(zero_copy_only=False).astype(np.int64)
        before = dist.copy()
        np.minimum.at(dist, nodes, vals)
        if (dist == before).all():
            break

    reached = np.flatnonzero(dist < INF).astype(np.int64)
    return ray.data.from_arrow(
        pa.table({"doc_id": reached, "dist": dist[reached]})
    )


def sssp_shuffle(edges, n_nodes: int, seeds: np.ndarray, iters: int = 6,
                 num_partitions: int = 16):
    """Shuffle plan: distance table as a Dataset, per-round src join +
    dst-keyed min merge."""
    import ray.data
    from ray.data.aggregate import Min

    seeds = np.asarray(seeds, dtype=np.int64)
    init = np.full(n_nodes, INF, dtype=np.int64)
    init[seeds] = 0
    dist = ray.data.from_arrow(
        pa.table({"node": np.arange(n_nodes, dtype=np.int64), "dist": init})
    ).materialize()
    edges = edges.materialize()

    for _ in range(iters):
        def reached_batch(t: pa.Table) -> pa.Table:
            f = t.filter(pc.less(t["dist"], pa.scalar(int(INF))))
            return pa.table(
                {"src": pc.cast(f["node"], pa.int64()),
                 "dsrc": pc.cast(f["dist"], pa.int64())}
            )

        from osm2gtfs_ray.ops.joins import compact_for_join

        # the filtered reached set can lead with empty blocks — the
        # Ray 2.49 hash-join schema-broadcast defect (ops/joins.py)
        reached = compact_for_join(
            dist.map_batches(reached_batch, batch_format="pyarrow"), 4
        )
        joined = edges.join(
            reached, join_type="inner", num_partitions=num_partitions,
            on=("src",),
        )

        def cands(t: pa.Table) -> pa.Table:
            c = t["dsrc"].to_numpy(zero_copy_only=False) + t["w"].to_numpy(
                zero_copy_only=False
            )
            g = (
                pa.table({"node": t["dst"], "cand": c})
                .group_by("node")
                .aggregate([("cand", "min")])
            )
            return g.rename_columns(["node", "cand"])

        best = compact_for_join(
            joined.map_batches(cands, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("cand", alias_name="cand")),
            4,
        )
        merged = dist.join(
            best, join_type="left_outer", num_partitions=num_partitions,
            on=("node",),
        )

        def update(t: pa.Table) -> pa.Table:
            d = t["dist"].to_numpy(zero_copy_only=False)
            c = (
                pc.fill_null(pc.cast(t["cand"], pa.int64()), int(INF))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {
                    "node": pc.cast(t["node"], pa.int64()),
                    "dist": pa.array(np.minimum(d, c)),
                }
            )

        dist = merged.map_batches(update, batch_format="pyarrow").materialize()

    def emit(t: pa.Table) -> pa.Table:
        f = t.filter(pc.less(t["dist"], pa.scalar(int(INF))))
        return pa.table({"doc_id": f["node"], "dist": f["dist"]})

    return dist.map_batches(emit, batch_format="pyarrow")


def sssp(edges, n_nodes: int, seeds: np.ndarray, iters: int = 6,
         broadcast: bool | None = None, num_partitions: int = 16):
    """Size-aware plan selection (ops/pagerank.py rule)."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_DIST_ROWS
    if broadcast:
        return sssp_broadcast(edges, n_nodes, seeds, iters=iters)
    return sssp_shuffle(edges, n_nodes, seeds, iters=iters,
                        num_partitions=num_partitions)
