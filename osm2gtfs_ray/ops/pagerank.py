"""Distributed PageRank over an edge list — fixed-point integer math.

The iterative-graph operator class (beyond ops/components.py's label
propagation): K power-iteration rounds of rank mass flowing along
out-links with damping. Web-corpus use: crawl prioritization / quality
weighting of a Common-Crawl-style link graph.

All arithmetic is FIXED-POINT INTEGER (ranks are int64 numerators over
an implicit 10^12 denominator, contributions use floor division), so
the result is bit-exact regardless of partitioning, batch order, or
reduction tree shape — float PageRank would drift with summation order
and could never hash-match a SQL oracle. The semantics per round:

    contrib(edge s->d) = rank[s] // outdeg[s]
    rank'[d] = BASE + (85 * sum(contrib into d)) // 100
    BASE     = (15 * (TOTAL // n)) // 100          (teleport mass)

Graphs are assumed dangling-free (every node has outdeg >= 1); the
synthetic link graph guarantees it and real crawl graphs add a
sink-self-loop in preprocessing.

Two physical plans, same bit-exact result (the ops/components.py /
ops/joins.py size-aware pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_RANK_ROWS): the rank vector
  (8 B/node — 16 MB at 2M nodes) rides the object store via one
  ``ray.put`` per round; edges — the big side — stream through
  ``map_batches`` with a BLOCK-LOCAL Arrow group-by combine before the
  one small ``groupby().sum()`` exchange per round, so the shuffle
  carries O(distinct dst per block), not O(edges).

* **Shuffle plan** (``broadcast=False``): ranks too big for one
  object. Each round is edges ⋈ ranks (hash-partitioned on src) →
  contrib map → groupby(dst).sum → LEFT OUTER onto the node list to
  re-add teleport-only nodes. 3 exchanges per round; on a real
  cluster, co-partitioning edges by hash(src) once would amortize the
  first across all K rounds — Ray Data's join re-partitions per call,
  so that is documented here as the cluster-scale optimization.

Reference semantics analogue: osm2gtfs's route-graph walk
(creators/routes_creator.py building line→itinerary graphs) is the
reference's graph traversal; PageRank is its web-scale generalization
to link-authority over the page graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOTAL_FP = 10**12  # fixed-point denominator: sum of initial ranks
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
BROADCAST_RANK_ROWS = 2_000_000  # same bound as ops/components.py labels
# below this node count the per-round inflow merge happens on the
# driver (np.add.at over collected block partials — each partial is
# already <= min(block_edges, n) rows) instead of paying a Ray groupby
# exchange per round; above it the groupby reduces driver traffic
DRIVER_MERGE_NODES = 200_000


def _base(n_nodes: int) -> int:
    return ((DAMP_DEN - DAMP_NUM) * (TOTAL_FP // n_nodes)) // DAMP_DEN


def _collect_arrow(ds) -> pa.Table:
    import ray

    return pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()]
    ).combine_chunks()


def pagerank_broadcast(edges, n_nodes: int, iters: int = 5):
    """Broadcast plan: driver-held int64 rank vector (bounded by
    BROADCAST_RANK_ROWS), one distributed pass over edges per round."""
    import ray
    from ray.data.aggregate import Sum

    ranks = np.full(n_nodes, TOTAL_FP // n_nodes, dtype=np.int64)
    base = _base(n_nodes)
    edges = edges.materialize()  # read once, iterate K times
    if n_nodes <= DRIVER_MERGE_NODES and edges.num_blocks() > 8:
        # small graphs arrive as ~64 tiny read blocks; per-round task
        # dispatch over them dominates — compact once, iterate cheap
        edges = edges.repartition(8).materialize()

    for _ in range(iters):
        ref = ray.put(ranks)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            r = ray.get(_ref)  # zero-copy plasma view
            src = t["src"].to_numpy(zero_copy_only=False)
            outdeg = t["outdeg"].to_numpy(zero_copy_only=False)
            contrib = r[src] // outdeg
            g = (
                pa.table({"node": t["dst"], "c": contrib})
                .group_by("node")
                .aggregate([("c", "sum")])
            )
            return g.rename_columns(["node", "inflow"])

        parts = edges.map_batches(partial, batch_format="pyarrow")
        if n_nodes <= DRIVER_MERGE_NODES:
            # small graphs: block partials merge on the driver — skips
            # one all-to-all exchange per round
            inflow = _collect_arrow(parts)
            infl_vec = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(
                infl_vec,
                inflow["node"].to_numpy(zero_copy_only=False),
                inflow["inflow"].to_numpy(zero_copy_only=False).astype(np.int64),
            )
            ranks = base + (DAMP_NUM * infl_vec) // DAMP_DEN
        else:
            inflow = _collect_arrow(
                parts.groupby("node").aggregate(Sum("inflow", alias_name="inflow"))
            )
            nxt = np.full(n_nodes, base, dtype=np.int64)
            nodes = inflow["node"].to_numpy(zero_copy_only=False)
            infl = inflow["inflow"].to_numpy(zero_copy_only=False).astype(np.int64)
            nxt[nodes] += (DAMP_NUM * infl) // DAMP_DEN
            ranks = nxt

    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_nodes, dtype=np.int64)),
                "rank_fp": pa.array(ranks),
            }
        )
    )


def pagerank_shuffle(edges, nodes, iters: int = 5, num_partitions: int = 16):
    """Shuffle plan: ranks as a Dataset, hash-partitioned joins per
    round. ``nodes`` is a Dataset with one int64 ``node`` column (the
    complete vertex set — teleport-only nodes must still be emitted)."""
    from ray.data.aggregate import Sum

    n_nodes = nodes.count()
    base = _base(n_nodes)
    init = TOTAL_FP // n_nodes

    def seed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["node"], pa.int64()),
                "rank": pa.array(
                    np.full(len(t), init, dtype=np.int64)
                ),
            }
        )

    nodes = nodes.materialize()
    ranks = nodes.map_batches(seed, batch_format="pyarrow")
    edges = edges.materialize()

    for _ in range(iters):
        joined = edges.join(
            ranks, join_type="inner", num_partitions=num_partitions, on=("src",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            c = t["rank"].to_numpy(zero_copy_only=False) // t[
                "outdeg"
            ].to_numpy(zero_copy_only=False)
            g = (
                pa.table({"node": t["dst"], "c": c})
                .group_by("node")
                .aggregate([("c", "sum")])
            )
            return g.rename_columns(["node", "inflow"])

        inflow = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("inflow", alias_name="inflow"))
        )
        filled = nodes.join(
            inflow,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
        )

        def update(t: pa.Table) -> pa.Table:
            infl = (
                pc.fill_null(pc.cast(t["inflow"], pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {
                    "src": pc.cast(t["node"], pa.int64()),
                    "rank": pa.array(base + (DAMP_NUM * infl) // DAMP_DEN),
                }
            )

        ranks = filled.map_batches(update, batch_format="pyarrow").materialize()

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["src"], "rank_fp": t["rank"]})

    return ranks.map_batches(emit, batch_format="pyarrow")


def pagerank(edges, n_nodes: int, iters: int = 5, broadcast: bool | None = None,
             num_partitions: int = 16):
    """Size-aware plan selection (the ops/components.py rule): rank
    vectors at or below BROADCAST_RANK_ROWS ride the object store;
    larger graphs run the shuffle plan end to end."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_RANK_ROWS
    if broadcast:
        return pagerank_broadcast(edges, n_nodes, iters=iters)
    import ray.data

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n_nodes, dtype=np.int64))})
    )
    return pagerank_shuffle(edges, nodes, iters=iters, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Personalized PageRank: teleport mass restarts to a SEED SET instead
# of uniformly — the query/topic-biased authority variant (random walk
# with restart). Identical fixed-point discipline: initial mass
# TOTAL_FP // n_seeds on each seed, zero elsewhere; per round
#     rank'[d] = base[d] + (85 * inflow(d)) // 100
# with base[d] = ((100-85) * (TOTAL_FP // n_seeds)) // 100 on seeds,
# 0 elsewhere. Same dual physical plans as pagerank(); the only new
# state is the seed membership, which is O(n_seeds) and rides ray.put
# in the shuffle plan's seeding map.
# ---------------------------------------------------------------------------

def ppr_broadcast(edges, n_nodes: int, seeds: np.ndarray, iters: int = 5):
    import ray
    from ray.data.aggregate import Sum

    seeds = np.asarray(seeds, dtype=np.int64)
    init = TOTAL_FP // len(seeds)
    base_val = ((DAMP_DEN - DAMP_NUM) * init) // DAMP_DEN
    base = np.zeros(n_nodes, dtype=np.int64)
    base[seeds] = base_val
    ranks = np.zeros(n_nodes, dtype=np.int64)
    ranks[seeds] = init

    edges = edges.materialize()
    if n_nodes <= DRIVER_MERGE_NODES and edges.num_blocks() > 8:
        edges = edges.repartition(8).materialize()

    for _ in range(iters):
        ref = ray.put(ranks)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            r = ray.get(_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            outdeg = t["outdeg"].to_numpy(zero_copy_only=False)
            contrib = r[src] // outdeg
            g = (
                pa.table({"node": t["dst"], "c": contrib})
                .group_by("node")
                .aggregate([("c", "sum")])
            )
            return g.rename_columns(["node", "inflow"])

        parts = edges.map_batches(partial, batch_format="pyarrow")
        if n_nodes <= DRIVER_MERGE_NODES:
            inflow = _collect_arrow(parts)
        else:
            inflow = _collect_arrow(
                parts.groupby("node").aggregate(Sum("inflow", alias_name="inflow"))
            )
        infl_vec = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(
            infl_vec,
            inflow["node"].to_numpy(zero_copy_only=False),
            inflow["inflow"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        ranks = base + (DAMP_NUM * infl_vec) // DAMP_DEN

    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_nodes, dtype=np.int64)),
                "rank_fp": pa.array(ranks),
            }
        )
    )


def ppr_shuffle(edges, nodes, seeds: np.ndarray, iters: int = 5,
                num_partitions: int = 16):
    """Shuffle plan: like pagerank_shuffle but the seed/update maps
    carry the per-node base via a broadcast sorted seed array
    (O(n_seeds) — the seed list is small by definition of PPR)."""
    import ray
    from ray.data.aggregate import Sum

    seeds = np.sort(np.asarray(seeds, dtype=np.int64))
    init = TOTAL_FP // len(seeds)
    base_val = ((DAMP_DEN - DAMP_NUM) * init) // DAMP_DEN
    seeds_ref = ray.put(seeds)

    def seed_map(t: pa.Table) -> pa.Table:
        s = ray.get(seeds_ref)
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_seed = s[np.searchsorted(s, node).clip(0, len(s) - 1)] == node
        return pa.table(
            {
                "src": pa.array(node),
                "rank": pa.array(np.where(is_seed, init, 0).astype(np.int64)),
            }
        )

    nodes = nodes.materialize()
    ranks = nodes.map_batches(seed_map, batch_format="pyarrow")
    edges = edges.materialize()

    for _ in range(iters):
        joined = edges.join(
            ranks, join_type="inner", num_partitions=num_partitions, on=("src",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            c = t["rank"].to_numpy(zero_copy_only=False) // t[
                "outdeg"
            ].to_numpy(zero_copy_only=False)
            g = (
                pa.table({"node": t["dst"], "c": c})
                .group_by("node")
                .aggregate([("c", "sum")])
            )
            return g.rename_columns(["node", "inflow"])

        inflow = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("inflow", alias_name="inflow"))
        )
        filled = nodes.join(
            inflow,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
        )

        def update(t: pa.Table) -> pa.Table:
            s = ray.get(seeds_ref)
            node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            is_seed = s[np.searchsorted(s, node).clip(0, len(s) - 1)] == node
            infl = (
                pc.fill_null(pc.cast(t["inflow"], pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {
                    "src": pa.array(node),
                    "rank": pa.array(
                        np.where(is_seed, base_val, 0)
                        + (DAMP_NUM * infl) // DAMP_DEN
                    ),
                }
            )

        ranks = filled.map_batches(update, batch_format="pyarrow").materialize()

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["src"], "rank_fp": t["rank"]})

    return ranks.map_batches(emit, batch_format="pyarrow")


def personalized_pagerank(edges, n_nodes: int, seeds: np.ndarray,
                          iters: int = 5, broadcast: bool | None = None,
                          num_partitions: int = 16):
    """Size-aware plan selection, same rule as pagerank()."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_RANK_ROWS
    if broadcast:
        return ppr_broadcast(edges, n_nodes, seeds, iters=iters)
    import ray.data

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n_nodes, dtype=np.int64))})
    )
    return ppr_shuffle(edges, nodes, seeds, iters=iters,
                       num_partitions=num_partitions)
