"""Distributed HITS (hubs & authorities) over an edge list — exact
fixed-point integer math, the ops/pagerank.py companion.

Per round (Kleinberg's mutual reinforcement):

    a_raw[v] = sum over edges u->v of h[u]      (authority from hubs)
    a[v]     = (a_raw[v] * TOTAL) // sum(a_raw)  (integer L1 renorm)
    h_raw[u] = sum over edges u->v of a[v]      (hub from authorities)
    h[u]     = (h_raw[u] * TOTAL) // sum(h_raw)

All values are int64 numerators over an implicit TOTAL_HITS = 10^9
denominator. The bound that makes the renormalization exact in int64:
after each renorm sum(x) <= TOTAL, so with at most one edge per
(u, v) pair every raw score (a sum of distinct endpoint scores) is
<= TOTAL and ``raw * TOTAL <= 10^18 < 2^63`` — no widening needed,
and the result is bit-exact regardless of partitioning or reduction
order (float HITS could never hash-match a SQL oracle). With parallel
edges of multiplicity m per pair the bound weakens to
``raw <= m * TOTAL``, so ``raw * TOTAL < 2^63`` requires ``m <= 9``;
the synthesized crawl graph emits at most 3 parallel edges per pair
(three independent dst streams). Callers feeding a generic edge list
with higher multiplicity must dedupe edges first.

Two physical plans, same bit-exact result (the ops/pagerank.py
size-aware pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_HITS_ROWS): both score
  vectors ride the object store (8 B/node) via one ``ray.put`` per
  half-round; edges stream through ``map_batches`` with block-local
  Arrow combine, partials merged on the driver below
  DRIVER_MERGE_NODES else via one groupby exchange.

* **Shuffle plan** (``broadcast=False``): scores as Datasets,
  edges ⋈ scores hash-partitioned per half-round, groupby to the
  other endpoint, global sum for the renorm divisor (a driver
  scalar), then the renorm map. On a real cluster, co-partitioning
  edges by hash(src) once would amortize across rounds — Ray Data's
  join re-partitions per call; documented as the cluster-scale
  optimization.

Reference semantics analogue: osm2gtfs ranks route relations by how
many stops they serve and stops by how many routes serve them
(creators/routes_creator.py / stops_creator.py cross-reference) — the
same bipartite mutual-reinforcement shape HITS formalizes on the
crawl graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOTAL_HITS = 10**9  # L1 mass after each renorm; raw*TOTAL fits int64
BROADCAST_HITS_ROWS = 2_000_000  # same bound as ops/pagerank.py
DRIVER_MERGE_NODES = 200_000


def _collect_arrow(ds) -> pa.Table:
    import ray

    return pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()]
    ).combine_chunks()


def _half_round_broadcast(edges, vec: np.ndarray, n_nodes: int,
                          from_col: str, to_col: str) -> np.ndarray:
    """raw[to] = sum over edges of vec[from], renormalized to TOTAL."""
    import ray
    from ray.data.aggregate import Sum

    ref = ray.put(vec)

    def partial(t: pa.Table, _ref=ref) -> pa.Table:
        v = ray.get(_ref)  # zero-copy plasma view
        src = t[from_col].to_numpy(zero_copy_only=False)
        g = (
            pa.table({"node": t[to_col], "c": v[src]})
            .group_by("node")
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["node", "s"])

    parts = edges.map_batches(partial, batch_format="pyarrow")
    if n_nodes > DRIVER_MERGE_NODES:
        parts = parts.groupby("node").aggregate(Sum("s", alias_name="s"))
    t = _collect_arrow(parts)
    raw = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(
        raw,
        t["node"].to_numpy(zero_copy_only=False),
        t["s"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    total = int(raw.sum())
    if total == 0:
        # numpy integer // 0 only warns and yields zeros; honor the
        # repo's divergence-raises discipline instead.
        raise ValueError("HITS half-round: empty/degenerate edge set "
                         "(all raw scores are zero)")
    return (raw * np.int64(TOTAL_HITS)) // np.int64(total)


def hits_broadcast(edges, n_nodes: int, iters: int = 3):
    """Broadcast plan: driver-held int64 hub/authority vectors."""
    import ray.data

    h = np.full(n_nodes, TOTAL_HITS // n_nodes, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    edges = edges.materialize()  # read once, iterate 2K times
    if n_nodes <= DRIVER_MERGE_NODES and edges.num_blocks() > 8:
        # compact tiny read blocks once; per-round dispatch dominates
        edges = edges.repartition(8).materialize()
    for _ in range(iters):
        a = _half_round_broadcast(edges, h, n_nodes, "src", "dst")
        h = _half_round_broadcast(edges, a, n_nodes, "dst", "src")
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_nodes, dtype=np.int64)),
                "hub_fp": pa.array(h),
                "auth_fp": pa.array(a),
            }
        )
    )


def _half_round_shuffle(edges, scores, from_col: str, to_col: str,
                        num_partitions: int):
    """Dataset half-round: edges ⋈ scores on from_col, grouped sums at
    to_col, integer renorm by the global sum. Returns (node, v)."""
    from ray.data.aggregate import Sum

    joined = edges.join(
        scores, join_type="inner", num_partitions=num_partitions,
        on=(from_col,),
    )

    def contrib(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"node": t[to_col], "c": t["v"]})
            .group_by("node")
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["node", "s"])

    raw = (
        joined.map_batches(contrib, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("s", alias_name="s"))
        .materialize()  # consumed twice: divisor + renorm
    )
    total = int(raw.sum("s") or 0)
    if total == 0:
        raise ValueError("HITS half-round: empty/degenerate edge set "
                         "(all raw scores are zero)")

    def renorm(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "v": (s * np.int64(TOTAL_HITS)) // np.int64(total),
            }
        )

    return raw.map_batches(renorm, batch_format="pyarrow")


def hits_shuffle(edges, n_nodes: int, iters: int = 3,
                 num_partitions: int = 16):
    """Shuffle plan: scores as Datasets; nodes absent from a raw sum
    hold score 0 and are re-added by the final LEFT joins."""
    import ray.data

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n_nodes, dtype=np.int64))})
    ).materialize()
    edges = edges.materialize()

    def seed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["node"], pa.int64()),
                "v": pa.array(
                    np.full(len(t), TOTAL_HITS // n_nodes, dtype=np.int64)
                ),
            }
        )

    h = nodes.map_batches(seed, batch_format="pyarrow")
    a = None
    for _ in range(iters):
        # edges ⋈ h on src -> authority sums at dst
        a = _half_round_shuffle(edges, h, "src", "dst", num_partitions)
        # edges ⋈ a on dst -> hub sums at src
        a_keyed = a.map_batches(
            lambda t: pa.table(
                {"dst": pc.cast(t["node"], pa.int64()), "v": t["v"]}
            ),
            batch_format="pyarrow",
        )
        h = _half_round_shuffle(
            edges, a_keyed, "dst", "src", num_partitions,
        ).map_batches(
            lambda t: pa.table(
                {"src": pc.cast(t["node"], pa.int64()), "v": t["v"]}
            ),
            batch_format="pyarrow",
        )

    hk = h.map_batches(
        lambda t: pa.table(
            {"node": pc.cast(t["src"], pa.int64()), "hub_fp": t["v"]}
        ),
        batch_format="pyarrow",
    )
    ak = a.map_batches(
        lambda t: pa.table(
            {"node": pc.cast(t["node"], pa.int64()), "auth_fp": t["v"]}
        ),
        batch_format="pyarrow",
    )
    out = nodes.join(
        hk, join_type="left_outer", num_partitions=num_partitions,
        on=("node",),
    ).join(
        ak, join_type="left_outer", num_partitions=num_partitions,
        on=("node",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["node"], pa.int64()),
                "hub_fp": pc.fill_null(pc.cast(t["hub_fp"], pa.int64()), 0),
                "auth_fp": pc.fill_null(pc.cast(t["auth_fp"], pa.int64()), 0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def hits(edges, n_nodes: int, iters: int = 3, broadcast: bool | None = None,
         num_partitions: int = 16):
    """Size-aware plan selection (the ops/pagerank.py rule)."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_HITS_ROWS
    if broadcast:
        return hits_broadcast(edges, n_nodes, iters=iters)
    return hits_shuffle(edges, n_nodes, iters=iters,
                        num_partitions=num_partitions)
