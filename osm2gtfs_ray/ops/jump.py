"""Pointer doubling (pointer jumping) over a functional edge table.

The primitive: every node carries exactly one out-pointer ``ptr``
(terminal nodes point at themselves).  Resolve every node to the
TERMINAL of its pointer chain plus the exact hop count, in
O(log max_chain) global rounds instead of O(max_chain): each round
replaces ``ptr[i] <- ptr[ptr[i]]`` and ``dist[i] <- dist[i] +
dist[ptr[i]]``, which doubles the distance covered per round.  All
state is integer, so the result is bit-exact under any partitioning.

Web-corpus use: HTTP redirect-chain resolution (301/302 chains to the
canonical landing page), alias/symlink flattening, and union-find
root finding after a static parent assignment.

Two physical plans, same result (the ops/pagerank.py pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_PTR_ROWS): the int64
  pointer + distance vectors live on the driver (two n-sized arrays,
  bounded by the 2M-row rule shared with ops/pagerank.py /
  ops/bfs.py); each doubling round is one vectorized numpy gather —
  no per-round distributed exchange at all, because the WHOLE state
  is the small side by definition here.
* **Shuffle plan** (``broadcast=False``): the state is a Dataset
  ``(node, ptr, dist)``.  Each round hash-joins the state with a
  projection of itself keyed on ``ptr = node`` to fetch
  ``ptr[ptr]`` / ``dist[ptr]``, then applies the doubling update in
  a vectorized map — one exchange per round, O(log chain) rounds.
  Early-stops on the first round where no pointer moved (the changed
  count rides the same pass as a tiny aggregate).

Both plans RAISE past ``max_rounds`` rather than return a partially
resolved table (the repo's divergence-raises discipline): a functional
graph with a cycle never converges, and silent partial resolution
would look like a valid answer.

Reference semantics analogue: osm2gtfs resolves stop aliases through
``Stop.get_parent_station`` chains one hop at a time
(`osm2gtfs/core/elements.py`); pointer doubling is the crawl-scale
form (redirect chains over billions of URLs in ~log rounds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_PTR_ROWS = 2_000_000  # same bound as ops/pagerank.py ranks


class PointerCycleError(RuntimeError):
    """Raised when doubling has not converged within max_rounds."""


def resolve_broadcast(ptrs, n_nodes: int, max_rounds: int = 64):
    """Broadcast plan: collect the (node, ptr) table into two driver
    arrays (bounded by BROADCAST_PTR_ROWS) and double locally."""
    import ray
    import ray.data

    if n_nodes > BROADCAST_PTR_ROWS:
        raise ValueError(
            f"broadcast pointer plan bounded at {BROADCAST_PTR_ROWS} rows; "
            f"got {n_nodes} — use resolve_shuffle"
        )
    ptr = np.full(n_nodes, -1, dtype=np.int64)
    for ref in ptrs.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            ptr[t["node"].to_numpy(zero_copy_only=False)] = t[
                "ptr"
            ].to_numpy(zero_copy_only=False)
    if (ptr < 0).any():
        raise ValueError("pointer table does not cover all n_nodes nodes")
    dist = (ptr != np.arange(n_nodes, dtype=np.int64)).astype(np.int64)
    for _ in range(max_rounds):
        nxt = ptr[ptr]
        if np.array_equal(nxt, ptr):
            break
        dist = dist + dist[ptr]
        ptr = nxt
    else:
        raise PointerCycleError(
            f"pointer doubling did not converge in {max_rounds} rounds "
            "(cycle in the functional graph?)"
        )
    # EVEN-length cycles stabilize under doubling (a 2-cycle becomes
    # two self-pointers after one round), so ptr[ptr] == ptr alone is
    # not proof of resolution. A genuine terminal always keeps
    # dist == 0; a cycle node's dist only ever grows — so every final
    # pointer must land on a dist-0 node.
    if dist[ptr].any():
        raise PointerCycleError(
            "pointer doubling stabilized on a cycle (even-length "
            "cycle in the functional graph)"
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "node": np.arange(n_nodes, dtype=np.int64),
                "terminal": ptr,
                "hops": dist,
            }
        )
    )


def resolve_shuffle(ptrs, n_nodes: int, max_rounds: int = 64,
                    num_partitions: int = 16):
    """Shuffle plan: Dataset state, one self-join exchange per
    doubling round.  On a real cluster, hash-partitioning the state
    by node once makes every round's join key co-located."""
    import ray.data

    def init(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        ptr = t["ptr"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": node, "ptr": ptr,
             "dist": (ptr != node).astype(np.int64)}
        )

    state = ptrs.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        # projection keyed on ptr: for each state row fetch the row of
        # the node it points AT (ptr[ptr], dist[ptr])
        def project(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "ptr": pc.cast(t["node"], pa.int64()),
                    "jptr": pc.cast(t["ptr"], pa.int64()),
                    "jdist": pc.cast(t["dist"], pa.int64()),
                }
            )

        right = state.map_batches(project, batch_format="pyarrow")
        merged = state.join(
            right, join_type="inner", num_partitions=num_partitions,
            on=("ptr",),
        )

        def double(t: pa.Table) -> pa.Table:
            ptr = t["ptr"].to_numpy(zero_copy_only=False)
            jptr = t["jptr"].to_numpy(zero_copy_only=False)
            dist = t["dist"].to_numpy(zero_copy_only=False)
            jdist = t["jdist"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": pc.cast(t["node"], pa.int64()),
                    "ptr": jptr.astype(np.int64),
                    "dist": (dist + jdist).astype(np.int64),
                    "moved": (jptr != ptr).astype(np.int64),
                }
            )

        nxt = merged.map_batches(double, batch_format="pyarrow").materialize()
        moved = nxt.sum("moved")
        state = nxt.drop_columns(["moved"])
        if not moved:
            break
    else:
        raise PointerCycleError(
            f"pointer doubling did not converge in {max_rounds} rounds "
            "(cycle in the functional graph?)"
        )

    # even-length cycles stabilize under doubling (see
    # resolve_broadcast): a cycle node ends self-pointing with
    # dist > 0, a genuine terminal with dist == 0 — one tiny
    # aggregate over the final state distinguishes them
    def cycle_flag(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        ptr = t["ptr"].to_numpy(zero_copy_only=False)
        dist = t["dist"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"bad": ((ptr == node) & (dist > 0)).astype(np.int64)}
        )

    if state.map_batches(cycle_flag, batch_format="pyarrow").sum("bad"):
        raise PointerCycleError(
            "pointer doubling stabilized on a cycle (even-length "
            "cycle in the functional graph)"
        )

    def emit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "terminal": pc.cast(t["ptr"], pa.int64()),
                "hops": pc.cast(t["dist"], pa.int64()),
            }
        )

    return state.map_batches(emit, batch_format="pyarrow")


def resolve_pointers(ptrs, n_nodes: int, max_rounds: int = 64,
                     broadcast: bool | None = None,
                     num_partitions: int = 16):
    """Size-aware plan selection (the ops/pagerank.py rule): driver
    vectors up to BROADCAST_PTR_ROWS nodes, Dataset self-join doubling
    above."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_PTR_ROWS
    if broadcast:
        return resolve_broadcast(ptrs, n_nodes, max_rounds=max_rounds)
    return resolve_shuffle(ptrs, n_nodes, max_rounds=max_rounds,
                           num_partitions=num_partitions)
