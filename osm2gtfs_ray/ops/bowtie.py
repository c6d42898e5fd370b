"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000): every node classified as

    core  — member of the giant SCC (max size, min-label tie-break),
    in    — reaches the core (backward-reachable from it),
    out   — reachable from the core,
    other — tendrils / disconnected.

in-and-out implies core (a core→x→core path makes x mutually
reachable with the core), so the CASE precedence is semantic
documentation, not a choice.

Two physical plans, same bit-exact result (the ops/pagerank.py
size-aware pattern):

* **Broadcast plan** (n_nodes <= BROADCAST_SCC_ROWS): composes the
  broadcast-family fixpoints — scc labels collected to a driver int64
  vector, forward/backward reachability via ops/bfs.bfs_broadcast
  boolean masks.

* **Shuffle plan** (``broadcast=False``): NO driver-held n-sized
  state. scc labels stay a Dataset; the giant-SCC label is a
  distributed groupby-count with a per-block top-1 (driver sees one
  row per block); the core member set is a filtered Dataset that
  seeds two ops/bfs.reach_shuffle Dataset-frontier fixpoints (forward
  edges / reversed edges); the final classification is the labels
  Dataset hash-joined LEFT OUTER with both reach tables. The scc
  label SOURCE is ops/scc.scc (driver Kosaraju under 500k edges,
  parallel FW-BW broadcast above — its own documented bound); the
  composition itself adds no per-node driver state.

Reference semantics analogue: osm2gtfs's route network splits into a
mutually-connected trunk (routes sharing stops both ways), feeder
lines into it, and branches out of it — the macro-structure bow-tie
formalizes on the crawl graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.ops.scc import BROADCAST_SCC_ROWS, scc

_CLS = ("core", "in", "out", "other")


def bowtie_broadcast(edges, n_nodes: int):
    """Broadcast plan: driver-held label vector + reach masks."""
    import ray
    import ray.data

    from osm2gtfs_ray.ops.bfs import bfs_broadcast

    edges = edges.materialize()
    scc_tbl = pa.concat_tables(
        [ray.get(r) for r in scc(edges, n_nodes).to_arrow_refs()]
    )
    labels = np.zeros(n_nodes, dtype=np.int64)
    labels[scc_tbl["doc_id"].to_numpy(zero_copy_only=False)] = (
        scc_tbl["scc"].to_numpy(zero_copy_only=False)
    )
    uniq, counts = np.unique(labels, return_counts=True)
    core_label = int(uniq[np.lexsort((uniq, -counts))[0]])
    core = np.flatnonzero(labels == core_label).astype(np.int64)

    def reach_mask(ds_edges) -> np.ndarray:
        t = pa.concat_tables(
            [
                ray.get(r)
                for r in bfs_broadcast(ds_edges, n_nodes, core, iters=n_nodes)
                .to_arrow_refs()
            ]
        )
        m = np.zeros(n_nodes, dtype=bool)
        m[t["doc_id"].to_numpy(zero_copy_only=False)] = True
        return m

    fwd = reach_mask(edges)
    rev_edges = edges.map_batches(
        lambda t: pa.table(
            {"src": pc.cast(t["dst"], pa.int64()),
             "dst": pc.cast(t["src"], pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    bwd = reach_mask(rev_edges)

    is_core = labels == core_label
    cls = np.where(
        is_core, "core",
        np.where(bwd, "in", np.where(fwd, "out", "other")),
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(n_nodes, dtype=np.int64),
                "cls": pa.array(cls.tolist(), pa.string()),
            }
        )
    )


def _giant_scc_label(labels_ds) -> int:
    """Giant-SCC label (max member count, min label tie-break) without
    collecting the label table: distributed count per label, then a
    per-block top-1 so the driver reduces one row per block."""
    sizes = labels_ds.groupby("scc").count()

    def _top(lab: np.ndarray, cnt: np.ndarray) -> tuple:
        i = int(np.lexsort((lab, -cnt))[0])
        return lab[i: i + 1], cnt[i: i + 1]

    def block_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"scc": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        lab, cnt = _top(
            t["scc"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["count()"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"scc": lab, "c": cnt})

    tops = pa.concat_tables(
        sizes.map_batches(block_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).combine_chunks()
    if tops.num_rows == 0:
        raise ValueError("bowtie: empty node set")
    lab, _ = _top(  # global reduce over one row per block
        tops["scc"].to_numpy(zero_copy_only=False).astype(np.int64),
        tops["c"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    return int(lab[0])


def bowtie_shuffle(edges, n_nodes: int, num_partitions: int = 16,
                   max_rounds: int = 200):
    """Shuffle plan: scc labels ⋈ two Dataset-frontier reach tables."""
    from osm2gtfs_ray.ops.bfs import reach_shuffle

    edges = edges.materialize()
    labels = scc(edges, n_nodes).materialize()  # (doc_id, scc)
    core_label = _giant_scc_label(labels)

    def core_nodes(t: pa.Table, _c=core_label) -> pa.Table:
        f = t.filter(pc.equal(t["scc"], _c))
        return pa.table({"node": pc.cast(f["doc_id"], pa.int64())})

    seeds = labels.map_batches(core_nodes, batch_format="pyarrow")

    fwd = reach_shuffle(edges, n_nodes, seeds, max_rounds=max_rounds,
                        num_partitions=num_partitions)
    rev_edges = edges.map_batches(
        lambda t: pa.table(
            {"src": pc.cast(t["dst"], pa.int64()),
             "dst": pc.cast(t["src"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    bwd = reach_shuffle(rev_edges, n_nodes, seeds, max_rounds=max_rounds,
                        num_partitions=num_partitions)

    from osm2gtfs_ray.ops.joins import compact_for_join

    fk = compact_for_join(
        fwd.map_batches(
            lambda t: pa.table(
                {"doc_id": pc.cast(t["node"], pa.int64()),
                 "f": np.ones(len(t), dtype=np.int64)}
            ),
            batch_format="pyarrow",
        ),
        num_partitions,
    )
    bk = compact_for_join(
        bwd.map_batches(
            lambda t: pa.table(
                {"doc_id": pc.cast(t["node"], pa.int64()),
                 "b": np.ones(len(t), dtype=np.int64)}
            ),
            batch_format="pyarrow",
        ),
        num_partitions,
    )
    joined = labels.join(
        fk, join_type="left_outer", num_partitions=num_partitions,
        on=("doc_id",),
    ).join(
        bk, join_type="left_outer", num_partitions=num_partitions,
        on=("doc_id",),
    )

    def classify(t: pa.Table, _c=core_label) -> pa.Table:
        lab = t["scc"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = pc.fill_null(pc.cast(t["f"], pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        b = pc.fill_null(pc.cast(t["b"], pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        cls = np.where(
            lab == _c, "core",
            np.where(b > 0, "in", np.where(f > 0, "out", "other")),
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "cls": pa.array(cls.tolist(), pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def bowtie(edges, n_nodes: int, broadcast: bool | None = None,
           num_partitions: int = 16, max_rounds: int = 200):
    """Size-aware plan selection (the ops/pagerank.py rule)."""
    if broadcast is None:
        broadcast = n_nodes <= BROADCAST_SCC_ROWS
    if broadcast:
        return bowtie_broadcast(edges, n_nodes)
    return bowtie_shuffle(edges, n_nodes, num_partitions=num_partitions,
                          max_rounds=max_rounds)
