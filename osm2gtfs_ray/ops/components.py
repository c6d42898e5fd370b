"""Distributed connected components over an edge list.

Groups near-duplicate pairs (MinHash/SimHash/cosine output) into
dedup clusters: iterative min-label propagation expressed as Ray Data
groupby rounds — each round every node adopts the smallest label in
its neighborhood; converges in O(diameter) rounds. The per-round
exchange is a groupby(node).min(label) — pre-aggregated, no driver
materialization of the edge set (ray_guide 'Near-dup' pattern; the
union-find alternative is driver-only and needs the candidate set to
be provably small)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min


def connected_components(pairs_ds, max_rounds: int = 20):
    """pairs(a: int64, b: int64) → (node, component) with component =
    min node id of the component. Deterministic."""
    import ray.data

    # undirected edge list, both directions + self loops
    def expand(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        node = np.concatenate([a, b, a, b])
        nbr = np.concatenate([b, a, a, b])
        return pa.table({"node": pa.array(node), "label": pa.array(nbr)})

    labels = (
        pairs_ds.map_batches(expand, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )

    edges = pairs_ds  # static

    for _ in range(max_rounds):
        # join labels onto both edge endpoints (labels table is the
        # small side: one row per distinct node in the pair set)
        from osm2gtfs_ray.ops.joins import broadcast_join

        lab_a = broadcast_join(edges, labels, keys="a", right_keys="node")
        lab_a = lab_a.map_batches(
            lambda t: pa.table({"node": t["b"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        lab_b = broadcast_join(edges, labels, keys="b", right_keys="node")
        lab_b = lab_b.map_batches(
            lambda t: pa.table({"node": t["a"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        self_lab = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        new_labels = (
            lab_a.union(lab_b)
            .union(self_lab)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        new_df = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        old_df = labels.to_pandas().sort_values("node").reset_index(drop=True)
        labels = ray.data.from_pandas(new_df)
        if old_df.equals(new_df):
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )
