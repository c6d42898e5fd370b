"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix) and an IVF-bucketed variant as the
scale path (probe only the nearest coarse centroids — turns the scan
into a cell-keyed lookup exactly like the spatial join's cell index).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def stack_embeddings(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


class CosineTopK:
    """Actor-pool stage: per batch, cosine sims against the broadcast
    query matrix; emits each batch's local top-k (global top-k follows
    with a tiny sort+limit)."""

    def __init__(self, query_ref=None, query: np.ndarray | None = None, k: int = 5):
        if query is None:
            import ray

            query = ray.get(query_ref)
        self.q = np.asarray(query, dtype=np.float64)
        self.qn = self.q / np.linalg.norm(self.q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = stack_embeddings(batch["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        sim = (emb @ self.qn) / norms
        sim_e6 = np.rint(sim * 1e6).astype(np.int64)
        vec_id = batch["vec_id"].to_numpy()
        k = min(self.k, len(sim_e6))
        order = np.lexsort((vec_id, -sim_e6))[:k]
        return pa.table(
            {"vec_id": pa.array(vec_id[order]), "sim_e6": pa.array(sim_e6[order])}
        )


def brute_topk(embeddings_ds, query: np.ndarray, k: int = 5):
    """Exact cosine top-k: local top-k per batch + tiny global sort."""
    import ray

    qref = ray.put(np.asarray(query, dtype=np.float64))
    parts = embeddings_ds.map_batches(
        CosineTopK,
        batch_format="pyarrow",
        fn_constructor_kwargs={"query_ref": qref, "k": k},
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
    return parts.sort(["sim_e6", "vec_id"], descending=[True, False]).limit(k)


class IVFIndexStage:
    """Scale path: assign vectors to their nearest coarse centroid
    (adds ``ivf_cell``); queries then probe only the closest P cells —
    the embedding-space analogue of the spatial cell index. Centroids
    are deterministic (seeded k-means++-style draw, no iteration)."""

    def __init__(self, centroids_ref=None, centroids: np.ndarray | None = None):
        if centroids is None:
            import ray

            centroids = ray.get(centroids_ref)
        c = np.asarray(centroids, dtype=np.float64)
        self.c = c / np.linalg.norm(c, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = stack_embeddings(batch["embedding"])
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ self.c.T
        cell = np.argmax(sims, axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell))


def make_centroids(embeddings_ds, n_centroids: int = 16, sample: int = 4096) -> np.ndarray:
    """Deterministic centroids: first-N distinct sampled vectors by
    vec_id order (stable across partitioning)."""
    head = embeddings_ds.sort("vec_id").limit(n_centroids).to_pandas()
    return np.array(head["embedding"].tolist(), dtype=np.float64)


def ivf_topk(embeddings_ds, query: np.ndarray, centroids: np.ndarray, k: int = 5, n_probe: int = 4):
    """Approximate top-k probing the n_probe nearest IVF cells."""
    import ray

    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    q = np.asarray(query, dtype=np.float64)
    probe = np.argsort(-(c @ (q / np.linalg.norm(q))))[:n_probe]
    cref = ray.put(centroids)
    indexed = embeddings_ds.map_batches(
        IVFIndexStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"centroids_ref": cref},
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
    probe_set = pa.array(probe.astype(np.int64))
    pruned = indexed.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=probe_set)),
        batch_format="pyarrow",
    )
    return brute_topk(pruned, q, k)
