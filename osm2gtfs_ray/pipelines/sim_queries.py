"""Similarity-search and near-dedup queries over embeddings/documents."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from osm2gtfs_ray.sources.tables import read_table, table_path
from osm2gtfs_ray.state.snapshot import sql_guard
from osm2gtfs_ray.stages import ann as ann_mod
from osm2gtfs_ray.stages.dedup import (
    SimHasher,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    verify_jaccard,
)


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Driver-side read of ONE row (the query vector) — tiny."""
    t = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    row = t.filter(pc.equal(t["vec_id"], pa.scalar(vec_id)))
    return np.array(row["embedding"].to_pylist()[0], dtype=np.float64)


# --------------------------------------------------------------------------
# Brute-force cosine top-k (exact baseline; SQL-oracled)
# --------------------------------------------------------------------------

def q_ann_topk(sf_dir: str):
    """Top-5 nearest embeddings to vec 0 by cosine — per-batch local
    top-k against the broadcast query, tiny global sort (O4 argmin at
    k=5, embedding-space analogue of nearest-feature matching)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_mod.brute_topk(emb, _query_vec(sf_dir), k=5)


SQL_ANN_TOPK = """
SELECT e.vec_id,
       CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                         CAST(q.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS sim_e6
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY sim_e6 DESC, e.vec_id
LIMIT 5
"""


# --------------------------------------------------------------------------
# Batched-query ANN (the serving shape): top-3 for EACH of 8 query
# vectors in ONE corpus pass — query matrix broadcast via ray.put, per
# batch one matmul + per-query local top-k, global rank by the
# keep_top_k windowed-rank operator. Corpus streams once no matter how
# many queries ride the batch.
# --------------------------------------------------------------------------

_NQ_BATCH = 8


def q_ann_batch_topk(sf_dir: str):
    import ray

    from osm2gtfs_ray.ops.dedupe import keep_top_k

    # predicate pushed into the read: only row groups containing the
    # query ids are materialized driver-side, not the whole corpus
    qrows = pq.read_table(
        table_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _NQ_BATCH)],
    )
    qids = qrows["vec_id"].to_numpy().astype(np.int64)
    qmat = np.array(qrows["embedding"].to_pylist(), dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    ref = ray.put((qids, qmat))

    def local_topk(t: pa.Table, _ref=ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "neg_sim_e6": pa.array([], pa.int64()),
                }
            )
        ids_q, m = ray.get(_ref)
        e = ann_mod.stack_embeddings(t["embedding"])
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        sims = np.rint(e @ m.T * 1e6).astype(np.int64)  # (rows, nq)
        vids = t["vec_id"].to_numpy().astype(np.int64)
        k = min(3, len(vids))
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            # local prune uses the GLOBAL total order (sim desc, vec_id
            # asc) — pruning on sim alone could drop the tie the final
            # rank would keep
            top = np.lexsort((vids, -col))[:k]
            out_q.append(np.full(len(top), ids_q[j], np.int64))
            out_v.append(vids[top])
            out_s.append(col[top])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "neg_sim_e6": pa.array(-np.concatenate(out_s)),
            }
        )

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    parts = emb.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    top = keep_top_k(parts, key="qid", order_by=["neg_sim_e6", "vec_id"], k=3)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": pc.cast(t["qid"], pa.int64()),
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "sim_e6": pc.multiply(pc.cast(t["neg_sim_e6"], pa.int64()),
                                      pa.scalar(-1, pa.int64())),
                "rnk": pc.cast(t["rnk"], pa.int64()),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


SQL_ANN_BATCH_TOPK = f"""
SELECT qid, vec_id, sim_e6, rnk FROM (
  SELECT q.qid, e.vec_id,
         CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
                    * 1000000) AS BIGINT) AS sim_e6,
         ROW_NUMBER() OVER (
           PARTITION BY q.qid
           ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
                          * 1000000) DESC, e.vec_id
         ) AS rnk
  FROM embeddings e
  CROSS JOIN (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id < {_NQ_BATCH}) q
)
WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# Exact all-pairs cosine near-dup (SQL-oracled at test scale; the LSH
# variant below is the corpus-scale path)
# --------------------------------------------------------------------------

_PAIR_TAU = 0.3  # gives ~1000 verified pairs at sf0.01 (0.5 gave 1 — too thin a check)


def q_cosine_pairs(sf_dir: str):
    """All pairs (a < b) with cosine ≥ _PAIR_TAU: embedding near-dup.

    Physical plan: full matrix broadcast once (ray.put), each batch
    computes its rows' sims against it — O(n²/B) per batch, no
    shuffle. At 10^12 scale the LSH/IVF variant replaces the scan."""
    import ray

    emb_ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids_all = full["vec_id"].to_numpy()
    mat = np.array(full["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat))

    class Pairs:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            e = ann_mod.stack_embeddings(batch["embedding"])
            e = e / np.linalg.norm(e, axis=1, keepdims=True)
            sims = e @ self.m.T
            rows_a, rows_b, rows_s = [], [], []
            for i in range(len(ids)):
                mask = (sims[i] >= _PAIR_TAU) & (self.ids > ids[i])
                js = np.nonzero(mask)[0]
                rows_a.extend([ids[i]] * len(js))
                rows_b.extend(self.ids[js].tolist())
                rows_s.extend(np.rint(sims[i][js] * 1e6).astype(np.int64).tolist())
            return pa.table(
                {
                    "a": pa.array(rows_a, pa.int64()),
                    "b": pa.array(rows_b, pa.int64()),
                    "sim_e6": pa.array(rows_s, pa.int64()),
                }
            )

    return emb_ds.map_batches(Pairs, batch_format="pyarrow", concurrency=(1, 4))


SQL_COSINE_PAIRS = f"""
SELECT a.vec_id AS a, b.vec_id AS b,
       CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS sim_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {_PAIR_TAU}
"""


# --------------------------------------------------------------------------
# MinHash-LSH near-dup (rows-only; recall measured in tests)
# --------------------------------------------------------------------------

MINHASH_CAND_SNAPSHOT = "/tmp/graft_minhash_cand_pairs"


def q_minhash_pairs(sf_dir: str):
    """MinHash+LSH candidate pairs verified by exact shingle Jaccard
    ≥ 0.5 (shingle→minhash→band→bucket-groupby→verify).

    Driver-checkable: the LSH CANDIDATE pair set (hash-derived, itself
    not SQL-reproducible) is snapshotted to parquet, and the oracle
    recomputes the exact-Jaccard VERIFY step over those same pairs
    with string shingles (identical to the engine's 64-bit hash
    shingles up to a ~2^-64-per-pair collision; same integer floor
    arithmetic as SQL_NGRAM_JACCARD). The snapshot is a guarded
    directory (state/snapshot.py): partitioned write above 1M pairs,
    n_src staleness check in the oracle."""
    import ray.data

    from osm2gtfs_ray.state.snapshot import write_snapshot

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cand = lsh_candidate_pairs(docs, num_perm=64, n_bands=16, n_shingle=3)
    snap = write_snapshot(cand, MINHASH_CAND_SNAPSHOT, extra={"n_src": docs.count()})
    if isinstance(snap, pa.Table):
        snap = ray.data.from_arrow(snap)
    return verify_jaccard(snap, docs, n_shingle=3, threshold=0.5)


SQL_MINHASH_PAIRS = rf"""
WITH cand AS (
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
  FROM read_parquet('{MINHASH_CAND_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(MINHASH_CAND_SNAPSHOT, "documents")} = 1
),
ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM ws WHERE len(w) >= 3
),
gr AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g FROM idx
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS g FROM ws WHERE len(w) BETWEEN 1 AND 2
),
sh AS (SELECT DISTINCT doc_id, g FROM gr),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT cd.a, cd.b, COUNT(*) AS c
  FROM cand cd
  JOIN sh x ON x.doc_id = cd.a
  JOIN sh y ON y.doc_id = cd.b AND y.g = x.g
  GROUP BY 1, 2
)
SELECT i.a, i.b,
       CAST((i.c * 1000000) // (sa.n + sb.n - i.c) AS BIGINT) AS jaccard_e6
FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE (i.c * 1000000) >= 500000 * (sa.n + sb.n - i.c)
ORDER BY a, b
"""


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup (SQL-oracled: string-keyed shingles are
# collision-free, so DuckDB's inverted-index self-join reproduces the
# two-shuffle Ray plan bit-for-bit)
# --------------------------------------------------------------------------

def q_ngram_jaccard(sf_dir: str):
    """All doc pairs with word-3-gram Jaccard ≥ 0.5 — the exact
    inverted-index plan (vs minhash_pairs' LSH approximation of the
    same similarity)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, n=3, threshold=0.5)


SQL_NGRAM_JACCARD = r"""
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM ws WHERE len(w) >= 3
),
gr AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g FROM idx
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS g FROM ws WHERE len(w) BETWEEN 1 AND 2
),
sh AS (SELECT DISTINCT doc_id, g FROM gr),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
       CAST((i.c * 1000000) // (sa.n + sb.n - i.c) AS BIGINT) AS jaccard_e6
FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE (i.c * 1000000) // (sa.n + sb.n - i.c) >= 500000
ORDER BY a, b
"""


# --------------------------------------------------------------------------
# SimHash fingerprints (rows-only; determinism asserted in tests)
# --------------------------------------------------------------------------

def q_simhash(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(SimHasher(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "simhash"])


# --------------------------------------------------------------------------
# LSH-bucketed cosine near-dup (the 10^12-scale path: banded
# random-hyperplane signatures -> sharded bucket shuffle -> distributed
# exact verify; rows-only — recall/precision vs the brute scan are
# pytest-asserted in tests/test_ops.py)
# --------------------------------------------------------------------------

def q_cosine_lsh(sf_dir: str):
    """LSH band width sized to the corpus — the parameter that decides
    whether banded LSH survives scale. Expected candidate volume is
    ~n²/2 · b · E[p_rand^r] with p_rand ≈ 0.5 for unrelated vectors, so
    bits-per-band r must grow with log2(n) to keep buckets selective:

    - n ≤ 20k (sf ≤ 0.01 driver check): tau=0.4, 10 bands × 3 bits —
      collision p=0.631 at θ(0.4), recall 1-(1-p³)^10 ≈ 0.94, sized so
      the check covers the ~59 true pairs sf0.01 contains (max pairwise
      cosine there is 0.51). 3-bit bands are affordable ONLY at this n
      (8 buckets/band ⇒ ~n²/16 candidates per band).
    - n > 20k: production near-dup point tau=0.7, 5 bands × 12 bits —
      4096 buckets/band caps random collisions at ~0.5¹²·n²/2·5
      (≈1.4M candidates at n=50k vs ~1.5B with 3-bit bands, measured
      131 s → seconds). Recall concentrates where near-dups live:
      ≈0.6 at cos 0.9, ≈0.8 at 0.95; raise n_bands to buy recall at
      linear candidate cost. sig packs into one uint64, so r·b ≤ 64.
    """
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = emb.count()  # parquet metadata — no scan

    def factory():
        return read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # the snapshot is written on BOTH branches (with the branch's tau
    # embedded) so the static oracle SQL always verifies the run that
    # actually happened — no stale-file hazard across sf scales
    if n <= 20_000:
        tau, n_bits, n_bands = 0.4, 30, 10
    else:
        tau, n_bits, n_bands = 0.7, 60, 5
    return ann_mod.cosine_lsh_pairs(
        factory, tau=tau, n_bits=n_bits, n_bands=n_bands,
        snapshot_path=COSINE_CAND_SNAPSHOT,
        snapshot_extra={"n_src": n, "tau_e6": int(round(tau * 1e6))},
    )


COSINE_CAND_SNAPSHOT = "/tmp/graft_cosine_cand_pairs"

# Exact-cosine verify over the snapshotted candidate pairs. tau is read
# FROM the snapshot (each q_cosine_lsh branch embeds its own), and the
# n_src guard fails loudly on a snapshot from another sf. The engine's
# float64 normalize-then-dot and DuckDB's dot-over-norms agree to
# ~1e-15 relative, far inside the e6 rounding grid, so sim_e6 values
# hash-match.
SQL_COSINE_LSH = f"""
WITH cand AS (
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
  FROM read_parquet('{COSINE_CAND_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(COSINE_CAND_SNAPSHOT, "embeddings")} = 1
),
tau AS (
  SELECT MIN(tau_e6) / 1000000.0 AS t
  FROM read_parquet('{COSINE_CAND_SNAPSHOT}/*.parquet')
),
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
sims AS (
  SELECT c.a, c.b, list_cosine_similarity(ea.emb, eb.emb) AS sim
  FROM cand c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b
)
SELECT a, b, CAST(ROUND(sim * 1000000) AS BIGINT) AS sim_e6
FROM sims WHERE sim >= (SELECT t FROM tau) ORDER BY a, b
"""


# --------------------------------------------------------------------------
# IVF approximate top-k, with an exact SQL oracle: centroids are the
# deterministic first-16 vectors by vec_id, assignment is argmax
# cosine with first-max tie-break (np.argmax ↔ ORDER BY sim DESC, cid
# LIMIT 1), probe = top-4 centroids for the query — every step is
# order-deterministic, so DuckDB (list_cosine_similarity) reproduces
# the probe set and the pruned top-5 bit-for-bit at e6 rounding.
# --------------------------------------------------------------------------

SQL_ANN_IVF = """
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, CAST(embedding AS DOUBLE[]) AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cents, q ORDER BY list_cosine_similarity(c, qe) DESC, cid LIMIT 4
),
assign AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb,
         (SELECT cid FROM cents
          ORDER BY list_cosine_similarity(cents.c, CAST(e.embedding AS DOUBLE[])) DESC, cid
          LIMIT 1) AS cell
  FROM embeddings e
)
SELECT a.vec_id,
       CAST(ROUND(list_cosine_similarity(a.emb, q.qe) * 1000000) AS BIGINT) AS sim_e6
FROM assign a, q
WHERE a.cell IN (SELECT cid FROM probe)
ORDER BY sim_e6 DESC, a.vec_id
LIMIT 5
"""


def q_ann_ivf(sf_dir: str):
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = ann_mod.make_centroids(emb, n_centroids=16)
    return ann_mod.ivf_topk(emb, _query_vec(sf_dir), cents, k=5, n_probe=4)


KMEANS_CENTROIDS_SNAPSHOT = "/tmp/graft_kmeans_centroids"


def q_ann_ivf_kmeans(sf_dir: str):
    """IVF with Lloyd-refined spherical centroids (3 distributed
    iterations over the materialized embedding table) — the production
    training step ann_ivf's first-N shortcut stands in for.

    Driver-checkable: the TRAINED centroids (16 × 64 doubles — the
    only non-SQL-expressible artifact) are snapshotted to parquet, and
    the oracle re-runs the probe/assign/top-k step over them with the
    same argmax/tie-break as SQL_ANN_IVF. The Lloyd refinement itself
    stays pytest-asserted (objective improvement, recall,
    determinism)."""
    from osm2gtfs_ray.state.snapshot import write_snapshot

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    cents = ann_mod.kmeans_centroids(emb, n_centroids=16, n_iters=3)
    write_snapshot(
        pa.table(
            {
                "cid": pa.array(np.arange(len(cents), dtype=np.int64)),
                "c": pa.array([row.tolist() for row in cents], pa.list_(pa.float64())),
            }
        ),
        KMEANS_CENTROIDS_SNAPSHOT,
        extra={"n_src": emb.count()},
    )
    return ann_mod.ivf_topk(emb, _query_vec(sf_dir), cents, k=5, n_probe=4)


SQL_ANN_IVF_KMEANS = f"""
WITH cents AS (
  SELECT cid, CAST(c AS DOUBLE[]) AS c
  FROM read_parquet('{KMEANS_CENTROIDS_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(KMEANS_CENTROIDS_SNAPSHOT, "embeddings")} = 1
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cents, q ORDER BY list_cosine_similarity(c, qe) DESC, cid LIMIT 4
),
assign AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb,
         (SELECT cid FROM cents
          ORDER BY list_cosine_similarity(cents.c, CAST(e.embedding AS DOUBLE[])) DESC, cid
          LIMIT 1) AS cell
  FROM embeddings e
)
SELECT a.vec_id,
       CAST(ROUND(list_cosine_similarity(a.emb, q.qe) * 1000000) AS BIGINT) AS sim_e6
FROM assign a, q
WHERE a.cell IN (SELECT cid FROM probe)
ORDER BY sim_e6 DESC, a.vec_id
LIMIT 5
"""


# --------------------------------------------------------------------------
# JSON prop extraction (M-family parser) — SQL-oracled
# --------------------------------------------------------------------------

def q_props_extract(sf_dir: str):
    """Parse events.props JSON ({"k": int}) with a vectorized re2
    kernel; sum k per event_type (the M14/M16 parser family)."""
    from ray.data.aggregate import Count, Sum

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])

    def f(t: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)'), "k"
        )
        return pa.table(
            {"event_type": t["event_type"], "k": pc.cast(k, pa.int64())}
        )

    agg = (
        ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "sum_k": pc.cast(t["sum_k"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_PROPS_EXTRACT = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# SimHash near-dup pairs — EXACT hamming ≤ 3 via 4×16-bit banding
# (pigeonhole recall = 1.0; stages/dedup.simhash_pairs). The blake2b
# word hash inside the signature is not SQL-reproducible, so the sigs
# are snapshotted and the oracle re-derives the ENTIRE pair set from
# them: all (a<b) with bit_count(xor(sig_a, sig_b)) ≤ 3 — verifying
# banding, bucketing, pairing, dedup AND the hamming verify.
# --------------------------------------------------------------------------

SIMHASH_SIGS_SNAPSHOT = "/tmp/graft_simhash_sigs"


def q_simhash_pairs(sf_dir: str):
    from osm2gtfs_ray.stages.dedup import simhash_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = simhash_pairs(docs, max_hamming=3, n_bands=4,
                          snapshot_path=SIMHASH_SIGS_SNAPSHOT)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "hamming": pc.cast(t["hamming"], pa.int64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


SQL_SIMHASH_PAIRS = f"""
WITH sigs AS (
  SELECT doc_id, CAST(simhash AS UBIGINT) AS sig
  FROM read_parquet('{SIMHASH_SIGS_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(SIMHASH_SIGS_SNAPSHOT, "documents")} = 1
)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.sig, y.sig)) <= 3
"""


# --------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss, Rademacher ±1 / sqrt(k)):
# deterministic dimensionality reduction 64 → 8. The projection matrix
# is derived position-wise from the repo's splitmix64 — KBs at ANY
# input dimensionality — so it is embedded in the map closure (pure
# map stage, no shuffle) AND re-derived bit-identically inside the SQL
# oracle via the same finalizer expression (flagship_oracle._s_mix64,
# the machinery already proven by sample_split / spatial_join).
# --------------------------------------------------------------------------

_RP_K = 8


def _rp_signs(d: int, k: int) -> np.ndarray:
    from osm2gtfs_ray.sources.pages import mix64

    h = mix64(np.arange(d * k, dtype=np.uint64))
    return np.where((h & np.uint64(1)) == 0, 1.0, -1.0).reshape(d, k)


def q_random_projection(sf_dir: str, k: int = _RP_K):
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # dimensionality from ONE row group's first row — never the full
    # column on the driver (list<float> here; a fixed_size_list schema
    # would carry it in the type itself)
    pf = pq.ParquetFile(table_path(sf_dir, "embeddings"))
    first = pf.read_row_group(0, columns=["embedding"])["embedding"]
    dim = len(first.chunk(0)[0])
    P = _rp_signs(dim, k) / np.sqrt(k)

    def project(t: pa.Table) -> pa.Table:
        E = ann_mod.stack_embeddings(t["embedding"])
        out = E @ P
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(vid)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, k), pa.int64()),
                "dim": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
                "value_e6": pa.array(
                    np.trunc(
                        out.ravel() * 1e6 + np.copysign(0.5, out.ravel())
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return emb.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _sql_random_projection() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_mix64

    mix = _s_mix64(f"CAST(i * {_RP_K} + j AS UBIGINT)")
    # the splitmix sign expression is a long bigint-twiddle chain:
    # evaluate it ONCE per projection-matrix cell (d×k rows) in its own
    # CTE and JOIN, never per exploded embedding element — the naive
    # form cost 14.6 s of the whole verify suite at sf0.01
    return f"""
WITH d AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
p AS (
  SELECT i, j,
         CASE WHEN ({mix}) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT unnest(generate_series(0, (SELECT d FROM d) - 1)) AS i),
       (SELECT unnest(generate_series(0, {_RP_K - 1})) AS j)
),
e AS (
  SELECT vec_id, CAST(embedding[i + 1] AS DOUBLE) AS x, i
  FROM (
    SELECT vec_id, embedding,
           unnest(generate_series(0, len(embedding) - 1)) AS i
    FROM embeddings
  )
)
SELECT vec_id, CAST(j AS BIGINT) AS dim,
       CAST(ROUND(SUM(x * s) / SQRT({_RP_K}.0) * 1e6) AS BIGINT) AS value_e6
FROM e JOIN p USING (i) GROUP BY vec_id, j
"""


SQL_RANDOM_PROJECTION = _sql_random_projection()


# --------------------------------------------------------------------------
# Product-quantized ANN (ADC search over PQ codes) — SQL-oracled
# --------------------------------------------------------------------------
# stages/ann.py's PQ section has the design notes. The codebook (the
# only non-SQL-derivable artifact — integer Lloyd on the bounded
# training sample) is snapshotted; the oracle RE-DERIVES everything
# downstream of it from the raw embeddings table: e6 quantization,
# per-subspace code assignment (argmin d2, lowest-cid ties), the
# query's ADC lookup table (= the assignment-distance rows of the
# query vector itself), and the fused top-k — so encode AND search are
# both verified bit-for-bit. Lloyd itself stays pytest-asserted
# (objective monotonicity, determinism, scalar reference).

PQ_SNAPSHOT = "/tmp/graft_pq_codebook"
PQ_M = 8          # subspaces (64-dim corpus → 8 dims each)
PQ_KC = 16        # centroids per subspace → 4-bit codes, 8 B/vector
PQ_DSUB = 8
PQ_TOPK = 10
PQ_TRAIN_N = 4096  # bounded training sample: vec_id < N, pushed down


def _pq_codebook(sf_dir: str, snapshot_path: str) -> np.ndarray:
    """Train the PQ codebook on the bounded deterministic sample
    (row-group predicate pushdown — O(1) in corpus size, per the
    PQ-literature practice of sample-trained codebooks) and snapshot
    it for the SQL oracle."""
    from osm2gtfs_ray.state.snapshot import write_snapshot

    sample = pq.read_table(
        table_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", PQ_TRAIN_N)],
    ).sort_by("vec_id")
    cents = ann_mod.pq_train(
        ann_mod.quantize_e6(ann_mod.stack_embeddings(sample["embedding"])),
        m=PQ_M, k=PQ_KC, n_iters=4,
    )

    n_src = pq.ParquetFile(table_path(sf_dir, "embeddings")).metadata.num_rows
    write_snapshot(
        pa.table(
            {
                "sub": pa.array(
                    np.repeat(np.arange(PQ_M, dtype=np.int64), PQ_KC)
                ),
                "cid": pa.array(np.tile(np.arange(PQ_KC, dtype=np.int64), PQ_M)),
                "c": pa.array(
                    [row.tolist() for s in range(PQ_M) for row in cents[s]],
                    pa.list_(pa.int64()),
                ),
            }
        ),
        snapshot_path,
        extra={"n_src": n_src},
    )
    return cents


def q_ann_pq(sf_dir: str):
    """(vec_id, adc_d2) — approximate top-10 nearest to query vec 0 by
    asymmetric-distance computation over 8×4-bit PQ codes."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = _pq_codebook(sf_dir, PQ_SNAPSHOT)
    return ann_mod.pq_adc_topk(emb, _query_vec(sf_dir), cents, k=PQ_TOPK)


SQL_ANN_PQ = f"""
WITH cb AS (
  SELECT CAST(sub AS BIGINT) AS sub, CAST(cid AS BIGINT) AS cid, c
  FROM read_parquet('{PQ_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(PQ_SNAPSHOT, "embeddings")} = 1
),
e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
d AS MATERIALIZED (
  SELECT e.vec_id, cb.sub, cb.cid,
         SUM((e.v[cb.sub * {PQ_DSUB} + t.i] - cb.c[t.i])
             * (e.v[cb.sub * {PQ_DSUB} + t.i] - cb.c[t.i])) AS d2
  FROM e CROSS JOIN cb,
       LATERAL (SELECT unnest(generate_series(1, {PQ_DSUB})) AS i) t
  GROUP BY e.vec_id, cb.sub, cb.cid
),
codes AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT vec_id, sub, cid,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC
           ) AS rn
    FROM d
  ) WHERE rn = 1
),
lut AS (SELECT sub, cid, d2 FROM d WHERE vec_id = 0),
adc AS (
  SELECT c.vec_id, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.cid = c.code
  GROUP BY c.vec_id
)
SELECT vec_id, adc_d2 FROM adc ORDER BY adc_d2 ASC, vec_id ASC LIMIT {PQ_TOPK}
"""


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine
# --------------------------------------------------------------------------
# The standard two-retriever fusion (Cormack, Clarke & Buettcher,
# "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
# Learning Methods", SIGIR 2009): each retriever contributes
# 1/(C + rank) per document; documents surfaced by several lists (or
# ranked high in one) float to the top with no score calibration
# between the lexical and dense sides. Lists here: every BM25
# query-term top-k list (text_queries.q_bm25_topk — QN × K rows) plus
# the dense cosine top-N list against query vector 0 (vec_id ≡ doc_id
# in this corpus). Scores are exact integers: 10^9 // (C + rank).
#
# Scale shape: both inputs are already top-k lists — bounded by
# CONSTRUCTION at any corpus size (QN·K + N rows total), so the fusion
# itself is a driver-side merge of a few dozen rows by design, not a
# gated shortcut; all the heavy lifting (the BM25 shuffles, the dense
# scan) lives in the two upstream operators, each with its own scale
# plan.

RRF_C = 60
RRF_SCALE = 10**9
RRF_DENSE_N = 20   # dense list length
RRF_K = 20         # fused results returned


def q_rrf_fusion(sf_dir: str):
    """(doc_id, n_hits, rrf_fp) — top-20 fused BM25 ⊕ dense-cosine."""
    import ray.data

    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.pipelines.text_queries import q_bm25_topk

    bm = _as_arrow(q_bm25_topk(sf_dir).select_columns(["doc_id", "rank"]))

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dense_top = _as_arrow(
        ann_mod.brute_topk(emb, _query_vec(sf_dir), k=RRF_DENSE_N)
    )  # already sorted (sim_e6 desc, vec_id asc) — rank = position
    dense = pa.table(
        {
            "doc_id": pc.cast(dense_top["vec_id"], pa.int64()),
            "rank": pa.array(
                np.arange(1, dense_top.num_rows + 1, dtype=np.int64)
            ),
        }
    )

    lists = pa.concat_tables(
        [bm.set_column(1, "rank", pc.cast(bm["rank"], pa.int64())), dense]
    )
    did = lists["doc_id"].to_numpy(zero_copy_only=False)
    score = RRF_SCALE // (RRF_C + lists["rank"].to_numpy(zero_copy_only=False))
    agg = (
        pd.DataFrame({"doc_id": did, "rrf_fp": score})
        .groupby("doc_id", as_index=False)
        .agg(n_hits=("rrf_fp", "size"), rrf_fp=("rrf_fp", "sum"))
        .sort_values(["rrf_fp", "doc_id"], ascending=[False, True],
                     kind="mergesort")
        .head(RRF_K)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
                "n_hits": pa.array(agg["n_hits"].to_numpy(np.int64)),
                "rrf_fp": pa.array(agg["rrf_fp"].to_numpy(np.int64)),
            }
        )
    )


def sql_rrf_fusion() -> str:
    from osm2gtfs_ray.pipelines.text_queries import SQL_BM25_TOPK

    return f"""
WITH bm AS ({SQL_BM25_TOPK}),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY sim_e6 DESC, vec_id ASC) AS BIGINT)
           AS rank
  FROM (
    SELECT e.vec_id,
           CAST(ROUND(list_cosine_similarity(
             CAST(e.embedding AS DOUBLE[]), q.qe) * 1000000) AS BIGINT)
             AS sim_e6
    FROM embeddings e, q
  )
  ORDER BY rank LIMIT {RRF_DENSE_N}
),
lists AS (
  SELECT doc_id, rank FROM bm
  UNION ALL
  SELECT doc_id, rank FROM dense
),
fused AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(SUM({RRF_SCALE} // ({RRF_C} + rank)) AS BIGINT) AS rrf_fp
  FROM lists GROUP BY doc_id
)
SELECT doc_id, n_hits, rrf_fp
FROM fused ORDER BY rrf_fp DESC, doc_id ASC LIMIT {RRF_K}
"""


# --------------------------------------------------------------------------
# IVF-PQ (IVFADC): coarse probe + PQ asymmetric-distance ranking
# --------------------------------------------------------------------------
# The composition production ANN actually ships (FAISS IVFADC; Jégou
# et al. 2011 §IV): the coarse IVF quantizer prunes the corpus to the
# query's n_probe cells, then PQ codes rank ONLY the survivors — at
# 100 TB neither raw floats nor the full code table is scanned per
# query. Coarse side = the deterministic first-16 centroids with
# cosine argmax assignment (SQL_ANN_IVF's exact semantics); ADC side =
# SQL_ANN_PQ's integer arithmetic over this query's own codebook
# snapshot (independent path — gate order between ann_pq and
# ann_ivfpq never matters). The oracle composes both verbatim; `e`
# always includes vec 0 so the LUT exists even if the query's own
# cell were somehow un-probed.

IVFPQ_SNAPSHOT = "/tmp/graft_ivfpq_codebook"
IVFPQ_NPROBE = 4


def q_ann_ivfpq(sf_dir: str):
    """(vec_id, adc_d2) — top-10 by ADC within the 4 probed IVF cells."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    coarse = ann_mod.make_centroids(emb, n_centroids=16)
    cents = _pq_codebook(sf_dir, IVFPQ_SNAPSHOT)
    return ann_mod.ivfpq_topk(
        emb, _query_vec(sf_dir), coarse, cents,
        k=PQ_TOPK, n_probe=IVFPQ_NPROBE,
    )


SQL_ANN_IVFPQ = f"""
WITH cb AS (
  SELECT CAST(sub AS BIGINT) AS sub, CAST(cid AS BIGINT) AS cid, c
  FROM read_parquet('{IVFPQ_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(IVFPQ_SNAPSHOT, "embeddings")} = 1
),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ccid,
         CAST(embedding AS DOUBLE[]) AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT ccid FROM cents, q
  ORDER BY list_cosine_similarity(c, qe) DESC, ccid LIMIT {IVFPQ_NPROBE}
),
kept AS (
  SELECT e.vec_id FROM embeddings e
  WHERE (SELECT ccid FROM cents
         ORDER BY list_cosine_similarity(
           cents.c, CAST(e.embedding AS DOUBLE[])) DESC, ccid
         LIMIT 1) IN (SELECT ccid FROM probe)
),
e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
  WHERE vec_id IN (SELECT vec_id FROM kept) OR vec_id = 0
),
d AS MATERIALIZED (
  SELECT e.vec_id, cb.sub, cb.cid,
         SUM((e.v[cb.sub * {PQ_DSUB} + t.i] - cb.c[t.i])
             * (e.v[cb.sub * {PQ_DSUB} + t.i] - cb.c[t.i])) AS d2
  FROM e CROSS JOIN cb,
       LATERAL (SELECT unnest(generate_series(1, {PQ_DSUB})) AS i) t
  GROUP BY e.vec_id, cb.sub, cb.cid
),
codes AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT vec_id, sub, cid,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC
           ) AS rn
    FROM d
  ) WHERE rn = 1
),
lut AS (SELECT sub, cid, d2 FROM d WHERE vec_id = 0),
adc AS (
  SELECT c.vec_id, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
  FROM codes c
  JOIN kept k ON k.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.cid = c.code
  GROUP BY c.vec_id
)
SELECT vec_id, adc_d2 FROM adc ORDER BY adc_d2 ASC, vec_id ASC LIMIT {PQ_TOPK}
"""


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: cluster-bounded near-dup removal)
# --------------------------------------------------------------------------
# Abbas et al. 2023 ("SemDeDup"): k-means the embedding space, then
# look for near-duplicates ONLY within each cluster — the candidate
# set drops from O(n^2) to sum of per-cluster squares, and at corpus
# scale n_centroids grows with the corpus so cluster size stays
# bounded (SEM_MAX_CLUSTER guard raises rather than silently doing a
# quadratic blow-up, same discipline as co_travelers' bucket cap).
# Members of each within-cluster duplicate component are removed in
# favor of the min-vec_id canonical.
#
# Driver-checkable like q_ann_ivf_kmeans: the trained centroids are
# snapshotted, and the oracle replays assignment (same argmax /
# first-max tie-break), within-cluster pairing, and the component
# closure (WITH RECURSIVE min-label reach) in SQL. Engine plan: ONE
# cluster-hash shuffle after the broadcast-centroid assignment map;
# per-cluster pairwise cosine is a local matmul; components never
# cross clusters by construction, so union-find is shard-local.

SEMDEDUP_CENTROIDS_SNAPSHOT = "/tmp/graft_semdedup_centroids"
SEM_TAU = 0.3
SEM_MAX_CLUSTER = 8192


def q_semantic_dedup(sf_dir: str):
    """(vec_id, canonical_id) for every vector removed by semantic
    dedup — non-canonical members of within-cluster cosine>=tau
    components."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.state.snapshot import write_snapshot

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    cents = ann_mod.kmeans_centroids(emb, n_centroids=16, n_iters=3)
    write_snapshot(
        pa.table(
            {
                "cid": pa.array(np.arange(len(cents), dtype=np.int64)),
                "c": pa.array([row.tolist() for row in cents], pa.list_(pa.float64())),
            }
        ),
        SEMDEDUP_CENTROIDS_SNAPSHOT,
        extra={"n_src": emb.count()},
    )
    indexed = emb.map_batches(
        ann_mod.IVFIndexStage(centroids=cents),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def cluster_dedup(g: pd.DataFrame) -> pd.DataFrame:
        out_v: list[int] = []
        out_c: list[int] = []
        for _, sub in g.groupby("ivf_cell", sort=True):
            if len(sub) > SEM_MAX_CLUSTER:
                raise ValueError(
                    f"cluster size {len(sub)} > {SEM_MAX_CLUSTER}; raise "
                    "n_centroids so per-cluster pairing stays bounded"
                )
            order = np.argsort(sub["vec_id"].to_numpy(np.int64), kind="stable")
            ids = sub["vec_id"].to_numpy(np.int64)[order]
            m = np.vstack(sub["embedding"].to_numpy()[order]).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            m = m / norms
            sims = m @ m.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= SEM_TAU
            parent = np.arange(len(ids), dtype=np.int64)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for i, j in zip(iu[hit], ju[hit]):
                ri, rj = find(int(i)), find(int(j))
                if ri != rj:
                    # union by min index keeps the root = min vec_id
                    lo, hi = (ri, rj) if ri < rj else (rj, ri)
                    parent[hi] = lo
            for i, j in zip(iu[hit], ju[hit]):  # touched nodes only
                for x in (int(i), int(j)):
                    r = find(x)
                    if r != x:
                        out_v.append(int(ids[x]))
                        out_c.append(int(ids[r]))
        df = pd.DataFrame({"vec_id": out_v, "canonical_id": out_c})
        return df.drop_duplicates().astype(np.int64)

    return sharded_map_groups(
        indexed.select_columns(["vec_id", "embedding", "ivf_cell"]),
        "ivf_cell",
        cluster_dedup,
    )


def sql_semantic_dedup() -> str:
    return f"""
WITH RECURSIVE cents AS (
  SELECT cid, CAST(c AS DOUBLE[]) AS c
  FROM read_parquet('{SEMDEDUP_CENTROIDS_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(SEMDEDUP_CENTROIDS_SNAPSHOT, "embeddings")} = 1
),
assign AS MATERIALIZED (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb,
         (SELECT cid FROM cents
          ORDER BY list_cosine_similarity(cents.c, CAST(e.embedding AS DOUBLE[])) DESC, cid
          LIMIT 1) AS cell
  FROM embeddings e
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.emb, b.emb) >= {SEM_TAU}
),
sym AS (
  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
  UNION SELECT a, a FROM pairs UNION SELECT b, b FROM pairs
),
reach(node, m) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON r.m = s.a
)
SELECT CAST(node AS BIGINT) AS vec_id, CAST(MIN(m) AS BIGINT) AS canonical_id
FROM reach GROUP BY node HAVING node != MIN(m)
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# Embedding Gram / covariance matrix (PCA & whitening prep)
# --------------------------------------------------------------------------
# The second-moment matrix G[i,j] = Σ_rows v_i · v_j over e6-quantized
# embeddings — the distributed step of PCA, ZCA whitening, and linear
# probes. The map side is a single int64 matmul per batch (V.T @ V —
# a (d×n)(n×d) BLAS call, the textbook mergeable partial: G = Σ G_b);
# the (d×d) partials are merged with PYTHON INTS on the driver, so the
# accumulated sum cannot wrap however many rows the corpus has (each
# per-batch partial is int64-safe: |v| < 2^21 e6-units ⇒ products
# < 2^42, × batch rows ≤ 2^20 stays < 2^62; the cross-batch total is
# where int64 would eventually wrap — hence big-int merge, the
# spike_days / vocab-diversity lesson). Output: the upper triangle as
# (i, j, s) rows, 1-based to match SQL list indexing.

GRAM_DIM = 64


def q_gram_matrix(sf_dir: str):
    """(i, j, s): upper-triangle entries of the e6-quantized embedding
    Gram matrix."""
    import pandas as pd
    import ray.data

    emb = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        v = ann_mod.quantize_e6(ann_mod.stack_embeddings(t["embedding"]))
        g = v.T @ v  # int64 BLAS; safe per batch (see module comment)
        iu, ju = np.triu_indices(GRAM_DIM)
        return pa.table(
            {
                "i": pa.array(iu + 1, pa.int64()),
                "j": pa.array(ju + 1, pa.int64()),
                "s": pa.array(g[iu, ju], pa.int64()),
            }
        )

    parts_df = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    # big-int merge of the bounded (d x d) partials
    acc: dict[tuple[int, int], int] = {}
    for i, j, s in zip(parts_df["i"], parts_df["j"], parts_df["s"]):
        key = (int(i), int(j))
        acc[key] = acc.get(key, 0) + int(s)
    keys = sorted(acc)
    out = pd.DataFrame(
        {
            "i": [k[0] for k in keys],
            "j": [k[1] for k in keys],
            "s": [acc[k] for k in keys],
        }
    )
    if (out["s"].abs() >= 2**63).any():
        raise OverflowError("gram entries exceed int64; widen output encoding")
    return ray.data.from_pandas(out.astype(np.int64))


SQL_GRAM_MATRIX = f"""
WITH e AS (
  SELECT list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
idx AS (SELECT unnest(generate_series(1, {GRAM_DIM})) AS i)
SELECT a.i AS i, b.i AS j,
       CAST(SUM(CAST(e.v[a.i] AS HUGEINT) * e.v[b.i]) AS BIGINT) AS s
FROM e, idx a, idx b
WHERE a.i <= b.i
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Retrieval evaluation: recall@k and MRR of IVF search vs exact gold
# --------------------------------------------------------------------------
# The eval-harness operator every ANN deployment needs: for a batch of
# Q query vectors, compute the EXACT cosine top-k (gold) and the IVF
# probe-pruned top-k (system), then per query the overlap (recall@k,
# fixed point) and the reciprocal rank of the first relevant system
# hit (MRR, exact rational SCALE // rank). Both lists rank by
# (sim_e6 DESC, vec_id) — the e6-rounded grid is where engine (numpy
# normalized matmul) and oracle (list_cosine_similarity) provably
# agree, the q_ann_ivf precedent.
#
# Scale shape: ONE distributed sims pass emits (qid, vec_id, sim_e6,
# cell) with the Q-vector matrix broadcast; gold and system lists are
# two keep_top_k passes over it (map-side k-per-key combine, so the
# shuffle moves O(k·Q·blocks) rows); the final set-compare touches
# 2·Q·k rows on the driver.

ANN_EVAL_Q = 8
ANN_EVAL_K = 10
ANN_EVAL_NPROBE = 4
EVAL_SCALE = 1_000_000


def q_ann_recall(sf_dir: str):
    """(qid, n_hits, recall_fp, mrr_fp) for Q=8 query vectors: IVF
    top-k vs exact gold top-k."""
    import pandas as pd
    import ray
    import ray.data

    from osm2gtfs_ray.ops.dedupe import keep_top_k

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    qmat = ann_mod.make_centroids(emb, n_centroids=ANN_EVAL_Q)
    cents = ann_mod.make_centroids(emb, n_centroids=16)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    # probe sets: top NPROBE cells per query, (sim DESC, cid) order
    qc = qn @ cn.T
    probe_mask = np.zeros((ANN_EVAL_Q, len(cents)), dtype=bool)
    for qi in range(ANN_EVAL_Q):
        order = np.lexsort((np.arange(len(cents)), -qc[qi]))
        probe_mask[qi, order[:ANN_EVAL_NPROBE]] = True
    ref = ray.put((qn, cn, probe_mask))

    def sims_batch(t: pa.Table) -> pa.Table:
        q, c, _ = ray.get(ref)
        e = ann_mod.stack_embeddings(t["embedding"])
        norms = np.linalg.norm(e, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        en = e / norms
        sims = en @ q.T  # (n, Q)
        cell = np.argmax(en @ c.T, axis=1).astype(np.int64)
        n = len(t)
        vec = t["vec_id"].to_numpy(zero_copy_only=False)
        qid = np.tile(np.arange(ANN_EVAL_Q, dtype=np.int64), n)
        return pa.table(
            {
                "qid": qid,
                "vec_id": np.repeat(vec, ANN_EVAL_Q),
                "sim_e6": np.rint(sims.ravel() * 1e6).astype(np.int64),
                "cell": np.repeat(cell, ANN_EVAL_Q),
            }
        )

    sims = emb.map_batches(sims_batch, batch_format="pyarrow").materialize()

    def add_neg(b):
        out = b.copy(deep=False)
        out["neg"] = -out["sim_e6"]
        return out

    ranked_cols = ["neg", "vec_id"]
    gold = keep_top_k(
        sims.map_batches(add_neg, batch_format="pandas"),
        "qid", ranked_cols, ANN_EVAL_K,
    ).to_pandas()

    def probe_filter(b: pd.DataFrame) -> pd.DataFrame:
        _, _, pm = ray.get(ref)
        keep = pm[b["qid"].to_numpy(np.int64), b["cell"].to_numpy(np.int64)]
        out = b[keep].copy(deep=False)
        out["neg"] = -out["sim_e6"]
        return out

    appr = keep_top_k(
        sims.map_batches(probe_filter, batch_format="pandas"),
        "qid", ranked_cols, ANN_EVAL_K,
    ).to_pandas()

    rows = []
    for qi in range(ANN_EVAL_Q):
        gset = set(gold.loc[gold["qid"] == qi, "vec_id"])
        a = appr[appr["qid"] == qi].sort_values("rnk")
        hits = int(a["vec_id"].isin(gset).sum())
        in_gold = a[a["vec_id"].isin(gset)]
        mrr = EVAL_SCALE // int(in_gold["rnk"].iloc[0]) if len(in_gold) else 0
        rows.append(
            (qi, hits, hits * EVAL_SCALE // ANN_EVAL_K, mrr)
        )
    out = pd.DataFrame(
        rows, columns=["qid", "n_hits", "recall_fp", "mrr_fp"]
    ).astype(np.int64)
    return ray.data.from_pandas(out)


SQL_ANN_RECALL = f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         CAST(embedding AS DOUBLE[]) AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
qs AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {ANN_EVAL_Q}
),
assign AS MATERIALIZED (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb,
         (SELECT cid FROM cents
          ORDER BY list_cosine_similarity(cents.c, CAST(e.embedding AS DOUBLE[])) DESC, cid
          LIMIT 1) AS cell
  FROM embeddings e
),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY list_cosine_similarity(c.c, q.qe) DESC, c.cid) AS r
    FROM cents c CROSS JOIN qs q
  ) WHERE r <= {ANN_EVAL_NPROBE}
),
sims AS MATERIALIZED (
  SELECT q.qid, a.vec_id, a.cell,
         CAST(ROUND(list_cosine_similarity(a.emb, q.qe) * 1000000) AS BIGINT)
           AS sim_e6
  FROM assign a CROSS JOIN qs q
),
gold AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY sim_e6 DESC, vec_id) AS r
    FROM sims
  ) WHERE r <= {ANN_EVAL_K}
),
appr AS (
  SELECT qid, vec_id, r FROM (
    SELECT s.qid, s.vec_id,
           ROW_NUMBER() OVER (PARTITION BY s.qid
             ORDER BY s.sim_e6 DESC, s.vec_id) AS r
    FROM sims s JOIN probe p ON p.qid = s.qid AND p.cid = s.cell
  ) WHERE r <= {ANN_EVAL_K}
),
h AS (
  SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_hits, MIN(a.r) AS fr
  FROM appr a JOIN gold g ON g.qid = a.qid AND g.vec_id = a.vec_id
  GROUP BY a.qid
)
SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) * {EVAL_SCALE} // {ANN_EVAL_K} AS recall_fp,
       COALESCE({EVAL_SCALE} // h.fr, 0) AS mrr_fp
FROM qs q LEFT JOIN h ON h.qid = q.qid
ORDER BY q.qid
"""


# --------------------------------------------------------------------------
# kNN graph construction (the HNSW/NN-descent bootstrap primitive)
# --------------------------------------------------------------------------
# Every vector's K nearest OTHER vectors by cosine — the self-join
# top-k that seeds graph-based ANN indexes and powers SemDeDup-style
# cluster pruning. Ranking is on the e6-rounded similarity with
# vec_id ascending as the tie-break (the q_ann_batch_topk total
# order), packed into ONE int64 sort key ((-sim_e6) << 32 | id) so
# the per-row top-K is a single argpartition — no float comparison
# ever decides a rank. Physical plan: normalized matrix broadcast
# once (ray.put), each batch scans its rows against it — O(n^2/B)
# per batch, zero shuffles; the documented corpus-scale path swaps
# the broadcast scan for the IVF bucket join (stages/ann.py,
# q_ann_ivf) exactly as in q_cosine_pairs.

KNN_GRAPH_K = 3


def q_knn_graph(sf_dir: str):
    """(vec_id, nbr_id, sim_e6, rnk): each vector's KNN_GRAPH_K nearest
    other vectors by cosine (sim desc, nbr_id asc)."""
    import ray

    emb_ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    ids_all = full["vec_id"].to_numpy().astype(np.int64)
    mat = np.array(full["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat))

    class KnnGraph:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "nbr_id": pa.array([], pa.int64()),
                     "sim_e6": pa.array([], pa.int64()),
                     "rnk": pa.array([], pa.int64())}
                )
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            e = ann_mod.stack_embeddings(t["embedding"]).astype(np.float64)
            e = e / np.linalg.norm(e, axis=1, keepdims=True)
            sims = np.rint(e @ self.m.T * 1e6).astype(np.int64)
            # one exact composite key: sim desc then nbr id asc
            key = (-sims << 32) + self.ids
            k = KNN_GRAPH_K
            out_v, out_n, out_s = [], [], []
            for i in range(len(ids)):
                row = key[i].copy()
                row[self.ids == ids[i]] = np.iinfo(np.int64).max  # no self
                part = np.argpartition(row, k - 1)[:k]
                part = part[np.argsort(row[part], kind="stable")]
                out_v.append(np.full(k, ids[i], np.int64))
                out_n.append(self.ids[part])
                out_s.append(sims[i][part])
            return pa.table(
                {
                    "vec_id": pa.array(np.concatenate(out_v)),
                    "nbr_id": pa.array(np.concatenate(out_n)),
                    "sim_e6": pa.array(np.concatenate(out_s)),
                    "rnk": pa.array(
                        np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids))
                    ),
                }
            )

    return emb_ds.map_batches(KnnGraph, batch_format="pyarrow", concurrency=(1, 4))


SQL_KNN_GRAPH = f"""
SELECT vec_id, nbr_id, sim_e6, rnk FROM (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    * 1000000) AS BIGINT) AS sim_e6,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[]))
                          * 1000000) DESC, b.vec_id
         ) AS rnk
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
WHERE rnk <= {KNN_GRAPH_K}
"""


# --------------------------------------------------------------------------
# Dedup-pipeline evaluation: MinHash-LSH vs exact-Jaccard gold
# --------------------------------------------------------------------------
# The retrieval-eval discipline (q_ann_recall) applied to the text
# near-dup family: how much of the exact word-3-gram Jaccard >= 0.5
# pair set (q_ngram_jaccard, the inverted-index gold) does the
# MinHash+LSH+verify pipeline (q_minhash_pairs) recover? Because the
# LSH path VERIFIES candidates with the same exact Jaccard, its false
# positives are zero by construction — precision is pinned at 1.0 and
# the eval isolates the one real error source, banding recall (gold
# pairs whose signatures never collided in any band). One flag-sum
# shuffle over the two pair sets; the confusion totals are a bounded
# 3-counter merge.

def q_dedup_eval(sf_dir: str):
    """Single row (n_pred, n_gold, tp, fp, fn, precision_e6,
    recall_e6) comparing minhash_pairs against the exact gold."""
    import ray.data
    from ray.data.aggregate import Sum

    from osm2gtfs_ray.stages.dedup import ngram_jaccard_pairs

    pred = q_minhash_pairs(sf_dir).select_columns(["a", "b"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    gold = ngram_jaccard_pairs(docs, n=3, threshold=0.5).select_columns(["a", "b"])

    def tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "flag", pa.array(np.full(t.num_rows, flag, np.int64))
            )
        return f

    both = pred.map_batches(tag(1), batch_format="pyarrow").union(
        gold.map_batches(tag(2), batch_format="pyarrow")
    )
    flags = both.groupby(["a", "b"]).aggregate(Sum("flag", alias_name="s"))

    def confusion(t: pa.Table) -> pa.Table:
        s = pc.cast(t["s"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tp": [int((s == 3).sum())],
                "fp": [int((s == 1).sum())],
                "fn": [int((s == 2).sum())],
            }
        )

    parts = flags.map_batches(confusion, batch_format="pyarrow")
    tot = parts.sum(["tp", "fp", "fn"])  # tiny driver merge of 3 counters
    tp, fp, fn = tot["sum(tp)"], tot["sum(fp)"], tot["sum(fn)"]
    n_pred, n_gold = tp + fp, tp + fn
    return pa.table(
        {
            "n_pred": pa.array([n_pred], pa.int64()),
            "n_gold": pa.array([n_gold], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "precision_e6": pa.array([tp * 10**6 // max(n_pred, 1)], pa.int64()),
            "recall_e6": pa.array([tp * 10**6 // max(n_gold, 1)], pa.int64()),
        }
    )


def sql_dedup_eval() -> str:
    """Shares the shingle CTE chain of SQL_NGRAM_JACCARD /
    SQL_MINHASH_PAIRS; pred re-verifies the snapshot candidates, gold
    is the exact inverted-index pair set."""
    return rf"""
WITH ws AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w FROM documents
),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM ws WHERE len(w) >= 3
),
gr AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g FROM idx
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS g FROM ws WHERE len(w) BETWEEN 1 AND 2
),
sh AS (SELECT DISTINCT doc_id, g FROM gr),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
gold AS (
  SELECT i.a, i.b
  FROM (
    SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
    FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
    GROUP BY 1, 2
  ) i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE (i.c * 1000000) >= 500000 * (sa.n + sb.n - i.c)
),
cand AS (
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
  FROM read_parquet('{MINHASH_CAND_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(MINHASH_CAND_SNAPSHOT, "documents")} = 1
),
pred AS (
  SELECT i.a, i.b
  FROM (
    SELECT cd.a, cd.b, COUNT(*) AS c
    FROM cand cd
    JOIN sh x ON x.doc_id = cd.a
    JOIN sh y ON y.doc_id = cd.b AND y.g = x.g
    GROUP BY 1, 2
  ) i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE (i.c * 1000000) >= 500000 * (sa.n + sb.n - i.c)
),
conf AS (
  SELECT
    (SELECT COUNT(*) FROM pred p JOIN gold g ON g.a = p.a AND g.b = p.b) AS tp,
    (SELECT COUNT(*) FROM pred p ANTI JOIN gold g ON g.a = p.a AND g.b = p.b) AS fp,
    (SELECT COUNT(*) FROM gold g ANTI JOIN pred p ON g.a = p.a AND g.b = p.b) AS fn
)
SELECT CAST(tp + fp AS BIGINT) AS n_pred, CAST(tp + fn AS BIGINT) AS n_gold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       CAST(tp * 1000000 // GREATEST(tp + fp, 1) AS BIGINT) AS precision_e6,
       CAST(tp * 1000000 // GREATEST(tp + fn, 1) AS BIGINT) AS recall_e6
FROM conf
"""


# --------------------------------------------------------------------------
# Mutual kNN pairs (the clustering-graph edge set)
# --------------------------------------------------------------------------
# Edges where BOTH endpoints list each other in their top-K cosine
# neighbors — the symmetric graph mutual-kNN clustering and
# outlier-robust dedup build on (a one-sided kNN edge to a hub is not
# evidence of similarity; a mutual one is). Composes q_knn_graph:
# normalize each directed edge to (lo, hi), one pair-key shuffle,
# keep pairs seen from both sides. Output keeps the e6 similarity
# (identical for both directions by symmetry of cosine).

def q_mutual_knn(sf_dir: str):
    """(a, b, sim_e6): unordered pairs that are mutual top-K cosine
    neighbors."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    edges = q_knn_graph(sf_dir)

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(b["vec_id"].to_numpy(np.int64), b["nbr_id"].to_numpy(np.int64))
        hi = np.maximum(b["vec_id"].to_numpy(np.int64), b["nbr_id"].to_numpy(np.int64))
        return pd.DataFrame(
            {"a": lo, "b": hi, "sim_e6": b["sim_e6"].to_numpy(np.int64)}
        )

    def keep_mutual(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False).agg(
            sim_e6=("sim_e6", "max"), n=("sim_e6", "size")
        )
        out = out[out["n"] == 2].drop(columns="n")
        return out.astype(np.int64)

    return sharded_map_groups(edges, ["a", "b"], keep_mutual, local_pre=norm)


SQL_MUTUAL_KNN = f"""
WITH knn AS (
  SELECT vec_id, nbr_id, sim_e6 FROM (
    SELECT a.vec_id, b.vec_id AS nbr_id,
           CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[]))
                      * 1000000) AS BIGINT) AS sim_e6,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[]))
                            * 1000000) DESC, b.vec_id
           ) AS rnk
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  ) WHERE rnk <= {KNN_GRAPH_K}
)
SELECT x.vec_id AS a, x.nbr_id AS b, x.sim_e6
FROM knn x JOIN knn y ON y.vec_id = x.nbr_id AND y.nbr_id = x.vec_id
WHERE x.vec_id < x.nbr_id
ORDER BY a, b
"""


# --------------------------------------------------------------------------
# SQ8 scalar-quantized ANN (stages/ann.py sq8_*): per-dim 8-bit codes
# from global (lo, hi) ranges, asymmetric int64 distances. The oracle
# recomputes the ranges itself (MIN/MAX per dim) — no snapshot needed,
# unlike PQ whose trained codebook must be shared.
# --------------------------------------------------------------------------

SQ8_TOPK = 10


def q_ann_sq8(sf_dir: str):
    """(vec_id, adc_d2) — approximate top-10 nearest to query vec 0 by
    asymmetric distance over per-dimension 8-bit scalar quantization."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_rows = pq.ParquetFile(table_path(sf_dir, "embeddings")).metadata.num_rows
    lo, hi = ann_mod.sq8_range(emb, n_rows)
    return ann_mod.sq8_topk(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        _query_vec(sf_dir), lo, hi, k=SQ8_TOPK,
    )


SQL_ANN_SQ8 = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * 10000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
u AS (
  SELECT e.vec_id, t.i AS d, e.v[t.i] AS val
  FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) t
),
rng AS (SELECT d, MIN(val) AS lo, MAX(val) AS hi FROM u GROUP BY d),
c AS (
  SELECT u.vec_id, u.d,
         CASE WHEN r.hi > r.lo
              THEN ((u.val - r.lo) * 510 + (r.hi - r.lo))
                   // (2 * (r.hi - r.lo))
              ELSE 0 END AS code,
         r.lo, r.hi
  FROM u JOIN rng r USING (d)
),
q AS (SELECT d, val * 255 AS qs FROM u WHERE vec_id = 0),
d2 AS (
  SELECT c.vec_id,
         CAST(SUM((q.qs - (c.lo * 255 + c.code * (c.hi - c.lo)))
                  * (q.qs - (c.lo * 255 + c.code * (c.hi - c.lo))))
              AS BIGINT) AS adc_d2
  FROM c JOIN q USING (d)
  GROUP BY c.vec_id
)
SELECT vec_id, adc_d2 FROM d2 ORDER BY adc_d2 ASC, vec_id ASC LIMIT {SQ8_TOPK}
"""
