"""Deduplication operators for web-scale corpora.

Exact dedup lives in ops/dedupe.py (hash-partition + keep-first). Here:
near-dup detection — MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine — each expressed as Ray Data stages:

    shingle/minhash per batch (map_batches, vectorized)
      → explode to (band_id, band_hash, doc_id) rows
      → groupby(band bucket) → candidate pairs
      → verify exact similarity → verified pairs

The candidate generation is the scalable (shuffle-bounded) part; the
verify step re-computes exact similarity so LSH false positives never
reach the output (false negatives are the documented recall tradeoff,
measured in tests against the brute-force oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osm2gtfs_ray.sources.pages import mix64

_WORD_SPLIT = None  # compiled lazily per process


def _words(text: str) -> list[str]:
    global _WORD_SPLIT
    if _WORD_SPLIT is None:
        import re

        _WORD_SPLIT = re.compile(r"\S+")
    return _WORD_SPLIT.findall(text.lower())


_WORD_HASH_CACHE: dict[str, int] = {}

_C1 = np.uint64(0x9DDFEA08EB382D69)
_C2 = np.uint64(0xC3A5C85C97CB3127)
_C3 = np.uint64(0xB492B66FBE98F273)


def _word_hash(w: str) -> int:
    """Stable 64-bit word hash (blake2b), memoized per process — doc
    corpora share vocabulary, so the cache turns the per-shingle
    string hashing into a near-free dict lookup."""
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        import hashlib

        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        if len(_WORD_HASH_CACHE) < 4_000_000:  # bound actor memory
            _WORD_HASH_CACHE[w] = h
    return h


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of word n-gram shingles: word hashes are
    cached scalars, the n-gram combine is a vectorized mix of the
    rolling windows (position-weighted so order matters)."""
    ws = _words(text)
    if not ws:
        return np.empty(0, dtype=np.uint64)
    hs = np.array([_word_hash(w) for w in ws], dtype=np.uint64)
    if len(hs) < n:
        with np.errstate(over="ignore"):
            combined = np.uint64(0)
            for i, h in enumerate(hs):
                combined ^= h * (_C1 if i % 3 == 0 else _C2 if i % 3 == 1 else _C3)
            return mix64(np.array([combined], dtype=np.uint64))
    with np.errstate(over="ignore"):
        comb = hs[: len(hs) - n + 1] * _C1
        for j in range(1, n):
            comb = comb ^ (hs[j : len(hs) - n + 1 + j] * (_C2 if j == 1 else _C3))
    return np.unique(mix64(comb))


class MinHasher:
    """num_perm minhash signature via universal hashing a*x+b over the
    shingle hash set; parameters derived deterministically from seed."""

    def __init__(self, num_perm: int = 64, n_shingle: int = 3, seed: int = 42):
        idx = np.arange(1, num_perm + 1, dtype=np.uint64)
        self.a = mix64(idx ^ np.uint64(seed)) | np.uint64(1)  # odd multipliers
        self.b = mix64(idx + np.uint64(0xABCDEF) + np.uint64(seed))
        self.num_perm = num_perm
        self.n_shingle = n_shingle

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.n_shingle)
        if len(sh) == 0:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        with np.errstate(over="ignore"):
            vals = self.a[None, :] * sh[:, None] + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def explode_bands(batch: pa.Table, n_bands: int = 16) -> pa.Table:
    """Signature → (band_id, band_hash, doc_id) LSH bucket rows."""
    import pyarrow.compute as pc

    sig = batch["sig"]
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    n = len(batch)
    mat = pc.list_flatten(sig).to_numpy(zero_copy_only=False).reshape(n, -1)
    rows_per_band = mat.shape[1] // n_bands
    doc = batch["doc_id"].to_numpy()
    out_doc, out_band, out_hash = [], [], []
    for b in range(n_bands):
        seg = mat[:, b * rows_per_band : (b + 1) * rows_per_band].copy()
        with np.errstate(over="ignore"):
            h = np.zeros(n, dtype=np.uint64)
            for c in range(seg.shape[1]):
                h = mix64(h ^ seg[:, c])
        out_doc.append(doc)
        out_band.append(np.full(n, b, dtype=np.int64))
        out_hash.append(h)
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(out_band)),
            "band_hash": pa.array(np.concatenate(out_hash), pa.uint64()),
            "doc_id": pa.array(np.concatenate(out_doc)),
        }
    )


N_SHARDS = 64


def lsh_candidate_pairs(docs_ds, num_perm: int = 64, n_bands: int = 16, n_shingle: int = 3):
    """documents(doc_id, text) → distinct candidate pairs (a < b).

    The bucket groupby is SHARDED: shuffling on the raw (band_id,
    band_hash) key would create millions of single-row groups (one
    Python map_groups call each); instead rows shuffle on
    ``band_hash % N_SHARDS`` and each shard processes its buckets
    vectorized with a C-speed pandas groupby. Same result, 64 groups.
    """
    # stateless task: MinHasher's derived state (two small uint64
    # arrays) is cheap to hold in the closure — no actor pool startup
    mh = MinHasher(num_perm=num_perm, n_shingle=n_shingle)
    sigs = docs_ds.map_batches(mh, batch_format="pyarrow")

    def bands_with_shard(t: pa.Table) -> pa.Table:
        b = explode_bands(t, n_bands)
        shard = (b["band_hash"].to_numpy() % np.uint64(N_SHARDS)).astype(np.int64)
        return b.append_column("shard", pa.array(shard))

    bands = sigs.map_batches(bands_with_shard, batch_format="pyarrow")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # buckets with >=2 docs only (duplicated band hashes)
        dup = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        out_a, out_b = [], []
        for _, grp in dup.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(grp["doc_id"].to_numpy())
            i, j = np.triu_indices(len(ids), k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        if not out_a:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "pair_shard": pd.Series([], dtype="int64"),
                }
            )
        df = pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})
        df = df.drop_duplicates()  # within-shard dedup
        df["pair_shard"] = (df["a"].to_numpy() % N_SHARDS).astype("int64")
        return df

    cand = bands.groupby("shard").map_groups(shard_pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates().sort_values(["a", "b"], kind="mergesort")

    return cand.groupby("pair_shard").map_groups(dedup_pairs, batch_format="pandas")


# candidate-pair sets at or below this size verify via the broadcast
# plan (endpoint sigs ride the object store once); larger sets take the
# two-shuffle distributed plan. Mirrors ops/components.BROADCAST_LABEL_ROWS
# and the size-aware cosine_lsh verify — the broadcast side here is the
# CANDIDATE ENDPOINTS only (bounded by 2x this), never the corpus.
BROADCAST_VERIFY_PAIRS = 65_536


def _verify_jaccard_broadcast(pairs, cand_docs, n_shingle: int, threshold: float):
    """Small-pair-set plan: one pass computes endpoint sigs (candidate
    docs only — already semi-filtered), the sig table rides the object
    store, and a single shuffle-free map over the pairs emits exact
    Jaccard. Two executions total vs the distributed plan's four."""
    import ray

    from osm2gtfs_ray.ops.joins import _as_arrow

    def sig_tbl(t: pa.Table) -> pa.Table:
        sigs = [shingle_hashes(x, n_shingle).tobytes() for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )

    st = _as_arrow(cand_docs.map_batches(sig_tbl, batch_format="pyarrow"))
    st = st.combine_chunks()
    ids = st["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids, kind="stable")
    st = st.take(pa.array(order))
    ref = ray.put(st)

    def verify_batch(t: pa.Table, _ref=ref) -> pa.Table:
        lookup = ray.get(_ref)
        nid = lookup["doc_id"].to_numpy()
        sigs = lookup["sig"].to_pylist()
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        pa_idx = np.searchsorted(nid, a)
        pb_idx = np.searchsorted(nid, b)
        out_a, out_b, out_j = [], [], []
        for k in range(len(a)):
            sa = np.frombuffer(sigs[pa_idx[k]] or b"", dtype=np.uint64)
            sb = np.frombuffer(sigs[pb_idx[k]] or b"", dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / (union or 1)
            if j >= threshold:
                out_a.append(int(a[k]))
                out_b.append(int(b[k]))
                out_j.append(int(round(j * 1e6)))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard_e6": pa.array(out_j, pa.int64()),
            }
        )

    return pairs.map_batches(verify_batch, batch_format="pyarrow")


def verify_jaccard(pairs_ds, docs, n_shingle: int = 3, threshold: float = 0.5,
                   n_shards: int = N_SHARDS, broadcast: bool | None = None):
    """Exact shingle-set Jaccard for each candidate pair; keeps pairs
    ≥ threshold.

    Size-aware: pair sets ≤ BROADCAST_VERIFY_PAIRS verify via
    `_verify_jaccard_broadcast` (endpoint sigs in one object store
    entry, no shuffle); larger sets take the distributed plan below.

    FULLY DISTRIBUTED plan (round-2 rewrite — no whole-corpus broadcast):

    1. candidate doc ids = distinct endpoints of the pair set (a slim
       uint64 set; broadcast as an ``is_in`` filter — at 10^9+
       candidates this one filter would switch to a hash semi-join);
    2. shingle signatures are computed ONLY for candidate docs, packed
       as raw bytes (np.uint64.tobytes — flat binary column, no nested
       types through the shuffle);
    3. shuffle 1: pair-endpoint rows and signature rows co-locate by
       doc-hash shard; one vectorized pandas merge per shard attaches
       each endpoint's signature;
    4. shuffle 2: rows re-key by pair-hash shard so both endpoints of
       a pair meet; per shard, sorted-array intersections produce the
       exact Jaccard.

    Everything that moves is O(|pairs| + |candidate docs|); nothing is
    ever materialized corpus-wide in a single process.

    ``docs`` may be a Dataset(doc_id, text) or a pa.Table (wrapped).
    """
    import ray.data

    from osm2gtfs_ray.ops.joins import broadcast_semi
    from osm2gtfs_ray.ops.sharded import stable_row_hash

    docs_ds = ray.data.from_arrow(docs) if isinstance(docs, pa.Table) else docs
    pairs = pairs_ds.materialize()  # consumed twice: id set + side rows

    def _flat(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [t["a"].to_numpy().astype(np.int64), t["b"].to_numpy().astype(np.int64)]
        )
        return pa.table({"doc_id": pa.array(np.unique(ids))})

    flat_ids = pairs.map_batches(_flat, batch_format="pyarrow")
    cand_docs = broadcast_semi(docs_ds, flat_ids, "doc_id")

    if broadcast is None:
        broadcast = pairs.count() <= BROADCAST_VERIFY_PAIRS
    if broadcast:
        return _verify_jaccard_broadcast(pairs, cand_docs, n_shingle, threshold)

    def sig_rows(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy()
        sigs = [
            shingle_hashes(x, n_shingle).tobytes() for x in t["text"].to_pylist()
        ]
        return pd.DataFrame(
            {
                "doc_id": ids.astype(np.int64),
                "a": np.int64(-1),
                "b": np.int64(-1),
                "sig": pd.Series(sigs, dtype=object),
            }
        )

    def side_rows(t: pa.Table) -> pd.DataFrame:
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([a, b]),
                "a": np.concatenate([a, a]),
                "b": np.concatenate([b, b]),
                "sig": pd.Series([None] * (2 * len(a)), dtype=object),
            }
        )

    mixed = cand_docs.map_batches(sig_rows, batch_format="pyarrow").union(
        pairs.map_batches(side_rows, batch_format="pyarrow")
    )

    def add_doc_shard(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        out["shard"] = (
            stable_row_hash(batch, ["doc_id"]) % np.uint64(n_shards)
        ).astype(np.int64)
        return out

    def attach_sig(g: pd.DataFrame) -> pd.DataFrame:
        """Per doc-shard: left-merge side rows with their doc's sig."""
        sigs = g[g["a"] < 0][["doc_id", "sig"]]
        sides = g[g["a"] >= 0].drop(columns=["sig", "shard"])
        out = sides.merge(sigs, on="doc_id", how="left")
        out["pair_shard"] = (
            stable_row_hash(out, ["a", "b"]) % np.uint64(n_shards)
        ).astype(np.int64)
        return out

    attached = (
        mixed.map_batches(add_doc_shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(attach_sig, batch_format="pandas")
    )

    def pair_jaccard(g: pd.DataFrame) -> pd.DataFrame:
        """Per pair-shard: both endpoints of each pair are present;
        sorted-unique array intersection per pair."""
        g = g.sort_values(["a", "b", "doc_id"], kind="mergesort")
        out = []
        for (a, b), grp in g.groupby(["a", "b"], sort=False):
            row_a = grp[grp["doc_id"] == a]["sig"].iloc[0]
            row_b = grp[grp["doc_id"] == b]["sig"].iloc[0]
            sa = np.frombuffer(row_a, dtype=np.uint64) if row_a else np.empty(0, np.uint64)
            sb = np.frombuffer(row_b, dtype=np.uint64) if row_b else np.empty(0, np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / (union or 1)
            if j >= threshold:
                out.append((int(a), int(b), int(round(j * 1e6))))
        return pd.DataFrame(out, columns=["a", "b", "jaccard_e6"]).astype(
            {"a": "int64", "b": "int64", "jaccard_e6": "int64"}
        )

    return attached.groupby("pair_shard").map_groups(pair_jaccard, batch_format="pandas")


# ------------------------------------------------------------ n-gram Jaccard

def ngram_jaccard_pairs(docs_ds, n: int = 3, threshold: float = 0.5,
                        n_shards: int = N_SHARDS, max_df: int | None = None):
    """Exact word-n-gram Jaccard near-dup — the inverted-index plan,
    no LSH approximation (SURVEY §2.7 near-dup family; companion to
    `lsh_candidate_pairs`+`verify_jaccard`, which trade exactness for
    a bounded candidate volume).

    Two-shuffle distributed plan, nothing corpus-sized in one place:

    1. map_batches: per doc, DISTINCT shingle strings (n-gram of
       lowercased ``\\S+`` words; docs shorter than n words contribute
       their whole text as one shingle) with the doc's shingle-set
       size carried on every row;
    2. shuffle 1 (shard = hash(shingle) % n_shards): each shingle's
       posting list meets in one shard → emit upper-triangle (a, b)
       partial-intersection counts, pre-summed per shard;
    3. shuffle 2 (shard = hash(a,b) % n_shards): sum partials →
       jaccard_e6 = (c * 1e6) // (na + nb - c), keep >= threshold.

    Shingles are keyed on the raw STRING (collision-free, so the
    DuckDB oracle `SQL_NGRAM_JACCARD` reproduces it bit-for-bit); at
    corpus scale swap the key for `shingle_hashes`' 64-bit hashes to
    keep the shuffle narrow. ``max_df`` drops shingles appearing in
    more than that many docs (the standard hot-shingle blowup guard —
    a stopword shingle with df=k emits k²/2 pairs); None = exact
    semantics matching the oracle.
    """
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    thr_e6 = int(round(threshold * 1e6))

    def explode(t: pa.Table) -> pd.DataFrame:
        ids: list[int] = []
        grams: list[str] = []
        sizes: list[int] = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = _words(text)
            if not ws:
                continue
            if len(ws) < n:
                gs = {" ".join(ws)}
            else:
                gs = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
            ids.extend([did] * len(gs))
            grams.extend(gs)
            sizes.extend([len(gs)] * len(gs))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "g": pd.Series(grams, dtype=object),
                "nd": np.asarray(sizes, dtype=np.int64),
            }
        )

    exploded = docs_ds.map_batches(explode, batch_format="pyarrow")

    def shingle_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All shingles hashing to this shard: per-shingle posting
        lists → partial pair counts, combined shard-locally."""
        if max_df is not None:
            g = g[g.groupby("g")["doc_id"].transform("size") <= max_df]
        dup = g[g.duplicated("g", keep=False)]
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "na": pd.Series([], dtype="int64"),
                "nb": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
            }
        )
        if dup.empty:
            return empty
        dup = dup.sort_values(["g", "doc_id"], kind="mergesort")
        chunks = []
        for _, grp in dup.groupby("g", sort=False):
            ids = grp["doc_id"].to_numpy()
            nds = grp["nd"].to_numpy()
            i, j = np.triu_indices(len(ids), k=1)
            chunks.append(np.stack([ids[i], ids[j], nds[i], nds[j]], axis=1))
        m = np.concatenate(chunks)
        df = pd.DataFrame(m, columns=["a", "b", "na", "nb"]).astype("int64")
        out = df.groupby(["a", "b", "na", "nb"], sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    partials = sharded_map_groups(exploded, "g", shingle_pairs, n_shards=n_shards)

    def pair_reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b", "na", "nb"], sort=False)["c"].sum().reset_index()
        c = agg["c"].to_numpy(np.int64)
        union = agg["na"].to_numpy(np.int64) + agg["nb"].to_numpy(np.int64) - c
        je6 = (c * 1_000_000) // union
        keep = je6 >= thr_e6
        return pd.DataFrame(
            {
                "a": agg["a"].to_numpy(np.int64)[keep],
                "b": agg["b"].to_numpy(np.int64)[keep],
                "jaccard_e6": je6[keep],
            }
        )

    return sharded_map_groups(partials, ["a", "b"], pair_reduce, n_shards=n_shards)


# ------------------------------------------------------------------ simhash

def _stable_word_hash(w: str) -> int:
    """Process-independent 64-bit word hash (Python's hash() is salted
    per process — unusable for distributed determinism)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")


class SimHasher:
    """64-bit SimHash over word hashes (unweighted)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch["text"].to_pylist()):
            ws = _words(text)
            if not ws:
                continue
            hs = mix64(
                np.array([_stable_word_hash(w) for w in ws], dtype=np.uint64)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.uint64(sum(np.uint64(1) << np.uint64(k) for k in range(64) if votes[k] > 0))
        return batch.append_column("simhash", pa.array(out, pa.uint64()))
