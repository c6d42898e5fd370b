"""Training-corpus preparation operators: sequence packing via a
distributed prefix scan, benchmark-contamination screening via word
n-gram overlap, and Misra-Gries heavy hitters — the LLM-data-pipeline
family on top of the engine primitives (ops/scan.py, ops/sketch.py,
ops/sharded.py).

Encoding rules as in pipelines/queries.py: integer outputs everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.sources.tables import read_table

# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): documents are concatenated in
# doc_id order and cut into fixed-capacity training sequences; each
# doc's placement is fully determined by the exclusive prefix sum of
# token counts — computed by ops/scan.distributed_cumsum (range
# shards + broadcast base offsets; no sequential pass, no driver loop).
# The whitespace token count is the same \S+ kernel/SQL expression
# pair as q_token_stats.
# --------------------------------------------------------------------------

SEQ_CAPACITY = 2048


def q_seq_pack(sf_dir: str, capacity: int = SEQ_CAPACITY):
    from osm2gtfs_ray.ops.scan import distributed_cumsum
    from osm2gtfs_ray.stages.text import token_count_arrow

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": token_count_arrow(t["text"])}
        )

    # text dropped BEFORE the scan: both scan passes move 2 ints/row
    counted = docs.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True)
    packed = distributed_cumsum(
        counted, "doc_id", "n_tokens", out_col="start_offset"
    )

    def finish(t: pa.Table) -> pa.Table:
        start = t["start_offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        seq = start // capacity
        last = np.where(n > 0, (start + n - 1) // capacity, seq)
        n_seqs = np.where(n > 0, last - seq + 1, 0)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "start_offset": pa.array(start, pa.int64()),
                "seq_id": pa.array(seq, pa.int64()),
                "n_seqs": pa.array(n_seqs, pa.int64()),
            }
        )

    return packed.map_batches(finish, batch_format="pyarrow")


SQL_SEQ_PACK = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM toks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {SEQ_CAPACITY} AS BIGINT) AS seq_id,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (start_offset + n_tokens - 1) // {SEQ_CAPACITY}
                 - start_offset // {SEQ_CAPACITY} + 1 END AS BIGINT) AS n_seqs
FROM o
"""


# --------------------------------------------------------------------------
# Benchmark-contamination screen: flag training docs sharing any word
# 5-gram with the held-out benchmark slice (doc_id % 97 == 0 — the
# eval-suite stand-in). The benchmark's distinct gram set is tiny by
# construction (eval suites are KBs at any corpus scale), so it is
# collected once, hashed, and broadcast via ray.put; the corpus side
# is a pure map stage (per-batch gram hashing + sorted-set membership),
# no shuffle at all. Gram identity is a 5-word rolling combine of
# process-stable word hashes (vectorized, no gram strings built);
# the SQL oracle builds the literal gram strings — set equality holds
# absent 64-bit collisions (~n²/2⁶⁴).
# --------------------------------------------------------------------------

_CONTAM_N = 5
_BENCH_MOD = 97


def _doc_gram_hashes(t: pa.Table, n: int):
    """Per-batch (doc_row_index, gram_hash) arrays: split to words,
    hash words (stable SipHash), rolling-combine n consecutive word
    hashes within each doc."""
    words = pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    wh = pd.util.hash_pandas_object(
        flat.to_pandas(), index=False
    ).to_numpy(dtype=np.uint64)
    if len(wh) < n:
        return np.array([], np.int64), np.array([], np.uint64)
    # rolling combine: position i covers words [i, i+n); valid iff the
    # window stays inside one document
    gh = wh[: len(wh) - n + 1].copy()
    for j in range(1, n):
        gh = gh * np.uint64(0x100000001B3) ^ wh[j : len(wh) - n + 1 + j]
    valid = parent[: len(parent) - n + 1] == parent[n - 1 :]
    return parent[: len(parent) - n + 1][valid].astype(np.int64), gh[valid]


def q_contamination(sf_dir: str, n: int = _CONTAM_N):
    import ray

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pd.DataFrame:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = did % _BENCH_MOD == 0
        sub = t.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pd.DataFrame({"g": pd.Series([], dtype="uint64")})
        _, gh = _doc_gram_hashes(sub, n)
        return pd.DataFrame({"g": np.unique(gh)})

    bench = np.unique(
        docs.map_batches(bench_grams, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["g"]
        .to_numpy(dtype=np.uint64)
    )
    bench_ref = ray.put(bench)

    def score(t: pa.Table, _ref=bench_ref) -> pa.Table:
        bset = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        rows, gh = _doc_gram_hashes(t, n)
        did_all = t["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": did_all[rows], "g": gh}).drop_duplicates()
        hit = np.searchsorted(bset, df["g"].to_numpy())
        hit = np.where(hit < len(bset), hit, 0)
        df["hit"] = bset[hit] == df["g"].to_numpy() if len(bset) else False
        agg = df.groupby("doc_id", sort=False).agg(
            n_grams=("g", "size"), n_contaminated=("hit", "sum")
        ).reset_index()
        agg = agg[agg["doc_id"] % _BENCH_MOD != 0]
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
                "n_grams": pa.array(agg["n_grams"].to_numpy(np.int64)),
                "n_contaminated": pa.array(
                    agg["n_contaminated"].to_numpy(np.int64)
                ),
                "flagged": pa.array(
                    (agg["n_contaminated"].to_numpy() > 0).astype(np.int64)
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


SQL_CONTAMINATION = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(arr[i + 1 : i + {_CONTAM_N}], ' ') AS g
  FROM (
    SELECT doc_id, arr, unnest(generate_series(0, len(arr) - {_CONTAM_N})) AS i
    FROM d WHERE len(arr) >= {_CONTAM_N}
  )
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE b.g IS NOT NULL) AS BIGINT) AS n_contaminated,
       CAST(MAX(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS flagged
FROM grams g LEFT JOIN bench b USING (g)
WHERE g.doc_id % {_BENCH_MOD} <> 0
GROUP BY g.doc_id
"""


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters: terms above a frequency threshold with
# guaranteed-lower-bound counts (ops/sketch.mg_heavy_hitters). With
# capacity k=64 >= the test-corpus vocabulary the summary is exact and
# the SQL HAVING-threshold oracle applies bit-for-bit; the lossy
# regime's ±N/(k+1) bound is pytest-enforced (tests/test_ops.py).
# --------------------------------------------------------------------------

_HH_K = 64
_HH_PHI = 0.01


def q_heavy_hitters(sf_dir: str, k: int = _HH_K, phi: float = _HH_PHI):
    from osm2gtfs_ray.ops.sketch import mg_heavy_hitters
    from osm2gtfs_ray.stages.text import token_count_arrow

    docs = read_table(sf_dir, "documents", columns=["text"])
    est = mg_heavy_hitters(docs, "text", k=k)

    def tok_part(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([pc.sum(token_count_arrow(t["text"])).as_py() or 0])}
        )

    total = (
        docs.map_batches(tok_part, batch_format="pyarrow", zero_copy_batch=True)
        .sum("n")
    )
    out = est[est["n_est"].to_numpy() >= total * phi]
    out = out.sort_values(["n_est", "term"], ascending=[False, True])
    return pd.DataFrame(
        {
            "term": out["term"].to_numpy(),
            "n_est": out["n_est"].to_numpy(dtype=np.int64),
        }
    ).reset_index(drop=True)


SQL_HEAVY_HITTERS = rf"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS term FROM documents
),
counts AS (
  SELECT term, COUNT(*) AS n FROM words WHERE term <> '' GROUP BY term
),
tot AS (SELECT SUM(n) AS c FROM counts)
SELECT term, CAST(n AS BIGINT) AS n_est
FROM counts, tot WHERE n >= c * {_HH_PHI}
ORDER BY n_est DESC, term ASC
"""


# --------------------------------------------------------------------------
# Within-document repetition stats (Gopher-style quality rule): word
# count, distinct-word count, and the top word's occurrence count per
# doc. Embarrassingly parallel (a doc lives wholly in one row) — pure
# map stage, all-integer output.
# --------------------------------------------------------------------------

def q_word_repetition(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pd.DataFrame:
        words = pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"row": parent[keep], "w": flat.to_pandas().to_numpy()[keep]}
        )
        per = df.groupby(["row", "w"], sort=False).size().reset_index(name="c")
        agg = per.groupby("row", sort=False).agg(
            n_words=("c", "sum"), n_distinct=("c", "size"), top_word_n=("c", "max")
        )
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        out = agg.reset_index()
        return pd.DataFrame(
            {
                "doc_id": did[out["row"].to_numpy()].astype(np.int64),
                "n_words": out["n_words"].to_numpy(np.int64),
                "n_distinct": out["n_distinct"].to_numpy(np.int64),
                "top_word_n": out["top_word_n"].to_numpy(np.int64),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_WORD_REPETITION = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
),
per AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words WHERE w <> '' GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_word_n
FROM per GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Token-budget document chunking with overlap — the RAG / pretraining
# chunker. Chunks of CHUNK_CAP whitespace tokens, stride CHUNK_STRIDE
# (overlap CAP - STRIDE), last chunk takes the tail. Fully vectorized:
# Arrow regex split → numpy chunk enumeration (flat-ranges trick) →
# one C-level take + binary_join re-assembles every chunk text; no
# Python per token or per chunk. Embarrassingly parallel per batch —
# no shuffle — so it streams at any scale.
# Generalizes the reference's itinerary splitting (route → bounded
# stop sequences, osm2gtfs/core/routes.py) to token windows.
# --------------------------------------------------------------------------

CHUNK_CAP = 64
CHUNK_STRIDE = 48


def q_chunk_docs(sf_dir: str, capacity: int = CHUNK_CAP,
                 stride: int = CHUNK_STRIDE):
    from osm2gtfs_ray.sources.pages import _flat_ranges

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(txt)
        lst = pc.split_pattern_regex(trimmed, r"\s+")
        offsets = np.asarray(lst.offsets, dtype=np.int64)
        nt = np.diff(offsets)
        # empty text splits to [''] — that is 0 tokens, not 1
        nt = np.where(
            pc.equal(trimmed, "").to_numpy(zero_copy_only=False), 0, nt
        )
        n_chunks = np.where(
            nt == 0,
            0,
            np.where(nt <= capacity, 1, (nt - capacity + stride - 1) // stride + 1),
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk_id = _flat_ranges(n_chunks)
        starts = chunk_id * stride
        ends = np.minimum(starts + capacity, np.repeat(nt, n_chunks))
        # gather each chunk's token span from the flat split values:
        # overlapping spans can't share one offsets vector, so build the
        # token index list (flat-ranges again) and take() once
        ln = ends - starts
        tok_idx = _flat_ranges(ln) + np.repeat(
            np.repeat(offsets[:-1], n_chunks) + starts, ln
        )
        taken = lst.values.take(pa.array(tok_idx))
        chunk_off = np.concatenate([[0], np.cumsum(ln)])
        chunk_text = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(chunk_off), taken), " "
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_chunks), pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "start_tok": pa.array(starts, pa.int64()),
                "n_tok": pa.array(ln, pa.int64()),
                "chunk_text": chunk_text,
            }
        )

    return docs.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


SQL_CHUNK_DOCS = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE trim(text) <> ''
),
n AS (SELECT doc_id, w, len(w) AS nt FROM toks),
c AS (
  SELECT doc_id, w, nt,
         unnest(generate_series(
           0,
           CASE WHEN nt <= {CHUNK_CAP} THEN 0
                ELSE CAST(CEIL((nt - {CHUNK_CAP}) / {CHUNK_STRIDE}.0) AS BIGINT)
           END)) AS chunk_id
  FROM n
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(LEAST(chunk_id * {CHUNK_STRIDE} + {CHUNK_CAP}, nt)
            - chunk_id * {CHUNK_STRIDE} AS BIGINT) AS n_tok,
       COALESCE(array_to_string(
         w[chunk_id * {CHUNK_STRIDE} + 1 :
           LEAST(chunk_id * {CHUNK_STRIDE} + {CHUNK_CAP}, nt)], ' '), '')
         AS chunk_text
FROM c
"""


# --------------------------------------------------------------------------
# Consistent (hash-priority) sampling — fixed-size uniform sample with
# NO coordination: priority = splitmix64(doc_id), keep the k smallest.
# Mergeable (top-k of per-block top-ks == global top-k), deterministic,
# partition-invariant, and stable under corpus growth (a doc's
# membership changes only when a smaller-priority doc enters) — the
# bottom-k sketch used for consistent corpus subsampling. Per-block
# argpartition keeps k rows per block; the global merge sorts k ×
# n_blocks rows (KBs).
# --------------------------------------------------------------------------

SAMPLE_K = 100
_SAMPLE_STREAM = 12
_SAMPLE_SEED = 42


def q_consistent_sample(sf_dir: str, k: int = SAMPLE_K):
    from osm2gtfs_ray.sources.pages import _uhash

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pri = (_uhash(ids, _SAMPLE_STREAM, _SAMPLE_SEED)
               >> np.uint64(1)).astype(np.int64)
        if len(pri) > k:
            keep = np.argpartition(pri, k)[:k]
            ids, pri = ids[keep], pri[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "priority": pa.array(pri, pa.int64()),
            }
        )

    cand = docs.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return cand.sort(["priority", "doc_id"]).limit(k)


def _sql_consistent_sample() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_mix64

    c = ((_SAMPLE_STREAM * 0xC0FFEE123457) % (1 << 64)) ^ (_SAMPLE_SEED << 32)
    pri = _s_mix64(f"xor(CAST(doc_id AS UBIGINT), CAST({c} AS UBIGINT))")
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(({pri}) >> 1 AS BIGINT) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {SAMPLE_K}
"""


SQL_CONSISTENT_SAMPLE = _sql_consistent_sample()


# --------------------------------------------------------------------------
# Weighted priority sample: deterministic quality-weighted selection
# --------------------------------------------------------------------------
# The training-mix sampling primitive: pick K documents WITHOUT
# replacement with probability increasing in weight (token count), as
# a deterministic priority sample — priority_d = floor(u_d * SCALE /
# w_d) with u_d a splitmix stream of doc_id, K smallest priorities
# win (big weight => small priority => sampled). Integer arithmetic
# end to end (u < 2^31, SCALE = 2^20 keeps products < 2^51), so the
# sample is bit-stable across partitioning AND SQL-replicable — no
# float pow(u, 1/w) drift. Distributive bottom-k: per-block partial
# bottom-k, tiny driver final; the corpus streams once.

WSAMPLE_K = 100
WSAMPLE_STREAM = 274
WSAMPLE_U_MOD = 1 << 31
WSAMPLE_SCALE = 1 << 20


def q_weighted_sample(sf_dir: str, k: int = WSAMPLE_K):
    """(doc_id, w, priority): the K sampled docs, weight = tokens+1."""
    from osm2gtfs_ray.sources.pages import _uint
    from osm2gtfs_ray.stages.text import token_count_arrow

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def block_bottomk(t: pa.Table) -> pd.DataFrame:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        w = token_count_arrow(t["text"]).to_numpy(zero_copy_only=False) + 1
        u = _uint(did.astype(np.uint64), WSAMPLE_STREAM, 42, WSAMPLE_U_MOD)
        pri = (u * np.int64(WSAMPLE_SCALE)) // w
        df = pd.DataFrame({"doc_id": did, "w": w, "priority": pri})
        return df.sort_values(["priority", "doc_id"], kind="mergesort").head(k)

    tops = docs.map_batches(
        block_bottomk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = (
        tops.sort_values(["priority", "doc_id"], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "w": "int64", "priority": "int64"})


def sql_weighted_sample() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    pri = (f"(({_s_uint('did', WSAMPLE_STREAM, WSAMPLE_U_MOD)})"
           f" * {WSAMPLE_SCALE}) // w")
    return rf"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id AS UBIGINT) AS did,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
              + 1 AS BIGINT) AS w
  FROM documents
)
SELECT doc_id, w, CAST({pri} AS BIGINT) AS priority
FROM d
ORDER BY priority, doc_id LIMIT {WSAMPLE_K}
"""


# --------------------------------------------------------------------------
# Temperature-balanced language mix: sqrt-quota subsampling plan
# --------------------------------------------------------------------------
# The multilingual-rebalance primitive (alpha = 0.5 temperature
# sampling): head languages are downsampled toward sqrt(n) so the
# tail keeps representation. quota_l = min(n_l, MIX_FACTOR *
# isqrt(n_l)) with the corrected integer sqrt (shape_length's trick),
# and a document is selected iff its splitmix draw clears the exact
# threshold test u * n_l < quota_l * 2^31 — integer arithmetic only,
# so membership is bit-stable and SQL-replicable. Two streams over
# the pruned lang column: the per-language count, then the selection
# count with the driver-computed quota table broadcast into the
# filter closure (5 languages — bytes, not a shuffle).

MIX_FACTOR = 8
MIX_STREAM = 275
MIX_U_MOD = 1 << 31


def _isqrt64(x: np.ndarray) -> np.ndarray:
    r = np.floor(np.sqrt(x.astype(np.float64))).astype(np.int64)
    return r - (r * r > x) + ((r + 1) * (r + 1) <= x)


def q_balanced_mix(sf_dir: str):
    """(lang, n_docs, quota, n_selected) per language."""
    import ray.data
    from ray.data.aggregate import Sum

    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.sources.pages import _uint

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["lang"]}).group_by("lang").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["lang", "c"])

    from osm2gtfs_ray.ops.sharded import bounded_key_sum
    from osm2gtfs_ray.pipelines.geo_queries import _GRID_DRIVER_ROWS, _n_rows

    drv = _n_rows(sf_dir, "documents") <= _GRID_DRIVER_ROWS
    counts = _as_arrow(
        bounded_key_sum(
            docs.map_batches(count_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
            "lang", ["c"], driver=drv, out_names=["n_docs"],
        )
    )
    langs = counts["lang"].to_pylist()
    n_docs = counts["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    quota = np.minimum(n_docs, MIX_FACTOR * _isqrt64(n_docs))
    nmap = dict(zip(langs, n_docs.tolist()))
    qmap = dict(zip(langs, quota.tolist()))

    lang_arr = pa.array(langs, pa.string())
    n_by_code = n_docs.copy()
    q_by_code = quota.copy()

    def sel_partial(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = _uint(did, MIX_STREAM, 42, MIX_U_MOD)
        # vectorized lang -> (n, quota): index_in against the closed
        # language list, then two int64 gathers (no per-row Python)
        codes = pc.index_in(t["lang"], value_set=lang_arr).to_numpy(
            zero_copy_only=False
        )
        nl = n_by_code[codes]
        ql = q_by_code[codes]
        sel = u * nl < ql * np.int64(MIX_U_MOD)
        g = (
            pa.table({"lang": t["lang"], "s": sel.astype(np.int64)})
            .group_by("lang")
            .aggregate([("s", "sum")])
        )
        return g.rename_columns(["lang", "s"])

    sel = _as_arrow(
        bounded_key_sum(
            docs.map_batches(sel_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
            "lang", ["s"], driver=drv, out_names=["n_selected"],
        )
    )
    smap = dict(zip(sel["lang"].to_pylist(),
                    sel["n_selected"].to_numpy(zero_copy_only=False).tolist()))
    order = np.argsort(np.array(langs, dtype=object))
    return ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array([langs[i] for i in order], pa.string()),
                "n_docs": pa.array([int(n_docs[i]) for i in order], pa.int64()),
                "quota": pa.array([int(quota[i]) for i in order], pa.int64()),
                "n_selected": pa.array(
                    [int(smap[langs[i]]) for i in order], pa.int64()
                ),
            }
        )
    )


def sql_balanced_mix() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    r0 = "CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)"
    isq = (f"{r0} - CASE WHEN {r0} * {r0} > n_docs THEN 1 ELSE 0 END"
           f" + CASE WHEN ({r0} + 1) * ({r0} + 1) <= n_docs THEN 1 ELSE 0 END")
    u = _s_uint("did", MIX_STREAM, MIX_U_MOD)
    return f"""
WITH d AS (SELECT CAST(doc_id AS UBIGINT) AS did, lang FROM documents),
cnt AS MATERIALIZED (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM d GROUP BY lang
),
q AS (SELECT lang, n_docs,
             LEAST(n_docs, {MIX_FACTOR} * ({isq})) AS quota
      FROM cnt),
s AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_selected
  FROM d JOIN q ON q.lang = d.lang
  WHERE ({u}) * q.n_docs < q.quota * {MIX_U_MOD}
  GROUP BY d.lang
)
SELECT q.lang, q.n_docs, CAST(q.quota AS BIGINT) AS quota,
       COALESCE(s.n_selected, 0) AS n_selected
FROM q LEFT JOIN s ON s.lang = q.lang
ORDER BY q.lang
"""


# --------------------------------------------------------------------------
# N-gram LM perplexity filter (CCNet/Gopher-style corpus cleaning)
# --------------------------------------------------------------------------
# Train a bigram language model on the reference split (doc_id % 5 != 0
# — the stand-in for CCNet's "train on Wikipedia, score Common Crawl"),
# quantize conditional log-probs to a fixed-point integer table, then
# score EVERY document: nll_fp = -sum lp_fp over its adjacent-token
# bigrams, flagged when the average exceeds LM_PPL_THR_FP (an integer
# cross-multiplied comparison — no float in the scoring path).
#
# Driver-checkable the KMEANS_CENTROIDS_SNAPSHOT way: the trained
# log-prob table (the only non-SQL-expressible artifact — float log
# happens ONCE at training, np.log on exact integer count ratios) is
# snapshotted to parquet and the oracle re-scores all documents with a
# LEFT JOIN onto the same table + the same integer sums. Training
# itself is pytest-asserted against a scalar Counter reference.
#
# 100 TB design: the model is REFERENCE-CORPUS-sized, not corpus-sized
# — CCNet trains on a fixed curated split, so the lp table is bounded
# regardless of how much data is scored (prune rare bigrams with
# LM_MIN_COUNT when the reference split itself is huge). Training is
# one pass over the train split (per-batch Arrow bigram partials →
# w1-hash sharded sums, so c(w1,·) and each c(w1,w2) meet in one shard
# and lp needs NO join); scoring is one pass over the corpus with the
# table broadcast via ray.put (pandas hash-merge per batch).

LM_SCALE = 10**6
LM_OOV_FP = -20 * LM_SCALE       # floor for bigrams unseen in training
# flag: avg nll per bigram > 3.44 nats — sits in the upper tail of the
# synthetic corpus's per-doc average (train docs center ~3.38, held-out
# ~3.42), so both flag classes occur at every test sf
LM_PPL_THR_FP = 3_440_000
LM_MIN_COUNT = 1                 # raise at scale to bound the table
LM_SNAPSHOT = "/tmp/graft_lm_bigram_lp"


def train_bigram_lp(docs):
    """(w1, w2, lp_fp) Dataset from a (text) Dataset: exact bigram /
    context counts, lp_fp = round(log(c12 / c1) * LM_SCALE)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.pipelines.text_queries import _split_tokens

    def partial(t: pa.Table) -> pd.DataFrame:
        flat, offs = _split_tokens(t["text"])
        lens = np.diff(offs)
        nbig = np.maximum(lens - 1, 0)
        tot = int(nbig.sum())
        cs = np.concatenate(([0], np.cumsum(nbig)[:-1]))
        j = np.repeat(offs[:-1] - cs, nbig) + np.arange(tot, dtype=np.int64)
        g = (
            pa.table({"w1": flat.take(j), "w2": flat.take(j + 1)})
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["w1", "w2", "n_part"]).to_pandas()

    def shard_lp(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["w1", "w2"], sort=False)["n_part"].sum()
            .reset_index(name="c12")
        )
        if agg.empty:
            return pd.DataFrame(
                {"w1": pd.Series(dtype="object"),
                 "w2": pd.Series(dtype="object"),
                 "lp_fp": pd.Series(dtype="int64")}
            )
        agg = agg[agg["c12"] >= LM_MIN_COUNT]
        # c1 = c(w1, ·): every (w1, *) row lives in this shard
        c1 = agg.groupby("w1", sort=False)["c12"].transform("sum")
        lp = np.round(
            np.log(agg["c12"].to_numpy(np.float64)
                   / c1.to_numpy(np.float64)) * LM_SCALE
        ).astype(np.int64)
        return pd.DataFrame(
            {"w1": agg["w1"], "w2": agg["w2"], "lp_fp": lp}
        )

    parts = docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return sharded_map_groups(parts, "w1", shard_lp)


def q_lm_perplexity(sf_dir: str):
    """(doc_id, n_bigrams, nll_fp, ppl_flag) for every document."""
    import ray
    import ray.data

    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.pipelines.text_queries import _split_tokens
    from osm2gtfs_ray.state.snapshot import write_snapshot

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def train_split(t: pa.Table) -> pa.Table:
        # doc_id >= 0 in this corpus: plain modulo split, 80% train
        ids = pc.cast(t["doc_id"], pa.int64())
        return t.filter(
            pc.not_equal(
                pc.subtract(ids, pc.multiply(pc.divide(ids, 5),
                                             pa.scalar(5, pa.int64()))),
                pa.scalar(0, pa.int64()),
            )
        ).select(["text"])

    lp_ds = train_bigram_lp(
        docs.map_batches(train_split, batch_format="pyarrow",
                         zero_copy_batch=True)
    )
    import pyarrow.parquet as _pq

    snap = write_snapshot(
        lp_ds, LM_SNAPSHOT,
        extra={"n_src": _pq.ParquetFile(
            f"{sf_dir}/documents.parquet").metadata.num_rows},
    )
    lp_tbl = snap if isinstance(snap, pa.Table) else _as_arrow(snap)
    lp_df = lp_tbl.to_pandas()
    ref = ray.put(lp_df)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        table = ray.get(_ref)  # zero-copy view of the broadcast model
        flat, offs = _split_tokens(t["text"])
        lens = np.diff(offs)
        nbig = np.maximum(lens - 1, 0)
        tot = int(nbig.sum())
        cs = np.concatenate(([0], np.cumsum(nbig)[:-1]))
        j = np.repeat(offs[:-1] - cs, nbig) + np.arange(tot, dtype=np.int64)
        row = np.repeat(np.arange(len(t), dtype=np.int64), nbig)
        bg = pd.DataFrame(
            {
                "row": row,
                "w1": flat.take(j).to_pandas(),
                "w2": flat.take(j + 1).to_pandas(),
            }
        )
        sc = bg.merge(table, on=["w1", "w2"], how="left")
        lp = sc["lp_fp"].fillna(LM_OOV_FP).astype(np.int64).to_numpy()
        nll = np.zeros(len(t), dtype=np.int64)
        np.add.at(nll, sc["row"].to_numpy(np.int64), -lp)
        flag = (nll > np.int64(LM_PPL_THR_FP) * nbig).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_bigrams": pa.array(nbig, pa.int64()),
                "nll_fp": pa.array(nll, pa.int64()),
                "ppl_flag": pa.array(flag, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_lm_perplexity() -> str:
    from osm2gtfs_ray.state.snapshot import sql_guard

    return rf"""
WITH lp AS (
  SELECT w1, w2, CAST(lp_fp AS BIGINT) AS lp_fp
  FROM read_parquet('{LM_SNAPSHOT}/*.parquet')
  WHERE {sql_guard(LM_SNAPSHOT, "documents")} = 1
),
toks AS (
  SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 1)) AS i
  ) t
),
sc AS (
  SELECT b.doc_id, COALESCE(l.lp_fp, {LM_OOV_FP}) AS lp
  FROM bg b LEFT JOIN lp l ON b.w1 = l.w1 AND b.w2 = l.w2
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(-SUM(lp) AS BIGINT) AS nll_fp
  FROM sc GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(a.nll_fp, 0) AS BIGINT) AS nll_fp,
       CAST(CASE WHEN COALESCE(a.nll_fp, 0)
                      > {LM_PPL_THR_FP} * COALESCE(a.n_bigrams, 0)
            THEN 1 ELSE 0 END AS BIGINT) AS ppl_flag
FROM toks t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
"""
