"""Text-analysis + dedup queries over the documents table, with SQL
oracles where DuckDB can express the same computation exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from osm2gtfs_ray.sources.tables import read_table
from osm2gtfs_ray.stages.text import Fingerprint, LangId, QualityScore, token_count_arrow


# --------------------------------------------------------------------------
# Token stats per language (vectorized Arrow regex counting)
# --------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["lang", "text"])

    def f(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"], "n_tokens": token_count_arrow(t["text"])})
            .group_by("lang")
            .aggregate([("n_tokens", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["lang", "tok_part", "doc_part"])

    agg = (
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("tok_part", alias_name="total_tokens"), Sum("doc_part", alias_name="n_docs"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "total_tokens": pc.cast(t["total_tokens"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_TOKEN_STATS = r"""
SELECT lang,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS total_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Corpus vocabulary: global top-k terms by occurrence count
# --------------------------------------------------------------------------

_TOP_TERMS_K = 50


def q_top_terms(sf_dir: str, k: int = _TOP_TERMS_K):
    """Global top-k vocabulary terms (whitespace tokens, case-sensitive)
    with total occurrence counts — the corpus-statistics building block
    for vocab construction / stopword discovery.

    Plan: per-batch Arrow split+count partials (map-side combine: at
    most |batch vocab| rows leave a batch) → term-hash sharded sum →
    per-shard top-k (exact: a term lives wholly in one shard) → tiny
    driver-side final top-k. The corpus streams once; nothing
    vocabulary-sized ever sits in one process except the k-row result.
    Tie-break: count desc, then term asc (deterministic)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        words = pc.list_flatten(
            pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
        )
        words = words.filter(pc.not_equal(words, ""))
        g = pa.table({"term": words}).group_by("term").aggregate([([], "count_all")])
        return g.rename_columns(["term", "n_part"]).to_pandas()

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def shard_top(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", sort=False)["n_part"].sum().reset_index(name="n")
        return agg.sort_values(
            ["n", "term"], ascending=[False, True], kind="mergesort"
        ).head(k)

    tops = sharded_map_groups(parts, "term", shard_top).to_pandas()
    out = (
        tops.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["term", "n"]]


SQL_TOP_TERMS = r"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS term FROM documents
),
counts AS (SELECT term, COUNT(*) AS n FROM words WHERE term <> '' GROUP BY term)
SELECT term, CAST(n AS BIGINT) AS n FROM counts
ORDER BY n DESC, term ASC LIMIT 50
"""


# --------------------------------------------------------------------------
# BPE-ish token estimate per language (GPT-2 pretokenizer regex, same
# re2 pattern in the Arrow kernel and the DuckDB oracle)
# --------------------------------------------------------------------------

def q_bpe_token_stats(sf_dir: str):
    """Per language: BPE-ish (GPT-2 pretokenizer) token total next to
    the whitespace total — the corpus-size estimate an LLM training
    pipeline budgets by. Map-side per-batch combine → 5-group final
    aggregate."""
    from osm2gtfs_ray.stages.text import bpe_token_count_arrow

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])

    def f(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "lang": t["lang"],
                    "bpe": bpe_token_count_arrow(t["text"]),
                    "ws": token_count_arrow(t["text"]),
                }
            )
            .group_by("lang")
            .aggregate([("bpe", "sum"), ("ws", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["lang", "bpe_part", "ws_part", "doc_part"])

    agg = (
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("bpe_part", alias_name="bpe_tokens"),
            Sum("ws_part", alias_name="ws_tokens"),
            Sum("doc_part", alias_name="n_docs"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "bpe_tokens": pc.cast(t["bpe_tokens"], pa.int64()),
                "ws_tokens": pc.cast(t["ws_tokens"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _sql_bpe_token_stats() -> str:
    from osm2gtfs_ray.stages.text import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return rf"""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS bpe_tokens,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS ws_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


SQL_BPE_TOKEN_STATS = _sql_bpe_token_stats()


# --------------------------------------------------------------------------
# Leakage-safe deterministic train/val/test split: every doc in an
# exact-duplicate group lands in the SAME split (split keyed on the
# group root's hash, not the doc's), so a dup pair can never straddle
# train and eval — the standard contamination guard in LLM data prep.
# --------------------------------------------------------------------------

_SPLIT_STREAM = 77
_SPLIT_SEED = 42


def q_sample_split(sf_dir: str):
    """doc_id → (group_root, split) with split = splitmix64(group
    root) % 100 bucketed 90/5/5. One text-sharded shuffle derives the
    per-text root and attaches it to every member row (vectorized
    transform per shard, ops/sharded.py); the hash is the same mix64
    the page synthesizer uses, reproduced bit-exactly in the SQL
    oracle (flagship_oracle._s_uint)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _uint

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def attach_root(g: pd.DataFrame) -> pd.DataFrame:
        root = g.groupby("text", sort=False)["doc_id"].transform("min")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "group_root": root.to_numpy(np.int64),
            }
        )

    rooted = sharded_map_groups(docs, "text", attach_root)

    def assign_split(t: pa.Table) -> pa.Table:
        root = t["group_root"].to_numpy().astype(np.uint64)
        h = _uint(root, _SPLIT_STREAM, _SPLIT_SEED, 100)
        split = np.where(h < 90, "train", np.where(h < 95, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "group_root": t["group_root"],
                "split": pa.array(split, pa.string()),
            }
        )

    return rooted.map_batches(assign_split, batch_format="pyarrow")


def _sql_sample_split() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    h = _s_uint("CAST(group_root AS UBIGINT)", _SPLIT_STREAM, 100)
    return f"""
WITH roots AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS group_root
  FROM documents
)
SELECT doc_id, CAST(group_root AS BIGINT) AS group_root,
       CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, group_root, {h} AS h FROM roots)
"""


SQL_SAMPLE_SPLIT = _sql_sample_split()


# --------------------------------------------------------------------------
# Exact dedup by content (groupby text → keep min doc_id + copy count)
# --------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    """Exact dedup: content-hash sharded shuffle, keep-first (min
    doc_id) + copy count — the J1/J3/G7 first-wins semantics applied to
    documents. Map-side combine: each batch reduces to one partial per
    distinct text BEFORE the shuffle; each shard then aggregates all
    its texts in one vectorized pandas groupby (never one Python call
    per distinct text)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def local_part(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("text", as_index=False, sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )

    def shard_agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text", as_index=False, sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum")
        )
        return out[["doc_id", "n_copies"]]

    return sharded_map_groups(docs, "text", shard_agg, local_pre=local_part)


SQL_EXACT_DEDUP = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


# --------------------------------------------------------------------------
# Quality scoring (regex count metrics; English docs)
# --------------------------------------------------------------------------

def q_doc_quality(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    en = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], pa.scalar("en"))), batch_format="pyarrow"
    )
    # stateless task: QualityScore holds no state at all (pure pandas
    # str kernels) — an actor pool would be pure startup overhead
    scored = en.map_batches(QualityScore(), batch_format="pandas")
    return scored.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "punct_ct", "upper_ct"]),
        batch_format="pyarrow",
    )


SQL_DOC_QUALITY = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct,
       length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS upper_ct
FROM documents WHERE lang = 'en'
"""


# --------------------------------------------------------------------------
# Language-ID confusion matrix, with an exact SQL oracle: the heuristic
# is argmax of |distinct(words) ∩ stopwords(lang)| with hits>0 and
# lexicographically-first tie-break (stages/text.py LangId) — all of
# which SQL can express (the corpus is pure ASCII, so re2's \w and
# Python's unicode \w agree; verified over the testdata tables).
# --------------------------------------------------------------------------

def _sql_lang_id() -> str:
    from osm2gtfs_ray.stages.text import _STOPWORDS

    sw_rows = ",\n".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
        if "'" not in w
    )
    return rf"""
WITH sw(slang, sword) AS (VALUES {sw_rows}),
toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[\w'']+'))) AS w
  FROM documents
),
hits AS (
  SELECT t.doc_id, s.slang, COUNT(*) AS h
  FROM toks t JOIN sw s ON t.w = s.sword
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, slang AS lang_pred,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, slang ASC) AS rn
  FROM hits
),
pred AS (
  SELECT d.lang, COALESCE(b.lang_pred, 'und') AS lang_pred
  FROM documents d
  LEFT JOIN (SELECT doc_id, lang_pred FROM best WHERE rn = 1) b USING (doc_id)
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


SQL_LANG_ID = _sql_lang_id()


def q_lang_id(sf_dir: str):
    from ray.data.aggregate import Sum

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    # stateless task (not an actor pool): LangId's derived state is a
    # compiled regex + 5 tiny stopword sets — rebuild cost is nil, so
    # pool startup would be pure overhead at any scale
    lid = LangId()

    def pred_counts(df):
        out = lid(df)
        # map-side combine: the confusion matrix has ≤ |langs|² cells,
        # so per-batch partial counts shrink the shuffle to O(batches)
        return (
            out.groupby(["lang", "lang_pred"], sort=False)
            .size()
            .reset_index(name="n")
        )

    parts = docs.map_batches(pred_counts, batch_format="pandas")
    agg = parts.groupby(["lang", "lang_pred"]).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table(
            {"lang": t["lang"], "lang_pred": t["lang_pred"], "n": pc.cast(t["n"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Document fingerprinting with an exact SQL oracle: the polynomial
# rolling hash h = H0·B^n + Σ bᵢ·B^(n-1-i) (mod 2^64) re-derived in
# DuckDB — powers via a recursive CTE with HUGEINT mod-2^64 arithmetic,
# per-byte terms via lateral range unnest (corpus is ASCII so
# ord(char) == utf-8 byte), and the one variable×constant 64-bit
# multiply (H0·B^n) split at 2^32 like flagship_oracle._s_mul.
# --------------------------------------------------------------------------

def _sql_fingerprint() -> str:
    from osm2gtfs_ray.stages.text import Fingerprint

    u64 = 1 << 64
    h0 = int(Fingerprint.H0)
    b = int(Fingerprint.B)
    return f"""
WITH RECURSIVE pw(k, v) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT k + 1, (v * {b}) % {u64} FROM pw
    WHERE k < (SELECT MAX(length(text)) FROM documents)
),
byts AS (
  SELECT d.doc_id, length(d.text) AS n, t.i,
         ord(substr(d.text, CAST(t.i AS INT) + 1, 1)) AS b
  FROM documents d, LATERAL (SELECT unnest(range(length(d.text))) AS i) t
),
terms AS (
  SELECT doc_id, n, (CAST(b AS HUGEINT) * pw.v) % {u64} AS term
  FROM byts JOIN pw ON pw.k = n - 1 - i
),
sums AS (
  SELECT doc_id, n, SUM(term) AS s FROM terms GROUP BY 1, 2
)
SELECT d.doc_id,
  CAST((COALESCE(s.s, 0)
    + ((CAST(pn.v AS HUGEINT) // 4294967296 * {h0}) % 4294967296) * 4294967296
    + (CAST(pn.v AS HUGEINT) % 4294967296) * {h0}) % {u64} AS UBIGINT) AS fp64
FROM documents d
LEFT JOIN sums s USING (doc_id)
JOIN pw pn ON pn.k = length(d.text)
"""


SQL_FINGERPRINT = _sql_fingerprint()


def q_fingerprint(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # stateless task: Fingerprint's only state is a 32 KB power table
    # (ships in the closure, regrown on demand) — no actor pool needed
    out = docs.map_batches(Fingerprint(), batch_format="pyarrow")
    return out.select_columns(["doc_id", "fp64"])


# --------------------------------------------------------------------------
# Dedup components (connected clusters) with a WITH RECURSIVE SQL oracle
# --------------------------------------------------------------------------

def q_dup_components(sf_dir: str):
    """Duplicate-cluster grouping: star edges to the min doc_id of each
    exact-text group UNION star edges to the min doc_id of each
    (lang, token_count) group, merged by distributed connected
    components (ops/components.py). Exercises chain merging across the
    two keys — the same cluster semantics as the MinHash dedup path
    (SURVEY.md §2.7) but over SQL-expressible edges, so the driver can
    hash-verify the components operator end to end.

    Scale note: the root tables (one row per distinct text / per
    (lang, ntok) bucket) join back via broadcast here; at corpus scale
    both sides stream through ops.joins.hash_join instead.
    """
    from ray.data.aggregate import Min

    from osm2gtfs_ray.ops.components import connected_components
    from osm2gtfs_ray.ops.joins import _as_arrow, broadcast_join

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def with_keys(t: pa.Table) -> pa.Table:
        ntok = token_count_arrow(t["text"])
        gkey = pc.binary_join_element_wise(
            t["lang"], pc.cast(ntok, pa.string()), "|"
        )
        return pa.table({"doc_id": t["doc_id"], "text": t["text"], "gkey": gkey})

    # materialize: base feeds three consumers (roots groupby + two join
    # big sides); un-materialized each would re-run the read+tokenize.
    # Blocks stay distributed in the object store (spillable) — this is
    # block reuse, not a driver collect.
    base = docs.map_batches(
        with_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # BOTH root tables out of ONE shuffle: rows (kind, key) with kind 0
    # = exact text, kind 1 = lang|ntok bucket, map-side pre-min per
    # batch, one groupby-min — instead of two full passes over base.
    def key_rows(t: pa.Table) -> pa.Table:
        doc2 = pa.concat_arrays(
            [t["doc_id"].combine_chunks(), t["doc_id"].combine_chunks()]
        )
        stacked = pa.table(
            {
                "kind": pa.array(
                    np.repeat(np.array([0, 1], np.int64), t.num_rows)
                ),
                "key": pa.concat_arrays(
                    [
                        t["text"].combine_chunks().cast(pa.string()),
                        t["gkey"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "doc_id": doc2,
            }
        )
        g = stacked.group_by(["kind", "key"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["kind", "key", "b"])

    roots = _as_arrow(
        base.map_batches(key_rows, batch_format="pyarrow")
        .groupby(["kind", "key"])
        .aggregate(Min("b", alias_name="b"))
    )
    text_roots = (
        roots.filter(pc.equal(roots["kind"], 0))
        .select(["key", "b"]).rename_columns(["text", "b"])
    )
    grp_roots = (
        roots.filter(pc.equal(roots["kind"], 1))
        .select(["key", "b"]).rename_columns(["gkey", "b"])
    )
    e1 = broadcast_join(
        base.select_columns(["doc_id", "text"]), text_roots, keys="text"
    ).map_batches(
        lambda t: pa.table({"a": t["doc_id"], "b": t["b"]}), batch_format="pyarrow"
    )
    e2 = broadcast_join(
        base.select_columns(["doc_id", "gkey"]), grp_roots, keys="gkey"
    ).map_batches(
        lambda t: pa.table({"a": t["doc_id"], "b": t["b"]}), batch_format="pyarrow"
    )
    comp = connected_components(e1.union(e2))
    return comp.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["node"], pa.int64()),
                "component": pc.cast(t["component"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_DUP_COMPONENTS = r"""
WITH RECURSIVE
tok AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ntok
  FROM documents
),
e1 AS (SELECT doc_id AS a, MIN(doc_id) OVER (PARTITION BY text) AS b FROM documents),
e2 AS (SELECT doc_id AS a, MIN(doc_id) OVER (PARTITION BY lang, ntok) AS b FROM tok),
edges AS (SELECT a, b FROM e1 UNION SELECT a, b FROM e2),
sym AS (
  SELECT a, b FROM edges UNION SELECT b, a FROM edges
  UNION SELECT a, a FROM edges
),
reach(node, m) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON r.m = s.a
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(m) AS BIGINT) AS component
FROM reach GROUP BY node
"""


# --------------------------------------------------------------------------
# Inverted index build (term → posting rows) — the retrieval-side
# companion to q_top_terms. Reference analogue: the stop/route lookup
# dicts osm2gtfs builds once and probes per trip
# (reference creators build id→object indexes); here the "index" is
# data, emitted as (term, doc_id, tf) posting rows.
# --------------------------------------------------------------------------

def q_inverted_index(sf_dir: str):
    """Posting list in flat form: one row per (term, doc_id) with the
    in-document term frequency. Embarrassingly parallel — each document
    lives wholly in one row, so every batch computes its postings with
    zero shuffle (Arrow split → list_parent_indices → one vectorized
    groupby per batch). At 10^12 docs this is a pure map stage whose
    output writes straight to term-bucketed parquet; the only global
    step a consumer might add (sorting postings by term) is the
    sink's partitioning, not a pipeline barrier."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        doc_ids = pc.take(t["doc_id"].combine_chunks(), parent)
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"term": flat.filter(keep), "doc_id": doc_ids.filter(keep)})
            .group_by(["term", "doc_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["term", "doc_id", "tf"])

    ds = docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "tf": pc.cast(t["tf"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_INVERTED_INDEX = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
)
SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM words WHERE term <> '' GROUP BY term, doc_id
"""


# --------------------------------------------------------------------------
# TF-IDF top terms per document — the classic relevance ranking,
# distributed as two posting-row shuffles (term-keyed df join, then
# doc-keyed top-k). No vocabulary-sized broadcast anywhere.
# --------------------------------------------------------------------------

_TFIDF_K = 3


def q_tfidf_top_terms(sf_dir: str, k: int = _TFIDF_K):
    """Top-k terms per doc by tf·ln(N/df), ties → term asc.

    Plan: batch-local postings (zero shuffle, as q_inverted_index) →
    term-hash sharded shuffle attaches df to every posting (a term's
    postings land wholly in one shard, so df is an in-shard groupby —
    never a vocabulary broadcast) → doc-hash sharded shuffle takes the
    per-doc top-k (a doc's postings co-locate). Both shuffles move
    posting rows only; N comes from parquet count metadata. Score
    floats are computed identically here (np.log, float64) and in the
    oracle (LN, float64) from identical integer inputs, so comparisons
    rank identically; ties are broken on the integer/string columns."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata — no scan

    def postings(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        doc_ids = pc.take(t["doc_id"].combine_chunks(), parent)
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"term": flat.filter(keep), "doc_id": doc_ids.filter(keep)})
            .group_by(["term", "doc_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["term", "doc_id", "tf"])

    posts = docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy(deep=False)
        out["df"] = g.groupby("term", sort=False)["doc_id"].transform("size")
        return out

    with_df = sharded_map_groups(posts, "term", attach_df)

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        score = g["tf"].to_numpy(np.float64) * np.log(
            float(n_docs) / g["df"].to_numpy(np.float64)
        )
        out = g.assign(score=score).sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
        out = out[out["rank"] <= k]
        return out[["doc_id", "rank", "term", "tf", "df"]]

    res = sharded_map_groups(with_df, "doc_id", doc_topk)
    return res.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "rank": pc.cast(t["rank"], pa.int64()),
                "term": t["term"],
                "tf": pc.cast(t["tf"], pa.int64()),
                "df": pc.cast(t["df"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_TFIDF_TOP_TERMS = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM words WHERE term <> '' GROUP BY term, doc_id
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM (
  SELECT doc_id, term, tf, df,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC
         ) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# Normalization-then-dedup: case/punctuation/whitespace-insensitive
# exact dedup (the cheap canonicalization pass a corpus runs before
# the expensive near-dup stages). Same first-wins semantics as
# q_exact_dedup; both the Arrow kernel and DuckDB run RE2, so the
# normalization is literally the same regex engine on both sides.
# --------------------------------------------------------------------------

def q_norm_dedup(sf_dir: str):
    """lowercase → strip [.,!?;:] → collapse whitespace → trim, then
    exact dedup on the normalized text: min doc_id + copy count per
    normalized form. Map-side combine before the one content-keyed
    shuffle (same shape as q_exact_dedup)."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def normalize(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, r"[.,!?;:]", "")
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({"doc_id": t["doc_id"], "norm_text": s})

    normed = docs.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)

    def local_part(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("norm_text", as_index=False, sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )

    def shard_agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("norm_text", as_index=False, sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum")
        )
        return out[["doc_id", "n_copies"]]

    return sharded_map_groups(normed, "norm_text", shard_agg, local_pre=local_part)


SQL_NORM_DEDUP = r"""
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                             '\s+', ' ', 'g')) AS norm_text
  FROM documents
)
GROUP BY norm_text
"""


# --------------------------------------------------------------------------
# BM25 top-k retrieval — the ranking function a web search index runs,
# over the corpus's own most-frequent terms as the query set (so the
# workload is self-contained at every sf). Single-term queries make
# idf a per-term constant, so the ranking key reduces to the
# tf-saturation / length-normalization core of BM25:
#
#     score ∝ tf / (tf + k1*(1 - b + b*dl/avgdl))      k1=1.2, b=0.75
#
# Both sides compute the key as ONE double division of two EXACT
# int64s — tf / (20*T*tf + 6*T + 18*dl*N), the k1/b rationals and
# avgdl=T/N cleared to integers — so the only float op is a single
# IEEE divide evaluated identically in numpy and DuckDB; ties break on
# doc_id. (At corpora where 20*T*tf overflows int64 the denominator
# must move to double; the divide-once discipline stays.) Output
# columns are integers/strings only, the tfidf_top_terms rule.
#
# Plan: batch-local postings + doc lengths (each doc wholly in one
# row) → term-sharded df → tiny top-QN term list collected + broadcast
# → candidate postings filtered per batch (no second shuffle of
# non-query terms) → term-sharded top-k. Reference analogue: the
# stop-name lookup ranking in osm2gtfs/creators/trips_creator*.py
# (best-match selection per query key), generalized to corpus-scale
# retrieval.
# --------------------------------------------------------------------------

_BM25_QN = 8   # query set: top-QN terms by (df desc, term asc)
_BM25_K = 5    # docs returned per query term


def q_bm25_topk(sf_dir: str, qn: int = _BM25_QN, k: int = _BM25_K):
    """Top-k documents per query term under BM25 (k1=1.2, b=0.75).
    Output: (term, rank, doc_id, tf, dl)."""
    from ray.data.aggregate import Sum

    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata — no scan

    def postings(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        doc_ids = pc.take(t["doc_id"].combine_chunks(), parent)
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"term": flat.filter(keep), "doc_id": doc_ids.filter(keep)})
            .group_by(["term", "doc_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["term", "doc_id", "tf"])

    posts = docs.map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    )

    # per-term document frequency + per-term token mass (block partials
    # are already unique on (term, doc_id), so count == df)
    def df_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"term": t["term"], "df": np.ones(len(t), np.int64),
                      "mass": pc.cast(t["tf"], pa.int64())})
            .group_by("term")
            .aggregate([("df", "sum"), ("mass", "sum")])
        )
        return g.rename_columns(["term", "df", "mass"])

    dfs = (
        posts.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("mass", alias_name="mass"))
    ).materialize()

    # total corpus tokens T = distributed sum over the term table;
    # query set = distributed top-QN by (df desc, term asc) — only QN
    # rows ever reach the driver (the vocabulary table itself never
    # does: corpus-scale vocabularies are millions of terms)
    total_tokens = int(dfs.sum("mass"))
    top = dfs.sort(["df", "term"], descending=[True, False]).limit(qn)
    qterms = np.sort(
        np.asarray([r["term"] for r in top.take_all()], dtype="U32")
    )

    # candidate pass: a SECOND tokenize over documents (each doc wholly
    # in one row, so dl is exact under any batching — posting blocks
    # could split a doc across batches). Emits (term, doc_id, tf, dl)
    # for QUERY terms only; docs without a query term never reach the
    # shuffle.
    def candidates(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(t["text"].combine_chunks(), r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dl = np.bincount(parent[keep], minlength=len(t)).astype(np.int64)
        terms = np.asarray(flat.to_pylist(), dtype="U32")
        hit = keep & np.isin(terms, qterms)
        g = (
            pa.table({"term": terms[hit], "p": parent[hit]})
            .group_by(["term", "p"])
            .aggregate([([], "count_all")])
        ).rename_columns(["term", "p", "tf"])
        p = g["p"].to_numpy(zero_copy_only=False)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "term": g["term"],
                "doc_id": doc_ids[p],
                "tf": pc.cast(g["tf"], pa.int64()),
                "dl": dl[p],
            }
        )

    cand = docs.map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        tf = g["tf"].to_numpy(np.int64)
        dl = g["dl"].to_numpy(np.int64)
        den = 20 * total_tokens * tf + 6 * total_tokens + 18 * dl * n_docs
        s = tf.astype(np.float64) / den
        out = g.assign(score=s).sort_values(
            ["term", "score", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        out["rank"] = out.groupby("term", sort=False).cumcount() + 1
        out = out[out["rank"] <= k]
        return out[["term", "rank", "doc_id", "tf", "dl"]]

    res = sharded_map_groups(cand, "term", topk)
    return res.map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "rank": pc.cast(t["rank"], pa.int64()),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "tf": pc.cast(t["tf"], pa.int64()),
                "dl": pc.cast(t["dl"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_BM25_TOPK = rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM words WHERE term <> '' GROUP BY term, doc_id
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
tt AS (SELECT SUM(dl) AS total FROM dl),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
qterms AS (SELECT term FROM df ORDER BY df DESC, term ASC LIMIT {_BM25_QN}),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
         CAST(tf.tf AS DOUBLE)
           / (20 * tt.total * tf.tf + 6 * tt.total + 18 * dl.dl * n.n_docs)
           AS s
  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN tt
)
SELECT term, rank, doc_id, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl
FROM (
  SELECT term, doc_id, tf, dl,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY term ORDER BY s DESC, doc_id ASC
         ) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= {_BM25_K}
ORDER BY term, rank
"""


# --------------------------------------------------------------------------
# PMI bigram collocations: top-k adjacent word pairs by pointwise
# mutual information — the classic collocation-discovery statistic
# ("New York" scores high because its joint count dwarfs what its
# unigram frequencies predict). Scores are EXACT fixed-point integers:
#
#     pmi_fp = (c12 * N_u^2 * 10^6) // (N_b * c1 * c2)
#
# (monotone in exp(PMI); log is not needed for ranking). The bounded
# candidate stage computes it in Python big-ints (N_u^2 overflows
# int64 at corpus scale) and emits int64 — bit-exact vs the oracle's
# HUGEINT arithmetic. MIN count guard c12 >= PMI_MIN_PAIR kills the
# singleton-pair noise PMI is notorious for.
#
# Scale plan: bigrams never leave their batch raw — per-batch Arrow
# group-by partials (ragged-offset vectorized adjacent pairing, no
# Python per token) -> ONE pair-hash sharded sum; unigram counts the
# same shape; the two global totals are Dataset sums; candidates
# (post-filter, vocabulary-bounded) take two hash joins for c1/c2 and
# a distributive per-block top-k before the tiny driver head.

PMI_MIN_PAIR = 5
PMI_K = 100
PMI_SCALE = 10**6


def _split_tokens(texts: pa.ChunkedArray):
    """Trimmed whitespace split; returns (values, offsets) of the
    ListArray. Empty docs yield a single '' token (excluded by
    callers), interior runs of whitespace never produce ''."""
    arr = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(texts.combine_chunks()), r"\s+"
    )
    return arr.values, arr.offsets.to_numpy()


def pmi_prescreen_keep(approx: np.ndarray, k: int) -> np.ndarray:
    """Float-prescreen mask provably containing the exact top-k.

    float64 carries ~1e-16 relative error per multiply/divide (5 ops
    in the approx formula, < 1e-15 relative total) and the exact
    floor loses < 1 absolute, so a margin of |kth|*1e-12 + 2 below
    the k-th approx value is a safe envelope at any corpus scale
    (the r4 advisor note: a constant 2.0 margin breaks once
    pmi_fp ≳ 1e17). Fuzz-tested with adversarially large counts in
    tests/test_ops.py::TestPmiPrescreen."""
    if len(approx) <= k:
        return np.ones(len(approx), dtype=bool)
    kth = np.partition(approx, len(approx) - k)[len(approx) - k]
    return approx >= kth - (abs(kth) * 1e-12 + 2.0)


def q_pmi_bigrams(sf_dir: str, k: int = PMI_K):
    """Top-k (w1, w2, n_pair, pmi_fp) adjacent-token collocations."""
    from osm2gtfs_ray.ops.joins import hash_join
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["text"])

    def uni_partial(t: pa.Table) -> pd.DataFrame:
        flat, _ = _split_tokens(t["text"])
        words = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"term": words}).group_by("term").aggregate([([], "count_all")])
        return g.rename_columns(["term", "n_part"]).to_pandas()

    def big_partial(t: pa.Table) -> pd.DataFrame:
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

    def shard_sum(cols):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            return (
                g.groupby(cols, sort=False)["n_part"].sum().reset_index(name="c")
            )
        return f

    uni = sharded_map_groups(
        docs.map_batches(uni_partial, batch_format="pyarrow", zero_copy_batch=True),
        "term", shard_sum(["term"]),
    ).materialize()
    big = sharded_map_groups(
        docs.map_batches(big_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"], shard_sum(["w1", "w2"]),
    ).materialize()

    n_u = int(uni.sum("c"))
    n_b = int(big.sum("c"))

    cand = big.filter(expr=f"c >= {PMI_MIN_PAIR}")
    u1 = uni.map_batches(
        lambda t: pa.table({"w1": t["term"], "c1": pc.cast(t["c"], pa.int64())}),
        batch_format="pyarrow",
    )
    u2 = uni.map_batches(
        lambda t: pa.table({"w2": t["term"], "c2": pc.cast(t["c"], pa.int64())}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        hash_join(cand, u1, "w1", num_partitions=2),
        u2, "w2", num_partitions=2,
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # keep the block schema stable for empty joins
            return pd.DataFrame(
                {
                    "w1": pd.Series(dtype="object"),
                    "w2": pd.Series(dtype="object"),
                    "n_pair": pd.Series(dtype="int64"),
                    "pmi_fp": pd.Series(dtype="int64"),
                }
            )
        # Exact big-int scoring, but only on a float-prescreened
        # slice (pmi_prescreen_keep: value-scaled margin provably
        # containing the exact top-k at any corpus scale) — the
        # Python big-int loop runs on <= O(k) rows per block, never
        # the whole candidate set.
        approx = (
            df["c"].to_numpy(np.float64) * float(n_u) * float(n_u)
            * float(PMI_SCALE)
            / (float(n_b) * df["c1"].to_numpy(np.float64)
               * df["c2"].to_numpy(np.float64))
        )
        df = df[pmi_prescreen_keep(approx, k)]
        pmi = [
            (int(c12) * n_u * n_u * PMI_SCALE) // (n_b * int(c1) * int(c2))
            for c12, c1, c2 in zip(df["c"], df["c1"], df["c2"])
        ]
        # int64-fit must be loud, not a silent wrap in the Series cast
        if pmi and max(pmi) > 2**63 - 1:
            raise OverflowError(
                f"pmi_fp {max(pmi)} exceeds int64; lower PMI_SCALE"
            )
        out = pd.DataFrame(
            {
                "w1": df["w1"],
                "w2": df["w2"],
                "n_pair": df["c"].astype("int64"),
                "pmi_fp": pd.Series(pmi, index=df.index, dtype="int64"),
            }
        )
        return out.sort_values(
            ["pmi_fp", "w1", "w2"], ascending=[False, True, True],
            kind="mergesort",
        ).head(k)

    tops = joined.map_batches(block_topk, batch_format="pandas").to_pandas()
    return (
        tops.sort_values(
            ["pmi_fp", "w1", "w2"], ascending=[False, True, True],
            kind="mergesort",
        )
        .head(k)
        .reset_index(drop=True)
    )


SQL_PMI_BIGRAMS = rf"""
WITH toks AS (
  SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
  FROM documents
),
uni AS (SELECT unnest(ws) AS term FROM toks),
uc AS (SELECT term, CAST(COUNT(*) AS HUGEINT) AS c FROM uni GROUP BY term),
nu AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nu FROM uni),
big AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS HUGEINT) AS c12 FROM big GROUP BY w1, w2),
nb AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nb FROM big),
cand AS (SELECT * FROM bc WHERE c12 >= {PMI_MIN_PAIR})
SELECT c.w1, c.w2, CAST(c.c12 AS BIGINT) AS n_pair,
       CAST((c.c12 * nu.nu * nu.nu * {PMI_SCALE}) // (nb.nb * u1.c * u2.c)
            AS BIGINT) AS pmi_fp
FROM cand c
JOIN uc u1 ON u1.term = c.w1
JOIN uc u2 ON u2.term = c.w2
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi_fp DESC, w1, w2 LIMIT {PMI_K}
"""


# --------------------------------------------------------------------------
# Duplicate n-gram span fraction: per doc, how many of its word
# 5-gram positions carry a gram that also appears in ANOTHER document
# — the intra-corpus duplicate-span signal behind exact-substring
# dedup (train-set memorization risk scales with it). Distinct from
# ngram_jaccard (pairwise similarity) and contamination (overlap vs a
# benchmark subset): this is a per-document corpus-wide measure.
#
# Scale plan: a doc lives wholly in one batch, so per-batch
# (gram, doc) position-count partials are already globally unique per
# pair; ONE gram-hash sharded pass computes document frequency per
# gram (group size == distinct docs) and flags dup positions; ONE
# doc-keyed groupby sums the per-doc totals. Gram strings travel the
# first shuffle (the top_terms discipline); nothing vocabulary-sized
# ever sits on one node.

DUPGRAM_K = 5


def q_dup_ngram_spans(sf_dir: str):
    """(doc_id, n_grams, n_dup): word-5-gram positions total / with
    corpus document-frequency >= 2. Docs with < 5 tokens emit no row."""
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    k = DUPGRAM_K

    def gram_partial(t: pa.Table) -> pd.DataFrame:
        flat, offs = _split_tokens(t["text"])
        lens = np.diff(offs)
        ng = np.maximum(lens - (k - 1), 0)
        tot = int(ng.sum())
        if tot == 0:
            return pd.DataFrame(
                {"g": pd.Series(dtype="object"),
                 "doc_id": pd.Series(dtype="int64"),
                 "npos": pd.Series(dtype="int64")}
            )
        cs = np.concatenate(([0], np.cumsum(ng)[:-1]))
        j = np.repeat(offs[:-1] - cs, ng) + np.arange(tot, dtype=np.int64)
        parts = [flat.take(j + d) for d in range(k)]
        g = pc.binary_join_element_wise(*parts, " ")
        did = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), ng)
        agg = (
            pa.table({"g": g, "doc_id": did})
            .group_by(["g", "doc_id"])
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["g", "doc_id", "npos"]).to_pandas()

    parts = docs.map_batches(
        gram_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        # (g, doc_id) pairs are globally unique -> group size IS the
        # gram's document frequency; pre-reduce per doc inside the
        # shard so the doc shuffle moves O(docs) not O(grams) rows
        dfreq = g.groupby("g", sort=False)["doc_id"].transform("size")
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "npos": g["npos"].to_numpy(np.int64),
                "ndup": np.where(dfreq.to_numpy() >= 2,
                                 g["npos"].to_numpy(np.int64), 0),
            }
        )
        return out.groupby("doc_id", sort=False, as_index=False)[
            ["npos", "ndup"]
        ].sum()

    mid = sharded_map_groups(parts, "g", per_gram)

    # second sharded pass instead of a Ray groupby: the hash-shuffle
    # Aggregate spun ~6x longer than the whole rest of the query on
    # this 5k-key table (measured 30s -> 4.7s end-to-end at sf0.1)
    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", sort=False, as_index=False)[
            ["npos", "ndup"]
        ].sum()
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].to_numpy(np.int64),
                "n_grams": agg["npos"].to_numpy(np.int64),
                "n_dup": agg["ndup"].to_numpy(np.int64),
            }
        )

    return sharded_map_groups(mid, "doc_id", per_doc)


SQL_DUP_NGRAM_SPANS = rf"""
WITH toks AS (
  SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+{DUPGRAM_K - 1}], ' ') AS g
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - {DUPGRAM_K - 1})) AS i
  ) t
),
gd AS (SELECT g, doc_id, CAST(COUNT(*) AS BIGINT) AS npos
       FROM grams GROUP BY g, doc_id),
df AS (SELECT g, COUNT(*) AS df FROM gd GROUP BY g)
SELECT gd.doc_id, CAST(SUM(gd.npos) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.df >= 2 THEN gd.npos ELSE 0 END) AS BIGINT)
         AS n_dup
FROM gd JOIN df USING (g)
GROUP BY gd.doc_id ORDER BY gd.doc_id
"""


# --------------------------------------------------------------------------
# Vocabulary diversity per language: exact Gini-Simpson index
# --------------------------------------------------------------------------
# The corpus-level repetition signal (a scraped-spam language slice
# shows collapsed diversity): D = 1 - sum c_i(c_i-1) / (N(N-1)) over
# term frequencies — unlike Shannon entropy this is an EXACT RATIONAL
# in integer counts, so gini_fp = (N(N-1) - sum c(c-1)) * 10^9 //
# (N(N-1)) hash-matches SQL with no float log. Per-shard partial sums
# of c(c-1) stay in int64 for N up to ~3e9 tokens per language
# (sum c(c-1) <= N^2 < 2^63); the final bounded per-lang merge and the
# gini formula run in Python big-ints because (N(N-1) - cc) * 10^9
# wraps int64 already at N ~ 96k tokens (den ~ 9.2e9 * 1e9 > 2^63) —
# matching the SQL oracle's HUGEINT arithmetic exactly.
#
# Plan: per-batch (lang, term) count partials -> ONE term-hash
# sharded sum (a term's counts live wholly in one shard, so per-shard
# sum c(c-1) partials per lang are exact) -> bounded 5-key merge.

GINI_SCALE = 10**9


def q_vocab_diversity(sf_dir: str):
    """(lang, n_tokens, n_terms, gini_fp) per language."""
    import ray.data

    from osm2gtfs_ray.ops.joins import _as_arrow
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        flat, offs = _split_tokens(t["text"])
        lens = np.diff(offs)
        lang = np.repeat(
            np.asarray(t["lang"].to_pylist(), dtype=object), lens
        )
        keep = flat.to_numpy(zero_copy_only=False) != ""
        g = (
            pa.table(
                {"lang": pa.array(lang[keep], pa.string()),
                 "term": flat.filter(pa.array(keep))}
            )
            .group_by(["lang", "term"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "term", "n_part"]).to_pandas()

    parts = docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def shard_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["lang", "term"], sort=False)["n_part"].sum()
            .reset_index(name="c")
        )
        c = agg["c"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"lang": agg["lang"], "n": c, "cc": c * (c - 1),
             "t": np.ones(len(c), dtype=np.int64)}
        )
        return out.groupby("lang", sort=False, as_index=False)[
            ["n", "cc", "t"]
        ].sum()

    stats = _as_arrow(sharded_map_groups(parts, "term", shard_stats))
    # Bounded final merge (one row per language): Python big-ints —
    # (den - cc) * GINI_SCALE exceeds int64 once a slice passes ~96k
    # tokens (den - cc > 9.2e9), which sf0.1's 'en' slice already does.
    acc: dict[str, list[int]] = {}
    sp = stats.to_pandas()
    for lang_v, n_v, cc_v, t_v in zip(sp["lang"], sp["n"], sp["cc"], sp["t"]):
        a = acc.setdefault(str(lang_v), [0, 0, 0])
        a[0] += int(n_v)
        a[1] += int(cc_v)
        a[2] += int(t_v)
    langs = sorted(acc)
    gini = []
    for lg in langs:
        nn, cc_i, _ = acc[lg]
        den = nn * (nn - 1)
        gini.append(((den - cc_i) * GINI_SCALE) // max(den, 1))
    return ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_tokens": pa.array([acc[lg][0] for lg in langs], pa.int64()),
                "n_terms": pa.array([acc[lg][2] for lg in langs], pa.int64()),
                "gini_fp": pa.array(gini, pa.int64()),
            }
        )
    )


SQL_VOCAB_DIVERSITY = rf"""
WITH toks AS (
  SELECT lang, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
  FROM documents
),
tc AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY lang, term),
st AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS n_terms,
              CAST(SUM(c * (c - 1)) AS BIGINT) AS cc
       FROM tc GROUP BY lang)
SELECT lang, n_tokens, n_terms,
       CAST(((CAST(n_tokens AS HUGEINT) * (n_tokens - 1) - cc)
             * {GINI_SCALE})
            // GREATEST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1), 1)
            AS BIGINT) AS gini_fp
FROM st ORDER BY lang
"""


# --------------------------------------------------------------------------
# Exact phrase search over a positional inverted index
# --------------------------------------------------------------------------
# The search-engine primitive BM25 (q_bm25_topk) cannot express:
# consecutive-position matching. The index build is the same
# embarrassingly-parallel map as q_inverted_index but POSITIONAL —
# (term, doc_id, pos) — and pruned at the source to the query phrases'
# vocabulary (a handful of terms: the classic term-at-a-time plan
# touches only the queried posting lists, never the full index). The
# match itself is the textbook posting-list intersection: w0's
# positions joined against w1's positions shifted by 1, then w2's by
# 2, ... — executed per DOC-HASH shard after ONE shuffle, the
# Lucene/ES document-partitioned index layout (every doc's postings
# co-locate, so the L-1 position joins are local pandas merges; the
# alternative term-partitioned layout would need L-1 cluster-wide
# hash joins per phrase).
#
# Occurrences are counted at every starting position (overlaps
# included), exactly like the oracle's positional LATERAL scan.

PHRASES = ["table hash", "fast query", "big order scan"]


def q_phrase_search(sf_dir: str):
    """(phrase_id, doc_id, n_matches) for every document containing
    each query phrase at least once."""
    import pandas as pd

    from osm2gtfs_ray.ops.sharded import sharded_map_groups
    from osm2gtfs_ray.sources.pages import _flat_ranges

    phrase_toks = [p.split() for p in PHRASES]
    vocab = sorted({t for toks in phrase_toks for t in toks})
    tid_of = {t: i for i, t in enumerate(vocab)}
    phrase_tids = [[tid_of[t] for t in toks] for toks in phrase_toks]
    vocab_arr = pa.array(vocab)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        # positional split on the literal single space so positions
        # are 1-based indices into SQL's string_split(text, ' ')
        words = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        pos = _flat_ranges(pc.list_value_length(words).to_numpy()) + 1
        tid = pc.index_in(flat, value_set=vocab_arr)
        keep = pc.is_valid(tid)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), parent).filter(keep),
                "pos": pa.array(pos, pa.int64()).filter(keep),
                "tid": pc.cast(tid.filter(keep), pa.int64()),
            }
        )

    pruned = docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)

    def match_shard(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pid, tids in enumerate(phrase_tids):
            m = g.loc[g["tid"] == tids[0], ["doc_id", "pos"]]
            for j, tj in enumerate(tids[1:], 1):
                r = g.loc[g["tid"] == tj, ["doc_id", "pos"]].copy()
                r["pos"] = r["pos"] - j
                m = m.merge(r, on=["doc_id", "pos"])
                if m.empty:
                    break
            if not m.empty:
                c = m.groupby("doc_id", as_index=False).agg(
                    n_matches=("pos", "size")
                )
                c.insert(0, "phrase_id", np.int64(pid))
                outs.append(c)
        if not outs:
            return pd.DataFrame(
                {"phrase_id": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "n_matches": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True).astype(np.int64)

    return sharded_map_groups(pruned, "doc_id", match_shard)


def sql_phrase_search() -> str:
    arms = []
    for pid, p in enumerate(PHRASES):
        toks = p.split()
        cond = " AND ".join(
            f"w[i+{j}] = '{t}'" if j else f"w[i] = '{t}'"
            for j, t in enumerate(toks)
        )
        arms.append(f"""
  SELECT CAST({pid} AS BIGINT) AS phrase_id, doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_matches
  FROM ws, (SELECT unnest(generate_series(1, len(w) - {len(toks) - 1})) AS i)
  WHERE {cond}
  GROUP BY doc_id""")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
{body}
ORDER BY phrase_id, doc_id
"""
