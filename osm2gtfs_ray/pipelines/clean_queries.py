"""Corpus-cleaning operators: PII redaction, typo-pair mining
(SymSpell delete-1 neighborhood), per-key time-series resample with
forward fill, and document-frequency boilerplate stripping.

These generalize the reference's normalize/filter family
(`osm2gtfs/core/helper.py` name normalizers, creator-side filters) to
the webtext corpus the graft targets; every op is a pure Arrow batch
kernel or a shard-keyed shuffle (ops/sharded.py), never a per-row
Python loop over the corpus.

Encoding rules as in pipelines/queries.py: integer money/centi units,
explicit int64 casts so the DuckDB oracle hashes bit-identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osm2gtfs_ray.sources.tables import read_table

# --------------------------------------------------------------------------
# PII redaction (emails + phone numbers).
#
# The synthetic documents corpus carries no PII, so — like the
# flagship's splitmix64 entity synthesis (pipelines/flagship_oracle.py)
# — each doc is deterministically augmented with one email and one
# phone derived from doc_id, in BOTH the Ray kernel and the SQL oracle.
# Redaction itself is a pure map over RE2 regexes: Arrow's
# count_substring_regex / replace_substring_regex and DuckDB's
# regexp_* share RE2 semantics, so outputs are bit-identical.
# Zero shuffles; scales as a straight map over blocks.
# --------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def _augment_pii(t: pa.Table) -> pa.Array:
    """text + deterministic contact line derived from doc_id."""
    did = pc.cast(t["doc_id"], pa.string())
    mod = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 10000
    phone = pc.utf8_lpad(pc.cast(pa.array(mod), pa.string()), 4, "0")
    return pc.binary_join_element_wise(
        t["text"], " contact user", did, "@example.com or call 555-", phone, ""
    )


def q_pii_redact(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def redact(t: pa.Table) -> pa.Table:
        aug = _augment_pii(t)
        n_emails = pc.count_substring_regex(aug, PII_EMAIL_RE)
        n_phones = pc.count_substring_regex(aug, PII_PHONE_RE)
        red = pc.replace_substring_regex(aug, PII_EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_PHONE_RE, "<PHONE>")
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
                "redacted": red,
            }
        )

    return docs.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


SQL_PII_REDACT = rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
         '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM aug
"""


# --------------------------------------------------------------------------
# Typo-pair mining: all distinct word pairs at edit distance <= 1
# (SymSpell delete-1 neighborhood; Garbe 2012, public algorithm).
#
# Scale shape: vocabulary extraction is a map-side unique + sharded
# distinct; candidate generation explodes each word into itself plus
# its |w| single-deletion variants (a loop over CHAR POSITIONS — max
# word length, not rows — each iteration a vectorized pandas slice);
# pairs sharing a variant shuffle by variant hash; the exact
# edit-distance<=1 verify is vectorized over fixed-width byte matrices
# per length class. Two words are ed<=1 iff they share a member of
# {w} ∪ deletes1(w) — sharing only deletes yields ed<=2, hence the
# verify, mirroring the LSH candidate→verify structure of
# stages/dedup.py.
# --------------------------------------------------------------------------

_TYPO_MAX_LEN = 24


def _deletion_variants(words: pd.Series) -> pd.DataFrame:
    """(variant, word) rows: each word plus all 1-deletion variants."""
    out = [pd.DataFrame({"variant": words, "word": words})]
    maxlen = int(words.str.len().max() or 0)
    for i in range(min(maxlen, _TYPO_MAX_LEN)):
        has = words.str.len() > i
        w = words[has]
        out.append(
            pd.DataFrame({"variant": w.str.slice(0, i) + w.str.slice(i + 1), "word": w})
        )
    return pd.concat(out, ignore_index=True)


def _ed1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized edit-distance<=1 check for word pairs (a[i], b[i]).

    Loops over distinct LENGTH CLASSES (bounded by max word length),
    fully vectorized byte-matrix compares inside each class.
    """
    n = len(a)
    ok = np.zeros(n, dtype=bool)
    la = np.char.str_len(a.astype("U"))
    lb = np.char.str_len(b.astype("U"))
    # orient: s = shorter, l = longer
    swap = la > lb
    s = np.where(swap, b, a).astype("U")
    l = np.where(swap, a, b).astype("U")
    ls, ll = np.minimum(la, lb), np.maximum(la, lb)
    diff = ll - ls
    for sl in np.unique(ls[diff <= 1]):
        sl = int(sl)
        for d in (0, 1):
            sel = (ls == sl) & (diff == d)
            if not sel.any():
                continue
            sm = s[sel].astype(f"U{max(sl, 1)}").view(np.uint32).reshape(sel.sum(), -1)
            lm = l[sel].astype(f"U{sl + d}").view(np.uint32).reshape(sel.sum(), -1)
            if d == 0:
                ok[sel] = (sm != lm).sum(axis=1) <= 1
            else:
                eq = sm == lm[:, :sl] if sl else np.ones((sel.sum(), 0), bool)
                pref = np.where(eq.all(axis=1), sl, eq.argmin(axis=1) if sl else 0)
                # suffix: s[p:] must equal l[p+1:]
                eqs = sm == lm[:, 1:] if sl else np.ones((sel.sum(), 0), bool)
                rev = eqs[:, ::-1]
                suf = np.where(
                    rev.all(axis=1), sl, rev.argmin(axis=1) if sl else 0
                )
                ok[sel] = pref + suf >= sl
    return ok


def _corrupt_first_words(t: pa.Table) -> np.ndarray:
    """Deterministic typo synthesis: drop the char at doc_id % len from
    each doc's first word (same formula as the SQL oracle). The
    synthetic corpus has no natural typos, so — like the PII op above —
    the inputs that make the operator non-vacuous are derived from
    doc_id on both sides."""
    la = _split_words(t["text"])
    offs = la.offsets.to_numpy()
    has = np.diff(offs) > 0
    first = la.values.to_numpy(zero_copy_only=False)[offs[:-1][has]].astype("U")
    did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[has]
    ln = np.char.str_len(first)
    keep = ln >= 2
    first, did, ln = first[keep], did[keep], ln[keep]
    p = (did % ln).astype(np.int64)
    out = np.empty(len(first), dtype=first.dtype)
    fs = pd.Series(first)
    for pos in np.unique(p):
        m = p == pos
        out[m] = (fs[m].str.slice(0, pos) + fs[m].str.slice(pos + 1)).to_numpy()
    return out


def q_typo_pairs(sf_dir: str):
    from osm2gtfs_ray.ops.dedupe import distinct
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def words_of(t: pa.Table) -> pa.Table:
        la = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        vals = pc.unique(la.combine_chunks().flatten())
        vals = vals.filter(pc.not_equal(vals, ""))
        corr = _corrupt_first_words(t)
        return pa.table(
            {"word": pa.concat_arrays([vals, pa.array(corr, pa.string())])}
        )

    vocab = distinct(docs.map_batches(words_of, batch_format="pyarrow"), ["word"])

    def variants(t: pd.DataFrame) -> pd.DataFrame:
        return _deletion_variants(t["word"])

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="variant", suffixes=("_1", "_2"))
        m = m[m["word_1"] < m["word_2"]]
        pairs = m[["word_1", "word_2"]].drop_duplicates()
        if not len(pairs):
            return pd.DataFrame({"w1": pd.Series(dtype=object), "w2": pd.Series(dtype=object)})
        keep = _ed1_mask(pairs["word_1"].to_numpy(), pairs["word_2"].to_numpy())
        out = pairs[keep].rename(columns={"word_1": "w1", "word_2": "w2"})
        return out

    pairs = sharded_map_groups(
        vocab.map_batches(variants, batch_format="pandas"),
        "variant",
        shard_pairs,
    )
    # a pair can surface in several shards (one per shared variant) —
    # final distinct + deterministic order on the (tiny) result
    from osm2gtfs_ray.ops.dedupe import distinct as distinct2

    return distinct2(pairs, ["w1", "w2"]).sort(["w1", "w2"])


SQL_TYPO_PAIRS = r"""
WITH fw AS (
  SELECT doc_id, regexp_extract(trim(text), '^\S+') AS w
  FROM documents WHERE trim(text) <> ''
),
corr AS (
  SELECT substr(w, 1, CAST(doc_id % len(w) AS INT))
         || substr(w, CAST(doc_id % len(w) AS INT) + 2) AS word
  FROM fw WHERE len(w) >= 2
),
w AS (
  SELECT DISTINCT word FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
    FROM documents WHERE trim(text) <> ''
    UNION ALL SELECT word FROM corr
  )
)
SELECT a.word AS w1, b.word AS w2
FROM w a JOIN w b ON a.word < b.word
WHERE levenshtein(a.word, b.word) <= 1
ORDER BY w1, w2
"""


# --------------------------------------------------------------------------
# Per-key time-series resample + forward fill (gap fill): each user's
# event values are resampled onto a daily grid from the user's first
# active day to the corpus's last day, carrying the latest value
# forward across gap days. "Latest" per day = max (ts, event_id).
#
# Scale shape: map-side per-(user, day) last-value reduce inside
# map_batches (so the shuffle moves <= one row per user-day), key-hash
# sharded shuffle, then ONE vectorized merge_asof per shard (C-level,
# all users of the shard at once). The global day span is a tiny
# min/max aggregate.
# --------------------------------------------------------------------------

def q_resample_ffill(sf_dir: str):
    from osm2gtfs_ray.ops.sharded import sharded_map_groups

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    gmax_day = None  # resolved below from a tiny aggregate

    def daily_last(b: pd.DataFrame) -> pd.DataFrame:
        d = b.copy(deep=False)
        d["day"] = d["ts"].dt.floor("D")
        d = d.sort_values(["user_id", "day", "ts", "event_id"])
        d = d.drop_duplicates(["user_id", "day"], keep="last")
        return d[["user_id", "day", "ts", "event_id", "value"]]

    # tiny aggregate: the corpus's last day (drives every user's grid end)
    import ray.data.aggregate as agg

    stats = ev.aggregate(agg.Max("ts"))
    gmax_day = pd.Timestamp(stats["max(ts)"]).floor("D")

    def shard_fill(g: pd.DataFrame) -> pd.DataFrame:
        # one more local last-per-day reduce (shards see merged partials)
        d = g.sort_values(["user_id", "day", "ts", "event_id"]).drop_duplicates(
            ["user_id", "day"], keep="last"
        )
        first = d.groupby("user_id", sort=False)["day"].min()
        ndays = ((gmax_day - first).dt.days + 1).to_numpy(np.int64)
        uid = np.repeat(first.index.to_numpy(), ndays)
        offs = np.concatenate([np.arange(n) for n in ndays])
        day = np.repeat(first.to_numpy(), ndays) + offs * np.timedelta64(1, "D")
        grid = pd.DataFrame({"user_id": uid, "day": day}).sort_values("day", kind="mergesort")
        filled = pd.merge_asof(
            grid,
            d[["user_id", "day", "value"]].sort_values("day", kind="mergesort"),
            on="day",
            by="user_id",
        )
        return filled

    filled = sharded_map_groups(
        ev.map_batches(daily_last, batch_format="pandas"), "user_id", shard_fill
    )

    def finish(t: pa.Table) -> pa.Table:
        from osm2gtfs_ray.pipelines.queries import _scaled_int

        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "day": pc.cast(t["day"], pa.date32()),
                "value_cents": _scaled_int(t["value"], 100.0),
            }
        )

    return filled.map_batches(finish, batch_format="pyarrow").sort(["user_id", "day"])


SQL_RESAMPLE_FFILL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
last_daily AS (SELECT user_id, day, value FROM daily WHERE rn = 1),
span AS (SELECT CAST(MAX(ts) AS DATE) AS d1 FROM events),
grid AS (
  SELECT u.user_id, CAST(unnest(generate_series(CAST(u.d0 AS TIMESTAMP),
                                 CAST(s.d1 AS TIMESTAMP),
                                 INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id) u
  CROSS JOIN span s
)
SELECT g.user_id, g.day,
       CAST(ROUND(e.value * 100) AS BIGINT) AS value_cents
FROM grid g ASOF JOIN last_daily e
  ON g.user_id = e.user_id AND g.day >= e.day
ORDER BY g.user_id, g.day
"""


# --------------------------------------------------------------------------
# Boilerplate stripping by document frequency (C4-style cleaning,
# Raffel et al. 2020 §2.2, applied at token granularity): within each
# source, tokens present in >= 80% of the source's documents are
# boilerplate; strip them from every document, preserving the order of
# the survivors.
#
# Scale shape: pass 1 computes per-(source, token) document frequency
# with a map-side per-doc distinct (the shuffle moves (source, token,
# partial_count) rows, not raw text); the boilerplate set is small BY
# CONSTRUCTION (tokens in >=80% of docs are few — the same smallness
# argument as stages/dedup.py's max_df guard) so it broadcasts via
# ray.put; pass 2 is a pure Arrow map: split → membership mask →
# rebuilt ListArray → binary_join, no per-row Python.
# --------------------------------------------------------------------------

_BOILER_NUM, _BOILER_DEN = 4, 5  # df*DEN >= n_docs*NUM  <=>  df/n >= 0.8


def _split_words(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    la = pc.split_pattern_regex(pc.utf8_trim_whitespace(col), r"\s+")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    return la


def q_boilerplate_strip(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def df_partials(t: pa.Table) -> pa.Table:
        la = _split_words(t["text"])
        rows = np.repeat(np.arange(len(t)), np.diff(la.offsets.to_numpy()))
        w = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False)[rows],
                "word": la.values.to_numpy(zero_copy_only=False),
                "doc": rows,
            }
        ).drop_duplicates()
        g = w.groupby(["source", "word"], sort=False).size().reset_index(name="df_part")
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "word": pa.array(g["word"], pa.string()),
                "df_part": pa.array(g["df_part"], pa.int64()),
            }
        )

    df = (
        docs.map_batches(df_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "word"])
        .aggregate(Sum("df_part", alias_name="df"))
    )
    # doc counts need only the source column — a separate pruned read,
    # not a third scan of the wide text column
    ndocs = (
        read_table(sf_dir, "documents", columns=["source"])
        .map_batches(
            lambda t: pa.table(
                {"source": t["source"], "one": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        )
        .groupby("source")
        .aggregate(Sum("one", alias_name="n_docs"))
    )
    nd = {r["source"]: r["n_docs"] for r in ndocs.take_all()}

    def boiler_keys_of(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        dfv = t["df"].to_numpy(zero_copy_only=False)
        thresh = np.array([nd.get(s, 0) for s in src], np.int64)
        m = dfv * _BOILER_DEN >= thresh * _BOILER_NUM
        key = pc.binary_join_element_wise(
            pc.cast(t["source"], pa.string()), pc.cast(t["word"], pa.string()), "\x1f"
        )
        return pa.table({"key": pa.array(key.to_numpy(zero_copy_only=False)[m])})

    # boilerplate set is small by construction (>=80%-DF tokens) →
    # collect once, broadcast via ray.put, look up inside every batch
    boiler_tbl = df.map_batches(boiler_keys_of, batch_format="pyarrow").take_all()
    boiler_keys = np.sort(np.array([r["key"] for r in boiler_tbl], dtype="U"))
    boiler_ref = ray.put(boiler_keys)

    def strip(t: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(boiler_ref)
        la = _split_words(t["text"])
        offsets = la.offsets.to_numpy()
        rows = np.repeat(np.arange(len(t)), np.diff(offsets))
        words = la.values.to_numpy(zero_copy_only=False).astype("U")
        srcs = t["source"].to_numpy(zero_copy_only=False).astype("U")[rows]
        combined = np.char.add(np.char.add(srcs, "\x1f"), words)
        drop = np.isin(combined, keys)
        keep = ~drop
        counts = np.bincount(rows[keep], minlength=len(t))
        new_off = np.zeros(len(t) + 1, np.int32)
        np.cumsum(counts, out=new_off[1:])
        kept_vals = la.values.filter(pa.array(keep))
        clean = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), kept_vals), " "
        )
        n_removed = np.bincount(rows[drop], minlength=len(t))
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "clean_text": clean,
            }
        )

    return docs.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


SQL_BOILERPLATE_STRIP = rf"""
WITH words AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
),
w AS (
  SELECT doc_id, source, unnest(list_distinct(ws)) AS word FROM words
),
df AS (SELECT source, word, COUNT(*) AS df FROM w GROUP BY source, word),
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
boiler AS (
  SELECT df.source, df.word FROM df JOIN nd USING (source)
  WHERE df.df * {_BOILER_DEN} >= nd.n_docs * {_BOILER_NUM}
),
bl AS (SELECT source, list(word) AS bw FROM boiler GROUP BY source)
SELECT CAST(words.doc_id AS BIGINT) AS doc_id,
       CAST(len(ws) - len(list_filter(ws, x -> NOT list_contains(coalesce(bl.bw, []), x))) AS BIGINT) AS n_removed,
       coalesce(array_to_string(
         list_filter(ws, x -> NOT list_contains(coalesce(bl.bw, []), x)), ' '), '') AS clean_text
FROM words LEFT JOIN bl ON words.source = bl.source
"""


# --------------------------------------------------------------------------
# Composite corpus-prep pipeline — the LLM-training-data flagship:
# language filter → quality (token-count) filter → normalized exact
# dedup (keep lowest doc_id) → leakage-safe train/val/test assignment
# on the dedup winner. One straight chain of the engine's oracled
# stages (q_doc_quality / q_norm_dedup / q_sample_split semantics),
# proving they compose; the whole chain keeps the SQL oracle.
#
# Scale shape: two pure maps, ONE content-keyed shuffle (the dedup,
# map-side pre-reduced by ops/dedupe.keep_first), then a pure map —
# the minimal exchange count for these semantics.
# --------------------------------------------------------------------------

_PREP_MIN_TOKENS = 20
_PREP_STREAM = 78
_PREP_SEED = 42  # same engine seed as q_sample_split / pages synth


def q_corpus_prep(sf_dir: str):
    from osm2gtfs_ray.ops.dedupe import keep_first
    from osm2gtfs_ray.sources.pages import _uint
    from osm2gtfs_ray.stages.text import token_count_arrow

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def lang_quality(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["lang"], pa.scalar("en")))
        n_tokens = token_count_arrow(t["text"])
        t = t.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
        t = t.filter(pc.greater_equal(t["n_tokens"], pa.scalar(_PREP_MIN_TOKENS)))
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, r"[.,!?;:]", "")
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": t["n_tokens"],
                "norm_text": s,
            }
        )

    survivors = docs.map_batches(
        lang_quality, batch_format="pyarrow", zero_copy_batch=True
    )
    winners = keep_first(survivors, key="norm_text", order_by="doc_id")

    def assign(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _uint(did, _PREP_STREAM, _PREP_SEED, 100)
        split = np.where(h < 90, "train", np.where(h < 95, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "split": pa.array(split, pa.string()),
            }
        )

    return winners.map_batches(assign, batch_format="pyarrow").sort("doc_id")


def _sql_corpus_prep() -> str:
    from osm2gtfs_ray.pipelines.flagship_oracle import _s_uint

    h = _s_uint("CAST(doc_id AS UBIGINT)", _PREP_STREAM, 100)
    return rf"""
WITH en AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents WHERE lang = 'en'
),
q AS (SELECT * FROM en WHERE n_tokens >= {_PREP_MIN_TOKENS}),
norm AS (
  SELECT doc_id, n_tokens,
         trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                             '\s+', ' ', 'g')) AS nt,
         ROW_NUMBER() OVER (PARTITION BY trim(regexp_replace(
             regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
             '\s+', ' ', 'g')) ORDER BY doc_id) AS rn
  FROM q
)
SELECT doc_id, n_tokens,
       CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, n_tokens, {h} AS h FROM norm WHERE rn = 1)
ORDER BY doc_id
"""


SQL_CORPUS_PREP = _sql_corpus_prep()
