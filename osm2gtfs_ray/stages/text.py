"""Text-analysis stages over the documents table (training-data ops).

Language-ID (n-gram/stopword heuristic), quality scoring, token
counting, and rolling-hash fingerprinting — the large-scale
training-data pipeline operators layered on the reference's text
normalization semantics (SURVEY.md M13-M16). All stages are callable
classes (actor pools): stopword tables / compiled regexes built once
per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


# small deterministic stopword profiles per language (public common words)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "was", "for", "with", "that", "it"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein", "eine", "nicht"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "en", "que", "por"},
    "pt": {"o", "a", "os", "as", "e", "de", "um", "uma", "é", "em", "que", "para"},
}


class LangId:
    """Heuristic language ID: argmax stopword-hit rate per profile;
    deterministic tie-break by language code."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.profiles = sorted(_STOPWORDS.items())  # sorted → deterministic ties

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(self.word_re)
        preds = []
        for words in toks:
            ws = set(words)
            best_lang, best_hits = "und", 0
            for lang, sw in self.profiles:
                hits = len(ws & sw)
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            preds.append(best_lang)
        batch = batch.copy()
        batch["lang_pred"] = preds
        return batch


class QualityScore:
    """Quality metrics per document: token count, punctuation count,
    uppercase count, stopword ratio. Vectorized pandas str kernels."""

    PUNCT_RE = r"[.,!?;:]"
    UPPER_RE = r"[A-Z]"
    TOKEN_RE = r"\S+"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["n_tokens"] = batch["text"].str.count(self.TOKEN_RE).astype("int64")
        batch["punct_ct"] = batch["text"].str.count(self.PUNCT_RE).astype("int64")
        batch["upper_ct"] = batch["text"].str.count(self.UPPER_RE).astype("int64")
        return batch


class Fingerprint:
    """Deterministic 64-bit document fingerprint: polynomial rolling
    hash over utf-8 bytes, h = h0·B^n + Σ bᵢ·B^(n-1-i) (mod 2^64) —
    order-sensitive and partition-independent. Vectorized: per doc one
    numpy dot against a precomputed power table (mod-2^64 wraparound
    is exactly uint64 overflow); the power table is per-actor state
    grown on demand."""

    B = np.uint64(1_000_003)
    H0 = np.uint64(1469598103934665603)  # FNV offset basis

    def __init__(self, max_len: int = 4096):
        self.powers = self._grow(max_len)

    def _grow(self, n: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            p = np.empty(n + 1, dtype=np.uint64)
            p[0] = np.uint64(1)
            for k in range(1, n + 1):
                p[k] = p[k - 1] * self.B
        return p

    def fingerprint(self, data: bytes) -> int:
        n = len(data)
        if n + 1 > len(self.powers):
            self.powers = self._grow(max(n, 2 * len(self.powers)))
        b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (b * self.powers[n - 1 :: -1][:n]).sum(dtype=np.uint64)
            h += self.H0 * self.powers[n]
        return int(h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch["text"].to_pylist()):
            out[i] = self.fingerprint(t.encode("utf-8"))
        return batch.append_column("fp64", pa.array(out, pa.uint64()))


def token_count_arrow(text_col: pa.ChunkedArray) -> pa.Array:
    """Whitespace token count, vectorized via Arrow re2 kernel —
    count_substring_regex('\\S+'); matches DuckDB's
    length(regexp_split_to_array(trim(x), '\\s+')) for non-empty text."""
    import pyarrow.compute as pc

    return pc.cast(pc.count_substring_regex(text_col, r"\S+"), pa.int64())


# GPT-2-style pretokenizer pattern, restricted to re2 syntax (no
# lookahead — the original's `\s+(?!\S)` branch is dropped, so trailing
# whitespace runs count as one token each). Both Arrow and DuckDB run
# re2, so the SAME pattern string produces identical counts in the
# engine and the SQL oracle.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_arrow(text_col: pa.ChunkedArray) -> pa.Array:
    """BPE-ish token count (the "how many LLM tokens is this corpus"
    estimator): counts matches of the GPT-2 pretokenizer regex —
    contractions, letter runs, digit runs, punctuation runs — via the
    same vectorized re2 kernel as token_count_arrow."""
    import pyarrow.compute as pc

    return pc.cast(pc.count_substring_regex(text_col, BPE_TOKEN_PATTERN), pa.int64())
