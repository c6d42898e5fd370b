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
    hash over utf-8 bytes (order-sensitive, partition-independent)."""

    B = np.uint64(1_000_003)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.uint64)
        texts = batch["text"].to_pylist()
        for i, t in enumerate(texts):
            h = np.uint64(1469598103934665603)  # FNV offset
            with np.errstate(over="ignore"):
                for byte in t.encode("utf-8"):
                    h = h * self.B + np.uint64(byte)
            out[i] = h
        return batch.append_column("fp64", pa.array(out, pa.uint64()))


def token_count_arrow(text_col: pa.ChunkedArray) -> pa.Array:
    """Whitespace token count, vectorized via Arrow re2 kernel —
    count_substring_regex('\\S+'); matches DuckDB's
    length(regexp_split_to_array(trim(x), '\\s+')) for non-empty text."""
    import pyarrow.compute as pc

    return pc.cast(pc.count_substring_regex(text_col, r"\S+"), pa.int64())
