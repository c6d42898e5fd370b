"""HTML → text extraction + geo-entity extraction (stateful actor stage).

The graft's per-row invariant stage (BASELINE.json `input_hint`):
extracted text must be byte-identical per url across runs, partitions
and parallelism levels. Generalizes the reference's deterministic text
normalization (SURVEY.md M13,
/root/reference/osm2gtfs/creators/br_florianopolis/trips_creator_br_florianopolis.py:289-298)
to a versioned, stateful extractor run as an actor pool:

    pages.map_batches(TextExtractor, batch_format="pyarrow",
                      concurrency=N, batch_size=B)

Regex tables are compiled once per actor in ``__init__``; the body
strip/unescape path is fully vectorized via pyarrow.compute (re2
kernels); only the tiny per-page geo-marker scan (≤ a few matches per
head) is a compiled-regex loop.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = "1"  # bump on any change to extraction semantics

_GEO_RE = re.compile(
    r'<span class="geo" data-name="([^"]*)" data-lat="([^"]*)" data-lon="([^"]*)">'
)

ENTITY_TYPE = pa.list_(
    pa.struct([("entity", pa.string()), ("lat", pa.float64()), ("lon", pa.float64())])
)


def extract_text_arrow(html: pa.Array) -> pa.Array:
    """binary html → extracted body text, vectorized (re2 kernels).

    Deterministic by construction: pure Arrow kernels, no dict order,
    locale, or float formatting involved.
    """
    s = pc.cast(html, pa.string())
    body = pc.struct_field(
        pc.extract_regex(s, r"(?s)<body>(?P<body>.*)</body>"), "body"
    )
    stripped = pc.replace_substring_regex(body, "<[^>]*>", "")
    out = pc.replace_substring(stripped, "&lt;", "<")
    out = pc.replace_substring(out, "&gt;", ">")
    out = pc.replace_substring(out, "&amp;", "&")
    return out


class TextExtractor:
    """Actor-pool stage: html → (text, entities). State (compiled
    regexes, version string) built once per actor."""

    def __init__(self) -> None:
        self.geo_re = _GEO_RE
        self.version = EXTRACTOR_VERSION

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = extract_text_arrow(batch["html"])
        # head is tiny; markers are ≤ a handful per page
        heads = pc.struct_field(
            pc.extract_regex(pc.cast(batch["html"], pa.string()), r"(?s)^(?P<h>.*?)<body>"),
            "h",
        ).to_pylist()
        ents = []
        for h in heads:
            if h is None:
                ents.append([])
                continue
            ents.append(
                [
                    {"entity": m[0], "lat": float(m[1]), "lon": float(m[2])}
                    for m in self.geo_re.findall(h)
                ]
            )
        cols = {name: batch[name] for name in batch.column_names if name != "html"}
        cols["text_extracted"] = text
        cols["entities"] = pa.array(ents, ENTITY_TYPE)
        return pa.table(cols)


def explode_entities(batch: pa.Table) -> pa.Table:
    """(url, entities: list<struct>) → one row per entity (url, entity,
    lat, lon). Vectorized list-flatten; order carried by list position
    (SURVEY.md O3: order as data, never block order)."""
    ent = batch["entities"].combine_chunks()
    if isinstance(ent, pa.ChunkedArray):
        ent = ent.combine_chunks()
    lengths = pc.list_value_length(ent).fill_null(0).to_numpy().astype(np.int64)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    flat = pc.list_flatten(ent)
    return pa.table(
        {
            "url": batch["url"].take(pa.array(idx)),
            "entity": pc.struct_field(flat, "entity"),
            "lat": pc.struct_field(flat, "lat"),
            "lon": pc.struct_field(flat, "lon"),
        }
    )
