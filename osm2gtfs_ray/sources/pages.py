"""Deterministic synthetic Common-Crawl-style corpus (pages / tiles / entities).

Implements the graft input from BASELINE.json `input_hint`:
``pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` plus the polygon ``tiles`` table and the per-page
``geo_entities`` oracle table (FIXTURES.md §1). Everything is a pure
function of (row index, seed) via a splitmix64 mixer, so generation is
bit-stable regardless of partitioning, parallelism, or generation
order — the property the per-row invariant (byte-identical extracted
text per url) and golden tests rely on.

Fixture guarantees (FIXTURES.md §4):
  * hot cells: ~`HOT_FRACTION` of entities concentrate in a few
    ~300 m-radius urban clusters (≈100× median cell density) — the skew
    analogue of the reference's busy transit hubs
    (/root/reference/osm2gtfs/creators/br_florianopolis/trips_creator_br_florianopolis.py:20).
  * shared entity names across pages (clustering fixture, per
    stops_creator_gh_accra.py:40-43).
  * html embeds the text with inline markup + escaped entities such
    that `stages.extract.TextExtractor` inverts it byte-identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)

# world region for the synthetic geography
REGION = dict(south=-20.0, west=-30.0, north=20.0, east=30.0)

# dense "urban" cluster centers (hot cells for skew tests)
HOT_CENTERS = [(1.234, 2.345), (-3.456, 10.123), (8.765, -12.321)]
HOT_FRACTION = 0.5  # half of all entities land in the 3 clusters
HOT_RADIUS_DEG = 0.003  # ~330 m

VOCAB = (
    "the of and to a in is was he for it with as his on be at by had not are "
    "but from or have an they which one you were her all she there would their "
    "we him been has when who will more no if out so said what up its about "
    "into than them can only other new some could time these two may then do "
    "first any my now such like our over man me even most made after also did "
    "many before must through back years where much your way well down should "
    "because each just those people A&B x<y q>p tip&trick"
).split()

LANGS = ["en", "de", "fr", "es", "pt"]

ENTITY_NAMES = [f"Place_{i:03d}" for i in range(200)]


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x += GOLDEN
    x = (x ^ (x >> np.uint64(30))) * _M1
    x = (x ^ (x >> np.uint64(27))) * _M2
    return x ^ (x >> np.uint64(31))


def _u01(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Uniform [0,1) per row index, independent per stream."""
    h = mix64(
        np.asarray(idx, dtype=np.uint64)
        ^ (np.uint64(stream) * np.uint64(0xDEADBEEFCAFE))
        ^ (np.uint64(seed) << np.uint64(32))
    )
    return (h >> np.uint64(11)).astype(np.float64) * (2.0**-53)


def _uhash(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return mix64(
        np.asarray(idx, dtype=np.uint64)
        ^ (np.uint64(stream) * np.uint64(0xC0FFEE123457))
        ^ (np.uint64(seed) << np.uint64(32))
    )


def _uint(idx: np.ndarray, stream: int, seed: int, mod: int) -> np.ndarray:
    return (_uhash(idx, stream, seed) % np.uint64(mod)).astype(np.int64)


def _flat_ranges(lengths: np.ndarray) -> np.ndarray:
    """concatenate([arange(n) for n in lengths]) without the loop."""
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )


def _entity_latlon(eidx: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Entity positions: HOT_FRACTION clustered (skew), rest uniform."""
    hot = _u01(eidx, 101, seed) < HOT_FRACTION
    which = _uint(eidx, 102, seed, len(HOT_CENTERS))
    hc = np.array(HOT_CENTERS)
    lat_hot = hc[which, 0] + (_u01(eidx, 103, seed) - 0.5) * 2 * HOT_RADIUS_DEG
    lon_hot = hc[which, 1] + (_u01(eidx, 104, seed) - 0.5) * 2 * HOT_RADIUS_DEG
    lat_uni = REGION["south"] + _u01(eidx, 105, seed) * (REGION["north"] - REGION["south"])
    lon_uni = REGION["west"] + _u01(eidx, 106, seed) * (REGION["east"] - REGION["west"])
    return np.where(hot, lat_hot, lat_uni), np.where(hot, lon_hot, lon_uni)


def _page_text_and_entities(i: int, seed: int):
    """Text (str), html body parts, and entity rows for page i."""
    n_words = 20 + int(_uint(np.array([i]), 1, seed, 180)[0])
    word_ids = _uint(np.arange(n_words, dtype=np.uint64) + np.uint64(i) * np.uint64(1_000_003), 2, seed, len(VOCAB))
    words = [VOCAB[w] for w in word_ids]
    text = " ".join(words)

    n_ent = int(_uint(np.array([i]), 3, seed, 4)[0])  # 0..3 entities per page
    eidx = np.uint64(i) * np.uint64(8) + np.arange(n_ent, dtype=np.uint64)
    name_ids = _uint(eidx, 4, seed, len(ENTITY_NAMES))
    lat, lon = _entity_latlon(eidx, seed)
    ents = [
        (ENTITY_NAMES[name_ids[j]], round(float(lat[j]), 6), round(float(lon[j]), 6))
        for j in range(n_ent)
    ]
    return text, ents


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# pre-escaped vocabulary: html rendering touches every word, so the
# per-word escape is hoisted out of the per-page loop entirely
_VOCAB_ESC = np.array([_escape(w) for w in VOCAB], dtype=object)


def _render_html_fast(i: int, esc_words: list, ents, seed: int, k: int) -> bytes:
    """Same output as _render_html but from pre-escaped words and a
    pre-computed highlight position k (hoisted out of the per-page
    loop — per-page numpy scalar hashing dominated generation)."""
    j2 = (k * 2 + 3) % max(1, len(esc_words))
    out = list(esc_words)
    out[k] = f"<b>{out[k]}</b>"
    if j2 != k:
        out[j2] = f'<em class="hl">{out[j2]}</em>'
    geo = "".join(
        f'<span class="geo" data-name="{n}" data-lat="{la}" data-lon="{lo}"></span>'
        for (n, la, lo) in ents
    )
    html = (
        f"<html><head><title>doc {i}</title>{geo}</head><body>"
        + " ".join(out)
        + "</body></html>"
    )
    return html.encode("utf-8")


def _geo_spans_vector(ent_names: np.ndarray, elat_r: np.ndarray,
                      elon_r: np.ndarray, e_off: np.ndarray):
    """Per-row concatenated <span class="geo"/> markers, assembled with
    Arrow binary_join over the flat entity arrays. Float formatting is
    numpy's str() — shortest roundtrip repr, identical to Python's
    str(float) used by the scalar renderer."""
    import pyarrow.compute as pc

    if len(ent_names):
        pieces = (
            '<span class="geo" data-name="' + ent_names
            + '" data-lat="' + elat_r.astype(str).astype(object)
            + '" data-lon="' + elon_r.astype(str).astype(object)
            + '"></span>'
        )
    else:
        pieces = np.empty(0, dtype=object)
    lst = pa.LargeListArray.from_arrays(
        pa.array(np.asarray(e_off, dtype=np.int64)), pa.array(pieces, pa.string())
    )
    return pc.binary_join(lst, "")


# dictionary for the html body words: plain-escaped vocab, plus every
# word pre-wrapped in each highlight tag — so the per-word html choice
# becomes a pure-numpy index bump and the whole body assembles through
# Arrow's C-level dictionary_decode + binary_join (no Python strings)
_VOCAB_HTML_PA = None
_VOCAB_PLAIN_PA = None


def _vocab_dicts():
    global _VOCAB_HTML_PA, _VOCAB_PLAIN_PA
    if _VOCAB_HTML_PA is None:
        esc = [_escape(w) for w in VOCAB]
        _VOCAB_PLAIN_PA = pa.array(list(VOCAB), pa.string())
        _VOCAB_HTML_PA = pa.array(
            esc
            + [f"<b>{w}</b>" for w in esc]
            + [f'<em class="hl">{w}</em>' for w in esc],
            pa.string(),
        )
    return _VOCAB_PLAIN_PA, _VOCAB_HTML_PA


def _render_html_vector(ids: np.ndarray, word_ids: np.ndarray,
                        offsets: np.ndarray, k_all: np.ndarray,
                        ent_names: np.ndarray, elat_r: np.ndarray,
                        elon_r: np.ndarray, e_off: np.ndarray):
    """Batch-vectorized _render_html_fast over VOCAB word ids: highlight
    selection is an index bump into the pre-wrapped dictionary, the
    rejoin is Arrow binary_join — no per-word Python. Returns a
    pa.BinaryArray, byte-identical to the scalar renderer (asserted in
    tests/test_flagship.py)."""
    import pyarrow.compute as pc

    _, dict_html = _vocab_dicts()
    nv = len(VOCAB)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_words = np.diff(offsets)
    k_all = np.asarray(k_all, dtype=np.int64)
    j2 = (k_all * 2 + 3) % np.maximum(1, n_words)
    hl = np.zeros(len(word_ids), dtype=np.int32)
    m = j2 != k_all
    hl[offsets[:-1][m] + j2[m]] = 2
    hl[offsets[:-1] + k_all] = 1  # <b> wins when j2 == k (same word)
    full_ids = word_ids.astype(np.int32) + hl * np.int32(nv)
    words = pa.DictionaryArray.from_arrays(
        pa.array(full_ids), dict_html
    ).dictionary_decode()
    body = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets), words), " "
    )
    geo = _geo_spans_vector(ent_names, elat_r, elon_r, e_off)
    id_s = pa.array(ids.astype(np.int64).astype(str))
    html = pc.binary_join_element_wise(
        "<html><head><title>doc ", id_s, "</title>", geo,
        "</head><body>", body, "</body></html>", "",
    )
    return pc.cast(html, pa.binary())


def _render_html(i: int, text: str, ents, seed: int) -> bytes:
    """Wrap text in markup that TextExtractor inverts byte-identically.

    Inline tags are inserted at word boundaries without introducing
    whitespace; geo entities are out-of-band <span class="geo"/> markers
    carrying name/lat/lon attributes (they contribute no body text).
    """
    words = text.split(" ")
    k = int(_uint(np.array([i]), 5, seed, max(1, len(words)))[0])
    out = []
    for j, w in enumerate(words):
        ew = _escape(w)
        if j == k:
            ew = f"<b>{ew}</b>"
        elif j == (k * 2 + 3) % max(1, len(words)):
            ew = f"<em class=\"hl\">{ew}</em>"
        out.append(ew)
    geo = "".join(
        f'<span class="geo" data-name="{n}" data-lat="{la}" data-lon="{lo}"></span>'
        for (n, la, lo) in ents
    )
    html = (
        f"<html><head><title>doc {i}</title>{geo}</head><body>"
        + " ".join(out)
        + "</body></html>"
    )
    return html.encode("utf-8")


BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def make_pages_batch(start: int, count: int, seed: int = 42) -> pa.Table:
    """Pages rows for global indices [start, start+count)."""
    return make_pages_for_ids(np.arange(start, start + count, dtype=np.uint64), seed)


def make_pages_for_ids(idx: np.ndarray, seed: int = 42) -> pa.Table:
    """Pages rows for an ARBITRARY array of global indices.

    Every row is a pure function of its own index, so output is
    bit-identical regardless of batching, ordering, or parallelism —
    the generator must consume the actual id column, never assume a
    batch is a contiguous range (Ray may split/coalesce blocks
    differently run to run). Vectorized across the batch; equality
    with the scalar per-page oracle ``_page_text_and_entities`` is
    asserted in tests/test_flagship.py.
    """
    import pyarrow.compute as pc

    idx = np.asarray(idx, dtype=np.uint64)
    urls = pc.binary_join_element_wise(
        "https://example.org/p/",
        pa.array(np.char.zfill(idx.astype(np.int64).astype(str), 10)),
        "",
    )
    ts = BASE_TS + (idx.astype("int64") * 37).astype("timedelta64[us]") * 1_000_000
    lang_ids = _uint(idx, 6, seed, len(LANGS))

    # --- words for every page in one pass (same formula as the oracle) ---
    n_words = 20 + _uint(idx, 1, seed, 180)
    offsets = np.concatenate([[0], np.cumsum(n_words)])
    pos_flat = _flat_ranges(n_words).astype(np.uint64)
    page_flat = np.repeat(idx, n_words)
    word_ids = _uint(pos_flat + page_flat * np.uint64(1_000_003), 2, seed, len(VOCAB))

    # --- entities for every page in one pass ---
    n_ent = _uint(idx, 3, seed, 4)
    e_off = np.concatenate([[0], np.cumsum(n_ent)])
    e_page = np.repeat(idx, n_ent)
    e_j = _flat_ranges(n_ent).astype(np.uint64)
    eidx = e_page * np.uint64(8) + e_j
    name_ids = _uint(eidx, 4, seed, len(ENTITY_NAMES))
    elat, elon = _entity_latlon(eidx, seed)
    ent_names = np.array(ENTITY_NAMES, dtype=object)[name_ids]

    k_all = (_uhash(idx, 5, seed) % n_words.astype(np.uint64)).astype(np.int64)
    elat_r = np.round(elat, 6)
    elon_r = np.round(elon, 6)

    dict_plain, _ = _vocab_dicts()
    texts = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array(np.asarray(offsets, dtype=np.int64)),
            pa.DictionaryArray.from_arrays(
                pa.array(word_ids.astype(np.int32)), dict_plain
            ).dictionary_decode(),
        ),
        " ",
    )
    htmls = _render_html_vector(
        idx, word_ids, offsets, k_all, ent_names, elat_r, elon_r, e_off
    )
    langs = np.array(LANGS, dtype=object)[lang_ids]
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(ts),
            "html": htmls,
            "text": texts,
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def make_entities_batch(start: int, count: int, seed: int = 42) -> pa.Table:
    """Oracle geo_entities rows for pages [start, start+count)."""
    urls, names, lats, lons = [], [], [], []
    for i in range(start, start + count):
        _, ents = _page_text_and_entities(i, seed)
        for (n, la, lo) in ents:
            urls.append(f"https://example.org/p/{i:010d}")
            names.append(n)
            lats.append(la)
            lons.append(lo)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "entity": pa.array(names, pa.string()),
            "lat": pa.array(lats, pa.float64()),
            "lon": pa.array(lons, pa.float64()),
        }
    )


def pages_dataset(n: int, seed: int = 42, override_num_blocks: int | None = None,
                  offset: int = 0):
    """Streaming synthetic pages Dataset — generation itself is a
    map_batches over a range, so it scales out like a read. ``offset``
    shifts the id range to [offset, offset+n): a page's content depends
    only on its id, so disjoint offsets partition one corpus exactly
    (the multi-cluster scaling harness splits the input this way)."""
    import ray.data

    off = np.uint64(offset)

    def gen(batch: pa.Table) -> pa.Table:
        return make_pages_for_ids(batch["id"].to_numpy().astype(np.uint64) + off, seed)

    base = ray.data.range(n, override_num_blocks=override_num_blocks)
    return base.map_batches(gen, batch_format="pyarrow", batch_size=4096)


# ---------------------------------------------------------------- tiles ----

def make_tiles_table(n_tiles: int = 64, seed: int = 42) -> pa.Table:
    """Polygon tiles: convex n-gons gridded over REGION plus one small
    dense tile per hot center (skew fixture). Ring is a closed
    list<struct<lat,lon>>; cell_prefix is the level-8 cell of the
    center (coarse distribution key)."""
    from osm2gtfs_ray.geo.cells import cell_of

    rows_ring, tile_ids, prefixes, tag_keys, tag_vals = [], [], [], [], []
    grid = int(np.ceil(np.sqrt(max(1, n_tiles - len(HOT_CENTERS)))))
    lat_span = REGION["north"] - REGION["south"]
    lon_span = REGION["east"] - REGION["west"]
    made = 0
    for gy in range(grid):
        for gx in range(grid):
            if made >= n_tiles - len(HOT_CENTERS):
                break
            i = np.array([made], dtype=np.uint64)
            clat = REGION["south"] + (gy + 0.5) / grid * lat_span
            clon = REGION["west"] + (gx + 0.5) / grid * lon_span
            nv = 5 + int(_uint(i, 11, seed, 4)[0])
            radius = (0.25 + 0.5 * _u01(i, 12, seed)[0]) * min(lat_span, lon_span) / grid
            ang = np.linspace(0, 2 * np.pi, nv, endpoint=False) + _u01(i, 13, seed)[0]
            ring = [
                {"lat": float(clat + radius * np.sin(a)), "lon": float(clon + radius * np.cos(a))}
                for a in ang
            ]
            ring.append(ring[0])
            rows_ring.append(ring)
            tile_ids.append(f"tile_{made:05d}")
            prefixes.append(int(cell_of(np.array([clat]), np.array([clon]), level=8)[0]))
            tag_keys.append(["kind", "grid"])
            tag_vals.append(["rural", f"{gx},{gy}"])
            made += 1
    for h, (clat, clon) in enumerate(HOT_CENTERS):
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        r = HOT_RADIUS_DEG * 2.0
        ring = [
            {"lat": float(clat + r * np.sin(a)), "lon": float(clon + r * np.cos(a))}
            for a in ang
        ]
        ring.append(ring[0])
        rows_ring.append(ring)
        tile_ids.append(f"tile_hot_{h}")
        prefixes.append(int(cell_of(np.array([clat]), np.array([clon]), level=8)[0]))
        tag_keys.append(["kind"])
        tag_vals.append(["urban"])

    ring_type = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))
    tags = pa.MapArray.from_arrays(
        pa.array(np.cumsum([0] + [len(k) for k in tag_keys]), pa.int32()),
        pa.array([k for ks in tag_keys for k in ks], pa.string()),
        pa.array([v for vs in tag_vals for v in vs], pa.string()),
    )
    return pa.table(
        {
            "tile_id": pa.array(tile_ids, pa.string()),
            "cell_prefix": pa.array(prefixes, pa.uint64()),
            "ring": pa.array(rows_ring, ring_type),
            "tags": tags,
        }
    )
