"""Pure-numpy image codecs (no codec libraries in this environment).

Real decoders for the three formats a dependency-free container can
honestly support: uncompressed 24-bit BMP, binary PPM (P6), and
8-bit truecolor PNG (zlib inflate + scanline unfiltering — zlib is in
the stdlib). Encoders exist for all three so fixtures are genuine
bytes-on-disk images, not mocks. Formats are public specs:
BMP (BITMAPINFOHEADER), Netpbm P6, PNG (RFC 2083).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ------------------------------------------------------------------- BMP ---

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB bottom-up BMP bytes."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + dib + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB (bottom-up or
    top-down)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pix_off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR → RGB
    return img[::-1] if h_signed > 0 else img  # bottom-up unless negative height


# ------------------------------------------------------------------- PPM ---

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary P6 PPM."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM → (H, W, 3) uint8 RGB."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(
        h, w, 3
    )


# ------------------------------------------------------------------- PNG ---

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 8-bit truecolor PNG (filter 0 rows)."""
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """8-bit truecolor (RGB / RGBA) non-interlaced PNG → (H, W, 3|4)
    uint8. Full filter support (0-4); sub/avg/paeth unfilter runs a
    per-pixel loop along each row (inherent left-dependency) — fine for
    fixture-scale images, a real deployment would plug a C codec here.
    """
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_SIG), None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color not in (2, 6) or interlace:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
                )
            ch = 3 if color == 2 else 4
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # left-dependent: per-pixel walk
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


# --------------------------------------------------------------- dispatch ---

def decode_image(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode. Raises ValueError on unknown or
    unsupported payloads."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(data)
    raise ValueError("unknown image format (supported: BMP24, PPM P6, PNG8)")


def luma_features(img: np.ndarray, grid: int = 8) -> np.ndarray:
    """(H, W, C) uint8 → grid×grid block-mean grayscale thumbnail in
    [0, 1] float32 (the decode→feature step of the media pipeline)."""
    lum = (
        0.299 * img[:, :, 0].astype(np.float64)
        + 0.587 * img[:, :, 1].astype(np.float64)
        + 0.114 * img[:, :, 2].astype(np.float64)
    )
    h, w = lum.shape
    ys = (np.arange(h) * grid) // h
    xs = (np.arange(w) * grid) // w
    sums = np.zeros((grid, grid))
    np.add.at(sums, (ys[:, None], xs[None, :]), lum)
    counts = np.zeros((grid, grid))
    np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
    return (sums / np.maximum(counts, 1.0) / 255.0).astype(np.float32).ravel()


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """(H, W, C) uint8 → (th, tw, C) nearest-neighbor resample — one
    vectorized index gather (the pixel-level half of the resize stage;
    ResizeMeta plans the target dims)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return img[ys[:, None], xs[None, :]]
