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
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    raise ValueError(
        "unknown image format (supported: BMP24, PPM P6, PNG8, baseline JPEG)"
    )


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


# ------------------------------------------------------------------ JPEG ---
# Baseline-sequential JPEG (ITU-T T.81 / ISO 10918-1, public spec),
# pure numpy + stdlib. Encoder emits 4:4:4 with the Annex K example
# quantization and Huffman tables; the decoder reads BOTH table kinds
# FROM the stream (as any real JPEG requires), so roundtrip
# correctness never depends on the constants below matching Annex K —
# they only set the rate. Scope: 8-bit baseline DCT, 1-3 components,
# sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0); progressive and
# restart-interval streams raise ValueError.

_JPEG_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], symbol values)
_HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
_HUFF_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_HUFF_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _dct_mat() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    C = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    C[0] *= 1.0 / np.sqrt(2.0)
    return C  # forward: C @ block @ C.T; inverse: C.T @ coef @ C


_DCT_C = _dct_mat()


def _quality_tables(quality: int):
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qy = np.clip((_JPEG_QY * scale + 50) // 100, 1, 255)
    qc = np.clip((_JPEG_QC * scale + 50) // 100, 1, 255)
    return qy, qc


def _huff_codes(bits, vals):
    """Canonical code assignment: {symbol: (code, nbits)}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, nbits: int):
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.buf)


def _mag_bits(v: int):
    """JPEG magnitude coding: (size, raw bits) for a signed value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float → (n_by, n_bx, 8, 8) with edge-replication pad."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = p.shape
    return p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _encode_block(bw: "_BitWriter", zz: np.ndarray, pred: int,
                  dct_tab: dict, act: dict) -> int:
    """Huffman-encode one zigzagged quantized block; returns new DC pred."""
    size, bits_ = _mag_bits(int(zz[0]) - pred)
    c, n = dct_tab[size]
    bw.put(c, n)
    if size:
        bw.put(bits_, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, n = act[0xF0]
            bw.put(c, n)
            run -= 16
        size, bits_ = _mag_bits(v)
        c, n = act[(run << 4) | size]
        bw.put(c, n)
        bw.put(bits_, size)
        run = 0
    if last < 63:
        c, n = act[0x00]
        bw.put(c, n)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes.

    ``subsampling``: "444" (every plane full-res, 1×1 MCUs) or "420"
    (chroma box-averaged 2×2, 2×2-luma MCUs — the common web layout,
    exercising the decoder's interleave + upsample path)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    s2 = subsampling == "420"
    h, w, _ = img.shape
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0
    if s2:
        # luma padded so the 2×2-block MCU grid is complete; chroma
        # box-averaged 2×2 from the even-padded plane
        y = np.pad(y, ((0, -h % 16), (0, -w % 16)), mode="edge")

        def half(p: np.ndarray) -> np.ndarray:
            p = np.pad(p, ((0, -h % 2), (0, -w % 2)), mode="edge")
            return 0.25 * (p[0::2, 0::2] + p[1::2, 0::2]
                           + p[0::2, 1::2] + p[1::2, 1::2])

        cb, cr = half(cb), half(cr)
    qy, qc = _quality_tables(quality)
    qtabs = [qy.reshape(8, 8), qc.reshape(8, 8)]

    coefs = []  # per component: (n_by, n_bx, 64) zigzagged quantized ints
    for plane, qt in ((y, qtabs[0]), (cb, qtabs[1]), (cr, qtabs[1])):
        b = _blocks_of(plane) - 128.0
        # 2-D DCT-II over every block at once: C @ block @ C.T
        d = np.einsum("ij,abjk,lk->abil", _DCT_C, b, _DCT_C, optimize=True)
        q = np.round(d / qt).astype(np.int64)
        coefs.append(q.reshape(q.shape[0], q.shape[1], 64)[:, :, _ZIGZAG])

    dc_lum = _huff_codes(*_HUFF_DC_LUM)
    ac_lum = _huff_codes(*_HUFF_AC_LUM)
    dc_chr = _huff_codes(*_HUFF_DC_CHR)
    ac_chr = _huff_codes(*_HUFF_AC_CHR)
    tables = [(dc_lum, ac_lum), (dc_chr, ac_chr), (dc_chr, ac_chr)]
    samp = [(2, 2), (1, 1), (1, 1)] if s2 else [(1, 1), (1, 1), (1, 1)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcu_y, n_mcu_x = coefs[1].shape[:2]  # chroma grid == MCU grid
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            for ci in range(3):
                hs, vs = samp[ci]
                for byy in range(vs):
                    for bxx in range(hs):
                        zz = coefs[ci][my * vs + byy, mx * hs + bxx]
                        pred[ci] = _encode_block(bw, zz, pred[ci], *tables[ci])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    y_hv = 0x22 if s2 else 0x11
    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qy[_ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for tc_th, (bits_, vals) in ((0x00, _HUFF_DC_LUM), (0x10, _HUFF_AC_LUM),
                                 (0x01, _HUFF_DC_CHR), (0x11, _HUFF_AC_CHR)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits_) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return out + bw.flush() + b"\xff\xd9"


class _BitReader:
    """Entropy-segment bit reader: the scan is unstuffed (0xFF00 →
    0xFF) once up front and exposed as ONE big Python int, so reads of
    any width are a shift+mask instead of per-bit loops — ~10× fewer
    interpreter ops per Huffman symbol than a bit-at-a-time walk."""

    def __init__(self, data: bytes, pos: int):
        end = data.find(b"\xff\xd9", pos)
        scan = data[pos : end if end >= 0 else len(data)]
        clean = scan.replace(b"\xff\x00", b"\xff")
        # trailing pad of 1-bytes so peeks past the end stay valid
        clean += b"\xff" * 4
        self.nbits = len(clean) * 8
        self.acc = int.from_bytes(clean, "big")
        self.p = 0

    def peek16(self) -> int:
        return (self.acc >> (self.nbits - self.p - 16)) & 0xFFFF

    def skip(self, k: int):
        self.p += k

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        v = (self.acc >> (self.nbits - self.p - k)) & ((1 << k) - 1)
        self.p += k
        return v


def _huff_decode_lut(bits, vals) -> np.ndarray:
    """Flat 2^16 lookup: LUT[next-16-bits] = (symbol << 5) | code_len
    (0 = invalid). One peek + one index decodes any symbol."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            lut[lo : lo + (1 << (16 - ln))] = (vals[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    return lut


def _read_symbol(br: _BitReader, lut: np.ndarray) -> int:
    entry = int(lut[br.peek16()])
    if entry == 0:
        raise ValueError("invalid JPEG Huffman code")
    br.skip(entry & 31)
    return entry >> 5


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JFIF bytes → (H, W, 3|1) uint8. Supports
    8-bit SOF0, 1-3 components, sampling factors 1-2; rejects
    progressive (SOF2), arithmetic coding and restart intervals.
    Per-block Python Huffman walk — fine for corpus thumbnails; a real
    deployment plugs a C codec into the same actor stage."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, hsamp, vsamp, tq)
    scan = None
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT: one or more tables
            q = 0
            while q < len(payload):
                pq, tq = payload[q] >> 4, payload[q] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(payload, np.uint8, 64, q + 1)
                qtabs[tq] = tbl.reshape(8, 8)
                q += 65
        elif marker == 0xC4:  # DHT: one or more tables
            q = 0
            while q < len(payload):
                tc, th = payload[q] >> 4, payload[q] & 0xF
                bits_ = list(payload[q + 1 : q + 17])
                nv = sum(bits_)
                vals = list(payload[q + 17 : q + 17 + nv])
                htabs[(tc, th)] = _huff_decode_lut(bits_, vals)
                q += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"unsupported sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline-sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", payload, 0)
            if ri:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            break
    if comps is None or scan is None:
        raise ValueError("truncated JPEG (missing SOF/SOS)")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for _, hs, vs, _ in comps
    ]
    by_cid = {c[0]: i for i, c in enumerate(comps)}
    order = [
        (by_cid[cs], htabs[(0, td)], htabs[(1, ta)]) for cs, td, ta in scan
    ]

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    zz = np.zeros(64, dtype=np.int64)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, dct_tab, act in order:
                _, hs, vs, tq = comps[ci]
                qt = qtabs[tq]
                for byy in range(vs):
                    for bxx in range(hs):
                        zz[:] = 0
                        size = _read_symbol(br, dct_tab)
                        pred[ci] += _extend(br.bits(size), size)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0 and run == 15:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coeff = np.zeros(64, dtype=np.float64)
                        coeff[_ZIGZAG] = zz
                        coeff = coeff.reshape(8, 8) * qt
                        pix = _DCT_C.T @ coeff @ _DCT_C + 128.0
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix

    full = []
    for (cid, hs, vs, tq), p in zip(comps, planes):
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
