"""Baseline-JPEG codec (stages/codecs.py): roundtrip, subsampling,
dispatch, and unsupported-stream rejection.

The decoder reads quantization and Huffman tables FROM the stream, so
these roundtrips genuinely exercise marker parsing, entropy decode,
dequantize/IDCT and color conversion — not a shared-constant shortcut.
"""

import numpy as np
import pytest

from osm2gtfs_ray.stages.codecs import decode_image, decode_jpeg, encode_jpeg


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (128 + 100 * np.sin(yy / 7.0)).astype(np.uint8),
            (128 + 100 * np.cos(xx / 9.0)).astype(np.uint8),
            ((yy + xx) % 256).astype(np.uint8),
        ],
        axis=-1,
    )


@pytest.mark.parametrize("dims", [(16, 16), (17, 23), (64, 64), (19, 50)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_shapes_and_error(dims, sub):
    h, w = dims
    img = _smooth(h, w)
    data = encode_jpeg(img, quality=95, subsampling=sub)
    out = decode_jpeg(data)
    assert out.shape == img.shape  # exact dims incl. partial MCUs
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth content at q95: near-lossless for 4:4:4, chroma-bounded 4:2:0
    assert err.max() <= (3 if sub == "444" else 16)
    assert err.mean() < (1.0 if sub == "444" else 4.0)


def test_noise_worst_case_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 40


def test_dispatch_magic():
    img = _smooth(16, 16)
    out = decode_image(encode_jpeg(img))
    assert out.shape == img.shape


def test_quality_monotone_size():
    img = _smooth(48, 48)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 75, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rejects_progressive_and_restart():
    img = _smooth(16, 16)
    data = bytearray(encode_jpeg(img))
    # flip SOF0 (0xC0) to SOF2 (progressive)
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    # splice a DRI segment with a nonzero interval before SOS
    data = bytes(encode_jpeg(img))
    j = data.find(b"\xff\xda")
    spliced = data[:j] + b"\xff\xdd\x00\x04\x00\x08" + data[j:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(spliced)


def test_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"BM not a jpeg")


def test_deterministic_bytes():
    img = _smooth(24, 24)
    assert encode_jpeg(img) == encode_jpeg(img)
