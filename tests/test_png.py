"""Pure-Python PNG codec: roundtrip across filters/color types + malformed input."""

import struct
import zlib

import numpy as np
import pytest

from sanskrit_ocr_ray.stages.png import png_decode, png_encode


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (7, 5, 4)])
def test_roundtrip_filters_and_colors(filter_type, shape):
    img = _rand(shape, seed=hash((filter_type, shape)) % 2**32)
    out = png_decode(png_encode(img, filter_type=filter_type))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_page_sized_gray():
    img = _rand((400, 320), seed=3)
    for level in (1, 6):
        np.testing.assert_array_equal(png_decode(png_encode(img, level=level)), img)


def test_palette_decode():
    # hand-build a 2x2 palette PNG: indices 0..3 -> distinct RGB triples
    plte = bytes(range(12))
    idx = bytes([0, 0, 1, 0, 2, 3])  # two scanlines, filter byte 0 each
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(idx))
        + chunk(b"IEND", b"")
    )
    out = png_decode(data)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], [0, 1, 2])
    np.testing.assert_array_equal(out[1, 1], [9, 10, 11])


@pytest.mark.parametrize(
    "mangle",
    [
        lambda d: b"JUNK" + d[4:],  # bad signature
        lambda d: d[:20] + bytes([d[20] ^ 0xFF]) + d[21:],  # corrupt IHDR -> bad CRC
        lambda d: d[:-20],  # truncated (IEND + part of IDAT gone)
    ],
)
def test_malformed_raises_valueerror(mangle):
    good = png_encode(_rand((4, 4), seed=1))
    with pytest.raises(ValueError):
        png_decode(mangle(good))


def test_unsupported_raises_notimplemented():
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        png_decode(data)
