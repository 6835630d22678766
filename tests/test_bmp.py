"""BMP 8-bit gray codec: lossless roundtrip, top-down decode, quarantine."""

import struct

import numpy as np
import pytest

from sanskrit_ocr_ray.stages.bmp import bmp_decode, bmp_encode


def _images():
    rng = np.random.default_rng(51)
    return [
        rng.integers(0, 256, (40, 61)).astype(np.uint8),  # odd width → stride pad
        rng.integers(0, 256, (1, 4)).astype(np.uint8),
        ((np.arange(50)[:, None] * np.arange(48)[None, :]) % 256).astype(np.uint8),
    ]


def test_bmp_roundtrip_exact():
    for img in _images():
        out = bmp_decode(bmp_encode(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_bmp_topdown_decode():
    img = _images()[0]
    blob = bytearray(bmp_encode(img))
    h = img.shape[0]
    # flip to a top-down DIB: negate biHeight and un-reverse the rows
    struct.pack_into("<i", blob, 22, -h)
    (off_bits,) = struct.unpack_from("<I", blob, 10)
    stride = (img.shape[1] + 3) & ~3
    rows = np.frombuffer(bytes(blob), np.uint8, stride * h, off_bits).reshape(
        h, stride
    )
    blob[off_bits : off_bits + stride * h] = rows[::-1].tobytes()
    assert np.array_equal(bmp_decode(bytes(blob)), img)


def test_bmp_malformed_raises():
    img = _images()[0]
    good = bmp_encode(img)
    with pytest.raises(ValueError):
        bmp_decode(b"PX" + good[2:])
    with pytest.raises(ValueError):
        bmp_decode(good[: len(good) // 2])  # truncated pixels
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 24)  # 24-bit
    with pytest.raises(ValueError):
        bmp_decode(bytes(bad))
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        bmp_decode(bytes(bad))


def test_bmp_decode_payload_dispatch():
    from sanskrit_ocr_ray.stages.multimodal import decode_payload

    img = _images()[2]
    h, w = img.shape
    out = decode_payload("image/bmp", bmp_encode(img), w, h)
    assert np.array_equal(out, img)
