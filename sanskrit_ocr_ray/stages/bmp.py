"""Pure-Python BMP (Windows DIB file) codec for 8-bit grayscale.

Makes ``image/bmp`` a REAL media type: the file format is exactly a
``BITMAPFILEHEADER`` in front of the same palettized BI_RGB DIB the AVI
container stores per frame (stages/avi.py) — bottom-up rows, 4-byte
stride, 256-entry BGR0 grayscale palette — so encode/decode are
LOSSLESS for 8-bit gray.

Scope: BITMAPINFOHEADER (40-byte) DIBs, 8 bits per pixel, BI_RGB
(uncompressed), bottom-up or top-down (negative height) on decode.
Anything else (RLE8, 24-bit, V4/V5 headers beyond the core fields)
raises ``ValueError`` so the actor-pool stages quarantine the row
(per-row quarantine, SURVEY.md M11).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["bmp_encode", "bmp_decode"]


def bmp_encode(img: np.ndarray) -> bytes:
    """8-bit gray (h, w) → BMP bytes (palettized BI_RGB, bottom-up)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("bmp_encode expects (h, w) uint8")
    h, w = img.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = img[::-1]  # bottom-up
    pixels = rows.tobytes()
    palette = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels), 2835, 2835, 256, 0)
    off_bits = 14 + len(info) + len(palette)
    file_header = struct.pack("<2sIHHI", b"BM", off_bits + len(pixels), 0, 0, off_bits)
    return file_header + info + palette + pixels


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w) uint8 via the grayscale palette."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    _sig, _size, _r1, _r2, off_bits = struct.unpack_from("<2sIHHI", data, 0)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, bh, planes, bpp, comp = struct.unpack_from("<iiHHI", data, 18)
    if planes != 1 or bpp != 8 or comp != 0:
        raise ValueError(
            f"BMP outside the 8-bit BI_RGB subset (bpp={bpp} comp={comp})"
        )
    if w <= 0 or bh == 0:
        raise ValueError("bad BMP dimensions")
    h = abs(bh)
    # palette: n_colors entries (0 → 256) of BGR0 directly after the header
    (n_colors,) = struct.unpack_from("<I", data, 46)
    n_colors = n_colors or 256
    pal_off = 14 + hdr_size
    if pal_off + 4 * n_colors > len(data):
        raise ValueError("BMP palette out of bounds")
    pal = np.frombuffer(data, np.uint8, 4 * n_colors, pal_off).reshape(-1, 4)
    # grayscale lookup: integer luma (BT.601 fixed-point, exact for the
    # gray palettes this engine writes where B==G==R)
    p64 = pal.astype(np.int64)
    lut = ((77 * p64[:, 2] + 150 * p64[:, 1] + 29 * p64[:, 0]) >> 8).astype(
        np.uint8
    )
    if n_colors < 256:
        lut = np.pad(lut, (0, 256 - n_colors))
    stride = (w + 3) & ~3
    need = stride * h
    if off_bits + need > len(data):
        raise ValueError("BMP pixel data out of bounds")
    rows = np.frombuffer(data, np.uint8, need, off_bits).reshape(h, stride)[:, :w]
    idx = rows if bh < 0 else rows[::-1]  # bottom-up unless negative height
    return lut[idx]
