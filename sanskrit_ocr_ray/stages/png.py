"""Pure-Python PNG codec (stdlib zlib + numpy unfiltering).

The reference pipeline reads real PNG/JPEG background pages
(/root/reference/datagen/augmentations/render_text.py:48-61) and writes
rendered pages as PNG files (generate_dataset.py). This container ships
no PIL/cv2, so the engine carries its own codec for the one format that
needs nothing beyond stdlib ``zlib``: PNG with 8-bit samples. That makes
``image/png`` a REAL (decode + encode) media type in
:mod:`stages.multimodal` and :mod:`sources.backgrounds` instead of a
quarantined stub; JPEG (DCT entropy coding) stays honestly stubbed.

Supported: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA); all five scanline filters; no interlace.
Malformed input raises ``ValueError`` (callers quarantine the row).

Scale note: runs inside actor-pool ``map_batches`` stages — per-payload
decode is row-parallel across the pool; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode a uint8 array — (h, w) gray, (h, w, 3) RGB or (h, w, 4)
    RGBA — as a PNG. ``filter_type`` applies one scanline filter to every
    row (0=None is the fast default; 1-4 exist so tests can exercise the
    decoder's full unfilter matrix)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    flat = a.reshape(h, w * channels).astype(np.int16)
    bpp = channels
    rows = []
    prev = np.zeros(w * channels, np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = (cur - left) % 256
        elif filter_type == 2:  # Up
            filt = (cur - prev) % 256
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = (cur - (left + prev) // 2) % 256
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
            filt = (cur - _paeth(left, prev, ul)) % 256
        else:
            raise ValueError(f"unknown filter {filter_type}")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (left, up, upper-left)."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8 — (h, w) for gray, (h, w, c) otherwise
    (palette is expanded to RGB). Raises ValueError on malformed input,
    NotImplementedError on valid-but-unsupported variants (bit depth ≠ 8,
    interlaced)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} unsupported (8 only)")
    if interlace:
        raise NotImplementedError("interlaced PNG unsupported")
    if comp or filt or color not in _CHANNELS:
        raise ValueError("invalid IHDR fields")
    channels = _CHANNELS[color]
    stride = w * channels
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"bad IDAT stream: {exc}") from exc
    if len(raw) != h * (1 + stride):
        raise ValueError("scanline payload size mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    bpp = channels
    out = np.zeros((h, stride), np.int16)
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: lane-wise cumulative sum mod 256
            lanes = cur.reshape(w, bpp).astype(np.uint64)
            rec = (np.cumsum(lanes, axis=0) % 256).reshape(stride).astype(np.int16)
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average: sequential in x
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth: sequential in x
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                up = prev[x]
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
                rec[x] = (rec[x] + pred) % 256
        else:
            raise ValueError(f"unknown filter byte {f}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[img.reshape(h, w)]
    if channels == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, channels)
