"""Pure-Python baseline TIFF codec for 8-bit grayscale (stdlib struct).

Makes ``image/tiff`` a REAL media type next to PNG/JPEG/GIF
(stages/multimodal.py): scanned-document corpora ship TIFF more than
any other container, so the feature-extraction path should decode it
natively rather than quarantine.

Scope (TIFF 6.0 baseline, the scanner-output subset):
- single-sample 8-bit grayscale (SamplesPerPixel 1, BitsPerSample 8),
  PhotometricInterpretation 0 (WhiteIsZero, inverted on decode) or 1;
- Compression 1 (none) or 32773 (PackBits — the byte-oriented RLE of
  the spec's §9, lossless, exact integer round-trip);
- multi-strip images (RowsPerStrip + StripOffsets/StripByteCounts
  arrays), both II (little) and MM (big) byte orders on decode.

Anything outside the subset (tiles, LZW, predictors, palettes, >8-bit)
raises ``ValueError`` so the actor-pool stages quarantine the row
(per-row quarantine, SURVEY.md M11). Encode writes II with a
configurable RowsPerStrip so the strip logic is a tested path, not a
single-strip special case.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["tiff_encode", "tiff_decode", "packbits_encode", "packbits_decode"]

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_T_SHORT = 3
_T_LONG = 4


def packbits_encode(row: np.ndarray) -> bytes:
    """PackBits RLE of one byte row: runs ≥ 2 become (1−n, value), the
    literals between them (n−1, bytes); runs never exceed 128."""
    b = np.asarray(row, dtype=np.uint8)
    n = len(b)
    if n == 0:
        return b""
    # run-length decomposition: boundaries where the value changes
    change = np.flatnonzero(b[1:] != b[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    out = bytearray()
    lit_start = None  # pending literal segment [lit_start, lit_end)
    lit_end = None

    def flush_literal() -> None:
        nonlocal lit_start, lit_end
        if lit_start is None:
            return
        seg = b[lit_start:lit_end]
        for off in range(0, len(seg), 128):
            chunk = seg[off : off + 128]
            out.append(len(chunk) - 1)
            out.extend(chunk.tobytes())
        lit_start = lit_end = None

    for s, ln in zip(starts.tolist(), lengths.tolist()):
        if ln >= 2:
            flush_literal()
            v = int(b[s])
            rem = ln
            while rem > 0:
                take = min(rem, 128)
                if take == 1:  # a stray single byte → 1-byte literal
                    out.append(0)
                    out.append(v)
                else:
                    out.append(257 - take)  # two's-complement of 1−take
                    out.append(v)
                rem -= take
        else:
            if lit_start is None:
                lit_start = s
            lit_end = s + ln
    flush_literal()
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> np.ndarray:
    """Inverse of :func:`packbits_encode` → exactly ``expected`` bytes."""
    out = np.empty(expected, dtype=np.uint8)
    pos = 0
    i = 0
    n = len(data)
    while pos < expected:
        if i >= n:
            raise ValueError("PackBits stream truncated")
        c = data[i]
        i += 1
        if c < 128:  # literal of c+1 bytes
            k = c + 1
            if i + k > n or pos + k > expected:
                raise ValueError("PackBits literal overruns")
            out[pos : pos + k] = np.frombuffer(data, np.uint8, k, i)
            i += k
            pos += k
        elif c > 128:  # run of 257-c copies
            k = 257 - c
            if i >= n or pos + k > expected:
                raise ValueError("PackBits run overruns")
            out[pos : pos + k] = data[i]
            i += 1
            pos += k
        # c == 128: no-op per spec
    return out


def tiff_encode(
    img: np.ndarray, *, compression: str = "packbits", rows_per_strip: int = 64
) -> bytes:
    """8-bit gray (h, w) → baseline TIFF bytes (II order, multi-strip)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("tiff_encode expects (h, w) uint8")
    h, w = img.shape
    comp = {"none": 1, "packbits": 32773}.get(compression)
    if comp is None:
        raise ValueError(f"unknown compression {compression!r}")
    rows_per_strip = max(1, min(rows_per_strip, h if h else 1))
    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        block = img[y0 : y0 + rows_per_strip]
        if comp == 1:
            strips.append(block.tobytes())
        else:
            # spec: compression restarts at every row
            strips.append(b"".join(packbits_encode(r) for r in block))
    if not strips:
        strips = [b""]
    n_strips = len(strips)

    entries: list[tuple[int, int, int, int]] = []  # placeholder-resolved below
    # layout: header(8) | strip data | [offsets array][counts array] | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = b""
    if n_strips == 1:
        off_val, cnt_val = strip_offsets[0], len(strips[0])
        off_ptr = cnt_ptr = None
    else:
        off_ptr = pos
        extra += b"".join(struct.pack("<I", o) for o in strip_offsets)
        pos += 4 * n_strips
        cnt_ptr = pos
        extra += b"".join(struct.pack("<I", len(s)) for s in strips)
        pos += 4 * n_strips
        off_val, cnt_val = off_ptr, cnt_ptr
    ifd_off = pos

    entries = [
        (_TAG_WIDTH, _T_LONG, 1, w),
        (_TAG_LENGTH, _T_LONG, 1, h),
        (_TAG_BITS, _T_SHORT, 1, 8),
        (_TAG_COMPRESSION, _T_SHORT, 1, comp),
        (_TAG_PHOTOMETRIC, _T_SHORT, 1, 1),  # BlackIsZero
        (_TAG_STRIP_OFFSETS, _T_LONG, n_strips, off_val),
        (_TAG_SAMPLES, _T_SHORT, 1, 1),
        (_TAG_ROWS_PER_STRIP, _T_LONG, 1, rows_per_strip),
        (_TAG_STRIP_COUNTS, _T_LONG, n_strips, cnt_val),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)  # no next IFD
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + b"".join(strips)
        + extra
        + ifd
    )


def _read_values(data: bytes, e: str, typ: int, cnt: int, raw: bytes) -> list[int]:
    """IFD entry value(s): inline when they fit in 4 bytes, else offset."""
    size = {_T_SHORT: 2, _T_LONG: 4}.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {typ}")
    fmt = {_T_SHORT: "H", _T_LONG: "I"}[typ]
    total = size * cnt
    if total <= 4:
        return list(struct.unpack_from(f"{e}{cnt}{fmt}", raw, 0))
    (off,) = struct.unpack_from(f"{e}I", raw, 0)
    if off + total > len(data):
        raise ValueError("TIFF value array out of bounds")
    return list(struct.unpack_from(f"{e}{cnt}{fmt}", data, off))


def tiff_decode(data: bytes) -> np.ndarray:
    """Baseline-gray TIFF bytes → (h, w) uint8 (II or MM byte order)."""
    if len(data) < 8:
        raise ValueError("not a TIFF stream")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF stream (bad byte order)")
    magic, ifd_off = struct.unpack_from(f"{e}HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF stream (bad magic)")
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD out of bounds")
    (n_entries,) = struct.unpack_from(f"{e}H", data, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(data):
        raise ValueError("TIFF IFD truncated")
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", data, base)
        if typ not in (_T_SHORT, _T_LONG):
            continue  # rational DPI tags etc. — irrelevant to the subset
        tags[tag] = _read_values(data, e, typ, cnt, data[base + 8 : base + 12])

    def one(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return tags[tag][0]

    w, h = one(_TAG_WIDTH), one(_TAG_LENGTH)
    if one(_TAG_BITS, 1) != 8 or one(_TAG_SAMPLES, 1) != 1:
        raise ValueError("TIFF outside the 8-bit gray subset")
    comp = one(_TAG_COMPRESSION, 1)
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    photo = one(_TAG_PHOTOMETRIC, 1)
    if photo not in (0, 1):
        raise ValueError("TIFF outside the grayscale subset")
    rps = one(_TAG_ROWS_PER_STRIP, h or 1)
    offs = tags.get(_TAG_STRIP_OFFSETS)
    cnts = tags.get(_TAG_STRIP_COUNTS)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF strip tables missing or inconsistent")
    out = np.empty((h, w), dtype=np.uint8)
    y = 0
    for off, cnt in zip(offs, cnts):
        if off + cnt > len(data):
            raise ValueError("TIFF strip out of bounds")
        rows = min(rps, h - y)
        if rows <= 0:
            raise ValueError("TIFF has more strips than rows")
        raw = data[off : off + cnt]
        if comp == 1:
            if cnt != rows * w:
                raise ValueError("TIFF strip byte count mismatch")
            out[y : y + rows] = np.frombuffer(raw, np.uint8).reshape(rows, w)
        else:
            out[y : y + rows] = packbits_decode(raw, rows * w).reshape(rows, w)
        y += rows
    if y != h:
        raise ValueError("TIFF strips do not cover the image")
    return (255 - out) if photo == 0 else out
