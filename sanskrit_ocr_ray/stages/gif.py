"""Pure-Python GIF87a codec (LZW) for 8-bit grayscale pages.

Makes ``image/gif`` a REAL media type next to ``image/png`` (zlib
deflate), ``image/jpeg`` (DCT + huffman) and ``video/avi``: GIF adds the
LZW dictionary-coder family to the codec set, and — unlike JPEG — is
LOSSLESS for 8-bit palettized data, so a grayscale page shipped through
``gif_encode`` → ``gif_decode`` round-trips byte-exact and every
downstream integer oracle (histograms, checksums) is unchanged.

Wire format written here: GIF87a header, logical screen descriptor with
a 256-entry global color table (identity grayscale palette ``i →
(i,i,i)``), one image descriptor (no interlace, no local table), LZW
minimum code size 8, data sub-blocks ≤ 255 bytes, trailer. The LZW
width-change convention is the GIF (deferred) one, NOT TIFF's early
change: the DECODER grows the code width when its table fills the
current width (``next == 2^width``), and the ENCODER — whose table
construction runs exactly one code AHEAD of the decoder's — grows it
one entry later (``next == 2^width + 1``), so both sides' (next, width)
states are equal after every code, including the final code and EOI
(verified by the boundary-exact stream tests). At 4096 entries the
encoder emits a CLEAR code and resets rather than using deferred-clear.

Scale note: LZW is a per-payload sequential loop (inherently so — each
code depends on the dictionary built by every prior pixel), so the
codec runs inside actor-pool ``map_batches`` stages where the unit of
parallelism is the page, exactly like the JPEG huffman coder.

No counterpart in the reference (it loads PNG/JPEG via PIL,
datagen/augmentations/render_text.py:48-61); format per the public
GIF87a specification.
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257
_MAX_CODE = 4096  # 12-bit cap per the GIF spec


def _lzw_encode(indices: np.ndarray) -> bytes:
    """GIF-variant LZW over 8-bit symbols (min code size fixed at 8)."""
    out = bytearray()
    acc = 0
    nbits = 0

    code_size = 9
    next_code = _EOI + 1
    table: dict[int, int] = {}

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    data = indices.tobytes()
    emit(_CLEAR)
    if not data:
        emit(_EOI)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    cur = data[0]
    for s in data[1:]:
        key = (cur << 8) | s
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        emit(cur)
        if next_code == _MAX_CODE:
            emit(_CLEAR)
            table.clear()
            next_code = _EOI + 1
            code_size = 9
        else:
            table[key] = next_code
            next_code += 1
            # widen one entry AFTER the naive point: the decoder's table
            # construction lags this one by exactly one code, so with the
            # decoder widening at 2^cs both sides' (next_code, code_size)
            # are EQUAL after every code — no tail/EOI divergence
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        cur = s
    emit(cur)
    emit(_EOI)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    """Inverse of :func:`_lzw_encode`; raises ValueError on malformed
    streams (bad codes, missing EOI, wrong pixel count)."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)]
    table: list[bytes] = []
    code_size = 9
    next_code = _EOI + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("gif: truncated LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == _CLEAR:
            table = []
            code_size = 9
            next_code = _EOI + 1
            prev = None
            continue
        if code == _EOI:
            break
        if code < 256:
            entry = base[code]
        elif _EOI < code < next_code:
            entry = table[code - _EOI - 1]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + entry[:1])
            next_code += 1
            # deferred (GIF, not TIFF) change: widen when the table fills
            # the current width; the encoder widens one entry later than
            # naive (at 2^cs + 1) to compensate for this table's one-code
            # construction lag, keeping both sides bit-synchronized
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"gif: decoded {len(out)} pixels, expected {n_expected}"
        )
    return bytes(out)


def gif_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 grayscale image as a GIF87a payload with an
    identity grayscale palette (lossless)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("gif_encode expects an (H, W) uint8 array")
    h, w = img.shape
    out = bytearray(b"GIF87a")
    # logical screen descriptor: global table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(img.reshape(-1))
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def gif_decode(payload: bytes) -> np.ndarray:
    """Decode a GIF87a/89a payload to (H, W) uint8 (grayscale palette) or
    (H, W, 3) uint8 (color palette). Interlace, local color tables and
    min-code-size ≠ 8 are rejected with ValueError (quarantine path) —
    they never occur in payloads this engine writes."""
    try:
        return _gif_decode(payload)
    except (IndexError, struct.error) as exc:  # truncated header/blocks
        raise ValueError(f"gif: truncated payload ({exc})") from exc


def _gif_decode(payload: bytes) -> np.ndarray:
    if len(payload) < 13 or payload[:4] != b"GIF8":
        raise ValueError("gif: bad signature")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not packed & 0x80:
        raise ValueError("gif: missing global color table")
    n_pal = 2 << (packed & 0x07)
    pal = np.frombuffer(payload[pos : pos + 3 * n_pal], np.uint8).reshape(
        n_pal, 3
    )
    pos += 3 * n_pal
    # skip extension blocks (GIF89a graphic control etc.)
    while pos < len(payload) and payload[pos] == 0x21:
        pos += 2
        while payload[pos]:
            pos += 1 + payload[pos]
        pos += 1
    if pos >= len(payload) or payload[pos] != 0x2C:
        raise ValueError("gif: no image descriptor")
    _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
    pos += 10
    if ipacked & 0xC0:
        raise ValueError("gif: local color table / interlace unsupported")
    if (iw, ih) != (w, h):
        raise ValueError("gif: sub-rectangle frames unsupported")
    mcs = payload[pos]
    pos += 1
    if mcs != 8:
        raise ValueError(f"gif: LZW min code size {mcs} unsupported")
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("gif: truncated sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        chunks.append(payload[pos : pos + ln])
        pos += ln
    idx = np.frombuffer(_lzw_decode(b"".join(chunks), w * h), np.uint8)
    if bool((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
        return pal[idx, 0].reshape(h, w)
    return pal[idx].reshape(h, w, 3)


# ---------------------------------------------------------------------------
# animated GIF89a (multi-frame)
# ---------------------------------------------------------------------------


def gif_encode_anim(frames: np.ndarray, *, delay_cs: int = 4) -> bytes:
    """Encode an (N, H, W) uint8 grayscale stack as an animated GIF89a:
    Netscape-free minimal animation — one Graphic Control Extension
    (disposal=1 'leave in place', ``delay_cs`` centiseconds, no
    transparency) + full-rect image per frame, shared identity grayscale
    global palette. Every frame covers the whole canvas, so decode needs
    no compositing and the stack round-trips byte-exact (lossless)."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("gif_encode_anim expects an (N, H, W) uint8 array")
    n, h, w = frames.shape
    if n < 1:
        raise ValueError("gif_encode_anim needs at least one frame")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    for f in range(n):
        # graphic control extension: disposal=1, no transparent color
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(8)
        lzw = _lzw_encode(frames[f].reshape(-1))
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def gif_decode_frames(payload: bytes) -> np.ndarray:
    """Decode an animated GIF89a written by :func:`gif_encode_anim` (or
    any full-rect grayscale-palette animation) to (N, H, W) uint8.
    Sub-rectangle frames, transparency, local tables, interlace and
    min-code-size ≠ 8 raise ValueError (quarantine path) — honest
    rejection, not silent compositing."""
    try:
        return _gif_decode_frames(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"gif: truncated payload ({exc})") from exc


def _gif_decode_frames(payload: bytes) -> np.ndarray:
    if len(payload) < 13 or payload[:4] != b"GIF8":
        raise ValueError("gif: bad signature")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if not packed & 0x80:
        raise ValueError("gif: missing global color table")
    n_pal = 2 << (packed & 0x07)
    pos = 13
    pal = np.frombuffer(payload[pos : pos + 3 * n_pal], np.uint8).reshape(n_pal, 3)
    pos += 3 * n_pal
    if not bool((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
        raise ValueError("gif: color-palette animations unsupported")
    frames: list[np.ndarray] = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: validate GCE transparency, then skip
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] == 4 and payload[pos + 1] & 0x01:
                raise ValueError("gif: transparency unsupported")
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        if ipacked & 0xC0:
            raise ValueError("gif: local color table / interlace unsupported")
        if (iw, ih) != (w, h):
            raise ValueError("gif: sub-rectangle frames unsupported")
        mcs = payload[pos]
        pos += 1
        if mcs != 8:
            raise ValueError(f"gif: LZW min code size {mcs} unsupported")
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("gif: truncated sub-blocks")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(payload[pos : pos + ln])
            pos += ln
        idx = np.frombuffer(_lzw_decode(b"".join(chunks), w * h), np.uint8)
        frames.append(pal[idx, 0].reshape(h, w))
    if not frames:
        raise ValueError("gif: no frames")
    return np.stack(frames)
