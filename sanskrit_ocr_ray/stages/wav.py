"""Pure-Python RIFF/WAVE PCM codec (stdlib struct only).

Makes ``audio/wav`` a REAL media type next to raw ``audio/pcm16``
(stages/multimodal.py): the reference pipelines treat audio as opaque
binary + metadata; here the container round-trips losslessly so the
windowed-energy / RMS kernels run on container payloads too.

Scope: canonical WAVE with a PCM ``fmt `` chunk (format tag 1, 16-bit
samples) or a G.711 µ-law chunk (format tag 7, 8-bit codes — the
classic telephony companding codec; decoded to int16 via the public
Sun/ITU ``ulaw2linear`` recurrence, expressible in pure integer SQL so
the windowed-energy oracle stays EXACT on compressed payloads), any
channel count / sample rate. Unknown chunks are skipped per the RIFF
spec; anything structurally broken raises ``ValueError`` so the
actor-pool stages quarantine the row (per-row quarantine, SURVEY.md M11).
"""

from __future__ import annotations

import struct

import numpy as np

_ULAW_BIAS = 0x84


def _build_ulaw_lut() -> np.ndarray:
    """code → int16 per the public-domain Sun g711.c ``ulaw2linear``:
    u = ~code; t = (((u & 15) << 3) + 0x84) << ((u >> 4) & 7);
    sample = (u & 0x80) ? 0x84 - t : t - 0x84.  Range ±32124."""
    u = 255 - np.arange(256, dtype=np.int64)  # ~code & 0xFF
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


ULAW_LUT = _build_ulaw_lut()
# value ties (the duplicate zero at 0x7F/0xFF) break toward the LARGER
# code so an exact zero encodes to the canonical 0xFF
_ULAW_ORDER = np.lexsort((-np.arange(256), ULAW_LUT)).astype(np.uint8)
_ULAW_SORTED = ULAW_LUT[_ULAW_ORDER].astype(np.int64)


def ulaw_decode(codes) -> np.ndarray:
    """µ-law bytes → int16 samples (vectorized LUT)."""
    return ULAW_LUT[np.asarray(codes).astype(np.uint8)]


def ulaw_encode(samples) -> np.ndarray:
    """int16 samples → µ-law bytes by nearest-lattice quantization
    (vectorized searchsorted over the 256-point decode lattice; exact-
    distance ties pick the LARGER code, so the duplicate zero encodes to
    the canonical 0xFF, never its negative-zero dual 0x7F)."""
    x = np.asarray(samples, dtype=np.int64)
    ip = np.searchsorted(_ULAW_SORTED, x)
    lo = np.clip(ip - 1, 0, 255)
    hi = np.clip(ip, 0, 255)
    d_lo = np.abs(x - _ULAW_SORTED[lo])
    d_hi = np.abs(x - _ULAW_SORTED[hi])
    pick_hi = (d_hi < d_lo) | (
        (d_hi == d_lo) & (_ULAW_ORDER[hi] > _ULAW_ORDER[lo])
    )
    return np.where(pick_hi, _ULAW_ORDER[hi], _ULAW_ORDER[lo]).astype(np.uint8)


def wav_encode(
    samples: np.ndarray, sample_rate: int, channels: int = 1, codec: str = "pcm16"
) -> bytes:
    """Encode samples (1-D interleaved, or (n, channels)) to WAV bytes.

    ``codec="pcm16"``: int16 → format tag 1. ``codec="ulaw"``: format
    tag 7 — a uint8 array is written as raw µ-law codes (lossless
    carry, what the synth pipeline ships); any other dtype is companded
    through :func:`ulaw_encode` first (lossy quantization)."""
    if codec == "ulaw":
        arr = np.asarray(samples)
        if arr.ndim == 2:
            channels = arr.shape[1]
            arr = arr.reshape(-1)
        elif arr.ndim != 1:
            raise ValueError("samples must be 1-D interleaved or (n, channels)")
        codes = arr.astype(np.uint8) if arr.dtype == np.uint8 else ulaw_encode(arr)
        data = codes.tobytes()
        block_align = channels
        fmt = struct.pack(
            "<HHIIHH", 7, channels, sample_rate,
            sample_rate * block_align, block_align, 8,
        )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if codec != "pcm16":
        raise ValueError(f"unknown codec {codec!r}")
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 2:
        channels = arr.shape[1]
        arr = arr.reshape(-1)
    elif arr.ndim != 1:
        raise ValueError("samples must be 1-D interleaved or (n, channels)")
    data = arr.tobytes()
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode WAV bytes → (int16 samples (n,) or (n, channels), rate, channels)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_info = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt_info is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt_info
    if channels < 1:
        raise ValueError("channels < 1")
    if audio_fmt == 7 and bits == 8:  # G.711 µ-law → int16
        codes = np.frombuffer(pcm[: len(pcm) - len(pcm) % channels], np.uint8)
        samples = ulaw_decode(codes)
    elif audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(
            pcm[: len(pcm) - len(pcm) % (2 * channels)], dtype="<i2"
        )
    else:
        raise ValueError(
            f"unsupported WAV: format={audio_fmt} bits={bits} (PCM16/µ-law only)"
        )
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, int(rate), int(channels)
