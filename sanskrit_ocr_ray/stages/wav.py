"""Pure-Python RIFF/WAVE PCM codec (stdlib struct only).

Makes ``audio/wav`` a REAL media type next to raw ``audio/pcm16``
(stages/multimodal.py): the reference pipelines treat audio as opaque
binary + metadata; here the container round-trips losslessly so the
windowed-energy / RMS kernels run on container payloads too.

Scope: canonical WAVE with a PCM ``fmt `` chunk (format tag 1, 16-bit
samples), a G.711 µ-law chunk (format tag 7, 8-bit codes — the
classic telephony companding codec; decoded to int16 via the public
Sun/ITU ``ulaw2linear`` recurrence, expressible in pure integer SQL so
the windowed-energy oracle stays EXACT on compressed payloads), or an
IMA/DVI ADPCM chunk (format tag 0x11, 4-bit predictive codes, mono —
STATEFUL integer recurrences replayed exactly by a DuckDB recursive
CTE), any channel count / sample rate for the stateless codecs.
Unknown chunks are skipped per the RIFF spec; anything structurally
broken raises ``ValueError`` so the actor-pool stages quarantine the
row (per-row quarantine, SURVEY.md M11).
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


def _build_alaw_lut() -> np.ndarray:
    """code → int16 per the public-domain Sun g711.c ``alaw2linear``:
    u = code ^ 0x55; t = (u & 15) << 4; seg = (u >> 4) & 7;
    t += 8 if seg == 0 else 0x108; t <<= seg−1 for seg ≥ 2;
    sample = t if (u & 0x80) else −t.  Range ±5504·... (±32256/8 steps)."""
    u = np.arange(256, dtype=np.int64) ^ 0x55
    t = (u & 0x0F) << 4
    seg = (u >> 4) & 0x07
    t = np.where(seg == 0, t + 8, t + 0x108)
    t = np.where(seg >= 2, t << np.maximum(seg - 1, 0), t)
    return np.where(u & 0x80, t, -t).astype(np.int16)


ALAW_LUT = _build_alaw_lut()
# nearest-lattice encode order; exact-distance ties break toward the
# LARGER code (deterministic, mirrors the µ-law convention)
_ALAW_ORDER = np.lexsort((-np.arange(256), ALAW_LUT)).astype(np.uint8)
_ALAW_SORTED = ALAW_LUT[_ALAW_ORDER].astype(np.int64)


def alaw_decode(codes) -> np.ndarray:
    """A-law bytes → int16 samples (vectorized LUT)."""
    return ALAW_LUT[np.asarray(codes).astype(np.uint8)]


def alaw_encode(samples) -> np.ndarray:
    """int16 samples → A-law bytes by nearest-lattice quantization."""
    x = np.asarray(samples, dtype=np.int64)
    ip = np.searchsorted(_ALAW_SORTED, x)
    lo = np.clip(ip - 1, 0, 255)
    hi = np.clip(ip, 0, 255)
    d_lo = np.abs(x - _ALAW_SORTED[lo])
    d_hi = np.abs(x - _ALAW_SORTED[hi])
    pick_hi = (d_hi < d_lo) | ((d_hi == d_lo) & (_ALAW_ORDER[hi] > _ALAW_ORDER[lo]))
    return np.where(pick_hi, _ALAW_ORDER[hi], _ALAW_ORDER[lo]).astype(np.uint8)


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


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11) — the classic 4-bit predictive codec.
# Stateful (predictor + step index recurrences), so unlike µ-law it cannot
# be a LUT: decode iterates samples, VECTORIZED ACROSS ROWS (one Python
# loop over sample positions, numpy ops over the whole batch per step —
# the same loop shape as the BSP/PageRank kernels). Pure integer math, so
# a DuckDB recursive CTE replays it exactly for the oracle gate.
# Tables per the IMA ADPCM reference (Intel/DVI, public spec).
# ---------------------------------------------------------------------------

ADPCM_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int64,
)
ADPCM_INDEX8 = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _adpcm_vpdiff(code: np.ndarray, step: np.ndarray) -> np.ndarray:
    """Magnitude update for 4-bit codes: (step>>3) + step·b2 + (step>>1)·b1
    + (step>>2)·b0 — the exact integer form (not the (2d+1)·step/8
    approximation), matching the reference decoder bit-for-bit."""
    return (
        (step >> 3)
        + np.where(code & 4, step, 0)
        + np.where(code & 2, step >> 1, 0)
        + np.where(code & 1, step >> 2, 0)
    )


def adpcm_decode_codes(
    codes: np.ndarray, pred0, idx0, *, return_idx_trace: bool = False
):
    """Decode nibble streams: ``codes`` (m, n) uint8 in [0,16), per-row
    initial predictor/step-index → (m, n+1) int16 — row r's first output
    sample IS ``pred0[r]`` (the WAV block-header sample), followed by the
    n nibble-decoded samples. With ``return_idx_trace`` also returns the
    (m, n+1) step-index state per sample (what a streaming encoder writes
    into later block headers)."""
    codes = np.atleast_2d(np.asarray(codes, dtype=np.int64))
    m, n = codes.shape
    pred = np.asarray(pred0, dtype=np.int64).reshape(m).copy()
    idx = np.clip(np.asarray(idx0, dtype=np.int64).reshape(m), 0, 88).copy()
    out = np.empty((m, n + 1), dtype=np.int64)
    out[:, 0] = pred
    itrace = np.empty((m, n + 1), dtype=np.int64) if return_idx_trace else None
    if itrace is not None:
        itrace[:, 0] = idx
    for i in range(n):
        c = codes[:, i]
        step = ADPCM_STEPS[idx]
        vp = _adpcm_vpdiff(c, step)
        pred = np.clip(pred + np.where(c & 8, -vp, vp), -32768, 32767)
        idx = np.clip(idx + ADPCM_INDEX8[c & 7], 0, 88)
        out[:, i + 1] = pred
        if itrace is not None:
            itrace[:, i + 1] = idx
    s16 = out.astype(np.int16)
    return (s16, itrace) if return_idx_trace else s16


def adpcm_encode_codes(
    samples: np.ndarray, idx0: np.ndarray | int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode int16 sample rows (m, k) → (codes (m, k−1) uint8, pred0,
    idx0): the standard greedy quantizer — sign bit from the diff, then
    the three magnitude bits by successive step subtraction — with the
    encoder tracking the DECODER's reconstruction state, so
    ``adpcm_decode_codes(*adpcm_encode_codes(x))`` is the codec's exact
    reconstruction of ``x`` (lossy vs x, losslessly replayable from the
    codes)."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.int64))
    m, k = s.shape
    pred = s[:, 0].copy()
    idx = np.clip(np.broadcast_to(np.asarray(idx0, np.int64), (m,)), 0, 88).copy()
    pred0, start_idx = pred.copy(), idx.copy()
    codes = np.empty((m, k - 1), dtype=np.uint8)
    for i in range(1, k):
        step = ADPCM_STEPS[idx]
        diff = s[:, i] - pred
        sign = diff < 0
        mag = np.abs(diff)
        b2 = mag >= step
        mag = mag - np.where(b2, step, 0)
        h1 = step >> 1
        b1 = mag >= h1
        mag = mag - np.where(b1, h1, 0)
        b0 = mag >= (step >> 2)
        c = (
            np.where(sign, 8, 0)
            + np.where(b2, 4, 0)
            + np.where(b1, 2, 0)
            + np.where(b0, 1, 0)
        ).astype(np.int64)
        vp = _adpcm_vpdiff(c, step)
        pred = np.clip(pred + np.where(sign, -vp, vp), -32768, 32767)
        idx = np.clip(idx + ADPCM_INDEX8[c & 7], 0, 88)
        codes[:, i - 1] = c.astype(np.uint8)
    return codes, pred0.astype(np.int16), start_idx


def _pack_nibbles(codes: np.ndarray) -> bytes:
    """Nibble stream → bytes, LOW nibble first (IMA WAV layout); odd
    counts pad the final high nibble with 0 (excluded via the fact
    chunk's sample count)."""
    c = np.asarray(codes, dtype=np.uint8)
    if len(c) % 2:
        c = np.append(c, np.uint8(0))
    return (c[0::2] | (c[1::2] << 4)).tobytes()


def wav_encode_adpcm_codes(
    codes: np.ndarray,
    pred0: int,
    idx0: int,
    sample_rate: int,
    *,
    samples_per_block: int = 2048,
) -> bytes:
    """Mono IMA-ADPCM WAV from a RAW nibble stream + initial state (the
    lossless-carry path, like µ-law's uint8 fast path): blocks of
    ``samples_per_block`` samples (4-byte header holding the block's
    decoder state + packed nibbles); later blocks' headers are obtained
    by decoding forward, exactly as a streaming encoder would emit."""
    codes = np.asarray(codes, dtype=np.uint8).reshape(-1)
    n_total = len(codes) + 1
    # decoded trace supplies each block boundary's (pred, idx) state
    dec, itr = adpcm_decode_codes(
        codes[None, :], [pred0], [idx0], return_idx_trace=True
    )
    dec_pred, idx_trace = dec[0], itr[0]
    nib_per_block = samples_per_block - 1
    block_align = 4 + (nib_per_block + 1) // 2
    blocks = []
    pos = 0  # sample position of the block header
    while pos < n_total:
        nib = codes[pos : pos + nib_per_block]
        blocks.append(
            struct.pack("<hBB", int(dec_pred[pos]), int(idx_trace[pos]), 0)
            + _pack_nibbles(nib).ljust(block_align - 4, b"\x00")
        )
        pos += samples_per_block
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        (sample_rate * block_align + samples_per_block - 1) // samples_per_block,
        block_align, 4, 2, samples_per_block,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n_total)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _adpcm_wav_decode(
    pcm: bytes, block_align: int, n_samples: int | None, spb: int
):
    """data chunk → int16 samples (mono): per-block header state + packed
    nibbles. Each block yields at most ``spb`` samples (fmt-extension
    samples_per_block — the field that makes odd nibble counts
    unambiguous: the byte-pad nibble is beyond spb−1 and never decoded);
    ``n_samples`` (fact chunk) trims the final block."""
    if block_align < 5:
        raise ValueError("ADPCM block_align too small")
    if spb < 2:
        raise ValueError("ADPCM samples_per_block < 2")
    out = []
    for off in range(0, len(pcm) - (len(pcm) % block_align), block_align):
        pred0, idx0, _r = struct.unpack_from("<hBB", pcm, off)
        if idx0 > 88:
            raise ValueError("ADPCM step index out of range")
        packed = np.frombuffer(pcm, np.uint8, block_align - 4, off + 4)
        nib = np.empty(2 * len(packed), dtype=np.uint8)
        nib[0::2] = packed & 0x0F
        nib[1::2] = packed >> 4
        nib = nib[: spb - 1]
        out.append(adpcm_decode_codes(nib[None, :], [pred0], [idx0])[0])
    if not out:
        raise ValueError("ADPCM stream has no complete block")
    samples = np.concatenate(out)
    if n_samples is not None:
        if n_samples > len(samples):
            raise ValueError("fact chunk exceeds decoded sample count")
        samples = samples[:n_samples]
    return samples


def wav_encode(
    samples: np.ndarray, sample_rate: int, channels: int = 1, codec: str = "pcm16"
) -> bytes:
    """Encode samples (1-D interleaved, or (n, channels)) to WAV bytes.

    ``codec="pcm16"``: int16 → format tag 1. ``codec="ulaw"``: format
    tag 7 — a uint8 array is written as raw µ-law codes (lossless
    carry, what the synth pipeline ships); any other dtype is companded
    through :func:`ulaw_encode` first (lossy quantization)."""
    if codec in ("ulaw", "alaw"):
        arr = np.asarray(samples)
        if arr.ndim == 2:
            channels = arr.shape[1]
            arr = arr.reshape(-1)
        elif arr.ndim != 1:
            raise ValueError("samples must be 1-D interleaved or (n, channels)")
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        codes = arr.astype(np.uint8) if arr.dtype == np.uint8 else enc(arr)
        data = codes.tobytes()
        block_align = channels
        fmt = struct.pack(
            "<HHIIHH", 7 if codec == "ulaw" else 6, channels, sample_rate,
            sample_rate * block_align, block_align, 8,
        )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if codec == "adpcm":
        arr = np.asarray(samples, dtype=np.int64)
        if arr.ndim != 1:
            raise ValueError("ADPCM encode is mono: samples must be 1-D")
        if len(arr) < 2:
            raise ValueError("ADPCM needs at least 2 samples")
        nib, p0, i0 = adpcm_encode_codes(arr[None, :])
        return wav_encode_adpcm_codes(
            nib[0], int(p0[0]), int(i0[0]), sample_rate
        )
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
    fmt_extra = b""
    pcm = None
    fact_n = None
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
            fmt_extra = bytes(body[16:])
        elif tag == b"fact":
            if size >= 4:
                (fact_n,) = struct.unpack_from("<I", body, 0)
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt_info is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt_info
    if channels < 1:
        raise ValueError("channels < 1")
    if audio_fmt == 0x11 and bits == 4:  # IMA ADPCM → int16
        if channels != 1:
            raise ValueError("ADPCM decode is mono-only")
        if len(fmt_extra) < 4:
            raise ValueError("ADPCM fmt lacks samples_per_block extension")
        (spb,) = struct.unpack_from("<H", fmt_extra, 2)
        return _adpcm_wav_decode(pcm, block_align, fact_n, spb), int(rate), 1
    if audio_fmt in (6, 7) and bits == 8:  # G.711 A-law / µ-law → int16
        codes = np.frombuffer(pcm[: len(pcm) - len(pcm) % channels], np.uint8)
        samples = ulaw_decode(codes) if audio_fmt == 7 else alaw_decode(codes)
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
