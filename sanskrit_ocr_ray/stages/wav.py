"""Pure-Python RIFF/WAVE PCM codec (stdlib struct only).

Makes ``audio/wav`` a REAL media type next to raw ``audio/pcm16``
(stages/multimodal.py): the reference pipelines treat audio as opaque
binary + metadata; here the container round-trips losslessly so the
windowed-energy / RMS kernels run on container payloads too.

Scope: canonical WAVE with a PCM ``fmt `` chunk (format tag 1), 16-bit
samples, any channel count / sample rate. Unknown chunks are skipped per
the RIFF spec; anything structurally broken raises ``ValueError`` so the
actor-pool stages quarantine the row (per-row quarantine, SURVEY.md M11).
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """Encode int16 samples (1-D interleaved, or (n, channels)) to WAV bytes."""
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
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_fmt} bits={bits} (PCM16 only)")
    if channels < 1:
        raise ValueError("channels < 1")
    samples = np.frombuffer(pcm[: len(pcm) - len(pcm) % (2 * channels)], dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, int(rate), int(channels)
