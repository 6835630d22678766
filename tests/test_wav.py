"""RIFF/WAVE PCM16 codec: lossless roundtrip, container parsing, quarantine."""
import struct

import numpy as np
import pytest

from sanskrit_ocr_ray.stages.wav import wav_decode, wav_encode


def test_mono_roundtrip_exact():
    rng = np.random.default_rng(0)
    s = rng.integers(-32768, 32767, 1001).astype(np.int16)  # odd → pad byte
    out, rate, ch = wav_decode(wav_encode(s, 16000))
    assert rate == 16000 and ch == 1
    np.testing.assert_array_equal(out, s)


def test_stereo_roundtrip_exact():
    rng = np.random.default_rng(1)
    s = rng.integers(-32768, 32767, (500, 2)).astype(np.int16)
    out, rate, ch = wav_decode(wav_encode(s, 44100))
    assert rate == 44100 and ch == 2
    np.testing.assert_array_equal(out, s)


def test_unknown_chunks_skipped():
    s = np.arange(-50, 50, dtype=np.int16)
    data = bytearray(wav_encode(s, 8000))
    # splice a LIST chunk between fmt and data (RIFF requires skipping it)
    fmt_end = data.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(data[:fmt_end]) + extra + bytes(data[fmt_end:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate, ch = wav_decode(spliced)
    np.testing.assert_array_equal(out, s)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxWOOF")
    good = wav_encode(np.zeros(10, np.int16), 8000)
    with pytest.raises(ValueError):
        wav_decode(good[:20])  # truncated data chunk
    # non-PCM format tag
    bad = bytearray(good)
    bad[20] = 3  # fmt tag at offset 20 (RIFF 12 + "fmt " 4 + size 4)
    with pytest.raises(ValueError):
        wav_decode(bytes(bad))


def test_decode_payload_integration():
    from sanskrit_ocr_ray.stages.multimodal import decode_payload

    s = np.arange(100, dtype=np.int16)
    arr = decode_payload("audio/wav", wav_encode(s, 16000), 0, 0)
    np.testing.assert_array_equal(arr, s)
