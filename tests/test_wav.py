"""RIFF/WAVE PCM16 codec: lossless roundtrip, container parsing, quarantine."""
import struct

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# G.711 mu-law
# ---------------------------------------------------------------------------


def test_ulaw_lut_canonical_points():
    """Spot values of the Sun g711 ulaw2linear recurrence."""
    from sanskrit_ocr_ray.stages.wav import ulaw_decode

    assert ulaw_decode([0xFF]).tolist() == [0]        # canonical zero
    assert ulaw_decode([0x7F]).tolist() == [0]        # negative-zero dual
    assert ulaw_decode([0x00]).tolist() == [-32124]   # extreme negative
    assert ulaw_decode([0x80]).tolist() == [32124]    # extreme positive
    assert ulaw_decode([0xFE]).tolist() == [8]


def test_ulaw_encode_decode_identity_on_lattice():
    """encode(decode(c)) == c for every code except the negative-zero
    dual 0x7F, which canonically re-encodes to 0xFF."""
    from sanskrit_ocr_ray.stages.wav import ulaw_decode, ulaw_encode

    codes = np.arange(256, dtype=np.uint8)
    back = ulaw_encode(ulaw_decode(codes))
    assert (back[codes != 0x7F] == codes[codes != 0x7F]).all()
    assert back[0x7F] == 0xFF


def test_ulaw_encode_is_nearest_quantizer():
    """decode(encode(x)) is the nearest lattice point for random int16."""
    from sanskrit_ocr_ray.stages.wav import ULAW_LUT, ulaw_decode, ulaw_encode

    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, 4000).astype(np.int64)
    got = ulaw_decode(ulaw_encode(x)).astype(np.int64)
    best = np.abs(x[:, None] - ULAW_LUT[None, :].astype(np.int64)).min(axis=1)
    assert (np.abs(x - got) == best).all()


def test_wav_ulaw_container_roundtrip():
    """uint8 code payloads carry losslessly through the tag-7 container;
    decode returns the exact int16 lattice samples."""
    from sanskrit_ocr_ray.stages.wav import ulaw_decode, wav_decode, wav_encode

    rng = np.random.default_rng(12)
    codes = rng.integers(0, 256, 999).astype(np.uint8)
    payload = wav_encode(codes, 8000, codec="ulaw")
    samples, rate, ch = wav_decode(payload)
    assert rate == 8000 and ch == 1
    np.testing.assert_array_equal(samples, ulaw_decode(codes))


def test_wav_ulaw_lossy_path_and_errors():
    from sanskrit_ocr_ray.stages.wav import ULAW_LUT, wav_decode, wav_encode

    x = np.array([0, 100, -5000, 32124], np.int16)
    samples, _, _ = wav_decode(wav_encode(x, 8000, codec="ulaw"))
    assert set(samples.tolist()) <= set(ULAW_LUT.tolist())
    with pytest.raises(ValueError):
        wav_encode(x, 8000, codec="flac")


def test_audio_energy_mixed_codecs_vs_numpy(ray_session):
    """synth_pcm16_batch ships raw/PCM16/mu-law by doc_id; audio_energy
    reproduces the exact integer energies for all three forms."""
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.multimodal import audio_energy, synth_pcm16_batch
    from sanskrit_ocr_ray.stages.wav import ULAW_LUT

    ids = np.arange(8, dtype=np.int64)  # covers %4 in {0,1,2,3}
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = (
        audio_energy(ds.map_batches(synth_pcm16_batch, batch_format="pyarrow"))
        .to_pandas()
        .sort_values(["doc_id", "win"])
        .reset_index(drop=True)
    )
    i = np.arange(2048, dtype=np.int64)
    rows = []
    for d in ids:
        if d % 4 == 2:
            x = ULAW_LUT[((d * 31 + i * 7) % 256).astype(np.uint8)].astype(np.int64)
        else:
            x = ((d * 31 + i * 7) % 4096) - 2048
        for w in range(8):
            rows.append((d, w, int((x[w * 256 : (w + 1) * 256] ** 2).sum())))
    want = pd.DataFrame(rows, columns=["doc_id", "win", "energy"])
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
