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
    """synth_pcm16_batch ships raw/PCM16/mu-law/ADPCM by doc_id;
    audio_energy reproduces the exact integer energies for all four."""
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.multimodal import audio_energy, synth_pcm16_batch
    from sanskrit_ocr_ray.stages.wav import ALAW_LUT, ULAW_LUT, adpcm_decode_codes

    ids = np.arange(16, dtype=np.int64)  # covers %8 in {0..7}
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
        if d % 8 == 2:
            x = ULAW_LUT[((d * 31 + i * 7) % 256).astype(np.uint8)].astype(np.int64)
        elif d % 8 == 4:
            x = ALAW_LUT[((d * 17 + i * 11) % 256).astype(np.uint8)].astype(np.int64)
        elif d % 8 == 6:
            nib = ((d * 13 + i[1:] * 5) % 16).astype(np.uint8)
            x = adpcm_decode_codes(
                nib[None, :], [((d * 31) % 4096) - 2048], [d % 89]
            )[0].astype(np.int64)
        else:
            x = ((d * 31 + i * 7) % 4096) - 2048
        for w in range(8):
            rows.append((d, w, int((x[w * 256 : (w + 1) * 256] ** 2).sum())))
    want = pd.DataFrame(rows, columns=["doc_id", "win", "energy"])
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


# --------------------------------------------------------------------------
# IMA ADPCM (format tag 0x11)
# --------------------------------------------------------------------------

_IDX_TAB = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_scalar_decode(codes, pred, idx):
    """Independent scalar reference decoder (textbook IMA recurrence)."""
    from sanskrit_ocr_ray.stages.wav import ADPCM_STEPS

    out = [int(pred)]
    idx = max(0, min(88, int(idx)))
    pred = int(pred)
    for c in codes:
        c = int(c)
        step = int(ADPCM_STEPS[idx])
        vp = step >> 3
        if c & 4:
            vp += step
        if c & 2:
            vp += step >> 1
        if c & 1:
            vp += step >> 2
        pred = pred - vp if c & 8 else pred + vp
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IDX_TAB[c & 7]))
        out.append(pred)
    return out


def test_adpcm_decode_matches_scalar_reference():
    import numpy as np

    from sanskrit_ocr_ray.stages.wav import adpcm_decode_codes

    rng = np.random.default_rng(21)
    m, n = 5, 700
    codes = rng.integers(0, 16, (m, n)).astype(np.uint8)
    pred0 = rng.integers(-32768, 32768, m)
    idx0 = rng.integers(0, 89, m)
    got = adpcm_decode_codes(codes, pred0, idx0)
    for r in range(m):
        assert got[r].tolist() == _adpcm_scalar_decode(
            codes[r], pred0[r], idx0[r]
        ), r


def test_adpcm_encode_decode_is_decoder_reconstruction():
    import numpy as np

    from sanskrit_ocr_ray.stages.wav import adpcm_decode_codes, adpcm_encode_codes

    rng = np.random.default_rng(22)
    t = np.arange(3000)
    x = (
        9000 * np.sin(t / 30)
        + 2500 * np.sin(t / 7)
        + rng.integers(-300, 300, len(t))
    ).astype(np.int16)
    codes, p0, i0 = adpcm_encode_codes(x[None, :])
    rec = adpcm_decode_codes(codes, p0, i0)[0]
    # decode(encode(x)) IS the encoder's tracked reconstruction: re-decoding
    # the code stream must reproduce it exactly (state parity), and the
    # codec should track a smooth signal to within a few steps
    rec2 = adpcm_decode_codes(codes, p0, i0)[0]
    assert np.array_equal(rec, rec2)
    assert np.mean(np.abs(rec[1:].astype(np.int64) - x[1:])) < 600


def test_adpcm_wav_container_roundtrip_single_and_multi_block():
    import numpy as np

    from sanskrit_ocr_ray.stages.wav import (
        adpcm_decode_codes,
        wav_decode,
        wav_encode,
        wav_encode_adpcm_codes,
    )

    rng = np.random.default_rng(23)
    # raw-code path, one block (2048 samples = header + 2047 nibbles)
    codes = rng.integers(0, 16, 2047).astype(np.uint8)
    blob = wav_encode_adpcm_codes(codes, -123, 30, 16000)
    s, rate, ch = wav_decode(blob)
    assert (rate, ch) == (16000, 1)
    assert s.tolist() == adpcm_decode_codes(codes[None, :], [-123], [30])[0].tolist()

    # multi-block raw-code path (odd tail, pad nibble trimmed by fact)
    codes2 = rng.integers(0, 16, 5000).astype(np.uint8)
    blob2 = wav_encode_adpcm_codes(codes2, 77, 0, 8000, samples_per_block=1024)
    s2, rate2, _ = wav_decode(blob2)
    assert rate2 == 8000
    assert (
        s2.tolist()
        == adpcm_decode_codes(codes2[None, :], [77], [0])[0].tolist()
    )

    # companding path: container carries the encoder's reconstruction
    x = (6000 * np.sin(np.arange(4000) / 25)).astype(np.int16)
    s3, _, _ = wav_decode(wav_encode(x, 22050, codec="adpcm"))
    assert len(s3) == len(x)
    assert np.mean(np.abs(s3.astype(np.int64) - x)) < 400


def test_adpcm_malformed_raises():
    import numpy as np
    import pytest

    from sanskrit_ocr_ray.stages.wav import wav_decode, wav_encode_adpcm_codes

    blob = bytearray(
        wav_encode_adpcm_codes(
            np.zeros(100, np.uint8), 0, 0, 8000, samples_per_block=64
        )
    )
    # corrupt the first block header's step index past 88
    data_at = blob.find(b"data") + 8
    blob[data_at + 2] = 200
    with pytest.raises(ValueError):
        wav_decode(bytes(blob))


# --------------------------------------------------------------------------
# G.711 A-law (format tag 6)
# --------------------------------------------------------------------------


def test_alaw_lut_canonical_points():
    from sanskrit_ocr_ray.stages.wav import ALAW_LUT

    def scalar(code):  # Sun g711.c alaw2linear, independent scalar form
        u = code ^ 0x55
        t = (u & 0x0F) << 4
        seg = (u >> 4) & 0x07
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (u & 0x80) else -t

    assert ALAW_LUT.tolist() == [scalar(c) for c in range(256)]
    assert ALAW_LUT.max() == 32256 and ALAW_LUT.min() == -32256


def test_alaw_encode_decode_identity_on_lattice():
    from sanskrit_ocr_ray.stages.wav import ALAW_LUT, alaw_decode, alaw_encode

    codes = alaw_encode(ALAW_LUT.astype(np.int64))
    assert alaw_decode(codes).tolist() == ALAW_LUT.tolist()


def test_wav_alaw_container_roundtrip():
    from sanskrit_ocr_ray.stages.wav import ALAW_LUT, wav_decode, wav_encode

    codes = np.arange(256, dtype=np.uint8)
    samples, rate, ch = wav_decode(wav_encode(codes, 8000, codec="alaw"))
    assert (rate, ch) == (8000, 1)
    assert samples.tolist() == ALAW_LUT.tolist()


def test_audio_autocorr_mixed_codecs_vs_numpy(ray_session):
    """audio_autocorr reproduces exact integer lag dots across all four
    codec families, and drops lags >= the clip length."""
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.multimodal import audio_autocorr, synth_pcm16_batch
    from sanskrit_ocr_ray.stages.wav import ALAW_LUT, ULAW_LUT, adpcm_decode_codes

    ids = np.arange(16, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = (
        audio_autocorr(
            ds.map_batches(synth_pcm16_batch, batch_format="pyarrow"),
            lags=(1, 64, 5000),  # 5000 > 2048 samples → emitted for no doc
        )
        .to_pandas()
        .sort_values(["doc_id", "lag"])
        .reset_index(drop=True)
    )
    assert (got["lag"] < 2048).all()
    i = np.arange(2048, dtype=np.int64)
    rows = []
    for d in ids:
        if d % 8 == 2:
            x = ULAW_LUT[((d * 31 + i * 7) % 256).astype(np.uint8)].astype(np.int64)
        elif d % 8 == 4:
            x = ALAW_LUT[((d * 17 + i * 11) % 256).astype(np.uint8)].astype(np.int64)
        elif d % 8 == 6:
            nib = ((d * 13 + i[1:] * 5) % 16).astype(np.uint8)
            x = adpcm_decode_codes(
                nib[None, :], [((d * 31) % 4096) - 2048], [d % 89]
            )[0].astype(np.int64)
        else:
            x = ((d * 31 + i * 7) % 4096) - 2048
        for k in (1, 64):
            rows.append((d, k, int(np.dot(x[:-k], x[k:]))))
    want = pd.DataFrame(rows, columns=["doc_id", "lag", "ac"])
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
