"""JPEG codec: roundtrip quality, format coverage, quarantine.

JPEG is lossy, so roundtrips assert PSNR bounds (and exactness on flat
blocks where quantization is error-free), never bit equality — EXCEPT
progressive-vs-sequential decode of the same image, which must agree
bit-for-bit (identical quantized coefficients, different serialization).
"""
import numpy as np
import pytest

from sanskrit_ocr_ray.stages.jpeg import jpeg_decode, jpeg_encode


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10.0 * np.log10(255.0**2 / max(err.mean(), 1e-12))


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 2 + xx) % 256).astype(np.uint8)


def test_flat_gray_exact():
    img = np.full((40, 56), 128, np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("shape", [(64, 80), (37, 53), (8, 8), (1, 1), (9, 17)])
def test_gray_roundtrip_psnr(shape):
    img = _grad(*shape)
    out = jpeg_decode(jpeg_encode(img, quality=95))
    assert out.shape == img.shape
    assert _psnr(out, img) > 35.0


@pytest.mark.parametrize("subsample,floor", [("444", 45.0), ("420", 35.0)])
def test_color_roundtrip_psnr(subsample, floor):
    yy, xx = np.mgrid[0:48, 0:40]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95, subsample=subsample))
    assert out.shape == img.shape
    assert _psnr(out, img) > floor


def test_quality_monotone_size():
    img = _grad(64, 64)
    sizes = [len(jpeg_encode(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_textlike_page_high_fidelity():
    """A binarized-text-like page (flat background, dark strokes) at q85."""
    img = np.full((320, 400), 235, np.uint8)
    img[40:42, 20:380] = 20
    img[60:80, 100:103] = 20
    out = jpeg_decode(jpeg_encode(img, quality=85))
    assert _psnr(out, img) > 30.0


@pytest.mark.parametrize("shape", [(64, 80), (37, 53), (8, 8), (1, 1), (9, 17)])
def test_progressive_gray_matches_sequential(shape):
    """Progressive serializes the SAME quantized coefficients as
    sequential, so the decoded pixels must be bit-identical."""
    img = _grad(*shape)
    seq = jpeg_decode(jpeg_encode(img, quality=90))
    prog = jpeg_decode(jpeg_encode(img, quality=90, progressive=True))
    np.testing.assert_array_equal(prog, seq)


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_progressive_color_matches_sequential(subsample):
    yy, xx = np.mgrid[0:37, 0:45]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    seq = jpeg_decode(jpeg_encode(img, quality=90, subsample=subsample))
    prog = jpeg_decode(
        jpeg_encode(img, quality=90, subsample=subsample, progressive=True))
    np.testing.assert_array_equal(prog, seq)


def test_progressive_noise_stress():
    """Dense high-frequency content exercises ZRL-in-refinement, long
    EOB runs, and interleaved correction bits."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(80, 72), dtype=np.uint8)
    for q in (25, 75, 95):
        seq = jpeg_decode(jpeg_encode(img, quality=q))
        prog = jpeg_decode(jpeg_encode(img, quality=q, progressive=True))
        np.testing.assert_array_equal(prog, seq)


def test_progressive_textlike_page():
    img = np.full((96, 120), 235, np.uint8)
    img[40:42, 20:110] = 20
    img[60:80, 100:103] = 20
    seq = jpeg_decode(jpeg_encode(img, quality=85))
    prog = jpeg_decode(jpeg_encode(img, quality=85, progressive=True))
    np.testing.assert_array_equal(prog, seq)
    assert _psnr(prog, img) > 30.0


def test_malformed_rejected():
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    good = jpeg_encode(_grad(16, 16))
    with pytest.raises(ValueError):
        jpeg_decode(good[:20])  # truncated mid-header
    # SOF2 marker on a SEQUENTIAL stream: the interleaved full-band scan
    # header (Ss=0, Se=63) is invalid for a progressive DC scan
    bad = bytearray(good)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad))
    # arithmetic-coded SOF9 stays quarantined
    bad2 = bytearray(good)
    bad2[i + 1] = 0xC9
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad2))


def test_decode_payload_integration():
    from sanskrit_ocr_ray.stages.multimodal import decode_payload

    img = _grad(24, 32)
    arr = decode_payload("image/jpeg", jpeg_encode(img, quality=95), 32, 24)
    assert arr.shape == (24, 32)
    assert _psnr(arr, img) > 35.0
