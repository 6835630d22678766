"""Pure-Python GIF87a/LZW codec: exact roundtrip (incl. code-width
boundaries and the 4096-entry dictionary reset), color palettes,
malformed-input quarantine, and the multimodal decode dispatch."""

import numpy as np
import pytest

from sanskrit_ocr_ray.stages.gif import _lzw_decode, _lzw_encode, gif_decode, gif_encode


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "img",
    [
        np.array([[42]], np.uint8),  # single pixel
        np.zeros((3, 3), np.uint8),  # all-equal runs
        np.arange(256, dtype=np.uint8).reshape(16, 16),  # every symbol once
        _rand((40, 50), seed=1),  # crosses the 512-entry width bump
    ],
    ids=["one_px", "constant", "all_symbols", "small_random"],
)
def test_roundtrip_small(img):
    np.testing.assert_array_equal(gif_decode(gif_encode(img)), img)


def test_roundtrip_crosses_dictionary_reset():
    """60k incompressible pixels fill the 12-bit LZW table past 4096
    several times — exercises every width change AND the clear/reset."""
    img = _rand((200, 300), seed=2)
    payload = gif_encode(img)
    np.testing.assert_array_equal(gif_decode(payload), img)


def test_roundtrip_page_sized_binarized():
    """The shape the extraction pipeline actually ships: a sparse
    binarized page compresses ~10x and round-trips byte-exact."""
    rng = np.random.default_rng(3)
    img = (rng.random((320, 400)) > 0.85).astype(np.uint8) * 255
    payload = gif_encode(img)
    assert len(payload) < img.size // 5
    np.testing.assert_array_equal(gif_decode(payload), img)


def test_lzw_stream_roundtrip_exact_boundaries():
    """Drive the raw LZW coder with symbol streams sized right at the
    width-change points; the decoder's early (lagged) width bump must
    stay bit-synchronized with the encoder's."""
    rng = np.random.default_rng(4)
    for n in (1, 2, 250, 253, 254, 255, 256, 257, 510, 1021, 5000):
        data = rng.integers(0, 256, n, dtype=np.uint8)
        assert _lzw_decode(_lzw_encode(data), n) == data.tobytes()


def test_color_palette_decodes_to_rgb():
    """A non-grayscale global palette comes back as (H, W, 3)."""
    import struct

    img = np.array([[0, 1], [2, 3]], np.uint8)
    payload = bytearray(gif_encode(img))
    # overwrite the first 4 palette entries with distinct RGB triples
    pal_off = 13
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    for i, c in enumerate(colors):
        payload[pal_off + 3 * i : pal_off + 3 * i + 3] = bytes(c)
    out = gif_decode(bytes(payload))
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out.reshape(4, 3), np.array(colors, np.uint8))


def test_gif89a_extension_blocks_are_skipped():
    """A GIF89a graphic-control extension between the palette and the
    image descriptor is tolerated (real-world files have them)."""
    img = _rand((5, 6), seed=5)
    payload = gif_encode(img)
    pal_end = 13 + 768
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = payload[:pal_end] + ext + payload[pal_end:]
    np.testing.assert_array_equal(gif_decode(patched), img)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"",
        lambda p: b"NOTGIF" + p[6:],
        lambda p: p[:-12],  # truncated sub-blocks
        lambda p: p[: 13 + 768 + 10] ,  # cut inside the image descriptor
    ],
    ids=["empty", "bad_magic", "truncated_lzw", "no_image"],
)
def test_malformed_payloads_raise_value_error(mutate):
    payload = gif_encode(_rand((8, 8), seed=6))
    with pytest.raises(ValueError):
        gif_decode(mutate(payload))


def test_multimodal_dispatch_and_quarantine():
    """decode_payload routes image/gif through the codec; a corrupt GIF
    quarantines the ROW (error column), not the batch."""
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.multimodal import FeatureExtractor, decode_payload

    img = _rand((12, 9), seed=7)
    out = decode_payload("image/gif", gif_encode(img), 9, 12)
    np.testing.assert_array_equal(out, img)

    good = gif_encode(img)
    batch = pa.table(
        {
            "media_ref": ["ok", "bad"],
            "media_type": ["image/gif", "image/gif"],
            "width": pa.array([9, 9], pa.int32()),
            "height": pa.array([12, 12], pa.int32()),
            "sample_rate": pa.array([0, 0], pa.int32()),
            "payload": pa.array([good, good[:-15]], pa.binary()),
        }
    )
    res = FeatureExtractor()(batch)
    errs = res["error"].to_pylist()
    feats = res["features"].to_pylist()
    assert errs[0] is None and len(feats[0]) == 16
    assert errs[1] is not None and feats[1] is None


def test_gif_anim_roundtrip_exact():
    """Animated GIF89a: an (N,H,W) gray stack round-trips byte-exact,
    including frames that differ and a 1-frame animation."""
    from sanskrit_ocr_ray.stages.gif import gif_decode_frames, gif_encode_anim

    rng = np.random.default_rng(7)
    fr = rng.integers(0, 256, size=(5, 17, 23), dtype=np.uint8)
    out = gif_decode_frames(gif_encode_anim(fr))
    np.testing.assert_array_equal(out, fr)
    one = rng.integers(0, 256, size=(1, 9, 9), dtype=np.uint8)
    np.testing.assert_array_equal(gif_decode_frames(gif_encode_anim(one)), one)


def test_gif_anim_single_frame_compat():
    """The single-frame decoder reads the first frame of an animation
    (it skips GCE extensions), and the animated decoder reads plain
    GIF87a stills as a 1-frame stack."""
    from sanskrit_ocr_ray.stages.gif import (
        gif_decode,
        gif_decode_frames,
        gif_encode,
        gif_encode_anim,
    )

    rng = np.random.default_rng(11)
    fr = rng.integers(0, 256, size=(3, 8, 12), dtype=np.uint8)
    np.testing.assert_array_equal(gif_decode(gif_encode_anim(fr)), fr[0])
    still = rng.integers(0, 256, size=(8, 12), dtype=np.uint8)
    st = gif_decode_frames(gif_encode(still))
    np.testing.assert_array_equal(st, still[None])


def test_gif_anim_malformed_quarantine():
    """Truncation, transparency, and sub-rect frames raise ValueError."""
    import pytest

    from sanskrit_ocr_ray.stages.gif import gif_decode_frames, gif_encode_anim

    fr = np.zeros((2, 6, 6), dtype=np.uint8)
    good = gif_encode_anim(fr)
    with pytest.raises(ValueError):
        gif_decode_frames(good[:40])
    with pytest.raises(ValueError):
        gif_decode_frames(b"NOTGIF" + good)
    # flip the GCE transparency bit (first 0x21 0xF9 block after palette)
    bad = bytearray(good)
    gce = bad.index(b"\x21\xf9", 13)
    bad[gce + 3] |= 0x01
    with pytest.raises(ValueError):
        gif_decode_frames(bytes(bad))
