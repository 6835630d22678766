"""Baseline-gray TIFF codec: exact round-trips, spec vectors, quarantine."""

import struct

import numpy as np
import pytest

from sanskrit_ocr_ray.stages.tiff import (
    packbits_decode,
    packbits_encode,
    tiff_decode,
    tiff_encode,
)


def _images():
    rng = np.random.default_rng(31)
    grad = (np.arange(97)[:, None] + np.arange(113)[None, :]) % 256
    return [
        rng.integers(0, 256, (64, 80)).astype(np.uint8),  # incompressible
        grad.astype(np.uint8),                            # runs along rows? no — diagonals
        np.full((33, 50), 7, np.uint8),                   # one long run
        np.tile(np.repeat(np.arange(8, dtype=np.uint8) * 32, 10), (21, 1)),
    ]


def test_packbits_apple_spec_vector():
    raw = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xAA" * 10
    packed = packbits_encode(np.frombuffer(raw, np.uint8))
    assert packed == bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(packed, len(raw)).tobytes() == raw


def test_packbits_roundtrip_randomized():
    rng = np.random.default_rng(32)
    for trial in range(30):
        # mix runs and noise; vary length incl. >128 runs and empty
        n = int(rng.integers(0, 700))
        vals = rng.integers(0, 4, n).astype(np.uint8)
        reps = rng.integers(1, 200, n)
        row = np.repeat(vals, reps)
        packed = packbits_encode(row)
        assert packbits_decode(packed, len(row)).tolist() == row.tolist(), trial


@pytest.mark.parametrize("comp", ["none", "packbits"])
@pytest.mark.parametrize("rps", [7, 64, 4096])
def test_tiff_roundtrip_exact(comp, rps):
    for img in _images():
        blob = tiff_encode(img, compression=comp, rows_per_strip=rps)
        out = tiff_decode(blob)
        assert out.shape == img.shape
        assert np.array_equal(out, img), (comp, rps, img.shape)


def test_tiff_packbits_compresses_runs():
    img = np.full((64, 64), 9, np.uint8)
    assert len(tiff_encode(img, compression="packbits")) < len(
        tiff_encode(img, compression="none")
    ) // 10


def test_tiff_whiteiszero_inverts():
    img = _images()[1]
    blob = bytearray(tiff_encode(img, compression="none"))
    # IFD sits at the stored offset; entry 262 (photometric) value 1 → 0
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", blob, base)
        if tag == 262:
            struct.pack_into("<HHII", blob, base, tag, typ, cnt, 0)
    out = tiff_decode(bytes(blob))
    assert np.array_equal(out, 255 - img)


def test_tiff_big_endian_decode():
    # hand-built MM stream: 2×3 gray, one uncompressed strip
    img = np.array([[1, 2, 3], [250, 251, 252]], np.uint8)
    data = img.tobytes()
    entries = [
        (256, 4, 1, 3),
        (257, 4, 1, 2),
        (258, 3, 1, 8 << 16),   # SHORT packs into the HIGH half in MM
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (273, 4, 1, 8),
        (277, 3, 1, 1 << 16),
        (278, 4, 1, 2),
        (279, 4, 1, len(data)),
    ]
    ifd_off = 8 + len(data)
    blob = struct.pack(">2sHI", b"MM", 42, ifd_off) + data
    blob += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        blob += struct.pack(">HHII", tag, typ, cnt, val)
    blob += struct.pack(">I", 0)
    assert np.array_equal(tiff_decode(blob), img)


def test_tiff_malformed_raises():
    img = _images()[0]
    good = tiff_encode(img)
    with pytest.raises(ValueError):
        tiff_decode(b"ZZ" + good[2:])
    with pytest.raises(ValueError):
        tiff_decode(good[:40])  # truncated mid-strip/IFD
    # unsupported compression value
    blob = bytearray(good)
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", blob, base)
        if tag == 259:
            struct.pack_into("<HHII", blob, base, tag, typ, cnt, 5)  # LZW
    with pytest.raises(ValueError):
        tiff_decode(bytes(blob))


def test_tiff_feature_extractor_path(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.multimodal import FeatureExtractor

    img = _images()[3]
    h, w = img.shape
    tbl = pa.table(
        {
            "media_ref": pa.array(["t/ok", "t/bad"]),
            "media_type": pa.array(["image/tiff", "image/tiff"]),
            "width": pa.array([w, w], pa.int32()),
            "height": pa.array([h, h], pa.int32()),
            "sample_rate": pa.array([0, 0], pa.int32()),
            "payload": pa.array(
                [tiff_encode(img), b"II*\x00garbage"], pa.binary()
            ),
        }
    )
    rows = {
        r["media_ref"]: r
        for r in rd.from_arrow(tbl)
        .map_batches(
            FeatureExtractor, batch_format="pyarrow", batch_size=8, concurrency=1
        )
        .take_all()
    }
    assert rows["t/ok"]["error"] is None
    assert len(rows["t/ok"]["features"]) == 16
    assert rows["t/bad"]["error"]  # quarantined, not raised
