"""RIFF/AVI container codec: lossless DIB roundtrip, MJPG parity with the
bare JPEG codec, header fidelity, quarantine of unsupported codecs."""
import numpy as np
import pytest

from sanskrit_ocr_ray.stages.avi import avi_decode, avi_encode
from sanskrit_ocr_ray.stages.jpeg import jpeg_decode, jpeg_encode


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(6, 32, 32), (3, 17, 23), (1, 1, 1), (4, 8, 5)])
def test_dib_roundtrip_exact(shape):
    """Uncompressed 8-bit DIB frames (incl. odd widths that exercise the
    4-byte row stride padding) must survive the container bit-for-bit."""
    fr = _frames(*shape)
    out, fps = avi_decode(avi_encode(fr, fps=25, codec="DIB "))
    np.testing.assert_array_equal(out, fr)
    assert fps == 25.0


def test_fps_roundtrip():
    fr = _frames(2, 8, 8)
    _, fps = avi_decode(avi_encode(fr, fps=30, codec="DIB "))
    assert fps == 30.0


def test_mjpg_matches_bare_jpeg():
    """MJPG frames are baseline JFIF streams: decoding through the
    container must equal the bare JPEG roundtrip exactly."""
    fr = _frames(4, 24, 40, seed=3)
    out, _ = avi_decode(avi_encode(fr, fps=25, codec="MJPG", quality=90))
    ref = np.stack([jpeg_decode(jpeg_encode(f, quality=90)) for f in fr])
    np.testing.assert_array_equal(out, ref)


def test_mjpg_psnr():
    fr = np.tile(np.linspace(0, 255, 48, dtype=np.uint8), (5, 48, 1))
    out, _ = avi_decode(avi_encode(fr, fps=25, codec="MJPG", quality=95))
    err = (out.astype(np.float64) - fr.astype(np.float64)) ** 2
    psnr = 10.0 * np.log10(255.0**2 / max(err.mean(), 1e-12))
    assert psnr > 35.0


def test_malformed_rejected():
    with pytest.raises(ValueError):
        avi_decode(b"not an avi")
    good = avi_encode(_frames(2, 8, 8), codec="DIB ")
    with pytest.raises(ValueError):
        avi_decode(good[:40])  # truncated mid-header
    # unsupported codec fourcc (e.g. H.264) quarantines
    bad = bytearray(good)
    i = bad.find(b"strf")
    assert i > 0
    bad[i + 8 + 16 : i + 8 + 20] = b"H264"  # biCompression field
    with pytest.raises(ValueError):
        avi_decode(bytes(bad))
    with pytest.raises(ValueError):
        avi_encode(_frames(2, 8, 8), codec="H264")


def test_decode_payload_integration():
    from sanskrit_ocr_ray.stages.multimodal import decode_payload

    fr = _frames(3, 16, 16, seed=5)
    out = decode_payload("video/avi", avi_encode(fr, codec="DIB "), 16, 16)
    np.testing.assert_array_equal(out, fr)


def test_sample_frames_container_parity():
    """sample_frames must produce identical checksums whether the frames
    travel raw8 or inside the AVI container (DIB is lossless)."""
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.multimodal import synth_video_batch

    batch = pa.table({"doc_id": pa.array([2, 3, 4, 7], type=pa.int64())})
    t = synth_video_batch(batch)
    types = t["media_type"].to_pylist()
    assert types == ["video/gif", "video/raw8", "video/avi", "video/raw8"]
    nf = t["n_frames"][0].as_py()
    w, h = t["width"][0].as_py(), t["height"][0].as_py()
    from sanskrit_ocr_ray.stages.gif import gif_decode_frames

    for did, mt, p in zip(t["doc_id"].to_pylist(), types, t["payload"].to_pylist()):
        i = np.arange(h * w, dtype=np.int64)
        f = np.arange(nf, dtype=np.int64)
        expect = ((did * 7 + f[:, None] * 13 + (i * i)[None, :]) % 256).astype(np.uint8)
        if mt == "video/avi":
            got = avi_decode(p)[0].reshape(nf, -1)
        elif mt == "video/gif":
            got = gif_decode_frames(p).reshape(nf, -1)
        else:
            got = np.frombuffer(p, np.uint8).reshape(nf, -1)
        np.testing.assert_array_equal(got, expect)


def test_video_scene_cuts_flags_planted_cut(ray_session):
    """A clip whose third frame inverts flags exactly one cut, across
    all three container arms (AVI, GIF, raw8)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.avi import avi_encode
    from sanskrit_ocr_ray.stages.gif import gif_encode_anim
    from sanskrit_ocr_ray.stages.multimodal import video_scene_cuts

    rng = np.random.default_rng(3)
    base = rng.integers(0, 40, size=(16, 16), dtype=np.uint8)
    frames = np.stack([base, base, 255 - base, 255 - base])  # cut at idx 2
    rows = []
    for did, (mt, payload) in enumerate(
        [
            ("video/avi", avi_encode(frames, fps=25, codec="DIB ")),
            ("video/gif", gif_encode_anim(frames)),
            ("video/raw8", frames.tobytes()),
        ]
    ):
        rows.append(
            {
                "doc_id": did,
                "media_type": mt,
                "n_frames": 4,
                "width": 16,
                "height": 16,
                "payload": payload,
            }
        )
    ds = rd.from_arrow(
        pa.Table.from_pylist(rows)
        .set_column(5, "payload", pa.array([r["payload"] for r in rows], pa.binary()))
    )
    out = (
        video_scene_cuts(ds, threshold=1000)
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    exp_diff = np.abs(
        frames[1:].astype(np.int64) - frames[:-1].astype(np.int64)
    ).sum(axis=(1, 2))
    for did in range(3):
        sub = out[out["doc_id"] == did]
        assert sub["frame_idx"].tolist() == [1, 2, 3]
        assert sub["diff"].tolist() == exp_diff.tolist()
        assert sub["is_cut"].tolist() == [0, 1, 0]
