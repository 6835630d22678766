"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with width /
height / sample-rate metadata, processed by actor-pool map_batches stages
sized by *byte budget*, not row count. The raw-grayscale page path
(stages/image.py) is fully real; the codec-dependent steps below (JPEG /
PNG decode, audio resample, video frame sampling) are STUBBED behind
``NotImplementedError`` or a deterministic fake because the codec
libraries (PIL/cv2/ffmpeg) are not in this container — the Ray-side
plumbing (schemas, batch sizing, actor signature, output layout) is real
and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: media payload table with codec metadata
MULTIMODAL_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),   # "image/raw8" | "image/png" | "audio/pcm16" | ...
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("payload", pa.binary()),
    ]
)


def decode_payload(media_type: str, payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode one payload to an ndarray. Only raw formats are implemented
    in-sandbox; codec formats raise so callers quarantine the row."""
    if media_type == "image/raw8":
        return np.frombuffer(payload, dtype=np.uint8, count=width * height).reshape(
            height, width
        )
    if media_type == "audio/pcm16":
        return np.frombuffer(payload, dtype=np.int16)
    if media_type in ("image/png", "image/jpeg"):
        raise NotImplementedError(
            "PNG/JPEG decode requires PIL/cv2 (absent in this container); "
            "plug a codec into decode_payload — pipeline plumbing is format-agnostic"
        )
    raise NotImplementedError(f"unknown media_type {media_type!r}")


class FeatureExtractor:
    """Actor-pool stage: decode → per-payload feature vector.

    Real features for raw formats (intensity histogram for images, RMS
    frames for audio); rows whose codec is unavailable are quarantined
    into the ``error`` column instead of failing the batch — per-row
    quarantine, the fix for the reference's whole-batch skip
    (translate_bookcorpus.py:141-146, SURVEY.md M11).
    """

    def __init__(self, n_bins: int = 16) -> None:
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        types = batch["media_type"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats: list[list[float] | None] = []
        errors: list[str | None] = []
        for i in range(len(refs)):
            try:
                arr = decode_payload(types[i], payloads[i], widths[i] or 0, heights[i] or 0)
                if types[i].startswith("image/"):
                    hist, _ = np.histogram(arr, bins=self.edges)
                    feats.append((hist / max(arr.size, 1)).tolist())
                else:
                    # fixed-frame RMS energy profile
                    x = arr.astype(np.float64)
                    frames = np.array_split(x, self.n_bins) if x.size else []
                    feats.append(
                        [float(np.sqrt((f**2).mean())) if f.size else 0.0 for f in frames]
                    )
                errors.append(None)
            except NotImplementedError as exc:
                feats.append(None)
                errors.append(str(exc).split(";")[0])
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "features": pa.array(feats, type=pa.list_(pa.float64())),
                "error": pa.array(errors, type=pa.string()),
            }
        )


def resize_raw8_batch(batch: pa.Table, *, out_w: int, out_h: int) -> pa.Table:
    """Nearest-neighbor resize for raw8 images (vectorized index map)."""
    widths = batch["width"].to_pylist()
    heights = batch["height"].to_pylist()
    payloads = batch["payload"].to_pylist()
    out: list[bytes] = []
    for w, h, p in zip(widths, heights, payloads):
        img = np.frombuffer(p, dtype=np.uint8, count=w * h).reshape(h, w)
        yi = (np.arange(out_h) * h // out_h)[:, None]
        xi = (np.arange(out_w) * w // out_w)[None, :]
        out.append(img[yi, xi].tobytes())
    t = batch.drop_columns(["payload", "width", "height"])
    return (
        t.append_column("width", pa.array([out_w] * len(out), type=pa.int32()))
        .append_column("height", pa.array([out_h] * len(out), type=pa.int32()))
        .append_column("payload", pa.array(out, type=pa.binary()))
    )
