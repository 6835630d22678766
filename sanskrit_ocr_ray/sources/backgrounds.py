"""Background-image directory store (SURVEY.md §2.1 S9).

The reference backgrounds a page with a random image file from a
directory, resized to page dimensions, falling back to synthetic
textures when a file fails to load (render_text.py:48-62: random.choice
+ PIL resize + try/except). This is its Ray-shaped equivalent over two
real formats — codec-free ``.raw8`` and ``.png`` (decoded by the
pure-Python codec in :mod:`stages.png`; RGB collapses to ITU-R 601
luma). JPEG stays out (needs native codecs — stages/multimodal.py stub
convention). Store semantics:

- the store is a SMALL-SIDE ASSET: load once on the driver (or once per
  actor), ``ray.put`` it, and read the broadcast handle inside
  ``map_batches`` — never re-ship per batch, never shuffle pages to the
  backgrounds;
- per-page choice is seeded by doc_id (``util.doc_rng``) instead of the
  reference's unseeded global ``random.choice`` — deterministic and
  order/parallelism-independent, the same replacement as synth M9/O2;
- malformed files are SKIPPED at load with a warning list (the per-file
  analogue of the reference's try/except fallback); an empty/missing dir
  yields an empty store and callers fall back to synthetic textures.

raw8 layout: ``<name>_<W>x<H>.raw8`` holding exactly W*H uint8 gray
pixels, row-major.
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..stages.png import png_decode
from ..util import doc_rng

_RAW8_RE = re.compile(r"_(\d+)x(\d+)\.raw8$")


def write_background_dir(path: str, n: int = 4, seed: int = 7) -> list[str]:
    """Deterministic raw8 texture files for tests/fixtures (the sandbox
    stand-in for a directory of scanned-paper photos)."""
    os.makedirs(path, exist_ok=True)
    out = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        w = int(rng.integers(200, 500))
        h = int(rng.integers(160, 400))
        base = 200.0 + rng.normal(0.0, 5.0, size=(h, w))
        # low-frequency mottling, calibrated like make_background styles
        yy, xx = np.mgrid[0:h, 0:w]
        base += 8.0 * np.sin(2 * np.pi * xx / max(40, w // 4)) * np.sin(
            2 * np.pi * yy / max(40, h // 4)
        )
        img = np.clip(base, 0, 255).astype(np.uint8)
        p = os.path.join(path, f"bg{i}_{w}x{h}.raw8")
        with open(p, "wb") as fh:
            fh.write(img.tobytes())
        out.append(p)
    return out


def load_background_store(path: str) -> tuple[list[np.ndarray], list[str]]:
    """Read every ``*.raw8`` / ``*.png`` in ``path`` → (textures,
    skipped-files). PNGs are decoded by the pure-Python codec; color
    images collapse to gray via ITU-R 601 luma (the reference converts
    backgrounds to "L" mode, render_text.py:56).

    Malformed entries (bad name, size mismatch, corrupt PNG stream) are
    skipped, not fatal — the reference's load-failure fallback
    (render_text.py:58-62) as a quarantine list instead of a printed
    warning.
    """
    textures: list[np.ndarray] = []
    skipped: list[str] = []
    if not os.path.isdir(path):
        return textures, skipped
    for f in sorted(os.listdir(path)):
        fp = os.path.join(path, f)
        if f.endswith(".png"):
            try:
                with open(fp, "rb") as fh:
                    img = png_decode(fh.read())
            except (ValueError, NotImplementedError):
                skipped.append(f)
                continue
            if img.ndim == 3:  # RGB(A) → luma, alpha ignored
                img = (
                    0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
                ).astype(np.uint8)
            textures.append(img)
            continue
        if not f.endswith(".raw8"):
            continue
        m = _RAW8_RE.search(f)
        if not m:
            skipped.append(f)
            continue
        w, h = int(m.group(1)), int(m.group(2))
        data = np.fromfile(fp, dtype=np.uint8)
        if data.size != w * h:
            skipped.append(f)
            continue
        textures.append(data.reshape(h, w))
    return textures, skipped


def _resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Separable bilinear resize (the sandbox's LANCZOS stand-in,
    render_text.py:57)."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)].astype(np.float64)
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


def choose_background(
    store: list[np.ndarray],
    doc_id: str,
    page_w: int,
    page_h: int,
    *,
    seed: int = 0,
    target_mean: float = 215.0,
) -> np.ndarray | None:
    """Deterministic per-doc background: seeded pick + resize + brightness
    normalization to the calibrated paper level (so Sauvola's window-local
    thresholds reject it exactly like the synthetic textures).

    Returns float64 (page_h, page_w), or None when the store is empty
    (caller falls back to synthetic — the reference's failure path).
    """
    if not store:
        return None
    rng = doc_rng(seed ^ 0xB6, doc_id)
    tex = store[int(rng.integers(0, len(store)))]
    page = _resize_bilinear(tex, page_w, page_h)
    return page + (target_mean - float(page.mean()))
