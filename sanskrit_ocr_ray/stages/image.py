"""Pure-numpy page-image kernels + their Ray Data map_batches stages.

These invert the degradation model the reference *applies* when rendering
synthetic pages (datagen/augmentations/render_text.py:334-411):

- global rotation (render_text.py:360-361)        → :func:`estimate_skew` + deskew
- brightness/contrast/noise (render_text.py:362-367) → :func:`sauvola` local
  binarization (window-local thresholds are invariant to global gain/offset)
- line layout with jitter (render_text.py:158-254)  → :func:`segment_lines`
- per-word/akshara layout (render_text.py:160-196)  → :func:`segment_glyphs`

All kernels are vectorized numpy over zero-copy views of Arrow ``binary``
pixel buffers; no PIL/cv2 (unavailable in this sandbox — SURVEY.md §7.0).

Scale notes (100 TB): pixel payloads are the dominant bytes. The stage
functions below (a) run as stateless ``map_batches`` tasks over small
batches sized by pixel budget, (b) drop the raw ``pixels`` column as soon
as the binarized bitmask exists (packed bits = 8× smaller), and (c) never
let pixel bytes reach a shuffle — recognition reduces each page to a small
string *before* the reassembly groupby (SURVEY.md §7.4 "wide media rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..glyphs import (
    BIT_COLS,
    BIT_ROWS,
    CELL,
    GLYPH_H,
    GLYPH_W,
    PITCH,
    SHIRO_H,
    bits_to_char,
)

# ---------------------------------------------------------------------------
# kernels (single page, pure numpy)
# ---------------------------------------------------------------------------


def sauvola(img: np.ndarray, window: int = 31, k: float = 0.2, r: float = 128.0) -> np.ndarray:
    """Sauvola local binarization → bool ink mask (True = ink).

    t(x,y) = m(x,y) * (1 + k * (s(x,y)/R - 1)) over a ``window``-square
    neighborhood, computed with integral images (O(1) per pixel).
    """
    h, w = img.shape
    pad = window // 2
    fp = np.pad(img, pad + 1, mode="edge")
    # exact integer integral images (uint8 sums fit int32 / int64 — no
    # float accumulation error, ~half the memory traffic of f64);
    # in-place cumsums avoid two temporaries per page
    ii = fp.astype(np.int32)
    np.cumsum(ii, axis=0, out=ii)
    np.cumsum(ii, axis=1, out=ii)
    ii2 = fp.astype(np.int64)
    np.multiply(ii2, ii2, out=ii2)
    np.cumsum(ii2, axis=0, out=ii2)
    np.cumsum(ii2, axis=1, out=ii2)

    def box(iimg: np.ndarray) -> np.ndarray:
        a = iimg[window : window + h, window : window + w]
        b = iimg[window : window + h, :w]
        c = iimg[:h, window : window + w]
        d = iimg[:h, :w]
        return a - b - c + d

    n = float(window * window)
    mean = box(ii) / n
    var = np.maximum(box(ii2) / n - mean * mean, 0.0)
    std = np.sqrt(var)
    thresh = mean * (1.0 + k * (std / r - 1.0))
    return img < thresh


def despeckle(ink: np.ndarray) -> np.ndarray:
    """Drop isolated ink pixels (≤1 ink neighbor in the 8-neighborhood)."""
    p = np.pad(ink, 1).astype(np.uint8)
    nbr = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    return ink & (nbr >= 2)


def estimate_skew(
    ink: np.ndarray, max_deg: float = 5.0, step_deg: float = 0.2
) -> float:
    """Skew angle (degrees) maximizing row-projection sharpness.

    Coarse-to-fine search over the ink-pixel point cloud: score(θ) = sum of
    squared bin counts of the θ-rotated y coordinates (sharp line bands →
    concentrated histogram → high score). Inverts render_text.py:360-361's
    random page rotation.
    """
    ys, xs = np.nonzero(ink)
    if ys.size < 300:
        # too little ink to estimate reliably — the profile score of a
        # few dozen points is noise and "deskewing" a straight page by a
        # hallucinated angle corrupts it (hypothesis found the
        # single-glyph case). A single text line is ~1.4k points.
        return 0.0
    ys = ys.astype(np.float64)
    xs = xs.astype(np.float64)
    if ys.size > 8000:  # subsample for speed; bands remain sharp
        idx = np.linspace(0, ys.size - 1, 8000).astype(np.int64)
        ys, xs = ys[idx], xs[idx]

    h = int(ys.max()) + 1
    w = int(xs.max()) + 1
    span = h + int(np.ceil(w * np.sin(np.deg2rad(max_deg + 1)))) * 2 + 2

    def score(thetas: np.ndarray) -> np.ndarray:
        out = np.empty(thetas.size)
        for i, t in enumerate(thetas):
            rad = np.deg2rad(t)
            yr = ys * np.cos(rad) - xs * np.sin(rad)
            yq = (yr - yr.min()).astype(np.int64)
            counts = np.bincount(yq, minlength=span)
            out[i] = float((counts.astype(np.float64) ** 2).sum())
        return out

    coarse = np.arange(-max_deg, max_deg + 1e-9, 0.4)
    best = coarse[int(np.argmax(score(coarse)))]
    mid = np.arange(best - 0.4, best + 0.4 + 1e-9, 0.1)
    best = mid[int(np.argmax(score(mid)))]
    fine = np.arange(best - 0.1, best + 0.1 + 1e-9, 0.025)
    return float(fine[int(np.argmax(score(fine)))])


def rotate_bool(ink: np.ndarray, deg: float) -> np.ndarray:
    """Rotate a bool mask by ``deg`` about the image center (nearest neighbor)."""
    if abs(deg) < 1e-6:
        return ink
    h, w = ink.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rad = np.deg2rad(deg)
    cos, sin = np.cos(rad), np.sin(rad)
    yy, xx = np.mgrid[0:h, 0:w]
    # inverse map: output (y,x) samples input rotated by -deg
    ys = cos * (yy - cy) + sin * (xx - cx) + cy
    xs = -sin * (yy - cy) + cos * (xx - cx) + cx
    yi = np.round(ys).astype(np.int64)
    xi = np.round(xs).astype(np.int64)
    ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    out = np.zeros_like(ink)
    out[ok] = ink[yi[ok], xi[ok]]
    return out


_GRID_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _centered_grid(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached (yy-cy, xx-cx) float32 grids — one allocation per page size."""
    key = (h, w)
    g = _GRID_CACHE.get(key)
    if g is None:
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((yy - cy).astype(np.float32), (xx - cx).astype(np.float32))
        if len(_GRID_CACHE) < 8:
            _GRID_CACHE[key] = g
    return g


def rotate_gray(
    img: np.ndarray, deg: float, fill: float | None = None, *, bilinear: bool = False
) -> np.ndarray:
    """Rotate a grayscale page about its center, background-filled.

    Nearest-neighbor by default (the degradation model's flavor,
    render_text.py:360-361); ``bilinear=True`` for the deskew path, where
    interpolation quality preserves the 3×3 bit cells.
    """
    h, w = img.shape
    if fill is None:
        fill = float(np.median(img))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rad = np.deg2rad(deg)
    cos, sin = np.float32(np.cos(rad)), np.float32(np.sin(rad))
    dy, dx_ = _centered_grid(h, w)
    ys = cos * dy + sin * dx_ + np.float32(cy)
    xs = -sin * dy + cos * dx_ + np.float32(cx)
    if not bilinear:
        yi = np.round(ys).astype(np.int64)
        xi = np.round(xs).astype(np.int64)
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        out = np.full_like(img, np.uint8(np.clip(fill, 0, 255)))
        out[ok] = img[yi[ok], xi[ok]]
        return out
    # pad-once + clipped indices: no boolean-masked gathers in the hot path
    pad = np.full((h + 2, w + 2), fill, dtype=np.float32)
    pad[1:-1, 1:-1] = img
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    fy = (ys - y0).astype(np.float32)
    fx = (xs - x0).astype(np.float32)
    # out-of-range source coords land on the fill border after clipping
    yc = np.clip(y0 + 1, 0, h + 1)
    xc = np.clip(x0 + 1, 0, w + 1)
    yc1 = np.clip(y0 + 2, 0, h + 1)
    xc1 = np.clip(x0 + 2, 0, w + 1)
    top = pad[yc, xc] * (1 - fx) + pad[yc, xc1] * fx
    bot = pad[yc1, xc] * (1 - fx) + pad[yc1, xc1] * fx
    return np.clip(top * (1 - fy) + bot * fy, 0, 255).astype(np.uint8)


def _runs(mask: np.ndarray, min_gap: int, min_len: int) -> list[tuple[int, int]]:
    """Contiguous True runs of a 1-D mask, merging gaps < ``min_gap``,
    dropping runs shorter than ``min_len``. Returns [start, end) pairs."""
    idx = np.nonzero(mask)[0]
    if idx.size == 0:
        return []
    breaks = np.nonzero(np.diff(idx) >= min_gap)[0]
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [idx.size - 1]))
    return [
        (int(idx[s]), int(idx[e]) + 1)
        for s, e in zip(starts, ends)
        if idx[e] + 1 - idx[s] >= min_len
    ]


def segment_lines(ink: np.ndarray) -> list[tuple[int, int]]:
    """Text-line bands as [y0, y1) pairs from the horizontal projection
    profile (inverts render_text.py:192-254's top-to-bottom line layout)."""
    rows = ink.sum(axis=1)
    # threshold 2: a single glyph's stem contributes exactly 2 px/row, and
    # stem rows must keep the band contiguous (threshold 4 split
    # single-glyph lines — found by the hypothesis roundtrip property)
    mask = rows >= 2
    return [
        (y0, y1)
        for (y0, y1) in _runs(mask, min_gap=4, min_len=SHIRO_H)
        if ink[y0:y1].sum() >= 16
    ]


def segment_glyphs(line_ink: np.ndarray) -> list[tuple[int, int]]:
    """Glyph boxes [x0, x1) within one line band from the vertical projection
    (akshara segmentation; shirorekha makes each glyph a solid column run)."""
    cols = line_ink.sum(axis=0)
    return _runs(cols >= 1, min_gap=2, min_len=3)


def decode_page(ink: np.ndarray, codebook) -> str:
    """Segment + decode one deskewed binary page → text.

    Lines joined by a single space (greedy wrap consumed exactly one space
    at each break — layout_words semantics); intra-line gaps wider than one
    glyph pitch decode to spaces. Glyphs failing the parity check are
    dropped (poison-glyph quarantine, never a crash — the per-row analogue
    of SURVEY.md M11).
    """
    line_texts: list[str] = []
    for y0, y1 in segment_lines(ink):
        band = ink[y0 : y0 + GLYPH_H] if y1 - y0 < GLYPH_H else ink[y0:y1]
        boxes = segment_glyphs(band)
        if not boxes:
            continue
        # ONE integral image per line band (not per glyph): cell sums for
        # every glyph box are O(1) lookups into it
        bh, bw = band.shape
        band_ii = np.zeros((bh + 1, bw + 1), dtype=np.int32)
        np.cumsum(np.cumsum(band, axis=0), axis=1, out=band_ii[1:, 1:])
        chars: list[str] = []
        prev_end: int | None = None
        for x0, x1 in boxes:
            if prev_end is not None and (x0 - prev_end) >= (PITCH - GLYPH_W) + PITCH // 2:
                n_spaces = max(1, round((x0 - prev_end - (PITCH - GLYPH_W)) / PITCH))
                chars.append(" " * n_spaces)
            ch = _decode_glyph(band_ii, bh, bw, x0, codebook)
            if ch is not None:
                chars.append(ch)
            prev_end = x1
        text = "".join(chars).strip()
        if text:
            line_texts.append(text)
    return " ".join(line_texts)


_CELL_AREA = float(CELL * CELL)


def _decode_glyph(band_ii: np.ndarray, bh: int, bw: int, x0: int, codebook) -> str | None:
    """Decode one glyph box: find its shirorekha top, sample the 8 bit
    cells (with ±1 px alignment search), majority-vote each cell.

    ``band_ii`` is the line band's integral image (computed once per line
    in :func:`decode_page`); every cell sum is 4 lookups into it. The
    aligned case short-circuits after one clean read.
    """

    def rect(y0: int, y1: int, xa: int, xb: int) -> int:
        return int(band_ii[y1, xb] - band_ii[y0, xb] - band_ii[y1, xa] + band_ii[y0, xa])

    # shirorekha top: first row whose ink count over the glyph width ≥ W/2
    gx1 = min(x0 + GLYPH_W, bw)
    top = 0
    for y in range(bh):
        if rect(y, y + 1, x0, gx1) >= GLYPH_W // 2:
            top = y
            break

    def read(dy: int, dx: int) -> list[int] | None:
        """8 bit-cell ink counts (0..9), or None if any cell is out of range."""
        sums: list[int] = []
        for i in range(8):
            y = top + BIT_ROWS[i // 2] + dy
            x = x0 + BIT_COLS[i % 2] + dx
            if y < 0 or x < 0 or y + CELL > bh or x + CELL > bw:
                return None
            sums.append(rect(y, y + CELL, x, x + CELL))
        return sums

    # integer margin: distance of a cell count from the 4.5 on/off boundary
    # (|2s - 9|) — exact arithmetic, so alignment ties break by search order
    # (centered read first), never by float ULPs.
    def judge(sums: list[int]) -> tuple[str | None, int]:
        bits = 0
        margin = 9
        for i, s in enumerate(sums):
            if s > 4:
                bits |= 1 << i
            margin = min(margin, abs(2 * s - 9))
        return bits_to_char(bits), margin

    sums = read(0, 0)
    if sums is not None:
        ch, margin = judge(sums)
        # margin ≥ 5 ⇔ every cell ≤2 or ≥7 of 9 ink px — unreachable from a
        # ±1-px misalignment (which reads 3 or 6), so accepting here is safe
        if ch is not None and margin >= 5:
            return ch

    best_char: str | None = None
    best_margin = -1
    for dy in (0, -1, 1, -2, 2):
        for dx in (0, -1, 1):
            s = read(dy, dx)
            if s is None:
                continue
            ch, margin = judge(s)
            if ch is None:
                continue
            if margin > best_margin:
                best_margin, best_char = margin, ch
    return best_char


def preprocess_page(pixels: bytes, width: int, height: int) -> np.ndarray:
    """decode → Sauvola binarize → despeckle → deskew, one page."""
    img = np.frombuffer(pixels, dtype=np.uint8, count=width * height).reshape(
        height, width
    )
    ink = despeckle(sauvola(img))
    angle = estimate_skew(ink)
    # Correct only confident tilts: ≤0.5° drifts ~1.5 px across a page and
    # per-glyph shirorekha top detection absorbs it, while "correcting" a
    # straight page by a hallucinated fraction of a degree (estimator
    # noise on pathologically regular glyph patterns) smears bit cells —
    # found by the hypothesis clean-roundtrip property.
    if abs(angle) > 0.5:
        # estimate_skew's score peaks at the angle whose *application* (in
        # rotate_gray's convention) re-aligns the line bands. Deskew by
        # area-sampling the binary mask (bilinear + 0.5 threshold): crisper
        # than NN∘NN (which erodes the 3×3 bit cells) and, unlike blurring
        # the grayscale and re-thresholding, it cannot bridge the 2-px
        # inter-glyph gaps.
        fmask = rotate_gray(
            (ink * 255).astype(np.uint8), angle, fill=0.0, bilinear=True
        )
        ink = despeckle(fmask >= 128)
    return ink


# ---------------------------------------------------------------------------
# Ray Data map_batches stage functions (stateless tasks; Arrow in/out)
# ---------------------------------------------------------------------------


def binarize_deskew_batch(batch: pa.Table) -> pa.Table:
    """(media_ref, width, height, pixels) → (media_ref, width, height, ink).

    ``ink`` is the deskewed binary mask, bit-packed (8× smaller than raw
    pixels); the raw ``pixels`` column is dropped here — project early so
    downstream batches shrink (SURVEY.md §7.4).
    """
    refs = batch["media_ref"].to_pylist()
    widths = batch["width"].to_numpy()
    heights = batch["height"].to_numpy()
    pixels = batch["pixels"].to_pylist()
    packed: list[bytes] = []
    for i in range(len(refs)):
        ink = preprocess_page(pixels[i], int(widths[i]), int(heights[i]))
        packed.append(np.packbits(ink).tobytes())
    return pa.table(
        {
            "media_ref": batch["media_ref"],
            "width": batch["width"],
            "height": batch["height"],
            "ink": pa.array(packed, type=pa.binary()),
        }
    )


def unpack_ink(ink_bytes: bytes, width: int, height: int) -> np.ndarray:
    """Inverse of the bit-packing done in :func:`binarize_deskew_batch`."""
    return (
        np.unpackbits(np.frombuffer(ink_bytes, dtype=np.uint8), count=width * height)
        .reshape(height, width)
        .astype(bool)
    )
