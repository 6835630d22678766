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


def sauvola(img: np.ndarray, window: int = 31, k: float = 0.25, r: float = 128.0) -> np.ndarray:
    """Sauvola local binarization → bool ink mask (True = ink).

    t(x,y) = m(x,y) * (1 + k * (s(x,y)/R - 1)) over a ``window``-square
    neighborhood, computed with integral images (O(1) per pixel).
    k = 0.25 measured best across the degradation envelope: at k = 0.2 a
    σ0.7 blur + σ8 noise stack drops word-final glyphs (fuzz bridges
    cells), at k ≤ 0.15 the same stack collapses entirely.
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
    if int(xs.max()) - int(xs.min()) < 160:
        # narrow ink extent: a tilt displaces < ~8 px across the span, so
        # per-glyph shirorekha detection absorbs any real rotation, while
        # the estimator itself is blind there (a true 2.5° on a 4-glyph
        # page scores within noise of 0°) AND can hallucinate — a 2×2-word
        # page's bit rows genuinely concentrate under a 3° rotation
        # (ratio 1.16 vs 0°, measured). Found by the hypothesis
        # clean-roundtrip property.
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
    sf = score(fine)
    best = float(fine[int(np.argmax(sf))])
    # trust the angle only if it concentrates the row profile markedly
    # better than no rotation. Calibration (sf0.01 fixture, 365 pages +
    # 600-page clean sweep): spurious peaks on straight pages (all
    # degradation stacks) score ≤ 1.086 and sit at ≤ 0.5°; genuinely
    # rotated pages at ≥ 0.65° score ≥ 1.112 (smaller true angles score
    # ~1.0 — undetectable, and suppressing a ≤ 0.3° correction is
    # decode-neutral). 1.10 splits the two populations; 1.15 was measured
    # to swallow real ~1° rotations under contrast/blur stacks.
    if float(sf.max()) < 1.10 * float(score(np.asarray([0.0]))[0]):
        return 0.0
    return best


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


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur (float in/out), radius = ceil(3σ).

    Forward model of the reference's GaussianBlur degradation
    (render_text.py:357-358, blur_min/blur_max DEFAULT_PARAMS:41-42).
    """
    if sigma <= 0:
        return img.astype(np.float64)
    r = int(np.ceil(3 * sigma))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    out = img.astype(np.float64)
    for axis in (0, 1):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r, r)
        p = np.pad(out, pad, mode="edge")
        acc = np.zeros_like(out)
        for j, w in enumerate(k):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(j, j + out.shape[axis])
            acc += w * p[tuple(sl)]
        out = acc
    return out


def _gather_bilinear_y(img: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample each (row,col) at fractional row coordinate ``ys`` (same
    shape as img), clamped — vectorized vertical-only remap."""
    h = img.shape[0]
    y0 = np.floor(ys).astype(np.int64)
    f = ys - y0
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    cols = np.broadcast_to(np.arange(img.shape[1]), img.shape)
    return img[y0c, cols] * (1 - f) + img[y1c, cols] * f


def washboard_warp(
    img: np.ndarray,
    amplitude: float,
    wavelength: float,
    phase: float = 0.0,
    decay_from_top: bool = True,
) -> np.ndarray:
    """Vertical sine ripples running across the page — the reference's
    washboard_warp (render_text.py:311-331): per-column vertical offset
    dy(x) = A·sin(2πx/λ+φ), optionally attenuated 1→0.2 down the page."""
    h, w = img.shape
    x = np.arange(w, dtype=np.float64)
    dy = amplitude * np.sin(2 * np.pi * x / wavelength + phase)
    atten = (
        np.linspace(1.0, 0.2, h)[:, None] if decay_from_top else np.ones((h, 1))
    )
    ys = np.arange(h, dtype=np.float64)[:, None] + dy[None, :] * atten
    return _gather_bilinear_y(img.astype(np.float64), ys)


def cylinder_warp(
    img: np.ndarray, side: str = "left", strength: float = 0.2, portion: float = 0.45
) -> np.ndarray:
    """Cylindrical bend of one page edge — the reference's
    cylindrical_edge_warp (render_text.py:269-308): horizontal
    x' = R·sin(θ) compression plus 1/cos(θ) vertical scaling inside the
    edge strip. Severity calibrated (strength ≲ 0.25) so the ≤3% local
    scale change stays inside the decoder's per-glyph alignment search.
    """
    h, w = img.shape
    W = max(int(portion * w), 1)
    R = W / strength if strength != 0 else 1e9
    out = img.astype(np.float64)
    xx = np.arange(w, dtype=np.float64)
    if side == "left":
        dx = np.clip(W - xx, 0, None)
    else:
        dx = np.clip(xx - (w - W), 0, None)
    theta = dx / R
    map_x = xx + (R * np.sin(theta) - dx)
    scale_y = np.cos(theta)
    yy = np.arange(h, dtype=np.float64)[:, None]
    # vertical scaling applies to the WHOLE strip (reference gates on the
    # strip mask, render_text.py:301-303, not on theta's sign): cos is even
    # and R*sin(dx/R) is even in strength's sign, so a negative strength is
    # the SAME warp as its positive mirror — gating on theta > 0 silently
    # dropped the vertical compression for negative strengths, leaving an
    # x-only squeeze the line-top estimator is structurally blind to
    map_y = np.where(dx[None, :] > 0, (yy - h / 2) / scale_y[None, :] + h / 2, yy)
    # bilinear gather at (map_y, map_x) — x map is per-column constant
    x0 = np.floor(map_x).astype(np.int64)
    fx = map_x - x0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    left = _gather_bilinear_y(out, map_y)[:, :]  # sampled at integer x grid
    # sample columns x0 and x0+1 of the y-warped image, then blend in x
    col0 = left[:, x0c]
    col1 = left[:, x1c]
    return col0 * (1 - fx[None, :]) + col1 * fx[None, :]


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
    profile (inverts render_text.py:192-254's top-to-bottom line layout).

    Bands taller than ~1.7 glyph heights are two lines whose inter-line
    gap was bridged (residual warp smear + opposing baseline jitters can
    close the gap to ≤2 empty rows); split them at the interior projection
    minimum, recursively. A genuine single line never exceeds
    GLYPH_H + jitter (~22 px), so the split cannot fire on one.
    """
    rows = ink.sum(axis=1)
    # threshold 2: a single glyph's stem contributes exactly 2 px/row, and
    # stem rows must keep the band contiguous (threshold 4 split
    # single-glyph lines — found by the hypothesis roundtrip property)
    mask = rows >= 2
    out: list[tuple[int, int]] = []
    stack = [
        (y0, y1)
        for (y0, y1) in _runs(mask, min_gap=4, min_len=SHIRO_H)
        if ink[y0:y1].sum() >= 16
    ]
    # a genuine single line never exceeds GLYPH_H + jitter + residual
    # smear (~24 px); ≥ 27 px is two lines (they can overlap by several
    # rows under residual warp, so the threshold sits well under 2×18)
    tall = GLYPH_H + 9
    margin = SHIRO_H + 4
    while stack:
        y0, y1 = stack.pop(0)
        if y1 - y0 >= tall and y1 - y0 > 2 * margin:
            interior = rows[y0 + margin : y1 - margin]
            cut = y0 + margin + int(np.argmin(interior))
            # split at the interior valley (bridging ink stays well under
            # the shirorekha rows' mass)
            if rows[cut] <= max(4.0, 0.35 * float(rows[y0:y1].max())):
                stack.insert(0, (cut + 1, y1))
                stack.insert(0, (y0, cut))
                continue
        out.append((y0, y1))
    return [b for b in out if b[1] - b[0] >= SHIRO_H and ink[b[0] : b[1]].sum() >= 16]


def segment_glyphs(line_ink: np.ndarray) -> list[tuple[int, int]]:
    """Glyph boxes [x0, x1) within one line band from the vertical projection
    (akshara segmentation; shirorekha makes each glyph a solid column run).

    Runs wider than one glyph are FUSIONS — warp-strip resampling can
    bridge the 2-px inter-glyph gap with a single stray pixel, and the
    decoder then silently drops every glyph after the first. The layout's
    pitch is a hard constant (PITCH=12, render-side glyphs.py:26), so a
    fused run of width ~n*PITCH-2 splits deterministically into n
    pitch-spaced boxes; the decoder's ±1 px dx search absorbs the residual
    drift."""
    cols = line_ink.sum(axis=0)
    runs = _runs(cols >= 1, min_gap=2, min_len=3)
    out: list[tuple[int, int]] = []
    for x0, x1 in runs:
        w = x1 - x0
        n = max(1, round((w + (PITCH - GLYPH_W)) / PITCH))
        if n == 1 or w < GLYPH_W + 4:
            out.append((x0, x1))
            continue
        step = (w - GLYPH_W) / (n - 1)
        for k in range(n):
            s = x0 + int(round(k * step))
            out.append((s, min(s + GLYPH_W, x1)))
    return out


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
        # vectorized fast path: the aligned (dy=0, dx=0) read + parity +
        # margin≥5 accept for ALL glyphs of the line in a handful of
        # gathers — INTEGER arithmetic identical to _decode_glyph's
        # short-circuit, so results are bit-for-bit the same; only the
        # (rare) low-margin / parity-fail / out-of-range glyphs fall back
        # to the per-glyph alignment search (~25 µs of Python per glyph
        # saved on the ~95% clean-aligned majority)
        fast: list[str | None] = [None] * len(boxes)
        fast_ok = np.zeros(len(boxes), dtype=bool)
        if bh >= CELL and bw >= CELL:
            xs0 = np.fromiter((b[0] for b in boxes), np.int64, len(boxes))
            gx1 = np.minimum(xs0 + GLYPH_W, bw)
            col_d = band_ii[:, gx1] - band_ii[:, xs0]  # (bh+1, n) cum row sums
            cnt = col_d[1:] - col_d[:-1]
            tops = (cnt >= GLYPH_W // 2).argmax(axis=0)  # all-False → 0, as the scan loop
            ys = tops[None, :] + _BIT_Y[:, None]  # (8, n)
            xsc = xs0[None, :] + _BIT_X[:, None]
            valid = ((ys + CELL <= bh) & (xsc + CELL <= bw)).all(axis=0)
            yc = np.clip(ys, 0, bh - CELL)
            xc = np.clip(xsc, 0, bw - CELL)
            s = (
                band_ii[yc + CELL, xc + CELL]
                - band_ii[yc, xc + CELL]
                - band_ii[yc + CELL, xc]
                + band_ii[yc, xc]
            )
            bits = ((s > 4).astype(np.int64) << np.arange(8)[:, None]).sum(axis=0)
            margin = np.abs(2 * s - 9).min(axis=0)
            cp = bits & 0x7F
            parity_ok = (_POPCOUNT7[cp] & 1) == ((bits >> 7) & 1)
            fast_ok = valid & parity_ok & (margin >= 5)
            for i in np.nonzero(fast_ok)[0]:
                fast[i] = chr(0x0900 + int(cp[i]))
        chars: list[str] = []
        prev_end: int | None = None
        for i, (x0, x1) in enumerate(boxes):
            if prev_end is not None and (x0 - prev_end) >= (PITCH - GLYPH_W) + PITCH // 2:
                n_spaces = max(1, round((x0 - prev_end - (PITCH - GLYPH_W)) / PITCH))
                chars.append(" " * n_spaces)
            ch = fast[i] if fast_ok[i] else _decode_glyph(band, band_ii, bh, bw, x0, codebook)
            if ch is not None:
                chars.append(ch)
            prev_end = x1
        text = "".join(chars).strip()
        if text:
            line_texts.append(text)
    return " ".join(line_texts)


_CELL_AREA = float(CELL * CELL)
#: cell offsets in _decode_glyph's read() order (bit i → row i//2, col i%2)
_BIT_Y = np.repeat(np.asarray(BIT_ROWS, dtype=np.int64), 2)
_BIT_X = np.tile(np.asarray(BIT_COLS, dtype=np.int64), 4)
_POPCOUNT7 = np.asarray([bin(i).count("1") for i in range(128)], dtype=np.int64)
#: the ±2 alignment search grid, centered read FIRST (row 0 is (0, 0) —
#: the aligned short-circuit reads it before the candidate sweep)
_ALIGN_D = (0, -1, 1, -2, 2)
_ALIGN_OFFS = np.asarray(
    [(dy, dx) for dy in _ALIGN_D for dx in _ALIGN_D], dtype=np.int64
)
_BIT_SHIFTS = np.arange(8, dtype=np.int64)


def _decode_glyph(band: np.ndarray, band_ii: np.ndarray, bh: int, bw: int, x0: int, codebook) -> str | None:
    """Decode one glyph box: find its shirorekha top, sample the 8 bit
    cells (with ±1 px alignment search), majority-vote each cell.

    ``band_ii`` is the line band's integral image (computed once per line
    in :func:`decode_page`); every cell sum is 4 lookups into it. The
    aligned case short-circuits after one clean read.
    """

    # shirorekha top: first row whose ink count over the glyph width ≥ W/2
    # (argmax of the first True — identical to the scan loop incl. the
    # all-False → 0 default)
    gx1 = min(x0 + GLYPH_W, bw)
    col_d = band_ii[:, gx1] - band_ii[:, x0]
    top = int(((col_d[1:] - col_d[:-1]) >= GLYPH_W // 2).argmax())

    # collect every parity-valid parse across the ±2 alignment search —
    # candidate chars only; their read alignments are NOT trusted (a
    # parity-valid parse can sit at a warp-shifted offset while the char
    # is right), and a parse's OWN-alignment agreement can lose to a junk
    # bits-0 parse at a different offset (measured 0.850 empty-space vs
    # 0.844 true-char own-alignment, while the true char scores 0.900 at
    # its BEST alignment). dx reaches ±2: a single stray warp-resample
    # pixel can extend the projection run 2 px left of the true glyph
    # origin, and the misaligned all-cells-off read (bits 0) is
    # parity-VALID — it decodes empty space confidently unless the true
    # alignment is in the search. Vectorized: all 25 alignments × 8 cells
    # in one integral-image gather; the candidate SET is order-independent
    # (selection below sorts by score then codepoint) and the integer
    # arithmetic is identical to the old per-offset read/judge loop.
    cand_chars: set[str] = set()
    if bh >= CELL and bw >= CELL:
        ys = top + _BIT_Y[None, :] + _ALIGN_OFFS[:, :1]        # (25, 8)
        xs = x0 + _BIT_X[None, :] + _ALIGN_OFFS[:, 1:]
        inb = ((ys >= 0) & (xs >= 0)
               & (ys + CELL <= bh) & (xs + CELL <= bw)).all(axis=1)
        yc = np.clip(ys, 0, bh - CELL)  # keeps gathers legal; out-of-range
        xc = np.clip(xs, 0, bw - CELL)  # offsets are masked out via inb
        s = (band_ii[yc + CELL, xc + CELL] - band_ii[yc, xc + CELL]
             - band_ii[yc + CELL, xc] + band_ii[yc, xc])
        bits_v = ((s > 4).astype(np.int64) << _BIT_SHIFTS[None, :]).sum(axis=1)
        cp_v = bits_v & 0x7F
        parity_v = (_POPCOUNT7[cp_v] & 1) == ((bits_v >> 7) & 1)
        # aligned short-circuit (row 0 = centered read): margin ≥ 5 ⇔
        # every cell ≤2 or ≥7 of 9 ink px — unreachable from a ±1-px
        # misalignment (which reads 3 or 6), so accepting here is safe
        if inb[0] and parity_v[0]:
            if int(np.abs(2 * s[0] - 9).min()) >= 5:
                return chr(0x0900 + int(cp_v[0]))
        cand_chars = {chr(0x0900 + int(c)) for c in cp_v[inb & parity_v]}

    # template match over ALL 128 bitmaps x the full alignment search,
    # keeping each char's BEST-alignment score. The full bitmap
    # (shirorekha 2 solid rows + stem 2 solid columns + expected-EMPTY
    # gaps) separates the true char from both empty space (caps ~0.76 —
    # cannot match 44 solid head/stem px) and one-bit-flipped neighbours
    # (true char still agrees ~94% after a one-cell error). Selection:
    #   - a parity-valid candidate char wins by argmax of best-alignment
    #     score, UNCONDITIONALLY (on blur/noise-eroded pages absolute
    #     scores drop below any fixed floor while parity still decodes
    #     right — flooring candidates was measured to DROP glyphs and
    #     triple the sampler fails);
    #   - a non-candidate char (parity broken by a flipped cell) must
    #     clear 0.85 AND beat the best candidate by > 0.03;
    #   - with no candidates at all, 0.85 keeps junk boxes at None.
    bms = codebook.bitmaps
    bh_g, bw_g = bms.shape[1], bms.shape[2]
    # gather every in-range alignment window, then ONE (A, 1, H, W) vs
    # (1, 128, H, W) comparison — the per-alignment loop was ~2 ms/glyph
    # of numpy call overhead on the ~5% slow-path glyphs
    wins = []
    for dy in (0, -1, 1, -2, 2):
        y0 = top + dy
        if y0 < 0 or y0 + bh_g > bh:
            continue
        for dx in (0, -1, 1, -2, 2):
            xa = x0 + dx
            if xa < 0 or xa + bw_g > bw:
                continue
            wins.append(band[y0 : y0 + bh_g, xa : xa + bw_g])
    scores = np.zeros(128)
    if wins:
        W = np.stack(wins)                                   # (A, H, Wd)
        eq = (W[:, None] == bms[None]).reshape(len(wins), 128, -1)
        scores = eq.mean(axis=2).max(axis=0)
    j = int(np.argmax(scores))
    if not cand_chars:
        return chr(0x0900 + j) if scores[j] >= 0.85 else None
    # tie-break by codepoint: set iteration order is hash-randomized per
    # process, and equal-score ties OCCUR (two parses reading the same
    # strips) — max() over a raw set decoded differently per Ray worker
    best_c = min(cand_chars, key=lambda c: (-scores[ord(c) - 0x0900], c))
    if (chr(0x0900 + j) not in cand_chars and scores[j] >= 0.85
            and scores[j] > scores[ord(best_c) - 0x0900] + 0.03):
        return chr(0x0900 + j)
    return best_c


def estimate_column_shifts(
    ink: np.ndarray, strip: int = 8, max_shift: int = 8, y0: int = 0, y1: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Per-strip vertical displacement (rows ``y0:y1``) relative to the
    slab's mean row-projection, with parabolic subpixel refinement.

    Individually noisy (±1–2 px — the mean profile of a warped page is
    smeared, so peaks are broad); consumers must FIT a model over all
    strips (dewarp_washboard) rather than trust pointwise values.
    Returns (strip centers, shifts); +s means the strip's ink sits s rows
    below the reference profile.
    """
    sl = ink[y0:y1]
    h, w = sl.shape
    # all strip profiles at once: cumulative column sums → (n_strips, h)
    csum = np.zeros((h, w + 1), dtype=np.int32)
    np.cumsum(sl, axis=1, out=csum[:, 1:])
    edges = list(range(0, w, strip)) + [w]
    P = np.stack(
        [csum[:, min(e + strip, w)] - csum[:, e] for e in edges[:-1]]
    ).astype(np.float64)
    keep = P.sum(axis=1) >= 40
    if not keep.any():
        return np.asarray([]), np.asarray([])
    P = P[keep]
    centers = (np.asarray(edges[:-1], dtype=np.float64) + strip / 2.0)[keep]
    ref = P.sum(axis=0)
    # shifted copies of the reference → ONE matmul scores every
    # (strip, shift) pair (the per-dot Python overhead of the naive loop
    # was ~4 ms/page — measured on every page of the extract pipeline)
    n_s = 2 * max_shift + 1
    S = np.zeros((n_s, h))
    for j, s in enumerate(range(-max_shift, max_shift + 1)):
        # strip displaced DOWN by s ⇔ p[y] ≈ ref[y - s]
        if s >= 0:
            S[j, s:] = ref[: h - s]
        else:
            S[j, : h + s] = ref[-s:]
    scores = P @ S.T  # (n_strips, n_shifts)
    ks = np.argmax(scores, axis=1)
    shifts = (ks - max_shift).astype(np.float64)
    inner = (ks > 0) & (ks < n_s - 1)
    idx = np.nonzero(inner)[0]
    sm = scores[idx, ks[idx] - 1]
    s0 = scores[idx, ks[idx]]
    sp = scores[idx, ks[idx] + 1]
    denom = sm - 2 * s0 + sp
    ok = denom < 0
    shifts[idx[ok]] += 0.5 * (sm[ok] - sp[ok]) / denom[ok]
    return centers, shifts


#: candidate washboard wavelengths (px) — brackets the calibrated synth
#: envelope (λ ∈ [120, 250]) with margin
_WASH_LAMBDAS = np.arange(90.0, 300.0, 10.0)


def _fit_sine(centers: np.ndarray, shifts: np.ndarray, lam: float) -> tuple[np.ndarray, float]:
    """LSQ fit shifts ≈ a·sin + b·cos + c + d·x. Returns (coef, SSE)."""
    X = np.column_stack(
        [
            np.sin(2 * np.pi * centers / lam),
            np.cos(2 * np.pi * centers / lam),
            np.ones_like(centers),
            centers,
        ]
    )
    coef, *_ = np.linalg.lstsq(X, shifts, rcond=None)
    sse = float(((X @ coef - shifts) ** 2).sum())
    return coef, sse


def _fit_sine_grid(
    centers: np.ndarray, shifts: np.ndarray, lams: np.ndarray
) -> tuple[float, np.ndarray, float]:
    """Fit every candidate λ at once via batched 4×4 normal equations
    (one ``np.linalg.solve`` over (L,4,4) instead of L serial SVD lstsq
    calls — measured ~2 ms/page saved on every non-gated page). Returns
    (best λ, its coef, its SSE)."""
    L, n = lams.size, centers.size
    ang = 2.0 * np.pi * centers[None, :] / lams[:, None]
    X = np.empty((L, n, 4))
    np.sin(ang, out=X[:, :, 0])
    np.cos(ang, out=X[:, :, 1])
    X[:, :, 2] = 1.0
    X[:, :, 3] = centers[None, :]
    XtX = np.einsum("lnc,lnd->lcd", X, X)
    Xty = np.einsum("lnc,n->lc", X, shifts)
    try:
        coef = np.linalg.solve(XtX, Xty)
    except np.linalg.LinAlgError:  # degenerate grid point → robust path
        best = (None, None, np.inf)
        for lam in lams:
            c, sse = _fit_sine(centers, shifts, float(lam))
            if sse < best[2]:
                best = (float(lam), c, sse)
        return best
    resid = np.einsum("lnc,lc->ln", X, coef) - shifts[None, :]
    sse = (resid * resid).sum(axis=1)
    j = int(np.argmin(sse))
    return float(lams[j]), coef[j], float(sse[j])


def dewarp_washboard(ink: np.ndarray, *, min_amp: float = 1.5) -> np.ndarray:
    """Undo a washboard warp (render_text.py:311-331) by PARAMETRIC fit.

    The warp family is dy(x,y) = A·sin(2πx/λ+φ)·atten(y) with atten linear
    in y — so instead of trusting noisy per-strip shifts pointwise (their
    errors random-walk under chaining and false-trigger on clean pages
    with per-word jitter), fit the model: grid-search λ, least-squares
    (sin, cos) amplitudes per page HALF (top/bottom slabs capture the
    linear attenuation exactly), plus offset+linear terms that absorb
    rotation/drift so a purely rotated page fits with A ≈ 0.

    Triggers only when the fitted amplitude ≥ ``min_amp`` AND the sine
    explains the residual variance markedly better than offset+linear
    alone — clean, rotated and cylinder pages fall below both gates.
    Iterative refinement: correlation against the (smeared) mean profile
    biases each amplitude estimate ~20% low, so the fitted field is
    ACCUMULATED over up to 4 rounds — but every round resamples the
    ORIGINAL mask through the total field exactly once (repeated
    mask-of-mask resampling erodes the 3×3 bit cells).
    """
    h, w = ink.shape
    ink0 = ink
    yy = np.arange(h, dtype=np.float64)[:, None]
    total: np.ndarray | None = None
    for it in range(4):
        centers, shifts = estimate_column_shifts(ink)
        if centers.size < 12:
            break
        # cheap pre-gate on a ROBUST, DETRENDED statistic: this runs
        # pre-deskew, so rotation alone adds a linear-in-x shift trend
        # (tan 3° ≈ 17 px across a page) that the model's offset+linear
        # terms absorb anyway — subtract the LSQ line first, then test
        # p75(|residual|). Single-strip noise outliers hit 1-2 px on
        # clean pages (hence a percentile, not max); a washboard at the
        # synth's A ≥ 2.5 displaces a large fraction of strips (measured
        # p75 ≥ 0.92 on every washboard fixture page vs median 0.28 /
        # p90 0.49 elsewhere), so p75 < 0.6 skips the 23-λ lstsq grid
        # (~6 ms/page) for the unwarped majority; pages above the gate
        # take the unchanged fit+model-selection path
        if it == 0:
            slope, icpt = np.polyfit(centers, shifts, 1)
            resid = shifts - (icpt + slope * centers)
            if float(np.percentile(np.abs(resid), 75)) < 0.6:
                return ink0
        # model selection on the full-page field; the λ grid runs only in
        # round 0 — the warp's wavelength is a property of the page, so
        # refinement rounds refit amplitudes at the SAME λ (halves the
        # fit cost of warped pages; round-0 selection is unchanged)
        if it == 0:
            _, sse_lin = _fit_sine(centers, shifts, 1e9)  # sin/cos ~ degenerate
            best_lam, best_coef, best_sse = _fit_sine_grid(
                centers, shifts, _WASH_LAMBDAS
            )
        else:
            best_coef, best_sse = _fit_sine(centers, shifts, best_lam)
        amp = float(np.hypot(best_coef[0], best_coef[1]))
        if it == 0 and (amp < min_amp or best_sse > 0.6 * sse_lin):
            return ink0
        if it > 0 and amp < 0.35:
            break
        # per-half amplitudes at the chosen λ → linear-in-y attenuation
        halves = []
        for (ya, yb) in ((0, h // 2), (h // 2, h)):
            c_h, s_h = estimate_column_shifts(ink, y0=ya, y1=yb)
            if c_h.size < 8:
                halves.append(best_coef[:2])
                continue
            coef_h, _ = _fit_sine(c_h, s_h, best_lam)
            halves.append(coef_h[:2])
        xs = np.arange(w, dtype=np.float64)
        sin_x = np.sin(2 * np.pi * xs / best_lam)
        cos_x = np.cos(2 * np.pi * xs / best_lam)
        s_top = halves[0][0] * sin_x + halves[0][1] * cos_x
        s_bot = halves[1][0] * sin_x + halves[1][1] * cos_x
        y_t, y_b = h / 4.0, 3.0 * h / 4.0
        wy = (yy - y_t) / (y_b - y_t)
        field = s_top[None, :] + wy * (s_bot - s_top)[None, :]
        total = field if total is None else total + field
        # one resample hop from the ORIGINAL mask through the total field
        fmask = _gather_bilinear_y((ink0 * 255.0), yy + total)
        ink = despeckle(fmask >= 128)
    return ink


def __getattr__(name: str):
    # preprocess_page / binarize_deskew_batch moved to stages.geometry
    # (which imports this module's primitives one-way). This PEP-562
    # re-export keeps old import paths working — it resolves at DRIVER
    # import time, so by-value worker serialization never needs it.
    if name in ("preprocess_page", "binarize_deskew_batch"):
        from . import geometry

        return getattr(geometry, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def unpack_ink(ink_bytes: bytes, width: int, height: int) -> np.ndarray:
    """Inverse of the bit-packing done in :func:`binarize_deskew_batch`."""
    return (
        np.unpackbits(np.frombuffer(ink_bytes, dtype=np.uint8), count=width * height)
        .reshape(height, width)
        .astype(bool)
    )
