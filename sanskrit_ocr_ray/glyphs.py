"""Deterministic synthetic glyph code for fixture pages.

Each Devanagari codepoint (U+0900–U+097F, 128 symbols) maps to a unique
fixed-size bitmap: a solid *shirorekha* (head-line) bar across the top —
mirroring real Devanagari typography and giving deskew/line-segmentation a
strong horizontal signal — and a 2×4 grid of 3×3 "bit cells" below it that
encode the 7-bit codepoint index plus one even-parity bit. The code is
exactly invertible, so the recognizer can achieve exact recovery and the
pipeline's correctness contract is span-sequence *equality*, not accuracy
(SURVEY.md §5; FIXTURES.md §2).

PIL/OTF rasterization (reference: datagen/augmentations/render_text.py:155,
fonts/Sharad76-Regular.otf) is unavailable in this sandbox; this codebook is
the sandbox-safe stand-in with the same geometric structure the reference
renders: lines of glyphs with a head-line, laid out by greedy width-based
wrap (render_text.py:160-196 semantics).
"""

from __future__ import annotations

import numpy as np

# --- glyph cell geometry (pixels) ------------------------------------------
GLYPH_W = 10          # ink width of one glyph
GLYPH_H = 18          # shirorekha (2) + 4 bit rows of 3 with 1-px gaps
PITCH = 12            # horizontal advance per glyph (GLYPH_W + 2 gap)
LINE_H = 26           # vertical advance per text line (GLYPH_H + 8 gap)
MARGIN = 25           # page margin, mirroring render_text.py:160's margin=25
SHIRO_H = 2           # head-line thickness
STEM_W = 2            # full-height vertical stem at x 0..1 (keeps every glyph
                      # vertically contiguous so line bands never split)
BIT_ROWS = (3, 7, 11, 15)   # y offsets of the 4 bit rows (3 px tall each)
BIT_COLS = (3, 7)           # x offsets of the 2 bit columns (3 px wide each)
CELL = 3                    # bit cell edge length

DEVANAGARI_LO = 0x0900
DEVANAGARI_HI = 0x097F      # inclusive


def char_bits(ch: str) -> int:
    """7-bit code + even parity in bit 7. Raises for chars outside the block."""
    cp = ord(ch) - DEVANAGARI_LO
    if not 0 <= cp <= 0x7F:
        raise ValueError(f"char {ch!r} outside Devanagari block")
    parity = bin(cp).count("1") & 1
    return cp | (parity << 7)


def bits_to_char(bits: int) -> str | None:
    """Inverse of :func:`char_bits`; ``None`` when the parity check fails."""
    cp = bits & 0x7F
    parity = (bits >> 7) & 1
    if bin(cp).count("1") & 1 != parity:
        return None
    return chr(DEVANAGARI_LO + cp)


def glyph_bitmap(ch: str) -> np.ndarray:
    """(GLYPH_H, GLYPH_W) bool ink mask for one character."""
    bits = char_bits(ch)
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    g[:SHIRO_H, :] = True
    g[:, :STEM_W] = True
    for i in range(8):
        if (bits >> i) & 1:
            y = BIT_ROWS[i // 2]
            x = BIT_COLS[i % 2]
            g[y : y + CELL, x : x + CELL] = True
    return g


class GlyphCodebook:
    """All 128 glyph bitmaps, precomputed once (the recognizer's "weights").

    Loaded in the recognizer actor's ``__init__`` — the T1 archetype
    (vLLM weights loaded once, reference translate_bookcorpus.py:119-128),
    and the fix for T4's font-loaded-per-page anti-pattern
    (render_text.py:155).
    """

    def __init__(self) -> None:
        self.bitmaps = np.stack(
            [glyph_bitmap(chr(DEVANAGARI_LO + i)) for i in range(128)]
        )  # (128, GLYPH_H, GLYPH_W)

    def decode_cell_means(self, means: np.ndarray) -> str | None:
        """Decode one glyph from its 8 bit-cell ink means (row-major bit order)."""
        bits = 0
        for i, m in enumerate(means):
            if m > 0.5:
                bits |= 1 << i
        return bits_to_char(bits)


def layout_words(words: list[str], page_w: int) -> list[list[str]]:
    """Greedy width-based line wrap (render_text.py:160-196 semantics).

    A word costs ``len(word)`` glyph advances plus one space advance when it
    is not first on the line. Words longer than a full line are hard-split.
    """
    max_glyphs = max(1, (page_w - 2 * MARGIN + (PITCH - GLYPH_W)) // PITCH)
    lines: list[list[str]] = []
    cur: list[str] = []
    used = 0
    for w in words:
        if len(w) > max_glyphs:  # hard-split oversized words
            for i in range(0, len(w), max_glyphs):
                piece = w[i : i + max_glyphs]
                if cur:
                    lines.append(cur)
                cur, used = [piece], len(piece)
            continue
        cost = len(w) + (1 if cur else 0)
        if used + cost > max_glyphs and cur:
            lines.append(cur)
            cur, used = [w], len(w)
        else:
            cur.append(w)
            used += cost
    if cur:
        lines.append(cur)
    return lines


#: background styles, mirroring render_text.py:47-148's four classes
BACKGROUND_STYLES = ("plain", "lined_paper", "old_paper", "parchment")


def make_background(
    width: int, height: int, style: str, rng: np.random.Generator
) -> np.ndarray:
    """Textured grayscale page background (render_text.py:47-148 classes,
    vectorized; severities calibrated so window-local binarization rejects
    texture/rule-lines/stains while keeping them visually real).

    Returns float64 (the caller draws ink then casts once).
    """
    page = 215.0 + rng.normal(0.0, 6.0, size=(height, width))
    if style == "lined_paper":
        # light ruled lines (render_text.py:66-70): 1-2 px, 8-16 levels
        # below paper — far above any Sauvola threshold in text windows
        spacing = int(rng.integers(15, 26))
        for y in range(0, height, spacing):
            lw = int(rng.integers(1, 3))
            page[y : y + lw, :] -= float(rng.integers(8, 17))
    elif style == "old_paper":
        # darkened edges (render_text.py:100-105)
        edge = width // 10
        for i in range(edge):
            f = (edge - i) / edge * 12.0
            page[i, :] -= f
            page[height - i - 1, :] -= f
            page[:, i] -= f
            page[:, width - i - 1] -= f
    elif style == "parchment":
        # soft blotches (render_text.py:126-141), vectorized per blotch
        yy, xx = np.mgrid[0:height, 0:width]
        for _ in range(int(rng.integers(6, 12))):
            cx = int(rng.integers(0, width))
            cy = int(rng.integers(0, height))
            r = int(rng.integers(8, 20))
            amp = float(rng.integers(-6, 7))
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            page += np.where(d2 <= r * r, amp, 0.0)
    # radial stains (render_text.py:74-88), any style, calibrated depth
    if rng.random() < 0.5:
        yy, xx = np.mgrid[0:height, 0:width]
        for _ in range(int(rng.integers(1, 4))):
            cx = int(rng.integers(0, width))
            cy = int(rng.integers(0, height))
            r = int(rng.integers(15, 40))
            depth = float(rng.integers(6, 14))
            d2 = ((yy - cy) ** 2 + (xx - cx) ** 2) / float(r * r)
            page -= depth * np.clip(1.0 - d2, 0.0, None)
    return np.clip(page, 150, 255)


def render_page(
    text: str,
    width: int,
    height: int,
    rng: np.random.Generator,
    background: np.ndarray | None = None,
) -> tuple[np.ndarray, str]:
    """Render ``text`` onto a textured page; returns (grayscale uint8, rendered_text).

    ``rendered_text`` is the portion of ``text`` that actually fit on the
    page (whole words, joined by single spaces) — the golden table records
    this, exactly how the reference pairs each image with the text it drew
    (generate_dataset.py:41-42).

    Word-level jitter mirrors render_text.py's defaults: per-word ±1 px
    position offset (:208-209), per-word ink-level jitter (:211-216),
    per-line baseline offset (:198-199) and line-spacing jitter
    (:253-254). Per-word rotation stays off — the reference's
    ``word_angle`` default is 0.0 (DEFAULT_PARAMS:36).
    """
    if background is not None:
        # externally supplied page background (S9 dir store,
        # sources/backgrounds.py); the default synthetic path is untouched
        page = background.copy()
    else:
        style = BACKGROUND_STYLES[int(rng.integers(0, len(BACKGROUND_STYLES)))]
        page = make_background(width, height, style, rng)

    words = [w for w in text.split(" ") if w]
    lines = layout_words(words, width)
    max_lines = max(0, (height - 2 * MARGIN) // LINE_H)
    lines = lines[:max_lines]

    rendered: list[str] = []
    y0 = MARGIN
    for li, line_words in enumerate(lines):
        baseline = int(rng.integers(-1, 2))  # per-line baseline offset
        x = MARGIN
        for wi, word in enumerate(line_words):
            ink = float(rng.integers(30, 70))  # per-word ink jitter
            wdy = int(rng.integers(-1, 2))  # per-word position jitter
            wy = y0 + baseline + wdy
            for ch in word:
                g = glyph_bitmap(ch)
                page[wy : wy + GLYPH_H, x : x + GLYPH_W][g] = ink
                x += PITCH
            x += PITCH  # space advance
        rendered.append(" ".join(line_words))
        # line-spacing jitter is non-negative so the worst-case inter-line
        # ink gap stays ≥ 4 px (= segment_lines' run-merge threshold) even
        # when adjacent lines' baseline+word offsets oppose each other
        y0 += LINE_H + int(rng.integers(0, 2))
    return np.clip(page, 0, 255).astype(np.uint8), " ".join(rendered)
