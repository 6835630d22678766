"""Property-based tests (SURVEY.md §5.6): hypothesis over the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sanskrit_ocr_ray.glyphs import (
    DEVANAGARI_LO,
    GlyphCodebook,
    render_page,
)
from sanskrit_ocr_ray.stages.image import decode_page, preprocess_page
from sanskrit_ocr_ray.stages.normalize import normalize_devanagari

_CB = GlyphCodebook()

any_text = st.text(max_size=200)
devanagari_word = st.text(
    alphabet=st.characters(min_codepoint=0x0905, max_codepoint=0x0939),
    min_size=1,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_normalize_idempotent(s):
    once = normalize_devanagari(np.array([s], dtype=object))[0]
    twice = normalize_devanagari(np.array([once], dtype=object))[0]
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_normalize_output_in_keep_class(s):
    out = normalize_devanagari(np.array([s], dtype=object))[0]
    for ch in out:
        assert ch == " " or 0x0900 <= ord(ch) <= 0x097F
    assert out == out.strip()


@settings(max_examples=30, deadline=None)
@given(st.lists(devanagari_word, min_size=1, max_size=20), st.integers(0, 2**31 - 1))
def test_clean_render_decode_roundtrip(words, seed):
    """Any in-block text that fits a page survives render→decode exactly
    (no degradations — the invertibility property of the glyph code)."""
    text = " ".join(words)
    rng = np.random.default_rng(seed)
    page, rendered = render_page(text, 400, 320, rng)
    ink = preprocess_page(page.tobytes(), 400, 320)
    assert decode_page(ink, _CB) == rendered


@settings(max_examples=100, deadline=None)
@given(any_text)
def test_span_count_preserved_by_normalizer(s):
    """Normalizer is 1-in-1-out (row filtering is a separate, explicit
    step) — count preservation for text spans."""
    arr = np.array([s, s, s], dtype=object)
    assert len(normalize_devanagari(arr)) == 3
