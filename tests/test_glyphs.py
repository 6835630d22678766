"""Glyph codebook: exact invertibility, layout, degraded roundtrip."""

import numpy as np
import pytest

from sanskrit_ocr_ray.glyphs import (
    DEVANAGARI_LO,
    GlyphCodebook,
    bits_to_char,
    char_bits,
    layout_words,
    render_page,
)
from sanskrit_ocr_ray.stages.image import decode_page, preprocess_page
from sanskrit_ocr_ray.synth import synth_doc
from sanskrit_ocr_ray.util import doc_rng


def test_char_bits_roundtrip_all_128():
    for i in range(128):
        ch = chr(DEVANAGARI_LO + i)
        assert bits_to_char(char_bits(ch)) == ch


def test_parity_detects_single_bit_flip():
    bits = char_bits("क")
    for i in range(8):
        assert bits_to_char(bits ^ (1 << i)) is None


def test_char_bits_rejects_out_of_block():
    with pytest.raises(ValueError):
        char_bits("a")


def test_layout_words_greedy_wrap():
    lines = layout_words(["कख", "गघ", "ङच"], page_w=25 * 2 + 12 * 5)
    # capacity 5 glyphs: "कख गघ" costs 5 → first line; "ङच" wraps
    assert [len(line) for line in lines] == [2, 1]


def test_render_decode_clean_page():
    rng = doc_rng(7, "clean")
    text = "कखग घङच । टठड ।।"
    page, rendered = render_page(text, 400, 320, rng)
    assert rendered == text
    ink = preprocess_page(page.tobytes(), 400, 320)
    assert decode_page(ink, GlyphCodebook()) == text


def test_degraded_roundtrip_exact_over_corpus():
    """Every synthesized degraded page decodes exactly (the core contract)."""
    cb = GlyphCodebook()
    n_pages = 0
    for i in range(25):
        d = synth_doc(f"doc-{i:08d}")
        for m in d["media"]:
            ink = preprocess_page(m["pixels"], m["width"], m["height"])
            assert decode_page(ink, cb) == m["truth_text"], (
                m["media_ref"],
                m["degradations"],
            )
            n_pages += 1
    assert n_pages > 20
