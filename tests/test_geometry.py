"""Parametric geometry recovery at the reference's FULL severity envelope.

Each case renders a page, applies a reference-severity geometric
degradation (render_text.py parameter ranges: washboard A 6-12 /
lambda 90-150, cylinder strength 0.4-0.8, rotation up to +-5 deg,
including 2-transform compositions in the reference's application
order), runs the full preprocess path and requires EXACT text recovery
— the same contract the fixture generator verifies per page.
"""

import numpy as np
import pytest

from sanskrit_ocr_ray.glyphs import GlyphCodebook, render_page
from sanskrit_ocr_ray.stages.geometry import (
    _clean_page_gate,
    estimate_components,
)
from sanskrit_ocr_ray.stages.image import (
    cylinder_warp,
    decode_page,
    despeckle,
    preprocess_page,
    rotate_gray,
    sauvola,
    washboard_warp,
)
from sanskrit_ocr_ray.stages.normalize import normalize_devanagari
from sanskrit_ocr_ray.synth import PAGE_H, PAGE_W, _gen_passage

CB = GlyphCodebook()


def _page(seed):
    rng = np.random.default_rng(seed)
    text = _gen_passage(rng, int(rng.integers(18, 35)))
    page, rendered = render_page(text, PAGE_W, PAGE_H, rng)
    want = normalize_devanagari(np.array([rendered], dtype=object))[0]
    return page, want, rng


def _recovers(img, want):
    img = np.clip(img, 0, 255).astype(np.uint8)
    ink = preprocess_page(img.tobytes(), PAGE_W, PAGE_H)
    got = normalize_devanagari(
        np.array([decode_page(ink, CB)], dtype=object)
    )[0]
    return got == want


@pytest.mark.parametrize("seed,amp,lam,phase,decay", [
    (101, 11.0, 95.0, 1.1, False),
    (102, 8.0, 140.0, 4.0, True),
    (103, 6.5, 110.0, 2.6, True),
])
def test_washboard_reference_severity(seed, amp, lam, phase, decay):
    page, want, _ = _page(seed)
    img = washboard_warp(page.astype(np.float64), amp, lam, phase, decay)
    assert _recovers(img, want)


@pytest.mark.parametrize("seed,side,strength,portion", [
    (111, "left", 0.7, 0.45),
    (112, "right", 0.45, 0.38),
    (113, "left", -0.6, 0.5),   # negative bulge: x-compression only
])
def test_cylinder_reference_severity(seed, side, strength, portion):
    page, want, _ = _page(seed)
    img = cylinder_warp(page.astype(np.float64), side, strength, portion)
    assert _recovers(img, want)


@pytest.mark.parametrize("seed,deg", [(121, 4.5), (122, -3.8)])
def test_rotation_full_range(seed, deg):
    page, want, _ = _page(seed)
    img = rotate_gray(page, deg)
    assert _recovers(img, want)


def _lev(a, b):
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb_ in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[-1] + 1, prev[i - 1] + (ca != cb_)))
        prev = cur
    return prev[-1]


def test_rotation_then_washboard_composition(seed=139):
    # the reference composes transforms in selection order
    # (_apply_postprocessing, render_text.py:403-409). Compositions sit at
    # ~90% page-exact; this pins NEAR-exact recovery (<=2 glyph tail of
    # ~500 chars) so a estimator regression cannot hide, while the
    # fixture's verify-and-redraw guarantees page exactness separately.
    page, want, _ = _page(seed)
    img = rotate_gray(page, 3.6).astype(np.float64)
    img = np.clip(washboard_warp(img, 7.5, 120.0, 0.8, False), 0, 255).astype(np.uint8)
    from sanskrit_ocr_ray.stages.image import preprocess_page
    ink = preprocess_page(img.tobytes(), PAGE_W, PAGE_H)
    got = normalize_devanagari(np.array([decode_page(ink, CB)], dtype=object))[0]
    assert _lev(got, want) <= 2


def test_noise_then_rotation_uses_slope_fallback(seed=141):
    # heavy noise defeats estimate_skew's concentration gate; the
    # trajectory-slope prior + refine_skew fallback must catch it
    page, want, rng = _page(seed)
    img = page.astype(np.float64) + rng.normal(0.0, 9.0, page.shape)
    img = rotate_gray(np.clip(img, 0, 255).astype(np.uint8), -4.1)
    assert _recovers(img, want)


def test_clean_page_gate_skips_clean_triggers_warped():
    page, _, _ = _page(152)
    ink = despeckle(sauvola(page))
    assert _clean_page_gate(ink)[0]
    warped = np.clip(
        washboard_warp(page.astype(np.float64), 9.0, 100.0, 0.5, False), 0, 255
    ).astype(np.uint8)
    assert not _clean_page_gate(despeckle(sauvola(warped)))[0]


def test_estimator_amplitude_unbiased(seed=161):
    # fixed-effects absorption must not attenuate the fitted amplitude
    page, _, _ = _page(seed)
    img = np.clip(
        washboard_warp(page.astype(np.float64), 10.0, 125.0, 2.0, False), 0, 255
    ).astype(np.uint8)
    est = estimate_components(despeckle(sauvola(img)))
    assert est is not None
    assert abs(est["amp"] - 10.0) < 1.5
    assert abs(est["lam"] - 125.0) < 15.0
