#!/usr/bin/env python
"""Degradation-envelope calibration at the REFERENCE's full severity.

Measures exact-decode rate per degradation class at the reference's actual
parameter ranges (render_text.py DEFAULT_PARAMS:38-44, :386-409), plus the
full reference sampler (1-3 transforms composed in selection order) via
synth._degrade itself — that last rate IS the _degrade_verified
photometric-fallback frequency the fixture generator will exhibit.

Usage: python tools/calibrate_degradations.py [n_per_class] [n_sampler]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sanskrit_ocr_ray.glyphs import GlyphCodebook, render_page
from sanskrit_ocr_ray.stages.image import (
    cylinder_warp,
    decode_page,
    gaussian_blur,
    preprocess_page,
    rotate_gray,
    washboard_warp,
)
from sanskrit_ocr_ray.stages.normalize import normalize_devanagari
from sanskrit_ocr_ray.synth import PAGE_H, PAGE_W, _degrade, _gen_passage

cb = GlyphCodebook()
N_CLASS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
N_SAMPLER = int(sys.argv[2]) if len(sys.argv) > 2 else 150


def run(name, fn, n=N_CLASS, seed0=0):
    ok = 0
    fails = []
    for i in range(n):
        rng = np.random.default_rng(1000 + seed0 * 1000 + i)
        text = _gen_passage(rng, int(rng.integers(15, 40)))
        page, rendered = render_page(text, PAGE_W, PAGE_H, rng)
        img = fn(page.astype(np.float64), rng)
        img = np.clip(img, 0, 255).astype(np.uint8)
        ink = preprocess_page(img.tobytes(), PAGE_W, PAGE_H)
        got = decode_page(ink, cb)
        want = normalize_devanagari(np.array([rendered], dtype=object))[0]
        gotn = normalize_devanagari(np.array([got], dtype=object))[0]
        if gotn == want:
            ok += 1
        else:
            fails.append(i)
    tail = f"  fails={fails[:6]}" if fails else ""
    print(f"{name:30s} {ok}/{n}{tail}", flush=True)
    return ok, n


U = lambda rng, a, b: float(rng.uniform(a, b))

ident = lambda img, rng: img
total_ok, total_n = 0, 0
for name, fn, s in [
    ("clean", ident, 0),
    ("rotate +-5", lambda img, rng: rotate_gray(
        img.astype(np.uint8), U(rng, -5, 5)).astype(float), 1),
    ("blur r0.5-1.0", lambda img, rng: gaussian_blur(img, U(rng, 0.5, 1.0)), 2),
    ("noise s2.55-12.75", lambda img, rng: img + rng.normal(
        0, U(rng, 2.55, 12.75), img.shape), 3),
    ("bright/contrast 0.8-1.2", lambda img, rng: (
        img * U(rng, 0.8, 1.2) - 128.0) * U(rng, 0.8, 1.2) + 128.0, 4),
    ("wash A6-12 l90-150 nodecay", lambda img, rng: washboard_warp(
        img, U(rng, 6, 12), U(rng, 90, 150), U(rng, 0, 6.28), False), 5),
    ("wash A6-12 l90-150 decay", lambda img, rng: washboard_warp(
        img, U(rng, 6, 12), U(rng, 90, 150), U(rng, 0, 6.28), True), 6),
    ("cyl +0.4-0.8", lambda img, rng: cylinder_warp(
        img, "left" if rng.random() < 0.5 else "right",
        U(rng, 0.4, 0.8), U(rng, 0.35, 0.5)), 7),
    ("cyl -0.4-0.8", lambda img, rng: cylinder_warp(
        img, "left" if rng.random() < 0.5 else "right",
        -U(rng, 0.4, 0.8), U(rng, 0.35, 0.5)), 8),
]:
    ok, n = run(name, fn, seed0=s)
    total_ok += ok
    total_n += n
print(f"{'single-class total':30s} {total_ok}/{total_n} "
      f"({100.0 * total_ok / total_n:.1f}%)")

# full reference sampler == the fixture's _degrade: this failure rate is
# exactly the _degrade_verified photometric-fallback rate
ok = 0
napplied = 0
fail_stacks = []
for i in range(N_SAMPLER):
    rng = np.random.default_rng(777000 + i)
    text = _gen_passage(rng, int(rng.integers(15, 40)))
    page, rendered = render_page(text, PAGE_W, PAGE_H, rng)
    degraded, applied = _degrade(page, rng)
    ink = preprocess_page(degraded.tobytes(), PAGE_W, PAGE_H)
    got = decode_page(ink, cb)
    want = normalize_devanagari(np.array([rendered], dtype=object))[0]
    gotn = normalize_devanagari(np.array([got], dtype=object))[0]
    napplied += 1
    if gotn == want:
        ok += 1
    else:
        fail_stacks.append("+".join(applied))
print(f"{'reference sampler (1-3 mixed)':30s} {ok}/{napplied} "
      f"-> fallback rate {100.0 * (napplied - ok) / napplied:.1f}%")
if fail_stacks:
    from collections import Counter
    print("  failing stacks:", dict(Counter(fail_stacks)))
