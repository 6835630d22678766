#!/usr/bin/env python
"""Degradation-envelope calibration: exact-decode rate per class at (and
beyond) the synth severities. The fixture generator additionally verifies
per page (synth._degrade_verified), so these rates bound the geometric
fallback frequency, not fixture correctness."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sanskrit_ocr_ray.glyphs import render_page, GlyphCodebook
from sanskrit_ocr_ray.stages.image import (
    preprocess_page, decode_page, gaussian_blur, washboard_warp, cylinder_warp, rotate_gray)
from sanskrit_ocr_ray.synth import _gen_passage, PAGE_W, PAGE_H
from sanskrit_ocr_ray.stages.normalize import normalize_devanagari

cb = GlyphCodebook()

def run(name, fn, n=30, seed0=0):
    ok = 0; fails = []
    for i in range(n):
        rng = np.random.default_rng(1000 + seed0*1000 + i)
        text = _gen_passage(rng, int(rng.integers(15, 40)))
        page, rendered = render_page(text, PAGE_W, PAGE_H, rng)
        img = fn(page.astype(np.float64), rng)
        img = np.clip(img, 0, 255).astype(np.uint8)
        ink = preprocess_page(img.tobytes(), PAGE_W, PAGE_H)
        got = decode_page(ink, cb)
        want = normalize_devanagari(np.array([rendered], dtype=object))[0]
        gotn = normalize_devanagari(np.array([got], dtype=object))[0]
        if gotn == want: ok += 1
        else: fails.append(i)
    print(f"{name:28s} {ok}/{n}" + (f"  fails={fails[:6]}" for _ in [0]).__next__() if fails else f"{name:28s} {ok}/{n}")
    return ok, n

ident = lambda img, rng: img
run("clean", ident)
run("rotate+-3", lambda img, rng: rotate_gray(img.astype(np.uint8), float(rng.uniform(-3,3))).astype(float), seed0=1)
run("blur0.7", lambda img, rng: gaussian_blur(img, 0.7), seed0=2)
run("blur1.0", lambda img, rng: gaussian_blur(img, 1.0), seed0=3)
run("noise10", lambda img, rng: img + rng.normal(0,10,img.shape), seed0=4)
run("wash A4 l120 nodecay", lambda img, rng: washboard_warp(img, 4.0, 120.0, float(rng.uniform(0,6.28)), False), seed0=5)
run("wash A4 l120 decay", lambda img, rng: washboard_warp(img, 4.0, 120.0, float(rng.uniform(0,6.28)), True), seed0=6)
run("wash A6 l200 nodecay", lambda img, rng: washboard_warp(img, 6.0, 200.0, float(rng.uniform(0,6.28)), False), seed0=7)
run("cyl 0.13", lambda img, rng: cylinder_warp(img, 'left' if rng.random()<.5 else 'right', 0.13, 0.45), seed0=8)
run("cyl 0.22", lambda img, rng: cylinder_warp(img, 'left' if rng.random()<.5 else 'right', 0.22, 0.45), seed0=9)
run("blur0.7+noise8", lambda img, rng: gaussian_blur(img,0.7)+rng.normal(0,8,img.shape), seed0=10)
run("bright0.85+contrast1.2", lambda img, rng: (img*0.85-128)*1.2+128, seed0=11)
