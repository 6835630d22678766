"""Parametric page-geometry recovery at the reference's full severity.

Inverts the reference's geometric degradations (render_text.py:269-331,
360-361) at their ACTUAL parameter ranges — rotation up to +-5 deg
(DEFAULT_PARAMS:38), washboard sine warp amplitude 6-12 px / wavelength
90-150 px with optional top-down decay (render_text.py:386-393), and
cylindrical edge warp strength 0.4-0.8 over 0.35-0.5 of the page width
(render_text.py:396-401) — including 2-3 transforms composed in random
order (_apply_postprocessing samples without replacement and applies in
selection order, render_text.py:403-409).

Method
------
Every one of those warps displaces a page row AFFINELY in y per column:
an ink row at true height y_i is observed, in column x, at

    c = y_i + field(x, y_i)        where field is affine in y_i

with the component families

    washboard: (a sin kx + b cos kx) * atten(y),  atten linear in y
    cylinder:  (y - h/2) * (cos theta(x) - 1),    theta = dx/R edge strip
    rotation:  tan(phi) * x                        (y-part; x-shear too)

The estimator tracks text-line TOPS (the shirorekha edge) across thin
column strips into trajectories, then fits the families by least squares
with per-trajectory fixed effects ABSORBED EXACTLY via within-trajectory
centering: each fragment's unknown anchor y_i drops out, so a smooth
field cannot leak into the anchors and the fitted amplitude is unbiased
(the round-2 nonparametric per-strip estimator lost ~50% of the field per
round exactly that way). Components are peeled one per round — the
dominant one first — by composing their analytic inverse gather maps into
ONE total map, so the output is a single resample of the original page.

Two empirically-critical application details (each measured on the
calibration suites, tools/calibrate_degradations.py):

- Tracking is strict (short gaps, velocity-predicted, tight tolerance):
  at A=12 / lambda=90 the field changes by over half the 26 px line pitch
  across a long word gap, and loose nearest-neighbour matching jumps to
  the adjacent line, creating pitch-aliased false trajectories that
  converge to a self-consistent WRONG fixed point.
- The final application samples the GRAYSCALE through the total map with
  a Catmull-Rom (bicubic) kernel and re-binarizes with Sauvola: warps
  point-decimate rows (up to 1.43x inside a strength-0.8 cylinder strip),
  and both a bilinear gray gather and the thresholded-mask hop lose
  enough bit-cell mass to flip a cell together with its parity cell — a
  wrong-but-parity-valid decode. Catmull-Rom's negative lobes keep stroke
  edges ~1 px sharp; measured 60/60 single-class cylinder and 148/150
  full-sampler vs 55/60 / 141/150 for the round-2 per-column mask/gray
  split (whose bilinear-gray erosion mode this kernel retires).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# one-way module-level dependency (image never imports geometry at module
# level): bindings resolve at driver import time, so Ray's by-value
# cloudpickle serialization ships them to workers without any runtime
# package import (function-level relative imports FAIL on workers — the
# repo is not on their sys.path)
from .image import (
    despeckle,
    dewarp_washboard,
    estimate_column_shifts,
    estimate_skew,
    gaussian_blur,
    rotate_gray,
    sauvola,
)

#: column-strip width (px) for line-top extraction
STRIP = 4
#: candidate washboard wavelengths; brackets the reference's 90-150 range
LAM_GRID = np.arange(80.0, 310.0, 7.5)
#: washboard sines with best-fit wavelength beyond this are treated as fit
#: noise (the reference family is 90-150) and never applied
LAM_APPLY_MAX = 180.0


# ---------------------------------------------------------------------------
# line-top trajectories
# ---------------------------------------------------------------------------


def strip_line_tops(ink: np.ndarray, strip: int = STRIP, min_mass: int = 4):
    """Per-strip text-line top rows.

    Returns (strip_centers_x, list-per-strip of float arrays of run-top
    rows). The shirorekha spans the full glyph width, making the top edge
    of each ink run the most stable line anchor under warps.

    Fully vectorized: all strips' runs are found in ONE flattened
    diff/merge pass (this runs 2-5x per page; the per-strip Python loop
    was ~2.7 ms/page of the extract hot path).
    """
    h, w = ink.shape
    csum = np.zeros((h, w + 1), dtype=np.int32)
    np.cumsum(ink, axis=1, out=csum[:, 1:])
    edges = np.arange(0, w, strip)
    centers = (edges + min(strip, 4) / 2.0).astype(np.float64)
    n_s = edges.size
    P = csum[:, np.minimum(edges + strip, w)] - csum[:, edges]  # (h, n_s)
    hp = h + 4  # 4 blank guard rows so runs cannot cross strips or merge
    flat = np.zeros(hp * n_s + 1, dtype=np.int32)
    flat[:-1].reshape(n_s, hp)[:, :h] = (P > 0).T
    d = np.diff(np.concatenate(([0], flat)))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]           # exclusive
    if starts.size == 0:
        return centers, [np.empty(0)] * n_s
    # merge runs separated by <= 2 blank rows (old semantics: a break
    # needs diff(idx) >= 4, i.e. >= 3 blank rows); guard rows stop
    # cross-strip merges
    keep = np.empty(starts.size, dtype=bool)
    keep[0] = True
    keep[1:] = (starts[1:] - ends[:-1]) >= 3
    rs = starts[keep]
    # run ends: each merged run ends at the last end before the next start
    nxt = np.concatenate((np.nonzero(keep)[0][1:], [starts.size]))
    re = ends[nxt - 1]
    # ink mass per merged run from the strip-wise cumulative of P
    cumP = np.zeros(hp * n_s + 1, dtype=np.int64)
    view = cumP[1:].reshape(n_s, hp)
    view[:, :h] = np.cumsum(P.T, axis=1)
    view[:, h:] = view[:, h - 1:h]  # pad rows carry the strip total
    mass = cumP[re] - cumP[rs]
    ok = mass >= min_mass
    rs = rs[ok]
    tops = (rs % hp).astype(np.float64)
    sids = rs // hp
    cut = np.searchsorted(sids, np.arange(n_s + 1))
    all_tops = [tops[cut[i]:cut[i + 1]] for i in range(n_s)]
    return centers, all_tops


def track_lines(all_tops, max_gap: int = 3, min_len: int = 5):
    """Velocity-predictive tracking of line tops across strips.

    Strict by design — short gaps only, tight tolerance around a linear
    prediction: at washboard severity the field moves more than half a
    line pitch across a long word gap, so loose matching JUMPS lines and
    fabricates pitch-aliased trajectories. Fragments are fine (the fits
    anchor each with its own fixed effect); jumps are poison.
    Returns a list of (strip_idx array, top_y array) trajectories.
    """
    # pure-Python floats in the inner loop: ~10 candidate tops x ~15 live
    # tracks per strip makes numpy per-op overhead dominate (measured
    # 4.3 ms -> ~1 ms per page)
    tracks: list[list] = []  # [last_y, last_s, vel, idxs, ys]
    for s, tops_arr in enumerate(all_tops):
        if tops_arr.size == 0:
            continue
        tops = tops_arr.tolist()
        used = [False] * len(tops)
        act = [t for t in tracks if 0 < s - t[1] <= max_gap]
        act.sort(key=lambda t: t[0])
        for t in act:
            g = s - t[1]
            pred = t[0] + t[2] * g
            tol = 3.5 + 1.2 * (g - 1)
            best_j = -1
            best_d = tol
            for j, tv in enumerate(tops):
                if used[j]:
                    continue
                d = tv - pred if tv >= pred else pred - tv
                if d <= best_d:
                    best_d = d
                    best_j = j
            if best_j >= 0:
                used[best_j] = True
                tv = tops[best_j]
                step = (tv - t[0]) / g
                t[2] = 0.6 * t[2] + 0.4 * step if len(t[4]) > 1 else step
                t[0] = tv
                t[1] = s
                t[3].append(s)
                t[4].append(tv)
        for j, tv in enumerate(tops):
            if not used[j]:
                tracks.append([tv, s, 0.0, [s], [tv]])
    return [(np.asarray(t[3]), np.asarray(t[4]))
            for t in tracks if len(t[3]) >= min_len]


# ---------------------------------------------------------------------------
# fixed-effects family fits
# ---------------------------------------------------------------------------


def _flatten(trajs):
    si = np.concatenate([t[0] for t in trajs])
    ci = np.concatenate([t[1] for t in trajs])
    li = np.concatenate([np.full(t[0].size, k) for k, t in enumerate(trajs)])
    return si, ci, li, len(trajs)


def _center(v, li, n_frag, w=None):
    """Per-fragment (weighted) demean — absorbs the fixed effects exactly."""
    if w is None:
        s = np.bincount(li, weights=v, minlength=n_frag)
        n = np.bincount(li, minlength=n_frag).astype(np.float64)
    else:
        s = np.bincount(li, weights=w * v, minlength=n_frag)
        n = np.bincount(li, weights=w, minlength=n_frag)
    m = s / np.maximum(n, 1e-9)
    return v - m[li], m


def fit_washboard(x, ci, li, n_frag, wobs=None, lams=None, extra=None):
    """Fixed-effects LSQ of c ~ a sin(kx) + b cos(kx) + e*x [+ g*extra]
    + y_i over the wavelength grid. Returns
    (lam, a, b, e, sse, sse_nosine, y_frag, g).

    ``extra`` (optional, per-observation) adds one free column shared by
    every candidate wavelength — used for a co-present cylinder's field so
    its edge dent cannot capture the wavelength search (measured: a
    cylinder+washboard page fit lam 305 (junk, out of family) without the
    column vs the true 90-150 with it). ``sse_nosine`` includes the extra
    column, so the wash_on variance-explained gate still isolates the
    sine's own contribution.

    Batched over the whole grid: per-fragment centering and the normal
    equations for every candidate wavelength are built with two trig
    evaluations and a handful of einsums (the per-lambda Python loop was
    ~2.7 ms x 2 robust passes x rounds on the extract hot path)."""
    lams = LAM_GRID if lams is None else np.asarray(lams, dtype=np.float64)
    if lams.size == 0:
        lams = LAM_GRID
    cc, _ = _center(ci, li, n_frag, wobs)
    xc, _ = _center(x, li, n_frag, wobs)
    w = np.ones_like(cc) if wobs is None else wobs
    fixed = [xc]
    if extra is not None:
        fixed.append(_center(extra, li, n_frag, wobs)[0])
    F = np.stack(fixed, axis=1)                  # (n, nf) shared columns
    nf = F.shape[1]
    WF = F * w[:, None]
    G = F.T @ WF                                 # (nf, nf)
    gy = WF.T @ cc
    Greg = G + 1e-6 * np.eye(nf)
    try:
        beta0 = np.linalg.solve(Greg, gy)
    except np.linalg.LinAlgError:
        return None
    sse0 = float((w * (cc - F @ beta0) ** 2).sum())
    k = (2 * np.pi / lams)[:, None]              # (L, 1)
    S = np.sin(k * x[None, :])                   # (L, n)
    C = np.cos(k * x[None, :])
    # batched weighted per-fragment centering via one-hot matmul
    # (np.add.at scatter is ~10x slower than BLAS here)
    wrow = w[None, :]
    n = x.size
    M = np.zeros((n_frag, n))
    M[li, np.arange(n)] = w
    cnt = np.maximum(M.sum(axis=1), 1e-9)
    Sc = S - ((S @ M.T) / cnt)[:, li]
    Cc = C - ((C @ M.T) / cnt)[:, li]
    wc = w * cc
    # normal equations per lambda (fixed columns shared)
    ss = np.einsum("ln,ln->l", Sc * wrow, Sc)
    sc_ = np.einsum("ln,ln->l", Sc * wrow, Cc)
    cc_q = np.einsum("ln,ln->l", Cc * wrow, Cc)
    SF = Sc @ WF                                 # (L, nf)
    CF = Cc @ WF
    b1 = Sc @ wc
    b2 = Cc @ wc
    L = lams.size
    m = 2 + nf
    XtX = np.empty((L, m, m))
    XtX[:, 0, 0] = ss + 1e-6
    XtX[:, 0, 1] = XtX[:, 1, 0] = sc_
    XtX[:, 1, 1] = cc_q + 1e-6
    XtX[:, 0, 2:] = SF
    XtX[:, 2:, 0] = SF
    XtX[:, 1, 2:] = CF
    XtX[:, 2:, 1] = CF
    XtX[:, 2:, 2:] = Greg[None]
    Xty = np.concatenate(
        [b1[:, None], b2[:, None], np.broadcast_to(gy[None], (L, nf))], axis=1
    )
    try:
        beta = np.linalg.solve(XtX, Xty)         # (L, m)
    except np.linalg.LinAlgError:
        return None
    yty = (w * cc * cc).sum()
    sse = yty - np.einsum("lk,lk->l", beta, Xty)
    j = int(np.argmin(sse))
    lam = float(lams[j])
    a, b, e = (float(beta[j, 0]), float(beta[j, 1]), float(beta[j, 2]))
    g = float(beta[j, 3]) if extra is not None else 0.0
    kj = 2 * np.pi / lam
    fit = a * np.sin(kj * x) + b * np.cos(kj * x) + e * x
    if extra is not None:
        fit = fit + g * extra
    _, y_frag = _center(ci - fit, li, n_frag, wobs)
    return lam, a, b, e, float(sse[j]), sse0, y_frag, g


def fit_decay(x, ci, li, n_frag, lam, y_frag, h, cylcol=None):
    """Joint fit at the chosen wavelength: field = (a0+a1*yt)sin +
    (b0+b1*yt)cos + e*x, with yt = y - h/2.

    Runs its OWN 3-round IRLS: weights inherited from the flat fit crush
    exactly the strongly-attenuated rows that carry the decay signal
    (measured 2x decay underfit), and a slope fitted WITHOUT the decay
    columns oscillates +-2.4 deg on decay pages. ``cylcol`` adds a
    co-present cylinder's field as a free column — its edge ramp otherwise
    leaks into the slope (measured +-2 deg oscillation on wash+cyl pages).
    Returns (a0, b0, a1, b1, e).
    """
    k = 2 * np.pi / lam
    yt = (y_frag - h / 2.0)[li]
    s = np.sin(k * x)
    c = np.cos(k * x)
    cols = [s, c, s * yt, c * yt, x]
    if cylcol is not None:
        cols.append(cylcol)
    n = len(cols)
    w = np.ones_like(ci)
    beta = np.zeros(n)
    for _ in range(3):
        Xc = np.stack([_center(col, li, n_frag, w)[0] for col in cols], axis=1)
        cc, _ = _center(ci, li, n_frag, w)
        XtX = (Xc[:, :, None] * Xc[:, None, :] * w[:, None, None]).sum(axis=0)
        Xty = (Xc * (w * cc)[:, None]).sum(axis=0)
        XtX += np.eye(n) * 1e-6
        beta = np.linalg.solve(XtX, Xty)
        resid = cc - Xc @ beta
        w = 1.0 / (1.0 + (resid / 2.5) ** 4)
    return beta[:5]


def fit_cylinder(x, ci, li, n_frag, y_frag, h, w_px, wobs=None):
    """Grid-fit the EXACT multiplicative cylinder observation model

        c - h/2 = yt_i * cos(theta(x)) + e*x

    over the family (render_text.py:269-308), with each fragment's TRUE
    anchor yt_i profiled out in closed form per candidate. The earlier
    additive form g*(y_obs - h/2)(cos - 1) used the OBSERVED anchors,
    which are themselves compressed by cos(theta-bar) inside the strip —
    a systematic curvature over-estimate (fitted s 0.88 vs true 0.75 at
    the family's top severity) that no g rescale can absorb because the
    inflation varies per fragment. Both the candidates and the baseline
    carry a free x-slope column so a rotation trend can never masquerade
    as a cylinder. Returns (side, W, R, sse, sse0) or None.

    The whole (W, strength) grid evaluates as ONE float32 batch per side
    (the per-W Python loop was ~9.5 ms/call x 2-3 calls/page on the
    extract hot path; relative SSE comparisons are insensitive to f32).
    """
    w = (np.ones_like(ci) if wobs is None else wobs).astype(np.float32)
    n = x.size
    indic = np.zeros((n_frag, n), dtype=np.float32)
    indic[li, np.arange(n)] = 1.0
    onehot = indic * w[None, :]
    ct = (ci - h / 2.0).astype(np.float32)
    x32 = x.astype(np.float32)
    wct = w * ct
    wx = w * x32

    def _scan(side, Ws, strengths):
        Ws = np.asarray(Ws, dtype=np.float32)
        strengths = np.asarray(strengths, dtype=np.float32)
        dx = (np.clip(Ws[:, None] - x32[None, :], 0, None) if side == "left"
              else np.clip(x32[None, :] - (w_px - Ws)[:, None], 0, None))
        R = Ws[:, None] / strengths[None, :]             # (nW, S)
        K = np.cos(dx[:, None, :] / R[:, :, None]).reshape(-1, n)  # (P, n)
        # per-fragment projection residual operator M_k(v) =
        #   v - K * (sum_i w K v / sum_i w K^2)[li] — linear in v, so the
        # global slope e profiles out exactly afterwards
        den = np.maximum((K * K) @ onehot.T, np.float32(1e-9))     # (P, n_frag)
        num_c = (K * wct[None, :]) @ indic.T
        num_x = (K * wx[None, :]) @ indic.T
        Rc = ct[None, :] - K * (num_c / den)[:, li]
        Rx = x32[None, :] - K * (num_x / den)[:, li]
        wRx = Rx * w[None, :]
        exx = np.einsum("sn,sn->s", wRx, Rx)
        exc = np.einsum("sn,sn->s", wRx, Rc)
        scc = np.einsum("sn,sn->s", Rc * w[None, :], Rc)
        ok = exx > 1e-9
        e = np.where(ok, exc / np.where(ok, exx, 1.0), 0.0)
        sse = scc - e * exc
        j = int(np.argmin(sse))
        wi, si = divmod(j, strengths.size)
        return (side, float(Ws[wi]), float(R[wi, si]), float(sse[j]),
                float(strengths[si]))

    # baseline: same model at R -> inf (cos == 1): per-fragment demean + slope
    base = _scan("left", [1.0], np.asarray([1e-6]))
    sse0 = base[3] if base is not None else 0.0
    best = None
    for side in ("left", "right"):
        cand = _scan(side, np.arange(0.25, 0.61, 0.05) * w_px,
                     np.arange(0.2, 0.95, 0.05))
        if cand is not None and (best is None or cand[3] < best[3]):
            best = cand
    if best is None:
        return None
    # local continuous refinement around the coarse winner: the coarse grid
    # (W step 0.05*w, strength step 0.05) leaves up to ~10% edge-theta
    # error at the family's top severities (s 0.75, portion 0.5) — a
    # +-10 px row error at the strip edge that no downstream stage repairs
    side, Wc, _, _, sc = best
    fine = _scan(
        side,
        np.arange(max(8.0, Wc - 20.0), min(0.62 * w_px, Wc + 20.0) + 1e-9, 4.0),
        np.clip(np.arange(sc - 0.08, sc + 0.0801, 0.01), 0.05, 1.2),
    )
    if fine is not None and fine[3] <= best[3]:
        best = fine
    side, W, R, sse, _ = best
    return side, W, R, sse, sse0


def estimate_components(
    ink: np.ndarray, dbg: bool = False, do_cyl: bool = True,
    lam_hint: float | None = None,
):
    """Estimate every geometry component on a binary mask. Returns a dict
    (lam/a/b/amp/beta/slope/sse/sse0/cyl + observation arrays) or None
    when the page has too little trackable structure.

    ``do_cyl=False`` skips the cylinder grid (~8 ms) — callers pass the
    per-strip ink-extent compression hint (cylinders compress rows toward
    mid-page; washboard/rotation do not). ``lam_hint`` narrows the
    wavelength grid to a +-2-step window around a previous round's value
    (the wavelength is a page property, re-fitting the full grid every
    refinement round is waste).
    """
    h, w_px = ink.shape
    centers, tops = strip_line_tops(ink)
    trajs = track_lines(tops)
    if not trajs:
        return None
    si, ci, li, n_frag = _flatten(trajs)
    if si.size < 40:
        return None
    x = centers[si]
    lams = LAM_GRID
    if lam_hint is not None:
        lams = np.arange(lam_hint - 16.0, lam_hint + 16.01, 1.5)
    wobs = None
    fitted = None
    for _ in range(2):  # robust two-pass: fit, reweight, refit
        fitted = fit_washboard(x, ci, li, n_frag, wobs, lams=lams)
        if fitted is None:
            return None
        lam, a, b, e, sse, sse0, y_frag, _g = fitted
        k = 2 * np.pi / lam
        fit = a * np.sin(k * x) + b * np.cos(k * x) + e * x
        resid = ci - fit - y_frag[li]
        wobs = 1.0 / (1.0 + (resid / 2.5) ** 4)
    # fine local wavelength refinement AFTER both robust full-grid passes:
    # the 7.5-px coarse grid leaves a beat residual (phase error up to
    # ~1.2 rad across the page at lam 95-vs-90.7) that is edge-heavy — the
    # de-sined cylinder refit then absorbs it as a PHANTOM cylinder
    # (measured: a pure-washboard page peeled 2 junk cylinder rounds
    # before the real sine came off). Kept SEPARATE from the robust loop:
    # narrowing the second pass to the first pass's window locks in a
    # subharmonic the reweighted full-grid pass would have escaped
    # (measured lam 76 lock vs true 142 on a wash+cyl page).
    fine = fit_washboard(
        x, ci, li, n_frag, wobs, lams=np.arange(lam - 7.5, lam + 7.51, 1.5)
    )
    if fine is not None:
        fitted = fine
        lam, a, b, e, sse, sse0, y_frag, _g = fine
        lams = np.arange(lam - 7.5, lam + 7.51, 1.5)
    cyl = fit_cylinder(x, ci, li, n_frag, y_frag, h, w_px, wobs) if do_cyl else None
    cyl_desined = False

    def _cyl_basis(c, anchors):
        side, W, R = c[0], c[1], c[2]
        dxc = (np.clip(W - x, 0, None) if side == "left"
               else np.clip(x - (w_px - W), 0, None))
        return (anchors - h / 2.0)[li] * (np.cos(dxc / R) - 1.0)

    # --- joint washboard+cylinder refinement -------------------------
    # Fit sequentially-blind, each family sees the other as unmodeled
    # structure: a cylinder's edge dent captures the wavelength search
    # (lam 305 junk fit on a true-lam-120 page), and an unremoved sine
    # biases the cylinder's side/W/strength AND floods its no-cylinder
    # baseline, so the csse/csse0 ratio gate can never fire. When the raw
    # cylinder fit is even loosely plausible: refit the sine with the
    # cylinder field as a free column, then refit the cylinder on the
    # DE-SINED observations so its SSE ratio measures only itself.
    if (
        cyl is not None
        and (1 - np.cos(min(cyl[1] / cyl[2], 1.2))) * (h / 2.0) >= 1.5
        and 0.25 <= cyl[1] / cyl[2] <= 1.2
        and cyl[3] < 0.98 * cyl[4]
    ):
        # severe compositions (top-strength cylinder + decay washboard)
        # can leave even the cylinder-column fit on an out-of-family
        # wavelength — the biased raw basis does not absorb the true dent.
        # FORCE the sine into the reference family and alternate
        # sine <-> de-sined cylinder to a fixed point (2 rounds suffice;
        # measured lam 320 -> 130 on a true-132 page, basis coefficient
        # converging to 1.0).
        n_alt = 2 if lam > LAM_APPLY_MAX else 1
        alt_lams = (np.arange(85.0, 160.1, 3.75)
                    if lam > LAM_APPLY_MAX else lams)
        for _ in range(n_alt):
            refit = fit_washboard(
                x, ci, li, n_frag, wobs, lams=alt_lams,
                extra=_cyl_basis(cyl, y_frag),
            )
            if refit is None:
                break
            lam, a, b, e, sse, sse0, y_frag, _g = refit
            kj = 2 * np.pi / lam
            sine = a * np.sin(kj * x) + b * np.cos(kj * x)
            cyl2 = fit_cylinder(
                x, ci - sine, li, n_frag, y_frag, h, w_px, wobs
            )
            if cyl2 is None:
                break
            cyl = cyl2
            cyl_desined = True
    amp = float(np.hypot(a, b))
    cylcol = None
    if cyl is not None and cyl[3] < 0.9 * cyl[4] and 0.25 <= cyl[1] / cyl[2] <= 1.0:
        cylcol = _cyl_basis(cyl, y_frag)
    beta = fit_decay(x, ci, li, n_frag, lam, y_frag, h, cylcol)
    if cylcol is not None:
        # decay-aware cylinder refit: a DECAY washboard's y-gradient field
        # (a1 sin + b1 cos)*yt is structurally confusable with the
        # cylinder's yt*(cos theta - 1) — the flat de-sine above leaves it
        # in, and the contaminated fit drifts in W/strength (fitted W 80
        # vs true 140 on a decay-wash+cyl page). Subtract the FULL decay
        # field (flat + gradient, cylinder column co-fit by fit_decay) and
        # refit; keep the refit only if it still clears the strict gates.
        a0d, b0d, a1d, b1d, _e = beta
        yt = (y_frag - h / 2.0)[li]
        kj = 2 * np.pi / lam
        field_ws = (a0d + a1d * yt) * np.sin(kj * x) + (b0d + b1d * yt) * np.cos(kj * x)
        cyl3 = fit_cylinder(x, ci - field_ws, li, n_frag, y_frag, h, w_px, wobs)
        if (cyl3 is not None and cyl3[3] < 0.9 * cyl3[4]
                and 0.25 <= cyl3[1] / cyl3[2] <= 1.0):
            cyl = cyl3
            cyl_desined = True
            cylcol = _cyl_basis(cyl, y_frag)
            beta = fit_decay(x, ci, li, n_frag, lam, y_frag, h, cylcol)
    # effective amplitude = max |field| over the page: a residual after a
    # partially-corrected decay washboard can have a SMALL flat component
    # with a LARGE y-gradient (amplitude crossing zero mid-page) — gating
    # on the flat amplitude alone leaves such fields uncorrected
    amp_eff = float(np.hypot(beta[0], beta[1])
                    + (h / 2.0) * np.hypot(beta[2], beta[3]))
    out = {
        "lam": lam, "a": a, "b": b, "slope": float(beta[4]), "amp": amp,
        "amp_eff": amp_eff,
        "beta": beta, "sse": sse, "sse0": sse0, "cyl": cyl,
        "cyl_desined": cyl_desined,
        "n_obs": int(si.size), "h": h, "w": w_px,
    }
    if dbg:
        cylmsg = ""
        if cyl:
            side, W, R, csse, csse0 = cyl
            cylmsg = f" cyl[{side} W={W:.0f} s={W/R:.2f} r={csse/max(csse0,1e-9):.2f}]"
        print(f"    est: amp={amp:.2f} lam={lam:.0f} slope={out['slope']:+.4f} "
              f"sine_r={sse/max(sse0,1e-9):.2f}{cylmsg} nobs={si.size}")
    return out


# ---------------------------------------------------------------------------
# inverse-map application
# ---------------------------------------------------------------------------


def _bilinear2d(img: np.ndarray, ys: np.ndarray, xs: np.ndarray, fill) -> np.ndarray:
    """General bilinear gather with border fill (float32 internally: the
    maps and pages span < 2^11, well inside f32's 24-bit mantissa, and the
    f64 version was ~12 ms/call on the extract hot path)."""
    a, _ = _bilinear2d_pair(img, None, ys, xs, fill)
    return a


def _bilinear2d_pair(a: np.ndarray, b: np.ndarray | None, ys: np.ndarray,
                     xs: np.ndarray, fill) -> tuple[np.ndarray, np.ndarray | None]:
    """Bilinear-gather one or two images at the SAME sample points —
    index and weight arrays are computed once (the map composition
    samples My and Mx at identical (gy, gx) every peel round; int32 2-D
    fancy indexing measured FASTER than flattened 1-D index arithmetic)."""
    h, w = a.shape
    ys = ys.astype(np.float32, copy=False)
    xs = xs.astype(np.float32, copy=False)
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    fy = ys - y0
    fx = xs - x0
    yc = np.clip(y0 + 1, 0, h + 1)
    xc = np.clip(x0 + 1, 0, w + 1)
    yc1 = np.clip(y0 + 2, 0, h + 1)
    xc1 = np.clip(x0 + 2, 0, w + 1)
    gx = 1 - fx
    gy = 1 - fy

    def _one(img: np.ndarray) -> np.ndarray:
        pad = np.full((h + 2, w + 2), fill, dtype=np.float32)
        pad[1:-1, 1:-1] = img
        top = pad[yc, xc] * gx + pad[yc, xc1] * fx
        bot = pad[yc1, xc] * gx + pad[yc1, xc1] * fx
        return top * gy + bot * fy

    return _one(a), (_one(b) if b is not None else None)


def _bicubic2d(img: np.ndarray, ys: np.ndarray, xs: np.ndarray, fill) -> np.ndarray:
    """Catmull-Rom bicubic gather with border fill.

    Used ONLY for the final grayscale reconstruction of cylinder-compressed
    strips: the forward warp point-decimates rows by 1/cos(theta) (up to
    1.43x at strength 0.8), and a bilinear inverse is a second low-pass on
    top of that — the composed blur smears 3x3 bit cells enough to flip a
    data cell together with the parity cell (a wrong-but-parity-valid
    decode; measured 5/60 single-class cylinder pages). Catmull-Rom's
    negative lobes partially invert the tent kernel, keeping stroke edges
    ~1 px sharp. Overshoot is clipped by the caller before Sauvola.
    """
    h, w = img.shape
    ys = ys.astype(np.float32, copy=False)
    xs = xs.astype(np.float32, copy=False)
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    fy = ys - y0
    fx = xs - x0

    def _cr_weights(f):
        # Catmull-Rom at taps (-1, 0, 1, 2); four contiguous planes (a
        # strided [..., i] slice of a concatenated array costs ~30% more
        # in the 16-term accumulation below, values are identical)
        f2 = f * f
        f3 = f2 * f
        return [
            (0.5 * (-f3 + 2 * f2 - f)).astype(np.float32),
            (0.5 * (3 * f3 - 5 * f2 + 2)).astype(np.float32),
            (0.5 * (-3 * f3 + 4 * f2 + f)).astype(np.float32),
            (0.5 * (f3 - f2)).astype(np.float32),
        ]

    wy = _cr_weights(fy)
    wx = _cr_weights(fx)
    pad = np.full((h + 4, w + 4), fill, dtype=np.float32)
    pad[2:-2, 2:-2] = img
    # hoist the column clips out of the row loop: 8 clips, not 16
    xcs = [np.clip(x0 + (i + 1), 0, w + 3) for i in range(4)]
    acc = np.zeros(ys.shape, dtype=np.float32)
    for j in range(4):
        yc = np.clip(y0 + (j + 1), 0, h + 3)
        row = np.zeros(ys.shape, dtype=np.float32)
        for i in range(4):
            row += pad[yc, xcs[i]] * wx[i]
        acc += row * wy[j]
    return acc


def _extent_compression(ink: np.ndarray) -> float:
    """Edge-vs-mid per-strip ink-extent ratio (<1 = rows squeezed toward
    mid-page at an edge — the cylinder signature, INVISIBLE to mean-shift
    correlation, so it gets its own signal).

    Extents are the central-96%-ink-mass row range per strip, not
    first/last inked row: noise specks that survive despeckle sit at
    random rows and pull a first/last-row extent to the page borders,
    masking a real cylinder's compression (measured 0.971 vs true ~0.89
    on a cylinder+noise page — a clean-gate false pass that skipped
    recovery entirely)."""
    h, w = ink.shape
    csum = np.zeros((h, w + 1), dtype=np.int32)
    np.cumsum(ink, axis=1, out=csum[:, 1:])
    edges = np.arange(0, w - 7, 8)
    mass = np.stack(
        [csum[:, min(e + 8, w)] - csum[:, e] for e in edges], axis=1
    ).astype(np.float64)                       # (h, n_strips)
    P = mass > 0
    cum = np.cumsum(mass, axis=0)
    tot = cum[-1]                              # (n_strips,)
    lo_t = 0.02 * tot
    hi_t = 0.98 * tot
    # first row with cum >= lo_t / >= hi_t per strip
    first = (cum < lo_t[None, :]).sum(axis=0)
    last = (cum < hi_t[None, :]).sum(axis=0)
    ext = (last - first).astype(np.float64)
    valid = (tot > 0) & (ext >= 0.25 * h)
    if valid.sum() < 8:
        return 1.0
    ev = ext[valid]
    mid = float(np.median(ev))
    q = max(2, valid.sum() // 4)
    lo = float(np.median(ev[:q]))
    hi = float(np.median(ev[-q:]))
    return min(lo, hi) / max(mid, 1.0)


def _clean_page_gate(ink: np.ndarray) -> tuple[bool, float]:
    """(is_clean, extent_ratio) — the ~2 ms pre-gate that spares clean
    pages the ~45 ms full estimation.

    Four cheap signals: detrended strip-shift p75 (washboard; saturated
    shifts at A >= max_shift still exceed the bar), the shift trend's
    slope (rotation), the ink-extent ratio (cylinder), and the top/bottom
    THIRD-slab detrended shift p75 (cylinder again: full-slab mean shifts
    cancel — compression moves the top half down and the bottom half up
    by the same amount — but each third's own profile shows the edge
    ramp; measured p90 0.54 on photometric-only pages vs p10 1.24 on
    cylinder pages). Thresholds are deliberately conservative: a false
    positive costs ~45 ms of estimation, a false negative costs page
    correctness.
    """
    h = ink.shape[0]
    centers, shifts = estimate_column_shifts(ink)
    if centers.size < 12:
        return True, 1.0  # too little structure for the full estimator
    slope, icpt = np.polyfit(centers, shifts, 1)
    resid = shifts - (icpt + slope * centers)
    shifts_clean = (float(np.percentile(np.abs(resid), 75)) < 0.5
                    and abs(slope) < 0.008)
    slab_clean = True
    if shifts_clean:  # only pay the slab passes when still undecided
        for y0, y1 in ((0, h // 3), (2 * h // 3, h)):
            c, s = estimate_column_shifts(ink, y0=y0, y1=y1)
            if c.size < 12:
                continue
            sl, ic = np.polyfit(c, s, 1)
            r = s - (ic + sl * c)
            if float(np.percentile(np.abs(r), 75)) >= 0.7:
                slab_clean = False
                break
    ratio = _extent_compression(ink)
    return shifts_clean and slab_clean and ratio > 0.97, ratio


def _cyl_inverse_maps(side: str, W: float, R: float, h: int, w: int, yy: np.ndarray):
    """Inverse gather maps (gy, gx) undoing one cylindrical edge warp."""
    xs = np.arange(w, dtype=np.float64)
    dx = np.clip(W - xs, 0, None) if side == "left" else np.clip(xs - (w - W), 0, None)
    th = dx / R
    map_x = xs + (R * np.sin(th) - dx)     # true col for observed col
    xstar = np.interp(xs, map_x, xs)       # observed col for true col
    thstar = np.interp(xstar, xs, th)
    gy = (yy - h / 2.0) * np.cos(thstar)[None, :] + h / 2.0
    gx = np.broadcast_to(xstar[None, :], (h, w)).copy()
    return gy, gx


def _residual_severity(ink: np.ndarray) -> float:
    """Max gate-passing component severity left in a recovered mask —
    the comparator for the composition-order retry (smaller = cleaner).

    The cylinder W cap is RELAXED here (0.75w vs the peel loop's 0.55w):
    a wrong-frame wash-first peel leaves a residual cylinder whose refit
    drifts WIDE (measured W 0.53w true -> 0.59w residual), and the loop's
    cap then hides exactly the signal this comparator exists to see. The
    strength floor and SSE-ratio gates stay — they are what separates a
    real leftover cylinder (ratio 0.36) from a cleanly-peeled page's fit
    noise (ratio 0.96, strength 0.21)."""
    h, w = ink.shape
    est = estimate_components(ink)
    if est is None:
        return 0.0
    sev = 0.0
    amp = max(est["amp"], est["amp_eff"])
    if est["lam"] <= LAM_APPLY_MAX and est["sse"] < 0.8 * est["sse0"] and amp >= 1.2:
        sev = amp
    cyl = est["cyl"]
    if cyl is not None:
        side, W, R, csse, csse0 = cyl
        cs = (1 - np.cos(min(W / R, 1.2))) * (h / 2.0)
        if (csse < 0.9 * csse0 and 0.32 <= W / R <= 0.95 and W <= 0.75 * w
                and cs >= 1.5):
            sev = max(sev, cs)
    return sev


def recover_page_geometry(
    img: np.ndarray, dbg: bool = False, max_rounds: int = 7, info: dict | None = None,
    _force_cyl: tuple | None = None, _force_wash: bool = False,
) -> np.ndarray:
    """Geometry-recovering binarization of one grayscale page.

    Peels warp components round by round (dominant first), composing their
    analytic inverse gather maps into one total map, then applies the map
    once — per column on the mask or the grayscale depending on the map's
    local vertical scale (see module docstring). ``info`` (optional dict)
    receives ``slope`` (the initial pooled trajectory slope, a rotation
    prior for the deskew fallback) and ``applied`` (whether any warp was
    peeled). Falls back to the plain binarized mask when the page has no
    estimable structure or no significant component.

    ``_force_cyl`` (side, W, R) applies that cylinder inverse as round 1
    unconditionally — the composition-order retry below passes it when the
    default wash-first peel stalls on a persistent cylinder (the reference
    applies transforms in random order; a cylinder applied ON TOP of the
    washboard must come off FIRST, but it is invisible to round-0
    estimation under a 7+ px sine, so the default order can only discover
    it after a wash peel taken in the wrong frame).
    """
    h, w = img.shape
    if info is None:
        info = {}
    ink0 = despeckle(sauvola(img))
    if _force_cyl is None:
        clean, _ext = _clean_page_gate(ink0)
        if clean:
            return ink0
    est = estimate_components(ink0, dbg=dbg)
    if est is None:
        return ink0
    # slope: the initial pooled trajectory slope (rotation prior).
    # slope_resid: the slope of the LAST re-estimate — after peels it is
    # the rotation still left in the output (a cylinder peel leaves a
    # composed rotation fully intact), which the caller must remove
    # BEFORE the fine dewarp (its warp fit mangles rotated pages).
    info["slope"] = est["slope"]
    info["slope_resid"] = est["slope"]
    info["applied"] = False
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    My, Mx = yy.copy(), xx.copy()     # total gather map observed<-corrected
    ink255 = ink0.astype(np.float32) * np.float32(255.0)
    prev_sev = None
    prev_comp = None
    skip_growth = False
    peels: list[tuple[str, tuple | None]] = []
    stalled_cyl: tuple | None = None
    cyl_cand: tuple | None = None   # latest RAW cylinder fit (pre-gate)
    # round-0 in-family wash candidacy: the wash-first order retry below
    # only makes sense when the original frame showed a real sine
    wash0 = bool(est["amp"] >= 3.0 and est["lam"] <= LAM_APPLY_MAX)
    if _force_cyl is not None:
        side_f, W_f, R_f = _force_cyl
        gy, gx = _cyl_inverse_maps(side_f, W_f, R_f, h, w, yy)
        My, Mx = _bilinear2d_pair(My, Mx, gy, gx, fill=np.nan)
        oob = ~np.isfinite(My) | ~np.isfinite(Mx)
        My[oob] = -10.0
        Mx[oob] = -10.0
        info["applied"] = True
        peels.append(("cyl", _force_cyl))
        prev_sev = (1 - np.cos(min(W_f / R_f, 1.2))) * (h / 2.0)
        prev_comp = "cyl"
        if dbg:
            print(f"  forced cyl-first peel [{side_f} W={W_f:.0f} s={W_f/R_f:.2f}]")
        cur = despeckle(_bilinear2d(ink255, My, Mx, 0.0) >= 128)
        est = estimate_components(cur, dbg=dbg)
        if est is None:
            est = {"amp": 0.0, "amp_eff": 0.0, "lam": 1e9, "a": 0, "b": 0,
                   "slope": info["slope"], "sse": 1.0, "sse0": 1.0, "cyl": None,
                   "beta": np.zeros(5), "h": h, "w": w}
        info["slope_resid"] = est["slope"]
    for _ in range(max_rounds):
        amp = max(est["amp"], est["amp_eff"])
        cyl = est["cyl"]
        if cyl is not None:
            # retry candidates must be family-shaped on their own terms
            # (SSE ratio + strength) — only the W phantom cap may have
            # rejected them; junk fits (weak strength, flat ratio) would
            # otherwise trigger wrong-order retries on plain wash pages
            _sc, _Wc, _Rc, _cs, _cs0 = cyl
            if _cs <= 0.9 * _cs0 and 0.32 <= _Wc / _Rc <= 0.95:
                cyl_cand = cyl
        # washboard application gate: the reference family is lambda 90-150;
        # longer-wave "sines" are fit noise on blurred/clean pages
        wash_on = (amp >= 1.2 and est["sse"] < 0.8 * est["sse0"]
                   and est["lam"] <= LAM_APPLY_MAX)
        cyl_sev = 0.0
        if cyl is not None:
            side, W, R, csse, csse0 = cyl
            cyl_sev = (1 - np.cos(W / R)) * (h / 2.0)  # max row shift at edge
            # gates: real cylinders only dent total SSE mildly (they touch
            # only edge-strip rows far from mid-page) -> ratio bar 0.9 with
            # a strength floor below the family's 0.4 minimum; spurious
            # fits on clean/blurred pages sit at strength <= 0.25. The
            # sine-SSE comparison only counts when the sine is itself
            # applicable (an out-of-family long-wave fit absorbing part of
            # a real cylinder must not veto it) AND the cylinder was NOT
            # refit on de-sined observations — after the joint refit
            # est["sse"] includes the cylinder column, so the comparison
            # would veto every real cylinder.
            # W cap: the reference family's portion is 0.35-0.5 of the
            # page; fits beyond 0.55*w are a decay washboard's y-gradient
            # masquerading as a page-wide cylinder (measured W 0.62*w
            # phantom on a pure decay-wash page)
            if (csse > 0.9 * csse0 or cyl_sev < 1.5
                    or not (0.32 <= W / R <= 0.95)
                    or W > 0.55 * est["w"]
                    or (not est.get("cyl_desined", False)
                        and est["lam"] <= LAM_APPLY_MAX and csse > est["sse"])):
                cyl = None
                cyl_sev = 0.0
        # rotation peels here ONLY when composed with a significant sine:
        # the shear makes the sine's phase vary with y (lambda
        # misestimates: 95 vs true 128 at rot 3.3 deg + A 6.7), so it must
        # come off first — INSIDE the composed map (a grayscale
        # derotate-restart double-interpolates and erodes the bit cells).
        # Pure rotations are left to estimate_skew downstream.
        # the slope estimate's noise band on heavy washboard pages is
        # ~+-1.6 deg (a spurious peel INJECTS a real rotation that nothing
        # downstream removes); genuine composed rotations that break the
        # lambda estimate are >= ~3 deg, so gate well above the noise
        ang = float(np.degrees(np.arcsin(np.clip(est["slope"], -0.3, 0.3))))
        # gate on the FLAT in-family sine amplitude: a junk long-wave
        # y-gradient (amp_eff) on a noisy page must not enable the in-map
        # rotation peel — the refine_skew fallback is more accurate there
        # ... OR composed with a gate-passing cylinder: peeling the
        # cylinder under a still-present rotation applies the edge
        # correction at tilted (wrong) columns — tan(4.8deg)*h = 27 px of
        # column misalignment across the page (measured 70-edit decode on
        # a cyl+rot page whose cylinder fit was near-exact). The slope is
        # trustworthy there: fit_decay co-fits it WITH the cylinder
        # column, so the lam junk-fit condition does not apply.
        # the rotation bar is LOWER when a gate-passing cylinder is present:
        # the slope is co-fit with the cylinder column (trustworthy down to
        # ~1 deg), and a rotation left to the post-hoc mask derotation costs
        # the cylinder strip a SECOND lossy resample on top of the gray
        # reconstruction (measured: a 2.0-deg rotate+cylinder page decoded
        # one wrong-but-parity-valid glyph via that double hop)
        rot_on = abs(ang) > (1.2 if cyl is not None else 2.2) and (
            (est["amp"] >= 3.0 and est["lam"] <= LAM_APPLY_MAX)
            or cyl is not None
        )
        if _force_wash and not peels and wash_on:
            # order-retry hypothesis: the washboard was applied LAST, so
            # it must come off FIRST — suppress the severity-greedy
            # rot/cyl choice for this one round, and exempt the NEXT
            # round from the growth bar (the sine floods the cyl/rot
            # fits, so severity legitimately jumps once it comes off)
            rot_on, cyl, cyl_sev = False, None, 0.0
            skip_growth = True
        sev = max(cyl_sev, amp if wash_on else 0.0,
                  3.0 * abs(ang) if rot_on else 0.0)
        comp = ("rot" if rot_on
                else "cyl" if (cyl is not None and cyl_sev >= amp)
                else "wash")
        if dbg:
            print(f"  round: sev={sev:.2f} comp={comp} (amp={amp:.2f} "
                  f"wash={wash_on} ang={ang:+.2f} cyl_sev={cyl_sev:.2f})")
        # require real progress WITHIN a component (dribble rounds waste
        # ~20 ms each and never converge), but allow a flat round when the
        # peeled component CHANGES (a rotation peel leaves washboard amp
        # intact by design)
        if sev < 1.2:
            break
        # no growth bar right after a rotation peel: derotation leaves
        # every other component intact AND un-masks components the tilted
        # fit underestimated, so severity legitimately rises
        if (prev_sev is not None and prev_comp != "rot" and not skip_growth
                and sev > prev_sev * (1.1 if comp != prev_comp else 0.85)):
            # a gate-passing cylinder whose severity GROWS after a wash
            # peel marks a composition-order miss: capture it for the
            # retry below (it was never peeled, so it is not in ``peels``)
            if comp == "cyl" and cyl is not None:
                stalled_cyl = cyl
            break
        if peels:
            skip_growth = False  # the exemption covers exactly one round
        prev_sev = sev
        prev_comp = comp
        peels.append((comp, cyl if comp == "cyl" else None))
        if rot_on:
            rad = np.arcsin(np.clip(est["slope"], -0.3, 0.3))
            c, s = np.cos(rad), np.sin(rad)
            cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
            gy = c * (yy - cy) + s * (xx - cx) + cy
            gx = -s * (yy - cy) + c * (xx - cx) + cx
        elif cyl is not None and cyl_sev >= amp:
            side, W, R, _, _ = cyl
            gy, gx = _cyl_inverse_maps(side, W, R, h, w, yy)
        else:
            lam = est["lam"]
            a0, b0, a1, b1, _ = est["beta"]
            # cap the y-gradient magnitude but do NOT phase-project it onto
            # (a0,b0): a residual after a partially-corrected decay warp is
            # genuinely gradient-dominated (flat part near zero), and the
            # projection was measured to zero exactly that signal
            g_amp = float(np.hypot(a1, b1)) * (h / 2.0)
            g_cap = max(0.75 * float(np.hypot(a0, b0)), 3.0)
            if g_amp > g_cap:
                a1 *= g_cap / g_amp
                b1 *= g_cap / g_amp
            k = 2 * np.pi / lam
            xs = np.arange(w, dtype=np.float64)
            sk, ck = np.sin(k * xs), np.cos(k * xs)
            A = a0 * sk + b0 * ck
            B = 1.0 + a1 * sk + b1 * ck
            gy = A[None, :] + B[None, :] * (yy - h / 2.0) + h / 2.0
            gx = xx
        # compose the total map: sample My/Mx at (gy,gx)
        My, Mx = _bilinear2d_pair(My, Mx, gy, gx, fill=np.nan)
        oob = ~np.isfinite(My) | ~np.isfinite(Mx)
        My[oob] = -10.0
        Mx[oob] = -10.0
        info["applied"] = True
        # per-round re-estimates run on the cheap mask hop — the estimator
        # only needs line tops, not bit-cell fidelity
        cur = despeckle(_bilinear2d(ink255, My, Mx, 0.0) >= 128)
        est = estimate_components(cur, dbg=dbg, lam_hint=est["lam"])
        if est is None:
            break
        info["slope_resid"] = est["slope"]
    if not info["applied"]:
        return ink0
    # final application medium: Catmull-Rom gather of the GRAYSCALE through
    # the total map, then Sauvola. History: round 2 used a bilinear mask
    # hop outside cylinder strips because bilinear-gray erosion broke a
    # noisy wash+rot page (nerr 109); with the bicubic kernel the gray
    # medium beats the mask hop on EVERY class — the mask hop loses a bit
    # cell to fractional-shift erosion even at cos(theta) ~ 0.98 (a
    # wrong-but-parity-valid decode on 5/60 cylinder pages), while bicubic
    # keeps stroke edges ~1 px sharp and Sauvola re-thresholds cleanly
    # (full-envelope suite: 60/60 cylinder, 148/150 reference sampler vs
    # 55/60, 141/150 for the per-column mask/gray split).
    fill = float(np.median(img))
    # final in-map micro-derotate: a residual rotation below the in-loop
    # peel bar but above the slope noise floor, left under a peeled
    # cylinder, costs 1-2 glyphs at the cylinder edge (measured: the
    # ±4.8° rotation over a 0.53 cylinder sampler page decoded 2 wrong
    # glyphs with a −0.35° residual), and the downstream
    # refine_skew/estimate_skew fallbacks would pay a SECOND lossy
    # resample on the thresholded mask. Real-vs-phantom gate: a sub-1°
    # slope is only trustworthy when a ROT peel happened earlier in this
    # run — it is then the rot estimator's own residual error by
    # construction (both cyl+rot near-misses decode exact with it
    # composed), so it composes BEFORE the one final application at zero
    # extra resample cost — whereas on a run that never detected a
    # rotation the same read is warp-fit noise (a −0.49° phantom on a
    # wash+cyl page cost a glyph; the projection-profile refine cannot
    # arbitrate those: measured −0.75° on a true −0.35° residual), so
    # the no-rot-peel branch renders first, confirms the angle on the
    # cylinder-free columns of the OUTPUT mask, and only a confirmed
    # rotation pays a recomputed application.
    had_cyl = any(p[0] == "cyl" for p in peels)
    had_rot = any(p[0] == "rot" for p in peels)

    def _compose_rot(rad: float) -> None:
        nonlocal My, Mx
        c, s = np.cos(rad), np.sin(rad)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        gy = c * (yy - cy) + s * (xx - cx) + cy
        gx = -s * (yy - cy) + c * (xx - cx) + cx
        My, Mx = _bilinear2d_pair(My, Mx, gy, gx, fill=np.nan)
        oob = ~np.isfinite(My) | ~np.isfinite(Mx)
        My[oob] = -10.0
        Mx[oob] = -10.0
        info["slope_resid"] = 0.0

    rad = float(np.arcsin(np.clip(info["slope_resid"], -0.3, 0.3)))
    if had_cyl and had_rot and 0.004 <= abs(rad) <= 0.04:  # ~0.23° … 2.3°
        _compose_rot(rad)
    gray = _bicubic2d(img.astype(np.float32), My, Mx, fill)
    out = despeckle(sauvola(np.clip(gray, 0, 255).astype(np.uint8)))
    if had_cyl and not had_rot and 0.004 <= abs(rad) <= 0.04:
        lcut = rcut = 0
        for pname, pdata in peels:
            if pname == "cyl" and pdata is not None:
                wi = int(min(float(pdata[1]), w))
                if pdata[0] == "left":
                    lcut = max(lcut, wi)
                else:
                    rcut = max(rcut, wi)
        sub = out[:, lcut : w - rcut] if (w - lcut - rcut) >= 0.3 * w else out
        ang = refine_skew(sub, float(np.degrees(rad)), half=0.5)
        if abs(ang) >= 0.25:
            _compose_rot(float(np.deg2rad(ang)))
            gray = _bicubic2d(img.astype(np.float32), My, Mx, fill)
            out = despeckle(sauvola(np.clip(gray, 0, 255).astype(np.uint8)))
    # composition-order retry: the reference samples transform order
    # randomly, and a cylinder applied ON TOP of a strong washboard is
    # invisible to round-0 estimation (the unremoved sine floods its SSE
    # gate) — the default run then peels wash first, IN THE WRONG FRAME,
    # and the leftover cylinder stalls the loop. Retry once with the
    # discovered cylinder peeled first; keep whichever output re-estimates
    # cleaner. Rare (stall-only), so the extra full pass is paid ~never.
    if _force_cyl is None and not _force_wash and peels:
        # _residual_severity is a full estimator pass (~5 ms/page) — run
        # it LAZILY, only once a retry hypothesis actually exists (most
        # pages have none and must not pay it; measured +10% per-page
        # kernel cost when it ran unconditionally)
        r1 = None

        def _r1() -> float:
            nonlocal r1
            if r1 is None:
                r1 = _residual_severity(out)
            return r1

        tries: list[dict] = []
        if peels[0][0] == "wash":
            # cyl-first: include the latest RAW (possibly gate-rejected)
            # cylinder candidate — a cylinder applied on top of the wash
            # is mangled by the wrong-frame wash peel, so its refit can
            # land outside the family gates (W beyond the 0.55·w phantom
            # cap) while still marking a real component worth the retry
            fc = stalled_cyl or next(
                (p[1] for p in peels if p[0] == "cyl"), None) or cyl_cand
            if fc is not None and (stalled_cyl is not None or _r1() >= 1.5):
                tries.append({"_force_cyl": (fc[0], fc[1], fc[2])})
        if peels[0][0] != "wash" and wash0 and _r1() >= 3.0:
            # wash-first: the page opened rot/cyl-dominant but carried an
            # in-family sine the whole time — when the wash was applied
            # LAST (reference order is random), the severity-greedy peel
            # order corrected rot/cyl in the wash-distorted frame and the
            # sine never came off
            tries.append({"_force_wash": True})
        for kw in tries:
            info2: dict = {}
            out2 = recover_page_geometry(
                img, dbg=dbg, max_rounds=max_rounds, info=info2, **kw,
            )
            r2 = _residual_severity(out2)
            if dbg:
                print(f"  order-retry {kw}: residual sev {_r1():.2f} -> {r2:.2f}")
            if r2 < _r1() - 0.3:
                info.clear()
                info.update(info2)
                out, r1 = out2, r2
    return out


def refine_skew(ink: np.ndarray, hint_deg: float, half: float = 0.7,
                step: float = 0.05) -> float:
    """Local concentration-score argmax around a strong prior angle.

    estimate_skew's global gate exists to suppress hallucinated rotations;
    with a trajectory-slope prior the rotation is known to be real, so the
    +-half window is searched ungated (same row-histogram sharpness score).
    """
    ys, xs = np.nonzero(ink)
    if ys.size < 300:
        return hint_deg
    ys = ys.astype(np.float64)
    xs = xs.astype(np.float64)
    if ys.size > 8000:
        idx = np.linspace(0, ys.size - 1, 8000).astype(np.int64)
        ys, xs = ys[idx], xs[idx]
    h = int(ys.max()) + 1
    w = int(xs.max()) + 1
    span = h + int(np.ceil(w * np.sin(np.deg2rad(abs(hint_deg) + half + 1)))) * 2 + 2
    best, best_s = hint_deg, -1.0
    for t in np.arange(hint_deg - half, hint_deg + half + 1e-9, step):
        rad = np.deg2rad(t)
        yr = ys * np.cos(rad) - xs * np.sin(rad)
        yq = (yr - yr.min()).astype(np.int64)
        counts = np.bincount(yq, minlength=span).astype(np.float64)
        s = float((counts * counts).sum())
        if s > best_s:
            best_s, best = s, float(t)
    return best


# ---------------------------------------------------------------------------
# page preprocessing entry points (moved from stages.image)
# ---------------------------------------------------------------------------


def _unsharp_if_blurred(img: np.ndarray) -> np.ndarray:
    """Gated unsharp pre-pass for heavily blurred pages.

    Blur severity is the mid-band occupancy between the quantile-anchored
    ink (p2) and paper (p85) modes — invariant to the degradation model's
    brightness/contrast remaps, which only move the modes, while blur
    fills the valley between them. Measured separation (8-page sweep,
    /tmp-calibrated): blur sigma >= 0.75 scores >= 0.45 in every
    composition; the heaviest non-blur stack (noise sigma 12.75) tops out
    at 0.34; warps sit at 0.15-0.22; clean/brightness/contrast/rotation
    at 0. At sigma ~1.0 the Sauvola mask loses thin-stroke recall (a
    shirorekha eroded to nothing decodes a wrong-but-parity-valid glyph);
    one unsharp round restores the edge contrast the threshold needs.
    Mild blur (sigma 0.5, score <= 0.09) stays untouched — Sauvola's k is
    already calibrated for it.
    """
    # metric runs on the uint8 image directly (np.percentile promotes to
    # float64 internally, comparisons against the float thresholds promote
    # elementwise — values identical to the old float64-cast path); the
    # cast is paid only when the gate actually trips
    lo, hi = (float(v) for v in np.percentile(img, (2.0, 85.0)))
    span = max(hi - lo, 1.0)
    t_lo = lo + 0.30 * span
    t_hi = lo + 0.75 * span
    dark = int((img < t_hi).sum())
    if dark == 0:
        return img
    mid = int(((img > t_lo) & (img < t_hi)).sum())
    if mid / dark < 0.44:
        return img
    g = img.astype(np.float64)
    sharp = g + 1.2 * (g - gaussian_blur(g, 0.8))
    return np.clip(sharp, 0, 255).astype(np.uint8)


def preprocess_page(pixels: bytes, width: int, height: int) -> np.ndarray:
    """decode → parametric geometry recovery → fine dewarp → deskew.

    Stage order matters and each arrow is measured (module docstring): the
    coarse parametric recovery handles the reference's FULL severity
    envelope (washboard A 6-12, cylinder 0.4-0.8, rotation composed with
    warps); ``dewarp_washboard`` then cleans sub-1.5 px sine residuals;
    the slope-prior rotation fallback runs BEFORE the fine dewarp (its
    warp fit mangles a still-rotated noisy page — measured nerr 0 → 155);
    ``estimate_skew`` deskews last (correct only confident tilts: >0.5°;
    smaller corrections smear bit cells — hypothesis clean-roundtrip).
    """
    img = np.frombuffer(pixels, dtype=np.uint8, count=width * height).reshape(
        height, width
    )
    img = _unsharp_if_blurred(img)
    info: dict = {}
    ink = recover_page_geometry(img, info=info)
    # while no warp map was applied, ``ink`` is the virgin Sauvola mask of
    # ``img`` — a rotation is then best applied to the GRAYSCALE (one
    # bilinear interpolation + re-binarize) instead of the mask hop, which
    # stacks a second resample on the thresholded image (measured: a
    # rotate+blur page flipped one bit cell via the mask hop, exact via
    # gray). After any peel/derotation the mask hop is the right medium
    # (re-deriving the composed grayscale would double-interpolate).
    virgin = not info.get("applied", False)

    def _derotate(angle: float) -> None:
        nonlocal ink, virgin
        if virgin:
            ink = despeckle(sauvola(rotate_gray(img, angle, bilinear=True)))
        else:
            fmask = rotate_gray(
                (ink * 255).astype(np.uint8), angle, fill=0.0, bilinear=True
            )
            ink = despeckle(fmask >= 128)
        virgin = False

    if abs(info.get("slope_resid", 0.0)) > 0.021:
        # estimate_skew's concentration gate can miss a true rotation under
        # heavy noise; the pooled within-trajectory slope is immune to it.
        # This runs on the RESIDUAL slope — after a cylinder/washboard peel
        # a composed rotation is still fully present (the in-map rot peel
        # only fires when composed with a significant sine), and feeding a
        # rotated page to dewarp_washboard mangles it (measured nerr
        # 0 → 155); the derotation must come first.
        angle = refine_skew(ink, float(np.degrees(np.arcsin(info["slope_resid"]))))
        if abs(angle) > 0.5:
            _derotate(angle)
    dewarped = dewarp_washboard(ink)
    if dewarped is not ink:  # fine dewarp resampled the mask
        virgin = False
        ink = dewarped
    angle = estimate_skew(ink)
    if abs(angle) > 0.5:
        # deskew by area-sampling (bilinear + 0.5 threshold on the mask, or
        # one grayscale interpolation + Sauvola on virgin pages): crisper
        # than NN∘NN and cannot bridge the 2-px inter-glyph gaps
        _derotate(angle)
    return ink


def binarize_deskew_batch(batch: pa.Table) -> pa.Table:
    """(media_ref, width, height, pixels) → (media_ref, width, height, ink).

    Ray Data map_batches stage (stateless task; Arrow in/out). ``ink`` is
    the recovered binary mask, bit-packed (8× smaller than raw pixels);
    the raw ``pixels`` column is dropped here — project early so
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
