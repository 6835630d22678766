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


def test_interval_coverage_random_vs_naive(ray_session):
    """Randomized intervals vs a naive per-user merge on the driver —
    catches tie/adjacency edge cases a fixed fixture misses."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import interval_coverage

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    dur = 40
    rows = []
    for _ in range(400):
        uid = int(rng.integers(0, 25))
        sec = int(rng.integers(0, 500))
        rows.append({"user_id": uid, "ts": pd.Timestamp((base + sec * 1_000_000) * 1000)})
    ds = rd.from_items(rows).repartition(7)
    out = (
        interval_coverage(ds, dur_s=dur, n_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    # naive model
    expect = {}
    byu = {}
    for r in rows:
        byu.setdefault(r["user_id"], []).append(r["ts"].value // 1000)
    for uid, sts in byu.items():
        ivs = sorted((s, s + dur * 1_000_000) for s in sts)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expect[uid] = (sum(e - s for s, e in merged) // 1_000_000, len(merged))
    got = {int(r.user_id): (int(r.active_s), int(r.n_islands)) for r in out.itertuples()}
    assert got == expect


def test_priority_sample_subset_invariance(ray_session):
    """Removing non-selected rows must not change the selected sample
    (the property that makes priority sampling resumable/incremental)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import priority_sample

    rows = [{"doc_id": i, "n_chars": (i * 7) % 23 + 1} for i in range(300)]
    ds_all = rd.from_items(rows).repartition(6)
    picked = priority_sample(ds_all, k=15).to_pandas()
    keep_ids = set(picked.doc_id.tolist())
    # drop half of the NON-selected rows
    survivors = [r for i, r in enumerate(rows) if r["doc_id"] in keep_ids or i % 2 == 0]
    ds_sub = rd.from_items(survivors).repartition(4)
    picked2 = priority_sample(ds_sub, k=15).to_pandas()
    assert picked2.doc_id.tolist() == picked.doc_id.tolist()


def test_hll_by_group_matches_global_per_slice(ray_session):
    """Per-group registers equal running the global HLL rule on each
    group's values separately, and merging two disjoint data slices by
    max reproduces the whole-data sketch (mergeability)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import hll_registers_by_group
    from sanskrit_ocr_ray.util import md5_u64

    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b", "c"], 500),
            "user_id": rng.randint(0, 200, 500).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = hll_registers_by_group(ds, p=6).to_pandas()
    got = {
        (r["event_type"], int(r["bucket"])): int(r["rho"])
        for _, r in out.iterrows()
    }

    def ref_regs(users):
        regs = {}
        for u in set(users):
            hv = md5_u64(str(u))
            b, w = hv >> 58, hv & ((1 << 58) - 1)
            rho = 59 - w.bit_length() if w else 59
            regs[b] = max(regs.get(b, 0), rho)
        return regs

    exp = {}
    for g, gr in df.groupby("event_type"):
        for b, rho in ref_regs(gr["user_id"]).items():
            exp[(g, int(b))] = rho
    assert got == exp
    # mergeability: slice-wise max == whole-data registers
    half = len(df) // 2
    r1 = ref_regs(df["user_id"][:half][df["event_type"][:half] == "a"])
    r2 = ref_regs(df["user_id"][half:][df["event_type"][half:] == "a"])
    merged = {b: max(r1.get(b, 0), r2.get(b, 0)) for b in set(r1) | set(r2)}
    whole = ref_regs(df["user_id"][df["event_type"] == "a"])
    assert merged == whole
