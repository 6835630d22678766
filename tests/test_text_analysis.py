"""Text-analysis operators: unit behavior + determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa

from sanskrit_ocr_ray.stages.text_analysis import (
    fingerprint_batch,
    lang_id_batch,
    quality_score_batch,
    rolling_fingerprint,
    simhash_batch,
    token_count_batch,
)


def _t(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    out = token_count_batch(_t(["hello world", "a b  c", ""])).to_pandas()
    assert out.n_ws_tokens.tolist() == [2, 3, 0]
    out2 = token_count_batch(_t(["don't stop-me now2"])).to_pandas()
    # don ' t stop - me now 2 → 8 BPE-ish pieces
    assert out2.n_bpe_tokens.tolist() == [8]


def test_lang_id_rules():
    out = lang_id_batch(
        _t(
            [
                "the cat and a dog",        # en stopwords
                "der hund ist nicht da",    # de stopwords
                "xyzzy qwerty foo",         # no stopwords → und
                "the der",                  # tie en=1 de=1 → alphabetical 'de'
            ]
        )
    ).to_pandas()
    assert out.pred_lang.tolist() == ["en", "de", "und", "de"]


def test_quality_integer_components():
    out = quality_score_batch(_t(["the cat"])).to_pandas()
    assert out.q_chars.tolist() == [7]
    assert out.q_tokens.tolist() == [2]
    assert out.q_mean_tok_len_x100.tolist() == [(100 * 6) // 2]
    assert out.q_stop_pct.tolist() == [50]


def test_simhash_properties():
    a = simhash_batch(_t(["alpha beta gamma delta"]))["simhash"][0].as_py()
    b = simhash_batch(_t(["alpha beta gamma delta"]))["simhash"][0].as_py()
    c = simhash_batch(_t(["totally different content here"]))["simhash"][0].as_py()
    assert a == b  # deterministic
    assert a != c
    near = simhash_batch(_t(["alpha beta gamma epsilon"]))["simhash"][0].as_py()
    ham = bin(int(a, 16) ^ int(near, 16)).count("1")
    far = bin(int(a, 16) ^ int(c, 16)).count("1")
    assert ham < far  # similar text → closer signature


def test_fingerprints():
    fp = fingerprint_batch(_t(["xyz"]))["fingerprint"][0].as_py()
    import hashlib

    assert fp == hashlib.md5(b"xyz").hexdigest()[:16]
    # rolling hash: prefix property sanity + determinism
    assert rolling_fingerprint("abc") == rolling_fingerprint("abc")
    assert rolling_fingerprint("abc") != rolling_fingerprint("abd")


def test_kmv_distinct_exact_and_estimator_paths(ray_session):
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import kmv_distinct

    # < k distinct shingles → the sketch IS the exact count
    # distinct shingles: "a b c", "b c d", "c d e" → exactly 3
    docs = pd.DataFrame({"text": ["a b c d", "b c d e"]})
    out = kmv_distinct(rd.from_pandas(docs), k=256, ngram=3)
    assert out.n_distinct_est.tolist() == [3]

    # ≥ k distinct → estimator within 3σ ≈ 3/sqrt(k) relative error
    n_docs, k = 60, 64
    rng = np.random.default_rng(3)
    texts = [
        " ".join(str(rng.integers(0, 10**9)) for _ in range(40)) for _ in range(n_docs)
    ]
    truth = len(
        {
            " ".join(t.split(" ")[i : i + 3])
            for t in texts
            for i in range(len(t.split(" ")) - 2)
        }
    )
    est = kmv_distinct(rd.from_pandas(pd.DataFrame({"text": texts})), k=k, ngram=3)
    rel = abs(est.n_distinct_est[0] - truth) / truth
    assert rel < 3 / np.sqrt(k), (est.n_distinct_est[0], truth)


def test_heavy_hitters_skewed_and_partition_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import heavy_hitters

    # Zipf-ish skew: 'hot' = 40% of tokens, 'warm' = 20%, a long tail of
    # singletons — with c=8 only tokens above N/8 survive
    rng = np.random.default_rng(7)
    docs = []
    for i in range(40):
        toks = (
            ["hot"] * 10 + ["warm"] * 5 + [f"tail{i}_{j}" for j in range(10)]
        )
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    truth = {}
    for d in docs:
        for w in d.split(" "):
            truth[w] = truth.get(w, 0) + 1
    n = sum(truth.values())
    want = sorted((w, c) for w, c in truth.items() if c * 8 > n)
    assert [w for w, _ in want] == ["hot", "warm"]  # tail pruned

    for parts in (1, 7):
        out = heavy_hitters(
            rd.from_pandas(pd.DataFrame({"text": docs})).repartition(parts), c=8
        )
        got = list(zip(out["token"], out["cnt"]))
        assert got == want, (parts, got)


def test_json_int_field_batch_extracts_and_defaults():
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.text_analysis import json_int_field_batch

    batch = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "props": pa.array(
                ['{"k": 42}', '{"k": -7, "x": 1}', '{"x": 5}', None]
            ),
        }
    )
    out = json_int_field_batch(batch, column="props", key="k")
    assert out.column_names == ["event_id", "k"]
    assert out["k"].to_pylist() == [42, -7, -1, -1]


def test_distinct_token_batch_edges():
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.text_analysis import distinct_token_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["a b a  b c", "", "x x x x"],
        }
    )
    out = distinct_token_batch(t).to_pydict()
    assert out["distinct_toks"] == [3, 0, 1]
    assert out["n_toks"] == [5, 0, 4]
    assert out["ttr_pm"] == [600, 0, 250]


def test_hll_registers_partition_invariant_and_exact(ray_session):
    """The register table equals a single-process reference computation
    and is invariant to how the corpus is partitioned (mergeability)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import _bit_length_u64, _shingle_hashes, hll_registers

    rng = np.random.default_rng(5)
    vocab = [f"w{j}" for j in range(200)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(3, 40)))
        for _ in range(120)
    ]
    docs = pd.DataFrame({"text": texts})

    hv = _shingle_hashes(texts, 3)
    bucket = (hv >> np.uint64(58)).astype(np.int64)
    rho = 59 - _bit_length_u64(hv & np.uint64((1 << 58) - 1))
    want = (
        pd.DataFrame({"bucket": bucket, "rho": rho})
        .groupby("bucket", as_index=False)["rho"]
        .max()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    for parts in (1, 7):
        got = (
            hll_registers(rd.from_pandas(docs).repartition(parts), p=6, ngram=3)
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_hll_estimate_fold_accuracy(ray_session):
    """The driver-side estimate fold over the registers lands within the
    standard-error band (~1.04/sqrt(64) ≈ 13%) of the true distinct count."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import _shingle_hashes, hll_registers

    rng = np.random.default_rng(6)
    # unique-ish shingles: random 3-token docs over a large vocab
    texts = [
        " ".join(f"t{rng.integers(0, 100000)}" for _ in range(30))
        for _ in range(400)
    ]
    true_n = len(_shingle_hashes(texts, 3))
    regs = hll_registers(
        rd.from_pandas(pd.DataFrame({"text": texts})), p=6, ngram=3
    ).to_pandas()
    m = 64
    rho = np.zeros(m)
    rho[regs["bucket"].to_numpy()] = regs["rho"].to_numpy()
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(2.0 ** -rho)
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    assert abs(est - true_n) / true_n < 0.3


def test_kmv_jaccard_exact_and_estimate_paths(ray_session):
    """Small unions take the exact-Jaccard path; the estimate is a pure
    function of hash order (partition-invariant); fully-shared and fully
    disjoint shingle sets hit the endpoints."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import kmv_jaccard
    from sanskrit_ocr_ray.util import md5_u64

    # find doc_ids on each side of the md5 split rule
    ids = list(range(400))
    val_ids = [i for i in ids if md5_u64(str(i)) % 1000 < 100]
    train_ids = [i for i in ids if md5_u64(str(i)) % 1000 >= 100]
    assert val_ids and train_ids

    shared = "alpha beta gamma delta epsilon"
    docs = pd.DataFrame(
        {
            "doc_id": np.array(train_ids[:5] + val_ids[:5], np.int64),
            "text": [shared] * 10,  # identical shingles both sides
        }
    )
    for parts in (1, 4):
        out = kmv_jaccard(rd.from_pandas(docs).repartition(parts), k=256)
        assert out["jaccard_pm"].iloc[0] == 1000  # exact path, J = 1
        assert out["n_inter"].iloc[0] == 3        # 3 distinct shingles

    disjoint = pd.DataFrame(
        {
            "doc_id": np.array(train_ids[:3] + val_ids[:3], np.int64),
            "text": ["a b c d"] * 3 + ["x y z w"] * 3,
        }
    )
    out = kmv_jaccard(rd.from_pandas(disjoint), k=256)
    assert out["jaccard_pm"].iloc[0] == 0
    assert out["n_inter"].iloc[0] == 0

    # estimate path: union >> k, roughly half the shingles shared
    # (identical texts appear verbatim on BOTH sides; the rest unique)
    rng = np.random.default_rng(8)

    def mk(n, tag):
        return [
            " ".join(f"{tag}{rng.integers(0, 100000)}" for _ in range(50))
            for _ in range(n)
        ]

    n_side = min(36, len(train_ids), len(val_ids))
    half = n_side // 2
    shared_docs = mk(half, "sh")
    big = pd.DataFrame(
        {
            "doc_id": np.array(train_ids[:n_side] + val_ids[:n_side], np.int64),
            "text": shared_docs + mk(n_side - half, "tr")
            + shared_docs + mk(n_side - half, "va"),
        }
    )
    est = kmv_jaccard(rd.from_pandas(big), k=128)
    est2 = kmv_jaccard(rd.from_pandas(big).repartition(7), k=128)
    pd.testing.assert_frame_equal(est, est2)  # hash-order pure
    assert 0 < est["jaccard_pm"].iloc[0] < 1000


def test_cms_registers_exact_and_estimate(ray_session):
    """CMS registers are partition-invariant mergeable partials; the
    point estimate never underestimates and is exact without collisions."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import cms_point_estimate, cms_registers

    docs = [
        {"text": "apple apple banana"},
        {"text": "apple cherry"},
        {"text": ""},
    ]
    true = {"apple": 3, "banana": 1, "cherry": 1}
    frames = []
    for parts in (1, 3):
        regs = (
            cms_registers(rd.from_items(docs).repartition(parts), depth=4, width=256)
            .to_pandas()
            .sort_values(["row_idx", "col_idx"])
            .reset_index(drop=True)
        )
        frames.append(regs)
    assert frames[0].equals(frames[1])  # partition invariance
    regs = frames[0]
    assert regs.cnt.sum() == 4 * 5  # every instance in every row
    for tok, n in true.items():
        est = cms_point_estimate(regs, tok, depth=4, width=256)
        assert est >= n
    # 3 distinct tokens in 256 columns: no collisions, estimates exact
    assert cms_point_estimate(regs, "apple") == 3
    assert cms_point_estimate(regs, "durian") == 0


def test_winnow_fingerprints_guarantee_and_edges():
    """Winnowing contract: shared runs of ≥ w+k-1 tokens share a
    fingerprint; short docs take one truncated window; <k tokens emit
    nothing; selection is deterministic (leftmost min)."""
    from sanskrit_ocr_ray.stages.text_analysis import winnow_batch
    from sanskrit_ocr_ray.util import md5_u64

    k, w = 3, 4
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(40)]
    base = [vocab[i] for i in rng.integers(0, 40, 60)]
    shared = [vocab[i] for i in rng.integers(0, 40, w + k - 1)]  # 6 tokens
    doc_a = " ".join(base[:20] + shared + base[20:40])
    doc_b = " ".join(base[40:] + shared)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([doc_a, doc_b, "a b", "x y z w"]),
        }
    )
    out = winnow_batch(batch, k=k, w=w).to_pandas()
    # doc 3 has < k tokens → no rows
    assert not (out.doc_id == 3).any()
    # doc 4 has 2 shingles < w → exactly one truncated-window selection,
    # the leftmost min of the two shingle hashes
    d4 = out[out.doc_id == 4]
    h1, h2 = md5_u64("x y z"), md5_u64("y z w")
    want_pos = 1 if h1 <= h2 else 2
    assert list(d4.pos) == [want_pos]
    assert list(d4.fp) == [f"{min(h1, h2):016x}"]
    # the winnowing guarantee: docs 1 and 2 share the 6-token run →
    # they must share at least one fingerprint value
    fps_a = set(out[out.doc_id == 1].fp)
    fps_b = set(out[out.doc_id == 2].fp)
    assert fps_a & fps_b
    # selection density: ~1/w of shingles, never more than #windows
    n_shingles = 63 - k + 1
    assert 0 < len(out[out.doc_id == 1]) <= n_shingles - w + 1


def test_token_gini_hand_values():
    from sanskrit_ocr_ray.stages.text_analysis import token_gini_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a a a a",       # one type: gini 0 (template/spam)
                    "a b c d",       # uniform: 1e6*(16-4)//16 = 750000
                    "a a a b",       # skewed: 1e6*(16-10)//16 = 375000
                    "",              # token-less: no row
                ]
            ),
        }
    )
    out = token_gini_batch(batch).to_pandas().set_index("doc_id")
    assert 4 not in out.index
    assert out.loc[1, "gini_x1m"] == 0
    assert out.loc[2, "gini_x1m"] == 750_000
    assert out.loc[3, "gini_x1m"] == 375_000
    assert out.loc[2, "n_toks"] == 4


def test_type_token_ratio_hand_cases():
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.text_analysis import type_token_ratio_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                "a b a b a",          # 2 distinct / 5 → 400
                "x y z",              # 3/3 → 1000
                "",                   # token-less → no row
                "w  w",               # double space: 1 distinct / 2 → 500
            ],
        }
    )
    out = type_token_ratio_batch(t).to_pandas()
    assert out.doc_id.tolist() == [1, 2, 4]
    assert out.ttr_pm.tolist() == [400, 1000, 500]


def test_vectorized_scoring_matches_python_reference():
    """Parity pin for the Arrow-kernel rewrites: token_count / lang_id /
    quality_score must reproduce the original per-row Python semantics
    exactly on adversarial inputs (tabs, newlines, unicode, empties,
    nulls, multi-space runs)."""
    import re

    from sanskrit_ocr_ray.stages.text_analysis import (
        STOPWORDS,
        _EN_STOP,
        _LANGS,
        _STOPSETS,
    )

    WS = re.compile(r"\S+")
    BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    texts = [
        "", None, "  ", "the cat and a dog", "der\thund ist", "a\nb c",
        "तत्र श्लोकः ॥१॥", "don't stop-me now2", "el los una", "the the the",
        "x  y   z", " leading", "trailing ", "\t\n", "的 是 了", "the der",
    ]
    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
    )

    tc = token_count_batch(t).to_pandas()
    for i, s in enumerate(texts):
        s = s or ""
        assert tc.n_ws_tokens[i] == len(WS.findall(s)), (i, s)
        assert tc.n_bpe_tokens[i] == len(BPE.findall(s)), (i, s)

    li = lang_id_batch(t).to_pandas()
    for i, s in enumerate(texts):
        toks = (s or "").split(" ")
        best_lang, best_n = "und", 0
        for lang in _LANGS:
            n = sum(tok in _STOPSETS[lang] for tok in toks)
            if n > best_n:
                best_lang, best_n = lang, n
        assert li.pred_lang[i] == best_lang, (i, s)

    q = quality_score_batch(t).to_pandas()
    for i, s in enumerate(texts):
        s = s or ""
        toks = WS.findall(s)
        k = len(toks)
        assert q.q_chars[i] == len(s)
        assert q.q_tokens[i] == k
        assert q.q_mean_tok_len_x100[i] == (
            (100 * sum(len(w) for w in toks)) // k if k else 0
        )
        n_stop = sum(w in _EN_STOP for w in s.split(" "))
        assert q.q_stop_pct[i] == ((100 * n_stop) // k if k else 0)


def test_lang_confusion_planted(ray_session):
    """Planted labels vs heuristic predictions: exact cross-tab cells,
    partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.text_analysis import lang_confusion

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "fr"],
            "text": [
                "the cat and a dog",      # en → en (correct)
                "xyzzy qwerty",           # en → und (miss)
                "der hund ist gut",       # de → de (correct)
                "the the the",            # de → en (confusion)
                "le chat dans les pour",  # fr → fr (correct)
            ],
        }
    )
    want = {
        ("de", "de"): 1, ("de", "en"): 1, ("en", "en"): 1,
        ("en", "und"): 1, ("fr", "fr"): 1,
    }
    for parts in (1, 3):
        out = lang_confusion(rd.from_pandas(df).repartition(parts))
        got = {
            (r.lang, r.pred_lang): int(r.n_docs) for r in out.itertuples()
        }
        assert got == want, (parts, got)


def test_char_class_profile_hand_case():
    from sanskrit_ocr_ray.stages.text_analysis import char_class_profile_batch

    out = char_class_profile_batch(
        _t(["ab1 !", "", "तत्र", None])
    ).to_pandas()
    # "ab1 !": 5 chars → 2 letters, 1 digit, 1 space, 1 other
    assert out.iloc[0].tolist() == [0, 5, 400, 200, 200, 200]
    assert out.iloc[1].tolist() == [1, 0, 0, 0, 0, 0]
    # Devanagari: 4 code points, none ASCII-letter/digit/space → other
    assert out.iloc[2].tolist() == [2, 4, 0, 0, 0, 1000]
    assert out.iloc[3].tolist() == [3, 0, 0, 0, 0, 0]
