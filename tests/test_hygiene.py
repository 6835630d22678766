"""Corpus-hygiene operators: planted-case semantics tests."""

import numpy as np
import pandas as pd
import ray.data as rd

from sanskrit_ocr_ray.stages.hygiene import (
    contamination,
    incremental_dedup,
    keyword_search,
    salient_terms,
)


def test_contamination_planted(ray_session):
    eval_docs = pd.DataFrame(
        {"doc_id": [100, 101], "text": ["a b c d", "x y z w"]}
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "p q a b c d r",      # leaks "a b c d"
                "a b c x y z w d",    # leaks "x y z w" only (a b c d split)
                "totally clean text here",
                "a b c d and also a b c d again",  # distinct grams count once
            ],
        }
    )
    out = (
        contamination(
            rd.from_pandas(train), rd.from_pandas(eval_docs), ngram=4, n_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [1, 2, 4]
    assert out.n_contaminated.tolist() == [1, 1, 1]


def test_contamination_multi_gram_count(ray_session):
    # doc leaking two DISTINCT eval grams counts 2
    ev = pd.DataFrame({"doc_id": [9], "text": ["a b c d e"]})  # grams: abcd, bcde
    tr = pd.DataFrame({"doc_id": [1], "text": ["a b c d e"]})
    out = contamination(rd.from_pandas(tr), rd.from_pandas(ev), ngram=4, n_buckets=4)
    df = out.to_pandas()
    assert df.n_contaminated.tolist() == [2]


def test_salient_terms_ranking(ray_session):
    # "rare" appears twice in doc 1 only → df=1, score 2e6: top term.
    # "common" appears in all docs → df=3, lower score.
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "rare rare common alpha",
                "common beta beta",
                "common gamma",
            ],
        }
    )
    out = salient_terms(rd.from_pandas(docs), k=2, n_buckets=4).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("rnk")
    assert d1.term.tolist() == ["rare", "alpha"]
    assert d1.score_x1m.tolist() == [2_000_000, 1_000_000]
    assert d1.df.tolist() == [1, 1]
    # every doc has exactly k (or fewer) rows, ranks 1..k
    for did, g in out.groupby("doc_id"):
        assert sorted(g.rnk.tolist()) == list(range(1, len(g) + 1))
        assert len(g) <= 2


def test_salient_terms_tie_break(ray_session):
    # equal tf and df → ties break by term ascending
    docs = pd.DataFrame({"doc_id": [1], "text": ["zeta alpha"]})
    out = salient_terms(rd.from_pandas(docs), k=2, n_buckets=2).to_pandas()
    assert out.sort_values("rnk").term.tolist() == ["alpha", "zeta"]


def test_keyword_search_conjunctive_topk(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "cat dog cat",        # both, score 3
                "cat only here",      # missing dog
                "dog cat dog dog",    # both, score 4
                "neither word",
                "cat dog",            # both, score 2
            ],
        }
    )
    out = keyword_search(rd.from_pandas(docs), ["cat", "dog"], k=2)
    assert out.doc_id.tolist() == [3, 1]
    assert out.score.tolist() == [4, 3]
    # k larger than matches → all matches, deterministic order
    out_all = keyword_search(rd.from_pandas(docs), ["cat", "dog"], k=10)
    assert out_all.doc_id.tolist() == [3, 1, 5]


def test_incremental_dedup_planted(ray_session):
    snap = pd.DataFrame({"doc_id": [100, 101], "text": ["old one", "old two"]})
    new = pd.DataFrame(
        {
            "doc_id": [5, 2, 3, 4],
            "text": [
                "old one",      # already in snapshot → dropped
                "fresh text",   # kept
                "fresh text",   # within-new dup → min(doc_id)=2 kept
                "another new",  # kept
            ],
        }
    )
    out = (
        incremental_dedup(rd.from_pandas(new), rd.from_pandas(snap), n_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [2, 4]
    # fingerprints are 16-hex of md5
    assert all(len(f) == 16 for f in out.fingerprint)


def test_incremental_dedup_empty_snapshot(ray_session):
    snap = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                         "text": pd.Series([], dtype=object)})
    new = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "a"]})
    out = incremental_dedup(rd.from_pandas(new), rd.from_pandas(snap), n_buckets=4)
    assert out.to_pandas().doc_id.tolist() == [1]


def test_inverted_index_and_doc_freq(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import inverted_index, token_doc_freq

    rows = [
        {"doc_id": 1, "text": "a b a"},
        {"doc_id": 2, "text": "b c"},
        {"doc_id": 3, "text": ""},  # token-less: emits nothing
    ]
    ds = rd.from_items(rows)
    inv = inverted_index(ds).to_pandas()
    got = {(r.term, r.doc_id): r.tf for r in inv.itertuples()}
    assert got == {("a", 1): 2, ("b", 1): 1, ("b", 2): 1, ("c", 2): 1}
    dfreq = token_doc_freq(ds).to_pandas()
    got2 = {r.term: (r.df, r.total_tf) for r in dfreq.itertuples()}
    assert got2 == {"a": (1, 2), "b": (2, 2), "c": (1, 1)}


def test_decontaminate_drops_only_leaked_docs(ray_session):
    """Planted 8-gram leak: the leaking train doc is removed, the clean
    one (and the short-doc edge case) survive."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import decontaminate

    leak = "a b c d e f g h"
    train = rd.from_items(
        [
            {"doc_id": 1, "text": "x y " + leak + " z"},   # leaked
            {"doc_id": 2, "text": "p q r s t u v w x y"},  # clean
            {"doc_id": 3, "text": "too short"},            # <8 tokens
        ]
    )
    ev = rd.from_items([{"doc_id": 100, "text": "prefix " + leak + " suffix"}])
    out = decontaminate(train, ev, ngram=8, n_buckets=4).to_pandas()
    assert sorted(out.doc_id.tolist()) == [2, 3]


def test_bloom_new_docs_no_false_negatives_and_block_merge(ray_session):
    """Exact snapshot dups are ALWAYS dropped (Bloom has no false
    negatives) even when the snapshot spans many blocks; unique docs
    survive at a generous m_bits."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import bloom_new_docs

    snap = rd.from_items(
        [{"doc_id": i, "text": f"snapshot doc {i}"} for i in range(50)]
    ).repartition(8)  # bit-array partials must OR across blocks
    new = rd.from_items(
        [{"doc_id": 100, "text": "snapshot doc 7"},    # exact dup → dropped
         {"doc_id": 101, "text": "genuinely new doc"}]  # unique → kept
    )
    out = bloom_new_docs(new, snap, m_bits=1 << 20).to_pandas()
    assert out.doc_id.tolist() == [101]


def test_rarity_score_hand_computed(ray_session):
    """rarity = sum over token instances of 1e9 // global_tf."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import rarity_score

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "a a b"},  # a:3 total, b:1 → 2*(1e9//3) + 1e9
            {"doc_id": 2, "text": "a"},      # 1e9//3
            {"doc_id": 3, "text": ""},       # token-less → no row
        ]
    )
    out = rarity_score(ds, n_buckets=4).to_pandas().sort_values("doc_id")
    third = 1_000_000_000 // 3
    assert list(zip(out.doc_id, out.rarity)) == [
        (1, 2 * third + 1_000_000_000),
        (2, third),
    ]


def test_bm25_ranking_properties(ray_session):
    """Integer BM25: rarer terms outweigh common ones (idf), and for
    equal tf the shorter document outranks the longer (length norm);
    result is invariant to partitioning."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import bm25_topk

    filler = " ".join(["pad"] * 50)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "rare common",                       # 0: both terms, short
                "rare common " + filler,             # 1: both terms, long
                "common",                            # 2: common only
                "rare",                              # 3: rare only, short
                "common common common",              # 4: high tf common
                filler,                              # 5: no match
            ],
        }
    )
    # make 'common' genuinely common: it appears in 4 docs, 'rare' in 3
    for parts in (1, 4):
        got = bm25_topk(
            rd.from_pandas(docs).repartition(parts),
            ["rare", "common"],
            k=10,
        )
        assert 5 not in set(got["doc_id"])          # OR semantics, no match
        s = dict(zip(got["doc_id"], got["score"]))
        assert s[0] > s[1]                          # shorter beats longer
        assert s[3] > s[2]                          # rare term beats common
        assert got["score"].is_monotonic_decreasing


def test_bm25_empty_and_missing_terms(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import bm25_topk

    docs = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                         "text": ["a b", "b c", "c d"]})
    out = bm25_topk(rd.from_pandas(docs), ["zzz"], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score"]


def test_dedup_spans_planted(ray_session):
    """C4-style repeated-span removal: an 8-token span planted in 3 docs
    is removed from ALL of them; fully-removed docs vanish; order and
    kept/removed counts are exact."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import dedup_spans

    boiler = " ".join(f"b{i}" for i in range(8))  # the repeated span
    u = lambda d, k: " ".join(f"u{d}_{j}" for j in range(k))  # unique filler
    ds = rd.from_items(
        [
            # span layout is non-overlapping 8-token windows, so the
            # boilerplate must sit at a window boundary to be shared
            {"doc_id": 1, "text": boiler + " " + u(1, 8)},
            {"doc_id": 2, "text": boiler + " " + u(2, 8)},
            {"doc_id": 3, "text": boiler + " " + u(3, 3)},  # short tail span
            {"doc_id": 4, "text": u(4, 5)},                 # untouched
            {"doc_id": 5, "text": boiler},                  # fully removed
            {"doc_id": 6, "text": ""},                      # token-less
        ]
    )
    out = (
        dedup_spans(ds, span_tokens=8, min_count=3, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.doc_id) == [1, 2, 3, 4]  # 5 fully removed, 6 empty
    assert list(out.text) == [u(1, 8), u(2, 8), u(3, 3), u(4, 5)]
    assert list(out.n_kept) == [1, 1, 1, 1]
    assert list(out.n_removed) == [1, 1, 1, 0]


def test_dedup_spans_below_threshold_kept(ray_session):
    """A span repeated only twice survives min_count=3 everywhere."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import dedup_spans

    dup = " ".join(f"d{i}" for i in range(8))
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": dup},
            {"doc_id": 2, "text": dup},
        ]
    )
    out = dedup_spans(ds, span_tokens=8, min_count=3, n_buckets=4).to_pandas()
    assert sorted(out.text) == [dup, dup]
    assert out.n_removed.sum() == 0


def test_bigram_surprisal_hand_computed(ray_session):
    """surprisal = sum over bigram instances of 1e6 * c(x.) // c(x,y)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import bigram_surprisal

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "a b a b"},  # (a,b)x2, (b,a)x1
            {"doc_id": 2, "text": "a c"},      # (a,c)x1
            {"doc_id": 3, "text": "z"},        # no bigrams → no row
        ]
    )
    out = bigram_surprisal(ds, n_buckets=4).to_pandas().sort_values("doc_id")
    # c(a.)=3, c(b.)=1; surp(a,b)=1e6*3//2, surp(b,a)=1e6, surp(a,c)=3e6
    assert list(zip(out.doc_id, out.surprisal)) == [
        (1, 2 * 1_500_000 + 1_000_000),
        (2, 3_000_000),
    ]


def test_token_chi2_hand_table(ray_session):
    """Hand-checkable 2×2: token 'x' in all positive docs only, token
    'c' in every doc (excluded: zero-variance), rare token below the df
    floor excluded."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import token_chi2

    rows = []
    # 6 positive docs with 'x c', 6 negative docs with 'y c'
    for i in range(6):
        rows.append({"doc_id": i, "text": "x c", "lang": "en"})
    for i in range(6, 12):
        rows.append({"doc_id": i, "text": "y c", "lang": "de"})
    rows.append({"doc_id": 12, "text": "rare c", "lang": "en"})
    ds = rd.from_items(rows)
    out = (
        token_chi2(ds, pos_lang="en", min_df=5, k=50)
        .to_pandas()
        .set_index("token")
    )
    # 'c' is in all 13 docs -> df == N -> excluded; 'rare' df=1 -> excluded
    assert set(out.index) == {"x", "y"}
    # x: a=6,b=0,c=1,d=6  N=13 np=7  chi2 = 13*(36-0)^2/(6*7*7*6)
    want_x = 1_000_000 * 13 * (6 * 6 - 0 * 1) ** 2 // (6 * 7 * 7 * 6)
    assert out.loc["x", "chi2_x1m"] == want_x
    assert out.loc["x", "df"] == 6
    # y: a=0,b=6,c=7,d=0 -> (0*0 - 6*7)^2 = 1764
    want_y = 1_000_000 * 13 * (0 * 0 - 6 * 7) ** 2 // (6 * 7 * 7 * 6)
    assert out.loc["y", "chi2_x1m"] == want_y
    # one-class corpus -> empty result with the declared schema (NB:
    # Dataset.to_pandas() drops columns at zero rows, so assert on the
    # Dataset schema, which is what downstream stages consume)
    ds_pos = rd.from_items([{"doc_id": 1, "text": "a b", "lang": "en"}] * 8)
    empty_ds = token_chi2(ds_pos, pos_lang="en")
    assert empty_ds.count() == 0
    assert empty_ds.schema().names == ["token", "df", "chi2_x1m"]


def test_hybrid_rrf_fuses_runs(ray_session):
    """A doc ranked top by BOTH runs must outrank docs present in only
    one run; absent-run ranks report 0; determinism across repartition."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import hybrid_rrf

    docs = [
        # doc 1: query terms frequent AND token set close to the query
        {"doc_id": 1, "text": "join merge slow join merge"},
        # doc 2: lexically strong (many 'join') but diluted token set
        {"doc_id": 2, "text": "join join join " + " ".join(f"f{i}" for i in range(40))},
        # doc 3: no query terms at all -> in neither run
        {"doc_id": 3, "text": "alpha beta gamma delta"},
        # doc 4: one weak term hit
        {"doc_id": 4, "text": "slow " + " ".join(f"g{i}" for i in range(20))},
    ]
    for parts in (1, 3):
        out = hybrid_rrf(
            rd.from_items(docs).repartition(parts),
            ["join", "merge", "slow"],
            k=10,
            run_k=3,
        )
        assert list(out.doc_id)[0] == 1  # best in both runs -> top fused
        assert 3 not in set(out.doc_id)  # matched neither run
        m = out.set_index("doc_id")
        assert m.loc[1, "bm25_rank"] >= 1 and m.loc[1, "cos_rank"] >= 1
        # every reported rrf equals the recomputed fusion of its ranks
        for _, r in out.iterrows():
            want = (1_000_000 // (60 + r.bm25_rank) if r.bm25_rank else 0) + (
                1_000_000 // (60 + r.cos_rank) if r.cos_rank else 0
            )
            assert r.rrf_x1m == want


def test_salient_terms_by_group_planted(ray_session):
    """Hand-computable group TF-IDF: 'common' appears in both sources
    (df=2), 'rare_a'/'rare_b' in one each (df=1) — rarer terms outrank
    frequent shared ones; exact integer scores; partition-invariant."""
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.hygiene import salient_terms_by_group

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            "text": ["common common rare_a", "common", "common rare_b"],
        }
    )
    for parts in (1, 3):
        out = (
            salient_terms_by_group(rd.from_pandas(df).repartition(parts), k=2)
            .to_pandas()
            .sort_values(["source", "rnk"])
            .reset_index(drop=True)
        )
        rows = [
            (r.source, r.term, int(r.tf), int(r.df), int(r.score_x1m), int(r.rnk))
            for r in out.itertuples()
        ]
        assert rows == [
            ("a", "common", 3, 2, 1_500_000, 1),
            ("a", "rare_a", 1, 1, 1_000_000, 2),
            ("b", "rare_b", 1, 1, 1_000_000, 1),
            ("b", "common", 1, 2, 500_000, 2),
        ], (parts, rows)
