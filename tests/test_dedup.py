"""Dedup family on a corpus with planted exact + near duplicates."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # exact dup of 1
        {"doc_id": 3, "text": base.replace("lazy", "sleepy")},  # near dup of 1
        {"doc_id": 4, "text": "completely different words about ray data pipelines"},
        {"doc_id": 5, "text": "completely different words about ray data pipelines"},
        {"doc_id": 6, "text": "unrelated text mentioning nothing shared with others"},
    ]
    return rd.from_items(rows)


def test_exact_dedup_min_id_tiebreak(docs_ds):
    from sanskrit_ocr_ray.stages.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert sorted(out.doc_id) == [1, 3, 4, 6]  # 2 and 5 removed, min id kept


def test_minhash_lsh_clusters_planted_dupes(docs_ds):
    from sanskrit_ocr_ray.stages.dedup import minhash_lsh_clusters

    out = minhash_lsh_clusters(docs_ds, threshold_pm=700).to_pandas()
    rep = dict(zip(out.doc_id, out.cluster_rep))
    assert rep[2] == 1  # exact dup clusters with rep=min id
    assert rep[3] == 1  # near dup (1 word of 14 differs, jaccard ≈ 0.87)
    assert rep[5] == 4
    assert rep[6] == 6  # singleton maps to itself
    assert len(out) == 6  # every doc present


def test_simhash_dup_pairs_exact_banding(docs_ds):
    from sanskrit_ocr_ray.stages.dedup import simhash_dup_pairs

    out = simhash_dup_pairs(docs_ds, max_hamming=6).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in pairs  # identical text → hamming 0
    assert (4, 5) in pairs
    ham = dict(zip(zip(out.doc_a, out.doc_b), out.hamming))
    assert ham[(1, 2)] == 0


def test_ngram_jaccard_pairs(docs_ds):
    from sanskrit_ocr_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(docs_ds, threshold_pm=500).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in pairs
    jacc = dict(zip(zip(out.doc_a, out.doc_b), out.jacc_pm))
    assert jacc[(1, 2)] == 1000  # identical → Jaccard 1.000
    # near dup shares most 3-grams but not all
    if (1, 3) in pairs:
        assert 500 <= jacc[(1, 3)] < 1000


def test_minhash_signatures_deterministic(docs_ds):
    from sanskrit_ocr_ray.stages.dedup import minhash_signatures_batch
    import pyarrow as pa

    t = pa.table({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
    a = minhash_signatures_batch(t).to_pandas()
    b = minhash_signatures_batch(t).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # identical text → identical signature across docs
    s1 = a[a.doc_id == 1].minhash.tolist()
    s2 = a[a.doc_id == 2].minhash.tolist()
    assert s1 == s2


def test_minhash_lsh_high_dup_rate_10k(ray_session):
    """Scale shape: 10⁴ docs at ~50% dup rate — the regime where round 1's
    driver-side verify/union-find would have held O(corpus) state. The
    rewritten operator keeps every step a Dataset pass; this asserts the
    clustering is still exact (groups of 5 exact dups → min-id rep)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import minhash_lsh_clusters

    n, group = 10_000, 5  # 2000 groups of 5 identical docs
    rows = [
        {
            "doc_id": i,
            # disjoint token sets across groups (cross-group Jaccard = 0)
            "text": " ".join(f"g{i // group}w{j}" for j in range(8)),
        }
        for i in range(n)
    ]
    # small_edges=0 forces the distributed BSP component path (the scale
    # path) — the default would take the single-task small-graph shortcut
    out = minhash_lsh_clusters(
        rd.from_items(rows), threshold_pm=700, small_edges=0
    ).to_pandas()
    assert len(out) == n
    rep = dict(zip(out.doc_id, out.cluster_rep))
    assert all(rep[i] == (i // group) * group for i in range(n))


def test_components_small_graph_fast_path_parity(ray_session):
    """The ≤small_edges single-task union-find must produce bit-identical
    (node, rep) labels to the BSP path, including string ids and
    multi-hop chain components."""
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import _components_bsp

    edges = pd.DataFrame(
        {
            "a": ["d1", "d2", "d3", "x9", "m5"],
            "b": ["d2", "d3", "d4", "x1", "m5"],  # chain, pair, self-loop
        }
    )
    ds = rd.from_pandas(edges)
    fast = _components_bsp(ds, pa.string()).to_pandas()
    bsp = _components_bsp(ds, pa.string(), small_edges=0).to_pandas()
    f = fast.sort_values("node").reset_index(drop=True)
    s = bsp.sort_values("node").reset_index(drop=True)
    assert f.equals(s)
    got = dict(zip(f.node, f.rep))
    assert got == {
        "d1": "d1", "d2": "d1", "d3": "d1", "d4": "d1",
        "x9": "x1", "x1": "x1", "m5": "m5",
    }


def test_kgram_dup_spans_planted(ray_session):
    """Hand-computable window-dup counts, incl. same-doc repeats."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import kgram_dup_spans

    rows = [
        # 1 & 2 share the exact 6-token prefix "a b c d e f" (one k=4
        # window dup at positions 0,1,2 of each)
        {"doc_id": 1, "text": "a b c d e f x y"},
        {"doc_id": 2, "text": "a b c d e f p q"},
        # 3 repeats its own 4-gram "r r r r" twice (positions 0 and 4)
        {"doc_id": 3, "text": "r r r r r r r r"},
        # 4 too short for any window
        {"doc_id": 4, "text": "u v w"},
        # 5 has unique windows only
        {"doc_id": 5, "text": "m n o p q s t"},
    ]
    out = kgram_dup_spans(rd.from_items(rows), k=4).to_pandas()
    got = dict(zip(out.doc_id, out.dup_kgrams))
    # doc 3: all five windows are "r r r r" → every position duplicated
    assert got == {1: 3, 2: 3, 3: 5}


def test_kgram_dup_spans_matches_naive_model(ray_session):
    """Randomized parity vs an in-memory counter model."""
    import collections
    import random

    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import kgram_dup_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30)))}
        for i in range(60)
    ]
    k = 5
    counts: collections.Counter = collections.Counter()
    per_doc: dict[int, list[tuple]] = {}
    for r in rows:
        toks = r["text"].split(" ")
        grams = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        per_doc[r["doc_id"]] = grams
        counts.update(grams)
    expect = {
        d: sum(counts[g] >= 2 for g in grams)
        for d, grams in per_doc.items()
        if sum(counts[g] >= 2 for g in grams)
    }
    out = kgram_dup_spans(rd.from_items(rows), k=k).to_pandas()
    assert dict(zip(out.doc_id, out.dup_kgrams)) == expect


def test_fuzzy_dedup_survivors_planted(docs_ds):
    from sanskrit_ocr_ray.stages.dedup import fuzzy_dedup_survivors

    out = fuzzy_dedup_survivors(docs_ds, threshold_pm=700).to_pandas()
    got = dict(zip(out.doc_id, out.cluster_size))
    # {1,2,3} near-dup component → keeper 1 size 3; {4,5} → 4 size 2; 6 solo
    assert got == {1: 3, 4: 2, 6: 1}


def test_typo_token_pairs_matches_bruteforce(ray_session):
    import itertools

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import _edit1, typo_token_pairs

    rng = np.random.default_rng(41)
    base = ["".join(rng.choice(list("abcd"), rng.integers(2, 7))) for _ in range(60)]
    # guaranteed structure: substitutions, deletions, insertions, dupes
    vocab = set(base)
    for t in base[:20]:
        vocab.add("x" + t)          # insertion at front
        vocab.add(t[1:] or "a")     # deletion
        vocab.add("z" + t[1:])      # substitution at front
    vocab = sorted(vocab)

    def brute(a, b):  # independent DP edit distance
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                cur = min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
                prev, d[j] = d[j], cur
        return d[lb]

    want = sorted(
        (a, b) for a, b in itertools.combinations(vocab, 2) if brute(a, b) == 1
    )
    # _edit1 agrees with the DP on every pair (including distance 0 and 2+)
    for a, b in itertools.combinations(vocab[:30], 2):
        assert _edit1(a, b) == (brute(a, b) == 1), (a, b)

    for parts in (1, 5):
        ds = rd.from_arrow(
            pa.table({"token": pa.array(vocab * 2, pa.string())})  # dupes
        ).repartition(parts)
        out = typo_token_pairs(ds, n_buckets=16).to_pandas()
        got = sorted(zip(out["t1"], out["t2"]))
        assert got == want, parts


def test_snm_pairs_window_and_threshold(ray_session):
    """Sorted-neighborhood: near-identical docs adjacent in key order
    pair up; records farther than `window` apart in the sort order never
    pair even if identical; partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import sorted_neighborhood_pairs

    # keys sort as: aaa...(1), aab...(2), zz0..zz9 filler, zzz(8), zzz(9)
    filler = [
        {"doc_id": 10 + i, "text": f"zz{i} unique_{i} filler_{i}"} for i in range(6)
    ]
    docs = [
        {"doc_id": 1, "text": "aaa common tokens here exact"},
        {"doc_id": 2, "text": "aab common tokens here exact"},  # adjacent, J=4/6
        {"doc_id": 8, "text": "zzz same same body words"},
        {"doc_id": 9, "text": "zzz same same body words"},      # identical, adjacent
    ] + filler
    for parts in (1, 4):
        out = (
            sorted_neighborhood_pairs(
                rd.from_items(docs).repartition(parts),
                key_chars=24,
                window=2,
                threshold_pm=600,
                n_buckets=4,
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        got = set(zip(out.doc_a, out.doc_b, out.j_pm))
        # (1,2): tokens {aaa,common,tokens,here,exact} vs {aab,...}: inter 4, union 6 -> 666
        # (8,9): identical distinct sets {zzz,same,body,words}: 1000
        assert (1, 2, 666) in got
        assert (8, 9, 1000) in got
        # docs 1 and 8 are > window apart in sort order: never paired
        assert not any(a == 1 and b == 8 for a, b, _ in got)
        assert len(got) == 2


def test_snm_pairs_empty_docs_no_division(ray_session):
    """Token-less docs adjacent in sort order produce no pair (union=0)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import sorted_neighborhood_pairs

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "real words here"},
        ]
    )
    out = sorted_neighborhood_pairs(
        ds, window=2, threshold_pm=500, n_buckets=2
    ).to_pandas()
    assert len(out) == 0


def test_ppjoin_pairs_matches_bruteforce(ray_session):
    """Prefix-filtered join finds EXACTLY the brute-force Jaccard ≥ t
    pairs on a corpus with planted near-dups (no pair missed by the
    prefix/length filters, none invented, jacc_pm equal)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import ppjoin_pairs

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(120)]
    docs = {}
    for d in range(30):
        docs[d] = [vocab[i] for i in rng.randint(0, len(vocab), 30)]
    for d in range(30, 40):  # planted near-dup of doc d-30 with 2 edits
        base = list(docs[d - 30])
        for pos in rng.randint(0, len(base), 2):
            base[pos] = vocab[int(rng.randint(0, len(vocab)))]
        docs[d] = base
    rows = [
        {"doc_id": d, "text": " ".join(toks)} for d, toks in docs.items()
    ]
    n, t = 3, 400

    def gramset(toks):
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    exp = {}
    for a in docs:
        for b in docs:
            if a < b:
                A, B = gramset(docs[a]), gramset(docs[b])
                i = len(A & B)
                u = len(A | B)
                if u and 1000 * i >= t * u:
                    exp[(a, b)] = (1000 * i) // u
    assert len(exp) >= 8  # the planted dups actually qualify

    out = ppjoin_pairs(
        rd.from_items(rows).repartition(5),
        n=n, threshold_pm=t, n_buckets=8,
    ).to_pandas()
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): int(r["jacc_pm"])
        for _, r in out.iterrows()
    }
    assert got == exp


def test_containment_catches_subset_docs(ray_session):
    """A snippet fully contained in a much longer page: containment
    1000 but Jaccard far below any dedup threshold — the asymmetric
    near-dup class ngram_jaccard_pairs structurally misses."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    long_toks = [vocab[i] for i in rng.integers(0, 500, 400)]
    snippet = " ".join(long_toks[100:110])  # 10 tokens inside the page
    page = " ".join(long_toks)
    other = " ".join(vocab[i] for i in rng.integers(0, 500, 50))
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": page},
            {"doc_id": 2, "text": snippet},
            {"doc_id": 3, "text": other},
        ]
    )
    cont = containment_pairs(ds, threshold_pm=800).to_pandas()
    assert len(cont) == 1
    assert (cont.doc_a[0], cont.doc_b[0], cont.cont_pm[0]) == (1, 2, 1000)
    # Jaccard at the SAME pair: 8 shared 3-grams / ~398 union → ~20 pm
    jacc = ngram_jaccard_pairs(ds, threshold_pm=500).to_pandas()
    assert len(jacc) == 0


def test_dup_rate_by_group_planted(ray_session):
    """Planted duplicates: content 'X' appears in 3 docs across two
    sources, everything else unique — exact per-source dup counts and
    integer per-mille, partition-invariant."""
    import pandas as pd

    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import dup_rate_by_group

    df = pd.DataFrame(
        {
            "source": ["a", "a", "a", "b", "b"],
            "text": ["X", "X", "u1", "X", "u2"],
        }
    )
    for parts in (1, 3):
        out = dup_rate_by_group(rd.from_pandas(df).repartition(parts))
        got = {
            r.source: (int(r.n_docs), int(r.n_dup), int(r.dup_pm))
            for r in out.itertuples()
        }
        # 'X' is corpus-wide duplicated (3 copies), so both of b's X-doc
        # and a's two X-docs count as dup members
        assert got == {"a": (3, 2, 666), "b": (2, 1, 500)}, (parts, got)


def test_dup_cluster_size_hist_planted(ray_session):
    """Planted clusters: 'X'×3, 'Y'×2, three uniques → histogram
    {3: 1, 2: 1}; uniques excluded; partition-invariant."""
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.dedup import dup_cluster_size_hist

    df = pd.DataFrame({"text": ["X", "X", "X", "Y", "Y", "u1", "u2", "u3"]})
    for parts in (1, 4):
        out = dup_cluster_size_hist(rd.from_pandas(df).repartition(parts))
        got = dict(zip(out.cluster_size.tolist(), out.n_clusters.tolist()))
        assert got == {2: 1, 3: 1}, (parts, got)
