"""Training-corpus assembly ops (stages/corpus.py): planted-PII redaction,
packing invariants, sampling determinism, split stability, incremental mix.

Oracle parity for all five runs in test_oracle_parity.py / the driver gate;
these tests cover the semantics the sf tables can't exercise (real PII
strings, subset-invariance, growth-invariance).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _docs_ds(df):
    import ray.data as rd

    return rd.from_pandas(df.copy())


def test_redact_pii_planted(ray_session):
    from sanskrit_ocr_ray.stages.corpus import redact_pii

    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "contact john.doe+x@example.co.uk today",
                "see https://example.com/a?b=1 and http://x.io",
                "call 5551234567 or 123 no",
                "email a@b.com at https://c.d/e ref 99991111",
                "plain devanagari अआइ text",
            ],
        }
    )
    out = redact_pii(_docs_ds(df)).to_pandas().sort_values("doc_id")
    assert out.text_redacted.tolist() == [
        "contact <EMAIL> today",
        "see <URL> and <URL>",
        "call <NUM> or 123 no",
        "email <EMAIL> at <URL> ref <NUM>",
        "plain devanagari अआइ text",
    ]
    assert out.n_pii.tolist() == [1, 2, 1, 3, 0]
    # byte-exact vs the DuckDB oracle's regex engine on the same frame
    import __ray_entry__ as em

    con = duckdb.connect()
    con.register("documents", df)
    o = con.sql(em.oracle_sql()["redact_pii"]).df().sort_values("doc_id")
    assert o.text_redacted.tolist() == out.text_redacted.tolist()
    assert o.n_pii.tolist() == out.n_pii.tolist()


def test_pack_sequences_matches_window_model(ray_session):
    from sanskrit_ocr_ray.stages.corpus import pack_sequences
    from sanskrit_ocr_ray.util import md5_u64

    rng = np.random.default_rng(3)
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(["w"] * int(k)) for k in rng.integers(1, 60, n)],
        }
    )
    out = (
        pack_sequences(_docs_ds(df), budget=64, n_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference model: exclusive cumsum // budget within md5-ordered bucket
    h = np.array([md5_u64(str(i)) for i in df.doc_id], dtype=np.uint64)
    ntok = df.text.str.split().str.len().to_numpy()
    exp = {}
    for b in range(8):
        idx = np.where(h % 8 == b)[0]
        idx = idx[np.argsort(h[idx], kind="stable")]
        cum = np.concatenate(([0], np.cumsum(ntok[idx])[:-1]))
        for i, c in zip(idx, cum):
            exp[int(df.doc_id[i])] = b * (1 << 32) + c // 64
    assert out.pack_id.tolist() == [exp[i] for i in out.doc_id]
    assert out.ntok.tolist() == ntok.tolist()
    # no pack is empty; ids are dense enough to be usable as shard keys
    assert (out.groupby("pack_id").size() >= 1).all()


def test_stratified_sample_deterministic_and_capped(ray_session):
    from sanskrit_ocr_ray.stages.corpus import stratified_sample

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "lang": rng.choice(["en", "de", "sa"], 300, p=[0.8, 0.15, 0.05]),
        }
    )
    a = stratified_sample(_docs_ds(df), group_col="lang", k=7).to_pandas()
    b = stratified_sample(_docs_ds(df), group_col="lang", k=7).to_pandas()
    assert (a.groupby("lang").size() <= 7).all()
    assert set(a.lang) == set(df.lang)
    pd.testing.assert_frame_equal(
        a.sort_values(["lang", "doc_id"]).reset_index(drop=True),
        b.sort_values(["lang", "doc_id"]).reset_index(drop=True),
    )


def test_train_val_split_subset_invariant(ray_session):
    from sanskrit_ocr_ray.stages.corpus import train_val_split

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    full = train_val_split(_docs_ds(df)).to_pandas()
    sub = train_val_split(_docs_ds(df.iloc[::3])).to_pandas()
    m = full.set_index("doc_id")["split"]
    assert (sub.set_index("doc_id")["split"] == m.loc[sub.doc_id].values).all()
    frac = (full.split == "val").mean()
    assert 0.06 < frac < 0.14  # ~10% ± hash noise


def test_corpus_mix_growth_invariant(ray_session):
    from sanskrit_ocr_ray.stages.corpus import corpus_mix

    small = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64), "text": ["x"] * 100}
    )
    big = pd.DataFrame(
        {"doc_id": np.arange(250, dtype=np.int64), "text": ["x"] * 250}
    )
    a = corpus_mix(
        [("d", _docs_ds(small), "doc_id", "text")], permille={"d": 400}
    ).to_pandas()
    b = corpus_mix(
        [("d", _docs_ds(big), "doc_id", "text")], permille={"d": 400}
    ).to_pandas()
    assert set(a.rec_id) == set(b[b.rec_id < 100].rec_id)
    assert 0.3 < len(b) / 250 < 0.5


def test_vocab_build_rank_and_floor(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import vocab_build

    rows = [
        {"text": "b b b a a a"},  # a×3+2=5, b×3
        {"text": "a a c c c c"},
        {"text": "d"},  # below floor
    ]
    out = vocab_build(rd.from_items(rows), min_count=3).to_pandas()
    # freq: a=5, c=4, b=3; d=1 dropped; ties none
    assert list(out.token) == ["a", "c", "b"]
    assert list(out.freq) == [5, 4, 3]
    assert list(out.token_id) == [0, 1, 2]


def test_vocab_build_tie_break_alphabetical(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import vocab_build

    out = vocab_build(
        rd.from_items([{"text": "z y z y x"}]), min_count=1
    ).to_pandas()
    # z=2, y=2 tie → alphabetical; x=1 last
    assert list(out.token) == ["y", "z", "x"]
    assert list(out.token_id) == [0, 1, 2]


def test_chunk_documents_windows_and_tail(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    rows = [
        {"doc_id": 1, "text": " ".join(toks)},  # 10 tokens
        {"doc_id": 2, "text": ""},  # nothing emitted
        {"doc_id": 3, "text": "solo"},
    ]
    out = (
        chunk_documents(rd.from_items(rows), chunk_tokens=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    d1 = out[out.doc_id == 1]
    # starts 0,3,6,9 → windows of 4,4,4,1 tokens with 1-token overlap
    assert list(d1.chunk_id) == [0, 1, 2, 3]
    assert list(d1.ntok) == [4, 4, 4, 1]
    assert d1.iloc[0].chunk == "t0 t1 t2 t3"
    assert d1.iloc[1].chunk == "t3 t4 t5 t6"
    assert d1.iloc[3].chunk == "t9"
    assert 2 not in set(out.doc_id)
    assert list(out[out.doc_id == 3].chunk) == ["solo"]


def test_encode_documents_oov_and_order(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import encode_documents

    # "a" x5 passes the floor; "b" x5 too; "z" once → OOV
    rows = [{"doc_id": i, "text": "a b"} for i in range(1, 6)]
    rows.append({"doc_id": 6, "text": "z a"})
    rows.append({"doc_id": 7, "text": ""})  # token-less: no row
    out = encode_documents(rd.from_items(rows)).to_pandas()
    got = {r.doc_id: (r.ids, r.ntok, r.n_oov) for r in out.itertuples()}
    # a freq 6, b freq 5 → ids a=0, b=1; z OOV → -1
    assert got[1] == ("0 1", 2, 0)
    assert got[6] == ("-1 0", 2, 1)
    assert 7 not in got


def test_pmi_collocations_ranking(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import pmi_collocations

    # "x y" always together (lift high); "a b" common words co-occurring
    rows = [{"doc_id": i, "text": "x y"} for i in range(5)]
    rows += [{"doc_id": 10 + i, "text": "a b a c a b"} for i in range(5)]
    out = pmi_collocations(
        rd.from_items(rows), min_pair=5, k=3
    ).to_pandas()
    assert list(out.iloc[0][["w1", "w2"]]) == ["x", "y"]  # exclusive pair wins
    # N=40 tokens, c_xy=5, c_x=c_y=5 → 10^6·5·40//25 = 8_000_000
    assert out.iloc[0].score_x1m == 8_000_000


def test_priority_sample_matches_naive_and_favors_weight(ray_session):
    """Distributed partial-top-k == naive full-scan priority sampling; a
    row with overwhelming weight must be selected."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import priority_sample
    from sanskrit_ocr_ray.util import md5_u64

    rows = [{"doc_id": i, "n_chars": (i % 7) + 1} for i in range(500)]
    rows.append({"doc_id": 9999, "n_chars": 10**15})  # always wins
    ds = rd.from_items(rows).repartition(8)
    out = priority_sample(ds, k=20).to_pandas()

    keys = sorted(
        ((md5_u64(str(r["doc_id"])) >> 1) // max(r["n_chars"], 1), r["doc_id"])
        for r in rows
    )[:20]
    assert list(zip(out.sample_key.tolist(), out.doc_id.tolist())) == keys
    assert 9999 in out.doc_id.tolist()


def test_apply_merge_batch_greedy_runs():
    from sanskrit_ocr_ray.stages.corpus import _apply_merge_batch

    # L == R run: "x x x x x" merges alternate pairs from the head
    out = _apply_merge_batch([" x  x  x  x  x "], "x", "x")
    assert out == [" x_x  x_x  x "]
    # adjacent distinct pairs all merge; boundaries stay two-space
    out = _apply_merge_batch([" a  x  y  x  y  b ", " x  y "], "x", "y")
    assert out == [" a  x_y  x_y  b ", " x_y "]
    # no match / empty doc are no-ops
    assert _apply_merge_batch([" a  b ", " "], "q", "z") == [" a  b ", " "]


def test_bpe_merges_matches_scalar_trainer(ray_session):
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import bpe_merges

    docs = [
        "the cat sat on the mat",
        "the cat ate the cat food",
        "a cat and the cat sat",
        "the the the the",
    ]

    def scalar_train(texts, k):
        seqs = [t.split() for t in texts]
        merges = []
        for step in range(1, k + 1):
            census = {}
            for s in seqs:
                for a, b in zip(s, s[1:]):
                    census[(a, b)] = census.get((a, b), 0) + 1
            if not census:
                break
            (l, r), c = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((step, l, r, c))
            new_seqs = []
            for s in seqs:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + "_" + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                new_seqs.append(out)
            seqs = new_seqs
        return merges

    want = scalar_train(docs, 4)
    for parts in (1, 3):
        got = bpe_merges(
            rd.from_pandas(pd.DataFrame({"text": docs})).repartition(parts),
            n_merges=4,
        )
        assert list(map(tuple, got.to_numpy())) == [
            (s, l, r, c) for (s, l, r, c) in want
        ], parts


def test_shard_assign_is_exact_global_rank(ray_session):
    """Bucketed two-pass ranking equals the global sort it avoids: ranks
    are a permutation of 0..n-1, shards are full except the last, and
    the mapping is invariant to input partitioning."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import shard_assign
    from sanskrit_ocr_ray.util import md5_u64_many

    ids = np.arange(1000, 1137, dtype=np.int64)  # 137 rows, 3 shards of ≤64
    rows = [{"doc_id": int(i)} for i in ids]
    out = (
        shard_assign(rd.from_items(rows).repartition(7), shard_size=64, n_buckets=16)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert sorted(out["rank"]) == list(range(len(ids)))
    want = ids[np.lexsort((ids, md5_u64_many([str(v) for v in ids])))]
    assert out["doc_id"].tolist() == want.tolist()
    sizes = out.groupby("shard_id").size()
    assert sizes.iloc[:-1].eq(64).all() and sizes.iloc[-1] == 137 - 64 * 2
    # partitioning-invariant
    out2 = (
        shard_assign(rd.from_items(rows).repartition(2), shard_size=64, n_buckets=64)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out2.equals(out)


def test_oov_rate_by_lang_planted(ray_session):
    """Hand-computable OOV per-mille: 'hot' appears 5× (in-vocab at
    min_count=5), everything else is OOV; exact integer per-mille per
    language, partition-invariant; empty-text docs contribute nothing."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import oov_rate_by_lang

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "fr"],
            "text": [
                "hot hot rare1",        # en: 3 toks, 1 oov
                "hot rare2",            # en: 2 toks, 1 oov
                "hot rare3 rare4",      # de: 3 toks, 2 oov
                "hot",                  # de: 1 tok, 0 oov
                "",                     # fr: no tokens → no row
            ],
        }
    )
    for parts in (1, 3):
        out = oov_rate_by_lang(rd.from_pandas(df).repartition(parts))
        got = {
            r.lang: (int(r.n_tokens), int(r.n_oov), int(r.oov_pm))
            for r in out.itertuples()
        }
        assert got == {
            "en": (5, 2, 1000 * 2 // 5),
            "de": (4, 2, 500),
        }, (parts, got)


def test_vocab_coverage_planted(ray_session):
    """Hand-computable head coverage: freq ranks a(5) b(3) c(1) d(1) —
    top-1 covers 5/10, top-2 covers 8/10; k beyond the vocabulary
    covers everything; partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import vocab_coverage

    df = pd.DataFrame(
        {"text": ["a a a b", "a a b b c", "d", ""]}
    )
    for parts in (1, 3):
        out = vocab_coverage(
            rd.from_pandas(df).repartition(parts), ks=(1, 2, 100)
        )
        got = {
            int(r.k): (int(r.covered), int(r.total), int(r.coverage_pm))
            for r in out.itertuples()
        }
        assert got == {
            1: (5, 10, 500),
            2: (8, 10, 800),
            100: (10, 10, 1000),
        }, (parts, got)


def test_window_cooccurrence_planted(ray_session):
    """Hand-countable window pairs: 'a b c a' with window=3 yields
    ordered pairs at distances 1-2: (a,b) (a,c) (b,c) (b,a) (c,a) —
    exact counts, deterministic top order, partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import window_cooccurrence_topk

    df = pd.DataFrame({"text": ["a b c a", "a b"]})
    want = {
        ("a", "b"): 2,  # doc1 d1, doc2 d1
        ("a", "c"): 1, ("b", "c"): 1, ("b", "a"): 1, ("c", "a"): 1,
    }
    for parts in (1, 2):
        out = window_cooccurrence_topk(
            rd.from_pandas(df).repartition(parts), window=3, k=10
        )
        got = {(r.x, r.y): int(r.n) for r in out.itertuples()}
        assert got == want, (parts, got)
        # rank order: count desc then (x, y) asc
        assert (out.iloc[0].x, out.iloc[0].y) == ("a", "b")


def test_pii_stats_by_group_planted(ray_session):
    """Planted PII: source 'a' has one doc with an email+number and one
    clean doc; source 'b' is clean — exact counts and per-mille,
    partition-invariant. Order sensitivity: digits inside a redacted
    email are not double-counted."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.corpus import pii_stats_by_group

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            "text": [
                "mail bob12345@example.com and call 5551234",  # 1 email + 1 num
                "nothing here",
                "clean too",
            ],
        }
    )
    for parts in (1, 3):
        out = pii_stats_by_group(rd.from_pandas(df).repartition(parts))
        got = {
            r.source: (int(r.n_docs), int(r.n_docs_with_pii), int(r.n_pii),
                       int(r.pii_doc_pm))
            for r in out.itertuples()
        }
        assert got == {"a": (2, 1, 2, 500), "b": (1, 0, 0, 0)}, (parts, got)
