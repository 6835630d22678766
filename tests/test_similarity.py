"""Similarity search: brute-force exactness, IVF degradation, dup pairs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    rows = []
    for i in range(80):
        v = rng.normal(size=16)
        rows.append(
            {"vec_id": i, "embedding": v.astype(np.float32).tolist(), "label": i % 4}
        )
    # planted near-duplicate of vec 0
    v0 = np.asarray(rows[0]["embedding"])
    rows.append(
        {
            "vec_id": 999,
            "embedding": (v0 + 1e-3 * rng.normal(size=16)).astype(np.float32).tolist(),
            "label": 0,
        }
    )
    return rd.from_items(rows)


def test_knn_brute_matches_numpy_reference(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute

    out = knn_brute(emb_ds, query_ids=[0, 1], k=3).to_pandas()
    df = emb_ds.to_pandas()
    mat = np.stack([np.asarray(v, np.float64) for v in df.embedding])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = df.vec_id.to_numpy()
    for q in (0, 1):
        qv = mat[ids == q][0]
        sims = mat @ qv
        mask = ids != q
        order = np.lexsort((ids[mask], -sims[mask]))
        expect = ids[mask][order][:3].tolist()
        got = out[out.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == expect, q


def test_knn_top1_finds_planted_duplicate(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute

    out = knn_brute(emb_ds, query_ids=[0], k=1).to_pandas()
    assert out.neighbor_id.tolist() == [999]


def test_knn_ivf_full_probe_equals_brute(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute, knn_ivf

    brute = knn_brute(emb_ds, query_ids=[0, 5], k=4).to_pandas()
    ivf = knn_ivf(
        emb_ds, query_ids=[0, 5], k=4, n_centroids=4, nprobe=4
    ).to_pandas()
    b = brute.sort_values(["query_id", "rank"]).reset_index(drop=True)
    a = ivf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.neighbor_id.tolist() == b.neighbor_id.tolist()


def test_knn_ivf_partial_probe_recall(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute, knn_ivf

    brute = knn_brute(emb_ds, query_ids=[0], k=5).to_pandas()
    ivf = knn_ivf(emb_ds, query_ids=[0], k=5, n_centroids=4, nprobe=2).to_pandas()
    recall = len(set(ivf.neighbor_id) & set(brute.neighbor_id)) / 5
    assert recall >= 0.4  # approximate path returns sane results


def test_knn_lsh_zero_planes_equals_brute(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute, knn_lsh

    brute = knn_brute(emb_ds, query_ids=[0, 3], k=5).to_pandas()
    lsh = knn_lsh(emb_ds, query_ids=[0, 3], k=5, n_planes=0).to_pandas()
    cols = ["query_id", "rank", "neighbor_id"]
    a = brute[cols].sort_values(cols).reset_index(drop=True)
    b = lsh[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_knn_lsh_bucketed_recall(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute, knn_lsh

    brute = knn_brute(emb_ds, query_ids=[0], k=5).to_pandas()
    lsh = knn_lsh(emb_ds, query_ids=[0], k=5, n_planes=6, multiprobe=1).to_pandas()
    recall = len(set(lsh.neighbor_id) & set(brute.neighbor_id)) / 5
    assert recall >= 0.4  # approximate path returns sane results


def test_embedding_dup_pairs_finds_planted(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import embedding_dup_pairs

    out = embedding_dup_pairs(emb_ds, threshold_x1e6=990_000).to_pandas()
    assert (0, 999) in set(zip(out.vec_a, out.vec_b))


def test_nearest_centroid_labels_cover(emb_ds):
    from sanskrit_ocr_ray.stages.similarity import nearest_centroid

    out = nearest_centroid(emb_ds).to_pandas()
    assert len(out) == 81
    assert set(out.assigned_label) <= {0, 1, 2, 3}


def test_embedding_dup_pairs_hot_label_tiled(ray_session):
    """One label holding 80% of vectors must still produce exact pairs with
    a tiny tile size (forces the bounded-matmul tiling path)."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import embedding_dup_pairs

    rng = np.random.default_rng(7)
    rows = []
    for i in range(100):
        label = 0 if i < 80 else 1  # hot label 0
        base = np.zeros(8)
        base[i % 4] = 1.0  # 4 duplicate families inside each label
        rows.append(
            {
                "vec_id": i,
                "label": label,
                "embedding": (base + rng.normal(0, 1e-3, 8)).tolist(),
            }
        )
    ds = rd.from_items(rows)
    tiled = (
        embedding_dup_pairs(ds, threshold_x1e6=900_000, tile=16)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    whole = (
        embedding_dup_pairs(ds, threshold_x1e6=900_000, tile=10_000)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    assert len(tiled) > 0
    assert tiled.equals(whole)


def test_semantic_dedup_matches_naive_union_find(emb_ds):
    """Survivors (vec_id, cluster_size) must equal a naive all-pairs
    cosine-threshold union-find on the driver."""
    from sanskrit_ocr_ray.stages.similarity import semantic_dedup

    out = (
        semantic_dedup(emb_ds, threshold_x1e6=300_000, n_buckets=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    df = emb_ds.to_pandas()
    ids = df.vec_id.to_numpy()
    lab = df.label.to_numpy()
    mat = np.stack([np.asarray(v, np.float64) for v in df.embedding])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sims = mat @ mat.T
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if lab[i] != lab[j]:
                continue
            if int(np.floor(sims[i, j] * 1e6 + 0.5)) >= 300_000:
                a, b = find(int(ids[i])), find(int(ids[j]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
    from collections import Counter

    sizes = Counter(find(int(i)) for i in ids)
    expect = sorted(sizes.items())
    got = list(zip(out.vec_id.tolist(), out.cluster_size.tolist()))
    assert got == expect
    # the planted near-dup of vec 0 must have been collapsed
    assert 999 not in out.vec_id.tolist()
    assert out.loc[out.vec_id == 0, "cluster_size"].iloc[0] >= 2


def test_semantic_dedup_label_less_kmeans_blocking(emb_ds, ray_session):
    """block_col=None trains the k-means quantizer for blocking (SemDeDup
    proper): an exact duplicate pair always lands in one cluster and
    collapses; output still covers every vector exactly once."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import semantic_dedup

    df = emb_ds.to_pandas()
    rows = [
        {"vec_id": int(r.vec_id), "embedding": [float(x) for x in r.embedding], "label": int(r.label)}
        for r in df.itertuples()
    ]
    # plant an EXACT duplicate of vec 3 (identical vector → identical
    # centroid assignment by construction)
    dup = dict(next(r for r in rows if r["vec_id"] == 3), vec_id=888)
    ds = rd.from_items(rows + [dup])
    out = semantic_dedup(ds, block_col=None, threshold_x1e6=999_000, n_buckets=16).to_pandas()
    assert out.cluster_size.sum() == len(df) + 1  # every vector assigned once
    assert 888 not in out.vec_id.tolist()         # dup collapsed into keeper 3
    assert out.loc[out.vec_id == 3, "cluster_size"].iloc[0] >= 2


def test_hashed_text_dup_pairs_planted(ray_session):
    """Near-identical texts pair; unrelated texts don't; cross-block
    (different lang) pairs never emit even for identical text."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import hashed_text_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": base, "lang": "en"},
            {"doc_id": 2, "text": base + " extra", "lang": "en"},   # near-dup
            {"doc_id": 3, "text": "совершенно другой текст без общих слов вообще нигде", "lang": "en"},
            {"doc_id": 4, "text": base, "lang": "de"},              # other block
        ]
    ).repartition(2)
    out = hashed_text_dup_pairs(ds, threshold_pct=70).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    assert all(4 not in p for p in pairs)


def test_hashed_text_dup_pairs_overflow_guard(ray_session):
    """Docs whose squared norms push 10^4·n2a·n2b past int64 must take the
    exact Python-int verdict path and still pair correctly: with dim=1
    every shingle lands in one bucket, so n2 = s² and s≈6000 distinct
    shingles exceeds the ~5.4k int64-safe envelope."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import hashed_text_dup_pairs

    big = " ".join(f"w{i}" for i in range(6002))  # 6000 distinct 3-shingles
    other = " ".join(f"z{i}" for i in range(6002))
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": big, "lang": "en"},
            {"doc_id": 2, "text": big, "lang": "en"},    # exact dup
            {"doc_id": 3, "text": other, "lang": "en"},  # disjoint shingles
        ]
    )
    # dim=1 → every vector is parallel → cos is EXACTLY 1 for all pairs, so
    # at threshold 100% all three pairs must emit. The pre-fix int64 path
    # wraps 10000·d² (≈1.3e19 > 2^63) negative and silently drops them all.
    out = hashed_text_dup_pairs(ds, dim=1, threshold_pct=100).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_semantic_dedup_hot_cluster_bounded_tasks(ray_session):
    """One component holding 80% of the vectors, with max_task_rows far
    below its size — forces the sub-block pair-task path; components must
    still be exact (min-id keeper, correct sizes, singletons kept)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import semantic_dedup

    dim = 8
    rows = []
    for i in range(40):  # hot: identical embeddings → one 40-strong component
        v = [0.0] * dim
        v[0] = 1.0
        rows.append({"vec_id": 100 + i, "label": "hot", "embedding": v})
    for i in range(10):  # singletons: mutually orthogonal one-hots
        v = [0.0] * dim
        v[1 + (i % (dim - 1))] = 1.0
        rows.append({"vec_id": 500 + i, "label": f"s{i}", "embedding": v})
    out = semantic_dedup(
        rd.from_items(rows).repartition(4),
        threshold_x1e6=900_000,
        block_col="label",
        max_task_rows=8,   # hot block → ceil(40/8)=5 sub-blocks, 15 pair tasks
        n_buckets=8,
    ).to_pandas()
    got = dict(zip(out.vec_id, out.cluster_size))
    assert got[100] == 40                      # keeper = min id of hot comp
    assert all(got[500 + i] == 1 for i in range(10))
    assert len(out) == 11                      # 1 keeper + 10 singletons
    assert out.cluster_size.sum() == 50        # every vector assigned once


def test_kmeans_lloyd_matches_reference_model(ray_session):
    """3 Lloyd passes on a tiny synthetic set match a local numpy replay
    of the contract (floor quantization, id-rank seeding, lowest-cluster
    ties, floor-division updates, empty clusters keep their centroid)."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import kmeans_lloyd

    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    vecs = np.concatenate(
        [c + rng.normal(0, 0.05, (20, 2)) for c in centers]
    )
    rows = [
        {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))
    ]
    # k=4 > 3 true clusters → at least one cluster is likely to empty out,
    # exercising the keep-previous-centroid branch on BOTH sides
    k, iters, q = 4, 3, 1000
    out = (
        kmeans_lloyd(rd.from_items(rows).repartition(5), k=k, iters=iters, q=q)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    xq = np.floor(vecs * q).astype(np.int64)
    cent = xq[:k].copy()  # ids are 0..n-1 so rank-of-id = row order

    def assign(c):
        d2 = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1)  # first min = lowest cluster

    for _ in range(iters - 1):
        cl = assign(cent)
        for j in range(k):
            m = cl == j
            if m.any():
                cent[j] = np.floor_divide(xq[m].sum(axis=0), m.sum())
    want = assign(cent)
    assert out.vec_id.tolist() == list(range(len(vecs)))
    assert out.cluster.tolist() == want.tolist()
    assert out.cluster.nunique() <= k


def test_knn_join_matches_numpy_over_multiple_tiles(ray_session):
    """knn_join argmax + min-build-id tie-break vs a dense numpy replay,
    with the build side split across several blocks (multi-tile path)
    and an exact-tie pair planted."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import knn_join

    rng = np.random.default_rng(11)
    probe_rows = [
        {"vec_id": i, "embedding": rng.normal(size=8).astype(np.float32).tolist()}
        for i in range(17)
    ]
    build_rows = [
        {"vec_id": 100 + i, "embedding": rng.normal(size=8).astype(np.float32).tolist()}
        for i in range(37)
    ]
    # plant an exact duplicate pair in the build side: ids 200 and 201
    # (norm ~5x any random build row, so it IS probe 50's argmax)
    dup = (5.0 * rng.normal(size=8)).astype(np.float32).tolist()
    build_rows.append({"vec_id": 201, "embedding": dup})
    build_rows.append({"vec_id": 200, "embedding": dup})
    # and a probe equal to it so the dup is its argmax → tie on score
    probe_rows.append({"vec_id": 50, "embedding": [x * 3 for x in dup]})

    probe = rd.from_items(probe_rows)
    build = rd.from_items(build_rows).repartition(5)  # force multiple tiles
    got = (
        knn_join(probe, build, q=1000)
        .to_pandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )

    def quant(rows):
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        m = np.floor(
            np.stack([np.asarray(r["embedding"], np.float64) for r in rows]) * 1000
        ).astype(np.int64)
        return ids, m

    pid, pm = quant(probe_rows)
    bid, bm = quant(build_rows)
    scores = pm @ bm.T
    exp_bid, exp_score = [], []
    for r in range(len(pid)):
        s = scores[r]
        best = s.max()
        exp_score.append(best)
        exp_bid.append(bid[s == best].min())
    exp = (
        __import__("pandas")
        .DataFrame({"probe_id": pid, "build_id": exp_bid, "score": exp_score})
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == exp.to_dict("list")
    # the planted tie resolved to the SMALLER build id
    assert int(got.loc[got["probe_id"] == 50, "build_id"].iloc[0]) == 200


def test_srp_sketch_hamming_tracks_cosine(ray_session):
    """SRP signatures: identical vectors share a signature, an exact
    negation flips every plane (Hamming = planes), and near-duplicates
    land within a few bits — the Charikar angle bound."""
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import srp_sketch

    rng = np.random.default_rng(23)
    v = rng.normal(size=64)
    rows = [
        {"vec_id": 0, "embedding": v.astype(np.float32).tolist()},
        {"vec_id": 1, "embedding": v.astype(np.float32).tolist()},  # identical
        {"vec_id": 2, "embedding": (-v).astype(np.float32).tolist()},  # negated
        {"vec_id": 3, "embedding": (v + 0.01 * rng.normal(size=64)).astype(np.float32).tolist()},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = srp_sketch(ds, planes=32, q=1000).to_pandas().set_index("vec_id")["sig"]
    assert out[0] == out[1]
    ham = bin(int(out[0]) ^ int(out[2])).count("1")
    # negation flips every plane except those whose projection is 0 or
    # where floor() asymmetry flips a boundary; allow a 2-bit slack
    assert ham >= 30
    near = bin(int(out[0]) ^ int(out[3])).count("1")
    assert near <= 6


def test_pq_codes_matches_reference_model(ray_session):
    """PQ on a tiny synthetic set matches a local numpy replay of the
    per-subspace Lloyd contract (same rules as kmeans_lloyd), and the
    reported err equals the recomputed squared quantization error."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import pq_codes

    rng = np.random.default_rng(11)
    n, d, m, k, iters, q = 40, 8, 4, 3, 2, 1000
    vecs = rng.normal(0, 0.5, (n, d))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    out = (
        pq_codes(
            rd.from_items(rows).repartition(5), m=m, k=k, iters=iters, q=q
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    xq = np.floor(vecs * q).astype(np.int64)
    dsub = d // m

    def assign(xs, c):
        dist = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cl = np.argmin(dist, axis=1)  # first min = lowest cluster index
        return cl, dist[np.arange(len(xs)), cl]

    exp_codes = np.zeros((n, m), np.int64)
    exp_err = np.zeros(n, np.int64)
    for s in range(m):
        xs = xq[:, s * dsub : (s + 1) * dsub]
        cent = xs[:k].copy()  # ids 0..n-1 → rank-of-id = row order
        for _ in range(iters - 1):
            cl, _ = assign(xs, cent)
            for c in range(k):
                sel = xs[cl == c]
                if len(sel):
                    cent[c] = np.floor_divide(sel.sum(axis=0), len(sel))
        cl, dist = assign(xs, cent)
        exp_codes[:, s] = cl
        exp_err += dist

    for s in range(m):
        assert (out[f"code_{s}"].to_numpy() == exp_codes[:, s]).all(), s
    assert (out["err"].to_numpy() == exp_err).all()
    # codes actually vary (the quantizer is not degenerate on this data)
    assert len(set(map(tuple, exp_codes))) > 5


def test_pq_codes_rejects_bad_split(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import pq_codes

    rows = [{"vec_id": 0, "embedding": [0.1] * 6}]
    with __import__("pytest").raises(ValueError):
        pq_codes(rd.from_items(rows), m=4, k=1, iters=1).to_pandas()


def test_pq_adc_topk_matches_reference_model(ray_session):
    """ADC top-k equals a local replay: train codebooks per the PQ
    contract, code every vector, dist = Σ_s LUT[q, code_s], rank by
    (dist, neighbor_id) with self excluded."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.similarity import pq_adc_topk

    rng = np.random.default_rng(5)
    n, d, m, k, iters, q, k_top = 60, 8, 4, 3, 2, 1000, 4
    vecs = rng.normal(0, 0.5, (n, d))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    qids = [0, 7, 33]
    out = (
        pq_adc_topk(
            rd.from_items(rows).repartition(6), qids,
            m=m, k=k, iters=iters, q=q, k_top=k_top,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    xq = np.floor(vecs * q).astype(np.int64)
    dsub = d // m

    def assign(xs, c):
        dist = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(dist, axis=1)

    codes = np.zeros((n, m), np.int64)
    cents = []
    for s in range(m):
        xs = xq[:, s * dsub : (s + 1) * dsub]
        cent = xs[:k].copy()
        for _ in range(iters - 1):
            cl = assign(xs, cent)
            for c in range(k):
                sel = xs[cl == c]
                if len(sel):
                    cent[c] = np.floor_divide(sel.sum(axis=0), len(sel))
        codes[:, s] = assign(xs, cent)
        cents.append(cent)

    got_rows = list(
        zip(out["query_id"], out["rank"], out["neighbor_id"], out["adc_dist"])
    )
    exp_rows = []
    for qid in qids:
        dist = np.zeros(n, np.int64)
        for s in range(m):
            qs = xq[qid, s * dsub : (s + 1) * dsub]
            lut = ((qs[None, :] - cents[s]) ** 2).sum(axis=1)
            dist += lut[codes[:, s]]
        order = [i for i in np.lexsort((np.arange(n), dist)) if i != qid][:k_top]
        exp_rows.extend(
            (qid, r + 1, int(i), int(dist[i])) for r, i in enumerate(order)
        )
    assert got_rows == exp_rows


@pytest.fixture(scope="module")
def clustered_ds(ray_session):
    """Seeded 6k-vector fixture: 32 unit-norm cluster centers with tight
    Gaussian clouds — the regime IVF/LSH are built for. Realistic-config
    recall gates run against brute-force ground truth on this fixture so
    ANN tuning regressions surface (the driver oracles pin only the
    exact-degenerate configs)."""
    import ray.data as rd

    rng = np.random.default_rng(123)
    dim, n_clusters, per = 16, 32, 192
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c][None, :] + 0.05 * rng.normal(size=(per, dim))
        for p in pts:
            rows.append({"vec_id": vid, "embedding": p.astype(np.float64).tolist()})
            vid += 1
    return rd.from_items(rows).repartition(8)


def _recall_at_k(got, truth):
    per_q = []
    for q, g in truth.groupby("query_id"):
        t = set(g["neighbor_id"])
        mine = set(got[got["query_id"] == q]["neighbor_id"])
        per_q.append(len(mine & t) / max(len(t), 1))
    return float(np.mean(per_q))


def test_knn_ivf_recall_realistic_config(clustered_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute, knn_ivf

    queries = list(range(0, 6144, 307))  # 21 spread-out query ids
    truth = knn_brute(clustered_ds, query_ids=queries, k=5).to_pandas()
    got = knn_ivf(
        clustered_ds, query_ids=queries, k=5, n_centroids=32, nprobe=4
    ).to_pandas()
    r = _recall_at_k(got, truth)
    assert r >= 0.9, f"IVF recall@5 {r:.3f} < 0.9 at nlist=32 nprobe=4"


def test_knn_lsh_recall_realistic_config(clustered_ds):
    from sanskrit_ocr_ray.stages.similarity import knn_brute, knn_lsh

    queries = list(range(0, 6144, 307))
    truth = knn_brute(clustered_ds, query_ids=queries, k=5).to_pandas()
    got = knn_lsh(
        clustered_ds, query_ids=queries, k=5, n_planes=8, multiprobe=2
    ).to_pandas()
    r = _recall_at_k(got, truth)
    assert r >= 0.9, f"LSH recall@5 {r:.3f} < 0.9 at n_planes=8 multiprobe=2"
