"""Similarity search over an embedding column (list<float>).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast
  once via ``ray.put`` (never re-shipped per batch); each map_batches task
  computes a float64 numpy matmul against its batch and emits only its
  LOCAL top-k rows per query, so the final reduce sees
  O(#queries × k × #blocks) rows instead of the full similarity matrix.
- :func:`knn_ivf` — the scale path: seeded k-means-lite coarse quantizer,
  per-batch assignment, probe the ``nprobe`` nearest centroids only.
  With ``nprobe == n_centroids`` it degrades to exact search (tested).
- :func:`embedding_dup_pairs` — embedding-cosine near-dup within a
  blocking key (label), float64, emits integer-scaled output.

All distances are computed in float64 regardless of storage precision so
results are reproducible against the DuckDB oracle
(``list_cosine_similarity(CAST(e AS DOUBLE[]), ...)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import md5_u64


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if hasattr(arr, "values"):  # list<float> layout (parquet tables)
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(batch), -1)
    # Ray ArrowTensorArray extension layout (from_items over ndarrays)
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
        len(batch), -1
    )


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(ds, query_ids, *, k: int = 5, id_col: str = "vec_id", col: str = "embedding"):
    """Exact top-k cosine neighbors for each query id (excluding self).

    Returns (query_id, rank, neighbor_id); rank 1..k ordered by
    (-cosine, neighbor_id).
    """
    import ray

    q_df = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).to_pandas()  # tiny: only the query rows
    q_ids = q_df[id_col].to_numpy()
    q_mat = _normalize_rows(np.stack([np.asarray(v, np.float64) for v in q_df[col]]))
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    ref = ray.put((q_ids, q_mat))  # broadcast ONCE; read per task via ray.get

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize_rows(_batch_matrix(batch, col))
        sims = qmat @ mat.T  # (n_q, n_batch) float64
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi]
            cand_idx = np.nonzero(mask)[0]
            if cand_idx.size == 0:
                continue
            # local top-k by (-sim, neighbor_id)
            loc = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))][:k]
            out_q.extend([qids[qi]] * len(loc))
            out_n.extend(ids[loc].tolist())
            out_s.extend(s[loc].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"],
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def kmeans_lite(ds, *, n_centroids: int = 8, n_iter: int = 5, col: str = "embedding", seed: int = 42):
    """Seeded mini k-means over the embedding column (coarse quantizer).

    Centroid init = rows with the ``n_centroids`` smallest md5-stable ids;
    iterations aggregate per-batch partial sums (sum, count per centroid)
    — one small reduction per iteration, never the full matrix.
    """
    import ray

    first = ds.limit(n_centroids).to_pandas()
    cent = _normalize_rows(
        np.stack([np.asarray(v, dtype=np.float64) for v in first[col]])
    )
    for _ in range(n_iter):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            mat = _normalize_rows(_batch_matrix(batch, col))
            assign = np.argmax(mat @ c.T, axis=1)
            sums, counts = [], []
            for j in range(len(c)):
                m = assign == j
                sums.append(mat[m].sum(axis=0))
                counts.append(int(m.sum()))
            return pa.table(
                {
                    "centroid": pa.array(range(len(c)), type=pa.int64()),
                    "vsum": pa.array([s.tolist() for s in sums], type=pa.list_(pa.float64())),
                    "n": pa.array(counts, type=pa.int64()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = np.zeros_like(cent)
        tot = np.zeros(len(cent))
        for _, r in parts.iterrows():
            new[r["centroid"]] += np.asarray(r["vsum"])
            tot[r["centroid"]] += r["n"]
        nonempty = tot > 0
        new[nonempty] /= tot[nonempty, None]
        cent = _normalize_rows(np.where(nonempty[:, None], new, cent))
    return cent


def knn_lsh(
    ds,
    query_ids,
    *,
    k: int = 5,
    n_planes: int = 10,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    col: str = "embedding",
    seed: int = 42,
):
    """LSH-bucketed ANN: seeded random-hyperplane signatures partition
    the corpus into ``2^n_planes`` cosine buckets; each query scores only
    rows whose bucket is its own or within ``multiprobe`` bit flips.

    The scale path complementary to :func:`knn_ivf`: no training pass at
    all (the planes are a seeded constant broadcast with the queries),
    bucket membership is a per-batch matmul + sign, and the candidate
    fraction is ~(1 + n_planes·multiprobe)/2^n_planes of the corpus.
    With ``n_planes = 0`` the single bucket degrades to exact brute
    search (the driver query pins that config for its DuckDB oracle;
    approximate configs are pytest recall-verified). Sign is invariant
    to vector scale, so bucketing uses raw vectors; scoring is
    normalized float64 like the brute path.
    """
    import ray

    q_df = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).to_pandas()  # tiny: only the query rows
    q_ids = q_df[id_col].to_numpy()
    q_raw = np.stack([np.asarray(v, np.float64) for v in q_df[col]])
    order = np.argsort(q_ids)
    q_ids, q_raw = q_ids[order], q_raw[order]
    q_mat = _normalize_rows(q_raw)
    dim = q_raw.shape[1]
    planes = np.random.default_rng(seed).normal(size=(n_planes, dim))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        if n_planes == 0:
            return np.zeros(len(m), dtype=np.int64)
        bits = (m @ planes.T) > 0  # (n, n_planes)
        return (bits.astype(np.int64) << np.arange(n_planes)[None, :]).sum(axis=1)

    q_buckets = bucket_of(q_raw)
    probes = []
    for b in q_buckets:
        p = {int(b)}
        if multiprobe >= 1:
            p |= {int(b) ^ (1 << j) for j in range(n_planes)}
        probes.append(p)
    ref = ray.put((q_ids, q_mat, probes))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, prb = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist())
        raw = _batch_matrix(batch, col)
        buckets = bucket_of(raw)
        mat = _normalize_rows(raw)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            in_probe = np.isin(buckets, list(prb[qi]))
            mask = in_probe & (ids != qids[qi])
            cand_idx = np.nonzero(mask)[0]
            if cand_idx.size == 0:
                continue
            s = mat[cand_idx] @ qmat[qi]
            loc = np.lexsort((ids[cand_idx], -s))[:k]
            out_q.extend([qids[qi]] * len(loc))
            out_n.extend(ids[cand_idx][loc].tolist())
            out_s.extend(s[loc].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"],
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def knn_ivf(
    ds,
    query_ids,
    *,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """IVF-style approximate top-k: search only vectors whose coarse
    centroid is among the ``nprobe`` closest to the query."""
    import ray

    cent = kmeans_lite(ds, n_centroids=n_centroids, col=col)
    q_df = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = q_df[id_col].to_numpy()
    q_mat = _normalize_rows(np.stack([np.asarray(v, np.float64) for v in q_df[col]]))
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    # per-query probe set
    probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q_mat, cent, probes))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, c, pr = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize_rows(_batch_matrix(batch, col))
        assign = np.argmax(mat @ c.T, axis=1)
        sims = qmat @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            ok = np.isin(assign, pr[qi]) & (ids != qids[qi])
            cand = np.nonzero(ok)[0]
            if cand.size == 0:
                continue
            s = sims[qi]
            loc = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            out_q.extend([qids[qi]] * len(loc))
            out_n.extend(ids[loc].tolist())
            out_s.extend(s[loc].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"],
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def nearest_centroid(ds, *, id_col: str = "vec_id", col: str = "embedding", label_col: str = "label"):
    """Assign each vector to the nearest (euclidean, f64) label centroid.

    Centroids come from one partial-aggregate pass (per-batch per-label
    sums → one small groupby), then broadcast for the assignment pass —
    two streaming passes, no materialization of the vector table.
    Returns (vec_id, assigned_label); ties break by smaller label.
    """
    import ray

    def partial_sums(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch[label_col].to_pylist())
        mat = _batch_matrix(batch, col)
        uniq = np.unique(labels)
        return pa.table(
            {
                label_col: pa.array(uniq.tolist(), type=pa.int64()),
                "vsum": pa.array(
                    [mat[labels == u].sum(axis=0).tolist() for u in uniq],
                    type=pa.list_(pa.float64()),
                ),
                "n": pa.array([int((labels == u).sum()) for u in uniq], type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
    cent: dict[int, np.ndarray] = {}
    cnt: dict[int, int] = {}
    for _, r in parts.iterrows():
        lab = int(r[label_col])
        v = np.asarray(r["vsum"], dtype=np.float64)
        cent[lab] = cent.get(lab, 0) + v
        cnt[lab] = cnt.get(lab, 0) + int(r["n"])
    labels_sorted = sorted(cent)
    c_mat = np.stack([cent[lab] / cnt[lab] for lab in labels_sorted])
    ref = ray.put((np.asarray(labels_sorted, dtype=np.int64), c_mat))

    def assign(batch: pa.Table) -> pa.Table:
        labs, c = ray.get(ref)
        mat = _batch_matrix(batch, col)
        # squared euclidean to each centroid; argmin with smaller-label ties
        d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        pick = labs[np.argmin(d2, axis=1)]  # argmin returns first min → label order
        return pa.table(
            {
                id_col: batch[id_col],
                "assigned_label": pa.array(pick.tolist(), type=pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_lloyd(
    ds,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    q: int = 1000,
):
    """Distributed Lloyd k-means over an embedding column, integer-exact
    so an unrolled-CTE SQL oracle reproduces every assignment.

    Semantics (mirrored by the oracle):
    - elements quantize to ``xq = floor(float64(x)·q)`` (int64; float32
      → float64 widening is lossless IEEE, so both sides agree);
    - initial centroids are the quantized vectors of the ``k`` smallest
      ids, cluster index = rank of the id;
    - an iteration assigns each vector to the centroid with minimum
      squared euclidean distance — ties to the LOWEST cluster index —
      then recomputes each centroid per-dim as ``floor(sum / count)``;
      an empty cluster keeps its previous centroid;
    - ``iters`` assignment passes run in total; the LAST one (under the
      ``iters−1``-times-updated centroids) returns ``(vec_id, cluster)``.

    Scale shape: init is a per-batch k-smallest partial then a tiny
    sort+limit over ≤ #blocks·k rows. Each iteration is ONE streaming
    pass — centroids broadcast via ``ray.put`` (k·d ints), per-batch
    partials emit k rows of per-cluster (count, per-dim int sums) —
    mergeable, so the shuffle carries #batches·k rows, never the
    vectors — and the driver folds a k×d table. The assignment argmin
    uses ``‖c‖² − 2·v·c`` (the row's own norm cancels), an exact f64
    BLAS matmul (every product ≪ 2^53) compared in int64. Each pass
    re-reads the source — the streaming trade for iterative algorithms;
    at 100 TB, materialize the quantized vectors to Parquet once and
    iterate over that table instead.
    """
    import ray

    def _quant(batch: pa.Table) -> np.ndarray:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        mat = np.stack([np.asarray(v, np.float64) for v in arr.to_pylist()])
        return np.floor(mat * q).astype(np.int64)

    def _assign_idx(xq: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin_c ‖v−c‖² = argmin_c (‖c‖² − 2·v·c); np.argmin keeps the
        # FIRST minimum, which is the lowest cluster index — the tie rule
        dots = np.rint(xq.astype(np.float64) @ c.astype(np.float64).T).astype(
            np.int64
        )
        n2c = (c * c).sum(axis=1)
        return np.argmin(n2c[None, :] - 2 * dots, axis=1)

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        keep = np.argsort(ids, kind="stable")[:k]
        xq = _quant(batch)[keep]
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "xq": pa.array(
                    [r.tolist() for r in xq], type=pa.list_(pa.int64())
                ),
            }
        )

    seed = (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(id_col)
        .limit(k)
        .to_pandas()
    )
    cent = np.stack([np.asarray(v, np.int64) for v in seed["xq"]])  # ≤k × d
    kk, d = cent.shape

    for _ in range(iters - 1):
        ref = ray.put(cent)

        def part(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            xq = _quant(batch)
            cl = _assign_idx(xq, c)
            sums = np.zeros((len(c), xq.shape[1]), np.int64)
            np.add.at(sums, cl, xq)
            cnt = np.bincount(cl, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cl": pa.array(np.arange(len(c), dtype=np.int64)),
                    "n": pa.array(cnt),
                    "vsum": pa.array(
                        [r.tolist() for r in sums], type=pa.list_(pa.int64())
                    ),
                }
            )

        parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        sums = np.zeros((kk, d), np.int64)
        cnt = np.zeros(kk, np.int64)
        for _, r in parts.iterrows():
            sums[int(r["cl"])] += np.asarray(r["vsum"], np.int64)
            cnt[int(r["cl"])] += int(r["n"])
        upd = cnt > 0  # empty clusters keep their previous centroid
        cent = cent.copy()
        cent[upd] = np.floor_divide(sums[upd], cnt[upd, None])

    final_ref = ray.put(cent)

    def assign(batch: pa.Table, _ref=final_ref) -> pa.Table:
        c = ray.get(_ref)
        cl = _assign_idx(_quant(batch), c)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(cl.astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def _pq_quantizer(col: str, q: int):
    """batch → floor(f64(x)·q) int64 matrix (the kmeans_lloyd rule)."""

    def _quant(batch: pa.Table) -> np.ndarray:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        mat = np.stack([np.asarray(v, np.float64) for v in arr.to_pylist()])
        return np.floor(mat * q).astype(np.int64)

    return _quant


def _pq_assign_sub(xs: np.ndarray, c: np.ndarray):
    """(codes, sqdist) of each row of xs against centroid table c —
    exact int64 via f64 BLAS (products ≪ 2^53), first-min tie rule."""
    dots = np.rint(xs.astype(np.float64) @ c.astype(np.float64).T).astype(
        np.int64
    )
    n2c = (c * c).sum(axis=1)
    scores = n2c[None, :] - 2 * dots
    cl = np.argmin(scores, axis=1)
    n2x = (xs * xs).sum(axis=1)
    dist = n2x + scores[np.arange(len(xs)), cl]
    return cl, dist


def _pq_train(ds, *, id_col: str, col: str, m: int, k: int, iters: int, q: int):
    """Train the per-subspace Lloyd codebooks shared by :func:`pq_codes`
    and :func:`pq_adc_topk` → (cents list of k×dsub int64 arrays, dsub).
    Seeding/update/tie semantics are :func:`kmeans_lloyd`'s, applied per
    subspace; all m subspaces train in the same streaming passes."""
    import ray

    _quant = _pq_quantizer(col, q)

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        keep = np.argsort(ids, kind="stable")[:k]
        xq = _quant(batch)[keep]
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "xq": pa.array(
                    [r.tolist() for r in xq], type=pa.list_(pa.int64())
                ),
            }
        )

    seed = (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(id_col)
        .limit(k)
        .to_pandas()
    )
    full = np.stack([np.asarray(v, np.int64) for v in seed["xq"]])  # ≤k × d
    d = full.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    # cents[s]: k × dsub centroid table of subspace s
    cents = [full[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]

    for _ in range(iters - 1):
        ref = ray.put(cents)

        def part(batch: pa.Table, _ref=ref) -> pa.Table:
            cs = ray.get(_ref)
            xq = _quant(batch)
            rows_s, rows_cl, rows_n, rows_sum = [], [], [], []
            for s in range(m):
                xs = xq[:, s * dsub : (s + 1) * dsub]
                cl, _ = _pq_assign_sub(xs, cs[s])
                sums = np.zeros((k, dsub), np.int64)
                np.add.at(sums, cl, xs)
                cnt = np.bincount(cl, minlength=k).astype(np.int64)
                rows_s.append(np.full(k, s, np.int64))
                rows_cl.append(np.arange(k, dtype=np.int64))
                rows_n.append(cnt)
                rows_sum.extend(r.tolist() for r in sums)
            return pa.table(
                {
                    "s": pa.array(np.concatenate(rows_s)),
                    "cl": pa.array(np.concatenate(rows_cl)),
                    "n": pa.array(np.concatenate(rows_n)),
                    "vsum": pa.array(rows_sum, type=pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        new_cents = [c.copy() for c in cents]
        for s in range(m):
            sums = np.zeros((k, dsub), np.int64)
            cnt = np.zeros(k, np.int64)
            sub = parts[parts["s"] == s]
            for _, r in sub.iterrows():
                sums[int(r["cl"])] += np.asarray(r["vsum"], np.int64)
                cnt[int(r["cl"])] += int(r["n"])
            upd = cnt > 0  # empty clusters keep their previous centroid
            new_cents[s][upd] = np.floor_divide(sums[upd], cnt[upd, None])
        cents = new_cents
    return cents, dsub


def pq_adc_topk(
    ds,
    query_ids,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    q: int = 1000,
    k_top: int = 5,
):
    """PQ asymmetric-distance (ADC) top-k search — the billion-scale ANN
    serving path (Jégou et al.): base vectors are represented ONLY by
    their m PQ codes; each query precomputes an m×k lookup table of
    exact squared distances from its subvectors to every codebook
    centroid, and a vector's approximate distance is m table lookups +
    adds, never a d-dim float op. Returns (query_id, rank, neighbor_id,
    adc_dist), rank 1..k_top by (adc_dist, neighbor_id), self excluded.

    Integer-exact end to end (quantized vectors, integer codebooks from
    :func:`_pq_train`, integer LUTs), so the DuckDB oracle — the same
    unrolled per-subspace Lloyd CTEs joined into an explicit
    Σ_s ‖q_s − cent_{code_s}‖² — matches every distance and rank.

    Scale shape: codebooks + LUTs broadcast via ``ray.put`` (m·k·dsub +
    n_q·m·k ints); the search pass is shuffle-free (per-batch code
    assign + LUT gather + local top-k per query), then one tiny
    per-query reduce over ≤ #batches·k_top candidate rows.
    """
    import ray

    _quant = _pq_quantizer(col, q)
    cents, dsub = _pq_train(
        ds, id_col=id_col, col=col, m=m, k=k, iters=iters, q=q
    )

    q_df = ds.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))
        ),
        batch_format="pyarrow",
    ).to_pandas()  # tiny: only the query rows
    q_ids = q_df[id_col].to_numpy()
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    qq = np.floor(
        np.stack([np.asarray(v, np.float64) for v in q_df[col]]) * q
    ).astype(np.int64)[order]
    # LUT[s]: n_q × k exact squared distances query-subvector ↔ centroid
    luts = []
    for s in range(m):
        qs = qq[:, s * dsub : (s + 1) * dsub]
        diff = qs[:, None, :] - cents[s][None, :, :]
        luts.append((diff * diff).sum(axis=2).astype(np.int64))
    ref = ray.put((q_ids, cents, luts))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, cs, lut = ray.get(ref)
        ids = batch[id_col].to_numpy()
        xq = _quant(batch)
        dist = np.zeros((len(qids), len(ids)), np.int64)
        for s in range(m):
            cl, _ = _pq_assign_sub(xq[:, s * dsub : (s + 1) * dsub], cs[s])
            dist += lut[s][:, cl]
        out_q, out_n, out_d = [], [], []
        for qi in range(len(qids)):
            mask = ids != qids[qi]
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            loc = cand[np.lexsort((ids[cand], dist[qi][cand]))][:k_top]
            out_q.extend([qids[qi]] * len(loc))
            out_n.extend(ids[loc].tolist())
            out_d.extend(dist[qi][loc].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "adc_dist": pa.array(out_d, type=pa.int64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["adc_dist", "neighbor_id"]).head(k_top)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"],
                "adc_dist": g["adc_dist"].astype(np.int64),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def pq_codes(
    ds,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    q: int = 1000,
):
    """Product quantization (PQ) codes over an embedding column — the
    classic ANN compression path (Jégou et al., TPAMI'11): split each
    d-dim vector into ``m`` contiguous subspaces of d/m dims, run Lloyd
    k-means independently per subspace, and emit per vector the ``m``
    centroid indices plus the total squared quantization error. A
    billion-vector index then stores m small codes per vector instead
    of d floats (here 4 bytes vs 256).

    Semantics per subspace are EXACTLY :func:`kmeans_lloyd`'s (quantize
    ``floor(f64(x)·q)``, seed = k smallest ids' subvectors with cluster
    = id rank, ties to the lowest cluster index, ``floor(sum/count)``
    centroid updates, empty cluster keeps its previous centroid,
    ``iters`` assignment passes) — so the DuckDB oracle unrolls the same
    recurrence once per subspace and every code and error integer
    matches. ``err`` is the sum over subspaces of the final assignment's
    squared euclidean distance in the quantized integer space.

    Scale shape: all m subspaces train in the SAME streaming passes —
    per batch one (m·k) × d_sub partial of per-cluster (count, dim sums)
    ships, never the vectors; centroids broadcast via ``ray.put``
    (m·k·d_sub ints); the driver folds m·k rows per pass. The code
    assignment pass is shuffle-free. Like kmeans_lloyd, each pass
    re-reads the source — at 100 TB, materialize the quantized vectors
    once and iterate over that table.
    """
    import ray

    _quant = _pq_quantizer(col, q)
    cents, dsub = _pq_train(
        ds, id_col=id_col, col=col, m=m, k=k, iters=iters, q=q
    )
    final_ref = ray.put(cents)

    def assign(batch: pa.Table, _ref=final_ref) -> pa.Table:
        cs = ray.get(_ref)
        xq = _quant(batch)
        cols = {id_col: batch[id_col]}
        err = np.zeros(len(xq), np.int64)
        for s in range(m):
            cl, dist = _pq_assign_sub(xq[:, s * dsub : (s + 1) * dsub], cs[s])
            cols[f"code_{s}"] = pa.array(cl.astype(np.int64))
            err += dist
        cols["err"] = pa.array(err)
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def embedding_dup_pairs(
    ds,
    *,
    threshold_x1e6: int = 300_000,
    block_col: str = "label",
    id_col: str = "vec_id",
    col: str = "embedding",
    tile: int = 2048,
):
    """Within-block near-dup pairs by cosine ≥ threshold (ppm-scaled int).

    Blocking on ``block_col`` avoids the all-pairs scan; output
    (vec_a, vec_b, cos_x1e6) with vec_a < vec_b. ``cos_x1e6`` =
    floor(cos * 1e6 + 0.5) in float64 — mirrored exactly in the oracle.

    A HOT block (one label holding most vectors) is processed as
    ``tile``×``tile`` matmul tiles over the sorted ids, so no single dense
    product ever exceeds tile² floats regardless of label skew — the
    inherent O(k²) similarity work stays, but memory is bounded and each
    tile's result is filtered to the (sparse) above-threshold pairs before
    the next tile is computed.
    """

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype=np.int64),
                    "vec_b": pd.Series(dtype=np.int64),
                    "cos_x1e6": pd.Series(dtype=np.int64),
                }
            )
        g = group.sort_values(id_col).reset_index(drop=True)
        ids = g[id_col].to_numpy()
        mat = _normalize_rows(np.stack([np.asarray(v, np.float64) for v in g[col]]))
        n = len(ids)
        frames: list[pd.DataFrame] = []
        for t0 in range(0, n, tile):
            a_mat = mat[t0 : t0 + tile]
            for t1 in range(t0, n, tile):
                sims = a_mat @ mat[t1 : t1 + tile].T
                if t1 == t0:  # diagonal tile: upper triangle only
                    ia, ib = np.triu_indices(sims.shape[0], 1, sims.shape[1])
                else:
                    ia, ib = np.indices(sims.shape).reshape(2, -1)
                scaled = np.floor(sims[ia, ib] * 1e6 + 0.5).astype(np.int64)
                keep = scaled >= threshold_x1e6
                if keep.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "vec_a": ids[t0 + ia[keep]],
                                "vec_b": ids[t1 + ib[keep]],
                                "cos_x1e6": scaled[keep],
                            }
                        )
                    )
        if not frames:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype=ids.dtype),
                    "vec_b": pd.Series(dtype=ids.dtype),
                    "cos_x1e6": pd.Series(dtype=np.int64),
                }
            )
        return pd.concat(frames, ignore_index=True)

    return ds.groupby(block_col).map_groups(block_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style survivors over embedding near-dup pairs)
# ---------------------------------------------------------------------------


def semantic_dedup(
    ds,
    *,
    threshold_x1e6: int = 300_000,
    block_col: str = "label",
    id_col: str = "vec_id",
    col: str = "embedding",
    tile: int = 2048,
    n_buckets: int = 32,
    max_task_rows: int = 8192,
    small_edges: int = 1_000_000,
):
    """SemDeDup-style semantic dedup (Abbas et al. 2023): collapse
    embedding-cosine near-dup components and keep one representative —
    one row ``(vec_id, cluster_size)`` per SURVIVING vector, keeper =
    min-id member of each component (singletons survive with size 1).

    Key partitioning fact this op exploits (and documents): near-dup
    edges exist ONLY within a ``block_col`` block (the SemDeDup "compare
    within cluster" blocking), so the pair scan is block-local. A block,
    however, can be ARBITRARILY hot (boilerplate-heavy corpora put most
    vectors in one k-means cluster), so no task is ever handed a whole
    block: blocks are split into ``ceil(n/max_task_rows)`` hash
    sub-blocks and every sub-block PAIR (i ≤ j) becomes one bounded task
    of ≤ 2·max_task_rows rows — within-pair edges via the same tiled
    matmuls as :func:`embedding_dup_pairs`, diagonal tasks union-find
    their edges down to spanning stars first. Components over the pooled
    (block-local, but the solver doesn't care) edge list then run in
    `dedup._components_bsp` — single-task under ``small_edges``, BSP
    waves above it — and one bounded-bucket shuffle keyed on the
    representative counts component sizes. Exactness: every within-block
    pair lands in exactly one sub-block task, so the edge set — and
    therefore the components — equal the single-task formulation's.
    Cost note: a size-k hot block ships each row to S = ceil(k/cap)
    tasks (shuffle bytes O(k²/cap)) — the inherent exact-all-pairs
    transfer, now bounded per task instead of unbounded per task. The
    per-block sub-block counts are a tiny driver table (#blocks rows —
    blocks are k-means clusters / labels, bounded by construction).

    ``block_col=None`` is the label-less path — SemDeDup proper: train
    the seeded k-means-lite quantizer (`kmeans_lite`, same one IVF uses),
    broadcast the centroids once with ``ray.put``, and block on the
    per-batch nearest-centroid assignment. Dedup is then within-cluster
    only (a pair straddling a centroid boundary is not compared) — the
    paper's semantics, and the documented accuracy/cost trade.

    The reference has no embedding ops at all; this is the
    mission-mandated embedding-cosine near-dup made end-to-end.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    if block_col is None:
        import ray

        cent_ref = ray.put(kmeans_lite(ds, n_centroids=max(2, n_buckets // 4), col=col))

        def assign_block(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mat = _normalize_rows(_batch_matrix(batch, col))
            blk = np.argmax(mat @ c.T, axis=1).astype(np.int32)
            return batch.append_column("__blk", pa.array(blk))

        ds = ds.map_batches(assign_block, batch_format="pyarrow")
        block_col = "__blk"

    import ray

    from .dedup import _components_bsp
    from ..util import fast_hash_u64

    # ---- per-block sub-block counts (tiny: one row per block) ----------
    def blk_counts(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            np.asarray(batch[block_col].to_pylist()), return_counts=True
        )
        return pa.table(
            {
                "blk": pa.array(vals.astype(str), type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    sizes = (
        ds.map_batches(blk_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("blk", as_index=False)["n"]
        .sum()
    )
    smap = {
        b: -(-int(n) // max_task_rows) for b, n in zip(sizes["blk"], sizes["n"])
    }
    sref = ray.put(smap)

    # ---- replicate rows to sub-block-pair tasks -------------------------
    def replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__pt", pa.array([], type=pa.string())) \
                        .append_column("__side", pa.array([], type=pa.int8()))
        m = ray.get(sref)
        blk = np.asarray([str(v) for v in batch[block_col].to_pylist()])
        ids = batch[id_col].to_numpy()
        S = np.fromiter((m[b] for b in blk), np.int64, len(blk))
        s = (fast_hash_u64(ids) % S.astype(np.uint64)).astype(np.int64)
        rep_idx = np.repeat(np.arange(len(ids)), S)
        total = int(S.sum())
        offs = np.repeat(np.cumsum(S) - S, S)
        t = np.arange(total) - offs           # 0..S_r-1 per source row
        s_r = s[rep_idx]
        i = np.minimum(s_r, t)
        j = np.maximum(s_r, t)
        side = (s_r != i).astype(np.int8)     # 0 on sub-block i (and diag)
        keys = np.char.add(
            np.char.add(blk[rep_idx], "|"),
            np.char.add(i.astype("U20"), np.char.add("|", j.astype("U20"))),
        )
        out = batch.take(pa.array(rep_idx))
        return out.append_column("__pt", pa.array(keys)).append_column(
            "__side", pa.array(side)
        )

    empty_edges = typed_empty(a=np.int64, b=np.int64)

    def _thresh_pairs(mat_a, mat_b, *, diag: bool):
        """Above-threshold (row_a, row_b) index pairs between two bounded
        matrices, tiled so no product exceeds tile²."""
        out = []
        for t0 in range(0, mat_a.shape[0], tile):
            a = mat_a[t0 : t0 + tile]
            start1 = t0 if diag else 0
            for t1 in range(start1, mat_b.shape[0], tile):
                sims = a @ mat_b[t1 : t1 + tile].T
                if diag and t1 == t0:
                    ia, ib = np.triu_indices(sims.shape[0], 1, sims.shape[1])
                else:
                    ia, ib = np.indices(sims.shape).reshape(2, -1)
                scaled = np.floor(sims[ia, ib] * 1e6 + 0.5)
                keep = scaled >= threshold_x1e6
                if keep.any():
                    out.append((t0 + ia[keep], t1 + ib[keep]))
        return out

    def pair_edges(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty_edges.copy()
        a_rows = group[group["__side"] == 0].sort_values(id_col)
        b_rows = group[group["__side"] == 1].sort_values(id_col)
        if len(a_rows) == 0:  # sub-block i got no ids hashed into it
            return empty_edges.copy()
        ids_a = a_rows[id_col].to_numpy()
        mat_a = _normalize_rows(
            np.stack([np.asarray(v, np.float64) for v in a_rows[col]])
        )
        if len(b_rows) == 0:
            # diagonal task: within-sub-block pairs, star-collapsed via
            # union-find so the component pass sees O(k) edges
            n = len(ids_a)
            parent = np.arange(n, dtype=np.int64)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for ia, ib in _thresh_pairs(mat_a, mat_a, diag=True):
                for x, y in zip(ia.tolist(), ib.tolist()):
                    rx, ry = find(x), find(y)
                    if rx != ry:
                        parent[max(rx, ry)] = min(rx, ry)
            roots = np.fromiter((find(x) for x in range(n)), np.int64, n)
            members = np.nonzero(roots != np.arange(n))[0]
            if not members.size:
                return empty_edges.copy()
            return pd.DataFrame(
                {"a": ids_a[roots[members]], "b": ids_a[members]}
            )
        ids_b = b_rows[id_col].to_numpy()
        mat_b = _normalize_rows(
            np.stack([np.asarray(v, np.float64) for v in b_rows[col]])
        )
        frames = []
        for ia, ib in _thresh_pairs(mat_a, mat_b, diag=False):
            ea, eb = ids_a[ia], ids_b[ib]
            frames.append(
                pd.DataFrame({"a": np.minimum(ea, eb), "b": np.maximum(ea, eb)})
            )
        return pd.concat(frames, ignore_index=True) if frames else empty_edges.copy()

    edges = (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("__pt")
        .map_groups(pair_edges, batch_format="pandas")
    )

    labels = _components_bsp(edges, pa.int64(), small_edges=small_edges)

    # every vector survives as at least its own rep (singleton coverage)
    def self_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch[id_col], "rep": batch[id_col]})

    empty_lbl = typed_empty(node=np.int64, rep=np.int64)
    assign = bucketed_aggregate(
        ds.map_batches(self_rows, batch_format="pyarrow").union(
            labels.select_columns(["node", "rep"])
        ),
        ["node"],
        lambda df: df.groupby("node", as_index=False)["rep"].min(),
        n_buckets=n_buckets,
        empty=empty_lbl,
        coalesce_first=False,
    ).map_batches(
        lambda t: t.rename_columns([id_col, "rep"]), batch_format="pyarrow"
    )

    empty = typed_empty(**{id_col: np.int64, "cluster_size": np.int64})

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("rep", as_index=False).size()
        out = g.rename(columns={"rep": id_col, "size": "cluster_size"})
        out["cluster_size"] = out["cluster_size"].astype(np.int64)
        return out[[id_col, "cluster_size"]]

    return bucketed_aggregate(
        assign, ["rep"], collapse, n_buckets=n_buckets, empty=empty,
        coalesce_first=False,
    )


# ---------------------------------------------------------------------------
# integer-exact cosine-threshold text dup pairs over hashed embeddings
# ---------------------------------------------------------------------------


def hashed_text_dup_pairs(
    ds,
    *,
    dim: int = 64,
    ngram: int = 3,
    threshold_pct: int = 70,
    block_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tile: int = 2048,
):
    """Model-free semantic text dup pairs: feature-hash each doc's
    distinct n-gram shingles into an integer ``dim``-vector
    (`text_analysis.hash_embed_batch`), then within each ``block_col``
    block emit pairs whose cosine ≥ threshold — checked EXACTLY in
    integers: ``cos(a,b) ≥ t/100  ⟺  dot > 0 ∧ 10000·dot² ≥
    t²·‖a‖²·‖b‖²`` (dot and squared norms are int64; no float ever
    enters the predicate, so the DuckDB oracle reproduces even boundary
    pairs bit-for-bit). Returns (doc_a, doc_b) with doc_a < doc_b.

    Scale shape: embedding is a shuffle-free map (text never shuffles —
    only dim ints per doc); pair generation is the same tiled
    bounded-matmul-per-block pattern as :func:`embedding_dup_pairs`
    (int64 matmuls), so hot blocks never exceed tile² products held at
    once.
    """
    from .text_analysis import hash_embed_batch

    t2 = threshold_pct * threshold_pct

    emb = ds.map_batches(
        lambda b: hash_embed_batch(
            b, dim=dim, ngram=ngram, id_col=id_col, text_col=text_col,
            keep_cols=(block_col,),
        ),
        batch_format="pyarrow",
    )

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype=np.int64), "doc_b": pd.Series(dtype=np.int64)}
        )
        if group.empty:
            return empty
        g = group.sort_values(id_col).reset_index(drop=True)
        ids = g[id_col].to_numpy()
        mat = np.stack([np.asarray(v, np.int64) for v in g["vec"]])
        n2 = (mat * mat).sum(axis=1)
        # matmul in float64 (BLAS; numpy int64 matmul has no SIMD path and
        # is ~100× slower) — exact: every product/sum is an integer well
        # under 2^53, so the rint→int64 round-trip is lossless
        mat_f = mat.astype(np.float64)
        n = len(ids)
        # int64 predicate is exact iff 10000·max(n2)² < 2^63 (both sides are
        # bounded by it: d² ≤ n2a·n2b ≤ max(n2)² and t2 ≤ 10⁴). n2 ≤ s² for
        # s distinct shingles, so the safe envelope is s ≲ 5.4k shingles/doc;
        # beyond it we decide near-boundary pairs with arbitrary-precision
        # Python ints (enforced here, not by prose).
        nmax = int(n2.max())
        int64_safe = 10000 * nmax * nmax < 2**63
        frames = []
        for t0 in range(0, n, tile):
            a = mat_f[t0 : t0 + tile]
            for t1 in range(t0, n, tile):
                dot = np.rint(a @ mat_f[t1 : t1 + tile].T).astype(np.int64)
                if t1 == t0:
                    ia, ib = np.triu_indices(dot.shape[0], 1, dot.shape[1])
                else:
                    ia, ib = np.indices(dot.shape).reshape(2, -1)
                d = dot[ia, ib]
                n2a, n2b = n2[t0 + ia], n2[t1 + ib]
                if int64_safe:
                    keep = (d > 0) & (10000 * d * d >= t2 * n2a * n2b)
                else:
                    # float64 prefilter (loose by 1e-9 relative slack) →
                    # exact Python-int verdict on the few candidates
                    df_, n2af, n2bf = d.astype(np.float64), n2a.astype(np.float64), n2b.astype(np.float64)
                    cand = (d > 0) & (1e4 * df_ * df_ >= float(t2) * n2af * n2bf * (1.0 - 1e-9))
                    keep = np.zeros(len(d), dtype=bool)
                    for ci in np.nonzero(cand)[0]:
                        di = int(d[ci])
                        keep[ci] = 10000 * di * di >= t2 * int(n2a[ci]) * int(n2b[ci])
                if keep.any():
                    frames.append(
                        pd.DataFrame(
                            {"doc_a": ids[t0 + ia[keep]], "doc_b": ids[t1 + ib[keep]]}
                        )
                    )
        return pd.concat(frames, ignore_index=True) if frames else empty

    return emb.groupby(block_col).map_groups(block_pairs, batch_format="pandas")


def knn_join(
    probe_ds,
    build_ds,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    q: int = 1000,
):
    """Dataset↔dataset nearest-neighbor JOIN: for every probe vector,
    the single best build vector by integer-quantized dot product
    (``xq = floor(float64(x)·q)`` per element — the `embedding_moments`
    convention), ties broken by smallest build id. Unlike
    :func:`knn_brute` (tiny query set broadcast against a big corpus),
    BOTH sides here are datasets; this is the broadcast-build
    block-nested-loop shape (Spark's BroadcastNestedLoopJoin for
    similarity): the build side is quantized once and pinned in the
    object store as block refs, and each probe task streams over those
    tiles keeping only a running argmax — so the operator is
    SHUFFLE-FREE and emits exactly one row per probe.

    Partitioning assumption (documented per the custom-operator rule):
    the quantized build side must fit in the cluster's aggregate object
    store (it is never resident in any single task: tasks hold one
    probe batch × one build tile at a time). For build sides beyond
    that, flip the sides or fall back to :func:`knn_ivf` per probe
    block.

    Exactness: |xq| ≤ q·max|x|; the float64 BLAS matmul of int64-valued
    operands is exact while dim·(q·max|x|)² < 2^53 — for unit-norm-ish
    embeddings at q=1000 and dim=64 the products are ≤ 6.4e7, eight
    orders under the mantissa bound.
    """
    import ray

    def quantize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.floor(_batch_matrix(batch, col) * q).astype(np.int64)
        return pa.table(
            {
                "bid": pa.array(ids),
                "qv": pa.array(list(mat), type=pa.list_(pa.int64())),
            }
        )

    tile_refs = (
        build_ds.map_batches(quantize, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )  # driver holds O(#blocks) refs, never the vectors

    def probe(batch: pa.Table) -> pa.Table:
        pids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pmat = np.floor(_batch_matrix(batch, col) * q).astype(np.float64)
        best_score = np.full(len(pids), np.iinfo(np.int64).min, dtype=np.int64)
        best_id = np.full(len(pids), -1, dtype=np.int64)
        for ref in tile_refs:
            t = ray.get(ref)
            if t.num_rows == 0:
                continue
            bids = t["bid"].to_numpy(zero_copy_only=False).astype(np.int64)
            bmat = (
                t["qv"].combine_chunks().values.to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(t.num_rows, -1)
            )
            scores = np.rint(pmat @ bmat.T).astype(np.int64)  # exact, see above
            # argmax with min-id tie-break: scan build rows in id order
            order = np.argsort(bids, kind="stable")
            s = scores[:, order]
            loc = np.argmax(s, axis=1)  # first (= smallest id) max
            sc = s[np.arange(len(pids)), loc]
            cand_id = bids[order][loc]
            upd = (sc > best_score) | ((sc == best_score) & (cand_id < best_id))
            best_score = np.where(upd, sc, best_score)
            best_id = np.where(upd, cand_id, best_id)
        keep = best_id >= 0
        return pa.table(
            {
                "probe_id": pa.array(pids[keep]),
                "build_id": pa.array(best_id[keep]),
                "score": pa.array(best_score[keep]),
            }
        )

    return probe_ds.map_batches(probe, batch_format="pyarrow")


def _srp_matrix(planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix for SRP: R[b,d] = +1 iff
    md5_u64(f"srp:{b}:{d}") is even (DuckDB replays the same parity).
    Memoized per (planes, dim) — built once per worker process, pennies
    either way."""
    key = (planes, dim)
    cached = _srp_matrix.__dict__.get(key)
    if cached is None:
        cached = np.array(
            [
                [1.0 if md5_u64(f"srp:{b}:{d}") % 2 == 0 else -1.0 for d in range(dim)]
                for b in range(planes)
            ],
            dtype=np.float64,
        )
        _srp_matrix.__dict__[key] = cached
    return cached


def srp_sketch(
    ds, *, planes: int = 32, q: int = 1000, id_col: str = "vec_id",
    col: str = "embedding",
):
    """Sign-random-projection (SimHash-for-cosine, Charikar 2002)
    signatures over an embedding column: bit b of a vector's signature
    is ``1[Σ_d R[b,d]·xq_d ≥ 0]`` with the deterministic ±1 hyperplanes
    of :func:`_srp_matrix` and the usual ``floor(x·q)`` quantization —
    the compact sketch whose Hamming distance estimates cosine angle,
    used to pre-bucket embedding dedup without shipping vectors.

    Scale shape: shuffle-free map, one (batch × planes) float64 BLAS
    matmul per batch (int-valued operands: exact while
    dim·(q·max|x|)² < 2^53); output is 8 bytes per vector however wide
    the embeddings are — THAT is the point of the sketch at 100 TB."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.floor(_batch_matrix(batch, col) * q)
        r = _srp_matrix(planes, mat.shape[1])
        proj = np.rint(mat @ r.T).astype(np.int64)
        bits = (proj >= 0).astype(np.uint64)
        sig = (bits << np.arange(planes, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {
                id_col: pa.array(ids),
                "sig": pa.array(sig.astype(np.int64)),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
