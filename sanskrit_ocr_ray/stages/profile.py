"""Table profiling + data-quality validation (engine utility operators).

The "ANALYZE TABLE" / expectation-check pair every production pipeline
runs before and after a big job: a one-pass per-column profile (row
count, null count, min/max) and per-rule violation counts. Both are
single streaming passes of mergeable partials — per-batch aggregates
fold in one tiny final step, nothing proportional to the corpus ever
co-locates. The reference has no profiling at all (its ETL trusts its
inputs, datagen/h5_to_parquet.py); both operators carry exact DuckDB
oracles like every other query in this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def profile_table(ds, columns: list[str]):
    """One-pass column profile → one row per column:
    ``(col, n, n_null, min_s, max_s)`` with min/max rendered as strings
    (numeric columns compare numerically BEFORE rendering, so the result
    equals SQL ``MIN/MAX`` + ``CAST(... AS VARCHAR)``).

    Scale shape: per-batch partial profile (5 scalars per column), one
    tiny driver fold over ≤ #blocks × #columns rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "n_null": [], "min_s": [], "max_s": [], "num": []}
        for c in columns:
            arr = batch[c]
            n = len(arr)
            n_null = arr.null_count
            valid = arr.drop_null()
            is_num = pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)
            if len(valid) == 0:
                mn = mx = None
            elif is_num:
                v = valid.to_numpy(zero_copy_only=False)
                mn, mx = v.min(), v.max()
            else:
                v = valid.to_pylist()
                mn, mx = min(v), max(v)
            rows["col"].append(c)
            rows["n"].append(n)
            rows["n_null"].append(n_null)
            rows["min_s"].append(None if mn is None else str(mn))
            rows["max_s"].append(None if mx is None else str(mx))
            rows["num"].append(is_num)
        return pa.table(
            {
                "col": pa.array(rows["col"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "n_null": pa.array(rows["n_null"], type=pa.int64()),
                "min_s": pa.array(rows["min_s"], type=pa.string()),
                "max_s": pa.array(rows["max_s"], type=pa.string()),
                "num": pa.array(rows["num"], type=pa.bool_()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for c, g in parts.groupby("col", sort=False):
        is_num = bool(g["num"].iloc[0])
        mins = g["min_s"].dropna()
        maxs = g["max_s"].dropna()
        if len(mins) == 0:
            mn = mx = None
        elif is_num:
            # fold numerically (string '9' > '10' otherwise)
            mn = str(min(mins, key=float))
            mx = str(max(maxs, key=float))
        else:
            mn, mx = min(mins), max(maxs)
        out.append(
            {
                "col": c,
                "n": int(g["n"].sum()),
                "n_null": int(g["n_null"].sum()),
                "min_s": mn,
                "max_s": mx,
            }
        )
    res = pd.DataFrame(out, columns=["col", "n", "n_null", "min_s", "max_s"])
    res["n"] = res["n"].astype(np.int64)
    res["n_null"] = res["n_null"].astype(np.int64)
    return res


def validate_rows(ds, rules: dict[str, object]):
    """Data-quality gate: count rows VIOLATING each named rule →
    one row ``(rule, n_violations)`` per rule (0 rows violating is
    still reported). Each rule is a vectorized predicate
    ``pa.Table -> pa.BooleanArray`` (True = row PASSES).

    Scale shape: all rules evaluate in the same single pass per batch
    (one scan, R booleans per row, R int partials per batch), folded in
    one tiny driver step.
    """
    names = list(rules)

    def partial(batch: pa.Table) -> pa.Table:
        viol = []
        for name in names:
            ok = rules[name](batch)
            if isinstance(ok, pa.ChunkedArray):
                ok = ok.combine_chunks()
            ok_np = np.asarray(ok.to_pylist(), dtype=object)
            # NULL predicate results count as violations (SQL semantics:
            # a row passes only when the predicate is TRUE)
            viol.append(int(sum(1 for x in ok_np if x is not True)))
        return pa.table(
            {
                "rule": pa.array(names, type=pa.string()),
                "n_violations": pa.array(viol, type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("rule", as_index=False)["n_violations"].sum()
    out["n_violations"] = out["n_violations"].astype(np.int64)
    return out.sort_values("rule").reset_index(drop=True)


def embedding_moments(ds, *, column: str = "embedding", q: int = 1000):
    """Per-dimension first/second moments of an embedding column — the
    prerequisite for whitening / standardizing vectors before ANN or
    clustering: one row per dimension with ``(dim, n, sum_q, sumsq_q)``
    where each element is first quantized to ``floor(x·q)`` (int64) and
    the INTEGER sums are exact, so the oracle reproduces them
    value-for-value (float sums would depend on reduction order).
    Mean/variance are a trivial driver-side division away; they stay out
    of the operator so the gate stays integer-exact.

    Scale shape: the textbook mergeable partial — each batch emits one
    (sum, sumsq, n) row per dimension (dims × #batches rows total, never
    the vectors), one small groupby folds them. Overflow envelope:
    |x| ≤ 30 and q = 1000 keep sumsq increments ≤ 9·10⁸, so int64 holds
    exact sums past 10⁹ rows per dimension; beyond that raise the bucket
    count by splitting dims, not the dtype.
    """

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[column]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        mat = np.stack([np.asarray(v, np.float64) for v in arr.to_pylist()])
        xq = np.floor(mat * q).astype(np.int64)
        d = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, len(xq), dtype=np.int64)),
                "sum_q": pa.array(xq.sum(axis=0, dtype=np.int64)),
                "sumsq_q": pa.array((xq * xq).sum(axis=0, dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_q", alias_name="sum_q"),
            Sum("sumsq_q", alias_name="sumsq_q"),
        )
    )


def embedding_outliers(
    ds, *, id_col: str = "vec_id", column: str = "embedding",
    q: int = 100, k2: int = 9,
):
    """Centroid-distance outlier flags for an embedding column — the QC
    gate run before clustering/dedup trusts the vectors: a row is an
    outlier when its squared distance to the corpus centroid exceeds
    ``k2`` × the mean squared distance (k = 3 sigma for ``k2 = 9``).

    Integer-exact formulation (floats would make the flag depend on
    summation order): with ``xq = floor(x·q)`` per element, per-dim sums
    ``S_d`` and a row count ``n``,

      D(v) = Σ_d (n·xq_d(v) − S_d)²        (n²·squared distance)
      T    = Σ_d (n·SS_d − S_d²)           (= Σ_v D(v) / n — the MEAN D)

    and the flag is the pure integer predicate ``D(v) > k2·T``
    (Σ_v D(v) = n·T, so T is exactly the mean of D over rows).
    Envelope: |x| ≤ 30, q = 100, dims ≤ 256 keep every term within
    int64 up to ~10⁴ rows per corpus — beyond that, raise to Python-int
    folds or drop q (documented, same convention as
    ``hashed_text_dup_pairs``'s enforced overflow guard).

    Scale shape: pass 1 is :func:`embedding_moments` (mergeable per-dim
    partials, dims×#batches rows); the driver folds dims rows and
    broadcasts (S, n, T) via ``ray.put``; pass 2 is a shuffle-free
    ``map_batches`` emitting ``(vec_id, d2n, is_outlier)``.
    """
    import ray

    mom = embedding_moments(ds, column=column, q=q).to_pandas()  # dims rows
    mom = mom.sort_values("dim")
    n = int(mom["n"].iloc[0]) if len(mom) else 0
    S = mom["sum_q"].to_numpy(np.int64)
    SS = mom["sumsq_q"].to_numpy(np.int64)
    T = int((n * SS - S * S).sum())
    state = ray.put((n, S, T))

    def flag(batch: pa.Table) -> pa.Table:
        n_, S_, T_ = ray.get(state)
        arr = batch[column]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        mat = np.stack([np.asarray(v, np.float64) for v in arr.to_pylist()])
        xq = np.floor(mat * q).astype(np.int64)
        diff = n_ * xq - S_[None, :]
        d2n = (diff * diff).sum(axis=1, dtype=np.int64)
        out = d2n > k2 * T_
        return pa.table(
            {
                id_col: batch[id_col],
                "d2n": pa.array(d2n),
                "is_outlier": pa.array(out.astype(np.int64)),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def fk_orphans(child_ds, parent_ds, *, child_key: str, parent_key: str, n_buckets: int = 32):
    """Referential-integrity check for one FK relation: returns a
    one-row DataFrame ``(n_child_rows, n_distinct_keys, n_orphan_rows)``
    where orphans are child rows whose key has no parent. The validation
    gate a pipeline runs before joining fact tables at scale — a broken
    FK silently drops (inner) or null-pads (outer) rows downstream.

    Scale shape: both sides pre-aggregate per batch (child → distinct
    keys + multiplicities, parent → distinct keys), so the single
    bounded-bucket shuffle on ``key % B`` carries at most
    #batches·#distinct-per-batch rows, never the fact table; each
    bucket resolves membership with one vectorized ``isin`` and emits
    THREE integers. The driver folds B tiny rows.
    """

    def ctag(batch: pa.Table) -> pa.Table:
        k = batch[child_key].to_numpy()
        u, n = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(u.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "__bk": pa.array((u.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)),
                "__side": pa.array(["c"] * len(u)),
            }
        )

    def ptag(batch: pa.Table) -> pa.Table:
        u = np.unique(batch[parent_key].to_numpy()).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(u),
                "n": pa.array(np.zeros(len(u), np.int64)),
                "__bk": pa.array((u.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)),
                "__side": pa.array(["p"] * len(u)),
            }
        )

    empty = pd.DataFrame(
        {
            "n_child_rows": pd.Series(dtype=np.int64),
            "n_distinct_keys": pd.Series(dtype=np.int64),
            "n_orphan_rows": pd.Series(dtype=np.int64),
        }
    )

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        c = group[group["__side"] == "c"]
        if not len(c):
            return empty.copy()
        cc = c.groupby("k")["n"].sum()
        pkeys = group.loc[group["__side"] == "p", "k"].to_numpy()
        orphan_mask = ~cc.index.isin(pkeys)
        return pd.DataFrame(
            {
                "n_child_rows": [int(cc.sum())],
                "n_distinct_keys": [len(cc)],
                "n_orphan_rows": [int(cc[orphan_mask].sum())],
            }
        )

    parts = (
        child_ds.map_batches(ctag, batch_format="pyarrow")
        .union(parent_ds.map_batches(ptag, batch_format="pyarrow"))
        .groupby("__bk")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets rows of three ints
    )
    tot = parts.sum() if len(parts) else empty.sum()
    return pd.DataFrame(
        {
            "n_child_rows": [int(tot.get("n_child_rows", 0))],
            "n_distinct_keys": [int(tot.get("n_distinct_keys", 0))],
            "n_orphan_rows": [int(tot.get("n_orphan_rows", 0))],
        }
    )


def embedding_covariance(ds, *, column: str = "embedding", q: int = 1000):
    """Cross-dimension covariance sufficient statistics — the Gram-matrix
    companion to :func:`embedding_moments`, feeding PCA/whitening and
    redundant-feature detection: one row per unordered dimension pair
    ``i <= j`` with ``(dim_i, dim_j, n, sum_i, sum_j, sum_ij)`` over
    elements quantized to ``floor(x·q)``. All sums are int64-exact, so
    the covariance numerator ``n·sum_ij − sum_i·sum_j`` (computed by the
    consumer, Python-int safe) is reduction-order independent.

    Scale shape: per batch ONE dense ``XᵀX`` float64 BLAS matmul
    (exact while n_batch·(q·max|x|)² < 2^53, e.g. 8·10⁹ rows/batch at
    |x| ≤ 1, q=1000) emitted as d·(d+1)/2 partial rows; a tiny groupby
    folds #batches partials. Nothing proportional to the row count ever
    crosses the shuffle — d=64 means 2,080 pair rows per batch.
    """

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[column]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        mat = np.stack([np.asarray(v, np.float64) for v in arr.to_pylist()])
        xq = np.floor(mat * q)
        d = mat.shape[1]
        gram = np.rint(xq.T @ xq).astype(np.int64)  # exact, see envelope
        sums = xq.sum(axis=0).astype(np.int64)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array(iu.astype(np.int64)),
                "dim_j": pa.array(ju.astype(np.int64)),
                "n": pa.array(np.full(len(iu), len(mat), dtype=np.int64)),
                "sum_i": pa.array(sums[iu]),
                "sum_j": pa.array(sums[ju]),
                "sum_ij": pa.array(gram[iu, ju]),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dim_i", "dim_j"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_i", alias_name="sum_i"),
            Sum("sum_j", alias_name="sum_j"),
            Sum("sum_ij", alias_name="sum_ij"),
        )
    )
