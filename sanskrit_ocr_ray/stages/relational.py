"""Relational/aggregation operators over the TPC-H-ish tables.

These prove the engine's general dataflow breadth (filter → project →
partial-aggregate → groupby → broadcast join → sort/limit → window) with
the scale idioms from the mission brief:

- **pre-aggregation**: every groupby is fed per-batch partial aggregates
  (one row per key per batch), so the all-to-all shuffle moves O(keys),
  not O(rows);
- **broadcast joins**: dimension tables (customer→nation, part) are
  ``ray.put`` once and looked up per batch — no shuffle join for a small
  side;
- **integer outputs**: money is ``floor(x*100 + 0.5)`` cents, timestamps
  are epoch-second bucket starts — exact cross-engine comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import typed_empty


def _cents(arr: np.ndarray) -> np.ndarray:
    """floor(x*100 + 0.5) as int64 — the one rounding rule, mirrored in SQL."""
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


def q1_pricing(ds, *, cutoff: str = "1998-09-02"):
    """Pricing summary (TPC-H Q1 shape): per (returnflag, linestatus),
    integer-cent sums + counts, over lineitems shipped before ``cutoff``."""
    from ray.data.aggregate import Count, Sum

    cut = np.datetime64(cutoff)

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        m = ship <= cut
        qty = batch["l_quantity"].to_numpy()[m]
        price = batch["l_extendedprice"].to_numpy()[m]
        disc = batch["l_discount"].to_numpy()[m]
        df = pd.DataFrame(
            {
                "l_returnflag": np.asarray(batch["l_returnflag"].to_pylist())[m],
                "l_linestatus": np.asarray(batch["l_linestatus"].to_pylist())[m],
                "sum_qty_c": _cents(qty),
                "sum_base_price_c": _cents(price),
                "sum_disc_price_c": _cents(price * (1.0 - disc)),
                "n_rows": np.ones(int(m.sum()), dtype=np.int64),
            }
        )
        part = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_c", alias_name="sum_qty_c"),
            Sum("sum_base_price_c", alias_name="sum_base_price_c"),
            Sum("sum_disc_price_c", alias_name="sum_disc_price_c"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


def revenue_by_nation(orders_ds, customer_df: pd.DataFrame, nation_df: pd.DataFrame, *, k: int = 10):
    """orders ⋈ customer ⋈ nation via broadcast → total order value per
    nation (cents), top-k by (revenue desc, name).

    The dimension maps are broadcast once with ``ray.put`` (customer is
    the largest at ~1.5M rows / SF100 — still MBs as an int→int dict;
    beyond that, switch to the partitioned hash join in ``hash_join``)."""
    import ray
    from ray.data.aggregate import Sum

    cust_to_nation = dict(
        zip(customer_df["c_custkey"].to_numpy(), customer_df["c_nationkey"].to_numpy())
    )
    nation_name = dict(
        zip(nation_df["n_nationkey"].to_numpy(), nation_df["n_name"].to_numpy())
    )
    ref = ray.put(cust_to_nation)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        cust = batch["o_custkey"].to_numpy()
        price = batch["o_totalprice"].to_numpy()
        # hashtable-vectorized dim lookup (pd.Series.map), no per-row Python hop
        nk = pd.Series(cust).map(lookup).to_numpy(np.int64)
        df = pd.DataFrame({"n_nationkey": nk, "revenue_c": _cents(price)})
        return pa.Table.from_pandas(
            df.groupby("n_nationkey", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    agg = (
        orders_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("n_nationkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
    )
    agg["n_name"] = agg["n_nationkey"].map(nation_name)
    agg = agg.sort_values(["revenue_c", "n_name"], ascending=[False, True]).head(k)
    return agg[["n_name", "revenue_c"]].reset_index(drop=True)


def revenue_by_brand(lineitem_ds, part_df: pd.DataFrame):
    """lineitem ⋈ part (broadcast) → discounted revenue cents per brand."""
    import ray
    from ray.data.aggregate import Sum

    part_brand = dict(zip(part_df["p_partkey"].to_numpy(), part_df["p_brand"].to_numpy()))
    ref = ray.put(part_brand)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        pk = batch["l_partkey"].to_numpy()
        price = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        df = pd.DataFrame(
            {
                "p_brand": pd.Series(pk).map(lookup),
                "revenue_c": _cents(price * (1.0 - disc)),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("p_brand", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        lineitem_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("p_brand")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
    )


def events_tumbling(ds, *, window_s: int = 3600):
    """Tumbling-window aggregate: (window_start_s, event_type) → count +
    value cents. Stream-shaped work expressed as a keyed batch aggregate
    (Ray Data has no watermarks; the bounded log IS the window input)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # explicit microsecond normalization (never unit-dependent)
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        win = (us // (window_s * 1_000_000)) * window_s
        df = pd.DataFrame(
            {
                "window_start_s": win,
                "event_type": batch["event_type"].to_pylist(),
                "n_events": np.ones(len(win), dtype=np.int64),
                "sum_value_c": _cents(batch["value"].to_numpy()),
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["window_start_s", "event_type"], as_index=False).sum(),
            preserve_index=False,
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start_s", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_c", alias_name="sum_value_c"),
        )
    )


def events_sliding(ds, *, window_s: int = 3600, step_s: int = 1800):
    """Sliding-window aggregate: each event lands in ``window_s/step_s``
    overlapping windows; assignment happens vectorized per batch, then the
    usual partial-aggregate → small groupby. (Window semantics over a
    bounded log — Ray Data has no watermarks; SURVEY.md §2.9.)"""
    from ray.data.aggregate import Sum

    k = window_s // step_s

    def partial(batch: pa.Table) -> pa.Table:
        s = (
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
            // 1_000_000
        )
        base = (s // step_s) * step_s
        frames = []
        for i in range(k):
            frames.append(
                pd.DataFrame(
                    {
                        "window_start_s": base - i * step_s,
                        "event_type": batch["event_type"].to_pylist(),
                        "n_events": np.ones(len(s), dtype=np.int64),
                        "sum_value_c": _cents(batch["value"].to_numpy()),
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(
            df.groupby(["window_start_s", "event_type"], as_index=False).sum(),
            preserve_index=False,
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start_s", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_c", alias_name="sum_value_c"),
        )
    )


def status_history(ds, *, n_buckets: int = 64):
    """Type-2 slowly-changing-dimension compaction (the CDC "history
    build"): collapse each user's event_type stream into validity
    intervals — one row per maximal run of consecutive equal types,
    carrying ``valid_from_us`` (the run's first timestamp),
    ``valid_to_us`` (the NEXT run's first timestamp; ``-1`` for the
    open current run) and the run's event count. The standard shape for
    turning an append-only change log into a point-in-time-joinable
    dimension table.

    Scale shape: identical to :func:`sessionize` — shuffle on
    ``hash(user) % n_buckets`` (never one dispatch per user), then ONE
    vectorized mergesort + shift-compare pass collapses every run in
    the bucket. Total order inside a user is (ts, event_id), pinned on
    both the Ray and oracle sides so timestamp ties cannot flip runs.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        b = (fast_hash_u64(batch["user_id"].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "us": us,
                "__ub": pa.array(b),
            }
        )

    empty = typed_empty(
        user_id=np.int64,
        event_type=object,
        valid_from_us=np.int64,
        valid_to_us=np.int64,
        n_events=np.int64,
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(u)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        ru, rfrom = u[starts], us[starts]
        # a run is closed by the next run iff that run is the same user's
        nxt_same = np.append(ru[1:] == ru[:-1], False)
        rto = np.where(nxt_same, np.append(rfrom[1:], -1), -1)
        return pd.DataFrame(
            {
                "user_id": ru,
                "event_type": et[starts],
                "valid_from_us": rfrom,
                "valid_to_us": rto,
                "n_events": (ends - starts).astype(np.int64),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


def event_transition_matrix(ds, *, n_buckets: int = 64):
    """First-order Markov transition matrix over per-user event
    streams: (from_type, to_type, n, p_pm) where n counts adjacent
    (ts, event_id)-ordered pairs within one user and
    ``p_pm = 1000·n // Σ_to n`` is the integer per-mille transition
    probability — the behavioral model behind next-event prediction and
    funnel-anomaly dashboards. Returns a pandas DataFrame sorted by
    (from_type, to_type).

    Scale shape: one bounded ``hash(user) % B`` shuffle; each bucket
    orders ALL its users with one mergesort and counts adjacent pairs
    with one vectorized groupby (the sessionize shape — never a
    dispatch per user); per-bucket (from, to, n) partials are exact
    (a user lives wholly in one bucket) and the driver folds
    O(B · |types|²) rows, row-normalizing at the end.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        u = batch["user_id"].to_numpy()
        b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "us": us,
                "__ub": pa.array(b),
            }
        )

    empty = typed_empty(from_type=object, to_type=object, n=np.int64)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return empty.copy()
        pairs = pd.DataFrame({"from_type": t[:-1][same], "to_type": t[1:][same]})
        out = pairs.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": np.int64})

    parts = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return typed_empty(
            from_type=object, to_type=object, n=np.int64, p_pm=np.int64
        )
    out = parts.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    row_tot = out.groupby("from_type")["n"].transform("sum")
    out["p_pm"] = (1000 * out["n"]) // row_tot
    out = out.astype({"n": np.int64, "p_pm": np.int64})
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


def sessionize(ds, *, gap_s: int = 1800, n_buckets: int = 64):
    """Per-user sessionization (30-min inactivity gap): one row per
    session with event count and duration.

    Scale shape: grouping per *user* would dispatch one Python call per
    user (10⁷–10⁸ calls at web scale — the measured per-group pathology).
    Instead the shuffle key is ``hash(user_id) % n_buckets`` and each
    bucket sessionizes ALL its users with one mergesort + numpy
    diff/cumsum/reduceat pass — the same bounded-bucket shape as
    reassembly. Ordering comes from the in-bucket sort, never arrival.

    Timestamps are normalized EXPLICITLY to epoch seconds in Arrow
    (cast → timestamp[us] → int64) before the shuffle, so the result
    cannot silently change with the Arrow→pandas conversion's resolution.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()),
            1_000_000,
        )
        u = batch["user_id"].to_numpy()
        b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"user_id": batch["user_id"], "s": s, "__ub": pa.array(b)})

    empty = typed_empty(
        user_id=np.int64, session_id=np.int64, n_events=np.int64, dur_s=np.int64
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group.sort_values(["user_id", "s"], kind="mergesort")
        u = g["user_id"].to_numpy()
        s = g["s"].to_numpy()
        n = len(u)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = s[1:] - s[:-1]
        brk = (~new_user) & (gap > gap_s)
        c = np.cumsum(brk.astype(np.int64))
        # session_id restarts at 0 per user: subtract c at the user's first
        # row (c is nondecreasing → forward-fill via maximum.accumulate)
        base = np.maximum.accumulate(np.where(new_user, c, -1))
        sid = c - base
        starts = np.nonzero(new_user | brk)[0]
        ends = np.append(starts[1:], n)
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "session_id": sid[starts],
                "n_events": (ends - starts).astype(np.int64),
                "dur_s": s[ends - 1] - s[starts],
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


def gini_by_group(ds, group: str, column: str, *, n_buckets: int = 16):
    """Per-group Gini inequality coefficient ×1e6 (truncated toward
    zero, matching DuckDB HUGEINT ``//``), INTEGER-EXACT via the
    sorted form ``G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx)`` (x ascending,
    i 1-based) — the mean-absolute-difference identity with no float
    anywhere. The weighted sum's true bound is n²·max|x| per group:
    the fast path accumulates in int64 only when that bound fits,
    otherwise the group folds in Python bigints, so no scale silently
    wraps. The final ×1e6 quotient truncates toward zero (HUGEINT
    semantics) — the numerator is always ≥ 0 but Σx may be negative.
    Invariant to tie order (equal values share a coefficient block),
    so the oracle needs no tie-break. Groups with Σx = 0 emit no row.
    One bounded ``hash(group)`` shuffle; each bucket computes ALL its
    groups with one mergesort + vectorized prefix pass.
    """
    from ..util import fast_hash_u64, typed_empty

    def tag(batch: pa.Table) -> pa.Table:
        g = batch[group].to_numpy(zero_copy_only=False)
        b = (fast_hash_u64(g) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {group: batch[group], column: batch[column], "__gb": pa.array(b)}
        )

    empty = typed_empty(**{group: object, "n": np.int64, "gini_x1m": np.int64})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        g = df.sort_values([group, column], kind="mergesort")
        keys = g[group].to_numpy()
        x = g[column].to_numpy().astype(np.int64)
        n_all = len(keys)
        change = np.empty(n_all, dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        gid = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], n_all]
        # 1-based rank within each group, fully vectorized
        i = np.arange(n_all, dtype=np.int64) - np.repeat(starts, ends - starts) + 1
        n_per = (ends - starts).astype(np.int64)
        coef = 2 * i - np.repeat(n_per, n_per) - 1
        s = np.zeros(len(starts), np.int64)
        np.add.at(s, gid, x)
        # True numerator bound is n²·max|x| per group: vectorized int64
        # only when every group in the bucket provably fits, else fold
        # per-element products in Python bigints (exact at any scale).
        mx = int(np.abs(x).max()) if n_all else 0
        nmax = int(n_per.max()) if len(n_per) else 0
        if mx == 0 or nmax * nmax <= (2**62) // mx:
            w = coef * x
            num_i64 = np.zeros(len(starts), np.int64)
            np.add.at(num_i64, gid, w)
            num = [int(v) for v in num_i64]
        else:
            num = [0] * len(starts)
            for j in range(n_all):
                num[gid[j]] += int(coef[j]) * int(x[j])
        out_g, out_n, out_v = [], [], []
        for k in range(len(starts)):
            denom = int(n_per[k]) * int(s[k])
            if denom == 0:
                continue
            a = 1_000_000 * num[k]
            q, r = divmod(a, denom)
            if r != 0 and (a < 0) != (denom < 0):
                q += 1  # truncate toward zero, matching HUGEINT //
            out_g.append(keys[starts[k]])
            out_n.append(int(n_per[k]))
            out_v.append(q)
        return pd.DataFrame(
            {
                group: out_g,
                "n": np.asarray(out_n, np.int64),
                "gini_x1m": np.asarray(out_v, np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def funnel_depths(ds, steps: list[str], *, n_buckets: int = 64):
    """Funnel analysis: how far each user progresses through an ORDERED
    sequence of event types (non-contiguous subsequence — step i+1 must
    occur strictly after the chosen step-i event in (ts, event_id)
    order; greedy earliest-match is optimal for subsequence reach).
    Returns (depth, n_users) — depth 0 = users who never fire step 1 —
    partitioning the full user population.

    Scale shape: one bounded ``hash(user) % B`` shuffle; each bucket
    advances ALL its users through the funnel with ``len(steps)``
    vectorized merge/compare/groupby-first passes (never a Python loop
    per user), then emits one tiny (depth, count) partial per bucket;
    the driver folds ≤ B·(len(steps)+1) integers.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        b = (fast_hash_u64(batch["user_id"].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "us": us,
                "__ub": pa.array(b),
            }
        )

    empty = typed_empty(depth=np.int64, n_users=np.int64)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        depth = pd.Series(
            np.zeros(group["user_id"].nunique(), np.int64),
            index=pd.Index(group["user_id"].unique(), name="user_id"),
        )
        # per-user cutoff after the last matched step; -inf encoded as
        # (us, eid) = (-1, -1) — real epochs are positive
        cut = pd.DataFrame(
            {"c_us": -1, "c_eid": -1}, index=depth.index, dtype=np.int64
        )
        alive = depth.index
        for i, step in enumerate(steps):
            m = group[group["event_type"] == step]
            m = m[m["user_id"].isin(alive)]
            if m.empty:
                break
            j = m.join(cut, on="user_id")
            after = (j["us"] > j["c_us"]) | (
                (j["us"] == j["c_us"]) & (j["event_id"] > j["c_eid"])
            )
            j = j[after]
            if j.empty:
                break
            # earliest qualifying (us, event_id) per user
            first = (
                j.sort_values(["user_id", "us", "event_id"], kind="mergesort")
                .groupby("user_id", sort=False)
                .first()
            )
            depth.loc[first.index] = i + 1
            cut.loc[first.index, "c_us"] = first["us"].to_numpy()
            cut.loc[first.index, "c_eid"] = first["event_id"].to_numpy()
            alive = first.index
        out = depth.value_counts().sort_index()
        return pd.DataFrame(
            {
                "depth": out.index.to_numpy().astype(np.int64),
                "n_users": out.to_numpy().astype(np.int64),
            }
        )

    parts = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets·(len(steps)+1) tiny rows
    )
    if parts.empty:
        return pd.DataFrame({"depth": np.asarray([], np.int64), "n_users": np.asarray([], np.int64)})
    agg = parts.groupby("depth", as_index=False)["n_users"].sum().sort_values("depth")
    return agg.reset_index(drop=True).astype({"depth": np.int64, "n_users": np.int64})


def peak_concurrent_sessions(
    ds, *, gap_s: int = 1800, n_buckets: int = 64, t_bucket_s: int = 86_400
):
    """Global PEAK number of concurrently-active sessions — the classic
    sweep-line max over interval boundary deltas, distributed as a
    two-phase prefix scan (the capacity-planning / load-envelope query).

    Phase A derives per-user session intervals exactly like
    :func:`sessionize` (one bounded ``hash(user)`` shuffle, vectorized
    run collapse). Phase B is the sweep: each interval emits ``+1`` at
    ``start`` and ``−1`` at ``end+1`` (ends inclusive); deltas shuffle
    ONCE on a coarse time-range bucket (``t // t_bucket_s`` — one day by
    default), each bucket computes its (total_delta, max_prefix) with
    one vectorized sort+cumsum, and the driver folds the per-bucket
    rows in time order — O(active days) scalars, never O(events). The
    same decomposition runs max-prefix over any range partitioning, so
    at 100 TB the fold input stays tiny. Returns a 1-row (peak) frame.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()),
            1_000_000,
        )
        u = batch["user_id"].to_numpy()
        b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"user_id": batch["user_id"], "s": s, "__ub": pa.array(b)})

    iv_empty = typed_empty(start_s=np.int64, end_s=np.int64)

    def intervals(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return iv_empty.copy()
        g = group.sort_values(["user_id", "s"], kind="mergesort")
        u = g["user_id"].to_numpy()
        s = g["s"].to_numpy()
        n = len(u)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = s[1:] - s[:-1]
        starts = np.nonzero(new_user | ((~new_user) & (gap > gap_s)))[0]
        ends = np.append(starts[1:], n)
        return pd.DataFrame({"start_s": s[starts], "end_s": s[ends - 1]})

    def deltas(batch: pa.Table) -> pa.Table:
        st = batch["start_s"].to_numpy()
        en = batch["end_s"].to_numpy() + 1
        t = np.concatenate([st, en])
        d = np.concatenate(
            [np.ones(len(st), np.int64), -np.ones(len(en), np.int64)]
        )
        tb = (t // t_bucket_s).astype(np.int64)
        return pa.table({"t": pa.array(t), "d": pa.array(d), "__tb": pa.array(tb)})

    part_empty = typed_empty(tb=np.int64, total=np.int64, max_prefix=np.int64)

    def per_range(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return part_empty.copy()
        g = group.groupby("t", as_index=False)["d"].sum().sort_values("t")
        run = np.cumsum(g["d"].to_numpy())
        return pd.DataFrame(
            {
                "tb": np.asarray([int(group["__tb"].iloc[0])], np.int64),
                "total": np.asarray([int(run[-1])], np.int64),
                "max_prefix": np.asarray([int(run.max())], np.int64),
            }
        )

    parts = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(intervals, batch_format="pandas")
        .map_batches(deltas, batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(per_range, batch_format="pandas")
        .to_pandas()  # O(active time-ranges) rows only
    )
    if parts.empty:
        return pd.DataFrame({"peak": np.asarray([0], np.int64)})
    parts = parts.sort_values("tb")
    running = 0
    peak = 0
    for _, row in parts.iterrows():
        peak = max(peak, running + int(row["max_prefix"]))
        running += int(row["total"])
    return pd.DataFrame({"peak": np.asarray([peak], np.int64)})


def top_users_by_value(ds, *, k: int = 10, n_buckets: int = 64):
    """events → total value cents per user → top-k (value desc, user asc).

    Scale shape: per-batch partial sums, ONE bounded-bucket shuffle
    (every row of a user lands in one bucket, so sums are exact), each
    bucket keeps only its own top-k (the global top-k is necessarily in
    some bucket's top-k), and the driver merges B×k tiny rows — user
    cardinality never touches the driver or a native per-group groupby
    (round 1 materialized ALL users driver-side, fine at bench scale,
    O(#users) at web scale)."""
    from .dedup import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "sum_value_c": _cents(batch["value"].to_numpy()),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    empty = typed_empty(user_id=np.int64, sum_value_c=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("user_id", as_index=False)["sum_value_c"].sum()
        agg = agg.sort_values(
            ["sum_value_c", "user_id"], ascending=[False, True], kind="mergesort"
        )
        return agg.head(k).reset_index(drop=True)

    per_bucket = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        combine,
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    )
    top = per_bucket.to_pandas()  # B×k tiny rows
    top = top.sort_values(
        ["sum_value_c", "user_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return top.reset_index(drop=True)


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str = "user_id",
    on: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    n_buckets: int = 64,
):
    """As-of join (backward): for each left row, the LATEST right row of
    the same ``by`` key with ``on`` ≤ the left row's ``on``.

    Ray Data has no native as-of join; the composition is the engine's
    standard bounded-bucket co-location: both sides shuffle ONCE on
    ``hash(by) % B``, and each bucket resolves all its keys with one
    vectorized ``pandas.merge_asof`` (C implementation, no per-key
    dispatch). Ties on ``on`` break deterministically toward the larger
    right id (right side pre-sorted by (on, id); merge_asof backward
    takes the last candidate). Inner semantics: unmatched left rows are
    dropped.

    Returns (left_id, by, right_id → matched_id, gap_s) with gap_s the
    whole seconds between the two ``on`` timestamps.
    """
    from ..util import fast_hash_u64

    def tag(side: str, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            u = batch[by].to_numpy()
            b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
            return pa.table(
                {
                    by: batch[by],
                    "__us": pc.cast(pc.cast(batch[on], pa.timestamp("us")), pa.int64()),
                    "__id": pc.cast(batch[id_col], pa.int64()),
                    "__side": pa.array([side] * batch.num_rows),
                    "__ab": pa.array(b),
                }
            )

        return fn

    empty = typed_empty(
        **{
            left_id: np.int64,
            by: np.int64,
            "matched_id": np.int64,
            "gap_s": np.int64,
        }
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        l = group[group["__side"] == "l"].sort_values("__us", kind="mergesort")
        r = group[group["__side"] == "r"].sort_values(
            ["__us", "__id"], kind="mergesort"
        )
        if not len(l) or not len(r):
            return empty.copy()
        m = pd.merge_asof(
            l[[by, "__us", "__id"]],
            r[[by, "__us", "__id"]].assign(__rus=r["__us"].to_numpy()),
            on="__us",
            by=by,
            direction="backward",
            suffixes=("", "_r"),
        )
        out = pd.DataFrame(
            {
                left_id: m["__id"].to_numpy(),
                by: m[by].to_numpy(),
                "matched_id": m["__id_r"].to_numpy(),
                "gap_s": (m["__us"].to_numpy() - m["__rus"].to_numpy()) // 1_000_000,
            }
        )
        out = out.dropna(subset=["matched_id"])
        return out.astype(
            {left_id: np.int64, "matched_id": np.int64, "gap_s": np.int64}
        )

    tagged = left_ds.map_batches(tag("l", left_id), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r", right_id), batch_format="pyarrow")
    )
    return tagged.groupby("__ab").map_groups(per_bucket, batch_format="pandas")


def range_join_count(
    left_ds,
    right_ds,
    *,
    by: str = "user_id",
    on: str = "ts",
    left_id: str = "event_id",
    window_s: int = 3600,
    n_buckets: int = 64,
    out_col: str = "n_in_window",
):
    """Banded range join: for each left row, COUNT right rows of the same
    ``by`` key with ``on`` in ``[left.on − window_s, left.on)``.

    Ray Data has no range join; the composition is the engine's standard
    bounded-bucket co-location (both sides shuffle ONCE on
    ``hash(by) % B``) plus a vectorized cumulative-count trick per bucket:
    right rows are sorted by (by, on) and numbered; two backward
    ``merge_asof`` probes (at ``on − 1µs`` strictness and ``on − window``)
    give the count below each band edge, and their difference is the band
    count — two C-kernel passes, no per-key or per-row dispatch. Left rows
    with no in-band partner are kept with count 0 (left semantics).
    """
    from ..util import fast_hash_u64

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            u = batch[by].to_numpy()
            b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
            cols = {
                by: batch[by],
                "__us": pc.cast(pc.cast(batch[on], pa.timestamp("us")), pa.int64()),
                "__id": pc.cast(
                    batch[left_id] if side == "l" else batch[by], pa.int64()
                ),
                "__side": pa.array([side] * batch.num_rows),
                "__rb": pa.array(b),
            }
            return pa.table(cols)

        return fn

    empty = typed_empty(
        **{left_id: np.int64, by: np.int64, out_col: np.int64}
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        l = group[group["__side"] == "l"].sort_values("__us", kind="mergesort")
        if not len(l):
            return empty.copy()
        r = group[group["__side"] == "r"].sort_values(
            [by, "__us"], kind="mergesort"
        )
        if not len(r):
            return pd.DataFrame(
                {
                    left_id: l["__id"].to_numpy(),
                    by: l[by].to_numpy(),
                    out_col: np.zeros(len(l), dtype=np.int64),
                }
            )
        rr = pd.DataFrame(
            {
                by: r[by].to_numpy(),
                "__us": r["__us"].to_numpy(),
                # per-key running count: rows-so-far within this by key
                "__cum": r.groupby(by, sort=False).cumcount().to_numpy() + 1,
            }
        ).sort_values("__us", kind="mergesort")
        probe = l[[by, "__us"]].copy()

        def count_below(ts: np.ndarray) -> np.ndarray:
            """#right rows of the same key with __us ≤ ts, per probe row
            (in l's row order)."""
            p = probe.assign(__us=ts).sort_values("__us", kind="mergesort")
            m = pd.merge_asof(
                p,
                rr,
                on="__us",
                by=by,
                direction="backward",
                allow_exact_matches=True,
            )
            counts = pd.Series(m["__cum"].fillna(0).to_numpy(np.int64), index=p.index)
            return counts.reindex(probe.index).to_numpy(dtype=np.int64)

        us = l["__us"].to_numpy()
        # band [us − w, us): count(< us) − count(< us − w), each via a ≤
        # probe one microsecond below the open edge
        upper = count_below(us - 1)
        lower = count_below(us - window_s * 1_000_000 - 1)
        return pd.DataFrame(
            {
                left_id: l["__id"].to_numpy(),
                by: l[by].to_numpy(),
                out_col: (upper - lower).astype(np.int64),
            }
        )

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )
    return tagged.groupby("__rb").map_groups(per_bucket, batch_format="pandas")


def quantiles_exact(ds, column: str, *, q_pm: list[int] | None = None):
    """Exact distributed quantiles of an integer column via a value
    histogram: per-batch value-counts (partial aggregate), one small
    groupby over DISTINCT values, then a driver-side cumsum over the
    histogram.

    Quantile definition (mirrored in the SQL oracle): ``q`` per-mille →
    the value at 1-based sorted position ``ceil(q·n/1000)``.

    Scale assumption (documented): the DISTINCT value cardinality is
    ≪ row count (integer cents, token counts, scores). The shuffle and
    the driver merge are O(#distinct); for genuinely continuous data,
    pre-bin to fixed-width integer bins first (same code path) or use a
    sketch (t-digest) where exactness isn't required."""
    from ray.data.aggregate import Sum

    q_pm = q_pm or [250, 500, 750, 900, 990]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy()
        vals, counts = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(#distinct) rows only
    )
    if hist.empty:  # zero input rows → schema-less groupby output
        return pd.DataFrame(
            {"q_pm": np.asarray([], np.int64), column: np.asarray([], np.int64)}
        )
    hist = hist.sort_values("v")
    counts = hist["n"].to_numpy()
    vals = hist["v"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:  # empty input: empty quantile frame, not an IndexError
        return pd.DataFrame(
            {"q_pm": np.asarray([], np.int64), column: np.asarray([], np.int64)}
        )
    out_q: list[int] = []
    out_v: list[int] = []
    for q in q_pm:
        k = -(-q * n // 1000)  # ceil(q·n/1000), integer-exact
        idx = int(np.searchsorted(cum, k, side="left"))
        out_q.append(q)
        out_v.append(int(vals[idx]))
    return pd.DataFrame(
        {"q_pm": np.asarray(out_q, np.int64), column: np.asarray(out_v, np.int64)}
    )


def quantiles_cont(ds, column: str, *, q_pm: list[int] | None = None):
    """ANSI PERCENTILE_CONT (linear interpolation between order stats),
    integer-exact: for per-mille q over n rows, the fractional 0-based
    position is ``pos = (n−1)·q / 1000``; with ``i = floor(pos)`` and
    ``f = (n−1)·q mod 1000``, the result ×1000 is exactly
    ``v_i·1000 + (v_{i+1} − v_i)·f`` (v = sorted values, v_{i+1}
    clamped to v_i at the top edge) — so both sides compare in int64
    with no float interpolation slack. Returns ``(q_pm, value_x1000)``.

    Same distributed shape and scale assumption as
    :func:`quantiles_exact`: mergeable per-batch value histograms, one
    O(#distinct) shuffle, driver-side cumsum; the two order stats per
    quantile come from searchsorted on the cumulative counts."""
    from ray.data.aggregate import Sum

    q_pm = q_pm or [250, 500, 750, 900, 990]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy()
        vals, counts = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(#distinct) rows only
    )
    empty = pd.DataFrame(
        {"q_pm": np.asarray([], np.int64),
         "value_x1000": np.asarray([], np.int64)}
    )
    if hist.empty:
        return empty
    hist = hist.sort_values("v")
    cum = np.cumsum(hist["n"].to_numpy())
    vals = hist["v"].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return empty
    out_q: list[int] = []
    out_v: list[int] = []
    for q in q_pm:
        pos = (n - 1) * q
        i, f = pos // 1000, pos % 1000
        lo = int(vals[int(np.searchsorted(cum, i + 1, side="left"))])
        hi_rank = min(i + 1, n - 1)
        hi = int(vals[int(np.searchsorted(cum, hi_rank + 1, side="left"))])
        out_q.append(q)
        out_v.append(lo * 1000 + (hi - lo) * f)
    return pd.DataFrame(
        {"q_pm": np.asarray(out_q, np.int64),
         "value_x1000": np.asarray(out_v, np.int64)}
    )


def quantiles_binned(ds, column: str, *, scale: int = 10, q_pm: list[int] | None = None):
    """Approximate quantiles for CONTINUOUS / unbounded-cardinality
    columns — the sketch path :func:`quantiles_exact` documents: quantize
    to fixed-width integer bins ``floor(value · scale)`` at the map stage
    (per-batch, shuffle-free), then run the same mergeable histogram
    reduction over the BIN space, whose cardinality is bounded by the
    value range × scale rather than the row count. The reported bin is a
    deterministic underestimate of the true quantile by < 1/scale — and
    because the binning rule is fixed, the DuckDB oracle reproduces the
    "approximate" answer exactly. Returns (q_pm, bin)."""

    def to_bins(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy()
        return pa.table({"bin": pa.array(np.floor(v * scale).astype(np.int64))})

    binned = ds.map_batches(to_bins, batch_format="pyarrow")
    return quantiles_exact(binned, "bin", q_pm=q_pm)


def hdr_bucket_index(v: np.ndarray, m_bits: int) -> np.ndarray:
    """HDR-histogram bucket index for non-negative int64 values.

    ``v < 2^m`` → exact bucket ``idx = v``; otherwise with
    ``e = floor(log2 v)`` and ``h = e − m`` the bucket is
    ``idx = (h+1)·2^m + (v >> h) − 2^m`` — 2^m log-spaced sub-buckets
    per octave, so the bucket lower bound under-estimates any member by
    a RELATIVE error < 2^−m. The mapping is a pure function of the
    value (no sampling, no ordering) — the whole sketch is
    order/merge-independent and exactly reproducible in SQL.
    """
    m = m_bits
    idx = v.copy()
    big = v >= np.int64(1 << m)
    if big.any():
        vb = v[big]
        e = (np.frexp(vb.astype(np.float64))[1] - 1).astype(np.int64)
        # exact integer correction of the float exponent (safety for
        # values near octave edges / beyond float53 exactness); the
        # shifts run in uint64 so 1 << 63 (e = 62 at the int64 max
        # octave) cannot overflow into a sign flip
        vb_u = vb.astype(np.uint64)
        e = np.where(
            (np.uint64(1) << (e + 1).astype(np.uint64)) <= vb_u, e + 1, e
        )
        e = np.where((np.uint64(1) << e.astype(np.uint64)) > vb_u, e - 1, e)
        h = e - m
        idx[big] = (h + 1) * np.int64(1 << m) + (vb >> h) - np.int64(1 << m)
    return idx


def hdr_bucket_lo(idx: np.ndarray, m_bits: int) -> np.ndarray:
    """Inverse lower bound of :func:`hdr_bucket_index` buckets."""
    m = m_bits
    lo = idx.copy()
    big = idx >= np.int64(1 << m)
    if big.any():
        h = idx[big] // np.int64(1 << m) - 1
        r = idx[big] % np.int64(1 << m)
        lo[big] = (np.int64(1 << m) + r) << h
    return lo


def hdr_quantiles(
    ds, column: str, *, m_bits: int = 6, q_pm: list[int] | None = None
):
    """Deterministic mergeable quantile sketch for continuous /
    unbounded-cardinality integer columns — the scale path where
    :func:`quantiles_exact`'s O(#distinct) histogram assumption fails
    and :func:`quantiles_binned` would need a known value range.

    HDR-histogram shape (log-spaced buckets, 2^``m_bits`` per octave):
    per-batch dense ``np.bincount`` over bucket indices (the whole index
    space is ≤ ~64·2^m entries — a few KB), ONE small groupby over
    occupied buckets, driver-side cumsum. Counts are a commutative
    monoid, so the sketch is mergeable and the result is independent of
    partitioning/merge order — unlike KLL/t-digest, whose compactions
    are order-sensitive, this sketch is bit-reproducible and the DuckDB
    oracle gates it EXACTLY. Guaranteed bounds (error-bound pytest):
    ``approx ≤ exact_quantile < approx·(1 + 2^−m_bits)``.

    Quantile definition matches :func:`quantiles_exact` (value at
    1-based sorted position ``ceil(q·n/1000)``), reported as the bucket
    lower bound. Domain: non-negative ints (values are clamped at 0).
    Returns (q_pm, approx) pandas frame.
    """
    from ray.data.aggregate import Sum

    q_pm = q_pm or [250, 500, 750, 900, 990]
    m = m_bits

    def partial(batch: pa.Table) -> pa.Table:
        v = np.maximum(batch[column].to_numpy().astype(np.int64), 0)
        idx = hdr_bucket_index(v, m)
        counts = np.bincount(idx)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "idx": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("idx")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(occupied buckets) ≤ ~64·2^m rows
    )
    empty = pd.DataFrame(
        {"q_pm": np.asarray([], np.int64), "approx": np.asarray([], np.int64)}
    )
    if hist.empty:
        return empty
    hist = hist.sort_values("idx")  # bucket index order == value order
    cum = np.cumsum(hist["n"].to_numpy())
    idxs = hist["idx"].to_numpy().astype(np.int64)
    n = int(cum[-1])
    if n == 0:
        return empty
    out_q, out_v = [], []
    for q in q_pm:
        k = (q * n + 999) // 1000  # ceil(q·n/1000), integer-exact
        i = int(np.searchsorted(cum, k, side="left"))
        out_q.append(q)
        out_v.append(int(hdr_bucket_lo(idxs[i : i + 1], m)[0]))
    return pd.DataFrame(
        {"q_pm": np.asarray(out_q, np.int64), "approx": np.asarray(out_v, np.int64)}
    )


def hdr_quantiles_by_group(
    ds,
    group: str,
    column: str,
    *,
    m_bits: int = 6,
    q_pm: list[int] | None = None,
    n_buckets: int = 64,
):
    """Per-group :func:`hdr_quantiles` — the per-key mergeable-sketch
    pattern at scale: each batch emits (group, bucket_idx, count)
    partials (the per-group sketch is a tiny dense histogram), ONE
    bounded ``hash(group) % B`` shuffle merges them, and each bucket
    task finalizes every one of its groups vectorized. Nothing about
    the answer depends on partitioning or merge order, so the DuckDB
    oracle gates it exactly. Returns (group, q_pm, approx) rows.
    """
    from ..util import fast_hash_u64, typed_empty

    q_pm = q_pm or [250, 500, 750, 900, 990]
    m = m_bits
    empty = typed_empty(**{group: object, "q_pm": np.int64, "approx": np.int64})

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group].to_numpy(zero_copy_only=False)
        v = np.maximum(batch[column].to_numpy().astype(np.int64), 0)
        idx = hdr_bucket_index(v, m)
        df = pd.DataFrame({group: g, "idx": idx})
        agg = df.groupby([group, "idx"], as_index=False, sort=False).size()
        b = (fast_hash_u64(agg[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                group: pa.array(agg[group]),
                "idx": pa.array(agg["idx"].to_numpy().astype(np.int64)),
                "n": pa.array(agg["size"].to_numpy().astype(np.int64)),
                "__qb": pa.array(b),
            }
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        hist = (
            df.groupby([group, "idx"], as_index=False)["n"].sum()
            .sort_values([group, "idx"], kind="mergesort")
        )
        out_g, out_q, out_v = [], [], []
        for gname, sub in hist.groupby(group, sort=True):
            cum = np.cumsum(sub["n"].to_numpy())
            idxs = sub["idx"].to_numpy().astype(np.int64)
            n = int(cum[-1])
            if n == 0:
                continue
            for q in q_pm:
                k = (q * n + 999) // 1000
                i = int(np.searchsorted(cum, k, side="left"))
                out_g.append(gname)
                out_q.append(q)
                out_v.append(int(hdr_bucket_lo(idxs[i : i + 1], m)[0]))
        return pd.DataFrame(
            {
                group: out_g,
                "q_pm": np.asarray(out_q, np.int64),
                "approx": np.asarray(out_v, np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__qb")
        .map_groups(finalize, batch_format="pandas")
    )


def grouped_linreg(
    ds,
    group: str,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int = 64,
    scale: int = 1_000_000,
):
    """Per-group OLS slope/intercept, INTEGER-EXACT: each batch emits the
    five sufficient statistics (n, Σx, Σy, Σxy, Σx²) as partials — the
    classic mergeable-moments shape, one bounded ``hash(group) % B``
    shuffle, then the closed form is evaluated in PYTHON BIGINTS

        slope_x1m     = floor(scale · (n·Σxy − Σx·Σy) / (n·Σx² − Σx²_tot))
        intercept_x1m = floor(scale · (Σy·Σx² − Σx·Σxy) / (n·Σx² − Σx²_tot))

    (DuckDB mirrors it in HUGEINT; the Ray side runs the same products
    in Python bigints over the tiny per-group totals). CALLER CONTRACT:
    pre-scale x so per-batch |Σx·y| and |Σx²| stay inside int64 — the
    partial pass is then pure vectorized int64 numpy (e.g. timestamps
    as HOURS since epoch: x ~ 5·10^5, x² ~ 2.4·10^11, a million-row
    batch of cents values stays < 2^63) — only the O(#groups) finalize
    touches arbitrary precision, where scale·(n·Σxy − ΣxΣy) does exceed
    int64. The denominator n·Σx² − (Σx)² is ≥ 0 (Cauchy–Schwarz), so
    floor division needs no sign gymnastics; groups with < 2 distinct x
    (den = 0) emit no row. Returns (group, n, slope_x1m, intercept_x1m).
    """
    from ..util import fast_hash_u64, typed_empty

    empty = typed_empty(
        **{
            group: object,
            "n": np.int64,
            "slope_x1m": np.int64,
            "intercept_x1m": np.int64,
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group].to_numpy(zero_copy_only=False)
        x = batch[x_col].to_numpy().astype(np.int64)
        y = batch[y_col].to_numpy().astype(np.int64)
        df = pd.DataFrame(
            {group: g, "n": np.ones(len(x), np.int64), "sx": x, "sy": y,
             "sxy": x * y, "sxx": x * x}
        )
        agg = df.groupby(group, as_index=False, sort=False).sum()
        b = (fast_hash_u64(agg[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.Table.from_pandas(
            agg.assign(__qb=b), preserve_index=False
        ).replace_schema_metadata(None)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        out_g, out_n, out_s, out_i = [], [], [], []
        for gname, sub in df.groupby(group, sort=True):
            # All five sufficient statistics fold in Python bigints:
            # per-batch partials obey int64, but the cross-batch sums
            # (Σx over a whole group especially) need not.
            n = sum(int(v) for v in sub["n"])
            sx = sum(int(v) for v in sub["sx"])
            sy = sum(int(v) for v in sub["sy"])
            sxy = sum(int(v) for v in sub["sxy"])
            sxx = sum(int(v) for v in sub["sxx"])
            den = n * sxx - sx * sx  # >= 0 by Cauchy-Schwarz
            if den == 0:
                continue
            out_g.append(gname)
            out_n.append(n)
            out_s.append(scale * (n * sxy - sx * sy) // den)
            out_i.append(scale * (sy * sxx - sx * sxy) // den)
        return pd.DataFrame(
            {
                group: out_g,
                "n": np.asarray(out_n, np.int64),
                "slope_x1m": np.asarray(out_s, np.int64),
                "intercept_x1m": np.asarray(out_i, np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__qb")
        .map_groups(finalize, batch_format="pandas")
    )


def _dominated_mask(P: np.ndarray, chunk: int = 512) -> np.ndarray:
    """True where row i is STRICTLY dominated by some row j (all dims of
    j ≥ i, at least one >) — all dims maximize. Blocked broadcasting
    keeps the k² comparison matrix O(k·chunk) in memory."""
    k = len(P)
    out = np.zeros(k, dtype=bool)
    for s in range(0, k, chunk):
        Q = P[s : s + chunk]  # candidates to be dominated (chunk, d)
        ge = (P[:, None, :] >= Q[None, :, :]).all(axis=2)  # (k, chunk)
        gt = (P[:, None, :] > Q[None, :, :]).any(axis=2)
        out[s : s + chunk] = (ge & gt).any(axis=0)
    return out


def skyline(ds, *, maximize: list[str], minimize: list[str] = (), keep: list[str] = ()):
    """Pareto skyline: rows not strictly dominated by any other row
    (dominator ≥ everywhere on the criteria, > somewhere; ``minimize``
    columns are negated into the maximize frame; ties/duplicates are
    mutually non-dominating and ALL survive — deterministic).

    Scale shape — the classic two-phase skyline: dominance is
    transitive, so the global skyline is a subset of the union of
    per-batch LOCAL skylines; phase 1 prunes each batch to its local
    skyline (vectorized blocked dominance matrix, no Python per row),
    phase 2 re-runs the same filter once over the surviving candidates
    (typically orders of magnitude smaller than the input — for d
    criteria over n random rows the expected skyline is
    O(log^{d-1} n)). The candidate set is the only thing that crosses
    the (single, tiny) shuffle. Degenerate worst case (all rows on the
    front) degrades to a documented single-task filter of the full
    front, not a wrong answer.
    """
    crit = list(maximize) + list(minimize)
    cols = crit + [c for c in keep if c not in crit]
    n_min = len(list(minimize))
    from .dedup import _pd_dtypes

    dtypes = _pd_dtypes(ds)
    empty = typed_empty(**{c: dtypes.get(c, object) for c in cols})

    def to_matrix(batch: pa.Table) -> np.ndarray:
        # Integer criteria compare in int64 (exact above 2^53, where a
        # float64 cast could flip dominance vs the integer-exact
        # NOT-EXISTS oracle); only float inputs fall back to float64.
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in crit]
        all_int = all(np.issubdtype(a.dtype, np.integer) for a in arrs)
        dt = np.int64 if all_int else np.float64
        m = np.stack([a.astype(dt) for a in arrs], axis=1)
        if n_min:
            m[:, len(list(maximize)):] *= -1
        return m

    def local(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        if batch.num_rows == 0:
            return batch
        keep_mask = ~_dominated_mask(to_matrix(batch))
        return batch.filter(pa.array(keep_mask))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        t = pa.Table.from_pandas(df.drop(columns=["__sk"]), preserve_index=False)
        return local(t).to_pandas()

    cand = ds.map_batches(local, batch_format="pyarrow").map_batches(
        lambda t: t.append_column("__sk", pa.array(np.zeros(t.num_rows, np.int32))),
        batch_format="pyarrow",
    )
    return cand.groupby("__sk").map_groups(final, batch_format="pandas")


def grouped_top_k(
    ds,
    *,
    group: str,
    order_col: str,
    id_col: str,
    k: int = 2,
    n_buckets: int = 64,
):
    """Top-k rows per group (order_col desc, id asc tie-break) — the
    per-group window query (``row_number() OVER (PARTITION BY …)``)
    without per-group dispatch: one bounded-bucket shuffle on
    ``hash(group) % B``, then each bucket ranks ALL its groups with one
    vectorized sort + cumcount."""
    from ..util import fast_hash_u64

    def tag(batch: pa.Table) -> pa.Table:
        g = batch[group].to_numpy()
        b = (fast_hash_u64(g) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                group: batch[group],
                order_col: batch[order_col],
                id_col: batch[id_col],
                "__gb": pa.array(b),
            }
        )

    empty = typed_empty(
        **{group: np.int64, "rank": np.int64, id_col: np.int64, order_col: np.int64}
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        s = df.sort_values(
            [group, order_col, id_col], ascending=[True, False, True], kind="mergesort"
        )
        rank = s.groupby(group, sort=False).cumcount().to_numpy() + 1
        keep = rank <= k
        return pd.DataFrame(
            {
                group: s[group].to_numpy()[keep],
                "rank": rank[keep].astype(np.int64),
                id_col: s[id_col].to_numpy()[keep],
                order_col: s[order_col].to_numpy()[keep],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def hash_join(
    left_ds,
    right_ds,
    key: str | list[str],
    *,
    n_buckets: int = 16,
    suffix: str = "_r",
    native: bool = False,
    how: str = "inner",
):
    """Partitioned hash join for two LARGE sides: bucket both by
    ``hash(key) % B``, co-group via one shuffle, pandas-merge per bucket.

    ``key`` may be a list of column names for a composite equi-join
    (e.g. joining wedge candidates against an edge set on ``(v, w)``);
    the bucket id then mixes all key columns with a Fibonacci-constant
    combine so co-partitioning still holds per composite value. The
    single-key bucket function is unchanged (integer keys bucket by
    ``value % B``), so chained stages that reuse it stay co-partitioned.

    ``native=True`` delegates to Ray's built-in hash-shuffle
    ``Dataset.join`` (same inner-join + collision-suffix semantics —
    verified column-for-column by test_relational's parity test); the
    portable path stays the default because its bucket function is the
    engine's own (stable across Ray versions, reusable as the
    partitioning key of adjacent stages) and it documents the strategy
    explicitly (bucket count B scales with cluster size; salt hot keys
    into sub-buckets if one key dominates).

    ``how``: 'inner' (default), 'left' (left-outer: unmatched left rows
    keep nulls in the right columns, which come back as NULLABLE arrow
    ints — never silently floated), 'full' (full outer: unmatched rows
    of EITHER side survive with nulls on the other side's columns —
    correct under the bucket shuffle because both sides co-partition by
    the same key hash, so a key's rows can only ever meet, or miss each
    other, inside one bucket), 'semi' (left rows WITH a right
    match) or 'anti' (left rows WITHOUT one) — semi/anti return the left
    columns only and need just the right side's KEY column shipped
    through the shuffle."""
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(f"how={how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if native and how == "inner" and hasattr(type(left_ds), "join"):
        return left_ds.join(
            right_ds,
            "inner",
            num_partitions=n_buckets,
            on=tuple(keys),
            right_suffix=suffix,
        )
    from ..util import fast_hash_u64

    lsch = left_ds.schema()  # ray.data Schema wrapper: .names / .types
    rsch = right_ds.schema()
    lcols = list(lsch.names)
    rcols_orig = (
        [] if how in ("semi", "anti") else [c for c in rsch.names if c not in keys]
    )
    rename = {c: (c + suffix if c in lcols else c) for c in rcols_orig}
    rcols = keys + [rename[c] for c in rcols_orig]
    all_cols = lcols + [c for c in rcols if c not in lcols]
    types = dict(zip(lsch.names, lsch.types))
    for c, t in zip(rsch.names, rsch.types):
        if c in rename:  # semi/anti ship only the right KEY column
            types[rename[c]] = t
    # typed empty join result for the empty groups the sort-based groupby
    # emits (schema-less blocks otherwise — the round-1 executor warnings)
    empty_out = pa.schema([(c, types[c]) for c in all_cols]).empty_table().to_pandas()

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            if side == "r":
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names]
                )
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    cols[c] = batch[c]
                else:
                    cols[c] = pa.nulls(batch.num_rows, type=types[c])
            t = pa.table(cols)

            def col_hash(name: str) -> np.ndarray:
                kc = batch[name]
                if pa.types.is_integer(kc.type):
                    return kc.to_numpy().astype(np.uint64)
                return fast_hash_u64(kc.to_pylist())

            if len(keys) == 1:
                h = col_hash(keys[0])
            else:  # mix columns; golden-ratio combine keeps it vectorized
                h = np.zeros(batch.num_rows, dtype=np.uint64)
                for k in keys:
                    h = h * np.uint64(0x9E3779B97F4A7C15) + col_hash(k)
            b = pa.array((h % np.uint64(n_buckets)).astype(np.int32))
            return t.append_column("__bucket", b).append_column(
                "__side", pa.array([side] * batch.num_rows)
            )

        return fn

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty_out.copy()
        l = group[group["__side"] == "l"][lcols]
        r = group[group["__side"] == "r"][rcols]
        if how in ("semi", "anti"):
            if len(keys) == 1:
                hit = l[keys[0]].isin(r[keys[0]].unique())
            else:
                probe = r[keys].drop_duplicates()
                m = l[keys].merge(probe, on=keys, how="left", indicator=True)
                hit = (m["_merge"].to_numpy() == "both")
            out = l[hit] if how == "semi" else l[~hit]
        elif how == "full":
            out = l.merge(r, on=keys, how="outer")
        else:
            out = l.merge(r, on=keys, how="left" if how == "left" else "inner")
        if not len(out):
            return empty_out.copy()
        # the union pads each side's missing columns with nulls, which
        # floats int64 columns in pandas blocks; the inner merge keeps only
        # real values, so cast back losslessly (dtype drift otherwise
        # breaks bucket hashing in a chained second join). A left merge
        # keeps REAL nulls on unmatched rows — those int columns go to
        # pandas' nullable Int64 (→ nullable Arrow int64), never float.
        for c in out.columns:
            want = empty_out[c].dtype
            if out[c].dtype != want and want.kind in ("i", "u"):
                if out[c].isna().any():
                    out[c] = out[c].astype("Int64")
                else:
                    out[c] = out[c].astype(want)
        return out

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )
    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def running_agg(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    n_buckets: int = 64,
):
    """Per-group cumulative sum — ``SUM(value) OVER (PARTITION BY group
    ORDER BY order, id ROWS UNBOUNDED PRECEDING)`` — as (id, running_c).

    Scale shape: the same bounded-bucket window formulation as
    ``grouped_top_k``/``sessionize`` — one shuffle on ``hash(group) % B``,
    then each bucket orders ALL its groups with one mergesort and runs a
    single vectorized ``groupby(...).cumsum`` (never a Python call per
    group). Ties on the order column break by id, so the prefix sums are
    deterministic and oracle-reproducible. Values enter as floor-cents.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        b = (fast_hash_u64(batch[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                group: batch[group],
                "__us": pc.cast(pc.cast(batch[order], pa.timestamp("us")), pa.int64()),
                id_col: pc.cast(batch[id_col], pa.int64()),
                "__c": pa.array(_cents(batch[value].to_numpy())),
                "__wb": pa.array(b),
            }
        )

    empty = typed_empty(**{id_col: np.int64, "running_c": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        g = g.sort_values([group, "__us", id_col], kind="mergesort")
        run = g.groupby(group, sort=False)["__c"].cumsum()
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "running_c": run.to_numpy()}
        )

    return (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def pivot_counts(
    ds,
    *,
    row: str,
    col: str,
    col_values: list[str],
    n_buckets: int = 32,
):
    """Long→wide count pivot: one output row per ``row`` value, one int64
    column per entry of ``col_values`` (the pivot's column set is an
    explicit argument — discovering it would be a separate tiny
    distinct pass — so the output schema is static and oracle-checkable).

    Scale shape: each batch partial-aggregates to its own crosstab
    (#rows-in-batch distinct row keys × fixed columns), then one bounded
    bucketed shuffle on the row key sums the partials. ``col`` values
    outside ``col_values`` are counted under ``other``.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    cset = list(dict.fromkeys(col_values))
    out_cols = cset + ["other"]

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {row: batch[row].to_pylist(), col: batch[col].to_pylist()}
        )
        df[col] = df[col].where(df[col].isin(cset), "other")
        ct = (
            df.groupby([row, col], as_index=False)
            .size()
            .pivot(index=row, columns=col, values="size")
        )
        for c in out_cols:
            if c not in ct.columns:
                ct[c] = 0
        ct = ct[out_cols].fillna(0).astype(np.int64).reset_index()
        return pa.Table.from_pandas(ct, preserve_index=False).replace_schema_metadata(None)

    empty = typed_empty(**{row: object, **{c: np.int64 for c in out_cols}})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(row, as_index=False)[out_cols].sum()

    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [row],
        combine,
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    )


def rollup_aggregate(
    ds,
    *,
    keys: list[str],
    value: str,
    sentinel: str = "ALL",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """``GROUP BY ROLLUP(keys...)`` — the base aggregate plus every
    prefix-level subtotal and the grand total, with ``sentinel`` standing
    in for SQL's rolled-up NULL (null-free outputs hash exactly).

    Scale shape: the full-granularity aggregate reduces per batch first
    (floor-cents partial sums), one bounded-bucket shuffle finishes it,
    and every coarser level derives from the BASE aggregate on the
    driver — the rollup of an aggregate is an aggregate of the
    aggregate, so the corpus is read and shuffled exactly once and the
    driver only ever sees the (small by definition) result table.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({k: batch[k].to_pylist() for k in keys})
        df["value_c"] = _cents(batch[value].to_numpy())
        return pa.Table.from_pandas(
            df.groupby(keys, as_index=False)["value_c"].sum(),
            preserve_index=False,
        ).replace_schema_metadata(None)

    empty = typed_empty(**{**{k: object for k in keys}, "value_c": np.int64})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)["value_c"].sum()

    base = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        combine,
        n_buckets=n_buckets,
        empty=empty,
    ).to_pandas()  # small by definition: one row per distinct key tuple

    levels = [base]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        lv = (
            base.groupby(kept, as_index=False)["value_c"].sum()
            if kept
            else pd.DataFrame({"value_c": [base["value_c"].sum()]})
        )
        for k in keys[depth:]:
            lv[k] = sentinel
        levels.append(lv[keys + ["value_c"]])
    out = pd.concat(levels, ignore_index=True)
    out["value_c"] = out["value_c"].astype(np.int64)
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def cube_aggregate(
    ds,
    *,
    keys: list[str],
    value: str,
    sentinel: str = "ALL",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """``GROUP BY CUBE(keys...)`` — the base aggregate plus a subtotal
    for EVERY subset of the keys (2^k grouping sets), ``sentinel``
    standing in for the cubed-away NULL. Same scale shape as
    :func:`rollup_aggregate`: the corpus is read, partially aggregated
    per batch and shuffled exactly once for the full-granularity
    aggregate; all 2^k-1 coarser grouping sets derive from that (small)
    base table on the driver — never extra corpus passes.
    """
    from itertools import combinations

    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({k: batch[k].to_pylist() for k in keys})
        df["value_c"] = _cents(batch[value].to_numpy())
        return pa.Table.from_pandas(
            df.groupby(keys, as_index=False)["value_c"].sum(),
            preserve_index=False,
        ).replace_schema_metadata(None)

    empty = typed_empty(**{**{k: object for k in keys}, "value_c": np.int64})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)["value_c"].sum()

    base = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        combine,
        n_buckets=n_buckets,
        empty=empty,
    ).to_pandas()  # small by definition: one row per distinct key tuple

    levels = [base]
    for depth in range(len(keys) - 1, -1, -1):
        for kept in combinations(keys, depth):
            kept = list(kept)
            lv = (
                base.groupby(kept, as_index=False)["value_c"].sum()
                if kept
                else pd.DataFrame({"value_c": [base["value_c"].sum()]})
            )
            for k in keys:
                if k not in kept:
                    lv[k] = sentinel
            levels.append(lv[keys + ["value_c"]])
    out = pd.concat(levels, ignore_index=True)
    out["value_c"] = out["value_c"].astype(np.int64)
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def grouped_quantiles_exact(
    ds,
    key: str,
    column: str,
    *,
    q_pm: list[int] | None = None,
    n_buckets: int = 32,
):
    """Per-group exact quantiles of an integer column — the histogram
    formulation of ``quantiles_exact``, per group: per-batch (key, value)
    counts partial-aggregate inside the mapper, ONE bounded-bucket
    shuffle sums the per-group histograms (each key lands wholly in one
    bucket), and the quantile scan runs vectorized inside the bucket —
    never on the driver, never one UDF call per group.

    Quantile definition (mirrored in the SQL oracle): ``q`` per-mille →
    the value at 1-based sorted position ``ceil(q·n/1000)`` within the
    group. Scale assumption: per-group DISTINCT value cardinality ≪
    group row count (integer cents / scores / token counts); the number
    of GROUPS is unbounded (bucketed shuffle).
    """
    from ..stages.dedup import bucketed_aggregate
    from ..util import typed_empty

    q_pm = q_pm or [250, 500, 750, 900, 990]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key, column]).to_pandas()
        agg = df.groupby([key, column], as_index=False).size()
        agg = agg.rename(columns={column: "v", "size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key]
    key_dtype = np.int64 if pa.types.is_integer(key_type) else object
    empty = typed_empty(**{key: key_dtype, "q_pm": np.int64, column: np.int64})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby([key, "v"], as_index=False)["n"].sum()
        h = h.sort_values([key, "v"], kind="mergesort").reset_index(drop=True)
        cum = h.groupby(key)["n"].cumsum()
        tot = h.groupby(key)["n"].transform("sum")
        parts: list[pd.DataFrame] = []
        for q in q_pm:
            kq = -(-q * tot // 1000)  # ceil per row, integer-exact
            sel = h[cum >= kq].groupby(key, as_index=False).first()[[key, "v"]]
            sel = sel.rename(columns={"v": column})
            sel["q_pm"] = np.int64(q)
            parts.append(sel)
        out = pd.concat(parts, ignore_index=True)
        return out[[key, "q_pm", column]].astype({"q_pm": np.int64, column: np.int64})

    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        combine,
        n_buckets=n_buckets,
        empty=empty,
    )

def lag_gaps(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = 64,
):
    """Per-group gap to the previous row — ``order_us -
    LAG(order_us) OVER (PARTITION BY group ORDER BY order, id)`` — as
    (id, group, gap_us); the first row of each group gets ``-1``.

    The inter-arrival-time op of behavioral/event analysis (bot
    detection, retention, rate estimation). Same bounded-bucket window
    shape as ``running_agg``: one shuffle on ``hash(group) % B``, one
    vectorized mergesort + ``groupby(...).shift`` per bucket — never a
    Python call per group, so group cardinality is unbounded.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        b = (fast_hash_u64(batch[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                group: batch[group],
                "__us": pc.cast(pc.cast(batch[order], pa.timestamp("us")), pa.int64()),
                id_col: pc.cast(batch[id_col], pa.int64()),
                "__wb": pa.array(b),
            }
        )

    empty = typed_empty(**{id_col: np.int64, group: np.int64, "gap_us": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        g = g.sort_values([group, "__us", id_col], kind="mergesort")
        prev = g.groupby(group, sort=False)["__us"].shift(1)
        gap = (g["__us"] - prev).fillna(-1).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                group: g[group].to_numpy(),
                "gap_us": gap.to_numpy(),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def grouped_concat(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    id_col: str = "event_id",
    token: str = "event_type",
    sep: str = ">",
    n_buckets: int = 64,
):
    """Ordered per-group token concatenation — ``string_agg(token, sep
    ORDER BY order, id)`` — as (group, path, n). The
    session-path/sequence-building op (user journeys, clickstreams,
    training-sequence assembly from events).

    Scale shape: one ``hash(group) % B`` shuffle; inside each bucket one
    mergesort orders ALL groups, then the concatenation runs as a single
    pandas ``groupby(...).agg(join)`` pass. The join callable is a
    per-group cython dispatch (not a per-group RAY call — the pathology
    this module avoids); group count per bucket is corpus/B-bounded.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        b = (fast_hash_u64(batch[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                group: batch[group],
                "__us": pc.cast(pc.cast(batch[order], pa.timestamp("us")), pa.int64()),
                id_col: pc.cast(batch[id_col], pa.int64()),
                token: pc.cast(batch[token], pa.string()),
                "__wb": pa.array(b),
            }
        )

    empty = typed_empty(**{group: np.int64, "path": object, "n": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        g = g.sort_values([group, "__us", id_col], kind="mergesort")
        agg = g.groupby(group, sort=False)[token].agg([(sep.join), "size"])
        agg.columns = ["path", "n"]
        agg = agg.reset_index()
        agg["n"] = agg["n"].astype(np.int64)
        return agg[[group, "path", "n"]]

    return (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def distinct_count_by(
    ds,
    group: str,
    value: str,
    *,
    out_col: str = "n_distinct",
    n_buckets: int = 64,
):
    """Exact ``COUNT(DISTINCT value) GROUP BY group`` — the
    daily-active-users / unique-visitors op — with NO assumption that a
    group's distinct set fits anywhere:

    1. per-batch ``drop_duplicates`` partial (free dedup, no shuffle);
    2. ONE bucketed shuffle on ``hash(group, value) % B`` — each distinct
       (group, value) PAIR lands wholly in one bucket, so an in-bucket
       dedup + per-group count is an exact PARTIAL count (a hot group's
       distinct set is spread across many buckets — never co-located);
    3. a second bounded shuffle on ``hash(group)`` sums the B partials.

    Both shuffles move O(distinct pairs), not O(rows).
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[group]
    key_dtype = np.int64 if pa.types.is_integer(key_type) else object
    empty = typed_empty(**{group: key_dtype, out_col: np.int64})

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([group, value])
        out = d.groupby(group, as_index=False)[value].count()
        out = out.rename(columns={value: out_col})
        out[out_col] = out[out_col].astype(np.int64)
        return out

    partials = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group, value],
        count_pairs,
        n_buckets=n_buckets,
        empty=empty,
    )

    def sum_partials(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group, as_index=False)[out_col].sum()
        out[out_col] = out[out_col].astype(np.int64)
        return out

    return bucketed_aggregate(
        partials,
        [group],
        sum_partials,
        n_buckets=min(n_buckets, 16),
        empty=empty,
        coalesce_first=False,
    )


def exact_distinct(ds, cols: list[str], *, n_buckets: int = 64):
    """Exact DISTINCT over ``cols`` — per-batch ``drop_duplicates``
    partial (free, no shuffle) then ONE bucketed shuffle on
    ``hash(cols) % B`` with an in-bucket dedup. Every distinct tuple
    lands wholly in one bucket, so the result is exact; the shuffle
    moves O(distinct tuples), not O(rows). The set-normalization
    front-half of distinct-count / retention / co-occurrence analyses.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    empty = typed_empty(
        **{
            c: (np.int64 if pa.types.is_integer(types[c]) else object)
            for c in cols
        }
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(cols)

    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        cols,
        dedup,
        n_buckets=n_buckets,
        empty=empty,
    )


def percent_rank_map(ds, column: str, *, out_col: str = "pr_pm"):
    """Global percent-rank scoring of an integer column: every row gets
    ``1000·(#rows with a strictly smaller value) // (n-1)`` (min-rank tie
    semantics, matching SQL ``rank() OVER (ORDER BY col)``) — the
    percentile-normalization op of quality-score calibration.

    Two streaming passes, NO global sort: (1) the same O(#distinct)
    value-histogram as :func:`quantiles_exact` (per-batch ``np.unique``
    partials, one small groupby, driver cumsum — documented
    bounded-distinct assumption); (2) the cumulative table is broadcast
    via ``ray.put`` and every batch binary-searches its own ranks.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy()
        vals, counts = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(#distinct) rows only
        .sort_values("v")
    )
    vals = hist["v"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    smaller = np.concatenate([[0], np.cumsum(counts)[:-1]])  # rank-1 per value
    n = int(counts.sum())
    ref = ray.put((vals, smaller, max(n - 1, 1)))

    def score(batch: pa.Table) -> pa.Table:
        v, sm, denom = ray.get(ref)
        x = batch[column].to_numpy()
        idx = np.searchsorted(v, x)
        pr = 1000 * sm[idx] // denom
        return batch.append_column(out_col, pa.array(pr.astype(np.int64)))

    return ds.map_batches(score, batch_format="pyarrow")


def corr_moments(ds, x: str, y: str):
    """Single-pass distributed correlation moments of two integer
    columns: one row (n, sum_x, sum_y, sum_xx, sum_yy, sum_xy) — the
    mergeable sufficient statistics for Pearson r / least-squares fits,
    computed as per-batch int64 partial sums + one tiny driver fold
    (same shape as ``corpus_stats``; no shuffle).

    Accumulation is int64: callers keep ``x·y`` products within int64
    range at their row count (pre-scale the cents, or fold the partials
    with arbitrary-precision ints as ``table_checksum`` does, when
    pushing toward 10^12 rows × large magnitudes).
    """

    def partial(batch: pa.Table) -> pa.Table:
        xv = batch[x].to_numpy().astype(np.int64)
        yv = batch[y].to_numpy().astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(xv)], type=pa.int64()),
                "sum_x": pa.array([int(xv.sum())], type=pa.int64()),
                "sum_y": pa.array([int(yv.sum())], type=pa.int64()),
                "sum_xx": pa.array([int((xv * xv).sum())], type=pa.int64()),
                "sum_yy": pa.array([int((yv * yv).sum())], type=pa.int64()),
                "sum_xy": pa.array([int((xv * yv).sum())], type=pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    )
    return parts.sum().to_frame().T.astype("int64")


def skew_join(
    left_ds,
    right_ds,
    key: str,
    *,
    n_buckets: int = 16,
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    how: str = "inner",
    suffix: str = "_r",
):
    """Skew-aware partitioned join: :func:`hash_join` semantics, but keys
    whose LEFT-side row count exceeds ``hot_threshold`` are salted across
    ``n_salts`` sub-partitions so one hot key can never pin a whole
    bucket on one task (the explicit-skew-handling requirement of the
    north rule).

    Three passes, all bounded:

    1. exact hot-key census: per-batch partial counts → one bucketed
       shuffle → keys over the threshold. The hot SET is small by
       construction (≤ corpus/threshold keys) and is broadcast via
       ``ray.put``;
    2. salt rewrite: left hot rows get a round-robin salt (result is
       salt-assignment-invariant: every salt sees the full right side for
       that key); right hot rows REPLICATE once per salt — extra shuffle
       volume is ``n_salts × |right hot rows|``, the classic trade;
    3. delegate to ``hash_join`` on the namespaced salted key
       (``k:<key>`` vs ``h:<key>:<salt>`` — no cross-namespace
       collisions), then drop the helper columns.
    """
    import ray

    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def count_partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key]).to_pandas()
        g = df.groupby(key, as_index=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    lsch = left_ds.schema()
    key_type = dict(zip(lsch.names, lsch.types))[key]
    key_dtype = np.int64 if pa.types.is_integer(key_type) else object
    empty_c = typed_empty(**{key: key_dtype, "n": np.int64})

    def sum_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    census = bucketed_aggregate(
        left_ds.map_batches(count_partial, batch_format="pyarrow"),
        [key],
        sum_counts,
        n_buckets=n_buckets,
        empty=empty_c,
        coalesce_first=False,
    )
    hot_df = census.map_batches(
        lambda t: t.filter(pc.greater(t["n"], hot_threshold)),
        batch_format="pyarrow",
    ).to_pandas()
    hot = frozenset(hot_df[key].tolist())
    hot_ref = ray.put(hot)

    def salt_left(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        ks = batch[key].to_pylist()
        salts = np.arange(len(ks)) % max(n_salts, 1)
        sk = [
            f"h:{k}:{s}" if k in hs else f"k:{k}"
            for k, s in zip(ks, salts)
        ]
        return batch.append_column("__sk", pa.array(sk, type=pa.string()))

    def salt_right(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        ks = batch[key].to_pylist()
        take: list[int] = []
        sk: list[str] = []
        for i, k in enumerate(ks):
            if k in hs:
                for s in range(n_salts):
                    take.append(i)
                    sk.append(f"h:{k}:{s}")
            else:
                take.append(i)
                sk.append(f"k:{k}")
        t = batch.take(pa.array(take, type=pa.int64()))
        return t.append_column("__sk", pa.array(sk, type=pa.string()))

    left_s = left_ds.map_batches(salt_left, batch_format="pyarrow")
    if how in ("semi", "anti"):
        right_s = right_ds.map_batches(salt_right, batch_format="pyarrow").select_columns(
            ["__sk"]
        )
    else:
        # the right's key column would collide with the left's as a
        # payload column; it is redundant (equal to the left's on every
        # matched row), so ship everything BUT it
        right_s = right_ds.map_batches(salt_right, batch_format="pyarrow").drop_columns(
            [key]
        )
    joined = hash_join(
        left_s, right_s, "__sk", n_buckets=n_buckets, suffix=suffix, how=how
    )
    return joined.drop_columns(["__sk"])


def rolling_agg(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    window_rows: int = 7,
    n_buckets: int = 64,
):
    """Per-group rolling row-window sum — ``SUM(value) OVER (PARTITION BY
    group ORDER BY order, id ROWS BETWEEN window_rows-1 PRECEDING AND
    CURRENT ROW)`` — as (id, roll_c).

    The bounded-lookback window of rate/limit/trend features (7-event
    spend, N-request rate). Same bounded-bucket shape as ``running_agg``:
    one shuffle on ``hash(group) % B``, one mergesort per bucket, then the
    rolling sum in pure integer math as ``cumsum - cumsum.shift(w)``
    within each group (no float rolling kernel, no per-group dispatch).
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        b = (fast_hash_u64(batch[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                group: batch[group],
                "__us": pc.cast(pc.cast(batch[order], pa.timestamp("us")), pa.int64()),
                id_col: pc.cast(batch[id_col], pa.int64()),
                "__c": pa.array(_cents(batch[value].to_numpy())),
                "__wb": pa.array(b),
            }
        )

    empty = typed_empty(**{id_col: np.int64, "roll_c": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        g = g.sort_values([group, "__us", id_col], kind="mergesort")
        grp = g.groupby(group, sort=False)["__c"]
        cs = grp.cumsum().to_numpy()
        # cumsum w rows back within the group; rows with < w predecessors
        # subtract 0 (their window is the whole prefix)
        back = (
            g.assign(__cs=cs)
            .groupby(group, sort=False)["__cs"]
            .shift(window_rows)
            .fillna(0)
            .to_numpy()
            .astype(np.int64)
        )
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "roll_c": cs - back}
        )

    return (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def funnel_counts(
    ds,
    stages: list[str],
    *,
    group: str = "user_id",
    order: str = "ts",
    type_col: str = "event_type",
    n_buckets: int = 64,
):
    """Staged conversion funnel: how many ``group`` entities performed
    ``stages[0]``, then ``stages[1]`` STRICTLY AFTER their first
    ``stages[0]``, then ``stages[2]`` strictly after that first
    qualifying ``stages[1]``, … Returns one row per stage:
    (stage_idx, stage, n_users).

    The product-analytics funnel (view → click → purchase). Scale shape:
    each user's entire event history lands in one bucket via one shuffle
    on ``hash(group) % B``; inside a bucket every stage transition is a
    vectorized merge + filter + groupby-min over ALL users at once (the
    loop is over the fixed, small stage list — never over users). Bucket
    partials are B×len(stages) tiny rows, merged on the driver.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        b = (fast_hash_u64(batch[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                group: batch[group],
                "__us": pc.cast(pc.cast(batch[order], pa.timestamp("us")), pa.int64()),
                type_col: batch[type_col],
                "__wb": pa.array(b),
            }
        )

    empty = typed_empty(stage_idx=np.int64, n_users=np.int64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        counts = []
        survivors = None  # user -> earliest qualifying ts of the previous stage
        for i, st in enumerate(stages):
            ev = g.loc[g[type_col] == st, [group, "__us"]]
            if survivors is not None:
                ev = ev.merge(survivors, on=group, how="inner")
                ev = ev.loc[ev["__us"] > ev["bound"], [group, "__us"]]
            cur = ev.groupby(group, as_index=False)["__us"].min()
            survivors = cur.rename(columns={"__us": "bound"})
            counts.append(len(cur))
        return pd.DataFrame(
            {
                "stage_idx": np.arange(len(stages), dtype=np.int64),
                "n_users": np.asarray(counts, dtype=np.int64),
            }
        )

    parts = (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # bounded: n_buckets × len(stages) rows
    )
    if parts.empty:
        out = pd.DataFrame({"stage_idx": np.arange(len(stages), dtype=np.int64)})
        out["n_users"] = np.int64(0)
    else:
        out = parts.groupby("stage_idx", as_index=False)["n_users"].sum()
    out["stage"] = [stages[i] for i in out["stage_idx"]]
    return out[["stage_idx", "stage", "n_users"]].astype(
        {"stage_idx": np.int64, "n_users": np.int64}
    )


def grouped_mode(
    ds,
    *,
    group: str = "user_id",
    value: str = "event_type",
    n_buckets: int = 64,
):
    """Most frequent ``value`` per ``group`` (the grouped MODE), with a
    deterministic tie-break: highest count wins, ties go to the
    lexicographically smallest value. Returns (group, mode_<value>, n).

    Scale shape: per-batch partial (group, value, n) counts shrink the
    input to its distinct-pair cardinality BEFORE the one shuffle on
    ``hash(group) % B``; the argmax inside a bucket is one vectorized
    sort + drop_duplicates over all groups (no per-group dispatch). A
    group's in-bucket footprint is its distinct-value count, not its row
    count — safe for categorical/mode workloads by construction.
    """
    from ..util import fast_hash_u64, typed_empty

    out_col = f"mode_{value}"

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {group: batch[group].to_numpy(), value: batch[value].to_pylist()}
        )
        p = df.groupby([group, value], as_index=False).size()
        p = p.rename(columns={"size": "n"})
        b = (fast_hash_u64(p[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        p["__wb"] = b
        return pa.Table.from_pandas(p, preserve_index=False).replace_schema_metadata(
            None
        )

    empty = typed_empty(**{group: np.int64, out_col: object, "n": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        c = g.groupby([group, value], as_index=False)["n"].sum()
        c = c.sort_values(
            [group, "n", value], ascending=[True, False, True], kind="mergesort"
        )
        m = c.drop_duplicates(group, keep="first")
        return pd.DataFrame(
            {
                group: m[group].to_numpy(),
                out_col: m[value].to_numpy(),
                "n": m["n"].to_numpy(),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def interval_coverage(
    ds,
    *,
    group: str = "user_id",
    start: str = "ts",
    dur_s: int = 300,
    n_buckets: int = 64,
):
    """Union of per-group time intervals (the "merge overlapping
    intervals" / gaps-and-islands op): each row opens an interval
    ``[start, start + dur_s)``; overlapping/touching intervals within a
    group merge, and the result is one row
    ``(group, active_s, n_islands)`` per group — total covered seconds
    and the number of disjoint activity islands. The user-active-time /
    coverage metric behavioral analytics runs; SQL needs a two-window
    islands construction for it (mirrored exactly in the oracle).

    Scale shape, same bounded-bucket window as ``lag_gaps``: one shuffle
    on ``hash(group) % B``, then per bucket ONE vectorized pass —
    mergesort by (group, start), running-max of interval ends via
    ``groupby().cummax``, island ids as a cumulative sum of gap flags,
    and a two-level groupby for island extents. No per-group dispatch;
    group cardinality is unbounded.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        b = (fast_hash_u64(batch[group].to_numpy()) % np.uint64(n_buckets)).astype(
            np.int32
        )
        us = pc.cast(pc.cast(batch[start], pa.timestamp("us")), pa.int64())
        return pa.table({group: batch[group], "__st": us, "__wb": pa.array(b)})

    empty = typed_empty(
        **{group: np.int64, "active_s": np.int64, "n_islands": np.int64}
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty.copy()
        g = g.sort_values([group, "__st"], kind="mergesort").reset_index(drop=True)
        st = g["__st"].to_numpy()
        en = st + dur_s * 1_000_000
        # running max of ends strictly BEFORE each row, within the group
        # (cythonized groupby.cummax + groupby.shift — no per-group apply)
        tmp = g.assign(__en=en)
        tmp["__cm"] = tmp.groupby(group, sort=False)["__en"].cummax()
        prev_max = tmp.groupby(group, sort=False)["__cm"].shift(1)
        new_island = prev_max.isna() | (st > prev_max.to_numpy())
        island = new_island.cumsum()  # global ids (groups are contiguous)
        d = pd.DataFrame(
            {group: g[group], "__isl": island, "__st": st, "__en": en}
        )
        ext = d.groupby([group, "__isl"], sort=False).agg(
            s=("__st", "min"), e=("__en", "max")
        )
        ext["cov"] = ext["e"] - ext["s"]
        out = ext.reset_index().groupby(group, as_index=False).agg(
            active_us=("cov", "sum"), n_islands=("__isl", "count")
        )
        return pd.DataFrame(
            {
                group: out[group].to_numpy(),
                "active_s": (out["active_us"] // 1_000_000).astype(np.int64),
                "n_islands": out["n_islands"].astype(np.int64),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def revenue_by_region(
    lineitem_ds,
    supplier_df: pd.DataFrame,
    nation_df: pd.DataFrame,
    region_df: pd.DataFrame,
):
    """lineitem ⋈ supplier ⋈ nation ⋈ region via ONE composed broadcast →
    discounted revenue cents per region. The three dimension tables are
    pre-joined DRIVER-side into a single suppkey→region-name map (dims
    are small by definition; the fact table is the only side that
    streams), broadcast once with ``ray.put`` — a 4-table star join with
    zero shuffles beyond the final ≤ #regions-row groupby."""
    import ray
    from ray.data.aggregate import Sum

    n_to_r = dict(zip(nation_df["n_nationkey"], nation_df["n_regionkey"]))
    r_name = dict(zip(region_df["r_regionkey"], region_df["r_name"]))
    supp_to_region = {
        int(s): r_name[n_to_r[int(nk)]]
        for s, nk in zip(supplier_df["s_suppkey"], supplier_df["s_nationkey"])
    }
    ref = ray.put(supp_to_region)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        sk = batch["l_suppkey"].to_numpy()
        price = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        df = pd.DataFrame(
            {
                "r_name": pd.Series(sk).map(lookup),
                "revenue_c": _cents(price * (1.0 - disc)),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("r_name", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        lineitem_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("r_name")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
    )


def monthly_rollup(
    ds,
    *,
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
):
    """Calendar-month time series: (month 'YYYY-MM', n, value_c sum).
    Calendar bucketing is NOT epoch-window arithmetic (months vary in
    length), so the bucket key comes from Arrow's temporal kernels
    (year/month extraction — vectorized, no Python datetime per row);
    per-batch partials then one ≤ #months groupby. The reporting query
    every pipeline dashboard runs."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_col], pa.timestamp("us"))
        y = pc.year(ts).to_numpy(zero_copy_only=False)
        m = pc.month(ts).to_numpy(zero_copy_only=False)
        key = np.char.add(
            np.char.add(y.astype("U4"), "-"),
            np.char.zfill(m.astype("U2"), 2),
        )
        df = pd.DataFrame(
            {"month": key, "n": 1, "value_c": _cents(batch[value_col].to_numpy())}
        )
        out = df.groupby("month", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("month")
        .aggregate(Sum("n", alias_name="n"), Sum("value_c", alias_name="value_c"))
    )


def merge_scd1(
    base_ds,
    changes_ds,
    *,
    key: str,
    payload_cols: list[str],
    ver_col: str = "ver",
    op_col: str = "op",
    n_buckets: int = 64,
):
    """SCD-type-1 MERGE: apply a change stream of ``{'upsert','delete'}``
    operations to a base table, latest-wins — the ``MERGE INTO`` /
    CDC-compaction primitive. Per key the winning change is the max
    ``ver_col`` (a tie on ver resolves to 'delete' — deterministic
    either way); a winning 'delete' removes the key, a winning 'upsert'
    replaces (or inserts) the payload; keys without changes pass
    through. Returns ``key + payload_cols``.

    Scale shape: one bounded-bucket shuffle on ``hash(key) % B`` carries
    BOTH sides (the same co-partitioning argument as
    :func:`hash_join(how='full')`); each bucket collapses its changes
    with one vectorized lexsort (never a Python call per key) and
    resolves base-vs-change with pandas merges. No driver state, no
    global sort; a key's full history meets in exactly one bucket.
    """
    from ..util import fast_hash_u64, typed_empty

    out_cols = [key] + list(payload_cols)
    empty = typed_empty(**{c: np.int64 if c == key else object for c in out_cols})

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            kv = batch[key].to_numpy()
            b = (
                kv.astype(np.uint64)
                if np.issubdtype(kv.dtype, np.integer)
                else fast_hash_u64(kv.tolist())
            ) % np.uint64(n_buckets)
            cols = {key: batch[key]}
            for c in payload_cols:
                cols[c] = (
                    batch[c]
                    if c in batch.column_names
                    else pa.nulls(batch.num_rows, type=pa.string())
                )
            for c, t in ((ver_col, pa.int64()), (op_col, pa.string())):
                cols[c] = (
                    batch[c]
                    if c in batch.column_names
                    else pa.nulls(batch.num_rows, type=t)
                )
            tb = pa.table(cols)
            return tb.append_column(
                "__bk", pa.array(b.astype(np.int32))
            ).append_column("__side", pa.array([side] * batch.num_rows))

        return fn

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        b = group[group["__side"] == "b"][out_cols]
        c = group[group["__side"] == "c"]
        if len(c):
            # latest-wins collapse: one lexsort, first row per key wins.
            # Sort (ver DESC, delete-first) → stable "max ver, delete on
            # ver ties" without any per-key Python.
            op_rank = (c[op_col].to_numpy() != "delete").astype(np.int8)
            order = np.lexsort(
                (op_rank, -c[ver_col].to_numpy(), c[key].to_numpy())
            )
            c = c.iloc[order]
            c = c[~c[key].duplicated(keep="first")]
        else:
            c = c.iloc[0:0]
        win = c[[key, op_col] + list(payload_cols)]
        merged = b.merge(win, on=key, how="outer", suffixes=("", "__chg"))
        op = merged[op_col]
        keep = op.isna() | (op != "delete")
        merged = merged[keep]
        out = {key: merged[key].to_numpy()}
        changed = merged[op_col].notna().to_numpy()
        for pcol in payload_cols:
            base_v = merged[pcol].to_numpy(dtype=object)
            chg_v = merged[f"{pcol}__chg"].to_numpy(dtype=object)
            out[pcol] = np.where(changed, chg_v, base_v)
        res = pd.DataFrame(out)
        if not len(res):
            return empty.copy()
        res[key] = res[key].astype(np.int64)
        return res

    tagged = base_ds.map_batches(tag("b"), batch_format="pyarrow").union(
        changes_ds.map_batches(tag("c"), batch_format="pyarrow")
    )
    return tagged.groupby("__bk").map_groups(merge_bucket, batch_format="pandas")


def supplier_return_rates(ds, *, min_items: int = 1, n_buckets: int = 64):
    """Supplier quality scorecard: per supplier the shipped-item count,
    returned-item count (``l_returnflag = 'R'``) and integer per-mille
    return rate — the vendor-reliability rollup a marketplace gates
    suppliers on. Returns (l_suppkey, n_items, n_returned, return_pm)
    for suppliers with ≥ ``min_items`` items.

    Scale shape: per-batch (supp, n, r) partials collapse with one
    Arrow hash-aggregate (no row per lineitem in the shuffle), ONE
    bounded ``hash(supp) % B`` bucket shuffle sums exactly, and each
    bucket emits its own finished rows — supplier cardinality is
    unbounded at scale, so no per-key dispatch and no driver census.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        per = pa.table(
            {
                "l_suppkey": batch["l_suppkey"],
                "n_items": pa.array(
                    np.ones(batch.num_rows, np.int64)
                ),
                "n_returned": pc.cast(
                    pc.fill_null(pc.equal(batch["l_returnflag"], "R"), False),
                    pa.int64(),
                ),
            }
        )
        agg = per.group_by(["l_suppkey"]).aggregate(
            [("n_items", "sum"), ("n_returned", "sum")]
        )
        return agg.rename_columns(["l_suppkey", "n_items", "n_returned"])

    empty = typed_empty(
        l_suppkey=np.int64, n_items=np.int64, n_returned=np.int64,
        return_pm=np.int64,
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        agg = df.groupby("l_suppkey", as_index=False)[
            ["n_items", "n_returned"]
        ].sum()
        agg = agg[agg["n_items"] >= min_items]
        agg["return_pm"] = (1000 * agg["n_returned"]) // agg["n_items"]
        return agg.astype(
            {"l_suppkey": np.int64, "n_items": np.int64,
             "n_returned": np.int64, "return_pm": np.int64}
        )

    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"],
        per_bucket,
        n_buckets=n_buckets,
        empty=empty,
    )


def reorder_gap_quantiles(ds, *, q_pm: list[int] | None = None, n_buckets: int = 64):
    """Customer re-order latency distribution: exact quantiles of the
    day gaps between each customer's CONSECUTIVE orders (ordered by
    (orderdate, orderkey); same-day repeats contribute 0-day gaps) —
    the retention metric behind "when do buyers come back". Returns
    (q_pm, gap_days).

    Scale shape: one bounded ``hash(custkey) % B`` shuffle; each bucket
    sorts ALL its customers once and takes same-customer adjacent
    diffs vectorized (the sessionize shape); the gap stream then feeds
    :func:`quantiles_exact` (day gaps are small integers — the
    documented ≪-row-count distinct-value assumption holds by
    construction).
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(pc.cast(batch["o_orderdate"], pa.timestamp("s")), pa.int64()),
                86400,
            ),
            pa.int64(),
        )
        u = batch["o_custkey"].to_numpy()
        b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "day": day,
                "__cb": pa.array(b),
            }
        )

    empty = typed_empty(gap_days=np.int64)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group.sort_values(
            ["o_custkey", "day", "o_orderkey"], kind="mergesort"
        )
        u = g["o_custkey"].to_numpy()
        d = g["day"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return empty.copy()
        return pd.DataFrame({"gap_days": (d[1:] - d[:-1])[same].astype(np.int64)})

    gaps = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return quantiles_exact(gaps, "gap_days", q_pm=q_pm)


def join_cardinality(
    left_ds,
    right_ds,
    key: str,
    right_key: str | None = None,
    *,
    n_buckets: int = 64,
):
    """EXACT equi-join output cardinality |L ⋈ R| WITHOUT materializing
    the join — the query-planning / skew-diagnosis primitive (a planner
    that knows |orders ⋈ lineitem| per key family picks broadcast vs
    shuffle vs salt before paying for the wrong one). Returns a one-row
    DataFrame (n_pairs, n_keys_both, max_key_pairs): total matching
    pairs Σ_k cL(k)·cR(k), the number of keys present on both sides,
    and the largest single key's pair count (the skew headline).

    Scale shape: each side reduces to (key, count) partials inside its
    batches, ONE bounded key-bucket shuffle co-locates both sides'
    counts (tagged, unioned — no join materialization anywhere), each
    bucket folds its Σ c_L·c_R / key census in vectorized pandas, and
    the driver sums B tiny partials. Python bigints fold the final
    sums — Σ cL·cR overflows int64 exactly where joins explode.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    rk = right_key or key

    def side_counts(col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            agg = (
                pa.table({"k": batch[col]})
                .group_by(["k"])
                .aggregate([([], "count_all")])
            )
            return pa.table(
                {
                    "k": agg["k"],
                    "c": pc.cast(agg["count_all"], pa.int64()),
                    "side": pa.array(
                        np.full(agg.num_rows, side, np.int8), type=pa.int8()
                    ),
                }
            )

        return fn

    both = left_ds.map_batches(side_counts(key, 0), batch_format="pyarrow").union(
        right_ds.map_batches(side_counts(rk, 1), batch_format="pyarrow")
    )

    # bigint partials travel as DECIMAL STRINGS (Arrow blocks carry the
    # shuffled partials, and a mega-hot key's cL·cR can exceed int64)
    empty = typed_empty(
        n_pairs=object, n_keys_both=np.int64, max_key_pairs=object
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        piv = df.groupby(["k", "side"], as_index=False)["c"].sum()
        w = piv.pivot_table(
            index="k", columns="side", values="c", fill_value=0, aggfunc="sum"
        )
        if 0 not in w.columns or 1 not in w.columns:
            return empty.copy()
        cl = [int(v) for v in w[0]]
        cr = [int(v) for v in w[1]]
        pairs = [a * b for a, b in zip(cl, cr) if a > 0 and b > 0]
        return pd.DataFrame(
            {
                "n_pairs": [str(sum(pairs))],
                "n_keys_both": [len(pairs)],
                "max_key_pairs": [str(max(pairs, default=0))],
            }
        )

    parts = bucketed_aggregate(
        both, ["k"], per_bucket, n_buckets=n_buckets, empty=empty
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"n_pairs": [0], "n_keys_both": [0], "max_key_pairs": [0]}
        ).astype(np.int64)
    return pd.DataFrame(
        {
            "n_pairs": [sum(int(v) for v in parts["n_pairs"])],
            "n_keys_both": [int(parts["n_keys_both"].sum())],
            "max_key_pairs": [max(int(v) for v in parts["max_key_pairs"])],
        }
    )


def rfm_segments(ds, *, n_tiles: int = 5, n_buckets: int = 64):
    """RFM customer segmentation: per-customer Recency (days between
    the customer's last order and the corpus-wide last order),
    Frequency (order count) and Monetary (total cents) each NTILE'd
    into ``n_tiles`` equal-population tiles (ORDER BY metric, custkey —
    deterministic), combined as ``segment = 100·r + 10·f + m`` and
    counted — the classic marketing segmentation, here as a stress
    composition of the engine's aggregate + exact-distributed-NTILE +
    bucketed-join primitives. Returns (segment, n_customers),
    ≤ n_tiles³ rows.

    Scale shape: orders reduce to one row per customer in ONE bounded
    custkey-bucket shuffle (O(customers) ≪ O(orders)); the reduced base
    is materialized (pinned object-store blocks) so the three NTILE
    passes — each one histogram fold + one bin-bucket shuffle
    (:func:`ntile_assign`) — and the two custkey-bucket joins read it
    without re-aggregating the orders table; the final segment count is
    a ≤ n_tiles³-cardinality native groupby.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def project(batch: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.cast(batch["o_orderdate"], pa.timestamp("s")), pa.int64()
        )
        # house cents convention: floor(x·100 + 0.5), bit-identical to
        # the oracles' CAST(floor(x * 100 + 0.5) AS BIGINT)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "day_s": days,
                "cents": cents,
            }
        )

    empty_base = typed_empty(
        o_custkey=np.int64, last_s=np.int64, n_orders=np.int64, cents=np.int64
    )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("o_custkey", as_index=False).agg(
            last_s=("day_s", "max"), n_orders=("day_s", "size"),
            cents=("cents", "sum"),
        )
        return agg.astype(
            {"last_s": np.int64, "n_orders": np.int64, "cents": np.int64}
        )

    projected = ds.map_batches(project, batch_format="pyarrow")
    base = bucketed_aggregate(
        projected, ["o_custkey"], per_cust, n_buckets=n_buckets,
        empty=empty_base,
    ).materialize()  # O(customers) reduced rows, read 4× below
    global_last = int(base.max("last_s") or 0)

    def add_recency(batch: pa.Table) -> pa.Table:
        rec = pc.divide(
            pc.subtract(pa.scalar(global_last, pa.int64()), batch["last_s"]),
            86400,
        )
        return batch.append_column("recency_days", pc.cast(rec, pa.int64()))

    base_r = base.map_batches(add_recency, batch_format="pyarrow")

    tiles = {}
    for name, col in (
        ("r", "recency_days"), ("f", "n_orders"), ("m", "cents")
    ):
        t = ntile_assign(
            base_r if col == "recency_days" else base,
            col,
            id_col="o_custkey",
            n_tiles=n_tiles,
            scale=1,
            n_buckets=n_buckets,
        )
        tiles[name] = t.map_batches(
            lambda b, nm=name: pa.table(
                {"o_custkey": b["o_custkey"], f"t_{nm}": b["tile"]}
            ),
            batch_format="pyarrow",
        )

    joined = hash_join(tiles["r"], tiles["f"], "o_custkey", n_buckets=16)
    joined = hash_join(joined, tiles["m"], "o_custkey", n_buckets=16)

    def seg(batch: pa.Table) -> pa.Table:
        s = (
            100 * batch["t_r"].to_numpy(zero_copy_only=False)
            + 10 * batch["t_f"].to_numpy(zero_copy_only=False)
            + batch["t_m"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"segment": pa.array(s)})

    from ray.data.aggregate import Count

    return (
        joined.map_batches(seg, batch_format="pyarrow")
        .groupby("segment")
        .aggregate(Count(alias_name="n_customers"))
    )


def ntile_assign(
    ds,
    column: str,
    *,
    id_col: str = "event_id",
    n_tiles: int = 4,
    scale: int = 10,
    n_buckets: int = 64,
):
    """Exact SQL ``NTILE(n) OVER (ORDER BY column, id)`` WITHOUT a global
    sort — the equal-population bucketing behind curriculum tiers and
    quality-quartile splits. Returns ``(id_col, tile)``, tile ∈ [1, n].

    Two passes, the :func:`shard_assign` rank shape transplanted to a
    VALUE order: (1) quantize the double column to integer bins
    (``floor(value·scale)`` — order-preserving, bounded-cardinality
    assumption shared with :func:`quantiles_binned`), per-batch bin
    counts → one small groupby → driver prefix sums over ≤ #bins rows,
    broadcast via ``ray.put``; (2) one bin-keyed bucketed shuffle gives
    each row its exact global 0-rank = bin_start + in-bin (value, id)
    rank, from which NTILE's first-(N mod n)-tiles-get-one-extra split
    is a vectorized closed form. Ties are impossible: ``id_col`` is
    unique, matching the oracle's two-key ORDER BY.
    """
    import ray
    from ray.data.aggregate import Sum

    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    def binned(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy()
        b = np.floor(v * scale).astype(np.int64)
        vals, counts = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(vals), "n": pa.array(counts.astype(np.int64))}
        )

    hist = (
        ds.map_batches(binned, batch_format="pyarrow", batch_size=None)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(#bins) rows only
        .sort_values("bin")
    )
    bins = hist["bin"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    ref = ray.put((bins, starts))

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy()
        b = np.floor(v * scale).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "__v": batch[column],
                "__bin": pa.array(b),
            }
        )

    empty = typed_empty(**{id_col: np.int64, "tile": np.int64})
    q, rem = divmod(n_total, n_tiles)
    boundary = rem * (q + 1)
    q_safe = max(q, 1)

    def rank_tile(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        bins_b, starts_b = ray.get(ref)
        df = df.sort_values(["__bin", "__v", id_col], kind="mergesort")
        cc = df.groupby("__bin").cumcount().to_numpy()
        r0 = starts_b[np.searchsorted(bins_b, df["__bin"].to_numpy())] + cc
        tile = np.where(
            r0 < boundary, r0 // (q + 1), rem + (r0 - boundary) // q_safe
        ) + 1
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "tile": tile.astype(np.int64)}
        )

    return bucketed_aggregate(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["__bin"],
        rank_tile,
        n_buckets=n_buckets,
        empty=empty,
    )


def unpivot(ds, id_cols: list[str], value_cols: list[str], *, var_col: str = "variable", val_col: str = "value"):
    """Wide→long melt (ANSI UNPIVOT; inverse of :func:`pivot_counts`):
    each input row becomes ``len(value_cols)`` rows of
    ``(*id_cols, var_col, val_col)``, measures cast to float64 (SQL
    UNPIVOT's common-supertype rule). Shuffle-free, zero-copy on the id
    columns — one Arrow concat of per-measure projections per batch."""

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: batch[k] for k in id_cols}
            cols[var_col] = pa.array([c] * batch.num_rows, type=pa.string())
            cols[val_col] = batch[c].cast(pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def ewma_by_user(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha_num: int = 1,
    alpha_den: int = 4,
    scale: int = 100,
    n_buckets: int = 64,
):
    """Per-user integer EWMA over the (ts, id)-ordered event stream:
    ``s₀ = v₀;  sᵢ = (alpha_num·vᵢ + (alpha_den−alpha_num)·sᵢ₋₁) // alpha_den``
    with ``v = floor(value·scale)`` — the exponential-smoothing feature
    of per-user engagement scoring as an EXACT integer recurrence (no
    float accumulator drift), the stateful-scan class IMA-ADPCM's
    decoder also lives in; the DuckDB oracle replays the identical
    recurrence with a recursive CTE. Requires ``value ≥ 0`` (where
    Python floor-division and SQL ``//`` agree). Returns
    ``(id_col, ewma)`` for every event.

    Scale shape: one ``hash(user) % B`` bucketed shuffle (the sessionize
    pattern) co-locates each user's stream; inside a bucket the
    recurrence is a STEP SCAN — rows grouped by their per-user position
    k, and step k updates ALL users' k-th events in one vectorized
    searchsorted+gather — so the Python loop length is the bucket's max
    events-per-user, not its row count.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    beta = alpha_den - alpha_num
    empty = typed_empty(**{id_col: np.int64, "ewma": np.int64})

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        v = np.floor(df[value_col].to_numpy() * scale).astype(np.int64)
        u = df[user_col].to_numpy()
        ids = df[id_col].to_numpy()
        cc = df.groupby(user_col).cumcount().to_numpy()
        order = np.lexsort((u, cc))  # (position k, then user)
        u_s, v_s, cc_s = u[order], v[order], cc[order]
        s = np.empty_like(v_s)
        kmax = int(cc_s.max())
        starts = np.searchsorted(cc_s, np.arange(kmax + 2))
        s[: starts[1]] = v_s[: starts[1]]
        for k in range(1, kmax + 1):
            a, b = starts[k], starts[k + 1]
            pa_, pb = starts[k - 1], starts[k]
            idx = np.searchsorted(u_s[pa_:pb], u_s[a:b])
            sp = s[pa_:pb][idx]
            s[a:b] = (alpha_num * v_s[a:b] + beta * sp) // alpha_den
        out_ids = ids[order]
        return pd.DataFrame({id_col: out_ids, "ewma": s.astype(np.int64)})

    return bucketed_aggregate(ds, [user_col], scan_bucket, n_buckets=n_buckets, empty=empty)


def audience_overlap(
    ds,
    *,
    user_col: str = "user_id",
    kind_col: str = "event_type",
    n_buckets: int = 64,
):
    """Audience-overlap matrix: for every ordered pair of kinds
    (a < b), the EXACT number of distinct users who did both →
    ``(kind_a, kind_b, n_users)`` — the segment-intersection readout
    (INTERSECT of per-kind audiences) without materializing any
    audience set.

    Scale shape: one ``hash(user) % B`` bucket shuffle of distinct
    (user, kind) pairs; inside a bucket each user's kind set expands to
    its C(k,2) pairs with the basket repeat/arange kernel (k ≤ #kinds,
    tiny) and collapses to per-bucket pair counts — additive across
    buckets because a user lives in exactly one — then a tiny
    ≤ #kinds² fold.
    """
    from .basket import _expand_pairs
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    pair_empty = typed_empty(kind_a=object, kind_b=object, n_users=np.int64)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([user_col, kind_col]).sort_values(
            [user_col, kind_col]
        )
        if d.empty:
            return pair_empty.copy()
        pairs = _expand_pairs(d, user_col, kind_col)
        out = (
            pairs.groupby(["item_a", "item_b"], as_index=False)
            .size()
            .rename(
                columns={"item_a": "kind_a", "item_b": "kind_b",
                         "size": "n_users"}
            )
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pair_empty.copy()
        g = df.groupby(["kind_a", "kind_b"], as_index=False)["n_users"].sum()
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return bucketed_aggregate(
        bucketed_aggregate(
            ds, [user_col], pairs_in_bucket,
            n_buckets=n_buckets, empty=pair_empty, coalesce_first=False,
        ),
        ["kind_a", "kind_b"],
        fold,
        n_buckets=min(n_buckets, 16),
        empty=pair_empty,
        coalesce_first=False,
    )


def key_count_histogram(
    ds,
    key_col: str,
    *,
    n_buckets: int = 64,
):
    """Counts-of-counts skew diagnosis: how many distinct keys occur
    exactly k times → ``(n_occurrences, n_keys)`` — the histogram a
    planner reads before choosing a join strategy (a fat tail at high k
    means salt-the-hot-keys; all mass at k=1 means plain hash join).
    The full key census never materializes anywhere: per-key counts
    live only inside their hash bucket, and only the tiny
    counts-of-counts (domain = distinct frequencies, not keys) leaves.

    Scale shape: per-batch (key, n) partials → one ``hash(key) % B``
    bucketed fold finalizes per-key counts INSIDE the bucket and
    immediately collapses them to per-bucket (k, n_keys) partials →
    one bounded groupby over the tiny frequency domain.
    """
    from .dedup import bucketed_aggregate
    from ..util import fast_hash_u64, typed_empty

    part_empty = typed_empty(k=np.int64, n=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[key_col].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(v, return_counts=True)
        b = (fast_hash_u64(keys) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "key": pa.array(keys),
                "n": pa.array(counts.astype(np.int64)),
                "__kb": pa.array(b),
            }
        )

    def fold_keys_to_cofc(group: pd.DataFrame) -> pd.DataFrame:
        """per-key totals within the bucket, collapsed to (k, n_keys)
        partials before anything leaves the task."""
        if group.empty:
            return part_empty.copy()
        per_key = group.groupby("key")["n"].sum()
        k, n = np.unique(per_key.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"k": k, "n": n.astype(np.int64)})

    cofc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(fold_keys_to_cofc, batch_format="pandas")
    )

    out_empty = typed_empty(n_occurrences=np.int64, n_keys=np.int64)

    def fold_final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return out_empty.copy()
        g = df.groupby("k", as_index=False)["n"].sum()
        return pd.DataFrame(
            {
                "n_occurrences": g["k"].to_numpy(np.int64),
                "n_keys": g["n"].to_numpy(np.int64),
            }
        )

    return bucketed_aggregate(
        cofc, ["k"], fold_final, n_buckets=min(n_buckets, 16),
        empty=out_empty,
    )


def running_distinct_by_user(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    kind_col: str = "event_type",
    n_buckets: int = 64,
):
    """Per-user RUNNING DISTINCT count: for every event, how many
    distinct ``kind_col`` values the user has seen up to and including
    it ((ts, id) order) → ``(event_id, n_kinds)`` — the novelty /
    exploration-breadth feature SQL cannot express as a plain window
    (COUNT(DISTINCT) OVER an ordered frame is unsupported; the oracle
    resorts to a quadratic self-join).

    Scale shape: one ``hash(user) % B`` bucket shuffle; per bucket one
    sort + a first-occurrence flag (``duplicated(keep='first')`` on
    (user, kind) in stream order) + per-user cumsum — no per-user
    dispatch, no quadratic work.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    empty = typed_empty(**{id_col: np.int64, "n_kinds": np.int64})

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        g = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        first = ~g.duplicated([user_col, kind_col], keep="first")
        n = first.astype(np.int64).groupby(
            g[user_col].to_numpy()
        ).cumsum()
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "n_kinds": n.to_numpy(np.int64)}
        )

    return bucketed_aggregate(
        ds, [user_col], scan_bucket, n_buckets=n_buckets, empty=empty
    )


def trimmed_mean_by_group(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value_c",
    trim_pm: int = 100,
    n_buckets: int = 64,
):
    """Robust aggregation: per-group TRIMMED MEAN — drop the bottom and
    top ``floor(trim_pm·n/1000)`` order statistics, integer floor-mean
    of the rest → ``(group, n_kept, tmean_c)``. The outlier-resistant
    mean of metric dashboards (a 10% trim survives fat tails that wreck
    the plain mean), exactly computable from a value histogram, so the
    SQL oracle's window-rank formulation matches integer-for-integer.

    Scale shape: per-batch (group, value) count partials, one bounded
    ``hash(group, value) % B`` shuffle folds the histogram (cardinality
    = #groups × #distinct values — bounded by the value DOMAIN, not the
    row count; pre-bin continuous data first, the quantiles_exact
    rule), then per-GROUP buckets compute kept-rank overlaps with one
    vectorized cumsum pass.
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    hist_empty = typed_empty(
        **{group_col: object, value_col: np.int64, "cnt": np.int64}
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_col: batch[group_col].to_pandas(),
                value_col: batch[value_col].to_numpy(),
            }
        )
        g = df.groupby([group_col, value_col], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col],
        lambda df: df.groupby([group_col, value_col], as_index=False)["cnt"]
        .sum()
        .astype({"cnt": np.int64}),
        n_buckets=n_buckets,
        empty=hist_empty,
        coalesce_first=False,
    )

    out_empty = typed_empty(
        **{group_col: object, "n_kept": np.int64, "tmean_c": np.int64}
    )

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return out_empty.copy()
        rows = []
        for grp, sub in df.groupby(group_col):
            sub = sub.sort_values(value_col)
            c = sub["cnt"].to_numpy(np.int64)
            v = sub[value_col].to_numpy(np.int64)
            cum = np.cumsum(c)
            n = int(cum[-1])
            k = (trim_pm * n) // 1000
            lo_rank, hi_rank = k, n - k  # keep ranks (k, n−k], 1-based
            prev = cum - c
            kept = np.minimum(cum, hi_rank) - np.maximum(prev, lo_rank)
            kept = np.maximum(kept, 0)
            n_kept = int(kept.sum())
            if n_kept == 0:
                continue
            rows.append((grp, n_kept, int((v * kept).sum()) // n_kept))
        if not rows:
            return out_empty.copy()
        return pd.DataFrame(
            rows, columns=[group_col, "n_kept", "tmean_c"]
        ).astype({"n_kept": np.int64, "tmean_c": np.int64})

    return bucketed_aggregate(
        hist, [group_col], per_group, n_buckets=n_buckets, empty=out_empty
    )


def cusum_flags(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    drift_c: int = 8000,
    threshold_c: int = 30000,
    n_buckets: int = 64,
):
    """Per-user one-sided CUSUM change-point detection (Page 1954):
    ``s₀ = max(0, v₀ − k);  sᵢ = max(0, sᵢ₋₁ + vᵢ − k)`` over the
    (ts, id)-ordered stream, ``v = floor(value·100 + 0.5)`` cents,
    ``k = drift_c`` — flag rows where the cumulative positive drift
    exceeds ``threshold_c``. The standard streaming anomaly /
    level-shift monitor, as an EXACT integer recurrence; the DuckDB
    oracle replays it with a recursive CTE. Returns
    ``(id_col, cusum, flagged)`` for every event.

    Scale shape: identical to :func:`ewma_by_user` — one
    ``hash(user) % B`` bucket shuffle, then a step scan whose k-th step
    updates ALL users' k-th events vectorized (Python loop = bucket max
    events-per-user, never row count).
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    empty = typed_empty(
        **{id_col: np.int64, "cusum": np.int64, "flagged": np.int64}
    )

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        v = np.floor(df[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        u = df[user_col].to_numpy()
        ids = df[id_col].to_numpy()
        cc = df.groupby(user_col).cumcount().to_numpy()
        order = np.lexsort((u, cc))  # (position k, then user)
        u_s, v_s, cc_s = u[order], v[order], cc[order]
        s = np.empty_like(v_s)
        kmax = int(cc_s.max())
        starts = np.searchsorted(cc_s, np.arange(kmax + 2))
        s[: starts[1]] = np.maximum(0, v_s[: starts[1]] - drift_c)
        for k in range(1, kmax + 1):
            a, b = starts[k], starts[k + 1]
            pa_, pb = starts[k - 1], starts[k]
            idx = np.searchsorted(u_s[pa_:pb], u_s[a:b])
            sp = s[pa_:pb][idx]
            s[a:b] = np.maximum(0, sp + v_s[a:b] - drift_c)
        return pd.DataFrame(
            {
                id_col: ids[order],
                "cusum": s.astype(np.int64),
                "flagged": (s > threshold_c).astype(np.int64),
            }
        )

    return bucketed_aggregate(
        ds, [user_col], scan_bucket, n_buckets=n_buckets, empty=empty
    )


def zorder_keys(
    ds,
    x_col: str,
    y_col: str,
    *,
    id_cols: list[str],
    bits: int = 16,
    shard_bits: int = 4,
    out_key: str = "zkey",
    out_shard: str = "shard",
):
    """Z-order (Morton) clustering key over two integer columns — the
    data-layout primitive behind multi-column data skipping (Delta/Lance
    OPTIMIZE ZORDER BY): interleave the low ``bits`` bits of x and y so
    rows close in BOTH dimensions get close keys, and derive a shard id
    from the key's top ``shard_bits`` bits (a z-range partition: each
    shard is a contiguous z-interval = an axis-aligned tile family, so a
    predicate on either column prunes shards). Shuffle-free map; the
    caller sorts/writes by (shard, zkey) to materialize the layout.
    Returns ``(*id_cols, zkey, shard)``.

    The bit interleave is the classic magic-number spread (4 shift-mask
    steps per operand, fully vectorized); the DuckDB oracle computes the
    same key as an explicit per-bit sum, so the equality gate covers
    every bit position.
    """
    if bits > 31:
        raise ValueError("bits > 31 would overflow the int64 zkey")
    mask = (1 << bits) - 1

    def _spread(v: np.ndarray) -> np.ndarray:
        # 16-bit magic spread extended to 31 bits via uint64 intermediates
        x = v.astype(np.uint64)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    def per_batch(batch: pa.Table) -> pa.Table:
        xv = batch[x_col].to_numpy().astype(np.int64) & mask
        yv = batch[y_col].to_numpy().astype(np.int64) & mask
        z = (_spread(xv) | (_spread(yv) << np.uint64(1))).astype(np.int64)
        shard = z >> np.int64(2 * bits - shard_bits)
        cols = {k: batch[k] for k in id_cols}
        cols[out_key] = pa.array(z)
        cols[out_shard] = pa.array(shard)
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def zone_map_prune(
    ds,
    part_col: str,
    x_col: str,
    y_col: str,
    *,
    lo: int,
    hi: int,
):
    """Zone-map (data-skipping) statistics over a partitioned layout,
    plus the prune verdict for a range predicate — the read-side payoff
    of clustering (:func:`zorder_keys` shards, Hive-style date
    partitions): Delta/Iceberg/Lance scans consult per-file min/max
    stats and never open files whose range cannot match. Per partition
    value this emits ``(shard, n_rows, min_x, max_x, min_y, max_y,
    pruned)`` where ``pruned = 1`` iff the partition's x-range misses
    ``[lo, hi]`` entirely — sound regardless of HOW the layout was
    derived, because the verdict uses only the measured stats.

    Scale shape: the zone map is how a 100-TB table avoids being read —
    building it here is one shuffle-free keyed pass (per-batch partial
    (count, min, max) per partition rides a ≤ #parts·#batches-row
    combine into a bounded groupby); the stats table itself is
    #partitions rows, the thing a planner would pin driver-side.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "shard": batch[part_col].to_numpy(),
                "x": batch[x_col].to_numpy(),
                "y": batch[y_col].to_numpy(),
            }
        )
        g = df.groupby("shard").agg(
            n_rows=("x", "size"),
            min_x=("x", "min"), max_x=("x", "max"),
            min_y=("y", "min"), max_y=("y", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    empty = typed_empty(
        shard=np.int64, n_rows=np.int64,
        min_x=np.int64, max_x=np.int64,
        min_y=np.int64, max_y=np.int64, pruned=np.int64,
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        out = group.groupby("shard", as_index=False).agg(
            n_rows=("n_rows", "sum"),
            min_x=("min_x", "min"), max_x=("max_x", "max"),
            min_y=("min_y", "min"), max_y=("max_y", "max"),
        )
        out["pruned"] = (
            (out["max_x"] < lo) | (out["min_x"] > hi)
        ).astype(np.int64)
        for c in ("n_rows", "min_x", "max_x", "min_y", "max_y"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(fold, batch_format="pandas")
    )


def rolling_median_by_user(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 4,
    n_buckets: int = 64,
):
    """Order-statistic window: per-user rolling MEDIAN over the last
    ``window`` rows (``ROWS BETWEEN window−1 PRECEDING AND CURRENT
    ROW``), the robust complement to the rolling SUM — reported ×2 so
    the even-count midpoint stays integer (``med_x2 = v_lo + v_hi`` of
    the two middle order stats; ×2 of the middle when odd). Returns
    ``(event_id, med_x2)``; values are cents ``floor(value·100+0.5)``.

    Scale shape: the :func:`ewma_by_user` shape — ONE ``hash(user) % B``
    bucket shuffle, then a per-bucket pass that is vectorized across
    ALL users at once: a (rows × window) lag matrix (+inf pads row
    starts, user boundaries respected via cumcount), one axis-1 sort,
    two fancy-indexed gathers. Python cost is O(window) loop iterations
    per bucket, never per user or per row.
    """
    from ..util import fast_hash_u64, typed_empty

    empty = typed_empty(**{id_col: np.int64, "med_x2": np.int64})

    def project(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        c = np.floor(
            batch[value_col].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        u = batch[user_col].to_numpy()
        return pa.table(
            {
                "u": batch[user_col],
                "ts_us": us,
                id_col: batch[id_col],
                "c": pa.array(c),
                "__ub": pa.array(
                    (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        g = df.sort_values(["u", "ts_us", id_col], kind="mergesort")
        v = g["c"].to_numpy(np.int64).astype(np.float64)
        cc = g.groupby("u").cumcount().to_numpy()
        m = len(g)
        arr = np.full((m, window), np.inf)
        for j in range(window):
            ok = cc >= j
            arr[ok, j] = v[np.flatnonzero(ok) - j]
        arr.sort(axis=1)
        cnt = np.minimum(cc + 1, window)
        rows = np.arange(m)
        med2 = arr[rows, (cnt - 1) // 2] + arr[rows, cnt // 2]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "med_x2": med2.astype(np.int64),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


def impute_group_mean(
    ds,
    *,
    group_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value_c",
):
    """Missing-value repair: fill NULLs in an integer value column with
    the column's per-group floor-mean — the standard imputation step of
    feature hygiene (group mean beats global mean when groups have
    different scales). Returns ``(id_col, value_c, imputed)`` with
    ``imputed = 1`` on filled rows.

    Integer contract (mirrored by the oracle): the fill value is
    ``floor(sum / count)`` over the group's NON-null values, computed
    in int64 — identical on both sides regardless of summation order.

    Scale shape: two streaming passes. Pass 1 emits per-batch partial
    (group, sum, n) rows — ≤ #groups·#batches tiny rows folded on the
    driver (group cardinality is assumed small, the broadcast-dim
    regime; use a bucketed join instead if groups ~ row count). The
    fold broadcasts one dict via ``ray.put``; pass 2 is a shuffle-free
    vectorized fill.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col].to_numpy(zero_copy_only=False),
            }
        ).dropna(subset=["v"])
        df["v"] = df["v"].astype(np.int64)  # exact int sums after the NaN drop
        agg = df.groupby("g", as_index=False)["v"].agg(["sum", "count"])
        return pa.table(
            {
                "g": pa.array(agg["g"]),
                "s": pa.array(agg["sum"].to_numpy(np.int64)),
                "n": pa.array(agg["count"].to_numpy(np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    fold = parts.groupby("g", as_index=False)[["s", "n"]].sum()
    means = {
        g: int(s) // int(n)  # floor division — n > 0 by construction
        for g, s, n in zip(fold["g"], fold["s"], fold["n"])
    }
    ref = ray.put(means)

    def fill(batch: pa.Table, _ref=ref) -> pa.Table:
        m = ray.get(_ref)
        g = batch[group_col].to_pandas()
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        miss = np.isnan(v)
        fillv = g.map(m).to_numpy(np.float64)
        # a group with NO surviving value has no mean — its null rows are
        # unrepairable and drop (the oracle's inner join does the same)
        keep = ~(miss & np.isnan(fillv))
        out = np.where(miss, fillv, v)[keep].astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(keep)),
                "value_c": pa.array(out),
                "imputed": pa.array(miss[keep].astype(np.int64)),
            }
        )

    return ds.map_batches(fill, batch_format="pyarrow")


def cohort_retention(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 604800,
    n_buckets: int = 64,
):
    """Cohort retention matrix: bucket users by their FIRST active
    period (the cohort), then count how many of each cohort's users are
    active again k periods later → ``(cohort_week, week_offset,
    n_users)`` — the standard growth-analytics triangle (rows =
    acquisition cohorts, columns = age), exact distinct users.

    Scale shape: one user-bucketed shuffle. Per batch, distinct
    (user, period) pairs ride ``hash(user) % B``; per bucket one
    vectorized pass derives each user's min period (cohort) and emits
    PARTIAL (cohort, offset) counts — additive across buckets because a
    user lives in exactly one bucket, so no global distinct pass is
    needed. The final fold groups ≤ #periods² tiny rows. No per-user
    dispatch, no driver state.
    """
    from ..util import fast_hash_u64, typed_empty

    p_us = np.int64(period_s) * np.int64(1_000_000)

    def project(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        period = us.to_numpy() // p_us
        u = batch[user_col].to_numpy()
        df = pd.DataFrame({"u": u, "p": period}).drop_duplicates()
        df["__ub"] = (
            fast_hash_u64(df["u"].to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    part_empty = typed_empty(
        cohort_week=np.int64, week_offset=np.int64, n_users=np.int64
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return part_empty.copy()
        g = group[["u", "p"]].drop_duplicates()
        cohort = g.groupby("u")["p"].transform("min")
        out = (
            pd.DataFrame(
                {"cohort_week": cohort, "week_offset": g["p"] - cohort}
            )
            .groupby(["cohort_week", "week_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return part_empty.copy()
        out = group.groupby(
            ["cohort_week", "week_offset"], as_index=False
        )["n_users"].sum()
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("cohort_week")
        .map_groups(fold, batch_format="pandas")
    )


def debounce_events(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: int = 21600,
    n_buckets: int = 64,
):
    """Per-user event debounce (rate limiting with KEPT-chain state):
    keep an event iff at least ``window_s`` seconds passed since the
    last KEPT event of the same user (first event always kept) — the
    throttling rule of event-stream hygiene. Unlike a lag-gap filter,
    the state is the kept chain itself (a burst of close events is
    collapsed to its FIRST member, not thinned pairwise), so this is a
    stateful sequential recurrence:
    ``sᵢ = tᵢ if tᵢ − sᵢ₋₁ ≥ w else sᵢ₋₁`` — the DuckDB oracle replays
    it with a recursive CTE. Returns the kept ``(id_col,)`` rows.

    Scale shape: identical to :func:`ewma_by_user` — one user-bucketed
    shuffle, then a step scan whose vectorized steps update all users'
    k-th events at once (Python loop = max events-per-user per bucket).
    """
    from .dedup import bucketed_aggregate
    from ..util import typed_empty

    w_us = np.int64(window_s) * np.int64(1_000_000)
    empty = typed_empty(**{id_col: np.int64})

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = df[user_col].to_numpy()
        ids = df[id_col].to_numpy()
        cc = df.groupby(user_col).cumcount().to_numpy()
        order = np.lexsort((u, cc))
        u_s, t_s = u[order], t[order]
        s = np.empty_like(t_s)
        kept = np.zeros(len(t_s), dtype=bool)
        kmax = int(cc[order].max())
        starts = np.searchsorted(cc[order], np.arange(kmax + 2))
        s[: starts[1]] = t_s[: starts[1]]
        kept[: starts[1]] = True
        for k in range(1, kmax + 1):
            a, b = starts[k], starts[k + 1]
            pa_, pb = starts[k - 1], starts[k]
            idx = np.searchsorted(u_s[pa_:pb], u_s[a:b])
            sp = s[pa_:pb][idx]
            keep = t_s[a:b] - sp >= w_us
            s[a:b] = np.where(keep, t_s[a:b], sp)
            kept[a:b] = keep
        return pd.DataFrame({id_col: ids[order][kept].astype(np.int64)})

    return bucketed_aggregate(ds, [user_col], scan_bucket, n_buckets=n_buckets, empty=empty)


def revenue_forecast(
    ds,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo_pm: int = 30,
    disc_hi_pm: int = 70,
    max_qty: int = 24,
):
    """Forecast-revenue query (TPC-H Q6 shape): SUM(extendedprice ·
    discount) in cents over lineitems shipped in [date_from, date_to)
    with discount in [lo, hi] per-mille and quantity < max_qty.

    Scale shape: the selective predicates belong AT THE READ — callers
    pass a ``row_filter`` on ``l_shipdate`` into ``read_table`` so whole
    row groups skip (the ``__ray_entry__`` caller does); what remains is
    a shuffle-free per-batch filter + partial sum folded by one global
    Sum over a handful of partials. Discount is compared in exact
    per-mille integers (the testdata's discounts are hundredths, so
    floor(d·1000+0.5) is lossless) — never float equality."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_from)
    hi = np.datetime64(date_to)

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        disc_pm = np.floor(batch["l_discount"].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        qty = batch["l_quantity"].to_numpy()
        m = (
            (ship >= lo)
            & (ship < hi)
            & (disc_pm >= disc_lo_pm)
            & (disc_pm <= disc_hi_pm)
            & (qty < max_qty)
        )
        # cents(price)·disc_pm / 1000 stays integer-exact: sum the
        # per-mille-weighted cents, divide ONCE at the end (driver side)
        rev = np.int64(
            (_cents(batch["l_extendedprice"].to_numpy()[m]) * disc_pm[m]).sum()
        )
        return pa.table({"rev_pm_c": pa.array([rev], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).aggregate(
        Sum("rev_pm_c", alias_name="rev_pm_c")
    )
    total = int((agg or {}).get("rev_pm_c") or 0)
    return pd.DataFrame({"revenue_c": np.asarray([total // 1000], np.int64)})


def promo_revenue_pm(lineitem_ds, part_df: pd.DataFrame, *, promo_type: str = "PROMO"):
    """Promotion-revenue share (TPC-H Q14 shape): per-mille of discounted
    revenue attributable to parts of ``promo_type``, per ship month.

    part is the broadcast side (``ray.put`` once, ``pd.Series.map`` per
    batch); lineitem streams through one shuffle-free partial that buckets
    by month, then a tiny month groupby. Output ratio is an integer
    per-mille: floor(1000·promo_c / total_c)."""
    import ray
    from ray.data.aggregate import Sum

    is_promo = dict(
        zip(
            part_df["p_partkey"].to_numpy(),
            (part_df["p_type"].astype(str) == promo_type).to_numpy(),
        )
    )
    ref = ray.put(is_promo)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        ship = batch["l_shipdate"].to_numpy().astype("datetime64[M]")
        month = (ship.astype(np.int64) % 12 + 1).astype(np.int64)
        year = (ship.astype("datetime64[Y]").astype(np.int64) + 1970).astype(np.int64)
        ym = year * 100 + month
        promo = pd.Series(batch["l_partkey"].to_numpy()).map(lookup).to_numpy(bool)
        rev = _cents(
            batch["l_extendedprice"].to_numpy() * (1.0 - batch["l_discount"].to_numpy())
        )
        df = pd.DataFrame(
            {"ship_ym": ym, "promo_c": np.where(promo, rev, 0), "total_c": rev}
        )
        return pa.Table.from_pandas(
            df.groupby("ship_ym", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    out = (
        lineitem_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("ship_ym")
        .aggregate(Sum("promo_c", alias_name="promo_c"), Sum("total_c", alias_name="total_c"))
        .to_pandas()  # one row per ship month — bounded
    )
    out["promo_pm"] = (1000 * out["promo_c"]) // out["total_c"]
    out = out.sort_values("ship_ym").reset_index(drop=True)
    return out[["ship_ym", "promo_pm"]].astype(np.int64)


def late_order_priority_counts(orders_ds, lineitem_ds, *, grace_days: int = 60, n_buckets: int = 16):
    """Order-priority census of LATE orders (TPC-H Q4 shape, adapted to
    the testdata's columns): an order is late iff ANY of its lineitems
    shipped more than ``grace_days`` after the order date — an EXISTS
    semi-join with a correlated date predicate.

    Scale shape: lineitem first collapses to one row per orderkey
    (per-batch partial max(l_shipdate), then a bucketed max-combine — the
    EXISTS only needs the latest shipment), so the join shuffle moves
    #orders rows, not #lineitems. The correlated predicate is then a
    vectorized filter on the joined frame, and the final groupby is 5
    rows."""
    from ..util import typed_empty

    def li_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(),
                "max_ship_us": pc.cast(
                    pc.cast(batch["l_shipdate"], pa.timestamp("us")), pa.int64()
                ).to_numpy(),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("l_orderkey", as_index=False).max(), preserve_index=False
        ).replace_schema_metadata(None)

    li_max = lineitem_ds.map_batches(li_partial, batch_format="pyarrow", batch_size=None)
    empty = typed_empty(l_orderkey=np.int64, max_ship_us=np.int64)

    from .dedup import bucketed_aggregate

    li_max = bucketed_aggregate(
        li_max,
        ["l_orderkey"],
        lambda df: df.groupby("l_orderkey", as_index=False).max(),
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    )

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "order_us": pc.cast(
                    pc.cast(batch["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
            }
        )

    joined = hash_join(
        orders_ds.map_batches(o_prep, batch_format="pyarrow", batch_size=None),
        li_max,
        "l_orderkey",
        n_buckets=n_buckets,
    )
    grace_us = np.int64(grace_days) * np.int64(86_400_000_000)

    def late_partial(batch: pa.Table) -> pa.Table:
        late = (
            batch["max_ship_us"].to_numpy() - batch["order_us"].to_numpy() > grace_us
        )
        df = pd.DataFrame(
            {
                "o_orderpriority": np.asarray(batch["o_orderpriority"].to_pylist())[late],
                "n_late": np.ones(int(late.sum()), np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("o_orderpriority", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(late_partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
    )


def mad_outliers(ds, key: str, column: str, *, k: int = 5, n_buckets: int = 32):
    """Robust per-group outlier summary via the Median Absolute
    Deviation: for each group, the lower median ``med`` of an integer
    column (1-based sorted position ``ceil(n/2)`` — the
    ``grouped_quantiles_exact`` convention), the lower median ``mad`` of
    ``|x − med|``, and the count of rows with ``|x − med| > k·mad`` —
    the outlier gate that, unlike Tukey/IQR z-scores, survives 50%
    contamination. All-integer, so the SQL oracle matches exactly.

    Scale shape: ONE bounded-bucket shuffle of per-batch (key, value)
    histograms; both weighted medians and the outlier count are computed
    from the histogram INSIDE each bucket with vectorized pandas groupby
    passes — no medians broadcast, no driver state, group cardinality
    unbounded. Histogram assumption as in ``grouped_quantiles_exact``:
    per-group DISTINCT values ≪ rows.
    """
    from ..stages.dedup import bucketed_aggregate
    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key, column]).to_pandas()
        agg = df.groupby([key, column], as_index=False).size()
        agg = agg.rename(columns={column: "v", "size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    sch = ds.schema()
    key_type = dict(zip(sch.names, sch.types))[key]
    # pandas-backed datasets report numpy dtypes here, Arrow ones DataTypes
    if isinstance(key_type, pa.DataType):
        key_is_int = pa.types.is_integer(key_type)
    else:
        key_is_int = np.issubdtype(np.dtype(key_type), np.integer)
    key_dtype = np.int64 if key_is_int else object
    empty = typed_empty(
        **{key: key_dtype, "med_c": np.int64, "mad_c": np.int64,
           "n_outliers": np.int64}
    )

    def _weighted_median(h: pd.DataFrame, vcol: str) -> pd.DataFrame:
        # h: (key, vcol, n); lower median = first value whose cumulative
        # count reaches ceil(tot/2), vectorized across all keys at once
        h = h.sort_values([key, vcol], kind="mergesort").reset_index(drop=True)
        cum = h.groupby(key)["n"].cumsum()
        tot = h.groupby(key)["n"].transform("sum")
        half = (tot + 1) // 2
        sel = h[cum >= half].groupby(key, as_index=False).first()[[key, vcol]]
        return sel.rename(columns={vcol: "med"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby([key, "v"], as_index=False)["n"].sum()
        med = _weighted_median(h, "v")
        h = h.merge(med, on=key)
        h["a"] = (h["v"] - h["med"]).abs()
        # |v − med| histogram reuses the same counts; values may collide
        # (v = med ± a), so re-fold before the second weighted median
        ha = h.groupby([key, "a"], as_index=False)["n"].sum()
        mad = _weighted_median(ha, "a").rename(columns={"med": "mad"})
        h = h.merge(mad, on=key)
        out_n = (
            h[h["a"] > k * h["mad"]].groupby(key)["n"].sum()
        )
        res = med.rename(columns={"med": "med_c"}).merge(
            mad.rename(columns={"mad": "mad_c"}), on=key
        )
        res["n_outliers"] = res[key].map(out_n).fillna(0).astype(np.int64)
        return res.astype({"med_c": np.int64, "mad_c": np.int64})

    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        combine,
        n_buckets=n_buckets,
        empty=empty,
    )


def sequence_pattern_counts(
    ds,
    pattern: str,
    *,
    group: str = "user_id",
    order: str = "ts",
    id_col: str = "event_id",
    token: str = "event_type",
    n_buckets: int = 64,
):
    """MATCH_RECOGNIZE-lite: per group, the number of non-overlapping
    occurrences of a regex ``pattern`` over the ordered
    ``'>'``-separated token path (e.g. ``view>(click>)*purchase`` =
    "a view, any clicks, then a purchase") — the sequence-pattern op
    behind funnel mining and abuse-signature detection.

    Scale shape: the one bucketed shuffle of :func:`grouped_concat`
    builds the ordered paths; the match count is then a shuffle-free
    vectorized map with the regex compiled ONCE per task (not per row).
    Keep patterns unambiguous under greedy matching (no overlapping
    alternatives) so any leftmost engine — Python ``re`` here, RE2 in
    the DuckDB oracle — counts identically.
    """
    import re

    paths = grouped_concat(
        ds, group=group, order=order, id_col=id_col, token=token, sep=">",
        n_buckets=n_buckets,
    )

    def count_matches(batch: pa.Table) -> pa.Table:
        rx = re.compile(pattern)
        n = np.fromiter(
            (len(rx.findall(p)) for p in batch["path"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table({group: batch[group], "n_matches": pa.array(n)})

    return paths.map_batches(count_matches, batch_format="pyarrow")


def table_diff(
    old_ds,
    new_ds,
    key: str,
    value_cols: list[str],
    *,
    n_buckets: int = 16,
):
    """Snapshot diff (data reconciliation / CDC backfill audit): compare
    two versions of a table on ``key`` and emit
    ``(key, change_type ∈ {added, removed, changed})`` — rows present
    only in the new snapshot, only in the old, or in both with any
    ``value_cols`` differing. Unchanged rows are omitted (at 100 TB they
    are ~all the rows; never materialize them).

    Scale shape: each side first collapses to ``(key, rowhash)`` with a
    shuffle-free vectorized md5 over the concatenated value columns —
    8 bytes/row regardless of row width — then ONE bucketed full-outer
    join on ``key`` classifies per bucket. Wide rows never cross the
    shuffle; only key+hash do.
    """
    from ..util import md5_u64_many

    def rowhash(batch: pa.Table) -> pa.Table:
        parts = [
            pa.compute.cast(batch[c], pa.string()).fill_null("\x00null")
            for c in value_cols
        ]
        joined = parts[0]
        for p in parts[1:]:
            joined = pa.compute.binary_join_element_wise(joined, p, "\x1f")
        h = md5_u64_many(joined.to_pylist()).astype(np.int64)
        return pa.table({key: batch[key], "rowhash": pa.array(h)})

    a = old_ds.map_batches(rowhash, batch_format="pyarrow")
    b = new_ds.map_batches(rowhash, batch_format="pyarrow")
    joined = hash_join(a, b, key, n_buckets=n_buckets, how="full", suffix="_new")

    def classify(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        old_h, new_h = df["rowhash"], df["rowhash_new"]
        kind = np.where(
            old_h.isna(), "added", np.where(new_h.isna(), "removed", "changed")
        )
        # unmatched rows carry pd.NA in one hash column; Kleene-or makes
        # them True via the isna terms, so the bool cast is total
        keep = (old_h.isna() | new_h.isna() | (old_h != new_h)).astype(bool)
        out = pd.DataFrame({key: df[key], "change_type": kind})[keep.to_numpy()]
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return joined.map_batches(classify, batch_format="pyarrow")


def late_events(
    ds,
    *,
    lateness_us: int = 1_800_000_000,
    window_us: int = 3_600_000_000,
    order_col: str = "event_id",
    ts_col: str = "ts",
    n_ranges: int = 256,
):
    """Event-time watermark / late-data flagging (the Beam/Flink
    allowed-lateness semantics): processing order is ``order_col``
    (arrival proxy); the watermark after an event is
    ``max(event-time of strictly earlier arrivals) − lateness``; an
    event is LATE when the watermark has already passed the end of its
    tumbling window. Emits ``(order_col, is_late)``.

    Scale shape: a global running max is an associative SCAN, so it runs
    as the classic two-phase prefix scan over VALUE-RANGE buckets of
    ``order_col`` (the ``shard_assign`` ranking pattern): pass 1 folds
    per-range max event-times into ≤ ``n_ranges`` driver rows and
    prefix-maxes them (tiny); pass 2 co-locates each range with one
    shuffle and computes the in-range exclusive cummax vectorized,
    seeded by the broadcast carry. No global sort, no driver row data.
    """
    from ..util import typed_empty

    max_id = int(ds.max(order_col))
    w = max(1, (max_id + n_ranges) // n_ranges)

    def to_us(batch: pa.Table) -> pa.Table:
        ids = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[ts_col]
        if not pa.types.is_integer(col.type):  # timestamp[us] → int64 µs
            col = col.cast(pa.int64())
        us = col.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                order_col: pa.array(ids),
                "us": pa.array(us.astype(np.int64)),
                "__rid": pa.array(ids // w),
            }
        )

    tagged = ds.map_batches(to_us, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby("__rid", as_index=False)["us"].max()
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Max

    hist = (
        tagged.map_batches(partial, batch_format="pyarrow")
        .groupby("__rid")
        .aggregate(Max("us", alias_name="us"))
        .to_pandas()  # ≤ n_ranges + 1 tiny rows
        .sort_values("__rid")
    )
    lo = np.int64(-(1 << 62))
    seeds = {}  # rid -> max us over all STRICTLY EARLIER ranges
    carry = lo
    for rid, mx in zip(hist["__rid"], hist["us"]):
        seeds[int(rid)] = int(carry)
        carry = max(carry, int(mx))

    empty = typed_empty(**{order_col: np.int64, "is_late": np.int64})

    def flag_range(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group.sort_values(order_col, kind="mergesort")
        us = g["us"].to_numpy()
        prev = np.empty(len(us), dtype=np.int64)
        prev[0] = seeds.get(int(g["__rid"].iloc[0]), lo)
        if len(us) > 1:
            np.maximum.accumulate(us[:-1], out=prev[1:])
            np.maximum(prev[1:], prev[0], out=prev[1:])
        wend = (us // window_us + 1) * window_us
        late = ((prev - lateness_us) > wend).astype(np.int64)
        return pd.DataFrame({order_col: g[order_col].to_numpy(), "is_late": late})

    return tagged.groupby("__rid").map_groups(flag_range, batch_format="pandas")


def session_attribution(
    ds,
    *,
    gap_s: int = 1800,
    convert_kind: str = "purchase",
    n_buckets: int = 64,
):
    """First-touch session attribution: sessionize per user (same
    ``gap_s`` inactivity rule as :func:`sessionize`), attribute each
    session to its FIRST event's type (the "channel"), and report per
    channel → (channel, n_sessions, n_converted, conv_pm) where a
    session converts iff it contains a ``convert_kind`` event and
    ``conv_pm = 1000·n_converted // n_sessions`` — the marketing-
    attribution / funnel-entry conversion table.

    Determinism: within-session order is (epoch-second, event_id) on
    BOTH sides (the oracle's ``first(event_type ORDER BY s, event_id)``),
    so same-second ties cannot flip the channel; session BREAKS depend
    only on the epoch-second values (equal seconds diff to 0 under any
    tie order), matching the sessionize contract.

    Scale shape: ONE ``hash(user) % n_buckets`` shuffle (the sessionize
    shape — a user's events co-locate, sessions never straddle buckets);
    each bucket sessionizes ALL its users in one mergesort +
    diff/flatnonzero/reduceat pass and emits per-channel PARTIAL counts;
    the driver folds ≤ ``n_buckets × #channels`` tiny rows.
    """
    from ..util import fast_hash_u64, typed_empty

    def project(batch: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()),
            1_000_000,
        )
        u = batch["user_id"].to_numpy()
        b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "s": s,
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "__ub": pa.array(b),
            }
        )

    empty = typed_empty(channel=object, n_sessions=np.int64, n_converted=np.int64)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group.sort_values(
            ["user_id", "s", "event_id"], kind="mergesort"
        )
        u = g["user_id"].to_numpy()
        s = g["s"].to_numpy()
        k = g["event_type"].to_numpy()
        n = len(u)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        same_user = u[1:] == u[:-1]
        brk[1:] = ~same_user | ((s[1:] - s[:-1]) > gap_s)
        starts = np.flatnonzero(brk)
        channel = k[starts]
        conv = np.add.reduceat((k == convert_kind).astype(np.int64), starts) > 0
        out = (
            pd.DataFrame({"channel": channel, "conv": conv.astype(np.int64)})
            .groupby("channel", as_index=False)
            .agg(n_sessions=("conv", "size"), n_converted=("conv", "sum"))
        )
        return out.astype({"n_sessions": np.int64, "n_converted": np.int64})

    partial = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets × #channels tiny rows
    )
    if partial.empty:
        return typed_empty(
            channel=object, n_sessions=np.int64,
            n_converted=np.int64, conv_pm=np.int64,
        )
    out = partial.groupby("channel", as_index=False)[
        ["n_sessions", "n_converted"]
    ].sum()
    out["conv_pm"] = (1000 * out["n_converted"]) // out["n_sessions"]
    return out.astype(
        {"n_sessions": np.int64, "n_converted": np.int64, "conv_pm": np.int64}
    ).sort_values("channel").reset_index(drop=True)


def rows_above_group_mean(
    ds,
    *,
    key_col: str,
    id_col: str,
    cents_col: str,
    n_buckets: int = 64,
):
    """Correlated-subquery decorrelation — the classic
    ``WHERE x > (SELECT AVG(x) FROM t WHERE key = outer.key)`` pattern:
    return the rows whose value exceeds THEIR OWN group's mean →
    (id, key, cents). The comparison is the integer cross-multiplication
    ``cents · n_group > sum_group`` (no float mean, no rounding slack),
    so the DuckDB oracle matches bit-for-bit.

    Scale shape: the naive plan evaluates one subquery per row; the
    decorrelated plan here is ONE bounded ``hash(key) % n_buckets``
    shuffle — each bucket holds every row of its keys, so the group
    (n, sum) census and the filter both happen inside the bucket task
    with one vectorized groupby + transform. No second pass over the
    table, no group table on the driver.
    """
    from ..util import fast_hash_u64, typed_empty

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy()
        b = (fast_hash_u64(k) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                cents_col: batch[cents_col],
                "__kb": pa.array(b),
            }
        )

    empty = typed_empty(
        **{id_col: np.int64, key_col: np.int64, cents_col: np.int64}
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        g = group[[id_col, key_col, cents_col]]
        stats = g.groupby(key_col)[cents_col].agg(["sum", "size"])
        n = g[key_col].map(stats["size"]).to_numpy(np.int64)
        s = g[key_col].map(stats["sum"]).to_numpy(np.int64)
        keep = g[cents_col].to_numpy(np.int64) * n > s
        return g[keep]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(per_bucket, batch_format="pandas")
    )
