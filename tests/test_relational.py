"""Relational stage unit tests beyond the oracle-parity suite: the
native Dataset.join fast path must be column- and row-identical to the
portable bucketed hash join."""

import numpy as np
import pandas as pd


def test_hash_join_native_parity(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 200),
            "v": rng.integers(0, 1000, 200),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.arange(0, 50, dtype=np.int64),
            "v": np.arange(0, 50, dtype=np.int64) * 10,  # collides with left.v
            "w": np.arange(0, 50, dtype=np.int64) + 7,
        }
    )

    def run(native):
        out = hash_join(
            rd.from_pandas(left.copy()),
            rd.from_pandas(right.copy()),
            "k",
            n_buckets=8,
            native=native,
        ).to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(cols).reset_index(drop=True).astype("int64")

    a, b = run(False), run(True)
    assert list(a.columns) == ["k", "v", "v_r", "w"]
    pd.testing.assert_frame_equal(a, b)


def test_asof_join_backward_with_ties(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import asof_join

    ts = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    left = pd.DataFrame(
        {
            "event_id": [100, 101, 102, 103],
            "user_id": [1, 1, 2, 3],
            "ts": [ts + 10 * s, ts + 2 * s, ts + 5 * s, ts + 9 * s],
        }
    )
    right = pd.DataFrame(
        {
            "event_id": [7, 8, 9, 10, 11],
            "user_id": [1, 1, 1, 2, 2],
            # 8 and 9 tie exactly: the larger event_id must win
            "ts": [ts + 1 * s, ts + 4 * s, ts + 4 * s, ts + 6 * s, ts + 7 * s],
        }
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), by="user_id", on="ts")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 1: event 100 (t+10) matches the t+4 TIE -> id 9; event 101 (t+2)
    # matches t+1 -> id 7. user 2: event 102 (t+5) has no view <= t+5?
    # right has t+6, t+7 -> no match (dropped). user 3: no right rows.
    assert out.event_id.tolist() == [100, 101]
    assert out.matched_id.tolist() == [9, 7]
    assert out.gap_s.tolist() == [6, 1]


def test_asof_join_random_vs_naive_model(ray_session):
    """Randomized parity against an O(n·m) reference model, with
    deliberately duplicated timestamps to exercise the tie-break."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import asof_join

    rng = np.random.default_rng(29)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    n_l, n_r = 300, 400
    # coarse second-resolution stamps force plenty of exact ties
    lts = base + rng.integers(0, 500, n_l) * 1_000_000
    rts = base + rng.integers(0, 500, n_r) * 1_000_000
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l, dtype=np.int64),
            "user_id": rng.integers(0, 25, n_l),
            "ts": pd.to_datetime(lts, unit="us"),
        }
    )
    right = pd.DataFrame(
        {
            "event_id": np.arange(1000, 1000 + n_r, dtype=np.int64),
            "user_id": rng.integers(0, 25, n_r),
            "ts": pd.to_datetime(rts, unit="us"),
        }
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), by="user_id", on="ts")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expect = {}
    for _, lr in left.iterrows():
        cand = right[(right.user_id == lr.user_id) & (right.ts <= lr.ts)]
        if len(cand):
            m = cand.sort_values(["ts", "event_id"]).iloc[-1]
            expect[int(lr.event_id)] = (
                int(m.event_id),
                int((lr.ts.value - m.ts.value) // 1_000_000_000),
            )
    assert out.event_id.tolist() == sorted(expect)
    assert [tuple(x) for x in out[["matched_id", "gap_s"]].to_numpy()] == [
        expect[i] for i in sorted(expect)
    ]


def test_semi_anti_join_partition(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hash_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64), "v": rng.integers(0, 9, 100)}
    )
    right = pd.DataFrame({"k": np.arange(0, 100, 3, dtype=np.int64), "w": 1})

    semi = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", how="semi", n_buckets=8
    ).to_pandas()
    anti = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", how="anti", n_buckets=8
    ).to_pandas()
    # semi ∪ anti partitions the left exactly; columns are left-only
    assert sorted(semi.columns) == ["k", "v"] == sorted(anti.columns)
    assert len(semi) + len(anti) == len(left)
    assert set(semi.k) == set(range(0, 100, 3))
    assert set(anti.k).isdisjoint(semi.k)


def test_range_join_count_random_vs_naive(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import range_join_count

    rng = np.random.default_rng(17)
    n_l, n_r, W = 300, 900, 50
    base = np.datetime64("2024-01-01T00:00:00", "us")
    l = pd.DataFrame(
        {
            "event_id": np.arange(n_l, dtype=np.int64),
            "user_id": rng.integers(0, 12, n_l),
            "ts": base + rng.integers(0, 5000, n_l).astype("timedelta64[s]"),
        }
    )
    r = pd.DataFrame(
        {
            "event_id": np.arange(n_r, dtype=np.int64) + 10_000,
            "user_id": rng.integers(0, 12, n_r),
            "ts": base + rng.integers(0, 5000, n_r).astype("timedelta64[s]"),
        }
    )
    out = (
        range_join_count(
            rd.from_pandas(l), rd.from_pandas(r), by="user_id", on="ts",
            window_s=W, n_buckets=5, out_col="n",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == n_l  # left semantics: every purchase kept
    lo = l.sort_values("event_id").reset_index(drop=True)
    for i in rng.choice(n_l, 40, replace=False):
        u, t = lo.user_id[i], lo.ts[i]
        naive = int(
            ((r.user_id == u) & (r.ts >= t - np.timedelta64(W, "s")) & (r.ts < t)).sum()
        )
        assert int(out.n[i]) == naive, (i, u, t)


def test_grouped_top_k_ties_and_exactness(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import grouped_top_k

    df = pd.DataFrame(
        {
            "g": np.int64([1, 1, 1, 2, 2, 3]),
            "val": np.int64([5, 5, 3, 9, 9, 1]),
            "id": np.int64([11, 10, 12, 20, 21, 30]),
        }
    )
    out = (
        grouped_top_k(
            rd.from_pandas(df), group="g", order_col="val", id_col="id", k=2,
            n_buckets=3,
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    # ties on val break toward the smaller id
    assert out.values.tolist() == [
        [1, 1, 10, 5], [1, 2, 11, 5], [2, 1, 20, 9], [2, 2, 21, 9], [3, 1, 30, 1],
    ]


def test_quantiles_exact_definition(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import quantiles_exact

    vals = np.repeat(np.arange(10, dtype=np.int64), 10)  # 100 rows, 0..9
    out = quantiles_exact(
        rd.from_pandas(pd.DataFrame({"x": vals})), "x", q_pm=[10, 250, 500, 1000]
    )
    # value at 1-based position ceil(q*n/1000) of the sorted 100 rows
    assert out.x.tolist() == [0, 2, 4, 9]
    assert out.q_pm.tolist() == [10, 250, 500, 1000]


def test_hash_join_left_outer(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hash_join

    left = pd.DataFrame({"k": np.int64([1, 2, 3]), "lv": np.int64([10, 20, 30])})
    right = pd.DataFrame({"k": np.int64([1, 1, 3]), "rv": np.int64([7, 8, 9])})
    out = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", how="left",
                  n_buckets=4)
        .to_pandas()
        .sort_values(["k", "rv"])
        .reset_index(drop=True)
    )
    # k=1 matches twice, k=2 keeps a null rv, k=3 matches once
    assert len(out) == 4
    assert out.k.tolist() == [1, 1, 2, 3]
    assert out.rv.tolist()[:2] == [7, 8]
    assert pd.isna(out.rv.iloc[2])
    assert out.rv.iloc[3] == 9
    # matched left values never floated
    assert out.lv.tolist() == [10, 10, 20, 30]


def test_hash_join_full_outer(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hash_join

    left = pd.DataFrame({"k": np.int64([1, 2, 3]), "lv": np.int64([10, 20, 30])})
    right = pd.DataFrame({"k": np.int64([1, 1, 4]), "rv": np.int64([7, 8, 9])})
    out = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", how="full",
                  n_buckets=4)
        .to_pandas()
        .sort_values(["k", "rv"])
        .reset_index(drop=True)
    )
    # pandas full outer on the same frames is the model
    want = (
        left.merge(right, on="k", how="outer")
        .sort_values(["k", "rv"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want) == 5
    assert out.k.tolist() == want.k.tolist() == [1, 1, 2, 3, 4]
    # k=2 survives from the left with null rv; k=4 from the right with null lv
    assert pd.isna(out.rv.iloc[2]) and pd.isna(out.lv.iloc[4])
    # nulls stay nullable ints, never floats
    assert out.lv.dtype.kind != "f" and out.rv.dtype.kind != "f"
    assert out.lv.dropna().tolist() == [10, 10, 20, 30]
    assert out.rv.dropna().tolist() == [7, 8, 9]


def test_running_agg_cumsum_and_ties(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import running_agg

    ev = pd.DataFrame(
        {
            "event_id": np.int64([1, 2, 3, 4, 5]),
            "user_id": np.int64([7, 7, 7, 8, 8]),
            # event 2 and 3 tie on ts → order falls back to event_id
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                 "2024-01-01 01:00:00", "2024-01-01 00:30:00",
                 "2024-01-01 00:10:00"]
            ),
            "value": [1.0, 2.0, 4.0, 10.0, 20.0],
        }
    )
    out = (
        running_agg(rd.from_pandas(ev), n_buckets=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out.running_c.tolist() == [100, 300, 700, 3000, 2000]


def test_pivot_counts_fixed_columns(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import pivot_counts

    df = pd.DataFrame(
        {
            "src": ["a", "a", "a", "b", "b"],
            "lang": ["en", "en", "de", "zz", "en"],
        }
    )
    out = (
        pivot_counts(rd.from_pandas(df), row="src", col="lang",
                     col_values=["de", "en"], n_buckets=4)
        .to_pandas()
        .sort_values("src")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["src", "de", "en", "other"]
    assert out.values.tolist() == [["a", 1, 2, 0], ["b", 0, 1, 1]]


def test_rollup_aggregate_levels(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import rollup_aggregate

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y"],
            "b": ["p", "q", "p"],
            "v": [1.0, 2.0, 4.0],
        }
    )
    out = rollup_aggregate(
        rd.from_pandas(df), keys=["a", "b"], value="v", n_buckets=4
    )
    got = {(r.a, r.b): r.value_c for r in out.itertuples()}
    assert got == {
        ("x", "p"): 100, ("x", "q"): 200, ("y", "p"): 400,
        ("x", "ALL"): 300, ("y", "ALL"): 400, ("ALL", "ALL"): 700,
    }


def test_grouped_quantiles_exact_hand_computed(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import grouped_quantiles_exact

    rows = [{"k": "a", "v": i} for i in range(1, 11)]  # 1..10
    rows += [{"k": "b", "v": 5}] * 4  # constant group
    out = grouped_quantiles_exact(
        rd.from_items(rows), "k", "v", q_pm=[250, 500, 1000]
    ).to_pandas()
    got = {(r.k, r.q_pm): r.v for r in out.itertuples()}
    # group a (n=10): ceil(0.25·10)=3rd → 3; ceil(0.5·10)=5th → 5; max → 10
    assert got[("a", 250)] == 3
    assert got[("a", 500)] == 5
    assert got[("a", 1000)] == 10
    assert got[("b", 250)] == got[("b", 1000)] == 5


def test_lag_gaps_first_row_and_ties(ray_session):
    import ray.data as rd
    import pandas as pd

    from sanskrit_ocr_ray.stages.relational import lag_gaps

    ts = pd.Timestamp("2024-01-01")
    rows = [
        {"event_id": 1, "user_id": 7, "ts": ts},
        {"event_id": 2, "user_id": 7, "ts": ts},  # tie on ts → ordered by id
        {"event_id": 3, "user_id": 7, "ts": ts + pd.Timedelta(seconds=5)},
        {"event_id": 4, "user_id": 9, "ts": ts},  # other user: first → -1
    ]
    out = lag_gaps(rd.from_items(rows)).to_pandas()
    gap = dict(zip(out.event_id, out.gap_us))
    assert gap == {1: -1, 2: 0, 3: 5_000_000, 4: -1}


def test_grouped_concat_order_and_ties(ray_session):
    import ray.data as rd
    import pandas as pd

    from sanskrit_ocr_ray.stages.relational import grouped_concat

    ts = pd.Timestamp("2024-01-01")
    rows = [
        {"event_id": 2, "user_id": 7, "ts": ts, "event_type": "b"},
        {"event_id": 1, "user_id": 7, "ts": ts, "event_type": "a"},  # tie → by id
        {"event_id": 3, "user_id": 7, "ts": ts + pd.Timedelta(1, "s"), "event_type": "c"},
        {"event_id": 4, "user_id": 9, "ts": ts, "event_type": "z"},
    ]
    out = grouped_concat(rd.from_items(rows)).to_pandas()
    got = {r.user_id: (r.path, r.n) for r in out.itertuples()}
    assert got == {7: ("a>b>c", 3), 9: ("z", 1)}


def test_distinct_count_by_cross_batch(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import distinct_count_by

    # duplicates spread across many input blocks must still count once
    rows = [{"g": i % 3, "v": (i * 7) % 10} for i in range(300)]
    out = distinct_count_by(
        rd.from_items(rows).repartition(16), "g", "v"
    ).to_pandas()
    got = dict(zip(out.g, out.n_distinct))
    import collections
    exp = collections.defaultdict(set)
    for r in rows:
        exp[r["g"]].add(r["v"])
    assert got == {g: len(s) for g, s in exp.items()}


def test_exact_distinct_cross_batch(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import exact_distinct

    rows = [{"a": i % 4, "b": (i * 3) % 5} for i in range(200)]
    out = exact_distinct(
        rd.from_items(rows).repartition(16), ["a", "b"]
    ).to_pandas()
    got = set(zip(out.a, out.b))
    assert got == {(r["a"], r["b"]) for r in rows}
    assert len(out) == len(got)  # no duplicate rows survive


def test_percent_rank_map_ties_min_rank(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import percent_rank_map

    # values 10,10,20,30,30,30 → smaller-counts 0,0,2,3,3,3 ; n-1 = 5
    rows = [{"id": i, "v": v} for i, v in enumerate([10, 10, 20, 30, 30, 30])]
    out = percent_rank_map(rd.from_items(rows), "v").to_pandas()
    got = dict(zip(out.id, out.pr_pm))
    assert got == {0: 0, 1: 0, 2: 400, 3: 600, 4: 600, 5: 600}


def test_corr_moments_hand_computed(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import corr_moments

    rows = [{"x": 1, "y": 2}, {"x": 3, "y": 4}, {"x": 5, "y": 6}]
    out = corr_moments(rd.from_items(rows).repartition(2), "x", "y")
    r = out.iloc[0]
    assert (r.n, r.sum_x, r.sum_y) == (3, 9, 12)
    assert (r.sum_xx, r.sum_yy, r.sum_xy) == (35, 56, 44)


def test_skew_join_equals_hash_join_on_skewed_data(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hash_join, skew_join

    # one key holds 80% of the left side
    left = [{"k": 1 if i < 160 else i % 20, "lv": i} for i in range(200)]
    right = [{"k": j, "rv": j * 10} for j in range(20)]
    lds, rds = rd.from_items(left).repartition(8), rd.from_items(right)
    for how in ("inner", "left", "semi", "anti"):
        a = (
            skew_join(lds, rds, "k", n_salts=4, hot_threshold=50, how=how)
            .to_pandas()
        )
        b = hash_join(lds, rds, "k", how=how).to_pandas()
        cols = sorted(a.columns)
        assert cols == sorted(b.columns), how
        pa_ = a[cols].sort_values(cols).reset_index(drop=True).astype(str)
        pb_ = b[cols].sort_values(cols).reset_index(drop=True).astype(str)
        assert pa_.equals(pb_), how


def test_rolling_agg_window_boundary(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import rolling_agg

    # one user, 5 events of value 1.00 → with window 3 the rolling sums
    # are 100, 200, 300, 300, 300; second user checks group isolation
    df = pd.DataFrame(
        {
            "event_id": np.arange(7, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:%02d" % s for s in range(7)]
            ),
            "value": np.ones(7),
        }
    )
    out = (
        rolling_agg(rd.from_pandas(df), window_rows=3, n_buckets=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["roll_c"].tolist() == [100, 200, 300, 300, 300, 100, 200]


def test_funnel_counts_strictly_after(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import funnel_counts

    # u1 completes view→click→purchase in order; u2's click PRECEDES the
    # first view so it must not count; u3 views only
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",  # u1 view
                    "2024-01-01 00:01:00",  # u1 click
                    "2024-01-01 00:02:00",  # u1 purchase
                    "2024-01-01 00:00:30",  # u2 click (before its view)
                    "2024-01-01 00:01:30",  # u2 view
                    "2024-01-01 00:00:00",  # u3 view
                ]
            ),
            "event_type": ["view", "click", "purchase", "click", "view", "view"],
        }
    )
    out = funnel_counts(
        rd.from_pandas(df), ["view", "click", "purchase"], n_buckets=4
    )
    assert out.sort_values("stage_idx")["n_users"].tolist() == [3, 1, 1]


def test_grouped_mode_tie_break(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import grouped_mode

    # u1: tie between 'a' and 'b' (2 each) → lexicographically smaller 'a';
    # u2: clear winner 'z'
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 1, 2, 2, 2], dtype=np.int64),
            "event_type": ["b", "a", "b", "a", "z", "z", "q"],
        }
    )
    out = (
        grouped_mode(rd.from_pandas(df), n_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["mode_event_type"].tolist() == ["a", "z"]
    assert out["n"].tolist() == [2, 2]


def test_quantiles_binned_definition(ray_session):
    """Binned sketch == quantiles of floor(value·scale) bins, verified
    against a naive sorted-array model on continuous floats."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import quantiles_binned

    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 37.7, size=5000)
    ds = rd.from_items([{"value": float(v)} for v in vals]).repartition(8)
    out = quantiles_binned(ds, "value", scale=10).sort_values("q_pm")

    bins = np.sort(np.floor(vals * 10).astype(np.int64))
    for q, b in zip(out.q_pm, out.bin):
        k = -(-q * len(bins) // 1000)  # ceil
        assert b == bins[k - 1], q
        # sketch error bound: bin/scale is within 1/scale of the true quantile
        true_q = np.sort(vals)[k - 1]
        assert abs(b / 10 - true_q) <= 0.1 + 1e-9


def test_interval_coverage_islands(ray_session):
    """Overlapping/touching intervals merge; disjoint ones count as
    separate islands; coverage is the union length."""
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import interval_coverage

    base = pd.Timestamp("2024-01-01 00:00:00")

    def ev(uid, sec):
        return {"user_id": uid, "ts": base + pd.Timedelta(seconds=sec)}

    ds = rd.from_items(
        [
            # user 1: [0,300) ∪ [200,500) merge → 500s; [1000,1300) separate
            ev(1, 0), ev(1, 200), ev(1, 1000),
            # user 2: touching intervals [0,300) + [300,600) merge → 600s
            ev(2, 0), ev(2, 300),
            # user 3: duplicate starts collapse into one island
            ev(3, 50), ev(3, 50),
        ]
    ).repartition(3)
    out = (
        interval_coverage(ds, dur_s=300, n_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(zip(out.user_id, out.active_s, out.n_islands)) == [
        (1, 800, 2),
        (2, 600, 1),
        (3, 300, 1),
    ]


def test_cube_aggregate_all_grouping_sets(ray_session):
    """CUBE emits every subset of the keys: base, each single-key
    subtotal, and the grand total — verified against a naive model."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import cube_aggregate

    rows = [
        {"a": "x", "b": "p", "v": 1.0},
        {"a": "x", "b": "q", "v": 2.0},
        {"a": "y", "b": "p", "v": 4.0},
    ]
    out = cube_aggregate(
        rd.from_items(rows).repartition(2), keys=["a", "b"], value="v", n_buckets=4
    )
    got = {(r.a, r.b): r.value_c for r in out.itertuples()}
    assert got == {
        ("x", "p"): 100, ("x", "q"): 200, ("y", "p"): 400,
        ("x", "ALL"): 300, ("y", "ALL"): 400,
        ("ALL", "p"): 500, ("ALL", "q"): 200,
        ("ALL", "ALL"): 700,
    }


def test_quantiles_exact_empty_input(ray_session):
    """Zero input rows → zero-row (q_pm, value) frame, not IndexError."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import quantiles_exact

    empty = rd.from_pandas(pd.DataFrame({"x": pd.Series(dtype=np.int64)}))
    out = quantiles_exact(empty, "x", q_pm=[250, 500])
    assert len(out) == 0
    assert list(out.columns) == ["q_pm", "x"]


def test_hash_join_composite_key_vs_pandas(ray_session):
    """Multi-column equi-join (inner/left/semi/anti) matches pandas merge
    semantics, including duplicate keys on both sides."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hash_join

    rng = np.random.default_rng(3)
    l = pd.DataFrame(
        {
            "v": rng.integers(0, 6, 80),
            "w": rng.integers(0, 6, 80),
            "lx": np.arange(80),
        }
    )
    r = pd.DataFrame(
        {
            "v": rng.integers(0, 6, 50),
            "w": rng.integers(0, 6, 50),
            "rx": np.arange(50) * 10,
        }
    )
    lds = rd.from_pandas(l).repartition(5)
    rds = rd.from_pandas(r).repartition(3)

    inner = (
        hash_join(lds, rds, key=["v", "w"], n_buckets=7)
        .to_pandas()
        .sort_values(["v", "w", "lx", "rx"])
        .reset_index(drop=True)
    )
    want = (
        l.merge(r, on=["v", "w"])
        .sort_values(["v", "w", "lx", "rx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        inner[want.columns.tolist()].astype(want.dtypes), want
    )

    semi = hash_join(lds, rds, key=["v", "w"], how="semi", n_buckets=7).to_pandas()
    anti = hash_join(lds, rds, key=["v", "w"], how="anti", n_buckets=7).to_pandas()
    keys = set(map(tuple, r[["v", "w"]].values))
    in_l = l[[tuple(t) in keys for t in l[["v", "w"]].values]]
    assert sorted(semi["lx"]) == sorted(in_l["lx"])
    assert sorted(anti["lx"]) == sorted(set(l["lx"]) - set(in_l["lx"]))
    assert len(semi) + len(anti) == len(l)

    left = hash_join(lds, rds, key=["v", "w"], how="left", n_buckets=7).to_pandas()
    assert len(left) == len(want) + len(anti)


def test_status_history_runs_ties_and_partition_invariance(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import status_history

    rng = np.random.default_rng(11)
    n = 400
    # coarse second grid forces (user, ts) ties → event_id tie-break matters
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": pd.to_datetime(rng.integers(0, 50, n), unit="s"),
        }
    )

    # naive model: per user, order by (us, event_id), collapse equal runs
    def naive():
        rows = []
        us = df["ts"].astype("int64").to_numpy()  # ns
        d = df.assign(us=us // 1000).sort_values(["user_id", "us", "event_id"])
        for uid, g in d.groupby("user_id"):
            et = g["event_type"].tolist()
            t = g["us"].tolist()
            runs = []
            for ty, tt in zip(et, t):
                if runs and runs[-1][0] == ty:
                    runs[-1][2] += 1
                else:
                    runs.append([ty, tt, 1])
            for i, (ty, vf, cnt) in enumerate(runs):
                vt = runs[i + 1][1] if i + 1 < len(runs) else -1
                rows.append((uid, ty, vf, vt, cnt))
        return sorted(rows)

    want = naive()
    for parts in (1, 6):
        out = status_history(
            rd.from_pandas(df).repartition(parts), n_buckets=8
        ).to_pandas()
        got = sorted(
            zip(
                out["user_id"],
                out["event_type"],
                out["valid_from_us"],
                out["valid_to_us"],
                out["n_events"],
            )
        )
        assert got == want, parts


def test_merge_scd1_latest_wins(ray_session):
    """SCD1 MERGE: max-ver wins, delete wins ver ties, winning delete
    removes, winning upsert replaces/inserts, untouched keys pass."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import merge_scd1

    base = rd.from_items(
        [{"k": i, "val": f"b{i}"} for i in range(1, 6)]
    ).repartition(3)
    changes = rd.from_items(
        [
            {"k": 1, "ver": 1, "op": "upsert", "val": "u1a"},
            {"k": 1, "ver": 2, "op": "upsert", "val": "u1b"},  # latest wins
            {"k": 2, "ver": 1, "op": "delete", "val": None},   # removed
            {"k": 3, "ver": 5, "op": "upsert", "val": "u3"},
            {"k": 3, "ver": 5, "op": "delete", "val": None},   # tie → delete
            {"k": 9, "ver": 1, "op": "upsert", "val": "new9"}, # insert
            {"k": 10, "ver": 1, "op": "delete", "val": None},  # no-op delete
        ]
    ).repartition(2)
    out = (
        merge_scd1(base, changes, key="k", payload_cols=["val"], n_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.k.tolist() == [1, 4, 5, 9]
    assert out.val.tolist() == ["u1b", "b4", "b5", "new9"]


def test_ntile_assign_exact_split(ray_session):
    """NTILE semantics: first (N mod n) tiles get one extra row; order is
    (value, id); result invariant to partitioning."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import ntile_assign

    # N=10, n=4 -> tile sizes 3,3,2,2 over ascending value order
    df = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "value": np.array([5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 0.5]),
        }
    )
    for parts in (1, 5):
        out = (
            ntile_assign(
                rd.from_pandas(df).repartition(parts),
                "value",
                n_tiles=4,
                n_buckets=4,
            )
            .to_pandas()
            .sort_values("event_id")
        )
        by_rank = df.sort_values(["value", "event_id"]).event_id.to_numpy()
        expect = {}
        sizes = [3, 3, 2, 2]
        pos = 0
        for t, s in enumerate(sizes, start=1):
            for eid in by_rank[pos : pos + s]:
                expect[eid] = t
            pos += s
        got = dict(zip(out.event_id, out.tile))
        assert got == expect


def test_ntile_assign_ties_and_small_n(ray_session):
    """Equal values tie-break by id; N < n gives each row its own tile."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import ntile_assign

    df = pd.DataFrame(
        {"event_id": np.array([3, 1, 2], dtype=np.int64), "value": [1.0, 1.0, 1.0]}
    )
    out = (
        ntile_assign(rd.from_pandas(df), "value", n_tiles=5, n_buckets=2)
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(zip(out.event_id, out.tile)) == [(1, 1), (2, 2), (3, 3)]


def test_unpivot_melt(ray_session):
    """Wide->long: one row per (row, measure), ids repeated, float cast."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import unpivot

    df = pd.DataFrame(
        {
            "id": np.array([1, 2], dtype=np.int64),
            "a": np.array([10, 20], dtype=np.int64),
            "b": [0.5, 1.5],
        }
    )
    out = (
        unpivot(rd.from_pandas(df), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    assert list(zip(out.id, out.variable, out.value)) == [
        (1, "a", 10.0),
        (1, "b", 0.5),
        (2, "a", 20.0),
        (2, "b", 1.5),
    ]


def test_ewma_by_user_recurrence(ray_session):
    """Integer EWMA: s0=v0, s_i=(v_i+3*s_{i-1})//4 per user in (ts,id)
    order; partition-invariant; single-event users pass through."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import ewma_by_user

    rows = [
        # user 1: v = 400, 100, 100 -> s = 400, (100+1200)//4=325, (100+975)//4=268
        {"event_id": 1, "user_id": 1, "ts": 10, "value": 4.0},
        {"event_id": 2, "user_id": 1, "ts": 20, "value": 1.0},
        {"event_id": 3, "user_id": 1, "ts": 30, "value": 1.0},
        # user 2: single event
        {"event_id": 4, "user_id": 2, "ts": 5, "value": 2.5},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    for parts in (1, 3):
        out = (
            ewma_by_user(rd.from_pandas(df).repartition(parts), n_buckets=4)
            .to_pandas()
            .sort_values("event_id")
        )
        assert list(zip(out.event_id, out.ewma)) == [
            (1, 400),
            (2, 325),
            (3, 268),
            (4, 250),
        ]


def test_ewma_by_user_tie_order(ray_session):
    """Equal timestamps order by event_id (the oracle's two-key sort)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import ewma_by_user

    df = pd.DataFrame(
        [
            {"event_id": 2, "user_id": 1, "ts": 10, "value": 1.0},
            {"event_id": 1, "user_id": 1, "ts": 10, "value": 4.0},
        ]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    out = ewma_by_user(rd.from_pandas(df), n_buckets=2).to_pandas().sort_values("event_id")
    # order is id 1 (v=400) then id 2 (v=100): s = 400, then 325
    assert list(zip(out.event_id, out.ewma)) == [(1, 400), (2, 325)]


def test_zorder_keys_locality_and_bits(ray_session):
    """Morton interleave: known bit patterns map exactly; z-range shards
    are axis-aligned tiles (both coords share top bits within a shard)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import zorder_keys

    df = pd.DataFrame(
        {
            "id": np.arange(4, dtype=np.int64),
            "x": np.array([0b1010, 0, 0xFFFF, 1], dtype=np.int64),
            "y": np.array([0b0101, 0xFFFF, 0, 1], dtype=np.int64),
        }
    )
    out = (
        zorder_keys(rd.from_pandas(df), "x", "y", id_cols=["id"], bits=16, shard_bits=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for _, r in out.iterrows():
        assert r.zkey == morton(df.x[r.id], df.y[r.id])
        assert r.shard == r.zkey >> 28
    # interleave of x=0b1010, y=0b0101: alternating bits -> 0b01100110
    assert out.zkey[0] == 0b01100110


def test_debounce_events_kept_chain(ray_session):
    """Debounce measures from the last KEPT event, not the last event:
    t=0,100,200 with w=150 keeps {0, 200} (a pairwise-gap filter would
    drop 200 too); first event per user always kept; partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import debounce_events

    rows = [
        {"event_id": 1, "user_id": 1, "ts": 0},
        {"event_id": 2, "user_id": 1, "ts": 100},
        {"event_id": 3, "user_id": 1, "ts": 200},
        {"event_id": 4, "user_id": 2, "ts": 50},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    for parts in (1, 3):
        out = (
            debounce_events(
                rd.from_pandas(df).repartition(parts), window_s=150, n_buckets=4
            )
            .to_pandas()
            .sort_values("event_id")
        )
        assert list(out.event_id) == [1, 3, 4]


def test_mad_outliers_hand_computed(ray_session):
    """Two groups with known lower medians, MADs and planted outliers;
    partition-count invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import mad_outliers

    # group 'a': values 1..9 plus outlier 1000 → n=10, med = 5th = 5;
    # |x−5| = 4,3,2,1,0,1,2,3,4,995 → sorted 0..4,4,995 → mad = 5th of
    # [0,1,1,2,2,3,3,4,4,995] = 2; outliers: |x−5| > 10 → just 1000
    a_vals = list(range(1, 10)) + [1000]
    # group 'b': constant 7 ×6 → med 7, mad 0, every dev > 0 is an
    # outlier → plant two 8s: |8−7|=1 > 5·0 → 2 outliers
    b_vals = [7] * 6 + [8, 8]
    df = pd.DataFrame(
        {
            "g": ["a"] * len(a_vals) + ["b"] * len(b_vals),
            "v": np.array(a_vals + b_vals, dtype=np.int64),
        }
    )
    for parts in (1, 4):
        out = (
            mad_outliers(rd.from_pandas(df).repartition(parts), "g", "v", k=5)
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert out["g"].tolist() == ["a", "b"]
        assert out["med_c"].tolist() == [5, 7]
        assert out["mad_c"].tolist() == [2, 0]
        assert out["n_outliers"].tolist() == [1, 2]


def test_sequence_pattern_counts_hand_computed(ray_session):
    """Non-overlapping greedy counts over hand-built paths; partition
    invariant."""
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import sequence_pattern_counts

    # user 1 path: view>click>click>purchase>view>purchase  → 2 matches
    # user 2 path: view>click>error>purchase                → 0 (error breaks)
    # user 3 path: purchase>view                             → 0
    rows = []
    seqs = {
        1: ["view", "click", "click", "purchase", "view", "purchase"],
        2: ["view", "click", "error", "purchase"],
        3: ["purchase", "view"],
    }
    eid = 0
    for u, seq in seqs.items():
        for t_i, et in enumerate(seq):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=t_i),
                    "user_id": u,
                    "event_type": et,
                }
            )
            eid += 1
    df = pd.DataFrame(rows)
    for parts in (1, 3):
        out = (
            sequence_pattern_counts(
                rd.from_pandas(df).repartition(parts),
                r"view>(click>)*purchase",
                n_buckets=4,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [1, 2, 3]
        assert out["n_matches"].tolist() == [2, 0, 0]


def test_table_diff_classifies_hand_built_snapshots(ray_session):
    """added/removed/changed against hand-built snapshots; unchanged rows
    never appear; null value columns hash stably."""
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import table_diff

    old = pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "a": ["x", "y", None, "w"],
            "b": pd.array([10, 20, 30, 40], dtype="Int64"),
        }
    )
    new = pd.DataFrame(
        {
            "k": [2, 3, 4, 5],          # 1 removed, 5 added
            "a": ["y", None, "w2", "v"],  # 4 changed (a), 2/3 unchanged
            "b": pd.array([20, 30, 40, 50], dtype="Int64"),
        }
    )
    out = (
        table_diff(rd.from_pandas(old), rd.from_pandas(new), "k", ["a", "b"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(zip(out["k"].tolist(), out["change_type"].tolist())) == [
        (1, "removed"),
        (4, "changed"),
        (5, "added"),
    ]


def test_late_events_watermark_hand_computed(ray_session):
    """Exclusive running-max watermark across range-bucket boundaries:
    a tiny n_ranges forces the carry broadcast path; expected flags are
    replayed with a naive driver loop."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import late_events

    rng = np.random.default_rng(9)
    n = 200
    base = np.arange(n, dtype=np.int64) * 60_000_000  # 1/min
    jitter = rng.integers(-3_600_000_000, 3_600_000_000, size=n)
    us = base + jitter
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "et_us": us})

    L, W = 1_800_000_000, 3_600_000_000
    prev = -(1 << 62)
    want = []
    for t in us:  # arrival order = event_id order
        wend = (t // W + 1) * W
        want.append(1 if prev - L > wend else 0)
        prev = max(prev, int(t))
    assert 0 < sum(want) < n  # both classes present

    for parts, ranges in ((1, 4), (7, 16)):
        out = (
            late_events(
                rd.from_pandas(df).repartition(parts),
                lateness_us=L,
                window_us=W,
                ts_col="et_us",
                n_ranges=ranges,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out["is_late"].tolist() == want


def test_zone_map_prune_stats_and_verdict(ray_session):
    """Per-partition min/max fold across many small blocks, and the
    prune verdict: a partition prunes iff its x-range misses [lo, hi]."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import zone_map_prune

    rng = np.random.RandomState(3)
    part = rng.randint(0, 5, 400)
    x = part * 100 + rng.randint(0, 100, 400)  # partition p covers [100p, 100p+99]
    y = rng.randint(-50, 50, 400)
    ds = rd.from_arrow(
        pa.table({"p": pa.array(part, pa.int64()),
                  "x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    ).repartition(8)
    out = (
        zone_map_prune(ds, "p", "x", "y", lo=150, hi=310)
        .to_pandas().sort_values("shard").reset_index(drop=True)
    )
    assert list(out["shard"]) == [0, 1, 2, 3, 4]
    for _, r in out.iterrows():
        p = int(r["shard"])
        sel = part == p
        assert r["n_rows"] == sel.sum()
        assert r["min_x"] == x[sel].min() and r["max_x"] == x[sel].max()
        assert r["min_y"] == y[sel].min() and r["max_y"] == y[sel].max()
        assert r["pruned"] == int(x[sel].max() < 150 or x[sel].min() > 310)
    # [150, 310] intersects partitions 1, 2, 3 only
    assert list(out["pruned"]) == [1, 0, 0, 0, 1]


def test_cohort_retention_matrix(ray_session):
    """Staggered cohorts: users joining in different weeks, churning at
    different ages — counts equal a set-based local replay, and a user
    absent in a middle week is still counted at later offsets."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import cohort_retention

    week = 7 * 86400
    rows = []  # (user, week_index) activity, with gaps
    acts = {
        1: [0, 1, 2], 2: [0, 2], 3: [0],          # cohort week 0
        4: [1, 2, 3], 5: [1, 3],                  # cohort week 1
        6: [3],                                   # cohort week 3
    }
    eid = 0
    for u, weeks in acts.items():
        for w in weeks:
            for rep in range(2):  # duplicate events inside a week
                rows.append({"user_id": u,
                             "ts": np.datetime64((w * week + 3600 * (1 + rep)) * 10**6, "us")})
                eid += 1
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows))).repartition(4)
    out = (
        cohort_retention(ds, period_s=week)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    got = {
        (int(r["cohort_week"]), int(r["week_offset"])): int(r["n_users"])
        for _, r in out.iterrows()
    }
    exp = {}
    for u, weeks in acts.items():
        c = min(weeks)
        for w in set(weeks):
            key = (c, w - c)
            exp[key] = exp.get(key, 0) + 1
    assert got == exp
    assert got[(0, 2)] == 2  # user 2's gap week does not erase offset 2


def test_impute_group_mean(ray_session):
    """NULLs fill with the per-group floor-mean of surviving values;
    non-null rows pass through unchanged with imputed=0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import impute_group_mean

    ids = np.arange(12, dtype=np.int64)
    grp = ["a", "a", "a", "b", "b", "b", "a", "b", "a", "b", "a", "b"]
    val = np.array([10, 20, 31, 5, 7, 0, 0, 0, 40, 9, 0, 0], np.int64)
    missing = np.array([0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 1, 1], bool)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(ids),
                "event_type": pa.array(grp),
                "value_c": pa.array(val, mask=missing),
            }
        )
    ).repartition(3)
    out = (
        impute_group_mean(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    mean_a = (10 + 20 + 31 + 40) // 4  # 25
    mean_b = (5 + 7 + 9) // 3          # 7
    exp = [10, 20, 31, 5, 7, mean_b, mean_a, mean_b, 40, 9, mean_a, mean_b]
    assert list(out["value_c"]) == exp
    assert list(out["imputed"]) == list(missing.astype(int))


def test_quantiles_cont_interpolation(ray_session):
    """PERCENTILE_CONT ×1000 equals the integer recurrence on a small
    set with duplicates, including a fractional position and the top
    edge clamp."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import quantiles_cont

    vals = np.array([10, 10, 20, 30, 30, 30, 40, 100], np.int64)  # n=8
    ds = rd.from_arrow(pa.table({"c": pa.array(vals)})).repartition(3)
    out = quantiles_cont(ds, "c", q_pm=[0, 250, 500, 900, 1000])
    got = dict(zip(out["q_pm"], out["value_x1000"]))
    sv = np.sort(vals)
    exp = {}
    for q in [0, 250, 500, 900, 1000]:
        pos = (len(sv) - 1) * q
        i, f = pos // 1000, pos % 1000
        hi = sv[min(i + 1, len(sv) - 1)]
        exp[q] = int(sv[i]) * 1000 + (int(hi) - int(sv[i])) * f
    assert got == exp
    # spot-check the classic: median of n=8 interpolates ranks 3..4
    assert got[500] == 30 * 1000  # sv[3]=30, sv[4]=30
    assert got[250] == 10 * 1000 + (20 - 10) * 750  # pos=1.75


def test_rolling_median_by_user(ray_session):
    """Rolling 4-row median ×2 equals a per-user pandas replay,
    including the growing-window starts and odd/even midpoints."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import rolling_median_by_user

    rng = np.random.RandomState(9)
    m = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(m, dtype=np.int64),
            "user_id": rng.randint(0, 7, m).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**6, m), unit="s"),
            "value": rng.uniform(0, 50, m).round(2),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = rolling_median_by_user(ds, window=4, n_buckets=4).to_pandas()
    got = dict(zip(out["event_id"], out["med_x2"]))

    c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.assign(c=c)
    exp = {}
    for _, gr in df.groupby("user_id"):
        gr = gr.sort_values(["ts", "event_id"])
        vals = gr["c"].tolist()
        for i, eid in enumerate(gr["event_id"]):
            w = sorted(vals[max(0, i - 3) : i + 1])
            k = len(w)
            exp[int(eid)] = w[(k - 1) // 2] + w[k // 2]
    assert got == exp


def test_impute_group_mean_all_null_group_drops(ray_session):
    """A group whose values are ALL null has no mean; its rows drop
    (mirror of the oracle's inner join) instead of crashing on NaN."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import impute_group_mean

    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "event_type": pa.array(["a", "a", "z", "z"]),
                "value_c": pa.array(
                    np.asarray([10, 0, 0, 0], np.int64),
                    mask=np.array([False, True, True, True]),
                ),
            }
        )
    )
    out = impute_group_mean(ds).to_pandas().sort_values("event_id")
    assert list(out["event_id"]) == [0, 1]
    assert list(out["value_c"]) == [10, 10]
    assert list(out["imputed"]) == [0, 1]


def test_cusum_flags_recurrence(ray_session):
    """CUSUM equals a per-user local replay: resets at zero, accumulates
    positive drift, flags only above threshold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import cusum_flags

    rng = np.random.RandomState(4)
    m = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(m, dtype=np.int64),
            "user_id": rng.randint(0, 6, m).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**6, m), unit="s"),
            "value": rng.uniform(0, 200, m).round(2),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    k, h = 9000, 25000
    out = cusum_flags(ds, drift_c=k, threshold_c=h, n_buckets=4).to_pandas()
    got = {
        int(r["event_id"]): (int(r["cusum"]), int(r["flagged"]))
        for _, r in out.iterrows()
    }
    c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    exp = {}
    for _, gr in df.assign(c=c).groupby("user_id"):
        gr = gr.sort_values(["ts", "event_id"])
        s = 0
        for _, r in gr.iterrows():
            s = max(0, s + int(r["c"]) - k)
            exp[int(r["event_id"])] = (s, int(s > h))
    assert got == exp
    flags = sum(f for _, f in exp.values())
    assert 0 < flags < m  # both flagged and unflagged rows exercised


def test_trimmed_mean_by_group(ray_session):
    """Histogram-derived trimmed mean equals a sort-based local replay,
    including duplicate values straddling the trim boundaries."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import trimmed_mean_by_group

    rng = np.random.RandomState(6)
    m = 400
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b", "c"], m),
            # heavy duplication so trim boundaries cut inside value runs
            "value_c": rng.randint(0, 25, m).astype(np.int64) * 100,
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = trimmed_mean_by_group(ds, trim_pm=100, n_buckets=4).to_pandas()
    got = {
        r["event_type"]: (int(r["n_kept"]), int(r["tmean_c"]))
        for _, r in out.iterrows()
    }
    exp = {}
    for g, gr in df.groupby("event_type"):
        v = np.sort(gr["value_c"].to_numpy())
        n = len(v)
        k = n // 10
        kept = v[k : n - k]
        exp[g] = (len(kept), int(kept.sum()) // len(kept))
    assert got == exp


def test_running_distinct_by_user(ray_session):
    """Running distinct equals a per-user set replay, including repeats
    that must NOT bump the count and ts ties broken by event_id."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import running_distinct_by_user

    rng = np.random.RandomState(12)
    m = 250
    df = pd.DataFrame(
        {
            "event_id": np.arange(m, dtype=np.int64),
            "user_id": rng.randint(0, 5, m).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 50, m), unit="s"),  # many ties
            "event_type": rng.choice(["v", "c", "p", "e"], m),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = running_distinct_by_user(ds, n_buckets=4).to_pandas()
    got = dict(zip(out["event_id"], out["n_kinds"]))
    exp = {}
    for _, gr in df.groupby("user_id"):
        gr = gr.sort_values(["ts", "event_id"])
        seen = set()
        for _, r in gr.iterrows():
            seen.add(r["event_type"])
            exp[int(r["event_id"])] = len(seen)
    assert got == exp


def test_key_count_histogram(ray_session):
    """Counts-of-counts equals a local census, with keys split across
    many blocks so per-key partial counts must fold across batches."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import key_count_histogram

    rng = np.random.RandomState(8)
    keys = np.concatenate(
        [np.repeat(1, 50), np.repeat(2, 50), rng.randint(100, 200, 300)]
    ).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(7)
    out = key_count_histogram(ds, "k", n_buckets=4).to_pandas()
    got = dict(zip(out["n_occurrences"], out["n_keys"]))
    census = pd.Series(keys).value_counts()
    exp = census.value_counts().to_dict()
    assert got == {int(k): int(v) for k, v in exp.items()}
    assert got[50] == 2  # the two planted hot keys fold across blocks


def test_audience_overlap(ray_session):
    """Pairwise distinct-user overlap equals a set replay; duplicate
    events don't double-count and users split across blocks fold."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import audience_overlap

    acts = {
        1: ["v", "c", "p"], 2: ["v", "c"], 3: ["v"], 4: ["c", "p"],
        5: ["v", "p", "v", "p"],  # duplicates within a user
    }
    rows = [
        {"user_id": u, "event_type": k}
        for u, kinds in acts.items()
        for k in kinds
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows))).repartition(4)
    out = audience_overlap(ds, n_buckets=4).to_pandas()
    got = {
        (r["kind_a"], r["kind_b"]): int(r["n_users"])
        for _, r in out.iterrows()
    }
    sets = {u: set(k) for u, k in acts.items()}
    exp = {}
    for kinds in sets.values():
        s = sorted(kinds)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                exp[(s[i], s[j])] = exp.get((s[i], s[j]), 0) + 1
    assert got == exp
    assert got[("c", "v")] == 2 and got[("p", "v")] == 2


def test_session_attribution_planted(ray_session):
    """Hand-built sessions: channel = first event by (second, event_id),
    conversion iff a purchase lands inside the session window."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import session_attribution

    base = pd.Timestamp("2024-03-01 12:00:00")

    def ev(eid, user, offset_s, kind):
        return {
            "event_id": eid,
            "user_id": user,
            "ts": base + pd.Timedelta(seconds=offset_s),
            "event_type": kind,
        }

    rows = [
        # user 1, session A: view → purchase (converted, channel view)
        ev(1, 1, 0, "view"), ev(2, 1, 60, "purchase"),
        # user 1, session B after a 1h gap: search only (no conversion)
        ev(3, 1, 5400, "search"),
        # user 2, one session; same-second tie at the start → lower
        # event_id wins the channel
        ev(5, 2, 0, "click"), ev(4, 2, 0, "view"), ev(6, 2, 10, "purchase"),
    ]
    out = session_attribution(
        rd.from_pandas(pd.DataFrame(rows)), gap_s=1800, n_buckets=4
    )
    got = {r.channel: (r.n_sessions, r.n_converted, r.conv_pm)
           for r in out.itertuples()}
    assert got == {
        "view": (2, 2, 1000),   # user1-A + user2 (eid 4 at same second)
        "search": (1, 0, 0),
    }


def test_rows_above_group_mean_planted(ray_session):
    """Exact mean boundary: a row EQUAL to its group mean is excluded
    (strict >, integer cross-multiplication), singleton groups never
    qualify."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import rows_above_group_mean

    df = pd.DataFrame(
        {
            "oid": np.arange(6, dtype=np.int64),
            "k": np.array([1, 1, 1, 2, 2, 3], np.int64),
            # group 1: mean 20 → only 30 qualifies (20 == mean excluded)
            # group 2: mean 7.5 → only 10 qualifies
            # group 3: singleton → never above its own mean
            "c": np.array([10, 20, 30, 5, 10, 99], np.int64),
        }
    )
    out = (
        rows_above_group_mean(
            rd.from_pandas(df), key_col="k", id_col="oid", cents_col="c",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )
    assert out.oid.tolist() == [2, 4]
    assert out.c.tolist() == [30, 10]


def test_hdr_quantiles_error_bound_vs_exact(ray_session):
    """HDR sketch guarantee: approx ≤ exact < approx·(1 + 2^-m) for
    values ≥ 2^m, equality below 2^m — verified against the exact path
    on a heavy-tailed sample."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hdr_quantiles, quantiles_exact

    rng = np.random.default_rng(23)
    vals = np.concatenate(
        [
            rng.integers(0, 64, 500),
            (rng.pareto(1.2, 4000) * 1000).astype(np.int64),
            np.array([(1 << 62) + 999, (1 << 52) + 7], np.int64),
        ]
    )
    df = pd.DataFrame({"c": vals.astype(np.int64)})
    for m in (4, 6, 8):
        approx = hdr_quantiles(
            rd.from_pandas(df), "c", m_bits=m, q_pm=[100, 500, 900, 990]
        ).set_index("q_pm")["approx"]
        exact = quantiles_exact(
            rd.from_pandas(df), "c", q_pm=[100, 500, 900, 990]
        ).set_index("q_pm")["c"]
        for q in (100, 500, 900, 990):
            a, e = int(approx[q]), int(exact[q])
            assert a <= e, (m, q, a, e)
            assert e < max(a + 1, a * (1 + 2.0 ** -m) + 1), (m, q, a, e)


def test_hdr_quantiles_merge_order_independent(ray_session):
    """The sketch must be bit-identical under different partitionings —
    the property KLL/t-digest lack and the reason the oracle can gate it."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import hdr_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"c": (rng.pareto(1.5, 3000) * 500).astype(np.int64)})
    outs = []
    for nparts in (1, 7, 32):
        ds = rd.from_pandas(df).repartition(nparts)
        outs.append(hdr_quantiles(ds, "c", m_bits=6).to_numpy().tolist())
    assert outs[0] == outs[1] == outs[2]


def test_hdr_bucket_roundtrip_extremes(ray_session):
    from sanskrit_ocr_ray.stages.relational import hdr_bucket_index, hdr_bucket_lo

    vals = np.array(
        [0, 1, 63, 64, 255, (1 << 40) + 12345, (1 << 62) + 999, (1 << 63) - 1],
        np.int64,
    )
    idx = hdr_bucket_index(vals, 6)
    lo = hdr_bucket_lo(idx, 6)
    assert (lo <= vals).all()
    big = idx >= 64
    h = idx[big] // 64 - 1
    assert ((vals[big] - lo[big]) < (np.int64(1) << np.minimum(h, 62))).all()
    assert (vals[~big] == lo[~big]).all()
    # monotone in value
    order = np.argsort(vals, kind="mergesort")
    assert (np.diff(idx[order]) >= 0).all()


def test_grouped_linreg_hand_computed(ray_session):
    """Slope/intercept ×1e6 (floored) against a tiny hand-checkable fit,
    plus: single-x groups emit no row, negative slopes floor toward -inf
    (the DuckDB-emulation edge), partition-independence."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import grouped_linreg

    df = pd.DataFrame(
        {
            "g": ["a"] * 3 + ["b"] * 3 + ["c"] * 2,
            "x": np.array([0, 1, 2, 0, 1, 2, 5, 5], np.int64),
            "y": np.array([1, 3, 5, 10, 7, 5, 9, 9], np.int64),
        }
    )
    for nparts in (1, 4):
        out = (
            grouped_linreg(rd.from_pandas(df).repartition(nparts), "g", "x", "y")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        # a: perfect fit y = 2x + 1 → slope 2.0, intercept 1.0
        # b: y = -2.5x + 9.833… → slope −2500000 (floored), intercept…
        assert out.g.tolist() == ["a", "b"]  # 'c' has one distinct x
        a = out[out.g == "a"].iloc[0]
        assert (a.slope_x1m, a.intercept_x1m) == (2_000_000, 1_000_000)
        b = out[out.g == "b"].iloc[0]
        n, sx, sy = 3, 3, 22
        sxy = 0 * 10 + 1 * 7 + 2 * 5
        sxx = 5
        den = n * sxx - sx * sx
        assert b.slope_x1m == 1_000_000 * (n * sxy - sx * sy) // den
        assert b.intercept_x1m == 1_000_000 * (sy * sxx - sx * sxy) // den
        assert b.slope_x1m < 0  # negative-slope floor path exercised


def test_hdr_quantiles_by_group_matches_single_group(ray_session):
    """Per-group results equal running the scalar sketch on each group's
    rows alone (merge-order independence per key)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import (
        hdr_quantiles,
        hdr_quantiles_by_group,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 3000),
            "c": (rng.pareto(1.3, 3000) * 800).astype(np.int64),
        }
    )
    grouped = (
        hdr_quantiles_by_group(rd.from_pandas(df).repartition(6), "g", "c", m_bits=6)
        .to_pandas()
        .sort_values(["g", "q_pm"])
        .reset_index(drop=True)
    )
    for g in ("x", "y", "z"):
        solo = hdr_quantiles(
            rd.from_pandas(df[df.g == g][["c"]]), "c", m_bits=6
        ).sort_values("q_pm")
        mine = grouped[grouped.g == g]
        assert mine["q_pm"].tolist() == solo["q_pm"].tolist()
        assert mine["approx"].tolist() == solo["approx"].tolist(), g


def test_skyline_planted_and_partition_independent(ray_session):
    """Planted Pareto front: dominated rows drop, ties/duplicates on the
    front all survive, result is independent of batch partitioning (the
    local-then-global two-phase must be exact by dominance transitivity)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import skyline

    df = pd.DataFrame(
        {
            "id": np.arange(8, dtype=np.int64),
            "size": np.array([10, 10, 8, 5, 5, 3, 10, 1], np.int64),
            "price": np.array([100, 100, 50, 20, 20, 20, 120, 5], np.int64),
        }
    )
    # front (max size, min price): (10,100)x2 [dups], (8,50), (5,20)x2, (1,5)
    # dominated: (3,20) by (5,20); (10,120) by (10,100)
    want = {(0, 10, 100), (1, 10, 100), (2, 8, 50), (3, 5, 20), (4, 5, 20), (7, 1, 5)}
    for nparts in (1, 5):
        out = skyline(
            rd.from_pandas(df).repartition(nparts),
            maximize=["size"],
            minimize=["price"],
            keep=["id"],
        ).to_pandas()
        got = set(zip(out.id, out.size_ if hasattr(out, "size_") else out["size"], out.price))
        assert got == want, (nparts, got)


def test_skyline_all_on_front(ray_session):
    """Degenerate anti-chain (every row on the front): nothing drops."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import skyline

    n = 200
    df = pd.DataFrame(
        {
            "a": np.arange(n, dtype=np.int64),
            "b": np.arange(n, dtype=np.int64)[::-1].copy(),
        }
    )
    out = skyline(rd.from_pandas(df).repartition(4), maximize=["a", "b"]).to_pandas()
    assert len(out) == n


def test_peak_concurrent_sessions_planted(ray_session):
    """Hand-built overlap pattern: three users with known session
    intervals; peak = 3 exactly at the triple-overlap instant; result is
    partition-independent and the inclusive-end boundary counts."""
    import ray.data as rd

    base = 1_700_000_000
    rows = []
    # u1: one session [0, 100]; u2: [50, 150]; u3: [100, 200] →
    # at t=100 all three active (inclusive ends) → peak 3
    for u, times in ((1, [0, 100]), (2, [50, 150]), (3, [100, 200])):
        for t in times:
            rows.append({"user_id": u, "ts": pd.Timestamp(base + t, unit="s")})
    # u1 second session far away (gap > 1800): alone → doesn't raise peak
    rows.append({"user_id": 1, "ts": pd.Timestamp(base + 10_000, unit="s")})
    from sanskrit_ocr_ray.stages.relational import peak_concurrent_sessions

    for nparts in (1, 4):
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(nparts)
        out = peak_concurrent_sessions(ds)
        assert out["peak"].tolist() == [3], nparts
    # with a tiny time bucket the cross-bucket prefix fold must agree
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = peak_concurrent_sessions(ds, t_bucket_s=60)
    assert out["peak"].tolist() == [3]


def test_kmv_set_ops_regions_sum_to_union(ray_session):
    """The three region estimates partition the union estimate (within
    integer-floor slack) and the small-union path is exact."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.sketch import kmv_set_ops

    rows = []
    for i in range(60):
        # text content disjoint across split sides for a planted check
        rows.append({"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(6))})
    out = kmv_set_ops(rd.from_pandas(pd.DataFrame(rows)), k=256)
    r = out.iloc[0]
    # union < k -> exact counts, and regions partition the union
    assert r.d_union_est == r.d_inter_est + r.d_a_only_est + r.d_b_only_est
    assert r.d_inter_est == 0  # per-doc-unique shingles cannot intersect


def test_funnel_depths_planted(ray_session):
    """Hand-built funnel: depths 0..3 all realized, ORDER matters (a
    purchase BEFORE the click must not count), ties on ts break by
    event_id, and partitioning cannot change the counts."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import funnel_depths

    base = pd.Timestamp(1_700_000_000, unit="s")

    def ev(eid, u, t, ty):
        return {"event_id": eid, "user_id": u, "ts": base + pd.Timedelta(seconds=t), "event_type": ty}

    rows = [
        # u1: full ordered funnel → depth 4
        ev(1, 1, 0, "signup"), ev(2, 1, 1, "view"), ev(3, 1, 2, "click"), ev(4, 1, 3, "purchase"),
        # u2: purchase BEFORE click → stops at depth 2 (signup, view)
        ev(5, 2, 0, "signup"), ev(6, 2, 1, "purchase"), ev(7, 2, 2, "view"),
        # u3: never signs up → depth 0
        ev(8, 3, 0, "view"), ev(9, 3, 1, "click"),
        # u4: signup only → depth 1
        ev(10, 4, 5, "signup"),
        # u5: same-ts tie — view at the SAME second as signup but larger
        # event_id counts (strictly-after in (ts, event_id) order) → depth 2
        ev(11, 5, 7, "signup"), ev(12, 5, 7, "view"),
    ]
    want = {0: 1, 1: 1, 2: 2, 4: 1}
    for nparts in (1, 4):
        out = funnel_depths(
            rd.from_pandas(pd.DataFrame(rows)).repartition(nparts),
            ["signup", "view", "click", "purchase"],
        )
        got = dict(zip(out.depth.tolist(), out.n_users.tolist()))
        assert got == want, (nparts, got)


def test_gini_by_group_hand_cases(ray_session):
    """Known Gini values: all-equal → 0; maximal concentration over n
    values → (n−1)/n; partition-independent; Σx=0 groups emit no row."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import gini_by_group

    df = pd.DataFrame(
        {
            "g": ["eq"] * 4 + ["conc"] * 4 + ["zero"] * 2,
            "v": np.array([5, 5, 5, 5, 0, 0, 0, 100, 0, 0], np.int64),
        }
    )
    for nparts in (1, 3):
        out = (
            gini_by_group(rd.from_pandas(df).repartition(nparts), "g", "v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert out.g.tolist() == ["conc", "eq"]  # 'zero' dropped (sum 0)
        conc = out[out.g == "conc"].iloc[0]
        assert conc.gini_x1m == 1_000_000 * 3 // 4  # (n-1)/n = 750000
        assert out[out.g == "eq"].iloc[0].gini_x1m == 0


def test_gini_by_group_bigint_and_negative_sum(ray_session):
    """The int64 fast path must hand off to Python bigints when
    n²·max|x| overflows, and a negative Σx must divide truncating
    toward zero (HUGEINT // semantics), not flooring."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import gini_by_group

    # big: values ~2^61 over n=4 rows → n²·max|x| ≈ 2^65 would wrap the
    # vectorized int64 accumulator; the exact answer is known in closed
    # form. neg: Σx < 0 so the denominator is negative.
    big = 2**61
    df = pd.DataFrame(
        {
            "g": ["big"] * 4 + ["neg"] * 3,
            "v": np.array([0, 0, 0, big, -7, -1, 1], np.int64),
        }
    )

    def expected(vals):
        xs = sorted(vals)
        n = len(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        den = n * sum(xs)
        a = 1_000_000 * num
        q, r = divmod(a, den)
        if r != 0 and (a < 0) != (den < 0):
            q += 1
        return q

    for nparts in (1, 3):
        out = (
            gini_by_group(rd.from_pandas(df).repartition(nparts), "g", "v")
            .to_pandas()
            .set_index("g")
        )
        assert int(out.loc["big", "gini_x1m"]) == expected([0, 0, 0, big])
        assert int(out.loc["big", "gini_x1m"]) == 750_000  # (n-1)/n exact
        got_neg = int(out.loc["neg", "gini_x1m"])
        assert got_neg == expected([-7, -1, 1])
        # floor division would give one less than truncation here
        a = 1_000_000 * sum(
            (2 * (i + 1) - 3 - 1) * x for i, x in enumerate(sorted([-7, -1, 1]))
        )
        assert got_neg != a // (3 * -7) or a % (3 * -7) == 0


def test_skyline_int64_exact_above_2_53(ray_session):
    """Criteria above 2^53 must not lose dominance decisions to a
    float64 cast: x and x+1 are distinct in int64 but collapse in
    float64."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import skyline

    base = 2**53
    df = pd.DataFrame(
        {
            "id": np.arange(3, dtype=np.int64),
            "a": np.array([base + 1, base, base + 1], np.int64),
            "b": np.array([10, 10, 9], np.int64),
        }
    )
    out = skyline(
        rd.from_pandas(df).repartition(2), maximize=["a", "b"], keep=["id"]
    ).to_pandas()
    # row0 (base+1, 10) strictly dominates row1 (base, 10) and row2
    # (base+1, 9); under float64 a-col ties and row1 would survive.
    assert sorted(out.id.tolist()) == [0]


def test_event_transition_matrix_planted(ray_session):
    """Hand-countable transitions: user 1 fires a->b->a, user 2 fires
    a->b; rows (a,b):2 p=1000, (b,a):1 p=1000; partition-invariant;
    ties in ts break by event_id."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import event_transition_matrix

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user, event_id, type, minute
        (1, 10, "a", 0), (1, 11, "b", 1), (1, 12, "a", 2),
        (2, 20, "a", 0), (2, 21, "b", 0),  # same ts → event_id order
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": [base + pd.Timedelta(minutes=r[3]) for r in rows],
        }
    )
    for parts in (1, 3):
        out = event_transition_matrix(rd.from_pandas(df).repartition(parts))
        got = {
            (r.from_type, r.to_type): (int(r.n), int(r.p_pm))
            for r in out.itertuples()
        }
        assert got == {
            ("a", "b"): (2, 1000),  # all transitions out of 'a' go to 'b'
            ("b", "a"): (1, 1000),  # the only transition out of 'b'
        }, (parts, got)


def test_rfm_segments_planted(ray_session):
    """Four hand-placed customers, n_tiles=2: recency/frequency/monetary
    halves are computable by hand; exact segment codes and counts;
    partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import rfm_segments

    base = pd.Timestamp("2024-01-01")
    rows = [
        # cust, day-offset, price
        (1, 0, 10.0), (1, 1, 10.0),      # freq 2, last d1, cents 2000
        (2, 5, 100.0),                   # freq 1, last d5, cents 10000
        (3, 9, 1.0), (3, 9, 1.0),        # freq 2, last d9, cents 200
        (4, 2, 50.0),                    # freq 1, last d2, cents 5000
    ]
    df = pd.DataFrame(
        {
            "o_custkey": [r[0] for r in rows],
            "o_orderdate": [base + pd.Timedelta(days=r[1]) for r in rows],
            "o_totalprice": [r[2] for r in rows],
        }
    )
    # global last = d9. recency days: c1=8, c2=4, c3=0, c4=7
    # ntile(2) ORDER BY (recency, cust): c3,c2 | c4,c1 → r: c3=1,c2=1,c4=2,c1=2
    # ntile(2) ORDER BY (freq, cust):    c2,c4 | c1,c3 → f: c2=1,c4=1,c1=2,c3=2
    # ntile(2) ORDER BY (cents, cust):   c3,c1 | c4,c2 → m: c3=1,c1=1,c4=2,c2=2
    want = {
        1: (2, 2, 1),  # cust1 → 221
        2: (1, 1, 2),  # cust2 → 112
        3: (1, 2, 1),  # cust3 → 121
        4: (2, 1, 2),  # cust4 → 212
    }
    segs = sorted(100 * r + 10 * f + m for r, f, m in want.values())
    for parts in (1, 3):
        out = (
            rfm_segments(rd.from_pandas(df).repartition(parts), n_tiles=2)
            .to_pandas()
            .sort_values("segment")
        )
        assert out.segment.tolist() == segs, (parts, out)
        assert out.n_customers.tolist() == [1, 1, 1, 1]


def test_join_cardinality_planted(ray_session):
    """Hand-countable: key 1 → 2×3 pairs, key 2 → 1×1, key 3 left-only,
    key 4 right-only; bigint-safe partials; partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import join_cardinality

    left = pd.DataFrame({"k": [1, 1, 2, 3]})
    right = pd.DataFrame({"k": [1, 1, 1, 2, 4]})
    for parts in (1, 3):
        out = join_cardinality(
            rd.from_pandas(left).repartition(parts),
            rd.from_pandas(right).repartition(parts),
            "k",
        )
        assert out.n_pairs.tolist() == [7]       # 2*3 + 1*1
        assert out.n_keys_both.tolist() == [2]
        assert out.max_key_pairs.tolist() == [6]


def test_reorder_gap_quantiles_planted(ray_session):
    """Planted gaps: cust 1 orders at days 0,10,10,40 → gaps 10,0,30;
    cust 2 orders once (no gap). Quantiles over {0,10,30} at the
    ceil-position definition; partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import reorder_gap_quantiles

    base = pd.Timestamp("2024-01-01")
    rows = [(1, 1, 0), (1, 2, 10), (1, 3, 10), (1, 4, 40), (2, 5, 7)]
    df = pd.DataFrame(
        {
            "o_custkey": [r[0] for r in rows],
            "o_orderkey": [r[1] for r in rows],
            "o_orderdate": [base + pd.Timedelta(days=r[2]) for r in rows],
        }
    )
    # sorted gaps [0, 10, 30]; ceil(q*3/1000): 250→1st(0), 500→2nd(10),
    # 750→3rd(30), 900→3rd, 990→3rd
    want = {250: 0, 500: 10, 750: 30, 900: 30, 990: 30}
    for parts in (1, 3):
        out = reorder_gap_quantiles(rd.from_pandas(df).repartition(parts))
        got = dict(zip(out.q_pm.tolist(), out.gap_days.tolist()))
        assert got == want, (parts, got)


def test_supplier_return_rates_planted(ray_session):
    """Planted flags: supplier 1 ships 4 items with 1 'R', supplier 2
    ships 2 with 2 'R' — exact per-mille; partition-invariant."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.relational import supplier_return_rates

    df = pd.DataFrame(
        {
            "l_suppkey": [1, 1, 1, 1, 2, 2],
            "l_returnflag": ["N", "R", "A", "N", "R", "R"],
        }
    )
    for parts in (1, 3):
        out = supplier_return_rates(
            rd.from_pandas(df).repartition(parts)
        ).to_pandas()
        got = {
            int(r.l_suppkey): (int(r.n_items), int(r.n_returned), int(r.return_pm))
            for r in out.itertuples()
        }
        assert got == {1: (4, 1, 250), 2: (2, 2, 1000)}, (parts, got)
