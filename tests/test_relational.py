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
