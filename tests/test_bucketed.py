"""Bucketed storage layout: lossless round-trip, co-partitioned
zero-shuffle join parity, idempotent rewrite, empty buckets."""
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from sanskrit_ocr_ray.pipelines.bucketed import bucketed_join, write_bucketed
from sanskrit_ocr_ray.util import typed_empty


def _mk(tmp, name, df):
    path = os.path.join(tmp, name)
    return write_bucketed(rd.from_pandas(df), path, key=df.columns[0], n_buckets=8)


def test_bucketed_join_matches_pandas(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    cust = pd.DataFrame(
        {"ck": np.arange(100, dtype=np.int64),
         "seg": [f"s{i % 3}" for i in range(100)]}
    )
    orders = pd.DataFrame(
        {"ok": rng.integers(0, 70, 400).astype(np.int64),
         "val": rng.integers(1, 1000, 400).astype(np.int64)}
    )
    da = _mk(str(tmp_path), "cust", cust)
    db = _mk(str(tmp_path), "orders", orders)
    got = (
        bucketed_join(da, db, left_key="ck", right_key="ok", n_buckets=8)
        .to_pandas()
        .sort_values(["ck", "val"])
        .reset_index(drop=True)
    )
    want = (
        cust.merge(orders, left_on="ck", right_on="ok", how="inner")
        .sort_values(["ck", "val"])
        .reset_index(drop=True)
    )
    assert got[["ck", "seg", "ok", "val"]].equals(want[["ck", "seg", "ok", "val"]])


def test_bucket_dirs_hold_only_their_keys(ray_session, tmp_path):
    df = pd.DataFrame({"k": np.arange(64, dtype=np.int64), "v": np.arange(64)})
    root = _mk(str(tmp_path), "t", df.rename(columns={"k": "k", "v": "v"}))
    for b in range(8):
        p = os.path.join(root, f"__bucket={b}")
        if os.path.isdir(p):
            keys = pq.read_table(p)["k"].to_numpy()
            assert (keys % 8 == b).all()


def test_bucketed_join_aggregate_inside_bucket(ray_session, tmp_path):
    cust = pd.DataFrame({"ck": np.array([1, 2, 3], np.int64),
                         "seg": ["a", "b", "a"]})
    orders = pd.DataFrame({"ok": np.array([1, 1, 2, 9], np.int64),
                           "val": np.array([10, 20, 5, 7], np.int64)})
    da = _mk(str(tmp_path), "c2", cust)
    db = _mk(str(tmp_path), "o2", orders)

    def combine(m):
        g = m.groupby(["ck", "seg"], as_index=False).agg(
            n=("ok", "size"), s=("val", "sum")
        )
        return g.astype({"n": np.int64, "s": np.int64})

    got = (
        bucketed_join(
            da, db, left_key="ck", right_key="ok", n_buckets=8,
            combine=combine,
            combine_empty=typed_empty(ck=np.int64, seg=object, n=np.int64, s=np.int64),
        )
        .to_pandas()
        .sort_values("ck")
        .reset_index(drop=True)
    )
    # customer 3 has no orders (inner join), order key 9 has no customer
    assert got.ck.tolist() == [1, 2]
    assert got.n.tolist() == [2, 1]
    assert got.s.tolist() == [30, 5]


def test_write_bucketed_idempotent(ray_session, tmp_path):
    df = pd.DataFrame({"k": np.array([0, 1, 2], np.int64)})
    root = _mk(str(tmp_path), "idem", df)
    n_before = sum(len(fs) for _, _, fs in os.walk(root))
    root = _mk(str(tmp_path), "idem", df)  # rewrite cleans first
    n_after = sum(len(fs) for _, _, fs in os.walk(root))
    assert n_before == n_after
    total = sum(
        pq.read_table(os.path.join(root, d)).num_rows
        for d in os.listdir(root)
        if d.startswith("__bucket=")
    )
    assert total == 3


def test_sort_within_bucket_clustered_write(ray_session, tmp_path):
    """DISTRIBUTE BY + SORT BY: every bucket file holds its keys in
    sorted order (streamable merge-join / binary-search contract) while
    join results stay identical to the unsorted layout."""
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"k": rng.permutation(np.arange(200)).astype(np.int64),
         "v": rng.integers(0, 100, 200).astype(np.int64)}
    )
    root = write_bucketed(
        rd.from_pandas(df).repartition(4),
        str(tmp_path / "sorted"), key="k", n_buckets=8,
        sort_within_bucket=True,
    )
    for d in os.listdir(root):
        if not d.startswith("__bucket="):
            continue
        keys = pq.read_table(os.path.join(root, d))["k"].to_numpy()
        assert (np.diff(keys) >= 0).all(), d
        assert (keys % 8 == int(d.split("=")[1])).all()
    # join parity vs the unsorted layout
    other = pd.DataFrame({"ok": np.arange(0, 200, 3).astype(np.int64)})
    db = write_bucketed(rd.from_pandas(other), str(tmp_path / "probe"),
                        key="ok", n_buckets=8)
    got = (
        bucketed_join(root, db, left_key="k", right_key="ok", n_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.merge(other, left_on="k", right_on="ok")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got[["k", "v"]].equals(want[["k", "v"]])


def test_negative_keys_copartition_with_hash_join_buckets(ray_session, tmp_path):
    """write_bucketed's bucket function must equal hash_join's single-
    int-key function (uint64 cast BEFORE the modulo) so persisted layouts
    stay co-partitioned with in-flight shuffles for negative keys too."""
    keys = np.array([-17, -8, -1, 0, 1, 7, 23], np.int64)
    df = pd.DataFrame({"k": keys, "v": np.arange(len(keys), dtype=np.int64)})
    root = _mk(str(tmp_path), "neg", df)
    expect = (keys.astype(np.uint64) % np.uint64(8)).astype(int)
    seen = {}
    for b in range(8):
        p = os.path.join(root, f"__bucket={b}")
        if os.path.isdir(p):
            for k in pq.read_table(p)["k"].to_numpy():
                seen[int(k)] = b
    assert {int(k): int(e) for k, e in zip(keys, expect)} == seen
    # and the layout still round-trips losslessly through bucketed_join
    got = (
        bucketed_join(root, root, left_key="k", right_key="k", n_buckets=8)
        .to_pandas()
    )
    assert len(got) == len(keys)
