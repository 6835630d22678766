"""Incremental view maintenance: the refresh must fold only the delta
into the stored view, never re-reading the base table."""
import os

import numpy as np
import pandas as pd
import ray.data as rd

from sanskrit_ocr_ray.pipelines.ivm import materialize_agg, refresh_agg


def _events(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["event_type", "cents"]).astype(
            {"cents": np.int64}
        )
    )


def test_refresh_equals_full_recompute_without_base(ray_session, tmp_path):
    base_rows = [("a", 10), ("a", 20), ("b", 5)]
    delta_rows = [("a", 1), ("c", 7), ("c", 3)]  # 'c' exists only in delta
    view = materialize_agg(
        _events(base_rows), str(tmp_path / "view"),
        key_col="event_type", cents_col="cents", n_buckets=4,
    )
    # the base Dataset object is gone from scope entirely; refresh sees
    # ONLY the stored view directory plus the delta
    got = (
        refresh_agg(view, _events(delta_rows),
                    key_col="event_type", cents_col="cents", n_buckets=4)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    full = (
        pd.DataFrame(base_rows + delta_rows, columns=["event_type", "cents"])
        .groupby("event_type", as_index=False)
        .agg(n=("cents", "size"), sum_c=("cents", "sum"))
    )
    assert got.event_type.tolist() == full.event_type.tolist()
    assert got.n.tolist() == full.n.tolist()
    assert got.sum_c.tolist() == full.sum_c.tolist()


def test_materialize_is_idempotent_and_partitioned(ray_session, tmp_path):
    view = materialize_agg(
        _events([("x", 1), ("y", 2)]), str(tmp_path / "v2"),
        key_col="event_type", cents_col="cents", n_buckets=4,
    )
    n_first = len(os.listdir(view))
    view = materialize_agg(
        _events([("x", 1), ("y", 2)]), str(tmp_path / "v2"),
        key_col="event_type", cents_col="cents", n_buckets=4,
    )
    # clean rewrite, no append (file NAMES carry a per-run uuid)
    assert len(os.listdir(view)) == n_first

    got = (
        refresh_agg(view, _events([]),
                    key_col="event_type", cents_col="cents", n_buckets=4)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # empty delta: refresh is the identity on the stored view
    assert got.event_type.tolist() == ["x", "y"]
    assert got.n.tolist() == [1, 1]
    assert got.sum_c.tolist() == [1, 2]


def test_refresh_with_empty_base_view(ray_session, tmp_path):
    """A zero-row base writes no parquet files; refresh must fall back to
    delta-only instead of failing on read_parquet of a fileless dir."""
    view = materialize_agg(
        _events([]), str(tmp_path / "v_empty"),
        key_col="event_type", cents_col="cents", n_buckets=4,
    )
    got = (
        refresh_agg(view, _events([("a", 3), ("a", 4), ("b", 1)]),
                    key_col="event_type", cents_col="cents", n_buckets=4)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got.event_type.tolist() == ["a", "b"]
    assert got.n.tolist() == [2, 1]
    assert got.sum_c.tolist() == [7, 1]


def test_refresh_with_missing_view_dir(ray_session, tmp_path):
    got = (
        refresh_agg(str(tmp_path / "nonexistent"), _events([("z", 9)]),
                    key_col="event_type", cents_col="cents", n_buckets=4)
        .to_pandas()
    )
    assert got.event_type.tolist() == ["z"]
    assert got.sum_c.tolist() == [9]
