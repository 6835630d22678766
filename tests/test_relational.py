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
