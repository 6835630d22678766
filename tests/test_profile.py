"""Table profiling + validation gate: planted nulls, numeric fold, rules."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def test_profile_table_nulls_and_numeric_fold(ray_session):
    """Numeric columns fold min/max numerically across blocks (not as
    strings — '9' vs '10'); null counts aggregate."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.profile import profile_table

    ds = rd.from_items(
        [{"v": 9, "s": "b"}, {"v": 10, "s": None}, {"v": None, "s": "a"}]
    ).repartition(3)  # one row per block → cross-block folding is exercised
    out = profile_table(ds, ["v", "s"]).set_index("col")
    assert out.loc["v", "n"] == 3 and out.loc["v", "n_null"] == 1
    assert out.loc["v", "min_s"] == "9" and out.loc["v", "max_s"] == "10"
    assert out.loc["s", "n_null"] == 1
    assert out.loc["s", "min_s"] == "a" and out.loc["s", "max_s"] == "b"


def test_validate_rows_counts_violations_and_nulls(ray_session):
    """A NULL predicate result counts as a violation (SQL IS NOT TRUE)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.profile import validate_rows

    ds = rd.from_items(
        [{"x": 5, "t": "ok"}, {"x": -1, "t": ""}, {"x": None, "t": "y"}]
    ).repartition(2)
    out = validate_rows(
        ds,
        {
            "x_nonneg": lambda t: pc.greater_equal(t["x"], 0),  # -1 and NULL
            "t_nonempty": lambda t: pc.greater(pc.utf8_length(t["t"]), 0),
        },
    ).set_index("rule")
    assert out.loc["x_nonneg", "n_violations"] == 2
    assert out.loc["t_nonempty", "n_violations"] == 1


def test_embedding_moments_exact_and_partition_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.profile import embedding_moments

    rng = np.random.default_rng(5)
    vecs = (rng.standard_normal((130, 8)) * 2).astype(np.float32)
    xq = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    df = pd.DataFrame({"embedding": [v.tolist() for v in vecs]})
    for parts in (1, 7):
        out = (
            embedding_moments(rd.from_pandas(df).repartition(parts), q=1000)
            .to_pandas()
            .sort_values("dim")
            .reset_index(drop=True)
        )
        assert out["n"].tolist() == [130] * 8
        assert out["sum_q"].tolist() == xq.sum(axis=0).tolist()
        assert out["sumsq_q"].tolist() == (xq * xq).sum(axis=0).tolist()


def test_embedding_outliers_flags_injected_outlier(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.profile import embedding_outliers

    rng = np.random.default_rng(61)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    vecs[7] = 40.0  # far from the centroid in every dimension
    df = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64),
         "embedding": [v.tolist() for v in vecs]}
    )
    for parts in (1, 6):
        out = (
            embedding_outliers(
                rd.from_pandas(df).repartition(parts), q=100, k2=9
            )
            .to_pandas()
            .set_index("vec_id")
            .sort_index()
        )
        assert out.loc[7, "is_outlier"] == 1
        assert out["is_outlier"].sum() == 1, parts
        # exact integer model: D(v) = sum_d (n*xq - S)^2
        xq = np.floor(vecs.astype(np.float64) * 100).astype(np.int64)
        S = xq.sum(axis=0)
        D = ((200 * xq - S[None, :]) ** 2).sum(axis=1)
        assert out["d2n"].to_numpy().tolist() == D.tolist()


def test_fk_orphans_counts(ray_session):
    """Orphan rows (child keys with no parent) count exactly, with
    multiplicities, across partitions and buckets."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.profile import fk_orphans

    child = rd.from_items(
        [{"fk": k} for k in [1, 1, 2, 3, 3, 3, 99, 99, 100]]
    ).repartition(4)
    parent = rd.from_items([{"pk": k} for k in [1, 2, 3, 4]]).repartition(2)
    out = fk_orphans(child, parent, child_key="fk", parent_key="pk", n_buckets=4)
    assert out.to_dict("records") == [
        {"n_child_rows": 9, "n_distinct_keys": 5, "n_orphan_rows": 3}
    ]


def test_embedding_covariance_exact_and_partition_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sanskrit_ocr_ray.stages.profile import embedding_covariance

    rng = np.random.default_rng(17)
    vecs = (rng.standard_normal((90, 6)) * 2).astype(np.float32)
    xq = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    gram = xq.T @ xq
    sums = xq.sum(axis=0)
    iu, ju = np.triu_indices(6)
    df = pd.DataFrame({"embedding": [v.tolist() for v in vecs]})
    for parts in (1, 5):
        out = (
            embedding_covariance(rd.from_pandas(df).repartition(parts), q=1000)
            .to_pandas()
            .sort_values(["dim_i", "dim_j"])
            .reset_index(drop=True)
        )
        assert out["n"].tolist() == [90] * len(iu)
        assert out["sum_i"].tolist() == sums[iu].tolist()
        assert out["sum_j"].tolist() == sums[ju].tolist()
        assert out["sum_ij"].tolist() == gram[iu, ju].tolist()
