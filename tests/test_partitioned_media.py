"""Co-partitioned media layout: resume reads only pending partitions."""

import glob
import os

import pyarrow.parquet as pq


def test_ray_fixture_partitioned_layout_and_extract(ray_session, tmp_path):
    from sanskrit_ocr_ray.pipelines.extract import run_extract
    from sanskrit_ocr_ray.synth import write_fixture_ray

    fx = str(tmp_path / "fxray")
    write_fixture_ray(fx, 16, seed=42, n_partitions=4)
    # media written as one dir per hash partition
    parts = sorted(glob.glob(os.path.join(fx, "media", "part=*")))
    assert parts, "expected media/part=K directories"

    out = str(tmp_path / "out")
    man = run_extract(fx, out, n_partitions=4, wave_size=2)
    assert sum(m["n_docs"] for m in man) > 0

    # output equals golden doc ids
    golden = pq.read_table(os.path.join(fx, "golden")).to_pandas()
    got = []
    for p in sorted(glob.glob(f"{out}/part=*")):
        if any(f.endswith(".parquet") for f in os.listdir(p)):
            got += pq.read_table(p, columns=["doc_id"])["doc_id"].to_pylist()
    assert sorted(got) == sorted(golden.doc_id)


def test_ray_fixture_matches_local_fixture(ray_session, tmp_path):
    """Distributed synthesis ≡ in-process synthesis (determinism across
    generation paths/parallelism — the order-independence contract)."""
    import pandas as pd

    from sanskrit_ocr_ray.synth import synth_tables, write_fixture_ray

    fx = str(tmp_path / "fx2")
    write_fixture_ray(fx, 12, seed=42, n_partitions=4)
    ray_docs = (
        pq.read_table(os.path.join(fx, "docs")).to_pandas().sort_values("doc_id")
    )
    local_docs, *_ = synth_tables(12, seed=42, n_partitions=4)
    local_docs = local_docs.to_pandas().sort_values("doc_id")
    assert list(ray_docs.doc_id) == list(local_docs.doc_id)
    for a, b in zip(ray_docs.spans, local_docs.spans):
        assert [tuple(s.values()) for s in a] == [tuple(s.values()) for s in b]
