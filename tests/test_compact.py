"""Partition compaction: deterministic layout, durability, idempotence."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _mk(n=90, parts=4, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": [f"doc-{i:05d}" for i in range(n)],
            "payload": rng.integers(0, 1000, n),
            "part": rng.integers(0, parts, n),
        }
    )


def test_compact_table_layout_and_integrity(ray_session, tmp_path):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.compact import compact_table

    df = _mk()
    out = str(tmp_path / "compacted")
    stats = (
        compact_table(
            rd.from_pandas(df).repartition(5), out, target_rows=8
        )
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    want = df.groupby("part").size()
    assert stats["n_rows"].tolist() == want.tolist()
    assert stats["n_files"].tolist() == [(n + 7) // 8 for n in want]
    # files on disk match the reported layout; re-read equals the input
    back = []
    for pv in want.index:
        files = sorted(glob.glob(os.path.join(out, f"part={pv}", "compact-*")))
        assert len(files) == (want[pv] + 7) // 8
        for f in files:
            t = pq.read_table(f)
            assert t.num_rows <= 8
            back.append(t.to_pandas())
    merged = pd.concat(back, ignore_index=True).sort_values("doc_id")
    orig = df.sort_values("doc_id")
    assert merged["doc_id"].tolist() == orig["doc_id"].tolist()
    assert merged["payload"].tolist() == orig["payload"].tolist()


def test_compact_table_idempotent_and_cleans_stale(ray_session, tmp_path):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.compact import compact_table

    df = _mk(n=40, parts=2, seed=4)
    out = str(tmp_path / "c2")
    s1 = compact_table(rd.from_pandas(df), out, target_rows=64).to_pandas()
    # plant a stale file from a hypothetical earlier, more-fragmented run
    stale = os.path.join(out, "part=0", "compact-99999.parquet")
    pq.write_table(pq.read_table(glob.glob(out + "/part=0/*")[0]), stale)
    s2 = compact_table(rd.from_pandas(df), out, target_rows=64).to_pandas()
    a = s1.sort_values("part").reset_index(drop=True)
    b = s2.sort_values("part").reset_index(drop=True)
    assert a.equals(b)
    assert not os.path.exists(stale)
    assert s2.sort_values("part")["n_files"].tolist() == [1, 1]
