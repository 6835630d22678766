"""E2E extraction: span-sequence equality vs golden, order-independence,
checkpoint/resume idempotence (SURVEY.md §5 items 4-5)."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _seq_tuples(seq):
    return [(d["kind"], d["text"], d["media_ref"]) for d in seq]


def _assert_equals_golden(out_df, fixture_dir):
    golden = pq.read_table(os.path.join(fixture_dir, "golden.parquet")).to_pandas()
    out_df = out_df.sort_values("doc_id").reset_index(drop=True)
    golden = golden.sort_values("doc_id").reset_index(drop=True)
    assert list(out_df.doc_id) == list(golden.doc_id)
    for i in range(len(golden)):
        assert _seq_tuples(out_df.seq[i]) == _seq_tuples(golden.seq[i]), golden.doc_id[i]


def test_extract_equals_golden(ray_session, fixture_dir):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_dataset

    docs = rd.read_parquet(f"{fixture_dir}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fixture_dir}/media.parquet")
    out = extract_dataset(docs, media).to_pandas()
    _assert_equals_golden(out, fixture_dir)


def test_extract_order_independent(ray_session, fixture_dir):
    """Shuffled input blocks → identical output (no order-dependence)."""
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_dataset

    docs = (
        rd.read_parquet(f"{fixture_dir}/docs.parquet")
        .drop_columns(["part"])
        .random_shuffle(seed=7)
    )
    media = rd.read_parquet(f"{fixture_dir}/media.parquet").random_shuffle(seed=13)
    out = extract_dataset(docs, media).to_pandas()
    _assert_equals_golden(out, fixture_dir)


def test_extract_flat_matches_seq(ray_session, fixture_dir):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_flat

    docs = rd.read_parquet(f"{fixture_dir}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fixture_dir}/media.parquet")
    flat = extract_flat(docs, media).to_pandas()
    golden = pq.read_table(os.path.join(fixture_dir, "golden.parquet")).to_pandas()
    n_spans = int(golden.seq.map(len).sum())
    assert len(flat) == n_spans
    # per-doc pos is dense 0..k-1
    for _doc, g in flat.groupby("doc_id"):
        assert sorted(g.pos) == list(range(len(g)))


def _read_parts(out_dir):
    parts = sorted(glob.glob(f"{out_dir}/part=*"))
    ts = [
        pq.read_table(p)
        for p in parts
        if any(f.endswith(".parquet") for f in os.listdir(p))
    ]
    return pa.concat_tables(ts) if ts else None


def test_run_extract_checkpoint_and_resume(ray_session, fixture_dir, tmp_path):
    from sanskrit_ocr_ray.pipelines.extract import run_extract
    from sanskrit_ocr_ray.state import manifest as mf

    out_dir = str(tmp_path / "out")
    man = run_extract(fixture_dir, out_dir, n_partitions=4, wave_size=2)
    assert len(man) == 4
    assert all(m["status"] == "done" for m in man)
    t1 = _read_parts(out_dir)
    ids1 = sorted(t1["doc_id"].to_pylist())

    # no-op resume: nothing pending → identical manifest
    man_again = run_extract(fixture_dir, out_dir, n_partitions=4, wave_size=2)
    assert [m["input_fingerprint"] for m in man_again] == [
        m["input_fingerprint"] for m in man
    ]

    # simulated crash: drop one committed partition, resume
    shutil.rmtree(f"{out_dir}/part=2")
    os.remove(mf.manifest_path(out_dir, 2))
    man2 = run_extract(fixture_dir, out_dir, n_partitions=4, wave_size=2)
    t2 = _read_parts(out_dir)
    ids2 = sorted(t2["doc_id"].to_pylist())
    assert ids1 == ids2  # no loss
    assert len(set(ids2)) == len(ids2)  # no double-writes
    assert [m["input_fingerprint"] for m in man2] == [
        m["input_fingerprint"] for m in man
    ]


def test_resume_with_crashed_wave_tmp_leftovers(ray_session, fixture_dir, tmp_path):
    """Partial _tmp output from a crashed wave must not leak duplicates."""
    import pyarrow.parquet as pqw

    from sanskrit_ocr_ray.pipelines.extract import run_extract
    from sanskrit_ocr_ray.state import manifest as mf

    out_dir = str(tmp_path / "out3")
    run_extract(fixture_dir, out_dir, n_partitions=4, wave_size=2)
    ids_before = sorted(_read_parts(out_dir)["doc_id"].to_pylist())

    # simulate a crash mid-wave: partition 1 uncommitted, with stale
    # partial output sitting in _tmp
    shutil.rmtree(f"{out_dir}/part=1")
    os.remove(mf.manifest_path(out_dir, 1))
    stale = os.path.join(out_dir, "_tmp", "part=1")
    os.makedirs(stale, exist_ok=True)
    pqw.write_table(
        pa.table(
            {
                "doc_id": ["doc-junk"],
                "seq": [[]],
                "n_spans": pa.array([0], type=pa.int32()),
                "n_pixels": pa.array([0], type=pa.int64()),
            }
        ),
        os.path.join(stale, "stale.parquet"),
    )

    run_extract(fixture_dir, out_dir, n_partitions=4, wave_size=2)
    ids_after = sorted(_read_parts(out_dir)["doc_id"].to_pylist())
    assert ids_after == ids_before  # no junk, no loss, no duplicates


def test_manifest_metrics_cover_all_docs(ray_session, fixture_dir, tmp_path):
    from sanskrit_ocr_ray.pipelines.extract import run_extract

    out_dir = str(tmp_path / "out2")
    man = run_extract(fixture_dir, out_dir, n_partitions=4, wave_size=4)
    golden = pq.read_table(os.path.join(fixture_dir, "golden.parquet"))
    assert sum(m["n_docs"] for m in man) == golden.num_rows
    n_spans = sum(len(s) for s in golden["seq"].to_pylist())
    assert sum(m["n_spans"] for m in man) == n_spans
    assert sum(m["n_pixels"] for m in man) > 0
