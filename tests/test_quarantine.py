"""Poison-row handling: missing media payloads must not sink a batch or a
document (the per-row fix for the reference's whole-batch skip, M11)."""

import pyarrow as pa


def test_missing_media_payload_yields_empty_text(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray import schema
    from sanskrit_ocr_ray.pipelines.extract import extract_dataset
    from sanskrit_ocr_ray.synth import synth_doc

    d = next(
        d
        for d in (synth_doc(f"doc-{i:08d}") for i in range(32))
        if len(d["media"]) >= 2
    )
    docs = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]}], schema=schema.DOCS
    )
    # drop ONE media payload from the media table (dangling media_ref)
    media_rows = [
        {k: m[k] for k in ("media_ref", "width", "height", "pixels")}
        for m in d["media"][1:]
    ]
    media = pa.Table.from_pylist(media_rows, schema=schema.MEDIA)

    out = extract_dataset(
        rd.from_arrow(docs), rd.from_arrow(media), recognizer_concurrency=2
    ).to_pandas()
    assert len(out) == 1
    seq = out.seq[0]
    missing_ref = d["media"][0]["media_ref"]
    by_ref = {s["media_ref"]: s for s in seq if s["kind"] == "media"}
    # the dangling span survives with empty text; the others recognized
    assert by_ref[missing_ref]["text"] == ""
    others = [s for r, s in by_ref.items() if r != missing_ref]
    assert all(s["text"] for s in others)


def test_corrupt_page_does_not_crash_batch(ray_session):
    """A page of pure noise decodes to (possibly empty) text, never raises."""
    import numpy as np
    import ray.data as rd

    from sanskrit_ocr_ray.stages.image import binarize_deskew_batch
    from sanskrit_ocr_ray.stages.recognize import GlyphRecognizer

    rng = np.random.default_rng(0)
    junk = rng.integers(0, 256, size=320 * 400, dtype=np.uint8).tobytes()
    t = pa.Table.from_pylist(
        [{"media_ref": "x/junk", "width": 400, "height": 320, "pixels": junk}]
    )
    out = (
        rd.from_arrow(t)
        .map_batches(binarize_deskew_batch, batch_format="pyarrow")
        .map_batches(GlyphRecognizer, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert len(out) == 1  # row survived; text content unspecified


def test_quarantine_summary_counts_planted_failures(ray_session):
    """quarantine_summary must fold the per-row error column into exact
    (error, n) counts: 3 unsupported-codec rows + 1 corrupt PNG + 2
    clean raw8 rows → two error classes with counts (3, 1)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.multimodal import (
        FeatureExtractor,
        quarantine_summary,
    )

    rows = []
    for i in range(3):
        rows.append(("video/x-test", b"\x00" * 16))  # unsupported codec
    rows.append(("image/png", b"not-a-png"))  # corrupt payload
    for i in range(2):
        rows.append(("image/raw8", bytes(range(16))))  # decodes fine
    t = pa.table(
        {
            "media_ref": [f"m{i}" for i in range(len(rows))],
            "media_type": [r[0] for r in rows],
            "width": pa.array([4] * len(rows), pa.int32()),
            "height": pa.array([4] * len(rows), pa.int32()),
            "sample_rate": pa.array([0] * len(rows), pa.int32()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    feat = rd.from_arrow(t).map_batches(
        FeatureExtractor, batch_format="pyarrow", batch_size=2, concurrency=2
    )
    out = quarantine_summary(feat)
    got = dict(zip(out["error"], out["n"]))
    assert got.pop("unknown media_type 'video/x-test'") == 3
    assert len(got) == 1 and next(iter(got.values())) == 1  # the corrupt PNG
    # a clean dataset reports an EMPTY summary, not a zero row
    clean = rd.from_arrow(t.slice(4)).map_batches(
        FeatureExtractor, batch_format="pyarrow", concurrency=1
    )
    assert len(quarantine_summary(clean)) == 0


def test_manifest_records_n_quarantined(tmp_path):
    """commit_partition must sum an optional n_quarantined lineage
    column into the manifest record (0 when the column is absent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sanskrit_ocr_ray.state import manifest as mf

    out = str(tmp_path / "out")
    tmp = str(tmp_path / "out" / "_tmp" / "part=0")
    import os

    os.makedirs(tmp)
    pq.write_table(
        pa.table(
            {
                "doc_id": ["a", "b"],
                "n_spans": pa.array([2, 3], pa.int32()),
                "n_pixels": pa.array([10, 20], pa.int64()),
                "n_quarantined": pa.array([1, 4], pa.int64()),
            }
        ),
        os.path.join(tmp, "x.parquet"),
    )
    rec = mf.commit_partition(out, 0, tmp, 1.0)
    assert rec["n_quarantined"] == 5
    # column absent → metric present and zero
    tmp2 = str(tmp_path / "out" / "_tmp" / "part=1")
    os.makedirs(tmp2)
    pq.write_table(
        pa.table(
            {
                "doc_id": ["c"],
                "n_spans": pa.array([1], pa.int32()),
                "n_pixels": pa.array([5], pa.int64()),
            }
        ),
        os.path.join(tmp2, "y.parquet"),
    )
    rec2 = mf.commit_partition(out, 1, tmp2, 1.0)
    assert rec2["n_quarantined"] == 0
