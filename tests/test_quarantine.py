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
