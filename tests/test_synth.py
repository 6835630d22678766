"""Synthesizer: determinism, schema conformance, skew shape."""

import pyarrow as pa

from sanskrit_ocr_ray import schema
from sanskrit_ocr_ray.synth import synth_doc, synth_tables


def test_synth_doc_deterministic():
    a = synth_doc("doc-00000005")
    b = synth_doc("doc-00000005")
    assert a["spans"] == b["spans"]
    assert a["golden"] == b["golden"]
    assert [m["pixels"] for m in a["media"]] == [m["pixels"] for m in b["media"]]


def test_synth_doc_seed_sensitivity():
    a = synth_doc("doc-00000005", seed=42)
    b = synth_doc("doc-00000005", seed=43)
    assert a["spans"] != b["spans"]


def test_synth_tables_schemas():
    docs, media, truth, golden = synth_tables(12)
    assert docs.drop_columns(["part"]).schema.equals(schema.DOCS)
    assert media.schema.equals(schema.MEDIA)
    assert truth.schema.equals(schema.MEDIA_TRUTH)
    assert golden.schema.equals(schema.OUT_DOCS)
    # media refs resolve
    refs = {
        s["media_ref"]
        for spans in docs["spans"].to_pylist()
        for s in spans
        if s["kind"] == "media"
    }
    assert refs == set(media["media_ref"].to_pylist())


def test_offsets_strictly_increasing_and_sometimes_shuffled():
    docs, *_ = synth_tables(40)
    shuffled = 0
    for spans in docs["spans"].to_pylist():
        offs = [s["offset"] for s in spans]
        assert sorted(offs) == list(range(len(offs)))
        if offs != sorted(offs):
            shuffled += 1
    assert shuffled > 0  # storage order must not be relied upon


def test_fat_doc_skew_exists():
    docs, *_ = synth_tables(80)
    span_counts = [len(s) for s in docs["spans"].to_pylist()]
    assert max(span_counts) >= 8  # heavy tail present (skew exercise)
