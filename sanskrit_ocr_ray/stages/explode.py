"""Explode interleaved documents to flat span rows (pre-shuffle skew fix).

Docs with many media spans are the skew hazard (FIXTURES.md: 10% "fat" docs
with ≥6 pages): exploding to one row per span *before* the expensive
preprocessing/recognition stages spreads one fat doc over many tasks
(SURVEY.md §4 "Skew / stragglers"). Fully vectorized via Arrow list-column
kernels — no Python loop over rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.normalize import normalize_column


def explode_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) → flat rows (doc_id, offset, kind, text, media_ref)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    doc_ids = batch["doc_id"].take(parent)
    flat = pc.list_flatten(spans)
    return pa.table(
        {
            "doc_id": doc_ids,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )


def explode_normalize_batch(batch: pa.Table) -> pa.Table:
    """Explode + normalize text spans + drop empty text spans.

    Media spans pass through untouched (their text arrives later from the
    recognizer); text spans get the M1+NFC normalizer and the M2
    empty-after-clean filter (h5_to_parquet.py:17-21,41-43 semantics).
    """
    rows = explode_batch(batch)
    is_text = pc.equal(rows["kind"], "text")
    text_rows = normalize_column(rows.filter(is_text), "text", drop_empty=True)
    media_rows = rows.filter(pc.invert(is_text))
    out = pa.concat_tables([text_rows, media_rows])
    # schema-align with recognizer pseudo-span rows (stages/recognize.py)
    return out.append_column(
        "n_pixels", pa.array([0] * out.num_rows, type=pa.int64())
    )
