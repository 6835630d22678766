"""Frozen Arrow schemas for every logical table in the engine.

One explicit ``pyarrow.Schema`` per table, validated at read and write.
The reference infers Parquet schema from the first written chunk
(``datagen/h5_to_parquet.py:65-66``) — a drift bug class we do not carry
forward (SURVEY.md §1 "Schema system").

The ``DOCS`` schema is verbatim the target contract's ``input_hint``:
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset:int32>>)``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),        # "text" | "media"
        ("text", pa.string()),        # payload for text spans, "" for media
        ("media_ref", pa.string()),   # FK into media table, "" for text
        ("offset", pa.int32()),       # position of the span within the doc
    ]
)

#: Pipeline input: interleaved text+media documents.
DOCS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

#: Page-image payload store (columnar replacement for the reference's
#: PNG-files-on-disk indirection, generate_dataset.py:36-41).
MEDIA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("pixels", pa.binary()),          # row-major uint8 grayscale, w*h bytes
    ]
)

#: Generation-time ground truth (synth only; never pipeline input).
MEDIA_TRUTH = pa.schema(
    [
        ("media_ref", pa.string()),
        ("truth_text", pa.string()),
        ("degradations", pa.list_(pa.string())),
    ]
)

OUT_SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

#: Extractor output: per-document reassembled span sequence, ascending offset.
OUT_DOCS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq", pa.list_(OUT_SPAN_STRUCT)),
    ]
)

#: Flat variant of OUT_DOCS (one row per surviving span) — hash/compare friendly.
OUT_FLAT = pa.schema(
    [
        ("doc_id", pa.string()),
        ("pos", pa.int32()),          # 0-based position in the reassembled seq
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

#: Intermediate: one row per span after explode (SURVEY.md §7.1 step 7).
SPAN_ROWS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

#: Per-partition checkpoint/lineage record (FIXTURES.md §5).
MANIFEST = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_pixels", pa.int64()),
        ("wall_seconds", pa.float64()),
        ("status", pa.string()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, *, where: str = "") -> pa.Table:
    """Assert ``table`` matches ``schema`` (names + types, order-sensitive).

    Casts when the mismatch is lossless (e.g. large_string vs string from a
    reader), raises otherwise.
    """
    if table.schema.equals(schema):
        return table
    try:
        return table.select(schema.names).cast(schema)
    except Exception as exc:  # noqa: BLE001 - re-raise with context
        raise ValueError(
            f"schema mismatch{' at ' + where if where else ''}: "
            f"got {table.schema}, want {schema}"
        ) from exc
