"""Reassembly: the engine's single mandatory shuffle (SURVEY.md §2.5 A4).

``groupby('doc_id').map_groups(rebuild)`` over the union of

- normalized text-span rows            (kind='text')
- media-span placeholder rows          (kind='media', text='')
- recognizer output pseudo-span rows   (kind='rec', offset=-1)

Within each group: join rec→media on media_ref (group-local, no second
shuffle — media_ref embeds doc_id, stages/recognize.py), sort real spans by
``offset`` (order comes from the key, never from storage/arrival order —
the list is stored shuffled for half the fixture docs), and emit one row
per document. Per-doc in-group sort only; there is NO global sort (O3).
"""

from __future__ import annotations

import pyarrow as pa

from .. import schema

#: OUT_DOCS plus lineage metric columns consumed by the checkpoint manifest.
OUT_WITH_METRICS = schema.OUT_DOCS.append(pa.field("n_spans", pa.int32())).append(
    pa.field("n_pixels", pa.int64())
)


def rebuild_bucket(df) -> pa.Table:
    """Many documents' rows (one doc-hash bucket) → OUT_WITH_METRICS rows.

    The scale-shape of reassembly: grouping per *document* would dispatch
    one Python call per doc (10^12 calls); instead the shuffle key is
    ``hash(doc_id) % B`` and this function rebuilds EVERY doc in the
    bucket with one stable sort + one tight row loop. All rows of a doc
    are guaranteed co-resident because the bucket key is a function of
    doc_id alone.
    """
    df = df.sort_values(["doc_id", "offset"], kind="mergesort")
    doc_ids = df["doc_id"].to_numpy()
    offsets = df["offset"].to_numpy()
    kinds = df["kind"].to_numpy()
    texts = df["text"].to_numpy()
    refs = df["media_ref"].to_numpy()
    pixels = df["n_pixels"].to_numpy()

    out_rows: list[dict] = []
    i, n = 0, len(df)
    while i < n:
        j = i
        rec_text: dict = {}
        n_px = 0
        spans: list[tuple] = []
        doc = doc_ids[i]
        while j < n and doc_ids[j] == doc:
            if kinds[j] == "rec":
                rec_text[refs[j]] = texts[j]
                n_px += int(pixels[j])
            else:
                spans.append((int(offsets[j]), kinds[j], texts[j], refs[j]))
            j += 1
        seq = []
        for _off, kind, text, ref in spans:  # already offset-sorted
            if kind == "media":
                # rec lookup (single-shuffle path) or the span's own text
                # (pre-joined two-shuffle path); "" when recognition missing
                seq.append(
                    {"kind": "media", "text": rec_text.get(ref, text), "media_ref": ref}
                )
            else:
                seq.append({"kind": "text", "text": text, "media_ref": ""})
        out_rows.append(
            {"doc_id": doc, "seq": seq, "n_spans": len(seq), "n_pixels": n_px}
        )
        i = j
    return pa.Table.from_pylist(out_rows, schema=OUT_WITH_METRICS)


def flatten_out(batch: pa.Table) -> pa.Table:
    """OUT_DOCS(+metrics) → OUT_FLAT rows (hash/compare-friendly)."""
    import pyarrow.compute as pc

    seq = batch["seq"]
    if isinstance(seq, pa.ChunkedArray):
        seq = seq.combine_chunks()
    parent = pc.list_parent_indices(seq)
    doc_ids = batch["doc_id"].take(parent)
    flat = pc.list_flatten(seq)
    # position within each doc's seq
    lengths = pc.list_value_length(seq).to_numpy(zero_copy_only=False)
    import numpy as np

    pos = np.concatenate([np.arange(n, dtype=np.int32) for n in lengths]) if len(lengths) else np.array([], dtype=np.int32)
    return pa.table(
        {
            "doc_id": doc_ids,
            "pos": pa.array(pos, type=pa.int32()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )
