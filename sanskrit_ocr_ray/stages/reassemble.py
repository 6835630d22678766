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
    bucket fully vectorized — one stable sort, change-point doc
    boundaries, a hash-merge rec→media text attachment, and one
    ``pa.ListArray.from_arrays`` to build every ``seq`` at once. No
    Python executes per row or per document.
    """
    import numpy as np
    import pandas as pd

    if len(df) == 0:
        return OUT_WITH_METRICS.empty_table()
    df = df.sort_values(["doc_id", "offset"], kind="mergesort")
    doc_ids = df["doc_id"].to_numpy()
    kinds = df["kind"].to_numpy()
    texts = df["text"].to_numpy()
    refs = df["media_ref"].to_numpy()
    pixels = df["n_pixels"].to_numpy()

    # doc boundaries = change points in the sorted doc_id column
    n = len(doc_ids)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = doc_ids[1:] != doc_ids[:-1]
    doc_idx = np.cumsum(change) - 1  # 0-based doc ordinal per row
    n_docs = int(doc_idx[-1]) + 1
    uniq_docs = doc_ids[change]

    rec_mask = kinds == "rec"
    # per-doc pixel totals (lineage metric) — exact int64 scatter-add
    n_px = np.zeros(n_docs, dtype=np.int64)
    if rec_mask.any():
        np.add.at(n_px, doc_idx[rec_mask], pixels[rec_mask].astype(np.int64))

    span_mask = ~rec_mask
    s_doc = doc_idx[span_mask]
    s_text = texts[span_mask]
    s_ref = refs[span_mask]
    is_media = kinds[span_mask] == "media"

    # rec→media text attachment: media_ref is globally unique, so the
    # group-local dict lookup of the old row loop is equivalent to one
    # vectorized hash merge (single-shuffle path); where recognition is
    # missing, fall back to the span's own text (pre-joined two-shuffle
    # path carries it; otherwise it is "")
    if rec_mask.any() and is_media.any():
        rec_lookup = pd.Series(texts[rec_mask], index=refs[rec_mask])
        if not rec_lookup.index.is_unique:
            rec_lookup = rec_lookup[~rec_lookup.index.duplicated(keep="last")]
        att = rec_lookup.reindex(s_ref[is_media]).to_numpy()
        s_text = s_text.copy()
        s_text[is_media] = np.where(pd.isna(att), s_text[is_media], att)
    out_kind = np.where(is_media, "media", "text")
    out_ref = np.where(is_media, s_ref, "")

    # per-doc span counts → list offsets (docs with only rec rows get [])
    counts = np.bincount(s_doc, minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = pa.StructArray.from_arrays(
        [
            pa.array(out_kind, type=pa.string()),
            pa.array(s_text, type=pa.string()),
            pa.array(out_ref, type=pa.string()),
        ],
        fields=list(schema.OUT_SPAN_STRUCT),
    )
    seq = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32), type=pa.int32()), flat)
    return pa.table(
        {
            "doc_id": pa.array(uniq_docs, type=pa.string()),
            "seq": seq,
            "n_spans": pa.array(counts.astype(np.int32), type=pa.int32()),
            "n_pixels": pa.array(n_px, type=pa.int64()),
        },
        schema=OUT_WITH_METRICS,
    )


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
