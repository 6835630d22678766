"""Recognizer stage: stateful actor-pool UDF (the T1 archetype).

The reference's model stage loads 27B weights once and is called per batch
(translate_bookcorpus.py:119-128,139-146); here the "model" is the glyph
codebook, loaded once per actor in ``__init__`` and applied per batch in
``__call__`` — the class interface is model-shaped (a CRNN/CTC recognizer
drops into the same slot). Use with::

    ds.map_batches(GlyphRecognizer, concurrency=(1, N), batch_size=B,
                   batch_format="pyarrow", num_cpus=1)

Output rows are *small* (media_ref, text) — pixel payloads never survive
past this stage, so nothing heavy ever reaches the reassembly shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..glyphs import GlyphCodebook
from ..stages.image import decode_page, unpack_ink
from ..stages.normalize import normalize_devanagari


class GlyphRecognizer:
    """Decode binarized+deskewed pages to normalized text."""

    def __init__(self) -> None:
        # once per actor: build the codebook ("load the model weights")
        self.codebook = GlyphCodebook()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"]
        widths = batch["width"].to_numpy()
        heights = batch["height"].to_numpy()
        inks = batch["ink"].to_pylist()
        texts = np.empty(len(inks), dtype=object)
        pixels = np.empty(len(inks), dtype=np.int64)
        for i, blob in enumerate(inks):
            w, h = int(widths[i]), int(heights[i])
            ink = unpack_ink(blob, w, h)
            texts[i] = decode_page(ink, self.codebook)
            pixels[i] = w * h
        # post-OCR normalization (NFC + block filter) — same kernel as text spans
        texts = normalize_devanagari(texts)
        return pa.table(
            {
                "media_ref": refs,
                "text": pa.array(list(texts), type=pa.string()),
                "n_pixels": pa.array(pixels, type=pa.int64()),
            }
        )


def rec_to_span_rows(batch: pa.Table, doc_id_from_ref=None) -> pa.Table:
    """(media_ref, text, n_pixels) → pseudo-span rows joinable by doc_id.

    Relies on the partitioning convention that ``media_ref`` embeds its
    document id as the prefix before '/' (FIXTURES.md §1) — this is what
    lets recognition results reach reassembly with a SINGLE shuffle on
    doc_id instead of a media_ref join followed by a doc_id shuffle. If a
    corpus breaks the convention, pass ``doc_id_from_ref`` or fall back to
    the two-shuffle path in pipelines/extract.py.
    """
    refs = batch["media_ref"]
    if doc_id_from_ref is None:
        import pyarrow.compute as pc

        # vectorized prefix-before-'/' (== r.split('/', 1)[0])
        doc_ids = pc.list_element(pc.split_pattern(refs, "/", max_splits=1), 0)
    else:
        doc_ids = pa.array(
            [doc_id_from_ref(r) for r in refs.to_pylist()], type=pa.string()
        )
    n = batch.num_rows
    return pa.table(
        {
            "doc_id": doc_ids,
            "offset": pa.array([-1] * n, type=pa.int32()),
            "kind": pa.array(["rec"] * n, type=pa.string()),
            "text": batch["text"],
            "media_ref": batch["media_ref"],
            "n_pixels": batch["n_pixels"],
        }
    )
