"""Text-span normalization: the engine's core text transform.

Reference semantics (datagen/h5_to_parquet.py:17-21): precompiled regex
deletes every character outside ``[ऀ-ॿ ]`` (Devanagari block U+0900–U+097F
plus ASCII space), then ``.strip()``; rows empty after cleaning are dropped
(h5_to_parquet.py:41-43). The engine adds Unicode NFC (north-star
"post-OCR sandhi-aware Devanagari normalization") — NFC never strips
viramas (U+094D) or splits conjuncts; the keep-class already retains the
whole block, so conjunct sequences survive intact.

The keep-class is configurable (``DEVANAGARI`` is the default profile) so
the same stage normalizes any corpus; the DuckDB oracle for the driver's
correctness gate uses the equivalent ``regexp_replace + nfc_normalize +
trim`` expression.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: keep-class regex bodies (characters to KEEP); everything else is deleted.
DEVANAGARI = "ऀ-ॿ "
ASCII_LOWER = "a-z "


def make_normalizer(
    keep_class: str = DEVANAGARI,
    *,
    nfc: bool = True,
    lower: bool = False,
    max_chars: int | None = None,
):
    """Build a vectorized normalizer: numpy array of str → numpy array of str.

    Order: [lowercase] → delete chars outside ``keep_class`` → NFC → strip
    → [truncate to ``max_chars``]. ``max_chars`` is the per-span length
    knob (the reference truncates model inputs,
    translate_bookcorpus.py:124,135 — M12). (NFC after filtering matches
    composing the *kept* sequence; the filter is per-codepoint so the
    order only matters for chars the class drops.)
    """
    pat = re.compile(f"[^{keep_class}]")

    def normalize_many(texts: np.ndarray) -> np.ndarray:
        out = np.empty(len(texts), dtype=object)
        sub = pat.sub
        norm = unicodedata.normalize
        for i, t in enumerate(texts):
            if t is None:
                out[i] = ""
                continue
            if lower:
                t = t.lower()
            t = sub("", t)
            if nfc:
                t = norm("NFC", t)
            t = t.strip()
            if max_chars is not None and len(t) > max_chars:
                t = t[:max_chars].rstrip()
            out[i] = t
        return out

    return normalize_many


# module-level default (compiled once per worker process import)
normalize_devanagari = make_normalizer(DEVANAGARI)


def strip_boilerplate(
    ds,
    *,
    column: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    n_buckets: int = 256,
):
    """Drop rows whose ``column`` value recurs across ≥ ``min_docs`` docs.

    The north-star "boilerplate stripping for text-kind spans": repeated
    headers/footers/navigation recur verbatim across documents, and
    exact-text document frequency is the classic first-pass filter.

    Two streaming passes: (1) doc-frequency per distinct text via the
    bounded-bucket aggregate (text is a huge-cardinality key — see
    stages/dedup.bucketed_aggregate); texts over threshold are collected
    (boilerplate is by definition a small set) and broadcast with
    ``ray.put``; (2) a vectorized filter pass. No full materialization.
    """
    import pandas as pd
    import ray

    from ..util import typed_empty
    from .dedup import bucketed_aggregate

    def docfreq(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(column, as_index=False)[id_col].nunique()
        out = out.rename(columns={id_col: "df"})
        return out[out["df"] >= min_docs]

    hot = bucketed_aggregate(
        ds.select_columns([id_col, column]),
        [column],
        docfreq,
        n_buckets=n_buckets,
        empty=typed_empty(**{column: object, "df": "int64"}),
    ).to_pandas()
    # no boilerplate found → empty, column-less frame
    hot_list = list(hot[column]) if column in hot.columns else []
    ref = ray.put(pa.array(hot_list, type=pa.string()))

    def drop_hot(batch: pa.Table) -> pa.Table:
        hs = ray.get(ref)  # broadcast Arrow value set; membership via kernel
        keep = pc.invert(pc.is_in(batch[column], value_set=hs))
        return batch.filter(keep)

    return ds.map_batches(drop_hot, batch_format="pyarrow")


def normalize_column(
    batch: pa.Table,
    column: str = "text",
    out: str | None = None,
    keep_class: str = DEVANAGARI,
    *,
    nfc: bool = True,
    lower: bool = False,
    max_chars: int | None = None,
    drop_empty: bool = False,
) -> pa.Table:
    """map_batches body: normalize ``column``; optionally drop empty rows (M2)."""
    fn = (
        normalize_devanagari
        if (keep_class == DEVANAGARI and nfc and not lower and max_chars is None)
        else make_normalizer(keep_class, nfc=nfc, lower=lower, max_chars=max_chars)
    )
    texts = np.asarray(batch[column].to_pylist(), dtype=object)
    cleaned = pa.array(fn(texts), type=pa.string())
    out = out or column
    if out in batch.column_names:
        batch = batch.set_column(batch.schema.get_field_index(out), out, cleaned)
    else:
        batch = batch.append_column(out, cleaned)
    if drop_empty:
        batch = batch.filter(pc.not_equal(batch[out], ""))
    return batch
