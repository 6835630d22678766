"""Web-document main-content extraction: HTML boilerplate strip, DOM
heuristics, and layout reading-order reconstruction (the PDF-layout
parse stand-in) — the north rule's "(HTML boilerplate strip, PDF/layout
parse, DOM heuristics)" family, expressed as shuffle-free ``map_batches``
stages plus one bounded-bucket shuffle for the layout rebuild.

There is no HTML in the driver's tables, so each query synthesizes a
deterministic page per document (``synth_html_batch`` — a pure,
SQL-expressible function of ``(doc_id, text)``: boilerplate nav /
share-bar / footer blocks with links, two content paragraphs split at
``len(text)//2``, one ``<img>``) and then extracts from it. The synth is
mirrored verbatim in the DuckDB oracles, so the extraction operators are
verified end-to-end by exact value-hash match.

Semantics (mirrored in the oracles — change both together):

- ``strip``: drop ``<style>/<script>`` blocks, tags → ' ', decode the
  entity set {``&copy;`` ``&mdash;`` ``&nbsp;`` ``&amp;`` (last)},
  squeeze ``\\s+`` → ' ', trim.
- ``main content`` (boilerpipe-style block classifier): block elements
  are ``<p>…</p>`` / ``<div>…</div>``; a block is CONTENT iff its
  stripped text has ≥ MIN_BLOCK_CHARS chars AND anchor-text density
  < 1/2 (``2·len(raw <a> inner text) < len(stripped text)``). The
  fixture pages exercise all three drop reasons: nav (short + all-link),
  share bar (long enough to test the length rule), footer (long but
  link-dense).
- ``spans``: DOM → the interleaved span rows of BASELINE.json's
  ``input_hint`` — ``(doc_id, pos, kind∈{text,image}, text, media_ref)``
  in document order, i.e. the inverse of the extraction engine's
  reassembly (reassemble.py flatten_out layout).
- ``reading order``: a two-column paged token layout (page / column /
  line / x with sub-line-height jitter) is scattered into storage-random
  rows; the operator re-derives reading order with a vectorized
  column-split + line-quantize + sort per doc-hash bucket and must
  round-trip the original token sequence exactly.

Scale notes: strip / main-content / spans are embarrassingly parallel
(compiled regexes at module import, no shuffle, string-only rows).
``reading_order`` shuffles token rows once on ``hash(doc_id) % B``
(bounded buckets, never per-doc dispatch — same shape as
reassemble.rebuild_bucket) and sorts each bucket with one vectorized
lexsort; at 10^12 docs B scales with the cluster, not the corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import fast_hash_u64, md5_u64, typed_empty

# compiled once per worker process at module import
RE_DROP_BLOCKS = re.compile(r"<style>.*?</style>|<script>.*?</script>")
RE_TAG = re.compile(r"<[^>]*>")
RE_WS = re.compile(r"\s+")
RE_BLOCK = re.compile(r"<p>.*?</p>|<div>.*?</div>")
RE_ANCHOR_TEXT = re.compile(r"<a [^>]*>(.*?)</a>")
RE_SPAN_TOK = re.compile(r"<p>.*?</p>|<img src=\"[^\"]*\"/>")
RE_IMG_SRC = re.compile(r"<img src=\"([^\"]*)\"/>")
RE_WS_TOKEN = re.compile(r"\S+")

#: entity decode set of the synthetic pages; ``&amp;`` decodes LAST
#: (standard order). Oracle mirror: a replace() chain in the same order.
ENTITIES = (("&copy;", "(c)"), ("&mdash;", "-"), ("&nbsp;", " "), ("&amp;", "&"))

MIN_BLOCK_CHARS = 25

# layout-scatter geometry: 2 columns × 5 lines × 8 tokens = 80 tokens/page
LAYOUT_TOK_PER_LINE = 8
LAYOUT_LINES = 5
LAYOUT_COL_W = 300
LAYOUT_LINE_H = 12


def synth_html_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, html): a deterministic boilerplate-heavy
    page per document. Pure function of the row — SQL-mirrored in the
    oracles (change both together)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pages = []
    for d, t in zip(ids, texts):
        t = t or ""
        h = len(t) // 2
        pages.append(
            f'<html><head><title>Doc {d}</title>'
            "<style>p {margin:0} a {color:blue}</style></head><body>"
            '<div><a href="/">Home</a> <a href="/about">About</a> '
            '<a href="/contact">Contact</a></div>'
            f"<p>{t[:h]}</p>"
            f'<img src="media/{d}.png"/>'
            f"<p>{t[h:]}</p>"
            '<div>Share this: <a href="/t">Tweet</a> &amp; <a href="/l">Like</a></div>'
            '<div>&copy; 2026 example.com &mdash; '
            '<a href="/tos">Terms &amp; Conditions</a></div>'
            "</body></html>"
        )
    return pa.table(
        {"doc_id": batch["doc_id"], "html": pa.array(pages, type=pa.string())}
    )


def _strip_fragment(fragment: str) -> str:
    """Tags → ' ', entity decode, squeeze, trim (block-level strip —
    no style/script removal; those only exist at page level)."""
    s = RE_TAG.sub(" ", fragment)
    for ent, rep in ENTITIES:
        s = s.replace(ent, rep)
    return RE_WS.sub(" ", s).strip()


def strip_html_batch(batch: pa.Table, column: str = "html") -> pa.Table:
    """(doc_id, html) → (doc_id, text_stripped): whole-page tag strip."""
    ids = batch["doc_id"]
    out = [_strip_fragment(RE_DROP_BLOCKS.sub("", h or "")) for h in batch[column].to_pylist()]
    return pa.table({"doc_id": ids, "text_stripped": pa.array(out, type=pa.string())})


def main_content_batch(batch: pa.Table, column: str = "html") -> pa.Table:
    """(doc_id, html) → (doc_id, main_text, n_blocks, n_kept): per-block
    length + anchor-text-density classifier over block elements."""
    ids = batch["doc_id"].to_pylist()
    pages = batch[column].to_pylist()
    out_main: list[str] = []
    out_nb = np.empty(len(pages), np.int64)
    out_nk = np.empty(len(pages), np.int64)
    for i, page in enumerate(pages):
        blocks = RE_BLOCK.findall(page or "")
        kept: list[str] = []
        for blk in blocks:
            btxt = _strip_fragment(blk)
            link_len = sum(len(a) for a in RE_ANCHOR_TEXT.findall(blk))
            if len(btxt) >= MIN_BLOCK_CHARS and 2 * link_len < len(btxt):
                kept.append(btxt)
        out_main.append(" ".join(kept))
        out_nb[i] = len(blocks)
        out_nk[i] = len(kept)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "main_text": pa.array(out_main, type=pa.string()),
            "n_blocks": pa.array(out_nb),
            "n_kept": pa.array(out_nk),
        }
    )


def html_spans_batch(batch: pa.Table, column: str = "html") -> pa.Table:
    """(doc_id, html) → interleaved span rows (doc_id, pos, kind, text,
    media_ref) in document order — the input_hint span layout, i.e. DOM
    parse as the inverse of reassemble.flatten_out. flat_map-shaped:
    emits ~3 rows per input row."""
    ids = batch["doc_id"].to_pylist()
    pages = batch[column].to_pylist()
    o_id: list = []
    o_pos: list[int] = []
    o_kind: list[str] = []
    o_text: list[str] = []
    o_ref: list[str] = []
    for d, page in zip(ids, pages):
        for pos, tok in enumerate(RE_SPAN_TOK.findall(page or "")):
            o_id.append(d)
            o_pos.append(pos)
            if tok.startswith("<img"):
                o_kind.append("image")
                o_text.append("")
                o_ref.append(RE_IMG_SRC.match(tok).group(1))
            else:
                o_kind.append("text")
                # no entities inside content <p> blocks — tag strip only
                o_text.append(RE_WS.sub(" ", RE_TAG.sub(" ", tok)).strip())
                o_ref.append("")
    return pa.table(
        {
            "doc_id": pa.array(o_id, type=batch["doc_id"].type),
            "pos": pa.array(o_pos, type=pa.int64()),
            "kind": pa.array(o_kind, type=pa.string()),
            "text": pa.array(o_text, type=pa.string()),
            "media_ref": pa.array(o_ref, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# layout reading order (PDF-layout parse stand-in)
# ---------------------------------------------------------------------------


def layout_scatter_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → storage-SCRAMBLED token rows
    (doc_id, page, x, y, token): each doc's whitespace tokens laid onto
    two-column pages with per-token jitter (±3 px in x, ±2 px in y —
    strictly under half the 35 px token pitch / 12 px line height, so
    reading order is exactly recoverable), then emitted in md5-permuted
    order so the rebuild cannot ride on storage order. Token-less docs
    emit no rows (the oracle filters them identically)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    rows_per_page = 2 * LAYOUT_LINES * LAYOUT_TOK_PER_LINE
    per_col = LAYOUT_LINES * LAYOUT_TOK_PER_LINE
    o_id: list = []
    o_page: list[int] = []
    o_x: list[int] = []
    o_y: list[int] = []
    o_tok: list[str] = []
    for d, t in zip(ids, texts):
        toks = RE_WS_TOKEN.findall(t or "")
        if not toks:
            continue
        n = len(toks)
        i = np.arange(n)
        page = i // rows_per_page
        r = i % rows_per_page
        col = r // per_col
        line = (r % per_col) // LAYOUT_TOK_PER_LINE
        k = r % LAYOUT_TOK_PER_LINE
        jx = np.fromiter(
            (md5_u64(f"{d}:{j}:x") % 7 for j in range(n)), np.int64, n
        ) - 3
        jy = np.fromiter(
            (md5_u64(f"{d}:{j}:y") % 5 for j in range(n)), np.int64, n
        ) - 2
        x = col * LAYOUT_COL_W + 10 + k * 35 + jx
        y = 20 + line * LAYOUT_LINE_H + jy
        perm = np.argsort(
            np.fromiter((md5_u64(f"{d}:{j}:p") for j in range(n)), np.uint64, n),
            kind="stable",
        )
        o_id.extend([d] * n)
        o_page.extend(page[perm].tolist())
        o_x.extend(x[perm].tolist())
        o_y.extend(y[perm].tolist())
        o_tok.extend(np.asarray(toks, dtype=object)[perm].tolist())
    return pa.table(
        {
            "doc_id": pa.array(o_id, type=batch["doc_id"].type),
            "page": pa.array(o_page, type=pa.int64()),
            "x": pa.array(o_x, type=pa.int64()),
            "y": pa.array(o_y, type=pa.int64()),
            "token": pa.array(o_tok, type=pa.string()),
        }
    )


def reading_order_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Many docs' token rows (one doc-hash bucket) → (doc_id, text_rebuilt).

    The layout parse proper: column id = x // COL_W, line id quantizes y
    against the known line pitch (jitter < pitch/2 makes this exact), and
    one vectorized mergesort over (doc, page, col, line, x) restores
    reading order for EVERY doc in the bucket at once."""
    if len(df) == 0 or "doc_id" not in df.columns:
        return typed_empty(doc_id=np.int64, text_rebuilt=object)
    col = df["x"].to_numpy() // LAYOUT_COL_W
    line = (df["y"].to_numpy() - 20 + LAYOUT_LINE_H // 2) // LAYOUT_LINE_H
    order = pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "page": df["page"].to_numpy(),
            "col": col,
            "line": line,
            "x": df["x"].to_numpy(),
            "token": df["token"].to_numpy(),
        }
    ).sort_values(["doc_id", "page", "col", "line", "x"], kind="mergesort")
    out = (
        order.groupby("doc_id", sort=True)["token"]
        .agg(" ".join)
        .reset_index()
        .rename(columns={"token": "text_rebuilt"})
    )
    return out


def reading_order(tokens_ds, n_buckets: int = 16):
    """Distributed reading-order reconstruction: one bounded-bucket
    shuffle on hash(doc_id), vectorized per-bucket rebuild."""
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with peers)

    def tag(batch: pa.Table) -> pa.Table:
        b = fast_hash_u64(batch["doc_id"].to_numpy(zero_copy_only=False)) % n_buckets
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    return (
        tokens_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reading_order_bucket, batch_format="pandas")
    )


# --- link-graph extraction (crawl-frontier census) ---------------------

RE_DOC_LINK = re.compile(r'href="/doc/(\d+)"')


def synth_link_html_batch(batch: pa.Table) -> pa.Table:
    """(doc_id,) → (doc_id, html): a page whose OUTLINKS depend on the
    doc — two internal /doc/<id> links (affine maps of doc_id, so the
    inlink distribution is non-uniform) and, for every fifth doc, one
    external link the internal-link regex must NOT match. Pure function
    of the row, mirrored verbatim in the DuckDB oracle."""
    ids = batch["doc_id"].to_pylist()
    pages = []
    for d in ids:
        ext = (
            f' <a href="https://ext.example.com/p{d % 7}">src</a>'
            if d % 5 == 0
            else ""
        )
        pages.append(
            '<html><body><div><a href="/">Home</a></div>'
            f'<a href="/doc/{(7 * d + 1) % 10000}">next</a> '
            f'<a href="/doc/{(13 * d + 5) % 10000}">related</a>'
            f"{ext}</body></html>"
        )
    return pa.table(
        {"doc_id": batch["doc_id"], "html": pa.array(pages, type=pa.string())}
    )


def extract_doc_links(ds, *, n_buckets: int = 64):
    """(doc_id, html) → (dst_doc, n_inlinks): parse internal
    ``/doc/<id>`` hrefs with a compiled regex and count inlinks per
    target — the crawl-frontier / link-graph-census op (which pages get
    linked, the seed signal for PageRank and crawl prioritization).

    Scale shape: extraction is shuffle-free (compiled regex per page,
    per-batch PARTIAL counts per dst); the census is one bounded
    ``hash(dst) % B`` shuffle over partial rows — never one row per
    link occurrence."""
    part_empty = typed_empty(dst_doc=np.int64, n_inlinks=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        dsts = []
        for h in batch["html"].to_pylist():
            dsts.extend(int(x) for x in RE_DOC_LINK.findall(h or ""))
        if not dsts:
            out = part_empty.copy()
            out["__b"] = pd.Series([], dtype=np.int32)
            return pa.Table.from_pandas(out, preserve_index=False)
        arr = np.asarray(dsts, np.int64)
        v, c = np.unique(arr, return_counts=True)
        df = pd.DataFrame({"dst_doc": v, "n_inlinks": c.astype(np.int64)})
        df["__b"] = (v.astype(np.uint64) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return part_empty.copy()
        out = group.groupby("dst_doc", as_index=False)["n_inlinks"].sum()
        out["n_inlinks"] = out["n_inlinks"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )
