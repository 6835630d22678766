"""Training-corpus assembly operators (beyond-the-reference family).

The ops a large-scale LLM training-data pipeline needs between "cleaned
documents" and "training shards": deterministic train/val splitting, PII
redaction, per-stratum sampling, token-budget sequence packing and
weighted corpus mixing. None exist in the reference (its corpus step is a
single serial readline loop, datagen/augmentations/generate_dataset.py);
all are expressed Ray-Data-first:

- hash decisions use :func:`sanskrit_ocr_ray.util.md5_u64` so every
  operator has an exact DuckDB oracle
  (``('0x' || substr(md5(x),1,16))::UBIGINT``) — the driver's correctness
  gate compares value-for-value;
- nothing shuffles except where semantics demand co-location, and then
  only by BOUNDED hash buckets (never per-group dispatch on an unbounded
  key);
- regex work runs on Arrow via RE2 (`pyarrow.compute` string kernels),
  the same engine DuckDB uses, so redaction parity is byte-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import (
    batch_token_hash_flat,
    batch_tokens_flat,
    md5_u64_many,
    typed_empty,
)

# RE2 syntax, identical semantics in pyarrow.compute and DuckDB regexp_*.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9]{4,}", "<NUM>"),
)


def train_val_split(ds, *, key: str = "doc_id", val_permille: int = 100):
    """Deterministic hash split: ``md5(key) % 1000 < val_permille`` → val.

    Shuffle-free and order/parallelism-independent — the split of a doc
    never changes when the corpus grows, which is what keeps eval sets
    stable across dataset versions (unlike random_shuffle + take).
    """

    def tag(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch[key].to_pylist()]
        h = md5_u64_many(keys) % np.uint64(1000)
        split = np.where(h < val_permille, "val", "train")
        return pa.table(
            {key: batch[key], "split": pa.array(split.tolist(), type=pa.string())}
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def redact_pii(ds, *, column: str = "text", patterns=PII_PATTERNS):
    """Chained regex redaction with per-doc match counts.

    Patterns apply IN ORDER, each counting matches on the text state it
    sees (so digits inside an already-redacted email are not re-counted).
    All string work is RE2 on Arrow buffers — no Python loop.
    """

    def scrub(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch[column], pa.string())
        total = np.zeros(len(txt), dtype=np.int64)
        for pat, repl in patterns:
            total += pc.count_substring_regex(txt, pat).to_numpy(zero_copy_only=False)
            txt = pc.replace_substring_regex(txt, pat, repl)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_redacted": txt,
                "n_pii": pa.array(total),
            }
        )
        return out

    return ds.map_batches(scrub, batch_format="pyarrow")


def pii_stats_by_group(
    ds,
    *,
    group_col: str = "source",
    column: str = "text",
    patterns=PII_PATTERNS,
):
    """Governance rollup of :func:`redact_pii`: per ``group_col``
    (crawl source, feed) report (n_docs, n_docs_with_pii, n_pii,
    pii_doc_pm) where ``pii_doc_pm = 1000·hit-docs // docs`` — the
    dashboard that says WHICH feed ships PII, before a corpus release.

    Scale shape: shuffle-free — the chained RE2 count/replace runs on
    Arrow buffers per batch (exactly redact_pii's order-sensitive
    counting), each batch folds one tiny (group, …) partial with one
    Arrow hash-aggregate, and the driver merges O(#blocks · groups)
    rows. Returns a pandas DataFrame sorted by group.
    """

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.cast(pc.fill_null(batch[column], ""), pa.string())
        total = np.zeros(len(txt), dtype=np.int64)
        for pat, repl in patterns:
            total += pc.count_substring_regex(txt, pat).to_numpy(
                zero_copy_only=False
            )
            txt = pc.replace_substring_regex(txt, pat, repl)
        per = pa.table(
            {
                group_col: batch[group_col],
                "n_docs": pa.array(np.ones(len(total), np.int64)),
                "n_docs_with_pii": pa.array((total > 0).astype(np.int64)),
                "n_pii": pa.array(total),
            }
        )
        agg = per.group_by([group_col]).aggregate(
            [("n_docs", "sum"), ("n_docs_with_pii", "sum"), ("n_pii", "sum")]
        )
        return agg.rename_columns(
            [group_col, "n_docs", "n_docs_with_pii", "n_pii"]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return typed_empty(
            **{group_col: object, "n_docs": np.int64,
               "n_docs_with_pii": np.int64, "n_pii": np.int64,
               "pii_doc_pm": np.int64}
        )
    out = parts.groupby(group_col, as_index=False)[
        ["n_docs", "n_docs_with_pii", "n_pii"]
    ].sum()
    out["pii_doc_pm"] = (1000 * out["n_docs_with_pii"]) // out["n_docs"]
    out = out.astype(
        {"n_docs": np.int64, "n_docs_with_pii": np.int64, "n_pii": np.int64,
         "pii_doc_pm": np.int64}
    )
    return out.sort_values(group_col).reset_index(drop=True)


def stratified_sample(
    ds,
    *,
    group_col: str = "lang",
    k: int = 5,
    id_col: str = "doc_id",
    n_buckets: int = 32,
):
    """Deterministic top-k per stratum, ordered by md5(id).

    One bounded shuffle: strata are bucketed by ``hash(group) % B`` and a
    whole bucket ranks all its strata in one vectorized sort + cumcount —
    never one dispatch per stratum (strata counts are unbounded at web
    scale: think per-domain sampling).
    """
    from ..util import fast_hash_u64

    def project(batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch[id_col].to_pylist()]
        h = md5_u64_many(ids)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "__h": pa.array(h),
                "__b": pa.array(
                    (fast_hash_u64(g) % np.uint64(n_buckets)).astype(np.int32)
                ),
            }
        )

    empty = typed_empty(**{id_col: np.int64, group_col: object})

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        g = df.sort_values([group_col, "__h", id_col], kind="mergesort")
        rank = g.groupby(group_col, sort=False).cumcount()
        out = g.loc[rank < k, [id_col, group_col]]
        return out.reset_index(drop=True)

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def pack_sequences(
    ds,
    *,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
):
    """Token-budget sequence packing: assign docs to fixed-budget packs.

    Docs are hash-bucketed (``md5(id) % B`` — each bucket is one worker's
    independent packing problem), ordered deterministically by md5 within
    the bucket, and assigned ``pack = floor(exclusive_cumsum(ntok) /
    budget)`` — the window-function formulation (cumulative-budget
    partitioning) rather than greedy-with-reset, precisely so the result
    is expressible as ANSI-SQL window aggregates for the oracle. pack_id =
    ``bucket * 2^32 + pack`` is globally unique. Tokens are whitespace
    tokens (same contract as text_analysis.token_count_batch's
    n_ws_tokens).
    """
    def project(batch: pa.Table) -> pa.Table:
        # \S+ token count as one Arrow RE2 kernel (same contract as
        # text_analysis.token_count_batch's n_ws_tokens)
        ntok = (
            pc.count_substring_regex(pc.fill_null(batch[text_col], ""), r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ids = [str(v) for v in batch[id_col].to_pylist()]
        h = md5_u64_many(ids)
        return pa.table(
            {
                id_col: batch[id_col],
                "ntok": pa.array(ntok),
                "__h": pa.array(h),
                "__b": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    empty = typed_empty(**{id_col: np.int64, "pack_id": np.int64, "ntok": np.int64})

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        g = df.sort_values(["__h", id_col], kind="mergesort")
        cum_excl = np.concatenate(([0], np.cumsum(g["ntok"].to_numpy())[:-1]))
        pack = cum_excl // budget
        bucket = int(g["__b"].iloc[0])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "pack_id": bucket * (1 << 32) + pack,
                "ntok": g["ntok"].to_numpy(),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pack_bucket, batch_format="pandas")
    )


def ngram_top(
    ds,
    *,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Top-k most frequent word n-grams across the corpus.

    Scale shape: counts partial-aggregate INSIDE each batch (one Arrow
    value_counts per batch, so the explode never materializes one row
    per gram occurrence in the shuffle),
    then one bounded-bucket shuffle sums per gram, each bucket keeps only
    its own top-k (the global top-k is necessarily inside some bucket's
    top-k), and the driver merges B×k tiny rows. Ties break by gram text
    ascending — deterministic and oracle-reproducible.

    Returns a pandas DataFrame (gram, n) of exactly k rows (fewer if the
    corpus has fewer distinct grams).
    """
    from ..stages.dedup import bucketed_aggregate

    def count_batch(batch: pa.Table) -> pa.Table:
        # Vectorized shingling (hygiene.contamination pattern): windows
        # are n shifted zero-copy slices joined in ONE Arrow kernel
        # (window valid iff first/last token share a doc); counts via
        # pc.value_counts. No Python per gram occurrence.
        empty = pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        flat, parent = batch_tokens_flat(batch[text_col])
        n_win = len(parent) - n + 1
        if n_win <= 0:
            return empty
        valid = parent[:n_win] == parent[n - 1 :]
        if not valid.any():
            return empty
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, n_win) for j in range(n)], " "
        ).filter(pa.array(valid))
        vc = pc.value_counts(grams)
        return pa.table(
            {
                "gram": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    empty = typed_empty(gram=object, n=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("gram", as_index=False)["n"].sum()
        agg = agg.sort_values(["n", "gram"], ascending=[False, True], kind="mergesort")
        return agg.head(k).reset_index(drop=True)

    per_bucket = bucketed_aggregate(
        ds.map_batches(count_batch, batch_format="pyarrow"),
        ["gram"],
        combine,
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    )
    top = per_bucket.to_pandas()  # B×k tiny rows
    top = top.sort_values(["n", "gram"], ascending=[False, True], kind="mergesort")
    return top.head(k).reset_index(drop=True)


def corpus_mix(sides, *, permille: dict[str, int] | None = None):
    """Weighted deterministic corpus mixing.

    ``sides`` is ``[(src_tag, dataset, id_col, text_col), ...]``; each
    side keeps rows with ``md5(src || ':' || id) % 1000 < permille[src]``
    and the survivors union into one (src, rec_id, text) corpus. Hash
    selection (not sampling) makes the mix reproducible and incremental:
    re-running over a grown corpus keeps every previously selected row.
    """
    permille = permille or {}

    def keep(src: str, id_col: str, text_col: str, pm: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = [str(v) for v in batch[id_col].to_pylist()]
            h = md5_u64_many([f"{src}:{i}" for i in ids]) % np.uint64(1000)
            mask = pa.array(h < pm)
            t = batch.filter(mask)
            return pa.table(
                {
                    "src": pa.array([src] * t.num_rows, type=pa.string()),
                    "rec_id": pc.cast(t[id_col], pa.int64()),
                    "text": pc.cast(t[text_col], pa.string()),
                }
            )

        return fn

    out = None
    for src, ds, id_col, text_col in sides:
        part = ds.map_batches(
            keep(src, id_col, text_col, permille.get(src, 1000)),
            batch_format="pyarrow",
        )
        out = part if out is None else out.union(part)
    return out


def vocab_build(
    ds,
    *,
    min_count: int = 5,
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Frequency-ranked token vocabulary induction — the vocab pass of a
    word-level / WordPiece-style tokenizer build: corpus-wide token
    frequencies, floor-filtered, with contiguous ``token_id``s assigned
    by (freq desc, token asc) so id assignment is deterministic and
    oracle-reproducible (``row_number() OVER (ORDER BY freq DESC, token)``).

    Scale shape: counts partial-aggregate INSIDE each batch (one Arrow
    value_counts per batch — the explode never materializes a row per
    occurrence in the shuffle), one
    bounded-bucket shuffle sums per token and applies the ``min_count``
    floor. The post-filter vocab is small by construction (Heaps' law +
    the frequency floor keeps it at 10^5–10^7 rows even at web scale), so
    the final global rank coalesces it into ONE block for the argsort;
    everything upstream streams.
    """
    from ..stages.dedup import bucketed_aggregate

    def count_batch(batch: pa.Table) -> pa.Table:
        # One Arrow tokenize + value_counts pass — no Python per token.
        flat, _ = batch_tokens_flat(batch[text_col])
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values"),
                "freq": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    empty = typed_empty(token=object, freq=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("token", as_index=False)["freq"].sum()
        return agg[agg["freq"] >= min_count]

    vocab = bucketed_aggregate(
        ds.map_batches(count_batch, batch_format="pyarrow"),
        ["token"],
        combine,
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    )

    def assign_ids(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["freq", "token"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        df["token_id"] = np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    # one block: the global rank needs a total order over the (small) vocab
    return vocab.repartition(1).map_batches(
        assign_ids, batch_format="pyarrow", batch_size=None
    )


def chunk_documents(
    ds,
    *,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Token-window document chunking with overlap — the context-window
    chunking op of RAG indexing / training-sequence preparation: windows
    of ``chunk_tokens`` space-split tokens starting every ``stride``
    tokens (``chunk_tokens - stride`` tokens of overlap). The final
    window may be short; empty docs emit nothing; ``chunk_id`` is the
    window ordinal. Pure flat map over batches — no shuffle, so it
    streams at any corpus size.
    """

    def explode(batch: pa.Table) -> pa.Table:
        # Vectorized overlapping windows: per-doc window starts/lengths
        # come from segment arithmetic, the token gather is ONE Arrow
        # take over a flattened index vector, and the joins run as ONE
        # binary_join over a ListArray. No Python per token or window.
        flat, parent = batch_tokens_flat(batch[text_col])
        L = len(parent)
        if L == 0:
            return pa.table(
                {
                    id_col: pa.chunked_array([], type=batch[id_col].type),
                    "chunk_id": pa.array([], type=pa.int64()),
                    "chunk": pa.array([], type=pa.string()),
                    "ntok": pa.array([], type=pa.int64()),
                }
            )
        new_doc = np.r_[True, parent[1:] != parent[:-1]]
        doc_starts = np.flatnonzero(new_doc)  # into flat
        doc_rows = parent[doc_starts]
        doc_len = np.diff(np.r_[doc_starts, L])
        n_win = (doc_len + stride - 1) // stride  # ceil(n / stride)
        rows = np.repeat(doc_rows, n_win)
        # window ordinal within its doc
        win_firsts = np.r_[0, np.cumsum(n_win)[:-1]]
        cids = np.arange(int(n_win.sum()), dtype=np.int64) - np.repeat(
            win_firsts, n_win
        )
        win_start = np.repeat(doc_starts, n_win) + cids * stride  # into flat
        win_len = np.minimum(
            chunk_tokens, np.repeat(doc_starts + doc_len, n_win) - win_start
        )
        # flattened token gather indices: one arange per window
        tok_firsts = np.r_[0, np.cumsum(win_len)[:-1]]
        idx = (
            np.arange(int(win_len.sum()), dtype=np.int64)
            - np.repeat(tok_firsts, win_len)
            + np.repeat(win_start, win_len)
        )
        gathered = flat.take(pa.array(idx))
        offsets = np.r_[0, np.cumsum(win_len)].astype(np.int32)
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), gathered), " "
        )
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(rows, type=pa.int64())),
                "chunk_id": pa.array(cids),
                "chunk": chunks,
                "ntok": pa.array(win_len.astype(np.int64)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def encode_documents(
    ds,
    *,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
    n_buckets: int = 64,
):
    """Tokenizer APPLICATION: encode every document to its token-id
    sequence under the :func:`vocab_build` vocabulary (same
    ``min_count`` floor; OOV tokens map to ``oov_id``) — the
    text→training-sequence step that follows vocab induction. Returns
    (doc_id, ids [space-joined], ntok, n_oov); token-less docs emit no
    row (the corpus-wide convention).

    Scale shape: the induced vocab is small by construction (Heaps' law
    + the floor — the same bound vocab_build documents), so it is
    collected ONCE, broadcast via ``ray.put``, and applied in a
    shuffle-free map pass. The encode is the classic
    broadcast-dictionary-apply; the heavy lifting (corpus-wide counts)
    already streamed inside vocab_build.
    """
    import ray

    vdf = vocab_build(
        ds, min_count=min_count, text_col=text_col, n_buckets=n_buckets
    ).to_pandas()
    vref = ray.put(
        (
            pa.array(vdf["token"], type=pa.string()),
            vdf["token_id"].to_numpy().astype(np.int64),
        )
    )

    def encode(batch: pa.Table) -> pa.Table:
        # Vectorized broadcast-dictionary apply: ONE pc.index_in hash
        # lookup for the whole batch, per-doc space-joins via a
        # ListArray + binary_join, OOV counts via a segment fold.
        vocab_toks, vocab_ids = ray.get(vref)
        flat, parent = batch_tokens_flat(batch[text_col])
        L = len(parent)
        if L == 0:
            return pa.table(
                {
                    id_col: pa.chunked_array([], type=batch[id_col].type),
                    "ids": pa.array([], type=pa.string()),
                    "ntok": pa.array([], type=pa.int64()),
                    "n_oov": pa.array([], type=pa.int64()),
                }
            )
        vi = pc.index_in(flat, value_set=vocab_toks)
        vi_np = vi.to_numpy(zero_copy_only=False)
        oov = np.asarray(pd.isna(vi_np))
        enc_ids = np.where(
            oov, np.int64(oov_id), vocab_ids[np.where(oov, 0, vi_np).astype(np.int64)]
        )
        doc_starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
        doc_rows = parent[doc_starts]
        doc_len = np.diff(np.r_[doc_starts, L]).astype(np.int64)
        offsets = np.r_[0, np.cumsum(doc_len)].astype(np.int32)
        ids_str = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets), pc.cast(pa.array(enc_ids), pa.string())
            ),
            " ",
        )
        n_oov = np.zeros(len(doc_starts), np.int64)
        np.add.at(
            n_oov, np.searchsorted(doc_starts, np.flatnonzero(oov), "right") - 1, 1
        )
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(doc_rows, type=pa.int64())),
                "ids": ids_str,
                "ntok": pa.array(doc_len),
                "n_oov": pa.array(n_oov),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def window_cooccurrence_topk(
    ds,
    *,
    window: int = 5,
    k: int = 20,
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Top-``k`` ORDERED token co-occurrences within a ``window``-token
    span: pairs (x, y) where y follows x by 1..window−1 positions in the
    same doc, ranked by count (ties: x, y ascending) — collocation
    mining beyond :func:`pmi_collocations`' adjacent bigrams (skip-gram
    context statistics, topical-pair discovery). Returns (x, y, n).

    Scale shape: each offset d ∈ [1, window) is two shifted zero-copy
    slices of the flat token stream (pair valid iff both ends share a
    doc); the per-batch multiset collapses in ONE Arrow hash-aggregate,
    one bounded (x, y)-bucket shuffle sums exactly, each bucket emits
    only its own top-k, and the driver merges B·k rows — the global
    top-k under (n desc, x, y) is inside some bucket's top-k under the
    same order.
    """
    from ..stages.dedup import bucketed_aggregate

    def pair_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "x": pa.array([], type=pa.string()),
                "y": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        flat, parent = batch_tokens_flat(batch[text_col])
        L = len(parent)
        parts = []
        for d in range(1, window):
            if L <= d:
                break
            valid = parent[:-d] == parent[d:]
            if not valid.any():
                continue
            vmask = pa.array(valid)
            parts.append(
                pa.table(
                    {
                        "x": flat.slice(0, L - d).filter(vmask),
                        "y": flat.slice(d, L - d).filter(vmask),
                    }
                )
            )
        if not parts:
            return empty
        pairs = pa.concat_tables(parts)
        agg = pairs.group_by(["x", "y"]).aggregate([([], "count_all")])
        return agg.rename_columns(["x", "y", "n"])

    empty = typed_empty(x=object, y=object, n=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["x", "y"], as_index=False)["n"].sum()
        agg = agg.sort_values(
            ["n", "x", "y"], ascending=[False, True, True], kind="mergesort"
        )
        return agg.head(k).astype({"n": np.int64}).reset_index(drop=True)

    cand = bucketed_aggregate(
        ds.map_batches(pair_counts, batch_format="pyarrow"),
        ["x", "y"],
        combine,
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    ).to_pandas()
    if cand.empty:
        return empty.copy()
    top = cand.sort_values(
        ["n", "x", "y"], ascending=[False, True, True], kind="mergesort"
    )
    return top.head(k).astype({"n": np.int64}).reset_index(drop=True)


def vocab_coverage(
    ds,
    *,
    ks: tuple = (10, 100, 1000),
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Zipf head-coverage curve: for each ``k`` in ``ks``, the per-mille
    of ALL token instances covered by the ``k`` most frequent tokens
    (rank order: freq desc, token asc) — the statistic that sizes a
    vocabulary before :func:`vocab_build` commits to one. Returns
    (k, covered, total, coverage_pm).

    Scale shape: the instance census streams through ONE bounded token
    bucket shuffle (per-batch Arrow value_counts partials in, per-bucket
    exact sums out); each bucket then emits only its own top-max(ks)
    rows plus one total — the global top-k under (freq desc, token asc)
    is necessarily inside some bucket's top-k under the same order — so
    the driver folds B·max(ks) candidate rows + B scalars, never the
    vocabulary.
    """
    from ..stages.dedup import bucketed_aggregate

    kmax = max(ks)

    def count_batch(batch: pa.Table) -> pa.Table:
        flat, _ = batch_tokens_flat(batch[text_col])
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values"),
                "freq": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    empty = typed_empty(token=object, freq=np.int64, bucket_total=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("token", as_index=False)["freq"].sum()
        total = int(agg["freq"].sum())
        top = agg.sort_values(
            ["freq", "token"], ascending=[False, True], kind="mergesort"
        ).head(kmax)
        out = top.assign(bucket_total=np.int64(0))
        if len(out):
            out.iloc[0, out.columns.get_loc("bucket_total")] = total
        else:
            out = pd.DataFrame(
                {"token": [""], "freq": [0], "bucket_total": [total]}
            )
        return out.astype({"freq": np.int64, "bucket_total": np.int64})

    cand = bucketed_aggregate(
        ds.map_batches(count_batch, batch_format="pyarrow"),
        ["token"],
        combine,
        n_buckets=n_buckets,
        empty=empty,
        coalesce_first=False,
    ).to_pandas()
    out_rows = []
    total = int(cand["bucket_total"].sum()) if not cand.empty else 0
    ranked = (
        cand[cand["freq"] > 0]
        .sort_values(["freq", "token"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
        if not cand.empty
        else pd.DataFrame({"freq": []})
    )
    cum = ranked["freq"].cumsum() if len(ranked) else pd.Series(dtype=np.int64)
    for k in ks:
        covered = int(cum.iloc[min(k, len(cum)) - 1]) if len(cum) else 0
        out_rows.append(
            {
                "k": int(k),
                "covered": covered,
                "total": total,
                "coverage_pm": (1000 * covered) // total if total else 0,
            }
        )
    return pd.DataFrame(out_rows).astype(np.int64).sort_values("k").reset_index(
        drop=True
    )


def oov_rate_by_lang(
    ds,
    *,
    min_count: int = 5,
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 64,
):
    """Tokenizer-coverage eval: per-language OOV rate under the
    :func:`vocab_build` vocabulary — (lang, n_tokens, n_oov, oov_pm)
    with ``oov_pm = 1000·Σ n_oov // Σ n_tokens`` (integer per-mille).
    The go/no-go check before shipping a vocabulary against a
    multilingual corpus: a language whose OOV rate spikes is about to
    be shredded into unknowns.

    Scale shape: the vocab census streams through vocab_build's bounded
    bucket shuffle once; the scoring pass is shuffle-free — vocab
    membership is ONE broadcast ``pc.index_in`` per batch and each
    batch folds (lang, ntok, oov) partials with one Arrow
    hash-aggregate (≤ |langs| cells); the driver merges
    O(#blocks · langs) rows. Returns a pandas DataFrame sorted by lang.
    """
    import ray

    vdf = vocab_build(
        ds, min_count=min_count, text_col=text_col, n_buckets=n_buckets
    ).to_pandas()
    vref = ray.put(pa.array(vdf["token"], type=pa.string()))

    def partial(batch: pa.Table) -> pa.Table:
        vocab_toks = ray.get(vref)
        flat, parent = batch_tokens_flat(batch[text_col])
        n = batch.num_rows
        ntok = np.zeros(n, np.int64)
        oov = np.zeros(n, np.int64)
        if len(parent):
            np.add.at(ntok, parent, 1)
            miss = np.asarray(
                pd.isna(
                    pc.index_in(flat, value_set=vocab_toks).to_numpy(
                        zero_copy_only=False
                    )
                )
            )
            if miss.any():
                np.add.at(oov, parent[miss], 1)
        per = pa.table(
            {
                "lang": batch[lang_col],
                "n_tokens": pa.array(ntok),
                "n_oov": pa.array(oov),
            }
        )
        agg = per.group_by(["lang"]).aggregate([("n_tokens", "sum"), ("n_oov", "sum")])
        return agg.rename_columns(["lang", "n_tokens", "n_oov"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return typed_empty(
            lang=object, n_tokens=np.int64, n_oov=np.int64, oov_pm=np.int64
        )
    out = parts.groupby("lang", as_index=False)[["n_tokens", "n_oov"]].sum()
    out = out[out["n_tokens"] > 0]
    out["oov_pm"] = (1000 * out["n_oov"]) // out["n_tokens"]
    out = out.astype({"n_tokens": np.int64, "n_oov": np.int64, "oov_pm": np.int64})
    return out.sort_values("lang").reset_index(drop=True)


def pmi_collocations(
    ds,
    *,
    min_pair: int = 5,
    k: int = 20,
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Top-``k`` bigram collocations by integer lift —
    ``score_x1m = 10^6 · c_xy · N // (c_x · c_y)`` (N = total tokens;
    the exp-of-PMI, monotone in PMI, so the ranking is identical while
    staying integer-exact). Ties break by (w1, w2) ascending. Bigrams
    never cross document boundaries.

    Scale shape: bigram counts partial-aggregate per batch (one Arrow
    hash-aggregate per batch, never a row per occurrence in the shuffle) → one bounded-bucket shuffle sums
    per pair and applies the ``min_pair`` floor. Unigram counts are
    NEVER collected on the driver: the unfloored census is itself a
    bucketed distributed table (object-store-resident, materialized once
    so the second join pass does not rescan the corpus), and c_x / c_y
    reach each surviving pair through two token-keyed bucket joins — the
    same in-bucket join `hygiene.rarity_score` uses for global tf. N
    (total tokens) is the census' freq sum, a scalar. Scoring runs over
    the post-floor pair table with PYTHON ints (the 10^6·c_xy·N product
    overflows int64 exactly where corpora get interesting); the final
    top-k coalesces the floored pair table — small by the Heaps bound +
    floor — into one block for the argsort.
    """
    from ..stages.dedup import bucketed_aggregate

    def big_counts(batch: pa.Table) -> pa.Table:
        # Vectorized adjacent pairs (hygiene.bigram_surprisal pattern):
        # two shifted zero-copy slices + ONE Arrow hash-aggregate.
        empty = pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c_xy": pa.array([], type=pa.int64()),
            }
        )
        flat, parent = batch_tokens_flat(batch[text_col])
        L = len(parent)
        if L < 2:
            return empty
        valid = parent[:-1] == parent[1:]
        if not valid.any():
            return empty
        vmask = pa.array(valid)
        pairs = pa.table(
            {
                "w1": flat.slice(0, L - 1).filter(vmask),
                "w2": flat.slice(1, L - 1).filter(vmask),
            }
        )
        agg = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return agg.rename_columns(["w1", "w2", "c_xy"])

    empty = typed_empty(w1=object, w2=object, c_xy=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["w1", "w2"], as_index=False)["c_xy"].sum()
        agg["c_xy"] = agg["c_xy"].astype(np.int64)
        return agg[agg["c_xy"] >= min_pair]

    pairs = bucketed_aggregate(
        ds.map_batches(big_counts, batch_format="pyarrow"),
        ["w1", "w2"],
        combine,
        n_buckets=n_buckets,
        empty=empty,
    )

    # ---- distributed unfloored unigram census (never on the driver) ----
    def uni_counts(batch: pa.Table) -> pa.Table:
        # One Arrow tokenize + value_counts pass — no Python per token.
        flat, _ = batch_tokens_flat(batch[text_col])
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "term": vc.field("values"),
                "freq": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    uni_empty = typed_empty(term=object, freq=np.int64)

    def uni_sum(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("term", as_index=False)["freq"].sum()
        agg["freq"] = agg["freq"].astype(np.int64)
        return agg

    # materialized so the two join passes below (and the N scalar) read
    # pinned object-store blocks instead of rescanning the corpus text
    uni = bucketed_aggregate(
        ds.map_batches(uni_counts, batch_format="pyarrow"),
        ["term"],
        uni_sum,
        n_buckets=n_buckets,
        empty=uni_empty,
        coalesce_first=False,
    ).materialize()
    total = int(uni.sum("freq") or 0)

    # ---- join c_x then c_y INSIDE a token bucket (rarity_score pattern) -
    def _attach_freq(pair_ds, key_col: str, out_col: str, carry: list[str]):
        pair_schema = {c: (object if c in ("w1", "w2") else np.int64) for c in carry}
        out_empty = typed_empty(**pair_schema, **{out_col: np.int64})

        def tag_pairs(batch: pa.Table) -> pa.Table:
            cols = {"term": batch[key_col], "freq": pa.array(np.zeros(batch.num_rows, np.int64))}
            for c in carry:
                cols[c] = batch[c]
            cols["is_uni"] = pa.array(np.zeros(batch.num_rows, np.int8))
            return pa.table(cols)

        def tag_uni(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"term": batch["term"], "freq": batch["freq"]}
            for c in carry:
                if c in ("w1", "w2"):
                    cols[c] = pa.array([""] * n, type=pa.string())
                else:
                    cols[c] = pa.array(np.zeros(n, np.int64))
            cols["is_uni"] = pa.array(np.ones(n, np.int8))
            return pa.table(cols)

        tagged = pair_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
            uni.map_batches(tag_uni, batch_format="pyarrow")
        )

        def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return out_empty.copy()
            u = df[df["is_uni"] == 1].groupby("term")["freq"].sum()
            pr = df[df["is_uni"] == 0]
            if pr.empty:
                return out_empty.copy()
            out = pr[carry].copy()
            # every pair token was observed, so the map is total
            out[out_col] = pr["term"].map(u).astype(np.int64)
            return out

        return bucketed_aggregate(
            tagged, ["term"], join_bucket, n_buckets=n_buckets,
            empty=out_empty, coalesce_first=False,
        )

    with_cx = _attach_freq(pairs, "w1", "c_x", ["w1", "w2", "c_xy"])
    with_cy = _attach_freq(with_cx, "w2", "c_y", ["w1", "w2", "c_xy", "c_x"])

    def score(batch: pa.Table) -> pa.Table:
        scores = [
            int(1_000_000 * cxy * total // (cx * cy))
            for cxy, cx, cy in zip(
                batch["c_xy"].to_pylist(),
                batch["c_x"].to_pylist(),
                batch["c_y"].to_pylist(),
            )
        ]
        out = batch.select(["w1", "w2", "c_xy"])
        return out.append_column("score_x1m", pa.array(scores, type=pa.int64()))

    def top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["score_x1m", "w1", "w2"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)
        return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False).replace_schema_metadata(None)

    return (
        with_cy.map_batches(score, batch_format="pyarrow")
        .repartition(1)
        .map_batches(top, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# priority sampling (deterministic weighted sampling without replacement)
# ---------------------------------------------------------------------------


def priority_sample(
    ds,
    *,
    k: int = 50,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
):
    """Deterministic weighted sampling without replacement — priority
    sampling (Duffield–Lund–Thorup 2007): each row gets priority key
    ``md5_u64(id) >> 1) // max(weight, 1)`` (a fixed uniform 63-bit hash
    standing in for the random u, divided by the row weight) and the k
    smallest keys win, so selection probability grows with the weight
    while staying exactly reproducible (same md5 expressible in the
    DuckDB oracle; the >>1 keeps the key in signed-int64 range).

    Scale shape: per-batch partial top-k (a batch's global winners are
    necessarily among its local winners), then one distributed
    sort+limit over ≤ #blocks·k tiny rows — the corpus is never
    co-located and no driver structure exceeds the result size.
    Weighted corpus subsampling ("sample documents ∝ length/quality")
    is a standard curation step the reference lacks entirely
    (datagen/h5_to_parquet.py keeps every row).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = np.maximum(
            batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64), 1
        ).astype(np.uint64)
        h = md5_u64_many([str(v) for v in ids]) >> np.uint64(1)
        key = (h // w).astype(np.int64)
        order = np.lexsort((ids, key))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "sample_key": pa.array(key[order], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["sample_key", id_col])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer TRAINING, not just application)
# ---------------------------------------------------------------------------


def _apply_merge_batch(strs: list, left: str, right: str) -> list:
    """Greedy left-to-right application of one BPE merge to 2-space-joined
    token strings — vectorized over the batch's flattened token stream.

    Semantics are pinned to SQL ``replace(s, ' L  R ', ' L_R ')`` on the
    two-space representation: non-overlapping matches taken left to
    right, which for runs of consecutive matches (only possible when
    L == R) means alternate positions from the run head."""
    seqs = [s.strip("\x20").split("  ") if s.strip() else [] for s in strs]
    lens = np.array([len(t) for t in seqs], dtype=np.int64)
    if not lens.sum():
        return strs
    flat = np.array([w for t in seqs for w in t], dtype=object)
    n = len(flat)
    if n < 2:
        return strs
    ends = np.cumsum(lens)
    same_doc = np.ones(n - 1, dtype=bool)
    # no pair across doc boundaries (empty docs collapse onto their
    # neighbor's end — clamp to valid pair indices)
    bnd = ends[:-1] - 1
    same_doc[bnd[(bnd >= 0) & (bnd < n - 1)]] = False
    m = same_doc & (flat[:-1] == left) & (flat[1:] == right)
    idx = np.flatnonzero(m)
    if idx.size:
        # runs of consecutive match positions → keep alternate from head
        new_run = np.empty(idx.size, dtype=bool)
        new_run[0] = True
        new_run[1:] = np.diff(idx) > 1
        run_id = np.cumsum(new_run) - 1
        run_head = idx[new_run][run_id]
        sel = idx[((idx - run_head) % 2) == 0]
        flat[sel] = left + "_" + right
        drop = np.zeros(n, dtype=bool)
        drop[sel + 1] = True
        doc_of = np.searchsorted(ends, sel, side="right")
        lens = lens - np.bincount(doc_of, minlength=len(lens))
        flat = flat[~drop]
    out = []
    pos = 0
    for k in lens:
        out.append(" " + "  ".join(flat[pos : pos + k]) + " " if k else " ")
        pos += k
    return out


def bpe_merges(ds, *, column: str = "text", n_merges: int = 4):
    """Learn ``n_merges`` BPE merges over whitespace tokens → DataFrame
    ``(step, lhs, rhs, cnt)`` — the TRAINING loop of a byte-pair/
    word-piece tokenizer (Sennrich et al. 2016), not its application
    (:func:`encode_documents` covers that): each step counts adjacent
    token pairs corpus-wide, takes the most frequent (ties broken
    lexicographically), and rewrites every sequence with the merged
    token ``left_right`` before the next census.

    Exactness: sequences live as 2-space-joined strings and the merge
    applies greedily left-to-right (``_apply_merge_batch``) — precisely
    the semantics of SQL ``replace`` on that representation, so a DuckDB
    oracle replays the whole loop with n_merges unrolled CTE stages,
    value-for-value including tie-breaks.

    Scale shape: per step, ONE pair-census shuffle (per-batch partial
    counts → groupby sum — the pair vocabulary, the same bounded census
    every BPE trainer maintains) and a distributed ``sort + limit(1)``
    argmax — the driver holds one (left, right, cnt) row per step, never
    a census; the rewrite pass is shuffle-free and the state Dataset is
    re-materialized once per step (n_merges is small by construction —
    real tokenizers train on a bounded sample, not the full corpus).
    """
    from ray.data.aggregate import Sum

    def to_seq(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch[column].to_pylist():
            toks = [w for w in (t or "").split(" ") if w]
            out.append(" " + "  ".join(toks) + " " if toks else " ")
        return pa.table({"s": pa.array(out, pa.string())})

    def pair_partial(batch: pa.Table) -> pa.Table:
        strs = batch["s"].to_pylist()
        ls, rs = [], []
        for s in strs:
            toks = s.strip("\x20").split("  ") if s.strip() else []
            ls.extend(toks[:-1])
            rs.extend(toks[1:])
        if not ls:
            return pa.table(
                {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        g = (
            pd.DataFrame({"l": ls, "r": rs})
            .groupby(["l", "r"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    cur = ds.map_batches(to_seq, batch_format="pyarrow").materialize()
    merges = []
    for step in range(1, n_merges + 1):
        census = (
            cur.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        top = (
            census.sort(["cnt", "l", "r"], descending=[True, False, False])
            .limit(1)
            .to_pandas()  # ONE row — the distributed argmax
        )
        if top.empty or int(top["cnt"].iloc[0]) < 1:
            break
        left, right, cnt = str(top["l"].iloc[0]), str(top["r"].iloc[0]), int(top["cnt"].iloc[0])
        merges.append((step, left, right, cnt))

        def apply(batch: pa.Table, _l=left, _r=right) -> pa.Table:
            return pa.table(
                {"s": pa.array(_apply_merge_batch(batch["s"].to_pylist(), _l, _r))}
            )

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return pd.DataFrame(
        merges, columns=["step", "lhs", "rhs", "cnt"]
    ).astype({"step": np.int64, "cnt": np.int64})


def shard_assign(ds, *, id_col: str = "doc_id", shard_size: int = 64, n_buckets: int = 256):
    """Deterministic training-shard assignment: order rows by
    ``(md5_u64(id), id)`` — a reproducible global shuffle — and cut that
    order into fixed-size shards: ``shard_id = global_rank //
    shard_size``. Returns ``(id, rank, shard_id)``. This is the step
    that turns a curated corpus into numbered training shards (WebDataset
    / tfrecord style) with a stable doc→shard mapping any worker can
    recompute.

    Scale shape: a GLOBAL SORT IS NEVER RUN. Distributed ranking runs in
    two passes over hash-RANGE buckets (``hv >> (64 − log2 B)``, so
    bucket order ≡ hash order): pass 1 histograms rows per bucket
    (per-batch bincount partials → one B-row fold) and the driver
    prefix-sums B offsets; pass 2 shuffles once on the bucket id, each
    bucket sorts only ITS rows (hash-uniform ≈ n/B of the corpus —
    raise B with the cluster, the offsets table stays tiny), and
    ``bucket_offset + local_rank`` is the exact global rank. md5
    uniformity bounds skew; ties on colliding hashes break by id on both
    sides.
    """
    SHIFT = np.uint64(64 - int(np.log2(n_buckets)))
    assert 1 << (64 - int(SHIFT)) == n_buckets, "n_buckets must be a power of two"

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        hv = md5_u64_many([str(v) for v in ids.tolist()])
        return pa.table(
            {
                id_col: pa.array(ids),
                # sign-flip keeps unsigned hash ORDER under int64 sorting
                "hv": pa.array((hv ^ np.uint64(1 << 63)).view(np.int64)),
                "__bk": pa.array((hv >> SHIFT).astype(np.int64)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def counts(batch: pa.Table) -> pa.Table:
        bk, n = np.unique(batch["__bk"].to_numpy(), return_counts=True)
        return pa.table({"__bk": pa.array(bk), "n": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        tagged.map_batches(counts, batch_format="pyarrow")
        .groupby("__bk")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ n_buckets tiny rows
    )
    offsets = np.zeros(n_buckets, dtype=np.int64)
    if len(hist):
        per = np.zeros(n_buckets, dtype=np.int64)
        per[hist["__bk"].to_numpy()] = hist["n"].to_numpy()
        offsets[1:] = np.cumsum(per)[:-1]

    empty = typed_empty(**{id_col: np.int64, "rank": np.int64, "shard_id": np.int64})

    def rank_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        order = np.lexsort((group[id_col].to_numpy(), group["hv"].to_numpy()))
        ids = group[id_col].to_numpy()[order]
        base = offsets[int(group["__bk"].iloc[0])]
        rank = base + np.arange(len(ids), dtype=np.int64)
        return pd.DataFrame(
            {id_col: ids, "rank": rank, "shard_id": rank // shard_size}
        )

    return tagged.groupby("__bk").map_groups(rank_bucket, batch_format="pandas")


def feature_hashing(ds, *, n_features: int = 1024, text_col: str = "text", id_col: str = "doc_id"):
    """Hashing-trick vectorizer (Weinberger et al. 2009): every document
    becomes sparse (doc_id, feat, n) triples with ``feat = md5_u64(token)
    % n_features`` — the fixed-width feature space that makes downstream
    linear models / importance estimators shuffle-free regardless of
    vocabulary size (no vocab induction pass, no OOV).

    Scale shape: one shuffle-free map pass; per-batch the token stream is
    hashed once per DISTINCT token (Zipf memo) and collapsed with a
    vectorized (doc, feat) groupby, so output rows ≤ min(tokens,
    docs·n_features)."""
    from ..util import tok_hash_cache

    nf = np.uint64(n_features)

    def per_batch(batch: pa.Table) -> pa.Table:
        # Vectorized: md5 once per DISTINCT token via the shared Arrow
        # tokenize-factorize-hash kernel, then the (doc, feat) collapse
        # is one np.unique over a fused key. No Python per token.
        starts, doc_sel, th = batch_token_hash_flat(
            batch[text_col], cache=tok_hash_cache()
        )
        if len(th) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "feat": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        parent = np.repeat(doc_sel, np.diff(np.r_[starts, len(th)]))
        feat = (th % nf).astype(np.int64)
        uk, n = np.unique(parent * np.int64(n_features) + feat, return_counts=True)
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(
                    ids_np[uk // np.int64(n_features)].astype(np.int64)
                ),
                "feat": pa.array(uk % np.int64(n_features)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    # docs never split across batches, so per-batch (doc, feat) collapse
    # is already the final answer — no shuffle needed
    return ds.map_batches(per_batch, batch_format="pyarrow")


def _hashed_bigrams(tokens: list[str], cache, nf: np.uint64) -> np.ndarray:
    """md5-hashed adjacent-pair features ("w1 w2") mod nf, int64."""
    if len(tokens) < 2:
        return np.empty(0, np.int64)
    return np.fromiter(
        (int(np.uint64(cache[a + " " + b]) % nf) for a, b in zip(tokens, tokens[1:])),
        np.int64,
        len(tokens) - 1,
    )


def _hashed_bigram_stream(col, cache, nf: np.uint64):
    """Vectorized :func:`_hashed_bigrams` for a whole Arrow column:
    adjacent pairs via two shifted slices + one ``binary_join`` kernel,
    md5 once per DISTINCT bigram string (Zipf memo). Returns
    ``(parent, f)`` — the row index and hashed feature of every bigram
    instance in doc-major order; pairs never cross doc boundaries."""
    flat, parent = batch_tokens_flat(col)
    L = len(parent)
    if L < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    valid = parent[:-1] == parent[1:]
    if not valid.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    big = pc.binary_join_element_wise(
        flat.slice(0, L - 1), flat.slice(1, L - 1), " "
    ).filter(pa.array(valid))
    enc = big.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    vh = np.fromiter((cache[w] for w in vocab), np.uint64, len(vocab))
    f = (vh % nf).astype(np.int64)[enc.indices.to_numpy(zero_copy_only=False)]
    return parent[:-1][valid], f


def target_affinity(
    ds,
    *,
    target_lang: str = "en",
    n_features: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
):
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): documents are scored
    by how much their hashed-bigram features overlap a TARGET
    distribution — here the integer-exact proxy ``score(d) = Σ_f
    tf(d, f) · target_count(f)`` over ``n_features`` hashed buckets
    (DSIR's log-ratio weight needs float logs; the dot product against
    the raw target histogram ranks identically for selection gates and
    stays oracle-exact).

    Scale shape: pass 1 folds per-batch K-vector partials of the target
    docs' bigram counts (each partial is ONE K-length row, the driver
    fold is O(#blocks · K) — K is fixed at 4096, independent of corpus
    size); the folded histogram broadcasts once via ``ray.put``. Pass 2
    is a shuffle-free map: per doc, histogram-gather + dot. Docs with <2
    tokens emit no row (no bigram support — documented convention)."""
    import ray

    from ..util import tok_hash_cache

    nf = np.uint64(n_features)

    def target_partial(batch: pa.Table) -> pa.Table:
        # Vectorized: one bigram-hash pass for the whole batch, then
        # the histogram folds only the pairs whose doc is target-class.
        counts = np.zeros(n_features, np.int64)
        parent, f = _hashed_bigram_stream(batch[text_col], tok_hash_cache(), nf)
        if len(f):
            is_tgt = pc.equal(
                pc.fill_null(batch[lang_col], ""), target_lang
            ).to_numpy(zero_copy_only=False)
            sel = is_tgt[parent]
            if sel.any():
                np.add.at(counts, f[sel], 1)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    hist = np.zeros(n_features, np.int64)
    for b in ds.map_batches(
        target_partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for payload in b["counts"].to_pylist():
            hist += np.frombuffer(payload, np.int64)
    ref = ray.put(hist)

    def score(batch: pa.Table) -> pa.Table:
        # Vectorized: histogram-gather + per-doc segment sum; docs with
        # no bigram (< 2 tokens) emit no row, as before.
        h = ray.get(ref)
        parent, f = _hashed_bigram_stream(batch[text_col], tok_hash_cache(), nf)
        if not len(f):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "affinity": pa.array([], pa.int64()),
                }
            )
        per_doc = np.zeros(batch.num_rows, np.int64)
        np.add.at(per_doc, parent, h[f])
        present = np.zeros(batch.num_rows, bool)
        present[parent] = True
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids_np[present].astype(np.int64)),
                "affinity": pa.array(per_doc[present]),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
