"""Corpus text analysis: language ID, quality scoring, token counting,
fingerprinting — the per-document scoring stages a training-data pipeline
runs at 100 TB (mission brief), generalizing the reference's (dead)
token-count pass (h5_to_parquet.py:108-142, SURVEY.md T6/A3).

Every operator is a vectorized ``map_batches`` body over one string
column; outputs are integers or hex strings (never floats) so the DuckDB
oracle comparison is exact. Hashes are md5-derived (util.py) for
cross-engine reproducibility.

Scale notes: all stages here are embarrassingly parallel (no shuffle);
regexes compile once per worker process at module import; global sums are
partial-aggregated per batch and combined with one tiny ``Dataset.sum``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import (
    batch_token_hash_flat,
    batch_tokens_flat,
    md5_u64,
    md5_u64_many,
    md5_hex16,
    tok_hash_cache,
)

# whitespace token + "BPE-ish" subword-shaped pieces (letters / digits /
# single punctuation), compiled once per worker
WS_TOKEN = re.compile(r"\S+")
BPE_TOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

#: tiny disjoint stopword lists (language-ID heuristic); deterministic,
#: mirrored verbatim in the SQL oracle
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "das", "und", "ist", "nicht"),
    "es": ("el", "los", "una", "por", "como"),
    "fr": ("le", "les", "et", "dans", "pour"),
    "zh": ("的", "是", "了", "在", "我"),
}
_LANGS = sorted(STOPWORDS)  # alphabetical tie-break order
_STOPSETS = {k: frozenset(v) for k, v in STOPWORDS.items()}
_EN_STOP = _STOPSETS["en"]


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """(doc_id, text) → (doc_id, n_ws_tokens, n_bpe_tokens).

    Both counts run as single Arrow RE2 kernels over the whole column
    (``count_substring_regex`` matches leftmost-first like ``findall``,
    parity pinned in tests) — no Python per row."""
    col = pc.fill_null(batch[column], "")
    ws = pc.cast(pc.count_substring_regex(col, r"\S+"), pa.int64())
    bpe = pc.cast(
        pc.count_substring_regex(col, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"),
        pa.int64(),
    )
    return pa.table(
        {"doc_id": batch["doc_id"], "n_ws_tokens": ws, "n_bpe_tokens": bpe}
    )


def _lang_preds(col) -> pa.Array:
    """Vectorized stopword language-ID for one Arrow string column:
    argmax over per-language hit counts, alphabetical tie-break, 'und'
    when no list scores a hit. One tokenize pass + one ``pc.is_in``
    kernel per language (5 tiny value sets) — no Python per row/token."""
    n_rows = len(col)
    flat, parent = batch_tokens_flat(col)
    counts = np.zeros((len(_LANGS), n_rows), np.int64)
    for j, lang in enumerate(_LANGS):  # alphabetical → deterministic tie-break
        hits = pc.is_in(
            flat, value_set=pa.array(STOPWORDS[lang], type=pa.string())
        ).to_numpy(zero_copy_only=False)
        if hits.any():
            np.add.at(counts[j], parent[hits], 1)
    best = counts.argmax(axis=0)  # first max wins = alphabetical
    langs_arr = np.array(_LANGS, dtype=object)
    preds = langs_arr[best]
    preds[counts.max(axis=0) == 0] = "und"
    return pa.array(list(preds), type=pa.string())


def lang_id_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """(doc_id, text) → (doc_id, pred_lang) via :func:`_lang_preds`."""
    return pa.table(
        {"doc_id": batch["doc_id"], "pred_lang": _lang_preds(batch[column])}
    )


def lang_confusion(ds, *, text_col: str = "text", label_col: str = "lang"):
    """Model-eval confusion matrix for the stopword language-ID
    heuristic: (lang, pred_lang, n_docs) over the whole corpus — the
    label-vs-prediction cross-tab every classifier-gated pipeline needs
    before trusting a filter at 100 TB.

    Scale shape: shuffle-free — each batch predicts vectorized
    (:func:`lang_id_batch` internals) and folds its own (label, pred)
    partial with ONE Arrow hash-aggregate (cardinality ≤ |langs|² — a
    few dozen cells), and the driver merges O(#blocks · cells) rows.
    Returns a pandas DataFrame sorted by (lang, pred_lang).
    """
    import pandas as pd

    from ..util import typed_empty

    def partial(batch: pa.Table) -> pa.Table:
        pairs = pa.table(
            {"lang": batch[label_col], "pred_lang": _lang_preds(batch[text_col])}
        )
        agg = pairs.group_by(["lang", "pred_lang"]).aggregate([([], "count_all")])
        return agg.rename_columns(["lang", "pred_lang", "n_docs"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return typed_empty(lang=object, pred_lang=object, n_docs=np.int64)
    out = parts.groupby(["lang", "pred_lang"], as_index=False)["n_docs"].sum()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values(["lang", "pred_lang"]).reset_index(drop=True)


def char_class_profile_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-doc character-class composition ×1000 (floor): per-mille of
    code points that are ASCII letters, digits, whitespace, and other —
    the fastText/CCNet-style symbol-ratio signals a web-scale quality
    filter gates on (a page that is 40 % digits or 30 % punctuation is
    a table dump or boilerplate, not prose). Empty docs emit zeros.

    Four Arrow RE2 kernels over the whole column — no Python per row.
    """
    col = pc.fill_null(batch[column], "")
    n = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    letters = (
        pc.count_substring_regex(col, r"[A-Za-z]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    digits = (
        pc.count_substring_regex(col, r"[0-9]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    spaces = (
        pc.count_substring_regex(col, r"\s")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    other = n - letters - digits - spaces
    safe = np.maximum(n, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n),
            "letter_pm": pa.array(np.where(n > 0, 1000 * letters // safe, 0)),
            "digit_pm": pa.array(np.where(n > 0, 1000 * digits // safe, 0)),
            "space_pm": pa.array(np.where(n > 0, 1000 * spaces // safe, 0)),
            "other_pm": pa.array(np.where(n > 0, 1000 * other // safe, 0)),
        }
    )


def quality_score_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Integer quality components: length, token count, mean token length
    ×100 (floor), stopword per-cent (floor) — the length/punct/stopword
    heuristics of a web-scale quality filter, made exactly comparable."""
    # All four components as Arrow kernels over the whole column:
    # Σ token length ≡ codepoints − whitespace chars (tokens are maximal
    # non-\s runs, parity pinned in tests); stopword hits over
    # SPACE-split tokens (exactly the oracle's str_split(text,' ') and
    # lang_id's tokenization — \S+ tokens diverge on tabs/newlines).
    n = batch.num_rows
    col = pc.fill_null(batch[column], "")
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    n_toks = (
        pc.count_substring_regex(col, r"\S+")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_ws_chars = (
        pc.count_substring_regex(col, r"\s")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    sum_tok_len = n_chars - n_ws_chars
    flat, parent = batch_tokens_flat(col)
    n_stop = np.zeros(n, np.int64)
    hits = pc.is_in(
        flat, value_set=pa.array(sorted(_EN_STOP), type=pa.string())
    ).to_numpy(zero_copy_only=False)
    if hits.any():
        np.add.at(n_stop, parent[hits], 1)
    k_safe = np.maximum(n_toks, 1)
    mean_len = np.where(n_toks > 0, (100 * sum_tok_len) // k_safe, 0)
    stop_pct = np.where(n_toks > 0, (100 * n_stop) // k_safe, 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "q_chars": pa.array(n_chars),
            "q_tokens": pa.array(n_toks),
            "q_mean_tok_len_x100": pa.array(mean_len),
            "q_stop_pct": pa.array(stop_pct),
        }
    )


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Content fingerprint: first 16 hex chars of md5(text)."""
    texts = batch[column].to_pylist()
    fp = pa.array([md5_hex16(t or "") for t in texts], type=pa.string())
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": fp})


def simhash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """64-bit SimHash over whitespace tokens (multiset), as hex string.

    bit b of the signature is 1 iff sum over tokens of ±1 (sign = bit b of
    md5_u64(token)) is > 0 — the standard Charikar construction with a
    cross-engine-reproducible token hash. Token-less docs emit NO row
    (the oracle's token CTE produces none for them; a 0-sentinel row would
    desync row counts AND make any two empty docs a hamming-0 dup pair).
    """
    starts, doc_sel, th = batch_token_hash_flat(batch[column])
    if len(starts) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=batch["doc_id"].type),
                "simhash": pa.array([], type=pa.string()),
            }
        )
    # segmented bit votes: for each bit b, per-doc ones-count via one
    # np.add.reduceat pass; sum over tokens of ±1 > 0  ⇔  2·ones > k
    seg_len = np.diff(np.r_[starts, len(th)])
    sig = np.zeros(len(starts), dtype=np.uint64)
    for b in range(64):
        bit = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, starts)
        sig |= (2 * ones > seg_len).astype(np.uint64) << np.uint64(b)
    out_sig = [f"{int(v):016x}" for v in sig]
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(doc_sel)),
            "simhash": pa.array(out_sig, type=pa.string()),
        }
    )


def type_token_ratio_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Lexical-diversity TTR per doc: ``1000·distinct_tokens // tokens``
    (space-split, empties dropped; token-less docs emit NO row).

    Fully vectorized and HASH-FREE: one Arrow tokenize/factorize pass
    gives exact vocabulary codes (so "distinct" means distinct STRINGS,
    bit-equal to the oracle's COUNT(DISTINCT)), then one lexsort by
    (doc, code) + segmented change-count. No md5 collisions can leak
    into the ratio, unlike a hash-based distinct.
    """
    import pyarrow.compute as pc

    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    split = pc.split_pattern(col, " ")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_ne = flat.filter(pa.array(mask))
    parent_ne = parent[mask]
    if len(parent_ne) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=batch["doc_id"].type),
                "ttr_pm": pa.array([], type=pa.int64()),
            }
        )
    codes = flat_ne.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((codes, parent_ne))
    p_s, c_s = parent_ne[order], codes[order]
    starts = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
    doc_sel = p_s[starts]
    new_tok = np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])]
    distinct = np.add.reduceat(new_tok.astype(np.int64), starts)
    total = np.diff(np.r_[starts, len(p_s)])
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(doc_sel)),
            "ttr_pm": pa.array(1000 * distinct // total, type=pa.int64()),
        }
    )


# rolling (Karp-Rabin) fingerprint over Unicode CODE POINTS (base 257 mod
# 2^61-1); Python ints keep the modular arithmetic exact, and DuckDB
# reproduces it with a HUGEINT list_reduce over ascii(char) — folding over
# code points instead of UTF-8 bytes is what makes the oracle expressible
_KR_BASE = 257
_KR_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * _KR_BASE + ord(ch)) % _KR_MOD
    return h


def rolling_fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = batch[column].to_pylist()
    fp = pa.array([f"{rolling_fingerprint(t or ''):016x}" for t in texts], type=pa.string())
    return pa.table({"doc_id": batch["doc_id"], "kr_fingerprint": fp})


def repetition_scores_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Gopher/RefinedWeb-style intra-document repetition signals, integer
    per-mille (the "remove documents that repeat themselves" quality
    rules of large-corpus curation):

    - ``top_bigram_permille``: share of bigram slots taken by the single
      most frequent bigram — high for boilerplate loops;
    - ``dup_trigram_permille``: share of trigram slots whose trigram
      already appeared earlier in the doc (1 − distinct/total).

    Docs with < 3 space-split tokens emit NO row (no trigram support —
    the oracle's token CTE filters identically). Shuffle-free: each
    doc's text is a single row, so the scores are a pure map.
    """
    ids: list = []
    top_bg: list[int] = []
    dup_tg: list[int] = []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[column].to_pylist()):
        toks = [w for w in (t or "").split(" ") if w]
        if len(toks) < 3:
            continue
        bg: dict[tuple[str, str], int] = {}
        for i in range(len(toks) - 1):
            key = (toks[i], toks[i + 1])
            bg[key] = bg.get(key, 0) + 1
        n_bg = len(toks) - 1
        tg = {(toks[i], toks[i + 1], toks[i + 2]) for i in range(len(toks) - 2)}
        n_tg = len(toks) - 2
        ids.append(did)
        top_bg.append(1000 * max(bg.values()) // n_bg)
        dup_tg.append(1000 * (n_tg - len(tg)) // n_tg)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=batch["doc_id"].type),
            "top_bigram_permille": pa.array(top_bg, type=pa.int64()),
            "dup_trigram_permille": pa.array(dup_tg, type=pa.int64()),
        }
    )


def json_int_field_batch(
    batch: pa.Table,
    *,
    column: str = "props",
    key: str = "k",
    out: str | None = None,
    missing: int = -1,
) -> pa.Table:
    """Extract an integer field from a JSON-string column — the
    semi-structured projection op of event/clickstream ELT ("pull
    ``$.k`` out of the props blob"). Vectorized: one compiled-regex
    ``Series.str.extract`` pass over the batch (no per-row json.loads —
    the field grammar ``"key": int`` is regular). Rows where the key is
    absent / non-integer get ``missing``. Shuffle-free pure map; the
    JSON column is dropped on output (projection narrows the stream).
    """
    import pandas as pd

    out = out or key
    pat = re.compile(r'"' + re.escape(key) + r'"\s*:\s*(-?\d+)')
    s = pd.Series(batch[column].to_pylist(), dtype=object).fillna("")
    vals = (
        s.str.extract(pat, expand=False)
        .fillna(str(missing))
        .astype(np.int64)
        .to_numpy()
    )
    keep = [n for n in batch.column_names if n != column]
    return batch.select(keep).append_column(out, pa.array(vals, type=pa.int64()))


def distinct_token_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """(doc_id, text) → (doc_id, distinct_toks, n_toks, ttr_pm): distinct
    and total space-split tokens plus the type-token ratio in per-mille
    (floor; 0 for token-less docs). The lexical-diversity quality signal
    (low TTR ⇒ repetitive/templated text). Shuffle-free map_batches;
    tokens are SPACE-split (the oracle's str_split(text,' ') convention,
    see quality_score_batch)."""
    texts = batch[column].to_pylist()
    n = len(texts)
    dt = np.empty(n, np.int64)
    nt = np.empty(n, np.int64)
    ttr = np.empty(n, np.int64)
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").split(" ") if w]
        k = len(toks)
        d = len(set(toks))
        dt[i] = d
        nt[i] = k
        ttr[i] = (1000 * d) // k if k else 0
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "distinct_toks": pa.array(dt),
            "n_toks": pa.array(nt),
            "ttr_pm": pa.array(ttr),
        }
    )


def hash_embed_batch(
    batch: pa.Table,
    *,
    dim: int = 64,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> pa.Table:
    """Feature-hashed n-gram embedding (the hashing trick, Weinberger et
    al. 2009), INTEGER counts: ``vec[d] = #{distinct n-gram shingles g of
    the doc : md5_u64(g) % dim == d}``. A deterministic, model-free text
    embedding whose exact-integer arithmetic lets downstream cosine
    thresholds be checked without floats — so "semantic" text dedup gets
    the same exact DuckDB oracle as everything else. Token-less docs emit
    no row (the oracles' tok-CTE convention)."""
    out_id, out_vec, out_keep = [], [], {k: [] for k in keep_cols}
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    keeps = {k: batch[k].to_pylist() for k in keep_cols}
    for i, (did, t) in enumerate(zip(ids, texts)):
        toks = [w for w in (t or "").split(" ") if w]
        grams = {" ".join(toks[j : j + ngram]) for j in range(len(toks) - ngram + 1)}
        if not grams:
            continue
        d = (md5_u64_many(sorted(grams)) % np.uint64(dim)).astype(np.int64)
        vec = np.bincount(d, minlength=dim).astype(np.int64)
        out_id.append(did)
        out_vec.append(vec.tolist())
        for k in keep_cols:
            out_keep[k].append(keeps[k][i])
    cols = {
        id_col: pa.array(out_id, type=pa.int64()),
        "vec": pa.array(out_vec, type=pa.list_(pa.int64())),
    }
    for k in keep_cols:
        cols[k] = pa.array(out_keep[k])
    return pa.table(cols)


def winnow_batch(
    batch: pa.Table,
    *,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS local fingerprinting scheme): hash every ``k``-token shingle,
    slide a ``w``-hash window over the sequence, and keep each window's
    minimal hash — selection is position-local, so two documents sharing
    any run of ≥ ``w + k - 1`` tokens are guaranteed to share a
    fingerprint, while only ~1/w of the shingles are kept. The standard
    near-dup/plagiarism index between whole-doc md5 (``fingerprint_md5``)
    and full MinHash signatures.

    Contract (mirrored exactly by the DuckDB oracle):
    - tokens are SPACE-split, empties dropped; docs with < ``k`` tokens
      emit nothing;
    - shingle ``pos`` is 1-based; its hash is ``md5_u64`` of the
      space-joined shingle (= first 16 md5 hex chars, so lexicographic
      string order ≡ numeric u64 order);
    - windows cover positions ``j .. j+w-1``; a doc with fewer than
      ``w`` shingles is one truncated window;
    - each window selects its LEFTMOST minimal hash (numpy ``argmin``
      first-occurrence ≡ DuckDB ``list_position``); selections dedupe
      per document.

    Output: one row per selected (doc_id, pos, fp-hex16). Shuffle-free
    ``map_batches`` — per-doc numpy sliding-window argmin, one md5 per
    DISTINCT shingle per batch (memoized)."""
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_pylist()
    out_id: list = []
    out_pos: list[np.ndarray] = []
    out_fp: list[str] = []
    memo: dict[str, int] = {}
    for d, t in zip(ids, texts):
        toks = [x for x in (t or "").split(" ") if x]
        if len(toks) < k:
            continue
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = np.fromiter(
            (
                memo[g] if g in memo else memo.setdefault(g, md5_u64(g))
                for g in grams
            ),
            dtype=np.uint64,
            count=len(grams),
        )
        if len(hs) >= w:
            sw = np.lib.stride_tricks.sliding_window_view(hs, w)
            sel = sw.argmin(axis=1) + np.arange(len(hs) - w + 1)
        else:
            sel = np.array([int(hs.argmin())])
        sel = np.unique(sel)
        for p in sel:
            out_id.append(d)
            out_fp.append(f"{int(hs[p]):016x}")
        out_pos.append(sel + 1)
    pos = (
        np.concatenate(out_pos) if out_pos else np.array([], np.int64)
    ).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(out_id, type=batch[id_col].type),
            "pos": pa.array(pos),
            "fp": pa.array(out_fp, type=pa.string()),
        }
    )


def token_gini_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Per-document lexical CONCENTRATION via Gini impurity —
    ``gini_x1m = 10^6 · (n² − Σ c_t²) // n²`` over the token-frequency
    histogram (n tokens, c_t per distinct token). The rational stand-in
    for token entropy (which is transcendental — no exact cross-engine
    contract): 0 = one token repeated (template/spam page), → 10^6 as
    the distribution flattens. Complements TTR (`distinct_token_batch`):
    TTR counts types, Gini weights their balance — a doc repeating one
    word 90% of the time has low Gini but can still have many types.

    Shuffle-free ``map_batches``; one numpy bincount per doc over
    factorized tokens. Token-less docs emit no row (the corpus
    convention)."""
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_pylist()
    out_id: list = []
    out_n: list[int] = []
    out_g: list[int] = []
    for d, t in zip(ids, texts):
        toks = [w for w in (t or "").split(" ") if w]
        n = len(toks)
        if not n:
            continue
        _, counts = np.unique(toks, return_counts=True)
        c2 = int((counts.astype(np.int64) ** 2).sum())
        out_id.append(d)
        out_n.append(n)
        out_g.append((1_000_000 * (n * n - c2)) // (n * n))
    return pa.table(
        {
            id_col: pa.array(out_id, type=batch[id_col].type),
            "n_toks": pa.array(out_n, type=pa.int64()),
            "gini_x1m": pa.array(out_g, type=pa.int64()),
        }
    )
