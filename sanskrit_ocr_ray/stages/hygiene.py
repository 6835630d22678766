"""Corpus-hygiene operators: contamination, salience, search, incremental dedup.

The checks a training-data pipeline runs between "deduplicated corpus"
and "shippable dataset": does any training document leak the eval set
(n-gram contamination), what are each document's distinguishing terms
(TF-IDF), which documents match an ad-hoc keyword query, and which of a
new crawl's documents are already in the previous snapshot. None exist
in the reference (its pipeline ends at parquet shards,
datagen/augmentations/generate_dataset.py); all follow this engine's
house rules:

- ranking scores are INTEGER (``tf * 1_000_000 // df``) and every hash
  is md5-derived, so each operator has an exact DuckDB oracle;
- high-cardinality grouping (grams, terms, fingerprints, doc ids) goes
  through :func:`..stages.dedup.bucketed_aggregate` — one bounded-bucket
  shuffle, vectorized pandas combine per bucket, never per-key dispatch;
- the only driver-side state is final top-k merges of ≤ buckets×k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import batch_tokens_flat, md5_hex16, typed_empty

#: per-mille integer scale for TF-IDF-style scores (int64-safe: tf ≤ 10⁹)
SCORE_SCALE = 1_000_000


def _tokens(text: str | None) -> list[str]:
    """Space-split, empty-dropped tokens — the corpus-wide convention
    shared with lang_id/ngram_top and the oracles' str_split CTEs."""
    return [w for w in (text or "").split(" ") if w]


def _tf_rows_vec(batch: pa.Table, id_col: str, text_col: str):
    """Per-doc distinct-term frequencies for a whole batch, vectorized:
    one Arrow tokenize + ``dictionary_encode`` pass, then the (doc,
    term) multiset collapses with a single ``np.unique`` over a fused
    row×vocab integer key — no Python per token instance. Returns
    ``(doc_ids, terms, tfs)`` Arrow arrays in (doc, term-code) order;
    token-less docs contribute nothing."""
    flat, parent = batch_tokens_flat(batch[text_col])
    ids_np = batch[id_col].to_numpy(zero_copy_only=False)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = max(len(enc.dictionary), 1)
    uk, tf = np.unique(parent * v + codes, return_counts=True)
    return (
        pa.array(ids_np[uk // v].astype(np.int64)),
        enc.dictionary.take(pa.array(uk % v)),
        pa.array(tf.astype(np.int64)),
    )


# ---------------------------------------------------------------------------
# train/eval n-gram contamination
# ---------------------------------------------------------------------------


def contamination(
    train_ds,
    eval_ds,
    *,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Training docs that share at least one ``ngram``-token shingle with
    the eval corpus → (doc_id, n_contaminated) with the count of DISTINCT
    leaked shingles per doc (GPT-3-style 8-gram overlap check).

    Scale shape: both sides shingle per batch (train keeps distinct
    (gram, doc) pairs — a doc is one row, so per-batch dedup is exact;
    eval keeps distinct grams), union, ONE bucketed shuffle on the gram
    routes every copy of a shingle to one bucket where membership is a
    vectorized isin; per-bucket partial hit-counts then sum in a second
    (doc-keyed, tiny) bucketed shuffle. The eval side is never
    materialized on the driver — at 100 TB the "eval set" may itself be
    a corpus.
    """
    from .dedup import bucketed_aggregate

    def grams(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            # Vectorized shingling: one tokenize pass, then the n-gram
            # windows materialize as ONE binary_join_element_wise over
            # ``ngram`` shifted zero-copy slices of the flat token
            # stream (window valid iff its first and last token share a
            # doc); per-doc distinctness collapses via np.unique on a
            # fused row×vocab key. No Python per token instance.
            flat, parent = batch_tokens_flat(batch[text_col])
            L = len(parent)
            n_win = L - ngram + 1
            empty = pa.table(
                {
                    "gram": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "side": pa.array([], type=pa.int8()),
                }
            )
            if n_win <= 0:
                return empty
            valid = parent[:n_win] == parent[ngram - 1 :]
            if not valid.any():
                return empty
            slices = [flat.slice(j, n_win) for j in range(ngram)]
            g = pc.binary_join_element_wise(*slices, " ").filter(pa.array(valid))
            if side == 1:
                out_g = pc.unique(g)
                out_d = pa.array(np.full(len(out_g), -1, np.int64))
            else:
                p = parent[:n_win][valid]
                enc = g.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                v = max(len(enc.dictionary), 1)
                uk = np.unique(p * v + codes)
                ids_np = batch[id_col].to_numpy(zero_copy_only=False)
                out_g = enc.dictionary.take(pa.array(uk % v))
                out_d = pa.array(ids_np[uk // v].astype(np.int64))
            return pa.table(
                {
                    "gram": out_g,
                    "doc_id": out_d,
                    "side": pa.array(
                        np.full(len(out_g), side, np.int8), type=pa.int8()
                    ),
                }
            )

        return fn

    both = train_ds.map_batches(grams(0), batch_format="pyarrow").union(
        eval_ds.map_batches(grams(1), batch_format="pyarrow")
    )

    empty_hits = typed_empty(doc_id=np.int64, n_contaminated=np.int64)

    def bucket_hits(df: pd.DataFrame) -> pd.DataFrame:
        ev = df.loc[df["side"] == 1, "gram"]
        hits = df[(df["side"] == 0) & df["gram"].isin(set(ev))]
        if hits.empty:
            return empty_hits.copy()
        out = hits.groupby("doc_id", as_index=False).size()
        return out.rename(columns={"size": "n_contaminated"}).astype(np.int64)

    partial = bucketed_aggregate(
        both, ["gram"], bucket_hits, n_buckets=n_buckets, empty=empty_hits
    )

    def sum_doc(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)["n_contaminated"].sum()

    return bucketed_aggregate(
        partial, ["doc_id"], sum_doc, n_buckets=n_buckets, empty=empty_hits,
        coalesce_first=False,
    )


# ---------------------------------------------------------------------------
# per-document salient terms (TF-IDF, integer-exact)
# ---------------------------------------------------------------------------


def bm25_topk(
    ds,
    terms: list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Ranked retrieval: top-``k`` docs by an INTEGER-EXACT BM25 variant
    over the query ``terms`` (OR semantics — any matching term scores) →
    (doc_id, score).

    Unlike :func:`keyword_search` (raw term-frequency AND search), this
    weights by corpus rarity and document length, the Robertson BM25
    shape with k1 = 1.2, b = 0.75 — made bit-deterministic by two spec'd
    substitutions (both mirrored in the DuckDB oracle):

    - idf is the RATIONAL Robertson–Sparck-Jones odds, not its log:
      ``idf(t) = 10^6 · (N − df + 1) // (df + 1)`` (log is transcendental
      — no exact cross-engine contract);
    - avgdl enters as permille ``apm = 1000·L // N`` so every per-term
      score is one int64 floor division:
      ``idf·tf·88·apm // (40·tf·apm + 12·apm + 36·dl·1000)``
      (that is ``idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with the
      rationals cleared; magnitudes ≤ 10^6·tf·88·apm stay < 2^63 for any
      corpus because L only enters through apm).

    Scale shape: pass 1 is a shuffle-free partial fold to (N, L, df_t…)
    — O(#terms) scalars on the driver, never a vocabulary; pass 2
    broadcasts those scalars in the task closure, scores each batch
    vectorized, and emits per-batch top-k candidates merged on the
    driver (#blocks·k tiny rows — the keyword_search/knn_brute pattern).
    """
    tset = list(dict.fromkeys(terms))

    def stats_partial(batch: pa.Table) -> pa.Table:
        # One tokenize pass; df per term = distinct parents of matching
        # token instances (len(tset) tiny equality kernels, no Python
        # per row/token).
        flat, parent = batch_tokens_flat(batch[text_col])
        df = {}
        for q in tset:
            m = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            df[q] = int(np.unique(parent[m]).size) if m.any() else 0
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "lt": pa.array([len(parent)], pa.int64()),
                **{
                    f"df_{j}": pa.array([df[q]], pa.int64())
                    for j, q in enumerate(tset)
                },
            }
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()  # O(#blocks) rows × O(#terms) cols — scalars, not data
    )
    n_docs = int(stats["n"])
    total_len = int(stats["lt"])
    if n_docs == 0 or total_len == 0:
        return typed_empty(**{id_col: np.int64, "score": np.int64})
    apm = 1000 * total_len // n_docs
    idf = {
        q: 10**6 * (n_docs - int(stats[f"df_{j}"]) + 1)
        // (int(stats[f"df_{j}"]) + 1)
        for j, q in enumerate(tset)
    }

    def best_of_batch(batch: pa.Table) -> pa.Table:
        # Tokenize + per-term tf/dl fully vectorized; the exact-integer
        # BM25 division then runs only over the (sparse) hit rows in
        # Python bigints — counting was the hot loop, not the quotient.
        n = batch.num_rows
        flat, parent = batch_tokens_flat(batch[text_col])
        dl_np = np.zeros(n, np.int64)
        if len(parent):
            np.add.at(dl_np, parent, 1)
        tf_np = np.zeros((len(tset), n), np.int64)
        for j, q in enumerate(tset):
            m = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            if m.any():
                np.add.at(tf_np[j], parent[m], 1)
        hit_rows = np.flatnonzero(tf_np.any(axis=0))
        ids_all = batch[id_col].to_numpy(zero_copy_only=False)
        ids: list[int] = []
        scores: list[int] = []
        for i in hit_rows:
            dl = int(dl_np[i])
            s = 0
            for j, q in enumerate(tset):
                tf = int(tf_np[j, i])
                if tf:
                    s += (idf[q] * tf * 88 * apm) // (
                        40 * tf * apm + 12 * apm + 36 * dl * 1000
                    )
            if s > 0:
                ids.append(int(ids_all[i]))
                scores.append(s)
        if ids:
            df = pd.DataFrame({id_col: ids, "score": scores}).astype(np.int64)
            df = df.sort_values(
                ["score", id_col], ascending=[False, True], kind="mergesort"
            ).head(k)
        else:
            df = typed_empty(**{id_col: np.int64, "score": np.int64})
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    cand = ds.map_batches(best_of_batch, batch_format="pyarrow").to_pandas()
    if cand.empty:  # all-empty blocks come back column-less
        return typed_empty(**{id_col: np.int64, "score": np.int64})
    cand = cand.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    )
    return cand.head(k).reset_index(drop=True)


def salient_terms_by_group(
    ds,
    *,
    k: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Top-``k`` characteristic terms per GROUP (crawl source, domain,
    shard) by integer TF-IDF at group granularity:
    ``score_x1m = tf · 1_000_000 // df`` where tf counts the term's
    INSTANCES inside the group and df counts the GROUPS containing it
    (ties: term ascending) — "what characterizes each feed", the
    group-level sibling of per-document :func:`salient_terms`. Returns
    (group, term, tf, df, score_x1m, rnk).

    Scale shape: per-batch (group, term, tf) partials collapse via one
    Arrow tokenize + np.unique fused-key pass (no row per occurrence in
    the shuffle); ONE bounded term-bucket shuffle finalizes tf AND df
    and scores in place (a term's rows co-locate); a second bounded
    group-bucket shuffle ranks each group's terms with one vectorized
    sort + cumcount. Group cardinality never gates parallelism.
    """
    from .dedup import bucketed_aggregate

    def tf_rows(batch: pa.Table) -> pa.Table:
        flat, parent = batch_tokens_flat(batch[text_col])
        g_np = batch[group_col].to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = max(len(enc.dictionary), 1)
        # collapse instances by (row, term) first, then fold rows of the
        # same group value with a pandas groupby (groups per batch are
        # few; the token work stays vectorized)
        uk, tf = np.unique(parent * v + codes, return_counts=True)
        part = pd.DataFrame(
            {
                group_col: g_np[uk // v],
                "term": enc.dictionary.take(pa.array(uk % v)).to_pandas(),
                "tf": tf.astype(np.int64),
            }
        )
        agg = part.groupby([group_col, "term"], as_index=False)["tf"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False
        ).replace_schema_metadata(None)

    empty_sc = typed_empty(
        **{group_col: object, "term": object, "tf": np.int64, "df": np.int64,
           "score_x1m": np.int64}
    )

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby([group_col, "term"], as_index=False)["tf"].sum()
        dfreq = agg.groupby("term")[group_col].transform("size")
        agg["df"] = dfreq.astype(np.int64)
        agg["score_x1m"] = agg["tf"] * SCORE_SCALE // agg["df"]
        return agg[[group_col, "term", "tf", "df", "score_x1m"]].astype(
            {"tf": np.int64}
        )

    scored = bucketed_aggregate(
        ds.map_batches(tf_rows, batch_format="pyarrow"),
        ["term"],
        score_bucket,
        n_buckets=n_buckets,
        empty=empty_sc,
    )

    empty_rk = typed_empty(
        **{group_col: object, "term": object, "tf": np.int64, "df": np.int64,
           "score_x1m": np.int64, "rnk": np.int64}
    )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            [group_col, "score_x1m", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        r = g.groupby(group_col, sort=False).cumcount()
        out = g[r < k].copy()
        out["rnk"] = (r[r < k] + 1).astype(np.int64)
        return out

    return bucketed_aggregate(
        scored, [group_col], rank_bucket, n_buckets=n_buckets, empty=empty_rk,
        coalesce_first=False,
    )


def salient_terms(
    ds,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Top-``k`` salient terms per document by integer TF-IDF:
    ``score_x1m = tf * 1_000_000 // df`` (df = number of docs containing
    the term; ties break by term ascending). Returns
    (doc_id, term, tf, df, score_x1m, rnk).

    Scale shape: the (doc, term, tf) inverted-index explode is the data
    itself (Σ per-doc distinct terms rows). ONE bucketed shuffle on the
    term computes df AND joins it back within the bucket (every row of a
    term is in that bucket — no second pass over the corpus for the
    join); a second bucketed shuffle on the doc ranks each doc's terms
    with one vectorized sort + cumcount per bucket. N never enters the
    score (constant factor per corpus), so df alone makes it exact.
    """
    from .dedup import bucketed_aggregate

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = _tf_rows_vec(batch, id_col, text_col)
        return pa.table({"doc_id": ids, "term": terms, "tf": tfs})

    empty_sc = typed_empty(
        doc_id=np.int64, term=object, tf=np.int64, df=np.int64, score_x1m=np.int64
    )

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("term")["doc_id"].size()  # rows are (doc,term)-distinct
        out = df.copy()
        out["df"] = out["term"].map(dfreq).astype(np.int64)
        out["score_x1m"] = out["tf"] * SCORE_SCALE // out["df"]
        return out[["doc_id", "term", "tf", "df", "score_x1m"]]

    scored = bucketed_aggregate(
        ds.map_batches(tf_rows, batch_format="pyarrow"),
        ["term"],
        score_bucket,
        n_buckets=n_buckets,
        empty=empty_sc,
    )

    empty_rk = typed_empty(
        doc_id=np.int64, term=object, tf=np.int64, df=np.int64,
        score_x1m=np.int64, rnk=np.int64,
    )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["doc_id", "score_x1m", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        r = g.groupby("doc_id").cumcount()
        out = g[r < k].copy()
        out["rnk"] = (r[r < k] + 1).astype(np.int64)
        return out

    return bucketed_aggregate(
        scored, ["doc_id"], rank_bucket, n_buckets=n_buckets, empty=empty_rk,
        coalesce_first=False,
    )


# ---------------------------------------------------------------------------
# conjunctive keyword search, global top-k
# ---------------------------------------------------------------------------


def keyword_search(
    ds,
    terms: list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Docs containing ALL of ``terms`` (as whole tokens), ranked by total
    term frequency (ties: doc_id ascending) → top-``k`` (doc_id, score).

    Scale shape: shuffle-free — terms are a broadcast constant folded
    into the task closure, each batch emits its own ≤ k best candidates,
    and the driver merges #blocks × k tiny rows (the knn_brute partial
    top-k pattern).
    """
    tset = list(dict.fromkeys(terms))
    nterms = len(tset)

    def best_of_batch(batch: pa.Table) -> pa.Table:
        # One tokenize pass, then one pc.equal + segment-sum per query
        # term (len(tset) tiny kernels) — no Python per row/token.
        n = batch.num_rows
        flat, parent = batch_tokens_flat(batch[text_col])
        tf = np.zeros((nterms, n), np.int64)
        for j, q in enumerate(tset):
            m = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            if m.any():
                np.add.at(tf[j], parent[m], 1)
        sel = (tf > 0).all(axis=0)
        if sel.any():
            ids_np = batch[id_col].to_numpy(zero_copy_only=False)[sel]
            df = pd.DataFrame(
                {"doc_id": ids_np, "score": tf[:, sel].sum(axis=0)}
            ).astype(np.int64)
            df = df.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
        else:
            df = typed_empty(doc_id=np.int64, score=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(best_of_batch, batch_format="pyarrow").to_pandas()
    if cand.empty:  # all-empty blocks come back column-less
        return typed_empty(doc_id=np.int64, score=np.int64)
    cand = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    return cand.head(k).reset_index(drop=True)


# ---------------------------------------------------------------------------
# incremental dedup against a corpus snapshot
# ---------------------------------------------------------------------------


def incremental_dedup(
    new_ds,
    snapshot_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
):
    """New docs surviving dedup against an existing snapshot → (doc_id,
    fingerprint): drop any new doc whose content md5 already exists in
    the snapshot, then keep min(doc_id) per fingerprint among the
    remaining new docs (the daily-crawl-vs-yesterday's-corpus op).

    Scale shape: both sides reduce to 16-hex-char fingerprints at the
    map stage (text never shuffles), ONE bucketed shuffle co-locates
    equal fingerprints, and the anti-join + first-wins collapse are
    vectorized per bucket. The snapshot streams like any other dataset —
    no driver-side fingerprint set.
    """
    from .dedup import bucketed_aggregate

    def fp(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            return pa.table(
                {
                    "fingerprint": pa.array(
                        [md5_hex16(t or "") for t in texts], type=pa.string()
                    ),
                    "doc_id": pc.cast(batch[id_col], pa.int64())
                    if side == 0
                    else pa.array([-1] * len(texts), type=pa.int64()),
                    "side": pa.array([side] * len(texts), type=pa.int8()),
                }
            )

        return fn

    both = new_ds.map_batches(fp(0), batch_format="pyarrow").union(
        snapshot_ds.map_batches(fp(1), batch_format="pyarrow")
    )

    empty = typed_empty(doc_id=np.int64, fingerprint=object)

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        snap = set(df.loc[df["side"] == 1, "fingerprint"])
        new = df[(df["side"] == 0) & ~df["fingerprint"].isin(snap)]
        if new.empty:
            return empty.copy()
        out = new.groupby("fingerprint", as_index=False)["doc_id"].min()
        return out[["doc_id", "fingerprint"]]

    return bucketed_aggregate(
        both, ["fingerprint"], survivors, n_buckets=n_buckets, empty=empty
    )


def inverted_index(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus inverted-index explode: one row (term, doc_id, tf) per
    distinct term per document — the index-construction op behind
    search / TF-IDF / contamination. Term frequency is doc-local, so
    this is a pure flat map (no shuffle); the posting-list grouping, if
    wanted downstream, is :func:`token_doc_freq`'s bucketed shuffle or a
    sort on ``term``. Token-less docs emit nothing.
    """

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = _tf_rows_vec(batch, id_col, text_col)
        return pa.table({"term": terms, id_col: ids, "tf": tfs})

    return ds.map_batches(tf_rows, batch_format="pyarrow")


def token_doc_freq(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Document frequency per term: (term, df, total_tf) — the
    vocabulary-statistics op (df drives TF-IDF, stopword discovery,
    boilerplate detection). One bucketed shuffle over the inverted-index
    rows; each term lands wholly in one bucket, so the per-bucket count
    is exact and the shuffle moves O(postings), never O(corpus bytes).
    """
    from .dedup import bucketed_aggregate

    empty = typed_empty(term=object, df=np.int64, total_tf=np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", as_index=False).agg(
            df=(id_col, "size"), total_tf=("tf", "sum")
        )
        return out.astype({"df": np.int64, "total_tf": np.int64})

    return bucketed_aggregate(
        inverted_index(ds, id_col=id_col, text_col=text_col),
        ["term"],
        combine,
        empty=empty,
    )


# ---------------------------------------------------------------------------
# decontaminate (contamination's complement: the shippable corpus)
# ---------------------------------------------------------------------------


def decontaminate(
    train_ds,
    eval_ds,
    *,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Training doc ids with ZERO leaked eval ``ngram``-token shingles —
    the corpus a curator actually ships after the GPT-3-style overlap
    check. Layered on :func:`contamination`: the flagged set (docs with
    ≥1 leak) is typically a small fraction of the corpus, so removal is
    ONE extra bounded anti-join shuffle on ``doc_id``
    (`relational.hash_join(how='anti')` — both sides bucketed, flagged
    side never materialized on the driver). Returns one ``(doc_id,)``
    row per clean training doc.
    """
    from .relational import hash_join

    flagged = contamination(
        train_ds,
        eval_ds,
        ngram=ngram,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
    )
    left = train_ds.select_columns([id_col])
    return hash_join(
        left,
        flagged.map_batches(
            lambda t: t.select([id_col]), batch_format="pyarrow"
        ),
        id_col,
        how="anti",
        n_buckets=min(n_buckets, 16),
    )


# ---------------------------------------------------------------------------
# Bloom-filter pre-gate for incremental dedup
# ---------------------------------------------------------------------------


def bloom_new_docs(
    new_ds,
    snapshot_ds,
    *,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """New-crawl docs whose content is DEFINITELY absent from the
    snapshot, per a deterministic Bloom filter (Bloom 1970) over content
    md5 — the cheap pre-gate a 100-TB incremental dedup runs BEFORE the
    exact fingerprint shuffle: Bloom-dropped docs ("maybe dup", i.e. all
    ``k_hashes`` bits set) are the only ones that need the exact check,
    so the shuffle input shrinks to the (small) true-dup + false-positive
    set. Bit position j of a doc = ``md5_u64(text + '#' + j) % m_bits``
    — a fixed hash family, so the false-positive set itself is
    deterministic and the DuckDB oracle reproduces it bit-for-bit.

    Scale shape: the snapshot folds into an ``m_bits/8``-byte array via
    per-batch numpy OR partials (ONE tiny row per block); the driver ORs
    ≤ #blocks such rows (bounded by block count, never corpus size) and
    broadcasts the array once with ``ray.put``; the new crawl is then a
    shuffle-free vectorized filter. Returns one ``(doc_id,)`` row per
    definitely-new doc.
    """
    import ray

    from ..util import md5_u64_many

    n_bytes = m_bits // 8

    def positions(texts: list) -> np.ndarray:
        """(len(texts), k_hashes) bit positions."""
        keys = [f"{t or ''}#{j}" for t in texts for j in range(k_hashes)]
        h = md5_u64_many(keys) % np.uint64(m_bits)
        return h.reshape(len(texts), k_hashes)

    def partial_bits(batch: pa.Table) -> pa.Table:
        pos = positions(batch[text_col].to_pylist()).ravel()
        bits = np.zeros(n_bytes, np.uint8)
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            (1 << (pos & np.uint64(7))).astype(np.uint8),
        )
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    parts = snapshot_ds.map_batches(
        partial_bits, batch_format="pyarrow"
    ).to_pandas()  # one 8 KiB row per block
    acc = np.zeros(n_bytes, np.uint8)
    for b in parts["bits"]:
        acc |= np.frombuffer(b, np.uint8)
    ref = ray.put(acc)

    def keep_definitely_new(batch: pa.Table) -> pa.Table:
        bits = ray.get(ref)
        pos = positions(batch[text_col].to_pylist())
        hit = (
            (bits[(pos >> np.uint64(3)).astype(np.int64)]
             >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        ).all(axis=1)
        return batch.select([id_col]).filter(pa.array(~hit))

    return new_ds.map_batches(keep_definitely_new, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# unigram rarity score (LM-negative-likelihood proxy quality filter)
# ---------------------------------------------------------------------------


def rarity_score(ds, *, id_col: str = "doc_id", text_col: str = "text", n_buckets: int = 64):
    """Per-doc rarity = Σ over token INSTANCES of ``10⁹ // global_tf`` —
    an integer-exact proxy for unigram-LM negative log-likelihood
    (reciprocal frequency instead of -log p, CCNet-style "perplexity
    bucket" gating without float logs, so the oracle matches exactly).
    High score = rare-token-heavy doc (OCR noise, gibberish, boilerplate
    IDs); low = stopword-heavy. Returns (doc_id, rarity).

    Scale shape, mirroring :func:`salient_terms`: per-batch (doc, token,
    tf_doc) partials, global tf computed and joined INSIDE the token
    bucket (the corpus-wide term table never lands on the driver or in a
    closure), then one doc-keyed bucketed sum.
    """
    from .dedup import bucketed_aggregate

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = _tf_rows_vec(batch, id_col, text_col)
        return pa.table({id_col: ids, "term": terms, "tf": tfs})

    empty_part = typed_empty(**{id_col: np.int64, "part": np.int64})

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty_part.copy()
        gtf = df.groupby("term")["tf"].transform("sum")
        return pd.DataFrame(
            {id_col: df[id_col], "part": (df["tf"] * (1_000_000_000 // gtf)).astype(np.int64)}
        )

    partial = bucketed_aggregate(
        ds.map_batches(tf_rows, batch_format="pyarrow"),
        ["term"],
        score_bucket,
        n_buckets=n_buckets,
        empty=empty_part,
    )

    empty_out = typed_empty(**{id_col: np.int64, "rarity": np.int64})

    def sum_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(id_col, as_index=False)["part"].sum()
        return out.rename(columns={"part": "rarity"}).astype(np.int64)

    return bucketed_aggregate(
        partial, [id_col], sum_doc, n_buckets=n_buckets, empty=empty_out,
        coalesce_first=False,
    )


# ---------------------------------------------------------------------------
# corpus-wide repeated-span removal (C4-style line dedup)
# ---------------------------------------------------------------------------


def dedup_spans(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    min_count: int = 3,
    n_buckets: int = 64,
):
    """C4-style repeated-span removal: drop every occurrence of any
    ``span_tokens``-token span whose CORPUS-WIDE frequency reaches
    ``min_count``, then rebuild each document from its surviving spans in
    original order (Raffel et al. 2020 §2.2 discard lines repeated across
    the dataset; the reference has no corpus-level hygiene at all — its
    pipeline ends at per-doc dedup, datagen/h5_to_parquet.py:45-48).

    Spans are NON-overlapping windows of ``span_tokens`` space-split
    tokens (the corpus tokenization convention shared with
    :func:`rarity_score`); a short tail span counts like any other.
    Removal is a pure frequency filter — order-independent, so the result
    is deterministic under any partitioning. Documents whose every span
    is removed disappear from the output (documented contract; the
    caller's anti-join against the input recovers them if needed).

    Returns ``(doc_id, text, n_kept, n_removed)``.

    Scale shape: explode is a shuffle-free map; the global span census
    never materializes anywhere — each span row is routed to its
    ``hash(span) % B`` bucket where the count-and-filter is a vectorized
    ``transform('size')``, then one doc-keyed bucketed rebuild (the A4
    reassembly pattern). Two bounded shuffles total, shuffle payload =
    the corpus text exactly once per shuffle.
    """
    from .dedup import bucketed_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        # Vectorized span windows: within-doc token position //
        # span_tokens is the span index; span boundaries become a
        # ListArray offset vector and the joins run as ONE Arrow
        # ``binary_join`` kernel. No Python per token or span.
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "idx": pa.array([], type=pa.int64()),
                "line": pa.array([], type=pa.string()),
                "n_spans": pa.array([], type=pa.int64()),
            }
        )
        flat, parent = batch_tokens_flat(batch[text_col])
        L = len(parent)
        if L == 0:
            return empty
        new_doc = np.r_[True, parent[1:] != parent[:-1]]
        doc_starts = np.flatnonzero(new_doc)
        ipos = np.arange(L, dtype=np.int64) - np.repeat(
            doc_starts, np.diff(np.r_[doc_starts, L])
        )
        span_idx = ipos // span_tokens
        brk = new_doc | np.r_[False, span_idx[1:] != span_idx[:-1]]
        span_starts = np.flatnonzero(brk)
        offsets = np.r_[span_starts, L].astype(np.int32)
        lines = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), flat), " "
        )
        span_doc = parent[span_starts]
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        # per-span doc-local index + per-doc span count, via segment math
        new_span_doc = np.r_[True, span_doc[1:] != span_doc[:-1]]
        sd_starts = np.flatnonzero(new_span_doc)
        seg_len = np.diff(np.r_[sd_starts, len(span_starts)])
        idx = np.arange(len(span_starts), dtype=np.int64) - np.repeat(
            sd_starts, seg_len
        )
        n_spans = np.repeat(seg_len.astype(np.int64), seg_len)
        return pa.table(
            {
                id_col: pa.array(ids_np[span_doc].astype(np.int64)),
                "idx": pa.array(idx),
                "line": lines,
                "n_spans": pa.array(n_spans),
            }
        )

    empty_kept = typed_empty(
        **{id_col: np.int64, "idx": np.int64, "line": object, "n_spans": np.int64}
    )

    def census_filter(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty_kept.copy()
        freq = df.groupby("line")["line"].transform("size")
        out = df[freq < min_count]
        return out if not out.empty else empty_kept.copy()

    kept = bucketed_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["line"],
        census_filter,
        n_buckets=n_buckets,
        empty=empty_kept,
    )

    empty_out = typed_empty(
        **{id_col: np.int64, text_col: object, "n_kept": np.int64, "n_removed": np.int64}
    )

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty_out.copy()
        df = df.sort_values([id_col, "idx"], kind="mergesort")
        g = df.groupby(id_col, as_index=False)
        out = g.agg(
            **{
                text_col: ("line", " ".join),
                "n_kept": ("idx", "size"),
                "n_spans": ("n_spans", "first"),
            }
        )
        out["n_removed"] = (out["n_spans"] - out["n_kept"]).astype(np.int64)
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out[[id_col, text_col, "n_kept", "n_removed"]]

    return bucketed_aggregate(
        kept, [id_col], rebuild, n_buckets=n_buckets, empty=empty_out,
        coalesce_first=False,
    )


# ---------------------------------------------------------------------------
# bigram conditional surprisal (LM-quality gate)
# ---------------------------------------------------------------------------


def bigram_surprisal(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Per-doc bigram-LM score: Σ over bigram INSTANCES (x, y) of
    ``10⁶ · c(x·) // c(x,y)`` — the integer reciprocal of the corpus
    conditional frequency ``p(y|x)``, an exact stand-in for the CCNet
    LM-perplexity gate (Wenzek et al. 2020) without float logs, one
    model order up from :func:`rarity_score`'s unigram census. High
    score = improbable-transition-heavy text (shuffled words, OCR
    noise); low = formulaic text. ``c(x·)`` counts x as a bigram LEFT
    context, so ``c(x,y) ≤ c(x·)`` and every ratio ≥ 1. Docs with < 2
    tokens have no bigrams and drop out. Returns (doc_id, surprisal).

    Scale shape: per-batch (doc, x, y, c) bigram partials, then ONE
    bucketed shuffle keyed on the LEFT token only — all bigrams sharing
    x co-locate, so both the context census c(x·) and the pair census
    c(x,y) are in-bucket ``transform`` sums (neither global table ever
    exists) — then one doc-keyed bucketed sum. A stopword-hot x skews
    its bucket like rarity_score's hot token does; acceptable because
    the bucket holds (distinct doc, x, y) partials, not instances.
    """
    from .dedup import bucketed_aggregate

    def bigram_rows(batch: pa.Table) -> pa.Table:
        # Vectorized: adjacent-token pairs are two shifted zero-copy
        # slices of the flat token stream (pair valid iff both tokens
        # share a doc); the (doc, x, y) multiset counts in ONE Arrow
        # hash-aggregate. No Python per token instance.
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "x": pa.array([], type=pa.string()),
                "y": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
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
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        pairs = pa.table(
            {
                id_col: pa.array(ids_np[parent[:-1][valid]].astype(np.int64)),
                "x": flat.slice(0, L - 1).filter(vmask),
                "y": flat.slice(1, L - 1).filter(vmask),
            }
        )
        agg = pairs.group_by([id_col, "x", "y"]).aggregate([([], "count_all")])
        return agg.rename_columns([id_col, "x", "y", "c"])

    empty_part = typed_empty(**{id_col: np.int64, "part": np.int64})

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty_part.copy()
        nx = df.groupby("x")["c"].transform("sum")
        nxy = df.groupby(["x", "y"])["c"].transform("sum")
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "part": (df["c"] * (SCORE_SCALE * nx // nxy)).astype(np.int64),
            }
        )

    partial = bucketed_aggregate(
        ds.map_batches(bigram_rows, batch_format="pyarrow"),
        ["x"],
        score_bucket,
        n_buckets=n_buckets,
        empty=empty_part,
    )

    empty_out = typed_empty(**{id_col: np.int64, "surprisal": np.int64})

    def sum_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(id_col, as_index=False)["part"].sum()
        return out.rename(columns={"part": "surprisal"}).astype(np.int64)

    return bucketed_aggregate(
        partial, [id_col], sum_doc, n_buckets=n_buckets, empty=empty_out,
        coalesce_first=False,
    )


def token_chi2(
    ds,
    *,
    pos_lang: str = "en",
    min_df: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 64,
):
    """χ² feature selection between token PRESENCE and a binary document
    class (``lang == pos_lang``) — the classic filter-method ranking of
    which vocabulary items are most class-discriminative (language /
    domain markers before training a classifier or a contrastive
    filter). Top-``k`` tokens by

        ``chi2_x1m = 10^6 · N · (a·d − b·c)² // ((a+b)(c+d)(a+c)(b+d))``

    over the 2×2 presence table (a = positive docs containing the token,
    b = negative docs containing it, c/d = the complements; N = total
    docs). Ties break by token ascending. Only tokens with
    ``min_df ≤ df < N`` score (df = a+b; a token in every document has a
    zero-variance column — undefined χ², excluded by contract). Scoring
    runs in PYTHON ints: N·(ad−bc)² overflows int64 exactly where
    corpora get interesting (the oracle uses HUGEINT).

    Scale shape: per-batch partial counts (per-doc DISTINCT tokens →
    (token, a_partial, df_partial) bincount fold per batch — never a row per
    occurrence); ONE bounded ``hash(token) % n_buckets`` shuffle
    finalizes a and df and scores inside the bucket; each bucket emits
    only its top-``k`` (a+b ≥ min_df pre-filter), so the driver folds
    ≤ ``n_buckets × k`` rows. Class totals (N, N_pos) are a 2-int scalar
    aggregate. No vocabulary census ever reaches the driver.
    """
    from .dedup import bucketed_aggregate

    # ---- class totals: one tiny scalar fold --------------------------------
    def cls_partial(batch: pa.Table) -> pa.Table:
        pos = pc.sum(
            pc.cast(pc.equal(batch[lang_col], pos_lang), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "n_pos": pa.array([pos], pa.int64()),
                "n_all": pa.array([batch.num_rows], pa.int64()),
            }
        )

    # ONE pass over the input: materialize the tiny per-batch partials
    # (one 2-int row per batch) and fold both scalars driver-side —
    # separate .sum() calls would re-scan the documents table twice
    tp = ds.map_batches(cls_partial, batch_format="pyarrow").to_pandas()
    n_pos = int(tp["n_pos"].sum()) if len(tp) else 0
    n_all = int(tp["n_all"].sum()) if len(tp) else 0

    empty = typed_empty(token=object, df=np.int64, chi2_x1m=np.int64)
    if n_pos == 0 or n_pos == n_all:
        import ray.data as rd

        return rd.from_pandas(empty.copy())

    # ---- per-batch partial presence counts ---------------------------------
    def tok_partial(batch: pa.Table) -> pa.Table:
        # Vectorized presence counts: distinct (doc, token) pairs via
        # np.unique on a fused row×vocab key, then df/a per token are
        # two bincounts (the positive-class one masked by the doc's
        # label). No Python per token instance.
        flat, parent = batch_tokens_flat(batch[text_col])
        if len(parent) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "a": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        is_pos = pc.equal(
            pc.fill_null(batch[lang_col], ""), pos_lang
        ).to_numpy(zero_copy_only=False)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(enc.dictionary)
        uk = np.unique(parent * v + codes)
        u_doc, u_code = uk // v, uk % v
        df_cnt = np.bincount(u_code, minlength=v).astype(np.int64)
        a_cnt = np.bincount(
            u_code[is_pos[u_doc]], minlength=v
        ).astype(np.int64)
        return pa.table(
            {
                "token": enc.dictionary,
                "a": pa.array(a_cnt),
                "df": pa.array(df_cnt),
            }
        )

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", as_index=False)[["a", "df"]].sum()
        agg = agg[(agg["df"] >= min_df) & (agg["df"] < n_all)]
        if agg.empty:
            return empty.copy()
        scores = []
        for a, df_ in zip(agg["a"].tolist(), agg["df"].tolist()):
            b = df_ - a
            c = n_pos - a
            d = (n_all - n_pos) - b
            num = 1_000_000 * n_all * (a * d - b * c) ** 2  # Python ints
            den = df_ * (n_all - df_) * n_pos * (n_all - n_pos)
            scores.append(num // den)
        out = pd.DataFrame(
            {"token": agg["token"].to_numpy(), "df": agg["df"].to_numpy(),
             "chi2_x1m": np.array(scores, dtype=np.int64)}
        )
        out = out.sort_values(
            ["chi2_x1m", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)
        out["df"] = out["df"].astype(np.int64)
        return out

    per_bucket = bucketed_aggregate(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["token"],
        score_bucket,
        n_buckets=n_buckets,
        empty=empty,
    )
    top = per_bucket.to_pandas()  # ≤ n_buckets × k tiny rows
    top = top.sort_values(
        ["chi2_x1m", "token"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(top if len(top) else empty.copy())


def hybrid_rrf(
    ds,
    terms: list[str],
    *,
    k: int = 10,
    run_k: int = 20,
    rrf_k: int = 60,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """HYBRID retrieval by reciprocal-rank fusion (Cormack et al.
    SIGIR'09): fuse a sparse lexical run (:func:`bm25_topk`) with a
    dense run (integer cosine over the hashing-trick unigram embedding,
    the model-free stand-in for a neural retriever) —

        ``rrf_x1m(d) = Σ_runs 10^6 // (rrf_k + rank_run(d))``

    over each run's top ``run_k`` (1-based ranks; absent from a run
    contributes 0). Returns the top ``k`` fused docs as
    (doc_id, bm25_rank, cos_rank, rrf_x1m) — ranks 0 when the doc
    missed that run; ties break by doc_id ascending everywhere, so the
    DuckDB oracle (ROW_NUMBER + FULL OUTER JOIN) matches bit-for-bit.

    Dense-run score: ``cs = 10^6·dot² // (|q|²·|d|²)`` over
    ``vec[j] = #{distinct tokens w : md5_u64(w) % dim == j}`` with a
    ``dot > 0`` gate — exact integers end-to-end (magnitudes ≤
    10^6·dot², dot ≤ |q|·max-count, far under 2^63).

    Scale shape: BOTH runs are shuffle-free scans with per-batch top-k
    partials (BM25's corpus stats are an O(#terms) scalar fold; the
    query vector rides the task closure); the fusion itself touches
    ≤ 2·run_k rows on the driver — never a corpus-sized structure.
    """
    from ..util import md5_u64_many

    tset = sorted(set(terms))
    qd = (md5_u64_many(tset) % np.uint64(dim)).astype(np.int64)
    qvec = np.bincount(qd, minlength=dim).astype(np.int64)
    n2q = int((qvec * qvec).sum())

    def dense_of_batch(batch: pa.Table) -> pa.Table:
        # Vectorized: distinct (doc, token) pairs via np.unique on a
        # fused key, md5 once per DISTINCT vocab entry, then per-doc
        # dot/norm as two segment folds over (doc, slot) counts. The
        # exact-integer quotient runs only over hit docs in Python
        # bigints (hashing/counting was the hot loop).
        n = batch.num_rows
        flat, parent = batch_tokens_flat(batch[text_col])
        ids: list[int] = []
        scores: list[int] = []
        if len(parent):
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            v = len(enc.dictionary)
            uk = np.unique(parent * v + codes)
            u_doc, u_code = uk // v, uk % v
            vocab_slot = (
                md5_u64_many(enc.dictionary.to_pylist()) % np.uint64(dim)
            ).astype(np.int64)
            key2, c2 = np.unique(u_doc * dim + vocab_slot[u_code], return_counts=True)
            d2, s2 = key2 // dim, key2 % dim
            c2 = c2.astype(np.int64)
            dot_np = np.zeros(n, np.int64)
            np.add.at(dot_np, d2, c2 * qvec[s2])
            n2_np = np.zeros(n, np.int64)
            np.add.at(n2_np, d2, c2 * c2)
            ids_all = batch[id_col].to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(dot_np > 0):
                dot, n2 = int(dot_np[i]), int(n2_np[i])
                ids.append(int(ids_all[i]))
                scores.append((1_000_000 * dot * dot) // (n2q * n2))
        if ids:
            df = pd.DataFrame({id_col: ids, "cs": scores}).astype(np.int64)
            df = df.sort_values(
                ["cs", id_col], ascending=[False, True], kind="mergesort"
            ).head(run_k)
        else:
            df = typed_empty(**{id_col: np.int64, "cs": np.int64})
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    dense = ds.map_batches(dense_of_batch, batch_format="pyarrow").to_pandas()
    if not dense.empty:
        dense = dense.sort_values(
            ["cs", id_col], ascending=[False, True], kind="mergesort"
        ).head(run_k)
    dense = dense.reset_index(drop=True)
    dense["cos_rank"] = np.arange(1, len(dense) + 1, dtype=np.int64)

    sparse = bm25_topk(ds, tset, k=run_k, id_col=id_col, text_col=text_col)
    sparse = sparse.reset_index(drop=True)
    sparse["bm25_rank"] = np.arange(1, len(sparse) + 1, dtype=np.int64)

    fused = sparse[[id_col, "bm25_rank"]].merge(
        dense[[id_col, "cos_rank"]], on=id_col, how="outer"
    )
    br = fused["bm25_rank"].fillna(0).astype(np.int64)
    cr = fused["cos_rank"].fillna(0).astype(np.int64)
    rrf = np.where(br > 0, 1_000_000 // (rrf_k + br), 0) + np.where(
        cr > 0, 1_000_000 // (rrf_k + cr), 0
    )
    out = pd.DataFrame(
        {
            id_col: fused[id_col].astype(np.int64),
            "bm25_rank": br,
            "cos_rank": cr,
            "rrf_x1m": rrf.astype(np.int64),
        }
    )
    return (
        out.sort_values(["rrf_x1m", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
