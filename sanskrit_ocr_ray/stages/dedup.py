"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Replaces the reference's order-dependent, memory-unbounded in-process
``set`` dedup (h5_to_parquet.py:26,45-48; SURVEY.md D1/T5) with
shuffle-based, order-independent formulations:

- exact:   groupby(content hash) → keep min(doc_id)   [deterministic
  tie-break; "first-seen" is not reproducible under parallelism]
- minhash: per-doc signatures → LSH bands → candidate pairs → exact
  Jaccard verify → connected components → cluster representative
- simhash: 64-bit signatures → 8×8-bit bands (pigeonhole-exact for
  hamming ≤ 7) → verified pairs
- n-gram:  shingle explode → pair generation by shared shingle →
  exact Jaccard in integer per-mille

Scale notes:
- every grouping key here (content hash, LSH bucket, shingle) has HUGE
  cardinality with tiny groups — the one shape Ray's per-group
  ``map_groups`` handles terribly (millions of per-group UDF calls). So
  every such step groups by a bounded SUPER-BUCKET ``md5(key) % B`` and
  resolves the real keys vectorized (pandas groupby / merge) inside each
  super-bucket: one shuffle, B group calls, all inner work columnar.
- popular keys (boilerplate shingles, giant LSH buckets) are capped per
  bucket before pair generation — the standard guard against O(k²) pair
  blowup; the cap is a parameter and capped keys are the degenerate ones
  (a shingle shared by thousands of docs carries no near-dup signal).
- collected driver-side structures are O(#candidate pairs), never
  O(corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import fast_hash_u64, md5_hex16, md5_u64, typed_empty

#: super-bucket count for high-cardinality grouping keys; scale with
#: cluster size (buckets ≫ cores keeps groups balanced, ≪ keys keeps
#: per-group batches fat)
DEFAULT_BUCKETS = 256


def _bucket_of(values, n_buckets: int) -> pa.Array:
    """Vectorized bucket ids (siphash, not per-row md5 — bucket ids need
    determinism, never oracle parity)."""
    h = fast_hash_u64(list(values) if not isinstance(values, (list, np.ndarray)) else values)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32))


def bucketed_aggregate(
    ds,
    keys: list[str],
    combine,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    empty=None,
):
    """Groupby-aggregate for HIGH-cardinality keys via bounded buckets.

    Ray's native ``groupby(keys).aggregate(...)`` collapses per group in
    Python — measured 187s for a 1.2M-group Sum on 32 CPUs — so for keys
    with ~row-count cardinality we shuffle on ``hash(keys) % B`` instead
    and run ``combine`` (a vectorized pandas groupby) inside each of the B
    buckets. Every row of one key lands in one bucket, so the combine is
    exact. ``combine(df) -> df`` must aggregate over ``keys``.

    ``empty``: a zero-row TYPED DataFrame in combine's output schema,
    returned for the empty groups Ray's sort-based groupby emits (see
    util.typed_empty). Without it empty groups yield schema-less blocks.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in keys:
            col = batch[k]
            if pa.types.is_integer(col.type):
                v = col.to_numpy().astype(np.uint64)
            else:
                v = fast_hash_u64(col.to_pylist())
            h ^= (v + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0x100000001B3)
            h = (h << np.uint64(13)) | (h >> np.uint64(51))
        b = (h % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("__pb", pa.array(b))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # empty groups arrive column-less — emit typed empty
            return empty.copy() if empty is not None else pd.DataFrame()
        return combine(df.drop(columns="__pb"))

    try:
        import ray

        coalesce = max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        coalesce = 64
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .repartition(coalesce)  # coalesce tiny blocks before the sort barrier
        .groupby("__pb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _pd_dtypes(ds) -> dict:
    """Column → pandas dtype map from a Dataset's (metadata-only) schema."""
    sch = ds.schema()
    out = {}
    for n, t in zip(sch.names, sch.types):
        try:
            out[n] = t.to_pandas_dtype()
        except Exception:  # nested types etc. → object
            out[n] = object
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id", n_buckets: int = DEFAULT_BUCKETS):
    """Distinct ``key`` values, keeping the minimum ``id_col`` per value.

    Shuffles on a bounded hash bucket of the content (small shuffle key
    even for huge texts); exact values are resolved vectorized inside
    each bucket, so hash collisions are handled for free.
    """
    dtypes = _pd_dtypes(ds)
    empty = typed_empty(**{id_col: dtypes[id_col], key: dtypes[key]})

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__b", _bucket_of([t or "" for t in batch[key].to_pylist()], n_buckets)
        )

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return empty.copy()
        out = group.sort_values(id_col).groupby(key, as_index=False, sort=True).first()
        return out[[id_col, key]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(keep_min, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# minhash signatures + LSH clustering
# ---------------------------------------------------------------------------


def _seed(i: int) -> np.uint64:
    return np.uint64(md5_u64(str(i)))


def _minhash_row(text: str, seeds: np.ndarray) -> np.ndarray:
    toks = sorted({w for w in (text or "").split(" ") if w})
    if not toks:
        return np.full(len(seeds), np.iinfo(np.uint64).max, dtype=np.uint64)
    th = np.fromiter((md5_u64(w) for w in toks), np.uint64, len(toks))
    return np.bitwise_xor(th[:, None], seeds[None, :]).min(axis=0)


def minhash_signatures_batch(
    batch: pa.Table, n_perm: int = 8, column: str = "text"
) -> pa.Table:
    """(doc_id, text) → long rows (doc_id, perm, minhash hex).

    Hash family: h_i(tok) = md5_u64(tok) XOR md5_u64(str(i)) — a bijective
    per-permutation mix that the DuckDB oracle reproduces exactly.
    Token-less (empty/whitespace-only) docs emit NO rows — the oracle's
    token CTE produces no rows for them, and a sentinel signature would
    desync row counts the moment the corpus contains an empty text.
    """
    texts = batch[column].to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    seeds = np.array([_seed(i) for i in range(n_perm)], dtype=np.uint64)
    out_doc, out_perm, out_hash = [], [], []
    for d, t in zip(doc_ids, texts):
        if not any(w for w in (t or "").split(" ")):
            continue
        mins = _minhash_row(t, seeds)
        for i in range(n_perm):
            out_doc.append(d)
            out_perm.append(i)
            out_hash.append(f"{int(mins[i]):016x}")
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=batch["doc_id"].type),
            "perm": pa.array(out_perm, type=pa.int64()),
            "minhash": pa.array(out_hash, type=pa.string()),
        }
    )


def _pairs_by_bucket(group: pd.DataFrame, id_col: str, max_bucket: int) -> pd.DataFrame:
    """Within a super-bucket: emit candidate id pairs per real bucket."""
    out_a: list = []
    out_b: list = []
    for _, sub in group.groupby("bucket", sort=False):
        ids = sorted(set(sub[id_col]))[:max_bucket]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                out_a.append(a)
                out_b.append(b)
    return pd.DataFrame({"a": out_a, "b": out_b})


def minhash_lsh_clusters(
    ds,
    *,
    n_perm: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.7,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    max_bucket: int = 256,
):
    """Near-dup clustering: shingle→minhash→band→bucket→verify→components.

    Returns a Dataset of (doc_id, cluster_rep) for EVERY input doc
    (rep = min doc_id of its verified near-dup component; singletons map
    to themselves). The verify step computes exact token-set Jaccard, so
    LSH only proposes candidates — false positives cannot survive.
    """

    def sig_and_bands(batch: pa.Table) -> pa.Table:
        texts = batch[column].to_pylist()
        ids = batch[id_col].to_pylist()
        seeds = np.array([_seed(i) for i in range(n_perm)], dtype=np.uint64)
        rows_id, rows_bucket = [], []
        for d, t in zip(ids, texts):
            mins = _minhash_row(t, seeds)
            for b in range(n_perm // band_size):
                sig = ",".join(
                    f"{int(v):016x}" for v in mins[b * band_size : (b + 1) * band_size]
                )
                rows_id.append(d)
                rows_bucket.append(f"{b}:{sig}")
        t_out = pa.table(
            {id_col: pa.array(rows_id), "bucket": pa.array(rows_bucket)}
        )
        return t_out.append_column("__sb", _bucket_of(rows_bucket, n_buckets))

    candidates = (
        ds.map_batches(sig_and_bands, batch_format="pyarrow")
        .groupby("__sb")
        .map_groups(
            lambda g: _pairs_by_bucket(g, id_col, max_bucket), batch_format="pandas"
        )
    )

    # candidate pairs + token sets of involved docs: O(#candidates)
    cand = {
        (a, b)
        for batch in candidates.iter_batches(batch_size=65536, batch_format="pandas")
        for a, b in zip(batch["a"], batch["b"])
    }
    involved = {d for p in cand for d in p}

    def project_tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[column].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in involved]
        return pa.table(
            {
                id_col: pa.array([ids[i] for i in keep]),
                "toks": pa.array(
                    [sorted({w for w in (texts[i] or "").split(" ") if w}) for i in keep],
                    type=pa.list_(pa.string()),
                ),
            }
        )

    tok_map = {}
    for b in ds.map_batches(project_tokens, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for d, t in zip(b[id_col].to_pylist(), b["toks"].to_pylist()):
            tok_map[d] = set(t)

    verified = []
    for a, b in sorted(cand):
        ta, tb = tok_map.get(a, set()), tok_map.get(b, set())
        union = len(ta | tb)
        if union and len(ta & tb) / union >= jaccard_threshold:
            verified.append((a, b))

    # connected components (union-find over the verified pair set only)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    rep = {d: find(d) for d in involved}

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_rep": pa.array([rep.get(d, d) for d in ids]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow").select_columns(
        [id_col, "cluster_rep"]
    )


# ---------------------------------------------------------------------------
# simhash near-dup pairs (pigeonhole-exact banding)
# ---------------------------------------------------------------------------


def simhash_dup_pairs(
    ds,
    *,
    max_hamming: int = 6,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
):
    """All pairs with simhash hamming distance ≤ ``max_hamming``.

    With 8 bands of 8 bits, any pair at hamming ≤ 7 shares at least one
    identical band (pigeonhole), so band-bucketing + verification is EXACT
    for ``max_hamming`` ≤ 7 — this is the scale path (no all-pairs scan);
    the DuckDB oracle does the quadratic scan instead.
    Returns (doc_a, doc_b, hamming), doc_a < doc_b. Token-less docs emit
    no signature (simhash_batch) and so never pair.
    """
    from .text_analysis import simhash_batch

    id_dtype = _pd_dtypes(ds)[id_col]

    def bands(batch: pa.Table) -> pa.Table:
        sig_t = simhash_batch(batch, column)
        ids = sig_t["doc_id"].to_pylist()
        sigs = [int(s, 16) for s in sig_t["simhash"].to_pylist()]
        rows_id, rows_sig, rows_bucket = [], [], []
        for d, s in zip(ids, sigs):
            for b in range(8):
                rows_id.append(d)
                rows_sig.append(s)
                rows_bucket.append(f"{b}:{(s >> (8 * b)) & 0xFF:02x}")
        t = pa.table(
            {
                id_col: pa.array(rows_id),
                "sig": pa.array(rows_sig, type=pa.uint64()),
                "bucket": pa.array(rows_bucket),
            }
        )
        return t.append_column("__sb", _bucket_of(rows_bucket, n_buckets))

    if max_hamming > 7:
        raise ValueError(
            "8 bands of 8 bits guarantee candidate capture only for "
            f"hamming <= 7 (pigeonhole); got max_hamming={max_hamming}"
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return typed_empty(doc_a=id_dtype, doc_b=id_dtype, hamming=np.int64)
        out_a, out_b, out_h = [], [], []
        for _, sub in group.groupby("bucket", sort=False):
            rows = sorted(set(zip(sub[id_col], sub["sig"])))
            for i, (da, sa) in enumerate(rows):
                for db, sb in rows[i + 1 :]:
                    h = int(sa ^ sb).bit_count()
                    if h <= max_hamming:
                        out_a.append(da)
                        out_b.append(db)
                        out_h.append(h)
        return pd.DataFrame(
            {"doc_a": out_a, "doc_b": out_b, "hamming": np.asarray(out_h, dtype=np.int64)}
        )

    pairs = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby("__sb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a close pair shares several identical copies (one per shared band) →
    # collapse with the bucketed combine (pair cardinality ~ row count)
    return bucketed_aggregate(
        pairs,
        ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False)["hamming"].min(),
        empty=typed_empty(doc_a=id_dtype, doc_b=id_dtype, hamming=np.int64),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds,
    *,
    n: int = 3,
    threshold_pm: int = 20,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    max_docs_per_shingle: int = 1024,
):
    """Pairs sharing ≥1 word n-gram with Jaccard ≥ threshold (per-mille).

    Output (doc_a, doc_b, jacc_pm) with integer per-mille Jaccard
    ``(1000*|A∩B|) // |A∪B|`` over DISTINCT n-grams — integer arithmetic
    end-to-end, so the DuckDB oracle matches bit-for-bit.

    Intersection counts come from a self-merge per shingle super-bucket
    (vectorized pandas), then one pair-keyed aggregate. Shingles shared
    by more than ``max_docs_per_shingle`` docs are boilerplate, carry no
    pair signal, and are dropped (documented cap — keep it above the
    oracle's corpus dup multiplicity when comparing exactly).

    Per-doc distinct-shingle sizes are a pure per-doc function, so they
    are computed batch-locally at shingle time and CARRIED on every
    shingle row (+8 bytes/row) through the one shuffle — no O(#docs)
    driver dict, no extra size join/aggregate (the round-1 scale
    anti-patterns here).
    """
    dtypes = _pd_dtypes(ds)
    id_dtype = dtypes[id_col]
    pair_empty = typed_empty(
        doc_a=id_dtype, doc_b=id_dtype, i=np.int64, sa=np.int64, sb=np.int64
    )

    def shingles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[column].to_pylist()
        rows_id, rows_g, rows_n = [], [], []
        for d, t in zip(ids, texts):
            toks = [w for w in (t or "").split(" ") if w]
            if len(toks) >= n:
                grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                for g in grams:
                    rows_id.append(d)
                    rows_g.append(g)
                    rows_n.append(len(grams))
        t_out = pa.table(
            {
                id_col: pa.array(rows_id, type=batch[id_col].type),
                "g": pa.array(rows_g, type=pa.string()),
                "n": pa.array(rows_n, type=pa.int64()),
            }
        )
        return t_out.append_column("__sb", _bucket_of(rows_g, n_buckets))

    sh = ds.map_batches(shingles, batch_format="pyarrow")

    def bucket_inter(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pair_empty.copy()
        df = group[[id_col, "g", "n"]]
        # drop boilerplate shingles (no near-dup signal, O(k²) hazard);
        # sizes keep counting them — they are per-doc totals, not pair work
        vc = df["g"].value_counts()
        hot = vc[vc > max_docs_per_shingle].index
        if len(hot):
            df = df[~df["g"].isin(hot)]
        m = df.merge(df, on="g")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if m.empty:
            return pair_empty.copy()
        out = (
            m.groupby([f"{id_col}_x", f"{id_col}_y"], as_index=False)
            .agg(i=("g", "size"), sa=("n_x", "first"), sb=("n_y", "first"))
            .rename(columns={f"{id_col}_x": "doc_a", f"{id_col}_y": "doc_b"})
        )
        return out.astype({"i": np.int64, "sa": np.int64, "sb": np.int64})

    inter = bucketed_aggregate(
        sh.groupby("__sb").map_groups(bucket_inter, batch_format="pandas"),
        ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            i=("i", "sum"), sa=("sa", "first"), sb=("sb", "first")
        ),
        n_buckets=n_buckets,
        empty=pair_empty,
    )

    def finish(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy().astype(np.int64)
        sa = batch["sa"].to_numpy().astype(np.int64)
        sb = batch["sb"].to_numpy().astype(np.int64)
        union = sa + sb - i
        keep = (union > 0) & (1000 * i >= threshold_pm * union)
        jacc = (1000 * i[keep]) // union[keep]
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)),
                "doc_b": batch["doc_b"].filter(pa.array(keep)),
                "jacc_pm": pa.array(jacc.astype(np.int64)),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")
