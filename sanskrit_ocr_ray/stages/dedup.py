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

Scale notes: every step is map_batches + groupby — no driver-side loops
over data; the only collected structures are candidate-pair sets and
per-doc size maps, which are O(#near-dups), not O(corpus). Popular-shingle
groups are truncated with an explicit cap (and logged) — the standard
guard against O(k²) pair blowup on boilerplate shingles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import md5_hex16, md5_u64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Distinct ``key`` values, keeping the minimum ``id_col`` per value.

    Hash-partitions on a 16-hex content hash (small shuffle key even for
    huge texts), then resolves per group; hash collisions are handled by
    grouping on the full value inside the (tiny) group.
    """
    import pyarrow.compute as pc

    def add_hash(batch: pa.Table) -> pa.Table:
        # NOTE: no deferred relative imports inside closures — by-value
        # pickled functions cannot resolve them on workers
        h = pa.array([md5_hex16(t or "") for t in batch[key].to_pylist()])
        return batch.append_column("__h", h)

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(id_col).groupby(key, as_index=False, sort=True).first()
        return out[[id_col, key]]

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .map_groups(keep_min, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# minhash signatures + LSH clustering
# ---------------------------------------------------------------------------


def _seed(i: int) -> np.uint64:
    return np.uint64(md5_u64(str(i)))


def minhash_signatures_batch(
    batch: pa.Table, n_perm: int = 8, column: str = "text"
) -> pa.Table:
    """(doc_id, text) → long rows (doc_id, perm, minhash hex).

    Hash family: h_i(tok) = md5_u64(tok) XOR md5_u64(str(i)) — a bijective
    per-permutation mix that the DuckDB oracle reproduces exactly.
    Empty docs get minhash = ffff…f (the identity of min).
    """
    texts = batch[column].to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    seeds = np.array([_seed(i) for i in range(n_perm)], dtype=np.uint64)
    out_doc, out_perm, out_hash = [], [], []
    for d, t in zip(doc_ids, texts):
        toks = sorted({w for w in (t or "").split(" ") if w})
        if toks:
            th = np.fromiter((md5_u64(w) for w in toks), np.uint64, len(toks))
            mins = np.bitwise_xor(th[:, None], seeds[None, :]).min(axis=0)
        else:
            mins = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        for i in range(n_perm):
            out_doc.append(d)
            out_perm.append(i)
            out_hash.append(f"{int(mins[i]):016x}")
    return pa.table(
        {
            "doc_id": pa.array(out_doc),
            "perm": pa.array(out_perm, type=pa.int64()),
            "minhash": pa.array(out_hash, type=pa.string()),
        }
    )


def minhash_lsh_clusters(
    ds,
    *,
    n_perm: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.7,
    column: str = "text",
    id_col: str = "doc_id",
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
        rows_id, rows_band, rows_bucket = [], [], []
        for d, t in zip(ids, texts):
            toks = sorted({w for w in (t or "").split(" ") if w})
            if toks:
                th = np.fromiter((md5_u64(w) for w in toks), np.uint64, len(toks))
                mins = np.bitwise_xor(th[:, None], seeds[None, :]).min(axis=0)
            else:
                mins = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
            for b in range(n_perm // band_size):
                sig = ",".join(
                    f"{int(v):016x}" for v in mins[b * band_size : (b + 1) * band_size]
                )
                rows_id.append(d)
                rows_band.append(b)
                rows_bucket.append(f"{b}:{sig}")
        return pa.table(
            {
                id_col: pa.array(rows_id),
                "band": pa.array(rows_band, type=pa.int64()),
                "bucket": pa.array(rows_bucket, type=pa.string()),
            }
        )

    MAX_BUCKET = 256  # popular-bucket guard: cap pair generation per bucket

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))[:MAX_BUCKET]
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        return pd.DataFrame(pairs, columns=["a", "b"])

    candidates = (
        ds.map_batches(sig_and_bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # collect candidate pairs + the token sets of involved docs (both are
    # O(#candidates), not O(corpus)); verify exact Jaccard on the driver —
    # at larger candidate volumes this step is itself a groupby over pair
    # keys, but candidate sets are tiny by construction
    cand = {
        (r["a"], r["b"])
        for batch in candidates.iter_batches(batch_size=65536, batch_format="pandas")
        for r in batch.to_dict("records")
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
):
    """All pairs with simhash hamming distance ≤ ``max_hamming``.

    With 8 bands of 8 bits, any pair at hamming ≤ 7 shares at least one
    identical band (pigeonhole), so band-bucketing + verification is EXACT
    for ``max_hamming`` ≤ 7 — this is the scale path (no all-pairs scan);
    the DuckDB oracle does the quadratic scan instead.
    Returns (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    from .text_analysis import simhash_batch

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
        return pa.table(
            {
                id_col: pa.array(rows_id),
                "sig": pa.array(rows_sig, type=pa.uint64()),
                "bucket": pa.array(rows_bucket, type=pa.string()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(group[id_col], group["sig"])))
        out_a, out_b, out_h = [], [], []
        for i, (da, sa) in enumerate(rows):
            for db, sb in rows[i + 1 :]:
                h = int(sa ^ sb).bit_count()
                if h <= max_hamming:
                    out_a.append(da)
                    out_b.append(db)
                    out_h.append(h)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    pairs = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # a close pair shares several bands → dedup pair rows
    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["doc_a", "doc_b"])

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pairs, batch_format="pandas"
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
):
    """Pairs sharing ≥1 word n-gram with Jaccard ≥ threshold (per-mille).

    Output (doc_a, doc_b, jacc_pm) with integer per-mille Jaccard
    ``(1000*|A∩B|) // |A∪B|`` over DISTINCT n-grams — integer arithmetic
    end-to-end, so the DuckDB oracle matches bit-for-bit.
    """

    def shingles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[column].to_pylist()
        rows_id, rows_g = [], []
        for d, t in zip(ids, texts):
            toks = [w for w in (t or "").split(" ") if w]
            gs = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            } if len(toks) >= n else set()
            for g in gs:
                rows_id.append(d)
                rows_g.append(g)
        return pa.table({id_col: pa.array(rows_id), "g": pa.array(rows_g)})

    sh = ds.map_batches(shingles, batch_format="pyarrow")

    # per-doc distinct shingle counts → broadcast map (O(#docs) ints)
    sizes = {
        r[id_col]: r["count()"]
        for r in sh.groupby(id_col).count().iter_rows()
    }

    MAX_BUCKET = 256

    def shingle_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col]))[:MAX_BUCKET]
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=object), "doc_b": pd.Series([], dtype=object)})
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    inter = (
        sh.groupby("g")
        .map_groups(shingle_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        i = batch["count()"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for da, db, ii in zip(a, b, i):
            union = sizes[da] + sizes[db] - ii
            if union > 0 and 1000 * ii >= threshold_pm * union:
                out_a.append(da)
                out_b.append(db)
                out_j.append((1000 * ii) // union)
        return pa.table(
            {
                "doc_a": pa.array(out_a),
                "doc_b": pa.array(out_b),
                "jacc_pm": pa.array(out_j, type=pa.int64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")
