"""Distributed sketches for corpus-scale statistics.

``kmv_distinct``: K-Minimum-Values distinct-count sketch (Bar-Yossef et
al. 2002) over the corpus' 3-gram shingles. Unlike HLL's float estimate,
the KMV estimate is a PURE function of the k smallest distinct md5
hashes — deterministic and therefore reproducible value-for-value by the
DuckDB oracle (``row_number() OVER (ORDER BY hv)`` + the same integer
estimator), so a sketch — normally "approximate" — still gets an exact
correctness gate.

``hll_registers``: the HyperLogLog counterpart with the same trick —
the oracle-gated output is the integer REGISTER table (bucket, max rho),
which is exact and mergeable; the float estimate stays a driver-side
fold outside the gate.

Estimator: with h_k the k-th smallest distinct 64-bit hash (1-based),
``n̂ = (k−1) · 2⁶⁴ // h_k``; when fewer than k distinct hashes exist the
sketch IS the exact distinct count.

Scale shape: per-batch partial = the batch's k smallest DISTINCT hashes
(the global k smallest are necessarily a subset of the union of
per-batch k smallest), the union is deduplicated with one small groupby
(≤ #batches·k rows, never the corpus), and a distributed sort+limit(k)
leaves k rows for the driver. Heavy-hitter counterparts are exact in
this engine (``corpus.ngram_top``), so no CountMin is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import md5_u64, md5_u64_many

_TWO64 = 1 << 64


def _shingle_hashes(texts: list[str | None], n: int) -> np.ndarray:
    """Distinct md5_u64 hashes of all n-token shingles in the given texts
    (space-split tokens, shingles joined with ' ' — the ngram_top/oracle
    convention)."""
    seen: set[str] = set()
    for t in texts:
        toks = [w for w in (t or "").split(" ") if w]
        for i in range(len(toks) - n + 1):
            seen.add(" ".join(toks[i : i + n]))
    if not seen:
        return np.empty(0, dtype=np.uint64)
    hv = np.fromiter((md5_u64(s) for s in seen), np.uint64, len(seen))
    return np.unique(hv)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (no float log2 —
    doubles misround above 2^53)."""
    w = w.astype(np.uint64, copy=True)
    out = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = w >= np.uint64(1 << s)
        out[big] += s
        w[big] >>= np.uint64(s)
    return out + (w > 0)


def hll_registers(ds, *, column: str = "text", p: int = 6, ngram: int = 3):
    """HyperLogLog register table over the corpus' distinct ``ngram``
    shingles → (bucket, rho) with ``2^p`` registers (Flajolet et al.
    2007); same shingling convention as :func:`kmv_distinct`.

    The OUTPUT is the registers themselves, not the float estimate:
    bucket = top ``p`` bits of md5_u64(token), rho = leading-zero count
    of the remaining ``64-p`` bits + 1, maxed per bucket — pure integer
    values, so the DuckDB oracle reproduces them EXACTLY (same md5
    convention as :func:`kmv_distinct`; bit length via an integer CASE
    cascade, no float log2). Empty buckets are absent on both sides.
    The classic estimate is a trivial driver-side fold of the 2^p rows:
    ``α_m·m² / Σ 2^{-rho_j}`` with linear counting below 2.5·m — kept out
    of the operator so the correctness gate stays integer-exact.

    Scale shape: registers are the textbook MERGEABLE partial — each
    batch emits ≤ 2^p (bucket, rho) rows from its own distinct-token
    set, and one tiny ``groupby(bucket).max(rho)`` folds them; nothing
    driver-side, shuffle ≤ #batches·2^p rows. This is the counts-only
    complement to KMV (which keeps hash VALUES and therefore supports
    intersection estimates but ships k rows per batch)."""
    from ray.data.aggregate import Max

    m = 1 << p
    wbits = 64 - p
    mask = np.uint64((1 << wbits) - 1)

    reg_empty = pd.DataFrame(
        {"bucket": np.array([], np.int64), "rho": np.array([], np.int64)}
    )

    def partial(batch: pa.Table) -> pa.Table:
        hv = _shingle_hashes(batch[column].to_pylist(), ngram)
        if not len(hv):
            return pa.Table.from_pandas(reg_empty, preserve_index=False)
        bucket = (hv >> np.uint64(wbits)).astype(np.int64)
        w = hv & mask
        rho = wbits + 1 - _bit_length_u64(w)
        df = (
            pd.DataFrame({"bucket": bucket, "rho": rho})
            .groupby("bucket", as_index=False)["rho"]
            .max()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    assert m <= 4096  # p ≤ 12: partials stay tiny
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho"))
    )


def kmv_distinct(ds, *, column: str = "text", k: int = 256, ngram: int = 3):
    """Dataset of documents → one-row DataFrame (k, n_distinct_est):
    estimated number of distinct ``ngram``-token shingles."""
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        hv = _shingle_hashes(batch[column].to_pylist(), ngram)
        # k smallest (np.unique sorts); stored ORDER-PRESERVINGLY in int64
        # (sign-bit flip) — uint64 round-trips badly through the pandas
        # blocks inside groupby/sort
        hs = (hv[:k] ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({"hv": pa.array(hs)})

    cand = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("hv")  # dedup across batches: ≤ #batches·k rows shuffled
        .aggregate(Count(alias_name="n"))
        .sort("hv")
        .limit(k)
    )
    top = cand.to_pandas()  # ≤ k tiny rows
    h = top["hv"].to_numpy(dtype=np.int64)
    if len(h) < k:
        est = len(h)
    else:
        h_k = int(h[k - 1]) + (1 << 63)  # undo the sign-bit flip
        est = (k - 1) * _TWO64 // h_k
    return pd.DataFrame(
        {"k": np.asarray([k], np.int64), "n_distinct_est": np.asarray([est], np.int64)}
    )


def heavy_hitters(ds, *, column: str = "text", c: int = 32):
    """Exact φ-heavy hitters (tokens with count·c > N, φ = 1/c) WITHOUT
    a full-vocabulary shuffle — the candidate/verify shape of
    Misra-Gries-style pipelines (mergeable summaries, Agarwal et al.
    2013), kept integer-exact so DuckDB reproduces it value-for-value.

    1. candidates: inside each batch a vectorized census keeps tokens
       with batch_count·c > batch_N. Pigeonhole guarantees the union is
       a SUPERSET of the true heavy hitters (Σcntᵢ > ΣNᵢ/c ⇒ ∃i: cntᵢ >
       Nᵢ/c); each batch emits < c rows, so the candidate table is
       ≤ (c−1)·#batches rows — never the vocabulary.
    2. verify: the deduplicated candidate set (small by construction) is
       broadcast once via ``ray.put``; a second pass exact-counts ONLY
       candidates plus each batch's total token count (sentinel row,
       token ``''`` — impossible as a real token since empties are
       filtered), one tiny groupby folds the partials, and the driver
       applies cnt·c > N to ≤ |candidates| rows.

    Complements :func:`~..stages.corpus.ngram_top` (exact census through
    the term-bucket shuffle): here shuffled rows are bounded by
    c·#batches + |candidates| REGARDLESS of vocabulary size — the right
    shape when the vocabulary is corpus-sized (web n-grams) but only the
    φ-frequent head is wanted.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def _tokens(texts: list) -> list:
        return [w for t in texts for w in (t or "").split(" ") if w]

    def cand_partial(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch[column].to_pylist())
        if not toks:
            return pa.table({"token": pa.array([], pa.string())})
        vc = pd.Series(toks).value_counts()
        keep = vc.index[(vc.to_numpy() * c) > len(toks)]
        return pa.table({"token": pa.array(list(keep), pa.string())})

    cand = (
        ds.map_batches(cand_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # ≤ (c−1)·#batches rows by the per-batch bound
    )
    cand_ref = ray.put(frozenset(cand["token"].tolist()))

    def verify_partial(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)  # plasma-shared, zero-copy per node
        toks = _tokens(batch[column].to_pylist())
        hits = [t for t in toks if t in cset]
        vc = pd.Series(hits).value_counts() if hits else pd.Series(dtype=np.int64)
        return pa.table(
            {
                "token": pa.array(list(vc.index) + [""], pa.string()),
                "cnt": pa.array(
                    np.concatenate([vc.to_numpy(np.int64), [len(toks)]])
                ),
            }
        )

    folded = (
        ds.map_batches(verify_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # ≤ |candidates| + 1 rows
    )
    total = int(folded.loc[folded["token"] == "", "cnt"].sum())
    out = folded[(folded["token"] != "") & (folded["cnt"].to_numpy() * c > total)]
    return (
        out.sort_values("token")
        .reset_index(drop=True)
        .astype({"cnt": np.int64})
    )


def kmv_jaccard(
    ds,
    *,
    key: str = "doc_id",
    column: str = "text",
    k: int = 256,
    ngram: int = 3,
    val_permille: int = 100,
):
    """Sketch-based train/val shingle overlap — the cheap contamination
    diagnostic: estimated Jaccard similarity between the ``ngram``-shingle
    sets of the two hash-split sides (same ``md5(key) % 1000`` rule as
    :func:`corpus.train_val_split`), from ONE pass and O(k) driver rows.

    KMV set-operation estimator (Beyer et al. 2007): with K the k
    smallest distinct hashes of the UNION, ``Ĵ = |{h ∈ K : h ∈ A ∧ h ∈
    B}| / k`` — a pure function of the md5 hash order, so the DuckDB
    oracle reproduces (k, n_inter, jaccard_pm) EXACTLY; when the union
    has fewer than k distinct shingles the result is the exact Jaccard.

    Scale shape: per batch, each side contributes its k smallest distinct
    hashes with an (a, b) membership flag (any union-top-k hash beaten
    out of a batch-side top-k is beaten by k smaller union hashes, so
    truncation never loses a flag); one small groupby ORs the flags
    across batches, a distributed sort+limit keeps k rows, the driver
    folds three integers.
    """
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch[key].to_pylist()]
        h = md5_u64_many(keys) % np.uint64(1000)
        texts = batch[column].to_pylist()
        a_texts = [t for t, hv in zip(texts, h) if hv >= val_permille]
        b_texts = [t for t, hv in zip(texts, h) if hv < val_permille]
        rows = []
        for side, ts in (("a", a_texts), ("b", b_texts)):
            hv = _shingle_hashes(ts, ngram)[:k]
            hs = (hv ^ np.uint64(1 << 63)).view(np.int64)
            rows.append(
                pd.DataFrame(
                    {
                        "hv": hs,
                        "a": np.int64(side == "a"),
                        "b": np.int64(side == "b"),
                    }
                )
            )
        return pa.Table.from_pandas(
            pd.concat(rows, ignore_index=True), preserve_index=False
        )

    topk = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("hv")
        .aggregate(Max("a", alias_name="a"), Max("b", alias_name="b"))
        .sort("hv")
        .limit(k)
        .to_pandas()  # ≤ k tiny rows
    )
    n = len(topk)
    n_inter = int((topk["a"].to_numpy() * topk["b"].to_numpy()).sum()) if n else 0
    denom = n if n < k else k  # union smaller than k → exact Jaccard
    j_pm = 1000 * n_inter // denom if denom else 0
    return pd.DataFrame(
        {
            "k": np.asarray([k], np.int64),
            "n_inter": np.asarray([n_inter], np.int64),
            "jaccard_pm": np.asarray([j_pm], np.int64),
        }
    )


def kmv_set_ops(
    ds,
    *,
    key: str = "doc_id",
    column: str = "text",
    k: int = 256,
    ngram: int = 3,
    val_permille: int = 100,
):
    """Full KMV set-operation cardinality table for the train/val shingle
    sets: estimated |A∪B|, |A∩B|, |A\\B|, |B\\A| from the SAME one-pass
    union sketch :func:`kmv_jaccard` builds (Beyer et al. 2007): with K
    the k smallest distinct union hashes and h_k the k-th smallest,
    ``D̂_U = (k−1)·2⁶⁴ // h_k`` and each region scales as its share of
    K (``n_region · D̂_U // k``). Pure function of the md5 hash order →
    the DuckDB oracle reproduces every integer exactly; a union smaller
    than k degrades to exact counts. Same scale shape as kmv_jaccard:
    one pass, one small groupby, ≤ k driver rows.
    """
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch[key].to_pylist()]
        h = md5_u64_many(keys) % np.uint64(1000)
        texts = batch[column].to_pylist()
        a_texts = [t for t, hv in zip(texts, h) if hv >= val_permille]
        b_texts = [t for t, hv in zip(texts, h) if hv < val_permille]
        rows = []
        for side, ts in (("a", a_texts), ("b", b_texts)):
            hv = _shingle_hashes(ts, ngram)[:k]
            hs = (hv ^ np.uint64(1 << 63)).view(np.int64)
            rows.append(
                pd.DataFrame(
                    {
                        "hv": hs,
                        "a": np.int64(side == "a"),
                        "b": np.int64(side == "b"),
                    }
                )
            )
        return pa.Table.from_pandas(
            pd.concat(rows, ignore_index=True), preserve_index=False
        )

    topk = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("hv")
        .aggregate(Max("a", alias_name="a"), Max("b", alias_name="b"))
        .sort("hv")
        .limit(k)
        .to_pandas()  # ≤ k tiny rows
    )
    n = len(topk)
    a = topk["a"].to_numpy() if n else np.empty(0, np.int64)
    b = topk["b"].to_numpy() if n else np.empty(0, np.int64)
    ni = int((a * b).sum())
    na_only = int((a * (1 - b)).sum())
    nb_only = int(((1 - a) * b).sum())
    if n < k:  # union smaller than the sketch → exact
        d_union, d_inter, d_a_only, d_b_only = n, ni, na_only, nb_only
    else:
        h_k = int(topk["hv"].to_numpy(dtype=np.int64)[k - 1]) + (1 << 63)
        d_union = (k - 1) * _TWO64 // h_k
        d_inter = ni * d_union // k
        d_a_only = na_only * d_union // k
        d_b_only = nb_only * d_union // k
    return pd.DataFrame(
        {
            "k": np.asarray([k], np.int64),
            "d_union_est": np.asarray([d_union], np.int64),
            "d_inter_est": np.asarray([d_inter], np.int64),
            "d_a_only_est": np.asarray([d_a_only], np.int64),
            "d_b_only_est": np.asarray([d_b_only], np.int64),
        }
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def cms_registers(ds, *, column: str = "text", depth: int = 4, width: int = 256):
    """Count-min sketch register table over corpus token INSTANCES →
    ``(row_idx, col_idx, cnt)`` with ``depth`` md5-derived hash rows of
    ``width`` counters each (Cormode & Muthukrishnan 2005) — the
    frequency-sketch complement to :func:`hll_registers` (distincts) and
    :func:`kmv_distinct` (set ops): point-frequency upper bounds for any
    token from ``depth·width`` integers, regardless of vocabulary size.

    The OUTPUT is the integer registers, not an estimate, so the DuckDB
    oracle reproduces every cell exactly (row-r hash of token t =
    ``md5_u64(f"{r}:{t}") % width``, the repo's md5 convention). Zero
    cells are absent on both sides. Point estimates are a driver-side
    ``min`` over the d rows (:func:`cms_point_estimate`), kept out of
    the operator so the gate stays integer-exact.

    Scale shape: the textbook mergeable partial — each batch folds its
    own token counts into a local ``depth × width`` array and emits its
    nonzero cells; one native groupby-sum over the ≤ depth·width key
    space folds them. Shuffle ≤ #batches·depth·width tiny rows;
    nothing driver-side.
    """
    from ray.data.aggregate import Sum

    empty = pd.DataFrame(
        {
            "row_idx": np.array([], np.int64),
            "col_idx": np.array([], np.int64),
            "cnt": np.array([], np.int64),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch[column].to_pylist():
            for w in (t or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        if not counts:
            return pa.Table.from_pandas(empty, preserve_index=False)
        arr = np.zeros((depth, width), np.int64)
        for tok, n in counts.items():
            for r in range(depth):
                arr[r, md5_u64(f"{r}:{tok}") % width] += n
        rows, cols = np.nonzero(arr)
        return pa.table(
            {
                "row_idx": pa.array(rows.astype(np.int64)),
                "col_idx": pa.array(cols.astype(np.int64)),
                "cnt": pa.array(arr[rows, cols]),
            }
        )

    assert depth * width <= 65536  # partials stay tiny
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row_idx", "col_idx"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_point_estimate(registers: pd.DataFrame, token: str, *, depth: int = 4, width: int = 256) -> int:
    """Point-frequency upper bound for ``token`` from a materialized
    :func:`cms_registers` frame: min over the d rows' cells (missing
    cell = 0). Never underestimates; exact when no collision."""
    lut = {(r, c): n for r, c, n in zip(registers["row_idx"], registers["col_idx"], registers["cnt"])}
    return min(
        int(lut.get((r, md5_u64(f"{r}:{token}") % width), 0)) for r in range(depth)
    )


def hll_registers_by_group(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 6,
):
    """Per-GROUP HyperLogLog registers — the dashboard shape of
    :func:`hll_registers` (approximate distinct users per event type,
    distinct queries per day, …): one 2^p-register sketch per group,
    all built in the same streaming pass → (group, bucket, rho).
    Registers merge by max, so per-group sketches from different data
    slices (days, shards) can later be unioned without rescanning —
    the property that makes sketch tables a storage primitive.

    Integer contract: value hash = md5_u64(str(value)) (the
    shard_assign convention); bucket/rho exactly as the global HLL.
    Scale shape: per-batch partial = distinct (group, bucket) max-rho
    rows (≤ #groups·2^p); one bounded groupby(group) fold, per-group
    combine vectorized."""
    from ..util import md5_u64

    m = 1 << p
    wbits = 64 - p
    mask = np.uint64((1 << wbits) - 1)
    assert m <= 4096  # p ≤ 12: partials stay tiny

    reg_empty = pd.DataFrame(
        {
            "grp": pd.Series([], dtype=object),
            "bucket": np.array([], np.int64),
            "rho": np.array([], np.int64),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "grp": batch[group_col].to_pandas(),
                "v": batch[value_col].to_pandas(),
            }
        ).drop_duplicates()
        if df.empty:
            return pa.Table.from_pandas(reg_empty, preserve_index=False)
        hv = np.fromiter(
            (md5_u64(str(x)) for x in df["v"]), np.uint64, len(df)
        )
        bucket = (hv >> np.uint64(wbits)).astype(np.int64)
        w = hv & mask
        rho = wbits + 1 - _bit_length_u64(w)
        out = (
            pd.DataFrame({"grp": df["grp"].to_numpy(), "bucket": bucket, "rho": rho})
            .groupby(["grp", "bucket"], as_index=False)["rho"]
            .max()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return reg_empty.copy()
        out = group.groupby(["grp", "bucket"], as_index=False)["rho"].max()
        out["rho"] = out["rho"].astype(np.int64)
        return out

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([group_col, "bucket", "rho"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(fold, batch_format="pandas")
        .map_batches(rename, batch_format="pyarrow")
    )
