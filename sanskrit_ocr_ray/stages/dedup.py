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
import pyarrow.compute as pc

from ..util import (
    batch_token_hash_flat,
    batch_tokens_flat,
    fast_hash_u64,
    md5_hex16,
    md5_u64,
    tok_hash_cache,
    typed_empty,
)

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
    coalesce_first: bool = True,
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

    ``coalesce_first``: repartition before the sort barrier — wins when the
    input is hundreds of tiny blocks (measured 7.1→2.4 s on extract);
    skip it for small already-coalesced inputs, where the extra
    all-to-all round is pure fixed cost.
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

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
    if coalesce_first:
        try:
            import ray

            coalesce = max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            coalesce = 64
        # coalesce tiny blocks before the sort barrier
        tagged = tagged.repartition(coalesce)
    return tagged.groupby("__pb").map_groups(per_bucket, batch_format="pandas")


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


def dup_rate_by_group(
    ds,
    *,
    group_col: str = "source",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
):
    """Duplicate-rate analytics per group: for each ``group_col`` value
    (crawl source, domain, shard) report (n_docs, n_dup_docs, dup_pm)
    where a "dup doc" is any doc whose exact content appears in > 1
    document corpus-wide — the curation dashboard that says WHICH feed
    is flooding the corpus with copies, not merely which docs to drop
    (:func:`exact_dedup`'s complement).

    Scale shape: texts reduce to md5 fingerprints at the map stage (the
    text never shuffles), ONE bounded ``hash(fp) % B`` shuffle
    co-locates equal fingerprints, and each bucket emits tiny (group,
    n_docs, n_dup) partials — every fingerprint group lives wholly in
    one bucket, so membership is exact; the driver folds
    O(B · groups) rows. Returns a pandas DataFrame sorted by group.
    """
    from ..util import md5_hex16

    def fp_rows(batch: pa.Table) -> pa.Table:
        fps = [md5_hex16(t or "") for t in batch[text_col].to_pylist()]
        t = pa.table({group_col: batch[group_col], "fp": pa.array(fps)})
        return t.append_column("__b", _bucket_of(fps, n_buckets))

    part_empty = typed_empty(
        **{group_col: object, "n_docs": np.int64, "n_dup": np.int64}
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return part_empty.copy()
        sizes = df.groupby("fp")["fp"].transform("size")
        df = df.assign(dup=(sizes > 1).astype(np.int64))
        out = df.groupby(group_col, as_index=False).agg(
            n_docs=("fp", "size"), n_dup=("dup", "sum")
        )
        return out.astype({"n_docs": np.int64, "n_dup": np.int64})

    parts = (
        ds.map_batches(fp_rows, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return typed_empty(
            **{group_col: object, "n_docs": np.int64, "n_dup": np.int64,
               "dup_pm": np.int64}
        )
    out = parts.groupby(group_col, as_index=False)[["n_docs", "n_dup"]].sum()
    out["dup_pm"] = (1000 * out["n_dup"]) // out["n_docs"]
    out = out.astype({"n_docs": np.int64, "n_dup": np.int64, "dup_pm": np.int64})
    return out.sort_values(group_col).reset_index(drop=True)


def dup_cluster_size_hist(
    ds,
    *,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
):
    """Histogram of exact-duplicate cluster sizes: (cluster_size,
    n_clusters) over content-identical groups with ≥ 2 members — the
    shape of the duplication problem (two-copy mirrors vs thousandfold
    template spam need different dedup strategies). Companion view to
    :func:`dup_rate_by_group`.

    Scale shape: texts reduce to md5 fingerprints map-side, ONE bounded
    fp-bucket shuffle co-locates equal contents, each bucket folds its
    own size histogram (sizes are exact — a fingerprint group lives
    wholly in one bucket), and the driver sums O(B · distinct sizes)
    rows. Returns a pandas DataFrame sorted by cluster_size.
    """
    from ..util import md5_hex16, typed_empty

    def fp_rows(batch: pa.Table) -> pa.Table:
        fps = [md5_hex16(t or "") for t in batch[text_col].to_pylist()]
        t = pa.table({"fp": pa.array(fps)})
        return t.append_column("__b", _bucket_of(fps, n_buckets))

    part_empty = typed_empty(cluster_size=np.int64, n_clusters=np.int64)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return part_empty.copy()
        sizes = df.groupby("fp").size()
        sizes = sizes[sizes > 1]
        if sizes.empty:
            return part_empty.copy()
        hist = sizes.value_counts().sort_index()
        return pd.DataFrame(
            {
                "cluster_size": hist.index.to_numpy(np.int64),
                "n_clusters": hist.to_numpy(np.int64),
            }
        )

    parts = (
        ds.map_batches(fp_rows, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return part_empty.copy()
    out = parts.groupby("cluster_size", as_index=False)["n_clusters"].sum()
    out = out.astype({"cluster_size": np.int64, "n_clusters": np.int64})
    return out.sort_values("cluster_size").reset_index(drop=True)


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
    Token-less (empty/whitespace-only) docs emit NO rows — the oracle's
    token CTE produces no rows for them, and a sentinel signature would
    desync row counts the moment the corpus contains an empty text.

    Fully batch-vectorized: one Arrow tokenize/factorize pass, md5 once
    per DISTINCT token, then segmented minima (``np.minimum.reduceat``)
    over doc offsets — the min over a doc's token multiset equals the min
    over its distinct-token set, so no per-doc dedup is needed.
    """
    starts, doc_sel, th = batch_token_hash_flat(batch[column])
    if len(starts) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=batch["doc_id"].type),
                "perm": pa.array([], type=pa.int64()),
                "minhash": pa.array([], type=pa.string()),
            }
        )
    seeds = np.array([_seed(i) for i in range(n_perm)], dtype=np.uint64)
    mixed = np.bitwise_xor(th[:, None], seeds[None, :])
    mins = np.minimum.reduceat(mixed, starts, axis=0)  # (n_docs_sel, n_perm)
    out_doc = batch["doc_id"].take(pa.array(np.repeat(doc_sel, n_perm)))
    out_perm = np.tile(np.arange(n_perm, dtype=np.int64), len(starts))
    out_hash = [f"{int(v):016x}" for v in mins.ravel()]
    return pa.table(
        {
            "doc_id": out_doc,
            "perm": pa.array(out_perm, type=pa.int64()),
            "minhash": pa.array(out_hash, type=pa.string()),
        }
    )


def _components_bsp(
    pairs_ds, id_type, *, n_buckets: int = 32, max_iters: int = 50,
    small_edges: int = 1_000_000,
):
    """Connected components of an undirected edge list: BSP hash-to-min
    label propagation over bucketed object-store state.

    An iterative graph algorithm is the one shape the Dataset API cannot
    express without paying a sort barrier (2×) per round — measured 2-6 s
    of pure fixed cost per iteration at bench scale, with the edge set
    re-shuffled every round even though it never changes. So this drops
    to raw Ray tasks (the documented escape hatch for iterative state):

    - edges are hash-bucketed by src ONCE (both directions, so every
      involved node appears as src in its home bucket) and pinned in the
      object store; labels are one small (node, rep) table per bucket;
    - each round is ONE task wave: bucket k joins its labels into its
      out-edges, pre-mins messages per destination node, and addresses
      them straight to the destination buckets via ``num_returns``
      fan-out; a fold task per bucket takes the vectorized min and
      reports a changed-count;
    - the driver coordinates O(B²) tiny object REFS per round; edge and
      label bytes never leave the object store, so driver state is O(B),
      not O(graph).

    Rounds needed = component diameter in hops; verified LSH subgraphs
    arrive star-collapsed (see ``verify_in_bucket``), so 1-3 rounds.
    Returns a Dataset of (node, rep) covering every node with ≥1 edge.

    Small-graph fast path: the edge list is already materialized as
    object-store blocks here, so counting it is one tiny task wave; at
    ≤ ``small_edges`` total edges the B² BSP task waves are pure fixed
    cost (measured ~6 s at bench scale) and ONE task computes the same
    components with a path-compressing union-find — bit-identical reps
    (min node value per component). The BSP path stays the scale path
    and is exercised directly by tests.
    """
    import ray
    import ray.data as rd

    B = n_buckets

    def _bids(values) -> np.ndarray:
        return (fast_hash_u64(values) % np.uint64(B)).astype(np.int64)

    def _nr(t: pa.DataType) -> pa.Schema:
        return pa.schema([("node", t), ("rep", t)])

    edge_sch = pa.schema([("src", id_type), ("dst", id_type)])

    @ray.remote
    def bucketize(block) -> list:
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False).replace_schema_metadata(None)
        sch = edge_sch
        if "a" not in block.column_names:  # schema-less empty group block
            block = sch.empty_table().rename_columns(["a", "b"])
        df = block.to_pandas()
        e = pd.DataFrame(
            {
                "src": pd.concat([df["a"], df["b"]], ignore_index=True),
                "dst": pd.concat([df["b"], df["a"]], ignore_index=True),
            }
        )
        bb = _bids(e["src"].to_numpy()) if len(e) else np.array([], dtype=np.int64)
        return [
            pa.Table.from_pandas(e[bb == k], schema=sch, preserve_index=False).replace_schema_metadata(None)
            for k in range(B)
        ]

    @ray.remote(num_returns=2)
    def init_bucket(*tables):
        e = pa.concat_tables(tables)
        df = e.to_pandas()
        if not len(df):
            lbl = pd.DataFrame({"node": df["src"], "rep": df["dst"]})
        else:
            lbl = (
                pd.concat(
                    [
                        pd.DataFrame({"node": df["src"], "rep": df["src"]}),
                        pd.DataFrame({"node": df["src"], "rep": df["dst"]}),
                    ],
                    ignore_index=True,
                )
                .groupby("node", as_index=False)["rep"]
                .min()
            )
        return e, pa.Table.from_pandas(lbl, schema=_nr(id_type), preserve_index=False).replace_schema_metadata(None)

    @ray.remote
    def step(edges, labels) -> list:
        e = edges.to_pandas()
        lbl = labels.to_pandas()
        m = e.merge(lbl, left_on="src", right_on="node")
        msgs = (
            pd.DataFrame({"node": m["dst"], "rep": m["rep"]})
            .groupby("node", as_index=False)["rep"]
            .min()
        )
        bb = _bids(msgs["node"].to_numpy()) if len(msgs) else np.array([], dtype=np.int64)
        sch = labels.schema
        return [
            pa.Table.from_pandas(msgs[bb == k], schema=sch, preserve_index=False).replace_schema_metadata(None)
            for k in range(B)
        ]

    @ray.remote(num_returns=2)
    def fold(labels, *msg_tables):
        msgs = pa.concat_tables(msg_tables).to_pandas()
        if not len(msgs):
            return labels, 0
        lbl = labels.to_pandas()
        new = (
            pd.concat([lbl, msgs], ignore_index=True)
            .groupby("node", as_index=False)["rep"]
            .min()
        )
        merged = new.merge(lbl, on="node", how="left", suffixes=("", "_old"))
        changed = int((merged["rep"] != merged["rep_old"]).sum())
        return (
            pa.Table.from_pandas(new, schema=labels.schema, preserve_index=False).replace_schema_metadata(None),
            changed,
        )

    block_refs = pairs_ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(_nr(id_type).empty_table())

    @ray.remote
    def n_edges(block) -> int:
        return len(block) if isinstance(block, pd.DataFrame) else block.num_rows

    @ray.remote
    def local_components(*blocks):
        frames = []
        for b in blocks:
            df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
            if "a" in df.columns and len(df):
                frames.append(df[["a", "b"]])
        if not frames:
            return _nr(id_type).empty_table()
        e = pd.concat(frames, ignore_index=True)
        codes, uniq = pd.factorize(pd.concat([e["a"], e["b"]], ignore_index=True))
        n = len(uniq)
        ca, cb = codes[: len(e)], codes[len(e):]
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(ca.tolist(), cb.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        roots = np.fromiter((find(i) for i in range(n)), np.int64, n)
        vals = pd.Series(uniq)
        rep = vals.groupby(roots).transform("min")
        return pa.Table.from_pandas(
            pd.DataFrame({"node": vals, "rep": rep}), schema=_nr(id_type),
            preserve_index=False,
        ).replace_schema_metadata(None)

    if sum(ray.get([n_edges.remote(r) for r in block_refs])) <= small_edges:
        return rd.from_arrow_refs([local_components.remote(*block_refs)])

    parts = [bucketize.options(num_returns=B).remote(r) for r in block_refs]
    edge_refs, label_refs = [], []
    for k in range(B):
        e_ref, l_ref = init_bucket.remote(*[p[k] for p in parts])
        edge_refs.append(e_ref)
        label_refs.append(l_ref)
    for _ in range(max_iters):
        outs = [
            step.options(num_returns=B).remote(edge_refs[k], label_refs[k])
            for k in range(B)
        ]
        folded = [
            fold.remote(label_refs[k], *[outs[j][k] for j in range(B)])
            for k in range(B)
        ]
        label_refs = [f[0] for f in folded]
        if sum(ray.get([f[1] for f in folded])) == 0:
            break
    return rd.from_arrow_refs(label_refs)


def minhash_lsh_clusters(
    ds,
    *,
    n_perm: int = 8,
    band_size: int = 2,
    threshold_pm: int = 700,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    max_bucket: int = 256,
    max_iters: int = 50,
    small_edges: int = 1_000_000,
):
    """Near-dup clustering: shingle→minhash→band→bucket→verify→components.

    Returns a Dataset of (doc_id, cluster_rep) for EVERY input doc
    (rep = min doc_id of its verified near-dup component; singletons map
    to themselves). The verify step computes exact token-set Jaccard with
    INTEGER arithmetic (``1000·|A∩B| ≥ threshold_pm·|A∪B|``), so LSH only
    proposes candidates — false positives cannot survive — and the DuckDB
    oracle reproduces the predicate bit-for-bit.

    Every step is a Dataset pass (round 1 collected candidate pairs,
    token sets and a union-find ON THE DRIVER — at a realistic 20–50% dup
    rate that is O(corpus) driver state):

    1. band rows CARRY the doc's token set as a fixed-width array of
       sorted distinct u64 token hashes (8 bytes/token — severalfold
       smaller than the raw token text the first formulation shipped;
       the token payload dominates this op's shuffle bytes); one
       hash(band-bucket) shuffle co-locates every candidate pair WITH
       both token-hash sets, so exact Jaccard over the HASH sets runs
       inside the bucket — no per-pair routing shuffle, and each set is
       shipped once per band (4×), not once per pair-degree. Jaccard on
       64-bit hash sets equals Jaccard on token sets unless two distinct
       tokens of a compared pair collide: P ≲ (|A|+|B|)²/2⁶⁵ ≈ 1e-11 at
       10k tokens/doc — the documented collision budget (the DuckDB
       oracle keeps the token-set predicate, identical under it);
    2. components: iterative hash-to-min label propagation over the
       verified edges (two bounded shuffles per round on O(involved)
       rows, materialized between rounds because each round's labels
       feed the next); near-dup components are almost-cliques, so this
       converges in 1–3 rounds;
    3. assign: union(all docs as self-labels, final labels) → min —
       one bounded shuffle over O(#docs) tiny rows.

    Token-less docs emit no bands (can never pair) and map to themselves.
    A pair sharing several bands is verified once per shared band (≤4×);
    duplicate edges are harmless to min-propagation.
    """
    dtypes = _pd_dtypes(ds)
    id_dtype = dtypes[id_col]
    pair_empty = typed_empty(a=id_dtype, b=id_dtype)

    # ---- 1. band rows (with token payload) → in-bucket verify ----------
    def sig_and_bands(batch: pa.Table) -> pa.Table:
        # batch-vectorized front half: one tokenize/factorize pass, md5
        # per DISTINCT token, segmented minima per permutation; only the
        # band-string formatting and per-doc distinct-set payload remain
        # per-doc (both O(docs), not O(token instances))
        starts, doc_sel, th = batch_token_hash_flat(batch[column])
        n_bands = n_perm // band_size
        if len(starts) == 0:
            t_out = pa.table(
                {
                    id_col: pa.array([], type=batch[id_col].type),
                    "bucket": pa.array([], type=pa.string()),
                    "thash": pa.array([], type=pa.binary()),
                }
            )
            return t_out.append_column("__sb", _bucket_of([], n_buckets))
        seeds = np.array([_seed(i) for i in range(n_perm)], dtype=np.uint64)
        mixed = np.bitwise_xor(th[:, None], seeds[None, :])
        mins_all = np.minimum.reduceat(mixed, starts, axis=0)
        ends = np.r_[starts[1:], len(th)]
        ids = batch[id_col].take(pa.array(doc_sel)).to_pylist()
        rows_id, rows_bucket, rows_toks = [], [], []
        for di, d in enumerate(ids):
            payload = np.unique(th[starts[di] : ends[di]]).tobytes()
            mins = mins_all[di]
            for b in range(n_bands):
                sig = ",".join(
                    f"{int(v):016x}" for v in mins[b * band_size : (b + 1) * band_size]
                )
                rows_id.append(d)
                rows_bucket.append(f"{b}:{sig}")
                rows_toks.append(payload)
        t_out = pa.table(
            {
                id_col: pa.array(rows_id, type=batch[id_col].type),
                "bucket": pa.array(rows_bucket, type=pa.string()),
                "thash": pa.array(rows_toks, type=pa.binary()),
            }
        )
        return t_out.append_column("__sb", _bucket_of(rows_bucket, n_buckets))

    def verify_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """Per band bucket: cap, exact pairwise token-intersection counts
        via a BLOCKED DENSE MATMUL over the group's token-incidence
        matrix (docs × distinct-tokens, vocab-chunked so memory stays
        O(k·chunk)), integer-exact Jaccard filter — then collapse the
        bucket's verified subgraph to a spanning star (bucket-local
        union-find, bounded by max_bucket) so the global component pass
        sees O(k) edges per bucket instead of an O(k²) clique.

        Near-dup cliques share ALL their bands, so the same doc-set
        reaches this task once per band — a dedupe on the exact doc-id
        set skips the redundant re-verifications (duplicate edges would
        be harmless to min-propagation but cost the full matmul). The
        earlier formulation (explode (doc, token) + pandas self-merge)
        was O(Σ per-token count²) rows — a 256-doc near-identical
        cluster materialized ~33M-row frames and one hot bucket ran
        12.7 s; the matmul form is a bounded 256×chunk BLAS call."""
        if group.empty:
            return pair_empty.copy()
        out_frames: list[pd.DataFrame] = []
        seen_sets: set[bytes] = set()
        for _, sub in group.groupby("bucket", sort=False):
            sub = sub.drop_duplicates(id_col).sort_values(id_col).head(max_bucket)
            if len(sub) < 2:
                continue
            docs = sub[id_col].to_numpy()
            set_key = docs.tobytes() if docs.dtype != object else "\0".join(
                map(str, docs)
            ).encode()
            if set_key in seen_sets:
                continue
            seen_sets.add(set_key)
            hash_sets = [np.frombuffer(t, np.uint64) for t in sub["thash"]]
            sizes = np.fromiter((len(t) for t in hash_sets), np.int64, len(hash_sets))
            k = len(docs)
            row_ids = np.repeat(np.arange(k), sizes)
            # vectorized hash→column index (replaces the per-token dict hop)
            uniq, col_ids = np.unique(np.concatenate(hash_sets), return_inverse=True)
            V = len(uniq)
            inter = np.zeros((k, k), np.int64)
            chunk = 8192
            for start in range(0, V, chunk):
                width = min(chunk, V - start)
                sel = (col_ids >= start) & (col_ids < start + width)
                a = np.zeros((k, width), np.float32)
                a[row_ids[sel], col_ids[sel] - start] = 1.0
                inter += (a @ a.T).astype(np.int64)
            ix, iy = np.triu_indices(k, 1)
            i = inter[ix, iy]
            keep = 1000 * i >= threshold_pm * (sizes[ix] + sizes[iy] - i)
            if not keep.any():
                continue
            # bucket-local union-find → star edges (root=min local index)
            parent = np.arange(len(docs))

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for ux, uy in zip(ix[keep], iy[keep]):
                rx, ry = find(ux), find(uy)
                if rx != ry:
                    lo, hi = (rx, ry) if rx < ry else (ry, rx)
                    parent[hi] = lo
            roots = np.array([find(x) for x in range(len(docs))])
            members = np.nonzero(roots != np.arange(len(docs)))[0]
            if members.size:
                out_frames.append(
                    pd.DataFrame({"a": docs[roots[members]], "b": docs[members]})
                )
        if not out_frames:
            return pair_empty.copy()
        return pd.concat(out_frames, ignore_index=True)

    verified = (
        ds.map_batches(sig_and_bands, batch_format="pyarrow")
        .groupby("__sb")
        .map_groups(verify_in_bucket, batch_format="pandas")
    )

    # ---- 3. connected components: BSP hash-to-min over raw Ray tasks ---
    id_arrow = pa.string() if np.dtype(id_dtype) == object else pa.from_numpy_dtype(np.dtype(id_dtype))
    labels = _components_bsp(
        verified, id_arrow, max_iters=max_iters, small_edges=small_edges
    )

    # ---- 4. assign: every doc, singletons map to themselves ------------
    def self_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch[id_col], "rep": batch[id_col]})

    final = bucketed_aggregate(
        ds.map_batches(self_rows, batch_format="pyarrow").union(
            labels.select_columns(["node", "rep"])
        ),
        ["node"],
        lambda df: df.groupby("node", as_index=False)["rep"].min(),
        n_buckets=n_buckets,
        empty=typed_empty(node=id_dtype, rep=id_dtype),
        coalesce_first=False,
    )
    return final.map_batches(
        lambda t: t.rename_columns([id_col, "cluster_rep"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# simhash near-dup pairs (pigeonhole-exact banding)
# ---------------------------------------------------------------------------


def hamming64_pairs(
    sig_ds,
    *,
    sig_col: str = "sig",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    n_buckets: int = DEFAULT_BUCKETS,
    id_dtype=None,
):
    """All pairs of 64-bit signatures at hamming distance ≤
    ``max_hamming`` — the banded near-dup primitive shared by text
    simhash and image perceptual hashes. Input: a dataset with
    ``(id_col, sig_col uint64)``; output (doc_a, doc_b, hamming) with
    doc_a < doc_b.

    With 8 bands of 8 bits, any pair at hamming ≤ 7 shares at least one
    identical band (pigeonhole), so band-bucketing + in-bucket popcount
    verification is EXACT for ``max_hamming`` ≤ 7 — the scale path: the
    shuffle carries 8 rows per signature, never candidate pairs, and no
    all-pairs scan exists anywhere.
    """
    if max_hamming > 7:
        raise ValueError(
            "8 bands of 8 bits guarantee candidate capture only for "
            f"hamming <= 7 (pigeonhole); got max_hamming={max_hamming}"
        )
    if id_dtype is None:  # callers pass it to keep schema resolution
        id_dtype = _pd_dtypes(sig_ds)[id_col]  # metadata-only upstream

    # all 8·256 possible band-bucket labels, precomputed once
    _band_lut = np.array(
        [f"{b}:{v:02x}" for b in range(8) for v in range(256)], dtype=object
    )

    def bands(batch: pa.Table) -> pa.Table:
        # Vectorized banding: the 8 byte-bands come from one shift/mask
        # matrix and the labels gather from a 2048-entry LUT — no
        # Python per (doc, band).
        sig_np = batch[sig_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sig_np)
        b_idx = np.arange(8, dtype=np.uint64)
        bytes_mat = (
            (sig_np[:, None] >> (np.uint64(8) * b_idx[None, :])) & np.uint64(0xFF)
        ).astype(np.int64)  # (n, 8) doc-major like the original loop
        lut_idx = (np.arange(8, dtype=np.int64)[None, :] * 256 + bytes_mat).ravel()
        rows_bucket = _band_lut[lut_idx]
        t = pa.table(
            {
                id_col: batch[id_col].take(
                    pa.array(np.repeat(np.arange(n, dtype=np.int64), 8))
                ),
                "sig": pa.array(np.repeat(sig_np, 8), type=pa.uint64()),
                "bucket": pa.array(rows_bucket, type=pa.string()),
            }
        )
        return t.append_column("__sb", _bucket_of(rows_bucket, n_buckets))

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
        sig_ds.map_batches(bands, batch_format="pyarrow")
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


def simhash_dup_pairs(
    ds,
    *,
    max_hamming: int = 6,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
):
    """All pairs with simhash hamming distance ≤ ``max_hamming`` —
    :func:`hamming64_pairs` over text simhash signatures. Returns
    (doc_a, doc_b, hamming), doc_a < doc_b; token-less docs emit no
    signature (simhash_batch) and so never pair. The DuckDB oracle does
    the quadratic scan the banding avoids."""
    from .text_analysis import simhash_batch

    def sigs(batch: pa.Table) -> pa.Table:
        sig_t = simhash_batch(batch, column)
        return pa.table(
            {
                id_col: sig_t["doc_id"],
                "sig": pa.array(
                    [int(s, 16) for s in sig_t["simhash"].to_pylist()],
                    type=pa.uint64(),
                ),
            }
        )

    return hamming64_pairs(
        ds.map_batches(sigs, batch_format="pyarrow"),
        sig_col="sig",
        id_col=id_col,
        max_hamming=max_hamming,
        n_buckets=n_buckets,
        id_dtype=_pd_dtypes(ds)[id_col],
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def _ngram_intersections(
    ds,
    *,
    n: int,
    column: str,
    id_col: str,
    n_buckets: int,
    max_docs_per_shingle: int,
):
    """Shared candidate machinery for the n-gram set-similarity pair
    operators (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`):
    → a Dataset of (doc_a, doc_b, i, sa, sb) = intersection size plus
    both docs' DISTINCT n-gram set sizes for every pair sharing ≥1 kept
    shingle.

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
        # Vectorized (hygiene.contamination pattern): windows are n
        # shifted zero-copy slices joined in ONE Arrow kernel; per-doc
        # distinctness + per-doc gram counts via np.unique/bincount on
        # a fused row×vocab key. No Python per gram instance.
        flat, parent = batch_tokens_flat(batch[column])
        n_win = len(parent) - n + 1
        rows_g_arr = pa.array([], type=pa.string())
        sel_rows = np.empty(0, np.int64)
        rows_n = np.empty(0, np.int64)
        if n_win > 0:
            valid = parent[:n_win] == parent[n - 1 :]
            if valid.any():
                g_all = pc.binary_join_element_wise(
                    *[flat.slice(j, n_win) for j in range(n)], " "
                ).filter(pa.array(valid))
                p = parent[:n_win][valid]
                enc = g_all.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                v = max(len(enc.dictionary), 1)
                uk = np.unique(p * v + codes)
                u_doc = uk // v
                per_doc = np.bincount(u_doc)  # distinct grams per doc index
                rows_g_arr = enc.dictionary.take(pa.array(uk % v))
                sel_rows = u_doc
                rows_n = per_doc[u_doc].astype(np.int64)
        t_out = pa.table(
            {
                id_col: batch[id_col].take(pa.array(sel_rows)),
                "g": rows_g_arr,
                "n": pa.array(rows_n),
            }
        )
        return t_out.append_column(
            "__sb", _bucket_of(rows_g_arr.to_numpy(zero_copy_only=False), n_buckets)
        )

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

    return bucketed_aggregate(
        sh.groupby("__sb").map_groups(bucket_inter, batch_format="pandas"),
        ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            i=("i", "sum"), sa=("sa", "first"), sb=("sb", "first")
        ),
        n_buckets=n_buckets,
        empty=pair_empty,
    )


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
    end-to-end, so the DuckDB oracle matches bit-for-bit. Candidate and
    intersection machinery (bounded shuffles, boilerplate-shingle cap,
    sizes carried on shingle rows) in :func:`_ngram_intersections`.
    """
    inter = _ngram_intersections(
        ds, n=n, column=column, id_col=id_col, n_buckets=n_buckets,
        max_docs_per_shingle=max_docs_per_shingle,
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


def containment_pairs(
    ds,
    *,
    n: int = 3,
    threshold_pm: int = 800,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    max_docs_per_shingle: int = 1024,
):
    """ASYMMETRIC near-dup pairs by max-containment: pairs whose
    DISTINCT word-n-gram sets satisfy ``|A∩B| / min(|A|,|B|) ≥
    threshold_pm/1000`` → (doc_a, doc_b, cont_pm). This is the
    subset-document detector Jaccard structurally misses: a snippet
    fully contained in a 100× longer page has containment 1.0 but
    Jaccard ≈ |A|/|B| ≈ 0.01 — quote farms, syndicated excerpts and
    page-plus-boilerplate wrappers all live in this gap (the C(A,B)
    measure of Broder's resemblance/containment pair).

    Output ``cont_pm = (1000*|A∩B|) // min(|A|,|B|)``, integer
    end-to-end (DuckDB oracle uses LEAST). Same bounded-shuffle
    candidate machinery as :func:`ngram_jaccard_pairs`
    (:func:`_ngram_intersections`); only the verify predicate differs.
    """
    inter = _ngram_intersections(
        ds, n=n, column=column, id_col=id_col, n_buckets=n_buckets,
        max_docs_per_shingle=max_docs_per_shingle,
    )

    def finish(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy().astype(np.int64)
        sa = batch["sa"].to_numpy().astype(np.int64)
        sb = batch["sb"].to_numpy().astype(np.int64)
        mn = np.minimum(sa, sb)
        keep = (mn > 0) & (1000 * i >= threshold_pm * mn)
        cont = (1000 * i[keep]) // mn[keep]
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)),
                "doc_b": batch["doc_b"].filter(pa.array(keep)),
                "cont_pm": pa.array(cont.astype(np.int64)),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


def ppjoin_pairs(
    ds,
    *,
    n: int = 4,
    threshold_pm: int = 500,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    max_docs_per_prefix: int = 4096,
):
    """Set-similarity join with PREFIX FILTERING (PPJoin-lite, Xiao et
    al. WWW'08): pairs of docs whose DISTINCT word-n-gram sets have
    Jaccard ≥ ``threshold_pm``/1000 → (doc_a, doc_b, jacc_pm). Unlike
    :func:`ngram_jaccard_pairs` (which expands candidates at EVERY
    shared shingle), only a doc's ``p = |d| − ceil(t·|d|) + 1`` RAREST
    shingles (global (df, hash) order) generate candidates — the
    standard completeness guarantee: two sets with J ≥ t must share at
    least one token inside both prefixes, so no qualifying pair is
    missed while near-miss pairs mostly never meet. A length filter
    (``1000·max(|A|,|B|) · t ≤ 1000·min``) prunes survivors before the
    exact verify.

    Shuffle plan (all bounded):
    1. shingle rows keyed ``gh % B`` — df census AND attach in the same
       bucket (a shingle's rows co-locate, no separate join);
    2. doc-keyed bucket: one vectorized (sort + np.split) pass derives
       each doc's global-order prefix; prefix rows carry the doc's full
       sorted u64 shingle-hash array (the LSH-verify payload pattern —
       shuffle bytes ∝ prefix fraction × set bytes);
    3. prefix-token bucket: candidate pairs per shared prefix token,
       in-bucket pair dedupe + length filter, exact sorted-array
       intersection (same integer predicate as the oracle, modulo the
       documented md5-u64 collision budget);
    4. one tiny pair-keyed dedupe across buckets (verified pairs only).

    ``max_docs_per_prefix`` caps a degenerate hot prefix token (keep it
    above the corpus duplicate multiplicity when comparing exactly —
    prefix tokens are each doc's RAREST, so this only fires on
    pathological skew).
    """
    dtypes = _pd_dtypes(ds)
    id_dtype = dtypes[id_col]
    t = threshold_pm

    def shingles(batch: pa.Table) -> pa.Table:
        # Vectorized: windows via n shifted slices + ONE Arrow join
        # kernel, md5 once per DISTINCT gram string, then per-doc
        # hash-sorted dedup (downstream relies on each doc's gh run
        # being sorted ascending, exactly like the old per-doc
        # np.unique) via one lexsort. No Python per gram instance.
        cache = tok_hash_cache()
        flat, parent = batch_tokens_flat(batch[column])
        n_win = len(parent) - n + 1
        u_doc = np.empty(0, np.int64)
        gh = np.empty(0, np.uint64)
        if n_win > 0:
            valid = parent[:n_win] == parent[n - 1 :]
            if valid.any():
                g_all = pc.binary_join_element_wise(
                    *[flat.slice(j, n_win) for j in range(n)], " "
                ).filter(pa.array(valid))
                p = parent[:n_win][valid]
                enc = g_all.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                v = max(len(enc.dictionary), 1)
                uk = np.unique(p * v + codes)
                u_doc, u_code = uk // v, uk % v
                vocab = enc.dictionary.to_pylist()
                vh = np.fromiter((cache[w] for w in vocab), np.uint64, len(vocab))
                gh = vh[u_code]
                order = np.lexsort((gh, u_doc))
                u_doc, gh = u_doc[order], gh[order]
                # distinct-by-hash within doc (md5 collisions collapse,
                # matching the old per-doc np.unique over hashes)
                keep = np.r_[
                    True, (u_doc[1:] != u_doc[:-1]) | (gh[1:] != gh[:-1])
                ]
                u_doc, gh = u_doc[keep], gh[keep]
        n_per = (
            np.bincount(u_doc)[u_doc].astype(np.int64)
            if len(u_doc)
            else np.empty(0, np.int64)
        )
        out = pa.table(
            {
                id_col: batch[id_col].take(pa.array(u_doc)),
                "gh": pa.array(gh.astype(np.int64)),
                "n": pa.array(n_per),
            }
        )
        return out.append_column(
            "__gb", pa.array((gh % np.uint64(n_buckets)).astype(np.int32))
        )

    df_empty = typed_empty(
        **{id_col: id_dtype, "gh": np.int64, "n": np.int64, "df": np.int64}
    )

    def attach_df(group: pd.DataFrame) -> pd.DataFrame:
        """df census + attach inside the shingle bucket (co-located)."""
        if group.empty:
            return df_empty.copy()
        g = group[[id_col, "gh", "n"]].copy()
        g["df"] = g.groupby("gh")["gh"].transform("size").astype(np.int64)
        return g

    with_df = ds.map_batches(shingles, batch_format="pyarrow").groupby(
        "__gb"
    ).map_groups(attach_df, batch_format="pandas")

    def prefix_rows(group: pd.DataFrame) -> pd.DataFrame:
        """per-doc prefix under the global (df, gh) order; one sort +
        np.split pass, no per-doc Python loop on the hot path."""
        if group.empty:
            return pd.DataFrame(
                {
                    "gh": pd.Series([], dtype=np.int64),
                    "doc": pd.Series([], dtype=id_dtype),
                    "n": pd.Series([], dtype=np.int64),
                    "set": pd.Series([], dtype=object),
                }
            )
        g = group.sort_values(
            [id_col, "df", "gh"], kind="mergesort"
        ).reset_index(drop=True)
        docs = g[id_col].to_numpy()
        gh = g["gh"].to_numpy()
        sizes = g["n"].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, docs[1:] != docs[:-1]]
        )
        pos = np.arange(len(g)) - np.repeat(starts, np.diff(np.r_[starts, len(g)]))
        # p = |d| − ceil(t·|d|/1000) + 1
        p = sizes - (-(-(t * sizes) // 1000)) + 1
        keep = pos < p
        # the doc's FULL set, sorted by hash (for the exact verify)
        sets = {}
        for s, e in zip(starts, np.r_[starts[1:], len(g)]):
            sets[docs[s]] = np.sort(gh[s:e].astype(np.uint64))
        out = pd.DataFrame(
            {
                "gh": gh[keep],
                "doc": docs[keep],
                "n": sizes[keep],
            }
        )
        out["set"] = [sets[d] for d in out["doc"]]
        return out

    pref = (
        with_df.map_batches(
            lambda b: b.append_column(
                "__db",
                pa.array(
                    (
                        fast_hash_u64(b[id_col].to_numpy(zero_copy_only=False))
                        % np.uint64(n_buckets)
                    ).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("__db")
        .map_groups(prefix_rows, batch_format="pandas")
    )

    pair_empty = typed_empty(
        doc_a=id_dtype, doc_b=id_dtype, jacc_pm=np.int64
    )

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pair_empty.copy()
        g = group
        vc = g["gh"].value_counts()
        hot = vc[vc > max_docs_per_prefix].index
        if len(hot):
            g = g[~g["gh"].isin(hot)]
        m = g.merge(g, on="gh", suffixes=("_x", "_y"))
        m = m[m["doc_x"] < m["doc_y"]]
        if m.empty:
            return pair_empty.copy()
        # length filter: J ≥ t needs t·max(|A|,|B|) ≤ 1000·min(|A|,|B|)
        nx, ny = m["n_x"].to_numpy(), m["n_y"].to_numpy()
        ok = t * np.maximum(nx, ny) <= 1000 * np.minimum(nx, ny)
        m = m[ok].drop_duplicates(subset=["doc_x", "doc_y"])
        if m.empty:
            return pair_empty.copy()
        out_a, out_b, out_j = [], [], []
        for ax, bx, sx, sy, na, nb in zip(
            m["doc_x"], m["doc_y"], m["set_x"], m["set_y"],
            m["n_x"], m["n_y"],
        ):
            i = np.intersect1d(
                np.asarray(sx, np.uint64),
                np.asarray(sy, np.uint64),
                assume_unique=True,
            ).size
            uni = int(na) + int(nb) - i
            if uni > 0 and 1000 * i >= t * uni:
                out_a.append(ax)
                out_b.append(bx)
                out_j.append((1000 * i) // uni)
        if not out_a:
            return pair_empty.copy()
        return pd.DataFrame(
            {
                "doc_a": np.asarray(out_a),
                "doc_b": np.asarray(out_b),
                "jacc_pm": np.asarray(out_j, np.int64),
            }
        )

    def tag_prefix_bucket(batch: pa.Table) -> pa.Table:
        gh = batch["gh"].to_numpy().astype(np.uint64)
        return batch.append_column(
            "__pb", pa.array((gh % np.uint64(n_buckets)).astype(np.int32))
        )

    verified = (
        pref.map_batches(tag_prefix_bucket, batch_format="pyarrow")
        .groupby("__pb")
        .map_groups(verify_bucket, batch_format="pandas")
    )

    # a pair can share prefix tokens in several buckets → one tiny dedupe
    return bucketed_aggregate(
        verified,
        ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(subset=["doc_a", "doc_b"]),
        n_buckets=n_buckets,
        empty=pair_empty,
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (k-token windows)
# ---------------------------------------------------------------------------


def kgram_dup_spans(
    ds,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
):
    """Exact duplicated-substring detection — the "remove repeated spans"
    pass of corpus dedup (Lee et al. 2022, *Deduplicating Training Data
    Makes Language Models Better*, done there with suffix arrays): count,
    per document, the k-token window positions whose window text recurs
    anywhere in the corpus (>= 2 occurrences, multiplicity counted,
    same-document repeats included). Documents with zero duplicated
    windows emit no row.

    Scale shape: windows ship as 64-bit rolling polynomial hashes over
    per-token siphashes (a fixed 8-byte shuffle key per position — the
    window TEXT never leaves the mapper; at 10^12-window scale widen the
    same fold to 128 bits to keep the collision budget negligible). One
    bounded-bucket shuffle groups by window hash — each window value lands
    wholly in one bucket, so the >=2 test is exact — and per-doc partial
    counts come back per bucket; a second, tiny, shuffle sums them per
    doc. No driver-side state; per-task structures are O(rows-in-bucket).
    """
    dtypes = _pd_dtypes(ds)
    P = np.uint64(1099511628211)

    def explode(batch: pa.Table) -> pa.Table:
        idx_chunks: list[np.ndarray] = []
        h_chunks: list[np.ndarray] = []
        texts = batch[text_col].to_pylist()
        for row, t in enumerate(texts):
            toks = [w for w in (t or "").split(" ") if w]
            n = len(toks)
            if n < k:
                continue
            th = fast_hash_u64(toks)
            m = n - k + 1
            g = np.zeros(m, dtype=np.uint64)
            for j in range(k):  # k vectorized folds per doc, not per window
                g = g * P + th[j : j + m]
            idx_chunks.append(np.full(m, row, dtype=np.int64))
            h_chunks.append(g)
        if not idx_chunks:
            return pa.table(
                {
                    id_col: pa.array([], type=batch[id_col].type),
                    "gh": pa.array([], type=pa.uint64()),
                }
            )
        ids = batch[id_col].take(pa.array(np.concatenate(idx_chunks)))
        return pa.table({id_col: ids, "gh": pa.array(np.concatenate(h_chunks))})

    empty = typed_empty(**{id_col: dtypes[id_col], "dup_kgrams": np.int64})

    def dup_partials(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("gh")["gh"].transform("size")
        sub = df[sizes >= 2]
        if sub.empty:
            return empty.copy()
        out = sub.groupby(id_col).size().reset_index(name="dup_kgrams")
        return out.astype({"dup_kgrams": np.int64})

    partials = bucketed_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["gh"],
        dup_partials,
        n_buckets=n_buckets,
        empty=empty,
    )
    return bucketed_aggregate(
        partials,
        [id_col],
        lambda df: df.groupby(id_col, as_index=False)["dup_kgrams"].sum(),
        n_buckets=max(8, n_buckets // 8),
        empty=empty,
        coalesce_first=False,
    )

def fuzzy_dedup_survivors(
    ds,
    *,
    n_perm: int = 8,
    band_size: int = 2,
    threshold_pm: int = 700,
    column: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    max_bucket: int = 256,
):
    """End-to-end fuzzy dedup: the docs that SURVIVE MinHash+LSH
    near-dedup — one row ``(doc_id, cluster_size)`` per kept doc, where
    the keeper is the min-id member of each verified near-dup component
    (singletons survive with size 1). This is the operator a corpus
    curator actually runs ("give me the deduplicated corpus"), layered on
    :func:`minhash_lsh_clusters`' (doc_id, cluster_rep) assignment.

    Scale shape: the cluster assignment already emits rep = min(doc_id)
    per component, so survivor selection is ONE extra bounded-bucket
    shuffle keyed on ``cluster_rep`` (each component lands wholly in one
    bucket) with a vectorized per-rep size count — no driver state.
    """
    clusters = minhash_lsh_clusters(
        ds,
        n_perm=n_perm,
        band_size=band_size,
        threshold_pm=threshold_pm,
        column=column,
        id_col=id_col,
        n_buckets=n_buckets,
        max_bucket=max_bucket,
    )
    dtypes = _pd_dtypes(ds)
    empty = typed_empty(**{id_col: dtypes[id_col], "cluster_size": np.int64})

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_rep", as_index=False).size()
        out = g.rename(columns={"cluster_rep": id_col, "size": "cluster_size"})
        out["cluster_size"] = out["cluster_size"].astype(np.int64)
        return out[[id_col, "cluster_size"]]

    return bucketed_aggregate(
        clusters, ["cluster_rep"], collapse, n_buckets=n_buckets, empty=empty
    )


# ---------------------------------------------------------------------------
# edit-distance-1 token pairs (FastSS deletion-neighborhood blocking)
# ---------------------------------------------------------------------------


def _edit1(a: str, b: str) -> bool:
    """Exact edit-distance-==-1 predicate (two-pointer, O(len))."""
    la, lb = len(a), len(b)
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return diff == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    # a must equal b with exactly one char removed
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def typo_token_pairs(ds, *, column: str = "token", n_buckets: int = DEFAULT_BUCKETS):
    """All token pairs at edit distance EXACTLY 1 — the typo/variant
    mining primitive (query expansion, OCR-confusion harvesting, fuzzy
    vocab folding) — via FastSS deletion-neighborhood blocking (Bocek et
    al. 2007): two strings are within one edit iff they share a member of
    {s} ∪ {s minus one char}, so each token is replicated to its len+1
    deletion keys, candidates meet inside a key bucket, and an exact
    two-pointer verify keeps true pairs only.

    Scale shape: the shuffle ships (len+1) short key rows per DISTINCT
    token — linear in vocabulary bytes, never quadratic; candidate
    verification runs inside each deletion-key group (groups are small:
    tokens sharing a deletion variant), and one final bucketed aggregate
    dedupes pairs that met under several shared keys. Web-scale caveat
    (documented, like the LSH hot-shingle cap): deletion keys of very
    frequent SHORT tokens can run hot — cap group size upstream if the
    vocabulary has a heavy 1–2 char head.
    """
    key_empty = typed_empty(t1=object, t2=object)

    def keys(batch: pa.Table) -> pa.Table:
        toks = set(batch[column].to_pylist())
        toks.discard(None)
        out_k, out_t = [], []
        for t in toks:
            out_k.append(t)
            out_t.append(t)
            for i in range(len(t)):
                out_k.append(t[:i] + t[i + 1 :])
                out_t.append(t)
        return pa.table(
            {"k": pa.array(out_k, pa.string()), "t": pa.array(out_t, pa.string())}
        )

    def pairs_in_key(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for _, g in df.groupby("k", sort=False):
            ts = sorted(set(g["t"]))
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    if _edit1(ts[i], ts[j]):
                        out1.append(ts[i])
                        out2.append(ts[j])
        if not out1:
            return key_empty.copy()
        return pd.DataFrame({"t1": out1, "t2": out2})

    cand = bucketed_aggregate(
        ds.map_batches(keys, batch_format="pyarrow"),
        ["k"],
        pairs_in_key,
        n_buckets=n_buckets,
        empty=key_empty,
        coalesce_first=False,
    )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["t1", "t2"])
        return d if len(d) else key_empty.copy()

    return bucketed_aggregate(
        cand,
        ["t1", "t2"],
        distinct,
        n_buckets=n_buckets,
        empty=key_empty,
        coalesce_first=False,
    )


# ---------------------------------------------------------------------------
# sorted-neighborhood near-dup pairs (Hernandez & Stolfo SNM)
# ---------------------------------------------------------------------------


def sorted_neighborhood_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_chars: int = 24,
    window: int = 4,
    threshold_pm: int = 800,
    n_buckets: int = 64,
):
    """Sorted-neighborhood near-dup candidates: order records by a
    blocking key (the first ``key_chars`` characters of the text, doc id
    tie-break), compare each record only with its ``window`` successors
    in that order, and keep pairs whose distinct-token Jaccard reaches
    ``threshold_pm`` per-mille (Hernández & Stolfo 1995 — the classic
    record-linkage blocking family LSH/SimHash/FastSS don't cover: one
    linear pass over a sort order instead of hash buckets). Returns
    ``(doc_a, doc_b, j_pm)`` with doc_a the lower-ranked record.

    Scale shape — NO global sort materializes anywhere:
    1. global rank per record via the order-preserving-bin two-pass
       (first-8-byte key prefix → driver prefix sums over the ≤ #distinct
       prefixes histogram — the documented bounded-distinct assumption of
       ``percent_rank_map`` — then in-bin (key, id) cumcount);
    2. ranks are a contiguous 0..N-1 sequence, so the window join is a
       band join on rank: each record ships to rank-stripe ``rnk // window``
       and its successor stripe (2× replication), and inside a stripe the
       d-th successor is literally ``rows[i + d]`` — a vectorized shift,
       no comparisons;
    3. Jaccard verify on the co-shipped distinct-token strings, pairs
       emitted only from the higher rank's home stripe (each pair once).
    """

    def _key_prefix_u64(keys: list[str]) -> np.ndarray:
        out = np.empty(len(keys), dtype=np.uint64)
        for i, k in enumerate(keys):
            b = k.encode("utf-8")[:8].ljust(8, b"\0")
            out[i] = int.from_bytes(b, "big")
        return out

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        keys = [(t or "")[:key_chars] for t in texts]
        toks = [" ".join(sorted(set((t or "").split(" ")) - {""})) for t in texts]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "key": pa.array(keys, type=pa.string()),
                "toks": pa.array(toks, type=pa.string()),
                "__bin": pa.array(_key_prefix_u64(keys).astype(np.int64)),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # pass 1: per-bin counts -> driver prefix sums (O(#distinct prefixes))
    import ray
    from ray.data.aggregate import Count

    hist = (
        keyed_ds.groupby("__bin")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("__bin")
    )
    bins = hist["__bin"].to_numpy(np.int64)
    starts = np.concatenate([[0], np.cumsum(hist["n"].to_numpy(np.int64))[:-1]])
    ref = ray.put((bins, starts))

    rank_empty = typed_empty(**{id_col: np.int64, "toks": object, "rnk": np.int64})

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return rank_empty.copy()
        b, s = ray.get(ref)
        df = df.sort_values(["__bin", "key", id_col], kind="mergesort")
        cc = df.groupby("__bin").cumcount().to_numpy()
        rnk = s[np.searchsorted(b, df["__bin"].to_numpy())] + cc
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "toks": df["toks"].to_numpy(),
                "rnk": rnk.astype(np.int64),
            }
        )

    ranked = bucketed_aggregate(
        keyed_ds, ["__bin"], rank_bucket, n_buckets=n_buckets, empty=rank_empty
    )

    # pass 2: band join on rank via stripe replication
    def striped(batch: pa.Table) -> pa.Table:
        r = batch["rnk"].to_numpy()
        home = r // window
        t = pa.concat_tables(
            [
                batch.append_column("g", pa.array(home.astype(np.int64))),
                batch.append_column("g", pa.array((home + 1).astype(np.int64))),
            ]
        )
        return t

    pair_empty = typed_empty(doc_a=np.int64, doc_b=np.int64, j_pm=np.int64)

    def pair_stripe(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pair_empty.copy()
        out_a, out_b, out_j = [], [], []
        for g, grp in df.groupby("g"):
            grp = grp.sort_values("rnk", kind="mergesort")
            ids = grp[id_col].to_numpy()
            rnk = grp["rnk"].to_numpy()
            sets = [set(t.split(" ")) - {""} for t in grp["toks"]]
            m = len(grp)
            for d in range(1, window + 1):
                for i in range(m - d):
                    rb = rnk[i + d]
                    if rb // window != g:  # emit in the higher rank's home stripe
                        continue
                    sa, sb = sets[i], sets[i + d]
                    union = len(sa | sb)
                    if union == 0:
                        continue
                    inter = len(sa & sb)
                    if 1000 * inter >= threshold_pm * union:
                        out_a.append(ids[i])
                        out_b.append(ids[i + d])
                        out_j.append(1000 * inter // union)
        if not out_a:
            return pair_empty.copy()
        return pd.DataFrame(
            {
                "doc_a": np.asarray(out_a, dtype=np.int64),
                "doc_b": np.asarray(out_b, dtype=np.int64),
                "j_pm": np.asarray(out_j, dtype=np.int64),
            }
        )

    return bucketed_aggregate(
        ranked.map_batches(striped, batch_format="pyarrow"),
        ["g"],
        pair_stripe,
        n_buckets=n_buckets,
        empty=pair_empty,
        coalesce_first=False,
    )
