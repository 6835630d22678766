"""Iterative graph algorithms over Ray Data: integer-exact PageRank.

The reference has no graph operators (its dataflow is linear ETL,
translate_bookcorpus.py:139-159); this module is part of the
beyond-reference surface a web-scale training-data pipeline needs —
link-graph centrality is a standard corpus-quality / crawl-prioritization
signal (PageRank over the page/link graph, harmonic centrality in Common
Crawl's ranking releases).

Scale shape (how every step behaves at 10^9+ nodes):
- **edge derivation** (:func:`item_transition_edges`): the per-user lag
  runs inside ``hash(user_id) % B`` buckets with ONE mergesort + numpy
  shift pass per bucket (the sessionize shape — never one Python call
  per user), emits per-bucket PARTIAL (src, dst) counts, then one
  bounded ``hash(src) % B`` shuffle finalizes edge weights.
- **iterations** (:func:`pagerank`): the static sides (edges joined with
  out-degrees, and the node set) are materialized ONCE as distributed
  object-store blocks — never on the driver; each of the ``iters``
  rounds is hash-join(ranks ⋈ edges on src) → per-bucket contribution
  sums keyed ``hash(dst) % B`` → left-join back to the node set. Rank
  state between rounds is one (node, rank) row per node, re-pinned per
  round so the lazy plan stays shallow.
- **arithmetic**: fixed-point int64 (``scale`` = 10^12) with floor
  divisions throughout, so summation order is irrelevant and the DuckDB
  oracle (five unrolled CTE iterations of the same recurrence) matches
  bit-for-bit. Contract notes: dangling-node mass is DROPPED (not
  redistributed) and self-loop transitions are excluded — both mirrored
  in the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import fast_hash_u64, typed_empty
from .text_analysis import json_int_field_batch

PR_SCALE = 10**12


def item_transition_edges(ds, *, n_buckets: int = 64):
    """events → weighted item-transition edges (src, dst, w).

    An edge src→dst is one user seeing item ``k=src`` then ``k=dst`` in
    two consecutive events (ordered by (ts, event_id) within the user);
    self-transitions are dropped, multiplicity becomes the weight."""

    def project(batch: pa.Table) -> pa.Table:
        t = json_int_field_batch(batch, column="props", key="k")
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        u = batch["user_id"].to_numpy()
        b = (fast_hash_u64(u) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": ts_us,
                "event_id": batch["event_id"],
                "k": t["k"],
                "__ub": pa.array(b),
            }
        )

    pair_empty = typed_empty(src=np.int64, dst=np.int64, w=np.int64, __eb=np.int32)

    def pairs_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pair_empty.copy()
        g = group.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        k = g["k"].to_numpy()
        same = u[1:] == u[:-1]
        src, dst = k[:-1][same], k[1:][same]
        keep = src != dst  # self-transitions carry no ranking signal
        src, dst = src[keep], dst[keep]
        if not len(src):
            return pair_empty.copy()
        df = (
            pd.DataFrame({"src": src, "dst": dst})
            .groupby(["src", "dst"], as_index=False)
            .size()
            .rename(columns={"size": "w"})
        )
        df["w"] = df["w"].astype(np.int64)
        df["__eb"] = (
            fast_hash_u64(df["src"].to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return df

    edge_empty = typed_empty(src=np.int64, dst=np.int64, w=np.int64)

    def sum_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return edge_empty.copy()
        out = group.groupby(["src", "dst"], as_index=False)["w"].sum()
        out["w"] = out["w"].astype(np.int64)
        return out

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__ub")
        .map_groups(pairs_per_bucket, batch_format="pandas")
        .groupby("__eb")
        .map_groups(sum_per_bucket, batch_format="pandas")
    )


def connected_components(edges, *, n_buckets: int = 32):
    """Undirected connected components of an (src, dst, ...) edge
    Dataset → (node, rep) with rep = MIN node id per component.

    Thin public wrapper over the BSP hash-to-min engine the LSH clusterer
    uses (``dedup._components_bsp``: edges bucket-pinned in the object
    store once, one task wave per round, driver holds O(B²) refs — never
    the graph). Nodes without edges do not appear (mirror the oracle's
    edge-derived node set, or union singletons in the caller)."""
    from .dedup import _components_bsp

    def to_pairs(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["src"], "b": batch["dst"]})

    pairs = edges.map_batches(to_pairs, batch_format="pyarrow")
    return _components_bsp(pairs, pa.int64(), n_buckets=n_buckets).select_columns(
        ["node", "rep"]
    )


def triangle_counts(edges, *, n_buckets: int = 32, small_edges: int = 2_000_000):
    """Per-node triangle counts over the UNDIRECTED, deduplicated graph
    of an (src, dst, ...) edge Dataset → (node, triangles); nodes in no
    triangle are absent (mirror of the oracle's GROUP BY over triangle
    participants).

    Degree-ordered node-iterator (the MapReduce triangle-counting shape
    from Suri & Vassilvitskii, WWW'11 — public algorithm):

    1. canonicalize (a=min, b=max) + per-bucket distinct — one bounded
       shuffle on a pair hash;
    2. degrees per node — one bounded shuffle;
    3. orient every edge from the (degree, id)-SMALLER endpoint to the
       larger: out-degree is then ≤ √(2m) per node, which bounds the
       wedge blow-up on hubs (a hot node of degree d contributes d·√(2m)
       wedges, not d²);
    4. wedges per source bucket: one self-merge per src inside the
       ``hash(src) % B`` bucket (vectorized; per-bucket memory ≤
       Σ_{u∈bucket} d_out(u)² ≤ |E_bucket|·√(2m));
    5. close each wedge (v, w) against the oriented edge set with a
       composite-key SEMI :func:`relational.hash_join` on (v, w) — each
       match is exactly one triangle (u, v, w), counted once because
       wedge pairs are emitted in orientation order;
    6. every match credits u, v and w — one final bounded count shuffle.

    Small-graph fast path (same escape hatch as :func:`pagerank`): at
    ≤ ``small_edges`` input edge rows ONE task runs the identical
    node-iterator algorithm over numpy/pandas locally — the distributed
    pipeline's ~6 barriers are pure fixed cost there (measured 43 s at
    bench sf0.1 for a 100-node graph). Bit-identical counts; the
    distributed path is pinned by tests at ``small_edges=0``.
    """
    from .relational import hash_join

    import ray
    import ray.data as rd

    edges = edges.materialize()
    block_refs = edges.to_arrow_refs()

    @ray.remote
    def _n_rows(block) -> int:
        return len(block)

    @ray.remote
    def _local_triangles(*blocks) -> pa.Table:
        frames = []
        for blk in blocks:
            df = blk if isinstance(blk, pd.DataFrame) else blk.to_pandas()
            if len(df) and "src" in df.columns:
                frames.append(df[["src", "dst"]])
        empty = pa.table(
            {"node": pa.array([], pa.int64()),
             "triangles": pa.array([], pa.int64())}
        )
        if not frames:
            return empty
        e = pd.concat(frames, ignore_index=True)
        s = e["src"].to_numpy(np.int64)
        d = e["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        und_l = (
            pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})
            .drop_duplicates()
        )
        if und_l.empty:
            return empty
        deg = (
            pd.concat([und_l["a"], und_l["b"]], ignore_index=True)
            .value_counts()
            .to_dict()
        )
        a = und_l["a"].to_numpy()
        b = und_l["b"].to_numpy()
        da = np.fromiter((deg[x] for x in a), np.int64, len(a))
        db = np.fromiter((deg[x] for x in b), np.int64, len(b))
        a_first = (da < db) | ((da == db) & (a < b))
        v = np.where(a_first, a, b)
        w = np.where(a_first, b, a)
        ori = pd.DataFrame({"v": v, "w": w})
        # wedges: self-merge per source, keep ordered pairs (w_x before
        # w_y in the same (degree, id) orientation order the distributed
        # path uses), then close against the oriented edge set
        wed = ori.merge(ori, on="v")
        dx = np.fromiter((deg[x] for x in wed["w_x"]), np.int64, len(wed))
        dy = np.fromiter((deg[x] for x in wed["w_y"]), np.int64, len(wed))
        before = (dx < dy) | ((dx == dy) & (wed["w_x"].to_numpy() < wed["w_y"].to_numpy()))
        wed = wed[before]
        closed = wed.merge(
            ori, left_on=["w_x", "w_y"], right_on=["v", "w"], how="inner",
            suffixes=("", "_e"),
        )
        if closed.empty:
            return empty
        nodes_all = np.concatenate(
            [closed["v"].to_numpy(), closed["w_x"].to_numpy(),
             closed["w_y"].to_numpy()]
        )
        cnt = pd.Series(nodes_all).value_counts().sort_index()
        return pa.table(
            {
                "node": pa.array(cnt.index.to_numpy(np.int64), pa.int64()),
                "triangles": pa.array(cnt.to_numpy(np.int64), pa.int64()),
            }
        )

    if block_refs and sum(
        ray.get([_n_rows.remote(r) for r in block_refs])
    ) <= small_edges:
        return rd.from_arrow_refs([_local_triangles.remote(*block_refs)])

    pair_empty = typed_empty(a=np.int64, b=np.int64)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a, b = np.minimum(s, d), np.maximum(s, d)
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
            np.uint64
        )
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "__pb": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def distinct_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pair_empty.copy()
        return group[["a", "b"]].drop_duplicates()

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("__pb")
        .map_groups(distinct_per_bucket, batch_format="pandas")
        .materialize()  # read twice: degree pass + closing-edge side
    )

    deg_empty = typed_empty(node=np.int64, deg=np.int64)

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        v = np.concatenate([batch["a"].to_numpy(), batch["b"].to_numpy()])
        df = pd.DataFrame({"node": v}).groupby("node", as_index=False).size()
        df = df.rename(columns={"size": "deg"})
        df["__db"] = (df["node"].to_numpy().astype(np.uint64)
                      % np.uint64(n_buckets)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def deg_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return deg_empty.copy()
        out = group.groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype(np.int64)
        return out

    degs = (
        und.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(deg_per_bucket, batch_format="pandas")
        .materialize()  # joined onto both endpoints below
    )

    def as_a(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["node"], "da": batch["deg"]})

    def as_b(batch: pa.Table) -> pa.Table:
        return pa.table({"b": batch["node"], "db": batch["deg"]})

    e1 = hash_join(und, degs.map_batches(as_a, batch_format="pyarrow"),
                   key="a", n_buckets=n_buckets)
    e2 = hash_join(e1, degs.map_batches(as_b, batch_format="pyarrow"),
                   key="b", n_buckets=n_buckets)

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        da = batch["da"].to_numpy()
        db = batch["db"].to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddst = np.where(a_first, db, da)
        sb = (src.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "ddst": pa.array(ddst.astype(np.int64), pa.int64()),
                "__sb": pa.array(sb),
            }
        )

    oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    wedge_empty = typed_empty(v=np.int64, w=np.int64, u=np.int64)

    def wedges_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return wedge_empty.copy()
        g = group[["src", "dst", "ddst"]]
        m = g.merge(g, on="src", suffixes=("_x", "_y"))
        lt = (m["ddst_x"].to_numpy() < m["ddst_y"].to_numpy()) | (
            (m["ddst_x"].to_numpy() == m["ddst_y"].to_numpy())
            & (m["dst_x"].to_numpy() < m["dst_y"].to_numpy())
        )
        m = m[lt]
        return pd.DataFrame(
            {
                "v": m["dst_x"].to_numpy(),
                "w": m["dst_y"].to_numpy(),
                "u": m["src"].to_numpy(),
            }
        )

    wedges = (
        oriented.groupby("__sb")
        .map_groups(wedges_per_bucket, batch_format="pandas")
    )

    def edge_key(batch: pa.Table) -> pa.Table:
        return pa.table({"v": batch["src"], "w": batch["dst"]})

    closed = hash_join(
        wedges,
        oriented.map_batches(edge_key, batch_format="pyarrow"),
        key=["v", "w"],
        how="semi",
        n_buckets=n_buckets,
    )

    cnt_empty = typed_empty(node=np.int64, triangles=np.int64)

    def credit(batch: pa.Table) -> pa.Table:
        v = np.concatenate(
            [batch["u"].to_numpy(), batch["v"].to_numpy(), batch["w"].to_numpy()]
        )
        df = pd.DataFrame({"node": v}).groupby("node", as_index=False).size()
        df = df.rename(columns={"size": "triangles"})
        df["__cb"] = (df["node"].to_numpy().astype(np.uint64)
                      % np.uint64(n_buckets)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return cnt_empty.copy()
        out = group.groupby("node", as_index=False)["triangles"].sum()
        out["triangles"] = out["triangles"].astype(np.int64)
        return out

    return (
        closed.map_batches(credit, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(count_per_bucket, batch_format="pandas")
    )


def pagerank(edges, *, iters: int = 5, scale: int = PR_SCALE,
             n_buckets: int = 16, small_edges: int = 2_000_000,
             seed_pred=None):
    """Fixed-point integer PageRank over an (src, dst, w) edge Dataset.

    Recurrence (all floor divisions, int64):
      r0(v)  = scale // N
      r_t(v) = base + (85 * sum_in((r_{t-1}(u) // d(u)) * w_uv)) // 100
      base   = (15 * (scale // N)) // 100
    Dangling mass drops; the DuckDB oracle unrolls the same recurrence,
    so results are EXACTLY comparable (integer, order-independent).

    PERSONALIZED variant (``seed_pred`` — a vectorized numpy predicate
    ``int64 node ids → bool``): restart mass teleports only to the seed
    set S (topic-sensitive PageRank, Haveliwala 2002 — "rank relative
    to MY pages", the crawl-prioritization / related-items form):
      N      = |S|  (teleport mass splits over seeds)
      r0(v)  = scale // N  if v ∈ S else 0
      base(v)= (15 * (scale // N)) // 100 if v ∈ S else 0
    and the iteration is otherwise identical, so the oracle reuses the
    same unrolled CTEs with the predicate inlined. The predicate rides
    the task closure — the seed set is never a materialized structure.

    Small-graph fast path (the `_components_bsp` escape hatch, same
    rationale): the distributed loop pays ~3 all-to-all barriers PER
    iteration — measured 713 s at bench sf0.1 where the aggregated
    transition graph is only ~10⁴ edges, pure fixed cost. So the edge
    list (already aggregated and materialized) is counted with one tiny
    task wave, and at ≤ ``small_edges`` rows ONE task runs the identical
    integer recurrence vectorized over numpy index arrays — bit-exact
    (int64 sums are order-independent), object-store in/out, no driver
    materialization. The distributed loop stays the 10⁹-edge scale path
    and is pinned by tests at ``small_edges=0``."""
    import ray
    import ray.data as rd

    from .relational import hash_join

    edges = edges.materialize()
    block_refs = edges.to_arrow_refs()

    @ray.remote
    def _n_rows(block) -> int:
        return len(block)

    @ray.remote
    def _local_pagerank(*blocks) -> pa.Table:
        frames = []
        for b in blocks:
            if isinstance(b, pd.DataFrame):
                df = b
            else:
                df = b.to_pandas()
            if len(df) and "src" in df.columns:
                frames.append(df[["src", "dst", "w"]])
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "pr": pa.array([], pa.int64())}
        )
        if not frames:
            return empty
        e = pd.concat(frames, ignore_index=True)
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        w = e["w"].to_numpy(np.int64)
        nodes_u = np.unique(np.concatenate([src, dst]))
        n = len(nodes_u)
        si = np.searchsorted(nodes_u, src)
        di = np.searchsorted(nodes_u, dst)
        d = np.zeros(n, np.int64)
        np.add.at(d, si, w)
        if seed_pred is None:
            seed_mask = np.ones(n, dtype=bool)
        else:
            seed_mask = np.asarray(seed_pred(nodes_u), dtype=bool)
        ns = int(seed_mask.sum())
        if ns == 0:  # no seeds → no mass anywhere
            return empty
        r0 = scale // ns
        basev = np.where(seed_mask, (15 * r0) // 100, 0).astype(np.int64)
        r = np.where(seed_mask, r0, 0).astype(np.int64)
        for _ in range(iters):
            c = (r[si] // d[si]) * w  # every edge source has d > 0
            s = np.zeros(n, np.int64)
            np.add.at(s, di, c)
            r = basev + (85 * s) // 100
        return pa.table(
            {"node": pa.array(nodes_u, pa.int64()), "pr": pa.array(r, pa.int64())}
        )

    if block_refs and sum(
        ray.get([_n_rows.remote(r) for r in block_refs])
    ) <= small_edges:
        return rd.from_arrow_refs([_local_pagerank.remote(*block_refs)])

    def node_rows(batch: pa.Table) -> pa.Table:
        v = np.concatenate(
            [batch["src"].to_numpy(), batch["dst"].to_numpy()]
        )
        v = np.unique(v)
        b = (v.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"v": pa.array(v, type=pa.int64()), "__nb": pa.array(b)})

    nodes_empty = typed_empty(v=np.int64)

    def uniq_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return nodes_empty.copy()
        return pd.DataFrame({"v": np.unique(group["v"].to_numpy())})

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("__nb")
        .map_groups(uniq_per_bucket, batch_format="pandas")
        .materialize()  # distributed blocks; #nodes rows, reused per round
    )
    n = nodes.count()
    if seed_pred is None:
        n_seed = n
    else:
        # seed census: a shuffle-free scalar fold over the node blocks
        def seed_partial(batch: pa.Table) -> pa.Table:
            m = np.asarray(seed_pred(batch["v"].to_numpy()), dtype=bool)
            return pa.table({"ns": pa.array([int(m.sum())], pa.int64())})

        n_seed = int(
            nodes.map_batches(seed_partial, batch_format="pyarrow").sum("ns")
            or 0
        )
    if n == 0 or n_seed == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "pr": pa.array([], pa.int64())})
        )
    r0 = scale // n_seed
    base = (15 * r0) // 100

    def _base_of(v: np.ndarray) -> np.ndarray:
        if seed_pred is None:
            return np.full(len(v), base, np.int64)
        return np.where(
            np.asarray(seed_pred(v), dtype=bool), base, 0
        ).astype(np.int64)

    deg_empty = typed_empty(src=np.int64, d=np.int64)

    def deg_rows(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"src": batch["src"].to_numpy(), "d": batch["w"].to_numpy()}
        )
        g = df.groupby("src", as_index=False)["d"].sum()
        g["__db"] = (
            g["src"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def deg_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return deg_empty.copy()
        out = group.groupby("src", as_index=False)["d"].sum()
        out["d"] = out["d"].astype(np.int64)
        return out

    outdeg = (
        edges.map_batches(deg_rows, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(deg_per_bucket, batch_format="pandas")
    )
    # static per-edge (src, dst, w, d): pinned once, read every round
    eo = hash_join(edges, outdeg, key="src", n_buckets=n_buckets).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy()
        if seed_pred is None:
            r = np.full(batch.num_rows, r0, np.int64)
        else:
            r = np.where(
                np.asarray(seed_pred(v), dtype=bool), r0, 0
            ).astype(np.int64)
        return pa.table({"src": batch["v"], "r": pa.array(r)})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    contrib_empty = typed_empty(v=np.int64, s=np.int64)

    def contribs(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy()
        d = batch["d"].to_numpy()
        w = batch["w"].to_numpy()
        c = (r // d) * w
        df = pd.DataFrame({"v": batch["dst"].to_numpy(), "s": c})
        g = df.groupby("v", as_index=False)["s"].sum()  # per-batch partial
        g["__cb"] = (
            g["v"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def sum_contribs(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return contrib_empty.copy()
        out = group.groupby("v", as_index=False)["s"].sum()
        out["s"] = out["s"].astype(np.int64)
        return out

    def next_ranks(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        s = np.where(pd.isna(s), 0, s).astype(np.int64)  # no in-edges → 0
        r = _base_of(batch["v"].to_numpy()) + (85 * s) // 100
        return pa.table({"src": batch["v"], "r": pa.array(r, type=pa.int64())})

    for _ in range(iters):
        joined = hash_join(eo, ranks, key="src", n_buckets=n_buckets)
        sums = (
            joined.map_batches(contribs, batch_format="pyarrow")
            .groupby("__cb")
            .map_groups(sum_contribs, batch_format="pandas")
        )
        ranks = (
            hash_join(nodes, sums, key="v", how="left", n_buckets=n_buckets)
            .map_batches(next_ranks, batch_format="pyarrow")
            .materialize()  # one (node, rank) row per node, keeps plans shallow
        )

    def rename_out(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "pr": batch["r"]})

    return ranks.map_batches(rename_out, batch_format="pyarrow")


def kcore(edges, *, k: int = 2, max_rounds: int = 6, n_buckets: int = 16,
          small_edges: int = 2_000_000):
    """k-core decomposition by iterated peeling over an (src, dst, ...)
    edge Dataset → ``(node, deg)`` for the nodes that survive, where
    ``deg`` is the node's degree WITHIN the surviving set.

    Semantics (mirrored exactly by the unrolled-CTE DuckDB oracle):
    - the graph is the undirected SIMPLE graph of the input (self-loops
      dropped, (min, max)-canonicalized, distinct — edge weights carry
      no coreness signal);
    - round t removes every node whose degree within round t−1's
      survivor set is < ``k``; exactly ``max_rounds`` peels run (with an
      early exit at the fixpoint, where further rounds are the
      identity, so early exit never changes the answer);
    - the output recomputes degrees within the final survivor set, so a
      node whose surviving degree is 0 is absent (GROUP BY semantics,
      same as the oracle's final aggregate).

    Scale shape: canonical-distinct is one bounded pair-hash shuffle
    (the :func:`triangle_counts` step); each peel round is two SEMI
    :func:`relational.hash_join` passes (edges ⋉ alive on each endpoint
    — only the key column of the small side ships) plus one bounded
    degree shuffle, all keyed ``node % B``; the alive set between rounds
    is one (node,) row per survivor, object-store-pinned, never on the
    driver. Rounds are all-to-all barriers, so the same small-graph
    escape hatch as :func:`pagerank` applies: at ≤ ``small_edges`` edge
    rows ONE task peels the whole graph vectorized (bit-identical; the
    distributed loop is pinned by tests at ``small_edges=0``).
    """
    import ray
    import ray.data as rd

    from .relational import hash_join

    edges = edges.materialize()
    block_refs = edges.to_arrow_refs()

    @ray.remote
    def _n_rows(block) -> int:
        return len(block)

    out_empty = pa.table(
        {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )

    @ray.remote
    def _local_kcore(*blocks) -> pa.Table:
        frames = []
        for blk in blocks:
            df = blk if isinstance(blk, pd.DataFrame) else blk.to_pandas()
            if len(df) and "src" in df.columns:
                frames.append(df[["src", "dst"]])
        if not frames:
            return out_empty
        e = pd.concat(frames, ignore_index=True)
        s = e["src"].to_numpy(np.int64)
        d = e["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        und = (
            pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})
            .drop_duplicates()
        )
        if und.empty:
            return out_empty
        nodes_u = np.unique(
            np.concatenate([und["a"].to_numpy(), und["b"].to_numpy()])
        )
        ai = np.searchsorted(nodes_u, und["a"].to_numpy())
        bi = np.searchsorted(nodes_u, und["b"].to_numpy())
        alive = np.ones(len(nodes_u), dtype=bool)

        def _deg(mask: np.ndarray) -> np.ndarray:
            m = mask[ai] & mask[bi]
            deg = np.zeros(len(nodes_u), np.int64)
            np.add.at(deg, ai[m], 1)
            np.add.at(deg, bi[m], 1)
            return deg

        for _ in range(max_rounds):
            nxt = alive & (_deg(alive) >= k)
            if nxt.sum() == alive.sum():
                break
            alive = nxt
        deg = _deg(alive)
        outm = deg > 0
        return pa.table(
            {
                "node": pa.array(nodes_u[outm], pa.int64()),
                "deg": pa.array(deg[outm], pa.int64()),
            }
        )

    if block_refs and sum(
        ray.get([_n_rows.remote(r) for r in block_refs])
    ) <= small_edges:
        return rd.from_arrow_refs([_local_kcore.remote(*block_refs)])

    # --- distributed path: canonical distinct edges, then peel rounds ---
    pair_empty = typed_empty(a=np.int64, b=np.int64)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a, b = np.minimum(s, d), np.maximum(s, d)
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
            np.uint64
        )
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "__pb": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def distinct_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pair_empty.copy()
        return group[["a", "b"]].drop_duplicates()

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("__pb")
        .map_groups(distinct_per_bucket, batch_format="pandas")
    )

    # both orientations (v, w): the per-round degree source
    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b]), pa.int64()),
                "w": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    bi = und.map_batches(both_dirs, batch_format="pyarrow").materialize()

    nodes_empty = typed_empty(v=np.int64)

    def node_rows(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["v"].to_numpy())
        nb = (u.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"v": pa.array(u, pa.int64()), "__nb": pa.array(nb)})

    def uniq_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return nodes_empty.copy()
        return pd.DataFrame({"v": np.unique(group["v"].to_numpy())})

    alive = (
        bi.map_batches(node_rows, batch_format="pyarrow")
        .groupby("__nb")
        .map_groups(uniq_per_bucket, batch_format="pandas")
        .materialize()
    )
    n_alive = alive.count()

    deg_empty = typed_empty(v=np.int64, deg=np.int64)

    def deg_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"v": batch["v"].to_numpy()})
        g = df.groupby("v", as_index=False).size().rename(columns={"size": "deg"})
        g["__db"] = (
            g["v"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def deg_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return deg_empty.copy()
        out = group.groupby("v", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype(np.int64)
        return out

    def rename_w(batch: pa.Table) -> pa.Table:
        return pa.table({"w": batch["v"]})

    def _alive_degrees(alive_ds):
        """degrees within the alive set: edges ⋉ alive on BOTH endpoints,
        then a bounded per-node count shuffle → (v, deg)."""
        e1 = hash_join(bi, alive_ds, key="v", how="semi", n_buckets=n_buckets)
        e2 = hash_join(
            e1,
            alive_ds.map_batches(rename_w, batch_format="pyarrow"),
            key="w",
            how="semi",
            n_buckets=n_buckets,
        )
        return (
            e2.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("__db")
            .map_groups(deg_per_bucket, batch_format="pandas")
        )

    def survivors(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["deg"], pa.scalar(k, pa.int64()))
        return pa.table({"v": batch.filter(m)["v"]})

    for _ in range(max_rounds):
        nxt = (
            _alive_degrees(alive)
            .map_batches(survivors, batch_format="pyarrow")
            .materialize()
        )
        n_nxt = nxt.count()
        if n_nxt == n_alive:
            break
        alive, n_alive = nxt, n_nxt

    def rename_out(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["v"], "deg": batch["deg"]})

    return _alive_degrees(alive).map_batches(rename_out, batch_format="pyarrow")


def bfs_hops(edges, *, max_hops: int = 4, n_buckets: int = 16,
             small_edges: int = 2_000_000):
    """Hub-distance BFS over an (src, dst, w) edge Dataset → ``(node,
    hops)`` for every node within ``max_hops`` undirected hops of the
    graph's hub node. The crawl-frontier / reachability primitive: how
    far is each item from the catalog's dominant item (the analogue of
    hop-distance-from-seed-set ranking in crawl schedulers).

    Semantics (mirrored exactly by the recursive-CTE DuckDB oracle):
    - the graph is symmetrized: und(u, v) carries weight
      ``w(u→v) + w(v→u)`` (self-loops were already dropped upstream);
    - the seed (hops = 0) is the node with the LARGEST weighted
      undirected degree ``Σ und-weights incident``, ties broken by MIN
      node id — a pure function of the edge multiset;
    - ``hops`` is the unweighted shortest-path hop count from the seed;
      nodes farther than ``max_hops`` (or unreachable) emit no row.

    Scale shape: the symmetrized edge table is materialized ONCE as
    object-store blocks; the hub is a bucketed argmax (per-batch
    partials → per-bucket (wdeg, -node) max → a ≤ ``n_buckets``-row
    driver fold — never a node census on the driver). Each BFS round is
    ONE :func:`relational.hash_join` of the frontier against the static
    edge blocks (only frontier keys + neighbor ids ship) + a bounded
    per-bucket distinct + one ANTI join against the visited set, i.e.
    the textbook BSP frontier expansion. The visited set lives in the
    object store as (node, hops) rows, re-pinned per round to keep the
    lazy plan shallow; an empty frontier exits early (identity after,
    so the early exit never changes the answer). Rounds are all-to-all
    barriers, so the same small-graph escape hatch as :func:`pagerank`
    applies: at ≤ ``small_edges`` edge rows ONE task runs the identical
    BFS vectorized over numpy index arrays (bit-exact — hop counts are
    integers and min-plus rounds are order-independent); the
    distributed loop is pinned by tests at ``small_edges=0``.
    """
    import ray
    import ray.data as rd

    from .relational import hash_join

    edges = edges.materialize()
    block_refs = edges.to_arrow_refs()

    @ray.remote
    def _n_rows(block) -> int:
        return len(block)

    out_empty = pa.table(
        {"node": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())}
    )

    @ray.remote
    def _local_bfs(*blocks) -> pa.Table:
        frames = []
        for blk in blocks:
            df = blk if isinstance(blk, pd.DataFrame) else blk.to_pandas()
            if len(df) and "src" in df.columns:
                frames.append(df[["src", "dst", "w"]])
        if not frames:
            return out_empty
        e = pd.concat(frames, ignore_index=True)
        s = e["src"].to_numpy(np.int64)
        d = e["dst"].to_numpy(np.int64)
        w = e["w"].to_numpy(np.int64)
        nodes_u = np.unique(np.concatenate([s, d]))
        n = len(nodes_u)
        si = np.searchsorted(nodes_u, s)
        di = np.searchsorted(nodes_u, d)
        # weighted undirected degree (each directed edge counts at both ends)
        wdeg = np.zeros(n, np.int64)
        np.add.at(wdeg, si, w)
        np.add.at(wdeg, di, w)
        # hub: max wdeg, tie-break min node id (nodes_u is sorted, so the
        # FIRST argmax position is the smallest id among the ties)
        seed = int(np.argmax(wdeg))
        hops = np.full(n, -1, np.int64)
        hops[seed] = 0
        frontier = np.zeros(n, dtype=bool)
        frontier[seed] = True
        for h in range(1, max_hops + 1):
            nxt = np.zeros(n, dtype=bool)
            nxt[di[frontier[si]]] = True
            nxt[si[frontier[di]]] = True
            nxt &= hops < 0
            if not nxt.any():
                break
            hops[nxt] = h
            frontier = nxt
        m = hops >= 0
        return pa.table(
            {
                "node": pa.array(nodes_u[m], pa.int64()),
                "hops": pa.array(hops[m], pa.int64()),
            }
        )

    if block_refs and sum(
        ray.get([_n_rows.remote(r) for r in block_refs])
    ) <= small_edges:
        return rd.from_arrow_refs([_local_bfs.remote(*block_refs)])

    # --- distributed path -------------------------------------------------
    sym_empty = typed_empty(src=np.int64, dst=np.int64, w=np.int64)

    def both_dirs(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        w = batch["w"].to_numpy()
        src = np.concatenate([s, d])
        dst = np.concatenate([d, s])
        ww = np.concatenate([w, w])
        b = (src.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(ww, pa.int64()),
                "__sb": pa.array(b),
            }
        )

    def sum_sym(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return sym_empty.copy()
        out = group.groupby(["src", "dst"], as_index=False)["w"].sum()
        out["w"] = out["w"].astype(np.int64)
        return out

    # symmetrized weighted edges, pinned once, read every round
    sym = (
        edges.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("__sb")
        .map_groups(sum_sym, batch_format="pandas")
        .materialize()
    )

    # --- hub seed: bucketed argmax of weighted degree ----------------------
    cand_empty = typed_empty(v=np.int64, wdeg=np.int64)

    def deg_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"v": batch["src"].to_numpy(), "wdeg": batch["w"].to_numpy()}
        )
        g = df.groupby("v", as_index=False)["wdeg"].sum()
        g["__db"] = (
            g["v"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def deg_top_per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return cand_empty.copy()
        g = group.groupby("v", as_index=False)["wdeg"].sum()
        g = g.sort_values(["wdeg", "v"], ascending=[False, True], kind="mergesort")
        out = g.head(1).copy()
        out["wdeg"] = out["wdeg"].astype(np.int64)
        return out[["v", "wdeg"]]

    cands = (
        sym.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(deg_top_per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets rows — the one tiny driver fold
    )
    if cands.empty:
        return rd.from_arrow(out_empty)
    cands = cands.sort_values(
        ["wdeg", "v"], ascending=[False, True], kind="mergesort"
    )
    seed = int(cands["v"].iloc[0])

    visited = rd.from_arrow(
        pa.table(
            {"v": pa.array([seed], pa.int64()),
             "hops": pa.array([0], pa.int64())}
        )
    ).materialize()
    frontier = visited

    nbr_empty = typed_empty(v=np.int64)

    def nbrs(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["dst"].to_numpy())
        b = (u.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"v": pa.array(u, pa.int64()), "__fb": pa.array(b)})

    def uniq_nbrs(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return nbr_empty.copy()
        return pd.DataFrame({"v": np.unique(group["v"].to_numpy())})

    def key_only(batch: pa.Table) -> pa.Table:
        return pa.table({"v": batch["v"]})

    for h in range(1, max_hops + 1):
        # frontier ⋈ sym on src: only frontier keys ship into the edge buckets
        reached = hash_join(
            sym,
            frontier.map_batches(
                lambda b: pa.table({"src": b["v"]}), batch_format="pyarrow"
            ),
            key="src",
            how="semi",
            n_buckets=n_buckets,
        )
        cand = (
            reached.map_batches(nbrs, batch_format="pyarrow")
            .groupby("__fb")
            .map_groups(uniq_nbrs, batch_format="pandas")
        )
        new = hash_join(
            cand,
            visited.map_batches(key_only, batch_format="pyarrow"),
            key="v",
            how="anti",
            n_buckets=n_buckets,
        ).map_batches(
            lambda b, _h=h: pa.table(
                {
                    "v": b["v"],
                    "hops": pa.array(np.full(b.num_rows, _h, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new

    def rename_out(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["v"], "hops": batch["hops"]})

    return visited.map_batches(rename_out, batch_format="pyarrow")
