"""Integer-exact PageRank: numpy-reference parity, bucket invariance,
edge-derivation contract (ordering, self-loops, weights)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sanskrit_ocr_ray.stages.graph import PR_SCALE, item_transition_edges, pagerank


def _ref_pagerank(edges, iters=5, scale=PR_SCALE):
    """Driver-side reference of the exact fixed-point recurrence."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = (15 * (scale // n)) // 100
    deg = {}
    for s, _, w in edges:
        deg[s] = deg.get(s, 0) + w
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for s, d, w in edges:
            acc[d] += (r[s] // deg[s]) * w
        r = {v: base + (85 * acc[v]) // 100 for v in nodes}
    return r


@pytest.mark.parametrize("n_buckets", [1, 3, 16])
def test_pagerank_matches_reference(ray_session, n_buckets):
    import ray.data as rd

    edges = [(1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 1), (4, 1, 5), (5, 9, 1)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    )
    # both the small-graph single-task path (default threshold) and the
    # distributed iteration loop (small_edges=0) must be bit-identical
    for thresh in (2_000_000, 0):
        got = pagerank(
            ds, iters=5, n_buckets=n_buckets, small_edges=thresh
        ).to_pandas()
        ref = _ref_pagerank(edges)
        assert dict(zip(got["node"], got["pr"])) == ref, thresh


def test_pagerank_dangling_mass_drops(ray_session):
    """A pure sink keeps only the base term after its inflow decays —
    and total mass shrinks (dropped, not redistributed)."""
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([1], pa.int64()),
                "dst": pa.array([2], pa.int64()),
                "w": pa.array([1], pa.int64()),
            }
        )
    )
    got = pagerank(ds, iters=3).to_pandas()
    ref = _ref_pagerank([(1, 2, 1)], iters=3)
    assert dict(zip(got["node"], got["pr"])) == ref
    assert got["pr"].sum() < PR_SCALE  # node 2's outflow vanished


def test_connected_components(ray_session):
    """Min-id reps over undirected reachability; directed input edges."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import connected_components

    # components: {1,2,3,9} (chain incl. direction-blind 9→3), {5,6}
    edges = [(1, 2), (2, 3), (9, 3), (5, 6)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([1] * len(edges), pa.int64()),
            }
        )
    )
    got = connected_components(ds).to_pandas()
    assert dict(zip(got["node"], got["rep"])) == {
        1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5,
    }


def test_item_transition_edges(ray_session):
    """Ordering by (ts, event_id), per-user lag, self-loop drop, weights."""
    import ray.data as rd

    t = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(
                    ["2024-01-01 00:00:02", "2024-01-01 00:00:01",
                     "2024-01-01 00:00:03", "2024-01-01 00:00:03",
                     "2024-01-01 00:00:01", "2024-01-01 00:00:05"]
                ),
                pa.timestamp("us"),
            ),
            "event_id": pa.array([1, 0, 2, 3, 10, 11], pa.int64()),
            "props": pa.array(
                ['{"k": 5}', '{"k": 3}', '{"k": 5}', '{"k": 9}',
                 '{"k": 4}', '{"k": 4}'],
            ),
        }
    )
    # user 7 ordered: k=3 (t1), 5 (t2), 5 (t3,e2), 9 (t3,e3)
    #   → 3→5, 5→5 (dropped), 5→9 ; user 8: 4→4 dropped
    got = (
        item_transition_edges(rd.from_arrow(t), n_buckets=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {"src": [3, 5], "dst": [5, 9], "w": [1, 1]}, dtype=np.int64
    )
    pd.testing.assert_frame_equal(got, expect)


def test_edge_weights_accumulate_across_batches(ray_session):
    """The same transition from many users collapses into one weighted
    edge even when users land in different lag buckets."""
    import ray.data as rd

    n_users = 40
    rows = {"user_id": [], "ts": [], "event_id": [], "props": []}
    for u in range(n_users):
        for j, k in enumerate((1, 2)):
            rows["user_id"].append(u)
            rows["ts"].append(pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=j))
            rows["event_id"].append(u * 2 + j)
            rows["props"].append('{"k": %d}' % k)
    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "props": pa.array(rows["props"]),
        }
    )
    got = item_transition_edges(rd.from_arrow(t), n_buckets=8).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].tolist() == [1, 2, n_users]


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def _ref_triangles(pairs):
    """Brute-force per-node triangle counts over undirected pairs."""
    from itertools import combinations

    edges = set()
    nodes = set()
    for a, b in pairs:
        if a != b:
            edges.add((min(a, b), max(a, b)))
            nodes.update((a, b))
    out = {}
    for x, y, z in combinations(sorted(nodes), 3):
        if ((x, y) in edges and (x, z) in edges and (y, z) in edges):
            for v in (x, y, z):
                out[v] = out.get(v, 0) + 1
    return out


def _edges_ds(rd, pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
                "w": pa.array([1] * len(pairs), pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("n_buckets", [1, 4, 16])
def test_triangle_counts_random_graph(ray_session, n_buckets):
    """Random multigraph (duplicate + reversed + self edges) vs brute
    force, across bucket counts (partitioning invariance)."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(7)
    pairs = [tuple(rng.integers(0, 25, 2)) for _ in range(300)]
    want = _ref_triangles(pairs)
    for thresh in (2_000_000, 0):  # single-task fast path AND distributed
        got = triangle_counts(
            _edges_ds(rd, pairs), n_buckets=n_buckets, small_edges=thresh
        ).to_pandas()
        assert dict(zip(got["node"], got["triangles"])) == want, thresh
        assert got["triangles"].dtype == np.int64


def test_triangle_counts_hub_graph(ray_session):
    """A hub star plus a rim cycle: the degree orientation must point
    every rim node AT the hub (hub out-degree stays 0 or tiny), and the
    counts still come out exact."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import triangle_counts

    hub = 0
    rim = list(range(1, 31))
    pairs = [(hub, v) for v in rim]
    pairs += [(rim[i], rim[(i + 1) % len(rim)]) for i in range(len(rim))]
    got = triangle_counts(_edges_ds(rd, pairs), n_buckets=8).to_pandas()
    want = _ref_triangles(pairs)
    assert dict(zip(got["node"], got["triangles"])) == want
    # hub participates in every rim-adjacent triangle
    assert want[hub] == 30


def test_triangle_counts_triangle_free(ray_session):
    """A bipartite (triangle-free) graph returns zero rows."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import triangle_counts

    pairs = [(a, 100 + b) for a in range(5) for b in range(5)]
    got = triangle_counts(_edges_ds(rd, pairs), n_buckets=4).to_pandas()
    assert len(got) == 0


def _ref_kcore(pairs, k, max_rounds=6):
    """Driver-side reference peel: set-based, exact semantics."""
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    alive = {v for e in und for v in e}
    for _ in range(max_rounds):
        deg = {}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        nxt = {v for v in alive if deg.get(v, 0) >= k}
        if nxt == alive:
            break
        alive = nxt
    deg = {}
    for a, b in und:
        if a in alive and b in alive:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
    return {v: c for v, c in deg.items() if c > 0}


@pytest.mark.parametrize("n_buckets", [1, 3, 16])
def test_kcore_multi_round_peel(ray_session, n_buckets):
    """A 4-cycle core with a 3-chain whisker: peeling the chain takes
    THREE rounds (tip first, then each inner link), so this pins the
    iterated-fixpoint semantics, not just one degree filter."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import kcore

    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 1),   # the 2-core
        (4, 5), (5, 6), (6, 7),           # whisker: 7 peels, then 6, then 5
        (8, 9),                           # isolated edge: dies round 1
        (2, 2),                           # self-loop: dropped
        (3, 2),                           # reverse duplicate of (2, 3)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
                "w": pa.array([1] * len(pairs), pa.int64()),
            }
        )
    )
    ref = _ref_kcore(pairs, k=2)
    assert ref == {1: 2, 2: 2, 3: 2, 4: 2}  # the whisker is fully peeled
    for thresh in (2_000_000, 0):
        got = kcore(ds, k=2, n_buckets=n_buckets, small_edges=thresh).to_pandas()
        assert dict(zip(got["node"], got["deg"])) == ref, thresh


def test_kcore_random_graph_both_paths(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import kcore

    rng = np.random.RandomState(7)
    pairs = list(zip(rng.randint(0, 40, 300), rng.randint(0, 40, 300)))
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([int(a) for a, _ in pairs], pa.int64()),
                "dst": pa.array([int(b) for _, b in pairs], pa.int64()),
                "w": pa.array([1] * len(pairs), pa.int64()),
            }
        )
    )
    for k in (2, 3, 5):
        ref = _ref_kcore(pairs, k=k, max_rounds=12)
        for thresh in (2_000_000, 0):
            got = kcore(
                ds, k=k, max_rounds=12, n_buckets=4, small_edges=thresh
            ).to_pandas()
            assert dict(zip(got["node"], got["deg"])) == ref, (k, thresh)


def _ref_bfs(edges, max_hops=4):
    """Driver-side reference: hub seed (max weighted undirected degree,
    min id ties) + plain BFS."""
    wdeg: dict = {}
    adj: dict = {}
    for s, d, w in edges:
        wdeg[s] = wdeg.get(s, 0) + w
        wdeg[d] = wdeg.get(d, 0) + w
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    seed = min(wdeg, key=lambda v: (-wdeg[v], v))
    hops = {seed: 0}
    frontier = [seed]
    for h in range(1, max_hops + 1):
        nxt = []
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in hops:
                    hops[u] = h
                    nxt.append(u)
        if not nxt:
            break
        frontier = nxt
    return hops


@pytest.mark.parametrize("n_buckets", [1, 3, 16])
def test_bfs_hops_random_graph_both_paths(ray_session, n_buckets):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import bfs_hops

    rng = np.random.default_rng(7)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    keep = src != dst
    df = (
        pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        .groupby(["src", "dst"], as_index=False)
        .size()
        .rename(columns={"size": "w"})
    )
    edges = list(df.itertuples(index=False, name=None))
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(df["src"].to_numpy(), pa.int64()),
                "dst": pa.array(df["dst"].to_numpy(), pa.int64()),
                "w": pa.array(df["w"].to_numpy(), pa.int64()),
            }
        )
    )
    ref = _ref_bfs(edges, max_hops=3)
    for thresh in (2_000_000, 0):
        got = bfs_hops(
            ds, max_hops=3, n_buckets=n_buckets, small_edges=thresh
        ).to_pandas()
        assert dict(zip(got["node"], got["hops"])) == ref, (thresh, n_buckets)


def test_bfs_hops_seed_tie_break_and_unreachable(ray_session):
    """Two hubs with equal weighted degree → min id wins; a disconnected
    component emits no rows; hop cap truncates a long chain."""
    import ray.data as rd

    from sanskrit_ocr_ray.stages.graph import bfs_hops

    # 10-11 and 20-21 both have wdeg 6 per endpoint; chain off node 11;
    # 90-91 is a separate component
    rows = [(10, 11, 3), (11, 10, 3), (20, 21, 3), (21, 20, 3),
            (11, 30, 1), (30, 31, 1), (31, 32, 1), (32, 33, 1),
            (90, 91, 2)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.int64()),
                "dst": pa.array([r[1] for r in rows], pa.int64()),
                "w": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    for thresh in (2_000_000, 0):
        got = bfs_hops(ds, max_hops=3, small_edges=thresh).to_pandas()
        m = dict(zip(got["node"], got["hops"]))
        # weighted degrees: wdeg(11) = 6 (sym 10-11) + 1 (chain) = 7,
        # wdeg(10) = 6, wdeg(20) = wdeg(21) = 6 → node 11 is the hub
        assert m[11] == 0  # highest weighted degree
        assert m[10] == 1 and m[30] == 1
        assert m[31] == 2 and m[32] == 3
        assert 33 not in m  # beyond the hop cap
        assert 90 not in m and 91 not in m  # disconnected
        assert 20 not in m and 21 not in m  # disconnected from hub


def _ref_ppr(edges, seeds, iters=5, scale=PR_SCALE):
    """Driver-side reference of the personalized recurrence: teleport
    mass splits over the seed set only."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    S = [v for v in nodes if seeds(v)]
    r = {v: (scale // len(S) if v in S else 0) for v in nodes}
    base = {v: ((15 * (scale // len(S))) // 100 if v in S else 0) for v in nodes}
    deg = {}
    for s, _, w in edges:
        deg[s] = deg.get(s, 0) + w
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for s, d, w in edges:
            acc[d] += (r[s] // deg[s]) * w
        r = {v: base[v] + (85 * acc[v]) // 100 for v in nodes}
    return r


@pytest.mark.parametrize("n_buckets", [1, 3, 16])
def test_personalized_pagerank_both_paths(ray_session, n_buckets):
    import ray.data as rd

    edges = [(1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 1), (4, 1, 5),
             (5, 9, 1), (7, 2, 2), (14, 3, 1)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    )
    pred = lambda v: v % 7 == 0  # seeds: {7, 14}  # noqa: E731
    ref = _ref_ppr(edges, lambda v: v % 7 == 0)
    for thresh in (2_000_000, 0):
        got = pagerank(
            ds, iters=5, n_buckets=n_buckets, small_edges=thresh,
            seed_pred=pred,
        ).to_pandas()
        assert dict(zip(got["node"], got["pr"])) == ref, thresh
    # seeds hold the restart mass; a node unreachable from any seed
    # and outside the seed set ends at exactly 0 (node 9 ← 5 only)
    assert ref[9] == 0 and ref[7] > 0
    # no seeds at all → empty result on both paths
    for thresh in (2_000_000, 0):
        got = pagerank(
            ds, iters=2, small_edges=thresh, seed_pred=lambda v: v < 0
        ).to_pandas()
        assert len(got) == 0
