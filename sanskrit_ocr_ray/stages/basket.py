"""Market-basket co-occurrence: frequent item pairs within a basket key.

The classic affinity/recommendation primitive (frequent-itemset mining at
the pair level, the support-counting core of Apriori): for every pair of
distinct items that appear together under one basket key (an order, a
session, a document), count the number of baskets containing both and
keep pairs with ``support ≥ minsup``.

Scale shape — two bounded shuffles, no driver state:

1. ``hash(basket) % B`` bucketed shuffle co-locates each basket whole;
   inside a bucket one vectorized pandas/numpy pass dedupes
   (basket, item), drops baskets with more than ``max_basket`` items
   (pathological carts/bots — a DETERMINISTIC rule the oracle mirrors,
   bounding the C(k,2) blow-up to ``max_basket·Σk`` pair rows), expands
   every basket's ordered pairs with a repeat/arange kernel (no Python
   per-basket loop), and pre-aggregates pair counts within the bucket.
2. a second bucketed shuffle on ``hash(item_a, item_b) % B`` folds the
   per-bucket partials into exact global support and applies ``minsup``
   inside the bucket — only surviving pairs leave the aggregate.

Items of one basket always share a bucket, so pair expansion is exact;
one (item_a, item_b) pair always folds in one second-stage bucket, so
support is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import typed_empty
from .dedup import DEFAULT_BUCKETS, bucketed_aggregate

__all__ = ["basket_pairs", "association_rules"]


def _expand_pairs(d: pd.DataFrame, basket_col: str, item_col: str) -> pd.DataFrame:
    """All ordered within-basket item pairs of a (deduped, sorted) frame —
    vectorized: row i pairs with every later row of its basket."""
    bk = d[basket_col].to_numpy()
    items = d[item_col].to_numpy()
    n = len(bk)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = bk[1:] != bk[:-1]
    grp_start = np.flatnonzero(new)
    grp_end = np.append(grp_start[1:], n)  # exclusive end, per group
    ends_per_row = np.repeat(grp_end, grp_end - grp_start)
    idx = np.arange(n)
    reps = ends_per_row - idx - 1  # later rows in the same basket
    left = np.repeat(idx, reps)
    starts = np.repeat(np.cumsum(reps) - reps, reps)
    right = np.arange(int(reps.sum())) - starts + np.repeat(idx + 1, reps)
    # items sorted ascending within the basket ⇒ item_a < item_b
    return pd.DataFrame({"item_a": items[left], "item_b": items[right]})


def basket_pairs(
    ds,
    *,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    minsup: int = 2,
    max_basket: int = 64,
    n_buckets: int = DEFAULT_BUCKETS,
):
    """Dataset with (basket_col, item_col) → Dataset (item_a, item_b,
    support) for distinct-item pairs co-occurring in ``≥ minsup``
    baskets of at most ``max_basket`` distinct items."""

    pair_empty = typed_empty(item_a=np.int64, item_b=np.int64, cnt=np.int64)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col]
        )
        if d.empty:
            return pair_empty.copy()
        sizes = d.groupby(basket_col, sort=False)[item_col].transform("size")
        d = d[(sizes.to_numpy() >= 2) & (sizes.to_numpy() <= max_basket)]
        if d.empty:
            return pair_empty.copy()
        pairs = _expand_pairs(d, basket_col, item_col)
        out = pairs.groupby(["item_a", "item_b"], as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype(np.int64)

    partial = bucketed_aggregate(
        ds,
        [basket_col],
        pairs_in_bucket,
        n_buckets=n_buckets,
        empty=pair_empty,
        coalesce_first=False,
    )

    sup_empty = typed_empty(item_a=np.int64, item_b=np.int64, support=np.int64)

    def fold_support(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["item_a", "item_b"], as_index=False)["cnt"].sum()
        g = g[g["cnt"] >= minsup].rename(columns={"cnt": "support"})
        return g.astype(np.int64) if len(g) else sup_empty.copy()

    return bucketed_aggregate(
        partial,
        ["item_a", "item_b"],
        fold_support,
        n_buckets=n_buckets,
        empty=sup_empty,
        coalesce_first=False,
    )


def association_rules(
    ds,
    *,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    minsup: int = 2,
    max_basket: int = 64,
    n_buckets: int = 64,
):
    """Association rules (the Apriori rule step): for every pair of
    items co-occurring in ``≥ minsup`` baskets and BOTH directions a→b,
    emit ``(ante, cons, support, conf_pm, lift_pm)`` with integer
    per-mille confidence ``1000·sup // n(ante)`` and lift
    ``1000·N·sup // (n(ante)·n(cons))``.

    Contract (mirrored in the oracle): every statistic — pair support,
    per-item basket counts n(i), and the basket total N — is computed
    over the SAME basket population: baskets with 2..max_basket
    distinct items (singleton baskets can pair with nothing; oversize
    baskets are the deterministic bot rule). Integer bound: needs
    ``1000·N·sup < 2^63`` (N·sup < 9.2e15 — at larger scale, drop the
    ×1000 or compute lift in per-cent).

    Scale shape — FOUR bounded shuffles total: the basket-bucketed pass
    emits pair partials AND item-count partials AND the N partial as
    tagged rows of ONE stream (counts are additive across basket
    buckets; the reserved keys ``kb = −1`` / ``ka = −1`` tag them), one
    (ka, kb)-bucketed fold finalizes all three kinds, then the two
    count attachments are bucketed ``hash_join``s — never a broadcast
    of the item dictionary; only the single N row reaches the driver.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import hash_join

    part_empty = typed_empty(ka=np.int64, kb=np.int64, cnt=np.int64)

    def partials_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col]
        )
        if d.empty:
            return part_empty.copy()
        sizes = d.groupby(basket_col, sort=False)[item_col].transform("size")
        d = d[(sizes.to_numpy() >= 2) & (sizes.to_numpy() <= max_basket)]
        if d.empty:
            return part_empty.copy()
        pairs = _expand_pairs(d, basket_col, item_col)
        p = pairs.groupby(["item_a", "item_b"], as_index=False).size()
        ic = d.groupby(item_col, as_index=False).size()
        out = pd.DataFrame(
            {
                "ka": np.concatenate(
                    [p["item_a"].to_numpy(), ic[item_col].to_numpy(), [-1]]
                ),
                "kb": np.concatenate(
                    [p["item_b"].to_numpy(), np.full(len(ic), -1), [-1]]
                ),
                "cnt": np.concatenate(
                    [
                        p["size"].to_numpy(),
                        ic["size"].to_numpy(),
                        [d[basket_col].nunique()],
                    ]
                ),
            }
        )
        return out.astype(np.int64)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["ka", "kb"], as_index=False)["cnt"].sum()
        keep = (g["kb"].to_numpy() < 0) | (g["cnt"].to_numpy() >= minsup)
        g = g[keep]
        return g.astype(np.int64) if len(g) else part_empty.copy()

    folded = bucketed_aggregate(
        bucketed_aggregate(
            ds, [basket_col], partials_in_bucket,
            n_buckets=n_buckets, empty=part_empty, coalesce_first=False,
        ),
        ["ka", "kb"],
        fold,
        n_buckets=n_buckets,
        empty=part_empty,
        coalesce_first=False,
    ).materialize()

    def take_pairs(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["kb"], pa.scalar(0)),
            pc.greater_equal(batch["ka"], pa.scalar(0)),
        )
        t = batch.filter(m)
        return pa.table(
            {"item_a": t["ka"], "item_b": t["kb"], "support": t["cnt"]}
        )

    def take_counts(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["ka"], pa.scalar(0)),
            pc.equal(batch["kb"], pa.scalar(-1)),
        )
        t = batch.filter(m)
        return pa.table({"item": t["ka"], "c": t["cnt"]})

    def take_n(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["ka"], pa.scalar(-1))
        t = batch.filter(m)
        return pa.table({"c": t["cnt"]})

    # N: exactly one folded row reaches the driver
    n_total = int(
        folded.map_batches(take_n, batch_format="pyarrow")
        .to_pandas()["c"].iloc[0]
    )
    item_counts = folded.map_batches(take_counts, batch_format="pyarrow")
    pairs = folded.map_batches(take_pairs, batch_format="pyarrow")

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["item_a"].to_numpy()
        b = batch["item_b"].to_numpy()
        s = batch["support"].to_numpy()
        return pa.table(
            {
                "ante": pa.array(np.concatenate([a, b]), pa.int64()),
                "cons": pa.array(np.concatenate([b, a]), pa.int64()),
                "support": pa.array(np.concatenate([s, s]), pa.int64()),
            }
        )

    rules = pairs.map_batches(both_dirs, batch_format="pyarrow")

    def as_ante(batch: pa.Table) -> pa.Table:
        return pa.table({"ante": batch["item"], "ca": batch["c"]})

    def as_cons(batch: pa.Table) -> pa.Table:
        return pa.table({"cons": batch["item"], "cb": batch["c"]})

    j1 = hash_join(
        rules, item_counts.map_batches(as_ante, batch_format="pyarrow"),
        key="ante", n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1, item_counts.map_batches(as_cons, batch_format="pyarrow"),
        key="cons", n_buckets=n_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["support"].to_numpy().astype(np.int64)
        ca = batch["ca"].to_numpy().astype(np.int64)
        cb = batch["cb"].to_numpy().astype(np.int64)
        conf = (1000 * s) // ca
        lift = (1000 * n_total * s) // (ca * cb)
        return pa.table(
            {
                "ante": batch["ante"],
                "cons": batch["cons"],
                "support": batch["support"],
                "conf_pm": pa.array(conf),
                "lift_pm": pa.array(lift),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")
