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

__all__ = ["basket_pairs"]


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
