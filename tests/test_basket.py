"""Market-basket pair mining: randomized parity vs a naive model."""

import itertools

import numpy as np
import pandas as pd
import pytest


def _naive(df, minsup, max_basket):
    truth = {}
    for _, g in df.drop_duplicates(["bk", "it"]).groupby("bk"):
        items = sorted(g["it"])
        if not (2 <= len(items) <= max_basket):
            continue
        for a, b in itertools.combinations(items, 2):
            truth[(a, b)] = truth.get((a, b), 0) + 1
    return sorted((a, b, s) for (a, b), s in truth.items() if s >= minsup)


@pytest.mark.parametrize("seed,parts", [(1, 1), (2, 5)])
def test_basket_pairs_matches_naive_model(ray_session, seed, parts):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.basket import basket_pairs

    rng = np.random.default_rng(seed)
    n_rows = 600
    df = pd.DataFrame(
        {
            "bk": rng.integers(0, 80, n_rows),  # ~7.5 rows/basket
            "it": rng.integers(0, 25, n_rows),  # small universe → support
        }
    )
    out = basket_pairs(
        rd.from_pandas(df).repartition(parts),
        basket_col="bk",
        item_col="it",
        minsup=2,
        max_basket=64,
        n_buckets=16,
    ).to_pandas()
    got = sorted(zip(out["item_a"], out["item_b"], out["support"]))
    assert got == _naive(df, 2, 64)


def test_basket_pairs_max_basket_drops_oversized(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.basket import basket_pairs

    # basket 0: 5 items (kept, twice → support 2); basket 9: 6 items (> cap)
    small = pd.DataFrame({"bk": [0] * 5 + [1] * 5, "it": list(range(5)) * 2})
    big = pd.DataFrame({"bk": [9] * 6, "it": range(6)})
    df = pd.concat([small, big], ignore_index=True)
    out = basket_pairs(
        rd.from_pandas(df),
        basket_col="bk",
        item_col="it",
        minsup=2,
        max_basket=5,
        n_buckets=8,
    ).to_pandas()
    got = sorted(zip(out["item_a"], out["item_b"], out["support"]))
    assert got == _naive(df, 2, 5)
    assert all(s == 2 for _, _, s in got) and len(got) == 10  # C(5,2)


def test_association_rules_reference(ray_session):
    """conf/lift equal a set-based local replay; singleton and oversize
    baskets are excluded from supports, item counts AND N alike."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.basket import association_rules

    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [10, 30],
        4: [20, 30],
        5: [10, 20, 30],
        6: [99],              # singleton: excluded everywhere
        7: list(range(200)),  # oversize (>64): excluded everywhere
    }
    rows = [
        {"l_orderkey": b, "l_partkey": i}
        for b, items in baskets.items()
        for i in items
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows))).repartition(4)
    out = association_rules(ds, minsup=2, max_basket=64, n_buckets=8).to_pandas()
    got = {
        (int(r["ante"]), int(r["cons"])): (
            int(r["support"]), int(r["conf_pm"]), int(r["lift_pm"])
        )
        for _, r in out.iterrows()
    }

    pop = {b: set(v) for b, v in baskets.items() if 2 <= len(set(v)) <= 64}
    n = len(pop)
    cnt = {}
    for items in pop.values():
        for i in items:
            cnt[i] = cnt.get(i, 0) + 1
    sup = {}
    for items in pop.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                sup[(s[x], s[y])] = sup.get((s[x], s[y]), 0) + 1
    exp = {}
    for (a, b), s in sup.items():
        if s >= 2:
            for ante, cons in ((a, b), (b, a)):
                exp[(ante, cons)] = (
                    s,
                    (1000 * s) // cnt[ante],
                    (1000 * n * s) // (cnt[ante] * cnt[cons]),
                )
    assert got == exp
    assert len(exp) == 6  # all three pairs qualify, both directions
