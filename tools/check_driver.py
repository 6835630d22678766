#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 (or $SF_DIR) and compares
row-count + column names + order-insensitive values against the matching
``oracle_sql()`` via DuckDB. Prints one line per query and a summary.

Note: the ``extract_e2e`` and ``multimodal_features`` oracles read the
sf0.01 fixture's golden parquet by ABSOLUTE path (the driver's
correctness scale), so running this checker with SF_DIR at any other
scale reports exactly those two as shape mismatches — expected, not a
regression (sf0.1 sweep: 35/37 pass + those two).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = em.queries()
    oracles = em.oracle_sql()
    only = sys.argv[1:]
    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(SF)
            d = res.to_pandas() if hasattr(res, "to_pandas") else res
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {exc!r}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"noor {name}: rows={len(d)} ({time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            o = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc!r}")
            n_fail += 1
            continue
        cols = sorted(d.columns)
        if cols != sorted(o.columns):
            print(f"FAIL {name}: columns {cols} vs {sorted(o.columns)}")
            n_fail += 1
            continue
        a = d[cols].sort_values(cols).reset_index(drop=True)
        b = o[cols].sort_values(cols).reset_index(drop=True)
        if a.shape != b.shape:
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}")
            n_fail += 1
            continue
        if not (a.astype(str).values == b.astype(str).values).all():
            bad = (a.astype(str).values != b.astype(str).values).any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ; first:")
            print(a[bad].head(3))
            print(b[bad].head(3))
            n_fail += 1
            continue
        print(f"PASS {name}: rows={len(a)} ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
