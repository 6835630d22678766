"""Incremental view maintenance — delta-based aggregate refresh.

The warehouse/streaming primitive behind every "keep this dashboard
aggregate fresh" job: a groupby view over an append-only fact table is
MATERIALIZED once, and each refresh folds only the NEW rows (the delta)
into the stored view — refresh cost is O(|delta| + |view|), never a
rescan of the base table. At 100 TB the base is petabyte-scale history
and the delta is one ingest window; recomputing from scratch per
refresh is the anti-pattern this module replaces.

Correctness rests on the same algebra the engine's partial aggregation
uses everywhere: count/sum are commutative monoids, so
``agg(base ∪ delta) = merge(agg(base), agg(delta))`` exactly — the
DuckDB oracle recomputes the full groupby over base ∪ delta and the
integers match bit-for-bit.

Scale shape:
- `materialize_agg` is one bounded ``hash(key) % B`` shuffle (per-batch
  dict partials → per-bucket sum) streamed straight to a partitioned
  parquet view — the view never gathers on the driver.
- `refresh_agg` unions the STORED view rows (read back as partials)
  with the delta's per-batch partials and runs the same one bounded
  shuffle; the base table is not an input at all. Group keys present
  only in the delta (or only in the view) merge correctly because the
  fold is a plain monoid sum over the union.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import typed_empty

__all__ = ["materialize_agg", "refresh_agg"]


def _partials(key_col: str, cents_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: batch[key_col].to_pandas(),
                "n": np.ones(batch.num_rows, np.int64),
                "sum_c": batch[cents_col].to_numpy().astype(np.int64),
            }
        )
        g = df.groupby(key_col, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    return fn


def _fold(ds, *, key_col: str, n_buckets: int):
    from ..stages.dedup import bucketed_aggregate

    empty = typed_empty(**{key_col: object, "n": np.int64, "sum_c": np.int64})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key_col, as_index=False)[["n", "sum_c"]].sum()
        return out.astype({"n": np.int64, "sum_c": np.int64})

    return bucketed_aggregate(ds, [key_col], merge, n_buckets=n_buckets, empty=empty)


def materialize_agg(
    ds,
    view_dir: str,
    *,
    key_col: str,
    cents_col: str,
    n_buckets: int = 16,
) -> str:
    """Materialize the (key, n, sum_c) groupby view of ``ds`` into
    ``view_dir`` (cleaned first — idempotent). Returns ``view_dir``."""
    if os.path.isdir(view_dir):
        shutil.rmtree(view_dir)
    agg = _fold(
        ds.map_batches(_partials(key_col, cents_col), batch_format="pyarrow"),
        key_col=key_col,
        n_buckets=n_buckets,
    )
    agg.write_parquet(view_dir)
    return view_dir


def refresh_agg(
    view_dir: str,
    delta_ds,
    *,
    key_col: str,
    cents_col: str,
    n_buckets: int = 16,
):
    """Fold ONLY the delta into the stored view → the refreshed
    aggregate Dataset (key, n, sum_c). The base table is not read:
    stored view rows are already (key, n, sum_c) partials, so they
    union with the delta's per-batch partials into the same one bounded
    shuffle."""
    import ray.data as rd

    delta = delta_ds.map_batches(
        _partials(key_col, cents_col), batch_format="pyarrow"
    )
    # a zero-row base writes no parquet files (or no dir at all) —
    # read_parquet would fail on the degenerate fixture, and an empty
    # view contributes nothing to the monoid fold anyway
    has_view = os.path.isdir(view_dir) and any(
        f.endswith(".parquet") for f in os.listdir(view_dir)
    )
    combined = rd.read_parquet(view_dir).union(delta) if has_view else delta
    return _fold(combined, key_col=key_col, n_buckets=n_buckets)
