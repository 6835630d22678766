"""Bucketed table layout — co-partitioning persisted to storage.

The storage-level complement of `stages/relational.hash_join`: instead
of re-shuffling both sides at every join, a table is written ONCE into
``out_dir/__bucket=<hash(key) % B>/`` directories (the Hive/Spark/
Iceberg *bucketed table* primitive), and any later join on the same key
with the same bucket count is a ZERO-SHUFFLE map: one task per bucket
reads the matching directory of each side and merges locally — the
bucket id IS the co-partitioning proof. This is the "pick ONE
partitioning key and reuse it across stages" rule made durable: at
100 TB the dominant fact table is written bucketed by its join key at
ingest, and every downstream join, groupby or dedup on that key reads
co-located buckets instead of paying an all-to-all exchange per query.

Bucket function: integer keys bucket by ``value % n_buckets`` — the
SAME single-int-key function `hash_join` documents, so a bucketed
layout is co-partitioned with the engine's in-flight shuffles too.

Scale shape:
- `write_bucketed` is one streaming pass (`map_batches` tag + native
  partitioned `write_parquet`); blocks never gather anywhere.
- `bucketed_join` is embarrassingly parallel: B independent tasks, each
  reading only its two bucket directories (Σ reads = the two tables,
  exactly once) — no shuffle operator in the plan at all. Aggregations
  keyed by the SAME key run inside the bucket task (a bucket holds every
  row of its keys), so join+groupby costs zero exchanges end-to-end.
- A missing/empty bucket directory is a valid empty bucket (buckets
  with no rows are simply never written).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..util import typed_empty

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    ds,
    out_dir: str,
    *,
    key: str,
    n_buckets: int = 16,
    sort_within_bucket: bool = False,
) -> str:
    """Write ``ds`` as a bucketed parquet table: one Hive-style
    ``__bucket=<key % n_buckets>/`` directory per bucket under
    ``out_dir`` (cleaned first, so re-running is idempotent). Returns
    ``out_dir``.

    ``sort_within_bucket=True`` is the DISTRIBUTE BY + SORT BY
    clustered-write contract: each bucket's rows are written key-sorted
    (one bounded per-bucket sort — a groupby task per bucket, never a
    global sort), so downstream per-bucket consumers can stream
    merge-joins / binary-search point lookups instead of building hash
    tables, and parquet row-group min/max stats become range-prunable
    within the bucket."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        # cast to uint64 BEFORE the modulo — exactly hash_join's single-
        # int-key bucket function, so the claimed co-partitioning with
        # in-flight shuffles holds for negative keys too
        b = (
            batch[key].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if sort_within_bucket:
        def sort_bucket(group: pd.DataFrame) -> pd.DataFrame:
            return group.sort_values(key, kind="mergesort")

        tagged = tagged.groupby("__bucket").map_groups(
            sort_bucket, batch_format="pandas"
        )
    tagged.write_parquet(out_dir, partition_cols=["__bucket"])
    return out_dir


def bucketed_join(
    dir_a: str,
    dir_b: str,
    *,
    left_key: str,
    right_key: str,
    n_buckets: int = 16,
    combine=None,
    combine_empty: pd.DataFrame | None = None,
    suffix: str = "_r",
):
    """Zero-shuffle inner join of two bucketed layouts written with the
    SAME ``n_buckets`` (on ``left_key`` / ``right_key`` respectively) →
    one task per bucket reads both ``__bucket=i`` directories and
    pandas-merges locally; right-side column collisions get ``suffix``
    (the `hash_join` convention).

    ``combine`` (optional) runs INSIDE the bucket task on the joined
    frame — pass a groupby keyed by the bucket key to get join+aggregate
    with zero exchanges (a bucket holds every row of its keys, so
    per-bucket aggregates are exact and bucket-additive).
    """
    import ray.data as rd

    def _read_bucket(root: str, b: int) -> pd.DataFrame | None:
        p = os.path.join(root, f"__bucket={b}")
        if not os.path.isdir(p):
            return None
        return pq.read_table(p).to_pandas()

    def join_bucket(batch: pa.Table) -> pa.Table:
        frames = []
        for b in batch["b"].to_pylist():
            la = _read_bucket(dir_a, int(b))
            rb = _read_bucket(dir_b, int(b))
            if la is None or rb is None or la.empty or rb.empty:
                continue
            m = la.merge(
                rb,
                left_on=left_key,
                right_on=right_key,
                how="inner",
                suffixes=("", suffix),
            )
            if combine is not None:
                m = combine(m)
            if len(m):
                frames.append(m)
        if not frames:
            out = (
                combine_empty.copy()
                if combine_empty is not None
                else typed_empty(**{left_key: np.int64})
            )
        else:
            out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    ids = rd.from_items([{"b": i} for i in range(n_buckets)]).repartition(
        n_buckets
    )
    return ids.map_batches(join_bucket, batch_format="pyarrow")
