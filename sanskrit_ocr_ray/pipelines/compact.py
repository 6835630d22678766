"""Partition compaction — the storage-lifecycle OPTIMIZE pass.

Long-running ingestion leaves partitions fragmented into many small
files (every wave, retry and resume appends more); scan efficiency at
100 TB depends on rewriting them into few near-target-size files. This
is the engine's `OPTIMIZE`/`rewrite_data_files` equivalent over the
partitioned-table layout the extract pipeline writes
(pipelines/extract.py: one `part=` directory per partition).

Scale shape: ONE distributed pass — `groupby(part)` hands each
partition to one task (the compaction unit every table format uses:
partitions compact independently, so a failed run resumes per
partition); the task deterministically orders rows, writes
``ceil(n/target_rows)`` files, then RE-READS what it wrote and emits
``(part, n_rows, n_files, checksum)`` — the checksum is computed from
the files on disk, not the in-memory frame, so a green result proves
the rewrite is durable and lossless, not merely attempted. No driver
state; the stats table is #partitions rows.

The checksum is order-independent (a sum of per-row md5-derived
integers mod 10⁹), so it equals the same aggregate computed by DuckDB
over the ORIGINAL table — the multiset-preservation oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..util import md5_u64_many, typed_empty

__all__ = ["compact_table"]

_CHECKSUM_MOD = 1_000_000_000


def compact_table(
    ds,
    out_dir: str,
    *,
    part_col: str = "part",
    target_rows: int = 64,
    key_col: str = "doc_id",
):
    """Compact a partitioned Dataset into ``out_dir/<part_col>=V/`` with
    ``ceil(n/target_rows)`` files per partition → stats Dataset
    ``(part, n_rows, n_files, checksum)`` read back from disk.

    Rows are ordered by ``key_col`` before slicing, so the produced
    files are byte-deterministic regardless of arrival order; existing
    ``compact-*`` files in a partition directory are removed first, so
    re-running is idempotent (the resume story: a crashed compaction
    just re-runs surviving partitions)."""

    empty = typed_empty(
        part=np.int64, n_rows=np.int64, n_files=np.int64, checksum=np.int64
    )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        rows = []
        for pv, g in df.groupby(part_col, sort=True):
            g = g.sort_values(key_col, kind="mergesort").reset_index(drop=True)
            n = len(g)
            k = (n + target_rows - 1) // target_rows
            pdir = os.path.join(out_dir, f"{part_col}={pv}")
            os.makedirs(pdir, exist_ok=True)
            for stale in os.listdir(pdir):
                if stale.startswith("compact-"):
                    os.remove(os.path.join(pdir, stale))
            tbl = pa.Table.from_pandas(g, preserve_index=False)
            for j in range(k):
                pq.write_table(
                    tbl.slice(j * target_rows, target_rows),
                    os.path.join(pdir, f"compact-{j:05d}.parquet"),
                )
            # durability proof: stats come from re-reading the files
            names = sorted(
                f for f in os.listdir(pdir) if f.startswith("compact-")
            )
            back = pa.concat_tables(
                [pq.read_table(os.path.join(pdir, f)) for f in names]
            )
            csum = int(
                (
                    md5_u64_many([str(v) for v in back[key_col].to_pylist()])
                    % np.uint64(_CHECKSUM_MOD)
                ).sum()
            )
            rows.append((int(pv), int(back.num_rows), len(names), csum))
        return pd.DataFrame(
            rows, columns=["part", "n_rows", "n_files", "checksum"]
        ).astype(np.int64)

    # no whole-dir wipe: partitions clean their own compact-* files, so a
    # crashed run's finished partitions survive and re-running is the
    # per-partition resume (the same contract as extract's manifest)
    os.makedirs(out_dir, exist_ok=True)
    return ds.groupby(part_col).map_groups(per_part, batch_format="pandas")
