"""Interleaved-docs table source: Lance when available, Parquet otherwise.

The engine's storage contract is a columnar table of interleaved
documents — (doc_id, spans[{kind,text,media_ref,offset}]) plus a
co-partitioned media table (FIXTURES.md). The production format is
Lance (`ray.data.read_lance` — a native Ray datasource with column
projection and fragment-parallel scans); this sandbox ships no
``pylance``, so the SAME schemas live in partitioned Parquet and every
pipeline goes through :func:`read_table`, which dispatches on what is
actually on disk:

- a ``<name>.lance`` dataset directory → ``ray.data.read_lance`` with
  ``columns`` pushdown (requires the ``lance`` package);
- otherwise → ``ray.data.read_parquet`` with the same pushdown.

Both return the identical Ray Dataset schema, so swapping storage is a
path change, not a code change. Column pruning ALWAYS goes through the
reader (never a post-read select) — at 100 TB the projection must
happen before bytes leave storage.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, *, columns: list[str] | None = None, row_filter=None):
    """Read an interleaved-docs (or media/any engine) table by path.

    ``path`` may point at a Lance dataset dir (``*.lance`` or containing
    a ``_versions`` marker), a Parquet directory, or a single Parquet
    file. Returns a ``ray.data.Dataset`` with ``columns`` projected at
    the read. ``row_filter`` (a ``pyarrow.dataset`` expression) is pushed
    into the scan so row groups that cannot match never leave storage —
    at 100 TB a post-read ``filter()`` on a partitioning-adjacent column
    (source, date, shard) wastes the whole scan; the filter column does
    NOT need to be in ``columns``.
    """
    import ray.data as rd

    is_lance = path.endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))
    )
    if is_lance:
        if not lance_available():
            raise ImportError(
                f"{path} is a Lance dataset but the 'lance' package is not "
                "installed; install pylance or convert to Parquet"
            )
        if row_filter is not None:
            # read_lance has no pyarrow-expression pushdown; apply the SAME
            # expression post-read per block (Table.filter accepts a
            # pyarrow.dataset Expression), so both dispatch arms return
            # identical rows. Stringifying the expression into Ray's
            # filter-expr parser does NOT work (e.g. ~is_in renders as
            # 'invert(...)', which the parser rejects).
            import pyarrow as pa

            def _apply(batch: pa.Table, _expr=row_filter) -> pa.Table:
                return batch.filter(_expr)

            return rd.read_lance(path, columns=columns).map_batches(
                _apply, batch_format="pyarrow"
            )
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns, filter=row_filter)
