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
- ``*.jsonl`` / ``*.json`` → ``ray.data.read_json`` (ingestion format:
  no storage-side projection exists, so columns are dropped right after
  parse and the row filter runs per block);
- ``*.csv`` → ``ray.data.read_csv`` with ``include_columns`` pushed into
  the Arrow CSV parser (columns never materialize), filter per block;
- ``*.orc`` → a stripe-streaming :class:`OrcDatasource` (Ray ships no
  ``read_orc``): each read task decodes its file stripe by stripe via
  ``pyarrow.orc`` with ``columns`` pushed into the stripe read, so only
  projected columns are decompressed and a block is one stripe, never a
  whole file;
- ``*.feather`` / ``*.arrow`` → a batch-streaming :class:`IpcDatasource`
  over the Arrow IPC file format — zero parse cost (IPC **is** the
  in-memory layout), projection right after each record batch;
- ``*.avro`` → a block-streaming pure-Python OCF decoder
  (:mod:`.avro`; no ``fastavro`` in the sandbox) — row-major ingestion
  edge like JSONL, one Ray block per Avro block, null/deflate codecs;
- otherwise → ``ray.data.read_parquet`` with column + row-group pushdown.

All arms return the identical Ray Dataset schema for the same rows, so
swapping storage is a path change, not a code change (pinned by
tests/test_tables.py's cross-format parity test). Column pruning ALWAYS
goes through the reader (never a caller-side select) — at 100 TB the
projection must happen before bytes leave storage, which is also why
Parquet/Lance are the production formats and JSONL/CSV are accepted only
as ingestion edges (their filters cannot skip storage).
"""

from __future__ import annotations

import os


def _make_orc_datasource(paths, columns):
    """ORC datasource: one block per stripe, columns pushed into the
    stripe decode (only projected streams are decompressed — ORC is
    columnar inside each stripe, so this is a real storage-side
    projection, unlike the JSONL/CSV ingestion arms)."""
    from ray.data.datasource import FileBasedDatasource

    class OrcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def _open_input_source(self, filesystem, path, **open_args):
            # ORC footers/stripe indexes need random access, not a
            # sequential stream (the FileBasedDatasource default)
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            from pyarrow import orc as paorc

            import pyarrow as pa

            of = paorc.ORCFile(f)
            for i in range(of.nstripes):
                # read_stripe returns a RecordBatch; Ray blocks are Tables
                yield pa.Table.from_batches([of.read_stripe(i, columns=columns)])

    return OrcDatasource(paths)


def _make_ipc_datasource(paths, columns):
    """Arrow IPC / Feather-v2 datasource: one block per record batch,
    projection applied per batch (IPC is already the in-memory format,
    so 'decode' is a buffer view; column selection after mmap-free
    stream open costs nothing extra)."""
    from ray.data.datasource import FileBasedDatasource

    class IpcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["feather", "arrow"]

        def _open_input_source(self, filesystem, path, **open_args):
            # the IPC *file* format locates batches via the footer —
            # random access, same as ORC
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            import pyarrow as pa

            reader = pa.ipc.open_file(f)
            for i in range(reader.num_record_batches):
                t = pa.Table.from_batches([reader.get_batch(i)])
                yield t.select(columns) if columns is not None else t

    return IpcDatasource(paths)


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(
    path: str,
    *,
    columns: list[str] | None = None,
    row_filter=None,
    filter_columns: list[str] | None = None,
):
    """Read an interleaved-docs (or media/any engine) table by path.

    ``path`` may point at a Lance dataset dir (``*.lance`` or containing
    a ``_versions`` marker), a Parquet directory, or a single Parquet
    file. Returns a ``ray.data.Dataset`` with ``columns`` projected at
    the read. ``row_filter`` (a ``pyarrow.dataset`` expression) is pushed
    into the scan so row groups that cannot match never leave storage —
    at 100 TB a post-read ``filter()`` on a partitioning-adjacent column
    (source, date, shard) wastes the whole scan; the filter column does
    NOT need to be in ``columns``.

    On the NON-Parquet arms the filter runs per block after the read, so
    a filter column outside ``columns`` forces the storage-side
    projection to wait until after the filter (a full-width read —
    pyarrow expressions expose no public field enumeration to widen the
    projection automatically). Pass ``filter_columns`` — the columns the
    expression references — to keep storage-side projection on those
    arms: the read projects ``columns + filter_columns`` and the extras
    drop right after the per-block filter. Parquet ignores the hint
    (its scan pushes both natively).
    """
    import ray.data as rd

    def _filtered(ds, _expr=row_filter):
        # apply the SAME pyarrow.dataset expression post-read per block
        # (Table.filter accepts it), so every dispatch arm returns
        # identical rows to the Parquet pushdown path. Stringifying the
        # expression into Ray's filter-expr parser does NOT work (e.g.
        # ~is_in renders as 'invert(...)', which the parser rejects).
        if _expr is None:
            return ds
        import pyarrow as pa

        def _apply(batch: pa.Table) -> pa.Table:
            return batch.filter(_expr)

        return ds.map_batches(_apply, batch_format="pyarrow")

    # Projection plan for the non-Parquet arms: what to ask storage for
    # (None = full width) and whether a post-filter select must trim.
    if row_filter is None or columns is None:
        read_cols: list[str] | None = columns
        trim = False
    elif filter_columns is not None:
        read_cols = list(dict.fromkeys([*columns, *filter_columns]))
        trim = read_cols != columns
    else:  # filter refs unknown — stay correct, read full width
        read_cols = None
        trim = True

    def _project(ds):
        return ds.select_columns(columns) if trim else ds

    is_lance = path.endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))
    )
    if is_lance:
        if not lance_available():
            raise ImportError(
                f"{path} is a Lance dataset but the 'lance' package is not "
                "installed; install pylance or convert to Parquet"
            )
        # read_lance has no pyarrow-expression pushdown
        return _project(_filtered(rd.read_lance(path, columns=read_cols)))
    # gzip-compressed ingestion edges decompress in the read task via the
    # Arrow stream layer (arrow_open_stream_args) — no driver-side gunzip
    gz_args = {"compression": "gzip"} if path.endswith(".gz") else None
    if path.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz")):
        ds = (
            rd.read_json(path, arrow_open_stream_args=gz_args)
            if gz_args
            else rd.read_json(path)
        )
        if read_cols is not None:
            ds = ds.select_columns(read_cols)  # right after parse — no
            # storage-side projection exists for line-delimited JSON
        return _project(_filtered(ds))
    if path.endswith(".orc"):
        return _project(
            _filtered(rd.read_datasource(_make_orc_datasource(path, read_cols)))
        )
    if path.endswith((".feather", ".arrow")):
        return _project(
            _filtered(rd.read_datasource(_make_ipc_datasource(path, read_cols)))
        )
    if path.endswith(".avro"):
        from .avro import make_avro_datasource

        # row-major ingestion edge: projection right after each OCF
        # block decodes (no storage-side projection exists for Avro)
        return _project(
            _filtered(rd.read_datasource(make_avro_datasource(path, read_cols)))
        )
    if path.endswith((".csv", ".csv.gz")):
        from pyarrow import csv as pacsv

        convert = (
            pacsv.ConvertOptions(include_columns=read_cols)
            if read_cols is not None
            else None
        )
        kw = {"arrow_open_stream_args": gz_args} if gz_args else {}
        return _project(_filtered(rd.read_csv(path, convert_options=convert, **kw)))
    return rd.read_parquet(path, columns=columns, filter=row_filter)


def write_table(ds, path: str, **write_args):
    """Write a Dataset to ``path``, dispatching on the extension the same
    way :func:`read_table` does: a ``*.lance`` path uses Ray's native
    ``Dataset.write_lance`` (requires ``pylance`` — absent in this
    sandbox, so the arm raises a CLEAR capability error instead of an
    AttributeError deep inside a write task); anything else streams
    partitioned Parquet. Returns ``path``."""
    if path.endswith(".lance"):
        if not lance_available():
            raise ImportError(
                f"writing {path} requires the 'lance' package (pylance); "
                "install it or write Parquet instead (drop the .lance suffix)"
            )
        ds.write_lance(path, **write_args)
        return path
    ds.write_parquet(path, **write_args)
    return path


def table_schema(path: str):
    """Driver-side schema sniff for one table path — footer/header only,
    never row data. Used by :func:`read_table_union` to plan projection
    and null-fill before any scan task launches."""
    import pyarrow as pa

    if path.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz", ".csv", ".csv.gz")):
        raise ValueError(
            "schema-evolution union reads are a columnar-storage feature; "
            f"convert the ingestion-edge file first: {path}"
        )
    if path.endswith(".orc"):
        from pyarrow import orc as paorc

        return paorc.ORCFile(path).schema
    if path.endswith((".feather", ".arrow")):
        with pa.OSFile(path, "rb") as f:
            return pa.ipc.open_file(f).schema
    if path.endswith(".avro"):
        from .avro import ocf_schema

        return ocf_schema(path)
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        names = sorted(
            n for n in os.listdir(path) if n.endswith(".parquet")
        ) or sorted(os.listdir(path))
        return pq.read_schema(os.path.join(path, names[0]))
    return pq.read_schema(path)


def read_table_union(
    paths: list[str],
    *,
    columns: list[str] | None = None,
    row_filter=None,
    filter_columns: list[str] | None = None,
):
    """Schema-evolution read: one Dataset over table files written at
    DIFFERENT schema versions (columns added or dropped over time,
    integer widths widened) — DuckDB's ``union_by_name`` / Spark's
    ``mergeSchema``. Per path the requested projection is intersected
    with what that file actually stores; after the scan each block is
    null-filled and cast to the PROMOTED union schema
    (``pa.unify_schemas(..., promote_options="permissive")``: int32+int64
    → int64 etc.), then the plans are unioned — a plan-level concat, no
    shuffle and no driver row materialization. The sniff reads footers
    only, so planning cost is O(#paths) metadata fetches.
    """
    import pyarrow as pa

    schemas = [table_schema(p) for p in paths]
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    want = list(columns) if columns is not None else [f.name for f in unified]
    missing = [c for c in want if c not in unified.names]
    if missing:
        raise KeyError(f"columns {missing} exist in none of {paths}")
    out_schema = pa.schema([unified.field(c) for c in want])

    def _conform(batch: pa.Table) -> pa.Table:
        cols = []
        for f in out_schema:
            if f.name in batch.column_names:
                cols.append(batch[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(batch.num_rows, type=f.type))
        return pa.table(dict(zip(out_schema.names, cols)))

    parts = []
    for p, s in zip(paths, schemas):
        have = [c for c in want if c in s.names]
        fcols = (
            [c for c in filter_columns if c in s.names]
            if filter_columns is not None
            else None
        )
        ds = read_table(p, columns=have, row_filter=row_filter, filter_columns=fcols)
        parts.append(ds.map_batches(_conform, batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def read_csv_permissive(path: str, *, columns: list[str] | None = None):
    """CSV ingestion edge that SKIPS malformed rows instead of failing
    the read task — the permissive mode a web-scale crawl ingest needs
    (one truncated line in a 10-GB shard must not kill the wave; pair
    with :func:`csv_scan_report` to account for what was dropped).

    The skip runs inside Arrow's parser (``invalid_row_handler``) in
    each read task — no driver-side pre-scan, no Python per row.
    """
    import ray.data as rd
    from pyarrow import csv as pacsv

    parse = pacsv.ParseOptions(invalid_row_handler=lambda row: "skip")
    convert = (
        pacsv.ConvertOptions(include_columns=columns)
        if columns is not None
        else None
    )
    return rd.read_csv(path, parse_options=parse, convert_options=convert)


def csv_scan_report(paths: list[str] | str):
    """Malformed-row accounting for CSV shards: (path, n_rows,
    n_malformed) per file — the lineage record a permissive ingest
    writes next to its output (the CSV sibling of the extract
    manifest's ``n_quarantined``).

    One Ray task per file (``from_items`` + per-row map): each task
    re-parses its file with a COUNTING ``invalid_row_handler``, so the
    report needs no second format implementation and no driver-side
    parsing; the driver folds one row per file.
    """
    import pyarrow as pa
    import ray.data as rd
    from pyarrow import csv as pacsv

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = [
                os.path.join(paths, n)
                for n in sorted(os.listdir(paths))
                if n.endswith(".csv") or n.endswith(".csv.gz")
            ]
        else:
            paths = [paths]

    def scan(batch: pa.Table) -> pa.Table:
        out_p, out_n, out_m = [], [], []
        for p in batch["path"].to_pylist():
            bad = {"n": 0}

            def handler(row, bad=bad):
                bad["n"] += 1
                return "skip"

            t = pacsv.read_csv(
                p, parse_options=pacsv.ParseOptions(invalid_row_handler=handler)
            )
            out_p.append(p)
            out_n.append(t.num_rows)
            out_m.append(bad["n"])
        return pa.table(
            {
                "path": pa.array(out_p, type=pa.string()),
                "n_rows": pa.array(out_n, type=pa.int64()),
                "n_malformed": pa.array(out_m, type=pa.int64()),
            }
        )

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        scan, batch_format="pyarrow", batch_size=1
    )
