"""Text-corpus sources/sinks (SURVEY.md §2.1 S1/S6/S7).

- :func:`read_chunked_passages` — the reference's chunked corpus reader
  (generate_dataset.py:7-19): fixed-size chunks of K lines with
  WRAP-AROUND at EOF, each chunk joined into one passage with the
  Devanagari danda separator (generate_dataset.py:30). Expressed as a
  Dataset transform: line number → chunk id (modular), groupby chunk,
  join — order comes from explicit line indices, never read order.
- :func:`write_manifest_jsonl` — the (media_ref, text) JSONL manifest
  sink (generate_dataset.py:41-42) as ``Dataset.write_json``.
"""

from __future__ import annotations

import pyarrow as pa

DANDA_SEP = " ।\n"
DANDA_END = "।।"


def _scan_line_index(path: str, range_bytes: int) -> tuple[list[dict], int]:
    """One bounded-memory streaming pass over the file that plans worker
    byte-ranges and the global index of the first line starting in each.

    Only O(#ranges) state is kept (cumulative newline counts at range
    boundaries); the bytes themselves are parsed by the workers. Returns
    (range descriptors, total line count). Line semantics are the
    reference's ``readline()`` (generate_dataset.py:12): empty lines
    count, a trailing segment without a final newline counts.
    """
    import os

    size = os.path.getsize(path)
    descs: list[dict] = []
    cum_nl = 0  # newlines in [0, s) at the current boundary s
    prev_byte_nl = False  # byte s-1 == \n
    last_byte_nl = False
    with open(path, "rb") as fh:
        s = 0
        while s < size:
            e = min(s + range_bytes, size)
            if s == 0:
                first_idx = 0
            else:
                # line i starts after the i-th newline: lines starting
                # before s = 1 + newlines in [0, s-1)
                first_idx = 1 + (cum_nl - (1 if prev_byte_nl else 0))
            descs.append({"start": s, "end": e, "first_idx": first_idx})
            buf = fh.read(e - s)
            cum_nl += buf.count(b"\n")
            prev_byte_nl = buf.endswith(b"\n")
            s = e
        last_byte_nl = prev_byte_nl
    n_lines = cum_nl + (1 if size > 0 and not last_byte_nl else 0)
    return descs, n_lines


def _parse_range(path: str, start: int, end: int, first_idx: int):
    """Parse the lines that START in byte range [start, end).

    Hadoop-split convention: a range owns a line iff the line's first byte
    is inside it; the parse reads past ``end`` to finish its last line and
    discards the partial line carried in from the previous range.
    """
    import os

    size = os.path.getsize(path)
    block = 1 << 20
    with open(path, "rb") as fh:
        if start == 0:
            pos = 0
            fh.seek(0)
        else:
            # discard the line spanning the boundary: first \n at >= start-1
            fh.seek(start - 1)
            pos = -1
            while pos < 0:
                chunk = fh.read(block)
                if not chunk:
                    return [], []
                j = chunk.find(b"\n")
                if j >= 0:
                    pos = fh.tell() - len(chunk) + j + 1
                    fh.seek(pos)
                else:
                    continue
            if pos >= end:
                return [], []
        data = fh.read(end - pos)
        # extend until the last owned line is complete (or EOF)
        while not data.endswith(b"\n") and pos + len(data) < size:
            more = fh.read(block)
            if not more:
                break
            j = more.find(b"\n")
            if j >= 0:
                data += more[: j + 1]
                break
            data += more
    parts = data.split(b"\n")
    if data.endswith(b"\n"):
        parts = parts[:-1]
    idxs, texts = [], []
    p = pos
    for j, raw in enumerate(parts):
        if p >= end:
            break
        idxs.append(first_idx + j)
        texts.append(raw.decode("utf-8"))
        p += len(raw) + 1
    return idxs, texts


def read_chunked_passages(
    path: str,
    chunk_size: int = 10,
    n_chunks: int | None = None,
    *,
    range_bytes: int = 16 << 20,
    n_buckets: int = 64,
):
    """Chunk a line-oriented corpus into danda-joined passages.

    ``n_chunks`` > lines/chunk_size wraps to the file start, mirroring the
    reference's modular reader (generate_dataset.py:13-18: reset to offset
    0 at EOF). Raises ValueError on an empty corpus (same contract,
    generate_dataset.py:10-11). Empty lines are kept and a trailing
    unterminated line counts — ``readline()`` semantics
    (generate_dataset.py:12,18: lines are ``rstrip("\\n")``-ed, never
    dropped).

    Streaming-scale shape: the driver makes ONE bounded-memory pass to
    build an O(#ranges) byte-range→line-index map; workers parse their own
    ranges in parallel (lines owned by the range their first byte falls
    in), the EOF wrap is a vectorized modular expansion, and passages
    assemble through a single bucketed shuffle — no corpus bytes ever
    materialize on the driver. Multi-file corpora parallelize the same
    way, one index scan per file.

    Returns a Dataset of (chunk_id: int64, passage: string), passage =
    ``DANDA_SEP.join(lines) + DANDA_END``.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    descs, n_lines = _scan_line_index(path, range_bytes)
    if n_lines == 0:
        raise ValueError(f"empty corpus: {path}")
    if n_chunks is None:
        n_chunks = (n_lines + chunk_size - 1) // chunk_size
    total_needed = n_chunks * chunk_size
    buckets = max(1, min(n_buckets, n_chunks))

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        out_chunk, out_pos, out_line = [], [], []
        for _, d in batch.iterrows():
            idxs, texts = _parse_range(
                path, int(d["start"]), int(d["end"]), int(d["first_idx"])
            )
            if not idxs:
                continue
            # EOF wrap: line i occupies global positions i, i+n_lines, ...
            idx = np.asarray(idxs, dtype=np.int64)
            reps = np.maximum(0, (total_needed - 1 - idx) // n_lines + 1)
            keep = reps > 0
            idx, reps = idx[keep], reps[keep]
            texts = [t for t, k in zip(texts, keep) if k]
            base = np.repeat(idx, reps)
            offs = np.concatenate([np.arange(r) for r in reps]) if len(reps) else []
            gpos = base + np.asarray(offs, dtype=np.int64) * n_lines
            out_chunk.append(gpos // chunk_size)
            out_pos.append(gpos % chunk_size)
            out_line.extend(np.repeat(np.asarray(texts, dtype=object), reps))
        if not out_chunk:
            return pd.DataFrame(
                {
                    "chunk_id": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "line": pd.Series([], dtype=object),
                    "__b": pd.Series([], dtype=np.int64),
                }
            )
        chunk_id = np.concatenate(out_chunk)
        return pd.DataFrame(
            {
                "chunk_id": chunk_id,
                "pos": np.concatenate(out_pos),
                "line": np.asarray(out_line, dtype=object),
                "__b": chunk_id % buckets,
            }
        )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "chunk_id": pd.Series([], dtype=np.int64),
                    "passage": pd.Series([], dtype=object),
                }
            )
        g = df.sort_values(["chunk_id", "pos"], kind="mergesort")
        out = (
            g.groupby("chunk_id", sort=True)["line"]
            .apply(lambda ls: DANDA_SEP.join(ls) + DANDA_END)
            .reset_index()
            .rename(columns={"line": "passage"})
        )
        return out

    ds = rd.from_pandas(pd.DataFrame(descs)).repartition(len(descs))
    return (
        ds.map_batches(parse, batch_format="pandas", batch_size=1)
        .groupby("__b")
        .map_groups(join_bucket, batch_format="pandas")
        .select_columns(["chunk_id", "passage"])
    )


def write_manifest_jsonl(ds, out_dir: str) -> None:
    """(media_ref/image, text) manifest rows → JSONL directory
    (generate_dataset.py:41-42's captions.jsonl as a Dataset sink)."""
    ds.write_json(out_dir)


def template_prompts(
    batch: pa.Table,
    template: str = "Translate the following English passage to Sanskrit:\n{text}",
    column: str = "text",
    out: str = "prompt",
) -> pa.Table:
    """Prompt templating projection feeding a model stage
    (translate_bookcorpus.py:130-133,140 semantics, M4)."""
    prompts = pa.array(
        [template.format(text=t or "") for t in batch[column].to_pylist()],
        type=pa.string(),
    )
    return batch.append_column(out, prompts)
