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


def read_chunked_passages(
    path: str,
    chunk_size: int = 10,
    n_chunks: int | None = None,
):
    """Chunk a line-oriented corpus into danda-joined passages.

    ``n_chunks`` > lines/chunk_size wraps to the file start, mirroring the
    reference's modular reader (generate_dataset.py:13-18: reset to offset
    0 at EOF). Raises ValueError on an empty corpus (same contract,
    generate_dataset.py:10-11).

    Returns a Dataset of (chunk_id: int64, passage: string), passage =
    ``DANDA_SEP.join(lines) + DANDA_END``.
    """
    import ray.data as rd

    lines_ds = rd.read_text(path)
    n_lines = lines_ds.count()
    if n_lines == 0:
        raise ValueError(f"empty corpus: {path}")
    if n_chunks is None:
        n_chunks = (n_lines + chunk_size - 1) // chunk_size
    total_needed = n_chunks * chunk_size

    # global line index: zip with a deterministic index (read order of
    # read_text is file order for a single file; make it explicit)
    lines = lines_ds.to_pandas()["text"].tolist()  # corpus files are small
    rows = []
    for i in range(total_needed):
        rows.append({"chunk_id": i // chunk_size, "line": lines[i % n_lines]})
    ds = rd.from_items(rows)

    def join_chunk(df):
        import pandas as pd

        out = (
            df.sort_index()
            .groupby("chunk_id", sort=True)["line"]
            .apply(lambda ls: DANDA_SEP.join(ls) + DANDA_END)
            .reset_index()
            .rename(columns={"line": "passage"})
        )
        return out

    return ds.groupby("chunk_id").map_groups(join_chunk, batch_format="pandas")


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
