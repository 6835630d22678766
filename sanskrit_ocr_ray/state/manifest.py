"""Per-partition checkpoint/lineage manifest (SURVEY.md §4, FIXTURES.md §5).

Generalizes the reference's resume cursor — HDF5 sink row count read back at
startup (translate_bookcorpus.py:43-44) + source ``.skip(n)``
(translate_bookcorpus.py:79) — which is only correct for a single serial
writer. Here each hash partition of ``doc_id`` commits independently:

- output written to ``<out>/_tmp/part=K``      (invisible to readers)
- atomically renamed to ``<out>/part=K``       (commit point)
- ``<out>/manifest/part-K.json`` written last   (lineage + metrics record)

Resume = anti-join: pending partitions are those without a manifest record
(offset-based skip is not stable under parallel read order; a keyed
manifest is). A partition present in the manifest is never reprocessed and
never double-written → idempotent restarts.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from ..util import md5_u64

MANIFEST_DIR = "manifest"


def manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{partition_id}.json")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
            if rec.get("status") == "done":
                done.add(int(rec["partition_id"]))
    return done


def partition_fingerprint(doc_ids) -> str:
    """Order-independent fingerprint of a partition's input doc ids
    (XOR of per-id stable hashes) — parallel-read-order safe."""
    acc = 0
    for d in doc_ids:
        acc ^= md5_u64(d)
    return f"{acc:016x}"


def commit_partition(
    out_dir: str,
    partition_id: int,
    tmp_part_dir: str,
    wall_seconds: float,
) -> dict:
    """Atomically publish one partition dir + write its manifest record.

    Metrics are read from the committed files' own columns/metadata
    (n_docs from parquet row counts; n_spans/n_pixels from the lineage
    metric columns written by reassemble.rebuild_bucket) so the record
    always describes exactly what was published.
    """
    final_dir = os.path.join(out_dir, f"part={partition_id}")
    if os.path.exists(final_dir):
        import shutil

        shutil.rmtree(final_dir)  # uncommitted leftover from a crashed run
    os.replace(tmp_part_dir, final_dir)  # atomic on one filesystem

    n_quarantined = 0
    if any(n.endswith(".parquet") for n in os.listdir(final_dir)):
        cols = ["doc_id", "n_spans", "n_pixels"]
        # optional lineage column: pipelines that quarantine rows (codec
        # gaps, corrupt payloads — stages/multimodal.FeatureExtractor)
        # thread a per-doc n_quarantined count; the manifest then
        # reports what a 100-TB run skipped, not just what it kept
        schema_names = pq.read_schema(
            next(
                os.path.join(final_dir, n)
                for n in sorted(os.listdir(final_dir))
                if n.endswith(".parquet")
            )
        ).names
        has_q = "n_quarantined" in schema_names
        t = pq.read_table(
            final_dir, columns=cols + (["n_quarantined"] if has_q else [])
        )
        if has_q:
            n_quarantined = int(sum(t["n_quarantined"].to_pylist()))
    else:  # zero-doc partition
        import pyarrow as pa

        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "n_spans": pa.array([], type=pa.int32()),
                "n_pixels": pa.array([], type=pa.int64()),
            }
        )
    rec = {
        "partition_id": partition_id,
        "input_fingerprint": partition_fingerprint(t["doc_id"].to_pylist()),
        "n_docs": t.num_rows,
        "n_spans": int(sum(t["n_spans"].to_pylist())),
        "n_pixels": int(sum(t["n_pixels"].to_pylist())),
        "n_quarantined": n_quarantined,
        "wall_seconds": wall_seconds,
        "status": "done",
    }
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    tmp_json = manifest_path(out_dir, partition_id) + ".tmp"
    with open(tmp_json, "w") as f:
        json.dump(rec, f)
    os.replace(tmp_json, manifest_path(out_dir, partition_id))
    return rec


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out
