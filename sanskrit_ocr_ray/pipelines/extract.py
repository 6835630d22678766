"""The flagship pipeline: interleaved docs + media → reassembled spans.

Dataflow (all Ray Data; stages stream with backpressure, nothing heavy is
ever materialized):

    docs ─ map_batches(explode_normalize) ──────────────┐  (small rows)
                                                         ├─ union ─ groupby(doc_id) ─ map_groups(rebuild) ─ out
    media ─ map_batches(binarize+deskew)  [pixels drop]  │
          ─ map_batches(GlyphRecognizer actor pool)      │
          ─ map_batches(rec→span rows)  ────────────────┘  (small rows)

Design points vs the reference (single-threaded loops, SURVEY.md §3):
- pixel bytes live only inside the two media map_batches stages; the one
  all-to-all shuffle (groupby doc_id) moves only strings — a page reduces
  to ~200 chars before it ever crosses a partition boundary;
- explode-before-recognize spreads "fat" many-page docs across tasks
  (skew-aware: the unit of work is the page, not the document);
- recognition is a stateful actor pool (codebook loaded once per actor);
- checkpointed runs hash-partition on doc_id and commit each partition
  atomically with lineage metrics (state/manifest.py).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.explode import explode_normalize_batch
from ..stages.image import binarize_deskew_batch
from ..stages.recognize import GlyphRecognizer, rec_to_span_rows
from ..stages.reassemble import flatten_out, rebuild_bucket
from ..state import manifest as mf
from ..util import md5_u64, stable_partition

#: reassembly shuffle buckets — ≫ cores for balance, ≪ docs so each
#: map_groups call rebuilds many docs vectorized (scale knob)
REASSEMBLY_BUCKETS = 256


def _default_pool_size() -> int:
    """Recognizer actor-pool size: nearly all CPUs.

    The binarize→recognize chain is the pipeline's compute (Ray fuses the
    two map_batches into the actor pool), every other stage is I/O-light
    string work — so the pool gets ~7/8 of the CPUs. Reserving ALL CPUs
    starves the read/union/sort stages and serializes the pipeline
    (measured: media read 2.8s of work stretched over 15.9s at pool=31/32);
    a (1, N) autoscaling pool ramps too slowly for short runs — hence a
    fixed, slightly-undersized pool.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # ≥2 CPUs must stay free: with all-to-all stages in the plan, a pool
    # leaving only 1 free CPU livelocks the streaming executor (measured:
    # pool=3/4 CPUs + random_shuffle deadlocks; pool=2/4 runs in 3.7s)
    return max(2, cpus - max(2, cpus // 8))


def tune_read_context() -> None:
    """Size read splitting to the cluster instead of Ray's default 200.

    The default ``read_op_min_num_blocks=200`` shatters a page-image read
    into ~10-page blocks whose per-block executor overhead halves
    throughput (measured 5.5s → 2.8s on a 1.9k-page read+binarize at 32
    CPUs). 2×CPUs blocks keeps every core busy with far fewer, fatter
    blocks; per-batch slicing inside a task still bounds UDF memory.
    """
    try:
        import ray
        from ray.data import DataContext

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        ctx = DataContext.get_current()
        ctx.read_op_min_num_blocks = max(16, 2 * cpus)
    except Exception:
        pass


def extract_dataset(
    docs_ds,
    media_ds,
    *,
    recognizer_concurrency=None,
    page_batch_size: int = 16,
    drop_metrics: bool = True,
):
    """One-shot extraction over in-flight Datasets → OUT_DOCS Dataset.

    ``page_batch_size`` is a *pixel budget*: 16 pages × 128 KB ≈ 2 MB per
    task input (wide binary rows need small batches, SURVEY.md §7.4) and
    small enough to keep the actor pool load-balanced.
    """
    if recognizer_concurrency is None:
        recognizer_concurrency = _default_pool_size()
    tune_read_context()  # affects reads created after this point
    span_rows = docs_ds.map_batches(explode_normalize_batch, batch_format="pyarrow")
    rec_rows = (
        media_ds.map_batches(
            binarize_deskew_batch,
            batch_format="pyarrow",
            batch_size=page_batch_size,
        )
        .map_batches(
            GlyphRecognizer,
            batch_format="pyarrow",
            batch_size=page_batch_size,
            concurrency=recognizer_concurrency,
            num_cpus=1,
        )
        .map_batches(rec_to_span_rows, batch_format="pyarrow")
    )
    import numpy as np

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        b = pa.array(
            [
                int(md5_u64(d) % np.uint64(REASSEMBLY_BUCKETS))
                for d in batch["doc_id"].to_pylist()
            ],
            type=pa.int32(),
        )
        return batch.append_column("__db", b)

    # THE one mandatory shuffle: hash(doc_id) buckets, then a vectorized
    # many-docs-per-call rebuild (per-doc grouping would dispatch one
    # Python call per document — unusable at 10^12 docs)
    out = (
        span_rows.union(rec_rows)
        .map_batches(add_doc_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("__db")
        .map_groups(rebuild_bucket, batch_format="pandas")
    )
    if drop_metrics:
        out = out.select_columns(["doc_id", "seq"])
    return out


def extract_flat(docs_ds, media_ds, **kwargs):
    """Extraction with OUT_FLAT rows (one row per span) — compare-friendly."""
    out = extract_dataset(docs_ds, media_ds, **kwargs)
    return out.map_batches(flatten_out, batch_format="pyarrow")


def _part_of_media_ref(ref: str, n_partitions: int) -> int:
    return stable_partition(ref.split("/", 1)[0], n_partitions)


def run_extract(
    fixture_dir: str,
    out_dir: str,
    *,
    n_partitions: int = 8,
    wave_size: int = 4,
    resume: bool = True,
    recognizer_concurrency=None,
    page_batch_size: int = 16,
) -> list[dict]:
    """Checkpointed, resumable extraction over an on-disk fixture.

    Input docs must carry a ``part`` hash-partition column (synth writes
    ``stable_partition(doc_id, n_partitions)``); media co-partitions by the
    doc-id prefix of ``media_ref``. Partitions are processed in waves of
    ``wave_size``; each wave is ONE Dataset run whose output is written
    under ``<out>/_tmp`` partitioned by ``part`` and then committed
    per-partition via atomic rename + manifest record — a crash loses at
    most the in-flight wave, and a rerun skips every committed partition
    (production note: at cluster scale the media table is laid out as one
    directory per partition so each wave reads only its own shards; the
    single-file fixture is filtered in-flight instead).

    Returns the full manifest (one record per partition).
    """
    import ray.data as rd

    tune_read_context()
    docs_path = _pick(fixture_dir, "docs")
    media_path = _pick(fixture_dir, "media")

    done = mf.completed_partitions(out_dir) if resume else set()
    pending = [p for p in range(n_partitions) if p not in done]
    os.makedirs(os.path.join(out_dir, "_tmp"), exist_ok=True)

    for w0 in range(0, len(pending), wave_size):
        wave = pending[w0 : w0 + wave_size]
        wave_set = set(wave)
        t0 = time.time()

        docs_ds = rd.read_parquet(
            docs_path, filter=pc.field("part").isin(wave)
        )

        def media_in_wave(batch: pa.Table, wave_set=frozenset(wave_set)) -> pa.Table:
            keep = [
                _part_of_media_ref(r, n_partitions) in wave_set
                for r in batch["media_ref"].to_pylist()
            ]
            return batch.filter(pa.array(keep))

        media_ds = rd.read_parquet(media_path).map_batches(
            media_in_wave, batch_format="pyarrow"
        )

        out = extract_dataset(
            docs_ds.drop_columns(["part"]),
            media_ds,
            recognizer_concurrency=recognizer_concurrency,
            page_batch_size=page_batch_size,
            drop_metrics=False,
        )

        def tag_part(batch: pa.Table) -> pa.Table:
            parts = [
                stable_partition(d, n_partitions)
                for d in batch["doc_id"].to_pylist()
            ]
            return batch.append_column("part", pa.array(parts, type=pa.int32()))

        tmp_dir = os.path.join(out_dir, "_tmp")
        out.map_batches(tag_part, batch_format="pyarrow").write_parquet(
            tmp_dir, partition_cols=["part"]
        )
        wall = time.time() - t0
        for p in wave:
            tmp_part = os.path.join(tmp_dir, f"part={p}")
            if not os.path.isdir(tmp_part):  # partition had zero docs
                os.makedirs(tmp_part, exist_ok=True)
            mf.commit_partition(out_dir, p, tmp_part, wall / max(len(wave), 1))
    return mf.read_manifest(out_dir)


def _pick(fixture_dir: str, name: str) -> str:
    """Fixture tables may be a single file (<name>.parquet) or a directory."""
    f = os.path.join(fixture_dir, f"{name}.parquet")
    return f if os.path.exists(f) else os.path.join(fixture_dir, name)
