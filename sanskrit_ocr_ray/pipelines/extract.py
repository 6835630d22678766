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
from ..stages.geometry import binarize_deskew_batch
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
    # cpus − 2: re-measured for the v14 full-severity kernel (≈65 ms/page
    # vs the old ≈17 ms), which makes the parquet read + decompress ~2-3%
    # of recognition CPU — the old 3/4 rule (tuned when reads were ~10%
    # and a bigger pool starved them) now just idles cores: at 32 CPUs,
    # pool 24 → 96-98 s vs pool 30 → 82.4 s on the same warm fixture
    # (monotone through 26/28/29). ≥2 CPUs must stay free regardless:
    # with all-to-all stages in the plan, a pool leaving only 1 free CPU
    # livelocks the streaming executor; 2 also covers the trickle reads.
    return max(2, cpus - 2)


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
        # cap block size well below the 128 MiB default: page-payload blocks
        # of ~55 MiB become ~10 s recognition tasks, and with only
        # 2-3 task rounds per actor the last round idles a third of the
        # pool (measured 64% pool utilization at 27k pages). 16 MiB blocks
        # (~125 pages) keep rounds fine-grained at negligible per-block cost.
        ctx.target_max_block_size = 16 * 1024 * 1024
    except Exception:
        pass


def extract_dataset(
    docs_ds,
    media_ds,
    *,
    recognizer_concurrency=None,
    page_batch_size: int = 64,
    drop_metrics: bool = True,
    media_ref_embeds_doc_id: bool = True,
    boilerplate_min_docs: int | None = None,
    extra_span_stages: tuple = (),
    recognizer_ray_remote_args: dict | None = None,
):
    """One-shot extraction over in-flight Datasets → OUT_DOCS Dataset.

    ``page_batch_size`` is a *pixel budget*: 64 pages × 128 KB ≈ 8 MB per
    task input (wide binary rows need bounded batches, SURVEY.md §7.4);
    larger batches amortize per-batch Arrow assembly (measured 54s → 48s
    at 8 CPUs moving 16 → 64).

    ``media_ref_embeds_doc_id``: when True (the engine's partitioning
    convention, FIXTURES.md §1) recognition results derive their doc_id
    from the ``media_ref`` prefix and reach reassembly with a SINGLE
    shuffle. When False, an extra bucketed media_ref join attaches
    recognition output to the media spans first (two shuffles total).

    ``boilerplate_min_docs``: if set, text spans whose normalized text
    recurs in ≥ that many documents are stripped (corpus-level exact
    boilerplate filter; empty strings never count).
    """
    if recognizer_concurrency is None:
        recognizer_concurrency = _default_pool_size()
    tune_read_context()  # affects reads created after this point
    span_rows = docs_ds.map_batches(explode_normalize_batch, batch_format="pyarrow")
    for _name, fn in extra_span_stages:  # user stages (SURVEY.md §2.10)
        span_rows = span_rows.map_batches(fn, batch_format="pyarrow")
    if boilerplate_min_docs is not None:
        from ..stages.normalize import strip_boilerplate

        is_text = lambda t: pc.equal(t["kind"], "text")  # noqa: E731
        text_part = span_rows.map_batches(
            lambda t: t.filter(is_text(t)), batch_format="pyarrow"
        )
        other_part = span_rows.map_batches(
            lambda t: t.filter(pc.invert(is_text(t))), batch_format="pyarrow"
        )
        span_rows = strip_boilerplate(
            text_part, min_docs=boilerplate_min_docs
        ).union(other_part)
    rec_out = media_ds.map_batches(
        binarize_deskew_batch,
        batch_format="pyarrow",
        batch_size=page_batch_size,
    )
    # GPU/custom-resource slot for the model stage (the reference pins
    # its model to one GPU per worker, translate_bookcorpus.py:119-128):
    # pass {"num_gpus": 1} or {"resources": {...}} to constrain actor
    # placement to accelerator-bearing nodes. Caller-supplied keys win
    # over the defaults (a {"num_cpus": 2} override must not TypeError).
    rec_kwargs = {
        "batch_format": "pyarrow",
        "batch_size": page_batch_size,
        "concurrency": recognizer_concurrency,
        "num_cpus": 1,
        **(recognizer_ray_remote_args or {}),
    }
    rec_out = rec_out.map_batches(GlyphRecognizer, **rec_kwargs)
    if media_ref_embeds_doc_id:
        rec_rows = rec_out.map_batches(rec_to_span_rows, batch_format="pyarrow")
    else:
        span_rows, rec_rows = _join_rec_by_media_ref(span_rows, rec_out)
    import numpy as np

    from ..util import fast_hash_u64

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        # vectorized siphash (bucket ids need determinism, not md5 parity)
        h = fast_hash_u64(batch["doc_id"].to_pylist())
        b = pa.array((h % np.uint64(REASSEMBLY_BUCKETS)).astype(np.int32))
        return batch.append_column("__db", b)

    # THE one mandatory shuffle: hash(doc_id) buckets, then a vectorized
    # many-docs-per-call rebuild (per-doc grouping would dispatch one
    # Python call per document — unusable at 10^12 docs). The narrow
    # repartition coalesces the ~hundreds of tiny upstream blocks before
    # the sort barrier: its map round runs one task per input block, and
    # task dispatch dominated the tail (measured 7.1 s → 2.4 s).
    try:
        import ray

        coalesce = max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        coalesce = 64
    out = (
        span_rows.union(rec_rows)
        .map_batches(add_doc_bucket, batch_format="pyarrow", batch_size=None)
        .repartition(coalesce)
        .groupby("__db")
        .map_groups(rebuild_bucket, batch_format="pandas")
    )
    if drop_metrics:
        out = out.select_columns(["doc_id", "seq"])
    return out


def _join_rec_by_media_ref(span_rows, rec_out, n_buckets: int = 256):
    """Fallback join: attach recognition output to media-span rows by an
    explicit bucketed equi-join on ``media_ref`` (used when media_ref does
    not embed doc_id). Returns (non-media span rows, joined media rows in
    rec-row schema). One extra small-row shuffle; pixels long gone."""
    import numpy as np
    import pandas as pd

    from ..util import fast_hash_u64

    def split(kind_is_media: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(t["kind"], "media")
            return t.filter(m if kind_is_media else pc.invert(m))

        return fn

    text_rows = span_rows.map_batches(split(False), batch_format="pyarrow")
    media_rows = span_rows.map_batches(split(True), batch_format="pyarrow")

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            h = fast_hash_u64(t["media_ref"].to_pylist())
            b = pa.array((h % np.uint64(n_buckets)).astype(np.int32))
            cols = {
                "doc_id": t["doc_id"] if side == "m" else pa.nulls(t.num_rows, pa.string()),
                "offset": t["offset"] if side == "m" else pa.nulls(t.num_rows, pa.int32()),
                "media_ref": t["media_ref"],
                "text": t["text"],
                "n_pixels": t["n_pixels"],
            }
            out = pa.table(cols)
            return out.append_column("__mb", b).append_column(
                "__side", pa.array([side] * t.num_rows)
            )

        return fn

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["__side"] == "m"][["doc_id", "offset", "media_ref"]]
        r = df[df["__side"] == "r"][["media_ref", "text", "n_pixels"]]
        out = m.merge(r, on="media_ref", how="left")
        out["text"] = out["text"].fillna("")
        out["n_pixels"] = out["n_pixels"].fillna(0).astype(np.int64)
        # the joined row IS the media span, text already attached;
        # rebuild_bucket falls back to the row's own text when there is
        # no separate 'rec' lookup row for its media_ref
        out["kind"] = "media"
        out["offset"] = out["offset"].astype(np.int32)
        return out[["doc_id", "offset", "kind", "text", "media_ref", "n_pixels"]]

    joined = (
        media_rows.map_batches(tag("m"), batch_format="pyarrow")
        .union(rec_out.map_batches(tag("r"), batch_format="pyarrow"))
        .groupby("__mb")
        .map_groups(join_bucket, batch_format="pandas")
    )
    return text_rows, joined


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
    page_batch_size: int = 64,
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
    # a crashed wave leaves partial files under _tmp; the rerun's
    # write_parquet would APPEND beside them → duplicated docs. _tmp holds
    # only uncommitted state, so clearing it is always safe.
    import shutil

    shutil.rmtree(os.path.join(out_dir, "_tmp"), ignore_errors=True)
    os.makedirs(os.path.join(out_dir, "_tmp"), exist_ok=True)

    for w0 in range(0, len(pending), wave_size):
        wave = pending[w0 : w0 + wave_size]
        wave_set = set(wave)
        t0 = time.time()

        docs_ds = rd.read_parquet(
            docs_path, filter=pc.field("part").isin(wave)
        )

        # co-partitioned media layout (media/part=K/ dirs, written by
        # synth.write_fixture_ray): read ONLY the wave's partitions — no
        # bytes leave storage for committed partitions. Fall back to an
        # in-flight filter for unpartitioned single-file media.
        part_dirs = [
            os.path.join(media_path, f"part={p}")
            for p in wave
            if os.path.isdir(os.path.join(media_path, f"part={p}"))
        ]
        if part_dirs:
            # expand to files: this Ray version's read_parquet doesn't
            # accept a list of directories
            files = [
                os.path.join(d, f)
                for d in part_dirs
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
            media_ds = rd.read_parquet(files)
            if "part" in media_ds.schema().names:
                media_ds = media_ds.drop_columns(["part"])
        else:
            def media_in_wave(batch: pa.Table, wave_set=frozenset(wave_set)) -> pa.Table:
                # vectorized: md5 once per DISTINCT doc-id prefix (media
                # refs of one doc share it), then a numpy isin gather —
                # partition ids must stay md5-based to match what synth
                # wrote, so fast_hash_u64 is not an option here
                import numpy as np

                prefix = pc.list_element(
                    pc.split_pattern(batch["media_ref"], "/", max_splits=1), 0
                )
                enc = prefix.combine_chunks().dictionary_encode()
                vocab = enc.dictionary.to_pylist()
                parts = np.fromiter(
                    (md5_u64(v) % n_partitions for v in vocab),
                    dtype=np.int64,
                    count=len(vocab),
                )
                keep_vocab = np.isin(parts, np.fromiter(wave_set, dtype=np.int64))
                keep = keep_vocab[enc.indices.to_numpy()]
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
