#!/usr/bin/env python
"""Cluster entry point for the checkpointed extraction job.

Submit to a running Ray cluster (the production shape the engine is
designed for) with::

    ray job submit --working-dir . -- \
        python tools/submit_extract.py \
            --input  /shared/fixtures/corpus-v1 \
            --output /shared/out/corpus-v1-extracted \
            --partitions 256 --wave 16

and locally (driver-owned session) it runs the same job under
``ray.init(address="local")``. The job is RESUMABLE: each partition
commits atomically (rename + manifest record), so re-submitting after a
crash skips every committed partition and re-runs at most one wave
(`sanskrit_ocr_ray/pipelines/extract.py:run_extract`,
`state/manifest.py`). Input/output paths must be cluster-visible
(shared filesystem or object store mount) — see SXRAY_SCRATCH_ROOT in
`__ray_entry__.py` for the same rule on scratch state.

Per-partition lineage + throughput metrics land in
``<output>/manifest/*.json``; the job prints a one-line JSON summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="fixture/corpus dir (docs+media)")
    ap.add_argument("--output", required=True, help="output dir (partitioned parquet)")
    ap.add_argument("--partitions", type=int, default=8, help="hash-partition count")
    ap.add_argument("--wave", type=int, default=4, help="partitions per wave")
    ap.add_argument("--no-resume", action="store_true", help="ignore prior manifest")
    ap.add_argument("--pool", type=int, default=None, help="recognizer actor-pool size")
    args = ap.parse_args()

    import ray

    # under `ray job submit` the cluster address comes from the runtime
    # env; standalone, own a local session (library code never inits)
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from sanskrit_ocr_ray.pipelines.extract import run_extract

    t0 = time.time()
    manifest = run_extract(
        args.input,
        args.output,
        n_partitions=args.partitions,
        wave_size=args.wave,
        resume=not args.no_resume,
        recognizer_concurrency=args.pool,
    )
    wall = time.time() - t0
    n_docs = sum(m.get("n_docs", 0) for m in manifest)
    print(json.dumps({
        "metric": "extract_job",
        "partitions": len(manifest),
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
        "output": args.output,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
