"""GPU/custom-resource actor-pool contract (SURVEY.md T1): the model
stage must be schedulable under a resource constraint (num_gpus → a
custom resource knob in this GPU-less sandbox) with the codebook built
ONCE per actor — never per batch. Runs in a subprocess because the
session fixture's Ray cluster has no custom resources."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, resources={"gpu_slot": 2},
         include_dashboard=False, logging_level="ERROR")
import ray.data as rd
import pyarrow as pa
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from sanskrit_ocr_ray.synth import write_fixture_local
from sanskrit_ocr_ray.stages.geometry import binarize_deskew_batch
from sanskrit_ocr_ray.stages.recognize import GlyphRecognizer

INITS = 0  # per-process: an actor re-initializing would bump it past 1

class CountingRecognizer(GlyphRecognizer):
    def __init__(self):
        global INITS
        super().__init__()
        INITS += 1
        self._inits = INITS
        self._pid = os.getpid()

    def __call__(self, batch):
        out = super().__call__(batch)
        n = out.num_rows
        return out.append_column(
            "pid", pa.array([self._pid] * n, pa.int64())
        ).append_column("inits", pa.array([self._inits] * n, pa.int64()))

fx = os.path.join(%(tmp)r, "fx")
write_fixture_local(fx, 24, seed=42, n_partitions=2)
media = rd.read_parquet(os.path.join(fx, "media.parquet"))
out = media.map_batches(
    binarize_deskew_batch, batch_format="pyarrow", batch_size=8
).map_batches(
    CountingRecognizer,
    batch_format="pyarrow",
    batch_size=8,
    concurrency=2,
    num_cpus=1,
    resources={"gpu_slot": 1},   # each actor occupies one slot
).to_pandas()
assert len(out) > 0
per_actor = out.groupby("pid")["inits"].max()
assert 1 <= len(per_actor) <= 2, f"pool size violated: {len(per_actor)} actors"
assert (per_actor == 1).all(), f"codebook rebuilt mid-stream: {dict(per_actor)}"
calls = out.groupby("pid").size().max()
assert calls > 1, "need multiple batches per actor to prove init-once"
assert ray.cluster_resources().get("gpu_slot", 0) == 2  # knob registered

# the first-class pipeline knob plumbs the same constraint through
from sanskrit_ocr_ray.pipelines.extract import extract_dataset
docs = rd.read_parquet(os.path.join(fx, "docs.parquet")).drop_columns(["part"])
res = extract_dataset(
    docs,
    rd.read_parquet(os.path.join(fx, "media.parquet")),
    recognizer_concurrency=2,
    # num_cpus here overrides the pipeline's default (reserved-key
    # override must merge, not TypeError on a duplicate keyword)
    recognizer_ray_remote_args={"resources": {"gpu_slot": 1}, "num_cpus": 1},
).to_pandas()
import pyarrow.parquet as pq
n_docs_golden = pq.read_table(os.path.join(fx, "golden.parquet"), columns=["doc_id"])["doc_id"].to_pandas().nunique()
assert len(res) == n_docs_golden, (len(res), n_docs_golden)
print("GPU-CONTRACT-OK")
ray.shutdown()
"""


def test_recognizer_pool_under_custom_resource(tmp_path):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # own cluster with the custom resource
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO, "tmp": str(tmp_path)}],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "GPU-CONTRACT-OK" in proc.stdout
