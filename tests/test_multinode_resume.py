"""Multi-node rehearsal of the checkpointed extract path (north rule:
"resumable from checkpoint with per-partition lineage + metrics" on a
fixed-size cluster).

Simulates the ray-job-submit lifecycle a real cluster sees: process A
(one driver) writes the fixture to a shared-filesystem root
(SXRAY_SCRATCH_ROOT pointed at a non-/tmp dir), starts the wave loop,
and DIES mid-run after committing the first wave; process B (a fresh
driver — new pid, new Ray session, multi-actor pool) resumes against
the same shared state and must finish exactly the pending partitions:
committed manifests byte-identical (no reprocess), output ids complete
with no duplicates.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRASH_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from sanskrit_ocr_ray.synth import write_fixture_local
from sanskrit_ocr_ray.pipelines.extract import run_extract
from sanskrit_ocr_ray.state import manifest as mf

shared = %(shared)r              # the "shared filesystem"
fx = os.path.join(shared, "fixture")
out = os.path.join(shared, "out")
write_fixture_local(fx, 24, seed=42, n_partitions=4)

# crash after the first wave: let exactly 2 partitions commit, then die
real_commit = mf.commit_partition
n_committed = {"n": 0}
def crashing_commit(*a, **kw):
    if n_committed["n"] >= 2:
        raise RuntimeError("simulated driver death mid-run")
    n_committed["n"] += 1
    return real_commit(*a, **kw)
mf.commit_partition = crashing_commit

try:
    run_extract(fx, out, n_partitions=4, wave_size=2, recognizer_concurrency=2)
    print("UNEXPECTED-COMPLETION")
except RuntimeError:
    print("CRASHED-AS-PLANNED committed=%%d" %% n_committed["n"])
ray.shutdown()
"""

RESUME_SCRIPT = r"""
import glob, json, os, sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow.parquet as pq
from sanskrit_ocr_ray.pipelines.extract import run_extract
from sanskrit_ocr_ray.state import manifest as mf

shared = %(shared)r
fx = os.path.join(shared, "fixture")
out = os.path.join(shared, "out")

done_before = sorted(mf.completed_partitions(out))
assert done_before and len(done_before) == 2, done_before
pre = {p: open(mf.manifest_path(out, p)).read() for p in done_before}

man = run_extract(fx, out, n_partitions=4, wave_size=2, recognizer_concurrency=2)
assert len(man) == 4 and all(m["status"] == "done" for m in man), man

# committed partitions were NOT reprocessed: manifests byte-identical
for p, txt in pre.items():
    assert open(mf.manifest_path(out, p)).read() == txt, p

# full, duplicate-free output vs golden
ids = []
for f in glob.glob(os.path.join(out, "part=*", "*.parquet")):
    ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
golden = pq.read_table(os.path.join(fx, "golden.parquet"), columns=["doc_id"])
want = sorted(golden["doc_id"].to_pylist())
assert sorted(ids) == want, (len(ids), len(want))
assert len(set(ids)) == len(ids)
print("RESUME-OK n_docs=%%d" %% len(ids))
ray.shutdown()
"""


def test_fresh_process_resume_on_shared_root(tmp_path):
    shared = str(tmp_path / "sharedfs")
    os.makedirs(shared, exist_ok=True)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["SXRAY_SCRATCH_ROOT"] = shared

    sub = {"repo": REPO, "shared": shared}
    a = subprocess.run(
        [sys.executable, "-c", CRASH_SCRIPT % sub],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert a.returncode == 0, a.stdout[-2000:] + a.stderr[-4000:]
    assert "CRASHED-AS-PLANNED committed=2" in a.stdout, a.stdout[-2000:]

    b = subprocess.run(
        [sys.executable, "-c", RESUME_SCRIPT % sub],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert b.returncode == 0, b.stdout[-2000:] + b.stderr[-4000:]
    assert "RESUME-OK" in b.stdout, b.stdout[-2000:]
