"""Smoke the `ray job submit` entry point (tools/submit_extract.py) the
way a cluster submission runs it: a standalone subprocess that owns its
Ray session, runs the checkpointed job, and prints a one-line JSON
summary — plus the resubmit path (second run skips all committed
partitions)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIXTURE_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from sanskrit_ocr_ray.synth import write_fixture_local
write_fixture_local(%(fx)r, 24, seed=42, n_partitions=4)
ray.shutdown()
print("FIXTURE-OK")
"""


def _last_json_line(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON summary line in: {stdout[-2000:]}")


def test_submit_extract_job_and_resubmit(tmp_path):
    fx = str(tmp_path / "fixture")
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    prep = subprocess.run(
        [sys.executable, "-c", FIXTURE_SCRIPT % {"repo": REPO, "fx": fx}],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert prep.returncode == 0, prep.stdout[-1000:] + prep.stderr[-3000:]

    cmd = [
        sys.executable, os.path.join(REPO, "tools", "submit_extract.py"),
        "--input", fx, "--output", out, "--partitions", "4", "--wave", "2",
    ]
    a = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert a.returncode == 0, a.stdout[-1000:] + a.stderr[-3000:]
    summary = _last_json_line(a.stdout)
    assert summary["metric"] == "extract_job"
    assert summary["partitions"] == 4
    import pyarrow.parquet as pq

    n_golden = pq.read_table(
        os.path.join(fx, "golden.parquet"), columns=["doc_id"]
    ).num_rows
    assert summary["n_docs"] == n_golden
    assert summary["docs_per_sec"] > 0
    manifests = os.listdir(os.path.join(out, "manifest"))
    assert len([m for m in manifests if m.endswith(".json")]) == 4

    # resubmit: nothing pending — must be fast and must not rewrite
    pre = {
        m: os.path.getmtime(os.path.join(out, "manifest", m)) for m in manifests
    }
    b = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert b.returncode == 0, b.stdout[-1000:] + b.stderr[-3000:]
    for m, t in pre.items():
        assert os.path.getmtime(os.path.join(out, "manifest", m)) == t, m
