"""Shared fixtures: ONE Ray session per pytest run + a small synth corpus."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    """Deterministic 32-doc interleaved corpus (docs/media/truth/golden)."""
    from sanskrit_ocr_ray.synth import write_fixture_local

    out = str(tmp_path_factory.mktemp("fx"))
    write_fixture_local(out, 32, seed=42, n_partitions=4)
    return out
