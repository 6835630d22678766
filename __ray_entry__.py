"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

The extraction queries run over a deterministic synthetic interleaved-docs
corpus (BASELINE.json ``input_hint`` shape), synthesized once per scale
into /tmp and cached — the driver's TPC-H-ish tables have no spans/media
payloads, so the engine's own fixture factory provides them (FIXTURES.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_FIXTURE_CACHE = "/tmp/sxray_fixtures"

#: docs per scale dir, keyed by the sf dir's `documents` row count
_N_DOCS = {"sf0.001": 60, "sf0.01": 200, "sf0.1": 600}


def _fixture_for(sf_dir: str) -> str:
    """Synthesize (once) the interleaved-docs fixture matching ``sf_dir``."""
    from sanskrit_ocr_ray.synth import write_fixture_local

    tag = os.path.basename(os.path.normpath(sf_dir))
    n_docs = _N_DOCS.get(tag, 60)
    out = os.path.join(_FIXTURE_CACHE, f"{tag}-{n_docs}")
    marker = os.path.join(out, "golden.parquet")
    if not os.path.exists(marker):
        write_fixture_local(out, n_docs, seed=42, n_partitions=4)
    return out


def _extract_flat(sf_dir: str):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_flat

    fx = _fixture_for(sf_dir)
    docs = rd.read_parquet(f"{fx}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fx}/media.parquet")
    return extract_flat(docs, media)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _extract_flat("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {
        # flagship: interleaved docs + media pages → reassembled span rows
        # (non-SQL-expressible: image decode/OCR; golden-equality is pytest's
        # job — tests/test_extract.py)
        "extract_e2e": _extract_flat,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for each SQL-expressible query (same column names)."""
    return {}
