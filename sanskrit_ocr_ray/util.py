"""Deterministic hashing + small helpers shared across stages.

All hashes are md5-derived so they are (a) stable across processes,
machines and Python versions (unlike ``hash()``), and (b) exactly
reproducible in DuckDB oracle SQL via
``('0x' || substr(md5(x), 1, 16))::UBIGINT`` — the driver's correctness
gate compares Ray output against DuckDB output value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "md5_u64",
    "md5_hex16",
    "md5_u64_many",
    "stable_partition",
    "u64_to_hex",
    "doc_rng",
]


def md5_u64(s: str | bytes) -> int:
    """First 8 bytes of md5(s) as an unsigned 64-bit int.

    DuckDB equivalent: ``('0x' || substr(md5(s), 1, 16))::UBIGINT``.
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def md5_hex16(s: str | bytes) -> str:
    """First 16 hex chars of md5(s). DuckDB: ``substr(md5(s), 1, 16)``."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.md5(s).hexdigest()[:16]


def md5_u64_many(items) -> np.ndarray:
    """Vector of md5_u64 over an iterable of strings → uint64 ndarray."""
    return np.fromiter((md5_u64(x) for x in items), dtype=np.uint64)


def stable_partition(key: str, n_partitions: int) -> int:
    """Deterministic partition id for a string key (hash-partition on doc_id)."""
    return int(md5_u64(key) % np.uint64(n_partitions))


def u64_to_hex(v: int | np.uint64) -> str:
    """16-char zero-padded lowercase hex. DuckDB: ``printf('%016x', v)``."""
    return f"{int(v):016x}"


def doc_rng(seed: int, doc_id: str) -> np.random.Generator:
    """Per-document RNG: seeded by (global seed XOR stable hash of doc_id).

    Makes synthesis deterministic and order/parallelism-independent — the
    reference's unseeded global ``random`` (render_text.py degradation
    sampling) is the anti-pattern this replaces (SURVEY.md §2.6 O2).
    """
    return np.random.default_rng(np.uint64(seed) ^ np.uint64(md5_u64(doc_id)))
