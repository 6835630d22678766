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
    "tok_hash_cache",
    "TokHashCache",
    "md5_hex16",
    "md5_u64_many",
    "batch_token_hash_flat",
    "stable_partition",
    "u64_to_hex",
    "doc_rng",
    "fast_hash_u64",
    "typed_empty",
]


def md5_u64(s: str | bytes) -> int:
    """First 8 bytes of md5(s) as an unsigned 64-bit int.

    DuckDB equivalent: ``('0x' || substr(md5(s), 1, 16))::UBIGINT``.
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def tok_hash_cache() -> "TokHashCache":
    """Batch-local memo for token hashing: ``cache(w) == md5_u64(w)``.

    Natural-language token streams are Zipfian — the distinct-token
    count is a small fraction of the token-instance count — so the
    minhash/simhash hot paths call this once per DISTINCT token per
    batch instead of once per instance. Deliberately batch-scoped (the
    caller creates one per map_batches invocation): a module-level
    ``lru_cache``/global dict would be captured by the package's
    by-value cloudpickle registration and either break worker
    deserialization (C wrapper pickles by module reference) or ship the
    warmed cache with every task.
    """
    return TokHashCache()


class TokHashCache(dict):
    """dict subclass: missing keys compute-and-store ``md5_u64``."""

    def __missing__(self, key: str) -> int:
        v = self[key] = md5_u64(key)
        return v


def md5_hex16(s: str | bytes) -> str:
    """First 16 hex chars of md5(s). DuckDB: ``substr(md5(s), 1, 16)``."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.md5(s).hexdigest()[:16]


def md5_u64_many(items) -> np.ndarray:
    """Vector of md5_u64 over an iterable of strings → uint64 ndarray."""
    return np.fromiter((md5_u64(x) for x in items), dtype=np.uint64)


def batch_token_hash_flat(col, cache=None):
    """' '-split tokenization + md5 token hashing for a whole Arrow column.

    The shared front half of the minhash / simhash / LSH-band kernels:
    tokenize every text in ONE Arrow ``split_pattern`` pass, factorize
    the flattened tokens (``dictionary_encode``), run md5 once per
    DISTINCT token in the batch (Zipf: distinct ≪ instances), and gather
    back to per-instance hashes — no Python executes per token instance.

    Returns ``(starts, doc_sel, th)``:

    - ``th``      — uint64 ``md5_u64(token)`` per token INSTANCE, in
      doc-major order (duplicates kept; min/vote reductions are
      duplicate-insensitive or want the multiset respectively)
    - ``starts``  — start index in ``th`` of each doc with ≥1 non-empty
      token (segment ends = next start / len(th))
    - ``doc_sel`` — row index into ``col`` of each such doc (token-less
      docs are absent, matching the oracle's token CTE)
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    split = pc.split_pattern(col, " ")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_ne = flat.filter(pa.array(mask))
    parent_ne = parent[mask]
    enc = flat_ne.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    h = cache if cache is not None else tok_hash_cache()
    vocab_h = np.fromiter((h[w] for w in vocab), np.uint64, len(vocab))
    th = (
        vocab_h[enc.indices.to_numpy(zero_copy_only=False)]
        if len(vocab)
        else np.empty(0, np.uint64)
    )
    if len(parent_ne):
        starts = np.flatnonzero(np.r_[True, parent_ne[1:] != parent_ne[:-1]])
        doc_sel = parent_ne[starts]
    else:
        starts = np.empty(0, np.int64)
        doc_sel = np.empty(0, np.int64)
    return starts, doc_sel, th


def batch_tokens_flat(col):
    """' '-split tokenization for a whole Arrow column, as token STRINGS.

    The string-keyed sibling of :func:`batch_token_hash_flat` for
    operators that group or match on the tokens themselves (TF rows,
    stopword membership, keyword hits, n-gram shingles) rather than on
    their hashes. One Arrow ``split_pattern`` pass — no Python executes
    per token instance.

    Returns ``(flat_ne, parent_ne)``: the non-empty tokens of the whole
    batch in doc-major order as an Arrow string array, and the int64 row
    index into ``col`` of each token. Token-less rows contribute nothing
    (matching the oracles' ``str_split(text, ' ')`` + empty-filter CTEs).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    split = pc.split_pattern(col, " ")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(mask)), parent[mask].astype(np.int64)


def stable_partition(key: str, n_partitions: int) -> int:
    """Deterministic partition id for a string key (hash-partition on doc_id).

    Pure-Python int modulo: ``python_int % np.uint64(n)`` silently coerces
    through float64 and truncates the low bits, which skewed partitions
    65/15/12/8% in round 1 — never mix Python ints with numpy scalar mods.
    """
    return md5_u64(key) % n_partitions


def u64_to_hex(v: int | np.uint64) -> str:
    """16-char zero-padded lowercase hex. DuckDB: ``printf('%016x', v)``."""
    return f"{int(v):016x}"


def fast_hash_u64(values) -> np.ndarray:
    """Vectorized deterministic uint64 hash for BUCKET IDS only.

    Uses pandas' siphash (fixed default hash_key → stable across processes
    and machines); ints hash fully vectorized, strings in one cython pass —
    ~10× cheaper than per-row ``hashlib.md5``. Bucket ids never need oracle
    parity (only every-equal-value-same-bucket determinism), so md5 stays
    reserved for oracle-visible values (minhash/simhash/fingerprints).
    """
    import pandas as pd

    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, categorize=False)


def typed_empty(**cols) -> "object":
    """Zero-row pandas DataFrame with the given column dtypes.

    Ray's sort-based groupby hands empty groups to ``map_groups`` as
    column-less frames; emitting ``pd.DataFrame()`` back produces
    schema-less blocks (streaming_executor 'different schema' warnings and
    a unification hazard). Every grouped UDF returns one of these instead.
    """
    import pandas as pd

    return pd.DataFrame({k: pd.Series(dtype=v) for k, v in cols.items()})


def doc_rng(seed: int, doc_id: str) -> np.random.Generator:
    """Per-document RNG: seeded by (global seed XOR stable hash of doc_id).

    Makes synthesis deterministic and order/parallelism-independent — the
    reference's unseeded global ``random`` (render_text.py degradation
    sampling) is the anti-pattern this replaces (SURVEY.md §2.6 O2).
    """
    return np.random.default_rng(np.uint64(seed) ^ np.uint64(md5_u64(doc_id)))
