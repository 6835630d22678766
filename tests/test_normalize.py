"""Normalizer unit vectors (SURVEY.md M1/M2; FIXTURES.md §4)."""

import numpy as np
import pyarrow as pa
import pytest

from sanskrit_ocr_ray.stages.normalize import (
    ASCII_LOWER,
    make_normalizer,
    normalize_column,
    normalize_devanagari,
)

CASES = [
    # pure Devanagari passes through
    ("कखग घङच", "कखग घङच"),
    # mixed Latin+Devanagari: Latin deleted (h5_to_parquet.py:18 char class)
    ("hello कabखc world", "कख"),
    # digits/punct deleted; ASCII space kept
    ("१2३ क, ख.", "१३ क ख"),  # Devanagari digits stay; ASCII digit deleted
    # leading/trailing whitespace stripped
    ("  कख  ", "कख"),
    # virama + conjunct survives intact (क्ष = क U+094D ष)
    ("क्ष", "क्ष"),
    # NFC canonicalizes: U+0958 is a composition exclusion, so both the
    # precomposed क़ and the decomposed क+़ normalize to the SAME
    # (decomposed) form - Python and DuckDB agree on this
    ("क़", "क़"),
    ("क़", "क़"),
    # empty after clean
    ("abc 123!", ""),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_cases(raw, expected):
    out = normalize_devanagari(np.array([raw], dtype=object))
    assert out[0] == expected


def test_normalize_idempotent():
    raws = np.array([c[0] for c in CASES], dtype=object)
    once = normalize_devanagari(raws)
    twice = normalize_devanagari(once)
    assert list(once) == list(twice)


def test_normalize_column_drop_empty():
    t = pa.table({"text": ["कख", "abc", " ग "]})
    out = normalize_column(t, "text", drop_empty=True)
    assert out["text"].to_pylist() == ["कख", "ग"]


def test_configurable_keep_class():
    fn = make_normalizer(ASCII_LOWER, nfc=True, lower=True)
    out = fn(np.array(["Hello, World! 42"], dtype=object))
    assert out[0] == "hello world"
