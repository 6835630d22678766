"""Lance-or-Parquet table source dispatch (sources/tables.py)."""

import os

import pytest


def test_read_table_parquet_with_projection(ray_session):
    from sanskrit_ocr_ray.sources.tables import read_table

    ds = read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang"]
    )
    assert set(ds.schema().names) == {"doc_id", "lang"}
    assert ds.count() == 500


def test_read_table_lance_requires_package(tmp_path):
    from sanskrit_ocr_ray.sources.tables import lance_available, read_table

    if lance_available():  # pragma: no cover - not in this sandbox
        pytest.skip("lance installed; dispatch would succeed")
    d = tmp_path / "docs.lance"
    (d / "_versions").mkdir(parents=True)
    with pytest.raises(ImportError, match="Lance"):
        read_table(str(d))
    assert os.path.isdir(d)  # dispatch detected the layout, not a typo path
