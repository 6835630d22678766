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


def test_read_table_lance_row_filter_parity(ray_session, monkeypatch):
    """Both dispatch arms must return identical rows for the same
    (columns, row_filter) — exercised by mocking read_lance so the Lance
    arm's post-read expression filter actually runs (pylance is absent
    in this sandbox)."""
    import pyarrow.dataset as pds
    import ray.data as rd

    from sanskrit_ocr_ray.sources import tables

    src = "/root/testdata/sf0.001/documents.parquet"
    expr = ~pds.field("lang").isin(["sa"])  # 'invert(is_in(...))' repr —
    # exactly the shape Ray's string filter parser rejects

    monkeypatch.setattr(tables, "lance_available", lambda: True)
    monkeypatch.setattr(
        rd, "read_lance",
        lambda path, columns=None: rd.read_parquet(src, columns=columns),
        raising=False,
    )

    via_lance = tables.read_table(
        "/tmp/fake_docs.lance", columns=["doc_id", "lang"], row_filter=expr
    ).to_pandas()
    via_parquet = tables.read_table(
        src, columns=["doc_id", "lang"], row_filter=expr
    ).to_pandas()
    assert len(via_lance) > 0
    assert not (via_lance["lang"] == "sa").any()
    a = via_lance.sort_values("doc_id").reset_index(drop=True)
    b = via_parquet.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_read_table_jsonl_csv_parity(ray_session, tmp_path):
    """JSONL and CSV ingestion arms return the same rows, columns, and
    filter semantics as the Parquet pushdown path."""
    import duckdb
    import pyarrow.dataset as pds

    from sanskrit_ocr_ray.sources.tables import read_table

    src = "/root/testdata/sf0.001/documents.parquet"
    jsonl = str(tmp_path / "docs.jsonl")
    csvf = str(tmp_path / "docs.csv")
    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT doc_id, lang, len(text) AS n_chars FROM read_parquet('{src}')) "
        f"TO '{jsonl}' (FORMAT JSON)"
    )
    con.sql(
        f"COPY (SELECT doc_id, lang, len(text) AS n_chars FROM read_parquet('{src}')) "
        f"TO '{csvf}' (FORMAT CSV, HEADER)"
    )

    cols = ["doc_id", "n_chars"]
    expr = ~pds.field("lang").isin(["sa"])  # filter col NOT in columns
    want = (
        read_table(src, columns=cols, row_filter=expr)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    for path in (jsonl, csvf):
        got = read_table(path, columns=cols + ["lang"], row_filter=expr).to_pandas()
        assert not (got["lang"] == "sa").any()
        got = (
            got[cols]
            .astype(want.dtypes)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(want), path


def test_read_table_orc_feather_parity(ray_session, tmp_path):
    """ORC (stripe-streamed, columns pushed into the stripe decode) and
    Feather/Arrow-IPC (batch-streamed) arms return the same rows,
    columns, and filter semantics as the Parquet pushdown path."""
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.feather as pafeather
    import pyarrow.parquet as pq
    from pyarrow import orc as paorc

    from sanskrit_ocr_ray.sources.tables import read_table

    src = "/root/testdata/sf0.001/documents.parquet"
    tbl = pq.read_table(src, columns=["doc_id", "lang", "n_chars"])
    orcf = str(tmp_path / "docs.orc")
    # small stripes so the stripe-per-block streaming path actually runs
    paorc.write_table(tbl, orcf, stripe_size=16 * 1024)
    fthr = str(tmp_path / "docs.feather")
    pafeather.write_feather(
        tbl.combine_chunks(), fthr, compression="zstd", chunksize=128
    )
    arrw = str(tmp_path / "docs.arrow")
    with pa.ipc.new_file(arrw, tbl.schema) as w:
        for b in tbl.to_batches(max_chunksize=128):
            w.write_batch(b)

    cols = ["doc_id", "n_chars"]
    expr = ~pds.field("lang").isin(["sa"])  # filter col NOT in columns
    want = (
        read_table(src, columns=cols, row_filter=expr)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    for path in (orcf, fthr, arrw):
        got = read_table(path, columns=cols + ["lang"], row_filter=expr).to_pandas()
        assert not (got["lang"] == "sa").any()
        got = (
            got[cols]
            .astype(want.dtypes)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(want), path


def test_read_table_filter_column_outside_projection(ray_session, tmp_path):
    """A row_filter referencing a column NOT in ``columns`` must work on
    every dispatch arm (Parquet pushes both natively; the others defer
    projection past the filter) — with and without the ``filter_columns``
    hint that keeps storage-side projection on the non-Parquet arms."""
    import duckdb
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.feather as pafeather
    import pyarrow.parquet as pq
    from pyarrow import orc as paorc

    from sanskrit_ocr_ray.sources.tables import read_table

    src = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    sel = f"SELECT doc_id, lang, len(text) AS n_chars FROM read_parquet('{src}')"
    jsonl = str(tmp_path / "docs.jsonl")
    csvf = str(tmp_path / "docs.csv")
    con.sql(f"COPY ({sel}) TO '{jsonl}' (FORMAT JSON)")
    con.sql(f"COPY ({sel}) TO '{csvf}' (FORMAT CSV, HEADER)")
    tbl = pq.read_table(src, columns=["doc_id", "lang", "n_chars"])
    orcf = str(tmp_path / "docs.orc")
    paorc.write_table(tbl, orcf, stripe_size=16 * 1024)
    fthr = str(tmp_path / "docs.feather")
    pafeather.write_feather(tbl.combine_chunks(), fthr, chunksize=128)

    cols = ["doc_id", "n_chars"]
    expr = ~pds.field("lang").isin(["sa"])  # 'lang' never projected
    want = (
        read_table(src, columns=cols, row_filter=expr)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0 and list(want.columns) == cols
    for path in (jsonl, csvf, orcf, fthr):
        for hint in (None, ["lang"]):
            got = read_table(
                path, columns=cols, row_filter=expr, filter_columns=hint
            ).to_pandas()
            assert sorted(got.columns) == sorted(cols), (path, hint)
            got = (
                got[cols]
                .astype(want.dtypes)
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert got.equals(want), (path, hint)


def test_read_table_gzip_ingestion_parity(ray_session, tmp_path):
    """.jsonl.gz / .csv.gz decompress inside the read task (Arrow stream
    layer) and return the same rows as the uncompressed arms."""
    import gzip

    import duckdb
    import pyarrow.dataset as pds

    from sanskrit_ocr_ray.sources.tables import read_table

    src = "/root/testdata/sf0.001/documents.parquet"
    jsonl = tmp_path / "docs.jsonl"
    csvf = tmp_path / "docs.csv"
    con = duckdb.connect()
    sel = f"SELECT doc_id, lang, len(text) AS n_chars FROM read_parquet('{src}')"
    con.sql(f"COPY ({sel}) TO '{jsonl}' (FORMAT JSON)")
    con.sql(f"COPY ({sel}) TO '{csvf}' (FORMAT CSV, HEADER)")
    for plain, gz_name in ((jsonl, "docs.jsonl.gz"), (csvf, "docs.csv.gz")):
        with open(plain, "rb") as f:
            blob = gzip.compress(f.read())
        (tmp_path / gz_name).write_bytes(blob)

    cols = ["doc_id", "n_chars"]
    expr = ~pds.field("lang").isin(["sa"])
    want = (
        read_table(src, columns=cols, row_filter=expr)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for name in ("docs.jsonl.gz", "docs.csv.gz"):
        got = read_table(
            str(tmp_path / name), columns=cols + ["lang"], row_filter=expr
        ).to_pandas()
        assert not (got["lang"] == "sa").any()
        got = (
            got[cols]
            .astype(want.dtypes)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(want), name


def test_avro_codec_roundtrip():
    """Pure-Python Avro OCF: encode -> decode is lossless for the
    supported primitive + timestamp-micros types, both codecs, nulls
    included; malformed payloads raise."""
    import pyarrow as pa
    import pytest

    from sanskrit_ocr_ray.sources.avro import decode_avro, encode_avro

    tbl = pa.table(
        {
            "i": pa.array([1, None, -3], type=pa.int64()),
            "s": pa.array(["a", "β", None], type=pa.string()),
            "d": pa.array([0.5, None, -2.25], type=pa.float64()),
            "b": pa.array([True, False, None], type=pa.bool_()),
            "raw": pa.array([b"\x00\xff", None, b""], type=pa.binary()),
            "ts": pa.array([1_000_000, 2_500_000, None], type=pa.timestamp("us")),
        }
    )
    for codec in ("null", "deflate"):
        out = decode_avro(encode_avro(tbl, codec=codec, block_rows=2))
        assert out.equals(tbl), codec
    with pytest.raises(ValueError):
        decode_avro(b"NotAvroAtAll")
    good = encode_avro(tbl)
    with pytest.raises(ValueError):
        decode_avro(good[:-4])  # truncated final block/sync


def test_read_table_avro_parity(ray_session, tmp_path):
    """The Avro ingestion arm returns the same rows, columns, and filter
    semantics as the Parquet pushdown path; multi-block files stream one
    Ray block per OCF block."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from sanskrit_ocr_ray.sources.avro import encode_avro
    from sanskrit_ocr_ray.sources.tables import read_table

    src = "/root/testdata/sf0.001/documents.parquet"
    tbl = pq.read_table(src, columns=["doc_id", "lang", "n_chars"])
    avrof = str(tmp_path / "docs.avro")
    with open(avrof, "wb") as f:
        f.write(encode_avro(tbl, codec="deflate", block_rows=128))

    cols = ["doc_id", "n_chars"]
    expr = ~pds.field("lang").isin(["sa"])  # filter col NOT in columns
    want = (
        read_table(src, columns=cols, row_filter=expr)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    got = read_table(
        avrof, columns=cols, row_filter=expr, filter_columns=["lang"]
    ).to_pandas()
    got = got.astype(want.dtypes).sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_read_table_union_schema_evolution(ray_session, tmp_path):
    """Union-by-name over three generations in three formats: int32→int64
    promotion, null-fill of columns absent from a generation, projection
    intersected per path, and a KeyError for a column no path stores."""
    import pyarrow as pa
    import pyarrow.feather as feather
    import pyarrow.parquet as pq
    import pytest as _pytest

    from sanskrit_ocr_ray.sources.tables import read_table_union

    g1 = pa.table(
        {"doc_id": pa.array([1, 2], pa.int32()), "text": ["a", "b"]}
    )
    g2 = pa.table(
        {"doc_id": pa.array([3], pa.int64()), "lang": ["sa"]}
    )
    g3 = pa.table(
        {"doc_id": pa.array([4], pa.int64()), "text": ["d"], "lang": ["en"]}
    )
    p1 = str(tmp_path / "g1.parquet")
    p2 = str(tmp_path / "g2.feather")
    p3 = str(tmp_path / "g3.parquet")
    pq.write_table(g1, p1)
    feather.write_feather(g2, p2)
    pq.write_table(g3, p3)

    out = (
        read_table_union([p1, p2, p3])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert str(out["doc_id"].dtype) == "int64"  # promoted
    assert out["text"].tolist() == ["a", "b", None, "d"]
    assert out["lang"].tolist() == [None, None, "sa", "en"]

    proj = read_table_union([p1, p2, p3], columns=["doc_id", "lang"]).to_pandas()
    assert sorted(proj.columns) == ["doc_id", "lang"]

    with _pytest.raises(KeyError):
        read_table_union([p1, p2], columns=["nope"])


def test_read_table_lance_projection_includes_filter_columns(
    ray_session, monkeypatch
):
    """The Lance arm has no expression pushdown, so with a row_filter
    whose column is outside ``columns`` + a filter_columns hint, the
    storage-side projection must WIDEN to include the filter column and
    the post-filter select must trim it back off."""
    import pyarrow.dataset as pds
    import ray.data as rd

    from sanskrit_ocr_ray.sources import tables

    src = "/root/testdata/sf0.001/documents.parquet"
    seen = {}

    def fake_read_lance(path, columns=None):
        seen["columns"] = columns
        return rd.read_parquet(src, columns=columns)

    monkeypatch.setattr(tables, "lance_available", lambda: True)
    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)

    cols = ["doc_id", "n_chars"]
    expr = ~pds.field("lang").isin(["sa"])
    got = tables.read_table(
        "/tmp/fake_docs.lance",
        columns=cols,
        row_filter=expr,
        filter_columns=["lang"],
    ).to_pandas()
    # storage asked for the union, output trimmed to the projection
    assert seen["columns"] == ["doc_id", "n_chars", "lang"]
    assert sorted(got.columns) == sorted(cols)
    want = tables.read_table(src, columns=cols, row_filter=expr).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # without the hint the arm must stay correct via a full-width read
    seen.clear()
    got2 = tables.read_table(
        "/tmp/fake_docs.lance", columns=cols, row_filter=expr
    ).to_pandas()
    assert seen["columns"] is None
    assert sorted(got2.columns) == sorted(cols)
    assert got2.sort_values("doc_id").reset_index(drop=True).equals(b)


def test_write_table_lance_capability_error(ray_session, tmp_path, monkeypatch):
    """The .lance write arm raises a clear capability error without
    pylance, dispatches to Dataset.write_lance with it, and the default
    arm streams Parquet that read_table round-trips."""
    import ray.data as rd

    from sanskrit_ocr_ray.sources import tables

    ds = rd.range(8)
    if not tables.lance_available():
        with pytest.raises(ImportError, match="pylance"):
            tables.write_table(ds, str(tmp_path / "t.lance"))
    # mocked-available: the call must route to write_lance
    monkeypatch.setattr(tables, "lance_available", lambda: True)
    calls = {}
    monkeypatch.setattr(
        type(ds),
        "write_lance",
        lambda self, path, **kw: calls.setdefault("path", path),
        raising=False,
    )
    out = tables.write_table(ds, str(tmp_path / "t.lance"))
    assert calls["path"] == out

    # parquet arm round-trips through read_table
    pdir = str(tmp_path / "t_parquet")
    tables.write_table(ds, pdir)
    back = tables.read_table(pdir).to_pandas()
    assert sorted(back["id"].tolist()) == list(range(8))
