"""Chunked corpus reader, prompt templating, boilerplate strip,
fallback media_ref join path."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_read_chunked_passages_wraps(ray_session, tmp_path):
    from sanskrit_ocr_ray.sources.text import DANDA_END, DANDA_SEP, read_chunked_passages

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("l0\nl1\nl2\n")
    out = (
        read_chunked_passages(str(corpus), chunk_size=2, n_chunks=3)
        .to_pandas()
        .sort_values("chunk_id")
    )
    # 3 chunks × 2 lines over a 3-line file → wrap-around like
    # generate_dataset.py:13-18
    assert out.passage.tolist() == [
        f"l0{DANDA_SEP}l1{DANDA_END}",
        f"l2{DANDA_SEP}l0{DANDA_END}",
        f"l1{DANDA_SEP}l2{DANDA_END}",
    ]


def _naive_chunks(lines, chunk_size, n_chunks):
    """Reference semantics: readline loop w/ EOF wrap
    (generate_dataset.py:7-19,30)."""
    from sanskrit_ocr_ray.sources.text import DANDA_END, DANDA_SEP

    out = []
    for c in range(n_chunks):
        chunk = [lines[(c * chunk_size + j) % len(lines)] for j in range(chunk_size)]
        out.append(DANDA_SEP.join(chunk) + DANDA_END)
    return out


def test_read_chunked_passages_streaming_parity(ray_session, tmp_path):
    """Tiny range_bytes force every line to span a worker-range boundary;
    empty lines and an unterminated trailing line must survive (the
    reference's readline() keeps both)."""
    import random

    from sanskrit_ocr_ray.sources.text import read_chunked_passages

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(1, 17)
        lines = []
        for _ in range(n):
            k = rng.randint(0, 9)
            lines.append("".join(rng.choice("अabइ ") for _ in range(k)))
        trailing_nl = trial % 2 == 0
        body = "\n".join(lines) + ("\n" if trailing_nl else "")
        if not trailing_nl and lines[-1] == "":
            lines = lines[:-1]  # "a\n" + "" is just "a\n": no trailing line
            if not lines:
                continue
        corpus = tmp_path / f"c{trial}.txt"
        corpus.write_text(body, encoding="utf-8")
        chunk_size = rng.randint(1, 5)
        n_chunks = rng.randint(1, 2 * n)
        got = (
            read_chunked_passages(
                str(corpus), chunk_size, n_chunks, range_bytes=rng.choice([3, 5, 1 << 20])
            )
            .to_pandas()
            .sort_values("chunk_id")
        )
        assert got.chunk_id.tolist() == list(range(n_chunks))
        assert got.passage.tolist() == _naive_chunks(lines, chunk_size, n_chunks)


def test_read_chunked_passages_empty_raises(ray_session, tmp_path):
    from sanskrit_ocr_ray.sources.text import read_chunked_passages

    corpus = tmp_path / "empty.txt"
    corpus.write_text("")
    with pytest.raises(ValueError):
        read_chunked_passages(str(corpus))


def test_template_prompts():
    from sanskrit_ocr_ray.sources.text import template_prompts

    t = pa.table({"text": ["hello"]})
    out = template_prompts(t, template="T: {text}!")
    assert out["prompt"][0].as_py() == "T: hello!"


def test_strip_boilerplate(ray_session):
    import ray.data as rd

    from sanskrit_ocr_ray.stages.normalize import strip_boilerplate

    rows = [{"doc_id": f"d{i}", "text": "COMMON FOOTER"} for i in range(5)]
    rows += [{"doc_id": f"d{i}", "text": f"unique {i}"} for i in range(5)]
    out = strip_boilerplate(rd.from_items(rows), min_docs=3).to_pandas()
    assert "COMMON FOOTER" not in set(out.text)
    assert len(out) == 5  # unique texts survive


def test_extract_two_shuffle_join_path(ray_session, fixture_dir):
    """media_ref-join fallback produces the same output as the embed path."""
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_dataset

    docs = rd.read_parquet(f"{fixture_dir}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fixture_dir}/media.parquet")
    out = extract_dataset(
        docs, media, media_ref_embeds_doc_id=False
    ).to_pandas()
    golden = pq.read_table(os.path.join(fixture_dir, "golden.parquet")).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    golden = golden.sort_values("doc_id").reset_index(drop=True)
    assert list(out.doc_id) == list(golden.doc_id)
    for i in range(len(golden)):
        a = [(d["kind"], d["text"], d["media_ref"]) for d in out.seq[i]]
        b = [(d["kind"], d["text"], d["media_ref"]) for d in golden.seq[i]]
        assert a == b, golden.doc_id[i]


def test_extract_with_boilerplate_strip(ray_session, fixture_dir):
    """Enabling the filter at a high threshold is a no-op on the fixture."""
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_dataset

    docs = rd.read_parquet(f"{fixture_dir}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fixture_dir}/media.parquet")
    out = extract_dataset(docs, media, boilerplate_min_docs=9999).to_pandas()
    golden = pq.read_table(os.path.join(fixture_dir, "golden.parquet"))
    assert len(out) == golden.num_rows


def test_read_csv_permissive_skips_and_reports(ray_session, tmp_path):
    """A malformed line (wrong column count) must not kill the read:
    permissive read returns the good rows; csv_scan_report accounts for
    the dropped ones per file."""
    from sanskrit_ocr_ray.sources.tables import (
        csv_scan_report,
        read_csv_permissive,
    )

    good = tmp_path / "good.csv"
    good.write_text("a,b\n1,x\n2,y\n")
    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,x\n2,y,EXTRA,COLS\n3,z\nonly_one_field_oops,q,r\n")

    ds = read_csv_permissive(str(bad))
    rows = sorted(r["a"] for r in ds.take_all())
    assert rows == [1, 3]  # the two malformed lines are skipped

    rep = (
        csv_scan_report([str(good), str(bad)])
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    by = {os.path.basename(p): (int(n), int(m))
          for p, n, m in zip(rep["path"], rep["n_rows"], rep["n_malformed"])}
    assert by == {"good.csv": (2, 0), "bad.csv": (2, 2)}
