"""Web-document extraction: HTML strip / main-content / DOM spans /
layout reading order (stages/webdoc.py)."""

import numpy as np
import pyarrow as pa

from sanskrit_ocr_ray.stages.webdoc import (
    html_spans_batch,
    layout_scatter_batch,
    main_content_batch,
    reading_order,
    reading_order_bucket,
    strip_html_batch,
    synth_html_batch,
)


def _docs(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def _pages(texts):
    return synth_html_batch(_docs(texts))


def test_strip_removes_tags_style_and_entities():
    out = strip_html_batch(_pages(["alpha beta gamma delta"])).to_pandas()
    s = out.text_stripped[0]
    assert "<" not in s and ">" not in s
    assert "margin" not in s  # style block dropped, not just de-tagged
    assert "&amp;" not in s and "&copy;" not in s
    assert "Terms & Conditions" in s  # entity decoded, content kept
    assert "alpha beta gamma delta" in s.replace("  ", " ")
    assert s == s.strip() and "  " not in s  # squeezed + trimmed


def test_main_content_drops_boilerplate_keeps_paragraphs():
    text = "word " * 20  # 100 chars → both halves pass the length rule
    out = main_content_batch(_pages([text.strip()])).to_pandas()
    assert out.n_blocks[0] == 5  # nav, 2×<p>, share, footer
    assert out.n_kept[0] == 2  # only the content paragraphs survive
    m = out.main_text[0]
    assert "Home" not in m and "Tweet" not in m and "Terms" not in m
    assert m.replace(" ", "") == text.replace(" ", "")


def test_main_content_rules_are_independent():
    # short content paragraph: dropped by LENGTH despite zero link density;
    # the footer is long enough but link-DENSE — both rules must fire
    out = main_content_batch(_pages(["tiny text here"])).to_pandas()
    assert out.n_kept[0] == 0
    assert out.main_text[0] == ""


def test_html_spans_interleave_in_document_order():
    out = html_spans_batch(_pages(["one two three four"])).to_pandas()
    assert out.pos.tolist() == [0, 1, 2]
    assert out.kind.tolist() == ["text", "image", "text"]
    assert out.media_ref.tolist() == ["", "media/0.png", ""]
    # the synth splits the text mid-word at len//2; concatenation restores it
    assert "".join(out.text) == "one two three four"


def test_layout_scatter_is_scrambled_and_rebuild_roundtrips():
    texts = [" ".join(f"w{i}" for i in range(200)), "a b c"]
    toks = layout_scatter_batch(_docs(texts)).to_pandas()
    d0 = toks[toks.doc_id == 0]
    # storage order must NOT be reading order (the op has to earn it)
    assert d0.token.tolist() != [f"w{i}" for i in range(200)]
    assert d0.page.max() == 2  # 200 tokens / 80 per page
    rebuilt = reading_order_bucket(toks).sort_values("doc_id")
    assert rebuilt.text_rebuilt.tolist() == [texts[0], "a b c"]


def test_reading_order_distributed_matches_local(ray_session):
    import ray.data as rd

    texts = [" ".join(f"d{d}t{i}" for i in range(90 + 7 * d)) for d in range(12)]
    ds = rd.from_arrow(_docs(texts)).map_batches(
        layout_scatter_batch, batch_format="pyarrow"
    )
    out = reading_order(ds, n_buckets=4).to_pandas().sort_values("doc_id")
    assert out.text_rebuilt.tolist() == texts


def test_layout_jitter_stays_within_recoverable_bounds():
    toks = layout_scatter_batch(_docs([" ".join("x" * 1 for _ in range(160))]))
    x = toks["x"].to_numpy()
    y = toks["y"].to_numpy()
    # column separation: no x may cross the 300 px column boundary band
    assert not np.any((x > 258 + 3) & (x < 300 + 10 - 3))
    # line quantization: every y within ±2 of a 12 px line center
    assert np.all(np.abs((y - 20) - np.round((y - 20) / 12) * 12) <= 2)


def test_extract_doc_links_census(ray_session):
    """Internal /doc/<id> hrefs are counted per target across batches;
    external hrefs and the home link never match the internal regex."""
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.webdoc import (
        extract_doc_links,
        synth_link_html_batch,
    )

    ids = list(range(20))
    ds = (
        rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
        .repartition(4)
        .map_batches(synth_link_html_batch, batch_format="pyarrow")
    )
    out = extract_doc_links(ds, n_buckets=4).to_pandas()
    got = dict(zip(out["dst_doc"], out["n_inlinks"]))
    exp = {}
    for d in ids:
        for dst in ((7 * d + 1) % 10000, (13 * d + 5) % 10000):
            exp[dst] = exp.get(dst, 0) + 1
    assert got == exp
    # every fifth page has an external link; none leak into the census
    assert sum(got.values()) == 2 * len(ids)
