"""Extension surface: config dataclass + build_pipeline + user stages."""

import pyarrow as pa
import pyarrow.compute as pc


def test_with_overrides_merge_idiom():
    from sanskrit_ocr_ray.pipelines.config import DEFAULT_CONFIG, with_overrides

    cfg = with_overrides(page_batch_size=8, boilerplate_min_docs=2)
    assert cfg.page_batch_size == 8
    assert cfg.boilerplate_min_docs == 2
    assert cfg.keep_class == DEFAULT_CONFIG.keep_class  # defaults survive


def test_build_pipeline_with_user_stage(ray_session, fixture_dir):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.config import build_pipeline, with_overrides

    def drop_short_text_spans(batch: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.not_equal(batch["kind"], "text"),
            pc.greater(pc.utf8_length(batch["text"]), 5),
        )
        return batch.filter(keep)

    run = build_pipeline(
        with_overrides(extra_span_stages=(("drop_short", drop_short_text_spans),))
    )
    docs = rd.read_parquet(f"{fixture_dir}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fixture_dir}/media.parquet")
    out = run(docs, media).to_pandas()
    assert len(out) > 0
    # user stage applied: no short text spans survive
    for seq in out.seq:
        for s in seq:
            if s["kind"] == "text":
                assert len(s["text"]) > 5


def test_stage_registry_paths_resolve():
    import importlib

    from sanskrit_ocr_ray.pipelines.config import STAGES

    for name, path in STAGES:
        mod, attr = path.rsplit(".", 1)
        assert hasattr(importlib.import_module(mod), attr), (name, path)


def test_normalizer_max_chars():
    import numpy as np

    from sanskrit_ocr_ray.stages.normalize import make_normalizer

    fn = make_normalizer("a-z ", lower=True, max_chars=5)
    assert fn(np.array(["abcdef ghij"], dtype=object))[0] == "abcde"
    assert fn(np.array(["ab cd ef"], dtype=object))[0] == "ab cd"
