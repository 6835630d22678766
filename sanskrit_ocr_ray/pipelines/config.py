"""User-extension surface: config dataclass + pipeline assembly.

Mirrors the reference's params-dict-with-defaults idiom (render_text.py's
``DEFAULT_PARAMS`` merged with user overrides, render_text.py:11-45,
414-419) as a typed dataclass, and SURVEY.md §2.10's design: each pipeline
stage is a named callable registered in a plain list that
:func:`build_pipeline` assembles. Users extend the engine by inserting
``(name, fn)`` entries — a stage is any ``(pa.Table) -> pa.Table``
callable (stateless task) or callable class (actor-pool stage).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class ExtractConfig:
    """All knobs of the flagship extraction pipeline, with defaults.

    ``replace(cfg, **overrides)`` is the merge idiom (the typed analogue
    of ``{**DEFAULT_PARAMS, **params}``).
    """

    # normalization (M1/M2/M12 semantics; stages/normalize.py)
    keep_class: str = "ऀ-ॿ "
    nfc: bool = True
    max_chars: int | None = None
    boilerplate_min_docs: int | None = None

    # media / recognition
    page_batch_size: int = 64
    recognizer_concurrency: int | None = None  # None → sized to cluster
    media_ref_embeds_doc_id: bool = True

    # partitioning / checkpointing
    n_partitions: int = 8
    wave_size: int = 4
    reassembly_buckets: int = 256

    # extra user stages appended between normalize and reassembly:
    # list of (name, callable) over flat span-row tables
    extra_span_stages: tuple = field(default_factory=tuple)


DEFAULT_CONFIG = ExtractConfig()


def with_overrides(**overrides) -> ExtractConfig:
    """The params-merge idiom: defaults + user overrides."""
    return replace(DEFAULT_CONFIG, **overrides)


def build_pipeline(config: ExtractConfig = DEFAULT_CONFIG):
    """Assemble the extraction pipeline from the stage registry.

    Returns ``run(docs_ds, media_ds) -> Dataset``. The registry is a plain
    list of named stages so user code can inspect/extend it; extra span
    stages from the config are spliced in order.
    """
    from .extract import extract_dataset

    def run(docs_ds, media_ds):
        return extract_dataset(
            docs_ds,
            media_ds,
            recognizer_concurrency=config.recognizer_concurrency,
            page_batch_size=config.page_batch_size,
            media_ref_embeds_doc_id=config.media_ref_embeds_doc_id,
            boilerplate_min_docs=config.boilerplate_min_docs,
            extra_span_stages=tuple(config.extra_span_stages),
        )

    return run


#: the named stage registry (inspection/extension surface; SURVEY.md §2.10)
STAGES: list[tuple[str, str]] = [
    ("explode_normalize", "sanskrit_ocr_ray.stages.explode.explode_normalize_batch"),
    ("strip_boilerplate", "sanskrit_ocr_ray.stages.normalize.strip_boilerplate"),
    ("binarize_deskew", "sanskrit_ocr_ray.stages.image.binarize_deskew_batch"),
    ("recognize", "sanskrit_ocr_ray.stages.recognize.GlyphRecognizer"),
    ("rec_to_span_rows", "sanskrit_ocr_ray.stages.recognize.rec_to_span_rows"),
    ("reassemble", "sanskrit_ocr_ray.stages.reassemble.rebuild_bucket"),
]
