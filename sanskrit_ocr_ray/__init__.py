"""sanskrit_ocr_ray — a Ray-Data-native document-extraction engine.

A brand-new engine (not a port) with the data-processing capabilities of
KhoomeiK/sanskrit-ocr (reference snapshot at /root/reference): it processes
columnar tables of interleaved text+media documents
(doc_id, spans list<struct<kind,text,media_ref,offset>>), decodes and
preprocesses page-image media spans (Sauvola binarization, deskew,
line/akshara segmentation) in zero-copy Arrow ``map_batches`` stages,
recognizes page text with a stateful actor-pool stage, normalizes Devanagari
text (Unicode NFC + block filtering, reference semantics
``datagen/h5_to_parquet.py:17-21``), and reassembles per-document span
sequences with a single ``groupby(doc_id)`` shuffle — plus the corpus-level
operations a large-scale training-data pipeline needs (exact/near dedup,
similarity search, language ID, quality scoring, token counting,
fingerprinting).
"""

__version__ = "0.1.0"


def _register_for_ray() -> None:
    """Ship this package's code to Ray workers by value.

    The engine is used straight from a repo checkout (no pip install, no
    runtime_env in the sandbox), so worker processes may not have the repo
    on ``sys.path``. Registering every submodule with Ray's cloudpickle
    makes map_batches UDFs self-contained: functions/classes serialize by
    value instead of by module reference.
    """
    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray always present in this env
        return
    import importlib
    import sys

    submodules = [
        "util",
        "schema",
        "glyphs",
        "synth",
        "stages.image",
        "stages.geometry",
        "stages.normalize",
        "stages.explode",
        "stages.recognize",
        "stages.reassemble",
        "stages.dedup",
        "stages.text_analysis",
        "stages.similarity",
        "stages.png",
        "stages.jpeg",
        "stages.wav",
        "stages.multimodal",
        "stages.relational",
        "stages.corpus",
        "stages.hygiene",
        "stages.sketch",
        "stages.profile",
        "stages.webdoc",
        "pipelines.extract",
        "pipelines.config",
        "sources.text",
        "sources.tables",
        "sources.backgrounds",
        "state.manifest",
    ]
    for name in submodules:
        try:
            importlib.import_module(f"{__name__}.{name}")
        except ImportError:
            continue
        cloudpickle.register_pickle_by_value(sys.modules[f"{__name__}.{name}"])
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_for_ray()
