"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Exact-match discipline (why the queries look the way they do):
- numeric outputs are int64 (counts, ``floor(x*100+0.5)`` cents, scaled
  ratios) or hex strings — never raw floats;
- every hash is md5-derived so DuckDB reproduces it exactly
  (``('0x'||substr(md5(x),1,16))::UBIGINT`` ≡ ``util.md5_u64``);
- top-k orders carry explicit deterministic tie-breaks;
- every query has a DuckDB oracle: the extraction queries
  compare against the fixture's golden tables by absolute path, the IVF
  query is pinned to its exact-degenerate config, the Karp-Rabin hash
  folds code points in HUGEINT, and LSH clustering is reproduced with a
  recursive-CTE transitive closure.

The extraction queries run over a deterministic synthetic interleaved-docs
corpus (BASELINE.json ``input_hint`` shape), synthesized once per scale
into /tmp and cached — the driver's TPC-H-ish tables have no spans/media
payloads, so the engine's own fixture factory provides them (FIXTURES.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Scratch/fixture root. Node-local /tmp is correct for the single-node
# sandbox; on a multi-node cluster set SXRAY_SCRATCH_ROOT to a shared
# filesystem (NFS/FSx) so workers on other nodes can read fixture and
# bucketed-layout paths written by the driver.
_SCRATCH_ROOT = os.environ.get("SXRAY_SCRATCH_ROOT", "/tmp")
_FIXTURE_CACHE = os.path.join(_SCRATCH_ROOT, "sxray_fixtures")


def _scratch_dir(kind: str, sf_dir: str) -> str:
    """Per-(input, process) scratch dir for side-effect state (IVM views,
    bucketed layouts). Keyed by a hash of the ABSOLUTE input path (two
    fixtures sharing a basename never collide) plus the driver pid (two
    concurrent runs never rmtree each other's state)."""
    from sanskrit_ocr_ray.util import md5_hex16

    ap = os.path.abspath(sf_dir)
    tag = f"{os.path.basename(ap)}-{md5_hex16(ap)[:12]}-{os.getpid()}"
    return os.path.join(_SCRATCH_ROOT, f"sxray_{kind}", tag)

#: synthetic interleaved-docs scale per sf dir
_N_DOCS = {"sf0.001": 60, "sf0.01": 200, "sf0.1": 600}


def _tbl(sf_dir: str, name: str, columns=None, row_filter=None):
    from sanskrit_ocr_ray.sources.tables import read_table

    # Lance-or-Parquet dispatch (sources/tables.py): the driver's testdata
    # is Parquet; a .lance dataset at the same path reads identically
    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if os.path.isdir(lance_path):
        return read_table(lance_path, columns=columns, row_filter=row_filter)
    return read_table(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, row_filter=row_filter
    )


def _pdf(sf_dir: str, name: str, columns=None):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns).to_pandas()


# ---------------------------------------------------------------------------
# extraction flagship (rows-only vs oracle; golden equality is pytest's job)
# ---------------------------------------------------------------------------


def _fixture_for(sf_dir: str) -> str:
    from sanskrit_ocr_ray.synth import FIXTURE_VERSION, write_fixture_local

    tag = os.path.basename(os.path.normpath(sf_dir))
    n_docs = _N_DOCS.get(tag, 60)
    # cache key includes the synth version so code changes invalidate
    # stale fixtures/goldens instead of silently reusing them
    out = os.path.join(_FIXTURE_CACHE, f"{tag}-{n_docs}-v{FIXTURE_VERSION}")
    if not os.path.exists(os.path.join(out, "golden.parquet")):
        write_fixture_local(out, n_docs, seed=42, n_partitions=4)
    return out


def _extract_flat(sf_dir: str):
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.extract import extract_flat, tune_read_context

    tune_read_context()
    fx = _fixture_for(sf_dir)
    docs = rd.read_parquet(f"{fx}/docs.parquet").drop_columns(["part"])
    media = rd.read_parquet(f"{fx}/media.parquet")
    return extract_flat(docs, media)


def _frame_checksums(sf_dir: str):
    """Video frame sampling over deterministic raw8 multi-frame payloads:
    synth → binary slice → per-sampled-frame integer checksum."""
    from sanskrit_ocr_ray.stages.multimodal import sample_frames, synth_video_batch

    vids = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_video_batch, batch_format="pyarrow"
    )
    return sample_frames(vids, stride=2)


def _video_scene_cuts(sf_dir: str):
    """Shot-boundary detection over the three-container video payloads
    (AVI/DIB, animated GIF, raw8): exact integer consecutive-frame
    absolute diffs + a threshold gate; shuffle-free."""
    from sanskrit_ocr_ray.stages.multimodal import synth_video_batch, video_scene_cuts

    vids = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_video_batch, batch_format="pyarrow"
    )
    return video_scene_cuts(vids, threshold=40000)


def _audio_autocorr(sf_dir: str):
    """Lag autocorrelation (pitch/periodicity feature) over the same
    four-codec audio payloads as audio_energy — exact int64 lag dots,
    shuffle-free."""
    from sanskrit_ocr_ray.stages.multimodal import audio_autocorr, synth_pcm16_batch

    aud = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_pcm16_batch, batch_format="pyarrow"
    )
    return audio_autocorr(aud, lags=(1, 8, 64))


def _audio_energy(sf_dir: str):
    """Windowed audio energy over deterministic audio payloads — raw
    s16le, RIFF/WAVE PCM16, G.711 µ-law (doc_id%8==2, stateless integer
    recurrence) and IMA ADPCM (doc_id%8==6, STATEFUL predictor/step
    recurrences the oracle replays with a recursive CTE) → integer
    sum-of-squares per 256-sample window."""
    from sanskrit_ocr_ray.stages.multimodal import audio_energy, synth_pcm16_batch

    aud = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_pcm16_batch, batch_format="pyarrow"
    )
    return audio_energy(aud, window=256)


def _span_kind_stats(sf_dir: str):
    """Per-kind span counts straight off the input_hint interleaved-docs
    schema (doc_id, spans list<struct<kind,text,media_ref,offset>>) —
    zero-copy Arrow list flatten, per-batch partials, tiny groupby."""
    import pyarrow as pa
    import ray.data as rd

    from ray.data.aggregate import Sum

    fx = _fixture_for(sf_dir)
    docs = rd.read_parquet(f"{fx}/docs.parquet").drop_columns(["part"])

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        kinds = spans.flatten().field("kind")
        vc = kinds.value_counts()
        return pa.table(
            {
                "kind": vc.field("values"),
                "n_spans": pa.compute.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("n_spans", alias_name="n_spans"))
    )


def _media_span_positions(sf_dir: str):
    """Layout analytics over the interleaved-docs payload: WHERE in a
    document do media spans sit? Each media span's ordinal position
    per-mille (1000·idx // n_spans, doc-local) bands into deciles →
    (decile, n_media_spans). Zero-copy Arrow list flatten + parent
    indices, segment arithmetic per batch, 10-cell groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pcc
    import ray.data as rd
    from ray.data.aggregate import Sum

    fx = _fixture_for(sf_dir)
    docs = rd.read_parquet(f"{fx}/docs.parquet").drop_columns(["part"])

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        parent = pcc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        L = len(parent)
        empty = pa.table(
            {
                "decile": pa.array([], type=pa.int64()),
                "n_media_spans": pa.array([], type=pa.int64()),
            }
        )
        if L == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
        seg_len = np.diff(np.r_[starts, L])
        idx = np.arange(L, dtype=np.int64) - np.repeat(starts, seg_len)
        n_spans = np.repeat(seg_len.astype(np.int64), seg_len)
        is_media = pcc.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
        if not is_media.any():
            return empty
        dec = (1000 * idx[is_media] // n_spans[is_media]) // 100
        vals, counts = np.unique(dec, return_counts=True)
        return pa.table(
            {
                "decile": pa.array(vals.astype(np.int64)),
                "n_media_spans": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("n_media_spans", alias_name="n_media_spans"))
    )


def _multimodal_features(sf_dir: str):
    """FeatureExtractor actor pool over the fixture's media pages recast as
    generic multimodal payload rows (schema/plumbing test; rows-only)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    # imported HERE (driver side) so `recast` closes over the symbols —
    # workers can't re-import the package by name (it ships by value)
    from sanskrit_ocr_ray.stages.bmp import bmp_encode
    from sanskrit_ocr_ray.stages.gif import gif_encode
    from sanskrit_ocr_ray.stages.jpeg import jpeg_encode
    from sanskrit_ocr_ray.stages.multimodal import FeatureExtractor
    from sanskrit_ocr_ray.stages.png import png_encode
    from sanskrit_ocr_ray.stages.tiff import tiff_encode
    from sanskrit_ocr_ray.util import md5_u64

    fx = _fixture_for(sf_dir)

    def recast(batch: pa.Table) -> pa.Table:
        # a sixth of the pages (by md5(media_ref) mod 6 — deterministic)
        # travel as REAL PNG payloads, a sixth as REAL JPEG — half of
        # those progressive SOF2, half baseline SOF0 (lossy — fine: the
        # oracle checks 16 features + no errors, not feature values) —
        # a sixth as REAL GIF87a (LZW, lossless for 8-bit gray), a sixth
        # as REAL baseline TIFF (half PackBits, half uncompressed;
        # lossless), a sixth as REAL BMP (palettized BI_RGB, lossless)
        # and the rest stay raw8. All of them decode through the same
        # pure-Python codecs the FeatureExtractor uses.
        n = batch.num_rows
        refs = batch["media_ref"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        pixels = batch["pixels"].to_pylist()
        types, payloads = [], []
        for r, w, h, p in zip(refs, widths, heights, pixels):
            sel = md5_u64(r) % 6
            if sel == 0:
                img = np.frombuffer(p, np.uint8, w * h).reshape(h, w)
                types.append("image/png")
                payloads.append(png_encode(img, level=1))
            elif sel == 1:
                img = np.frombuffer(p, np.uint8, w * h).reshape(h, w)
                types.append("image/jpeg")
                prog = (md5_u64(r) // 3) % 2 == 0
                payloads.append(jpeg_encode(img, quality=85, progressive=prog))
            elif sel == 2:
                img = np.frombuffer(p, np.uint8, w * h).reshape(h, w)
                types.append("image/gif")
                payloads.append(gif_encode(img))
            elif sel == 3:
                img = np.frombuffer(p, np.uint8, w * h).reshape(h, w)
                types.append("image/tiff")
                comp = "packbits" if (md5_u64(r) // 3) % 2 == 0 else "none"
                payloads.append(tiff_encode(img, compression=comp))
            elif sel == 4:
                img = np.frombuffer(p, np.uint8, w * h).reshape(h, w)
                types.append("image/bmp")
                payloads.append(bmp_encode(img))
            else:
                types.append("image/raw8")
                payloads.append(p)
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "media_type": pa.array(types),
                "width": batch["width"],
                "height": batch["height"],
                "sample_rate": pa.array([0] * n, type=pa.int32()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    def summarize(batch: pa.Table) -> pa.Table:
        feats = batch["features"].to_pylist()
        errs = batch["error"].to_pylist()
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "n_features": pa.array(
                    [len(f) if f is not None else 0 for f in feats], type=pa.int64()
                ),
                "had_error": pa.array(
                    [1 if e else 0 for e in errs], type=pa.int64()
                ),
            }
        )

    return (
        rd.read_parquet(f"{fx}/media.parquet")
        .map_batches(recast, batch_format="pyarrow")
        .map_batches(
            FeatureExtractor, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
        )
        .map_batches(summarize, batch_format="pyarrow")
    )


def _quarantine_summary(sf_dir: str):
    """Quarantine-count lineage (VERDICT r4 item 8): plant a
    deterministic unsupported-codec class (md5(media_ref) % 5 == 0 →
    media_type 'video/x-test'), run the FeatureExtractor actor pool,
    and aggregate its per-row error column into (error, n) counts via
    stages/multimodal.quarantine_summary — the summary a 100-TB run
    reports instead of burying failures row by row."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sanskrit_ocr_ray.stages.multimodal import (
        FeatureExtractor,
        quarantine_summary,
    )
    from sanskrit_ocr_ray.util import md5_u64_many

    fx = _fixture_for(sf_dir)

    def recast(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = md5_u64_many([str(r) for r in batch["media_ref"].to_pylist()])
        bad = (h % np.uint64(5)) == 0
        types = np.where(bad, "video/x-test", "image/raw8")
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "media_type": pa.array(list(types), type=pa.string()),
                "width": batch["width"],
                "height": batch["height"],
                "sample_rate": pa.array([0] * n, type=pa.int32()),
                "payload": pa.array(
                    batch["pixels"].to_pylist(), type=pa.binary()
                ),
            }
        )

    feat = (
        rd.read_parquet(f"{fx}/media.parquet")
        .map_batches(recast, batch_format="pyarrow")
        .map_batches(
            FeatureExtractor, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
        )
    )
    return quarantine_summary(feat)


# ---------------------------------------------------------------------------
# documents-table operators
# ---------------------------------------------------------------------------


def _clean_text(sf_dir: str):
    from sanskrit_ocr_ray.stages.normalize import normalize_column

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: normalize_column(
            b, "text", out="clean", keep_class="a-z ", lower=True, drop_empty=True
        ).select(["doc_id", "clean"]),
        batch_format="pyarrow",
    )


def _dedup_exact(sf_dir: str):
    from sanskrit_ocr_ray.stages.dedup import exact_dedup

    return exact_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _dup_cluster_size_hist(sf_dir: str):
    """Exact-dup cluster-size histogram (stages/dedup
    .dup_cluster_size_hist): one bounded fp-bucket shuffle, per-bucket
    exact size histograms, tiny driver fold."""
    from sanskrit_ocr_ray.stages.dedup import dup_cluster_size_hist

    return dup_cluster_size_hist(_tbl(sf_dir, "documents", ["text"]))


def _salient_terms_by_source(sf_dir: str):
    """Group-level TF-IDF: top-5 characteristic terms per source
    (stages/hygiene.salient_terms_by_group): two bounded bucket
    shuffles (term-keyed score, group-keyed rank)."""
    from sanskrit_ocr_ray.stages.hygiene import salient_terms_by_group

    return salient_terms_by_group(
        _tbl(sf_dir, "documents", ["source", "text"]), k=5
    )


def _dup_rate_by_source(sf_dir: str):
    """Per-source duplicate-rate analytics (stages/dedup.dup_rate_by_group):
    texts reduce to md5 fingerprints map-side, one bounded fp-bucket
    shuffle, tiny (source, n_docs, n_dup) partials fold on the driver."""
    from sanskrit_ocr_ray.stages.dedup import dup_rate_by_group

    return dup_rate_by_group(_tbl(sf_dir, "documents", ["source", "text"]))


def _token_count(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import token_count_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow"
    )


def _lang_id(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import lang_id_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow"
    )


def _lang_confusion(sf_dir: str):
    """Label-vs-prediction confusion matrix for the language-ID
    heuristic (stages/text_analysis.lang_confusion): shuffle-free
    per-batch Arrow cross-tab partials, driver folds ≤ |langs|² cells."""
    from sanskrit_ocr_ray.stages.text_analysis import lang_confusion

    return lang_confusion(_tbl(sf_dir, "documents", ["text", "lang"]))


def _oov_rate_by_lang(sf_dir: str):
    """Per-language OOV per-mille under the induced vocabulary
    (stages/corpus.oov_rate_by_lang): one vocab census shuffle, then a
    shuffle-free broadcast index_in scoring pass."""
    from sanskrit_ocr_ray.stages.corpus import oov_rate_by_lang

    return oov_rate_by_lang(_tbl(sf_dir, "documents", ["text", "lang"]))


def _window_cooccurrence(sf_dir: str):
    """Top-20 skip-gram co-occurrences within a 5-token window
    (stages/corpus.window_cooccurrence_topk): shifted-slice pair
    explode, one bounded (x,y)-bucket shuffle, per-bucket top-k."""
    from sanskrit_ocr_ray.stages.corpus import window_cooccurrence_topk

    return window_cooccurrence_topk(
        _tbl(sf_dir, "documents", ["text"]), window=5, k=20
    )


def _vocab_coverage(sf_dir: str):
    """Zipf head-coverage curve (stages/corpus.vocab_coverage): one
    bounded token census shuffle, per-bucket top-max(k) + total
    partials, driver folds B·k candidates."""
    from sanskrit_ocr_ray.stages.corpus import vocab_coverage

    return vocab_coverage(_tbl(sf_dir, "documents", ["text"]), ks=(10, 100, 1000))


def _char_class_profile(sf_dir: str):
    """Per-doc character-class per-milles (stages/text_analysis
    .char_class_profile_batch): four Arrow RE2 kernels, shuffle-free."""
    from sanskrit_ocr_ray.stages.text_analysis import char_class_profile_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        char_class_profile_batch, batch_format="pyarrow"
    )


def _quality(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import quality_score_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pyarrow"
    )


def _fingerprint(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import fingerprint_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def _kr_fingerprint(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import rolling_fingerprint_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        rolling_fingerprint_batch, batch_format="pyarrow"
    )


def _token_gini(sf_dir: str):
    """Per-doc lexical concentration: Gini impurity of the token
    histogram, 10^6·(n²−Σc²)//n² — the rational stand-in for token
    entropy (template/spam pages score near 0). Shuffle-free map
    (stages/text_analysis.token_gini_batch)."""
    from sanskrit_ocr_ray.stages.text_analysis import token_gini_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_gini_batch, batch_format="pyarrow"
    )


def _winnow_fingerprints(sf_dir: str):
    """Winnowing (MOSS) local fingerprints: k-shingle hashes → sliding
    w-window minima, leftmost ties — guarantees any shared token run of
    ≥ w+k-1 tokens shares a fingerprint while keeping ~1/w of shingles.
    Shuffle-free map (stages/text_analysis.winnow_batch)."""
    from sanskrit_ocr_ray.stages.text_analysis import winnow_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        winnow_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# training-corpus assembly operators (stages/corpus.py)
# ---------------------------------------------------------------------------


def _train_val_split(sf_dir: str):
    from sanskrit_ocr_ray.stages.corpus import train_val_split

    return train_val_split(
        _tbl(sf_dir, "documents", ["doc_id"]), key="doc_id", val_permille=100
    )


def _redact_pii(sf_dir: str):
    from sanskrit_ocr_ray.stages.corpus import redact_pii

    return redact_pii(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _stratified_sample(sf_dir: str):
    from sanskrit_ocr_ray.stages.corpus import stratified_sample

    return stratified_sample(
        _tbl(sf_dir, "documents", ["doc_id", "lang"]), group_col="lang", k=5
    )


def _pack_sequences(sf_dir: str):
    from sanskrit_ocr_ray.stages.corpus import pack_sequences

    return pack_sequences(_tbl(sf_dir, "documents", ["doc_id", "text"]), budget=256)


def _corpus_mix(sf_dir: str):
    from sanskrit_ocr_ray.stages.corpus import corpus_mix

    return corpus_mix(
        [
            ("docs", _tbl(sf_dir, "documents", ["doc_id", "text"]), "doc_id", "text"),
            ("events", _tbl(sf_dir, "events", ["event_id", "props"]), "event_id", "props"),
        ],
        permille={"docs": 700, "events": 300},
    )


def _kmv_distinct(sf_dir: str):
    """KMV distinct-count sketch over 3-gram shingles — deterministic
    estimator, exactly reproduced by the oracle."""
    from sanskrit_ocr_ray.stages.sketch import kmv_distinct

    return kmv_distinct(_tbl(sf_dir, "documents", ["text"]), k=256, ngram=3)


def _kmv_jaccard(sf_dir: str):
    """Sketch-based train/val shingle-set Jaccard (KMV set operation,
    Beyer et al.) — the cheap split-contamination diagnostic; exact
    function of the md5 hash order, so the oracle matches bit-for-bit."""
    from sanskrit_ocr_ray.stages.sketch import kmv_jaccard

    return kmv_jaccard(
        _tbl(sf_dir, "documents", ["doc_id", "text"]), k=256, ngram=3
    )


def _hll_registers(sf_dir: str):
    """HyperLogLog register table (p=6, 64 buckets) over distinct
    3-gram shingles — the mergeable-sketch partial pattern with an
    integer-exact oracle gate (registers, not the float estimate)."""
    from sanskrit_ocr_ray.stages.sketch import hll_registers

    return hll_registers(_tbl(sf_dir, "documents", ["text"]), p=6, ngram=3)


def _bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (4 merge steps): per-step pair-census
    shuffle + distributed sort/limit(1) argmax; greedy merge semantics
    pinned to SQL replace on the 2-space representation so the unrolled
    CTE oracle replays the loop exactly."""
    from sanskrit_ocr_ray.stages.corpus import bpe_merges

    return bpe_merges(_tbl(sf_dir, "documents", ["text"]), n_merges=4)


def _image_dhash_pairs(sf_dir: str):
    """Image near-duplicate detection: deterministic near-dup image
    groups (shared gradient field, per-doc constant shift) round-trip
    through the REAL lossless codecs (PNG/GIF/TIFF/BMP by md5 route),
    decode → 64-bit dHash → banded hamming pairs (pigeonhole-exact for
    distance ≤ 6). The oracle replays the 72-point grid from the synth
    formula and does the quadratic scan the banding avoids."""
    import numpy as np

    from sanskrit_ocr_ray.stages.dedup import hamming64_pairs
    from sanskrit_ocr_ray.stages.multimodal import (
        image_dhash,
        synth_neardup_image_batch,
    )

    imgs = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_neardup_image_batch, batch_format="pyarrow"
    )
    return hamming64_pairs(
        image_dhash(imgs), max_hamming=6, id_dtype=np.int64
    )


def _fk_integrity(sf_dir: str):
    """Referential-integrity report across six TPC-H FK relations —
    the pre-join validation gate: per relation, child rows / distinct
    keys / orphan rows via pre-aggregated bucketed membership."""
    import pandas as pd

    from sanskrit_ocr_ray.stages.profile import fk_orphans

    rels = [
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    frames = []
    for name, child, ck, parent, pk in rels:
        r = fk_orphans(
            _tbl(sf_dir, child, [ck]),
            _tbl(sf_dir, parent, [pk]),
            child_key=ck,
            parent_key=pk,
        )
        r.insert(0, "relation", name)
        frames.append(r)
    return pd.concat(frames, ignore_index=True)


def _merge_scd1_docs(sf_dir: str):
    """SCD1 MERGE / CDC compaction: apply a deterministic change stream
    (upserts for doc_id%7, higher-version deletes for doc_id%11, inserts
    at doc_id+10^6 for doc_id%13) to the documents table, latest-wins —
    one bounded-bucket shuffle, vectorized per-bucket collapse."""
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import merge_scd1

    base = _tbl(sf_dir, "documents", ["doc_id", "lang"])

    def chg(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        up = ids[ids % 7 == 0]
        de = ids[ids % 11 == 0]
        ins = ids[ids % 13 == 0] + 1_000_000
        return pa.table(
            {
                "doc_id": pa.array(
                    [*up.tolist(), *de.tolist(), *ins.tolist()], pa.int64()
                ),
                "ver": pa.array([1] * len(up) + [2] * len(de) + [1] * len(ins)),
                "op": pa.array(
                    ["upsert"] * len(up) + ["delete"] * len(de) + ["upsert"] * len(ins)
                ),
                "lang": pa.array(
                    ["v1"] * len(up) + [None] * len(de) + ["new"] * len(ins),
                    pa.string(),
                ),
            }
        )

    changes = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        chg, batch_format="pyarrow"
    )
    return merge_scd1(base, changes, key="doc_id", payload_cols=["lang"])


def _shard_assign(sf_dir: str):
    """Training-shard assignment: rank docs by (md5(doc_id), doc_id)
    WITHOUT a global sort (hash-range bucket histogram → driver prefix
    sums → per-bucket local ranks) and cut into 64-doc shards."""
    from sanskrit_ocr_ray.stages.corpus import shard_assign

    return shard_assign(
        _tbl(sf_dir, "documents", ["doc_id"]), shard_size=64, n_buckets=256
    )


def _kmeans_lloyd(sf_dir: str):
    """Distributed Lloyd k-means (k=8, 3 assignment passes) over the
    embeddings table — iterative-algorithm family with an integer-exact
    contract (quantized vectors, floor-division centroid updates,
    lowest-cluster tie rule), so the unrolled-CTE oracle replays every
    iteration assignment-for-assignment."""
    from sanskrit_ocr_ray.stages.similarity import kmeans_lloyd

    return kmeans_lloyd(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), k=8, iters=3, q=1000
    )


def _zone_map_prune(sf_dir: str):
    """Zone-map stats + partition pruning over a ship-month layout: per
    month-partition of lineitem, (row count, min/max ship-day, min/max
    partkey) — the per-file skipping stats a Delta/Iceberg/Lance scan
    consults — plus the prune verdict for the range predicate
    l_shipdate ∈ [1995-03-01, 1995-09-30] (partitions whose day-range
    misses it entirely are never opened). One shuffle-free keyed pass;
    the stats table is #partitions rows."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import zone_map_prune

    lo = int(np.datetime64("1995-03-01", "D").astype(np.int64))
    hi = int(np.datetime64("1995-09-30", "D").astype(np.int64))
    ds = _tbl(sf_dir, "lineitem", ["l_shipdate", "l_partkey"])

    def project(batch: pa.Table) -> pa.Table:
        t = batch["l_shipdate"].to_numpy()  # datetime64[us]
        return pa.table(
            {
                "part": pa.array(t.astype("datetime64[M]").astype(np.int64)),
                "x": pa.array(t.astype("datetime64[D]").astype(np.int64)),
                "y": batch["l_partkey"],
            }
        )

    return zone_map_prune(
        ds.map_batches(project, batch_format="pyarrow"),
        "part", "x", "y", lo=lo, hi=hi,
    )


def _embedding_pq(sf_dir: str):
    """Product-quantization codes (Jégou et al. PQ): 4 subspaces × 16
    dims, k=4 centroids each, 2 Lloyd passes per subspace — every
    subspace trains in the SAME streaming passes (one m·k-row mergeable
    partial per batch, centroids broadcast via ray.put), then one
    shuffle-free pass emits per-vector codes + total squared integer
    quantization error. The oracle unrolls the per-subspace Lloyd
    recurrence four times and joins the final assignments."""
    from sanskrit_ocr_ray.stages.similarity import pq_codes

    return pq_codes(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]),
        m=4, k=4, iters=2, q=1000,
    )


def _audience_overlap(sf_dir: str):
    """Exact distinct-user overlap between every pair of event types
    (segment INTERSECT matrix) — one user-bucket shuffle, per-user kind
    sets expand to pairs with the basket kernel, bucket-additive
    counts, no audience set ever materialized."""
    from sanskrit_ocr_ray.stages.relational import audience_overlap

    return audience_overlap(_tbl(sf_dir, "events", ["user_id", "event_type"]))


def _partkey_skew_histogram(sf_dir: str):
    """Counts-of-counts join-skew diagnosis for l_partkey: how many
    distinct parts appear in exactly k lineitems. The per-key census
    never leaves its hash bucket — only the tiny frequency histogram
    ships — the stat a planner consults before salting a hot key."""
    from sanskrit_ocr_ray.stages.relational import key_count_histogram

    return key_count_histogram(
        _tbl(sf_dir, "lineitem", ["l_partkey"]), "l_partkey"
    )


def _user_running_distinct(sf_dir: str):
    """Per-user running distinct event-type count (novelty breadth) —
    a window SQL can't express (no COUNT(DISTINCT) OVER): one
    user-bucket shuffle, first-occurrence flag + per-user cumsum; the
    oracle resorts to a quadratic self-join."""
    from sanskrit_ocr_ray.stages.relational import running_distinct_by_user

    return running_distinct_by_user(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    )


def _trimmed_mean_by_type(sf_dir: str):
    """Robust aggregate: per-event-type 10%-trimmed mean of value cents
    (drop floor(n/10) order stats each side, integer floor-mean of the
    rest) — computed from a (group, value) histogram whose cardinality
    is bounded by the value domain, two bounded shuffles."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import trimmed_mean_by_group

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"event_type": batch["event_type"], "value_c": pa.array(c)}
        )

    ds = _tbl(sf_dir, "events", ["event_type", "value"]).map_batches(
        cents, batch_format="pyarrow"
    )
    return trimmed_mean_by_group(ds, trim_pm=100)


def _cusum_flags(sf_dir: str):
    """Per-user one-sided CUSUM change-point flags (k=80.00,
    h=300.00 cents): the streaming level-shift monitor as an exact
    integer recurrence — one user-bucket shuffle + step scan; the
    oracle replays the recurrence with a recursive CTE."""
    from sanskrit_ocr_ray.stages.relational import cusum_flags

    return cusum_flags(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    )


def _hll_users_by_type(sf_dir: str):
    """Per-event-type HLL register sketches of distinct users (the
    dashboard shape: one mergeable 64-register sketch per group, all
    built in one streaming pass). Output is the integer registers, so
    the oracle replays bucket/rho bit-for-bit."""
    from sanskrit_ocr_ray.stages.sketch import hll_registers_by_group

    return hll_registers_by_group(
        _tbl(sf_dir, "events", ["event_type", "user_id"]), p=6
    )


def _user_rolling_median(sf_dir: str):
    """Per-user rolling MEDIAN over the last 4 events (order-statistic
    window, ×2-integer midpoint) — one user-bucket shuffle, per-bucket
    lag-matrix sort vectorized across all users."""
    from sanskrit_ocr_ray.stages.relational import rolling_median_by_user

    return rolling_median_by_user(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    )


def _impute_values(sf_dir: str):
    """Missing-value repair: value cents NULLed on a deterministic mask
    (event_id % 13 == 0), then imputed with the per-event-type integer
    floor-mean of the surviving values. Two streaming passes: tiny
    per-type (sum, n) partials folded and broadcast, then a
    shuffle-free vectorized fill."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import impute_group_mean

    ds = _tbl(sf_dir, "events", ["event_id", "event_type", "value"])

    def mask(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        vc = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "value_c": pa.array(vc, mask=(eid % 13 == 0)),
            }
        )

    return impute_group_mean(ds.map_batches(mask, batch_format="pyarrow"))


def _ppjoin_pairs(sf_dir: str):
    """Set-similarity join with prefix filtering (PPJoin): doc pairs
    with 4-gram-set Jaccard ≥ 0.5. Only each doc's rarest
    |d|−ceil(t·|d|)+1 shingles generate candidates (completeness
    guaranteed by the prefix property), with a length filter before the
    exact integer verify — the scale technique that makes similarity
    joins feasible where all-shared-shingle expansion would blow up."""
    from sanskrit_ocr_ray.stages.dedup import ppjoin_pairs

    return ppjoin_pairs(
        _tbl(sf_dir, "documents", ["doc_id", "text"]),
        n=4, threshold_pm=500,
    )


def _cohort_retention(sf_dir: str):
    """Weekly cohort retention triangle: users grouped by first-active
    week, distinct-user counts at each week offset. ONE user-bucketed
    shuffle (distinct (user, week) partials; cohorts derived per bucket
    — additive because a user lives in exactly one bucket), tiny
    (cohort, offset) fold."""
    from sanskrit_ocr_ray.stages.relational import cohort_retention

    return cohort_retention(_tbl(sf_dir, "events", ["user_id", "ts"]))


def _knn_pq_adc(sf_dir: str):
    """PQ asymmetric-distance (ADC) top-5 search for 8 query vectors:
    base vectors live ONLY as 4 PQ codes; each query precomputes an
    integer LUT of subvector↔centroid squared distances, and search is
    4 lookups + adds per vector (broadcast LUTs, shuffle-free scan,
    tiny per-query reduce) — the billion-vector ANN serving shape. The
    oracle joins the unrolled per-subspace Lloyd CTEs into the explicit
    Σ_s ‖q_s − cent_code_s‖² and replays the (dist, id) rank order."""
    from sanskrit_ocr_ray.stages.similarity import pq_adc_topk

    return pq_adc_topk(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]),
        query_ids=list(range(8)),
        m=4, k=4, iters=2, q=1000, k_top=5,
    )


def _purchase_error_counts_full(sf_dir: str):
    """FULL OUTER join: per-user counts of high-value 'purchase' vs
    'error' events (value > 150, predicate pushed into the parquet
    scan) — unmatched users on EITHER side survive with a zero on the
    other side's count. Exercises hash_join(how='full'): both sides
    co-partition by the same key hash, so a key's rows meet (or miss
    each other) inside exactly one bucket; the outer merge runs per
    bucket and null counts backfill to integer zero."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pds
    from ray.data.aggregate import Sum

    from sanskrit_ocr_ray.stages.relational import hash_join

    def side(event_type: str, out: str):
        ds = _tbl(
            sf_dir,
            "events",
            ["user_id"],
            row_filter=(pds.field("event_type") == event_type)
            & (pds.field("value") > 150.0),
        )

        def partial(batch: pa.Table) -> pa.Table:
            u, c = np.unique(batch["user_id"].to_numpy(), return_counts=True)
            return pa.table(
                {"user_id": pa.array(u, pa.int64()), out: pa.array(c.astype(np.int64))}
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum(out, alias_name=out))
        )

    joined = hash_join(
        side("purchase", "n_purchase"),
        side("error", "n_error"),
        "user_id",
        how="full",
        n_buckets=8,
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "n_purchase": pc.fill_null(pc.cast(batch["n_purchase"], pa.int64()), 0),
                "n_error": pc.fill_null(pc.cast(batch["n_error"], pa.int64()), 0),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def _ivm_type_counts(sf_dir: str):
    """Incremental view maintenance (pipelines/ivm.py): the per-type
    count/sum view is MATERIALIZED over the base history (every day but
    the last), then the refresh folds ONLY the last day's delta into the
    stored view — the base is not re-read at refresh. The monoid merge
    makes the refreshed view bit-equal to the full recompute, which is
    exactly what the oracle runs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from sanskrit_ocr_ray.pipelines.ivm import materialize_agg, refresh_agg

    ev = _tbl(sf_dir, "events", ["event_type", "ts", "value"])
    day_us = 86_400_000_000
    max_ts = ev.max("ts")
    # empty events → no base/delta boundary: cut at 0 (everything is
    # delta; refresh_agg handles the fileless empty view)
    cut_us = (
        (int(pd.Timestamp(max_ts).value // 1000) // day_us) * day_us
        if max_ts is not None
        else 0
    )

    def prep(keep_base: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ts_us = pc.cast(
                pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()
            ).to_numpy()
            m = ts_us < cut_us if keep_base else ts_us >= cut_us
            cents = np.floor(
                batch["value"].to_numpy() * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": batch["event_type"].filter(pa.array(m)),
                    "cents": pa.array(cents[m]),
                }
            )

        return fn

    base = ev.map_batches(prep(True), batch_format="pyarrow")
    delta = ev.map_batches(prep(False), batch_format="pyarrow")
    view_dir = materialize_agg(
        base,
        _scratch_dir("ivm", sf_dir),
        key_col="event_type",
        cents_col="cents",
    )
    return refresh_agg(view_dir, delta, key_col="event_type", cents_col="cents")


def _bucketed_cust_orders(sf_dir: str):
    """Bucketed-table layout + ZERO-SHUFFLE co-partitioned join: write
    customer and orders ONCE into __bucket=<custkey % 16>/ directories
    (the Hive/Spark bucketed-table primitive, pipelines/bucketed.py),
    then join + aggregate per bucket — one task per bucket reads only
    its two matching directories; no shuffle operator in the plan at
    all. The groupby runs INSIDE the bucket task (a bucket holds every
    row of its keys), so join+aggregate costs zero exchanges — the
    persisted form of "pick one partitioning key and reuse it"."""
    import numpy as np

    from sanskrit_ocr_ray.pipelines.bucketed import bucketed_join, write_bucketed
    from sanskrit_ocr_ray.util import typed_empty

    base = _scratch_dir("bucketed", sf_dir)
    write_bucketed(
        _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        f"{base}/customer",
        key="c_custkey",
        n_buckets=16,
    )
    write_bucketed(
        _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        f"{base}/orders",
        key="o_custkey",
        n_buckets=16,
    )

    def combine(m):
        m = m.copy()
        m["total_c"] = np.floor(
            m["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        g = m.groupby(["c_custkey", "c_mktsegment"], as_index=False).agg(
            n_orders=("o_orderkey", "size"), sum_total_c=("total_c", "sum")
        )
        return g.astype({"n_orders": np.int64, "sum_total_c": np.int64})

    return bucketed_join(
        f"{base}/customer",
        f"{base}/orders",
        left_key="c_custkey",
        right_key="o_custkey",
        n_buckets=16,
        combine=combine,
        combine_empty=typed_empty(
            c_custkey=np.int64,
            c_mktsegment=object,
            n_orders=np.int64,
            sum_total_c=np.int64,
        ),
    )


def _compact_docs(sf_dir: str):
    """Storage-lifecycle OPTIMIZE: rewrite the fixture's partitioned
    docs table into ceil(n/16)-file partitions; the returned stats are
    computed by RE-READING the written files, so the oracle (the same
    aggregates over the original table) proves a durable lossless
    rewrite."""
    import ray.data as rd

    from sanskrit_ocr_ray.pipelines.compact import compact_table

    fx = _fixture_for(sf_dir)
    return compact_table(
        rd.read_parquet(f"{fx}/docs.parquet"),
        f"{fx}-compacted",
        part_col="part",
        target_rows=16,
        key_col="doc_id",
    )


def _embedding_outliers(sf_dir: str):
    """Integer-exact centroid-distance outlier flags (3-sigma rule on
    n-scaled squared distances): moments broadcast once, flag pass is a
    shuffle-free map."""
    from sanskrit_ocr_ray.stages.profile import embedding_outliers

    return embedding_outliers(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), q=100, k2=9
    )


def _typo_pairs(sf_dir: str):
    """Edit-distance-1 token pairs via FastSS deletion-neighborhood
    blocking, over the corpus vocabulary augmented with its 1-char-
    dropped tails (guarantees a non-trivial distance-1 structure)."""
    import pyarrow as _pa

    from sanskrit_ocr_ray.stages.dedup import typo_token_pairs

    def vocab(batch: _pa.Table) -> _pa.Table:
        toks = set()
        for t in batch["text"].to_pylist():
            for w in (t or "").split(" "):
                if w:
                    toks.add(w)
                    if len(w) >= 3:
                        toks.add(w[1:])
        return _pa.table({"token": _pa.array(sorted(toks), _pa.string())})

    ds = _tbl(sf_dir, "documents", ["text"]).map_batches(
        vocab, batch_format="pyarrow"
    )
    return typo_token_pairs(ds, column="token")


def _embedding_moments(sf_dir: str):
    """Per-dimension quantized-integer moments of the embedding column
    (whitening prereq) — mergeable per-batch partials, exact sums."""
    from sanskrit_ocr_ray.stages.profile import embedding_moments

    return embedding_moments(_tbl(sf_dir, "embeddings", ["embedding"]), q=1000)


def _srp_sketch(sf_dir: str):
    """Sign-random-projection cosine sketch: 32-bit signatures from
    deterministic md5-parity hyperplanes; 8 bytes/vector output."""
    from sanskrit_ocr_ray.stages.similarity import srp_sketch

    return srp_sketch(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), planes=32, q=1000
    )


def _embedding_covariance(sf_dir: str):
    """Cross-dimension covariance sufficient statistics (PCA/whitening
    prereq): one XᵀX Gram matmul per batch → d(d+1)/2 mergeable integer
    partial rows → tiny groupby fold."""
    from sanskrit_ocr_ray.stages.profile import embedding_covariance

    return embedding_covariance(_tbl(sf_dir, "embeddings", ["embedding"]), q=1000)


def _status_history(sf_dir: str):
    """SCD2/CDC history build: per-user event_type runs → validity
    intervals, user-bucketed with one vectorized run-collapse pass."""
    from sanskrit_ocr_ray.stages.relational import status_history

    return status_history(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    )


def _type_token_ratio(sf_dir: str):
    """Lexical-diversity TTR per document (1000·distinct//total tokens):
    hash-free factorized distinct (exact strings), one Arrow pass +
    lexsort + segmented change-count, shuffle-free."""
    from sanskrit_ocr_ray.stages.text_analysis import type_token_ratio_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        type_token_ratio_batch, batch_format="pyarrow"
    )


def _modal_event_per_user(sf_dir: str):
    """Per-user modal event type (count desc, type asc tie-break) — the
    exact per-key mode: per-batch (user,type) count partials, one
    bounded hash(user) shuffle, vectorized per-bucket argmax."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.dedup import bucketed_aggregate
    from sanskrit_ocr_ray.util import typed_empty

    ev = _tbl(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(["user_id", "event_type"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(
            agg.rename(columns={"size": "n"}), preserve_index=False
        ).replace_schema_metadata(None)

    empty = typed_empty(user_id=np.int64, modal_type=object, n=np.int64)

    def pick_mode(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        agg = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        agg = agg.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = agg.groupby("user_id", as_index=False).first()
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy(),
                "modal_type": top["event_type"].to_numpy(),
                "n": top["n"].to_numpy().astype(np.int64),
            }
        )

    return bucketed_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        pick_mode,
        n_buckets=64,
        empty=empty,
    )


def _user_type_concentration(sf_dir: str):
    """Per-user Simpson concentration of event types ×1e6 (floored):
    Σnᵢ²·10⁶ // N² over the user's type counts — 10⁶ = monoculture,
    →10⁶/k = uniform over k types; the behavioral-diversity signal
    (integer-exact, no entropy logs). Same bounded hash(user) shuffle
    as the modal-type query."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.dedup import bucketed_aggregate
    from sanskrit_ocr_ray.util import typed_empty

    ev = _tbl(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(["user_id", "event_type"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(
            agg.rename(columns={"size": "n"}), preserve_index=False
        ).replace_schema_metadata(None)

    empty = typed_empty(user_id=np.int64, n_events=np.int64, simpson_x1m=np.int64)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        agg = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        n = agg["n"].to_numpy().astype(np.int64)
        per = agg.assign(nn=n * n).groupby("user_id", as_index=False)[["n", "nn"]].sum()
        tot = per["n"].to_numpy().astype(np.int64)
        nn = per["nn"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": per["user_id"].to_numpy(),
                "n_events": tot,
                "simpson_x1m": 1_000_000 * nn // (tot * tot),
            }
        )

    return bucketed_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        fold,
        n_buckets=64,
        empty=empty,
    )


def _gini_by_type(sf_dir: str):
    """Per-event-type Gini inequality of value cents x1e6 (exact sorted
    form, no floats) — the distributional-skew audit a curation
    dashboard runs per domain/source."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import gini_by_group

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["event_type", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return gini_by_group(ds, "event_type", "value_c")


def _funnel_depths(sf_dir: str):
    """Funnel progression signup→view→click→purchase: non-contiguous
    ordered subsequence reach per user (greedy earliest match), counts
    per depth over the whole user population."""
    from sanskrit_ocr_ray.stages.relational import funnel_depths

    return funnel_depths(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        ["signup", "view", "click", "purchase"],
    )


def _kmv_set_ops(sf_dir: str):
    """KMV set-operation cardinalities (union/intersection/differences)
    for the train/val shingle sets from one union sketch pass."""
    from sanskrit_ocr_ray.stages.sketch import kmv_set_ops

    return kmv_set_ops(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _peak_concurrency(sf_dir: str):
    """Peak concurrently-active sessions (sweep-line max as a two-phase
    distributed prefix scan over day-range buckets)."""
    from sanskrit_ocr_ray.stages.relational import peak_concurrent_sessions

    return peak_concurrent_sessions(
        _tbl(sf_dir, "events", ["user_id", "ts"])
    )


def _status_as_of(sf_dir: str):
    """Temporal AS-OF snapshot over the SCD2 history: each user's status
    at the dataset-midpoint instant — validity-interval filter over
    status_history (from ≤ cut < to, open runs included), the
    point-in-time-join shape a warehouse runs against a type-2
    dimension. The cut is a deterministic one-pass min/max aggregate."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    from sanskrit_ocr_ray.stages.relational import status_history

    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    agg = ev.aggregate(Min("ts"), Max("ts"))
    lo, hi = agg["min(ts)"], agg["max(ts)"]
    if lo is None:
        import numpy as np

        from sanskrit_ocr_ray.util import typed_empty

        import ray.data as rd

        return rd.from_pandas(
            typed_empty(user_id=np.int64, status=object, valid_from_us=np.int64)
        )
    cut = (
        int(pd.Timestamp(lo).value // 1000) + int(pd.Timestamp(hi).value // 1000)
    ) // 2

    def at_cut(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less_equal(batch["valid_from_us"], cut),
            pc.or_(
                pc.equal(batch["valid_to_us"], -1),
                pc.greater(batch["valid_to_us"], cut),
            ),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "status": t["event_type"],
                "valid_from_us": t["valid_from_us"],
            }
        )

    return status_history(ev).map_batches(at_cut, batch_format="pyarrow")


def _basket_pairs(sf_dir: str):
    """Frequent co-ordered part pairs (market-basket support counting):
    basket-bucketed vectorized pair expansion + a pair-bucketed fold."""
    from sanskrit_ocr_ray.stages.basket import basket_pairs

    return basket_pairs(
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        basket_col="l_orderkey",
        item_col="l_partkey",
        minsup=2,
        max_basket=64,
    )


def _association_rules(sf_dir: str):
    """Apriori rule step over the basket-pair supports: both directions
    of every surviving pair with integer per-mille confidence and lift,
    all statistics over the same 2..64-item basket population. Item
    counts attach via bucketed hash_joins (never an item-dictionary
    broadcast); the basket total N rides a reserved sentinel key."""
    from sanskrit_ocr_ray.stages.basket import association_rules

    return association_rules(
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        basket_col="l_orderkey",
        item_col="l_partkey",
        minsup=2,
        max_basket=64,
    )


def _heavy_hitters(sf_dir: str):
    """Exact φ-heavy hitters (count·32 > N) via the candidate/verify
    two-pass — shuffle bounded by c·#batches, never the vocabulary."""
    from sanskrit_ocr_ray.stages.sketch import heavy_hitters

    return heavy_hitters(_tbl(sf_dir, "documents", ["text"]), c=32)


def _ngram_top(sf_dir: str):
    from sanskrit_ocr_ray.stages.corpus import ngram_top

    return ngram_top(_tbl(sf_dir, "documents", ["text"]), n=3, k=20)


def _split_docs(sf_dir: str, want_val: bool):
    """documents filtered to the train/val hash split side (the
    train_val_split convention: md5(doc_id) % 1000 < 100 → val)."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.util import md5_u64_many

    def keep(batch: pa.Table) -> pa.Table:
        h = md5_u64_many([str(v) for v in batch["doc_id"].to_pylist()])
        m = (h % np.uint64(1000)) < 100
        return batch.filter(pa.array(m if want_val else ~m))

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


def _contamination(sf_dir: str):
    """8-gram train→val contamination over the hash split."""
    from sanskrit_ocr_ray.stages.hygiene import contamination

    return contamination(
        _split_docs(sf_dir, want_val=False), _split_docs(sf_dir, want_val=True),
        ngram=8,
    )


def _decontaminate(sf_dir: str):
    """Training docs with zero leaked eval 8-grams (shippable corpus)."""
    from sanskrit_ocr_ray.stages.hygiene import decontaminate

    return decontaminate(
        _split_docs(sf_dir, want_val=False), _split_docs(sf_dir, want_val=True),
        ngram=8,
    )


def _priority_sample(sf_dir: str):
    """Weighted sampling without replacement (priority sampling)."""
    from sanskrit_ocr_ray.stages.corpus import priority_sample

    return priority_sample(
        _tbl(sf_dir, "documents", ["doc_id", "n_chars"]), k=50
    )


def _profile_documents(sf_dir: str):
    """ANALYZE-style one-pass column profile of the documents table."""
    from sanskrit_ocr_ray.stages.profile import profile_table

    return profile_table(
        _tbl(sf_dir, "documents"), ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _validate_documents(sf_dir: str):
    """Data-quality gate: per-rule violation counts over documents."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from sanskrit_ocr_ray.stages.profile import validate_rows

    rules = {
        "doc_id_nonneg": lambda t: _pc.greater_equal(t["doc_id"], 0),
        "lang_latin_script": lambda t: _pc.is_in(
            t["lang"], value_set=pa.array(["en", "de", "fr", "es"])
        ),
        "n_chars_matches_text": lambda t: _pc.equal(
            _pc.utf8_length(t["text"]), t["n_chars"]
        ),
        "text_nonempty": lambda t: _pc.greater(_pc.utf8_length(t["text"]), 0),
    }
    return validate_rows(_tbl(sf_dir, "documents"), rules)


def _salient_terms(sf_dir: str):
    from sanskrit_ocr_ray.stages.hygiene import salient_terms

    return salient_terms(_tbl(sf_dir, "documents", ["doc_id", "text"]), k=3)


def _keyword_search(sf_dir: str):
    from sanskrit_ocr_ray.stages.hygiene import keyword_search

    return keyword_search(
        _tbl(sf_dir, "documents", ["doc_id", "text"]), ["join", "hash"], k=10
    )


def _bm25_topk(sf_dir: str):
    """Integer-exact BM25 ranked retrieval (rational RSJ idf, permille
    avgdl — spec'd in stages/hygiene.bm25_topk): corpus-stats fold pass
    then broadcast-scalar scoring with per-batch top-k partials."""
    from sanskrit_ocr_ray.stages.hygiene import bm25_topk

    return bm25_topk(
        _tbl(sf_dir, "documents", ["doc_id", "text"]),
        ["join", "merge", "slow"],
        k=10,
    )


def _hybrid_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al.) of the
    BM25 lexical run and an integer-cosine dense run over the
    hashing-trick unigram embedding — rrf_x1m = Σ 10^6//(60+rank) over
    each run's top-20, ranks 0 when absent, doc_id ties. Both runs are
    shuffle-free scans with per-batch top-k partials; fusion touches
    ≤ 2·run_k driver rows (stages/hygiene.hybrid_rrf)."""
    from sanskrit_ocr_ray.stages.hygiene import hybrid_rrf

    return hybrid_rrf(
        _tbl(sf_dir, "documents", ["doc_id", "text"]),
        ["join", "merge", "slow"],
        k=10,
        run_k=20,
    )


def _repetition_scores(sf_dir: str):
    """Gopher-style intra-doc repetition per-mille (shuffle-free map)."""
    from sanskrit_ocr_ray.stages.text_analysis import repetition_scores_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        repetition_scores_batch, batch_format="pyarrow"
    )


def _latest_order_per_customer(sf_dir: str):
    """Latest-record-per-key dedup (the CDC/versioned-table compaction
    op): newest order per customer, ties broken by min order key —
    grouped_top_k with k=1 over epoch-integer dates."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from sanskrit_ocr_ray.stages.relational import grouped_top_k

    def epoch(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["o_orderdate"], pa.int64())
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_date_us": us,
            }
        )

    ds = _tbl(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"]).map_batches(
        epoch, batch_format="pyarrow", batch_size=None
    )
    return grouped_top_k(
        ds, group="o_custkey", order_col="o_date_us", id_col="o_orderkey", k=1
    )


def _table_checksum(sf_dir: str):
    """Order-independent corpus checksum (mod-2^64 sum of per-row md5
    hashes of doc_id||':'||text) — the cheap equality witness for
    verifying a 100-TB copy/migration without moving the data: per-batch
    partial sums, one tiny driver-side fold, no shuffle."""
    import pandas as pd
    import pyarrow as pa

    from sanskrit_ocr_ray.util import md5_u64

    M = 1 << 64

    def partial(batch: pa.Table) -> pa.Table:
        acc = 0
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            acc = (acc + md5_u64(f"{did}:{t or ''}")) % M
        return pa.table({"partial": pa.array([f"{acc:020d}"], type=pa.string())})

    parts = (
        _tbl(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    total = sum(int(p) for p in parts["partial"]) % M
    return pd.DataFrame({"checksum": [f"{total:016x}"]})


def _encode_documents(sf_dir: str):
    """Tokenizer application: encode docs to token-id sequences under
    the induced vocab (broadcast dictionary apply; OOV → -1)."""
    from sanskrit_ocr_ray.stages.corpus import encode_documents

    return encode_documents(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _pmi_collocations(sf_dir: str):
    """Top-20 bigram collocations by integer lift (exp-PMI ranking)."""
    from sanskrit_ocr_ray.stages.corpus import pmi_collocations

    return pmi_collocations(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _chunk_documents(sf_dir: str):
    """Token-window chunking (32-token windows, stride 24) — RAG/context
    chunk preparation; pure flat map, no shuffle."""
    from sanskrit_ocr_ray.stages.corpus import chunk_documents

    return chunk_documents(
        _tbl(sf_dir, "documents", ["doc_id", "text"]), chunk_tokens=32, stride=24
    )


def _quantiles_by_type(sf_dir: str):
    """Per-event-type exact value quantiles (histogram formulation)."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import grouped_quantiles_exact

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["event_type", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return grouped_quantiles_exact(ds, "event_type", "value_c")


def _kgram_dup_spans(sf_dir: str):
    """Exact duplicated-substring spans (Lee et al.-style): per-doc count
    of 8-token windows that recur anywhere in the corpus."""
    from sanskrit_ocr_ray.stages.dedup import kgram_dup_spans

    return kgram_dup_spans(_tbl(sf_dir, "documents", ["doc_id", "text"]), k=8)


def _vocab_build(sf_dir: str):
    """Frequency-ranked token vocabulary (min_count=5, deterministic ids)."""
    from sanskrit_ocr_ray.stages.corpus import vocab_build

    return vocab_build(_tbl(sf_dir, "documents", ["text"]), min_count=5)


def _customer_order_counts(sf_dir: str):
    """Left-outer join: every customer with their order count (0 kept)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.dedup import bucketed_aggregate
    from sanskrit_ocr_ray.stages.relational import hash_join
    from sanskrit_ocr_ray.util import typed_empty

    cust = _tbl(sf_dir, "customer", ["c_custkey"])
    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey"]),
        batch_format="pyarrow",
    )
    joined = hash_join(cust, orders, "c_custkey", how="left", n_buckets=16)

    empty = typed_empty(c_custkey=np.int64, n_orders=np.int64)

    def count_orders(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("c_custkey", as_index=False)["o_orderkey"].count()
        return out.rename(columns={"o_orderkey": "n_orders"}).astype(np.int64)

    return bucketed_aggregate(
        joined, ["c_custkey"], count_orders, n_buckets=16, empty=empty,
        coalesce_first=False,
    )


def _user_running_value(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import running_agg

    return running_agg(
        _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    )


def _user_rolling_value(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import rolling_agg

    return rolling_agg(
        _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        window_rows=7,
    )


def _funnel_counts(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import funnel_counts

    return funnel_counts(
        _tbl(sf_dir, "events", ["user_id", "ts", "event_type"]),
        ["view", "click", "purchase"],
    )


def _user_mode_event(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import grouped_mode

    return grouped_mode(_tbl(sf_dir, "events", ["user_id", "event_type"]))


def _doc_ttr(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import distinct_token_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        distinct_token_batch, batch_format="pyarrow"
    )


def _docs_lang_pivot(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import pivot_counts

    return pivot_counts(
        _tbl(sf_dir, "documents", ["source", "lang"]),
        row="source",
        col="lang",
        col_values=["de", "en", "es", "fr", "zh"],
    )


def _revenue_rollup(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import rollup_aggregate

    return rollup_aggregate(
        _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"]),
        keys=["l_returnflag", "l_linestatus"],
        value="l_extendedprice",
    )


def _revenue_cube(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import cube_aggregate

    return cube_aggregate(
        _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"]),
        keys=["l_returnflag", "l_linestatus"],
        value="l_extendedprice",
    )


_SNAPSHOT_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def _snap_new_split(sf_dir: str):
    """(snapshot, new-crawl) document Datasets with the source predicate
    PUSHED INTO the parquet scan (row-group pruning; the filter column
    never leaves storage) — not a post-read filter."""
    import pyarrow.dataset as _pds

    in_snap = _pds.field("source").isin(list(_SNAPSHOT_SOURCES))
    snap = _tbl(sf_dir, "documents", ["doc_id", "text"], row_filter=in_snap)
    new = _tbl(sf_dir, "documents", ["doc_id", "text"], row_filter=~in_snap)
    return snap, new


def _incremental_dedup(sf_dir: str):
    """New crawl (src5..src19) deduped against the snapshot (src0..src4)."""
    from sanskrit_ocr_ray.stages.hygiene import incremental_dedup

    snap, new = _snap_new_split(sf_dir)
    return incremental_dedup(new, snap)


def _bloom_new_docs(sf_dir: str):
    """Bloom pre-gate for incremental dedup: definitely-new crawl docs
    (deterministic md5 hash family → the false-positive set is exact)."""
    from sanskrit_ocr_ray.stages.hygiene import bloom_new_docs

    snap, new = _snap_new_split(sf_dir)
    return bloom_new_docs(new, snap)


def _rarity_score(sf_dir: str):
    """Unigram rarity (integer LM-negative-likelihood proxy) per doc."""
    from sanskrit_ocr_ray.stages.hygiene import rarity_score

    return rarity_score(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _token_chi2(sf_dir: str):
    """χ² token↔class feature selection: top-50 tokens whose PRESENCE
    is most associated with lang='en' (the filter-method vocabulary
    ranking before a classifier / contrastive quality filter). Integer
    score 10^6·N·(ad−bc)²//((a+b)(c+d)(a+c)(b+d)) in Python ints; one
    bounded token-bucket shuffle + per-bucket top-k, class totals a
    2-int scalar fold (stages/hygiene.token_chi2)."""
    from sanskrit_ocr_ray.stages.hygiene import token_chi2

    return token_chi2(
        _tbl(sf_dir, "documents", ["doc_id", "text", "lang"]),
        pos_lang="en",
        min_df=5,
        k=50,
    )


def _dedup_spans(sf_dir: str):
    """C4-style corpus-wide repeated-span removal (8-token spans, freq>=3)."""
    from sanskrit_ocr_ray.stages.hygiene import dedup_spans

    return dedup_spans(
        _tbl(sf_dir, "documents", ["doc_id", "text"]), span_tokens=8, min_count=3
    )


def _media_sniff(sf_dir: str):
    """Header-only media metadata (format, dims) — no pixel decode."""
    from sanskrit_ocr_ray.stages.multimodal import (
        sniff_media_batch,
        synth_image_batch,
    )

    return (
        _tbl(sf_dir, "documents", ["doc_id"])
        .map_batches(synth_image_batch, batch_format="pyarrow")
        .map_batches(sniff_media_batch, batch_format="pyarrow")
    )


def _debounce_events(sf_dir: str):
    """Per-user 6-hour debounce: kept-chain throttle over the event stream."""
    from sanskrit_ocr_ray.stages.relational import debounce_events

    return debounce_events(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id"]), window_s=21600
    )


def _lineitem_zorder(sf_dir: str):
    """Z-order clustering keys over (l_partkey, l_suppkey) + z-range shards."""
    from sanskrit_ocr_ray.stages.relational import zorder_keys

    return zorder_keys(
        _tbl(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        ),
        "l_partkey",
        "l_suppkey",
        id_cols=["l_orderkey", "l_linenumber"],
        bits=16,
        shard_bits=4,
    )


def _user_ewma(sf_dir: str):
    """Per-user integer EWMA (alpha=1/4, centi-value fixed point)."""
    from sanskrit_ocr_ray.stages.relational import ewma_by_user

    return ewma_by_user(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    )


def _lineitem_unpivot(sf_dir: str):
    """Wide-to-long melt of lineitem's three rate measures."""
    from sanskrit_ocr_ray.stages.relational import unpivot

    return unpivot(
        _tbl(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
        ),
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
    )


def _cms_registers(sf_dir: str):
    """Count-min sketch registers (4x256) over corpus token instances."""
    from sanskrit_ocr_ray.stages.sketch import cms_registers

    return cms_registers(_tbl(sf_dir, "documents", ["text"]), depth=4, width=256)


def _snm_pairs(sf_dir: str):
    """Sorted-neighborhood near-dup pairs (24-char key, window 4, J>=0.8)."""
    from sanskrit_ocr_ray.stages.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        _tbl(sf_dir, "documents", ["doc_id", "text"]),
        key_chars=24,
        window=4,
        threshold_pm=800,
    )


def _pii_rate_by_source(sf_dir: str):
    """Per-source PII governance rollup (stages/corpus
    .pii_stats_by_group): shuffle-free chained-RE2 counting + tiny
    per-batch group partials."""
    from sanskrit_ocr_ray.stages.corpus import pii_stats_by_group

    return pii_stats_by_group(_tbl(sf_dir, "documents", ["source", "text"]))


def _join_cardinality(sf_dir: str):
    """Exact |orders ⋈ lineitem| on orderkey without materializing the
    join (stages/relational.join_cardinality): per-side key counts, one
    bounded key-bucket shuffle, bigint-safe partial fold."""
    from sanskrit_ocr_ray.stages.relational import join_cardinality

    return join_cardinality(
        _tbl(sf_dir, "orders", ["o_orderkey"]),
        _tbl(sf_dir, "lineitem", ["l_orderkey"]),
        "o_orderkey",
        "l_orderkey",
    )


def _supplier_return_rates(sf_dir: str):
    """Vendor-reliability scorecard (stages/relational
    .supplier_return_rates): per-batch Arrow partials, one bounded
    suppkey-bucket shuffle, integer per-mille return rates."""
    from sanskrit_ocr_ray.stages.relational import supplier_return_rates

    return supplier_return_rates(
        _tbl(sf_dir, "lineitem", ["l_suppkey", "l_returnflag"])
    )


def _reorder_gap_quantiles(sf_dir: str):
    """Re-order latency quantiles (stages/relational
    .reorder_gap_quantiles): one custkey-bucket shuffle for adjacent
    gaps + the exact value-histogram quantile fold."""
    from sanskrit_ocr_ray.stages.relational import reorder_gap_quantiles

    return reorder_gap_quantiles(
        _tbl(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    )


def _rfm_segments(sf_dir: str):
    """RFM customer segmentation (stages/relational.rfm_segments):
    one custkey reduce, three exact-NTILE passes over the materialized
    per-customer base, two bucketed joins, tiny segment count."""
    from sanskrit_ocr_ray.stages.relational import rfm_segments

    return rfm_segments(
        _tbl(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
        n_tiles=5,
    )


def _value_ntile(sf_dir: str):
    """Exact NTILE(4) OVER (ORDER BY value, event_id) without a global sort."""
    from sanskrit_ocr_ray.stages.relational import ntile_assign

    return ntile_assign(
        _tbl(sf_dir, "events", ["event_id", "value"]), "value", n_tiles=4
    )


def _bigram_surprisal(sf_dir: str):
    """Bigram conditional-surprisal LM gate (integer CCNet-style score)."""
    from sanskrit_ocr_ray.stages.hygiene import bigram_surprisal

    return bigram_surprisal(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _value_quantiles_binned(sf_dir: str):
    """Binned quantile sketch over the continuous events.value column."""
    from sanskrit_ocr_ray.stages.relational import quantiles_binned

    return quantiles_binned(_tbl(sf_dir, "events", ["value"]), "value", scale=10)


def _user_active_time(sf_dir: str):
    """Union of per-user 5-min activity intervals (gaps-and-islands)."""
    from sanskrit_ocr_ray.stages.relational import interval_coverage

    return interval_coverage(_tbl(sf_dir, "events", ["user_id", "ts"]), dur_s=300)


def _asof_view_before_purchase(sf_dir: str):
    import pyarrow.compute as _pc

    from sanskrit_ocr_ray.stages.relational import asof_join

    import pyarrow.dataset as _pds

    # event_type predicates pushed into the parquet scan (row-group
    # pruning); the two sides are independent prunable reads
    cols = ["event_id", "ts", "user_id"]
    purchases = _tbl(
        sf_dir, "events", cols, row_filter=_pds.field("event_type") == "purchase"
    )
    views = _tbl(
        sf_dir, "events", cols, row_filter=_pds.field("event_type") == "view"
    )
    out = asof_join(purchases, views, by="user_id", on="ts")
    return out.map_batches(
        lambda t: t.rename_columns(["purchase_id", "user_id", "view_id", "gap_s"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# web-document main-content extraction (stages/webdoc.py): HTML boilerplate
# strip, DOM heuristics, layout reading order — the north rule's extraction
# parenthetical. Each query synthesizes a deterministic boilerplate-heavy
# page per document (pure SQL-expressible function of (doc_id, text),
# mirrored in _HTML_SYNTH_SQL below) and extracts from it.
# ---------------------------------------------------------------------------


def _html_pages(sf_dir: str):
    from sanskrit_ocr_ray.stages.webdoc import synth_html_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        synth_html_batch, batch_format="pyarrow"
    )


def _html_strip(sf_dir: str):
    from sanskrit_ocr_ray.stages.webdoc import strip_html_batch

    return _html_pages(sf_dir).map_batches(strip_html_batch, batch_format="pyarrow")


def _inlink_counts(sf_dir: str):
    """Link-graph census: parse internal /doc/<id> hrefs out of
    synthesized pages (doc-dependent outlinks; external links must not
    match) and count inlinks per target — the crawl-frontier signal.
    Shuffle-free regex extraction with per-batch partial counts, one
    bounded hash(dst) census shuffle."""
    from sanskrit_ocr_ray.stages.webdoc import (
        extract_doc_links,
        synth_link_html_batch,
    )

    pages = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_link_html_batch, batch_format="pyarrow"
    )
    return extract_doc_links(pages)


def _html_main(sf_dir: str):
    from sanskrit_ocr_ray.stages.webdoc import main_content_batch

    return _html_pages(sf_dir).map_batches(main_content_batch, batch_format="pyarrow")


def _html_spans(sf_dir: str):
    from sanskrit_ocr_ray.stages.webdoc import html_spans_batch

    return _html_pages(sf_dir).map_batches(html_spans_batch, batch_format="pyarrow")


def _layout_reading_order(sf_dir: str):
    from sanskrit_ocr_ray.stages.webdoc import layout_scatter_batch, reading_order

    toks = _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        layout_scatter_batch, batch_format="pyarrow"
    )
    return reading_order(toks)


def _views_before_purchase_1h(sf_dir: str):
    """Banded range join (custom operator): per purchase, count same-user
    views in the preceding hour."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from sanskrit_ocr_ray.stages.relational import range_join_count

    import pyarrow.dataset as _pds

    # event_type predicates pushed into the parquet scan (row-group
    # pruning); the two sides are independent prunable reads
    cols = ["event_id", "ts", "user_id"]
    purchases = _tbl(
        sf_dir, "events", cols, row_filter=_pds.field("event_type") == "purchase"
    )
    views = _tbl(
        sf_dir, "events", cols, row_filter=_pds.field("event_type") == "view"
    )
    out = range_join_count(
        purchases, views, by="user_id", on="ts", window_s=3600, out_col="n_views_1h"
    )
    return out.map_batches(
        lambda t: t.rename_columns(["purchase_id", "user_id", "n_views_1h"]),
        batch_format="pyarrow",
    )


def _customers_no_orders(sf_dir: str):
    """Distributed ANTI join: customers without any RECENT order (the
    right side is filtered at the read so the shuffle ships only
    qualifying keys)."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import hash_join

    cutoff = np.datetime64("2001-06-01")

    def recent_keys(batch: pa.Table) -> pa.Table:
        m = batch["o_orderdate"].to_numpy() >= cutoff
        return pa.table({"c_custkey": batch["o_custkey"].filter(pa.array(m))})

    customer = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _tbl(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        recent_keys, batch_format="pyarrow"
    )
    return hash_join(customer, orders, key="c_custkey", how="anti")


def _value_quantiles(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import quantiles_exact

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return quantiles_exact(ds, "value_c")


def _value_quantiles_cont(sf_dir: str):
    """ANSI PERCENTILE_CONT over value cents: linear interpolation
    between the two bracketing order stats, reported ×1000 so both
    sides compare in exact int64 (no float interpolation slack). Same
    mergeable-histogram shuffle as value_quantiles."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import quantiles_cont

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return quantiles_cont(ds, "value_c")


def _value_quantiles_hdr(sf_dir: str):
    """Deterministic mergeable quantile SKETCH (HDR-histogram shape,
    2^6 log-spaced sub-buckets per octave) — the continuous-data scale
    path where the exact O(#distinct) histogram of value_quantiles
    stops being small. Bucketing is a pure function of the value, so
    the sketch is merge-order-independent and the oracle reproduces the
    approximate answer EXACTLY; bounds: approx ≤ exact < approx·(1+2⁻⁶)."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import hdr_quantiles

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return hdr_quantiles(ds, "value_c", m_bits=6)


def _quantiles_hdr_by_type(sf_dir: str):
    """Per-group HDR quantile sketches (one tiny dense histogram per
    event_type riding a single bounded hash(group) shuffle) — the
    per-key mergeable-sketch pattern a 100 TB per-domain quality
    dashboard runs; merge-order independent, so exactly oracle-gated."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import hdr_quantiles_by_group

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["event_type", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return hdr_quantiles_by_group(ds, "event_type", "value_c", m_bits=6)


def _part_skyline(sf_dir: str):
    """Pareto skyline over parts — maximize p_size, minimize retail
    cents: the multi-criteria dominance filter (two-phase: vectorized
    per-batch local skylines prune to candidates, one tiny shuffle, one
    re-filter — dominance transitivity makes local-then-global exact)."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import skyline

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["p_retailprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "p_size": batch["p_size"],
                "price_c": pa.array(c),
            }
        )

    ds = _tbl(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return skyline(ds, maximize=["p_size"], minimize=["price_c"], keep=["p_partkey"])


def _value_trend_by_type(sf_dir: str):
    """Per-group OLS value trend (slope/intercept ×1e6, exact): the five
    sufficient statistics are int64 partials (x pre-scaled to HOURS so
    Σxy/Σx² cannot overflow), one bounded shuffle, Python-bigint closed
    form — mirrored bit-for-bit by a HUGEINT oracle with floor-division
    emulation (DuckDB // truncates toward zero; Python floors)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from sanskrit_ocr_ray.stages.relational import grouped_linreg

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "x_hours": pa.array(ts_us // 3_600_000_000),
                "cents": pa.array(c),
            }
        )

    ds = _tbl(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    return grouped_linreg(ds, "event_type", "x_hours", "cents")


def _top2_events_per_user(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import grouped_top_k

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "value_c": pa.array(c),
            }
        )

    ds = _tbl(sf_dir, "events", ["user_id", "event_id", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return grouped_top_k(
        ds, group="user_id", order_col="value_c", id_col="event_id", k=2
    )


def _simhash(sf_dir: str):
    from sanskrit_ocr_ray.stages.text_analysis import simhash_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


def _minhash_sig(sf_dir: str):
    from sanskrit_ocr_ray.stages.dedup import minhash_signatures_batch

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        minhash_signatures_batch, batch_format="pyarrow"
    )


def _minhash_lsh(sf_dir: str):
    from sanskrit_ocr_ray.stages.dedup import minhash_lsh_clusters

    return minhash_lsh_clusters(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _simhash_pairs(sf_dir: str):
    from sanskrit_ocr_ray.stages.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _ngram_pairs(sf_dir: str):
    from sanskrit_ocr_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _hourly_seasonality(sf_dir: str):
    """Traffic seasonality profile: (hour-of-day, event_type, n_events,
    total_cents) — the load-shape / anomaly-baseline aggregate. Hour
    extraction and the cents quantization are Arrow kernels; the
    groupby is 24·|types| cells (native Ray aggregate — bounded
    cardinality, no bucketed shuffle needed)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count, Sum

    ds = _tbl(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: _pa.Table) -> _pa.Table:
        hour = _pc.cast(_pc.hour(batch["ts"]), _pa.int64())
        cents = _pc.cast(
            _pc.floor(_pc.add(_pc.multiply(batch["value"], 100.0), 0.5)),
            _pa.int64(),
        )
        return _pa.table(
            {"hour": hour, "event_type": batch["event_type"], "cents": cents}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(
            Count(alias_name="n_events"), Sum("cents", alias_name="total_cents")
        )
    )


def _jaccard_band_hist(sf_dir: str):
    """Near-dup threshold-tuning curve: histogram of candidate pairs by
    Jaccard band (jacc_pm // 100) over the ngram_jaccard_pairs surface —
    the curve a curator reads before committing to a dedup threshold
    (how many pairs does each cut keep?). Composition: the bounded
    pair-discovery shuffle of stages/dedup.ngram_jaccard_pairs, then a
    10-cell banding groupby."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count

    from sanskrit_ocr_ray.stages.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_tbl(sf_dir, "documents", ["doc_id", "text"]))

    def band(batch: _pa.Table) -> _pa.Table:
        # integer divide (jacc_pm ≥ 0, so trunc == floor)
        b = _pc.cast(_pc.divide(batch["jacc_pm"], 100), _pa.int64())
        return _pa.table({"band": b})

    return (
        pairs.map_batches(band, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(alias_name="n_pairs"))
    )


def _containment_pairs(sf_dir: str):
    """Asymmetric near-dup pairs by max-containment
    |A∩B|/min(|A|,|B|) ≥ 0.15 over distinct 3-gram sets — catches
    subset/excerpt documents whose Jaccard is structurally tiny (a
    snippet inside a 100× longer page). Same bounded-shuffle candidate
    machinery as ngram_jaccard_pairs; only the verify predicate differs
    (stages/dedup.containment_pairs)."""
    from sanskrit_ocr_ray.stages.dedup import containment_pairs

    return containment_pairs(
        _tbl(sf_dir, "documents", ["doc_id", "text"]), threshold_pm=150
    )


# ---------------------------------------------------------------------------
# embeddings-table operators
# ---------------------------------------------------------------------------


def _docs_by_lang(sf_dir: str):
    """Style-histogram analogue (SURVEY.md A2): groupby + count."""
    from ray.data.aggregate import Count

    return (
        _tbl(sf_dir, "documents", ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def _corpus_stats(sf_dir: str):
    """Global corpus counters (SURVEY.md A1/A3): one-row totals via
    per-batch partials + a tiny final sum — never a driver-side loop."""
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.text_analysis import WS_TOKEN

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "n_docs": pa.array([len(texts)], type=pa.int64()),
                "total_chars": pa.array(
                    [sum(len(t or "") for t in texts)], type=pa.int64()
                ),
                "total_ws_tokens": pa.array(
                    [sum(len(WS_TOKEN.findall(t or "")) for t in texts)],
                    type=pa.int64(),
                ),
            }
        )

    parts = (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return parts.sum().to_frame().T.astype("int64")


def _knn5(sf_dir: str):
    from sanskrit_ocr_ray.stages.similarity import knn_brute

    return knn_brute(_tbl(sf_dir, "embeddings"), query_ids=list(range(10)), k=5)


def _knn_ivf(sf_dir: str):
    """IVF path pinned to its exact-degenerate config (nprobe == number of
    centroids ⇒ every inverted list is probed ⇒ results provably equal
    brute force), so the driver can hash-compare it against the same SQL
    oracle as knn_top5. The approximate configs (nprobe < n_centroids)
    are covered by pytest recall tests (tests/test_similarity.py)."""
    from sanskrit_ocr_ray.stages.similarity import knn_ivf

    return knn_ivf(
        _tbl(sf_dir, "embeddings"),
        query_ids=list(range(10)),
        k=5,
        n_centroids=8,
        nprobe=8,
    )


def _knn_lsh(sf_dir: str):
    """Hyperplane-LSH ANN pinned to its exact-degenerate config
    (n_planes = 0 ⇒ one bucket ⇒ provably equal brute force) so the
    driver hash-compares it against the same SQL oracle as knn_top5;
    approximate configs (n_planes > 0) are pytest recall-verified
    (tests/test_similarity.py)."""
    from sanskrit_ocr_ray.stages.similarity import knn_lsh

    return knn_lsh(
        _tbl(sf_dir, "embeddings"),
        query_ids=list(range(10)),
        k=5,
        n_planes=0,
    )


def _emb_dups(sf_dir: str):
    from sanskrit_ocr_ray.stages.similarity import embedding_dup_pairs

    return embedding_dup_pairs(_tbl(sf_dir, "embeddings"))


def _text_hash_dup_pairs(sf_dir: str):
    """Model-free semantic text dup pairs: hashed n-gram embeddings +
    integer-exact cosine-threshold predicate, blocked by lang."""
    from sanskrit_ocr_ray.stages.similarity import hashed_text_dup_pairs

    return hashed_text_dup_pairs(
        _tbl(sf_dir, "documents", ["doc_id", "text", "lang"])
    )


def _semantic_dedup(sf_dir: str):
    """SemDeDup-style survivors over embedding-cosine components."""
    from sanskrit_ocr_ray.stages.similarity import semantic_dedup

    return semantic_dedup(_tbl(sf_dir, "embeddings"))


def _nearest_centroid(sf_dir: str):
    from sanskrit_ocr_ray.stages.similarity import nearest_centroid

    return nearest_centroid(_tbl(sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# relational / events operators
# ---------------------------------------------------------------------------


def _q1(sf_dir: str):
    import datetime

    import pyarrow as pa
    import pyarrow.dataset as _pds

    from sanskrit_ocr_ray.stages.relational import q1_pricing

    # the date predicate is ALSO pushed into the scan (row-group pruning on
    # the biggest table); the stage re-applies it for standalone use
    cut = _pds.field("l_shipdate") <= pa.scalar(datetime.datetime(1998, 9, 2))
    return q1_pricing(
        _tbl(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
            row_filter=cut,
        )
    )


def _rev_nation(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import revenue_by_nation

    return revenue_by_nation(
        _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        _pdf(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _pdf(sf_dir, "nation", ["n_nationkey", "n_name"]),
    )


def _orders_by_month(sf_dir: str):
    """Calendar-month order series (count + revenue cents)."""
    from sanskrit_ocr_ray.stages.relational import monthly_rollup

    return monthly_rollup(_tbl(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))


def _rev_region(sf_dir: str):
    """4-table star join (lineitem ⋈ supplier ⋈ nation ⋈ region) via one
    composed driver-side dim map, broadcast once."""
    from sanskrit_ocr_ray.stages.relational import revenue_by_region

    return revenue_by_region(
        _tbl(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]),
        _pdf(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _pdf(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
        _pdf(sf_dir, "region", ["r_regionkey", "r_name"]),
    )


def _rev_brand(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import revenue_by_brand

    return revenue_by_brand(
        _tbl(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]),
        _pdf(sf_dir, "part", ["p_partkey", "p_brand"]),
    )


def _events_window(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import events_tumbling

    return events_tumbling(_tbl(sf_dir, "events", ["ts", "event_type", "value"]))


def _events_sliding(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import events_sliding

    return events_sliding(_tbl(sf_dir, "events", ["ts", "event_type", "value"]))


def _sessionize(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import sessionize

    return sessionize(_tbl(sf_dir, "events", ["user_id", "ts"]))


def _event_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event streams
    (stages/relational.event_transition_matrix): one user-bucket
    shuffle, vectorized adjacent-pair counts, integer per-mille rows."""
    from sanskrit_ocr_ray.stages.relational import event_transition_matrix

    return event_transition_matrix(
        _tbl(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    )


def _orders_above_avg(sf_dir: str):
    """Correlated-subquery decorrelation: orders whose total exceeds
    THEIR customer's average order total — the classic
    `WHERE x > (SELECT AVG(x) ... WHERE key = outer.key)` pattern,
    decorrelated into ONE hash(custkey) bucket shuffle with the group
    census and the filter inside the bucket; the integer predicate is
    the cross-multiplication cents·n > sum (no float mean)
    (stages/relational.rows_above_group_mean)."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import rows_above_group_mean

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "total_c": pa.array(c),
            }
        )

    ds = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        cents, batch_format="pyarrow"
    )
    return rows_above_group_mean(
        ds, key_col="o_custkey", id_col="o_orderkey", cents_col="total_c"
    )


def _session_attribution(sf_dir: str):
    """First-touch attribution: sessions attributed to their first
    event's type, per-channel conversion to 'purchase' (integer
    per-mille). One hash(user) bucket shuffle, per-bucket vectorized
    sessionize + partial counts, ≤ buckets×channels driver fold
    (stages/relational.session_attribution)."""
    from sanskrit_ocr_ray.stages.relational import session_attribution

    return session_attribution(
        _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    )


def _top_users(sf_dir: str):
    from sanskrit_ocr_ray.stages.relational import top_users_by_value

    return top_users_by_value(_tbl(sf_dir, "events", ["user_id", "value"]))


def _top_lineitems(sf_dir: str):
    """Global distributed sort + limit (Dataset.sort → range-partitioned
    shuffle), deterministic tie-break on (orderkey, linenumber)."""
    import numpy as np
    import pyarrow as pa

    ds = _tbl(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "price_c": pa.array(c),
            }
        )

    return (
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
        .sort(["price_c", "l_orderkey", "l_linenumber"], descending=[True, False, False])
        .limit(10)
    )


def _mktsegment_join(sf_dir: str):
    """Large⋈large partitioned hash join demo: orders ⋈ customer."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum
    from sanskrit_ocr_ray.stages.relational import _cents, hash_join

    customer = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    orders = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = hash_join(orders, customer, key="o_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"],
                "n_orders": np.int64(1),
                "revenue_c": _cents(df["o_totalprice"].to_numpy()),
            }
        )
        return df.groupby("c_mktsegment", as_index=False).sum()

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_c", alias_name="revenue_c"),
        )
    )


def _mktsegment_join_skew(sf_dir: str):
    """The mktsegment join routed through the skew-salted join with a
    deliberately low hot threshold, so popular customers take the
    replicate-and-salt path — proves the skew machinery end-to-end
    against the same oracle as the plain partitioned join."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum
    from sanskrit_ocr_ray.stages.relational import _cents, skew_join

    customer = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    orders = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = skew_join(orders, customer, "o_custkey", n_salts=4, hot_threshold=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"],
                "n_orders": np.int64(1),
                "revenue_c": _cents(df["o_totalprice"].to_numpy()),
            }
        )
        return df.groupby("c_mktsegment", as_index=False).sum()

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_c", alias_name="revenue_c"),
        )
    )


def _event_gaps(sf_dir: str):
    """Per-user inter-arrival time (LAG window): gap in µs to the
    previous event, -1 for each user's first event."""
    from sanskrit_ocr_ray.stages.relational import lag_gaps

    return lag_gaps(_tbl(sf_dir, "events", ["event_id", "ts", "user_id"]))


def _user_event_paths(sf_dir: str):
    """Ordered per-user event-type path (string_agg window) — the
    user-journey / sequence-assembly op."""
    from sanskrit_ocr_ray.stages.relational import grouped_concat

    return grouped_concat(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    )


def _late_events(sf_dir: str):
    """Watermark/allowed-lateness gate (Beam/Flink semantics) over
    arrival order = event_id: two-phase distributed prefix-scan of the
    running max event-time, 30-min lateness, 1-h tumbling windows. The
    fixture's event times are monotone in arrival order, so a
    deterministic ±1 h md5 'device clock skew' is applied first — the
    out-of-orderness the watermark machinery exists for."""
    import numpy as _np
    import pyarrow as _pa

    from sanskrit_ocr_ray.stages.relational import late_events
    from sanskrit_ocr_ray.util import md5_u64_many

    def skew(b: _pa.Table) -> _pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        us = b["ts"].cast(_pa.int64()).to_numpy(zero_copy_only=False)
        jit = (
            md5_u64_many([str(i) for i in ids.tolist()]) % _np.uint64(7_200_000_000)
        ).astype(_np.int64) - 3_600_000_000
        return _pa.table(
            {"event_id": _pa.array(ids), "et_us": _pa.array(us + jit)}
        )

    ds = _tbl(sf_dir, "events", ["event_id", "ts"]).map_batches(
        skew, batch_format="pyarrow"
    )
    return late_events(
        ds,
        lateness_us=1_800_000_000,
        window_us=3_600_000_000,
        ts_col="et_us",
    )


def _table_diff(sf_dir: str):
    """Snapshot diff: documents vs a deterministically mutated second
    version (doc_id%10==3 removed, %10==7 lang rewritten, %10==0 cloned
    under doc_id+1e6) → (doc_id, added|removed|changed); only key+hash
    cross the one full-outer shuffle."""
    import pyarrow as _pa

    from sanskrit_ocr_ray.stages.relational import table_diff

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    old = _tbl(sf_dir, "documents", cols)

    def mutate(b: _pa.Table) -> _pa.Table:
        import numpy as _np

        mod10 = b["doc_id"].to_numpy(zero_copy_only=False) % 10
        kept = b.filter(_pa.array(mod10 != 3))
        lang = _pa.compute.if_else(
            _pa.array(kept["doc_id"].to_numpy(zero_copy_only=False) % 10 == 7),
            "xx",
            kept["lang"],
        )
        kept = kept.set_column(kept.column_names.index("lang"), "lang", lang)
        clones = b.filter(_pa.array(mod10 == 0))
        clones = clones.set_column(
            0,
            "doc_id",
            _pa.array(
                clones["doc_id"].to_numpy(zero_copy_only=False) + _np.int64(1_000_000)
            ),
        )
        return _pa.concat_tables([kept, clones])

    new = _tbl(sf_dir, "documents", cols).map_batches(mutate, batch_format="pyarrow")
    return table_diff(old, new, "doc_id", ["text", "lang", "source", "n_chars"])


def _pattern_counts(sf_dir: str):
    """MATCH_RECOGNIZE-lite: per-user count of 'view>(click>)*purchase'
    occurrences over the ordered event path — one bucketed path
    assembly, then a shuffle-free compiled-regex count."""
    from sanskrit_ocr_ray.stages.relational import sequence_pattern_counts

    return sequence_pattern_counts(
        _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        r"view>(click>)*purchase",
    )


def _daily_active_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per UTC day — two bounded shuffles over
    distinct (day, user) pairs, never a co-located per-day set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from sanskrit_ocr_ray.stages.relational import distinct_count_by

    US_PER_DAY = 86_400_000_000

    def day_of(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {"day": pc.divide(us, US_PER_DAY), "user_id": batch["user_id"]}
        )

    ds = _tbl(sf_dir, "events", ["ts", "user_id"]).map_batches(
        day_of, batch_format="pyarrow", batch_size=None
    )
    return distinct_count_by(ds, "day", "user_id", out_col="dau")


def _inverted_index(sf_dir: str):
    """Corpus inverted index: (term, doc_id, tf) explode — shuffle-free."""
    from sanskrit_ocr_ray.stages.hygiene import inverted_index

    return inverted_index(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _token_doc_freq(sf_dir: str):
    """Per-term document frequency + total term frequency."""
    from sanskrit_ocr_ray.stages.hygiene import token_doc_freq

    return token_doc_freq(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _mad_outliers(sf_dir: str):
    """Robust per-event-type outlier summary (median absolute deviation,
    5×MAD gate) in integer cents — one bucketed histogram shuffle, both
    weighted medians computed inside the bucket."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import mad_outliers

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["event_type", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return mad_outliers(ds, "event_type", "value_c", k=5)


def _value_iqr_outliers(sf_dir: str):
    """Tukey-fence outliers (1.5×IQR, all-integer arithmetic): exact
    q25/q75 via the value histogram, bounds broadcast, one filter pass."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import quantiles_exact

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_id": batch["event_id"], "value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["event_id", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    q = quantiles_exact(ds, "value_c", q_pm=[250, 750])
    q25, q75 = (int(q[q.q_pm == p].value_c.iloc[0]) for p in (250, 750))
    iqr = q75 - q25
    lo, hi = q25 - 3 * iqr // 2, q75 + 3 * iqr // 2

    def flag(batch: pa.Table) -> pa.Table:
        v = batch["value_c"].to_numpy()
        m = (v < lo) | (v > hi)
        return batch.filter(pa.array(m))

    return ds.map_batches(flag, batch_format="pyarrow")


def _value_percent_rank(sf_dir: str):
    """Global percentile-rank score per event (min-rank ties) — two
    streaming passes over a broadcast value histogram, no global sort."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import percent_rank_map

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_id": batch["event_id"], "value_c": pa.array(c)})

    ds = _tbl(sf_dir, "events", ["event_id", "value"]).map_batches(
        cents, batch_format="pyarrow", batch_size=None
    )
    return percent_rank_map(ds, "value_c")


def _value_histogram(sf_dir: str):
    """Fixed-width histogram of event values ($5 bins): per-batch
    partials + one tiny groupby — the distribution-profiling op."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"bin": c // 500, "n_events": np.int64(1), "sum_value_c": c})
        return pa.Table.from_pandas(
            df.groupby("bin", as_index=False).sum(), preserve_index=False
        )

    return (
        _tbl(sf_dir, "events", ["value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bin")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_c", alias_name="sum_value_c"),
        )
    )


def _lineitem_corr_moments(sf_dir: str):
    """Single-pass correlation moments of (quantity cents, discount
    permille) over lineitem — mergeable sufficient statistics."""
    import numpy as np
    import pyarrow as pa

    from sanskrit_ocr_ray.stages.relational import corr_moments

    def ints(batch: pa.Table) -> pa.Table:
        q = np.floor(batch["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        d = np.floor(batch["l_discount"].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        return pa.table({"x": pa.array(q), "y": pa.array(d)})

    ds = _tbl(sf_dir, "lineitem", ["l_quantity", "l_discount"]).map_batches(
        ints, batch_format="pyarrow", batch_size=None
    )
    return corr_moments(ds, "x", "y")


def _sliding_distinct_users(sf_dir: str):
    """Distinct users per sliding 1h window (30m stride) — rolling
    uniques: vectorized window fan-out, then the exact distinct-count
    machinery (hot windows never co-located)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from sanskrit_ocr_ray.stages.relational import distinct_count_by

    window_s, step_s = 3600, 1800
    k = window_s // step_s

    def fan_out(batch: pa.Table) -> pa.Table:
        s = (
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
            // 1_000_000
        )
        base = (s // step_s) * step_s
        users = batch["user_id"].to_numpy()
        frames = [
            pd.DataFrame({"window_start_s": base - i * step_s, "user_id": users})
            for i in range(k)
        ]
        df = pd.concat(frames, ignore_index=True).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = _tbl(sf_dir, "events", ["ts", "user_id"]).map_batches(
        fan_out, batch_format="pyarrow", batch_size=None
    )
    return distinct_count_by(ds, "window_start_s", "user_id", out_col="n_users")


def _dod_retention(sf_dir: str):
    """Day-over-day retention: per day, how many users were also active
    the previous day — exact distinct (day, user) pairs, one semi-join
    shuffle against the pairs shifted +1 day, tiny per-day count."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum
    from sanskrit_ocr_ray.stages.relational import exact_distinct, hash_join

    US_PER_DAY = 86_400_000_000

    def day_of(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {"day": pc.divide(us, US_PER_DAY), "user_id": batch["user_id"]}
        )

    pairs = exact_distinct(
        _tbl(sf_dir, "events", ["ts", "user_id"]).map_batches(
            day_of, batch_format="pyarrow", batch_size=None
        ),
        ["day", "user_id"],
    )

    def key_today(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "k": pa.array(
                    df["day"].astype(str) + ":" + df["user_id"].astype(str)
                ),
                "day": pa.array(df["day"].to_numpy(np.int64)),
            }
        )

    def key_shifted(batch: pa.Table) -> pa.Table:
        # a pair active on day d makes day d+1 a "returning" day
        df = batch.to_pandas()
        return pa.table(
            {
                "k": pa.array(
                    (df["day"] + 1).astype(str) + ":" + df["user_id"].astype(str)
                )
            }
        )

    today = pairs.map_batches(key_today, batch_format="pyarrow")
    prev = pairs.map_batches(key_shifted, batch_format="pyarrow")
    returning = hash_join(today, prev, "k", how="semi")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False).size()
        g = g.rename(columns={"size": "returning_users"})
        return g.astype({"day": np.int64, "returning_users": np.int64})

    return (
        returning.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("returning_users", alias_name="returning_users"))
    )


def _fuzzy_dedup(sf_dir: str):
    """End-to-end fuzzy dedup: surviving doc per MinHash+LSH near-dup
    component (min doc_id keeper) with its cluster size."""
    from sanskrit_ocr_ray.stages.dedup import fuzzy_dedup_survivors

    return fuzzy_dedup_survivors(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _item_pagerank(sf_dir: str):
    """Iterative graph centrality: PageRank over the item-transition
    graph (consecutive ``$.k`` values per user by (ts, event_id);
    self-loops dropped, multiplicity = edge weight). Fixed-point int64
    arithmetic (scale 10^12, floor divisions, dangling mass dropped) so
    the five-iteration recurrence matches the DuckDB oracle's unrolled
    CTEs EXACTLY — no float summation-order slack. Scale shape in
    stages/graph.py: bucketed lag for edges, object-store-pinned static
    sides, 3 bounded shuffles per iteration over (node, rank) rows."""
    from sanskrit_ocr_ray.stages.graph import item_transition_edges, pagerank

    ev = _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    return pagerank(item_transition_edges(ev), iters=5)


def _item_ppr(sf_dir: str):
    """PERSONALIZED PageRank (topic-sensitive, Haveliwala 2002) over the
    item-transition graph: restart mass teleports only to the seed set
    {item : item % 7 == 0} — "rank relative to MY items", the
    crawl-prioritization / related-items form. Same fixed-point int64
    recurrence and scale shape as item_pagerank (stages/graph.pagerank
    with seed_pred); the oracle inlines the seed predicate into the
    same unrolled CTEs."""
    from sanskrit_ocr_ray.stages.graph import item_transition_edges, pagerank

    ev = _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    return pagerank(
        item_transition_edges(ev), iters=5, seed_pred=lambda v: v % 7 == 0
    )


def _item_components(sf_dir: str):
    """Connected components of the (undirected) item-transition graph:
    which items are reachable from which through user co-view chains —
    the standalone form of the BSP hash-to-min engine the LSH clusterer
    uses (object-store-pinned bucketed edges, one task wave per round,
    O(B²) driver refs). rep = MIN item id per component."""
    from sanskrit_ocr_ray.stages.graph import (
        connected_components,
        item_transition_edges,
    )

    ev = _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    return connected_components(item_transition_edges(ev))


def _item_triangles(sf_dir: str):
    """Per-node triangle counts over the undirected item-transition
    graph — the standard local-clustering / community-density signal.
    Degree-ordered node-iterator (Suri & Vassilvitskii MR shape): orient
    each edge low→high (degree, id), self-merge out-neighbors per source
    bucket into wedges, close wedges against the oriented edge set with
    one composite-key semi hash_join — every shuffle bounded, hub wedge
    blow-up capped at d·√(2m) by the orientation."""
    from sanskrit_ocr_ray.stages.graph import item_transition_edges, triangle_counts

    ev = _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    return triangle_counts(item_transition_edges(ev))


def _item_kcore(sf_dir: str):
    """2-core of the undirected item-transition graph: iterated peel of
    degree-<2 nodes until fixpoint (≤6 rounds, early exit) → surviving
    (node, deg-within-core). The standard graph-densification gate
    (drop whisker/chain items before community or embedding passes).
    Scale shape in stages/graph.py: per round two SEMI hash_joins
    (edges ⋉ alive on each endpoint) + one bounded degree shuffle;
    alive set is object-store rows, never driver state; small graphs
    take the one-task vectorized peel fast path."""
    from sanskrit_ocr_ray.stages.graph import item_transition_edges, kcore

    ev = _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    return kcore(item_transition_edges(ev), k=2, max_rounds=6)


def _item_bfs_hops(sf_dir: str):
    """Hub-distance BFS over the undirected item-transition graph:
    unweighted shortest hop count from the hub item (largest weighted
    degree, min-id ties) for every item within 4 hops — the crawl-
    frontier / reachability-from-seed primitive. Scale shape in
    stages/graph.py: symmetrized edges pinned once, hub = bucketed
    argmax (≤ n_buckets rows on the driver), each round ONE frontier
    semi-join against the static edge blocks + a bounded distinct + an
    ANTI join against the visited set; small graphs take the one-task
    vectorized BFS fast path (distributed loop pinned by tests at
    small_edges=0)."""
    from sanskrit_ocr_ray.stages.graph import bfs_hops, item_transition_edges

    ev = _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    return bfs_hops(item_transition_edges(ev), max_hops=4)


def _props_k_by_type(sf_dir: str):
    """Semi-structured projection + aggregate: extract integer ``$.k``
    from the JSON props blob (vectorized regex, no per-row json.loads),
    then per-event-type count / sum / integer-permille mean."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum
    from sanskrit_ocr_ray.stages.text_analysis import json_int_field_batch

    def partial(batch: pa.Table) -> pa.Table:
        t = json_int_field_batch(batch, column="props", key="k")
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pylist(), "k": t["k"].to_numpy()}
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum")
        )
        return pa.Table.from_pandas(g.astype({"n": np.int64, "sum_k": np.int64}),
                                    preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy()
        s = batch["sum_k"].to_numpy()
        return batch.append_column(
            "mean_k_pm", pa.array(1000 * s // n, type=pa.int64())
        )

    return (
        _tbl(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def _revenue_forecast(sf_dir: str):
    """Forecast revenue (TPC-H Q6 shape): shipdate range pushed into the
    parquet scan as a row filter (row groups outside the window never
    decode), then one shuffle-free partial-sum fold."""
    import numpy as np
    import pyarrow.dataset as pds

    from sanskrit_ocr_ray.stages.relational import revenue_forecast

    ds = _tbl(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        row_filter=(
            (pds.field("l_shipdate") >= pds.scalar(np.datetime64("1996-01-01", "us")))
            & (pds.field("l_shipdate") < pds.scalar(np.datetime64("1997-01-01", "us")))
        ),
    )
    return revenue_forecast(ds)


def _promo_revenue(sf_dir: str):
    """Promo revenue share per ship month (TPC-H Q14 shape): part is the
    broadcast dimension; integer per-mille output."""
    from sanskrit_ocr_ray.stages.relational import promo_revenue_pm

    return promo_revenue_pm(
        _tbl(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]),
        _pdf(sf_dir, "part", ["p_partkey", "p_type"]),
    )


def _image_patches(sf_dir: str):
    """ViT-style 8×8 patch sums over per-doc synthetic pages that
    round-trip the real lossless codecs (PNG/GIF/TIFF/BMP/raw8); the
    oracle replays the pixel formula and the block layout in SQL."""
    from sanskrit_ocr_ray.stages.multimodal import (
        image_patch_sums,
        synth_patch_image_batch,
    )

    imgs = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_patch_image_batch, batch_format="pyarrow"
    )
    return image_patch_sums(imgs, patch=8)


def _knn_join(sf_dir: str):
    """Dataset↔dataset nearest-neighbor JOIN (broadcast-build
    block-nested-loop): probes = label<5 vectors, build = label>=5;
    integer-quantized dot scores, min-build-id tie-break, one row per
    probe, shuffle-free."""
    from sanskrit_ocr_ray.stages.similarity import knn_join

    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    probe = emb.filter(expr="label < 5")
    build = emb.filter(expr="label >= 5")
    return knn_join(probe, build, q=1000)


def _schema_union(sf_dir: str):
    """Schema-evolution read (union_by_name / mergeSchema): two table
    generations derived from `documents` — gen A (even doc_ids) stores
    (doc_id int32, text, lang), gen B (odd doc_ids) stores
    (doc_id int64, text, source, n_chars) — are read back as ONE dataset
    on the promoted union schema (doc_id widened to int64, absent
    columns null-filled), via the footer-only-sniff + per-block-conform
    + plan-level-union seam in sources/tables.py."""
    import shutil

    import pyarrow as _pa

    from sanskrit_ocr_ray.sources.tables import read_table_union

    # _scratch_dir keys by abs-path hash + pid and honors
    # SXRAY_SCRATCH_ROOT, so two concurrent runs on the same fixture
    # can't race each other's generation dirs (round-4 convention).
    root = _scratch_dir("schema_union", sf_dir)
    docs = _tbl(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])

    def gen_a(b: _pa.Table) -> _pa.Table:
        b = b.filter(_pa.compute.equal(_pa.compute.bit_wise_and(b["doc_id"], 1), 0))
        return _pa.table(
            {
                "doc_id": b["doc_id"].cast(_pa.int32()),
                "text": b["text"],
                "lang": b["lang"],
            }
        )

    def gen_b(b: _pa.Table) -> _pa.Table:
        b = b.filter(_pa.compute.equal(_pa.compute.bit_wise_and(b["doc_id"], 1), 1))
        return b.select(["doc_id", "text", "source", "n_chars"])

    shutil.rmtree(root, ignore_errors=True)
    docs.map_batches(gen_a, batch_format="pyarrow").write_parquet(root + "/gen_a")
    docs.map_batches(gen_b, batch_format="pyarrow").write_parquet(root + "/gen_b")
    return read_table_union(
        [root + "/gen_a", root + "/gen_b"],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )


def _feature_hashing(sf_dir: str):
    """Hashing-trick vectorizer: (doc_id, feat, n) sparse triples with
    feat = md5_u64(token) % 1024; shuffle-free."""
    from sanskrit_ocr_ray.stages.corpus import feature_hashing

    return feature_hashing(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _target_affinity(sf_dir: str):
    """DSIR-style importance score vs the English subcorpus: hashed-bigram
    histogram of the target folded driver-side (one 4096-int vector),
    broadcast, then a shuffle-free per-doc dot product."""
    from sanskrit_ocr_ray.stages.corpus import target_affinity

    return target_affinity(
        _tbl(sf_dir, "documents", ["doc_id", "text", "lang"]), target_lang="en"
    )


def _late_order_priorities(sf_dir: str):
    """Late-order priority census (TPC-H Q4 shape): EXISTS over lineitems
    shipping >60 days after the order date, pre-collapsed per orderkey so
    the join moves one row per order."""
    from sanskrit_ocr_ray.stages.relational import late_order_priority_counts

    return late_order_priority_counts(
        _tbl(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]),
    )


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _extract_flat("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data-pipeline operator families (dedup / similarity /
    text analysis / relational / windowed)."""
    return {
        # extraction engine (non-SQL-expressible: image decode + OCR)
        "extract_e2e": _extract_flat,
        "multimodal_features": _multimodal_features,
        "media_span_positions": _media_span_positions,
        "quarantine_summary": _quarantine_summary,
        "span_kind_stats": _span_kind_stats,
        "frame_checksums": _frame_checksums,
        "audio_energy": _audio_energy,
        # text normalization + dedup family over `documents`
        "clean_text": _clean_text,
        "dedup_exact": _dedup_exact,
        "dup_rate_by_source": _dup_rate_by_source,
        "salient_terms_by_source": _salient_terms_by_source,
        "minhash_sig": _minhash_sig,
        "minhash_lsh_clusters": _minhash_lsh,
        "simhash64": _simhash,
        "simhash_dup_pairs": _simhash_pairs,
        "ngram_jaccard_pairs": _ngram_pairs,
        "containment_pairs": _containment_pairs,
        # text analysis
        "docs_by_lang": _docs_by_lang,
        "corpus_stats": _corpus_stats,
        "token_count": _token_count,
        "lang_id": _lang_id,
        "lang_confusion": _lang_confusion,
        "oov_rate_by_lang": _oov_rate_by_lang,
        "vocab_coverage": _vocab_coverage,
        "window_cooccurrence": _window_cooccurrence,
        "quality_score": _quality,
        "char_class_profile": _char_class_profile,
        "fingerprint_md5": _fingerprint,
        "kr_fingerprint": _kr_fingerprint,
        "winnow_fingerprints": _winnow_fingerprints,
        "token_gini": _token_gini,
        "repetition_scores": _repetition_scores,
        # training-corpus assembly
        "train_val_split": _train_val_split,
        "redact_pii": _redact_pii,
        "stratified_sample": _stratified_sample,
        "pack_sequences": _pack_sequences,
        "corpus_mix": _corpus_mix,
        "ngram_top": _ngram_top,
        "kmv_distinct": _kmv_distinct,
        "hll_registers": _hll_registers,
        "heavy_hitters": _heavy_hitters,
        "basket_pairs": _basket_pairs,
        "status_history": _status_history,
        "embedding_moments": _embedding_moments,
        "typo_pairs": _typo_pairs,
        "embedding_outliers": _embedding_outliers,
        "compact_docs": _compact_docs,
        "bucketed_cust_orders": _bucketed_cust_orders,
        "ivm_type_counts": _ivm_type_counts,
        "bpe_merges": _bpe_merges,
        "purchase_error_counts_full": _purchase_error_counts_full,
        "kmeans_lloyd": _kmeans_lloyd,
        "embedding_pq": _embedding_pq,
        "zone_map_prune": _zone_map_prune,
        "knn_pq_adc": _knn_pq_adc,
        "cohort_retention": _cohort_retention,
        "impute_values": _impute_values,
        "ppjoin_pairs": _ppjoin_pairs,
        "user_rolling_median": _user_rolling_median,
        "hll_users_by_type": _hll_users_by_type,
        "association_rules": _association_rules,
        "cusum_flags": _cusum_flags,
        "trimmed_mean_by_type": _trimmed_mean_by_type,
        "user_running_distinct": _user_running_distinct,
        "partkey_skew_histogram": _partkey_skew_histogram,
        "audience_overlap": _audience_overlap,
        "shard_assign": _shard_assign,
        "merge_scd1_docs": _merge_scd1_docs,
        "fk_integrity": _fk_integrity,
        "image_dhash_pairs": _image_dhash_pairs,
        "kmv_jaccard": _kmv_jaccard,
        "contamination": _contamination,
        "decontaminate": _decontaminate,
        "priority_sample": _priority_sample,
        "salient_terms": _salient_terms,
        "keyword_search": _keyword_search,
        "bm25_topk": _bm25_topk,
        "hybrid_rrf": _hybrid_rrf,
        "incremental_dedup": _incremental_dedup,
        "bloom_new_docs": _bloom_new_docs,
        "rarity_score": _rarity_score,
        "token_chi2": _token_chi2,
        "dedup_spans": _dedup_spans,
        "bigram_surprisal": _bigram_surprisal,
        "value_ntile": _value_ntile,
        "snm_pairs": _snm_pairs,
        "cms_registers": _cms_registers,
        "lineitem_unpivot": _lineitem_unpivot,
        "user_ewma": _user_ewma,
        "lineitem_zorder": _lineitem_zorder,
        "debounce_events": _debounce_events,
        "media_sniff": _media_sniff,
        "profile_documents": _profile_documents,
        "validate_documents": _validate_documents,
        "fuzzy_dedup_survivors": _fuzzy_dedup,
        "kgram_dup_spans": _kgram_dup_spans,
        "vocab_build": _vocab_build,
        "chunk_documents": _chunk_documents,
        "encode_documents": _encode_documents,
        "pmi_collocations": _pmi_collocations,
        "table_checksum": _table_checksum,
        "customer_order_counts": _customer_order_counts,
        "user_running_value": _user_running_value,
        "user_rolling_value": _user_rolling_value,
        "funnel_counts": _funnel_counts,
        "user_mode_event": _user_mode_event,
        "doc_ttr": _doc_ttr,
        "docs_lang_pivot": _docs_lang_pivot,
        "revenue_rollup": _revenue_rollup,
        "revenue_cube": _revenue_cube,
        # web-document main-content extraction (north rule's parenthetical)
        "html_strip": _html_strip,
        "html_main_content": _html_main,
        "inlink_counts": _inlink_counts,
        "html_spans": _html_spans,
        "layout_reading_order": _layout_reading_order,
        # as-of / range joins over events (custom operators — Ray Data has none)
        "asof_view_before_purchase": _asof_view_before_purchase,
        "views_before_purchase_1h": _views_before_purchase_1h,
        "customers_no_orders": _customers_no_orders,
        "value_quantiles": _value_quantiles,
        "value_quantiles_cont": _value_quantiles_cont,
        "value_quantiles_hdr": _value_quantiles_hdr,
        "quantiles_hdr_by_type": _quantiles_hdr_by_type,
        "value_trend_by_type": _value_trend_by_type,
        "part_skyline": _part_skyline,
        "status_as_of": _status_as_of,
        "peak_concurrency": _peak_concurrency,
        "kmv_set_ops": _kmv_set_ops,
        "funnel_depths": _funnel_depths,
        "gini_by_type": _gini_by_type,
        "user_type_concentration": _user_type_concentration,
        "type_token_ratio": _type_token_ratio,
        "modal_event_per_user": _modal_event_per_user,
        "value_quantiles_binned": _value_quantiles_binned,
        "quantiles_by_type": _quantiles_by_type,
        "latest_order_per_customer": _latest_order_per_customer,
        "event_gaps": _event_gaps,
        "user_event_paths": _user_event_paths,
        "daily_active_users": _daily_active_users,
        "sliding_distinct_users": _sliding_distinct_users,
        "user_active_time": _user_active_time,
        "dod_retention": _dod_retention,
        "value_percent_rank": _value_percent_rank,
        "value_histogram": _value_histogram,
        "value_iqr_outliers": _value_iqr_outliers,
        "lineitem_corr_moments": _lineitem_corr_moments,
        "inverted_index": _inverted_index,
        "token_doc_freq": _token_doc_freq,
        "item_components": _item_components,
        "item_pagerank": _item_pagerank,
        "item_ppr": _item_ppr,
        "item_triangles": _item_triangles,
        "item_kcore": _item_kcore,
        "item_bfs_hops": _item_bfs_hops,
        "props_k_by_type": _props_k_by_type,
        "top2_events_per_user": _top2_events_per_user,
        "mktsegment_join_skew": _mktsegment_join_skew,
        # similarity search over `embeddings`
        "knn_top5": _knn5,
        "knn_ivf": _knn_ivf,
        "knn_lsh": _knn_lsh,
        "embedding_dup_pairs": _emb_dups,
        "semantic_dedup": _semantic_dedup,
        "text_hash_dup_pairs": _text_hash_dup_pairs,
        "nearest_centroid": _nearest_centroid,
        # relational / streaming-shaped
        "q1_pricing": _q1,
        "revenue_by_nation": _rev_nation,
        "revenue_by_brand": _rev_brand,
        "revenue_by_region": _rev_region,
        "orders_by_month": _orders_by_month,
        "events_tumbling": _events_window,
        "events_sliding": _events_sliding,
        "sessionize": _sessionize,
        "event_transitions": _event_transitions,
        "rfm_segments": _rfm_segments,
        "join_cardinality": _join_cardinality,
        "pii_rate_by_source": _pii_rate_by_source,
        "jaccard_band_hist": _jaccard_band_hist,
        "hourly_seasonality": _hourly_seasonality,
        "dup_cluster_size_hist": _dup_cluster_size_hist,
        "reorder_gap_quantiles": _reorder_gap_quantiles,
        "supplier_return_rates": _supplier_return_rates,
        "session_attribution": _session_attribution,
        "orders_above_avg": _orders_above_avg,
        "top_users_by_value": _top_users,
        "top_lineitems": _top_lineitems,
        "mktsegment_join": _mktsegment_join,
        "revenue_forecast": _revenue_forecast,
        "promo_revenue": _promo_revenue,
        "late_order_priorities": _late_order_priorities,
        "feature_hashing": _feature_hashing,
        "target_affinity": _target_affinity,
        "image_patches": _image_patches,
        "knn_join": _knn_join,
        "embedding_covariance": _embedding_covariance,
        "schema_union": _schema_union,
        "audio_autocorr": _audio_autocorr,
        "video_scene_cuts": _video_scene_cuts,
        "srp_sketch": _srp_sketch,
        "mad_outliers": _mad_outliers,
        "pattern_counts": _pattern_counts,
        "table_diff": _table_diff,
        "late_events": _late_events,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles (identical column names + arithmetic as the Ray
    side) — one per queries() entry, with no rows-only exceptions.

    The extraction oracles read the deterministic fixture's golden/media
    tables by absolute path (ground truth by construction; the driver's
    correctness run is at sf=0.01, so the path is pinned to that scale and
    the fixture is synthesized here if missing — pure in-process numpy, no
    Ray session involved)."""
    fx = _fixture_for("/root/testdata/sf0.01")
    sim_sig = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS hv FROM tok
), bits AS (
  SELECT doc_id, b.i AS i,
         SUM(CASE WHEN (hv >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, unnest(range(64)) AS b(i)
  GROUP BY doc_id, b.i
), sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (1::UBIGINT << i) ELSE 0::UBIGINT END) AS UBIGINT) AS s
  FROM bits GROUP BY doc_id
)
"""
    clean_expr = "trim(nfc_normalize(regexp_replace(lower(text), '[^a-z ]', '', 'g')))"
    # verbatim SQL mirror of webdoc.synth_html_batch (change both together)
    html_synth = """
WITH h AS (
  SELECT doc_id,
    '<html><head><title>Doc ' || doc_id || '</title>'
    || '<style>p {margin:0} a {color:blue}</style></head><body>'
    || '<div><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>'
    || '<p>' || substr(text, 1, length(text) // 2) || '</p>'
    || '<img src="media/' || doc_id || '.png"/>'
    || '<p>' || substr(text, length(text) // 2 + 1) || '</p>'
    || '<div>Share this: <a href="/t">Tweet</a> &amp; <a href="/l">Like</a></div>'
    || '<div>&copy; 2026 example.com &mdash; <a href="/tos">Terms &amp; Conditions</a></div>'
    || '</body></html>' AS html
  FROM documents
)
"""
    # webdoc._strip_fragment as SQL: tags → ' ', entity chain (&amp; last),
    # squeeze, trim
    strip_expr = (
        r"trim(regexp_replace(replace(replace(replace(replace("
        r"regexp_replace({src}, '<[^>]*>', ' ', 'g'),"
        r" '&copy;', '(c)'), '&mdash;', '-'), '&nbsp;', ' '), '&amp;', '&'),"
        r" '\s+', ' ', 'g'))"
    )
    knn5_sql = """
WITH q AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10
), al AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT q.vec_id AS query_id, al.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.e, al.e) DESC, al.vec_id
         ) AS rank
  FROM q, al WHERE al.vec_id <> q.vec_id
) WHERE rank <= 5
"""
    oracles = {
        # golden.parquet IS the expected extractor output by construction
        # (synth.py); flatten its per-doc seq exactly like reassemble.flatten_out
        "extract_e2e": f"""
SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos,
       seq[r.i].kind AS kind, seq[r.i].text AS text, seq[r.i].media_ref AS media_ref
FROM read_parquet('{fx}/golden.parquet') g, unnest(range(1, len(g.seq)+1)) AS r(i)
""",
        "media_span_positions": f"""
WITH s AS (
  SELECT spans[i].kind AS kind, i - 1 AS idx, len(spans) AS n
  FROM read_parquet('{fx}/docs.parquet'),
       unnest(range(1, len(spans) + 1)) AS r(i)
)
SELECT CAST((1000 * idx // n) // 100 AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_media_spans
FROM s WHERE kind = 'media' GROUP BY 1
""",
        "span_kind_stats": f"""
SELECT s.kind AS kind, CAST(COUNT(*) AS BIGINT) AS n_spans
FROM (SELECT unnest(spans) AS s FROM read_parquet('{fx}/docs.parquet'))
GROUP BY s.kind
""",
        # raw8 decode of a fixture page always succeeds and the intensity
        # histogram has exactly n_bins=16 entries → constant columns
        "multimodal_features": f"""
SELECT media_ref, CAST(16 AS BIGINT) AS n_features, CAST(0 AS BIGINT) AS had_error
FROM read_parquet('{fx}/media.parquet')
""",
        # the planted unsupported-codec class is the md5 rule itself, so
        # the oracle recomputes membership and the one error message the
        # decode seam emits for it (stages/multimodal.decode_payload)
        "quarantine_summary": f"""
SELECT 'unknown media_type ''video/x-test''' AS error,
       CAST(COUNT(*) AS BIGINT) AS n
FROM read_parquet('{fx}/media.parquet')
WHERE ('0x' || substr(md5(media_ref), 1, 16))::UBIGINT % 5 = 0
HAVING COUNT(*) > 0
""",
        # compact_docs: the stats are computed from the REWRITTEN files;
        # the oracle recomputes them from the ORIGINAL table — equality
        # proves the rewrite preserved the row multiset (order-free sum
        # checksum) and hit the deterministic ceil(n/16) file layout
        "compact_docs": f"""
SELECT CAST(part AS BIGINT) AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST((COUNT(*) + 15) // 16 AS BIGINT) AS n_files,
       CAST(SUM(('0x' || substr(md5(doc_id), 1, 16))::UBIGINT % 1000000000)
            AS BIGINT) AS checksum
FROM read_parquet('{fx}/docs.parquet') GROUP BY part
""",
        # Karp-Rabin rolling hash over code points: HUGEINT fold, exact
        "kr_fingerprint": """
SELECT doc_id,
       lpad(lower(hex(list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
                      list_transform(str_split(text, ''), c -> ascii(c))),
         (h, c) -> (h * 257 + c) % 2305843009213693951))), 16, '0') AS kr_fingerprint
FROM documents
""",
        # gini: rational lexical concentration — n²−Σc² over n², exact
        "token_gini": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), c AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(ts) AS t FROM tok WHERE len(ts) > 0)
  GROUP BY doc_id, t
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
       CAST((1000000 * (SUM(c) * SUM(c) - SUM(c * c)))
            // (SUM(c) * SUM(c)) AS BIGINT) AS gini_x1m
FROM c GROUP BY doc_id
""",
        # winnowing: first-16-md5-hex shingle hashes (lexicographic
        # string order ≡ numeric u64 order), leftmost window min via
        # list_position's first-occurrence semantics; a doc with fewer
        # than w shingles is one truncated window (list_slice clamps)
        "winnow_fingerprints": """
WITH toks AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS t FROM documents
), g AS (
  SELECT doc_id, i AS pos, substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 16) AS h
  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), hl AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs FROM g GROUP BY doc_id
), win AS (
  SELECT doc_id, j, list_slice(hs, j, j + 3) AS ws
  FROM hl, UNNEST(range(1, greatest(len(hs) - 3, 1) + 1)) AS r(j)
)
SELECT DISTINCT doc_id,
       CAST(j - 1 + list_position(ws, list_min(ws)) AS BIGINT) AS pos,
       list_min(ws) AS fp
FROM win
""",
        # LSH candidates (4 bands × 2 perms) → integer-exact Jaccard verify
        # → connected components via recursive transitive closure; docs with
        # no tokens or no verified partner map to themselves
        "minhash_lsh_clusters": """
WITH RECURSIVE tok AS (
  SELECT DISTINCT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), seeds AS (
  SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 16))::UBIGINT AS s
  FROM unnest(range(8)) AS r(i)
), mh AS (
  SELECT doc_id, i AS perm,
         MIN(xor(('0x' || substr(md5(t), 1, 16))::UBIGINT, s)) AS mv
  FROM tok, seeds GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, perm // 2 AS band,
         string_agg(lpad(lower(hex(mv)), 16, '0'), ',' ORDER BY perm) AS sig
  FROM mh GROUP BY doc_id, perm // 2
), bands_capped AS (
  -- mirror the engine's deterministic hot-bucket cap: the first
  -- max_bucket=256 doc ids (sorted) of each band bucket generate pairs
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig,
           row_number() OVER (PARTITION BY band, sig ORDER BY doc_id) AS rn
    FROM bands
  ) WHERE rn <= 256
), cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands_capped a
  JOIN bands_capped b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT c.da, c.db, COUNT(*) AS i
  FROM cand c JOIN tok x ON x.doc_id = c.da JOIN tok y ON y.doc_id = c.db AND y.t = x.t
  GROUP BY c.da, c.db
), verified AS (
  SELECT i.da, i.db
  FROM inter i JOIN sz sa ON sa.doc_id = i.da JOIN sz sb ON sb.doc_id = i.db
  WHERE 1000 * i.i >= 700 * (sa.n + sb.n - i.i)
), edges AS (
  SELECT da AS src, db AS dst FROM verified
  UNION ALL SELECT db, da FROM verified
), walk(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.r
)
SELECT node AS doc_id, MIN(r) AS cluster_rep FROM walk GROUP BY node
""",
        "clean_text": f"""
SELECT doc_id, {clean_expr} AS clean FROM documents WHERE {clean_expr} <> ''
""",
        "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
""",
        "salient_terms_by_source": """
WITH ts AS (
  SELECT source, list_filter(str_split(text, ' '), x -> x <> '') AS l FROM documents
), tok AS (
  SELECT source, unnest(l) AS term FROM ts
), tfs AS (
  SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY source, term
), dfs AS (
  SELECT term, COUNT(*) AS df FROM tfs GROUP BY term
), sc AS (
  SELECT t.source, t.term, t.tf, d.df,
         t.tf * 1000000 // d.df AS score_x1m
  FROM tfs t JOIN dfs d USING (term)
), r AS (
  SELECT *, row_number() OVER (
           PARTITION BY source ORDER BY score_x1m DESC, term) AS rnk
  FROM sc
)
SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score_x1m AS BIGINT) AS score_x1m, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5
""",
        "dup_rate_by_source": """
WITH f AS (
  SELECT source, md5(coalesce(text, '')) AS fp FROM documents
), d AS (
  SELECT fp FROM f GROUP BY fp HAVING COUNT(*) > 1
)
SELECT f.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.fp IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dup,
       CAST(1000 * SUM(CASE WHEN d.fp IS NULL THEN 0 ELSE 1 END) // COUNT(*)
            AS BIGINT) AS dup_pm
FROM f LEFT JOIN d ON d.fp = f.fp
GROUP BY f.source
""",
        "minhash_sig": """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), seeds AS (
  SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 16))::UBIGINT AS s
  FROM unnest(range(8)) AS r(i)
)
SELECT doc_id, i AS perm,
       lpad(lower(hex(MIN(xor(('0x' || substr(md5(t), 1, 16))::UBIGINT, s)))), 16, '0') AS minhash
FROM tok, seeds GROUP BY doc_id, i
""",
        "simhash64": sim_sig
        + """
SELECT doc_id, lpad(lower(hex(s)), 16, '0') AS simhash FROM sig
""",
        "simhash_dup_pairs": sim_sig
        + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 6
""",
        "ngram_jaccard_pairs": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, (1000 * i) // (sa.n + sb.n - i) AS jacc_pm
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE 1000 * i >= 20 * (sa.n + sb.n - i)
""",
        # containment: same shingle/intersection CTEs, LEAST() verify
        "containment_pairs": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, (1000 * i) // LEAST(sa.n, sb.n) AS cont_pm
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE 1000 * i >= 150 * LEAST(sa.n, sb.n)
""",
        "docs_by_lang": """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
""",
        "corpus_stats": r"""
SELECT COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_ws_tokens
FROM documents
""",
        "token_count": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
        "lang_id": """
WITH s AS (
  SELECT doc_id,
    len(list_filter(str_split(text,' '), x -> list_contains(['der','das','und','ist','nicht'], x))) AS n_de,
    len(list_filter(str_split(text,' '), x -> list_contains(['the','a','and','of','to'], x))) AS n_en,
    len(list_filter(str_split(text,' '), x -> list_contains(['el','los','una','por','como'], x))) AS n_es,
    len(list_filter(str_split(text,' '), x -> list_contains(['le','les','et','dans','pour'], x))) AS n_fr,
    len(list_filter(str_split(text,' '), x -> list_contains(['的','是','了','在','我'], x))) AS n_zh
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(n_de,n_en,n_es,n_fr,n_zh) = 0 THEN 'und'
       WHEN n_de = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'de'
       WHEN n_en = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'en'
       WHEN n_es = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'es'
       WHEN n_fr = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'fr'
       ELSE 'zh' END AS pred_lang
FROM s
""",
        # confusion matrix = the lang_id prediction CTE cross-tabbed
        # against the stored label
        "lang_confusion": """
WITH s AS (
  SELECT doc_id, lang,
    len(list_filter(str_split(text,' '), x -> list_contains(['der','das','und','ist','nicht'], x))) AS n_de,
    len(list_filter(str_split(text,' '), x -> list_contains(['the','a','and','of','to'], x))) AS n_en,
    len(list_filter(str_split(text,' '), x -> list_contains(['el','los','una','por','como'], x))) AS n_es,
    len(list_filter(str_split(text,' '), x -> list_contains(['le','les','et','dans','pour'], x))) AS n_fr,
    len(list_filter(str_split(text,' '), x -> list_contains(['的','是','了','在','我'], x))) AS n_zh
  FROM documents
), p AS (
  SELECT lang,
    CASE WHEN greatest(n_de,n_en,n_es,n_fr,n_zh) = 0 THEN 'und'
         WHEN n_de = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'de'
         WHEN n_en = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'en'
         WHEN n_es = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'es'
         WHEN n_fr = greatest(n_de,n_en,n_es,n_fr,n_zh) THEN 'fr'
         ELSE 'zh' END AS pred_lang
  FROM s
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, pred_lang
""",
        # per-language OOV per-mille under the same min_count=5 vocab
        # the encode_documents oracle induces
        "oov_rate_by_lang": """
WITH ts AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS l FROM documents
), tok AS (
  SELECT doc_id, unnest(l) AS tok FROM ts
), c AS (
  SELECT tok AS token FROM tok GROUP BY tok HAVING COUNT(*) >= 5
), per AS (
  SELECT tok.doc_id, COUNT(*) AS ntok,
         SUM(CASE WHEN c.token IS NULL THEN 1 ELSE 0 END) AS noov
  FROM tok LEFT JOIN c ON c.token = tok.tok
  GROUP BY tok.doc_id
)
SELECT d.lang,
       CAST(SUM(per.ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(per.noov) AS BIGINT) AS n_oov,
       CAST(1000 * SUM(per.noov) // SUM(per.ntok) AS BIGINT) AS oov_pm
FROM per JOIN documents d ON d.doc_id = per.doc_id
GROUP BY d.lang HAVING SUM(per.ntok) > 0
""",
        # ordered pairs within a 5-token window, global top-20 by
        # (count desc, x, y) — the same total order the engine ranks by
        "window_cooccurrence": """
WITH ts AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS l FROM documents
), tok AS (
  SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS o FROM ts
)
SELECT a.t AS x, b.t AS y, CAST(COUNT(*) AS BIGINT) AS n
FROM tok a JOIN tok b
  ON b.doc_id = a.doc_id AND b.o > a.o AND b.o <= a.o + 4
GROUP BY a.t, b.t
ORDER BY n DESC, x, y LIMIT 20
""",
        # Zipf head coverage: rank tokens (freq desc, token asc), then
        # for each k the per-mille of all instances the top-k covers
        "vocab_coverage": """
WITH ts AS (
  SELECT list_filter(str_split(text, ' '), x -> x <> '') AS l FROM documents
), tok AS (
  SELECT unnest(l) AS t FROM ts
), c AS (
  SELECT t, COUNT(*) AS freq FROM tok GROUP BY t
), r AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, t) AS rk FROM c
), tot AS (
  SELECT SUM(freq) AS total FROM c
)
SELECT ks.k,
       CAST(SUM(CASE WHEN r.rk <= ks.k THEN r.freq ELSE 0 END) AS BIGINT)
         AS covered,
       CAST(MAX(tot.total) AS BIGINT) AS total,
       CAST(1000 * SUM(CASE WHEN r.rk <= ks.k THEN r.freq ELSE 0 END)
            // MAX(tot.total) AS BIGINT) AS coverage_pm
FROM (VALUES (10), (100), (1000)) ks(k), r, tot
GROUP BY ks.k
""",
        "char_class_profile": r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(coalesce(text, '')) AS BIGINT) AS n,
         CAST(length(coalesce(text,'')) - length(regexp_replace(coalesce(text,''), '[A-Za-z]', '', 'g')) AS BIGINT) AS letters,
         CAST(length(coalesce(text,'')) - length(regexp_replace(coalesce(text,''), '[0-9]', '', 'g')) AS BIGINT) AS digits,
         CAST(length(coalesce(text,'')) - length(regexp_replace(coalesce(text,''), '\s', '', 'g')) AS BIGINT) AS spaces
  FROM documents
)
SELECT doc_id, n AS n_chars,
  CASE WHEN n = 0 THEN 0 ELSE 1000 * letters // n END AS letter_pm,
  CASE WHEN n = 0 THEN 0 ELSE 1000 * digits // n END AS digit_pm,
  CASE WHEN n = 0 THEN 0 ELSE 1000 * spaces // n END AS space_pm,
  CASE WHEN n = 0 THEN 0 ELSE 1000 * (n - letters - digits - spaces) // n END AS other_pm
FROM t
""",
        "quality_score": r"""
WITH t AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ntok
  FROM documents
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS q_chars,
  ntok AS q_tokens,
  CASE WHEN ntok = 0 THEN 0
       ELSE (100 * CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)) // ntok END AS q_mean_tok_len_x100,
  CASE WHEN ntok = 0 THEN 0
       ELSE (100 * CAST(len(list_filter(str_split(text,' '), x -> list_contains(['the','a','and','of','to'], x))) AS BIGINT)) // ntok END AS q_stop_pct
FROM t
""",
        "fingerprint_md5": """
SELECT doc_id, substr(md5(text), 1, 16) AS fingerprint FROM documents
""",
        # Gopher-style repetition: docs with <3 space-split tokens emit no
        # row (no trigram support), integer per-mille arithmetic
        "repetition_scores": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), ok AS (
  SELECT doc_id, ts, len(ts) AS n FROM tok WHERE len(ts) >= 3
), bg AS (
  SELECT doc_id, ts[r.i] || ' ' || ts[r.i + 1] AS b
  FROM ok, unnest(range(1, n)) AS r(i)
), bgmax AS (
  SELECT doc_id, MAX(c) AS maxc
  FROM (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b)
  GROUP BY doc_id
), tg AS (
  SELECT doc_id, COUNT(DISTINCT t3) AS d
  FROM (SELECT doc_id, ts[r.i] || ' ' || ts[r.i + 1] || ' ' || ts[r.i + 2] AS t3
        FROM ok, unnest(range(1, n - 1)) AS r(i))
  GROUP BY doc_id
)
SELECT ok.doc_id,
       1000 * bgmax.maxc // (ok.n - 1) AS top_bigram_permille,
       1000 * (ok.n - 2 - tg.d) // (ok.n - 2) AS dup_trigram_permille
FROM ok JOIN bgmax USING (doc_id) JOIN tg USING (doc_id)
""",
        # 32-token windows every 24 tokens; final window may be short
        "chunk_documents": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), ok AS (
  SELECT doc_id, ts, len(ts) AS n FROM tok WHERE len(ts) > 0
)
SELECT doc_id, CAST(r.s // 24 AS BIGINT) AS chunk_id,
       array_to_string(ts[r.s + 1 : r.s + 32], ' ') AS chunk,
       CAST(least(32, n - r.s) AS BIGINT) AS ntok
FROM ok, unnest(range(0, n, 24)) AS r(s)
""",
        # duplicated 8-token windows; docs with none emit no row
        "kgram_dup_spans": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), ok AS (
  SELECT doc_id, ts, len(ts) AS n FROM tok WHERE len(ts) >= 8
), kg AS (
  SELECT doc_id, array_to_string(ts[r.i : r.i + 7], ' ') AS g
  FROM ok, unnest(range(1, n - 8 + 2)) AS r(i)
), dup AS (
  SELECT g FROM kg GROUP BY g HAVING COUNT(*) >= 2
)
SELECT doc_id, COUNT(*) AS dup_kgrams FROM kg JOIN dup USING (g) GROUP BY doc_id
""",
        "vocab_build": """
WITH tok AS (
  SELECT unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t FROM documents
), c AS (
  SELECT t AS token, COUNT(*) AS freq FROM tok GROUP BY t HAVING COUNT(*) >= 5
)
SELECT token, freq,
       row_number() OVER (ORDER BY freq DESC, token) - 1 AS token_id
FROM c
""",
        "encode_documents": """
WITH ts AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS l FROM documents
), tok AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord FROM ts
), c AS (
  SELECT tok AS token, COUNT(*) AS freq FROM tok GROUP BY tok HAVING COUNT(*) >= 5
), v AS (
  SELECT token, row_number() OVER (ORDER BY freq DESC, token) - 1 AS token_id FROM c
)
SELECT tok.doc_id,
       string_agg(CAST(coalesce(v.token_id, -1) AS VARCHAR), ' ' ORDER BY tok.ord) AS ids,
       CAST(COUNT(*) AS BIGINT) AS ntok,
       CAST(SUM(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM tok LEFT JOIN v ON v.token = tok.tok
GROUP BY tok.doc_id
""",
        "pmi_collocations": """
WITH ts AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS l FROM documents
), tok AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord FROM ts
), big AS (
  SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS c_xy
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), uni AS (
  SELECT tok AS t, COUNT(*) AS c FROM tok GROUP BY tok
), n AS (SELECT SUM(c) AS total FROM uni)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       CAST(CAST(1000000 AS HUGEINT) * c_xy * n.total // (u1.c * u2.c) AS BIGINT) AS score_x1m
FROM big JOIN uni u1 ON u1.t = big.w1 JOIN uni u2 ON u2.t = big.w2, n
ORDER BY score_x1m DESC, w1, w2 LIMIT 20
""",
        "train_val_split": """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT % 1000 < 100
            THEN 'val' ELSE 'train' END AS split
FROM documents
""",
        "redact_pii": r"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, c1,
         len(regexp_extract_all(t1, 'https?://[^\s]+')) AS c2,
         regexp_replace(t1, 'https?://[^\s]+', '<URL>', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT doc_id, c1, c2,
         len(regexp_extract_all(t2, '[0-9]{4,}')) AS c3,
         regexp_replace(t2, '[0-9]{4,}', '<NUM>', 'g') AS t3
  FROM s2
)
SELECT doc_id, t3 AS text_redacted, CAST(c1 + c2 + c3 AS BIGINT) AS n_pii FROM s3
""",
        "stratified_sample": """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 5
""",
        "pack_sequences": r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ntok,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT AS h
  FROM documents
), w AS (
  SELECT doc_id, ntok, CAST(h % 32 AS BIGINT) AS b,
         COALESCE(SUM(ntok) OVER (
           PARTITION BY h % 32 ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, CAST(b * 4294967296 + cum // 256 AS BIGINT) AS pack_id, ntok FROM w
""",
        "ngram_top": """
WITH toks AS (
  SELECT list_filter(str_split(text, ' '), x -> x <> '') AS t FROM documents
), g AS (
  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
)
SELECT gram, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY gram ORDER BY n DESC, gram LIMIT 20
""",
        "html_strip": html_synth
        + f"""
SELECT doc_id,
       {strip_expr.format(src="regexp_replace(html, '<style>.*?</style>|<script>.*?</script>', '', 'g')")} AS text_stripped
FROM h
""",
        "html_main_content": html_synth
        + f"""
, b AS (
  SELECT doc_id, regexp_extract_all(html, '<p>.*?</p>|<div>.*?</div>') AS blocks FROM h
), e AS (
  SELECT doc_id, len(blocks) AS n_blocks,
    list_transform(blocks, x -> {strip_expr.format(src="x")}) AS btxt,
    list_transform(blocks,
      x -> COALESCE(length(array_to_string(regexp_extract_all(x, '<a [^>]*>(.*?)</a>', 1), '')), 0)) AS llen
  FROM b
), k AS (
  SELECT doc_id, n_blocks,
    list_filter(btxt, (x, i) -> length(x) >= 25 AND 2 * llen[i] < length(x)) AS kept
  FROM e
)
SELECT doc_id, COALESCE(array_to_string(kept, ' '), '') AS main_text,
       CAST(n_blocks AS BIGINT) AS n_blocks, CAST(len(kept) AS BIGINT) AS n_kept
FROM k
""",
        "html_spans": html_synth
        + r"""
, tk AS (
  SELECT doc_id, regexp_extract_all(html, '<p>.*?</p>|<img src="[^"]*"/>') AS toks FROM h
), u AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i FROM tk
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
  CASE WHEN tok LIKE '<img%' THEN 'image' ELSE 'text' END AS kind,
  CASE WHEN tok LIKE '<img%' THEN ''
       ELSE trim(regexp_replace(regexp_replace(tok, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) END AS text,
  CASE WHEN tok LIKE '<img%' THEN regexp_extract(tok, '<img src="([^"]*)"/>', 1) ELSE '' END AS media_ref
FROM u
""",
        # the layout scatter is seeded-jitter-invertible by construction, so
        # reconstruction must round-trip the token sequence exactly
        "layout_reading_order": r"""
SELECT doc_id, array_to_string(regexp_extract_all(text, '\S+'), ' ') AS text_rebuilt
FROM documents
WHERE len(regexp_extract_all(text, '\S+')) > 0
""",
        "asof_view_before_purchase": """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
v AS (SELECT * FROM events WHERE event_type = 'view'),
j AS (
  SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
         CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) // 1000000 AS gap_s,
         row_number() OVER (
           PARTITION BY p.event_id ORDER BY v.ts DESC, v.event_id DESC
         ) AS rn
  FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
)
SELECT purchase_id, user_id, view_id, gap_s FROM j WHERE rn = 1
""",
        # KMV sketch: k smallest distinct shingle hashes → integer estimator
        "kmv_distinct": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), sh AS (
  SELECT DISTINCT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), s AS (
  SELECT ('0x' || substr(md5(g), 1, 16))::UBIGINT AS hv,
         row_number() OVER (ORDER BY ('0x' || substr(md5(g), 1, 16))::UBIGINT) AS rn,
         COUNT(*) OVER () AS n
  FROM sh
)
SELECT CAST(256 AS BIGINT) AS k,
       CAST(COALESCE(CASE WHEN max(n) < 256 THEN max(n)
                 ELSE (CAST(255 AS HUGEINT) * CAST('18446744073709551616' AS HUGEINT))
                      // CAST(max(CASE WHEN rn = 256 THEN hv END) AS HUGEINT)
            END, 0) AS BIGINT) AS n_distinct_est
FROM s
""",
        # 8-gram train→val contamination over the md5 hash split
        "contamination": """
WITH d AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT % 1000 AS h
  FROM documents
), tok AS (
  SELECT doc_id, h, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM d
), g AS (
  SELECT doc_id, h,
         ts[i]||' '||ts[i+1]||' '||ts[i+2]||' '||ts[i+3]||' '||ts[i+4]||' '||ts[i+5]||' '||ts[i+6]||' '||ts[i+7] AS gram
  FROM tok, unnest(range(1, len(ts) - 6)) AS r(i)
), ev AS (SELECT DISTINCT gram FROM g WHERE h < 100),
tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE h >= 100)
SELECT tr.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id
""",
        # integer TF-IDF top-3 terms per doc (score = tf*1e6 // df)
        "salient_terms": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), s AS (
  SELECT doc_id, term, tf, df, tf * 1000000 // df AS score_x1m,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY tf * 1000000 // df DESC, term ASC
         ) AS rnk
  FROM tf JOIN dft USING (term)
)
SELECT doc_id, term, tf, df, score_x1m, CAST(rnk AS BIGINT) AS rnk
FROM s WHERE rnk <= 3
""",
        # conjunctive keyword search: docs with ALL terms, by total tf
        "keyword_search": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS w
  FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok WHERE w IN ('join', 'hash')
  GROUP BY 1, 2
), ok AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score FROM tf
  GROUP BY doc_id HAVING count(DISTINCT w) = 2
)
SELECT doc_id, score FROM ok ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # new crawl (src5..19) anti-joined against the snapshot (src0..4)
        "incremental_dedup": """
WITH newd AS (
  SELECT doc_id, substr(md5(text), 1, 16) AS fingerprint FROM documents
  WHERE source NOT IN ('src0','src1','src2','src3','src4')
), snap AS (
  SELECT DISTINCT substr(md5(text), 1, 16) AS fingerprint FROM documents
  WHERE source IN ('src0','src1','src2','src3','src4')
)
SELECT min(doc_id) AS doc_id, fingerprint FROM newd
WHERE fingerprint NOT IN (SELECT fingerprint FROM snap)
GROUP BY fingerprint
""",
        # left-outer join: customers keep their zero order counts
        # IVM: the monoid merge of stored view + delta equals the full
        # recompute, which is what the oracle runs
        "ivm_type_counts": """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c
FROM events GROUP BY 1
""",
        # bucketed layout round-trips losslessly, so the oracle is the
        # plain join+aggregate over the original tables
        "bucketed_cust_orders": """
SELECT c_custkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_total_c
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY 1, 2
""",
        "customer_order_counts": """
SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
        # per-user cumulative value (cents), ties broken by event_id
        "user_running_value": """
SELECT event_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_c
FROM events
""",
        # bounded row-window sum (7-event spend) per user
        "user_rolling_value": """
SELECT event_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS roll_c
FROM events
""",
        # staged conversion funnel: each stage strictly after the user's
        # first qualifying event of the previous stage
        "funnel_counts": """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s1 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
       CAST(count(*) AS BIGINT) AS n_users FROM s0
UNION ALL SELECT 1, 'click', count(*) FROM s1
UNION ALL SELECT 2, 'purchase', count(*) FROM s2
""",
        # grouped MODE with deterministic tie-break (count desc, value asc)
        "user_mode_event": """
SELECT user_id, event_type AS mode_event_type, n FROM (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (
           PARTITION BY user_id ORDER BY count(*) DESC, event_type
         ) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""",
        # type-token ratio (lexical diversity) per document
        "doc_ttr": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), d AS (
  SELECT doc_id, CAST(count(DISTINCT t) AS BIGINT) AS dt,
         CAST(count(*) AS BIGINT) AS nt
  FROM tok GROUP BY doc_id
)
SELECT doc.doc_id,
       CAST(coalesce(d.dt, 0) AS BIGINT) AS distinct_toks,
       CAST(coalesce(d.nt, 0) AS BIGINT) AS n_toks,
       CAST(CASE WHEN coalesce(d.nt, 0) = 0 THEN 0
                 ELSE (1000 * d.dt) // d.nt END AS BIGINT) AS ttr_pm
FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
""",
        # long→wide count pivot: source rows × fixed lang columns
        "docs_lang_pivot": """
SELECT source,
       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh,
       CAST(sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS other
FROM documents GROUP BY source
""",
        # GROUP BY ROLLUP with 'ALL' standing in for the rolled-up NULL
        "revenue_rollup": """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
        "revenue_cube": """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""",
        "views_before_purchase_1h": """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       CAST(COALESCE(SUM(CASE WHEN v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_views_1h
FROM p LEFT JOIN v ON v.user_id = p.user_id
GROUP BY p.event_id, p.user_id
""",
        "customers_no_orders": """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2001-06-01'
)
""",
        "value_quantiles": """
WITH v AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c FROM events),
s AS (SELECT value_c, row_number() OVER (ORDER BY value_c) AS rn,
             COUNT(*) OVER () AS n
      FROM v)
SELECT CAST(q.q_pm AS BIGINT) AS q_pm, s.value_c AS value_c
FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
JOIN s ON s.rn = CAST(ceil(q.q_pm * s.n / 1000.0) AS BIGINT)
""",
        # PERCENTILE_CONT ×1000: i = (n−1)·q // 1000, f = (n−1)·q % 1000,
        # out = v_i·1000 + (v_{i+1} − v_i)·f, top edge clamped — the same
        # integer recurrence the Ray side runs, no float interpolation
        "value_quantiles_cont": """
WITH v AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
s AS (SELECT c, row_number() OVER (ORDER BY c) - 1 AS r FROM v),
meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
p AS (
  SELECT q.q_pm,
         ((SELECT n FROM meta) - 1) * q.q_pm // 1000 AS i,
         ((SELECT n FROM meta) - 1) * q.q_pm % 1000 AS f
  FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
)
SELECT CAST(p.q_pm AS BIGINT) AS q_pm,
       CAST(lo.c * 1000 + (COALESCE(hi.c, lo.c) - lo.c) * p.f AS BIGINT)
         AS value_x1000
FROM p
JOIN s lo ON lo.r = p.i
LEFT JOIN s hi ON hi.r = p.i + 1
""",
        # HDR-histogram quantile sketch: deterministic log-spaced
        # bucketing (64 sub-buckets/octave) → grouped counts → cumsum →
        # bucket lower bound; the e-correction CASE keeps the float log2
        # exponent integer-exact at octave edges (cents < 2^53 here, so
        # the BIGINT shifts cannot overflow)
        "value_quantiles_hdr": """
WITH v AS (SELECT greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 0) AS c
           FROM events),
e0 AS (SELECT c, CAST(floor(log2(c)) AS BIGINT) AS e FROM v WHERE c >= 64),
e1 AS (SELECT c, CASE WHEN (1::BIGINT << CAST(e + 1 AS INTEGER)) <= c THEN e + 1
                      WHEN (1::BIGINT << CAST(e AS INTEGER)) > c THEN e - 1
                      ELSE e END AS e FROM e0),
b AS (
  SELECT c AS idx FROM v WHERE c < 64
  UNION ALL
  SELECT (e - 5) * 64 + (c >> CAST(e - 6 AS INTEGER)) - 64 FROM e1
),
hist AS (SELECT idx, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY idx),
cum AS (SELECT idx, sum(n) OVER (ORDER BY idx) AS cn,
               (SELECT sum(n) FROM hist) AS total FROM hist),
pick AS (
  SELECT q.q_pm, min(cum.idx) AS idx
  FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
  JOIN cum ON cum.cn >= (q.q_pm * cum.total + 999) // 1000
  GROUP BY q.q_pm
)
SELECT CAST(q_pm AS BIGINT) AS q_pm,
       CAST(CASE WHEN idx < 64 THEN idx
            ELSE (64 + idx % 64) << CAST(idx // 64 - 1 AS INTEGER) END AS BIGINT)
         AS approx
FROM pick
""",
        # grouped HDR sketch: identical bucketing to value_quantiles_hdr,
        # cumsum/total windows partitioned per group
        "quantiles_hdr_by_type": """
WITH v AS (SELECT event_type,
                  greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 0) AS c
           FROM events),
e0 AS (SELECT event_type, c, CAST(floor(log2(c)) AS BIGINT) AS e
       FROM v WHERE c >= 64),
e1 AS (SELECT event_type, c,
              CASE WHEN (1::BIGINT << CAST(e + 1 AS INTEGER)) <= c THEN e + 1
                   WHEN (1::BIGINT << CAST(e AS INTEGER)) > c THEN e - 1
                   ELSE e END AS e FROM e0),
b AS (
  SELECT event_type, c AS idx FROM v WHERE c < 64
  UNION ALL
  SELECT event_type, (e - 5) * 64 + (c >> CAST(e - 6 AS INTEGER)) - 64 FROM e1
),
hist AS (SELECT event_type, idx, CAST(count(*) AS BIGINT) AS n
         FROM b GROUP BY event_type, idx),
cum AS (SELECT event_type, idx,
               sum(n) OVER (PARTITION BY event_type ORDER BY idx) AS cn,
               sum(n) OVER (PARTITION BY event_type) AS total FROM hist),
pick AS (
  SELECT cum.event_type, q.q_pm, min(cum.idx) AS idx
  FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
  JOIN cum ON cum.cn >= (q.q_pm * cum.total + 999) // 1000
  GROUP BY cum.event_type, q.q_pm
)
SELECT event_type, CAST(q_pm AS BIGINT) AS q_pm,
       CAST(CASE WHEN idx < 64 THEN idx
            ELSE (64 + idx % 64) << CAST(idx // 64 - 1 AS INTEGER) END AS BIGINT)
         AS approx
FROM pick
""",
        # per-group OLS in HUGEINT; // truncates toward zero in DuckDB,
        # so floor division is emulated with the remainder correction
        # two-phase Pareto skyline == NOT EXISTS a strict dominator
        # AS-OF snapshot: the run whose validity interval contains the
        # dataset-midpoint cut == the max valid_from <= cut per user
        # sweep-line peak: +1 at session start, -1 at end+1, max prefix
        # 4-step greedy subsequence funnel: each sN CTE is the earliest
        # step-N event strictly after the user's chosen step-(N-1) event
        # exact Gini: sorted-form weighted sum in HUGEINT; tie order is
        # irrelevant (equal values share a coefficient block)
        "user_type_concentration": """
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY user_id, event_type)
SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
       CAST(1000000 * sum(n * n) // (sum(n) * sum(n)) AS BIGINT) AS simpson_x1m
FROM c GROUP BY user_id
""",
        "gini_by_type": """
WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
r AS (SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY c) AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(c) OVER (PARTITION BY event_type) AS s
      FROM v)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(CAST(1000000 AS HUGEINT)
            * CAST(sum((2 * i - n - 1) * c) AS HUGEINT)
            // (CAST(max(n) AS HUGEINT) * CAST(max(s) AS HUGEINT)) AS BIGINT)
         AS gini_x1m
FROM r GROUP BY event_type HAVING max(s) <> 0
""",
        "funnel_depths": """
WITH e AS (SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
                  event_id FROM events),
s1 AS (SELECT user_id, us, event_id FROM (
         SELECT user_id, us, event_id,
                row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) rn
         FROM e WHERE event_type = 'signup') WHERE rn = 1),
s2 AS (SELECT user_id, us, event_id FROM (
         SELECT e.user_id, e.us, e.event_id,
                row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) rn
         FROM e JOIN s1 ON e.user_id = s1.user_id
         WHERE e.event_type = 'view'
           AND (e.us > s1.us OR (e.us = s1.us AND e.event_id > s1.event_id)))
       WHERE rn = 1),
s3 AS (SELECT user_id, us, event_id FROM (
         SELECT e.user_id, e.us, e.event_id,
                row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) rn
         FROM e JOIN s2 ON e.user_id = s2.user_id
         WHERE e.event_type = 'click'
           AND (e.us > s2.us OR (e.us = s2.us AND e.event_id > s2.event_id)))
       WHERE rn = 1),
s4 AS (SELECT user_id, us, event_id FROM (
         SELECT e.user_id, e.us, e.event_id,
                row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) rn
         FROM e JOIN s3 ON e.user_id = s3.user_id
         WHERE e.event_type = 'purchase'
           AND (e.us > s3.us OR (e.us = s3.us AND e.event_id > s3.event_id)))
       WHERE rn = 1),
d AS (SELECT u.user_id,
             CASE WHEN u.user_id IN (SELECT user_id FROM s4) THEN 4
                  WHEN u.user_id IN (SELECT user_id FROM s3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM s2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM s1) THEN 1
                  ELSE 0 END AS depth
      FROM (SELECT DISTINCT user_id FROM e) u)
SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY depth
""",
        "peak_concurrency": """
WITH x AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
o AS (SELECT user_id, s,
             CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s) > 1800
                  THEN 1 ELSE 0 END AS brk FROM x),
w AS (SELECT user_id, s,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS sid FROM o),
sess AS (SELECT user_id, sid, min(s) AS start_s, max(s) AS end_s
         FROM w GROUP BY user_id, sid),
b AS (SELECT start_s AS t, 1 AS d FROM sess
      UNION ALL SELECT end_s + 1, -1 FROM sess),
g AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM b GROUP BY t),
c AS (SELECT sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS run FROM g)
SELECT CAST(max(run) AS BIGINT) AS peak FROM c
""",
        "type_token_ratio": """
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
)
SELECT doc_id,
       CAST(1000 * count(DISTINCT tok) // count(*) AS BIGINT) AS ttr_pm
FROM toks GROUP BY doc_id
""",
        "modal_event_per_user": """
SELECT user_id, event_type AS modal_type, n FROM (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""",
        "status_as_of": """
WITH cutq AS (SELECT (CAST(epoch_us(min(ts)) AS BIGINT)
                      + CAST(epoch_us(max(ts)) AS BIGINT)) // 2 AS cut
              FROM events),
e AS (SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us, event_id
      FROM events),
o AS (SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
r AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id FROM o),
runs AS (SELECT user_id, event_type, run_id, min(us) AS valid_from_us
         FROM r GROUP BY user_id, event_type, run_id),
pick AS (SELECT user_id, event_type AS status, valid_from_us,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY valid_from_us DESC, run_id DESC) AS rn
         FROM runs WHERE valid_from_us <= (SELECT cut FROM cutq))
SELECT user_id, status, valid_from_us FROM pick WHERE rn = 1
""",
        "part_skyline": """
WITH p AS (SELECT p_partkey, p_size,
                  CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
           FROM part)
SELECT p_partkey, p_size, price_c FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_size >= a.p_size AND b.price_c <= a.price_c
    AND (b.p_size > a.p_size OR b.price_c < a.price_c)
)
""",
        "value_trend_by_type": """
WITH v AS (SELECT event_type,
                  CAST(epoch_us(ts) // 3600000000 AS HUGEINT) AS x,
                  CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT) AS y
           FROM events),
s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
             sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM v GROUP BY event_type),
r AS (SELECT event_type, n, n * sxx - sx * sx AS den,
             CAST(1000000 AS HUGEINT) * (n * sxy - sx * sy) AS nums,
             CAST(1000000 AS HUGEINT) * (sy * sxx - sx * sxy) AS numi
      FROM s WHERE n * sxx - sx * sx <> 0)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(nums // den - CASE WHEN nums % den <> 0 AND nums < 0
                          THEN 1 ELSE 0 END AS BIGINT) AS slope_x1m,
       CAST(numi // den - CASE WHEN numi % den <> 0 AND numi < 0
                          THEN 1 ELSE 0 END AS BIGINT) AS intercept_x1m
FROM r
""",
        "latest_order_per_customer": """
SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey, o_date_us FROM (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_us(o_orderdate) AS BIGINT) AS o_date_us,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY epoch_us(o_orderdate) DESC, o_orderkey
         ) AS rank
  FROM orders
) WHERE rank <= 1
""",
        # mod-2^64 sum of per-row 64-bit md5 prefixes, hex-formatted
        "table_checksum": """
SELECT lpad(lower(hex(CAST(
         SUM(('0x' || substr(md5(doc_id::VARCHAR || ':' || coalesce(text, '')), 1, 16))::UBIGINT::HUGEINT)
         % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT))), 16, '0') AS checksum
FROM documents
""",
        "quantiles_by_type": """
WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
           FROM events),
s AS (SELECT event_type, value_c,
             row_number() OVER (PARTITION BY event_type ORDER BY value_c) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v)
SELECT s.event_type, CAST(q.q_pm AS BIGINT) AS q_pm, s.value_c AS value_c
FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
JOIN s ON s.rn = CAST(ceil(q.q_pm * s.n / 1000.0) AS BIGINT)
""",
        "top2_events_per_user": """
SELECT user_id, rank, event_id, value_c FROM (
  SELECT user_id, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC, event_id
         ) AS rank
  FROM events
) WHERE rank <= 2
""",
        "corpus_mix": """
WITH d AS (
  SELECT 'docs' AS src, CAST(doc_id AS BIGINT) AS rec_id, text
  FROM documents
  WHERE ('0x' || substr(md5('docs:' || doc_id::VARCHAR), 1, 16))::UBIGINT % 1000 < 700
), e AS (
  SELECT 'events' AS src, CAST(event_id AS BIGINT) AS rec_id, props AS text
  FROM events
  WHERE ('0x' || substr(md5('events:' || event_id::VARCHAR), 1, 16))::UBIGINT % 1000 < 300
)
SELECT * FROM d UNION ALL SELECT * FROM e
""",
        "knn_top5": knn5_sql,
        # exact-degenerate ANN configs (nprobe=n_centroids / n_planes=0)
        # are provably equal to brute force → same oracle
        "knn_ivf": knn5_sql,
        "knn_lsh": knn5_sql,
        "embedding_dup_pairs": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5) AS BIGINT) AS cos_x1e6
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5) AS BIGINT) >= 300000
""",
        "user_active_time": """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS st, epoch_us(ts) + 300 * 1000000 AS en FROM events
), o AS (
  SELECT user_id, st, en,
         MAX(en) OVER (PARTITION BY user_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM s
), g AS (
  SELECT user_id, st, en,
         CASE WHEN prev_max IS NULL OR st > prev_max THEN 1 ELSE 0 END AS ni
  FROM o
), i AS (
  SELECT user_id, st, en,
         SUM(ni) OVER (PARTITION BY user_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM g
), ext AS (
  SELECT user_id, isl, MAX(en) - MIN(st) AS cov FROM i GROUP BY user_id, isl
)
SELECT user_id, CAST(SUM(cov) // 1000000 AS BIGINT) AS active_s,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM ext GROUP BY user_id
""",
        "profile_documents": """
SELECT 'doc_id' AS col, COUNT(*) AS n, COUNT(*) - COUNT(doc_id) AS n_null,
       CAST(MIN(doc_id) AS VARCHAR) AS min_s, CAST(MAX(doc_id) AS VARCHAR) AS max_s FROM documents
UNION ALL
SELECT 'text', COUNT(*), COUNT(*) - COUNT(text), MIN(text), MAX(text) FROM documents
UNION ALL
SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), MIN(lang), MAX(lang) FROM documents
UNION ALL
SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), MIN(source), MAX(source) FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
""",
        "validate_documents": """
SELECT 'doc_id_nonneg' AS rule,
       CAST(COUNT(*) FILTER (WHERE (doc_id >= 0) IS NOT TRUE) AS BIGINT) AS n_violations FROM documents
UNION ALL
SELECT 'lang_latin_script',
       CAST(COUNT(*) FILTER (WHERE (lang IN ('en','de','fr','es')) IS NOT TRUE) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_chars_matches_text',
       CAST(COUNT(*) FILTER (WHERE (length(text) = n_chars) IS NOT TRUE) AS BIGINT) FROM documents
UNION ALL
SELECT 'text_nonempty',
       CAST(COUNT(*) FILTER (WHERE (length(text) > 0) IS NOT TRUE) AS BIGINT) FROM documents
""",
        "bloom_new_docs": """
WITH snapb AS (
  SELECT DISTINCT ('0x' || substr(md5(text || '#' || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % 65536 AS b
  FROM documents, unnest(range(4)) AS r(j)
  WHERE source IN ('src0','src1','src2','src3','src4')
), newp AS (
  SELECT doc_id, ('0x' || substr(md5(text || '#' || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % 65536 AS b
  FROM documents, unnest(range(4)) AS r(j)
  WHERE source NOT IN ('src0','src1','src2','src3','src4')
)
SELECT doc_id FROM newp LEFT JOIN snapb ON newp.b = snapb.b
GROUP BY doc_id HAVING bool_or(snapb.b IS NULL)
""",
        "rarity_score": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), tf AS (
  SELECT t, COUNT(*) AS n FROM tok GROUP BY t
), d AS (
  SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t
)
SELECT d.doc_id AS doc_id, CAST(SUM(d.c * (1000000000 // tf.n)) AS BIGINT) AS rarity
FROM d JOIN tf USING (t) GROUP BY d.doc_id
""",
        # token_chi2: 2×2 presence table per token vs lang='en'; HUGEINT
        # keeps 10^6·N·(ad−bc)² exact (the impl scores in Python ints);
        # df bounds exclude the undefined everywhere/nowhere columns
        "token_chi2": """
WITH dt AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS token
    FROM documents
  )
), cls AS (
  SELECT doc_id, (lang = 'en') AS pos FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS HUGEINT) AS np
  FROM cls
), tc AS (
  SELECT token,
         CAST(SUM(CASE WHEN c.pos THEN 1 ELSE 0 END) AS HUGEINT) AS a,
         CAST(COUNT(*) AS HUGEINT) AS df
  FROM dt JOIN cls c USING (doc_id)
  GROUP BY token
)
SELECT token, CAST(df AS BIGINT) AS df,
       CAST((1000000 * n
             * (a * ((n - np) - (df - a)) - (df - a) * (np - a))
             * (a * ((n - np) - (df - a)) - (df - a) * (np - a)))
            // (df * (n - df) * np * (n - np)) AS BIGINT) AS chi2_x1m
FROM tc, tot
WHERE df >= 5 AND df < n AND np > 0 AND np < n
ORDER BY chi2_x1m DESC, token
LIMIT 50
""",
        "dedup_spans": """
WITH toks AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), ch AS (
  SELECT doc_id, CAST(j AS BIGINT) AS idx,
         array_to_string(list_slice(ts, j * 8 + 1, j * 8 + 8), ' ') AS line,
         CAST(ceil(len(ts) / 8.0) AS BIGINT) AS n_spans
  FROM toks, unnest(range(CAST(ceil(len(ts) / 8.0) AS BIGINT))) r(j)
), freq AS (
  SELECT line, COUNT(*) AS n FROM ch GROUP BY line
), kept AS (
  SELECT ch.doc_id, ch.idx, ch.line, ch.n_spans
  FROM ch JOIN freq USING (line) WHERE freq.n < 3
)
SELECT doc_id,
       string_agg(line, ' ' ORDER BY idx) AS text,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(n_spans) - COUNT(*) AS BIGINT) AS n_removed
FROM kept GROUP BY doc_id
""",
        "bigram_surprisal": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), bi AS (
  SELECT doc_id, ts[i] AS x, ts[i + 1] AS y
  FROM tok, unnest(range(1, len(ts))) r(i)
), cxy AS (
  SELECT x, y, COUNT(*) AS nxy FROM bi GROUP BY x, y
), cx AS (
  SELECT x, COUNT(*) AS nx FROM bi GROUP BY x
), d AS (
  SELECT doc_id, x, y, COUNT(*) AS c FROM bi GROUP BY doc_id, x, y
)
SELECT d.doc_id AS doc_id,
       CAST(SUM(d.c * (1000000 * cx.nx // cxy.nxy)) AS BIGINT) AS surprisal
FROM d JOIN cxy USING (x, y) JOIN cx USING (x)
GROUP BY d.doc_id
""",
        "value_ntile": """
SELECT event_id,
       CAST(ntile(4) OVER (ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
""",
        "snm_pairs": """
WITH k AS (
  SELECT doc_id, substr(text, 1, 24) AS key,
         list_distinct(list_filter(str_split(text, ' '), x -> x <> '')) AS ts
  FROM documents
), r AS (
  SELECT doc_id, ts, row_number() OVER (ORDER BY key, doc_id) - 1 AS rnk FROM k
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(1000 * len(list_intersect(a.ts, b.ts))
            // (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
            AS BIGINT) AS j_pm
FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 4
WHERE (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) > 0
  AND 1000 * len(list_intersect(a.ts, b.ts))
      >= 800 * (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
""",
        "cms_registers": """
WITH tok AS (
  SELECT unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), cnt AS (
  SELECT t, COUNT(*) AS n FROM tok GROUP BY t
), h AS (
  SELECT CAST(r AS BIGINT) AS row_idx,
         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || t), 1, 16))::UBIGINT
              % 256 AS BIGINT) AS col_idx,
         n
  FROM cnt, unnest(range(4)) rr(r)
)
SELECT row_idx, col_idx, CAST(SUM(n) AS BIGINT) AS cnt
FROM h GROUP BY row_idx, col_idx
""",
        "lineitem_unpivot": """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', CAST(l_discount AS DOUBLE)
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
""",
        "user_ewma": """
WITH RECURSIVE ev AS (
  SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), w(user_id, rn, event_id, s) AS (
  SELECT user_id, rn, event_id, v FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, ev.event_id, (ev.v + 3 * w.s) // 4
  FROM w JOIN ev ON ev.user_id = w.user_id AND ev.rn = w.rn + 1
)
SELECT event_id, CAST(s AS BIGINT) AS ewma FROM w
""",
        "debounce_events": """
WITH RECURSIVE ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), w(user_id, rn, event_id, s, kept) AS (
  SELECT user_id, rn, event_id, t, TRUE FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, ev.event_id,
         CASE WHEN ev.t - w.s >= 21600000000 THEN ev.t ELSE w.s END,
         ev.t - w.s >= 21600000000
  FROM w JOIN ev ON ev.user_id = w.user_id AND ev.rn = w.rn + 1
)
SELECT event_id FROM w WHERE kept
""",
        "media_sniff": """
SELECT doc_id,
       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
                       WHEN 3 THEN 'tiff' WHEN 4 THEN 'bmp' ELSE 'raw8'
       END AS format,
       CAST(CASE WHEN doc_id % 6 = 5 THEN -1 ELSE 16 + doc_id % 17 END AS BIGINT)
         AS width,
       CAST(CASE WHEN doc_id % 6 = 5 THEN -1 ELSE 12 + doc_id % 13 END AS BIGINT)
         AS height
FROM documents
""",
        "value_quantiles_binned": """
WITH b AS (SELECT CAST(floor(value * 10) AS BIGINT) AS bin FROM events),
s AS (SELECT bin, row_number() OVER (ORDER BY bin) AS rn, COUNT(*) OVER () AS n FROM b)
SELECT CAST(q.q_pm AS BIGINT) AS q_pm, s.bin AS bin
FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
JOIN s ON s.rn = CAST(ceil(q.q_pm * s.n / 1000.0) AS BIGINT)
""",
        "frame_checksums": """
WITH fr AS (
  SELECT doc_id, f FROM documents, unnest(range(0, 6, 2)) AS r(f)
), s AS (
  SELECT doc_id, f, (doc_id * 7 + f * 13 + i * i) % 256 AS p
  FROM fr, unnest(range(1024)) AS r2(i)
)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(SUM(p) AS BIGINT) AS checksum
FROM s GROUP BY doc_id, f
""",
        # audio_energy is assigned below (needs the ADPCM step table
        # rendered into a recursive CTE)
        "semantic_dedup": """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5) AS BIGINT) >= 300000
), edges AS (
  SELECT va AS src, vb AS dst FROM p UNION ALL SELECT vb, va FROM p
), walk(node, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.r
), comp AS (
  SELECT node, MIN(r) AS rep FROM walk GROUP BY node
)
SELECT rep AS vec_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM comp GROUP BY rep
""",
        "text_hash_dup_pairs": """
WITH tok AS (
  SELECT doc_id, lang, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), g AS (
  SELECT DISTINCT doc_id, lang, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), dims AS (
  SELECT doc_id, lang, ('0x' || substr(md5(gram), 1, 16))::UBIGINT % 64 AS d, COUNT(*) AS c
  FROM g GROUP BY doc_id, lang, d
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.c * b.c) AS dot
  FROM dims a JOIN dims b ON a.lang = b.lang AND a.d = b.d AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
), norms AS (SELECT doc_id, SUM(c * c) AS n2 FROM dims GROUP BY doc_id)
SELECT d.doc_a, d.doc_b
FROM dots d JOIN norms x ON x.doc_id = d.doc_a JOIN norms y ON y.doc_id = d.doc_b
WHERE d.dot > 0 AND 10000 * d.dot * d.dot >= 4900 * x.n2 * y.n2
""",
        "priority_sample": """
SELECT doc_id,
       CAST((((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT) >> 1)
             // CAST(greatest(n_chars, 1) AS UBIGINT)) AS BIGINT) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT 50
""",
        "nearest_centroid": """
WITH e AS (
  SELECT vec_id, label,
         generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
), c AS (
  SELECT label AS clabel, d, SUM(v) / COUNT(*) AS cv FROM e GROUP BY label, d
), dist AS (
  SELECT e.vec_id, c.clabel, SUM((e.v - c.cv) * (e.v - c.cv)) AS d2
  FROM e JOIN c USING (d) GROUP BY e.vec_id, c.clabel
)
SELECT vec_id, CAST(clabel AS BIGINT) AS assigned_label FROM (
  SELECT vec_id, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM dist
) WHERE rn = 1
""",
        "orders_by_month": """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
FROM orders GROUP BY month
""",
        "revenue_by_region": """
SELECT r.r_name AS r_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
""",
        "q1_pricing": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "revenue_by_nation": """
SELECT n_name, revenue_c FROM (
  SELECT n.n_name AS n_name,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
  ORDER BY revenue_c DESC, n_name
  LIMIT 10
)
""",
        "revenue_by_brand": """
SELECT p.p_brand AS p_brand,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
        "events_tumbling": """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events GROUP BY 1, 2
""",
        "events_sliding": """
WITH x AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s, event_type, value FROM events
), w AS (
  SELECT (s // 1800) * 1800 AS window_start_s, event_type, value FROM x
  UNION ALL
  SELECT (s // 1800) * 1800 - 1800 AS window_start_s, event_type, value FROM x
)
SELECT window_start_s, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM w GROUP BY window_start_s, event_type
""",
        "dup_cluster_size_hist": """
WITH g AS (
  SELECT md5(coalesce(text, '')) AS fp, COUNT(*) AS sz
  FROM documents GROUP BY 1 HAVING COUNT(*) > 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM g GROUP BY sz
""",
        "hourly_seasonality": """
SELECT CAST(hour(ts) AS BIGINT) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events GROUP BY 1, 2
""",
        "jaccard_band_hist": """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pr AS (
  SELECT (1000 * i) // (sa.n + sb.n - i) AS jacc_pm
  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE 1000 * i >= 20 * (sa.n + sb.n - i)
)
SELECT CAST(jacc_pm // 100 AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pr GROUP BY 1
""",
        "pii_rate_by_source": r"""
WITH s1 AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT source, c1,
         len(regexp_extract_all(t1, 'https?://[^\s]+')) AS c2,
         regexp_replace(t1, 'https?://[^\s]+', '<URL>', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT source, c1 + c2 + len(regexp_extract_all(t2, '[0-9]{4,}')) AS n
  FROM s2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       CAST(SUM(n) AS BIGINT) AS n_pii,
       CAST(1000 * SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
         AS pii_doc_pm
FROM s3 GROUP BY source
""",
        "join_cardinality": """
WITH lc AS (
  SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
), rc AS (
  SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
), p AS (
  SELECT CAST(lc.c AS HUGEINT) * rc.c AS pairs
  FROM lc JOIN rc ON rc.k = lc.k
)
SELECT CAST(SUM(pairs) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) AS BIGINT) AS n_keys_both,
       CAST(MAX(pairs) AS BIGINT) AS max_key_pairs
FROM p
""",
        "supplier_return_rates": """
SELECT l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(1000 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS return_pm
FROM lineitem GROUP BY l_suppkey
""",
        "reorder_gap_quantiles": """
WITH o AS (
  SELECT o_custkey,
         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
         o_orderkey
  FROM orders
), g AS (
  SELECT day - lag(day) OVER (
           PARTITION BY o_custkey ORDER BY day, o_orderkey
         ) AS gap_days
  FROM o
), v AS (
  SELECT gap_days FROM g WHERE gap_days IS NOT NULL
), s AS (
  SELECT gap_days, row_number() OVER (ORDER BY gap_days) AS rn,
         COUNT(*) OVER () AS n
  FROM v
)
SELECT CAST(q.q_pm AS BIGINT) AS q_pm, s.gap_days AS gap_days
FROM (VALUES (250),(500),(750),(900),(990)) q(q_pm)
JOIN s ON s.rn = CAST(ceil(q.q_pm * s.n / 1000.0) AS BIGINT)
""",
        "rfm_segments": """
WITH base AS (
  SELECT o_custkey,
         CAST(epoch(MAX(o_orderdate)) AS BIGINT) AS last_s,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), g AS (
  SELECT MAX(last_s) AS global_last FROM base
), rfm AS (
  SELECT b.o_custkey,
         (g.global_last - b.last_s) // 86400 AS recency_days,
         b.n_orders, b.cents
  FROM base b, g
), t AS (
  SELECT o_custkey,
         ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r,
         ntile(5) OVER (ORDER BY n_orders, o_custkey) AS f,
         ntile(5) OVER (ORDER BY cents, o_custkey) AS m
  FROM rfm
)
SELECT CAST(100 * r + 10 * f + m AS BIGINT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM t GROUP BY 1
""",
        "event_transitions": """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id
         ) AS next_type
  FROM events
), p AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM o WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(1000 * n // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_pm
FROM p
""",
        "sessionize": """
WITH x AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
), o AS (
  SELECT user_id, s,
         CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM x
), w AS (
  SELECT user_id, s,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id, COUNT(*) AS n_events,
       MAX(s) - MIN(s) AS dur_s
FROM w GROUP BY user_id, sid
""",
        # decorrelated correlated subquery: integer cross-multiplication
        # cents·n > sum — no float mean on either side
        "orders_above_avg": """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
  FROM orders
), g AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(total_c) AS BIGINT) AS s
  FROM o GROUP BY 1
)
SELECT o.o_orderkey, o.o_custkey, o.total_c
FROM o JOIN g USING (o_custkey)
WHERE o.total_c * g.n > g.s
""",
        # first-touch attribution: same session rule; channel via
        # first(... ORDER BY s, event_id) so same-second ties are pinned
        "session_attribution": """
WITH x AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), o AS (
  SELECT user_id, event_id, event_type, s,
         CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM x
), w AS (
  SELECT user_id, event_id, event_type, s,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), sess AS (
  SELECT user_id, sid,
         first(event_type ORDER BY s, event_id) AS channel,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM w GROUP BY user_id, sid
)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       CAST((1000 * SUM(conv)) // COUNT(*) AS BIGINT) AS conv_pm
FROM sess GROUP BY channel
""",
        "top_users_by_value": """
SELECT user_id, sum_value_c FROM (
  SELECT user_id, CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
  FROM events GROUP BY user_id
  ORDER BY sum_value_c DESC, user_id LIMIT 10
)
""",
        "top_lineitems": """
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
FROM lineitem
ORDER BY price_c DESC, l_orderkey, l_linenumber
LIMIT 10
""",
        "mktsegment_join": """
SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
        "revenue_forecast": """
SELECT CAST(coalesce(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)), 0)
            // 1000 AS BIGINT) AS revenue_c
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) BETWEEN 30 AND 70
  AND l_quantity < 24
""",
        "promo_revenue": """
WITH j AS (
  SELECT (year(l.l_shipdate) * 100 + month(l.l_shipdate)) AS ship_ym,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev,
         (p.p_type = 'PROMO') AS promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT CAST(ship_ym AS BIGINT) AS ship_ym,
       CAST((1000 * SUM(CASE WHEN promo THEN rev ELSE 0 END)) // SUM(rev) AS BIGINT) AS promo_pm
FROM j GROUP BY ship_ym
""",
        "image_patches": """
WITH px AS (
  SELECT doc_id, i, (doc_id * 11 + (i * i) // 5) % 256 AS p,
         (i // 32) AS row, (i % 32) AS col
  FROM documents, unnest(range(1024)) AS r(i)
)
SELECT doc_id, CAST(row // 8 AS BIGINT) AS patch_row,
       CAST(col // 8 AS BIGINT) AS patch_col,
       CAST(SUM(p) AS BIGINT) AS psum
FROM px GROUP BY doc_id, row // 8, col // 8
""",
        "feature_hashing": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT % 1024 AS BIGINT) AS feat,
       CAST(COUNT(*) AS BIGINT) AS n
FROM tok GROUP BY doc_id, feat
""",
        "target_affinity": """
WITH ts AS (
  SELECT doc_id, lang, list_filter(str_split(text, ' '), x -> x <> '') AS l
  FROM documents
), big AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(l[i] || ' ' || l[i + 1]), 1, 16))::UBIGINT
              % 4096 AS BIGINT) AS f
  FROM ts, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
  WHERE len(l) >= 2
), tgt AS (
  SELECT f, COUNT(*) AS c FROM big WHERE lang = 'en' GROUP BY f
)
SELECT b.doc_id AS doc_id, CAST(SUM(coalesce(t.c, 0)) AS BIGINT) AS affinity
FROM big b LEFT JOIN tgt t USING (f) GROUP BY b.doc_id
""",
        "late_order_priorities": """
WITH lm AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
FROM orders o JOIN lm ON o.o_orderkey = lm.l_orderkey
WHERE epoch_us(lm.max_ship) - epoch_us(o.o_orderdate) > 60 * 86400000000
GROUP BY o.o_orderpriority
""",
        "event_gaps": """
SELECT event_id, user_id,
       CAST(coalesce(
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
         -1) AS BIGINT) AS gap_us
FROM events
""",
        "user_event_paths": """
SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id
""",
        "daily_active_users": """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1
""",
        "sliding_distinct_users": """
WITH x AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s, user_id FROM events
), w AS (
  SELECT (s // 1800) * 1800 AS window_start_s, user_id FROM x
  UNION ALL
  SELECT (s // 1800) * 1800 - 1800 AS window_start_s, user_id FROM x
)
SELECT window_start_s, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM w GROUP BY window_start_s
""",
        "audience_overlap": """
WITH uk AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS kind_a, b.event_type AS kind_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uk a JOIN uk b
  ON b.user_id = a.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
""",
        "partkey_skew_histogram": """
WITH c AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS k FROM lineitem GROUP BY 1
)
SELECT k AS n_occurrences, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM c GROUP BY 1
""",
        # running distinct: no COUNT(DISTINCT) OVER in SQL — the oracle
        # is the quadratic self-join over the same (ts, id) order
        "user_running_distinct": """
SELECT a.event_id,
       CAST(COUNT(DISTINCT b.event_type) AS BIGINT) AS n_kinds
FROM events a
JOIN events b ON b.user_id = a.user_id
  AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id <= a.event_id))
GROUP BY a.event_id
""",
        # trimmed mean: rank-window formulation — keep 1-based ranks
        # (k, n−k], k = n//10; floor mean in int64, same as the Ray fold
        "trimmed_mean_by_type": """
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
), r AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(c) // COUNT(*) AS BIGINT) AS tmean_c
FROM r
WHERE rn > n // 10 AND rn <= n - n // 10
GROUP BY 1
""",
        # CUSUM: the exact integer recurrence replayed per user by a
        # recursive CTE (the ewma/debounce pattern)
        "cusum_flags": """
WITH RECURSIVE v AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec(user_id, rn, event_id, s) AS (
  SELECT user_id, rn, event_id, GREATEST(CAST(0 AS BIGINT), c - 8000)
  FROM v WHERE rn = 1
  UNION ALL
  SELECT v.user_id, v.rn, v.event_id,
         GREATEST(CAST(0 AS BIGINT), r.s + v.c - 8000)
  FROM rec r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1
)
SELECT event_id, s AS cusum,
       CAST(CASE WHEN s > 30000 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM rec
""",
        # rolling median ×2: DuckDB's windowed median returns k or k+0.5
        # (double, exact < 2^52), so 2·median is integer-comparable
        "user_rolling_median": """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
)
SELECT event_id,
       CAST(2 * median(c) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS med_x2
FROM v
""",
        "impute_values": """
WITH v AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN NULL
              ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS value_c
  FROM events
), m AS (
  SELECT event_type,
         CAST(floor(CAST(SUM(value_c) AS DOUBLE) / COUNT(value_c)) AS BIGINT)
           AS mean_c
  FROM v GROUP BY 1
)
SELECT v.event_id, COALESCE(v.value_c, m.mean_c) AS value_c,
       CAST(CASE WHEN v.value_c IS NULL THEN 1 ELSE 0 END AS BIGINT) AS imputed
FROM v JOIN m USING (event_type)
""",
        "cohort_retention": """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
  FROM events
), fw AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1
)
SELECT f.cohort_week, u.week - f.cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw u JOIN fw f USING (user_id)
GROUP BY 1, 2
""",
        "dod_retention": """
WITH du AS (
  SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
  FROM events
)
SELECT a.day, CAST(COUNT(*) AS BIGINT) AS returning_users
FROM du a JOIN du b ON b.user_id = a.user_id AND b.day = a.day - 1
GROUP BY a.day
""",
        "value_percent_rank": """
WITH v AS (
  SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c FROM events
)
SELECT event_id, value_c,
       CAST(1000 * (rank() OVER (ORDER BY value_c) - 1)
            // greatest((SELECT COUNT(*) FROM v) - 1, 1) AS BIGINT) AS pr_pm
FROM v
""",
        "value_histogram": """
WITH v AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c FROM events)
SELECT value_c // 500 AS bin, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(value_c) AS BIGINT) AS sum_value_c
FROM v GROUP BY 1
""",
        "inverted_index": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS term
  FROM documents
)
SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM tok GROUP BY term, doc_id
""",
        "token_doc_freq": """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), ti AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
FROM ti GROUP BY term
""",
        "value_iqr_outliers": """
WITH v AS (
  SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c FROM events
), s AS (
  SELECT value_c, row_number() OVER (ORDER BY value_c) AS rn,
         COUNT(*) OVER () AS n
  FROM v
), q AS (
  SELECT MAX(CASE WHEN rn = CAST(ceil(250 * n / 1000.0) AS BIGINT) THEN value_c END) AS q25,
         MAX(CASE WHEN rn = CAST(ceil(750 * n / 1000.0) AS BIGINT) THEN value_c END) AS q75
  FROM s
)
SELECT v.event_id, v.value_c
FROM v, q
WHERE v.value_c < q.q25 - 3 * (q.q75 - q.q25) // 2
   OR v.value_c > q.q75 + 3 * (q.q75 - q.q25) // 2
""",
        "lineitem_corr_moments": """
WITH v AS (
  SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS y
  FROM lineitem
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * x) AS BIGINT) AS sum_xx, CAST(SUM(y * y) AS BIGINT) AS sum_yy,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy
FROM v
""",
        "props_k_by_type": """
WITH v AS (
  SELECT event_type,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(1000 * SUM(k) // COUNT(*) AS BIGINT) AS mean_k_pm
FROM v GROUP BY event_type
""",
    }
    # the exact-degenerate IVF config provably equals brute-force top-k
    # item_pagerank: the fixed-point integer recurrence unrolled as five
    # chained CTEs (recursive CTEs cannot aggregate per iteration); all
    # floor divisions on nonnegative ints, so it matches the Ray BSP
    # implementation bit-for-bit regardless of summation order
    _pr_scale = 10**12
    _pr = ["pr0 AS (SELECT v, CAST({s} // m.n AS BIGINT) AS r "
           "FROM nodes CROSS JOIN meta m)".format(s=_pr_scale)]
    for _i in range(1, 6):
        _pr.append(
            "pr{i} AS (\n"
            "  SELECT n0.v,\n"
            "         CAST((15 * ({s} // m.n)) // 100\n"
            "              + (85 * COALESCE(SUM((p.r // eo.d) * eo.w), 0)) // 100"
            " AS BIGINT) AS r\n"
            "  FROM nodes n0 CROSS JOIN meta m\n"
            "  LEFT JOIN eo ON eo.dst = n0.v\n"
            "  LEFT JOIN pr{j} p ON p.v = eo.src\n"
            "  GROUP BY n0.v, m.n\n"
            ")".format(i=_i, j=_i - 1, s=_pr_scale)
        )
    # item_components: undirected transitive closure (same UNION-walk
    # shape as the LSH clusters oracle), rep = min item id per component
    oracles["item_components"] = """
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM ev
), edges0 AS (
  SELECT pk AS src, k AS dst FROM seq
  WHERE pk IS NOT NULL AND pk <> k GROUP BY 1, 2
), edges AS (
  SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0
), walk(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.r
)
SELECT node, MIN(r) AS rep FROM walk GROUP BY node
"""
    # item_triangles: each triangle enumerated exactly once as x < y < z
    # over the canonical (a < b) distinct undirected edge set, then each
    # corner credited — the textbook triple self-join oracle
    oracles["item_triangles"] = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM ev
), und AS (
  SELECT DISTINCT LEAST(pk, k) AS a, GREATEST(pk, k) AS b
  FROM seq WHERE pk IS NOT NULL AND pk <> k
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node
"""
    # ppjoin_pairs: the quadratic ground truth the prefix filter avoids —
    # distinct word 4-grams per doc, pairwise intersection, integer
    # per-mille Jaccard at threshold 500 (same arithmetic as the Ray side)
    oracles["ppjoin_pairs"] = """
WITH tokl AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), tok AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS g
  FROM tokl, unnest(range(1, len(ts) - 2)) r(i)
  WHERE i + 3 <= len(ts)
), sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
i AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS i
  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a AS doc_a, i.b AS doc_b,
       CAST((1000 * i.i) // (sa.n + sb.n - i.i) AS BIGINT) AS jacc_pm
FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
WHERE 1000 * i.i >= 500 * (sa.n + sb.n - i.i)
"""
    # inlink_counts: verbatim SQL mirror of webdoc.synth_link_html_batch,
    # then the SAME href regex both sides (external links must not match)
    oracles["inlink_counts"] = r"""
WITH h AS (
  SELECT doc_id,
         '<html><body><div><a href="/">Home</a></div>'
         || '<a href="/doc/' || ((7 * doc_id + 1) % 10000) || '">next</a> '
         || '<a href="/doc/' || ((13 * doc_id + 5) % 10000) || '">related</a>'
         || CASE WHEN doc_id % 5 = 0
                 THEN ' <a href="https://ext.example.com/p' || (doc_id % 7) || '">src</a>'
                 ELSE '' END
         || '</body></html>' AS html
  FROM documents
), l AS (
  SELECT CAST(x AS BIGINT) AS dst
  FROM h, unnest(regexp_extract_all(html, 'href="/doc/(\d+)"', 1)) AS t(x)
)
SELECT dst AS dst_doc, CAST(COUNT(*) AS BIGINT) AS n_inlinks
FROM l GROUP BY 1
"""
    # item_kcore: six unrolled peel rounds of the same recurrence the
    # Ray loop runs (alive_t = alive_{t-1} nodes with ≥2 neighbours in
    # alive_{t-1}); the Ray side's fixpoint early-exit is safe because
    # extra rounds past the fixpoint are the identity. Final select
    # recomputes degrees within the last survivor set (GROUP BY drops
    # degree-0 nodes on both sides).
    _kc_parts = ["""ev AS (
  SELECT user_id, ts, event_id,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM ev
), und AS (
  SELECT DISTINCT LEAST(pk, k) AS a, GREATEST(pk, k) AS b
  FROM seq WHERE pk IS NOT NULL AND pk <> k
), bi AS (
  SELECT a AS v, b AS w FROM und UNION ALL SELECT b, a FROM und
), kc_a0 AS (
  SELECT a AS v FROM und UNION SELECT b FROM und
)"""]
    for _i in range(1, 7):
        _kc_parts.append(f"""kc_a{_i} AS (
  SELECT e.v FROM bi e
  JOIN kc_a{_i - 1} s ON s.v = e.v
  JOIN kc_a{_i - 1} t ON t.v = e.w
  GROUP BY e.v HAVING COUNT(*) >= 2
)""")
    oracles["item_kcore"] = (
        "WITH "
        + ",\n".join(_kc_parts)
        + """
SELECT e.v AS node, CAST(COUNT(*) AS BIGINT) AS deg
FROM bi e
JOIN kc_a6 s ON s.v = e.v
JOIN kc_a6 t ON t.v = e.w
GROUP BY e.v
"""
    )
    # item_bfs_hops: recursive-CTE BFS with the hop bound in the
    # recursive member (UNION dedups rows, so the walk terminates);
    # seed = max weighted undirected degree, min node id on ties —
    # exactly the Ray side's bucketed-argmax hub rule
    oracles["item_bfs_hops"] = """
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM ev
), edges0 AS (
  SELECT pk AS src, k AS dst, CAST(COUNT(*) AS BIGINT) AS w FROM seq
  WHERE pk IS NOT NULL AND pk <> k GROUP BY 1, 2
), sym AS (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT src, dst, w FROM edges0
    UNION ALL
    SELECT dst, src, w FROM edges0
  ) GROUP BY 1, 2
), seed AS (
  SELECT src AS node FROM sym GROUP BY src
  ORDER BY SUM(w) DESC, src LIMIT 1
), walk(node, hops) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT s.dst, w.hops + 1 FROM walk w JOIN sym s ON s.src = w.node
  WHERE w.hops < 4
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""
    # kmv_jaccard: same shingle/md5 conventions as kmv_distinct plus the
    # train_val_split hash rule; the estimator is a pure function of the
    # hash order so every integer matches
    # KMV set-operation cardinalities: same union-top-k CTEs as
    # kmv_jaccard, plus D_U = (k-1)*2^64 // h_k in HUGEINT
    oracles["kmv_set_ops"] = """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), sh AS (
  SELECT ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 16))::UBIGINT AS hv,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT % 1000 < 100) AS is_val
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), fl AS (
  SELECT hv, MAX(CASE WHEN is_val THEN 0 ELSE 1 END) AS a,
             MAX(CASE WHEN is_val THEN 1 ELSE 0 END) AS b
  FROM sh GROUP BY hv
), topk AS (
  SELECT hv, a, b FROM fl ORDER BY hv LIMIT 256
), m AS (
  SELECT COUNT(*) AS n,
         COALESCE(SUM(a * b), 0) AS ni,
         COALESCE(SUM(a * (1 - b)), 0) AS nao,
         COALESCE(SUM((1 - a) * b), 0) AS nbo,
         MAX(hv) AS hk
  FROM topk
), est AS (
  SELECT n, ni, nao, nbo,
         CASE WHEN n < 256 THEN CAST(n AS HUGEINT)
              ELSE CAST(255 AS HUGEINT)
                   * CAST('18446744073709551616' AS HUGEINT)
                   // CAST(hk AS HUGEINT) END AS du
  FROM m
)
SELECT CAST(256 AS BIGINT) AS k,
       CAST(du AS BIGINT) AS d_union_est,
       CAST(CASE WHEN n < 256 THEN ni  ELSE CAST(ni  AS HUGEINT) * du // 256 END AS BIGINT) AS d_inter_est,
       CAST(CASE WHEN n < 256 THEN nao ELSE CAST(nao AS HUGEINT) * du // 256 END AS BIGINT) AS d_a_only_est,
       CAST(CASE WHEN n < 256 THEN nbo ELSE CAST(nbo AS HUGEINT) * du // 256 END AS BIGINT) AS d_b_only_est
FROM est
"""
    oracles["kmv_jaccard"] = """
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), sh AS (
  SELECT ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 16))::UBIGINT AS hv,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT % 1000 < 100) AS is_val
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), fl AS (
  SELECT hv, MAX(CASE WHEN is_val THEN 0 ELSE 1 END) AS a,
             MAX(CASE WHEN is_val THEN 1 ELSE 0 END) AS b
  FROM sh GROUP BY hv
), topk AS (
  SELECT a, b FROM fl ORDER BY hv LIMIT 256
), m AS (
  SELECT COUNT(*) AS n, COALESCE(SUM(a * b), 0) AS ni FROM topk
)
SELECT CAST(256 AS BIGINT) AS k, CAST(ni AS BIGINT) AS n_inter,
       CAST(CASE WHEN n = 0 THEN 0
                 WHEN n < 256 THEN 1000 * ni // n
                 ELSE 1000 * ni // 256 END AS BIGINT) AS jaccard_pm
FROM m
"""
    # bm25_topk: the same integer-exact BM25 recurrence as
    # hygiene.bm25_topk — rational RSJ idf (no log), permille avgdl,
    # one int64 floor division per (doc, term) — generated per query term
    _bm_terms = ["join", "merge", "slow"]
    _bm_tf = ",\n         ".join(
        f"len(list_filter(ts, x -> x = '{t}')) AS tf{j}"
        for j, t in enumerate(_bm_terms)
    )
    _bm_df = ", ".join(
        f"SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS df{j}"
        for j in range(len(_bm_terms))
    )
    _bm_score = "\n       + ".join(
        f"CASE WHEN tf{j} > 0 THEN "
        f"(((1000000 * (m.n - d.df{j} + 1)) // (d.df{j} + 1))"
        f" * tf{j} * 88 * m.apm)"
        f" // (40 * tf{j} * m.apm + 12 * m.apm + 36 * dl * 1000)"
        f" ELSE 0 END"
        for j in range(len(_bm_terms))
    )
    oracles["bm25_topk"] = f"""
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), tf AS (
  SELECT doc_id, len(ts) AS dl,
         {_bm_tf}
  FROM tok
), m AS (
  SELECT COUNT(*) AS n, 1000 * SUM(dl) // COUNT(*) AS apm FROM tf
), d AS (
  SELECT {_bm_df} FROM tf
), s AS (
  SELECT doc_id,
         {_bm_score} AS score
  FROM tf, m, d
)
SELECT doc_id, CAST(score AS BIGINT) AS score FROM s
WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 10
"""
    # hybrid_rrf: the SAME generated BM25 CTEs rank the lexical run; the
    # dense run is integer cosine over the md5 hashing-trick unigram
    # embedding (dim 64); RRF = Σ 10^6//(60+rank) over each run's top-20
    # via ROW_NUMBER + FULL OUTER JOIN, ranks 0 when absent
    _rrf_q_values = ", ".join(f"('{t}')" for t in sorted(set(_bm_terms)))
    oracles["hybrid_rrf"] = f"""
WITH tok AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), tf AS (
  SELECT doc_id, len(ts) AS dl,
         {_bm_tf}
  FROM tok
), m AS (
  SELECT COUNT(*) AS n, 1000 * SUM(dl) // COUNT(*) AS apm FROM tf
), d AS (
  SELECT {_bm_df} FROM tf
), s AS (
  SELECT doc_id,
         {_bm_score} AS score
  FROM tf, m, d
), br AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM s WHERE score > 0
  QUALIFY r <= 20
), u AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS w
    FROM documents
  )
), dims AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT % 64 AS dd,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM u GROUP BY doc_id, dd
), qd AS (
  SELECT ('0x' || substr(md5(t), 1, 16))::UBIGINT % 64 AS dd,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM (VALUES {_rrf_q_values}) v(t) GROUP BY dd
), qn AS (
  SELECT SUM(c * c) AS n2q FROM qd
), dotn AS (
  SELECT doc_id, SUM(dims.c * qd.c) AS dot FROM dims JOIN qd USING (dd)
  GROUP BY doc_id
), n2 AS (
  SELECT doc_id, SUM(c * c) AS nn FROM dims GROUP BY doc_id
), cosr AS (
  SELECT dotn.doc_id AS doc_id,
         (1000000 * dot * dot) // (qn.n2q * n2.nn) AS cs
  FROM dotn JOIN n2 ON n2.doc_id = dotn.doc_id, qn
  WHERE dot > 0
), cr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS r
  FROM cosr
  QUALIFY r <= 20
)
SELECT COALESCE(br.doc_id, cr.doc_id) AS doc_id,
       CAST(COALESCE(br.r, 0) AS BIGINT) AS bm25_rank,
       CAST(COALESCE(cr.r, 0) AS BIGINT) AS cos_rank,
       CAST(COALESCE(1000000 // (60 + br.r), 0)
            + COALESCE(1000000 // (60 + cr.r), 0) AS BIGINT) AS rrf_x1m
FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id
ORDER BY rrf_x1m DESC, doc_id LIMIT 10
"""
    # bpe_merges: n_merges unrolled stages — pair census, argmax with
    # (cnt DESC, lhs, rhs) tie-break, replace-based rewrite whose
    # semantics the Ray side reproduces exactly (2-space representation)
    _bpe_parts = [
        """bpe_s0 AS (
  SELECT doc_id,
         CASE WHEN len(ts) = 0 THEN ' '
              ELSE ' ' || array_to_string(ts, '  ') || ' ' END AS s
  FROM (SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ts
        FROM documents)
)"""
    ]
    for _i in range(1, 5):
        _prev = f"bpe_s{_i - 1}"
        _bpe_parts.append(f"""bpe_p{_i} AS (
  SELECT ts[j] AS l, ts[j + 1] AS r, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT list_filter(str_split(s, ' '), x -> x <> '') AS ts FROM {_prev}),
       unnest(range(1, len(ts))) AS rr(j)
  GROUP BY 1, 2
), bpe_m{_i} AS (
  SELECT CAST({_i} AS BIGINT) AS step, l, r, cnt
  FROM bpe_p{_i} ORDER BY cnt DESC, l, r LIMIT 1
), bpe_s{_i} AS (
  SELECT doc_id,
         replace(s, ' ' || l || '  ' || r || ' ', ' ' || l || '_' || r || ' ') AS s
  FROM {_prev}, bpe_m{_i}
)""")
    # purchase_error_counts_full: FULL OUTER JOIN — unmatched users on
    # either side survive; zero backfill mirrors the Ray fill_null
    oracles["purchase_error_counts_full"] = """
WITH p AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchase FROM events
  WHERE event_type = 'purchase' AND value > 150 GROUP BY 1
), e AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_error FROM events
  WHERE event_type = 'error' AND value > 150 GROUP BY 1
)
SELECT COALESCE(p.user_id, e.user_id) AS user_id,
       COALESCE(p.n_purchase, 0) AS n_purchase,
       COALESCE(e.n_error, 0) AS n_error
FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
"""
    oracles["bpe_merges"] = (
        "WITH "
        + ",\n".join(_bpe_parts)
        + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT step, l AS lhs, r AS rhs, cnt FROM bpe_m{_i}"
            for _i in range(1, 5)
        )
    )
    # kmeans_lloyd (k=8, 3 assignment passes, q=1000): unrolled Lloyd
    # iterations. Both sides quantize floor(float64(x)·1000), seed with
    # the 8 smallest vec_ids (cluster = id rank), break assignment ties
    # to the LOWEST cluster, and update centroids per-dim as
    # floor(sum/count) — floor, not DuckDB's truncating `//`, hence the
    # explicit floor(double division); COALESCE keeps an empty cluster's
    # previous centroid. The final SELECT is the 3rd assignment, under
    # the twice-updated centroids — exactly what the Ray loop returns.
    _km_parts = [
        """km_e AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), km_init AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), km_c0 AS (
  SELECT i.cl, e.d, e.xq AS cq FROM km_e e JOIN km_init i USING (vec_id)
)"""
    ]
    for _i in range(1, 4):
        _km_parts.append(f"""km_a{_i} AS (
  SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
  FROM (
    SELECT e.vec_id, c.cl, SUM((e.xq - c.cq) * (e.xq - c.cq)) AS dist
    FROM km_e e JOIN km_c{_i - 1} c ON e.d = c.d
    GROUP BY e.vec_id, c.cl
  )
)""")
        if _i < 3:
            _km_parts.append(f"""km_c{_i} AS (
  SELECT p.cl, p.d, COALESCE(u.cq, p.cq) AS cq
  FROM km_c{_i - 1} p LEFT JOIN (
    SELECT a.cl, e.d,
           CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
    FROM km_e e JOIN (SELECT vec_id, cl FROM km_a{_i} WHERE rn = 1) a USING (vec_id)
    GROUP BY a.cl, e.d
  ) u ON u.cl = p.cl AND u.d = p.d
)""")
    # image_dhash_pairs: replay pixel(doc, i) = ((2·(g%64)+1)·(i·i//3)
    # + g·7 + doc%4) % 256, g = doc//4, at the 8×9 dHash grid points
    # (y·4 rows, (x·32)//9 cols — all non-negative, so DuckDB's
    # truncating // ≡ floor), then the quadratic hamming scan the
    # banding avoids
    oracles["image_dhash_pairs"] = """
WITH pts AS (
  SELECT d.doc_id, y.y, x.x,
         (((2 * ((d.doc_id // 4) % 64) + 1)
             * ((((y.y * 4) * 32 + (x.x * 32) // 9)
                 * ((y.y * 4) * 32 + (x.x * 32) // 9)) // 3)
           + (d.doc_id // 4) * 7
           + d.doc_id % 4) % 256) AS p
  FROM documents d, range(0, 8) y(y), range(0, 9) x(x)
), bits AS (
  SELECT a.doc_id, a.y, a.x, CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit
  FROM pts a JOIN pts b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < 8
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
FROM bits a JOIN bits b ON a.y = b.y AND a.x = b.x AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 6
"""
    # fk_integrity: per-relation child rows / distinct keys / orphan rows
    _fk_rels = [
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    oracles["fk_integrity"] = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS relation,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child_rows,
       (SELECT CAST(COUNT(DISTINCT {ck}) AS BIGINT) FROM {child}) AS n_distinct_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} c
        LEFT JOIN {parent} p ON c.{ck} = p.{pk}
        WHERE p.{pk} IS NULL) AS n_orphan_rows"""
        for name, child, ck, parent, pk in _fk_rels
    )
    # merge_scd1_docs: MERGE INTO semantics — latest change per key wins
    # (max ver, delete on ver ties), winning delete removes the key,
    # winning upsert replaces/inserts, unchanged keys pass through
    oracles["merge_scd1_docs"] = """
WITH chg AS (
  SELECT doc_id, CAST(1 AS BIGINT) AS ver, 'upsert' AS op, 'v1' AS lang
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 2, 'delete', NULL FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 1000000, 1, 'upsert', 'new' FROM documents WHERE doc_id % 13 = 0
), latest AS (
  SELECT doc_id, op, lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY ver DESC, CASE WHEN op = 'delete' THEN 0 ELSE 1 END) AS rn
    FROM chg
  ) WHERE rn = 1
)
SELECT COALESCE(b.doc_id, l.doc_id) AS doc_id,
       CASE WHEN l.doc_id IS NULL THEN b.lang ELSE l.lang END AS lang
FROM documents b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
WHERE l.op IS DISTINCT FROM 'delete'
"""
    # shard_assign: the oracle IS the global sort the Ray side avoids —
    # rank by (md5_u64(doc_id), doc_id), shard = rank // 64
    oracles["shard_assign"] = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM documents
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT) AS rank,
       CAST((ROW_NUMBER() OVER (ORDER BY hv, doc_id) - 1) // 64 AS BIGINT) AS shard_id
FROM h
"""
    oracles["kmeans_lloyd"] = (
        "WITH "
        + ",\n".join(_km_parts)
        + "\nSELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM km_a3 WHERE rn = 1"
    )
    # zone_map_prune: month index = months since 1970-01, ship-day =
    # days since 1970-01-01 (both sides integer); pruned iff the
    # partition's day range misses [1995-03-01, 1995-09-30]
    _zm_lo = 9190  # np.datetime64('1995-03-01','D') — fixed literal
    _zm_hi = 9403  # np.datetime64('1995-09-30','D')
    oracles["zone_map_prune"] = f"""
WITH z AS (
  SELECT ((EXTRACT(year FROM l_shipdate) - 1970) * 12
          + EXTRACT(month FROM l_shipdate) - 1) AS shard,
         datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS x,
         l_partkey AS y
  FROM lineitem
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
       CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y,
       CAST(CASE WHEN MAX(x) < {_zm_lo} OR MIN(x) > {_zm_hi}
            THEN 1 ELSE 0 END AS BIGINT) AS pruned
FROM z GROUP BY shard
"""
    # embedding_pq (m=4 subspaces × 16 dims, k=4, 2 assignment passes,
    # q=1000): the kmeans_lloyd recurrence unrolled once per subspace —
    # same quantization, same k-smallest-ids seeding (subvector of the
    # SAME seed rows), same lowest-cluster tie rule and floor(sum/count)
    # update — with the final assignment's squared distance kept so the
    # total quantization error is integer-comparable too.
    _pq_parts = [
        """pq_e AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), pq_init AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
)"""
    ]
    for _s in range(4):
        _lo, _hi = _s * 16, (_s + 1) * 16
        _pq_parts.append(f"""pq_c0_{_s} AS (
  SELECT i.cl, e.d, e.xq AS cq FROM pq_e e JOIN pq_init i USING (vec_id)
  WHERE e.d >= {_lo} AND e.d < {_hi}
), pq_a1_{_s} AS (
  SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
  FROM (
    SELECT e.vec_id, c.cl, SUM((e.xq - c.cq) * (e.xq - c.cq)) AS dist
    FROM pq_e e JOIN pq_c0_{_s} c ON e.d = c.d
    GROUP BY e.vec_id, c.cl
  )
), pq_c1_{_s} AS (
  SELECT p.cl, p.d, COALESCE(u.cq, p.cq) AS cq
  FROM pq_c0_{_s} p LEFT JOIN (
    SELECT a.cl, e.d,
           CAST(floor(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
    FROM pq_e e JOIN (SELECT vec_id, cl FROM pq_a1_{_s} WHERE rn = 1) a USING (vec_id)
    WHERE e.d >= {_lo} AND e.d < {_hi}
    GROUP BY a.cl, e.d
  ) u ON u.cl = p.cl AND u.d = p.d
), pq_a2_{_s} AS (
  SELECT vec_id, cl, dist, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
  FROM (
    SELECT e.vec_id, c.cl, SUM((e.xq - c.cq) * (e.xq - c.cq)) AS dist
    FROM pq_e e JOIN pq_c1_{_s} c ON e.d = c.d
    GROUP BY e.vec_id, c.cl
  )
)""")
    oracles["embedding_pq"] = (
        "WITH "
        + ",\n".join(_pq_parts)
        + """
SELECT a0.vec_id,
       a0.cl AS code_0, a1.cl AS code_1, a2.cl AS code_2, a3.cl AS code_3,
       CAST(a0.dist + a1.dist + a2.dist + a3.dist AS BIGINT) AS err
FROM (SELECT * FROM pq_a2_0 WHERE rn = 1) a0
JOIN (SELECT * FROM pq_a2_1 WHERE rn = 1) a1 USING (vec_id)
JOIN (SELECT * FROM pq_a2_2 WHERE rn = 1) a2 USING (vec_id)
JOIN (SELECT * FROM pq_a2_3 WHERE rn = 1) a3 USING (vec_id)
"""
    )
    # knn_pq_adc: same unrolled PQ training CTEs, then the explicit ADC
    # distance — for each (query, vector) pair, Σ over subspaces of the
    # squared distance between the query's subvector and the centroid
    # the vector's code points at — and the (dist, neighbor_id) top-5
    _adc_dists = ",\n".join(
        f"""pq_dist_{_s} AS (
  SELECT q.qid, v.vec_id AS nid, SUM((q.xq - c.cq) * (q.xq - c.cq)) AS dist
  FROM pq_codes_t v
  JOIN pq_c1_{_s} c ON c.cl = v.c{_s}
  JOIN pq_qd q ON q.d = c.d
  GROUP BY 1, 2
)"""
        for _s in range(4)
    )
    oracles["knn_pq_adc"] = (
        "WITH "
        + ",\n".join(_pq_parts)
        + """,
pq_codes_t AS (
  SELECT a0.vec_id, a0.cl AS c0, a1.cl AS c1, a2.cl AS c2, a3.cl AS c3
  FROM (SELECT vec_id, cl FROM pq_a2_0 WHERE rn = 1) a0
  JOIN (SELECT vec_id, cl FROM pq_a2_1 WHERE rn = 1) a1 USING (vec_id)
  JOIN (SELECT vec_id, cl FROM pq_a2_2 WHERE rn = 1) a2 USING (vec_id)
  JOIN (SELECT vec_id, cl FROM pq_a2_3 WHERE rn = 1) a3 USING (vec_id)
), pq_qd AS (
  SELECT vec_id AS qid, d, xq FROM pq_e WHERE vec_id IN (0,1,2,3,4,5,6,7)
),
"""
        + _adc_dists
        + """,
pq_adc AS (
  SELECT d0.qid, d0.nid, d0.dist + d1.dist + d2.dist + d3.dist AS dist
  FROM pq_dist_0 d0
  JOIN pq_dist_1 d1 ON d1.qid = d0.qid AND d1.nid = d0.nid
  JOIN pq_dist_2 d2 ON d2.qid = d0.qid AND d2.nid = d0.nid
  JOIN pq_dist_3 d3 ON d3.qid = d0.qid AND d3.nid = d0.nid
  WHERE d0.nid <> d0.qid
)
SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank,
       nid AS neighbor_id, CAST(dist AS BIGINT) AS adc_dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
      FROM pq_adc)
WHERE rn <= 5
"""
    )
    # embedding_outliers: both sides evaluate the pure integer predicate
    # D(v) > 9·T on floor(float64(x)·100) quantized elements (HUGEINT
    # intermediates in SQL; the Ray side stays inside the documented
    # int64 envelope)
    oracles["embedding_outliers"] = """
WITH e AS (
  SELECT vec_id, embedding[i] AS x, i
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), qv AS (
  SELECT vec_id, CAST(i AS BIGINT) AS dim,
         CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT) AS xq
  FROM e
), m AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, SUM(xq) AS s, SUM(xq * xq) AS ss
  FROM qv GROUP BY dim
), tt AS (
  SELECT CAST(SUM(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s) AS HUGEINT) AS t,
         MAX(n) AS n
  FROM m
), d AS (
  SELECT qv.vec_id,
         CAST(SUM((CAST(tt.n AS HUGEINT) * qv.xq - m.s)
                  * (CAST(tt.n AS HUGEINT) * qv.xq - m.s)) AS HUGEINT) AS d2n
  FROM qv JOIN m USING (dim) CROSS JOIN tt
  GROUP BY qv.vec_id
)
SELECT d.vec_id, CAST(d.d2n AS BIGINT) AS d2n,
       CAST(CASE WHEN d.d2n > 9 * tt.t THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM d CROSS JOIN tt
"""
    # typo_pairs: FastSS blocking + exact verify computes exactly the
    # distance-1 relation, which DuckDB states directly via levenshtein;
    # the vocabulary is augmented with 1-char-dropped tails on both sides
    oracles["typo_pairs"] = """
WITH tok AS (
  SELECT DISTINCT unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), v AS (
  SELECT t FROM tok UNION SELECT substr(t, 2) FROM tok WHERE length(t) >= 3
)
SELECT a.t AS t1, b.t AS t2
FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) = 1
"""
    # audio_energy: three payload families — pcm16 / µ-law closed forms,
    # and IMA ADPCM (doc_id%8==6) whose STATEFUL predictor/step-index
    # recurrences are replayed exactly by a recursive CTE advancing all
    # adpcm docs in lockstep (pure integer ops, 2048 iterations); the
    # 89-entry step table is rendered from the same constant the decoder
    # uses (stages/wav.py ADPCM_STEPS)
    from sanskrit_ocr_ray.stages.wav import ADPCM_STEPS as _ADPCM_STEPS

    _steps_vals = ", ".join(f"({i}, {int(v)})" for i, v in enumerate(_ADPCM_STEPS))
    oracles["audio_energy"] = f"""
WITH RECURSIVE st(si, sv) AS (VALUES {_steps_vals}),
ad(doc_id, i, pred, idx) AS (
  SELECT doc_id, 0, ((doc_id * 31) % 4096) - 2048, doc_id % 89
  FROM documents WHERE doc_id % 8 = 6
  UNION ALL
  SELECT doc_id, i + 1,
         GREATEST(-32768, LEAST(32767,
           pred + CASE WHEN (c & 8) <> 0 THEN -vp ELSE vp END)),
         GREATEST(0, LEAST(88,
           idx + CASE WHEN (c & 7) < 4 THEN -1 ELSE ((c & 7) - 3) * 2 END))
  FROM (
    SELECT q.doc_id, q.i, q.pred, q.idx, q.c,
           (st.sv >> 3)
           + CASE WHEN (q.c & 4) <> 0 THEN st.sv ELSE 0 END
           + CASE WHEN (q.c & 2) <> 0 THEN st.sv >> 1 ELSE 0 END
           + CASE WHEN (q.c & 1) <> 0 THEN st.sv >> 2 ELSE 0 END AS vp
    FROM (
      SELECT a.doc_id, a.i, a.pred, a.idx,
             (a.doc_id * 13 + (a.i + 1) * 5) % 16 AS c
      FROM ad a WHERE a.i < 2047
    ) q JOIN st ON st.si = q.idx
  )
), c AS (
  -- µ-law codes for doc_id%8==2 (u = ~code & 0xFF) and A-law codes for
  -- doc_id%8==4 (ua = code XOR 0x55)
  SELECT doc_id, i,
         255 - ((doc_id * 31 + i * 7) % 256) AS u,
         xor((doc_id * 17 + i * 11) % 256, 85) AS ua
  FROM documents, unnest(range(2048)) AS r(i)
  WHERE doc_id % 8 <> 6
), base AS (
  SELECT doc_id, i,
         CASE WHEN doc_id % 8 = 2 THEN
           -- Sun g711 ulaw2linear: t = (((u&15)<<3)+132) << ((u>>4)&7)
           CASE WHEN (u & 128) <> 0
                THEN 132 - ((((u & 15) << 3) + 132) * (1 << ((u >> 4) & 7)))
                ELSE ((((u & 15) << 3) + 132) * (1 << ((u >> 4) & 7))) - 132
           END
         WHEN doc_id % 8 = 4 THEN
           -- Sun g711 alaw2linear: seg = (ua>>4)&7, t = ((ua&15)<<4)
           CASE WHEN (ua & 128) <> 0 THEN 1 ELSE -1 END *
           CASE WHEN ((ua >> 4) & 7) >= 2
                THEN (((ua & 15) << 4) + 264) * (1 << (((ua >> 4) & 7) - 1))
                ELSE ((ua & 15) << 4)
                     + CASE WHEN ((ua >> 4) & 7) = 0 THEN 8 ELSE 264 END
           END
         ELSE ((doc_id * 31 + i * 7) % 4096) - 2048 END AS x
  FROM c
), allx AS (
  SELECT doc_id, i, x FROM base
  UNION ALL
  SELECT doc_id, i, pred AS x FROM ad
)
SELECT doc_id, CAST(i // 256 AS BIGINT) AS win, CAST(SUM(x * x) AS BIGINT) AS energy
FROM allx GROUP BY doc_id, i // 256
"""
    # embedding_moments: both sides quantize floor(float64(x)·1000) per
    # element BEFORE summing, so the sums are integer-exact regardless of
    # reduction order (float32 → float64 widening is lossless IEEE)
    oracles["embedding_moments"] = """
WITH e AS (
  SELECT embedding[i] AS x, i
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), qv AS (
  SELECT CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xq
  FROM e
)
SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(xq) AS BIGINT) AS sum_q,
       CAST(SUM(xq * xq) AS BIGINT) AS sumsq_q
FROM qv GROUP BY dim
"""
    # status_history: segment ids via a windowed change-flag cumsum; run
    # order inside a user is (us, event_id) on both sides, so ties never
    # flip runs; LEAD over seg (not valid_from) — two adjacent runs can
    # share a first-timestamp
    oracles["status_history"] = """
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us, event_id
  FROM events
), o AS (
  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_t
  FROM ev
), s AS (
  SELECT *, SUM(CASE WHEN prev_t IS NULL OR prev_t <> event_type THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY us, event_id) AS seg
  FROM o
), r AS (
  SELECT user_id, event_type, seg, MIN(us) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, event_type, seg
)
SELECT user_id, event_type, valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg), -1)
         AS valid_to_us,
       n_events
FROM r
"""
    # basket_pairs: the bucketed pipeline computes exactly the distinct
    # co-occurrence self-join; max_basket=64 never bites at TPC-H basket
    # sizes (≤ 13 distinct parts/order) so the oracle needs no size CTE —
    # the cap is mirrored anyway to pin the deterministic drop rule
    oracles["basket_pairs"] = """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
ok AS (SELECT bk FROM b GROUP BY bk HAVING COUNT(*) BETWEEN 2 AND 64),
bb AS (SELECT b.bk, b.it FROM b JOIN ok USING (bk)),
p AS (
  SELECT a.it AS item_a, c.it AS item_b
  FROM bb a JOIN bb c ON a.bk = c.bk AND a.it < c.it
)
SELECT item_a, item_b, COUNT(*) AS support
FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""
    # association_rules: same basket population (2..64 distinct items)
    # for supports, item counts AND N; integer per-mille conf/lift with
    # the same floor divisions as the Ray side
    oracles["association_rules"] = """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
ok AS (SELECT bk FROM b GROUP BY bk HAVING COUNT(*) BETWEEN 2 AND 64),
bb AS (SELECT b.bk, b.it FROM b JOIN ok USING (bk)),
ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM bb GROUP BY 1),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ok),
p AS (
  SELECT a.it AS ia, c.it AS ib, CAST(COUNT(*) AS BIGINT) AS s
  FROM bb a JOIN bb c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
bd AS (
  SELECT ia AS ante, ib AS cons, s FROM p
  UNION ALL SELECT ib, ia, s FROM p
)
SELECT bd.ante, bd.cons, bd.s AS support,
       CAST((1000 * bd.s) // ca.c AS BIGINT) AS conf_pm,
       CAST((1000 * nt.n * bd.s) // (ca.c * cb.c) AS BIGINT) AS lift_pm
FROM bd
JOIN ic ca ON ca.it = bd.ante
JOIN ic cb ON cb.it = bd.cons
CROSS JOIN nt
"""
    # heavy_hitters: the candidate/verify pipeline is exact by the
    # pigeonhole superset guarantee, so the oracle is the plain census
    # with the same integer threshold
    oracles["heavy_hitters"] = """
WITH tok AS (
  SELECT unnest(list_filter(str_split(text, ' '), x -> x <> '')) AS token
  FROM documents
), m AS (SELECT COUNT(*) AS n FROM tok)
SELECT token, COUNT(*) AS cnt FROM tok, m
GROUP BY token, m.n HAVING COUNT(*) * 32 > m.n
"""
    # hll_registers: bucket and rho are pure integer functions of the
    # md5 hash; bit length via a generated integer CASE cascade (float
    # log2 misrounds above 2^53)
    _blen = (
        "CASE "
        + " ".join(f"WHEN w >= {1 << b} THEN {b + 1}" for b in range(57, 0, -1))
        + " WHEN w >= 1 THEN 1 ELSE 0 END"
    )
    _zbits = " + ".join(
        f"(((l_partkey >> {i}) & 1) << {2 * i}) + "
        f"(((l_suppkey >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    oracles["lineitem_zorder"] = f"""
SELECT l_orderkey, l_linenumber,
       CAST({_zbits} AS BIGINT) AS zkey,
       CAST(({_zbits}) >> 28 AS BIGINT) AS shard
FROM lineitem
"""
    oracles["hll_registers"] = f"""
WITH tok AS (
  SELECT list_filter(str_split(text, ' '), x -> x <> '') AS ts FROM documents
), t AS (
  SELECT DISTINCT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM tok, unnest(range(1, len(ts) - 1)) AS r(i)
), hw AS (
  SELECT CAST(hv >> 58 AS BIGINT) AS bucket,
         CAST(hv % CAST({1 << 58} AS UBIGINT) AS BIGINT) AS w
  FROM (SELECT ('0x' || substr(md5(g), 1, 16))::UBIGINT AS hv FROM t)
)
SELECT bucket, CAST(MAX(59 - ({_blen})) AS BIGINT) AS rho
FROM hw GROUP BY bucket
"""
    # hll_users_by_type: the per-group sketch — same bucket/rho bit rules,
    # value hash = md5(str(user_id)) (the shard_assign convention)
    oracles["hll_users_by_type"] = f"""
WITH uv AS (SELECT DISTINCT event_type, user_id FROM events),
hw AS (
  SELECT event_type, CAST(hv >> 58 AS BIGINT) AS bucket,
         CAST(hv % CAST({1 << 58} AS UBIGINT) AS BIGINT) AS w
  FROM (SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS hv
        FROM uv)
)
SELECT event_type, bucket, CAST(MAX(59 - ({_blen})) AS BIGINT) AS rho
FROM hw GROUP BY 1, 2
"""
    oracles["item_pagerank"] = (
        """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM ev
), edges AS (
  SELECT pk AS src, k AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE pk IS NOT NULL AND pk <> k
  GROUP BY 1, 2
), outdeg AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS d FROM edges GROUP BY 1
), eo AS (
  SELECT e.src, e.dst, e.w, o.d FROM edges e JOIN outdeg o ON o.src = e.src
), nodes AS (
  SELECT src AS v FROM edges UNION SELECT dst FROM edges
), meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
"""
        + ",\n".join(_pr)
        + "\nSELECT v AS node, r AS pr FROM pr5\n"
    )
    # item_ppr: the SAME unrolled recurrence with the seed predicate
    # (v % 7 = 0) inlined — teleport mass splits over |S| and lands only
    # on seeds; non-seeds start at 0 and get no base term
    _ppr = [
        "meta2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS sn FROM nodes "
        "WHERE v % 7 = 0)",
        "ppr0 AS (SELECT v, CAST(CASE WHEN v % 7 = 0 THEN {s} // m.sn "
        "ELSE 0 END AS BIGINT) AS r FROM nodes CROSS JOIN meta2 m)".format(
            s=_pr_scale
        ),
    ]
    for _i in range(1, 6):
        _ppr.append(
            "ppr{i} AS (\n"
            "  SELECT n0.v,\n"
            "         CAST(CASE WHEN n0.v % 7 = 0\n"
            "                   THEN (15 * ({s} // m.sn)) // 100 ELSE 0 END\n"
            "              + (85 * COALESCE(SUM((p.r // eo.d) * eo.w), 0)) // 100"
            " AS BIGINT) AS r\n"
            "  FROM nodes n0 CROSS JOIN meta2 m\n"
            "  LEFT JOIN eo ON eo.dst = n0.v\n"
            "  LEFT JOIN ppr{j} p ON p.v = eo.src\n"
            "  GROUP BY n0.v, m.sn\n"
            ")".format(i=_i, j=_i - 1, s=_pr_scale)
        )
    oracles["item_ppr"] = (
        """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(coalesce(nullif(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM ev
), edges AS (
  SELECT pk AS src, k AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE pk IS NOT NULL AND pk <> k
  GROUP BY 1, 2
), outdeg AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS d FROM edges GROUP BY 1
), eo AS (
  SELECT e.src, e.dst, e.w, o.d FROM edges e JOIN outdeg o ON o.src = e.src
), nodes AS (
  SELECT src AS v FROM edges UNION SELECT dst FROM edges
),
"""
        + ",\n".join(_ppr)
        + "\nSELECT v AS node, r AS pr FROM ppr5\n"
    )
    oracles["knn_ivf"] = oracles["knn_top5"]
    oracles["knn_lsh"] = oracles["knn_top5"]
    # the skew-salted join computes the same relation as the plain join
    oracles["mktsegment_join_skew"] = oracles["mktsegment_join"]
    # decontaminate: contamination's complement over the same CTEs —
    # train docs (h >= 100) with no leaked gram at all
    oracles["decontaminate"] = oracles["contamination"].replace(
        "SELECT tr.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_contaminated\n"
        "FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id",
        ", bad AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (gram))\n"
        "SELECT d.doc_id AS doc_id FROM d\n"
        "WHERE h >= 100 AND d.doc_id NOT IN (SELECT doc_id FROM bad)",
    )
    # survivors: same recursive components, collapsed to (keeper, size)
    oracles["fuzzy_dedup_survivors"] = oracles["minhash_lsh_clusters"].replace(
        "SELECT node AS doc_id, MIN(r) AS cluster_rep FROM walk GROUP BY node",
        ", comp AS (SELECT node, MIN(r) AS rep FROM walk GROUP BY node)\n"
        "SELECT rep AS doc_id, CAST(COUNT(*) AS BIGINT) AS cluster_size "
        "FROM comp GROUP BY rep",
    )
    # knn_join: both sides quantize floor(float64(x)·1000) per element
    # (the embedding_moments convention) so the dot scores are
    # integer-exact; ties broken by smallest build id via row_number
    oracles["knn_join"] = """
WITH e AS (
  SELECT vec_id, label, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), s AS (
  SELECT a.vec_id AS probe_id, b.vec_id AS build_id,
         CAST(SUM(a.xq * b.xq) AS BIGINT) AS score
  FROM e a JOIN e b ON a.i = b.i AND a.label < 5 AND b.label >= 5
  GROUP BY a.vec_id, b.vec_id
)
SELECT probe_id, build_id, score FROM s
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, build_id) = 1
"""
    # embedding_covariance: same floor(x·1000) quantization as
    # embedding_moments; pairs are unordered (i <= j)
    oracles["embedding_covariance"] = """
WITH e AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)
SELECT a.dim AS dim_i, b.dim AS dim_j,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.xq) AS BIGINT) AS sum_i,
       CAST(SUM(b.xq) AS BIGINT) AS sum_j,
       CAST(SUM(a.xq * b.xq) AS BIGINT) AS sum_ij
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
"""
    # schema_union: gen A never stored source/n_chars, gen B never
    # stored lang — the union schema null-fills both, doc_id promoted
    oracles["schema_union"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang,
       NULL AS source, CAST(NULL AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang, source, n_chars
FROM documents WHERE doc_id % 2 = 1
"""
    # audio_autocorr: the same four-codec decoded stream `allx` as
    # audio_energy (recursive-CTE ADPCM included), reduced by lag dots
    # instead of windowed sums-of-squares
    oracles["audio_autocorr"] = oracles["audio_energy"].replace(
        "SELECT doc_id, CAST(i // 256 AS BIGINT) AS win, "
        "CAST(SUM(x * x) AS BIGINT) AS energy\nFROM allx GROUP BY doc_id, i // 256",
        "SELECT a.doc_id, lg.k AS lag, CAST(SUM(a.x * b.x) AS BIGINT) AS ac\n"
        "FROM allx a CROSS JOIN (VALUES (1), (8), (64)) AS lg(k)\n"
        "JOIN allx b ON b.doc_id = a.doc_id AND b.i = a.i + lg.k\n"
        "GROUP BY a.doc_id, lg.k",
    )
    # video_scene_cuts: replay the synth pixel formula
    # (doc·7 + f·13 + i²) % 256 and the consecutive-frame L1 diff in SQL
    oracles["video_scene_cuts"] = """
WITH px AS (
  SELECT doc_id, f, i, (doc_id * 7 + f * 13 + i * i) % 256 AS p
  FROM documents, unnest(range(6)) AS a(f), unnest(range(1024)) AS b(i)
), d AS (
  SELECT a.doc_id, a.f AS frame_idx, SUM(ABS(a.p - b.p)) AS diff
  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i AND b.f = a.f - 1
  GROUP BY a.doc_id, a.f
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(diff AS BIGINT) AS diff,
       CAST(CASE WHEN diff > 40000 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
FROM d
"""
    # srp_sketch: hyperplane signs from md5 parity (the md5_u64
    # convention), projections on floor(x·1000) quantized elements
    oracles["srp_sketch"] = """
WITH r AS (
  SELECT b, d,
         CASE WHEN CAST(('0x' || substr(md5('srp:' || b || ':' || d), 1, 16))
                   AS UBIGINT) % 2 = 0 THEN 1 ELSE -1 END AS rv
  FROM unnest(range(32)) AS t1(b), unnest(range(64)) AS t2(d)
), e AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), p AS (
  SELECT e.vec_id, r.b, SUM(r.rv * e.xq) AS proj
  FROM e JOIN r ON r.d = e.d GROUP BY e.vec_id, r.b
)
SELECT vec_id,
       CAST(SUM(CASE WHEN proj >= 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS sig
FROM p GROUP BY vec_id
"""
    # mad_outliers: lower medians at 1-based position ceil(n/2) (the
    # grouped_quantiles_exact convention) over integer cents
    oracles["mad_outliers"] = """
WITH v AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), m AS (
  SELECT event_type, c AS med FROM (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM v
  ) WHERE rn = (n + 1) // 2
), d AS (
  SELECT v.event_type, ABS(v.c - m.med) AS a, m.med
  FROM v JOIN m USING (event_type)
), md AS (
  SELECT event_type, a AS mad FROM (
    SELECT event_type, a,
           row_number() OVER (PARTITION BY event_type ORDER BY a) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM d
  ) WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       CAST(MIN(d.med) AS BIGINT) AS med_c,
       CAST(MIN(md.mad) AS BIGINT) AS mad_c,
       CAST(SUM(CASE WHEN d.a > 5 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
"""
    # pattern_counts: same ordered-path assembly as user_event_paths;
    # the pattern is greedy-unambiguous so RE2 and Python re agree
    oracles["pattern_counts"] = """
WITH p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_extract_all(path, 'view>(click>)*purchase')) AS BIGINT)
         AS n_matches
FROM p
"""
    # table_diff: the md5 rowhash equality on the Ray side reduces to
    # column-wise IS DISTINCT FROM here (no collisions at these sizes)
    oracles["table_diff"] = """
WITH newt AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 10 = 7 THEN 'xx' ELSE lang END AS lang,
         source, n_chars
  FROM documents WHERE doc_id % 10 <> 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM documents o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL
   OR o.text IS DISTINCT FROM n.text
   OR o.lang IS DISTINCT FROM n.lang
   OR o.source IS DISTINCT FROM n.source
   OR o.n_chars IS DISTINCT FROM n.n_chars
"""
    # late_events: watermark = running max of event-time over earlier
    # arrivals (event_id order) − 30 min; late when it passed the 1-h
    # tumbling window end; the first arrival is never late
    oracles["late_events"] = """
WITH e AS (
  SELECT event_id,
         CAST(epoch_us(ts) AS BIGINT)
         + CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))
                     AS UBIGINT) % 7200000000 AS BIGINT) - 3600000000 AS us
  FROM events
), p AS (
  SELECT event_id, us,
         MAX(us) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev
  FROM e
)
SELECT event_id,
       CAST(CASE WHEN prev IS NOT NULL
                  AND prev - 1800000000 > (us // 3600000000 + 1) * 3600000000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_late
FROM p
"""
    return oracles
