#!/usr/bin/env python
"""Benchmark harness: headline extraction pipeline + representative queries.

Prints ONE JSON line on stdout:
  {"metric": "extract_wall_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "docs_per_sec": ..., "sf": ...,
   "num_cpus": N}

Modes:
  python bench.py              one run at RAY_GRAFT_CPUS (default 32) over
                               $GRAFT_SF_DIR (default /root/testdata/sf0.1)
  python bench.py --scaling    fresh subprocesses at num_cpus=8 and 32 on
                               the SAME inputs → throughputs + efficiency
                               (the sandbox stand-in for N vs 4N nodes)

The extraction input is a deterministic bench-scale interleaved-docs
fixture (SXRAY_BENCH_DOCS docs, default 16000) synthesized once into /tmp
via the distributed synthesizer and reused across runs/parallelism levels.
Synthesis and cache warm-up are untimed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from sanskrit_ocr_ray.synth import FIXTURE_VERSION

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SXRAY_BENCH_DOCS", "16000"))
RUN_QUERIES = os.environ.get("SXRAY_BENCH_QUERIES", "1") == "1"
FIXTURE = f"/tmp/sxray_fixtures/bench-{BENCH_DOCS}-v{FIXTURE_VERSION}"


def _ensure_fixture() -> None:
    from sanskrit_ocr_ray.synth import write_fixture_ray

    if not os.path.isdir(os.path.join(FIXTURE, "golden")):
        write_fixture_ray(FIXTURE, BENCH_DOCS, seed=42, n_partitions=32)


def _warm(paths: list[str]) -> None:
    """Touch file bytes once so timings measure compute, not cold disk."""
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    with open(os.path.join(root, f), "rb") as fh:
                        while fh.read(1 << 22):
                            pass
        elif os.path.exists(p):
            with open(p, "rb") as fh:
                while fh.read(1 << 22):
                    pass


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # silence the known-cosmetic "RefBundle with a different schema"
    # warnings Ray's sort operator emits for schema-less EMPTY blocks on
    # key-sparse partitions (UDFs already return typed empties; the sort
    # operator's own empties are outside our control) — keeps the bench
    # artifact tail readable
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)

    import ray.data as rd

    import __ray_entry__ as entry_mod

    _ensure_fixture()
    _warm(
        [os.path.join(FIXTURE, d) for d in ("docs", "media")]
        + [os.path.join(SF_DIR, f"{t}.parquet") for t in ("lineitem", "events", "documents", "embeddings", "orders", "customer")]
    )

    from sanskrit_ocr_ray.pipelines.extract import extract_dataset, tune_read_context

    tune_read_context()
    # headline: end-to-end extraction (docs/sec is the engine target metric)
    t0 = time.time()
    docs = rd.read_parquet(os.path.join(FIXTURE, "docs")).drop_columns(["part"])
    media = rd.read_parquet(os.path.join(FIXTURE, "media"))
    n_docs = extract_dataset(docs, media).count()
    extract_sec = time.time() - t0

    queries = entry_mod.queries()
    bench_queries = [
        "q1_pricing",
        "events_tumbling",
        "sessionize",
        "dedup_exact",
        "simhash_dup_pairs",
        "ngram_jaccard_pairs",
        "knn_top5",
        "minhash_lsh_clusters",
        "revenue_by_nation",
        "mktsegment_join",
        "html_main_content",
        "layout_reading_order",
        "views_before_purchase_1h",
        "top2_events_per_user",
        "salient_terms",
        "contamination",
        "customer_order_counts",
        "user_running_value",
        "fuzzy_dedup_survivors",
        "daily_active_users",
        "semantic_dedup",
        "bloom_new_docs",
        "rarity_score",
        "item_pagerank",
        "item_triangles",
        "bm25_topk",
        "hll_registers",
        "kmv_jaccard",
        "heavy_hitters",
        "basket_pairs",
        "status_history",
        "embedding_moments",
        "typo_pairs",
        "dedup_spans",
        "bigram_surprisal",
        "snm_pairs",
        "value_ntile",
        "cms_registers",
        "knn_join",
        "embedding_covariance",
        "srp_sketch",
        "image_patches",
        "audio_autocorr",
        "video_scene_cuts",
        "mad_outliers",
        "pattern_counts",
        "table_diff",
        "late_events",
        "item_kcore",
        "embedding_pq",
        "zone_map_prune",
        "knn_pq_adc",
        "cohort_retention",
        "impute_values",
        "inlink_counts",
        "value_quantiles_cont",
        "value_quantiles_hdr",
        "quantiles_hdr_by_type",
        "value_trend_by_type",
        "part_skyline",
        "status_as_of",
        "type_token_ratio",
        "modal_event_per_user",
        "peak_concurrency",
        "kmv_set_ops",
        "funnel_depths",
        "gini_by_type",
        "user_type_concentration",
        "ppjoin_pairs",
        "user_rolling_median",
        "hll_users_by_type",
        "association_rules",
        "cusum_flags",
        "trimmed_mean_by_type",
        "user_running_distinct",
        "partkey_skew_histogram",
        "audience_overlap",
        "item_bfs_hops",
        "winnow_fingerprints",
        "token_chi2",
        "containment_pairs",
        "hybrid_rrf",
        "bucketed_cust_orders",
        "ivm_type_counts",
        "session_attribution",
        "item_ppr",
        "lang_confusion",
        "oov_rate_by_lang",
        "dup_rate_by_source",
        "vocab_coverage",
        "char_class_profile",
        "window_cooccurrence",
        "event_transitions",
        "salient_terms_by_source",
        "join_cardinality",
        "pii_rate_by_source",
        "jaccard_band_hist",
        "hourly_seasonality",
        "dup_cluster_size_hist",
        "reorder_gap_quantiles",
        "supplier_return_rates",
        # NOT rfm_segments: a deliberate 8-barrier composition (reduce +
        # 3 NTILE passes + 2 joins) whose sf0.1 wall is pure Ray
        # all-to-all fixed cost (~15 s), not throughput; it stays
        # correctness-gated via the oracle.
        # NOT quarantine_summary: its sf-dir fixture is lazily
        # synthesized on first use, so a cold cache would bill ~90 s of
        # page rendering to a millisecond-scale aggregate; it stays
        # correctness-gated via the oracle instead.
    ]
    q_secs: dict[str, float] = {"extract": round(extract_sec, 3)}
    print(f"[bench] extract {extract_sec:.1f}s", file=sys.stderr, flush=True)
    for name in bench_queries if RUN_QUERIES else []:
        t0 = time.time()
        res = queries[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()  # consume the Dataset (streaming; no driver materialize)
        q_secs[name] = round(time.time() - t0, 3)
        print(f"[bench] {name} {q_secs[name]:.1f}s", file=sys.stderr, flush=True)

    result = {
        "metric": "extract_wall_sec",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": q_secs,
        "docs_per_sec": round(n_docs / extract_sec, 2),
        "n_docs": n_docs,
        "bench_docs": BENCH_DOCS,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 then 32 → scaling efficiency.

    Runs SXRAY_SCALING_RUNS pairs (default 3) back-to-back and reports
    the MEDIAN-efficiency pair — a best-pair selection can cherry-pick
    co-tenant noise (the 8-CPU leg slows → the ratio inflates), a median
    cannot. All pairs are included in the output for inspection.
    """
    # generate the fixture once up-front so no timed run synthesizes
    import statistics

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _ensure_fixture()
    ray.shutdown()

    def one(ncpu: int) -> dict:
        # scaling measures the headline pipeline; skip the query sweep
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), SXRAY_BENCH_QUERIES="0")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_runs = int(os.environ.get("SXRAY_SCALING_RUNS", "3"))
    pairs = []
    for _ in range(max(1, n_runs)):
        lo, hi = one(8), one(32)
        pairs.append(
            {
                "eff": round((hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8), 3),
                "docs_per_sec_8": lo["docs_per_sec"],
                "docs_per_sec_32": hi["docs_per_sec"],
                "sec_8": lo["value"],
                "sec_32": hi["value"],
            }
        )
    med_eff = statistics.median(p["eff"] for p in pairs)
    med = min(pairs, key=lambda p: abs(p["eff"] - med_eff))
    return {
        "metric": "scaling_efficiency",
        "value": med["eff"],
        "unit": "ratio",
        "docs_per_sec_8": med["docs_per_sec_8"],
        "docs_per_sec_32": med["docs_per_sec_32"],
        "sec_8": med["sec_8"],
        "sec_32": med["sec_32"],
        "n_pairs": len(pairs),
        "pairs": pairs,
        "bench_docs": BENCH_DOCS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
