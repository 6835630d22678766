"""In-pytest guard for Ray-vs-DuckDB oracle parity (sf0.001 subset).

The external driver compares every ``queries()`` entry against
``oracle_sql()`` at sf0.01; this test wires a cheap subset at sf0.001 so
parity regressions fail fast in `python -m pytest -x -q`.
"""

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

#: oracle-gated queries NOT replayed here, with reasons — everything
#: else is auto-derived from oracle_sql(), so a new operator is parity-
#: gated the moment it lands (test_subset_covers_every_oracle enforces
#: that this list stays the only gap).
EXCLUDED = {
    # read the sf0.01 fixture by absolute path (driver's correctness
    # scale); exercised by the driver gate + tools/check_driver.py
    "extract_e2e",
    "multimodal_features",
    "quarantine_summary",
    "span_kind_stats",
    "media_span_positions",
    "compact_docs",
    # tens of seconds each even at sf0.001 (iterative / recursive-CTE
    # oracles); exercised by the driver gate + tools/check_driver.py
    "minhash_lsh_clusters",
    "knn_ivf",
}


def _load_entry_for_keys():
    spec = importlib.util.spec_from_file_location(
        "_entry_keys", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


#: the full oracle surface minus EXCLUDED — derived, never hand-listed
SUBSET = sorted(set(_load_entry_for_keys().oracle_sql()) - EXCLUDED)

_LEGACY_SUBSET = [
    "clean_text",
    "dedup_exact",
    "token_count",
    "lang_id",
    "quality_score",
    "fingerprint_md5",
    "kr_fingerprint",
    "repetition_scores",
    "kgram_dup_spans",
    "vocab_build",
    "chunk_documents",
    "encode_documents",
    "pmi_collocations",
    "quantiles_by_type",
    "latest_order_per_customer",
    "table_checksum",
    "event_gaps",
    "user_event_paths",
    "daily_active_users",
    "sliding_distinct_users",
    "dod_retention",
    "value_percent_rank",
    "value_histogram",
    "value_iqr_outliers",
    "lineitem_corr_moments",
    "inverted_index",
    "token_doc_freq",
    "mktsegment_join_skew",
    "props_k_by_type",
    "fuzzy_dedup_survivors",
    "snm_pairs",
    "simhash64",
    "minhash_sig",
    "knn_top5",
    "nearest_centroid",
    "train_val_split",
    "redact_pii",
    "stratified_sample",
    "pack_sequences",
    "corpus_mix",
    "ngram_top",
    "heavy_hitters",
    "cms_registers",
    "lineitem_unpivot",
    "lineitem_zorder",
    "basket_pairs",
    "status_history",
    "embedding_moments",
    "typo_pairs",
    "embedding_outliers",
    "bpe_merges",
    "purchase_error_counts_full",
    "kmeans_lloyd",
    "shard_assign",
    "merge_scd1_docs",
    "fk_integrity",
    "image_dhash_pairs",
    "asof_view_before_purchase",
    "q1_pricing",
    "revenue_by_nation",
    "events_tumbling",
    "sessionize",
    "top_users_by_value",
    "user_rolling_value",
    "user_ewma",
    "debounce_events",
    "media_sniff",
    "funnel_counts",
    "user_mode_event",
    "doc_ttr",
    "priority_sample",
    "decontaminate",
    "rarity_score",
    "dedup_spans",
    "bigram_surprisal",
    "bloom_new_docs",
    "value_ntile",
    "value_quantiles_binned",
    "frame_checksums",
    "audio_energy",
    "semantic_dedup",
    "profile_documents",
    "validate_documents",
    "user_active_time",
    "revenue_cube",
    "text_hash_dup_pairs",
    "revenue_by_region",
    "orders_by_month",
    "revenue_forecast",
    "promo_revenue",
    "late_order_priorities",
    "feature_hashing",
    "target_affinity",
    "image_patches",
    "knn_join",
    "embedding_covariance",
    "schema_union",
    "audio_autocorr",
    "video_scene_cuts",
    "srp_sketch",
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
    "item_ppr",
    "ivm_type_counts",
    "session_attribution",
    "orders_above_avg",
    "token_gini",
]
del _LEGACY_SUBSET  # superseded by the derived SUBSET above


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry_under_test", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(entry_mod, con, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    res = fn(SF)
    d = res.to_pandas() if hasattr(res, "to_pandas") else res
    o = con.sql(sql).df()
    cols = sorted(d.columns)
    assert cols == sorted(o.columns), (cols, sorted(o.columns))
    a = d[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].sort_values(cols).reset_index(drop=True)
    assert a.shape == b.shape
    assert (a.astype(str).values == b.astype(str).values).all()


def test_every_oracle_key_has_query(entry_mod):
    qs = entry_mod.queries()
    for key in entry_mod.oracle_sql():
        assert key in qs, f"oracle {key} has no query"


def test_subset_covers_every_oracle(entry_mod):
    """The parity subset is the FULL oracle surface minus the documented
    EXCLUDED set — a new oracle-gated operator is covered here
    automatically, and a stale EXCLUDED entry fails loudly."""
    keys = set(entry_mod.oracle_sql())
    assert set(SUBSET) | EXCLUDED == keys
    assert EXCLUDED <= keys, sorted(EXCLUDED - keys)
