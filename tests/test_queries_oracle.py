"""Driver-contract parity: a fast subset of queries() checked against
oracle_sql() via DuckDB at sf0.001 (the full sweep runs in
tools/check_oracles.py at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

SUBSET = [
    "cdc_lake_state",
    "cdc_update_suppression",
    "cdc_stats_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q16_supplier_count",
    "q21_blamed_suppliers",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q13_customer_distribution",
    "q18_large_orders",
    "q22_idle_customers",
    "events_user_deltas",
    "dedup_exact",
    "knn_bruteforce",
    "ann_ivf",
    "text_quality",
    "corpus_split",
    "corpus_pack",
    "approx_distinct_hll",
    "text_countmin",
    "text_pii_scrub",
    "events_range_join",
    "events_quantile_sketch",
    "cdc_scd2_history",
    "corpus_sample_weighted",
    "events_funnel",
    "events_retention",
    "events_anomaly",
    "events_pagerank",
    "cdc_view_maintenance",
    "embedding_covariance",
    "events_user_paths",
    "events_gap_fill",
    "events_pivot",
    "events_cep_match",
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "corpus_divergence",
    "embedding_pca_power",
    "embedding_sq8",
    "embedding_hard_negatives",
    "events_moving_window",
    "events_rank_portfolio",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_shipping_priority_counts",
    "q20_dominant_suppliers",
    "cdc_consumer_state",
    "multimodal_phash_dedup",
    "dedup_editdistance",
    "text_keyword_tags",
    "text_pmi_bigrams",
    "dedup_containment",
    "cdc_snapshot_diff",
    "text_ngram_novelty",
    "cdc_gap_audit",
    "multimodal_audio_resample",
    "cdc_ordering_inversions",
    "events_nearest_join",
    "multimodal_image_crop",
    "events_markov_transitions",
    "events_burst_window",
    "corpus_interleave",
    "events_skyline",
    "events_data_quality",
    "cdc_column_churn",
    "text_vocab_growth",
    "multimodal_audio_vad",
    "multimodal_audio_tone",
    "events_decayed_score",
    "events_heavy_hitters",
    "multimodal_image_boxblur",
    "events_debounce",
    "cdc_txn_batches",
    "dedup_minhash_recall",
    "events_outlier_mad",
    "multimodal_image_palette",
    "multimodal_scene_cuts",
    "events_quantile_histogram",
    "join_skew_salted",
    "cdc_checksum_reconcile",
    "events_attribution",
    "corpus_dup_stats",
    "text_skipgrams",
    "multimodal_image_histeq",
    "events_window_distinct",
    "corpus_rag_chunks",
    "events_zorder",
    "events_dwell_time",
    "events_abtest",
    "events_peak_concurrency",
    "text_langid_confusion",
    "events_cusum",
    "graph_triangles",
    "text_nb_train",
    "text_nb_classify",
    "embedding_kcenter",
    "multimodal_image_sobel",
    "events_holt",
    "join_bloom_prefilter",
    "knn_filtered",
    "events_benford",
    "multimodal_image_otsu",
    "embedding_triplets",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def catalogs(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) == "Int64":
            # nullable-int columns (e.g. scd2 valid_to_id) come back from
            # DuckDB as float64-with-NaN; compare in that representation
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, catalogs, con):
    queries, oracles = catalogs
    got = queries[name](SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = con.sql(oracles[name]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    g, e = normalize(got), normalize(exp)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            pd.testing.assert_series_equal(g[c], e[c].astype(g[c].dtype), check_exact=True)
        else:
            assert g[c].astype(str).tolist() == e[c].astype(str).tolist(), f"column {c}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    n = ds.count() if hasattr(ds, "count") else len(ds)
    assert n > 0
    cols = set(ds.schema().names if hasattr(ds, "schema") else ds.columns)
    assert {"repo", "path", "content", "_last_id"} <= cols


def test_every_query_has_callable_and_oracle_keys():
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    # every driver query is value-checked — the former rows-only entry
    # (multimodal_decode, PCG64 fake features) moved to a pytest-only
    # re-derivation check (test_round4_fixes.py::test_fake_decode_rederivation)
    assert set(qs) == set(os_)
