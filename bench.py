"""Benchmark harness. Prints ONE JSON line with headline seconds + per-query
timings. ``--scaling`` runs the identical job at two parallelism levels in
fresh processes and reports throughput + scaling efficiency (the in-sandbox
stand-in for the N vs 4N node criterion, BASELINE.md).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q2_daily_events",
    "q3_top_customers",
    "q7_exact_dedup_documents",
    "q8_latest_event_per_user",
    "q9_token_stats",
    "q12_knn_quantized_dot",
    "q13_minhash_pairs",
    "q15_ngram_jaccard",
    "q30_dedup_clusters",
    "q21_hourly_user_windows",
    "q22_ann_cosine_topk",
    "q36_sliding_windows",
    "q37_stratified_sample",
    "q41_inverted_index",
    "q42_user_running_features",
    "q43_bm25_search",
    "q44_exact_group_quantiles",
    "q47_event_type_pivot",
    "q48_rollup_revenue",
    "q49_top_events_per_user",
    "q50_snapshot_delta",
    "q51_fuzzy_vocab_match",
    "q52_regex_fields",
    "q53_funnel",
    "q54_tool_transitions",
    "q55_bloom_semi_join",
    "q56_bloom_anti_join",
    "q57_user_journeys",
    "q58_heavy_hitter_tokens",
    "q59_chunk_documents",
    "q60_redact_pii",
    "q61_range_join_shipments",
    "q62_band_join_activity",
    "q63_weighted_sample",
    "q65_minmax_normalize",
    "q64_source_lang_entropy",
    "q66_decontaminate",
    "q67_json_field_rollup",
    "q68_hll_set_algebra",
    "q69_char_lm_quality",
    "q72_duplicated_span_mass",
    "q76_copurchase_pagerank",
    "q78_ivf_ann",
    "q79_interval_coverage",
    "q80_cohort_retention",
    "q81_bfs_hops",
    "q84_auc_per_type",
    "q86_fk_integrity",
    "q87_user_gaps_churn",
    "q88_mad_outliers",
    "q89_dense_week_grid",
    "q90_incremental_agg_merge",
    "q91_salted_join_revenue",
    "q92_rolling_wau",
    "q93_user_spend_trend",
    "q94_late_events",
    "q95_sorted_export",
    "q96_table_checksums",
    "q97_cdc_merge_patch",
    "q98_scd2_intervals",
    "q99_uniform_sample",
    "q100_triangle_count",
    "q101_partitioned_write_prune",
    "q102_tfidf_by_source",
    "q103_zorder_cluster",
    "q104_cube_rollup",
    "q105_debounce_events",
    "q106_mixture_sample",
    "q107_repetition_gate",
    "q108_point_lookup",
    "q109_phrase_search",
    "q110_forward_fill",
    "q111_grouped_correlation",
    "q112_association_rules",
    "q113_last_touch_attribution",
    "q114_multi_touch_counts",
    "q115_audience_overlap_exact",
    "q116_weighted_median",
    "q117_column_profile",
    "q118_event_trigrams",
    "q119_daily_bounce_rate",
    "q120_order_count_distribution",
    "q121_winsorized_stats",
    "q122_revenue_share",
    "q123_contract_violations",
    "q124_conversion_latency",
    "q125_share_of_region",
    "q126_cumulative_daily_revenue",
    "q127_grouped_variance",
    "q128_unpivot_orders",
    "q129_exact_heavy_hitters",
    "q130_bucket_checksum_diff",
    "q131_first_touch_attribution",
    "q132_retention_cohorts",
    "q133_time_weighted_avg",
    "q134_quantity_mad",
    "q135_dense_event_grid",
    "q136_equidepth_price_bins",
    "q137_boilerplate_grams",
    "q138_negative_sampling",
    "q139_dedup_survivors",
    "q140_drift_bins",
    "q141_pit_features",
    "q142_bpe_merges",
    "q143_ann_recall_eval",
    "q144_user_day_paths",
    "q145_embedding_dim_stats",
    "q146_collocation_lift",
    "q147_activity_streaks",
    "q148_contamination_matrix",
    "q149_entity_clusters",
    "q150_trending_tokens",
    "q151_curriculum_shards",
    "q152_vocab_spectrum",
    "q153_bpe_encode",
    "q154_daily_anomaly",
    "q155_ttr_by_source",
    "q156_clustering_coefficient",
    "q157_global_revenue_rank",
    "q158_semantic_dedup",
    "q159_semantic_dedup_multiprobe",
    "q160_daily_token_drift",
    "q161_emd_value_drift",
    "q162_embedding_covariance",
    "q163_label_propagation",
    "q164_random_walks",
    "q165_chi2_contingency",
    "q166_markov_backtest",
    "q167_interval_overlap_join",
    "q168_lsh_recall_eval",
    "q169_frequent_triples",
    "q170_hybrid_rrf",
    "q171_hybrid_recall_eval",
    "q172_countmin_heavy",
    "q173_key_skew_profile",
    "q174_bigram_lm_score",
    "q175_pq_ann_recall",
    "q176_hard_negatives",
    "q177_k_anonymity_audit",
    "q178_join_size_estimate",
    "q179_expectations_suite",
    "q180_matryoshka_recall",
    "q181_mixture_allocation",
    "q182_ivfpq_recall",
    "q183_dsir_selection",
    "q184_quality_classifier",
    "q185_novelty_curve",
    "q186_annotator_agreement",
    "q187_alpha_mixture",
    "q188_rerank_recall",
    "q189_split_contamination",
    "q190_gopher_rules",
    "q191_distinct_ngrams",
    "q192_dedup_report",
    "q193_bpe_fertility",
    "q194_l_diversity_audit",
    "q195_t_closeness_audit",
    "q196_top_pc_power_iteration",
    "q197_sequence_packing",
    "q198_embedding_outliers",
    "q199_pad_waste_audit",
    "q200_label_separability",
    "q201_prefix_cache_savings",
    "q202_sft_pairs",
    "q203_loss_mask_mass",
    "q204_context_overflow",
    "q205_assistant_latency",
    "q206_turn_time_attribution",
    "q207_tool_wall_time",
    "q208_depth_token_profile",
    "q209_conversation_dedup",
    "q210_abandonment_census",
    "q211_tool_transitions",
    "q212_time_to_first_assistant",
    "q213_sessionization",
    "q214_tool_retry_census",
    "q215_canned_response_census",
    "q216_dialogue_shape_census",
    "q217_turn_template_reuse",
    "q218_token_gini",
    "q219_wall_vs_turns_slope",
    "q220_stuck_loop_census",
]


def _consume(res) -> int:
    """Consume a query result without driver-side materialization of big data."""
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        total = 0
        for batch in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            total += batch.num_rows
        return total
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run_bench() -> dict:
    # timing run: skip the serial single-process golden fixtures q16/q24
    # write for their DuckDB oracles — nothing reads them during a bench
    os.environ["MOSR_SKIP_ORACLE_FIXTURES"] = "1"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # fixed object store: ray sizes it from *available* memory, so a
        # second fresh-process run (page cache now full) would get a smaller
        # store and spill — skewing the two-parallelism comparison.
        object_store_memory=16 * 1024**3,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from medical_ocr_service_ray.pipelines.extraction import run_extraction_fs_bucketed
    from medical_ocr_service_ray.pipelines.queries import QUERIES
    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    # corpus generation is setup, not measured (cached across runs in /tmp)
    corpus = ensure_transcripts_for_sf(sf_dir)

    # warm the OS page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    n_turns = sum(pq.read_metadata(f).num_rows for f in sorted(corpus.glob("*.parquet")))
    for f in sorted(corpus.glob("*.parquet")):
        pq.read_table(f)

    # min of N runs: single-shot numbers on this box vary ±30% (page cache,
    # frequency scaling); min approximates the noise-free cost. The
    # extract-only metric runs FIRST — measured after the headline it picks
    # up object-store churn from the big shuffle/write runs.
    reps = int(os.environ.get("MOSR_BENCH_REPS", "2"))

    from medical_ocr_service_ray.pipelines.extraction import extract_dataset, read_transcripts

    # untimed warmup execution: spawns Ray worker processes / actor pools so
    # the first timed run doesn't pay cold-start
    first_file = sorted(corpus.glob("*.parquet"))[0]
    import ray.data as _rd

    extract_dataset(_rd.read_parquet(str(first_file))).count()

    extract_only = float("inf")
    for _ in range(reps):
        t0 = time.time()
        extract_dataset(read_transcripts(corpus)).count()
        extract_only = min(extract_only, time.time() - t0)

    # ---- headline: full extraction pipeline, ordered, written to parquet ----
    out_dir = Path("/tmp/mosr_bench_out") / sf_name
    headline = float("inf")
    for _ in range(reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        run_extraction_fs_bucketed(corpus, out_dir)
        headline = min(headline, time.time() - t0)

    # ---- representative query suite over the sf tables ----
    # (skippable for --scaling subruns: the ratio uses only the headline)
    query_secs: dict[str, float] = {}
    if os.environ.get("MOSR_BENCH_QUERIES", "1") != "0":
        for name in BENCH_QUERIES:
            t0 = time.time()
            _consume(QUERIES[name](sf_dir))
            query_secs[name] = round(time.time() - t0, 3)

    # Full per-query timings go to a sidecar file: 131 entries overflowed the
    # driver's stdout tail-capture window in round 3 ("parsed": null). The
    # stdout line carries only the headline + a fixed comparison subset.
    if query_secs:
        sidecar = Path(__file__).resolve().parent / "bench_queries.json"
        sidecar.write_text(
            json.dumps(
                {"sf": sf, "num_cpus": num_cpus, "queries": query_secs}, indent=1
            )
        )

    stdout_subset = [
        "q1_pricing_summary", "q3_top_customers", "q12_knn_quantized_dot",
        "q15_ngram_jaccard", "q21_hourly_user_windows", "q22_ann_cosine_topk",
        "q36_sliding_windows", "q37_stratified_sample", "q43_bm25_search",
        "q55_bloom_semi_join", "q66_decontaminate", "q76_copurchase_pagerank",
        "q86_fk_integrity", "q91_salted_join_revenue", "q100_triangle_count",
        "q103_zorder_cluster", "q112_association_rules",
        "q124_conversion_latency", "q131_first_touch_attribution",
    ]
    result = {
        "metric": "headline extraction wall-clock (synthetic transcripts sized to sf; "
        "classify+route+extract+normalize+order+write)",
        "value": round(headline, 3),
        "extract_only_sec": round(extract_only, 3),
        "extract_only_turns_per_sec": round(n_turns / extract_only, 1),
        "unit": "sec",
        "queries": {k: query_secs[k] for k in stdout_subset if k in query_secs},
        "queries_total_sec": round(sum(query_secs.values()), 3),
        "queries_count": len(query_secs),
        "queries_file": "bench_queries.json",
        "sf": sf,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Fresh-process runs at two parallelism levels (8 and 32 CPUs)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), MOSR_BENCH_QUERIES="0")
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    eff_extract = (lo["extract_only_sec"] / hi["extract_only_sec"]) / (32 / 8)
    return {
        "metric": "scaling efficiency, headline extraction, num_cpus 8 -> 32",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "extract_only_sec_8": lo["extract_only_sec"],
        "extract_only_sec_32": hi["extract_only_sec"],
        "extract_scaling_efficiency": round(eff_extract, 3),
        "turns": lo["turns"],
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
