"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query executes fully via the no-op sink (measures scan + compute
+ shuffle, not driver collect/serialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from free_etl_spark.session import get_spark
import free_etl_spark.queries as q

HEADLINE = [
    # relational core
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume",
    "join_broadcast_dim",
    "join_range_bands",
    # windows / time series
    "topk_per_group",
    "window_running_total",
    "window_range_frame_30d",
    "agg_stats_events",
    "events_sessionize",
    "events_sliding_windows",
    "join_asof_events",
    # complex types + Python surface
    "explode_top_tokens",
    "pivot_type_by_source",
    "udf_pandas_scalar_price",
    "udf_apply_in_pandas_zscore",
    "multimodal_decode_features",
    # LLM-data ops
    "dedup_exact_md5",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "text_quality_score",
    "text_bpe_token_estimate",
    "text_contamination_check",
    "quality_filter_funnel",
    "data_mix_report",
    "emb_centroid_by_label",
    "multimodal_resize_32",
    "sample_train_test_split",
    # r4 curation additions: sequence packing, mix rebalancing,
    # repetition + PII scans (all map-only or dimension-broadcast)
    "text_pack_sequences",
    "sample_lang_mix",
    "text_repetition_score",
    "text_pii_scan",
    # r5 curation additions: cross-doc line boilerplate removal,
    # perceptual-hash image near-dup
    "text_boilerplate_lines",
    "multimodal_phash_dedup",
    # r5 second wave: unigram-LM surprisal, sub-document containment,
    # PQ ANN, time-grid gap fill, model-based quality gate, DSIR
    "text_unigram_logprob",
    "dedup_ngram_containment",
    "sim_pq_topk",
    "events_gap_fill",
    "text_quality_classifier",
    "sample_importance_weights",
    # r5 third wave: relational PageRank (aggregate-then-iterate),
    # Arrow-buffer vector stats, winsorized robust means
    "graph_pagerank_2iter",
    "udf_map_in_arrow_stats",
    "events_winsorized_stats",
    # r5 fourth wave: in-engine recursion (distill-once), streaming
    # CDC apply, PSI drift report
    "graph_reachability_rcte",
    "streaming_cdc_upsert",
    "quality_psi_drift",
    # r5 fifth wave: substring-span dedup, bigram LM surprisal,
    # triangle counting, stream-vs-static near-dup probe, count-min
    # heavy hitters, embedding outlier pruning
    "dedup_substring_spans",
    "text_bigram_lm_score",
    "graph_triangle_count",
    "streaming_neardup_filter",
    "agg_heavy_hitters_cms",
    "emb_outlier_zscore",
    # r5 sixth wave: tolerance as-of, temperature mix, code gate,
    # user journeys, ABC revenue classes
    "join_asof_tolerance_events",
    "sample_temperature_mix",
    "text_code_detection",
    "events_path_analysis",
    "orders_abc_pareto",
    # r6 wave: BM25 retrieval, leakage-safe split, curriculum shards
    # (distributed global NTILE), snapshot diff, domain reputation,
    # truncated-prefix ANN re-rank, CDC with deletes
    "text_bm25_search",
    "sample_leakage_safe_split",
    "sample_curriculum_shards",
    "snapshot_diff_orders",
    "text_source_reputation",
    "sim_matryoshka_rerank",
    "streaming_cdc_with_deletes",
    # r7 wave: the most expensive registered non-streaming queries not
    # yet benched (from tools/query_times.json) so long-tail perf
    # regressions are visible round-over-round, plus the r7-new surface
    "dedup_semdedup_keep",
    "source_python_datasource",
    "dedup_pipeline_keep_set",
    "orders_rfm_segmentation",
    "dedup_simhash_pairs",
    "text_contamination_fuzzy",
    "emb_kmeans_2iter",
    "agg_approx_distinct",
    "dedup_simhash",
    "source_time_travel",
    "sim_ivf_append",
    "events_funnel_windowed",
    "events_funnel_conversion",
    "sim_ivf_topk",
    "dedup_embedding_cosine",
    "graph_label_propagation",
    "dedup_canonical_text",
    "window_ntile_movavg",
    "dedup_cluster_components",
    "join_bucketed_colocated",
    "events_cusum_changepoint",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_parts",
    "text_quality_percentile_cut",
    "sample_reservoir_per_group",
    "source_table_changes",
    "multimodal_audio_energy",
    "events_scd2_intervals",
    "mv_incremental_refresh",
    "streaming_mv_refresh",
    "quality_expectations_audit",
    "agg_hll_set_algebra",
    "dedup_bloom_prescreen",
    "text_lang_confusion",
    "text_chunk_overlap",
    "sql_lateral_topk",
    "orders_also_bought",
    "events_dau_wau_mau",
    "emb_dimension_variance",
    "source_write_audit_publish",
    "orders_decimal_exact_totals",
    "sample_downweight_duplicates",
    "sim_hybrid_rrf",
    "text_pmi_collocations",
    "events_attribution_last_touch",
    "join_point_in_time_scd2",
    "dedup_threshold_sensitivity",
    "quality_benford_check",
    "events_forecast_backtest",
    "scalar_try_funcs",
    # r7 continuation wave: survival/AB/bootstrap statistics, user
    # graph (k-core, assortativity), association rules, prefix-sum
    # ops (weighted median, equi-depth, concurrency sweep, Gini),
    # Ed-Join, PCA power iteration, novelty/readability/feature-hash
    # text ops, quantile sketch, cohort LTV, Neyman allocation
    "events_rolling_corr",
    "events_kaplan_meier",
    "events_ab_proportion_test",
    "graph_kcore",
    "graph_degree_stats",
    "orders_market_basket_lift",
    "quality_key_skew_report",
    "quality_k_anonymity",
    "histogram_equidepth",
    "agg_poisson_bootstrap_ci",
    "dedup_editdistance_qgram",
    "sample_grouped_kfold",
    "text_feature_hashing",
    "emb_power_iteration",
    "streaming_trending_terms",
    "agg_weighted_median",
    "events_time_to_convert",
    "events_user_streaks",
    "text_readability_flesch",
    "events_theilsen_trend",
    "scalar_regex_funcs",
    "text_ngram_novelty",
    "emb_centroid_drift",
    "events_max_concurrency",
    "agg_quantile_sketch",
    "orders_cohort_ltv",
    "sample_neyman_allocation",
    "events_conformal_interval",
    "events_periodogram",
    "quality_fd_check",
    "events_behavior_entropy",
    # r7 final waves: skyline/prefix-max, optimizer statistics,
    # KL outlier scan, contingency/rank statistics, activity bitmap,
    # sequence pattern, Zipf fit, link prediction, FK audit, bursts,
    # elasticity, OCR-garbage, kNN audit, audio VAD
    "orders_skyline",
    "quality_outlier_iqr",
    "quality_join_cardinality_estimate",
    "text_kl_divergence",
    "events_chi_square_independence",
    "events_activity_bitmap",
    "events_sequence_pattern",
    "events_mann_whitney",
    "text_zipf_fit",
    "graph_adamic_adar",
    "quality_referential_integrity",
    "events_burst_detection",
    "orders_price_elasticity",
    "text_ocr_garbage",
    "sim_knn_classifier",
    "multimodal_audio_vad",
    "events_growth_accounting",
    "events_ratio_metric_delta_method",
    "events_power_analysis",
    "graph_clustering_coefficient",
    "source_fixed_width_parse",
    "sample_time_based_split",
    "events_session_window_native",
    "events_cumulative_users",
    "orders_fulfillment_latency",
    "agg_boolean_funcs",
    "udf_arrow_python_scalar",
    "quality_corr_matrix",
    "multimodal_blur_detect",
    "emb_silhouette",
    "events_error_budget_burn",
    "agg_bitmap_distinct",
    "orders_duplicate_invoice_detector",
    "quality_temporal_sanity",
    "events_cuped_adjustment",
    "events_peak_detection",
    "events_resample_interpolate",
    "streaming_bitmap_distinct_users",
    "events_attribution_position_based",
    "text_chat_template_pack",
    "text_pii_redact",
    "orders_total_reconciliation",
    "events_ab_srm_check",
    "events_ks_drift",
    "orders_kpi_decomposition",
    "agg_approx_quantile_audit",
    "scalar_crypto_roundtrip",
    "join_spatial_proximity",
    "scalar_xpath_funcs",
    "scalar_format_funcs",
    "scalar_map_hof_funcs",
    "sample_weighted_reservoir_es",
    "quality_partition_checksums",
    "sample_feature_snapshot",
    "events_bot_regularity_score",
    "source_corrupt_record_quarantine",
    "sql_named_window",
    "sql_identifier_clause",
    "agg_anova_oneway",
    "events_diff_in_diff",
    "events_autocorrelation_acf",
    "agg_hill_tail_estimator",
    "orders_price_index",
    "scalar_array_set_funcs",
    "quality_schema_contract_check",
    "text_negative_sampling",
    "events_littles_law_audit",
    "orders_abc_xyz_classification",
    "events_delta_encoding_stats",
    "multimodal_scene_cuts",
    "sim_sparse_cosine_topk",
    "text_bpe_merge_candidates",
    # r8 wave: the full iterative BPE trainer (6 merge rounds)
    "text_bpe_train_rounds",
    # r9 wave: the merge table's consumer — corpus tokenization +
    # compression report — plus cohort retention, Markov transitions,
    # neighbor-Jaccard link prediction, column profiling, MMR
    # diversified re-ranking, class-balanced downsampling
    "text_bpe_encode",
    "events_retention_matrix",
    "events_markov_transitions",
    "graph_jaccard_neighbors",
    "quality_null_profile",
    "sim_mmr_rerank",
    "sample_class_balance",
    "join_interval_overlap",
    "quality_candidate_key_profile",
    # r10 wave: canonical-URL dedup, IVF radius search, CLIP-style
    # caption-alignment audit
    "dedup_url_canonicalize",
    "sim_range_search",
    "multimodal_caption_align",
    # r10 wave B: ANN recall curve, data-constrained epoch schedule,
    # video frame-overlap dedup
    "sim_ivf_recall_curve",
    "sample_epoch_mix_schedule",
    "multimodal_frame_phash_dedup",
    # r10 wave C: tokenizer fertility by language, IVF occupancy audit,
    # greedy k-center coreset selection
    "text_bpe_fertility_by_lang",
    "sim_ivf_build_stats",
    "sample_kcenter_coreset",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # SPARK_GRAFT_BENCH_SUBSET=N benches only the first N headline
    # queries. The driver-contract guard (tests/test_bench.py) uses
    # this: the stdout discipline it proves (final line compact, last,
    # regex-matchable in a 2000-char tail) is independent of suite
    # size, and the full 220+-query suite outgrew any pytest budget.
    subset = int(os.environ.get("SPARK_GRAFT_BENCH_SUBSET", "0"))
    # Full-registry coverage (VERDICT r9 task #2): every registered
    # query gets a per-round stamp so tools/bench_tripwire.py can
    # guard the whole surface, not just the curated headline list.
    # HEADLINE order is preserved (shared-relation caches warm in the
    # order the list was tuned for); the remainder appends sorted.
    suite = HEADLINE + sorted(set(q.QUERIES) - set(HEADLINE))
    headline = suite[:subset] if subset > 0 else suite
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("free-etl-spark-bench")
    spark.range(1000).count()  # JVM/session warmup
    # warm parquet footers + OS page cache so the first measured query
    # doesn't absorb one-time IO costs the others skip
    from free_etl_spark.tables import ALL_TABLES, load_table

    for t in ALL_TABLES:
        load_table(spark, sf_dir, t).count()
    # warm the Python worker pool (first Arrow-UDF stage otherwise
    # absorbs ~2s of daemon startup)
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # Interleaved best-of-N: run the WHOLE suite `reps` times and take
    # the per-query MIN across passes. This host shows multi-second
    # stalls on idle CPUs (r3: identical warm work varied 4-18s; r4
    # probes: 0.95-10.9s); consecutive per-query reps let one stall
    # window poison all reps of adjacent queries (r4 manufactured 8
    # fake regressions that way). Interleaving puts ~suite-length
    # (minutes) between a query's reps, so one stall can at most
    # inflate one pass of each query.
    for _ in range(reps):
        for name in headline:
            t0 = time.time()
            q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), dt)


    # intake throughput — the surface directly comparable to the
    # reference (single-threaded pandas CSV parse+re-serialize,
    # ~10-30 MB/s typical, strictly serial across files): an 8-file
    # upload batch (lineitem split 8 ways) through the §2A scale path
    # with concurrent per-file pipelines. CSV setup is untimed.
    # Runs AFTER the query suite, deliberately: r9 tried fronting it
    # (hypothesis: r8's 62.0 -> 48.8 MB/s was late-suite JVM/page-cache
    # pressure) and measured 27.5 MB/s — WORSE, on a round whose median
    # per-query delta was +0.007 s. JIT/page-cache maturity helps this
    # path, not hurts it; end-of-suite placement is both the faster and
    # the r7/r8-comparable methodology. Negative result pinned here so
    # the reorder isn't retried.
    import glob as _glob
    import shutil
    import tempfile

    from free_etl_spark.intake.config import load_cfg
    from free_etl_spark.intake.spark_intake import ingest_directory
    from free_etl_spark.tables import load_table as _lt

    work = tempfile.mkdtemp(prefix="bench_intake_")
    try:
        landing = os.path.join(work, "landing")
        outdir = os.path.join(work, "out")
        os.makedirs(landing)
        _lt(spark, sf_dir, "lineitem").repartition(8).write.option(
            "header", True
        ).csv(os.path.join(work, "csv"))
        csv_mb = 0.0
        for i, src in enumerate(
            _glob.glob(os.path.join(work, "csv", "part-*.csv"))
        ):
            csv_mb += os.path.getsize(src) / 1e6
            shutil.move(src, os.path.join(landing, f"upload_{i}.csv"))
        cfg = load_cfg({"app": {"max_file_mb": 4096}})
        # best-of-N, matching the per-query methodology above: a
        # single run lets one shared-host stall masquerade as engine
        # throughput (r3 recorded 3.9 MB/s from exactly that)
        dt = float("inf")
        for rep in range(reps):
            rep_out = f"{outdir}_{rep}"
            t0 = time.time()
            audits, _ = ingest_directory(spark, landing, rep_out, cfg)
            dt = min(dt, time.time() - t0)
            assert audits and all(a.acceptable for a in audits), [
                a.issues for a in audits
            ]
        timings["intake_8file_batch"] = round(dt, 3)
        timings["intake_csv_mb_per_s"] = round(csv_mb / dt, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(
        sum(v for k, v in timings.items() if not k.endswith("_mb_per_s")), 3
    )
    here = os.path.dirname(os.path.abspath(__file__))
    # Per-query regression diff against the ACTUAL previous round.
    # BENCH_QUERIES.json alone is overwritten by every local bench run
    # (including sf0.01 iteration runs), so diffing against it could
    # compare r(N) vs a mid-round or pre-r(N-1) snapshot — r6's
    # BENCH_DELTA claimed +1.3s where the true r5→r6 delta was +0.15s.
    # Fix: the current round is 1 + the highest driver-written
    # BENCH_r{N}.json; each full-SF run snapshots its per-query dict to
    # a round-stamped BENCH_QUERIES_r{N}.json, and the delta diffs
    # against the previous round's stamped file (falling back to the
    # driver's BENCH_r{N}.json parsed dict), naming it in prev_round.
    import glob as _bglob

    rounds = []
    for path in _bglob.glob(os.path.join(here, "BENCH_r*.json")):
        m_r = re.search(r"BENCH_r(\d+)\.json$", path)
        if m_r:
            rounds.append(int(m_r.group(1)))
    cur_round = (max(rounds) if rounds else 0) + 1
    prev_q, prev_src = {}, None
    for n in sorted(rounds, reverse=True):
        stamped = os.path.join(here, f"BENCH_QUERIES_r{n:02d}.json")
        try:
            _pq = json.load(open(stamped))
            prev_q, prev_src = _pq.get("queries", {}), os.path.basename(stamped)
        except Exception:
            try:
                prev = json.load(open(os.path.join(here, f"BENCH_r{n:02d}.json")))
                prev_q = (prev.get("parsed") or {}).get("queries", {})
                if not prev_q:  # older shape — parse the stdout tail
                    m_prev = re.search(r'\{"metric".*\}', prev.get("tail", ""))
                    prev_q = (
                        json.loads(m_prev.group(0))["queries"] if m_prev else {}
                    )
                if prev_q:
                    prev_src = f"BENCH_r{n:02d}.json"
            except Exception:
                pass
        if prev_q:
            break
    if prev_q:
        diag = {
            "prev_round": prev_src,
            "delta_vs_prev": {
                k: round(v - prev_q[k], 3)
                for k, v in timings.items()
                if k in prev_q and not k.endswith("_mb_per_s")
            },
        }
        print(json.dumps(diag))
        # subset runs probe the stdout contract, not perf — a subset
        # delta is partial-suite-only and must never become a round's
        # recorded truth (ADVICE r8: a subset run at sf>=0.1 used to
        # overwrite BENCH_DELTA.json with partial timings)
        if sf >= 0.1 and subset == 0:  # cross-SF deltas are meaningless
            with open(os.path.join(here, "BENCH_DELTA.json"), "w") as f:
                json.dump(diag, f, indent=1)
    # Per-query timings: their own stdout line + a side file — NEVER
    # on the final line. The driver stores only a 2000-char stdout
    # tail and regex-matches '{"metric"...' in it; r4 AND r5 both
    # recorded parsed:null because the final line carried the
    # 65-entry per-query dict (~2.2 KB) and the opener was truncated
    # away. The canonical final line below is a few hundred bytes and
    # cannot outgrow the window no matter how many queries register.
    qline = {"queries": timings, "sf": sf}
    print(json.dumps(qline))
    # Driver-parseable per-query stamps (VERDICT r14 task 2): the
    # 412-entry map above is one ~12 KB line with no "metric" key, so
    # the driver's '{"metric"...' regex never captured it and PERF_r14
    # had per_query={}. Re-emit the same map as a sequence of compact
    # one-line JSON chunks, each its own '{"metric": "per_query_chunk"}'
    # record and each <= 2000 chars (the driver's tail window), printed
    # immediately before the final headline line (which stays compact
    # and LAST).
    chunk: dict[str, float] = {}
    chunk_i = 0

    def _emit_chunk(i: int, c: dict) -> None:
        print(
            json.dumps(
                {"metric": "per_query_chunk", "i": i, "value": c},
                separators=(",", ":"),
            )
        )

    budget = 1900  # headroom under the 2000-char tail window
    overhead = len('{"metric":"per_query_chunk","i":999,"value":{}}')
    used = overhead
    for k in sorted(timings):
        entry = len(json.dumps({k: timings[k]}, separators=(",", ":")))
        if chunk and used + entry > budget:
            _emit_chunk(chunk_i, chunk)
            chunk_i += 1
            chunk, used = {}, overhead
        chunk[k] = timings[k]
        used += entry
    if chunk:
        _emit_chunk(chunk_i, chunk)
    if subset == 0:  # subset runs probe the stdout contract, not perf —
        # don't let them clobber the last full-suite measurement
        with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
            json.dump(qline, f, indent=1)
    if sf >= 0.1 and subset == 0:  # stamp only full-SF FULL-SUITE runs;
        # sf0.01 iteration runs and subset probes must not become a
        # round's snapshot (ADVICE r8)
        with open(
            os.path.join(here, f"BENCH_QUERIES_r{cur_round:02d}.json"), "w"
        ) as f:
            json.dump(qline, f, indent=1)
    out = {
        "metric": "headline_query_suite_runtime",
        "value": total,
        "unit": "sec",
        "n_queries": sum(
            1 for k in timings if not k.endswith("_mb_per_s")
        ),
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
