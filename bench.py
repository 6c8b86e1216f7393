#!/usr/bin/env python
"""Benchmark harness — one JSON line to stdout.

Headline metric (BASELINE.json): turns/sec extraction throughput over a
synthetic transcript corpus scaled to the SF dir, plus per-query wall times
for the representative operator set at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  BENCH_TURNS          override transcript turn count (approx)

The two-cluster-size scaling evidence (N vs 4N) lives in
scripts/scaling_run.py -> BENCH/BASELINE.md; this file is the single-config
per-round bench the driver records as BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("deepseek-ocr-rs-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def materialize(df) -> None:
    """Full materialization (noop sink) — count() could prune work."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from deepseek_ocr_rs_spark.operators.extract import extract_turns
    from deepseek_ocr_rs_spark.sources.transcripts import generate_transcripts_df

    timings: dict[str, float] = {}

    # ---- headline: extraction turns/sec over a generated transcript corpus
    target_turns = int(os.environ.get("BENCH_TURNS", str(int(10_000_000 * sf))))
    n_convs = max(200, target_turns // 13)  # ~13 turns/conv incl. skew tail
    # Stage the corpus to parquet and read back: a columnar scan feeds
    # mapInArrow vectorized; an in-memory object-row cache would pay a
    # per-row JVM->Arrow conversion + GC of the cached objects (~6x slower
    # at 1M rows).  Generation/staging is OUTSIDE the timed span.
    import tempfile

    stage_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_sf{sf}")
    generate_transcripts_df(
        spark, n_convs, seed=42, partitions=cpus * 4
    ).write.mode("overwrite").parquet(stage_dir)
    corpus = spark.read.parquet(stage_dir)
    n_turns = corpus.count()
    # Warm python workers AND the JVM arrow-serialization JIT with one FULL
    # untimed pass of the measured topology: a partial warm-up leaves C2
    # compilation and the page cache cold for part of the timed run
    # (observed up to 2x on the scaling harness) — the timed number below
    # is warm steady-state throughput.
    materialize(
        extract_turns(
            corpus.repartitionByRange(cpus * 2, "conv_id", "turn_idx"),
            run_id="warmup", chunk_bytes=0,
        ).sortWithinPartitions("conv_id", "turn_idx")
    )

    # production topology: range-partition the INPUT, extract, local sort —
    # one shuffle total, globally ordered output (plans/pipeline.py).
    # best-of-2: this is a shared VM with bursty hypervisor steal; the min
    # is the least noise-contaminated observation of the same fixed work
    def run_headline() -> float:
        t0 = time.perf_counter()
        ranged = corpus.repartitionByRange(cpus * 2, "conv_id", "turn_idx")
        extracted = extract_turns(
            ranged, run_id="bench", chunk_bytes=0
        ).sortWithinPartitions("conv_id", "turn_idx")
        materialize(extracted)
        return time.perf_counter() - t0

    walls = [run_headline(), run_headline()]
    # hostile-window insurance: when the two observations disagree by
    # >1.5x the window is drifting (identical work swings 4-15x on this
    # shared VM, BENCH/BASELINE.md) — buy one more observation
    if max(walls) > 1.5 * min(walls):
        walls.append(run_headline())
    extract_sec = min(walls)
    timings["extract_transcripts"] = round(extract_sec, 3)
    turns_per_sec = n_turns / extract_sec

    # ---- representative operator queries at the SF dir
    qset = entry_mod.queries()
    bench_queries = [
        "extract_docs_plain",
        "extract_html_wrapped",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q10_returned_items",
        "w_latest_event_per_user",
        "w_sessionize",
        "doc_exact_dedup",
        "doc_token_counts",
        "doc_quality",
        "doc_lang_id",
        "doc_fingerprint",
        "dedup_minhash_pairs",
        "dedup_simhash_candidates",
        "ann_brute_force",
        "ann_lsh",
        "ann_ivf",
        "ann_batch_lsh",
        "pipeline_curation",
        "conv_render_v2",
        "conv_render_deepseek",
        "s_weighted_sample",
        # round-4 additions: star-based component resolution, MoE dispatch,
        # reverse-order part flatten, bicubic resample, SSE frames,
        # repetition/decontamination, as-of join
        "dedup_components",
        "moe_topk_dispatch",
        "conv_flatten_parts",
        "media_bicubic_resample",
        "x_sse_frames",
        "doc_repetition_signals",
        "doc_decontaminate",
        "j_asof_join",
        "doc_span_dedup",
        "pack_training_sequences",
        # late round-4 curation tail: PII scrub, epoch sharding, TF-IDF
        "doc_pii_scrub",
        "train_shard_assignment",
        "doc_tfidf_topk",
        # search tier: inverted index + BM25 ranking
        "search_posting_lists",
        "search_bm25_topk",
        # bigram-LM fluency scoring (perplexity-filter analog)
        "doc_lm_score",
        # temperature source-mixture sampling
        "train_mixture_sample",
        # Lloyd k-means over embeddings
        "emb_kmeans_assign",
        # deterministic sketches: HLL / Bloom / Count-Min
        "sketch_hll_users",
        "sketch_bloom_recent_buyers",
        "sketch_cm_user_counts",
        # TextRank keyword centrality
        "doc_textrank_terms",
        # canonical selection: SemDeDup cells + quality-aware pruning
        "emb_semantic_dedup",
        "dedup_quality_keep_best",
        # BPE vocabulary induction (round-0 pair statistics)
        "train_bpe_pairs",
        # winnowing passage matches (fingerprint + capped bucket join)
        "doc_winnow_matches",
        # web tier: outlink walk + canonicalization, WARC byte parsing,
        # suffix-chain blocklist anti-join, integer PageRank iterations
        "web_outlinks",
        "warc_parse_records",
        "web_blocklist_filter",
        "graph_host_pagerank",
        "web_surt_latest",
        "web_redirect_resolve",
        "pipeline_incremental_extract",
        "web_feed_entries",
        "web_crawl_traps",
        "web_resolved_outlinks",
        # round-5: cover the rest of the driver-checked web tier so the
        # regression table spans everything CORRECTNESS checks
        "web_crawl_diff",
        "web_anchor_texts",
        "web_anchor_stats",
        "web_host_stats",
        "web_page_metadata",
        "web_robots_filter",
        "web_robots_sitemaps",
        "web_sitemap_urls",
        "web_noindex_filter",
        "web_registrable_domains",
        "web_hreflang_clusters",
        "web_frontier_schedule",
        "web_recrawl_policy",
        "web_revalidation_candidates",
        "web_redirect_from_warc",
        "web_wet_roundtrip",
        "warc_http_responses",
        "pipeline_discovery_schedule",
        # round-5: real PNG decode -> bicubic, perceptual image dedup,
        # real WAV decode -> integer clip features + sliding frames
        "media_decode_resample",
        "media_image_dedup",
        "media_audio_features",
        "media_audio_frames",
        # round-5: Common Crawl .warc.gz member framing round trip,
        # BPE tokenizer application with a pinned merge table
        "web_warcgz_roundtrip",
        "train_bpe_encode",
        # round-5: real PDF text-layer codec + XY-cut reading order,
        # WebDataset tar shards end-to-end
        "media_pdf_text",
        "media_pdf_reading_order",
        "media_wds_shards",
        # round-5: real animated-GIF decode + timestamp frame sampling,
        # perceptual video dedup over per-frame dHash signatures
        "media_video_frames",
        "media_video_dedup",
        # perceptual audio dedup over energy-envelope signatures
        "media_audio_dedup",
        # round-5: CCNet-style curation capstone (paragraph keep-first
        # dedup -> per-language bigram LM -> histogram-quantile buckets)
        "pipeline_ccnet_buckets",
        # round-5: WARC -> HTTP -> extract -> dedup -> quality capstone
        "pipeline_web_curation",
        # round-5: ExactSubstr duplicated-span finder + cut apply step,
        # SFT loss-mask span computation over the deepseek rendering
        "dedup_substring_spans",
        "dedup_substring_cut",
        "sft_loss_mask_spans",
        # round-5: C4 line filters + Gopher A1.1 quality rules
        "doc_c4_filters",
        "doc_gopher_quality",
        # round-5: T5 span-corruption example construction
        "train_span_corruption",
        # round-5: leakage-safe cluster-coherent splits
        "train_split_assignment",
        # round-5 continuation: agent-transcript tool analytics,
        # sliding-window chunking, SQ8 scalar-quantization ANN
        "conv_tool_latency",
        "conv_tool_runs",
        "doc_chunk_windows",
        "ann_sq8_topk",
        "emb_hard_negatives",
        "doc_oov_rate",
        "ann_mrl_topk",
        "conv_agent_summary",
        "train_curriculum_order",
        # round-5 continuation: engine-native session windows,
        # integer-exact HITS hubs/authorities
        "w_session_stats",
        "graph_host_hits",
        # round-5 continuation: length-bucketed dynamic batching,
        # positional phrase search
        "train_length_batches",
        "search_phrase_match",
        # round-5 continuation: embedding-space decontamination,
        # degree-ordered triangle counting
        "emb_benchmark_decontam",
        "graph_host_triangles",
        # round-5 continuation: Luhn-validated card scrubbing,
        # integer-exact Flesch readability
        "doc_card_scrub",
        "doc_readability",
        # context-window assembly fit over agent transcripts
        "conv_context_fit",
        # encoding-damage (mojibake) signal counts
        "doc_mojibake",
        # shuffle-free type-token / hapax ratios
        "doc_lexical_diversity",
        # exact per-source length percentiles at histogram scale
        "doc_length_quantiles",
        # conversation-level dedup tier: prefix-duplicate convs via chain
        # signatures, consecutive-retry collapse, DPO preference pairs
        "conv_prefix_dedup",
        "conv_retry_collapse",
        "conv_preference_pairs",
        # conversation-trie divergence, 1-bit sign-quantization ANN,
        # ordered funnel-stage analytics
        "conv_branch_points",
        "ann_sign_hamming",
        "w_funnel_stages",
        # k-core peel, posting-list compression economics, host-level
        # template-span detection
        "graph_host_kcore",
        "search_postings_compression",
        "doc_template_spans",
        # cross-host mirror pairs, per-doc n-gram novelty
        "doc_host_mirrors",
        "doc_ngram_novelty",
        # windowed mergeable HLL, segment-level language consistency
        "sketch_hll_daily_users",
        "doc_code_switching",
        # asymmetric containment verify over the LSH candidate tier
        "dedup_containment_pairs",
        # join-key skew profile (log2 bucket histogram, NULL tier)
        "diag_key_skew",
        # crawl-over-crawl overlap (the dedup-rate-between-snapshots metric)
        "doc_crawl_overlap",
        # Feistel epoch shuffle (the zero-shuffle ORDER BY rand() killer)
        "train_epoch_shuffle",
        # weekly cohort retention matrix (distinct-agg + tiny window)
        "a_retention_cohorts",
        # bottom-k KMV source-overlap sketches (histogram-pruned)
        "sketch_kmv_source_overlap",
        # learned URL-param semantics (DUST digest invariance)
        "web_url_param_learn",
        # synchronous label-propagation communities (Pregel pattern)
        "graph_label_communities",
        # content-defined chunking (shift-resilient Rabin boundaries)
        "doc_cdc_chunks",
        # reliability bins + ECE over a planted miscalibrated scorer
        "diag_quality_calibration",
        # per-language BPE fertility (distinct-word fold + group rollup)
        "train_tokenizer_fertility",
        # credential scrubbing (JVM regexp chain, 7 pattern tiers)
        "doc_secret_scrub",
        # UniMax waterfilling quotas (corpus-sized work = one count agg)
        "train_unimax_quotas",
        # exact pre-join cardinality guard (count-table product)
        "diag_join_explosion",
        # funnel-edge latency percentiles (histogram-scale exact)
        "w_funnel_latency",
        # cross-split exact-dup contamination audit
        "train_split_leakage",
        # per-file scan-balance inventory (small-files / hot-file)
        "diag_scan_balance",
        # Unicode script mix per doc (pure codepoint arithmetic)
        "doc_script_profile",
        # measured LSH S-curve on the bounded calibration sample
        "diag_lsh_scurve",
        # Heaps'-law vocabulary growth panel
        "doc_vocab_growth",
        # one-pass curation funnel report (cumulative stage flags)
        "pipeline_curation_funnel",
        # dataset-card cube (source x lang grouping sets + dup rate)
        "doc_dataset_card",
    ]
    # best-of-2 per query, same insurance as the headline: on this shared VM
    # hypervisor steal swings identical work 4-15x (BENCH/BASELINE.md); the
    # min of two trials is the least noise-contaminated observation and keeps
    # the committed record comparable round-over-round.
    def run_query(name: str) -> float:
        t0 = time.perf_counter()
        materialize(qset[name](spark, sf_dir))
        return time.perf_counter() - t0

    for name in bench_queries:
        timings[name] = round(min(run_query(name) for _ in range(2)), 3)

    print(
        json.dumps(
            {
                "metric": "wall seconds to extract the synthetic transcript "
                          "corpus (range-partitioned input -> mapInArrow "
                          "extraction -> ordered output); turns_per_sec is "
                          "the BASELINE.json headline",
                "value": round(extract_sec, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns_per_sec": round(turns_per_sec, 1),
                "n_turns": n_turns,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
