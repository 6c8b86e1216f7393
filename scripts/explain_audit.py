#!/usr/bin/env python
"""Physical-plan audit -> PLANS.md.

For each representative query, capture .explain("formatted") and assert the
plan properties that matter at 100 TB:
  * PushedFilters reach the parquet scan,
  * ReadSchema is pruned to the referenced columns,
  * small dimensions use BroadcastHashJoin,
  * narrow pipelines sit inside WholeStageCodegen spans,
  * the extraction pipeline contains exactly ONE exchange.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDITS = {
    "q1_pricing_summary": [
        ("filter pushed to scan", "PushedFilters: [IsNotNull(l_shipdate)"),
        ("column pruning", "ReadSchema"),
        ("codegen", "codegen id"),
        ("partial agg", "HashAggregate"),
    ],
    "q3_shipping_priority": [
        ("broadcast dim", "BroadcastHashJoin"),
        ("topk no full sort", "TakeOrderedAndProject"),
        ("filter pushdown", "PushedFilters"),
    ],
    "q5_local_supplier_volume": [
        ("broadcast dims", "BroadcastHashJoin"),
        ("codegen", "codegen id"),
    ],
    "q6_forecast_revenue": [
        ("all predicates pushed", "PushedFilters: [IsNotNull(l_shipdate)"),
        ("pruned scan", "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
    ],
    "w_latest_event_per_user": [
        ("single shuffle window", "hashpartitioning(user_id"),
        ("window codegen", "Window"),
    ],
    "set_customers_without_orders": [
        ("anti join", "BroadcastHashJoin"),
        ("anti semantics", "LeftAnti"),
    ],
    "ann_brute_force": [
        ("topk no full sort", "TakeOrderedAndProject"),
        ("pruned scan", "ReadSchema: struct<vec_id:bigint,embedding"),
    ],
    "doc_exact_dedup": [
        ("partial agg before shuffle", "HashAggregate"),
        ("shuffle on digest", "hashpartitioning(text_md5"),
    ],
    "s_weighted_sample": [
        ("pure map-side filter (codegen)", "* Filter"),
        ("pruned scan", "ReadSchema: struct<event_id"),
    ],
    "doc_lang_id": [
        ("single Arrow batch stage", "ArrowEvalPython"),
    ],
    "conv_render_deepseek": [
        # both windows (_pos, _n_total) and the groupBy agg reuse ONE
        # conv_id-keyed partitioning — no second exchange for rendering
        ("conv_id-keyed shuffle", "hashpartitioning(conv_id"),
        ("partial agg", "HashAggregate"),
    ],
    "q2_min_cost_supplier": [
        # correlated-min as ONE window pass: a single part-keyed shuffle
        # replaces the textbook MIN-subquery self-join
        ("broadcast part dim", "BroadcastHashJoin"),
        ("one window shuffle on the part key", "hashpartitioning(p_partkey"),
        ("size filter pushed to the part scan", "PushedFilters"),
    ],
    "q21_sole_return_supplier": [
        # EXISTS + NOT EXISTS collapsed to one per-order aggregation:
        # exactly one lineitem shuffle, no self-joins
        ("single per-order shuffle", "hashpartitioning(l_orderkey"),
        ("partial agg before the shuffle", "HashAggregate"),
        ("top-10 without a full sort", "TakeOrderedAndProject"),
    ],
    "q16_supplier_count_by_attrs": [
        ("NOT IN as broadcast anti join", "BroadcastHashJoin"),
        ("anti semantics", "LeftAnti"),
    ],
    "pipeline_curation": [
        # the whole curation chain is one plan: dedup window shuffle keyed
        # on the md5 digest (32 chars, not multi-KB documents),
        # scoring+filter+sampler fused map-side
        # Spark projects the partition expression to _w0 before the
        # Exchange, so assert the digest projection itself
        ("dedup window keyed on content digest", "md5(cast(text"),
        ("sampler is a map-side filter", "* Filter"),
    ],
    "ann_batch_lsh": [
        # batch ANN: the candidate join is keyed on the int64 bucket;
        # the per-query top-k is one window pass
        ("bucket-keyed candidate join", "lsh_bucket"),
        ("per-query topk window", "hashpartitioning(query_id"),
    ],
    "moe_topk_dispatch": [
        # T3 dispatch: two window shuffles (token key, then expert key),
        # both on narrow (id, expert, score) rows — the score arrays never
        # ride a shuffle, and the scan is pruned to the two used columns
        ("per-token topk window", "hashpartitioning(vec_id"),
        ("per-expert capacity window", "hashpartitioning(expert_id"),
        ("pruned scan", "ReadSchema: struct<vec_id:bigint,embedding"),
    ],
    "media_bicubic_resample": [
        # F7: scan pruned to the one referenced column; the deterministic
        # 100-doc sample is an ordered LIMIT (TakeOrderedAndProject — no
        # global sort materialization); the kernel is ONE Arrow-batched
        # map with zero downstream shuffles
        ("pruned scan", "ReadSchema: struct<doc_id"),
        ("ordered limit, not a global sort", "TakeOrderedAndProject"),
        ("arrow-batched kernel", "MapInPandas"),
    ],
    "x_sse_frames": [
        # X3: frame sequencing is pure JVM — conversation-keyed window
        # shuffles on narrow rows, no Python stage anywhere in the plan
        ("conv-keyed windows", "hashpartitioning(conv_id"),
        ("pruned scan", "ReadSchema: struct<event_id:bigint,user_id:bigint"),
    ],
    "j_asof_join": [
        # as-of via union-and-window: ONE hash shuffle on the join key,
        # a window, and NO range-explosion join operator anywhere
        ("key-partitioned window", "hashpartitioning(user_id"),
        ("window operator", "Window"),
    ],
    "doc_decontaminate": [
        # r06 kernel: the bench gram set ships inside the ONE Arrow pass
        # (broadcast variable, not a join); per-doc stats emit map-side
        ("single Arrow stats pass", "MapInPandas"),
        ("no gram join anywhere", "!BroadcastHashJoin"),
        ("no gram shuffle", "!hashpartitioning(gram"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "doc_repetition_signals": [
        # r06 kernel: exact integer counters emit from ONE Arrow pass —
        # the old groupBy/distinct of ~50M gram strings is gone
        ("single Arrow stats pass", "MapInPandas"),
        ("no gram shuffle", "!hashpartitioning(gram"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "pack_training_sequences": [
        # the global prefix sum must run as the two-phase scan: the only
        # unpartitioned window is over the TINY bucket-sums aggregate;
        # corpus rows see a bucket-partitioned window + broadcast join
        ("bucket-partitioned corpus window", "hashpartitioning(_pack_bkt"),
        ("broadcast bucket offsets", "BroadcastHashJoin"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "doc_span_dedup": [
        # r06 kernel: the tiny banned tail ships as a driver set into the
        # re-chunk Arrow pass; the only shuffle is the span-frequency agg
        # the frequency count + banned-tail collection run at BUILD
        # time (bounded driver set); the final plan is scan -> rebalance
        # -> re-chunk pass with no shuffle at all
        ("Arrow chunk/reassembly passes", "MapInPandas"),
        ("no key shuffle in the final plan", "!hashpartitioning"),
        ("no anti-join of the corpus", "!LeftAnti"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "conv_flatten_parts": [
        # P3 flatten: ONE user-keyed shuffle; the ordered-parts collect is
        # a partial ObjectHashAggregate (map-side combine of list buffers)
        ("single user-keyed shuffle", "hashpartitioning(user_id"),
        ("partial collect agg", "ObjectHashAggregate"),
    ],
    "doc_pii_scrub": [
        # PII redaction is a pure JVM regexp chain: a shuffle-free
        # per-row map fused into one codegen span over a pruned scan
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
        ("codegen", "codegen id"),
    ],
    "train_shard_assignment": [
        # the ONLY shuffle is the hash exchange on shard_id; in-shard
        # positions come from a by-shard window (no global sort anywhere)
        ("shard-keyed window", "hashpartitioning(shard_id"),
        ("window operator", "Window"),
    ],
    "train_global_ids": [
        # the distributed zipWithIndex: the range exchange + local ranks
        # run once inside the localCheckpoint job (boundary stability —
        # see assign_global_ids docstring), so the final plan reads the
        # checkpointed RDD twice (count pass + join) with NO further
        # full-data exchange; prefix offsets broadcast back
        ("reads the pinned checkpoint", "Scan ExistingRDD"),
        ("broadcast prefix offsets", "BroadcastHashJoin"),
    ],
    "train_dsir_resample": [
        # bucket weights are a B-row table broadcast back to the exploded
        # grams; the per-doc score agg is partial (map-side combinable)
        ("broadcast weight join", "BroadcastHashJoin"),
        ("partial score agg", "HashAggregate"),
        ("pruned doc scan", "ReadSchema: struct<doc_id:bigint,text:string"),
    ],
    "doc_winnow_matches": [
        # r06 kernel: selection runs inside ONE Arrow pass (md5 memo +
        # numpy sliding-window min) — fingerprints leave it at ~2/(w+1)
        # density BEFORE any cross-document traffic; the pair stage
        # still shuffles on fp_hash only; no window, no gram table
        ("Arrow fingerprint pass", "MapInPandas"),
        ("no selection window", "!WindowExec"),
        ("hash-bucketed pair join", "hashpartitioning(fp_hash"),
        ("fingerprint set computed once", "InMemoryTableScan"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "train_bpe_pairs": [
        # BPE round-0 pair stats: the word count is the one corpus-scale
        # aggregate (map-side combinable), pair counting re-aggregates the
        # vocab-sized table, top-k avoids a global sort, and Catalyst
        # prunes the document scan to the text column alone
        ("map-side partial word count", "HashAggregate"),
        ("top-k without global sort", "TakeOrderedAndProject"),
        ("no Python in the plan", "!BatchEvalPython"),
        ("pruned scan (text only)", "ReadSchema: struct<text:string>"),
    ],
    "doc_tfidf_topk": [
        # tf is a map-side-combinable partial aggregate; the vocab join
        # broadcasts at this SF (shuffle join at web-scale vocab); top-k
        # is a doc-partitioned window, never a global one
        ("map-side partial agg", "HashAggregate"),
        ("broadcast vocab join", "BroadcastHashJoin"),
        ("doc-keyed window", "hashpartitioning(doc_id"),
    ],
    "search_posting_lists": [
        # inverted index: (term, doc) partial agg then term-keyed list
        # build — the collect_list runs as a partial ObjectHashAggregate
        ("term-keyed exchange", "hashpartitioning(term"),
        ("partial posting-list agg", "ObjectHashAggregate"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "web_surt_latest": [
        # round-5 fix: the canonicalizer is materialized once (sentinel
        # count pinned in tests/test_plan_guard.py); the rollup is the
        # documented max(struct) SortAggregate demotion, still map-side
        # combined before its single surt-keyed exchange; the cheap
        # canonical_ok_col keep-filter is what pushes to the scan —
        # never the computed column
        ("revisit rollup (documented demotion)", "SortAggregate"),
        ("surt-keyed exchange", "hashpartitioning(surt"),
        ("no Python anywhere", "!ArrowEvalPython"),
        ("no Python anywhere (row)", "!BatchEvalPython"),
    ],
    "web_resolved_outlinks": [
        # r06 kernel: tokenize+resolve+canonicalize fused into ONE
        # MapInPandas; the only exchange is the scale-adaptive
        # round-robin rebalance (a no-op on multi-split inputs)
        ("single fused Python pass", "MapInPandas"),
        ("no second Python boundary", "!ArrowEvalPython"),
        ("no explode (rows emitted in-pass)", "!Generate"),
        ("no key shuffle", "!hashpartitioning"),
    ],
    "media_decode_resample": [
        # PNG encode fixture -> decode+resize: two chained Arrow map
        # stages, zero shuffles; pixels land where their doc was scanned
        ("Arrow map stages", "MapInPandas"),
        ("zero exchanges (pure map)", "!Exchange"),
    ],
    "media_image_dedup": [
        # decode+dHash is a map; the ONLY shuffle a real media table
        # needs is the 64-bit-key duplicate grouping — at the gate's
        # 100-row post-limit fixture the input is one partition, so the
        # planner (correctly) elides even that exchange and runs the
        # partial+final ObjectHashAggregate pair back to back
        ("decode+hash as Arrow map", "MapInPandas"),
        ("partial id-list agg", "ObjectHashAggregate"),
    ],
    "media_audio_features": [
        # WAV synth/encode/decode/reduce: chained Arrow maps, no shuffle
        ("Arrow map stages", "MapInPandas"),
        ("zero exchanges (pure map)", "!Exchange"),
    ],
    "media_audio_frames": [
        ("Arrow map stages", "MapInPandas"),
        ("zero exchanges (pure map)", "!Exchange"),
    ],
    "media_pdf_text": [
        # build + parse are chained Arrow maps; extraction rows stay
        # where their document was scanned
        ("Arrow map stages", "MapInPandas"),
        ("zero exchanges (pure map)", "!Exchange"),
    ],
    "media_pdf_reading_order": [
        ("Arrow map stages", "MapInPandas"),
        ("zero exchanges (pure map)", "!Exchange"),
    ],
    "media_wds_shards": [
        # a real pipeline reads shard FILES directly — the sample pass
        # is one Arrow map riding shard locality; the gate's 100-row
        # post-limit fixture is single-partition, so even the fixture's
        # grouping aggregate needs no exchange
        ("sample pass as Arrow map", "MapInPandas"),
        ("ordered member pack", "ObjectHashAggregate"),
    ],
    "media_video_frames": [
        # GIF synth/encode/decode/sample: chained Arrow maps riding the
        # media table's partitioning; sample rows stay with their clip
        ("Arrow map stages", "MapInPandas"),
        ("zero exchanges (pure map)", "!Exchange"),
    ],
    "media_video_dedup": [
        # decode+hash is a pure map; the ONLY shuffle at scale is the
        # signature group (partial+final aggregate, ids-only) — the
        # gate's 100-row post-limit fixture is single-partition, so even
        # the grouping needs no exchange here
        ("Arrow map stages", "MapInPandas"),
        ("two-phase signature grouping", "ObjectHashAggregate"),
    ],
    "media_audio_dedup": [
        # same posture as media_video_dedup in the time domain:
        # WAV synth/encode/decode + envelope hash are chained Arrow
        # maps, the signature group is the only (ids-only) aggregate
        ("Arrow map stages", "MapInPandas"),
        ("two-phase signature grouping", "ObjectHashAggregate"),
    ],
    "pipeline_ccnet_buckets": [
        # keep-first paragraph dedup shuffles on the md5 digest, never
        # the paragraph text; the quantile cut's threshold row joins
        # back as a broadcast; the span and score tables are cached at
        # their branch points (r06: the chunk pass re-ran per branch)
        ("dedup window keyed on the span digest", "md5(cast"),
        ("broadcast threshold join", "BroadcastHashJoin"),
        ("branch points cached", "InMemoryTableScan"),
        ("partial aggs throughout", "HashAggregate"),
    ],
    "pipeline_web_curation": [
        # WARC parse -> HTTP parse -> extraction are chained Arrow maps;
        # the only exchanges are the extracted-text dedup window and the
        # narrow id->uri rejoin; the quality floor fuses map-side
        ("chained Arrow stages", "MapInPandas"),
        ("extraction kernel stage", "MapInArrow"),
        ("dedup window on the extracted digest", "md5(cast(text_md"),
        ("map-side quality filter", "* Filter"),
    ],
    "train_bpe_encode": [
        # r06 kernel: tokenize+segment per doc in ONE Arrow pass with a
        # per-batch word memo — the distinct-word table, its merge-fold
        # join, and the re-join to the corpus are gone
        ("single Arrow encode pass", "MapInPandas"),
        ("no vocab join", "!BroadcastHashJoin"),
        ("no key shuffle", "!hashpartitioning"),
    ],
    "web_warcgz_roundtrip": [
        # ONE file-id aggregation (the write's natural partitioning);
        # per-record gzip + member split are Arrow maps around it
        ("file grouping is the only exchange", "hashpartitioning(file_id"),
        ("gzip/split as Arrow maps", "MapInPandas"),
        ("ordered record pack", "ObjectHashAggregate"),
    ],
    "doc_textrank_terms": [
        # the corpus is scanned once for the bigram graph; iterations
        # touch only vocabulary-sized tables read from cache (r06: the
        # edge/degree tables re-ran the bigram pass ~3x per iteration
        # before they were persisted); final top-k needs no global sort
        ("top-k without global sort", "TakeOrderedAndProject"),
        ("no row-Python in the plan", "!BatchEvalPython"),
        ("loop-invariant tables cached", "InMemoryTableScan"),
    ],
    "sketch_bloom_recent_buyers": [
        # the filter words broadcast to the probe; the probe side's only
        # exchange is the per-key hit count, and the build side pushes
        # its date filter into the scan
        ("broadcast filter words", "BroadcastHashJoin"),
        ("build-side filter pushdown", "PushedFilters: [IsNotNull(o_orderdate)"),
        ("no Python in the plan", "!BatchEvalPython"),
    ],
    "emb_semantic_dedup": [
        # r06 kernel: nearest-centroid assignment is a numpy Arrow pass
        # against the k-row collected codebook; the pair+verdict stage is
        # ONE grouped Arrow stage per cell (gram-matrix applyInPandas) —
        # pairs never leave their cell
        ("numpy assign pass", "MapInPandas"),
        ("grouped per-cell verdict", "FlatMapGroupsInPandas"),
        ("cell-keyed exchange", "hashpartitioning(cluster"),
        ("never corpus-squared", "!CartesianProduct"),
    ],
    "dedup_quality_keep_best": [
        # verify tier is the vectorized Arrow jaccard kernel, never a
        # row-at-a-time Python UDF; the dominance verdict shuffles on
        # the doc key of the bounded pair set only
        ("vectorized verify kernel", "ArrowEvalPython"),
        ("no row-at-a-time Python", "!BatchEvalPython"),
        ("verdict keyed on pair member", "hashpartitioning(me"),
        ("never corpus-squared", "!CartesianProduct"),
    ],
    "sketch_hll_users": [
        # registers reduce map-side: partial max before the exchange
        ("partial register max", "HashAggregate"),
        ("register-keyed exchange", "hashpartitioning(bucket"),
        ("pruned scan", "ReadSchema: struct<user_id:bigint>"),
    ],
    "emb_kmeans_assign": [
        # r06 kernel: assignment runs vectorized against the k-row
        # collected centroid matrix (the codebook posture) — no n x k
        # crossJoin, no window; the exact member-mean fold stays JVM
        ("numpy assign pass", "MapInPandas"),
        ("no centroid crossJoin", "!BroadcastNestedLoopJoin"),
        ("no per-vector window", "!WindowExec"),
    ],
    "train_mixture_sample": [
        # per-lang rate table attaches by broadcast; inclusion is a
        # map-side filter — the corpus never shuffles for the sample
        ("broadcast rate join", "BroadcastHashJoin"),
        ("no corpus shuffle for inclusion", "!hashpartitioning(doc_id"),
        ("no Python in the plan", "!BatchEvalPython"),
    ],
    "doc_lm_score": [
        # bigram model trained and applied with hash aggregations only;
        # the doc<->model join is a pair-keyed equi-join, no broadcast of
        # the (potentially vocabulary^2-sized) model
        ("pair-keyed model agg", "hashpartitioning(w1"),
        ("no Python in the plan", "!BatchEvalPython"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "j_interval_join_events": [
        # bucketization turns the BETWEEN theta join into a hash
        # equi-join on the bucket id — the whole point of the operator
        ("hash equi-join on bucket", "BroadcastHashJoin"),
        ("never a nested loop", "!NestedLoop"),
        ("pruned events scan", "ReadSchema: struct<event_id:bigint,ts:timestamp"),
    ],
    "ann_pq_topk": [
        # compressed-code serving: the ADC fold is a JVM expression over
        # (id, code) only — no Python stage, no global sort
        ("no Python in the serving plan", "!ArrowEvalPython"),
        ("no row-Python either", "!BatchEvalPython"),
        ("top-k without global sort", "TakeOrderedAndProject"),
    ],
    "ann_ivfpq_topk": [
        ("top-k without global sort", "TakeOrderedAndProject"),
        ("never a nested loop", "!NestedLoop"),
    ],
    "search_bm25_topk": [
        # per-query shuffle carries only matching (id, term) pairs; df /
        # N / avgdl attach as broadcasts; final top-k is a per-partition
        # heap + driver merge, never a global sort
        ("broadcast stats join", "BroadcastHashJoin"),
        ("top-k without global sort", "TakeOrderedAndProject"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "dedup_substring_spans": [
        # ExactSubstr finder: the gram frequency agg is the only
        # corpus-wide shuffle (map-side combined, keyed on the gram);
        # the mark-back join is gram-keyed (broadcast at gate scale);
        # island merge is ONE doc-partitioned window; tokenization is
        # projected once, never re-inlined — all JVM lambdas
        ("map-side gram frequency", "HashAggregate"),
        ("doc-partitioned island window", "hashpartitioning(doc_id"),
        ("no Python in the plan", "!ArrowEvalPython"),
        ("no row-Python either", "!BatchEvalPython"),
        ("never corpus-squared", "!CartesianProduct"),
    ],
    "dedup_substring_cut": [
        # apply step: the finder's exchanges + ONE doc-keyed left join
        # of (doc, span-list); token surgery is a JVM array lambda
        ("span-list agg", "ObjectHashAggregate"),
        ("doc-keyed rejoin", "doc_id"),
        ("no Python in the plan", "!ArrowEvalPython"),
        ("no row-Python either", "!BatchEvalPython"),
    ],
    "train_split_assignment": [
        # split hashing adds ONE doc-keyed left join over the component
        # table dedup already built; the decision itself is map-side
        ("doc-keyed component join", "doc_id"),
        ("no row-Python", "!BatchEvalPython"),
        ("never corpus-squared", "!CartesianProduct"),
    ],
    "train_span_corruption": [
        # deterministic denoising collation is a pure expression chain
        # over a once-projected token array; the one exchange is the
        # scale-adaptive round-robin rebalance (no-op on real inputs)
        ("no key shuffle", "!hashpartitioning"),
        ("round-robin spread only", "RoundRobinPartitioning"),
        ("no Python in the plan", "!ArrowEvalPython"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "doc_c4_filters": [
        # rule filters are pure per-row expression chains: they fuse
        # into the scan and never shuffle
        ("zero exchanges (pure map)", "!Exchange"),
        ("no Python in the plan", "!ArrowEvalPython"),
        ("codegen", "codegen id"),
    ],
    "doc_gopher_quality": [
        # r06 kernel: integer counters from ONE Arrow pass; keep/reason
        # rules stay JVM; the one exchange is the adaptive rebalance
        ("single Arrow counter pass", "MapInPandas"),
        ("no key shuffle", "!hashpartitioning"),
        ("pruned scan", "ReadSchema: struct<doc_id:bigint,text:string>"),
    ],
    "sft_loss_mask_spans": [
        # per-turn offsets are a prefix sum over the SAME conv_id
        # window partitioning the renderer shuffles on — one exchange,
        # two stacked Window nodes, zero Python
        ("single conv exchange", "hashpartitioning(conv_id"),
        ("prefix-sum window", "Window"),
        ("no Python in the plan", "!ArrowEvalPython"),
        ("no row-Python either", "!BatchEvalPython"),
    ],
    "conv_tool_latency": [
        # the lead() gap and the per-tool agg: one conv_id window shuffle
        # then a 5-group hash aggregate; all latency math is exact int ms
        ("conv_id window shuffle", "hashpartitioning(conv_id"),
        ("per-tool partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "conv_tool_runs": [
        # both row_number windows share ONE (conv_id, turn_idx) ordering
        ("conv_id window shuffle", "hashpartitioning(conv_id"),
        ("island hash agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_chunk_windows": [
        # chunking is embarrassingly row-parallel: sequence/posexplode/
        # substring pipelines inside the scan stage, zero shuffles
        ("shuffle-free plan", "!Exchange"),
        ("pruned scan", "ReadSchema: struct<doc_id"),
        ("explode stays JVM-side", "Generate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "ann_sq8_topk": [
        # codes are a JVM transform over array literals; search is one
        # integer fold + TakeOrderedAndProject — raw vectors never shuffle
        ("topk without a global sort", "TakeOrderedAndProject"),
        ("pruned scan", "ReadSchema: struct<vec_id:bigint,embedding"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "emb_hard_negatives": [
        # the label inequality rides the same bucket-keyed join as
        # ann_batch_lsh — no extra exchange for the anti constraint
        ("bucket-keyed candidate join", "lsh_bucket"),
        ("per-anchor topk window", "hashpartitioning(query_id"),
    ],
    "doc_oov_rate": [
        # vocab cut = per-partition heap, then broadcast back: the
        # per-doc rollup is the only other exchange
        ("vocab cut without global sort", "TakeOrderedAndProject"),
        ("vocab broadcast back", "BroadcastHashJoin"),
        ("per-doc partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "ann_mrl_topk": [
        # prefix slice is a projection; the plan is brute_force_topk's
        ("topk without a global sort", "TakeOrderedAndProject"),
        ("pruned scan", "ReadSchema: struct<vec_id:bigint,embedding"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "conv_agent_summary": [
        # ONE conv_id-keyed hash aggregate; latency math is exact int ms
        ("conv_id rollup shuffle", "hashpartitioning(conv_id"),
        ("partial agg before it", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "train_curriculum_order": [
        # the distributed zipWithIndex: the range exchange + local rank
        # are pinned behind localCheckpoint (the plan shows the
        # checkpointed RDD scan); the only SinglePartition exchanges in
        # this plan sit on the O(n_ranges)-row offset aggregate — the
        # DATA path never funnels (sharding.py assign_global_ids)
        ("ranked data pinned by checkpoint", "Scan ExistingRDD"),
        ("offsets attach by broadcast", "BroadcastHashJoin"),
    ],
    "w_session_stats": [
        # native session_window aggregation: ONE hash exchange on the
        # session key + local sort; sessions built by
        # UpdatingSessionsIterator — no self-join, no second shuffle
        ("one key exchange", "hashpartitioning(_key"),
        ("no join anywhere", "!Join"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "graph_host_hits": [
        # loop-carried hubs are localCheckpoint-ed each round (the 4x
        # lineage blowup cure) so the final plan hangs off an RDD scan;
        # per-round max scalars attach as 1-row broadcasts
        ("loop-carried hubs pinned by checkpoint", "Scan ExistingRDD"),
        ("max scalar broadcast back", "BroadcastNestedLoopJoin"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "train_length_batches": [
        # within-bucket rank rides the checkpointed zipWithIndex; both
        # the O(n_ranges) offsets and the n_buckets mins broadcast back
        ("ranked data pinned by checkpoint", "Scan ExistingRDD"),
        ("tiny tables attach by broadcast", "BroadcastHashJoin"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "search_phrase_match": [
        # phrase table broadcasts; candidate filtering happens BY the
        # join, so the only exchanges are the two anchor aggregations
        ("phrase table broadcast", "BroadcastHashJoin"),
        ("positions stay JVM-side", "Generate"),
        ("anchor rollup partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "emb_benchmark_decontam": [
        # r06 kernel: one matmul per Arrow batch against the bounded
        # collected bench matrix — no join of any kind; the corpus
        # streams map-side
        ("single Arrow matmul pass", "MapInPandas"),
        ("no join anywhere", "!Join"),
        ("corpus never hash-exchanges", "!hashpartitioning(vec_id"),
    ],
    "graph_host_triangles": [
        # degree-ordered wedge build + close: equi-joins and hash aggs
        # only; the membership rollup is an explode + partial agg
        ("membership explode stays JVM-side", "Generate"),
        ("partial agg before rollup", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_card_scrub": [
        # Luhn fold is a pure per-row expression chain: zero shuffles
        ("shuffle-free plan", "!Exchange"),
        ("pruned scan", "ReadSchema: struct<doc_id"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "conv_prefix_dedup": [
        # chain signatures run as ONE grouped O(L) Arrow kernel on the
        # conv_id shuffle (the O(L^2) window form measured 14.6 s at
        # sf0.1); prefix match stays an equi-join on the 32-char digest
        # over the persisted signature table — never all-pairs
        ("grouped chain kernel", "FlatMapGroupsInPandas"),
        ("signatures computed once (persisted)", "InMemoryTableScan"),
        ("digest equi-join", "HashJoin"),
    ],
    "conv_retry_collapse": [
        # lag-filter and survivor re-index share ONE (conv_id, turn_idx)
        # ordering -> a single exchange in the final plan
        ("one conv_id exchange", "hashpartitioning(conv_id"),
        ("stacked windows, no second shuffle", "Window"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "conv_branch_points": [
        # conversation-trie divergence: the grouped chain kernel is the
        # only conv-keyed stage; the node rollup groups on (depth, chain)
        ("grouped chain kernel", "FlatMapGroupsInPandas"),
        ("node rollup hash agg", "HashAggregate"),
    ],
    "ann_sign_hamming": [
        # 1-bit sign codes: encode is a pure projection, distance is
        # xor+bit_count in codegen, top-k never fully sorts
        ("zero-shuffle encode + top-k", "!Exchange"),
        ("top-k without full sort", "TakeOrderedAndProject"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "w_funnel_stages": [
        # three stage mins + assembly all key on user_id; the tiny
        # per-stage tables broadcast at this SF
        ("stage mins shuffle on user_id", "hashpartitioning(user_id"),
        ("stage tables broadcast", "BroadcastHashJoin"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "conv_preference_pairs": [
        # the per-prompt-group candidate cap compiles to WindowGroupLimit
        # (rank pushdown) — a mega-group never fully sorts; the pair join
        # keys on the prompt digest over capped sides only
        ("group cap via WindowGroupLimit", "WindowGroupLimit"),
        ("pair join on prompt digest", "HashJoin"),
    ],
    "graph_host_kcore": [
        # iterative peel: per round ONE degree hash agg + two alive-set
        # semi-joins; rounds=6 ends on a checkpoint boundary, so the
        # audited (final-segment) plan is the degree rollup over the
        # checkpointed RDD — the semi-joins live in the truncated
        # segments and the ExistingRDD leaf IS the lineage-cap evidence
        ("degree hash agg", "HashAggregate"),
        ("lineage truncated at the checkpoint", "Scan ExistingRDD"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "search_postings_compression": [
        # (term, doc) pre-agg is the skew-safe corpus shuffle; the LAG
        # window and the per-term byte rollup share ONE term-hash
        # partitioning (no third exchange)
        ("gap window on term partitioning", "hashpartitioning(term"),
        ("tf partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_template_spans": [
        # r06 kernel: the span chunker is the shared Arrow pass (the
        # interpreted lambda chunker was the 8.7 s wall); the tiny
        # per-host page totals still broadcast back
        ("Arrow chunk pass", "MapInPandas"),
        ("per-host totals broadcast", "BroadcastHashJoin"),
        ("no interpreted explode", "!Generate"),
    ],
    "doc_host_mirrors": [
        # pair candidates come from a DIGEST-keyed self-join (never host
        # all-pairs); per-host digest distinct is a partial-agg'd
        # aggregate and the tiny host totals broadcast back
        ("distinct (host, digest) partial agg", "HashAggregate"),
        ("host totals broadcast", "BroadcastHashJoin"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_ngram_novelty": [
        # r06 kernel: per-doc gram sets build map-side in the Arrow pass;
        # first-occurrence attribution is a gram-keyed aggregate — the
        # big-big attribution join is gone
        ("Arrow gram pass", "MapInPandas"),
        ("gram-keyed exchange", "hashpartitioning(gram"),
        ("no interpreted explode", "!Generate"),
    ],
    "sketch_hll_daily_users": [
        # registers computed map-side in one pass; per-(win, bucket) max
        # is partial-agg combinable; the ALL row merges the register
        # table, never re-reading the data
        ("register max partial agg", "HashAggregate"),
        ("register arithmetic in codegen", "codegen id"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_code_switching": [
        # ONE Arrow batch stage (the shared lang-ID kernel) feeding two
        # hash aggregates; majority via min(struct(-n, lang)) — no
        # window, no self-join
        ("single Arrow lang-ID stage", "ArrowEvalPython"),
        ("argmax as plain agg (no window)", "!WindowExec"),
        ("partial agg", "HashAggregate"),
    ],
    "doc_crawl_overlap": [
        # r06 kernel: both snapshots' gram tables build in Arrow passes;
        # membership stays a gram-keyed join
        ("Arrow gram passes", "MapInPandas"),
        ("gram-keyed membership join", "hashpartitioning(gram"),
        ("no interpreted explode", "!Generate"),
    ],
    "diag_key_skew": [
        # per-key count is the one (map-side-combinable) shuffle; the
        # bucket rollup re-aggregates the tiny counts table and the
        # 1-row total broadcasts — no global sort anywhere
        ("per-key count partial agg", "HashAggregate"),
        ("1-row total broadcast", "BroadcastNestedLoopJoin"),
        ("no global sort", "!Sort "),
    ],
    "train_epoch_shuffle": [
        # the ONLY non-projection work is the 1-row max(id) domain
        # aggregate broadcast back; the Feistel rounds + epoch explode
        # are row-local codegen — no wide exchange, no Python, no sort
        ("1-row domain broadcast", "BroadcastNestedLoopJoin"),
        ("epoch explode stays JVM-side", "Generate"),
        ("no wide exchange", "!hashpartitioning"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no global sort", "!Sort "),
    ],
    "a_retention_cohorts": [
        # per-user min(ts) and the distinct-activity agg both partial-
        # aggregate before their user_id shuffle; the retention window
        # runs over the tiny (weeks x offsets) matrix, never raw events
        ("partial agg before shuffle", "HashAggregate"),
        ("user-keyed exchange", "hashpartitioning(_u"),
        ("window over tiny matrix only", "Window"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "sketch_kmv_source_overlap": [
        # the gram-cardinality distinct is the one big shuffle; the
        # bucket histogram partial-aggregates before it; the per-source
        # threshold broadcasts back; grams stay JVM-side lambdas
        ("gram explode stays JVM-side", "Generate"),
        ("histogram partial agg", "HashAggregate"),
        ("threshold broadcast", "BroadcastHashJoin"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "web_url_param_learn": [
        # r06 kernel: URL parse + per-occurrence residual construction
        # run in ONE Arrow pass (the filter-by-index/array_sort HOFs ran
        # interpreted); the two hash aggregates are unchanged
        ("Arrow parse pass", "MapInPandas"),
        ("partial agg before shuffle", "HashAggregate"),
        ("no interpreted explode", "!Generate"),
        ("no window", "!WindowExec"),
    ],
    "graph_label_communities": [
        # per round: one labels-to-edges equi-join + two hash aggs
        # (vote count, per-node argmin via min(struct)) — Pregel
        # message pattern, no window over votes, no Python
        ("vote argmin as plain agg (no window)", "!WindowExec"),
        ("partial agg", "HashAggregate"),
        ("edge list persisted", "InMemoryTableScan"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_cdc_chunks": [
        # boundaries/spans/digests are ONE vectorized Arrow kernel (the
        # interpreted-HOF SQL form measured 47 s at sf0.1) — still no
        # shuffle, no window
        ("vectorized chunking kernel", "MapInPandas"),
        ("no wide exchange", "!hashpartitioning"),
        ("no window", "!WindowExec"),
    ],
    "diag_quality_calibration": [
        # one 10-group hash aggregate + the tiny ECE rollup
        ("partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no window", "!WindowExec"),
    ],
    "train_tokenizer_fertility": [
        # merge folds over DISTINCT words only; corpus side is one word
        # join + ONE group rollup (no per-doc reassembly window)
        ("word explode stays JVM-side", "Generate"),
        ("partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no window", "!WindowExec"),
    ],
    "doc_secret_scrub": [
        # pure per-row regexp chain: no shuffle, no Python, no window
        ("no wide exchange", "!hashpartitioning"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no window", "!WindowExec"),
    ],
    "train_unimax_quotas": [
        # the corpus-sized stage is ONE token-count hash agg; the
        # waterfilling windows run over the n_sources-row table only
        ("partial agg on the corpus stage", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "diag_join_explosion": [
        # two map-side-combinable count aggs + a |keys|-sized join;
        # top-k via TakeOrderedAndProject, never a full sort
        ("partial agg", "HashAggregate"),
        ("topk no full sort", "TakeOrderedAndProject"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "w_funnel_latency": [
        # stage mins + latency histogram all partial-aggregate; the
        # quantile window runs over the tiny (edge, secs) histogram
        ("partial agg", "HashAggregate"),
        ("window over histogram only", "Window"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "train_split_leakage": [
        # ONE md5-keyed conditional-count agg — no self-join
        ("partial agg before shuffle", "HashAggregate"),
        ("no self-join", "!SortMergeJoin"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no window", "!WindowExec"),
    ],
    "diag_scan_balance": [
        # one count per file + 1-row broadcast total; attribution by
        # input_file_name stays in the scan projection
        ("partial agg", "HashAggregate"),
        ("1-row total broadcast", "BroadcastNestedLoopJoin"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_script_profile": [
        # pure per-row projection: regexp counts in codegen
        ("no wide exchange", "!hashpartitioning"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no window", "!WindowExec"),
    ],
    "diag_lsh_scurve": [
        # the calibration sample is bounded by construction (100 ids),
        # so its pair-join sorts are sample-sized, not corpus-sized;
        # the only Python is the shared shingle/verify kernel
        ("verify kernel present", "ArrowEvalPython"),
        ("partial agg rollup", "HashAggregate"),
        ("no wide window", "!WindowExec"),
    ],
    "doc_vocab_growth": [
        # word explode + min-agg partial-aggregate before the shuffle;
        # the running-total window runs over the 10-row bin table
        ("word explode stays JVM-side", "Generate"),
        ("partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "pipeline_curation_funnel": [
        # ONE pass: cumulative stage flags -> one aggregate row -> the
        # 4-row funnel explodes from it (no per-stage rescan); the only
        # shuffle is the dedup window's digest partitioning
        ("digest-keyed dedup window", "hashpartitioning(_w"),
        ("single aggregate row", "HashAggregate"),
        ("funnel explode", "Generate"),
        ("no Python stage", "!ArrowEvalPython"),
    ],
    "doc_dataset_card": [
        # one grouping-sets pass: Expand feeds a partial hash agg; the
        # count-distinct runs as the standard two-phase expansion
        ("grouping-sets expand", "Expand"),
        ("partial agg", "HashAggregate"),
        ("no Python stage", "!ArrowEvalPython"),
        ("no window", "!WindowExec"),
    ],
    "dedup_containment_pairs": [
        # corpus semi-join-pruned to pair ids BEFORE gram explosion; the
        # containment math itself is JVM (the only Python is the cached
        # minhash signature stage the candidate tier already pays)
        ("id prune before explode", "LeftSemi"),
        ("gram explode stays JVM-side", "Generate"),
        ("signature stage computed once (cached)", "InMemoryTableScan"),
    ],
}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    sections = []
    failures = []
    for name, checks in AUDITS.items():
        df = qs[name](spark, SF_DIR)
        # execute first: AQE only annotates codegen ids on the FINAL plan,
        # and only on THIS df's plan instance (a .write executes a copy)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        marks = []
        for label, needle in checks:
            # a leading '!' asserts the pattern is ABSENT from the plan
            if needle.startswith("!"):
                ok = needle[1:] not in plan
            else:
                ok = needle in plan
            if not ok:
                if needle.startswith("!"):
                    failures.append(
                        f"{name}: {label}"
                        f" (found {needle[1:]!r}, must be absent)"
                    )
                else:
                    failures.append(f"{name}: {label} (missing {needle!r})")
            marks.append(f"  - [{'x' if ok else ' '}] {label}: `{needle}`")
        head = plan.split("\n\n")[0]
        sections.append(
            f"## {name}\n\n" + "\n".join(marks)
            + f"\n\n```\n{head.strip()}\n```\n"
        )

    # minhash LSH: the candidate shuffle must carry only (id, band) keys —
    # the k-long signature arrays must never appear in an Exchange's
    # partitioning or output (they are joined back onto the pair set)
    df = qs["dedup_minhash_pairs"](spark, SF_DIR)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    bad_ex = [
        ln.strip()
        for i, ln in enumerate(plan.splitlines())
        if ln.startswith("(") and ") Exchange" in ln
        for detail in [plan.split(ln, 1)[1].split("\n\n", 1)[0]]
        if "minhash#" in detail
    ]
    sig_free = not bad_ex
    if not sig_free:
        failures.append(f"dedup_minhash_pairs: signature array rides an "
                        f"exchange: {bad_ex[:2]}")
    band_shuffle = "hashpartitioning(band_idx" in plan or \
        "BroadcastHashJoin" in plan
    sections.append(
        "## dedup_minhash_pairs\n\n"
        f"  - [{'x' if sig_free else ' '}] no k-long signature array in any "
        "Exchange (candidate shuffle is (id, band_idx, band_hash) only)\n"
        f"  - [{'x' if band_shuffle else ' '}] band-key join (broadcast at "
        "this SF; hash-partitioned on (band_idx, band_hash) at scale)\n"
        f"  - [{'x' if 'InMemoryTableScan' in plan else ' '}] signature "
        "stage computed ONCE (sigs=None auto-persists; every join branch "
        "reads the cached table instead of re-running ArrowEvalPython)\n\n"
        f"```\n{plan.split(chr(10)+chr(10))[0].strip()[:2400]}\n```\n"
    )

    # extraction pipeline: exactly one exchange
    from deepseek_ocr_rs_spark.plans.pipeline import (
        ExtractionJobConfig,
        run_extraction,
    )
    from deepseek_ocr_rs_spark.sources.transcripts import generate_local

    transcripts, _ = generate_local(spark, 10, seed=1)
    res = run_extraction(spark, transcripts,
                         ExtractionJobConfig(n_partitions=8, run_id="audit"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.extracted.explain("formatted")
    plan = buf.getvalue()
    n_exchanges = plan.count("Exchange ")
    one_exchange = n_exchanges == 1
    if not one_exchange:
        failures.append(f"extraction pipeline: {n_exchanges} exchanges (want 1)")
    sections.insert(0, (
        "## extraction pipeline (run_extraction)\n\n"
        f"  - [{'x' if one_exchange else ' '}] exactly ONE exchange "
        f"(range partition of the input): found {n_exchanges}\n"
        f"  - [{'x' if 'rangepartitioning(conv_id' in plan else ' '}] "
        "range partitioning on (conv_id, turn_idx)\n"
        f"  - [{'x' if 'Arguments: [conv_id' in plan and ', false, 0' in plan else ' '}] "
        "local (non-global) output sort\n\n"
        f"```\n{plan.split(chr(10)+chr(10))[0].strip()}\n```\n"
    ))

    md = (
        "# PLANS.md — physical plan audit\n\n"
        "Generated by scripts/explain_audit.py (sf=%s). Each checkbox is a\n"
        "plan property asserted on the CURRENT Catalyst output — the things\n"
        "that decide whether the operator survives a 100x scale-up.\n\n"
        % SF_DIR
        + "\n".join(sections)
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write(md)
    print("wrote PLANS.md;", "ALL CHECKS PASS" if not failures else
          f"{len(failures)} FAILURES:\n" + "\n".join(failures))
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
