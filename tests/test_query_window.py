"""Driver-window composition pins (no Spark needed).

The external driver CORRECTNESS-checks the FIRST 50 entries of
``queries()``.  These tests pin the round-4 rotation contract so a
refactor cannot silently push a never-driver-checked operator out of the
hard-signal window or seat an oracle-less query in it."""

import __spark_entry__ as entry_mod

# operators that had no driver CORRECTNESS row in rounds 1-3 (round-3
# verdict item 1) plus the round-4 additions — all must face the driver
MUST_BE_IN_WINDOW = {
    "ann_batch_lsh",
    "ann_batch_topk",
    "dedup_verified_pairs",
    "dedup_components",
    "emb_dedup_components",
    "pipeline_curation",
    "s_stratified_sample",
    "conv_flatten_parts",
    "moe_topk_dispatch",
    "media_bicubic_resample",
    "x_sse_frames",
    "doc_pii_scrub",
    "train_shard_assignment",
    "train_global_ids",
    "train_dsir_resample",
    "train_bpe_pairs",
    "doc_winnow_fingerprints",
    "doc_winnow_matches",
    "emb_semantic_dedup",
    "dedup_quality_keep_best",
    "sketch_hist_quantiles",
    "doc_hashclf_lang",
    "j_interval_join_events",
    "extract_pdf_twocol",
    "ann_pq_codes",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "extract_html_classhints",
    # round-4 late rotation: the three largest never-driver-checked web
    # parsers take the slots of thrice-stable relational rows
    "warc_http_responses",
    "web_page_metadata",
    "web_outlinks",
}


def test_never_checked_operators_sit_in_the_driver_window():
    first50 = list(entry_mod.queries())[:50]
    missing = MUST_BE_IN_WINDOW - set(first50)
    assert not missing, f"pushed out of the first 50: {sorted(missing)}"


def test_driver_window_is_fully_oracle_backed():
    # a rows-only query inside the window would downgrade a hard-signal
    # slot to the weaker rows-only check
    first50 = list(entry_mod.queries())[:50]
    oracles = entry_mod.oracle_sql()
    unbacked = [n for n in first50 if n not in oracles]
    assert not unbacked, f"oracle-less queries in the window: {unbacked}"


def test_window_has_exactly_fifty_distinct_entries():
    names = list(entry_mod.queries())
    assert len(names) >= 50
    assert len(set(names[:50])) == 50
