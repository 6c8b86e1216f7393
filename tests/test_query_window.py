"""Driver-window composition pins (no Spark needed).

The external driver CORRECTNESS-checks the FIRST 50 entries of
``queries()``.  These tests pin the CURRENT round's rotation contract
so a refactor cannot silently push a never-driver-checked operator out
of the hard-signal window or seat an oracle-less query in it.  Update
the set each round: queries that earn a green driver row may rotate
below the line; never-checked and new queries must face the driver."""

import __spark_entry__ as entry_mod

# Round-5 contract (VERDICT r04 item 1): the 26 queries with no driver
# row in rounds 1-4 (the web tier + the fixed search_posting_lists, the
# one RED r04 row) plus every round-5 addition.
MUST_BE_IN_WINDOW = {
    # never driver-checked through r04
    "search_posting_lists",
    "web_surt_latest",
    "web_crawl_diff",
    "web_resolved_outlinks",
    "web_crawl_traps",
    "web_recrawl_policy",
    "warc_parse_records",
    "web_redirect_resolve",
    "web_redirect_from_warc",
    "web_robots_filter",
    "web_robots_sitemaps",
    "web_sitemap_urls",
    "web_feed_entries",
    "web_host_stats",
    "web_anchor_texts",
    "web_anchor_stats",
    "web_noindex_filter",
    "web_hreflang_clusters",
    "web_registrable_domains",
    "web_blocklist_filter",
    "web_frontier_schedule",
    "web_revalidation_candidates",
    "web_wet_roundtrip",
    "graph_host_pagerank",
    "pipeline_incremental_extract",
    "pipeline_discovery_schedule",
    # new in round 5
    "media_decode_resample",
    "media_image_dedup",
    "media_audio_features",
    "media_audio_frames",
    "web_warcgz_roundtrip",
    "train_bpe_encode",
    "media_pdf_text",
    "media_pdf_reading_order",
    "media_wds_shards",
    # promoted late in round 5 (displacing three rows already green in
    # r04 — with no round 6, first-time rows beat re-confirmations)
    "ann_sq8_topk",
    "emb_hard_negatives",
    "train_curriculum_order",
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
