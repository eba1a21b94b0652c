"""Relational/analytics operators (SURVEY.md §2.4–2.6) plus the
training-data-pipeline operators (dedup, similarity, text-stats).

Every operator here ships as a pair: a Spark callable
``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and a DuckDB oracle SQL
string in ``ORACLES`` with IDENTICAL output column names — the driver's
correctness gate compares them value-by-value at sf0.01.
"""

from . import (
    analytics,
    cluster,
    dedup,
    doc_embed,
    extraction,
    multimodal,
    similarity,
    textstats,
    trainprep,
    webcrawl,
)

_MODULES = (
    analytics,
    cluster,
    dedup,
    doc_embed,
    extraction,
    multimodal,
    similarity,
    textstats,
    trainprep,
    webcrawl,
)


# The driver's per-round CORRECTNESS file caps at the FIRST 50 registry
# entries in iteration order. These queries have never appeared in a
# driver CORRECTNESS_r0*.json (r1–r5 audit) or are new this round, so
# they are ordered first until the driver has exercised them; the stable
# core keeps its coverage via the committed full-registry
# CORRECTNESS_local_r{N}.json run every round.
_DRIVER_FIRST = (
    "web_link_graph",            # new r7 (kernel-extracted link graph)
    "web_crawl_loop",            # new r7 (closed crawl cycle: extract->frontier)
    "train_quality_probe",       # new r7 (in-engine integer-GD classifier training)
    "ice_schema_evolution",      # new r7 (metadata-driven evolution)
    "web_host_pagerank",         # rewired r7 onto kernel-extracted edges
    "extract_error_taxonomy",    # r7: +JPEG_PROGRESSIVE_UNSUPPORTED row
    "train_split_assign",        # new r6 (trainprep module)
    "train_split_summary",       # new r6
    "train_pack_sequences",      # new r6
    "train_mix_weights",         # new r6
    "train_sample_per_domain",   # new r6
    "train_vocab_topn",          # new r6
    "train_curriculum",          # new r6
    "web_robots_frontier",       # new r6 (crawl policy + frontier)
    "web_recrawl_dedup",         # new r6 (canonical-url recrawl collapse)
    "ice_changelog",             # new r6 (icetable CDC scan)
    "ice_source_read",           # new r6 (icetable python data source)
    "ice_time_travel",           # new r6 (icetable snapshot layer)
    "dedup_substring",           # new r6 (exact-substring dedup)
    "dedup_substring_rebuild",   # new r6 (cleaned-text output)
    "ocr_jpeg_roundtrip",        # new r6
    "sections_leaf_accuracy",    # new r6
    "web_warc_dir_roundtrip",    # new r6
    "web_warc_roundtrip",        # r5, driver-checked once — keep fresh
    "media_audio_dsp",
    "media_video_frame_decode",
    "ann_kmeans_k8_assign",
    "ann_recall_at_k",
    "ann_tuning_table",
    "dedup_embedding_pairs_bucketed",
    "dedup_embedding_srp_pairs",
    "text_hashed_linear_score",
    "text_bpe_token_count",
    "text_winnow_fingerprint",
    "text_repetition_filter",
    "text_pii_scrub",
)


def _driver_order(full: dict) -> dict:
    head = {k: full[k] for k in _DRIVER_FIRST if k in full}
    head.update((k, v) for k, v in full.items() if k not in head)
    return head


def all_queries() -> dict:
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _driver_order(out)


def all_oracles() -> dict:
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _driver_order(out)
