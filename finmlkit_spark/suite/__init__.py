from ._registry import QUERIES, ORACLES

from . import bars_suite  # noqa: F401
from . import features_suite  # noqa: F401
from . import sequential_suite  # noqa: F401
from . import labels_suite  # noqa: F401
from . import footprint_suite  # noqa: F401
from . import text_suite  # noqa: F401
from . import io_suite  # noqa: F401
from . import pipeline_suite  # noqa: F401
from . import misc_suite  # noqa: F401
from . import multiuser_suite  # noqa: F401
from . import analytics_suite  # noqa: F401
from . import developing_suite  # noqa: F401

# --- registration order = driver check order -------------------------------
# The external driver verifies the FIRST 50 registered queries per round.
# ROUND-11 WINDOW (rotated as the round's FIRST commit, per the r10 verdict):
# 1:    ann_ivf_pq — NEW in round 10, the only registry entry with no driver
#       row ever (the r10 window was not rotated before the round closed);
# 2-9:  NEW in round 11 — video_mjpeg_stats (Motion-JPEG AVI container +
#       native per-frame JPEG decode), gopher_repetition (Rae et al.
#       Table A1 repetition rules), weighted_sample (exact integer
#       weighted draws), embedding_covariance (exact d×d Gram
#       partials), bpe_train (Sennrich et al. BPE merge-table
#       training), bpe_segment (train + apply end-to-end),
#       bigram_logprob (add-one bigram LM word-order score), and
#       token_length_stats (exact per-lang length percentiles);
# 10:   segment_dedup — implementation changed in round 10 (below-crossover
#       onepart fusion), newest driver row r8;
# 11:   video_frame_stats — implementation changed in round 11 (container
#       sniff dispatches Y4M vs MJPEG-AVI);
# 12-14: image_phash_pairs (newest row r5 — 5 rounds stale) plus
#       image_decode_stats / image_resize_stats, whose shared native JPEG
#       decoder gains 4:2:0 baseline color support in round 11;
# 15-50: 36 of the 37-query r6 cohort (newest green row 4 rounds old,
#       unchanged since; sql_shared_dialect displaced to the r12 fill):
#       integrity/preprocess singles, the seq_* filter/reset/chunked
#       tier, the vp_* family, dedup/corpus singles, store/io rows,
#       asof joins, imbalance/run bars, zscore peak events;
# (the eight displaced r7 rows — dollar_bars, seq_atr_ema, tbm_labels,
#       tbm_meta, lang_id, doc_fingerprint, minhash_lsh,
#       simhash_near_pairs — lead the round-12 fill, together with the
#       twenty-eight r6 rows the late retrieval/analytics/SQ8 tiers displaced:
#       regional_revenue, imbalance_bars, run_bars, zscore_peak_events,
#       pricing_summary, asof_tolerance, asof_sigma,
#       seq_cusum_bars_chunked, store_inspector, unigram_logprob,
#       c4_filter, dedup_keep_best, mixture_sample, decontamination,
#       sequence_packing, multimodal_meta, simhash_fp, exact_dedup,
#       text_stats, vp_developing, vp_hva_lva, vp_poc, vp_profile,
#       seq_cusum_test_chunked, seq_cusum_test, seq_volume_bars_exact,
#       seq_cusum_filter_chunked, seq_cusum_filter.)
# Still-green-and-unchanged queries sit behind position 50; their prior
# evidence stands. After round 11 no registry row is older than r7.
# ROUND-12 FRONT-LOAD: anything new/changed in round 12 first, then the
# displaced r6 row (sql_shared_dialect) and the 31 r7 rows
# (dollar_bars, seq_atr_ema, tbm_labels, tbm_meta, lang_id,
# doc_fingerprint, minhash_lsh, simhash_near_pairs first, then
# ann_topk, the corpus report/sampling tier, the user_* multiuser
# tier, featurekit_build), then r8 rows as they age.
_PRIORITY = [
    # -- NEW in round 10/11 (no driver row yet) --------------------------------
    "ann_ivf_pq",
    "video_mjpeg_stats",
    "gopher_repetition",
    "weighted_sample",
    "embedding_covariance",
    "bpe_train",
    "bpe_segment",
    "bigram_logprob",
    "token_length_stats",
    # -- NEW retrieval + product-analytics + SQ8 tiers (late round 11;
    #    displace the last twenty-eight r6 rows — regional_revenue,
    #    imbalance_bars, run_bars, zscore_peak_events, pricing_summary,
    #    asof_tolerance, asof_sigma, seq_cusum_bars_chunked,
    #    store_inspector, unigram_logprob, c4_filter, dedup_keep_best,
    #    mixture_sample, decontamination, sequence_packing,
    #    multimodal_meta, simhash_fp, exact_dedup, text_stats,
    #    vp_developing, vp_hva_lva, vp_poc, vp_profile,
    #    seq_cusum_test_chunked, seq_cusum_test, seq_volume_bars_exact,
    #    seq_cusum_filter_chunked, seq_cusum_filter — to the round-12
    #    fill) -------------------------------------------------------------------------
    "inverted_index",
    "bm25_topk",
    "dup_graph_pagerank",
    "event_funnel",
    "cohort_retention",
    "ann_sq8_topk",
    "keep_central",
    "hashed_features",
    "knn_graph",
    "normalized_dedup",
    "source_length_trim",
    "ann_ivf_sq8",
    "diverse_sample",
    "wordpiece_stats",
    "revenue_rollup",
    "price_histogram_equidepth",
    "nation_customer_deciles",
    "funnel_latency",
    "zipf_fit",
    "pii_redact",
    "oov_rate",
    "rfm_segments",
    "cross_source_dup_matrix",
    "error_rate_spikes",
    "session_path_topk",
    "pmi_top_pairs",
    "tfidf_cosine_pairs",
    "lsh_recall_audit",
    # -- implementation changed in round 10/11 ---------------------------------
    "segment_dedup",
    "video_frame_stats",
    # -- stalest row (r5) + round-11 JPEG-codec-touched image queries ---------
    "image_phash_pairs",
    "image_decode_stats",
    "image_resize_stats",
    # -- the 37-query r6 cohort (newest green row 4 rounds old) ---------------
    "integrity_report",
    "merge_split_trades",
    "bar_trade_size_1m",
    "feat_dir_run_len",
    "seq_ewma",
    "seq_ewms",
    "seq_ewmst",
    "seq_adx",
    "seq_cusum_filter",
    "seq_cusum_filter_chunked",
    "seq_volume_bars_exact",
    "seq_cusum_test",
    "seq_cusum_test_chunked",
    "vp_profile",
    "vp_poc",
    "vp_hva_lva",
    "vp_developing",
    "text_stats",
    "exact_dedup",
    "simhash_fp",
    "multimodal_meta",
    "sequence_packing",
    "decontamination",
    "mixture_sample",
    "dedup_keep_best",
    "c4_filter",
    "unigram_logprob",
    "store_inspector",
    "seq_cusum_bars_chunked",
    "asof_sigma",
    "asof_tolerance",
    "zscore_peak_events",
    "pricing_summary",
    "regional_revenue",
    "imbalance_bars",
    "run_bars",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: q for n, q in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
    o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
