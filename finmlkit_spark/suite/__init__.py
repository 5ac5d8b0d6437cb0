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
# ROUND-3 ROTATION NOTE: after round 2's window, the only queries with
# no driver row ever are: token_counts, user_fast_features,
# user_trade_side, user_ewma, user_tbm_labels, stratified_sample,
# hash_split, doc_quality_signals, decontamination, priority_fill_rate,
# dup_spans, vocab_topk, tfidf_keywords, doc_chunks, dedup_keep_best,
# plus the five swapped out to admit this session's new operators:
# quality_score, lang_id, doc_fingerprint, frame_offsets, vp_developing,
# corpus_report, emb_lsh_pairs
# (22, plus anything new this round that missed the window). Front-load
# exactly these next round; everything else has r1 or r2 evidence.
# The external driver verifies the FIRST 50 registered queries per round.
# Round 1 left 48 of the first 50 green (CORRECTNESS_r01); round 2
# front-loads everything that has no driver row yet — the two repaired
# hash-fails, every previously-unchecked family (footprint, volume
# profile, weights tail, plans API, io, text/dedup/ANN/multimodal,
# multiuser, analytics), and the round's new queries — so every SURVEY §2
# family accumulates driver-green evidence across rounds. Round-1-green
# queries move behind position 50 (their evidence stands).
_PRIORITY = [
    # repaired round-1 hash-fails
    "feat_time_cues",
    "seq_atr_ema",
    # new this round
    "tbm_meta",
    "feat_fast_stage",
    # weights tail (r1 positions 50-51)
    "time_decay",
    "class_balance",
    # §2.4 footprints / §2.6 volume profile
    "footprint_long",
    "footprint_features",
    "vp_profile",
    "vp_poc",
    "vp_hva_lva",
    "footprint_packed",
    # LLM-pipeline tier: text / dedup / similarity / multimodal
    "text_stats",
    "exact_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "segment_dedup",
    "c4_filter",
    "unigram_logprob",
    "simhash_fp",
    "ann_topk",
    "ann_ivf",
    "kmeans_clusters",
    "semantic_dedup",
    "multimodal_meta",
    "image_decode_stats",
    "curation_pipeline",
    # io / storage surface
    "bars_resample_15m",
    "store_inspector",
    "time_bars_filled",
    # sequential tail + rows-only kernels
    "seq_cusum_bars",
    "seq_bar_duration_ewma",
    "hurst_exponent",
    "approx_entropy",
    "imbalance_bars",
    "run_bars",
    # labels/weights remainder + events
    "final_weights",
    "zscore_peak_events",
    # joins / plans API / pipeline
    "asof_sigma",
    "asof_tolerance",
    "pipeline_1m_features",
    "featurekit_build",
    "sql_shared_dialect",
    # LLM-pipeline round-2 additions (cluster dedup, sequence packing,
    # domain-mixture rebalancing)
    "dedup_clusters",
    "sequence_packing",
    "mixture_sample",
    # multi-user partition-parallel shapes (user_ewma / user_tbm_labels
    # are grouped variants of r1-green seq_ewma / tbm_labels — rotated
    # behind the window in favor of first-time families)
    "user_hourly_bars",
    "user_sessions",
    # analytics (TPC-H-shaped; priority_fill_rate rotated behind the
    # window to make room for mixture_sample — same family as the two
    # kept queries, so the family still gets first-time evidence)
    "pricing_summary",
    "regional_revenue",
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
