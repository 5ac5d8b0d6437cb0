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
# ROUND-7 WINDOW:
# 1-19: implementation changed in round 7 — the flagship window
#       crossover + fused window pass (pipeline_1m_features), the
#       driver-carried k-means (kmeans_clusters/semantic_dedup), the
#       triple-barrier-as-one-SQL-stage + span_sweep 2-reference
#       rewrite and every consumer of the label spans (tbm family,
#       concurrency, uniqueness/attribution both forms, weights tier),
#       and store_meta_sidecar (read-back sidecar + deterministic path);
# 20-41: the r3-stale cohort from the round-6 verdict (newest green row
#        4 rounds old, unchanged since);
# 42-50: the oldest r4-green rows (dedup/star/fingerprint, bar
#        samplers, text quality, the closed-combine seq_*_parallel
#        scans).
# Still-green-and-unchanged queries sit behind position 50; their prior
# evidence stands. ROUND-8 FRONT-LOAD: anything new/changed in round 8
# first, then the remaining r4 cohort (feat_* window tier,
# quality_score, seq_atr/ewma/ewms/ewmst/rsi_parallel, tick_bars,
# time_bars_1m, token_counts,
# user_hourly_bars, volume_bars_approx), then the r5 rows as they age.
_PRIORITY = [
    # -- implementation changed in round 7 -----------------------------------
    "pipeline_1m_features",
    "kmeans_clusters",
    "semantic_dedup",
    "ann_ivf",
    "footprint_features",
    "random_projection",
    "ann_projected_topk",
    "ann_topk",
    "tbm_labels",
    "tbm_meta",
    "event_concurrency",
    "avg_uniqueness",
    "avg_uniqueness_sweep",
    "return_attribution",
    "return_attribution_sweep",
    "time_decay",
    "class_balance",
    "final_weights",
    "store_meta_sidecar",
    # -- r3-stale cohort (newest green 4 rounds old) --------------------------
    "approx_entropy",
    "corpus_report",
    "doc_chunks",
    "doc_quality_signals",
    "dup_spans",
    "emb_lsh_pairs",
    "frame_offsets",
    "hash_split",
    "hurst_exponent",
    "priority_fill_rate",
    "seq_atr_ema",
    "seq_bar_duration_ewma",
    "seq_cusum_bars",
    "simhash_near_pairs",
    "stratified_sample",
    "tfidf_keywords",
    "time_bars_filled",
    "user_ewma",
    "user_sessions",
    "user_tbm_labels",
    "user_trade_side",
    "vocab_topk",
    # -- oldest r4-green rows -------------------------------------------------
    "decontamination_bloom",
    "dedup_clusters_star",
    "doc_fingerprint",
    "dollar_bars",
    "featurekit_build",
    "lang_id",
    "minhash_lsh",
    "ngram_jaccard",
    "ngram_jaccard_full",
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
