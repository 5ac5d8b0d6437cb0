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
# ROUND-3 WINDOW: positions 1-29 are the 29 queries that ERRed in round 2
# solely on the events_to_trades timestamp-dtype drift (fixed this round
# at sources/trades.py — each must now flip to a green driver row);
# positions 30-50 are 21 queries with no driver row in any round: the
# never-checked families from the round-2 rotation note plus this
# round's new simhash_near_pairs. Everything green in r1/r2 moves behind
# position 50 (its evidence stands).
# ROUND-4 ROTATION NOTE: the only registered queries that will still
# lack a driver row after round 3 are: token_counts, doc_fingerprint,
# ngram_jaccard_full (deferred from this window for space; their
# families — text_stats/c4_filter/ngram_jaccard — are all green),
# seq_ewma_parallel / seq_ewms_parallel / seq_ewmst_parallel /
# seq_rsi_parallel / seq_atr_parallel (added after the window was
# frozen; locally green vs the corresponding sequential-query oracles),
# plus anything new in round 4.
# Front-load exactly those next round.
_PRIORITY = [
    # -- the 29 adapter-ERR queries from CORRECTNESS_r02 ---------------------
    "feat_time_cues",
    "seq_atr_ema",
    "tbm_meta",
    "feat_fast_stage",
    "time_decay",
    "class_balance",
    "footprint_long",
    "footprint_features",
    "vp_profile",
    "vp_poc",
    "vp_hva_lva",
    "footprint_packed",
    "bars_resample_15m",
    "store_inspector",
    "time_bars_filled",
    "seq_cusum_bars",
    "seq_bar_duration_ewma",
    "hurst_exponent",
    "approx_entropy",
    "imbalance_bars",
    "run_bars",
    "final_weights",
    "zscore_peak_events",
    "asof_sigma",
    "asof_tolerance",
    "pipeline_1m_features",
    "featurekit_build",
    "user_hourly_bars",
    "user_sessions",
    # -- 21 first-time queries (no driver row in any round) ------------------
    "simhash_near_pairs",
    "quality_score",
    "lang_id",
    "emb_lsh_pairs",
    "frame_offsets",
    "corpus_report",
    "stratified_sample",
    "hash_split",
    "doc_quality_signals",
    "decontamination",
    "dup_spans",
    "vocab_topk",
    "tfidf_keywords",
    "doc_chunks",
    "dedup_keep_best",
    "user_trade_side",
    "user_ewma",
    "user_tbm_labels",
    "user_fast_features",
    "priority_fill_rate",
    "vp_developing",
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
