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
# ROUND-8 WINDOW:
# 1-19: implementation changed in round 8 — the span-sweep driver-carry
#       crossover + labels-suite spans memo (whole weights tier), the
#       footprint_features Arrow fold engine, the scale-invariant RSI
#       form (both seq_rsi variants), the similarity-tier hygiene pass
#       (saturating int64 shim, lsh_bucket_arrow NaN/empty parity,
#       k-means two-level partial fold), the pipeline footer-probe
#       fallback, and the dedup_clusters union-find crossover;
# 20-42: the r4 cohort from the round-7 verdict (newest green row 4
#        rounds old, unchanged since): the feat_* window tier,
#        quality_score, the closed-combine seq_*_parallel scans,
#        tick/time/volume bars, token_counts, user_hourly_bars;
# 43-50: oldest r5-green rows (bar aggregations, footprint long/packed,
#        curation, segment dedup, trades_side).
# Still-green-and-unchanged queries sit behind position 50; their prior
# evidence stands. ROUND-9 FRONT-LOAD: anything new/changed in round 9
# first, then the remaining r5 rows (analytics/multiuser tier,
# image/audio stats, feat_ tier part 2), then r6 rows as they age.
_PRIORITY = [
    # -- implementation changed in round 8 -----------------------------------
    "avg_uniqueness_sweep",
    "return_attribution_sweep",
    "event_concurrency",
    "avg_uniqueness",
    "return_attribution",
    "time_decay",
    "class_balance",
    "final_weights",
    "footprint_features",
    "seq_rsi_wilder",
    "seq_rsi_parallel",
    "kmeans_clusters",
    "semantic_dedup",
    "ann_ivf",
    "random_projection",
    "ann_projected_topk",
    "emb_lsh_pairs",
    "pipeline_1m_features",
    "dedup_clusters",
    # -- r4 cohort (newest green 4 rounds old) --------------------------------
    "feat_atr_sma",
    "feat_bollinger_b",
    "feat_parkinson",
    "feat_pct_change",
    "feat_return_log",
    "feat_return_t",
    "feat_roc",
    "feat_sma",
    "feat_stoch_k",
    "feat_time_cues",
    "feat_vpin",
    "feat_vwap_distance",
    "feat_zscore",
    "quality_score",
    "seq_atr_parallel",
    "seq_ewma_parallel",
    "seq_ewms_parallel",
    "seq_ewmst_parallel",
    "tick_bars",
    "time_bars_1m",
    "token_counts",
    "user_hourly_bars",
    "volume_bars_approx",
    # -- oldest r5-green rows --------------------------------------------------
    "trades_side",
    "footprint_long",
    "footprint_packed",
    "bar_directional_1m",
    "bars_resample_15m",
    "curation_pipeline",
    "segment_dedup",
    "burst_ratio_trades",
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
