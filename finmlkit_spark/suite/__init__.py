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
# ROUND-4 WINDOW:
# 1-2: the two rows red in round 3 (libm/fold-order hash flakes) — now
#      deterministic via shared-text trig (functions/dettrig.py) and
#      integer-tick prefix sums; each must flip green;
# 3-10: the 8 queries with no driver row in any round (round-3 rotation
#       note): token_counts / doc_fingerprint / ngram_jaccard_full and
#       the five seq_*_parallel closed-combine scans;
# 11-13: the k-means family — green in r1 but re-derived this round on
#        integer-scaled centroid updates (bit-determinism rework);
# 14-50: every query whose IMPLEMENTATION changed in round 4 and
#        therefore needs fresh external evidence: trade_id-keyed
#        hash-aggregable bar builds, the chunk-parallel §2.5 demo tier,
#        the time-bucket tick-rule side (directional/footprint paths),
#        and the persisted-span labels pipeline.
# Still-green-and-unchanged queries sit behind position 50; their r1/r3
# evidence stands. ROUND-5 FRONT-LOAD: the converted-but-overflowed
# queries (feat_bar_duration, feat_bar_rate, feat_candle_shape,
# feat_daily_gap, feat_orb_break, bars_resample_15m, and — pushed past
# position 50 by the round-4 sweep/bloom/star insertions and the
# late-round minhash/ngram/segment/lang/quality rewrites —
# feat_realized_vol, feat_burst_ratio, feat_variance_ratio,
# feat_kurtosis, feat_bipower, feat_flow_accel,
# feat_pv_corr, feat_trend_slope, feat_mean_reversion_z; the
# chunk-conversion mechanism they share is already covered by 11
# in-window siblings)
# plus the eleven
# round-4 analytics queries (unshipped_revenue, returned_item_report,
# promo_revenue, order_size_histogram, supplier_nation_volume,
# late_shipment_priority, large_volume_orders, discounted_part_revenue,
# inactive_high_balance, top_supplier_revenue, forecast_revenue) and
# anything new in round 5.
_PRIORITY = [
    # -- red in r3, de-flaked ------------------------------------------------
    "feat_time_cues",
    "feat_fast_stage",
    # -- never driver-checked ------------------------------------------------
    "token_counts",
    "doc_fingerprint",
    "ngram_jaccard_full",
    "seq_ewma_parallel",
    "seq_ewms_parallel",
    "seq_ewmst_parallel",
    "seq_rsi_parallel",
    "seq_atr_parallel",
    # -- k-means family on the new integer-scaled updates --------------------
    "kmeans_clusters",
    "semantic_dedup",
    "ann_ivf",
    # -- implementation changed in round 4 -----------------------------------
    "pipeline_1m_features",
    "featurekit_build",
    "time_bars_1m",
    "tick_bars",
    "dollar_bars",
    "volume_bars_approx",
    "user_hourly_bars",
    "user_fast_features",
    "trades_side",
    "bar_directional_1m",
    "footprint_long",
    "footprint_features",
    "footprint_packed",
    "feat_vpin",
    "tbm_labels",
    "avg_uniqueness",
    "avg_uniqueness_sweep",
    "return_attribution_sweep",
    "decontamination_bloom",
    "dedup_clusters_star",
    "event_concurrency",
    "feat_return_log",
    "feat_roc",
    "feat_pct_change",
    "feat_return_t",
    "feat_sma",
    "feat_zscore",
    "feat_stoch_k",
    "feat_bollinger_b",
    "feat_parkinson",
    "feat_atr_sma",
    "feat_vwap_distance",
    # -- rewritten late in round 4 (let-bound shingle building; window
    # df-cutoff ngram path; single-pass segment dedup) — three DISTINCT
    # mechanisms, each needs fresh external evidence; the displaced
    # feat_* rows share the chunk-conversion mechanism with 12 in-window
    # siblings and move to the round-5 front-load with the rest --------------
    "minhash_lsh",
    "ngram_jaccard",
    "segment_dedup",
    "lang_id",
    "quality_score",
    "feat_realized_vol",
    "feat_burst_ratio",
    "feat_variance_ratio",
    "feat_kurtosis",
    "feat_bipower",
    "feat_flow_accel",
    "feat_pv_corr",
    "feat_trend_slope",
    "feat_mean_reversion_z",
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
