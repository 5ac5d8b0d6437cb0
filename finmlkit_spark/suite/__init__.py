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
# ROUND-5 WINDOW:
# 1-11: the eleven round-4 analytics queries with ZERO driver rows ever
#       (they pass the local replica; this is the only gap between the
#       repo and "every registered query driver-verified at least once");
# 12-26: the round-4 rotation note's front-load list — converted to the
#        chunk-parallel plan in r4 but displaced past position 50 before
#        being externally checked;
# 27-33: NEW in round 5: burst_ratio_trades (trade-scale skip-list
#     rolling median), image_resize_stats (real decode -> nearest-
#     neighbor resize -> re-encode round-trip), audio_spectral_stats
#     (real WAV encode -> parse -> FFT dominant bin), random_projection
#     (JL 64->16, exact integer-scaled sums) + ann_projected_topk
#     (reduce-then-verify ANN on it), dup_span_ranges (suffix-array-
#     dedup span output analog), image_phash_pairs (DCT perceptual-hash
#     image dedup);
# 34-48: every query whose IMPLEMENTATION changed in round 5: the
#        128-bit segment-dedup election key; the chunked-carry side
#        consumers on the shared exclusive-prefix helper (trades_side /
#        directional / footprint tier, the chunk-window machinery behind
#        the flagship and feat tier); the span-sweep two-level prefix
#        (uniqueness/attribution sweeps); the batched-withColumns labels
#        path; the kmeans empty-input guard family;
# 49-50: labels/bars family re-evidence (oldest green rows, same modules
#        as this round's edits).
# Still-green-and-unchanged queries sit behind position 50; their prior
# evidence stands. ROUND-6 FRONT-LOAD: anything new or changed in round
# 6 first, then the 26 queries whose NEWEST driver-green row is r1-r2
# (unchanged since, evidence old): integrity_report, merge_split_trades,
# bar_trade_size_1m, feat_dir_run_len, seq_ewma, seq_ewms, seq_ewmst,
# seq_rsi_wilder, seq_adx, seq_cusum_filter, seq_volume_bars_exact,
# seq_cusum_test, text_stats, exact_dedup, simhash_fp, ann_topk,
# multimodal_meta, image_decode_stats, sequence_packing, dedup_clusters,
# mixture_sample, c4_filter, unigram_logprob, pricing_summary,
# regional_revenue, sql_shared_dialect. (Every registered query has
# been driver-green at least once as of round 5.)
_PRIORITY = [
    # -- never driver-checked: round-4 analytics suite -----------------------
    "forecast_revenue",
    "late_shipment_priority",
    "large_volume_orders",
    "top_supplier_revenue",
    "unshipped_revenue",
    "returned_item_report",
    "promo_revenue",
    "order_size_histogram",
    "supplier_nation_volume",
    "discounted_part_revenue",
    "inactive_high_balance",
    # -- round-4 conversions displaced past the window before checking -------
    "feat_bar_duration",
    "feat_bar_rate",
    "feat_candle_shape",
    "feat_daily_gap",
    "feat_orb_break",
    "bars_resample_15m",
    "feat_realized_vol",
    "feat_burst_ratio",
    "feat_variance_ratio",
    "feat_kurtosis",
    "feat_bipower",
    "feat_flow_accel",
    "feat_pv_corr",
    "feat_trend_slope",
    "feat_mean_reversion_z",
    # -- new in round 5 ------------------------------------------------------
    "burst_ratio_trades",
    "image_resize_stats",
    "audio_spectral_stats",
    "random_projection",
    "ann_projected_topk",
    "dup_span_ranges",
    "image_phash_pairs",
    # -- implementation changed in round 5 -----------------------------------
    "segment_dedup",
    "trades_side",
    "bar_directional_1m",
    "footprint_long",
    "footprint_features",
    "footprint_packed",
    "pipeline_1m_features",
    "tbm_labels",
    "avg_uniqueness_sweep",
    "return_attribution_sweep",
    "kmeans_clusters",
    "semantic_dedup",
    "user_fast_features",
    "curation_pipeline",
    "feat_fast_stage",
    # -- same-module re-evidence ---------------------------------------------
    "avg_uniqueness",
    "return_attribution",
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
