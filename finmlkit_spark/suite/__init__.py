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
# ROUND-9 WINDOW:
# 1-4: NEW in round 9 — ann_pq_topk (product-quantization ADC search),
#      remove_dup_spans (the cleaned-corpus half of span dedup),
#      gopher_filter (Rae et al. 2021 quality rules), and
#      video_frame_stats (real Y4M frame-sampled decode);
# 5-21: implementation changed in round 9 (17 queries) — the memoized-centroid
#       semantic-dedup split + kmeans train/assign refactor (semantic_
#       dedup, kmeans_clusters, ann_ivf), the flagship below-crossover
#       single-partition fusion + bars_1m onepart param (pipeline,
#       time_bars_1m), the RSI bounded-quotient form (both seq_rsi
#       variants), the footprint -0.0 padding fix (both footprint
#       aggregate queries), the dedup_clusters dtype/schema crossover
#       guards, the span-sweep LIMIT-probed driver fetch (both sweeps),
#       the dup_span_ranges Arrow shingle engine, and the native
#       baseline-JPEG codec in the multimodal decode path, and the
#       ngram_jaccard count-based verify (both jaccard variants)
#       plus the dup_spans one-exchange window form;
# 22-50: 29 of the 30-query r5 cohort from the round-8 verdict (newest green
#        row 4 rounds old, unchanged since): the feat_* part-2 window
#        tier, user_fast_features/feat_fast_stage, the 11 star-schema
#        analytics rows, image_resize_stats, audio_spectral_stats,
#        image_phash_pairs (dup_span_ranges moved up with the changed
#        set);
# (no fill slots left — the late front-loads displaced them). One r5
# cohort row (image_phash_pairs) was displaced by the 4th new query;
# it leads the round-10 fill, then the r6 rows (multimodal_meta,
# asof_*, the vp_* family, then the rest), after round-10's own
# new/changed queries.
# Still-green-and-unchanged queries sit behind position 50; their prior
# evidence stands. ROUND-10 FRONT-LOAD: anything new/changed in round
# 10 first, then the remaining r6 rows (seq_* reset/chunked tier,
# dedup/corpus singles, store/io rows), then r7 rows as they age.
_PRIORITY = [
    # -- NEW in round 9 (no driver row yet) -----------------------------------
    "ann_pq_topk",
    "remove_dup_spans",
    "gopher_filter",
    "video_frame_stats",
    # -- implementation changed in round 9 -----------------------------------
    "semantic_dedup",
    "kmeans_clusters",
    "ann_ivf",
    "pipeline_1m_features",
    "time_bars_1m",
    "seq_rsi_wilder",
    "seq_rsi_parallel",
    "footprint_features",
    "footprint_packed",
    "dedup_clusters",
    "avg_uniqueness_sweep",
    "return_attribution_sweep",
    "dup_span_ranges",
    "image_decode_stats",
    "ngram_jaccard",
    "ngram_jaccard_full",
    "dup_spans",
    # -- r5 cohort (newest green 4 rounds old) --------------------------------
    "feat_realized_vol",
    "feat_burst_ratio",
    "feat_variance_ratio",
    "feat_kurtosis",
    "feat_bipower",
    "feat_flow_accel",
    "feat_pv_corr",
    "feat_trend_slope",
    "feat_mean_reversion_z",
    "feat_bar_duration",
    "feat_bar_rate",
    "feat_candle_shape",
    "feat_daily_gap",
    "feat_orb_break",
    "feat_fast_stage",
    "user_fast_features",
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
    "image_resize_stats",
    "audio_spectral_stats",
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
