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
# ROUND-6 WINDOW:
# 1-4: NEW in round 6: the chunk-stitched CUSUM family
#      (seq_cusum_{filter,bars,test}_chunked — the single-huge-symbol
#      scale-out for the reset state machines, same recursive-CTE
#      oracles as their single-task twins) and store_meta_sidecar (the
#      write-time _meta integrity sidecar round-trip);
# 5-10: implementation changed in round 6: kmeans_clusters /
#       semantic_dedup / ann_ivf (Lloyd iterations unrolled into one
#       SQL CTE chain, registered Arrow cosine UDF), the two sweeps
#       (input builder no longer constructs the discarded concurrency
#       frame), store_inspector (shares the refactored oracle SQL);
# 11-36: the r1-r2-stale cohort from the round-5 rotation note — their
#        newest driver-green row is 4-5 rounds old, unchanged since;
# 37-50: the oldest r3-green rows (volume-profile family, weights tier,
#        event filters, as-of joins, imbalance/run bars).
# Still-green-and-unchanged queries sit behind position 50; their prior
# evidence stands. ROUND-7 FRONT-LOAD: anything new/changed in round 7
# first, then the remaining r3-green cohort (time_bars_filled,
# seq_hurst, seq_apen, seq_bar_dur_ewma, tick_bars-adjacent rows), then
# the r4 conversions (feat_* window tier) as they age.
_PRIORITY = [
    # -- new in round 6 ------------------------------------------------------
    "seq_cusum_filter_chunked",
    "seq_cusum_bars_chunked",
    "seq_cusum_test_chunked",
    "store_meta_sidecar",
    # -- implementation changed in round 6 -----------------------------------
    "kmeans_clusters",
    "semantic_dedup",
    "ann_ivf",
    "avg_uniqueness_sweep",
    "return_attribution_sweep",
    "store_inspector",
    # -- r1-r2-stale cohort (newest green 4-5 rounds old) ---------------------
    "integrity_report",
    "merge_split_trades",
    "bar_trade_size_1m",
    "feat_dir_run_len",
    "seq_ewma",
    "seq_ewms",
    "seq_ewmst",
    "seq_rsi_wilder",
    "seq_adx",
    "seq_cusum_filter",
    "seq_volume_bars_exact",
    "seq_cusum_test",
    "text_stats",
    "exact_dedup",
    "simhash_fp",
    "ann_topk",
    "multimodal_meta",
    "image_decode_stats",
    "sequence_packing",
    "dedup_clusters",
    "mixture_sample",
    "c4_filter",
    "unigram_logprob",
    "pricing_summary",
    "regional_revenue",
    "sql_shared_dialect",
    # -- oldest r3-green rows -------------------------------------------------
    "vp_profile",
    "vp_poc",
    "vp_hva_lva",
    "vp_developing",
    "time_decay",
    "class_balance",
    "final_weights",
    "zscore_peak_events",
    "dedup_keep_best",
    "decontamination",
    "asof_sigma",
    "asof_tolerance",
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
