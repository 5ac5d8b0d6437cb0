"""Tracked persist: bounded side tables that operators pin for plan
reuse, with an explicit release hook for long-lived sessions.

Several operators persist small summary tables (one row per time chunk,
or 2 rows per event) because the plan references them on both sides of
a prefix construction — without a storage boundary each reference
re-runs the data-scale upstream (Spark plans are trees). The tables are
bounded at any data scale, but a long-lived session that invokes the
operators repeatedly would accumulate cached blocks that only go away
on session GC (round-4 advisory). Callers own the cleanup: batch
runners (``bench.py``, the test suite) call :func:`release_all` between
queries; notebook users can call it whenever a pipeline's results have
been materialized.

The registry holds STRONG references: a registered frame's blocks
stay pinned until :func:`release_all` runs (dropping your own handles
is not enough). Long-lived sessions must call it; batch runners do so
between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []
_CUT: list[DataFrame] = []


def keep(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_all`."""
    df = df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every registered :func:`keep` frame; returns how many
    were actively unpersisted. :func:`cut` frames are NOT counted —
    ``DataFrame.unpersist`` is a no-op for localCheckpoint storage, so
    their blocks are reclaimed only by the ContextCleaner after this
    registry drops its strong references (which this call does) and the
    objects are garbage-collected.

    Safe to call at any time: releasing a frame whose plan is still
    referenced downstream only costs recomputation, never correctness.
    """
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    _CUT.clear()  # drop strong refs; ContextCleaner reclaims post-GC
    return n


def cut(df: DataFrame) -> DataFrame:
    """Persist AND truncate lineage via ``localCheckpoint(eager=False)``,
    registered for :func:`release_all` (released by reference-drop —
    Spark's ContextCleaner reclaims the checkpoint blocks once the
    objects are collected).

    Use instead of :func:`keep` when the frame sits UNDER a deep
    operator chain: every Dataset op re-analyzes its whole subtree
    JVM-side, so ops stacked on a deep tree (triple barrier → sweep)
    pay seconds of repeated analysis that a LogicalRDD plan truncates
    to nothing (measured −37% end-to-end on return_attribution_sweep).
    Costs one physical-planning pass up front and, unlike ``keep``,
    does not CacheManager-match plan rebuilds — each fresh build
    rematerializes. Scale note: checkpointed partitions are not
    recomputable on executor loss; prefer :func:`keep` when fault
    recomputation matters more than driver latency.
    """
    df = df.localCheckpoint(eager=False)
    _CUT.append(df)
    return df
