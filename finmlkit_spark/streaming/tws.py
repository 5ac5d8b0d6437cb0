"""Spark-4 ``transformWithStateInPandas`` surface (SURVEY.md §2.10),
probe-gated.

The GroupState forms in :mod:`streaming.bars` cover the semantics in
every environment; this module carries the SAME exact-reset volume-bar
state machine on the Spark-4 stateful-processor API so the engine is
ready the day the runtime gains ``google.protobuf`` (the TWS Python
worker speaks protobuf to the state server — the import succeeds
without it, but every state round-trip needs it). The probe mirrors the
PIL feature gate in ``operators/multimodal``: probed once, a clear
RuntimeError at the seam, a self-skipping parity test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

_UNPROBED = object()
_TWS_OK = _UNPROBED

VB_OUT_SCHEMA = "symbol string, ts long, bar_id long"


def tws_available() -> bool:
    """Probe-once gate for ``transformWithStateInPandas``: the API ships
    with PySpark 4, but its state client requires ``google.protobuf``
    at execution time — absent in this container, so the probe (not an
    import error mid-query) is the documented seam."""
    global _TWS_OK
    if _TWS_OK is _UNPROBED:
        try:
            import google.protobuf  # noqa: F401  (the real runtime dependency)
            from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
                StatefulProcessor,
            )

            _TWS_OK = True
        except ImportError:
            _TWS_OK = False
    return bool(_TWS_OK)


def _volume_bar_processor(threshold: float):
    """Build the StatefulProcessor subclass lazily (the base class import
    is cheap, but constructing it before the probe would hard-import the
    API on module load)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from .bars import _ordered_batch

    class VolumeBarProcessor(StatefulProcessor):
        """Exact-reset volume bars — the same state machine as
        ``streaming/bars.streaming_volume_bars`` (GroupState form) and
        the batch kernel ``sequential.volume_bar_ids_exact``: running
        volume accumulates per symbol, a bar closes when it crosses the
        threshold, the accumulator resets to ZERO (no carry)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("vb", "cum double, bar_id long")

        def handleInputRows(self, key, rows, timerValues):
            cum, bar = self._state.get() if self._state.exists() else (0.0, 0)
            pdf = _ordered_batch(rows)
            out = []
            if len(pdf):
                for ts, qty in zip(pdf["ts_ns"], pdf["qty"]):
                    cum += qty
                    out.append((key[0], int(ts), int(bar)))
                    if cum >= threshold:
                        bar += 1
                        cum = 0.0
            self._state.update((cum, bar))
            yield pd.DataFrame(out, columns=["symbol", "ts", "bar_id"])

        def close(self) -> None:
            pass

    return VolumeBarProcessor()


def streaming_volume_bars_tws(stream: DataFrame, threshold: float) -> DataFrame:
    """``streaming_volume_bars`` on the Spark-4
    ``transformWithStateInPandas`` API — identical output contract to
    the GroupState form (parity test self-skips until the runtime gains
    protobuf). Raises RuntimeError at the documented seam when the
    runtime lacks the API's dependencies."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf at "
            "execution time (not in this container); use "
            "streaming.bars.streaming_volume_bars (GroupState) instead"
        )
    return stream.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=_volume_bar_processor(threshold),
        outputStructType=VB_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
