"""finmlkit_spark — a PySpark-native financial-ML feature-store engine.

A brand-new engine with the query/data-processing capabilities of the
reference library quantscious/finmlkit (a Numba/NumPy single-node
pipeline), re-expressed Spark-first:

- raw tick trades -> cleaned canonical trades table (``operators.preprocess``)
- bars: time/tick/volume/dollar/CUSUM sampling (``operators.bars``)
- intra-bar microstructure features: directional flow, trade sizes,
  footprints, volume profile (``operators.bars``, ``operators.footprint``,
  ``operators.volume_profile``)
- inter-bar feature library: ~40 rolling/window transforms
  (``functions.rolling``, ``functions.sequential``)
- event sampling (CUSUM filter), Triple Barrier labels, sample weights
  (``operators.labels``)
- declarative feature graph + JSON serialization (``plans``)
- large-scale training-data ops: dedup, similarity search, text stats
  (``operators.dedup``, ``operators.similarity``, ``operators.text``)

Everything is DataFrame/Catalyst first; grouped Arrow pandas UDFs only
for genuinely sequential recurrences (EWMA family, Wilder smoothing,
CUSUM state machines).
"""

__version__ = "0.1.0"
