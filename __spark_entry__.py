"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``finmlkit_spark.suite`` — a registry of (spark, sf_dir) ->
DataFrame queries with matching DuckDB oracle SQL, one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finmlkit_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: events -> trades -> 1m bars -> 12 features in one
    Catalyst plan (one scan, one shuffle, one sort for all windows)."""
    return suite.QUERIES["pipeline_1m_features"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLES)
