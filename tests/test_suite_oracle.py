"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the reference's dual-backend oracle strategy, SURVEY.md §5)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check import compare  # noqa: E402

from finmlkit_spark import suite  # noqa: E402

SF_ORACLE = os.environ.get("FMK_TEST_SF_DIR", "/root/testdata/sf0.001")


def _names():
    return sorted(suite.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, duck):
    sdf = suite.QUERIES[name](spark, SF_ORACLE).toPandas()
    if name not in suite.ORACLES:
        assert len(sdf) >= 0  # weak rows-only check
        return
    odf = duck.execute(suite.ORACLES[name]).fetchdf()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name}: {errs}"
