"""Query/oracle registry backing ``__spark_entry__``.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable; the
optional oracle is an ANSI-SQL string DuckDB runs on the same parquet
tables. Queries without an oracle get the driver's weaker rows-only
check (documented per query — genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
