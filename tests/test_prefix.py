"""Differential tests for functions.prefix.exclusive_prefix: both modes
(flat triangular, two-level) against a driver-side brute force, over
adversarial key distributions (negatives, gaps, group-boundary keys,
all-null last-columns, singleton tables)."""

from __future__ import annotations

import random

import pytest

from finmlkit_spark.functions.prefix import exclusive_prefix


def _brute(rows):
    run, lastv, out = 0, None, {}
    for k, s, v in rows:
        out[k] = (run, lastv)
        run += s
        if v is not None:
            lastv = v
    return out


def _cases():
    rng = random.Random(23)
    dense = [(k, rng.randint(0, 9), rng.choice([None, rng.randint(-3, 3)])) for k in range(40)]
    gappy_keys = sorted(rng.sample(range(-3000, 3000), 120))
    gappy = [(k, rng.randint(0, 5), rng.choice([None, None, rng.randint(0, 9)])) for k in gappy_keys]
    boundary = [(k, 1, k) for k in (-4096, -1, 0, 1, 4095, 4096, 4097, 8192)]
    all_null = [(k, 2, None) for k in range(10)]
    single = [(7, 5, 3)]
    return {
        "dense": dense,
        "gappy": gappy,
        "boundary": boundary,
        "all_null": all_null,
        "single": single,
    }


@pytest.mark.parametrize("group", [None, 1, 7, 4096])
def test_exclusive_prefix_modes_match_brute_force(spark, group):
    for name, rows in _cases().items():
        df = spark.createDataFrame(rows, "k long, s long, v long")
        out = exclusive_prefix(df, "k", sums={"ps": "s"}, lasts={"pl": "v"}, group=group)
        got = {r["k"]: (r["ps"], r["pl"]) for r in out.collect()}
        exp = _brute(rows)
        assert got == exp, (name, group)
