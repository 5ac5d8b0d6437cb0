"""Goldens for the complexity estimators (Hurst, ApEn) against
first-principles references."""

from __future__ import annotations

import numpy as np

from finmlkit_spark.functions.sequential import approx_entropy, hurst_rolling


def test_hurst_random_walk_near_half():
    rng = np.random.default_rng(42)
    y = np.cumsum(rng.standard_normal(4000))
    h = hurst_rolling(y, 512)
    est = np.nanmean(h[512:])
    assert 0.35 < est < 0.65  # random walk -> H ≈ 0.5


def test_hurst_trending_above_half():
    rng = np.random.default_rng(1)
    # strongly trending (integrated twice -> smoother, H -> 1)
    y = np.cumsum(np.cumsum(rng.standard_normal(3000)))
    h = hurst_rolling(y, 512)
    assert np.nanmean(h[512:]) > 0.8


def test_apen_regular_vs_random():
    t = np.arange(200)
    regular = np.sin(0.3 * t)
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal(200)
    assert approx_entropy(regular) < approx_entropy(noisy)


def test_apen_matches_bruteforce():
    # brute-force reference implementation of Pincus ApEn
    def apen_ref(x, m=2, r=None):
        n = len(x)
        r = 0.2 * np.std(x) if r is None else r

        def phi(mm):
            pats = [x[i : i + mm] for i in range(n - mm + 1)]
            cs = []
            for a in pats:
                c = sum(1 for b in pats if np.max(np.abs(a - b)) <= r) / len(pats)
                cs.append(np.log(c))
            return np.mean(cs)

        return phi(m) - phi(m + 1)

    rng = np.random.default_rng(7)
    x = rng.standard_normal(60)
    assert abs(approx_entropy(x) - apen_ref(x)) < 1e-12
