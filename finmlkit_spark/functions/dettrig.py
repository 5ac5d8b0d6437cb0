"""Cross-engine deterministic trig: sin/cos of ``2*pi*t`` as shared SQL text.

JVM ``Math.sin``/``Math.cos`` and DuckDB's libm disagree in the final ulp,
which breaks bit-exact result hashing between a Spark query and its DuckDB
oracle even though the values agree to ~1e-15 (reference semantics:
``core/time.py:5-62`` cyclic time encodings). Rounding the output does NOT
fix this: a true value within an ulp of a rounding-digit boundary still
rounds differently on each engine.

The fix is to remove libm from the compared surface entirely. IEEE-754
``+ - * /``, ``floor`` and integer ``%`` ARE required to be bit-identical
(correctly rounded) on both engines, so these helpers emit ONE SQL
expression string — parsed by both Spark (``F.expr``) and DuckDB — that
evaluates sin/cos via

  1. exact quarter-turn argument reduction (mul/floor/sub by powers of two
     and small exact integers), then
  2. a Taylor polynomial in Horner form over the reduced argument
     ``|x| <= pi/4``.

Same text => same parse => same IEEE op order => same bits on both engines.
Accuracy vs true sin/cos is < 4e-13 absolute (error terms x^15/15! for sin,
x^14/14! for cos at x = pi/4), far tighter than the reference's float64
feature contract.

Literal convention: every numeric double literal uses e-notation
(``0.5e0``) because a bare decimal literal (``0.5``) is DECIMAL-typed in
both Spark SQL and DuckDB, which would switch the arithmetic to
engine-specific decimal rules. Decimal-string -> double parsing is
correctly rounded on both engines, so the literals are bit-identical too.
"""

from __future__ import annotations

import math

__all__ = ["sin2pi_sql", "cos2pi_sql", "frac_of_day_sql", "dow_sql"]

_TWO_PI = "6.283185307179586e0"  # repr(2*math.pi)

DAY_NS = 86_400_000_000_000
WEEK_NS = 604_800_000_000_000


def _lit(c: float) -> str:
    """repr of a double, forced to e-notation so both engines type it DOUBLE."""
    s = repr(float(c))
    return s if ("e" in s or "E" in s) else s + "e0"


# sin(x)/x and cos(x) as polynomials in y = x*x (Taylor; |x| <= pi/4).
_SIN_C = [_lit(c) for c in (
    1.0, -1 / 6, 1 / 120, -1 / 5040, 1 / 362880, -1 / 39916800, 1 / 6227020800,
)]
_COS_C = [_lit(c) for c in (
    1.0, -1 / 2, 1 / 24, -1 / 720, 1 / 40320, -1 / 3628800, 1 / 479001600,
)]


def _horner(y: str, coeffs: list[str]) -> str:
    expr = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        expr = f"({c} + ({y} * {expr}))"
    return expr


def _sin_poly(x: str) -> str:
    y = f"({x} * {x})"
    return f"({x} * {_horner(y, _SIN_C)})"


def _cos_poly(x: str) -> str:
    y = f"({x} * {x})"
    return _horner(y, _COS_C)


def _sin2pi_quarter(t: str, quarter_offset: int) -> str:
    """sin(2*pi*t + quarter_offset*pi/2) via quadrant CASE + shared polynomial.

    ``k = floor(4t + 1/2)`` is the nearest quarter turn (all ops exact for
    |t| < 2^50), the reduced argument ``x = 2*pi*(t - k/4)`` lies in
    [-pi/4, pi/4], and the quarter offset is absorbed into the quadrant
    selector — no perturbation of the argument, so cos shares sin's bits.
    """
    k = f"CAST(floor(({t} * 4.0e0) + 0.5e0) AS BIGINT)"
    x = f"(({t} - (CAST({k} AS DOUBLE) / 4.0e0)) * {_TWO_PI})"
    q = f"(((({k} + {quarter_offset}) % 4) + 4) % 4)"
    sp, cp = _sin_poly(x), _cos_poly(x)
    return (
        f"(CASE {q} WHEN 0 THEN {sp} WHEN 1 THEN {cp} "
        f"WHEN 2 THEN (0.0e0 - {sp}) ELSE (0.0e0 - {cp}) END)"
    )


def sin2pi_sql(t: str) -> str:
    """SQL text for sin(2*pi*t); ``t`` is a DOUBLE-valued SQL expression."""
    return _sin2pi_quarter(t, 0)


def cos2pi_sql(t: str) -> str:
    """SQL text for cos(2*pi*t) = sin(2*pi*t + pi/2)."""
    return _sin2pi_quarter(t, 1)


def frac_of_day_sql(ts_col: str) -> str:
    """Fraction of the UTC day in [0, 1) from a long-ns column, floored to
    whole seconds first (reference computes from seconds: core/time.py:17).

    ``ts % DAY_NS < 2^53`` so the double conversion and both divisions are
    exact/correctly-rounded — bit-identical cross-engine.
    """
    sec = f"CAST(floor(CAST(({ts_col} % {DAY_NS}) AS DOUBLE) / 1.0e9) AS BIGINT)"
    return f"(CAST({sec} AS DOUBLE) / 86400.0e0)"


def dow_sql(ts_col: str) -> str:
    """Day-of-week 0=Mon .. 6=Sun as a BIGINT SQL expression from long ns.

    Reduces mod one week FIRST (``ts % WEEK_NS < 2^53``) so no arithmetic
    ever touches a >2^53 double; epoch day 0 is a Thursday (= 3 Mon-based).
    """
    day_in_week = (
        f"CAST(floor(CAST(({ts_col} % {WEEK_NS}) AS DOUBLE) / 86400000000000.0e0) AS BIGINT)"
    )
    return f"(({day_in_week} + 3) % 7)"


def _self_test() -> float:  # pragma: no cover - dev aid
    import numpy as np

    ts = np.arange(0, 7 * DAY_NS, 60 * 10**9, dtype=np.int64)
    t = (ts % DAY_NS) // 10**9 / 86400.0
    worst = 0.0
    for tv in t[:2000]:
        k = math.floor(tv * 4.0 + 0.5)
        x = (tv - k / 4.0) * 2 * math.pi
        y = x * x
        s = x * (1 + y * (-1 / 6 + y * (1 / 120 + y * (-1 / 5040 + y * (1 / 362880 + y * (-1 / 39916800 + y * (1 / 6227020800)))))))
        c = 1 + y * (-1 / 2 + y * (1 / 24 + y * (-1 / 720 + y * (1 / 40320 + y * (-1 / 3628800 + y * (1 / 479001600))))))
        ref_s, ref_c = [s, c, -s, -c][k % 4], [c, -s, -c, s][k % 4]
        worst = max(worst, abs(ref_s - math.sin(2 * math.pi * tv)), abs(ref_c - math.cos(2 * math.pi * tv)))
    return worst


if __name__ == "__main__":  # pragma: no cover
    print("max |poly - libm| =", _self_test())
