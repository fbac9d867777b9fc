"""Black–Scholes option pricing as engine-portable SQL fragments.

The one non-elementary piece, the standard normal CDF, uses the
Abramowitz & Stegun 7.1.26 polynomial erf approximation (|error| <
1.5e-7) — plain +-*/ / exp / abs / sign, so the SAME SQL text evaluates
in Spark (`F.expr`) and DuckDB.  That is the determinism contract: both
engines run the identical expression tree, making the prices
bit-identical regardless of the approximation's distance from the true
normal.

Everything is row-local (zero shuffle): pricing a 100 TB surface of
(spot, strike, vol) rows is a pure map, and Catalyst keeps it inside
whole-stage codegen because the fragments avoid Python entirely.

Constants are baked via ``repr`` so both engines parse the same
doubles.
"""

from __future__ import annotations

import math

#: A&S 7.1.26 coefficients.
_P = 0.3275911
_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)

SQRT2 = math.sqrt(2.0)


def erf_sql(x: str) -> str:
    """erf(x) via the A&S polynomial, as a self-contained SQL fragment
    (``x`` is substituted textually — pass a column name or a
    parenthesized expression)."""
    # Horner form: pure mul/add — pow() could differ in the last ulp
    # between the JVM's and C's libm, which would break bit-parity
    t = f"(1.0 / (1.0 + {_P!r} * abs({x})))"
    inner = repr(_A[-1])
    for a in reversed(_A[:-1]):
        inner = f"({a!r} + {t} * {inner})"
    poly = f"({t} * {inner})"
    return f"(sign({x}) * (1.0 - {poly} * exp(-(({x}) * ({x})))))"


def ncdf_sql(x: str) -> str:
    """Standard normal CDF via erf: N(x) = (1 + erf(x / sqrt 2)) / 2."""
    return f"(0.5 * (1.0 + {erf_sql(f'(({x}) / {SQRT2!r})')}))"


def black_scholes_sql(
    s: str,
    k: str,
    sigma: str,
    t_years: float,
    r: float,
) -> dict[str, str]:
    """SELECT-expression fragments for call/put price and call delta
    over spot ``s``, strike ``k``, annualized vol ``sigma`` (column
    names or expressions).  Returns {'d1','d2','call','put',
    'delta_call'} fragments sharing the same maturity/rate literals."""
    sqrt_t = math.sqrt(t_years)
    d1 = (
        f"((ln(({s}) / ({k})) + ({r!r} + (({sigma}) * ({sigma})) / 2.0)"
        f" * {t_years!r}) / (({sigma}) * {sqrt_t!r}))"
    )
    d2 = f"(({d1}) - ({sigma}) * {sqrt_t!r})"
    disc = f"exp(-({r!r} * {t_years!r}))"
    call = f"(({s}) * {ncdf_sql(d1)} - ({k}) * {disc} * {ncdf_sql(d2)})"
    put = f"(({k}) * {disc} * {ncdf_sql(f'(-({d2}))')} - ({s}) * {ncdf_sql(f'(-({d1}))')})"
    return {
        "d1": d1,
        "d2": d2,
        "call": call,
        "put": put,
        "delta_call": ncdf_sql(d1),
    }
