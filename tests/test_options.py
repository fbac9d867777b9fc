"""Black-Scholes fragment semantics: put-call parity, reference values,
and the polynomial CDF's accuracy envelope."""

from __future__ import annotations

import math

import pytest

from big_data_engineering_financial_analysis_spark.operators.options import (
    black_scholes_sql,
    ncdf_sql,
)


def _bs_reference(s, k, sigma, t, r):
    """Exact-erf reference (math.erf) for accuracy checks."""
    d1 = (math.log(s / k) + (r + sigma * sigma / 2.0) * t) / (sigma * math.sqrt(t))
    d2 = d1 - sigma * math.sqrt(t)
    n = lambda x: 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
    disc = math.exp(-r * t)
    call = s * n(d1) - k * disc * n(d2)
    put = k * disc * n(-d2) - s * n(-d1)
    return call, put, n(d1)


def test_ncdf_polynomial_accuracy(spark):
    xs = [-3.0, -1.5, -0.1, 0.0, 0.7, 2.2]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r["n"] for r in df.selectExpr(f"{ncdf_sql('x')} AS n").collect()]
    for x, g in zip(xs, got):
        want = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
        assert abs(g - want) < 2e-7, (x, g, want)


def test_put_call_parity_and_reference_values(spark):
    t, r = 30.0 / 365.0, 0.02
    frags = black_scholes_sql("s", "k", "sigma", t, r)
    cases = [(100.0, 100.0, 0.25), (120.0, 100.0, 0.4), (80.0, 100.0, 0.15)]
    df = spark.createDataFrame(cases, "s double, k double, sigma double")
    out = df.selectExpr(
        "s", "k", "sigma",
        f"{frags['call']} AS call", f"{frags['put']} AS put",
        f"{frags['delta_call']} AS delta",
    ).collect()
    for row in out:
        want_c, want_p, want_d = _bs_reference(row["s"], row["k"], row["sigma"], t, r)
        assert row["call"] == pytest.approx(want_c, abs=5e-5)
        assert row["put"] == pytest.approx(want_p, abs=5e-5)
        assert row["delta"] == pytest.approx(want_d, abs=2e-7)
        # parity: C - P = S - K e^{-rT}; the sign-symmetric erf makes
        # N(x) + N(-x) == 1 up to a couple of ulps
        parity = row["s"] - row["k"] * math.exp(-r * t)
        assert row["call"] - row["put"] == pytest.approx(parity, abs=1e-9)
        assert 0.0 <= row["delta"] <= 1.0
