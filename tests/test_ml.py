"""Unit tests for the ML operator family's edge paths that the oracle
harness doesn't exercise: the MIN_TRAIN null-row guard, AR(1) recovery
of a known process, and the sentiment-math invariants."""

import math

import pandas as pd
import pytest

from big_data_crypto_sentiment_spark.queries.ml import (
    HOLDOUT,
    MIN_TRAIN,
    _ar1_train,
    _ar_train,
    _yule_walker,
)


def _grid(values, sym="ETH"):
    return pd.DataFrame({
        "event_type": sym,
        "bucket": pd.date_range("2024-01-01", periods=len(values), freq="h"),
        "value_ffill": values,
    })


def test_ar1_short_series_returns_null_row():
    out = _ar1_train(_grid([1.0] * (MIN_TRAIN + HOLDOUT)))
    assert len(out) == 1
    assert out["phi"].iloc[0] is None
    assert out["n_train"].iloc[0] == MIN_TRAIN + HOLDOUT


def test_ar1_recovers_known_phi():
    # exactly alternating series: x_t = mu + a·(−1)^t is AR(1) with φ = −1
    # (train length 188 is even → the train mean is exactly mu, the lag
    # regression is exactly −1, and the holdout forecast is exact)
    mu, a = 10.0, 2.0
    xs = [mu + a * (1 if t % 2 == 0 else -1) for t in range(200)]
    out = _ar1_train(_grid(xs))
    assert out["phi"].iloc[0] == pytest.approx(-1.0, abs=1e-9)
    assert out["mu"].iloc[0] == pytest.approx(mu, abs=1e-9)
    assert out["mae"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_ar1_constant_series_zero_denominator():
    out = _ar1_train(_grid([5.0] * 200))
    assert out["phi"].iloc[0] == 0.0
    assert out["mae"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_yule_walker_recovers_ar2_and_ar3_coefficients():
    """The YW normal-equation solve must recover the generating
    coefficients of seeded synthetic AR(p) series (the accuracy pin for
    the order-search trainer's numeric core)."""
    import numpy as np

    def gen(phis, n, seed, sigma=0.5):
        rng = np.random.default_rng(seed)
        x = np.zeros(n + 100)
        for t in range(len(phis), len(x)):
            x[t] = sum(phis[i] * x[t - 1 - i]
                       for i in range(len(phis))) + rng.normal(0, sigma)
        return x[100:]

    for phis, seed in [([0.6, -0.3], 7), ([0.4, -0.3, 0.25], 11)]:
        est = _yule_walker(gen(phis, 4000, seed), len(phis))
        assert est == pytest.approx(phis, abs=0.05), (phis, est)


def test_ar_train_order_search_beats_ar1_on_cycle():
    """A period-3 cycle is AR(2)-representable but impossible for AR(1);
    the holdout search must pick an order >= 2 and forecast it nearly
    exactly (deterministic input, deterministic search)."""
    xs = [50.0 + [2.0, -1.0, -1.0][t % 3] for t in range(300)]
    out = _ar_train(_grid(xs))
    r = out.iloc[0]
    assert r["chosen_p"] >= 2
    assert r["mu"] == pytest.approx(50.0, abs=1e-9)
    assert r["mae"] < 0.1        # near-exact; an AR(1) fit is off by O(1)
    assert r["n_train"] == 300 - HOLDOUT


def test_ar_train_constant_series_returns_null_row():
    """Constant train series → singular YW matrix for every p; the
    trainer must emit the null-metrics row, not crash the job."""
    out = _ar_train(_grid([5.0] * 200))
    r = out.iloc[0]
    assert r["chosen_p"] is None and r["phi"] is None
    assert r["mae"] is None
    assert r["mu"] == pytest.approx(5.0)
    assert r["n_train"] == 200 - HOLDOUT


def test_ar_train_short_series_returns_null_row():
    out = _ar_train(_grid([1.0, 2.0] * ((MIN_TRAIN + HOLDOUT) // 2)))
    assert out["chosen_p"].iloc[0] is None
    assert out["n_train"].iloc[0] == MIN_TRAIN + HOLDOUT


def test_sentiment_math_invariants(spark):
    from big_data_crypto_sentiment_spark.queries.ml import q_ml_sentiment
    df = q_ml_sentiment(spark, "/root/testdata/sf0.001").toPandas()
    ok = df[df["sentiment_score"].notna()]
    assert (ok["sentiment_score"].abs() <= 1.0 + 1e-12).all()
    assert ((ok["sentiment_magnitude"] >= 0) &
            (ok["sentiment_magnitude"] <= 1.0 + 1e-12)).all()
    buys = ok[ok["action_signal"] == "buy"]
    assert (buys["sentiment_score"] > 0).all()
    assert set(ok["sentiment_label"]) <= {"POSITIVE", "NEUTRAL", "NEGATIVE"}
    # null-input path produces a fully-null sentiment row
    nulls = df[df["sentiment_score"].isna()]
    if len(nulls):
        assert nulls["sentiment_label"].isna().all()
        assert nulls["action_signal"].isna().all()
