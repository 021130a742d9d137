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
