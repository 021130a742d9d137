"""TA-indicator semantics: the applyInPandas distributed computation
must equal the plain-pandas twin, and the recursions must satisfy their
defining identities on known series."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.operators.ta import (
    EMA_FAST,
    ta_indicators,
    ta_pandas,
)


@pytest.fixture(scope="module")
def ticks_pdf():
    ts = pd.date_range("2024-01-01", periods=120, freq="15s")
    rows = []
    for sym, base, step in (("ETH", 2700.0, 1.7), ("SOL", 127.0, -0.3)):
        price = base
        for i, t in enumerate(ts):
            price = price + step * (1 if i % 3 else -2)
            rows.append((sym, t, float(price)))
    return pd.DataFrame(rows, columns=["symbol", "ts", "price"])


def test_distributed_equals_pandas_twin(spark, ticks_pdf):
    sdf = spark.createDataFrame(ticks_pdf)
    got = (ta_indicators(sdf).toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))
    want = (pd.concat([ta_pandas(g) for _, g in ticks_pdf.groupby("symbol")])
            .sort_values(["symbol", "ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, rtol=1e-12)


def test_ema_recursion_identity(ticks_pdf):
    one = ta_pandas(ticks_pdf[ticks_pdf["symbol"] == "ETH"])
    alpha = 2.0 / (EMA_FAST + 1)
    prev = one["ema_fast"].shift(1)
    expect = alpha * one["price"] + (1 - alpha) * prev
    pd.testing.assert_series_equal(one["ema_fast"][1:], expect[1:],
                                   check_names=False, rtol=1e-12)


def test_rsi_bounds_and_monotone_series(ticks_pdf):
    out = ta_pandas(ticks_pdf[ticks_pdf["symbol"] == "ETH"])
    valid = out["rsi"].dropna()
    assert ((valid >= 0) & (valid <= 100)).all()
    # strictly increasing series → all gains → RSI 100
    up = pd.DataFrame({
        "symbol": "UP",
        "ts": pd.date_range("2024-01-01", periods=30, freq="15s"),
        "price": [100.0 + i for i in range(30)],
    })
    assert (ta_pandas(up)["rsi"][1:] == 100.0).all()


def test_macd_hist_is_macd_minus_signal(ticks_pdf):
    out = ta_pandas(ticks_pdf[ticks_pdf["symbol"] == "SOL"])
    pd.testing.assert_series_equal(out["macd_hist"],
                                   out["macd"] - out["macd_signal"],
                                   check_names=False, rtol=1e-12)
