"""Technical-analysis indicators (SURVEY.md §2.5 W6).

The reference FETCHES these from CoinCap (coincap/main.py:62-108; field
shapes README.md:148-163: sma, rsi, macd, macd_signal, macd_hist,
vwap24) — it never computes them. Computing them natively:

  * SMA / VWAP — trailing-row window aggregates, pure Catalyst
    (`Window.partitionBy(symbol).orderBy(ts).rowsBetween(-n+1, 0)`).
    Sums go through exact decimal arithmetic so the sliding-window
    accumulation order can't produce ulp drift vs the oracle.
  * EMA / RSI / MACD — recursive definitions (each value depends on the
    previous output), inexpressible as a frame aggregate; per-symbol
    `applyInPandas` is the idiomatic Spark form: one shuffle on symbol,
    Arrow-batched, the recursion runs vectorized in pandas.

Scale notes: the window aggregates shuffle once on symbol and sort
locally. The applyInPandas path holds ONE symbol's series per task —
fine for thousands of symbols × long histories; for a single series too
large for one task you'd segment with overlap = indicator warm-up
length and stitch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SMA_N = 20
EMA_FAST = 12
EMA_SLOW = 26
EMA_SIGNAL = 9
RSI_N = 14


def sma_vwap(df: DataFrame, n: int = SMA_N,
             symbol_col: str = "symbol", ts_col: str = "ts",
             price_col: str = "price", volume_col: str = "volume",
             order_cols: tuple = ()) -> DataFrame:
    """Trailing-n-row SMA and VWAP per symbol."""
    w = (Window.partitionBy(symbol_col)
               .orderBy(ts_col, *order_cols)
               .rowsBetween(-(n - 1), Window.currentRow))
    dec = lambda c: F.sum(c.cast("decimal(27,6)")).over(w).cast("double")  # noqa: E731
    price, vol = F.col(price_col), F.col(volume_col)
    return df.select(
        symbol_col, ts_col, *order_cols, price_col, volume_col,
        (dec(price) / F.count(price_col).over(w)).alias("sma"),
        (dec(price * vol) / F.nullif(dec(vol), F.lit(0.0))).alias("vwap"),
    )


TA_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("ema_fast", T.DoubleType()),
    T.StructField("ema_slow", T.DoubleType()),
    T.StructField("macd", T.DoubleType()),
    T.StructField("macd_signal", T.DoubleType()),
    T.StructField("macd_hist", T.DoubleType()),
    T.StructField("rsi", T.DoubleType()),
])


def ta_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """Recursive indicators for ONE symbol's series (already sorted in
    ascending ts by the caller). Standard definitions: EMA with
    adjust=False (classic recursion), Wilder-smoothed RSI, MACD 12/26/9."""
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    price = pdf["price"].astype(float)
    ema_fast = price.ewm(span=EMA_FAST, adjust=False).mean()
    ema_slow = price.ewm(span=EMA_SLOW, adjust=False).mean()
    macd = ema_fast - ema_slow
    signal = macd.ewm(span=EMA_SIGNAL, adjust=False).mean()
    delta = price.diff()
    gain = delta.clip(lower=0.0)
    loss = (-delta).clip(lower=0.0)
    avg_gain = gain.ewm(alpha=1.0 / RSI_N, adjust=False).mean()
    avg_loss = loss.ewm(alpha=1.0 / RSI_N, adjust=False).mean()
    rs = avg_gain / avg_loss
    rsi = (100.0 - 100.0 / (1.0 + rs)).where(avg_loss > 0, 100.0)
    rsi[delta.isna()] = None  # first row has no change yet
    return pd.DataFrame({
        "symbol": pdf["symbol"], "ts": pdf["ts"], "price": price,
        "ema_fast": ema_fast, "ema_slow": ema_slow,
        "macd": macd, "macd_signal": signal, "macd_hist": macd - signal,
        "rsi": rsi,
    })


def ta_indicators(df: DataFrame) -> DataFrame:
    """(symbol, ts, price) → full indicator frame, one group per symbol."""
    return df.groupBy("symbol").applyInPandas(
        lambda pdf: ta_pandas(pdf), TA_SCHEMA)
