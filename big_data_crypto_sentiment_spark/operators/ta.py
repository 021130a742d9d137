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
    """Recursive indicators for ONE symbol's series. Standard
    definitions: EMA with adjust=False (classic recursion),
    Wilder-smoothed RSI, MACD 12/26/9.

    The recurrences are spelled out explicitly — e = (1-α)·e + α·x,
    same op order as the DuckDB recursive-CTE oracle twin — instead of
    pandas ewm(adjust=False), whose per-step normalization divides by
    ((1-α)+α) and drifts from the textbook recursion by ~1 ulp/step.
    Values agree with ewm to ~1e-13; the oracle comparison (round 6 on
    both sides) needs the bit-identical form. The Python loop is per
    GROUP (one symbol already shuffled to one task), so it adds no
    distribution cost; a group is ~series length, looped at C-call-free
    float speed."""
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    x = pdf["price"].astype(float).to_numpy()
    n = len(x)
    af, asl, asg = (2.0 / (EMA_FAST + 1), 2.0 / (EMA_SLOW + 1),
                    2.0 / (EMA_SIGNAL + 1))
    ar = 1.0 / RSI_N
    ef = [0.0] * n
    es = [0.0] * n
    macd = [0.0] * n
    sig = [0.0] * n
    rsi = [None] * n
    if n:
        ef[0], es[0] = x[0], x[0]
        ag = al = None
        for i in range(1, n):
            ef[i] = (1.0 - af) * ef[i - 1] + af * x[i]
            es[i] = (1.0 - asl) * es[i - 1] + asl * x[i]
            macd[i] = ef[i] - es[i]
            sig[i] = (1.0 - asg) * sig[i - 1] + asg * macd[i]
            g = max(x[i] - x[i - 1], 0.0)
            lo = max(x[i - 1] - x[i], 0.0)
            ag = g if ag is None else (1.0 - ar) * ag + ar * g
            al = lo if al is None else (1.0 - ar) * al + ar * lo
            rsi[i] = (100.0 - 100.0 / (1.0 + ag / al)) if al > 0 else 100.0
    out = pd.DataFrame({
        "symbol": pdf["symbol"], "ts": pdf["ts"], "price": x,
        "ema_fast": ef, "ema_slow": es, "macd": macd,
        "macd_signal": sig,
        "macd_hist": [m - s for m, s in zip(macd, sig)],
        "rsi": pd.array(rsi, dtype="float64"),
    })
    return out


def ta_indicators(df: DataFrame) -> DataFrame:
    """(symbol, ts, price) → full indicator frame, one group per symbol."""
    return df.groupBy("symbol").applyInPandas(
        lambda pdf: ta_pandas(pdf), TA_SCHEMA)
