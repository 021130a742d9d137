"""Stateful per-symbol online forecast (SURVEY.md M2/T6).

The reference keeps a worker-resident ARIMA per symbol and does
`model.update([price]); predict(1)` per tick with best-effort,
non-checkpointed state (dataflow/stream_join.py:349-398). The idiomatic
Spark form is `applyInPandasWithState`: state is explicit, keyed by
symbol, checkpointed with the query, and survives restarts — strictly
stronger semantics than the reference (whose state dies with a worker).

The model here is the closed-form online AR(1) around a running mean:
    forecast_{t+1} = mu_t + phi * (x_t - mu_t)
with mu_t a running average updated per tick and phi fixed (the batch
trainer ml.q_ml_ar1_train produces per-symbol phi; pass it in).
Semantics note (SURVEY.md §7 "hard" #1): updates happen per-row inside
a micro-batch exactly like the reference's per-element DoFn, but
emission granularity is per micro-batch — documented, and tested at the
sequence level.

Scale notes: state per key is three floats — thousands of symbols cost
nothing; the shuffle is the groupBy(symbol) the operator needs anyway.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FORECAST_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType()),
    T.StructField("event_time", T.TimestampType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("next_price_forecast", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
])

DEFAULT_PHI = 0.8


def _step(n: int, mean: float, last: float, price: float,
          phi: float) -> Tuple[int, float, float, float]:
    """One online update; returns (n, mean, last, forecast_after_update)."""
    n += 1
    mean += (price - mean) / n
    last = price
    return n, mean, last, mean + phi * (last - mean)


def make_forecast_fn(phi: float = DEFAULT_PHI, phi_map=None):
    """Row-at-a-time online update inside each micro-batch (the reference
    updates per element); rows are processed in event-time order.

    ``phi_map``: optional per-symbol phi — pass a broadcast of
    model_registry.phi_by_symbol(bundle) (or a plain dict) so the
    streaming job consumes the batch trainer's artifact, mirroring the
    reference's GCS-bundle load (stream_join.py:355-368)."""

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        lookup = getattr(phi_map, "value", phi_map)  # broadcast or dict
        sym_phi = (lookup or {}).get(symbol, phi)
        n, mean, last = state.get if state.exists else (0, 0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_time")
            for row in pdf.itertuples(index=False):
                price = float(row.price)
                n, mean, last, fc = _step(n, mean, last, price, sym_phi)
                out.append((symbol, row.event_time, price, fc))
        state.update((n, mean, last))
        yield pd.DataFrame(out, columns=[f.name for f in FORECAST_SCHEMA])

    return fn


def online_forecast(prices: DataFrame, phi: float = DEFAULT_PHI,
                    phi_map=None,
                    output_mode: str = "append") -> DataFrame:
    """prices: (symbol, event_time, price) stream → per-tick forecasts."""
    return (prices.groupBy("symbol")
            .applyInPandasWithState(
                make_forecast_fn(phi, phi_map),
                outputStructType=FORECAST_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout))


def online_forecast_tws(prices: DataFrame, phi: float = DEFAULT_PHI,
                        phi_map=None) -> DataFrame:
    """The same online AR(1) forecast on Spark 4's transformWithState
    API — the successor to applyInPandasWithState: state lives in
    named, typed handles (ValueState here) inside the RocksDB state
    store (the API REQUIRES RocksDBStateStoreProvider), which is the
    at-scale configuration anyway (state no longer bounded by executor
    heap; incremental checkpointing). Emission semantics are identical
    to online_forecast — the parity test pins both against the same
    sequential reference. (The parity test skips where google.protobuf
    — a pyspark dependency this container omits — is unavailable:
    transformWithState's Python driver worker speaks a protobuf state
    protocol. The operator code itself is plain pyspark API.)"""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Forecast(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("ar1", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (symbol,) = key
            lookup = getattr(phi_map, "value", phi_map)
            sym_phi = (lookup or {}).get(symbol, phi)
            st = self._st.get() if self._st.exists() else None
            n, mean, last = st if st is not None else (0, 0.0, 0.0)
            out = []
            for pdf in rows:
                pdf = pdf.sort_values("event_time")
                for row in pdf.itertuples(index=False):
                    price = float(row.price)
                    n, mean, last, fc = _step(n, mean, last, price,
                                              sym_phi)
                    out.append((symbol, row.event_time, price, fc))
            self._st.update((n, mean, last))
            yield pd.DataFrame(
                out, columns=[f.name for f in FORECAST_SCHEMA])

        def close(self) -> None:
            pass

    return (prices.groupBy("symbol")
            .transformWithStateInPandas(
                statefulProcessor=_Forecast(),
                outputStructType=FORECAST_SCHEMA,
                outputMode="Append",
                timeMode="None"))


def reference_forecast_series(prices: pd.DataFrame,
                              phi: float = DEFAULT_PHI) -> pd.DataFrame:
    """Pandas twin for tests: the exact sequential semantics."""
    out = []
    states: dict[str, Tuple[int, float, float]] = {}
    for row in prices.sort_values(["event_time"]).itertuples(index=False):
        n, mean, last = states.get(row.symbol, (0, 0.0, 0.0))
        n, mean, last, fc = _step(n, mean, last, float(row.price), phi)
        states[row.symbol] = (n, mean, last)
        out.append((row.symbol, row.event_time, float(row.price), fc))
    return pd.DataFrame(out, columns=["symbol", "event_time", "price",
                                      "next_price_forecast"])
