"""Anchored streaming debounce / rate limiter — keep an event only if
STRICTLY more than `min_gap` has passed since the last KEPT event of
its key (matching the batch gap-form oracle's strict-> comparison: an
event landing exactly min_gap after the last kept one is suppressed).

This is the semantics the batch gap-form (queries/behavior.py:
q_event_debounce, suppression window restarts at EVERY event) cannot
express in plain window SQL: the anchor is the last *kept* event, so a
burst of closely-spaced events emits exactly one survivor per gap
window instead of suppressing the whole tail. That requires a running
scan with state — `applyInPandasWithState`, one state row per active
(user, event_type) key holding the last-kept micro-timestamp.

Scale/state notes: state is O(active keys) and constant-size per key;
events arrive per-key time-ordered within a micro-batch only after the
explicit sort below (Spark does not order rows within a state group),
so the operator sorts each group's batch slice — bounded by the
micro-batch, never the stream. Cross-batch order relies on the
watermark discipline of the source (same contract as scd2_merge's
append-only assumption). Output mode append: kept events emit once.

The closed-form semantics are pinned by a pure-Python reference in the
parity test (`tests/test_stream_debounce.py`), run over the same rows
both streamed (two file drops) and replayed in one batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts_us", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_kept_us", T.LongType()),
])


def make_debounce_fn(min_gap_us: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        kept_id, kept_ts = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for eid, ts in zip(pdf["event_id"], pdf["ts_us"]):
                ts = int(ts)
                if last is None or ts - last > min_gap_us:
                    kept_id.append(int(eid))
                    kept_ts.append(ts)
                    last = ts
        if last is not None:
            state.update((int(last),))
        yield pd.DataFrame({
            "user_id": int(key[0]),
            "event_type": str(key[1]),
            "event_id": kept_id,
            "ts_us": kept_ts,
        })
    return fn


_GAP_UNITS_S = {"second": 1, "sec": 1, "s": 1,
                "minute": 60, "min": 60, "m": 60,
                "hour": 3600, "hr": 3600, "h": 3600}


def parse_gap_us(min_gap: str) -> int:
    """'10 minutes' / '1 minute' / '30 secs' / '2 hours' → microseconds.
    Units are normalized (optional plural 's' stripped); anything else
    raises a ValueError listing the accepted forms."""
    try:
        qty, unit = min_gap.split()
        n = int(qty)
    except ValueError:
        raise ValueError(f"min_gap {min_gap!r}: expected '<int> <unit>', "
                         f"e.g. '10 minutes'") from None
    u = unit.lower()
    if u not in _GAP_UNITS_S and u.endswith("s"):
        u = u[:-1]
    if u not in _GAP_UNITS_S:
        raise ValueError(
            f"min_gap unit {unit!r} not recognized; accepted: "
            f"{sorted(set(_GAP_UNITS_S))} (with or without plural 's')")
    return n * _GAP_UNITS_S[u] * 1_000_000


def debounce_stream(events: DataFrame, min_gap: str = "10 minutes") -> DataFrame:
    """events: (event_id, user_id, event_type, ts[, ...]) streaming or
    batch frame → kept events (user_id, event_type, event_id, ts_us).
    An event is kept iff its gap to the last KEPT event is strictly
    greater than min_gap (batch-oracle strict-> semantics)."""
    gap_us = parse_gap_us(min_gap)
    keyed = (events
             .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
             .select("user_id", "event_type", "event_id",
                     F.unix_micros("ts").alias("ts_us")))
    return (keyed.groupBy("user_id", "event_type")
                 .applyInPandasWithState(
                     make_debounce_fn(gap_us),
                     outputStructType=OUT_SCHEMA,
                     stateStructType=STATE_SCHEMA,
                     outputMode="append",
                     timeoutConf=GroupStateTimeout.NoTimeout))
