"""Streaming windowed dual-stream join — the J1 speed-layer operator
(dataflow/stream_join.py:479-524) in its union-then-aggregate form.

Beam's `WindowInto(Fixed(30s)) → CoGroupByKey(symbol)` groups BOTH
streams' elements per (window, symbol) in one shuffle. The closest
Spark plan is NOT a stream-stream join (two state stores, two
watermarks, join-specific emission rules) but union-then-aggregate
(SURVEY.md §7 "hard" #2): tag each stream's rows into a common schema,
union, and run ONE windowed aggregation whose conditional aggregates
compute the per-side metrics. One state store, one shuffle, and the
outer semantics (tweet-only / price-only windows) fall out of the
conditional aggregates for free — identical to stream_join.py:410-419's
zeros/empty-list behavior.

The same function works on batch DataFrames (used by the parity test:
batch union-form ≡ batch two-agg full-outer form ≡ streaming output).

Event-time semantics (T1-T5):
  * event time = the `event_time` column; `withWatermark` bounds state
    and late data (T1/T4; Beam's default allowed-lateness 0 ≙ a small
    delay here, configurable).
  * tumbling windows via `window()` (T2).
  * append output emits once the watermark passes the window end —
    Beam's default trigger (T3).
  * both window edges survive in the output; `label` picks which one
    becomes `event_timestamp` (T5 — the reference stamps *end* in the
    speed layer, *start* in the batch layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tag_union(tweets: DataFrame, prices: DataFrame) -> DataFrame:
    t = tweets.select(
        "event_time", "symbol",
        F.col("text"), F.lit(None).cast("double").alias("price"))
    p = prices.select(
        "event_time", "symbol",
        F.lit(None).cast("string").alias("text"), F.col("price"))
    return t.unionByName(p)


def union_form_prices_with_tweets(
        tweets: DataFrame, prices: DataFrame,
        window_duration: str = "30 seconds",
        label: str = "end",
        watermark: str | None = None,
        max_texts: int | None = None,
        exact_avg: bool = True) -> DataFrame:
    """One windowed aggregation over the tagged union of both streams.

    Output schema matches operators.windowed_join.prices_with_tweets.
    Pass ``watermark`` (e.g. "0 seconds") for streaming inputs.
    """
    u = _tag_union(tweets, prices)
    if watermark is not None:
        u = u.withWatermark("event_time", watermark)
    texts = F.sort_array(F.collect_list("text"))  # collect_list skips NULLs
    if max_texts is not None:
        texts = F.slice(texts, 1, max_texts)
    if exact_avg:
        avg_price = (F.sum(F.col("price").cast("decimal(27,6)")).cast("double")
                     / F.count("price"))
    else:
        avg_price = F.avg("price")
    agg = (u.groupBy(F.window("event_time", window_duration).alias("w"),
                     "symbol")
            .agg(F.count("text").alias("tweet_volume"),
                 texts.alias("tweet_texts"),
                 avg_price.alias("avg_price"),
                 # ordering key is NULL for tweet rows → max_by ignores them
                 F.max_by("price",
                          F.when(F.col("price").isNotNull(),
                                 F.col("event_time"))).alias("last_price")))
    edge = F.col("w.end") if label == "end" else F.col("w.start")
    return agg.select(
        edge.alias("event_timestamp"), "symbol",
        "tweet_volume", "avg_price", "last_price", "tweet_texts")


def dedupe_stream(df: DataFrame, key_cols: tuple[str, ...],
                  ts_col: str = "event_time",
                  watermark: str = "30 seconds") -> DataFrame:
    """Streaming exact-dedup: drop repeated (key) rows within the
    watermark horizon — the at-least-once-source complement to the T9
    idempotent sinks (a replayed/duplicated upstream message survives
    exactly once downstream). State is bounded by the watermark: keys
    older than the horizon are evicted, so memory is O(arrival rate ×
    horizon), not O(stream length)."""
    return (df.withWatermark(ts_col, watermark)
              .dropDuplicatesWithinWatermark(list(key_cols)))


def sessionize_stream(df: DataFrame, keys: tuple[str, ...],
                      ts_col: str = "event_time",
                      gap: str = "5 minutes",
                      watermark: str = "0 seconds") -> DataFrame:
    """Streaming session windows: events per key merge while consecutive
    gaps stay under `gap`; a session closes (and emits, append mode)
    once the watermark passes its end. The streaming twin of the batch
    gap-flag sessionization (queries/timeseries.py:_sessionized) — same
    merge semantics, so the two are parity-testable on replayed input.

    State is one open session per active key — bounded by key
    cardinality × gap horizon, NOT by stream length; Spark's native
    session_window state store handles merge-on-arrival (no
    applyInPandasWithState needed for plain gap sessions)."""
    return (df.withWatermark(ts_col, watermark)
              .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"),
                       *keys)
              .agg(F.count("*").alias("n_events"),
                   F.max(ts_col).alias("last_event"))
              .select(*keys,
                      F.col("sw.start").alias("session_start"),
                      F.col("sw.end").alias("session_end"),
                      "n_events", "last_event"))


def hopping_window_counts(df: DataFrame, keys: tuple[str, ...],
                          ts_col: str = "event_time",
                          window: str = "2 minutes",
                          slide: str = "1 minute",
                          watermark: str = "0 seconds") -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows, emitted (append) once the
    watermark passes each window's end — the T2 tumbling operator's
    overlapping sibling (Beam `SlidingWindows`; a 1-min-sliding 2-min
    count is the standard streaming rate monitor).

    Scale/state note: state is one row per (open window × key); an
    event contributes to window/slide windows, so state and shuffle
    volume scale by that overlap factor — choose slide accordingly
    (window/slide is typically 2-4). Works unchanged on batch frames
    (the parity test replays the same rows both ways)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
              .agg(F.count("*").alias("n_events"))
              .select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *keys, "n_events"))


def stream_stream_interval_join(
        tweets: DataFrame, prices: DataFrame,
        tolerance: str = "30 seconds",
        watermark: str = "0 seconds",
        how: str = "inner") -> DataFrame:
    """TRUE stream-stream inner join (two state stores): each tweet
    paired with every price tick of the same symbol within ±tolerance
    of its event time — the streaming twin of the batch bucketized
    time_tolerance_join (operators/interval_join.py), and the join-form
    alternative to the union-then-aggregate speed layer above (use this
    when per-PAIR rows are the product, not per-window aggregates).

    Scale/state semantics: both sides are watermarked and the join
    condition bounds price_time to a closed interval around tweet_time,
    so Spark derives state-eviction watermarks for BOTH stores — each
    holds only ~(watermark + tolerance) of data per side, independent
    of stream length. Without the time-range predicate the state would
    grow forever; that predicate is what makes a stream-stream join
    production-safe (T1/T4 discipline applied to J-family).

    `how="leftOuter"` keeps tweets with no price inside the tolerance:
    the outer (NULL-price) row for a tweet emits only once the
    watermark passes tweet_time + tolerance — before that, a matching
    price could still arrive, so the row sits in state. That
    delayed-emission rule is the stream-correct analog of a batch left
    join, and what the left-outer pytest exercises. `how="fullOuter"`
    additionally keeps price ticks no tweet referenced (audit form:
    nothing from either feed is dropped); the output `symbol` is
    coalesced across sides since either may be the missing one.

    The same function runs on batch DataFrames (withWatermark is a
    no-op there), which is how the parity test pins it to the
    bucketized batch implementation."""
    t = tweets.select(F.col("symbol").alias("t_symbol"),
                      F.col("event_time").alias("tweet_time"), "text") \
              .withWatermark("tweet_time", watermark)
    p = prices.select(F.col("symbol").alias("p_symbol"),
                      F.col("event_time").alias("price_time"), "price") \
              .withWatermark("price_time", watermark)
    tol = F.expr(f"INTERVAL {tolerance}")
    cond = ((F.col("t_symbol") == F.col("p_symbol"))
            & (F.col("price_time") >= F.col("tweet_time") - tol)
            & (F.col("price_time") <= F.col("tweet_time") + tol))
    return (t.join(p, cond, how)
             .select(F.coalesce("t_symbol", "p_symbol").alias("symbol"),
                     "tweet_time", "text", "price_time", "price"))


def streaming_prices_with_tweets(
        tweets: DataFrame, prices: DataFrame,
        window_duration: str = "30 seconds",
        watermark: str = "0 seconds",
        label: str = "end",
        max_texts: int | None = 1000) -> DataFrame:
    """Streaming entry: watermarked, capped-list production defaults.

    max_texts defaults to a cap here (unbounded per-window collect_list
    is the one reference construct that can't scale — SURVEY.md §7 #3).
    """
    return union_form_prices_with_tweets(
        tweets, prices, window_duration, label=label,
        watermark=watermark, max_texts=max_texts)
