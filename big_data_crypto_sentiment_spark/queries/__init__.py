"""Oracle-checked query registry.

Each submodule exports ``QUERIES: dict[name -> fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name -> ANSI SQL]`` (DuckDB-runnable on the same parquet
views). ``__spark_entry__.py`` aggregates them. Queries without an ORACLE
entry get the driver's weaker rows-only check (genuinely non-SQL ops:
stateful streaming, iterative training).

Float determinism convention (so the driver's value-hash matches bit-for-bit):
  * large sums/averages go through exact decimal arithmetic, then cast to
    double (identical IEEE rounding in both engines);
  * O(1)-magnitude derived stats (corr, ratios) are round()ed to 6 places
    on both sides;
  * passthrough column values are never touched.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    approx,
    avro_rt,
    cleaning,
    components,
    dedup,
    flagship,
    ingestion,
    media,
    ml,
    packing,
    relational,
    reshape,
    retrieval,
    sampling,
    similarity,
    ta,
    text,
    timeseries,
)

_MODULES = (flagship, relational, timeseries, text, dedup, similarity, ml,
            ingestion, ta, media, reshape, approx, avro_rt, components,
            sampling, packing, cleaning, retrieval)

# More oracle-paired queries exist than the driver's fixed 50-entry
# correctness window can check. These five are deliberately deferred to
# positions 51+ — every one is still hash-checked by tools/check.py at
# sf0.001/0.01/0.1 (see COVERAGE.md) and each has independent evidence:
#   src_avro_roundtrip — real-Avro-bytes pytest roundtrip (deferred
#                        since round 3)
#   log_return         — same window math as in-window ts_window_calcs;
#                        driver-green rounds 2-3
#   binned_features    — reshape family in-window via
#                        group_collect_training/kv_flatten; green r2-r3
#   ts_corr            — the k=0 slice of in-window ts_lag_sweep_corr;
#                        green r2-r3
#   sample_stratified  — family in-window via sample_and_split/
#                        mixture_downsample; quota property tests
#   text_dup_rate      — dup family in-window via text_top_duplicated
#                        (same hash-agg over text); green r2-r4
#   kv_flatten         — reshape family in-window via
#                        zip_explode_measures/group_collect_training;
#                        green r3-r4
#   union_event_slices — plain UNION ALL of two pushed-down slices;
#                        green r2-r4
#   ts_session_stats   — session family in-window via ts_sessionize
#                        (same gap-flag window pass); green r2-r4
#   src_tweets_volume  — source family in-window via src_tweets_normalize
#                        (same JSON parse path; volume is an agg on top);
#                        green r2-r4
#   zip_explode_measures — reshape family in-window via
#                        group_collect_training; green r3-r4
# (the newest deferrals make window room for fresh operator families
# the driver should be hash-checking: the cleaning module, the
# bucketized interval join, overlap chunking, and vocab building)
#   dedup_source_matrix — cross-source leaks exist only at sf0.1 in the
#                        fixtures (empty at the driver's sf0.01 = weak
#                        window evidence); hash-checked non-empty at
#                        sf0.1 by tools/check.py
#   tokens_to_ids      — terminal tokenization; packing family in-window
#                        via chunk_overlap/pack_sequences; hash-checked
#                        at 3 SFs by tools/check.py
#   retention_after_deletes — broadcast anti-join tombstone op; join
#                        family in-window via left_join_fillna/
#                        orders_by_nation; hash-checked at 3 SFs
#   ta_ema_rsi_macd    — upgraded rows-only → oracle-paired in r4 (the
#                        recursive-CTE twin); TA family in-window via
#                        ta_sma_vwap; recurrence pinned in pytest
#   embed_quantize     — int8 embedding compression; similarity family
#                        in-window via sim_topk_cosine; error bound
#                        pinned in pytest
#   sample_length_weighted — integer-tier weighted sampler; family
#                        in-window via sample_and_split
#   src_warehouse_fallback — source family in-window via
#                        src_tweets_normalize/src_csv_prices; the
#                        fallback/avro tiers are pytest-covered in
#                        test_sources.py; green r2-r5
#   ts_bucket_counts   — A7 resample counts; timeseries family
#                        in-window via the richer ts_rollup /
#                        ts_resample_ffill; green r2-r5
#   text_top_duplicated — A13b top-dup texts; dup evidence in-window
#                        via dedup_exact (same hash-agg over the same
#                        column); green r2-r5
#   text_rlike_filter  — P11 regex filter; the regex surface (incl the
#                        CJK class) is in-window via text_signals /
#                        text_c4_filter; green r2-r5
#   ts_trailing_hour   — trailing range-frame window; timeseries family
#                        has six other members in-window (sessionize,
#                        rollup, window_calcs, resample_ffill,
#                        lag_sweep_corr, spearman); green r2-r5
#   top_users          — O3/A6 value_counts top-k; the bounded-top-k
#                        plan shape (TakeOrderedAndProject) is in-window
#                        via vocab_top_terms; green r2-r5
# (r5 deferrals make window room for the new cleaning-family operators
# — boilerplate_strip, unigram_logprob — and the sparse-retrieval
# sim_tfidf_topk)
_DEFER_FROM_WINDOW = ("src_avro_roundtrip", "log_return", "binned_features",
                      "ts_corr", "sample_stratified", "text_dup_rate",
                      "kv_flatten", "union_event_slices", "ts_session_stats",
                      "src_tweets_volume", "zip_explode_measures",
                      "dedup_source_matrix", "tokens_to_ids",
                      "retention_after_deletes", "ta_ema_rsi_macd",
                      "embed_quantize", "sample_length_weighted",
                      "src_warehouse_fallback", "ts_bucket_counts",
                      "text_top_duplicated", "text_rlike_filter",
                      "ts_trailing_hour", "top_users",
                      # r6: the degenerate-fixture stress config hands
                      # its driver slot to sim_tfidf_zipf_topk — the
                      # max_df-cut scale shape is what should be
                      # hash-checked and benched per round; this one
                      # stays tools/check.py-verified at 3 SFs
                      "sim_tfidf_topk",
                      # r6: double-mode CSV source hands its slot to
                      # src_csv_prices_decimal, which drives the same
                      # reader/parse path plus the faithful
                      # DecimalType(38,18) aggregates; double mode
                      # stays tools/check.py-verified + pytest parity
                      "src_csv_prices")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry in driver-checked order: every oracle-paired query first
    (the driver's correctness window is a fixed-size prefix of this dict),
    rows-only entries after — so no hash-checkable query ever falls
    outside the checked window."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle_keys: set[str] = set()
    for m in _MODULES:
        dupes = set(merged) & set(m.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query names: {dupes}")
        merged.update(m.QUERIES)
        oracle_keys.update(m.ORACLE)
    out = {k: v for k, v in merged.items()
           if k in oracle_keys and k not in _DEFER_FROM_WINDOW}
    out.update({k: v for k, v in merged.items()
                if k in oracle_keys and k in _DEFER_FROM_WINDOW})
    out.update({k: v for k, v in merged.items() if k not in oracle_keys})
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
