"""DuckDB-side projection mirroring sources/tweets_json.normalize_tweets
— kept in one place so the Spark reader and its oracle stay in sync."""

from ..sources.tweets_json import TWITTER_FMT_DUCKDB

# symbol: 3-letter filename prefix with the SHI→SHIB fixup
_SYMBOL = r"""
CASE WHEN regexp_extract(filename, '([A-Z]{3})[^/]*\.jsonl$', 1) = 'SHI'
     THEN 'SHIB'
     ELSE regexp_extract(filename, '([A-Z]{3})[^/]*\.jsonl$', 1) END
"""

# tolerant chain: RFC3339 → epoch-ms → Twitter format (day name stripped);
# each branch lands on naive UTC TIMESTAMP to match Spark's UTC session;
# year clamp mirrors sources.tweets_json.clamp_ts
_EVENT_TS_RAW = f"""
COALESCE(
  TRY_CAST(created_at_iso AS TIMESTAMP),
  epoch_ms(TRY_CAST(timestamp_ms AS BIGINT)),
  try_strptime(substring(created_at_raw, 5), '{TWITTER_FMT_DUCKDB}')
    AT TIME ZONE 'UTC')
"""
_EVENT_TS = f"""
CASE WHEN year({_EVENT_TS_RAW}) BETWEEN 1900 AND 2100
     THEN {_EVENT_TS_RAW} END
"""

TWEETS_ORACLE_SELECT = f"""
       {_SYMBOL} AS symbol,
       id, text, author_id, crypto_key,
       {_EVENT_TS} AS event_ts,
       TRY_CAST(timestamp_ms AS BIGINT) AS ts_ms,
       TRY_CAST(timestamp_sec AS BIGINT) AS ts_sec
"""
