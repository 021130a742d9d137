"""Ingestion sources (SURVEY.md §2.1) — JSON tweet corpora, CSV price
exports, and the gated Avro/warehouse reader."""

from .avro_io import read_avro, write_avro  # noqa: F401
from .csv_source import read_prices_csv  # noqa: F401
from .tweets_json import normalize_tweets, read_tweets_jsonl  # noqa: F401
from .warehouse import read_warehouse  # noqa: F401
