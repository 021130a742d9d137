"""as-of join edge semantics: tie inclusivity, no-prior-row NULLs,
per-key isolation, and left-column preservation."""

from datetime import datetime

import pytest

from big_data_crypto_sentiment_spark.operators.asof_join import asof_join


def _t(m):
    return datetime(2024, 1, 1, 10, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "ETH", _t(0)),   # before any price → NULL
         (2, "ETH", _t(5)),   # exactly at a price tick → inclusive match
         (3, "ETH", _t(7)),   # between ticks → backward match
         (4, "SOL", _t(9)),   # other key — must not see ETH prices
         (5, "SOL", _t(30))], # after last SOL tick → carries last value
        ["event_id", "symbol", "ts"])
    right = spark.createDataFrame(
        [("ETH", _t(5), 2700.0), ("ETH", _t(6), 2710.0),
         ("ETH", _t(10), 2720.0), ("SOL", _t(8), 127.0)],
        ["symbol", "ts", "price"])
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = {r.event_id: r.price
           for r in asof_join(left, right, "symbol", "ts",
                              ("price",)).collect()}
    assert out == {1: None, 2: 2700.0, 3: 2710.0, 4: 127.0, 5: 127.0}


def test_left_columns_and_cardinality_preserved(frames):
    left, right = frames
    out = asof_join(left, right, "symbol", "ts", ("price",))
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "symbol", "ts", "price"}
