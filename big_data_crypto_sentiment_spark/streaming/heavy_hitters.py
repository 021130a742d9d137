"""Streaming heavy hitters: Misra–Gries summaries in bounded state.

The batch sketch family (queries/approx.py) has a count-min heavy-hitter
estimate; streams need the same answer with BOUNDED state over unbounded
key cardinality — which a native streaming `groupBy(key).count()` cannot
give (its state grows with distinct keys, and streaming aggs cannot
emit a top-k anyway). The standard fix is the Misra–Gries (a.k.a.
Frequent) summary: at most C counters per shard; an arriving key either
increments its counter, claims a free slot, or decrements ALL counters
(dropping zeros). Guarantees after n updates with capacity C:

    true_count - n/(C+1)  <=  est  <=  true_count

and every key with true_count > n/(C+1) is PRESENT in the summary —
the property the pytest pins against exact batch counts.

Spark-first shape: keys are hash-sharded (deterministic md5 bucket, the
repo's portable hash) so the operator parallelizes; each shard keeps one
summary in `applyInPandasWithState` state (arrays of keys/counts + the
processed-row count — O(C) per shard, checkpointed, restart-safe). Each
micro-batch emits the shard's full current summary (outputMode update
downstream); merging shards is the classic summary-merge at read time:
summing per-key estimates keeps both bounds since shards partition the
stream. Cite: reference has no streaming sketch — its closest surface is
the per-key counting DoFn (dataflow/stream_join.py) this generalizes.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MG_CAPACITY = 64
N_SHARDS = 8

HH_OUT_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("key", T.StringType()),
    T.StructField("est_count", T.LongType()),
    T.StructField("n_shard", T.LongType()),
])

HH_STATE_SCHEMA = T.StructType([
    T.StructField("keys", T.ArrayType(T.StringType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
    T.StructField("n", T.LongType()),
])


def mg_update(summary: dict[str, int], key: str,
              capacity: int = MG_CAPACITY) -> None:
    """One Misra–Gries step, in place."""
    if key in summary:
        summary[key] += 1
    elif len(summary) < capacity:
        summary[key] = 1
    else:
        for k in list(summary):
            summary[k] -= 1
            if summary[k] == 0:
                del summary[k]


def make_hh_fn(capacity: int = MG_CAPACITY):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            keys, counts, n = state.get
            summary = dict(zip(list(keys), [int(c) for c in counts]))
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            for k in pdf["key"]:
                mg_update(summary, str(k), capacity)
            n += len(pdf)
        state.update((list(summary.keys()),
                      [int(v) for v in summary.values()], n))
        # an empty summary (decrement wiped all counters) still emits a
        # NULL-key sentinel so readers see the updated n_shard — else
        # the n/(C+1) error bound they form goes stale for this shard
        keys_out = list(summary.keys()) or [None]
        counts_out = [int(v) for v in summary.values()] or [0]
        yield pd.DataFrame({
            "shard": shard,
            "key": keys_out,
            "est_count": counts_out,
            "n_shard": n,
        })
    return fn


def streaming_heavy_hitters(stream: DataFrame, key_col: str,
                            capacity: int = MG_CAPACITY,
                            n_shards: int = N_SHARDS) -> DataFrame:
    """Per-shard Misra–Gries summaries, refreshed every micro-batch.
    Input: any streaming DataFrame; `key_col` is stringified. Output
    rows carry the shard's processed count so readers can form the
    n/(C+1) error bound per shard (and, summed, globally)."""
    from ..queries.sampling import _hash_bucket
    keyed = stream.select(
        _hash_bucket(F.col(key_col), n_shards).cast("int").alias("shard"),
        F.col(key_col).cast("string").alias("key"))
    return (keyed.groupBy("shard")
                 .applyInPandasWithState(
                     make_hh_fn(capacity),
                     outputStructType=HH_OUT_SCHEMA,
                     stateStructType=HH_STATE_SCHEMA,
                     outputMode="update",
                     timeoutConf=GroupStateTimeout.NoTimeout))
