"""ml_mlp_score_frozen pinned on a PLANTED embeddings table with
short and over-length vectors: the fixtures are uniformly 64-dim, so
the pair's size(embedding) >= MLP_DIM filter arm never fires there.
This corpus plants 60-dim (dropped) and 70-dim (kept — the integer
fold reads the first 64 coordinates on both engines) vectors among
normal ones and requires exact Spark/DuckDB agreement plus a true
udf-vs-frozen flag everywhere."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_crypto_sentiment_spark.queries.ml import (
    MLP_DIM,
    ORACLE,
    q_ml_mlp_score_frozen,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted_mlp")
    rng = np.random.default_rng(11)
    vecs, ids = [], []
    for i in range(30):
        dim = MLP_DIM
        if i in (7, 19):
            dim = MLP_DIM - 4          # dropped by the size filter
        elif i in (11, 23):
            dim = MLP_DIM + 6          # kept; fold reads 64 coords
        vecs.append((rng.standard_normal(dim) * 2).astype(np.float32))
        ids.append(i)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 5 for i in ids], pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_mlp_frozen_oracle_agrees_with_ragged_dims(spark, planted_dir):
    got = {r["vec_id"]: r.asDict()
           for r in q_ml_mlp_score_frozen(spark, planted_dir).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{planted_dir}/embeddings.parquet')")
    want = con.sql(ORACLE["ml_mlp_score_frozen"]).df()
    assert len(want) == len(got) == 28      # two short vectors dropped
    assert 7 not in got and 19 not in got
    assert 11 in got and 23 in got
    for _, row in want.iterrows():
        g = got[row["vec_id"]]
        for k in ("l0_14", "l1_14", "l2_14", "udf_matches_frozen"):
            assert int(g[k]) == int(row[k]), (row["vec_id"], k)
    assert all(g["udf_matches_frozen"] == 1 for g in got.values())
