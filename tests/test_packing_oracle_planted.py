"""pack_bins_ffd's graduated guarantee surface pinned on a PLANTED
corpus with OVERLONG documents — the driver fixtures top out far below
TOKEN_BUDGET tokens, so their hashes never exercise the n_overlong /
singleton-bin arms of the oracle or the capacity carve-out for
over-budget singletons. This corpus plants two overlong docs (one
>2x budget), runs the real Spark surface and the real ORACLE SQL side
by side, and checks both exact agreement and that the overlong legs
fired."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_crypto_sentiment_spark.queries.packing import (
    ORACLE,
    TOKEN_BUDGET,
    q_pack_bins_ffd,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted_pack")
    docs = []
    for i in range(40):
        docs.append(" ".join(f"w{i}x{j}" for j in range(20 + i % 30)))
    # two overlong docs: just over budget, and well past 2x budget
    docs[5] = " ".join(f"long{j}" for j in range(TOKEN_BUDGET + 40))
    docs[21] = " ".join(f"huge{j}" for j in range(2 * TOKEN_BUDGET + 80))
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": docs,
        "lang": ["en"] * len(docs),
        "source": ["s0"] * len(docs),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_ffd_oracle_agrees_with_overlong_docs(spark, planted_dir):
    got = {r["pack_group"]: r.asDict()
           for r in q_pack_bins_ffd(spark, planted_dir).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{planted_dir}/documents.parquet')")
    want = con.sql(ORACLE["pack_bins_ffd"]).df()
    assert len(want) == len(got)
    for _, row in want.iterrows():
        g = got[row["pack_group"]]
        for k in want.columns:
            assert int(g[k]) == int(row[k]), (row["pack_group"], k)
    # the overlong arms actually fired somewhere
    assert sum(g["n_overlong"] for g in got.values()) == 2
    # and the guarantee flags held with over-budget singleton bins in
    # play (the capacity carve-out and the n_overlong term of the UB)
    assert all(g["capacity_ok"] and g["n_bins_le_ub"]
               and g["n_bins_ge_lb"] and g["le_one_half_empty"]
               for g in got.values())
