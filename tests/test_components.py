"""Connected-components clustering: exact labels on known graph shapes,
convergence on a long chain (worst-case diameter), and canonical-keep
semantics of the registered dedup query."""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.components import (
    connected_components,
    dedup_components,
)


def _cc(spark, edge_list, node_list):
    edges = spark.createDataFrame(edge_list or [(0, 0)], "a long, b long")
    if not edge_list:
        edges = edges.filter(F.lit(False))
    nodes = spark.createDataFrame([(n,) for n in node_list], "id long")
    return {r.node: r.component
            for r in connected_components(edges, nodes).collect()}


def test_two_components_and_singleton(spark):
    # triangle {1,2,3}, pair {10,11}, isolated 99
    got = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_long_chain_converges_to_one_component(spark):
    # path 0-1-2-...-19: diameter 19, the propagation worst case
    n = 20
    got = _cc(spark, [(i, i + 1) for i in range(n - 1)], list(range(n)))
    assert got == {i: 0 for i in range(n)}


def test_empty_edges_all_singletons(spark):
    got = _cc(spark, [], [5, 6, 7])
    assert got == {5: 5, 6: 6, 7: 7}


def test_label_is_component_min_regardless_of_edge_order(spark):
    # min id sits mid-chain; edges listed high-to-low
    got = _cc(spark, [(9, 4), (4, 2), (2, 7)], [9, 4, 2, 7])
    assert set(got.values()) == {2}


def test_adversarial_chain_logarithmic_rounds(spark):
    """4096-node path graph — the large-star/small-star contraction must
    converge in O(log n) alternation rounds (plain min-label propagation
    would need ~4095), and still label every node with the chain min."""
    import math
    n = 4096
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    stats = {}
    got = {r.node: r.component
           for r in connected_components(edges, nodes, max_iter=40,
                                         _stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 2 * int(math.log2(n))  # 24 for n=4096


def test_rounds_tiny_on_quasi_clique(spark):
    # the near-dup-graph common case: dense component, ~2 rounds
    edges = spark.createDataFrame(
        [(i, j) for i in range(8) for j in range(i + 1, 8)],
        "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    stats = {}
    connected_components(edges, nodes, _stats=stats).collect()
    assert stats["rounds"] <= 2


@pytest.fixture(scope="module")
def slice_components(spark):
    from big_data_crypto_sentiment_spark.queries._util import table
    docs = (table(spark, "/root/testdata/sf0.001", "documents")
            .filter(F.col("source") == "src0"))
    return dedup_components(docs, 0.01).collect()


def test_dedup_components_one_canonical_per_cluster(slice_components):
    by_comp = {}
    for r in slice_components:
        by_comp.setdefault(r.component, []).append(r)
    for comp, rows in by_comp.items():
        canons = [r.doc_id for r in rows if r.is_canonical]
        assert canons == [comp] == [min(r.doc_id for r in rows)]
        assert all(r.component_size == len(rows) for r in rows)


def test_dedup_components_covers_every_eligible_doc(spark, slice_components):
    from big_data_crypto_sentiment_spark.queries._util import table
    from big_data_crypto_sentiment_spark.queries.dedup import (
        SHINGLE_WORDS,
        _words,
    )
    docs = (table(spark, "/root/testdata/sf0.001", "documents")
            .filter(F.col("source") == "src0")
            .filter(F.size(_words()) >= SHINGLE_WORDS))
    assert sorted(r.doc_id for r in slice_components) == \
        sorted(r.doc_id for r in docs.select("doc_id").collect())
