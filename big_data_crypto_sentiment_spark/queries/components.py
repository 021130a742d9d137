"""Connected-components dedup clustering — pairs → clusters → canonical.

The missing last step of a corpus-dedup pipeline: near-dup detection
(n-gram Jaccard / MinHash-LSH, queries/dedup.py) emits PAIRS, but a
training-data pipeline needs CLUSTERS — transitive closure over the
pair graph — so each duplicate group keeps exactly one canonical
document. (Closest reference analog: the EDA duplicate-rate check at
eda/Data_Minions_EDA_Milestone4.ipynb cell 9 stops at counting; this
completes the keep/drop decision.)

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round a node takes the min of its own label and
its neighbors' labels; at fixpoint every node carries the min doc_id of
its component. Rounds needed = max component diameter — tiny for
near-dup graphs, whose components are quasi-cliques (docs similar to a
common ancestor are similar to each other). For adversarial long-chain
graphs the public large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) contracts the
same propagation to O(log n) rounds; the per-round join/agg shape below
is identical, so it slots in without changing callers.

Scale notes:
  * Per round: one shuffled hash join (labels into edges, keyed by node
    id) + one partial-agg groupBy min — both keyed shuffles bounded by
    |E|, never materializing components or collecting to the driver.
  * Lineage is truncated every round with localCheckpoint, or the plan
    would grow linearly with rounds and re-execute from the scan on
    every action. (On a real cluster prefer reliable checkpoint() to a
    checkpoint dir — localCheckpoint state dies with a lost executor.)
  * Convergence is detected from sum(label), a monotonically decreasing
    scalar — one lightweight agg per round, no label-diff join.
  * The edge list is persisted once; it is the iteration's only reused
    input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import table
from .dedup import (
    PAIR_SLICE_SOURCE,
    SHINGLE_WORDS,
    SLICE_JACCARD_THRESHOLD,
    _jaccard_pairs,
    _words,
)


def connected_components(edges: DataFrame, nodes: DataFrame,
                         max_iter: int = 30) -> DataFrame:
    """(node, component) for every node, component = min node id reachable.

    edges: two-column DataFrame of undirected pairs (any column names);
    nodes: one-column DataFrame of node ids (defines singletons too).
    """
    a, b = edges.columns[0], edges.columns[1]
    sym = (edges.select(F.col(a).alias("node"), F.col(b).alias("nbr"))
                .union(edges.select(F.col(b).alias("node"),
                                    F.col(a).alias("nbr")))
                .persist())
    labels = (nodes.select(F.col(nodes.columns[0]).alias("node"))
                   .withColumn("label", F.col("node"))
                   .localCheckpoint())
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        cand = (sym.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                   .groupBy("node")
                   .agg(F.min("label").alias("cand")))
        labels = (labels.join(cand, "node", "left")
                        .select("node",
                                F.least("label", F.coalesce("cand", "label"))
                                 .alias("label"))
                        .localCheckpoint())
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def dedup_components(docs: DataFrame, threshold: float) -> DataFrame:
    """Cluster the near-dup pair graph of `docs`; one row per doc with its
    component id, canonical flag (keep min doc_id per cluster — the
    standard deterministic tie-break), and cluster size."""
    eligible = (docs.filter(F.size(_words()) >= SHINGLE_WORDS)
                    .select("doc_id"))
    pairs = _jaccard_pairs(docs, threshold).select("doc_a", "doc_b")
    cc = connected_components(pairs, eligible)
    sizes = cc.groupBy("component").agg(F.count("*").alias("component_size"))
    return (cc.join(sizes, "component")
              .select(F.col("node").alias("doc_id"),
                      "component",
                      (F.col("node") == F.col("component"))
                      .cast("int").alias("is_canonical"),
                      "component_size")
              .orderBy("doc_id"))  # bounded: one row per slice doc


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (table(spark, sf_dir, "documents")
         .filter(F.col("source") == PAIR_SLICE_SOURCE))
    return dedup_components(d, SLICE_JACCARD_THRESHOLD)


QUERIES = {
    "dedup_components": q_dedup_components,
}

# The pair CTE is the dedup_ngram_jaccard oracle verbatim (same slice,
# same threshold); the recursive walk computes min-reachable-label —
# exactly the propagation fixpoint.
ORACLE = {
    "dedup_components": f"""
WITH RECURSIVE nodes AS (
  SELECT doc_id FROM documents
  WHERE source = '{PAIR_SLICE_SOURCE}'
    AND len(string_split(text, ' ')) >= {SHINGLE_WORDS}
), pdocs AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents
  WHERE source = '{PAIR_SLICE_SOURCE}' AND len(string_split(text, ' ')) >= {SHINGLE_WORDS}
), sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM pdocs, unnest(generate_series(1, len(words) - {SHINGLE_WORDS - 1})) AS t(i)
), psizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), ppairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM ppairs
  JOIN psizes sa ON doc_a = sa.doc_id
  JOIN psizes sb ON doc_b = sb.doc_id
  WHERE common / (sa.n + sb.n - common) >= {SLICE_JACCARD_THRESHOLD}
), edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), walk(node, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.d, w.label FROM walk w JOIN edges e ON w.node = e.s
), cc AS (
  SELECT node AS doc_id, MIN(label) AS component FROM walk GROUP BY node
)
SELECT doc_id, component,
       CAST(doc_id = component AS INT) AS is_canonical,
       COUNT(*) OVER (PARTITION BY component) AS component_size
FROM cc ORDER BY doc_id
""",
}
