"""ANN (hyperplane-LSH) semantics vs the exact brute-force baseline.

The LSH paths use xxhash64-derived planes (not oracle-checkable); these
tests pin: (a) every ANN hit is a true cosine neighbor drawn from the
corpus with a correctly computed score, (b) recall@k against brute force
on the real sf0.001 embeddings clears a fixed bound (deterministic —
planes are hash-derived, data is seeded), (c) near-dup pair output is
symmetric-free and respects the threshold.
"""

import pytest
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.queries.similarity import (
    TOP_K,
    ann_topk,
    brute_force_topk,
    cosine,
    embedding_near_dup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    from big_data_crypto_sentiment_spark.queries._util import table
    return table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def queries(corpus):
    return (corpus.filter(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("embedding").alias("qe")))


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_ann_recall_vs_brute_force(corpus, queries):
    exact = _topk_sets(brute_force_topk(queries, corpus, TOP_K))
    approx = _topk_sets(ann_topk(queries, corpus, TOP_K))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.4  # deterministic given seed+planes


def test_ann_scores_match_exact_cosine(spark, corpus, queries):
    ann = ann_topk(queries, corpus, TOP_K)
    rejoined = (ann.join(corpus, "vec_id")
                   .join(queries, "query_id")
                   .select("query_id", "vec_id", "cos",
                           cosine(F.col("qe"), F.col("embedding"))
                           .alias("cos2")))
    assert rejoined.filter(F.col("cos") != F.col("cos2")).count() == 0


def test_near_dup_pairs_finds_planted_duplicates(spark, corpus):
    """Planted near-identical vectors must collide in ≥1 LSH table and
    survive the cosine threshold; unrelated vectors must be excluded."""
    import pyspark.sql.functions as SF
    base = corpus.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    perturbed = [float(x) * (1.0 + (0.001 if i % 2 else -0.001))
                 for i, x in enumerate(base)]
    extra = spark.createDataFrame(
        [(100001, [float(x) for x in base]), (100002, perturbed)],
        "vec_id long, embedding array<float>")
    both = corpus.select("vec_id", SF.col("embedding").cast("array<float>")
                         .alias("embedding")).unionByName(extra)
    rows = embedding_near_dup_pairs(both, 0.95).collect()
    got = {(r.vec_a, r.vec_b) for r in rows}
    assert (100001, 100002) in got
    # the planted pair's copies also match the original vec 0
    assert (0, 100001) in got
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.cos >= 0.95 for r in rows)


def test_ivf_recall_vs_brute_force(spark, corpus, queries):
    from big_data_crypto_sentiment_spark.queries.similarity import (
        fit_ivf_centroids,
        ivf_topk,
    )
    centroids = fit_ivf_centroids(corpus, k=8)
    exact = _topk_sets(brute_force_topk(queries, corpus, TOP_K))
    approx = _topk_sets(ivf_topk(queries, corpus, centroids, TOP_K,
                                 n_probe=4))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.4  # deterministic: seeded KMeans
    # probing half the clusters touches roughly half the corpus, not all
    assert all(len(v) <= TOP_K for v in approx.values())


def test_ivf_plan_has_no_array_carrying_shuffle(spark, corpus, queries):
    """The IVF candidate path must never shuffle embedding arrays: the
    corpus streams through one broadcast hash join, and the only
    Exchange left is the top-k window on (query_id, vec_id, cos)."""
    import io
    from contextlib import redirect_stdout

    from big_data_crypto_sentiment_spark.queries.similarity import (
        fit_ivf_centroids,
        ivf_topk,
    )
    centroids = fit_ivf_centroids(corpus, k=8)
    df = ivf_topk(queries, corpus, centroids, TOP_K, n_probe=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # formatted plan: node header "(N) Exchange", then an "Input [..]"
    # line listing the columns that cross the wire
    blocks = plan.split("\n\n")
    for block in blocks:
        if "Exchange" in block and "Broadcast" not in block:
            assert "embedding" not in block and "qe#" not in block, block


def test_brute_force_excludes_self_and_ranks_densely(corpus, queries):
    df = brute_force_topk(queries, corpus, TOP_K)
    assert df.filter(F.col("query_id") == F.col("vec_id")).count() == 0
    ranks = [r.rank for r in df.filter(F.col("query_id") == 0)
             .orderBy("rank").collect()]
    assert ranks == list(range(1, len(ranks) + 1))


def test_quantization_reconstruction_error_bound(spark):
    from big_data_crypto_sentiment_spark.queries.similarity import (
        q_embed_quantize,
    )
    from big_data_crypto_sentiment_spark.queries._util import table

    sf = "/root/testdata/sf0.001"
    orig = {r.vec_id: r.embedding
            for r in table(spark, sf, "embeddings").collect()}
    for r in q_embed_quantize(spark, sf).collect():
        q = [int(v) for v in r.q_int8.split(",")]
        x = [float(v) for v in orig[r.vec_id]]
        assert all(-127 <= v <= 127 for v in q)
        assert max(abs(v) for v in q) == 127  # scale saturates the grid
        step = max(abs(v) for v in x) / 127.0
        for qi, xi in zip(q, x):
            assert abs(qi * step - xi) <= step / 2 + 1e-9


def test_quantized_corpus_preserves_topk_recall(spark):
    """Search over DEQUANTIZED int8 vectors must agree with the float
    corpus — the usability claim behind embed_quantize."""
    from pyspark.sql import functions as F

    from big_data_crypto_sentiment_spark.queries._util import table
    from big_data_crypto_sentiment_spark.queries.similarity import (
        TOP_K,
        brute_force_topk,
    )

    sf = "/root/testdata/sf0.001"
    e = table(spark, sf, "embeddings").select("vec_id", "embedding")
    queries = (e.filter(F.col("vec_id") < 5)
                .select(F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("qe")))
    # quantize + dequantize in-plan (scale = 127/max|x|)
    s = 127.0 / F.array_max(F.transform("embedding", F.abs))
    deq = (e.withColumn("_s", s)
             .select("vec_id", F.transform(
                 "embedding",
                 lambda x: F.round(x.cast("double") * F.col("_s"), 0)
                 / F.col("_s")).alias("embedding")))
    exact = _topk_sets(brute_force_topk(queries, e, TOP_K))
    quant = _topk_sets(brute_force_topk(queries, deq, TOP_K))
    recalls = [len(exact[q] & quant[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9


def test_embed_pca_recovers_planted_direction_and_orders_variance(spark):
    """PCA contract on synthetic data: a strongly dominant planted
    direction must be the first component's span (|cos| > 0.99 — sign is
    platform-dependent), explained variance must be non-increasing, and
    the registered projection must have k-dim rows for every vector."""
    import numpy as np

    from big_data_crypto_sentiment_spark.queries.similarity import (
        PCA_K,
        embed_pca,
        q_embed_pca,
    )

    rng = np.random.default_rng(42)
    d = 16
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    rows = []
    for i in range(300):
        v = (rng.normal() * 5.0) * direction + rng.normal(size=d) * 0.1
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model, proj, ev = embed_pca(df, k=4)
    pc1 = np.array(model.pc.toArray())[:, 0]
    assert abs(float(np.dot(pc1, direction))) > 0.99
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert ev[0] > 0.9  # the planted direction dominates

    out = q_embed_pca(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").count()
    assert len(rows) == n_emb
    assert all(len(r.pca_csv.split(",")) == PCA_K for r in rows)


def test_prototype_scores_rank_centroid_first(spark):
    """The vector pointing along its class's mean direction must get
    proto_rank 1; an off-axis outlier must rank last."""
    from big_data_crypto_sentiment_spark.queries.similarity import (
        prototype_scores,
    )
    rows = [
        # label 0: three near-axis vectors + one outlier
        (1, 0, [1.0, 0.02, 0.0, 0.0]),
        (2, 0, [1.0, -0.02, 0.0, 0.0]),
        (3, 0, [1.0, 0.0, 0.02, 0.0]),
        (4, 0, [0.0, 0.0, 0.0, 1.0]),     # outlier
        # label 1: orthogonal class
        (5, 1, [0.0, 1.0, 0.0, 0.0]),
        (6, 1, [0.02, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = {r.vec_id: r for r in prototype_scores(df).collect()}
    assert len(got) == 6
    l0 = sorted((r for r in got.values() if r.label == 0),
                key=lambda r: r.proto_rank)
    assert l0[-1].vec_id == 4                  # outlier ranks last
    assert l0[-1].cos_to_proto < 0.5
    assert all(r.cos_to_proto > 0.9 for r in l0[:3])
    assert {r.proto_rank for r in l0} == {1, 2, 3, 4}


def test_semdedup_drops_planted_semantic_dup_via_kmeans(spark, corpus):
    """SemDeDup over KMeans/IVF centroids (the freeze_kmeans_centroids
    front-end): a planted near-copy of vec 0 lands in vec 0's cluster
    and exactly the more-prototypical member of each duplicate pair is
    dropped; the untouched remainder of the corpus keeps its rows."""
    from big_data_crypto_sentiment_spark.queries.similarity import (
        semdedup_kmeans,
    )
    base = corpus.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    copy = [float(x) * (1.0 + (0.001 if i % 2 else -0.001))
            for i, x in enumerate(base)]
    both = (corpus.select("vec_id", F.col("embedding").cast("array<float>")
                          .alias("embedding"))
                  .unionByName(spark.createDataFrame(
                      [(100001, copy)],
                      "vec_id long, embedding array<float>")))
    out = semdedup_kmeans(spark, both, k=8, seed=7, threshold=0.95)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == corpus.count() + 1     # one verdict per vector
    # same cluster, and exactly one of the planted pair survives
    assert rows[0].cid == rows[100001].cid
    assert rows[0].is_kept != rows[100001].is_kept
    kept, gone = ((0, 100001) if rows[0].is_kept else (100001, 0))
    # keep-low-centroid-similarity: the dropped one is MORE prototypical
    assert rows[gone].cos_to_centroid >= rows[kept].cos_to_centroid
    # at 0.95 nothing else in the fixture is a semantic dup (max cos
    # 0.60 brute-force-verified in VERDICT r6): all other rows kept
    others = [r for v, r in rows.items() if v not in (0, 100001)]
    assert all(r.is_kept for r in others)


def test_lsh_projection_sign_margin_guards_oracle_parity():
    """sim_ann_lsh's DuckDB twin re-derives the bucket bits with a
    DIFFERENT summation order (sequential list_sum vs numpy's pairwise
    matmul), so cross-engine bucket agreement rests on no projection
    sitting within float-error of zero. Pin the margin: worst-case
    order deviation is ~1e-13 for 64-dim O(1) data; demand 1e-9 so a
    regenerated fixture that ever lands near zero fails HERE instead of
    silently flipping a bucket in the driver's hash compare."""
    import duckdb
    import numpy as np

    from big_data_crypto_sentiment_spark.queries.similarity import (
        BITS_PER_TABLE,
        EMBED_DIM,
        N_TABLES,
        _weight_matrix,
    )
    from big_data_crypto_sentiment_spark.queries.similarity import (
        NEAR_DUP_BITS,
    )
    # both plane sets ride DuckDB twins now: (t, p<4) for sim_ann_lsh,
    # (t, p<8) for sim_near_dup_pairs — pin the wider set (a superset)
    W = _weight_matrix(N_TABLES, max(BITS_PER_TABLE, NEAR_DUP_BITS),
                       EMBED_DIM)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        X = np.array(con.execute(
            f"SELECT embedding FROM read_parquet("
            f"'/root/testdata/{sf}/embeddings.parquet') ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(), dtype=np.float64)
        margin = float(np.abs(X @ W).min())
        assert margin > 1e-9, (sf, margin)
