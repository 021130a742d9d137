"""End-to-end curation job (jobs/curate.py): the funnel must account
for every doc, drop what its stages say to drop, and write a
split-partitioned corpus."""

import os

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.jobs.curate import (
    curate,
    funnel_stats,
    run_curation,
)

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_accounts_for_every_doc(spark):
    ann = curate(spark, SF_DIR)
    stats = funnel_stats(ann).first()
    assert stats.n_docs == ann.count()
    assert 0 < stats.n_kept <= stats.n_docs
    # flags and the final keep agree row-by-row
    bad = ann.filter(
        (F.col("keep") == 1)
        & ((F.col("quality_ok") == 0) | (F.col("dedup_keep") == 0)
           | (F.col("contaminated") == 1)
           | (F.col("repetition_ok") == 0)
           | (F.col("span_dup") == 1)
           | (F.col("lm_ok") == 0))).count()
    assert bad == 0
    # exact dedup really keeps one doc per normalized content
    kept = ann.filter(F.col("keep") == 1)
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    from big_data_crypto_sentiment_spark.queries._util import table
    d = table(spark, SF_DIR, "documents").select("doc_id", norm.alias("c"))
    dup_groups = (kept.join(d, "doc_id").groupBy("c")
                  .agg(F.count("*").alias("n")).filter("n > 1").count())
    assert dup_groups == 0


def test_run_curation_writes_split_partitions(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = run_curation(spark, SF_DIR, out)
    assert stats["n_kept"] > 0
    parts = {p for p in os.listdir(out) if p.startswith("split=")}
    assert parts <= {"split=train", "split=val", "split=test"} and parts
    back = spark.read.parquet(out)
    assert back.count() == stats["n_kept"]
    # partition pruning works on the split column
    assert back.filter(F.col("split") == "train").count() < stats["n_kept"]


def test_lm_stage_drops_roughly_the_tail_decile(spark):
    """The perplexity stage must drop close to LM_DROP_FRAC of docs
    (approxQuantile tolerance + score ties make it approximate), and
    every dropped doc must score worse than every kept doc's threshold
    side."""
    from big_data_crypto_sentiment_spark.jobs.curate import (
        LM_DROP_FRAC,
        curate,
        funnel_stats,
    )
    ann = curate(spark, SF_DIR)
    stats = funnel_stats(ann).first()
    frac = stats.drop_lm / stats.n_docs
    assert 0.0 < frac <= LM_DROP_FRAC + 0.06


def test_span_dup_stage_drops_planted_boilerplate(spark, tmp_path):
    """A corpus where several docs are mostly one shared span must drop
    exactly those docs at the span stage. Runs curate() on a planted
    parquet dir shaped like the documents table."""
    from big_data_crypto_sentiment_spark.queries.dedup import SPAN_GRAM

    shared = " ".join(f"s{i}" for i in range(30))
    rows = []
    for i in range(3):  # mostly-duplicated docs (dup_frac ~ 1)
        rows.append((i, shared + f" u{i}", "en", "src0"))
    for i in range(3, 40):  # unique docs
        rows.append((i, " ".join(f"w{i}_{j}" for j in range(30)),
                     "en", "src0"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df = df.withColumn("n_chars", F.length("text"))
    sf_dir = str(tmp_path / "mini")
    for t in ("documents",):
        df.write.parquet(f"{sf_dir}/{t}.parquet")

    ann = curate(spark, sf_dir)
    dropped = {r.doc_id for r in
               ann.filter(F.col("span_dup") == 1).collect()}
    assert dropped == {0, 1, 2}
    assert SPAN_GRAM <= 30


def test_exact_dup_representative_survives_span_stage(spark, tmp_path):
    """Stage 2 keeps one representative of each exact-duplicate group;
    the span stage must NOT then flag that representative (it would see
    all its grams duplicated by its own dropped copies)."""
    text = " ".join(f"t{i}" for i in range(30))
    rows = ([(0, text, "en", "src0"), (1, text, "en", "src0")]  # exact dups
            + [(i, " ".join(f"q{i}_{j}" for j in range(30)), "en", "src0")
               for i in range(2, 40)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df = df.withColumn("n_chars", F.length("text"))
    sf_dir = str(tmp_path / "mini2")
    df.write.parquet(f"{sf_dir}/documents.parquet")

    ann = curate(spark, sf_dir)
    rep = ann.filter(F.col("doc_id") == 0).first()
    assert rep.dedup_keep == 1
    assert rep.span_dup == 0     # the r6 review finding: was 1
    # (other stages — quality/LM — may still drop word-soup docs; only
    # the dedup/span interplay is under test here)
    dropped_copy = ann.filter(F.col("doc_id") == 1).first()
    assert dropped_copy.dedup_keep == 0 and dropped_copy.keep == 0


def test_semantic_dedup_stage_flags_only_embedded_docs(spark):
    """Stage 5b: SemDeDup drops fire on the real fixture, every flagged
    doc actually carries an embedding, flagged docs are excluded from
    the final keep, and docs without embeddings always pass the stage."""
    from big_data_crypto_sentiment_spark.jobs.curate import curate
    from big_data_crypto_sentiment_spark.queries._util import table

    sf = "/root/testdata/sf0.001"
    ann = curate(spark, sf).persist()
    try:
        flagged = {r.doc_id for r in
                   ann.filter(F.col("semantic_dup") == 1).collect()}
        assert flagged  # the stage genuinely fires on the fixture
        embedded = {r.vec_id for r in
                    table(spark, sf, "embeddings")
                    .select("vec_id").collect()}
        assert flagged <= embedded
        assert ann.filter((F.col("semantic_dup") == 1)
                          & (F.col("keep") == 1)).count() == 0
        # embeddingless docs are never flagged (vacuous by flagged ⊆
        # embedded, asserted directly for the coalesce path)
        assert ann.filter(~F.col("doc_id").isin(*embedded)
                          & (F.col("semantic_dup") == 1)).count() == 0
    finally:
        ann.unpersist()
