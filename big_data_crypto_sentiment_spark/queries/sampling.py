"""Deterministic sampling & splitting — training-data pipeline operators.

A 100 TB corpus pipeline samples constantly (dev subsets, ablations,
eval holdouts, mixture weighting), and `rand()`-based sampling is
useless there: not reproducible across retries, not stable as the
corpus grows, not joinable across tables. The standard fix is
HASH-based sampling — a row is in the sample iff a hash of its stable
key falls under a threshold. Every operator here is a pure per-row
filter or a bounded per-stratum selection:

  * sample_hash          — fixed-rate Bernoulli sample, zero shuffle,
                           embarrassingly parallel, stable under
                           corpus growth (a sampled row stays sampled).
  * sample_stratified    — exact top-K per stratum by hash order (the
                           deterministic analog of per-class quota
                           sampling). One window sort PER STRATUM —
                           fine for bounded strata (sources, langs);
                           for unbounded strata at scale, switch to
                           the two-pass rate form: per-stratum rate =
                           quota / count (broadcast), then the same
                           hash filter as sample_hash.
  * split_train_val_test — hash-bucket split (80/10/10): leakage-free
                           (a doc's split never depends on other rows)
                           and identical on every engine computing md5.
                           Registered merged with sample_hash as ONE
                           scan (sample_and_split).
  * mixture_downsample   — per-source caps rebalancing the corpus mix
                           via broadcast integer thresholds.

The hash primitive is the repo's portable 60-bit md5 prefix (same
construction as queries/dedup.py minhash): exact in BIGINT on both
Spark and DuckDB, so every query is value-hash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import table

SAMPLE_MOD = 1_000_000
SAMPLE_RATE_PPM = 200_000      # 20% dev-subset sample
STRATUM_QUOTA = 5              # docs kept per source
SPLIT_BUCKETS = (80, 90)       # <80 train, <90 val, else test


def _hash_bucket(col, mod: int):
    """Portable uniform bucket in [0, mod): 60-bit md5 prefix of the
    stringified key, mod'd. Exact integer math on both engines."""
    hx = F.md5(col.cast("string"))
    return F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % mod


def _sql_hash_bucket(expr: str, mod: int) -> str:
    from .dedup import _sql_hex2int
    hx = f"substring(md5(CAST(({expr}) AS VARCHAR)), 1, 15)"
    return f"({_sql_hex2int(hx)} % {mod})"


def sample_hash(df: DataFrame, key: str, rate_ppm: int,
                mod: int = SAMPLE_MOD) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes under
    rate_ppm/mod. Pure map-side filter — no shuffle, no state."""
    return df.filter(_hash_bucket(F.col(key), mod) < rate_ppm)


def sample_stratified(df: DataFrame, stratum: str, key: str,
                      quota: int) -> DataFrame:
    """Exact quota per stratum, deterministically: rank rows inside each
    stratum by (hash, key) — the key tiebreak makes rank total — and
    keep the first `quota`. Adds `sample_rank` (1-based)."""
    hb = _hash_bucket(F.col(key), SAMPLE_MOD).alias("hb")
    w = Window.partitionBy(stratum).orderBy("hb", key)
    return (df.select("*", hb)
              .withColumn("sample_rank", F.row_number().over(w))
              .filter(F.col("sample_rank") <= quota)
              .drop("hb"))


def split_train_val_test(df: DataFrame, key: str,
                         buckets: tuple[int, int] = SPLIT_BUCKETS) -> DataFrame:
    """Adds a `split` column from a 100-way hash bucket of the key."""
    b = _hash_bucket(F.col(key), 100)
    return df.withColumn(
        "split",
        F.when(b < buckets[0], F.lit("train"))
         .when(b < buckets[1], F.lit("val"))
         .otherwise(F.lit("test")))


def mixture_downsample(df: DataFrame, stratum: str, key: str,
                       mod: int = SAMPLE_MOD) -> DataFrame:
    """Rebalance a skewed source mixture by capping every stratum at an
    expected total//(2·n_strata) rows — the corpus-mixing step of a
    training pipeline (downweight over-represented sources), made
    engine-exact by keeping ALL threshold math in integers:
    thr_s = min(mod, cap·mod // n_s), keep iff hash(key) < thr_s.

    Plan shape at scale: one partial-agg count per stratum, a two-row
    reduce, a BROADCAST join of (stratum → thr) back onto the corpus,
    then a pure map-side hash filter — the corpus itself never
    shuffles."""
    counts = df.groupBy(stratum).agg(F.count("*").alias("n_s"))
    stats = counts.agg(F.sum("n_s").alias("total"),
                       F.count("*").alias("n_strata"))
    caps = (counts.crossJoin(F.broadcast(stats))
                  .select(stratum,
                          F.least(
                              F.lit(mod).cast("long"),
                              F.expr(f"(total DIV (2 * n_strata)) * {mod} "
                                     "DIV n_s")).alias("thr")))
    return (df.join(F.broadcast(caps), stratum)
              .filter(_hash_bucket(F.col(key), mod) < F.col("thr"))
              .drop("thr"))


def q_sample_and_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli membership + 80/10/10 split in ONE corpus scan (each is
    a pure per-row hash; computing them in two passes would double-read
    the table for no reason). O(input) output, unsorted."""
    d = table(spark, sf_dir, "documents")
    in_sample = (_hash_bucket(F.col("doc_id"), SAMPLE_MOD)
                 < SAMPLE_RATE_PPM).cast("int")
    return (split_train_val_test(d, "doc_id")
            .select("doc_id", "lang", "source", "n_chars",
                    in_sample.alias("in_sample"), "split"))


# --- weighted sampling: keep probability scales with doc length.
#     The "upweight long documents" curation knob, kept engine-exact by
#     pure INTEGER math: tier = min(n_chars DIV 150, 3); keep iff
#     hash(doc_id) < BASE_PPM·(tier+1). Same zero-shuffle map-side
#     filter as sample_hash — the weight only changes the threshold. ---
WEIGHT_BASE_PPM = 100_000  # tier 0 keeps 10%, tier 3 keeps 40%
WEIGHT_TIER_CHARS = 150
WEIGHT_MAX_TIER = 3


def q_sample_length_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tier = F.least(F.floor(F.col("n_chars") / WEIGHT_TIER_CHARS),
                   F.lit(WEIGHT_MAX_TIER))
    thr = (WEIGHT_BASE_PPM * (tier + 1)).cast("long")
    return (d.select("doc_id", "lang", "source", "n_chars",
                     tier.cast("int").alias("tier"))
             .filter(_hash_bucket(F.col("doc_id"), SAMPLE_MOD) < thr)
    )  # O(sample): unsorted


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (sample_stratified(d, "source", "doc_id", STRATUM_QUOTA)
            .select("source", "sample_rank", "doc_id", "lang")
            .orderBy("source", "sample_rank"))  # bounded: quota × strata


def q_mixture_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (mixture_downsample(d, "source", "doc_id")
            .select("doc_id", "source", "lang"))  # O(sample): unsorted


QUERIES = {
    "sample_and_split": q_sample_and_split,
    "sample_stratified": q_sample_stratified,
    "sample_length_weighted": q_sample_length_weighted,
    "mixture_downsample": q_mixture_downsample,
}

_HB_DOC = _sql_hash_bucket("doc_id", SAMPLE_MOD)
_HB_100 = _sql_hash_bucket("doc_id", 100)

ORACLE = {
    "sample_and_split": f"""
SELECT doc_id, lang, source, n_chars,
       CAST({_HB_DOC} < {SAMPLE_RATE_PPM} AS INT) AS in_sample,
       CASE WHEN {_HB_100} < {SPLIT_BUCKETS[0]} THEN 'train'
            WHEN {_HB_100} < {SPLIT_BUCKETS[1]} THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    "sample_length_weighted": f"""
SELECT doc_id, lang, source, n_chars,
       CAST(LEAST(n_chars // {WEIGHT_TIER_CHARS}, {WEIGHT_MAX_TIER})
            AS INT) AS tier
FROM documents
WHERE {_HB_DOC} < {WEIGHT_BASE_PPM}
      * (LEAST(n_chars // {WEIGHT_TIER_CHARS}, {WEIGHT_MAX_TIER}) + 1)
""",
    "sample_stratified": f"""
SELECT source, sample_rank, doc_id, lang FROM (
  SELECT source, doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_HB_DOC}, doc_id) AS sample_rank
  FROM documents
) WHERE sample_rank <= {STRATUM_QUOTA}
ORDER BY source, sample_rank
""",
    "mixture_downsample": f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1
), stats AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS total, COUNT(*) AS n_strata FROM counts
), caps AS (
  SELECT source,
         LEAST({SAMPLE_MOD}, (total // (2 * n_strata)) * {SAMPLE_MOD} // n_s)
           AS thr
  FROM counts, stats
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN caps USING (source)
WHERE {_HB_DOC} < thr
""",
}
