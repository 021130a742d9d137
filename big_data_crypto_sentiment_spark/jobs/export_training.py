"""Training-data export — the pipeline's last mile: curated survivors
→ deterministic global shuffle → sharded JSONL training files.

Completes the curation story (jobs/curate.py writes kept ids per
split): pretraining consumes the TRAIN split as sharded files in
pseudo-random order, and this job produces exactly that layout with
no global sort and full reproducibility:

  1. survivors: id equi-join of the curated train split against the
     documents table (ids only move through the join).
  2. shuffle_shards (queries/sampling.py): every doc gets a
     (shard, position) from the portable 60-bit hash — the shuffled
     order is a pure function of doc_id, so re-runs and engine moves
     reproduce byte-identical shards.
  3. layout: repartition BY SHARD (each shard lives wholly in one
     task), sort within partitions by (shard, position), write JSONL
     partitioned by shard — one ordered file per shard, rows in
     shuffle order. At 100 TB, n_shards is sized so a shard fits an
     executor; no stage ever holds a global order.

Run: python -m big_data_crypto_sentiment_spark.jobs.export_training \
       --sf-dir /root/testdata/sf0.001 --curated-dir /tmp/curated \
       --out-dir /tmp/shards [--n-shards 8]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.sampling import shuffle_shards


def export_training(spark: SparkSession, sf_dir: str, curated_dir: str,
                    out_dir: str, n_shards: int = 8) -> int:
    """Write the curated train split as n_shards ordered JSONL shards;
    returns the number of exported documents."""
    from ..catalog import load
    kept = (spark.read.parquet(curated_dir)
                 .filter(F.col("split") == "train")
                 .select("doc_id"))
    docs = load(spark, "documents", sf_dir) \
        .join(kept, "doc_id").select("doc_id", "source", "text")
    order = shuffle_shards(docs.select("doc_id"), "doc_id", n_shards)
    out = (docs.join(order, "doc_id")
               .repartition(n_shards, "shard")
               .sortWithinPartitions("shard", "position")
               .select("shard", "position", "doc_id", "source", "text"))
    out.write.mode("overwrite").partitionBy("shard").json(out_dir)
    return spark.read.json(out_dir).count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--curated-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--n-shards", type=int, default=8)
    args = ap.parse_args()
    from ..session import get_spark
    spark = get_spark("export-training")
    n = export_training(spark, args.sf_dir, args.curated_dir,
                        args.out_dir, args.n_shards)
    print(f"exported {n} docs to {args.out_dir}")


if __name__ == "__main__":
    main()
