"""Z-order (Morton-curve) layout for multi-column data skipping.

Min/max row-group statistics only prune scans when the file layout
clusters the filtered columns; sorting by ONE column destroys locality
in every other. Interleaving the bits of two rank-quantized columns
into a Morton key and range-partition-sorting by it gives BOTH columns
locality, so a conjunctive box predicate (price BETWEEN .. AND quantity
BETWEEN ..) prunes most files on parquet footer stats alone — the
Delta/Iceberg OPTIMIZE ZORDER discipline, built here from plain Spark
expressions (no UDFs, exact integer bit math).

Scale notes: the quantization stats are one tiny agg (broadcast back as
literals); the z-key is per-row JVM expression math; the only data
movement is the ONE range exchange any clustered rewrite needs.
repartitionByRange samples the key distribution, so files are
balanced even when the value distribution is skewed. At 100 TB this is
a per-partition maintenance rewrite (compact + cluster in one pass),
not a global job over the table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # 256 rank buckets per dimension — plenty for layout


def quantize(col: Column, mn: Column, mx: Column,
             bits: int = ZORDER_BITS) -> Column:
    """Clamp col into integer rank buckets [0, 2^bits) by min/max
    scaling — the same expression tree the histogram operator uses, so
    both engines agree bit-for-bit on the bucket. NULL values get an
    explicit bucket 0: without the branch, `least` would IGNORE the
    NULL raw term and silently return n-1, scattering NULL rows into
    the max-key region and stretching that file's min/max stats for
    the other column — the opposite of what clustering is for. (Bucket
    0 is safe: parquet min/max stats skip NULLs, so NULL rows never
    stretch this column's own file stats.)"""
    n = 1 << bits
    raw = F.floor((col - mn) / (mx - mn) * F.lit(n))
    return (F.when(col.isNull(), F.lit(0).cast("long"))
             .when(mx == mn, F.lit(0).cast("long"))
             .otherwise(F.least(F.lit(n - 1).cast("long"), raw)))


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low `bits` bits of two quantized integer columns
    into a Morton key (x gets the even positions). Pure JVM bit math —
    2·bits shift/and/or terms, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def sql_zorder_key(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """The identical interleave as ANSI/DuckDB SQL (oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


def write_zordered(df: DataFrame, cols: tuple[str, str], path: str,
                   n_files: int, bits: int = ZORDER_BITS) -> None:
    """Rewrite df as n_files parquet files clustered on the Morton key
    of the two columns. One stats agg + one range exchange."""
    cx, cy = cols
    stats = df.agg(F.min(cx).alias("xmn"), F.max(cx).alias("xmx"),
                   F.min(cy).alias("ymn"), F.max(cy).alias("ymx")).first()
    qx = quantize(F.col(cx), F.lit(stats.xmn), F.lit(stats.xmx), bits)
    qy = quantize(F.col(cy), F.lit(stats.ymn), F.lit(stats.ymx), bits)
    (df.withColumn("_zkey", zorder_key(qx, qy, bits))
       .repartitionByRange(n_files, "_zkey")
       .sortWithinPartitions("_zkey")
       .drop("_zkey")
       .write.mode("overwrite").parquet(path))


def file_stats_catalog(spark, path: str, cols: tuple[str, ...]):
    """Manifest of per-file (row_count, min, max per column) — the
    data-skipping index a reader consults before planning scans (the
    Delta/Iceberg manifest analog, built distributed from the hidden
    `_metadata.file_path` column rather than driver-side footer reads:
    one scan + one hash agg keyed by file, works at any file count)."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("row_count")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (df.select(F.col("_metadata.file_path").alias("file"), *cols)
              .groupBy("file").agg(*aggs))


def read_skipping(spark, path: str, box: dict,
                  catalog=None) -> tuple:
    """(DataFrame, n_files_read, n_files_total): scan ONLY the files
    whose min/max stats can match the conjunctive box predicate, then
    apply the residual row filter — the manifest-planned read every
    table format (Delta/Iceberg) performs, composed from plain Spark.

    The selected file list is a driver artifact, exactly as in those
    formats' planning step: the manifest is orders of magnitude smaller
    than the data, and after skipping the survivors are the files a
    single query actually touches. `catalog` (a file_stats_catalog
    frame, possibly persisted/stored) is rebuilt from footer stats when
    not supplied. Row-level residual filtering stays necessary —
    min/max skipping is file-granular, and the parquet reader still
    prunes row groups inside the survivors via PushedFilters."""
    from functools import reduce

    from pyspark.sql import functions as F
    if catalog is None:
        catalog = file_stats_catalog(spark, path, tuple(box))
    cond = reduce(lambda a, b: a & b,
                  [(F.col(f"{c}_min") <= hi) & (F.col(f"{c}_max") >= lo)
                   for c, (lo, hi) in box.items()])
    n_total = catalog.count()
    files = [r.file for r in catalog.filter(cond).select("file").collect()]
    row_filter = reduce(lambda a, b: a & b,
                        [(F.col(c) >= lo) & (F.col(c) <= hi)
                         for c, (lo, hi) in box.items()])
    if not files:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, n_total
    return (spark.read.parquet(*files).filter(row_filter),
            len(files), n_total)


def prunable_files(catalog, box: dict) -> tuple[int, int]:
    """(files that could match the conjunctive box, total files) from a
    file_stats_catalog frame — the skip decision itself, as one filter."""
    from functools import reduce

    from pyspark.sql import functions as F
    cond = reduce(lambda a, b: a & b,
                  [(F.col(f"{c}_min") <= hi) & (F.col(f"{c}_max") >= lo)
                   for c, (lo, hi) in box.items()])
    return catalog.filter(cond).count(), catalog.count()
