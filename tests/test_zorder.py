"""Z-order layout: Morton-key correctness against a Python reference,
and the actual data-skipping payoff — a conjunctive box predicate must
prune most files of a z-ordered rewrite on parquet footer stats while
pruning nothing of a hash layout. (Exact cross-engine key parity is
covered by the zorder_key_lineitem oracle pair.)"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.operators.zorder import (
    write_zordered,
    zorder_key,
)


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z
           for r in df.select("x", "y",
                              zorder_key(F.col("x"), F.col("y")).alias("z"))
                      .collect()}
    assert got == {(x, y): _morton(x, y) for x, y in rows}


def _overlapping_files(path: str, col_idx: dict, box: dict) -> int:
    n = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        hit = True
        for col, (lo, hi) in box.items():
            cmins, cmaxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx[col]).statistics
                cmins.append(st.min)
                cmaxs.append(st.max)
            if min(cmins) > hi or max(cmaxs) < lo:
                hit = False
                break
        n += hit
    return n


def test_zordered_layout_prunes_box_predicates(spark, tmp_path):
    # two uniform dimensions; a 10% x 10% box predicate
    df = spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") * 37) % 100).cast("double").alias("y"))
    zpath, hpath = str(tmp_path / "z"), str(tmp_path / "h")
    write_zordered(df, ("x", "y"), zpath, n_files=16)
    df.repartition(16).write.parquet(hpath)

    # layouts are loss-free
    assert spark.read.parquet(zpath).count() == 10_000

    idx = {"x": 0, "y": 1}
    box = {"x": (10.0, 19.0), "y": (50.0, 59.0)}
    z_hit = _overlapping_files(zpath, idx, box)
    h_hit = _overlapping_files(hpath, idx, box)
    # hash layout: every file spans the full range -> nothing prunes;
    # z-order: the box lives in ~one quadrant-cell -> most files prune
    assert h_hit >= 14
    assert z_hit <= 5


def test_file_stats_catalog_drives_pruning(spark, tmp_path):
    from big_data_crypto_sentiment_spark.operators.zorder import (
        file_stats_catalog,
        prunable_files,
    )
    df = spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") * 37) % 100).cast("double").alias("y"))
    zpath = str(tmp_path / "zc")
    write_zordered(df, ("x", "y"), zpath, n_files=16)
    cat = file_stats_catalog(spark, zpath, ("x", "y"))
    assert cat.count() == 16
    assert cat.agg(F.sum("row_count")).first()[0] == 10_000
    hit, total = prunable_files(cat, {"x": (10.0, 19.0),
                                      "y": (50.0, 59.0)})
    assert total == 16 and hit <= 5


def test_quantize_nulls_get_bucket_zero(spark):
    """NULL clustering values must not land in the top bucket (least()
    ignores NULL args and would return n-1): they quantize to an
    explicit bucket 0, and write_zordered clusters them at the low end
    of the key range instead of stretching the max-key file's stats."""
    from big_data_crypto_sentiment_spark.operators.zorder import quantize

    df = spark.createDataFrame(
        [(0, None), (1, 0.0), (2, 50.0), (3, 100.0), (4, None)],
        "id long, v double")
    q = df.select("id", quantize(F.col("v"), F.lit(0.0),
                                 F.lit(100.0)).alias("b"))
    got = {r.id: r.b for r in q.collect()}
    assert got[0] == 0 and got[4] == 0          # NULLs -> bucket 0
    assert got[1] == 0 and got[3] == 255        # clamped extremes
    assert 0 < got[2] < 255


def test_read_skipping_prunes_files_and_matches_full_scan(spark, tmp_path):
    """The manifest-planned read: over a z-ordered layout, a box query
    reads a fraction of the files yet returns row-identical results to
    the naive full-scan + filter; a box outside the data reads zero
    files and returns an empty frame with the right schema."""
    from big_data_crypto_sentiment_spark.operators.zorder import (
        read_skipping,
        write_zordered,
    )
    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") * 37) % 100).cast("double").alias("y"))
    zpath = str(tmp_path / "zr")
    write_zordered(df, ("x", "y"), zpath, n_files=16)
    box = {"x": (10.0, 19.0), "y": (50.0, 59.0)}
    got, n_read, n_total = read_skipping(spark, zpath, box)
    assert n_total == 16 and 0 < n_read <= 5  # real skipping happened
    want = (spark.read.parquet(zpath)
            .filter((F.col("x") >= 10.0) & (F.col("x") <= 19.0)
                    & (F.col("y") >= 50.0) & (F.col("y") <= 59.0)))
    assert sorted(r.id for r in got.collect()) \
        == sorted(r.id for r in want.collect())
    assert want.count() > 0  # the box is non-trivial
    # a box entirely outside the data: zero files, empty typed frame
    out, n0, _ = read_skipping(spark, zpath, {"x": (500.0, 600.0),
                                              "y": (500.0, 600.0)})
    assert n0 == 0 and out.count() == 0
    assert set(out.columns) == {"id", "x", "y"}
