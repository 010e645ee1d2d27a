"""Z-order (Morton) clustered layout: predicates on EITHER of the two
cluster columns localize to a subset of files — the multi-dimension
data-skipping property single-column range clustering cannot give
(its trailing column scatters across every file)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.bucketing import (
    write_clustered,
    write_zorder,
)


def _grid(spark, side=128):
    """side x side integer grid — uniform in both dimensions."""
    return spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def _files_touched(spark, path, cond):
    return (
        spark.read.parquet(path)
        .filter(cond)
        .select(F.input_file_name())
        .distinct()
        .count()
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "range_x")
    df = _grid(spark)
    write_zorder(df, zpath, "x", "y", n_files=16)
    write_clustered(df, rpath, ["x"], n_files=16)

    # a narrow band in x: both layouts prune
    x_band = (F.col("x") >= 8) & (F.col("x") < 16)
    assert _files_touched(spark, zpath, x_band) < 16
    assert _files_touched(spark, rpath, x_band) <= 2

    # a narrow band in y: z-order still prunes; the x-range layout
    # scatters y across every file
    y_band = (F.col("y") >= 8) & (F.col("y") < 16)
    assert _files_touched(spark, zpath, y_band) < 16
    assert _files_touched(spark, rpath, y_band) == 16

    # a point in (x, y): z-order localizes hard
    pt = (F.col("x") == 42) & (F.col("y") == 99)
    assert _files_touched(spark, zpath, pt) <= 2


def test_zorder_preserves_data(spark, tmp_path):
    zpath = str(tmp_path / "zorder_data")
    df = _grid(spark, side=64)
    write_zorder(df, zpath, "x", "y", n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert back.select(F.sum("payload")).collect()[0][0] == sum(range(64 * 64))
    assert set(back.columns) == {"x", "y", "payload"}


def test_zorder_null_values_kept_all_null_rejected(spark, tmp_path):
    import pytest

    # rows with NULL cluster values still land in the output (NULL
    # quantizes to the column min, never a NULL Morton code)
    df = _grid(spark, side=16).withColumn(
        "x", F.when(F.col("payload") % 7 == 0, None).otherwise(F.col("x"))
    )
    zpath = str(tmp_path / "zorder_nulls")
    write_zorder(df, zpath, "x", "y", n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == 16 * 16
    assert back.filter(F.col("x").isNull()).count() == df.filter(
        F.col("x").isNull()
    ).count()

    # an entirely-NULL cluster column is a clear error, not a TypeError
    all_null = _grid(spark, side=8).withColumn("x", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="entirely NULL"):
        write_zorder(all_null, str(tmp_path / "zorder_bad"), "x", "y", n_files=4)


def test_zorder_exported():
    from mlops_realtime_data_ingestion_spark.operators import bucketing

    assert "write_zorder" in bucketing.__all__
