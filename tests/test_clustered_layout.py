"""Range-clustered layout: point/range predicates localize to one
file in N — the data-skipping property that makes selective queries
cheap at 100 TB (row-group stats prune what the layout localizes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.bucketing import write_clustered


def _events(spark, n=20000, users=100):
    return spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") * 7 % 1000).alias("amount"),
    )


def test_point_predicate_localizes_to_one_file(spark, tmp_path):
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    df = _events(spark)
    write_clustered(df, clustered, ["user_id"], n_files=8)
    # control: same data, hash-scattered across the same file count
    df.repartition(8).write.mode("overwrite").parquet(scattered)

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(F.col("user_id") == 42)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    assert files_touched(clustered) == 1
    assert files_touched(scattered) == 8  # every file holds every user

    # correctness unchanged by layout
    got = (
        spark.read.parquet(clustered)
        .filter(F.col("user_id") == 42)
        .count()
    )
    assert got == df.filter(F.col("user_id") == 42).count()


def test_range_predicate_prunes_and_pushes_down(spark, tmp_path):
    path = str(tmp_path / "clustered_range")
    write_clustered(_events(spark), path, ["user_id"], n_files=8)

    q = spark.read.parquet(path).filter(
        (F.col("user_id") >= 10) & (F.col("user_id") < 20)
    )
    # a 10% key range touches a small fraction of the 8 range files
    touched = q.select(F.input_file_name()).distinct().count()
    assert touched <= 2

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan
