"""Surgical delete: only files containing target keys are rewritten;
every other file stays byte-identical (copy-on-write at file
granularity, the lakehouse delete shape)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.maintenance import targeted_delete


def _write_dataset(spark, path, n=1000, files=4):
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
        .repartitionByRange(files, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    return sorted(glob.glob(os.path.join(path, "part-*.parquet")))


def _bytes(files):
    return {f: open(f, "rb").read() for f in files}


def test_targeted_delete_rewrites_only_affected_files(spark, tmp_path):
    path = str(tmp_path / "corpus")
    files = _write_dataset(spark, path)
    assert len(files) == 4
    before = _bytes(files)

    # both targets land in the same range file => exactly 1 rewrite
    hit = targeted_delete(spark, path, ids=[5, 7])
    assert len(hit) == 1

    after = _bytes(sorted(glob.glob(os.path.join(path, "part-*.parquet"))))
    untouched = [f for f in files if f not in hit]
    for f in untouched:
        assert after[f] == before[f]  # byte-identical, not rewritten

    remaining = spark.read.parquet(path)
    assert remaining.count() == 998
    assert remaining.filter(F.col("doc_id").isin([5, 7])).count() == 0
    # survivors in the rewritten file are intact
    assert remaining.filter(F.col("doc_id") < 10).count() == 8


def test_targeted_delete_across_files_and_idempotent(spark, tmp_path):
    path = str(tmp_path / "corpus2")
    files = _write_dataset(spark, path)
    # ids chosen from different range buckets => multiple files rewritten
    hit = targeted_delete(spark, path, ids=[1, 999])
    assert len(hit) == 2
    assert spark.read.parquet(path).count() == 998

    # idempotent: re-deleting the same keys touches nothing
    hit2 = targeted_delete(spark, path, ids=[1, 999])
    assert hit2 == []
    assert spark.read.parquet(path).count() == 998


def _count_delete_jobs(spark, path, ids, group):
    sc = spark.sparkContext
    sc.setJobGroup(group, "count jobs")
    try:
        hit = targeted_delete(spark, path, ids=ids)
    finally:
        sc.setJobGroup(None, None)
    return hit, len(sc.statusTracker().getJobIdsForGroup(group))


def test_targeted_delete_is_one_distributed_rewrite(spark, tmp_path):
    """Spark-job count must be constant in the number of hit files
    (discovery + one partitioned rewrite), not 2 jobs per file as a
    driver-side loop would cost."""
    small = str(tmp_path / "corpus_small")
    _write_dataset(spark, small, n=1000, files=2)
    hit_s, jobs_small = _count_delete_jobs(
        spark, small, ids=[0, 999], group="td-small"
    )
    assert len(hit_s) == 2

    big = str(tmp_path / "corpus_big")
    files = _write_dataset(spark, big, n=1200, files=6)
    hit_b, jobs_big = _count_delete_jobs(
        spark, big, ids=[0, 220, 420, 620, 820, 1199], group="td-big"
    )
    assert sorted(hit_b) == files
    # 3x the hit files must not cost more jobs (1 slack for AQE noise)
    assert jobs_big <= jobs_small + 1, (jobs_small, jobs_big)
    assert spark.read.parquet(big).count() == 1194


def test_targeted_delete_hive_partitioned_basename_collision(spark, tmp_path):
    """Hive-partitioned layout: one write task emits identically-named
    part files into every partition directory, so file basenames are
    NOT unique. The rewrite must key on the full path — a basename key
    would merge two files' survivors into one partition dir (silently
    changing partition-column values on read)."""
    path = str(tmp_path / "corpus_hive")
    (
        spark.range(1000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("int").alias("src"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
        .repartition(1)  # 1 task -> same basename in both partition dirs
        .write.partitionBy("src")
        .mode("overwrite")
        .parquet(path)
    )
    basenames = {
        os.path.basename(f)
        for f in glob.glob(os.path.join(path, "src=*", "part-*.parquet"))
    }
    assert len(basenames) == 1  # the collision precondition is real

    # one target in each partition => both same-basename files rewritten
    hit = targeted_delete(spark, path, ids=[4, 7])
    assert len(hit) == 2

    remaining = spark.read.parquet(path)
    assert remaining.count() == 998
    assert remaining.filter(F.col("doc_id").isin([4, 7])).count() == 0
    # partition-column values survived: no rows migrated between dirs
    assert remaining.filter(F.col("src") != (F.col("doc_id") % 2)).count() == 0
    assert remaining.filter(F.col("src") == 0).count() == 499
    assert remaining.filter(F.col("src") == 1).count() == 499


def test_targeted_delete_removes_fully_deleted_file(spark, tmp_path):
    path = str(tmp_path / "corpus3")
    (
        spark.range(10)
        .select(F.col("id").alias("doc_id"))
        .repartitionByRange(5, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    # find the file holding doc_id 0..1 and delete its entire contents
    victim_ids = [
        r.doc_id
        for r in spark.read.parquet(files[0]).select("doc_id").collect()
    ]
    hit = targeted_delete(spark, path, ids=victim_ids)
    assert hit == [files[0]]
    assert not os.path.exists(files[0])
    remaining = spark.read.parquet(path)
    assert remaining.count() == 10 - len(victim_ids)
