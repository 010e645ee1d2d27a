"""Bucketed (pre-partitioned) tables — the co-located join scale
path.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides on the key. Writing each side ``bucketBy(N, key)`` once
moves that shuffle to write time: every subsequent join (or groupBy)
on the key reads matching buckets pairwise and shuffles NOTHING —
tests/test_bucketed_join.py asserts the executed plan is
Exchange-free. The reference's closest analogue is Kinesis
partition-keying by ``hash`` (stream_processing/main.py:62), which
co-locates the dedup; bucketing is the at-rest generalization.

Bucket count guidance: buckets are fixed at write time, so pick
``total_size / target_partition_size`` at the LARGEST anticipated
scale (e.g. 100 TB / 256 MB ≈ 400k buckets is too many files per
write task — in practice 16-64k, with AQE coalescing small reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed+sorted managed parquet table.
    ``sortBy`` within buckets additionally enables merge-join reads
    without a per-partition sort when the join key prefixes the sort
    order."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket metadata (plain
    ``spark.read.parquet(path)`` would lose it — the catalog carries
    the bucket spec)."""
    return spark.table(table)
