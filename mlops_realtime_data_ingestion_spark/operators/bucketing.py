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
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "read_bucketed", "write_clustered", "write_zorder"]


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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
) -> None:
    """Range-clustered parquet layout: range-partition on the cluster
    columns, sort within each file, write.

    This is the single-dimension z-order analogue: every file covers a
    narrow, non-overlapping range of the cluster key, so parquet
    row-group min/max stats (and, with a table format, file-level
    stats) prune point/range predicates down to one file in N — the
    difference between scanning 100 TB and scanning 256 MB for a
    "this user's docs" query. tests/test_clustered_layout.py proves
    the locality: a point predicate's rows come from exactly one file,
    where the same predicate over a hash-partitioned write touches
    every file.

    ``repartitionByRange`` samples the key distribution to place the
    cut points, so skewed keys still yield balanced files (unlike
    static modulo bucketing).
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Two-dimensional Z-order (Morton) clustered parquet layout —
    the multi-column generalization of :func:`write_clustered`.

    Each of the two cluster columns is min-max normalized to a
    ``bits``-bit integer (the min/max pair is one tiny aggregate —
    bounded driver metadata, like compaction's file counts), the two
    integers are bit-interleaved into the Morton code, and files are
    range-partitioned + sorted on that code. Points close in (a, b)
    space land in the same file, so parquet min/max stats prune
    predicates on EITHER column — a single-column range layout prunes
    only its leading column.

    Scale: one write-time shuffle buys file pruning forever after
    (the Delta/Iceberg OPTIMIZE ZORDER shape). The interleave is pure
    codegen bit arithmetic; n_files sizes files to the 512 MB target
    like compaction.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    if lo_a is None or lo_b is None:
        raise ValueError(
            f"write_zorder: cluster column "
            f"{col_a if lo_a is None else col_b} is entirely NULL — "
            f"no min/max range to normalize against"
        )
    span_a = max(float(hi_a) - float(lo_a), 1e-12)
    span_b = max(float(hi_b) - float(lo_b), 1e-12)
    cap = (1 << bits) - 1
    # NULL cluster values quantize to 0 (the column min) so every row
    # gets a real Morton code and lands in a file, instead of a NULL
    # code collecting all NULL rows into an unclustered range
    qa = F.least(
        F.lit(cap),
        (
            (F.coalesce(F.col(col_a).cast("double"), F.lit(float(lo_a))) - lo_a)
            / span_a
            * cap
        ).cast("long"),
    )
    qb = F.least(
        F.lit(cap),
        (
            (F.coalesce(F.col(col_b).cast("double"), F.lit(float(lo_b))) - lo_b)
            / span_b
            * cap
        ).cast("long"),
    )
    # bit positions are disjoint, so + is bitwise-OR here (PySpark's
    # Column | is logical, not bitwise)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(qa, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(qb, i) % 2, 2 * i + 1)
        )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
