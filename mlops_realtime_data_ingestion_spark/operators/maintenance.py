"""Storage maintenance operators: surgical row deletion over a
parquet dataset.

A 100 TB training corpus receives takedown/GDPR requests for a
handful of keys; rewriting the whole table per request is a non-plan.
``targeted_delete`` is the copy-on-write shape every lakehouse delete
uses (Delta/Iceberg/Hudi): locate the FILES containing target keys
via pushed-down key predicates, rewrite only those files, leave
everything else byte-identical. The reference's closest analogue is
the Glue compaction job's prefix rewrite
(resources/glue/FeatureStoreAggregateParquet.py:79-111) — which
rewrites the whole prefix non-atomically; this touches only affected
files and swaps each with an atomic rename.

Scale: the candidate-file scan is a key-predicate filter that parquet
row-group stats prune (clustered layouts -> few files); the driver
holds only the affected FILE LIST (bounded by |keys|), never rows;
all hit files are rewritten by ONE distributed job (a task per file
via hash-partitioning on the source basename), so a thousand hit
files cost one job, not a thousand serial ones. On an object store
the per-file swap becomes the table format's metadata commit — the
plan shape is identical.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["targeted_delete"]


def _local_path(uri: str) -> str:
    if uri.startswith("file://"):
        uri = uri[len("file://"):]
    elif uri.startswith("file:"):
        uri = uri[len("file:"):]
    return uri


def targeted_delete(
    spark: SparkSession,
    path: str,
    ids: list,
    id_col: str = "doc_id",
) -> list[str]:
    """Delete rows with ``id_col`` in ``ids`` from the parquet dataset
    at ``path``, rewriting ONLY the files that contain them.

    Returns the list of rewritten (or removed) file paths. Files not
    containing any target key are untouched — byte-identical, not
    just value-identical (asserted in tests/test_targeted_delete.py).
    """
    df = spark.read.parquet(path)
    hit_files = sorted(
        _local_path(r.f)
        for r in df.filter(F.col(id_col).isin(ids))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    if not hit_files:
        return []

    # ONE distributed rewrite job covers every hit file (the old shape
    # looped on the driver, launching 2 jobs per file — serial at 100 TB
    # with thousands of hits). Tag each surviving row with its source
    # file's basename (part-file names carry task UUIDs, so basenames
    # are unique across the dataset), hash-partition on it so each
    # source file's rows land in one task, and partitionBy it so each
    # source yields exactly one output file under tmp/_src=<basename>/.
    # Basenames are [A-Za-z0-9.-] so Hive partition-value escaping is a
    # no-op and the directory name maps back to the file verbatim.
    tmp = path.rstrip("/") + ".rewrite.tmp"
    (
        spark.read.parquet(*hit_files)
        .withColumn("_src", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .filter(~F.col(id_col).isin(ids))
        .repartition(len(hit_files), "_src")
        .write.partitionBy("_src")
        .mode("overwrite")
        .parquet(tmp)
    )
    for f in hit_files:
        parts = glob.glob(
            os.path.join(tmp, f"_src={os.path.basename(f)}", "part-*.parquet")
        )
        if parts:
            os.replace(parts[0], f)  # atomic same-filesystem swap
        else:
            os.remove(f)  # every row in this file was a target
        # drop the local-FS checksum sidecar: it describes the old
        # bytes (on an object store this concern doesn't exist)
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
    shutil.rmtree(tmp, ignore_errors=True)
    return hit_files
