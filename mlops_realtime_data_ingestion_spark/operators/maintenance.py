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
import hashlib
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
    hit_uris = sorted(
        r.f
        for r in df.filter(F.col(id_col).isin(ids))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    hit_files = [_local_path(u) for u in hit_uris]
    if not hit_files:
        return []

    # ONE distributed rewrite job covers every hit file (the old shape
    # looped on the driver, launching 2 jobs per file — serial at 100 TB
    # with thousands of hits). Tag each surviving row with a sha256 of
    # its source file's FULL URI (basenames are NOT unique across Hive
    # partition directories — one write task emits identically-named
    # part files into many partitions, so keying on basename would
    # merge two files' survivors and silently move rows between
    # partitions), hash-partition on it so each source file's rows land
    # in one task, and partitionBy it so each source yields exactly one
    # output file under tmp/_src=<hash>/. The hex hash is [0-9a-f] so
    # Hive partition-value escaping is a no-op.
    tmp = path.rstrip("/") + ".rewrite.tmp"
    (
        spark.read.parquet(*hit_files)
        .withColumn("_src", F.sha2(F.input_file_name(), 256))
        .filter(~F.col(id_col).isin(ids))
        .repartition(len(hit_files), "_src")
        .write.partitionBy("_src")
        .mode("overwrite")
        .parquet(tmp)
    )
    # Safety: the Python-side hash of each collected URI must account
    # for every produced partition directory. A produced dir outside
    # the expected set means the second read rendered URIs differently
    # than the first (would misroute the swap loop) — fail loudly
    # instead of treating the miss as "all rows deleted".
    expected = {hashlib.sha256(u.encode()).hexdigest(): f
                for u, f in zip(hit_uris, hit_files)}
    produced = {
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(tmp, "_src=*"))
    }
    unexpected = produced - expected.keys()
    if unexpected:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"targeted_delete: rewrite produced unmapped source ids {sorted(unexpected)[:3]}"
        )
    for h, f in expected.items():
        parts = glob.glob(os.path.join(tmp, f"_src={h}", "part-*.parquet"))
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
