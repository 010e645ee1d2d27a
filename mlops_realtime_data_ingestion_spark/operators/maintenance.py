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
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["targeted_delete", "merge_into"]


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
    if not hit_uris:
        return []
    return _rewrite_hit_files(
        spark, path, hit_uris, lambda hit: hit.filter(~F.col(id_col).isin(ids))
    )


def _rewrite_hit_files(
    spark: SparkSession,
    path: str,
    hit_uris: list[str],
    transform: Callable[[DataFrame], DataFrame],
) -> list[str]:
    """Copy-on-write core shared by delete and MERGE: rewrite exactly
    the files in ``hit_uris``, replacing each file's rows with
    ``transform(rows)`` (the ``_src`` provenance column must survive
    the transform), and atomically swap each output over its source.

    ONE distributed rewrite job covers every hit file (a driver loop
    would be serial at 100 TB with thousands of hits). Each row is
    tagged with a sha256 of its source file's FULL URI (basenames are
    NOT unique across Hive partition directories — one write task
    emits identically-named part files into many partitions, so keying
    on basename would merge two files' survivors and silently move
    rows between partitions), hash-partitioned on it so each source
    file's rows land in one task, and partitionBy'd so each source
    yields exactly one output file under tmp/_src=<hash>/. The hex
    hash is [0-9a-f] so Hive partition-value escaping is a no-op.
    """
    hit_files = [_local_path(u) for u in hit_uris]
    tmp = path.rstrip("/") + ".rewrite.tmp"
    hit = spark.read.parquet(*hit_files).withColumn(
        "_src", F.sha2(F.input_file_name(), 256)
    )
    (
        transform(hit)
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
            f"file rewrite produced unmapped source ids {sorted(unexpected)[:3]}"
        )
    for h, f in expected.items():
        parts = glob.glob(os.path.join(tmp, f"_src={h}", "part-*.parquet"))
        if parts:
            os.replace(parts[0], f)  # atomic same-filesystem swap
        else:
            os.remove(f)  # transform kept no rows from this file
        # drop the local-FS checksum sidecar: it describes the old
        # bytes (on an object store this concern doesn't exist)
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
    shutil.rmtree(tmp, ignore_errors=True)
    return hit_files


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: str,
    delete_col: str | None = None,
    check_unique: bool = True,
) -> dict:
    """Key-equality MERGE INTO over a parquet dataset — the
    Delta/Iceberg/Hudi upsert shape on plain files:

    - WHEN MATCHED (and ``delete_col`` false/absent): the target row
      is REPLACED by the source row's values for every shared
      non-key column;
    - WHEN MATCHED and ``source.delete_col`` is true: the target row
      is DELETED;
    - WHEN NOT MATCHED (and not a delete): the source row is INSERTED.

    Copy-on-write at file granularity: only files containing a
    matching key are rewritten (atomic per-file swap via
    ``_rewrite_hit_files``); inserts append as new files; untouched
    files stay byte-identical.  The reference's closest shape is the
    feature-store upsert (streaming/feature_store.upsert_latest),
    which MERGEs a latest-per-key table — this is the general-table
    version a lakehouse exposes as SQL MERGE.

    Source must be unique on ``on`` (the standard MERGE precondition;
    Delta raises on multiple matches).  ``check_unique=True`` asserts
    it with one small aggregate over the SOURCE (never the target).

    Returns {"rewritten_files": [...], "inserted": n} — counting
    updates/deletes would re-run the join, so only the insert count
    (already needed to decide whether to append) is reported.
    """
    key = F.col(on)
    if check_unique:
        dup = source.groupBy(on).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                f"merge_into: source has duplicate keys, e.g. {on}={dup[0][0]!r}"
            )
    target = spark.read.parquet(path)
    data_cols = [c for c in target.columns if c != on]
    shared = [c for c in data_cols if c in source.columns]

    # 1. hit files: target files holding any source key.  The file
    # name is projected BEFORE the join: input_file_name() is only
    # defined on the scan side of the plan — evaluated above a join
    # exchange it returns empty strings.
    keyed = target.select(key.alias("__tk"), F.input_file_name().alias("__f"))
    hit_uris = sorted(
        r["__f"]
        for r in keyed.join(
            source.select(key.alias("__tk")).distinct(), "__tk", "left_semi"
        )
        .select("__f")
        .distinct()
        .collect()
        if r["__f"]
    )

    # source columns renamed so the rewrite join is collision-free
    src = source.select(
        key.alias("__mk"),
        *[F.col(c).alias(f"__s_{c}") for c in shared],
        (
            F.col(delete_col).cast("boolean")
            if delete_col is not None
            else F.lit(False)
        ).alias("__del"),
    )

    # 2. STAGE inserts first (evaluated once, into a temp dir): the
    # anti-join must run against the pre-mutation file listing — the
    # rewrite below may REMOVE hit files whose every row was deleted,
    # and a post-rewrite action on the stale `target` plan would hit
    # FILE_NOT_EXIST.  But the staged files only become VISIBLE after
    # the rewrite succeeds (step 4), so a failure mid-MERGE never
    # leaves inserts live while updates/deletes are missing.  Residual
    # non-atomicity on plain parquet (a table format's metadata commit
    # closes it): a crash during the step-4 move can expose a subset
    # of the inserts — but only ever AFTER all updates/deletes are
    # fully applied.
    inserts = (
        src.filter(~F.col("__del"))
        .join(target.select(key.alias("__mk")), "__mk", "left_anti")
        .select(
            F.col("__mk").alias(on),
            *[F.col(f"__s_{c}").alias(c) for c in shared],
        )
    )
    # align to the full target schema (unshared columns null, typed —
    # an untyped VOID null would poison the parquet schema on append)
    types = {f.name: f.dataType for f in target.schema.fields}
    for c in data_cols:
        if c not in shared:
            inserts = inserts.withColumn(c, F.lit(None).cast(types[c]))
    inserts = inserts.select(on, *data_cols)
    ins_tmp = path.rstrip("/") + ".insert.tmp"
    inserts.write.mode("overwrite").parquet(ins_tmp)
    staged = sorted(glob.glob(os.path.join(ins_tmp, "part-*.parquet")))
    n_ins = 0
    if staged:
        # one count over the staged files (the anti-join ran once)
        n_ins = spark.read.parquet(ins_tmp).count()

    # 3. copy-on-write rewrite of the hit files (updates + deletes)
    rewritten: list[str] = []
    try:
        if hit_uris:

            def apply_merge(hit: DataFrame) -> DataFrame:
                joined = hit.join(src, hit[on] == F.col("__mk"), "left")
                matched = F.col("__mk").isNotNull()
                kept = joined.filter(~(matched & F.col("__del")))
                out_cols = [F.col(on)]
                for c in data_cols:
                    if c in shared:
                        out_cols.append(
                            F.when(matched, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
                        )
                    else:
                        out_cols.append(F.col(c))
                return kept.select(*out_cols, "_src")

            rewritten = _rewrite_hit_files(spark, path, hit_uris, apply_merge)

        # 4. publish the staged inserts (same-filesystem renames; the
        # staged part names are task-UUID-unique so no collision with
        # existing files)
        if n_ins:
            for f in staged:
                os.replace(f, os.path.join(path, os.path.basename(f)))
    finally:
        shutil.rmtree(ins_tmp, ignore_errors=True)
    return {"rewritten_files": rewritten, "inserted": n_ins}
