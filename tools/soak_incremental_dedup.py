"""Soak test for the streaming incremental dedup (StreamingDedup):
drain N micro-batches of documents against a GROWING signature index
and record per-batch wall time vs index size — the steady-state claim
in SCALE.md is that per-batch cost tracks the batch (plus true
collisions), not the corpus.

The per-batch work is: batch signatures (O(batch)), band join against
the index (index side is a linear scan that grows with the corpus but
carries only (id, bands) — no text), and three partitioned writes.  A
flat-ish curve here is the evidence that the index scan, the only
corpus-sized term, is not the dominant cost at this scale.

Usage: python tools/soak_incremental_dedup.py [n_batches] [batch_rows] [sf_dir]
Prints one JSON line: {"batches": [{"batch": i, "rows": n, "index_rows": m,
"sec": t, "dups": d}, ...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.data/sf1"

    from mlops_realtime_data_ingestion_spark.session import get_spark
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table
    from mlops_realtime_data_ingestion_spark.streaming.incremental_dedup import (
        StreamingDedup,
    )

    spark = get_spark("soak-incremental-dedup")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n_batches * batch_rows)
        .collect()
    )
    root = tempfile.mkdtemp(prefix="soak_dedup_")
    sd = StreamingDedup(root)
    out = []
    try:
        for i in range(n_batches):
            rows = docs[i * batch_rows : (i + 1) * batch_rows]
            if not rows:
                break
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            index = sd._index(spark).filter(F.col("batch_id") < F.lit(i))
            index_rows = index.count()
            t0 = time.perf_counter()
            clean, dups, entries, cached = sd.dedup_batch(batch, index)
            try:
                for df, path in (
                    (clean, sd.clean_path),
                    (dups, sd.dup_path),
                    (entries, sd.index_path),
                ):
                    (
                        df.withColumn("batch_id", F.lit(i))
                        .write.partitionBy("batch_id")
                        .option("partitionOverwriteMode", "dynamic")
                        .mode("overwrite")
                        .parquet(path)
                    )
            finally:
                cached.unpersist()
            dt = time.perf_counter() - t0
            n_dups = sd.dups(spark).filter(F.col("batch_id") == i).count()
            out.append(
                {
                    "batch": i,
                    "rows": len(rows),
                    "index_rows": index_rows,
                    "sec": round(dt, 3),
                    "dups": n_dups,
                }
            )
            print(json.dumps(out[-1]), file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"batches": out}))


if __name__ == "__main__":
    main()
