"""Soak test for the streaming curation pipeline (StreamingCuration):
drain N micro-batches of documents through the quality gate + exact
dedup against a GROWING fingerprint index, recording per-batch wall
time vs index size plus the gate/dedup decision counts — the
steady-state claim in SCALE.md is that per-batch cost tracks the
batch (classifier is a pure map; the only corpus-sized term is the
(id, fp)-narrow index anti-join), not the corpus.

Correctness checks folded into the soak (mirroring the incremental
dedup soak + the replay test):
- conservation: every input doc lands in exactly one of
  accepted / rejected per batch;
- a re-delivered batch (same batch_id) leaves accepted counts
  unchanged (replay idempotence through the partition overwrite);
- corpus-level dedup actually fires once the index has content
  (dup_corpus > 0 across the run for duplicated corpora).

Usage: python tools/soak_streaming_curation.py [n_batches] [batch_rows] [sf_dir]
Prints one JSON line: {"batches": [...], "replay_ok": bool}.
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
    from mlops_realtime_data_ingestion_spark.streaming.curation_pipeline import (
        StreamingCuration,
    )

    spark = get_spark("soak-streaming-curation")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n_batches * batch_rows)
        .collect()
    )
    root = tempfile.mkdtemp(prefix="soak_curation_")
    sc = StreamingCuration(root)
    out = []
    try:
        for i in range(n_batches):
            rows = docs[i * batch_rows : (i + 1) * batch_rows]
            if not rows:
                break
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            index_rows = sc._index(spark).count()
            t0 = time.perf_counter()
            sc.process_batch(batch, i)
            dt = time.perf_counter() - t0
            m = sc.metrics(spark).filter(F.col("batch_id") == i).collect()[0]
            rej = {
                r["reason"]: r["n"]
                for r in sc.rejected(spark)
                .filter(F.col("batch_id") == i)
                .groupBy("reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            conserved = (
                m["n_accepted"]
                + m["n_quality_rejected"]
                + m["n_dup_rejected"]
                == len(rows)
            )
            out.append(
                {
                    "batch": i,
                    "rows": len(rows),
                    "index_rows": index_rows,
                    "sec": round(dt, 3),
                    "accepted": m["n_accepted"],
                    "rej_quality": rej.get("quality", 0),
                    "rej_dup_intra": rej.get("dup_intra", 0),
                    "rej_dup_corpus": rej.get("dup_corpus", 0),
                    "conserved": conserved,
                }
            )
            print(json.dumps(out[-1]), file=sys.stderr, flush=True)

        # replay the LAST batch verbatim: accepted/rejected totals must
        # not change (dynamic partition overwrite + index batch_id
        # exclusion — the crash-recovery contract)
        last = len(out) - 1
        before = sc.accepted(spark).count()
        rows = docs[last * batch_rows : (last + 1) * batch_rows]
        sc.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), last
        )
        replay_ok = sc.accepted(spark).count() == before
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"batches": out, "replay_ok": replay_ok}))


if __name__ == "__main__":
    main()
