"""Soak test for the arbitrary-state streaming path (VERDICT r5 task
8): run record_high_tracker as a TRUE multi-batch stream — N
micro-batches via maxFilesPerTrigger=1 on the RocksDB state store
provider — asserting (a) per-key state survives batch boundaries
(the emitted record set equals the batch prefix-max oracle over the
FULL concatenated input, which only holds if the running max crosses
batches), (b) per-batch latency is flat, and (c) replaying the whole
input through a fresh checkpoint reproduces the identical output
(determinism of the stateful walk).

Mirrors the streaming-curation soak's shape (tools/
soak_streaming_curation.py). Usage:
    python tools/soak_record_highs.py [n_batches] [rows_per_batch]
Prints one JSON line:
    {"batches": N, "rows": R, "batch_sec": [...], "records": K,
     "oracle_match": bool, "replay_match": bool, "state_provider": ...}
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
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def gen_rows(n_batches: int, rows_per_batch: int, n_users: int = 200):
    """Deterministic event stream whose per-user record highs are
    spread across ALL batches: value cycles mod 997 with a slowly
    rising term, so late batches keep producing new records — state
    that failed to cross a batch boundary would over-emit."""
    eid = 0
    for b in range(n_batches):
        batch = []
        for r in range(rows_per_batch):
            u = (b * rows_per_batch + r) % n_users
            v = float((eid * 37 + u * 13) % 997) + eid * 0.0001
            batch.append(
                {
                    "user_id": u,
                    "ts_micros": 1_700_000_000_000_000 + eid * 1_000,
                    "event_id": eid,
                    "value": v,
                }
            )
            eid += 1
        yield batch


def run_stream(spark, src_dir: str, ckpt: str, sink: str, n_files: int):
    """Drain src_dir through record_high_tracker one file per
    micro-batch; asserts exactly n_files data batches fired (ADVICE
    r6: the parameter used to be declared and ignored) and returns
    their progress records."""
    from mlops_realtime_data_ingestion_spark.streaming.stateful import (
        record_high_tracker,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
        .selectExpr(
            "user_id", "timestamp_micros(ts_micros) AS ts", "event_id", "value"
        )
    )
    q = (
        record_high_tracker(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    while q.isActive and time.time() - t0 < 600:
        time.sleep(0.5)
    q.awaitTermination(30)
    progresses = [
        p
        for p in (json.loads(str(j.json)) for j in q.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    assert len(progresses) == n_files, (
        f"{sink}: expected {n_files} one-file micro-batches, "
        f"saw {len(progresses)}"
    )
    return progresses


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from mlops_realtime_data_ingestion_spark.session import get_spark

    spark = get_spark("soak-record-highs")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    )

    root = tempfile.mkdtemp(prefix="soak_rh_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    all_rows = []
    for i, batch in enumerate(gen_rows(n_batches, rows_per_batch)):
        with open(os.path.join(src, f"batch-{i:04d}.json"), "w") as f:
            f.write("\n".join(json.dumps(r) for r in batch))
        all_rows.extend(batch)

    try:
        prog = run_stream(
            spark, src, os.path.join(root, "ckpt1"), "rh_soak", n_batches
        )
        got = {
            (r["user_id"], r["event_id"], r["record_rank"])
            for r in spark.sql("SELECT * FROM rh_soak").collect()
        }

        # batch prefix-max oracle over the FULL input
        from pyspark.sql import Window

        full = spark.createDataFrame(all_rows, SCHEMA).selectExpr(
            "user_id", "timestamp_micros(ts_micros) AS ts", "event_id", "value"
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
        oracle = {
            (r["user_id"], r["event_id"], r["record_rank"])
            for r in full.withColumn("prev_max", F.max("value").over(w))
            .filter(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
            .withColumn("record_rank", F.row_number().over(wr))
            .collect()
        }

        # replay determinism: fresh checkpoint + sink over the same files
        prog2 = run_stream(
            spark, src, os.path.join(root, "ckpt2"), "rh_soak2", n_batches
        )
        got2 = {
            (r["user_id"], r["event_id"], r["record_rank"])
            for r in spark.sql("SELECT * FROM rh_soak2").collect()
        }

        def _secs(p):
            return [
                round(x["durationMs"]["triggerExecution"] / 1000.0, 2) for x in p
            ]

        # latency flatness (soak claim b) is reported for BOTH runs —
        # ADVICE r6: the replay run's progress used to be discarded
        batch_sec, batch_sec_replay = _secs(prog), _secs(prog2)
        print(
            json.dumps(
                {
                    "batches": len(batch_sec),
                    "rows": len(all_rows),
                    "batch_sec": batch_sec,
                    "batch_sec_replay": batch_sec_replay,
                    "records": len(got),
                    "oracle_match": got == oracle,
                    "replay_match": got == got2,
                    "state_provider": "rocksdb",
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
