"""T7 poison-record handling: corrupt records are routed to a
dead-letter sink (replayable), valid records flow on — one scan feeds
both via foreachBatch. The reference's analogue is the per-record
"Ok" ack that keeps a bad record from wedging the stream."""

from __future__ import annotations

import pyspark.sql.types as T

from mlops_realtime_data_ingestion_spark.sources.streaming import (
    json_stream_with_dead_letter,
    split_dead_letter,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_corrupt_records_routed_not_dropped(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    lines = [
        '{"event_id": 1, "value": 10.0}',
        "this is not json at all",
        '{"event_id": 2, "value": 20.0}',
        '{"event_id": "not-a-number", "value": 30.0}',
        '{"event_id": 3, "value": 30.0}',
    ]
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")

    stream = json_stream_with_dead_letter(spark, str(src), SCHEMA)
    valid_path = str(tmp_path / "valid")
    dead_path = str(tmp_path / "dead")

    def sink(batch, _bid):
        valid, dead = split_dead_letter(batch)
        valid.write.mode("append").parquet(valid_path)
        dead.write.mode("append").parquet(dead_path)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    valid = spark.read.parquet(valid_path)
    dead = spark.read.parquet(dead_path)
    assert {r.event_id for r in valid.collect()} == {1, 2, 3}
    assert "_corrupt" not in valid.columns
    # both malformed lines captured VERBATIM for replay
    raws = {r.raw_record for r in dead.collect()}
    assert raws == {
        "this is not json at all",
        '{"event_id": "not-a-number", "value": 30.0}',
    }
