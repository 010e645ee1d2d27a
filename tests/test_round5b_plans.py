"""Round-5 second-wave operator tests: gap-fill interpolation,
seasonal decomposition, MAD anomalies, containment dedup,
temperature mixture sampling, interval-overlap join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.timeseries import (
    gapfill_interpolate,
    mad_anomalies,
    seasonal_decompose,
)


def _ts(df, secs_col="t"):
    return df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col(secs_col)),
    )


def test_gapfill_interpolates_interior_gap(spark):
    # observations at hours 0, 1, 4 (values 10, 20, 50): hours 2, 3
    # must come back as the linear fill 30, 40
    rows = [(1, 0, 10.0), (1, 3600, 20.0), (1, 4 * 3600, 50.0)]
    df = _ts(spark.createDataFrame(rows, ["user_id", "t", "value"]))
    out = {
        r["bucket_s"]: (r["value_f"], r["observed"])
        for r in gapfill_interpolate(
            df, ["user_id"], "ts", "value", step_seconds=3600
        ).collect()
    }
    base = 1704067200  # 2024-01-01 UTC
    assert len(out) == 5
    assert out[base + 0 * 3600] == (10.0, True)
    assert out[base + 1 * 3600] == (20.0, True)
    assert out[base + 2 * 3600] == (30.0, False)
    assert out[base + 3 * 3600] == (40.0, False)
    assert out[base + 4 * 3600] == (50.0, True)


def test_gapfill_bucket_average_and_span(spark):
    # two observations inside one bucket average exactly; the grid
    # never extends past the observed span
    rows = [(1, 10, 1.0), (1, 20, 2.0), (1, 3620, 7.0)]
    df = _ts(spark.createDataFrame(rows, ["user_id", "t", "value"]))
    out = sorted(
        gapfill_interpolate(
            df, ["user_id"], "ts", "value", step_seconds=3600
        ).collect(),
        key=lambda r: r["bucket_s"],
    )
    assert len(out) == 2
    assert out[0]["value_f"] == 1.5 and out[0]["observed"]
    assert out[1]["value_f"] == 7.0 and out[1]["observed"]


def test_seasonal_decompose_recovers_planted_components(spark):
    # y(day) = 100 + phase pattern (zero-mean over the period):
    # trend must be flat 100*86400? no — daily TOTAL = one event/day
    period = 7
    pattern = [3.0, -1.0, 2.0, -2.0, 1.0, -3.0, 0.0]  # sums to 0
    rows = []
    for day in range(28):
        phase = day % period
        rows.append((1, day * 86400, 100.0 + pattern[phase]))
    df = _ts(spark.createDataFrame(rows, ["user_id", "t", "value"]))
    out = seasonal_decompose(df, ["user_id"], "ts", "value", period=period)
    got = {r["day_s"]: r for r in out.collect()}
    # interior days only: 28 days -> days 3..24 inclusive = 22 rows
    assert len(got) == 22
    base_day = 1704067200 // 86400  # 2024-01-01
    for day_s, r in got.items():
        assert r["trend"] == pytest.approx(100.0, abs=1e-9)
        rel_day = day_s // 86400 - base_day
        assert r["seasonal"] == pytest.approx(pattern[rel_day % period], abs=1e-9)
        assert r["remainder"] == pytest.approx(0.0, abs=1e-9)
        # the operator's phase key is the ABSOLUTE epoch-day mod period
        assert r["phase"] == (day_s // 86400) % period


def test_seasonal_decompose_excludes_gap_straddling_windows(spark):
    # day 10 missing: every centered window containing it must drop
    rows = [
        (1, d * 86400, 50.0) for d in list(range(10)) + list(range(11, 21))
    ]
    df = _ts(spark.createDataFrame(rows, ["user_id", "t", "value"]))
    out = seasonal_decompose(df, ["user_id"], "ts", "value", period=7)
    base_day = 1704067200 // 86400
    days = sorted(r["day_s"] // 86400 - base_day for r in out.collect())
    # consecutive runs 0..9 and 11..20, each loses 3 from both ends
    assert days == [3, 4, 5, 6, 14, 15, 16, 17]


def test_mad_flags_spike_that_zscore_masks(spark):
    # 20 identical-ish points + one 1000x spike: the spike inflates
    # the stddev (z ~ sqrt(n)) but not the MAD
    rows = [(1, i, 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append((1, 20, 10000.0))
    df = _ts(spark.createDataFrame(rows, ["user_id", "t", "value"]))
    df = df.withColumn("event_id", F.col("t"))
    out = mad_anomalies(
        df, ["user_id"], "ts", "value", z_threshold=3.5, tiebreak_col="event_id"
    ).collect()
    assert [r["value"] for r in out] == [10000.0]
    assert out[0]["robust_z"] > 1000


def test_mad_constant_series_emits_nothing(spark):
    rows = [(1, i, 5.0) for i in range(10)]
    df = _ts(spark.createDataFrame(rows, ["user_id", "t", "value"]))
    df = df.withColumn("event_id", F.col("t"))
    out = mad_anomalies(
        df, ["user_id"], "ts", "value", tiebreak_col="event_id"
    ).collect()
    assert out == []


def test_containment_detects_quote_but_jaccard_misses(spark):
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_pairs,
    )

    quote = " ".join(f"w{i}" for i in range(12))
    host = quote + " " + " ".join(f"x{i}" for i in range(200))
    other = " ".join(f"y{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, quote), (2, host), (3, other)], ["doc_id", "text"]
    )
    out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.6).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r for r in out}
    assert (1, 2) in pairs  # the quote is fully inside the host
    assert pairs[(1, 2)]["containment"] == 1.0
    # the host is NOT contained in the quote; the unrelated doc matches nothing
    assert (2, 1) not in pairs
    assert not any(3 in p for p in pairs)


def test_containment_prefix_filter_lossless(spark):
    """The rare-prefix probe set must reproduce the brute-force
    result exactly on a corpus with heavy shingle sharing."""
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_pairs,
        with_shingle_hashes,
    )

    docs = []
    base = [f"tok{i}" for i in range(30)]
    for d in range(12):
        words = base[: 10 + d] + [f"uniq{d}_{j}" for j in range(d % 4)]
        docs.append((d, " ".join(words)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_id_a"], r["doc_id_b"], r["overlap"])
        for r in containment_pairs(df, "doc_id", "text", n=3, threshold=0.6).collect()
    }
    # brute force via the same shingle frames
    sh = {
        r["id"]: set(r["sh"])
        for r in with_shingle_hashes(df, "doc_id", "text", 3).collect()
    }
    expect = set()
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b:
                continue
            ov = len(sa & sb)
            if ov / len(sa) >= 0.6:
                expect.add((a, b, ov))
    assert got == expect


def test_temperature_sample_flattens_head_domain(spark):
    from mlops_realtime_data_ingestion_spark.operators.training_data import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(9000)] + [
        (i, "small") for i in range(9000, 10000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_sample(df, "source", "doc_id", frac=0.5)
    take = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # sqrt weights: w_big/w_small = 3 -> big keeps 3750, small 1250
    # expected; small's PER-DOC rate (1.25) caps at 1.0 -> all 1000
    # hash thresholding is uniform-ish: within 15% of expectation
    assert take["small"] == 1000  # rate capped at 1.0 keeps everything
    assert abs(take["big"] - 3750) / 3750 < 0.15
    # per-doc keep rate of the head domain is ~0.42 — flattened, not
    # proportional (proportional 0.5 would keep 4500)
    assert take["big"] < 4200


def test_interval_overlap_matches_naive_join(spark):
    from mlops_realtime_data_ingestion_spark.operators.relational import (
        interval_overlap_pairs,
    )

    rows = []
    # deterministic pseudo-random intervals, several crossing bucket
    # boundaries and several fully inside one bucket
    for k in range(3):
        for i in range(40):
            s = (i * 977 + k * 131) % 20000
            e = s + ((i * 37 + k * 11) % 5000)
            rows.append((k, i, s, e))
    df = spark.createDataFrame(rows, ["key", "iid", "s", "e"])
    got = {
        (r["key"], r["iid_a"], r["iid_b"], r["ov_start"], r["ov_end"])
        for r in interval_overlap_pairs(
            df, ["key"], ["iid"], "s", "e", bucket_seconds=3600
        ).collect()
    }
    naive = set()
    for k1, i1, s1, e1 in rows:
        for k2, i2, s2, e2 in rows:
            if k1 == k2 and i1 < i2 and s1 <= e2 and s2 <= e1:
                naive.add((k1, i1, i2, max(s1, s2), min(e1, e2)))
    assert got == naive and len(naive) > 100


def test_record_high_tracker_matches_prefix_max(spark, tmp_path):
    """Single-batch drain of the stateful record tracker equals the
    batch prefix-max rewrite; api='auto' resolves to the
    applyInPandasWithState spelling (the tws path is opt-in until
    covered — see test_round6_plans.py for its protobuf-gated test)."""
    import json

    from mlops_realtime_data_ingestion_spark.streaming.stateful import (
        record_high_tracker,
    )
    from pyspark.sql import types as T

    rows = []
    vals = [5.0, 3.0, 7.0, 7.0, 6.5, 9.0, 1.0]
    for u in (1, 2):
        for i, v in enumerate(vals):
            rows.append({"user_id": u, "ts_micros": 1_700_000_000_000_000 + i * 1_000_000,
                         "event_id": i, "value": v + u})
    src = tmp_path / "events"
    src.mkdir()
    (src / "part-0.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema).json(str(src))
        .selectExpr("user_id", "timestamp_micros(ts_micros) AS ts",
                    "event_id", "value")
    )
    q = (
        record_high_tracker(stream)
        .writeStream.format("memory").queryName("rh_test_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r["record_rank"]
        for r in spark.sql("SELECT * FROM rh_test_sink").collect()
    }
    # records per user: 5.0 (rank1), 7.0 (rank2), 9.0 (rank3);
    # the tie 7.0 and the lower 6.5/3.0/1.0 never emit
    expect = {(u, 0): 1 for u in (1, 2)}
    expect.update({(u, 2): 2 for u in (1, 2)})
    expect.update({(u, 5): 3 for u in (1, 2)})
    assert got == expect
