"""General MERGE INTO on parquet: matched rows update, delete-flagged
rows vanish, unmatched source rows insert, untouched files stay
byte-identical, duplicate source keys are rejected."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.maintenance import (
    merge_into,
    targeted_delete,
)


def _write_target(spark, path):
    # two files with disjoint key ranges so hit-file granularity shows
    spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(0, 5)], "k long, s string, x double"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(100, 105)], "k long, s string, x double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_merge_update_insert_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    files_before = {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    }

    source = spark.createDataFrame(
        [
            (2, "UPDATED", 2.5, False),   # matched -> update
            (3, None, 0.0, True),         # matched -> delete
            (999, "NEW", 9.9, False),     # unmatched -> insert
            (998, "GONE", 0.0, True),     # unmatched delete -> no-op
        ],
        "k long, s string, x double, is_del boolean",
    )
    out = merge_into(spark, path, source, on="k", delete_col="is_del")
    assert out["inserted"] == 1
    assert len(out["rewritten_files"]) == 1  # only the 0-4 file held hits

    got = {r["k"]: (r["s"], r["x"]) for r in spark.read.parquet(path).collect()}
    assert got[2] == ("UPDATED", 2.5)
    assert 3 not in got
    assert got[999] == ("NEW", 9.9)
    assert 998 not in got
    assert got[0] == ("v0", 0.0) and got[104] == ("v104", 104.0)
    assert len(got) == 5 - 1 + 5 + 1  # 5 updated-file rows minus delete, 5 untouched, 1 insert

    # the 100-104 file was never rewritten: same mtime, same bytes path
    untouched = [f for f in files_before if f not in out["rewritten_files"]]
    assert untouched and all(
        os.path.getmtime(f) == files_before[f] for f in untouched if os.path.exists(f)
    )


def test_merge_insert_only_and_pure_update(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_target(spark, path)
    # no matches at all: pure insert, zero rewrites
    src = spark.createDataFrame([(500, "a", 1.0)], "k long, s string, x double")
    out = merge_into(spark, path, src, on="k")
    assert out == {"rewritten_files": [], "inserted": 1}
    # pure update: zero inserts
    src2 = spark.createDataFrame([(500, "b", 2.0)], "k long, s string, x double")
    out2 = merge_into(spark, path, src2, on="k")
    assert out2["inserted"] == 0 and len(out2["rewritten_files"]) == 1
    assert {r["s"] for r in spark.read.parquet(path).filter(F.col("k") == 500).collect()} == {"b"}


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write_target(spark, path)
    dup = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0)], "k long, s string, x double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(spark, path, dup, on="k")


def test_merge_source_missing_columns_inserts_nulls(spark, tmp_path):
    """A source carrying only a subset of data columns updates just
    those columns on match and inserts nulls for the rest."""
    path = str(tmp_path / "t4")
    _write_target(spark, path)
    src = spark.createDataFrame([(2, "ONLY_S"), (777, "NEW_S")], "k long, s string")
    merge_into(spark, path, src, on="k")
    got = {r["k"]: (r["s"], r["x"]) for r in spark.read.parquet(path).collect()}
    assert got[2] == ("ONLY_S", 2.0)  # x untouched on update
    assert got[777] == ("NEW_S", None)  # unshared column null on insert


def test_targeted_delete_still_green_after_refactor(spark, tmp_path):
    path = str(tmp_path / "t5")
    _write_target(spark, path)
    rewritten = targeted_delete(spark, path, [101, 103], id_col="k")
    assert len(rewritten) == 1
    keys = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert keys == [0, 1, 2, 3, 4, 100, 102, 104]


# ---------- model-based property ----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_merge_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),   # key
        st.integers(min_value=0, max_value=99),   # payload
        st.booleans(),                            # delete flag
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],                     # MERGE precondition
)


@given(st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=10,
                unique=True),
       _merge_ops)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_merge_matches_dict_model(spark, tmp_path_factory, initial_keys, ops):
    """merge_into over random (update/delete/insert) batches must equal
    the obvious dict model."""
    path = str(tmp_path_factory.mktemp("mprop") / "t")
    spark.createDataFrame(
        [(k, -1) for k in initial_keys], "k long, v long"
    ).coalesce(2).write.parquet(path)
    model = {k: -1 for k in initial_keys}
    for k, v, is_del in ops:
        if is_del:
            model.pop(k, None)
        else:
            model[k] = v
    src = spark.createDataFrame(
        [(k, v, d) for k, v, d in ops], "k long, v long, is_del boolean"
    )
    if ops:
        merge_into(spark, path, src, on="k", delete_col="is_del")
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == model
