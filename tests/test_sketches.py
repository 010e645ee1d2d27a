"""HyperLogLog property tests: error bound on adversarial
(sequential) keys and duplicate-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.sketches import hll_cardinality


def test_hll_error_bound_and_monotone_keys(spark):
    """HLL with the modular-squaring mixer must stay within ~3x the
    theoretical standard error (1.04/sqrt(1024) ~ 3.3%) even on
    SEQUENTIAL keys — the adversarial input for weak mixing."""
    for n in (200, 5000):
        df = spark.range(n).select(F.col("id").alias("k"))
        row = hll_cardinality(df, "k", p=10).collect()[0]
        assert row["exact_distinct"] == n
        assert row["rel_err"] <= 0.10, (n, row)


def test_hll_duplicate_invariance(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    row = hll_cardinality(df, "k", p=10).collect()[0]
    assert row["exact_distinct"] == 100
    assert row["rel_err"] <= 0.10, row
