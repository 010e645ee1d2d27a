"""Differential test: every registered query with an oracle must
hash-match DuckDB on the same tables — the local mirror of the
driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare_spark_duckdb


def _specs():
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    return all_specs()


@pytest.mark.parametrize("name", sorted(_specs().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _specs()[name]
    df = spec.fn(spark, sf_dir)
    assert df is not None
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare_spark_duckdb(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "tx_minute",
        "total_nb_trx_1min",
        "total_fee_1min",
        "avg_fee_1min",
    }


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) > 0
