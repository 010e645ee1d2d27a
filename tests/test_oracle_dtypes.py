"""Registry-wide oracle dtype-parity guard.

The driver's correctness gate hashes TYPED values, so a DuckDB oracle
whose result schema diverges from the Spark schema can fail the
value-hash even when every cell is equal. The classic offender: DuckDB
promotes integer window/aggregate sums to HUGEINT (int128) unless the
SQL casts them, while Spark emits BIGINT — exactly the round-4 red row
(`wf_cumulative_distinct_users`, see VERDICT.md r4). The local string
canonicalizer in tests/oracle_harness.py renders cells to strings and
therefore structurally CANNOT catch this class, so this test checks
dtypes directly:

1. hard ban on HUGEINT/UHUGEINT in any oracle's bound result type;
2. a 1:1 column-name match between oracle and Spark plan;
3. every (duckdb_type, spark_type) pair must be in the compat map
   below, which freezes the pairs observed across the 165 queries that
   are driver-green through round 4. A new pair is not automatically a
   bug — but it must be consciously added here, with the driver's
   typed-hash behavior in mind, not discovered as a red driver row.

DuckDB binding (`con.sql(...).types`) does not execute the query, and
Spark `.dtypes` only builds the plan, so the sweep stays cheap.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import duckdb_connection

# duckdb bound type -> spark dtypes the driver's typed hash accepts.
# Derived from the observed pairs across all driver-green queries
# (rounds 1-4); see module docstring before widening.
_COMPAT: dict[str, frozenset[str]] = {
    "BIGINT": frozenset({"bigint", "int"}),
    "INTEGER": frozenset({"int"}),
    "DOUBLE": frozenset({"double"}),
    "VARCHAR": frozenset({"string"}),
    "TIMESTAMP": frozenset({"timestamp"}),
    "BOOLEAN": frozenset({"boolean"}),
    "DATE": frozenset({"date"}),
}

_BANNED = ("HUGEINT", "UHUGEINT")


def _specs():
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    return all_specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    sorted(n for n, s in _specs().items() if s.oracle is not None),
)
def test_oracle_dtype_parity(spark, sf_dir, duck, name):
    spec = _specs()[name]
    rel = duck.sql(spec.oracle)
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))

    for col, dtype in duck_types.items():
        assert not any(b in dtype for b in _BANNED), (
            f"{name}.{col}: oracle binds to {dtype} — DuckDB promoted an "
            f"integer sum to int128; add an explicit CAST(... AS BIGINT) "
            f"in the oracle SQL (the Spark side emits bigint)"
        )

    spark_types = dict(spec.fn(spark, sf_dir).dtypes)
    assert set(duck_types) == set(spark_types), (
        f"{name}: column mismatch oracle={sorted(duck_types)} "
        f"spark={sorted(spark_types)}"
    )
    for col, dtype in duck_types.items():
        allowed = _COMPAT.get(dtype)
        assert allowed is not None, (
            f"{name}.{col}: oracle type {dtype} has no entry in the "
            f"compat map — verify the driver's typed hash accepts it, "
            f"then add it"
        )
        assert spark_types[col] in allowed, (
            f"{name}.{col}: oracle={dtype} vs spark={spark_types[col]} "
            f"not in compat map {sorted(allowed)}"
        )
