"""Diagnose oracle type mismatches: print Spark dtypes vs DuckDB
result types side by side for one registered query (the most common
cause of hash mismatches — INT vs BIGINT, HUGEINT sums, DOUBLE ceil).

Run: python tools/typediff.py <query_name> [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
from tests.oracle_harness import duckdb_connection

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main() -> int:
    name = sys.argv[1]
    spec = all_specs()[name]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sdt = dict(spec.fn(spark, SF).dtypes)
    if spec.oracle is None:
        print(f"{name}: rows-only (no oracle); spark dtypes:")
        for c, t in sorted(sdt.items()):
            print(f"  {c:30s} {t}")
        return 0
    con = duckdb_connection(SF)
    res = con.execute(spec.oracle)
    ddt = {d[0]: str(d[1]) for d in res.description}
    con.close()
    print(f"{name}  ({SF})")
    print(f"  {'column':30s} {'spark':15s} duckdb")
    for c in sorted(set(sdt) | set(ddt)):
        s, d = sdt.get(c, "<missing>"), ddt.get(c, "<missing>")
        flag = "" if c in sdt and c in ddt else "  <-- column mismatch"
        print(f"  {c:30s} {s:15s} {d}{flag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
