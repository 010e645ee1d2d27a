"""Oracle-verify a subset of registry queries at one or more SFs.

Bare session like the driver's (tools/driver_sim.py), but only the
named queries — the fast parity check for an optimization round.

Usage: python tools/verify_subset.py SF_DIR QUERY [QUERY...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as e
from tests.oracle_harness import compare_spark_duckdb


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = e.queries()
    o = e.oracle_sql()
    failed = []
    for name in names:
        if name not in q:
            print(f"  UNKNOWN {name}")
            failed.append(name)
            continue
        t0 = time.time()
        df = q[name](spark, sf)
        ok, msg = compare_spark_duckdb(df, o[name], sf)
        dt = time.time() - t0
        print(f"  {'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s) {msg.splitlines()[0]}",
              flush=True)
        if not ok:
            failed.append(name)
            print("    " + "\n    ".join(msg.splitlines()[1:10]))
    print("ALL PASS" if not failed else "FAILED: " + ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
