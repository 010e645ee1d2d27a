"""Local mirror of the driver's DuckDB differential check.

Canonicalizes both result sets (columns sorted by name, every cell
rendered to a stable string, rows sorted) and compares — an
approximation of the driver's order-insensitive value-hash that also
prints a usable diff on mismatch.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare_spark_duckdb(spark_df, oracle: str, sf_dir: str, max_diff: int = 8):
    """Returns (ok, message)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    msgs = []
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        msgs.append(f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}")

    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc == dc:
        return True, f"OK rows={len(sc)}"

    s_set, d_set = set(sc), set(dc)
    only_s = list(s_set - d_set)[:max_diff]
    only_d = list(d_set - s_set)[:max_diff]
    cols_sorted = sorted(s_cols)
    msgs.append(f"value mismatch (cols sorted: {cols_sorted})")
    for r in only_s:
        msgs.append(f"  spark-only : {r}")
    for r in only_d:
        msgs.append(f"  duckdb-only: {r}")
    return False, "\n".join(msgs)
