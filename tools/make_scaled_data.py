"""Build an sf1-equivalent dataset by replicating sf0.1 10x with key
remapping — the scaling stress harness the per-round bench reads if
present (bench.py "scaled" section).

Replication rules (chosen so operator COST scales linearly while
SEMANTICS stay comparable):
- region/nation: NOT scaled (TPC-H dims are fixed-size; fact FKs keep
  referencing them).
- customer/supplier/part/orders/lineitem: keys and FKs offset by
  replica * (max_key) so replica i is a disjoint, internally
  consistent copy; dates untouched (10x rows in the same date range =
  10x group sizes, the honest stress for scan-agg).
- events: event_id/user_id offset (10x distinct series, same
  per-series shape); timestamps untouched (10x window density).
- documents: doc_id offset; every TOKEN gets a replica suffix, so
  intra-replica dup structure (planted near-dups) is preserved
  exactly while cross-replica similarity is zero — without this, each
  doc's 10 copies would form quadratic pair groups and dedup output
  would scale as pairs^2, a data artifact rather than an engine cost.
- embeddings: vec_id offset, vectors/labels kept (ANN query cost is
  corpus-size-bound; output stays top-k).

Usage: python tools/make_scaled_data.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"

# (key/FK column) -> (table whose max value defines the offset stride)
OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events:event_id", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _stride(spark, sf_dir, ref: str) -> int:
    if ":" in ref:
        table, col = ref.split(":")
    else:
        table, col = ref, KEY_OF[ref]
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    return load_table(spark, sf_dir, table).agg(F.max(col)).collect()[0][0] + 1


def scale(spark, factor: int, out_dir: str, src: str = SRC) -> None:
    from mlops_realtime_data_ingestion_spark.sources.batch import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    strides: dict[str, int] = {}
    for table in TABLES:
        df = load_table(spark, src, table)
        out = os.path.join(out_dir, f"{table}.parquet")
        if table in ("region", "nation"):
            df.write.mode("overwrite").parquet(out)
            continue
        copies: list[DataFrame] = []
        for i in range(factor):
            c = df
            for col, ref in OFFSETS.get(table, {}).items():
                if ref not in strides:
                    strides[ref] = _stride(spark, src, ref)
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * strides[ref])).cast(df.schema[col].dataType)
                )
            if table == "documents" and i > 0:
                # suffix every token: zero cross-replica shingle overlap
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\w+)", f"$1x{i}")
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(32).write.mode("overwrite").parquet(out)
        print(f"{table}: x{factor}", flush=True)


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf1"
    from mlops_realtime_data_ingestion_spark.session import get_spark

    scale(get_spark("scale-data"), factor, out_dir)
