"""Round-7 scale sweep (VERDICT r6 tasks 1 + 2 + 5): measures the
containment family after the PPJoin+ positional filters — best-of-2
noop-sink wall time plus candidate-vs-survivor accounting at every
scale — and (once implemented) the skew-safe count_mode="join"
spelling of cdc_chunk_dedup / duplicate_passage_spans vs the window
spelling, and the containment incremental build/serve lifecycle.

Run: python tools/sweep_round7.py [what ...]
  what in {containment, countmode, incremental}; default: containment
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "10x": "/root/repo/.data/sf1",
    "100x": "/root/repo/.data/sf10",
}


def _best_of_2(build):
    best = None
    for _ in range(2):
        df = build()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_accounting,
        containment_pairs,
    )
    from mlops_realtime_data_ingestion_spark.session import get_spark
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    what = set(sys.argv[1:]) or {"containment"}
    spark = get_spark("sweep-r7")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {}
    for label, d in SCALES.items():
        if not os.path.isdir(d):
            continue
        docs = load_table(spark, d, "documents")
        if "containment" in what:
            wall = _best_of_2(
                lambda: containment_pairs(
                    docs, id_col="doc_id", text_col="text", n=3, threshold=0.6
                )
            )
            acct = containment_accounting(
                docs, id_col="doc_id", text_col="text", n=3, threshold=0.6
            )
            out.setdefault("containment", {})[label] = {
                "wall_s": wall, **acct,
            }
            print(f"{label:6s} containment {wall:7.3f}s {acct}", flush=True)
        if "ngram" in what:
            from mlops_realtime_data_ingestion_spark.operators.dedup import (
                ngram_jaccard_pairs,
            )

            row = {}
            # no-cache FIRST: the cached variant's persisted prefix
            # frame would otherwise serve the identical subtree in
            # the no-cache plan and fake its number
            for mode, flag in [("nocache", False), ("cache", True)]:
                spark.catalog.clearCache()
                row[mode] = _best_of_2(
                    lambda: ngram_jaccard_pairs(
                        docs, "doc_id", "text", n=2, threshold=0.5,
                        cache_prefix=flag,
                    )
                )
            spark.catalog.clearCache()
            out.setdefault("ngram_prefix_cache", {})[label] = row
            print(f"{label:6s} ngram cache-vs-no {row}", flush=True)
        if "countmode" in what:
            from mlops_realtime_data_ingestion_spark.operators.curation import (
                cdc_chunk_dedup,
                duplicate_passage_spans,
            )

            for opname, fn in [
                ("cdc", cdc_chunk_dedup),
                ("passages", duplicate_passage_spans),
            ]:
                row = {}
                for mode in ("window", "join"):
                    row[mode] = _best_of_2(
                        lambda: fn(docs, "doc_id", "text", count_mode=mode)
                    )
                out.setdefault("countmode", {}).setdefault(opname, {})[label] = row
                print(f"{label:6s} {opname} count_mode {row}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
