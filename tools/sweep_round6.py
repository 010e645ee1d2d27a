"""Round-6 scale sweep (VERDICT r5 tasks 4 + 7): best-of-2 noop-sink
timings at sf0.1 / 10x / 100x for the four round-5 queries absent
from the round-5 sweep, plus a re-measure of the three small 100x
regressions VERDICT flagged as suspected session interference
(w1_train_test_split, a8_ordered_gather, metrics_rmse_wql — none of
their code changed in round 5). Also prints candidate-vs-survivor
accounting for containment at every scale so its rare-prefix probe
growth is measured, not argued.

Run: python tools/sweep_round6.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRAGGLERS = [
    "dedup_containment",
    "interval_overlap_orders",
    "sample_temperature_mixture",
    "streaming_record_highs",
]
REGRESSIONS = ["w1_train_test_split", "a8_ordered_gather", "metrics_rmse_wql"]

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "10x": "/root/repo/.data/sf1",
    "100x": "/root/repo/.data/sf10",
}


def main() -> None:
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_accounting,
    )
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from mlops_realtime_data_ingestion_spark.session import get_spark
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    spark = get_spark("sweep-r6")
    specs = all_specs()
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {"timings": {}, "rows": {}, "containment_accounting": {}}
    for label, d in SCALES.items():
        if not os.path.isdir(d):
            continue
        for name in STRAGGLERS + (REGRESSIONS if label == "100x" else []):
            spec = specs.get(name)
            if spec is None:
                continue
            best, rows = None, None
            for _ in range(2):
                df = spec.fn(spark, d)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows = spec.fn(spark, d).count()
            out["timings"].setdefault(name, {})[label] = round(best, 3)
            out["rows"].setdefault(name, {})[label] = rows
            print(f"{label:6s} {name:32s} {best:7.3f}s rows={rows}", flush=True)
        try:
            docs = load_table(spark, d, "documents")
            acct = containment_accounting(
                docs, id_col="doc_id", text_col="text", n=3, threshold=0.6
            )
            out["containment_accounting"][label] = acct
            print(f"{label:6s} containment accounting: {acct}", flush=True)
        except Exception as ex:  # a crashed accounting must not kill the sweep
            print(f"{label:6s} containment accounting FAILED: {ex}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
