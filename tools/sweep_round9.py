"""Round-9 measurement sweep: the containment direction-2 probe
prefilter ON vs OFF across batch/corpus ratios (VERDICT r8 task 4 —
the auto default needs a measured break-even, not a static OFF tuned
to the 20%-batch registry shape), plus the banded embedding dedup's
candidate accounting across scales (VERDICT r8 task 1).

Run: python tools/sweep_round9.py [data_dir ...]
Defaults to the 100x checkpoint (/root/repo/.data/sf10).
Prints one JSON line per measurement; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mlops_realtime_data_ingestion_spark.operators.dedup import (  # noqa: E402
    containment_index_build,
    containment_pairs_incremental,
)
from mlops_realtime_data_ingestion_spark.session import get_spark  # noqa: E402
from mlops_realtime_data_ingestion_spark.sources.batch import load_table  # noqa: E402


def _time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def sweep_prefilter(spark, data_dir: str) -> None:
    docs = load_table(spark, data_dir, "documents")
    for mod, label in [(5, "20pct"), (20, "5pct"), (50, "2pct")]:
        corpus = docs.filter(F.col("doc_id") % mod != 0)
        batch = docs.filter(F.col("doc_id") % mod == 0)
        idx = tempfile.mkdtemp(prefix=f"sweep9_cont_{label}_")
        try:
            containment_index_build(corpus, idx, n=3)
            for knob in (False, True):
                best = None
                for _ in range(2):
                    dt = _time_noop(
                        containment_pairs_incremental(
                            idx, batch, n=3, threshold=0.6,
                            corpus_is_index=True,
                            prefilter_corpus_probes=knob,
                        )
                    )
                    best = dt if best is None else min(best, dt)
                print(json.dumps({
                    "measure": "containment_index_serve",
                    "dir": data_dir, "batch": label,
                    "prefilter": knob, "best_of_2_sec": round(best, 3),
                }))
        finally:
            shutil.rmtree(idx, ignore_errors=True)


def sweep_embedding_lsh(spark, data_dir: str) -> None:
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        embedding_lsh_accounting,
        embedding_lsh_pairs,
    )

    emb = load_table(spark, data_dir, "embeddings")
    best = None
    for _ in range(2):
        dt = _time_noop(
            embedding_lsh_pairs(
                emb, threshold=0.3, n_tables=4, block_cols=("label",)
            )
        )
        best = dt if best is None else min(best, dt)
    acc = embedding_lsh_accounting(
        emb, threshold=0.3, n_tables=4, block_cols=("label",)
    )
    print(json.dumps({
        "measure": "embedding_lsh", "dir": data_dir,
        "best_of_2_sec": round(best, 3), **acc,
    }))


def main() -> None:
    dirs = sys.argv[1:] or ["/root/repo/.data/sf10"]
    spark = get_spark("sweep_round9")
    for d in dirs:
        if not os.path.isdir(d):
            print(json.dumps({"skip": d, "reason": "missing"}))
            continue
        sweep_embedding_lsh(spark, d)
        sweep_prefilter(spark, d)


if __name__ == "__main__":
    main()
