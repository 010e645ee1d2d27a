"""Adjudicate the IVF-PQ lifecycle inflation at 100x (VERDICT r11
task 1).

Round 11 isolated every bench scale section in its own JVM
(session.hard_reset_jvm) and the 100x ivfpq_lifecycle rows moved:
build 29.6 -> 51.6 s, serve 1.99 -> 3.37 s vs the round-10 artifact,
with nothing in SCALE.md explaining it. The hypothesis this probe
tests: through round 10 the 100x section REUSED the JVM that had
already run the same lifecycle at sf0.1 and 10x, so the lifecycle's
own generated classes were JIT-compiled before the 100x timing
started; with per-section JVM isolation, the 100x lifecycle's first
execution pays its own cold-JIT/first-touch cost.

Two arms, each in a brand-new JVM with the input warm-scanned first:

- **A (cold-first)**: lifecycle at the 100x input N times
  consecutively. Run 1 vs runs 2..N separates first-execution cost
  from same-JVM steady state at constant scale.
- **B (r10-mimic)**: lifecycle once at a SMALL input (sf0.1), then at
  the 100x input N-1 times. If B's first 100x run lands near A's
  steady state instead of A's run 1, the inflation is the one-time
  JIT/first-touch of the lifecycle's code paths — amortized in r10 by
  the earlier sections, newly charged to the 100x section under
  isolation — and NOT a scale-dependent regression.

Each lifecycle run = ivfpq_build into a fresh temp dir (timed) +
best-of-2 ivfpq_search (timed), exactly bench._ivfpq_lifecycle's
accounting, with bench._jvm_health (JIT compile ms, loaded classes)
recorded around every run. JSON lines on stdout; exit code always 0
— evidence collector, not a gate.

Usage:
    python tools/ivfpq_lifecycle_probe.py [--dir /root/repo/.data/sf10]
        [--small-dir /root/testdata/sf0.1] [--runs 3] [--arm A|B|both]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _lifecycle_once(spark, data_dir: str) -> dict:
    from pyspark.sql import functions as F

    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_search,
    )
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    emb = load_table(spark, data_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = tempfile.mkdtemp(prefix="ivfpq_probe_")
    try:
        t0 = time.perf_counter()
        ivfpq_build(emb, idx, dim=64, coarse_k=4, m=4, pq_k=4, iters=2)
        build = time.perf_counter() - t0
        serves = []
        for _ in range(2):
            t0 = time.perf_counter()
            ivfpq_search(
                spark, idx, queries, dim=64, m=4, nprobe=2, k=5
            ).write.format("noop").mode("overwrite").save()
            serves.append(round(time.perf_counter() - t0, 3))
        return {
            "build_sec": round(build, 3),
            "serve_sec": min(serves),
            "serve_runs": serves,
        }
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _arm(name: str, steps: list[tuple[str, str]]) -> None:
    """steps: list of (label, data_dir); runs in ONE brand-new JVM."""
    from bench import _jvm_health, _warm_scan, _warm_session
    from mlops_realtime_data_ingestion_spark.session import (
        get_spark,
        hard_reset_jvm,
    )

    hard_reset_jvm()
    spark = get_spark(f"ivfpq-probe-{name}")
    _warm_session(spark)
    for d in {d for _, d in steps}:
        _warm_scan(spark, d)
    for label, data_dir in steps:
        h0 = _jvm_health(spark)
        r = _lifecycle_once(spark, data_dir)
        h1 = _jvm_health(spark)
        rec = {
            "arm": name,
            "step": label,
            "dir": data_dir,
            **r,
            "jit_ms_before": (h0 or {}).get("jit_total_compile_ms"),
            "jit_ms_after": (h1 or {}).get("jit_total_compile_ms"),
            "classes_after": (h1 or {}).get("classes_loaded"),
        }
        sys.stdout.write("\n" + json.dumps(rec) + "\n")
        sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/repo/.data/sf10")
    ap.add_argument("--small-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--arm", choices=["A", "B", "both"], default="both")
    args = ap.parse_args()

    if args.arm in ("A", "both"):
        _arm("A", [(f"100x_run{i+1}", args.dir) for i in range(args.runs)])
    if args.arm in ("B", "both"):
        steps = [("small_warmup", args.small_dir)]
        steps += [(f"100x_run{i+1}", args.dir) for i in range(args.runs - 1)]
        _arm("B", steps)


if __name__ == "__main__":
    main()
