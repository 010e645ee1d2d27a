"""Reproduce/probe the per-JVM CPU slow mode (SCALE.md round 11).

The round-10 artifact shipped dedup_cdc_chunks at 133.5 s (98.6% CPU,
zero spill, zero GC) while fresh processes measured 11-31 s. Round 11
localized the pathology to per-JVM JIT profile state on the
interpreted-HOF hot path: this tool re-runs the exact shape that
reproduced it — a bench-like query prefix, then a probe query at the
100x input, all in ONE JVM — and prints wall times plus
bench._jvm_health at each step, then (optionally) the two rescue
arms: a fresh SESSION in the same JVM, and a fresh JVM.

The mode is BISTABLE per JVM instance (one instance ran 112-115 s x3,
another 12.5-13.2 s on the identical shape), so a single fast run
does NOT refute the mechanism — run several times when hunting.

Usage:
    python tools/jit_episode_probe.py [--probe dedup_cdc_chunks]
        [--probe-dir /root/repo/.data/sf10]
        [--prefix-dir /root/testdata/sf0.1] [--runs 3] [--arms]

With --arms, after the in-session probe it also measures the probe in
a fresh session (same JVM) and a fresh JVM. Exit code is always 0;
this is an evidence collector, not a gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_noop(spec, spark, data_dir: str) -> float:
    df = spec.fn(spark, data_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    # default probe = the HOF (interpreted-eval) cdc spelling — the
    # exact expression shape that episoded in the r10 artifact. The
    # REGISTRY row has since moved to the Arrow impl (immune), so the
    # probe reconstructs the expr plan directly; any registry query
    # name also works.
    ap.add_argument("--probe", default="cdc_expr")
    ap.add_argument("--probe-dir", default="/root/repo/.data/sf10")
    ap.add_argument("--prefix-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--arms", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE, _fresh_session, _jvm_health, _warm_session
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from mlops_realtime_data_ingestion_spark.session import (
        get_spark,
        hard_reset_jvm,
    )

    specs = all_specs()
    if args.probe == "cdc_expr":
        from types import SimpleNamespace

        from mlops_realtime_data_ingestion_spark.operators.curation import (
            cdc_chunk_dedup,
        )
        from mlops_realtime_data_ingestion_spark.sources.batch import (
            load_table,
        )

        probe = SimpleNamespace(
            fn=lambda sp, d: cdc_chunk_dedup(
                load_table(sp, d, "documents"), divisor=16, impl="expr"
            )
        )
    else:
        probe = specs[args.probe]
    spark = get_spark("jit-episode-probe")
    _warm_session(spark)

    t0 = time.perf_counter()
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        try:
            spec.fn(spark, args.prefix_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # noqa: BLE001 - evidence collector
            print(f"prefix {name} failed: {type(ex).__name__}", flush=True)
    print(
        "\n" + json.dumps(
            {
                "step": "prefix",
                "sec": round(time.perf_counter() - t0, 1),
                "jvm": _jvm_health(spark),
            }
        ),
        flush=True,
    )

    in_session = [
        _time_noop(probe, spark, args.probe_dir) for _ in range(args.runs)
    ]
    print(
        "\n" + json.dumps(
            {
                "step": "probe_same_session",
                "secs": in_session,
                "jvm": _jvm_health(spark),
            }
        ),
        flush=True,
    )

    if not args.arms:
        return

    spark = _fresh_session("jit-probe-fresh-session")
    fresh_sess = [
        _time_noop(probe, spark, args.probe_dir) for _ in range(2)
    ]
    print(
        "\n" + json.dumps(
            {"step": "probe_fresh_session_same_jvm", "secs": fresh_sess}
        ),
        flush=True,
    )

    hard_reset_jvm()
    spark = get_spark("jit-probe-fresh-jvm")
    _warm_session(spark)
    fresh_jvm = [_time_noop(probe, spark, args.probe_dir) for _ in range(2)]
    print(
        "\n" + json.dumps(
            {
                "step": "probe_fresh_jvm",
                "secs": fresh_jvm,
                "jvm": _jvm_health(spark),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
