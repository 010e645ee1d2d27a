"""Root-cause probe for mid-section session inflation (round 10).

Rounds 8-10 all observed the same signature: inside a long bench
section, individual queries read 1.5-9x their fresh-session steady
state (dedup_cdc_chunks 111.8 s in the r9 artifact, dedup_simhash
9.4 s in r10 run 1) while re-running the same query in a fresh
session restores the steady state. Per-scale fresh sessions (round 9)
shrank but did not eliminate it; the UI A/B (SCALE.md round 10) ruled
out the REST server.

This tool replays the 100x headline sequence in ONE session (UI on)
and records, per query: wall seconds, the window's stage-level
executor run / JVM GC / spill totals from the REST API, and the
JVM's RSS afterward. Then it re-runs a fixed SENTINEL subset (the
queries that inflated in past artifacts) a second time at the END of
the session: sentinel_end / sentinel_start >> 1 with growing GC share
says heap/GC geometry; flat GC but growing wall says scheduler/page
cache; flat everything says the inflation needs cross-section state
(streaming/live phases) to reproduce.

Usage: python tools/session_inflation_probe.py [sf_dir]
Prints one JSON line; human summary on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTINELS = [
    "dedup_simhash",
    "dedup_cdc_chunks",
    "doc_chunk_sliding",
    "dedup_containment_incremental",
    "ts_ewma_smooth",
]


def _rest(path: str):
    import urllib.request

    base = "http://localhost:4040/api/v1"
    return json.loads(urllib.request.urlopen(base + path, timeout=10).read())


def _app_id() -> str:
    return _rest("/applications")[0]["id"]


def _stage_totals(app_id: str, t0: float, t1: float) -> dict:
    from bench import _pick_stages

    try:
        stages = _rest(f"/applications/{app_id}/stages?status=complete")
    except Exception:
        return {}
    win = _pick_stages(stages, t0, t1, max_stages=10_000)
    return {
        "run_ms": sum(s["run_ms"] or 0 for s in win),
        "gc_ms": sum(s["gc_ms"] or 0 for s in win),
        "spill_disk_b": sum(s["spill_disk_b"] or 0 for s in win),
        "n_stages": len(win),
    }


def _jvm_rss_mb() -> int | None:
    try:
        import subprocess

        out = subprocess.check_output(
            ["ps", "-o", "rss=", "-C", "java"], text=True
        )
        return int(max(int(x) for x in out.split()) / 1024)
    except Exception:
        return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"
    from bench import HEADLINE, _warm_scan, _warm_session

    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from mlops_realtime_data_ingestion_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark("inflation-probe", extra_conf={"spark.ui.enabled": "true"})
    _warm_session(spark)
    _warm_scan(spark, sf_dir)
    app_id = _app_id()
    specs = all_specs()

    def timed(name: str) -> dict | None:
        spec = specs.get(name)
        if spec is None:
            return None
        try:
            df = spec.fn(spark, sf_dir)
            w0 = time.time()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 2)
            w1 = time.time()
        except Exception as ex:  # noqa: BLE001
            return {"err": type(ex).__name__}
        rec = {"sec": sec, **_stage_totals(app_id, w0, w1)}
        rec["rss_mb"] = _jvm_rss_mb()
        return rec

    start: dict[str, dict] = {}
    for name in SENTINELS:
        r = timed(name)
        if r:
            start[name] = r

    body: dict[str, dict] = {}
    for name in HEADLINE:
        if name in SENTINELS:
            continue
        r = timed(name)
        if r:
            body[name] = r

    end: dict[str, dict] = {}
    for name in SENTINELS:
        r = timed(name)
        if r:
            end[name] = r

    out = {"sf_dir": sf_dir, "sentinel_start": start, "body": body,
           "sentinel_end": end}
    print(json.dumps(out))
    for name in SENTINELS:
        a, b = start.get(name, {}), end.get(name, {})
        if "sec" in a and "sec" in b:
            gc_a = (a.get("gc_ms") or 0) / max(a.get("run_ms") or 1, 1)
            gc_b = (b.get("gc_ms") or 0) / max(b.get("run_ms") or 1, 1)
            print(
                f"{name}: start {a['sec']}s (gc {gc_a:.1%}, rss {a.get('rss_mb')}MB)"
                f" -> end {b['sec']}s (gc {gc_b:.1%}, rss {b.get('rss_mb')}MB)"
                f" = {b['sec'] / max(a['sec'], 0.01):.2f}x",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
