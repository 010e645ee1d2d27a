"""Static-plan broadcast audit (round 7): two driver-OOM incidents
this round came from the same root cause — Catalyst estimates a
post-explode / post-Arrow-UDF frame at its PRE-explode scan size, so
the static planner broadcasts frames that are corpus-sized at 100 TB.
This tool builds every registry query against the 100x dataset and
flags any BroadcastExchange whose build subtree contains a Generate
(explode) or a Python/Arrow eval node — the signature of a
misestimated broadcast. Genuine small dims (broadcast centroids,
rate tables, benchmark shingle sets, 1-row stats frames) don't trip
it unless they also explode, in which case they deserve a look.

Run: python tools/broadcast_audit.py [sf_dir]   (plan-build only,
no query executes; queries that execute work during CONSTRUCTION are
bounded by a per-query alarm and reported as skipped).
"""

from __future__ import annotations

import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUSPECT = ("Generate", "ArrowEvalPython", "BatchEvalPython",
           "MapInPandas", "FlatMapGroupsInPandas")


def _indent(line: str) -> int:
    n = 0
    for ch in line:
        if ch in " :+|-":
            n += 1
        else:
            break
    return n


def flagged_broadcasts(plan: str) -> list[str]:
    """BroadcastExchange nodes whose subtree contains a suspect node."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        base = _indent(line)
        sub = []
        for nxt in lines[i + 1:]:
            if _indent(nxt) <= base and nxt.strip():
                break
            sub.append(nxt)
        hits = sorted({s for s in SUSPECT if any(s in x for x in sub)})
        if hits:
            out.append("+".join(hits))
    return out


class _Timeout(Exception):
    pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from mlops_realtime_data_ingestion_spark.session import get_spark

    spark = get_spark("broadcast-audit", shuffle_partitions=8)
    flagged, clean, skipped = {}, 0, []
    timed_out = [False]

    def _alarm(signum, frame):
        timed_out[0] = True
        raise _Timeout()

    signal.signal(signal.SIGALRM, _alarm)
    # 180 s alarm (round 10; was 90): five rows that execute real
    # construction work (cc fixpoint, index builds at first touch,
    # the streaming drain) crossed 90 s at the 100x input and were
    # skipped as Py4JError — the alarm had landed MID py4j call, so
    # the timeout surfaced as the py4j exception, mislabeling the
    # skip reason. timed_out[] disambiguates.
    for name, spec in sorted(all_specs().items()):
        try:
            timed_out[0] = False
            signal.alarm(180)
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            signal.alarm(0)
        except _Timeout:
            skipped.append(name)
            # the alarm can land MID py4j call, leaving the gateway
            # socket desynchronized — every later call then dies with
            # Py4JNetworkError (observed round 8). Probe the session
            # and rebuild it if the gateway is poisoned.
            try:
                spark.range(1).count()
            except Exception:
                spark.stop()
                spark = get_spark("broadcast-audit", shuffle_partitions=8)
            continue
        except Exception as ex:  # noqa: BLE001 - audit must not die
            signal.alarm(0)
            skipped.append(
                f"{name}:timeout" if timed_out[0]
                else f"{name}:{type(ex).__name__}"
            )
            try:
                spark.range(1).count()
            except Exception:
                spark.stop()
                spark = get_spark("broadcast-audit", shuffle_partitions=8)
            continue
        hits = flagged_broadcasts(plan)
        if hits:
            flagged[name] = hits
            print(f"FLAG {name}: {hits}", flush=True)
        else:
            clean += 1
    signal.alarm(0)
    print(json.dumps({
        "flagged": flagged, "clean": clean, "skipped": skipped,
    }))


if __name__ == "__main__":
    main()
