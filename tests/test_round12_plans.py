"""Round-12 pins: ADVICE r11 fixes + the per-row episode trigger and
the Arrow chunking-family extensions (VERDICT r11 tasks 2-3)."""

from __future__ import annotations

import os

import pytest


# ---------------------------------------------------------------
# ADVICE r11: data_token must see an in-place part-file rewrite
# inside a partitionBy subdirectory (key=value/ layout) — the subdir's
# own mtime and total size are unchanged by such a rewrite, so only
# one-level recursion catches it.
# ---------------------------------------------------------------

def test_data_token_sees_partitioned_inplace_rewrite(tmp_path):
    from mlops_realtime_data_ingestion_spark.plans.index_cache import data_token

    root = tmp_path / "documents.parquet"
    sub = root / "lang=en"
    sub.mkdir(parents=True)
    part = sub / "part-00000.parquet"
    part.write_bytes(b"v1-payload")
    t1 = data_token(str(tmp_path), "documents")

    sub_st = sub.stat()
    part_st = part.stat()
    # in-place rewrite: SAME byte length, SAME name -> subdir mtime and
    # cumulative size are unchanged; only the nested file's mtime moves
    part.write_bytes(b"v2-payload")
    os.utime(part, ns=(part_st.st_mtime_ns + 10_000_000_000,) * 2)
    os.utime(sub, ns=(sub_st.st_mtime_ns, sub_st.st_mtime_ns))
    t2 = data_token(str(tmp_path), "documents")
    assert t1 != t2, "nested in-place rewrite must bust the fingerprint"

    # and stability: re-stat without changes -> identical token
    assert data_token(str(tmp_path), "documents") == t2


# ---------------------------------------------------------------
# VERDICT r11 task 2: the per-row episode trigger replaces the fixed
# 90 s insurance cap. Thresholds pinned here like the superlinear
# rule: 3x the row's own prior-round best, floor 15 s, 90 s backstop.
# ---------------------------------------------------------------

def test_episode_cap_thresholds():
    from bench import (
        EPISODE_FLOOR_S,
        EPISODE_MEDIAN_FACTOR,
        SCALE100_RERUN_CAP_S,
        episode_cap_s,
    )

    assert EPISODE_MEDIAN_FACTOR == 3.0
    assert EPISODE_FLOOR_S == 15.0
    assert SCALE100_RERUN_CAP_S == 90.0

    # no prior (first round / new query) -> old backstop behavior
    assert episode_cap_s(None) == 90.0
    assert episode_cap_s(0.0) == 90.0
    assert episode_cap_s(-1.0) == 90.0
    # sub-5 s steady states get the floor, not 3x jitter sensitivity
    assert episode_cap_s(2.5) == 15.0
    assert episode_cap_s(4.9) == 15.0
    # mid-range rows get 3x their own prior — the 30-89 s window the
    # fixed cap missed (r11 run 3: dedup_containment_incremental
    # 42.6 s vs its ~13 s steady state -> cap 39 would have fired)
    assert episode_cap_s(10.0) == 30.0
    assert episode_cap_s(13.0) == 39.0
    assert episode_cap_s(20.0) == 60.0
    # a prior that was ITSELF an episode clamps at the backstop
    assert episode_cap_s(45.0) == 90.0
    assert episode_cap_s(1000.0) == 90.0


def test_prior_scale100_loader(tmp_path, monkeypatch):
    import bench

    # loader reads BENCH_DETAIL.json next to bench.py; point it at a
    # temp copy via __file__ monkeypatching
    detail = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))

    # absent file -> empty (backstop everywhere)
    assert bench._prior_scale100_queries() == {}

    import json

    detail.write_text(json.dumps({
        "scale100": {
            "factor_vs_sf": 100.0,
            "queries": {"q_fast": 2.5, "q_mid": 20.0, "q_bad": -1,
                        "q_str": "nan"},
        }
    }))
    got = bench._prior_scale100_queries()
    assert got == {"q_fast": 2.5, "q_mid": 20.0}

    # wrong scale factor -> priors are incomparable -> empty
    detail.write_text(json.dumps({
        "scale100": {"factor_vs_sf": 10.0, "queries": {"q": 5.0}}
    }))
    assert bench._prior_scale100_queries() == {}

    # corrupt file -> empty, never a crash
    detail.write_text("{not json")
    assert bench._prior_scale100_queries() == {}
