"""Registry hygiene: structural contracts every registered query must
hold for the driver's harness to be able to check it.

The driver canonicalizes results with pandas (sort_values + hash);
array/map/struct cells are unhashable there, so every ORACLED query
must produce a flat schema (atomic column types only). Round 2 lost a
checked slot to exactly this (``embedding_normalize_quantize`` emitted
``array<int>`` and the driver recorded an err instead of a result) —
this test makes the bug class unrepresentable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

_SPECS = all_specs()
_ORACLED = sorted(n for n, s in _SPECS.items() if s.oracle is not None)

# Analysis-only schema resolution needs a real table dir but never
# executes the query (DataFrame construction is lazy).
_SF_DIR = "/root/testdata/sf0.001"

_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", _ORACLED)
def test_oracled_query_schema_is_flat(spark, name):
    df = _SPECS[name].fn(spark, _SF_DIR)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _NESTED)
    ]
    assert not bad, (
        f"{name} outputs non-flat columns {bad} — the driver's "
        f"canonicalizer cannot hash array/map/struct cells; serialize "
        f"them (concat_ws/to_json) at the query edge"
    )


def test_never_driver_checked_enumerate_first():
    """The driver checks the first N enumerated queries each round;
    ordering must surface never-green and changed-this-round queries
    before already-green ones, with oracled (strong check) ahead of
    rows-only (weak), and the green tier ordered by last-green round
    ASCENDING (VERDICT r8 task 2). The recheck tiers (_LAST_RED,
    _ORACLE_NEEDS_FIRST_CHECK, _CHANGED_R13) are allowed ahead of
    everything — their old green rows no longer certify the code."""
    from mlops_realtime_data_ingestion_spark.plans.registry import (
        _CHANGED_R13,
        _DRIVER_CHECKED,
        _LAST_GREEN,
        _LAST_RED,
        _ORACLE_NEEDS_FIRST_CHECK,
    )

    recheck = _LAST_RED | _ORACLE_NEEDS_FIRST_CHECK | _CHANGED_R13
    names = list(_SPECS)
    seen_checked = False
    seen_rows_only = False
    last_round_seen = 0
    for n in names:
        if n in recheck:
            # recheck tiers may precede unchecked queries
            assert not seen_checked, f"recheck {n} after settled-green queries"
            continue
        if n in _DRIVER_CHECKED:
            seen_checked = True
            rnd = _LAST_GREEN[n]
            assert rnd >= last_round_seen, (
                f"{n} (last green r{rnd}) ranked after a fresher row "
                f"(r{last_round_seen}) — staleness ordering broken"
            )
            last_round_seen = rnd
            continue
        # an unchecked query after any checked one breaks the contract
        assert not seen_checked, f"unchecked {n} ranked after checked queries"
        if _SPECS[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracled unchecked {n} ranked after rows-only unchecked"
            )


def test_round13_sample_prioritizes_changed_then_stalest():
    """VERDICT r11 task 4 + optimization-round re-certification: every
    round-13-changed row (fused PQ trainer / map-side ADC, the
    shuffle_hash verify joins) MUST take a priority slot in the
    50-query driver sample — their old green rows certify code that
    no longer runs. The remaining slots drain the stale backlog in
    (last-green round, name) order: with 13 changed rows, the 9
    remaining r8-era rows plus the stalest 28 r9-era rows fit this
    round, and no row left outside the sample may be staler than any
    non-changed green row inside it."""
    from mlops_realtime_data_ingestion_spark.plans.registry import (
        _CHANGED_R13,
        _LAST_GREEN,
        all_specs,
    )

    names = list(all_specs())
    sample = names[:50]
    # changed rows always re-certify this round
    assert set(_CHANGED_R13) <= set(sample)
    # the rest of the sample is the stalest prefix of the green
    # backlog: nothing inside (non-changed) is fresher than anything
    # left outside
    in_rank = [
        (_LAST_GREEN[n], n) for n in sample
        if n not in _CHANGED_R13 and n in _LAST_GREEN
    ]
    out_rank = [
        (_LAST_GREEN[n], n) for n in names[50:] if n in _LAST_GREEN
    ]
    assert in_rank and out_rank
    assert max(in_rank) < min(out_rank), (
        f"backlog ordering broken: {max(in_rank)} sampled after "
        f"{min(out_rank)} was left out"
    )
    # after this round's sample nothing green predates round 9: the
    # 9 r8-era spillover rows all fit (13 changed + 9 r8 + 28 r9)
    assert max(r for r, _ in in_rank) <= 9
