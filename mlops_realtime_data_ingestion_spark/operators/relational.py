"""Relational operator recipes (SURVEY.md §2.3, §2.5, §2.6).

The reference contains no relational joins in code (SURVEY.md §2.3) —
J1 (dedup anti-join) and J2 (positional zip) are the join-like
semantics it exercises; the engine exposes the full Spark join family
so a reference user has every query shape available.

Scale notes baked into each recipe:
- dimension joins broadcast (`F.broadcast`) — no shuffle of the fact
  side; Catalyst/AQE would usually pick this, the hint makes it a
  contract.
- top-k never global-sorts: `Window`-free `orderBy().limit(k)` lets
  Spark run TakeOrderedAndProject — per-partition heaps + driver
  merge of k rows, O(n) not O(n log n), no full shuffle.
- positional zip (J2) joins on `row_number` over an explicit total
  order — never `monotonically_increasing_id`, which is
  partitioning-dependent (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "broadcast_dim_join",
    "top_k",
    "global_rank",
    "positional_zip",
    "consecutive_islands",
    "asof_join",
    "asof_join_cogrouped",
    "range_join",
    "salted_join",
    "interval_overlap_pairs",
]


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Fact-to-dimension equi-join with an explicit broadcast of the
    dim side — zero shuffle on the fact table."""
    return fact.join(F.broadcast(dim), on, how)


def salted_join(
    big: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_src: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: spread each hot key of ``big``
    across ``n_salts`` shuffle partitions.

    The big side gets a deterministic salt derived from ``salt_src``
    (any column that varies WITHIN a key — a row id, a timestamp);
    the right side is replicated n_salts times; the join key becomes
    (keys..., _salt). Row-level results are identical to the plain
    join — salting only changes data placement, which is why the
    registered query oracle is the UNSALTED SQL join.

    Scale rationale: a hash join shuffles both sides on the key, so a
    key holding 10% of 100 TB lands 10 TB on one task. AQE's skew
    handling splits oversized REDUCER partitions, but only for
    sort-merge joins after the fact; explicit salting also covers
    aggregate-over-join pipelines and keeps the choice in the plan.
    Cost: right side is materialized n_salts times — use for
    moderate-size right sides that are too big to broadcast.
    """
    salt = F.pmod(F.crc32(F.col(salt_src).cast("string")), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    right_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(right_s, [*keys, "_salt"], how).drop("_salt")


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O2: latest/top K rows. orderBy().limit(k) compiles to
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    return df.orderBy(*order).limit(k)


def global_rank(
    df: DataFrame, order: list[Column], rank_col: str = "__pos", partitions: int | None = None
) -> DataFrame:
    """Distributed global row_number over a total order — the
    scalable replacement for ``Window.orderBy(...)`` (which funnels
    the whole table through ONE task).

    Two-phase rank, the same scheme as RDD ``zipWithIndex`` but kept
    in the DataFrame world:
      1. ``repartitionByRange`` on the order keys — range partitioner
         guarantees partition i's keys all precede partition i+1's.
      2. per-partition counts -> tiny driver-side prefix sum ->
         broadcast offset map.
      3. ``row_number`` within each range partition + offset.
    Every stage is partition-parallel; the only driver state is one
    integer per partition. Requires ``order`` to be a total order
    (include a unique tiebreaker) for deterministic ranks.
    """
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order).withColumn(
        "__gr_part", F.spark_partition_id()
    )
    # Cache: phase 2's count scan and phase 3's rank both consume it,
    # and re-executing the range shuffle could re-sample boundaries.
    ranged = ranged.localCheckpoint(eager=False)
    counts = sorted(
        (r["__gr_part"], r["cnt"])
        for r in ranged.groupBy("__gr_part").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(offsets, "__gr_part int, __gr_off long")
    w = Window.partitionBy("__gr_part").orderBy(*order)
    return (
        ranged.join(F.broadcast(off_df), "__gr_part")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("__gr_off")).cast("long"))
        .drop("__gr_part", "__gr_off")
    )


def positional_zip(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column],
    right_order: list[Column],
    keep_pos: bool = False,
) -> DataFrame:
    """J2: align two series by position (reference: targets vs
    prediction arrays zipped by index, evaluate.py:60-70). Both sides
    get a global position over an explicit total order, then
    inner-join on the index (kept as ``__pos`` when ``keep_pos``).

    Positions come from :func:`global_rank` (two-phase range rank), so
    neither side funnels through a single task; the join shuffles on
    ``__pos``, which is uniformly distributed by construction — no
    skew."""
    lhs = global_rank(left, left_order)
    rhs = global_rank(right, right_order)
    out = lhs.join(rhs, "__pos", "inner")
    return out if keep_pos else out.drop("__pos")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` per key (Spark has no native ASOF JOIN —
    this is the union-sort-carry-forward composition).

    Plan: tag both sides, union, one window sorted by (key, ts, side)
    with ``last(value, ignorenulls)`` carrying the most recent right
    value forward onto left rows. ONE shuffle on the key — no range
    join explosion, no per-row probe. At 100 TB this is the only
    shape that scales: a naive ``left.ts >= right.ts`` range join is
    O(n*m) within key.

    ``tolerance``: optional max staleness ("30 minutes") — matches are
    nulled when the carried value is older than the window.
    """
    lcols = [c for c in left.columns]
    tagged_l = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in key_cols],
    )
    tagged_r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in key_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_cols = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__carried_{c}")
        for c in value_cols
    ]
    carried_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w).alias("__carried_ts")
    unioned = tagged_l.unionByName(tagged_r).select("*", *carried_cols, carried_ts)
    out = unioned.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = F.col("__carried_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        sel_vals = [
            F.when(fresh, F.col(f"__carried_{c}")).alias(c) for c in value_cols
        ]
    else:
        sel_vals = [F.col(f"__carried_{c}").alias(c) for c in value_cols]
    return out.select(
        *key_cols,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in key_cols and c != left_ts],
        *sel_vals,
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` — the cogrouped-map
    member of the pandas-UDF taxonomy (§2.9), result-identical to
    :func:`asof_join` (asserted in tests/test_asof_chunk.py).

    Plan: both sides shuffle ONCE, co-partitioned on the key; each key
    group is handed to ``pd.merge_asof`` as one Arrow batch.  Pick
    this variant when key groups are small and the carried value set
    is wide (one vectorized merge beats N window-carry columns); pick
    the window-based :func:`asof_join` for skewed keys — it has no
    per-group memory bound.  Contract: ``value_cols`` must not collide
    with left column names (the right timestamp is renamed internally),
    and right timestamps are unique per key (same tie caveat as
    asof_join).
    """
    import pandas as pd

    lcols = list(left.columns)
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    passthrough = [c for c in lcols if c not in key_cols and c != left_ts]
    out_cols = [*key_cols, left_ts, *passthrough, *value_cols]
    schema = ", ".join(
        [f"`{c}` {ltypes[c]}" for c in (*key_cols, left_ts, *passthrough)]
        + [f"`{c}` {rtypes[c]}" for c in value_cols]
    )
    tol = pd.Timedelta(tolerance) if tolerance is not None else None

    # A self-cogroup (both sides carved from the same source frame)
    # shares attribute ids between the sides, and Spark's plan
    # de-aliasing silently DROPS the right side's same-named columns
    # from the cogroup input (observed: right 'ts' vanished when left
    # also had 'ts' from the same scan). Re-projecting the right side
    # under fresh __r_ names breaks the collision.
    right = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in (*key_cols, right_ts, *value_cols)]
    )
    r_keys = [f"__r_{c}" for c in key_cols]
    rts, rvals = f"__r_{right_ts}", [f"__r_{c}" for c in value_cols]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=out_cols)
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rpdf = rpdf[[rts, *rvals]].sort_values(rts, kind="mergesort")
        merged = pd.merge_asof(
            lpdf, rpdf,
            left_on=left_ts, right_on=rts,
            direction="backward", tolerance=tol,
        )
        merged = merged.rename(columns={rv: c for rv, c in zip(rvals, value_cols)})
        return merged[out_cols]

    return (
        left.groupBy(*key_cols)
        .cogroup(right.groupBy(*r_keys))
        .applyInPandas(merge, schema=schema)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Interval-containment join (``start <= point < end``) that
    scales: Spark plans a bare inequality join as
    BroadcastNestedLoopJoin — O(n·m) probes and a broadcast of a
    whole side. Instead each interval is exploded onto the time
    buckets it covers and each point lands in exactly ONE bucket, so
    the match becomes an equi shuffle join on the bucket key plus a
    residual containment filter. Each qualifying (point, interval)
    pair meets in exactly the point's bucket — no dedup needed.

    Cost model: shuffle = |points| + |intervals| · (span/bucket + 1).
    Pick ``bucket_seconds`` ≈ the median interval span so the
    explosion factor stays ≈ 2; hot buckets (skewed days) are split
    by AQE skew-join handling.

    ``key_cols``: optional extra equi keys (same names on both sides,
    e.g. a per-user attribution join) — they join alongside the
    bucket, tightening the shuffle and the probe.

    Output: all columns of ``points`` then ``intervals`` (non-key
    names must be disjoint).
    """
    keys = key_cols or []
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"range_join requires disjoint columns, got {overlap}")
    pb = (F.unix_timestamp(F.col(point_col)) / bucket_seconds).cast("long")
    sb = (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long")
    eb = (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long")
    p = points.withColumn("__bkt", pb)
    iv = intervals.withColumn("__bkt", F.explode(F.sequence(sb, eb)))
    return (
        p.join(iv, ["__bkt", *keys])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bkt")
    )


def consecutive_islands(
    df: DataFrame,
    order_col: str,
    flag_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Gaps-and-islands: group consecutive flagged rows (ordered by
    ``order_col``) into islands; returns island start/end/length.

    Mirrors the reference's CloudWatch alarm semantics — wQL >=
    threshold for N consecutive hourly periods
    (model-monitor-template.yml:786-795).
    """
    parts = partition_cols or []
    w_all = Window.partitionBy(*parts).orderBy(order_col)
    w_flag = Window.partitionBy(*parts, flag_col).orderBy(order_col)
    grouped = (
        df.withColumn("__rn_all", F.row_number().over(w_all))
        .withColumn("__rn_flag", F.row_number().over(w_flag))
        .withColumn("__island", F.col("__rn_all") - F.col("__rn_flag"))
    )
    return (
        grouped.filter(F.col(flag_col))
        .groupBy(*parts, "__island")
        .agg(
            F.min(order_col).alias("island_start"),
            F.max(order_col).alias("island_end"),
            F.count("*").alias("island_len"),
        )
        .drop("__island")
    )


def interval_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_cols: list[str],
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Self interval-overlap join: all pairs of rows with equal
    ``key_cols`` whose closed [start, end] intervals intersect,
    deduplicated to one direction by lexicographic ``id_cols`` order.
    The interval-INTERVAL sibling of :func:`range_join` (point in
    interval): concurrent-session detection, meeting collision,
    overlapping-visit analytics.

    A plain key equi-join with the overlap residual is correct but
    per-key quadratic; here both sides explode into the time buckets
    they COVER (floor(start/B) .. floor(end/B)) and equi-join on
    (key, bucket) — two overlapping intervals share the bucket of any
    common instant, so the blocking is lossless, while non-overlapping
    interval pairs meet only if they land in the same bucket (a
    bounded neighborhood, not the whole key group). Duplicate hits
    from multi-bucket overlaps collapse via distinct on the pair ids.
    Bucket width trades fan-out (intervals spanning many buckets)
    against candidate density; ~the typical interval length is right.

    Epoch-second integer math throughout — no float in the predicate.
    """
    base = df.select(
        *key_cols, *id_cols,
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    )
    bucketed = base.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / bucket_seconds),
                F.floor(F.col("e") / bucket_seconds),
            )
        ),
    )
    a = bucketed.select(
        *key_cols, "bkt",
        *[F.col(c).alias(f"{c}_a") for c in id_cols],
        F.col("s").alias("s_a"), F.col("e").alias("e_a"),
    )
    b = bucketed.select(
        *key_cols, "bkt",
        *[F.col(c).alias(f"{c}_b") for c in id_cols],
        F.col("s").alias("s_b"), F.col("e").alias("e_b"),
    )
    # lexicographic (id_a < id_b): one direction per unordered pair
    lt = F.lit(False)
    for c in reversed(id_cols):
        lt = (F.col(f"{c}_a") < F.col(f"{c}_b")) | (
            (F.col(f"{c}_a") == F.col(f"{c}_b")) & lt
        )
    pairs = (
        a.join(b, [*key_cols, "bkt"])
        .filter(lt)
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        .drop("bkt")
        .distinct()
    )
    return pairs.select(
        *key_cols,
        *[f"{c}_a" for c in id_cols],
        *[f"{c}_b" for c in id_cols],
        F.greatest("s_a", "s_b").alias("ov_start"),
        F.least("e_a", "e_b").alias("ov_end"),
        (F.least("e_a", "e_b") - F.greatest("s_a", "s_b")).alias("ov_seconds"),
    )
