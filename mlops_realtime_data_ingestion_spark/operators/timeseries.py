"""Time-series preparation operators (SURVEY.md §2.5, §2.4 A8).

The reference's training pipeline materializes an ordered 1-minute
series, slices train/test/validation windows off the end, and
serializes DeepAR JSONL (pipelines/blockchain/preprocess.py:93-167).
Those pandas idioms become window-function plans here — no driver
materialization, order defined by explicit sort keys.

Scale note: a global ``row_number`` (no partition) is a single-task
funnel. These operators accept ``series_cols`` so that at 100 TB the
rank runs per series key (the realistic layout: many series, each of
bounded length). With no key they still work for the reference's
single-series case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ordered_rank",
    "tail_split",
    "expanding_windows",
    "dynamic_split_sizing",
    "forecast_index",
    "ordered_gather",
    "lag_bucketed",
    "sessionize",
    "ewma_smooth",
    "gapfill_interpolate",
    "seasonal_decompose",
    "mad_anomalies",
]


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Batch sessionization by inactivity gap — the offline analogue
    of Structured Streaming's ``session_window`` (which the engine
    exposes for the streaming path): a new session starts when the
    gap to the previous event exceeds ``gap_seconds``.

    lag -> boundary flag -> running sum = session ordinal; one
    shuffle on the key, everything else rides the same sorted window.
    Gap math runs on whole epoch seconds so the boundary decision is
    engine-exact.

    Returns one row per session: key, session_seq, session_start/end
    (epoch seconds), n_events.
    """
    epoch = F.unix_timestamp(ts_col).cast("long")
    flagged = (
        df.withColumn("__ep", epoch)
        .withColumn("__prev", F.lag("__ep").over(
            Window.partitionBy(*key_cols).orderBy(F.col(ts_col), F.col(tiebreak_col))
        ))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("__ep") - F.col("__prev") > gap_seconds),
                1,
            ).otherwise(0),
        )
    )
    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_seq", F.sum("__new").over(w_run))
    return sessions.groupBy(*key_cols, "session_seq").agg(
        F.min("__ep").alias("session_start"),
        F.max("__ep").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def _window(series_cols: list[str], order: list[Column]):
    return Window.partitionBy(*series_cols).orderBy(*order)


def ordered_rank(
    df: DataFrame, order: list[Column], series_cols: list[str] | None = None
) -> DataFrame:
    """Adds ``__rn`` (1-based from the start) and ``__rn_end``
    (1-based from the end) — the primitives behind every reference
    slice ``df[:-k]`` / ``df[-k:]`` (preprocess.py:119-121)."""
    series_cols = series_cols or []
    w = _window(series_cols, order)
    n = F.count("*").over(Window.partitionBy(*series_cols))
    return df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__rn_end", n - F.col("__rn") + 1
    )


def tail_split(
    df: DataFrame,
    order: list[Column],
    test_length: int,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """W1: train/test split — last ``test_length`` points are 'test'
    (preprocess.py:119-121: df[-test_length:] / df[:-test_length])."""
    ranked = ordered_rank(df, order, series_cols)
    return ranked.withColumn(
        "split",
        F.when(F.col("__rn_end") <= test_length, F.lit("test")).otherwise("train"),
    ).drop("__rn", "__rn_end")


def expanding_windows(
    df: DataFrame,
    order: list[Column],
    n_windows: int,
    window_length: int,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """W2: expanding validation windows (preprocess.py:129-146): for
    k = 1..N the prefix df[0 : len - (N-k)*L], each tagged with k.
    One shuffle for the rank, then a lateral fan-out — no N-pass scan.
    """
    ranked = ordered_rank(df, order, series_cols)
    series_cols = series_cols or []
    n_total = Window.partitionBy(*series_cols)
    ranked = ranked.withColumn("__n", F.count("*").over(n_total))
    ks = F.explode(F.sequence(F.lit(1), F.lit(n_windows))).alias("k")
    return (
        ranked.select("*", ks)
        .filter(F.col("__rn") <= F.col("__n") - (F.lit(n_windows) - F.col("k")) * window_length)
        .drop("__rn", "__rn_end", "__n")
    )


def dynamic_split_sizing(
    n_points: int,
    prediction_length: int = 5,
    context_length: int = 120,
    n_validation_windows: int = 10,
) -> tuple[int, int]:
    """W3 (driver-side scalars, preprocess.py:104-115): if the series
    is too short for context + (N+1) prediction windows, shrink the
    prediction length to 5% of points and the context to match."""
    if n_points < context_length + prediction_length * (n_validation_windows + 1):
        prediction_length = max(1, int(n_points * 0.05))
        context_length = prediction_length * 2
    return prediction_length, context_length


def forecast_index(
    df: DataFrame,
    ts_col: str,
    periods: int,
    step: str = "1 minute",
    series_cols: list[str] | None = None,
) -> DataFrame:
    """W4: future timestamp index — pd.date_range(last+freq, periods)
    (data_collection/utils.py:86-88) as sequence() + explode."""
    series_cols = series_cols or []
    last = df.groupBy(*series_cols).agg(F.max(ts_col).alias("__last"))
    return last.select(
        *series_cols,
        F.explode(
            F.sequence(
                F.col("__last") + F.expr(f"INTERVAL {step}"),
                F.col("__last") + F.expr(f"INTERVAL {step}") * periods,
                F.expr(f"INTERVAL {step}"),
            )
        ).alias("forecast_ts"),
    )


def lag_bucketed(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column,
    out_col: str = "__lag",
) -> DataFrame:
    """Scalable ``lag(value) OVER (ORDER BY order_col)`` — the global
    window version moves the whole frame through ONE task; this one
    partitions by a coarse bucket that is monotone in ``order_col``
    (e.g. ``date_trunc('day', m)`` for minute rows) and repairs the
    one boundary row per bucket from a tiny driver-side map.

    Plan: per-bucket lag (parallel) + broadcast join of
    {bucket -> previous bucket's last value} (|buckets| rows on the
    driver — days-of-data cardinality, trivially small at any SF).
    """
    b = df.withColumn("__bkt", bucket)
    w = Window.partitionBy("__bkt").orderBy(order_col)
    lagged = b.withColumn(out_col, F.lag(value_col).over(w)).withColumn(
        "__first", F.row_number().over(w) == 1
    )
    # last value of each bucket, keyed by the NEXT bucket it feeds
    last_rows = (
        b.groupBy("__bkt")
        .agg(F.max(F.struct(F.col(order_col), F.col(value_col).alias("__v"))).alias("__s"))
        .select(F.col("__bkt"), F.col("__s.__v").alias("__prev_last"))
        .collect()
    )
    ordered_buckets = sorted((r["__bkt"], r["__prev_last"]) for r in last_rows)
    spark = df.sparkSession
    prev_map = [
        (ordered_buckets[i + 1][0], ordered_buckets[i][1])
        for i in range(len(ordered_buckets) - 1)
    ]
    if prev_map:
        schema = lagged.select(F.col("__bkt"), F.col(out_col).alias("__prev_last")).schema
        prev_df = spark.createDataFrame(prev_map, schema)
        lagged = lagged.join(F.broadcast(prev_df), "__bkt", "left").withColumn(
            out_col,
            F.when(F.col("__first"), F.col("__prev_last")).otherwise(F.col(out_col)),
        ).drop("__prev_last")
    return lagged.drop("__bkt", "__first")


def ordered_gather(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """A8: full ordered series as one array per key — the DeepAR
    ``target`` array (preprocess.py:123-155 list(df[target_col])).

    sort_array(collect_list(struct(order..., value))) keeps ordering
    deterministic without a pre-shuffle sort. Bounded by series
    length, not table size — safe when each series fits an executor
    (SURVEY.md §7 risk register calls out the unbounded case).
    """
    series_cols = series_cols or []
    packed = F.struct(*[F.col(c) for c in order_cols], F.col(value_col).alias("__v"))
    return df.groupBy(*series_cols).agg(
        F.transform(F.sort_array(F.collect_list(packed)), lambda s: s["__v"]).alias(
            "target"
        )
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_points: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-series anomaly flags: rows whose value deviates more than
    ``z_threshold`` sample standard deviations from the rolling mean
    of the PRECEDING ``lookback`` points (the current point never
    contaminates its own baseline).

    The rolling mean/std derive from DECIMAL window sums of v and v²
    (std = sqrt((Σv² - n·mean²)/(n-1))), so the result is exact under
    any partitioning — a float sliding-window sum would drift by ULPs
    between engines and between add/evict strategies.

    Scale: ONE shuffle on the series key; the single per-series sort
    serves both window sums.  Output is anomalies only (plus the
    z-score), so the result tracks anomaly density, not corpus size.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("decimal(18,4)")
    n = F.count(value_col).over(w)
    s1 = F.sum(v).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(28,8)")).over(w).cast("double")
    # try_divide throughout: under ANSI mode a plain division RAISES
    # on the n = 0 / n = 1 / std = 0 rows (they exist in every series
    # head), even though the filter below discards them — predicate
    # short-circuit order is an optimizer artifact, not a guarantee.
    # On the rows that survive the filter (n >= min_points, std > 0)
    # try_divide equals plain division.
    mean = F.try_divide(s1, n)
    var = F.try_divide(s2 - n * mean * mean, n - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.try_divide(F.col(value_col) - mean, std)
    # std == 0 (a constant lookback window) means the value has no
    # scale to deviate against: z is NULL under try_divide (and was
    # ±Inf / NaN under plain division — with NaN ordered ABOVE all
    # numerics, an on-baseline point would have been flagged). The
    # explicit std > 0 filter keeps the contract engine-independent
    # and mirrors the oracle.
    return (
        df.withColumn("__n", n)
        .withColumn("__std", std)
        .withColumn("__z", z)
        .filter(
            (F.col("__n") >= min_points)
            & (F.col("__std") > 0)
            & (F.abs(F.col("__z")) > z_threshold)
        )
        .select(
            *series_cols,
            ts_col,
            value_col,
            F.round("__z", 6).alias("zscore"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    lags: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-series exponentially-weighted moving average (alpha = 1/2,
    pandas ``ewm(adjust=True)`` semantics truncated to ``lags``
    terms): s_t = sum_j w_j x_{t-j} / sum_j w_j with w_j = 2^-j over
    the available history, j < lags. The 2^-lags tail that truncation
    drops is below one cent of weight for lags >= 20 — and truncation
    is what makes the statistic WINDOWABLE (a single ROWS frame)
    instead of an unbounded recursion.

    Exactness contract: alpha = 1/2 makes every weight a power of
    two, so numerator and denominator are exact BIGINT sums of
    value-cents * 2^(lags-1-j) (< 2^40 — far inside the 2^53 double
    mantissa), and the single final division of two exact integers is
    correctly rounded identically in any IEEE engine. A float
    recursion (or float weight products) would drift ULPs per step
    and diverge between engines and partitionings.

    Scale: ONE shuffle on the series key; all ``lags`` lag() columns
    ride the same per-series sort, inside whole-stage codegen. Output
    is one row per input row (pure window map, no reduction).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*series_cols).orderBy(*order)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    base = df.withColumn("__c", cents)
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(lags):
        lj = F.lag("__c", j).over(w) if j else F.col("__c")
        pw = F.lit(1 << (lags - 1 - j)).cast("long")
        num = num + F.coalesce(lj * pw, F.lit(0).cast("long"))
        den = den + F.when(lj.isNotNull(), pw).otherwise(F.lit(0).cast("long"))
    return base.select(
        *series_cols,
        ts_col,
        *( [tiebreak_col] if tiebreak_col else [] ),
        value_col,
        # den*100 un-scales the cents; both operands are exact ints
        (num.cast("double") / (den * 100).cast("double")).alias("ewma"),
    )


def gapfill_interpolate(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-series gap-fill onto a regular time grid with linear
    interpolation — the resampling step every downstream forecaster
    assumes (the reference feeds DeepAR a *dense* 1-minute series,
    pipelines/blockchain/preprocess.py:93-110; real feeds have holes).

    Semantics: bucket timestamps to ``step_seconds``, average observed
    values per (series, bucket), then emit EVERY grid bucket between
    each series' first and last observation; missing buckets get the
    linear interpolation between the surrounding observed buckets.

    Exactness contract: the per-bucket average is (exact BIGINT cent
    sum) / (100 * count) — one correctly-rounded double division — and
    the interpolation weight is a ratio of exact BIGINT second
    offsets, so every emitted double is reproducible bit-for-bit on
    any engine and any partitioning (no running float state).

    Scale: ONE shuffle keyed by the series; the grid explode, both
    fill windows, and the final projection all ride that partitioning.
    Grid size is span/step per series — output scales with
    series-count x span, never with raw event count.
    """
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
              * step_seconds).cast("long")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    obs = (
        df.select(*series_cols, bucket.alias("bucket_s"), cents.alias("__c"))
        .groupBy(*series_cols, "bucket_s")
        .agg(F.sum("__c").alias("c_sum"), F.count("__c").alias("c_cnt"))
    )
    grid = (
        obs.groupBy(*series_cols)
        .agg(F.min("bucket_s").alias("b0"), F.max("bucket_s").alias("b1"))
        .select(
            *series_cols,
            F.explode(
                F.sequence("b0", "b1", F.lit(int(step_seconds)).cast("long"))
            ).alias("bucket_s"),
        )
    )
    joined = grid.join(obs, [*series_cols, "bucket_s"], "left")
    wf = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("bucket_s").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("bucket_s").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ob = F.when(F.col("c_cnt").isNotNull(), F.col("bucket_s"))
    filled = (
        joined
        .withColumn("pb", F.last(ob, ignorenulls=True).over(wf))
        .withColumn("ps", F.last("c_sum", ignorenulls=True).over(wf))
        .withColumn("pn", F.last("c_cnt", ignorenulls=True).over(wf))
        .withColumn("nb", F.first(ob, ignorenulls=True).over(wb))
        .withColumn("ns", F.first("c_sum", ignorenulls=True).over(wb))
        .withColumn("nn", F.first("c_cnt", ignorenulls=True).over(wb))
    )
    # grid spans [first, last] observed bucket, so prev and next always
    # exist; on observed rows pb == nb and the formula degenerates to
    # the exact bucket average.
    py = F.col("ps").cast("double") / (F.col("pn") * 100).cast("double")
    ny = F.col("ns").cast("double") / (F.col("nn") * 100).cast("double")
    frac = F.when(
        F.col("nb") == F.col("pb"), F.lit(0.0)
    ).otherwise(
        (F.col("bucket_s") - F.col("pb")).cast("double")
        / (F.col("nb") - F.col("pb")).cast("double")
    )
    # value_f ships UNROUNDED: py/ny/frac are each one correctly-
    # rounded division of exact integers and the interpolation is the
    # same two IEEE ops in both engines — bit-identical by
    # construction, while round(x, 6) of a full-precision double
    # flips at half-ulp boundaries between engines (seen at sf0.01).
    return filled.select(
        *series_cols,
        "bucket_s",
        (py + (ny - py) * frac).alias("value_f"),
        F.col("c_cnt").isNotNull().alias("observed"),
    )


def seasonal_decompose(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of per-series DAILY
    totals: trend = centered ``period``-day moving average, seasonal =
    per-phase mean of the detrended values, remainder = detrended -
    seasonal. Only interior days (a full, CONSECUTIVE period-window)
    are emitted — a gap in the series excludes the straddling days
    rather than silently averaging non-adjacent weeks.

    Exactness contract: daily totals are exact BIGINT cent sums;
    ``period`` is odd so the centered window is ROWS BETWEEN -h AND h;
    every emitted statistic is a single division of exact BIGINTs
    (detrended keeps the x*period scaling so no intermediate division
    happens), identical on any IEEE engine. remainder is one
    subtraction of two such exact-division doubles.

    Scale: one shuffle to daily grain (massive reduction), one window
    over it, one broadcast join back for the tiny per-phase frame.
    """
    if period % 2 != 1:
        raise ValueError("period must be odd for a single centered window")
    half = period // 2
    day_s = (F.floor(F.unix_timestamp(F.col(ts_col)) / 86400) * 86400).cast("long")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    daily = (
        df.select(*series_cols, day_s.alias("day_s"), cents.alias("__c"))
        .groupBy(*series_cols, "day_s")
        .agg(F.sum("__c").alias("y_c"))
    )
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("day_s").asc())
        .rowsBetween(-half, half)
    )
    scale = period * 100
    interior = (
        daily
        .withColumn("t_sum", F.sum("y_c").over(w))
        .withColumn("t_cnt", F.count("y_c").over(w))
        .withColumn("t_span", F.max("day_s").over(w) - F.min("day_s").over(w))
        # full window AND consecutive days: rows-frames over a gappy
        # series would average non-adjacent weeks
        .filter(
            (F.col("t_cnt") == period)
            & (F.col("t_span") == F.lit(86400 * (period - 1)))
        )
        .withColumn("det_num", F.col("y_c") * period - F.col("t_sum"))
        .withColumn(
            "phase", (F.floor(F.col("day_s") / 86400) % period).cast("int")
        )
    )
    phase_stats = (
        interior.groupBy(*series_cols, "phase")
        .agg(F.sum("det_num").alias("s_num"), F.count("det_num").alias("s_cnt"))
    )
    out = interior.join(F.broadcast(phase_stats), [*series_cols, "phase"])
    detrended = F.col("det_num").cast("double") / F.lit(float(scale))
    seasonal = (
        F.col("s_num").cast("double")
        / (F.col("s_cnt") * scale).cast("double")
    )
    return out.select(
        *series_cols,
        "day_s",
        "phase",
        (F.col("y_c").cast("double") / 100.0).alias("y"),
        (F.col("t_sum").cast("double") / F.lit(float(scale))).alias("trend"),
        seasonal.alias("seasonal"),
        (detrended - seasonal).alias("remainder"),
    )


def mad_anomalies(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    z_threshold: float = 3.5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-series robust outliers by median absolute deviation:
    flag rows where |x - median| / (1.4826 * MAD) > ``z_threshold``.
    The robust complement of rolling_zscore_anomalies — a single
    extreme spike inflates a standard deviation enough to mask ITSELF
    (z caps near sqrt(n) for one outlier); the median/MAD baseline is
    immune to up to 50% contamination.

    Exactness contract: medians are computed positionally on exact
    BIGINT cent values — med2 = c[(n+1)//2] + c[(n+2)//2] (cent-pairs,
    no division), abs-deviations stay in half-cent BIGINTs, mad4
    likewise in quarter-cents — so the single robust-z double division
    2*(2c - med2) / (1.4826 * mad4) is bit-identical on any engine.
    A float percentile would interpolate (a+b)/2 vs a+(b-a)*0.5
    differently across engines.

    NULL ``value_col`` rows are dropped before the median windows:
    a NULL can never be an anomaly, but left in it would desynchronize
    the positional ranks (Spark's row_number sorts NULLs first while
    F.count(col) counts only non-nulls), silently shifting the median
    (ADVICE r5). Callers wanting NULL-row visibility should gap-fill
    first.

    Scale: ONE shuffle on the series key; both median passes are
    window sorts over the same partitioning (no second exchange).
    Output is anomalies only.
    """
    order_c = [F.col("__c").asc(), F.col(ts_col).asc()]
    if tiebreak_col:
        order_c.append(F.col(tiebreak_col).asc())
    wp = Window.partitionBy(*series_cols)
    w1 = wp.orderBy(*order_c)
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")

    def _median2(frame: DataFrame, col: str, out: str, order) -> DataFrame:
        """out = value at pos floor((n+1)/2) + value at pos ceil((n+1)/2)
        in the per-series ``order`` — twice the median, exactly."""
        w_rank = wp.orderBy(*order)
        lo = F.floor((F.col("__n") + 1) / 2)
        hi = F.floor((F.col("__n") + 2) / 2)
        ranked = (
            frame.withColumn("__n", F.count(col).over(wp))
            .withColumn("__rn", F.row_number().over(w_rank))
        )
        c_lo = F.max(F.when(F.col("__rn") == lo, F.col(col))).over(wp)
        c_hi = F.max(F.when(F.col("__rn") == hi, F.col(col))).over(wp)
        return (
            ranked.withColumn(out, c_lo + c_hi)
            .drop("__n", "__rn")
        )

    base = df.filter(F.col(value_col).isNotNull()).withColumn("__c", cents)
    base = _median2(base, "__c", "med2", order_c)  # half-cents
    order_d = [F.col("__d2").asc(), F.col(ts_col).asc()]
    if tiebreak_col:
        order_d.append(F.col(tiebreak_col).asc())
    base = base.withColumn("__d2", F.abs(F.col("__c") * 2 - F.col("med2")))
    base = _median2(base, "__d2", "mad4", order_d)  # quarter-cents
    rz = (
        (F.col("__c") * 2 - F.col("med2")).cast("double") * 2.0
        / (F.lit(1.4826) * F.col("mad4").cast("double"))
    )
    return (
        base.withColumn("__rz", rz)
        .filter((F.col("mad4") > 0) & (F.abs(F.col("__rz")) > z_threshold))
        .select(
            *series_cols,
            ts_col,
            *([tiebreak_col] if tiebreak_col else []),
            value_col,
            F.round("__rz", 6).alias("robust_z"),
        )
    )
