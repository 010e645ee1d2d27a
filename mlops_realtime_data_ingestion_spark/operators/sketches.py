"""Sketch-based approximate counting: a count-min sketch (CMS) built
and probed entirely as DataFrame aggregation.

``operators.training_data.heavy_hitters`` materializes the exact
(token, count) table — fine while the vocabulary fits a shuffle, wrong
once the "tokens" are n-grams/URLs/user-ids with billions of distinct
keys. The CMS replaces the vocabulary-sized table with a FIXED
``d x w`` grid of counters (Cormode & Muthukrishnan 2005): the build
is one groupBy over (row, cell) — d rows per token occurrence,
pre-aggregated map-side — and a point estimate is
``min over d rows of cell[row][hash_row(token)]``, an overestimate
with error <= 2N/w at 1 - (1/2)^d confidence.

Everything is the engine's cross-engine polynomial hash (row hashes =
affine mixes 3..3+d of the token fold), so the whole sketch is
bit-deterministic and DuckDB-oracle-checkable — the rare case where an
APPROXIMATE structure still hash-matches across engines, because the
approximation is in the algorithm, not in any RNG.

Scale: the build shuffles at most d*w counter rows regardless of
corpus size (map-side partial aggregation collapses each partition to
<= d*w cells first); the probe side touches only candidate tokens.
Candidates come from any deterministic sample — at 100 TB, CMS + a
sampled candidate set is the standard two-pass heavy-hitters scheme.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = [
    "cms_build",
    "cms_probe",
    "cms_heavy_hitters",
    "hll_cardinality",
    "hll_set_ops",
    "bloom_positions",
    "bloom_prefilter_join",
]

_ROW_OFFSET = 3  # affine mixes 0..2 are taken by split/shard/sample


def _row_cell_exprs(d: int, w: int) -> list[str]:
    """Per-row cell index of a precomputed token-hash column ``th``."""
    return [
        f"(({H.MINHASH_A[_ROW_OFFSET + j]} * th + {H.MINHASH_B[_ROW_OFFSET + j]})"
        f" % {H.P}) % {w}"
        for j in range(d)
    ]


def cms_build(
    df: DataFrame, text_col: str = "text", d: int = 4, w: int = 512
) -> DataFrame:
    """Build the d x w sketch over every token occurrence in the
    corpus: (row, cell, cnt) with exactly one output row per non-empty
    cell (<= d*w rows total, whatever the corpus size).

    Tokenization+hashing rides the Arrow/numpy fast path
    (hashing_pandas); the per-occurrence work after that is pure JVM
    arithmetic on the hash — no strings cross the shuffle.
    """
    from ..functions import hashing_pandas as HP

    @F.pandas_udf("array<long>")
    def th_udf(texts: pd.Series) -> pd.Series:
        return HP.token_hash_series(texts)

    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), F.expr(e).cast("int").alias("cell")
            )
            for j, e in enumerate(_row_cell_exprs(d, w))
        ]
    )
    return (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(F.explode(th_udf(F.col(text_col))).alias("th"))
        .select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_probe(
    sketch: DataFrame, candidates: DataFrame, d: int = 4, w: int = 512
) -> DataFrame:
    """Point-estimate every candidate token: min over its d cells.
    ``candidates`` must carry (token, th) — token string + fold hash.
    The sketch is tiny (<= d*w rows) => broadcast; the probe is a
    narrow map over candidates."""
    probes = candidates.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.expr(e).cast("int").alias("cell"),
                    )
                    for j, e in enumerate(_row_cell_exprs(d, w))
                ]
            )
        ).alias("rc"),
    ).select("token", "rc.row", "rc.cell")
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    candidate_filter,
    k: int = 20,
    text_col: str = "text",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Two-pass approximate heavy hitters: CMS over the FULL corpus,
    candidates = distinct tokens of the rows matching
    ``candidate_filter`` (a deterministic sample — frequent tokens
    appear in any sample w.h.p.), ranked by sketch estimate.

    Returns (rank, token, est); est >= true count always
    (overestimate-only, asserted in tests).
    """
    sketch = cms_build(df, text_col, d, w)
    cands = (
        df.filter(candidate_filter)
        .select(F.explode(F.expr(H.spark_tokens(text_col))).alias("token"))
        .distinct()
        .withColumn("th", F.expr(H.spark_str_hash("token")))
    )
    est = cms_probe(sketch, cands, d, w)
    top = est.orderBy(F.col("est").desc(), F.col("token").asc()).limit(k)
    from pyspark.sql import Window

    win = Window.orderBy(F.col("est").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(win).cast("long")).select(
        "rank", "token", "est"
    )


# ---------- HyperLogLog cardinality ----------

_HLL_MIX = 7  # affine mix index; CMS rows use 3..6, split/shard use 0..2


def hll_cardinality(
    df: DataFrame, key_col: str, p: int = 10
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate (Flajolet et
    al. 2007) as pure DataFrame aggregation — the fixed-memory
    replacement for exact count(DISTINCT) when the key space (URLs,
    user ids, n-grams) no longer fits a shuffle.

    m = 2^p registers; each key hashes through the engine's affine
    mix (h < 2^30), low p bits pick the register, the remaining ~20
    bits' leading-zero rank updates it with max(). The estimate is
    alpha_m * m^2 / sum(2^-M_j). Like the CMS, the approximation is in
    the ALGORITHM, not an RNG: hashing is the cross-engine polynomial
    family and the register sum is an exact BIGINT (each term
    2^(30-M_j)), so the estimate is bit-reproducible and
    DuckDB-oracle-checkable. Estimator contract: the small-range
    linear-counting correction IS applied (when the raw estimate is
    below 2.5m and empty registers exist, the estimate switches to
    m*ln(m/V)); no large-range correction (irrelevant below 2^30
    distinct keys). The DuckDB oracle applies the identical rule.

    Scale: the shuffle is at most m register rows (map-side max); one
    row out. Returns (hll_estimate, exact_distinct, rel_err) — the
    exact column is there for the error contract and would be dropped
    at 100 TB (it is the thing HLL replaces).
    """
    m = 1 << p
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)
    spark = df.sparkSession
    # Avalanche: affine + two modular-squaring rounds. A bare affine
    # map of sequential keys is an arithmetic progression mod P —
    # registers stop being geometric and the estimate is garbage
    # (measured 50-120% error); squaring mod P is the strongest mixer
    # expressible in BOTH engines (DuckDB BIGINT multiply traps on
    # overflow, so 64-bit wrapping mixers don't port; values < 2^30
    # keep every product < 2^60).
    h1 = (F.lit(a) * F.col(key_col).cast("long") + F.lit(b)) % F.lit(H.P)
    t = (
        df.select(h1.alias("h1"))
        .select(((F.col("h1") * F.col("h1") + F.lit(a)) % F.lit(H.P)).alias("h2"))
        .select(((F.col("h2") * F.col("h2") + F.lit(b)) % F.lit(H.P)).alias("h"))
        .select(
            (F.col("h") % m).alias("bucket"),
            F.when(F.expr(f"h div {m}") == 0, F.lit(21))
            .otherwise(F.lit(21) - F.length(F.expr(f"bin(h div {m})")))
            .cast("int")
            .alias("rho"),
        )
    )
    regs = t.groupBy("bucket").agg(F.max("rho").alias("rho"))
    all_b = spark.range(m).select(F.col("id").alias("bucket"))
    full = all_b.join(regs, "bucket", "left").select(
        F.coalesce("rho", F.lit(0)).alias("rho")
    )
    z = full.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 30 - rho)")).alias("z"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("v"),
    )
    exact = df.agg(F.countDistinct(key_col).alias("exact_distinct"))
    raw = F.lit(est_num) / F.col("z").cast("double")
    # small-range (linear counting) correction: raw HLL bottoms out at
    # alpha*m with mostly-empty registers
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")),
    ).otherwise(raw)
    return z.crossJoin(exact).select(
        F.round(corrected, 4).alias("hll_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(
            F.abs(corrected - F.col("exact_distinct")) / F.col("exact_distinct"), 4
        ).alias("rel_err"),
    )


# ---------- Bloom-filter pre-filtered join ----------

_BLOOM_OFFSET = 3  # reuse the CMS affine-mix rows (keys, not tokens)


def bloom_positions(key, m: int, k: int = 3):
    """Array of ``k`` bit positions for a BIGINT key — the engine's
    affine polynomial family, so build and probe (and the DuckDB
    mirror) agree bit-for-bit."""
    return F.array(
        *[
            (
                (
                    F.lit(H.MINHASH_A[_BLOOM_OFFSET + j]) * key.cast("long")
                    + F.lit(H.MINHASH_B[_BLOOM_OFFSET + j])
                )
                % F.lit(H.P)
            )
            % F.lit(m)
            for j in range(k)
        ]
    )


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m: int = 8192,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` with a Bloom pre-filter on the big
    side: the small side's keys are folded into a fixed ``m``-bit set
    (here: the sorted array of SET positions — bounded by m, built by
    one aggregation), broadcast, and big rows whose k positions aren't
    all present are dropped BEFORE the shuffle. False positives
    survive the filter and are removed by the real join, so the result
    is EXACTLY the plain join (oracle = plain SQL join).

    This is the manual spelling of runtime bloom-filter pushdown
    (Spark's spark.sql.optimizer.runtime.bloomFilter does the same
    inside AQE): at 100 TB it turns "shuffle everything, join drops
    99%" into "scan-side drop 99%, shuffle 1%". The broadcast payload
    is <= m positions (~64 KB at m=8192) regardless of small-side row
    count — the point of a Bloom set vs broadcasting the keys.
    """
    pos_set = (
        small.select(
            F.explode(bloom_positions(F.col(small_key), m, k)).alias("p")
        )
        .groupBy()
        .agg(F.array_sort(F.collect_set("p")).alias("bloom"))
    )
    probed = big.crossJoin(F.broadcast(pos_set)).withColumn(
        "__probe", bloom_positions(F.col(big_key), m, k)
    )
    filtered = probed.filter(
        F.forall(
            F.col("__probe"), lambda p: F.array_contains(F.col("bloom"), p)
        )
    ).drop("bloom", "__probe")
    return filtered.join(small, filtered[big_key] == small[small_key], how)


def hll_cardinality_grouped(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate — ``hll_cardinality``
    with the register table keyed by (group, bucket).

    Same deterministic mixing / estimator contract as the global
    version (affine + two modular squarings; linear-counting
    small-range correction; exact BIGINT register sums).  Absent
    registers are folded in ARITHMETICALLY (z += (m - present) * 2^30,
    v += m - present) instead of materializing a groups x m register
    cross join — the shuffle stays <= groups * m rows, one row out per
    group.  The exact count(DISTINCT) column ships alongside for the
    error contract (it is the thing HLL replaces at 100 TB).
    """
    m = 1 << p
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)
    h1 = (F.lit(a) * F.col(key_col).cast("long") + F.lit(b)) % F.lit(H.P)
    t = (
        # NULL keys would hash to a NULL bucket that survives the
        # groupBy as a phantom register row and skews the arithmetic
        # absent-register fold (z and v both off by one register);
        # count(DISTINCT) excludes NULLs, so dropping them here also
        # aligns the rel_err denominator with the global version.
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, h1.alias("h1"))
        .withColumn("h2", (F.col("h1") * F.col("h1") + F.lit(a)) % F.lit(H.P))
        .withColumn("h", (F.col("h2") * F.col("h2") + F.lit(b)) % F.lit(H.P))
        .select(
            *group_cols,
            (F.col("h") % m).alias("bucket"),
            F.when(F.expr(f"h div {m}") == 0, F.lit(21))
            .otherwise(F.lit(21) - F.length(F.expr(f"bin(h div {m})")))
            .cast("int")
            .alias("rho"),
        )
    )
    regs = t.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))
    zv = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 30 - rho)"))
            + (F.lit(m) - F.count(F.lit(1)))
            * F.expr("shiftleft(CAST(1 AS BIGINT), 30)")
        ).alias("z"),
        (
            F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
            + (F.lit(m) - F.count(F.lit(1)))
        ).alias("v"),
    )
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct")
    )
    raw = F.lit(est_num) / F.col("z").cast("double")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")),
    ).otherwise(raw)
    return zv.join(exact, group_cols).select(
        *group_cols,
        F.round(corrected, 4).alias("hll_estimate"),
        "exact_distinct",
        F.round(
            F.abs(corrected - F.col("exact_distinct")) / F.col("exact_distinct"), 4
        ).alias("rel_err"),
    )


def hist_quantiles(
    df: DataFrame, value_col: str, probs: tuple[float, ...], bins: int = 128
) -> DataFrame:
    """Fixed-grid histogram quantile estimates — the deterministic,
    MERGEABLE member of the sketch family (CMS / HLL / Bloom / this):
    per-partition bin counts add, so the sketch composes across
    increments exactly like the incremental rollup.

    Two passes over the column (bounds, then counts); the shuffle is
    <= ``bins`` integer rows.  Estimates interpolate linearly inside
    the first bin whose cumulative count reaches ``p * n`` —
    deterministic arithmetic on exact integer counts, so the estimate
    (unlike rank-sampling approx_percentile) is bit-reproducible and
    DuckDB-oracle-checkable.  Error is bounded by one bin width; at
    100 TB the bounds pass can reuse table stats and the counts pass
    map-side partial-aggregates to ``bins`` rows per partition.

    Returns (prob, quantile_est) per requested prob, 6-dp rounded.
    """
    spark = df.sparkSession
    src = df.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    stats = src.agg(
        F.min("v").cast("double").alias("mn"),
        F.max("v").cast("double").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        src.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("v") - F.col("mn")) * bins / (F.col("mx") - F.col("mn"))).cast("int"),
                ),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(stats)
    )
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "prob double")
    hit = (
        cum.join(F.broadcast(probs_df), F.col("cum") >= F.col("prob") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("prob").orderBy("bin")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    width = (F.col("mx") - F.col("mn")) / bins
    frac = (F.col("prob") * F.col("n") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    return hit.select(
        "prob",
        F.round(F.col("mn") + (F.col("bin") + frac) * width, 6).alias("quantile_est"),
    )


def hist_quantiles_grouped(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: tuple[float, ...],
    bins: int = 128,
) -> DataFrame:
    """Per-group histogram quantiles — ``hist_quantiles`` with the bin
    table keyed by group.  Bounds are PER GROUP (each group's grid
    spans its own min/max, so a wide-range group cannot crush a narrow
    one's resolution); the shuffle is <= groups x bins integer rows.
    Returns (group..., prob, quantile_est)."""
    src = df.select(*group_cols, F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    stats = src.groupBy(*group_cols).agg(
        F.min("v").cast("double").alias("mn"),
        F.max("v").cast("double").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        src.join(F.broadcast(stats), group_cols)
        .select(
            *group_cols,
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("v") - F.col("mn")) * bins / (F.col("mx") - F.col("mn"))
                    ).cast("int"),
                ),
            ).alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).join(
        F.broadcast(stats), group_cols
    )
    spark = df.sparkSession
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "prob double")
    hit = (
        cum.join(F.broadcast(probs_df), F.col("cum") >= F.col("prob") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(*group_cols, "prob").orderBy("bin")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    width = (F.col("mx") - F.col("mn")) / bins
    frac = (F.col("prob") * F.col("n") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    return hit.select(
        *group_cols,
        "prob",
        F.round(F.col("mn") + (F.col("bin") + frac) * width, 6).alias("quantile_est"),
    )


def hll_set_ops(
    df: DataFrame,
    key_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    p: int = 10,
) -> DataFrame:
    """Distinct-count SET ALGEBRA on merged HLL sketches: estimates
    |A|, |B|, |A u B| and (by inclusion-exclusion) |A n B| for the
    key sets of two cohorts, from one pass and 2m registers — the
    fixed-memory replacement for a distinct-key self-join when
    cohorts no longer fit a shuffle ("how many users did BOTH X and
    Y?"). Union is the lossless HLL merge (register max); the
    intersection inherits the union/cohort error bars (the standard
    HLL limitation — fine for the large-overlap regime this question
    lives in).

    Same determinism contract as :func:`hll_cardinality`: the affine
    + double-squaring mix and exact BIGINT register sums make every
    estimate bit-reproducible and DuckDB-oracle-checkable. The exact
    intersection rides along for the error contract (it is the thing
    the sketch replaces at 100 TB).

    Scale: ONE scan of the two cohorts; the shuffle is <= m register
    rows carrying BOTH cohort registers; one row out.
    """
    m = 1 << p
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)
    spark = df.sparkSession
    src = df.filter(F.col(label_col).isin(label_a, label_b))
    h1 = (F.lit(a) * F.col(key_col).cast("long") + F.lit(b)) % F.lit(H.P)
    t = (
        src.select(F.col(label_col).alias("lbl"), h1.alias("h1"))
        .select("lbl", ((F.col("h1") * F.col("h1") + F.lit(a)) % F.lit(H.P)).alias("h2"))
        .select("lbl", ((F.col("h2") * F.col("h2") + F.lit(b)) % F.lit(H.P)).alias("h"))
        .select(
            "lbl",
            (F.col("h") % m).alias("bucket"),
            F.when(F.expr(f"h div {m}") == 0, F.lit(21))
            .otherwise(F.lit(21) - F.length(F.expr(f"bin(h div {m})")))
            .cast("int")
            .alias("rho"),
        )
    )
    regs = t.groupBy("bucket").agg(
        F.max(F.when(F.col("lbl") == label_a, F.col("rho"))).alias("ra0"),
        F.max(F.when(F.col("lbl") == label_b, F.col("rho"))).alias("rb0"),
    )
    all_b = spark.range(m).select(F.col("id").alias("bucket"))
    full = all_b.join(regs, "bucket", "left").select(
        F.coalesce("ra0", F.lit(0)).alias("ra"),
        F.coalesce("rb0", F.lit(0)).alias("rb"),
        F.greatest(F.coalesce("ra0", F.lit(0)), F.coalesce("rb0", F.lit(0))).alias("ru"),
    )

    def _zv(rc: str):
        return (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), 30 - {rc})")),
            F.sum(F.when(F.col(rc) == 0, 1).otherwise(0)),
        )

    za, va = _zv("ra")
    zb, vb = _zv("rb")
    zu, vu = _zv("ru")
    z = full.agg(
        za.alias("za"), va.alias("va"),
        zb.alias("zb"), vb.alias("vb"),
        zu.alias("zu"), vu.alias("vu"),
    )

    def _est(zc, vc):
        raw = F.lit(est_num) / zc.cast("double")
        return F.when(
            (raw <= F.lit(2.5 * m)) & (vc > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / vc.cast("double")),
        ).otherwise(raw)

    ea = _est(F.col("za"), F.col("va"))
    eb = _est(F.col("zb"), F.col("vb"))
    eu = _est(F.col("zu"), F.col("vu"))
    exact = (
        src.groupBy(key_col)
        .agg(F.countDistinct(label_col).alias("nl"))
        .filter(F.col("nl") == 2)
        .agg(F.count("*").alias("exact_intersect"))
    )
    return z.crossJoin(exact).select(
        F.round(ea, 4).alias("hll_a"),
        F.round(eb, 4).alias("hll_b"),
        F.round(eu, 4).alias("hll_union"),
        F.round(ea + eb - eu, 4).alias("hll_intersect"),
        F.col("exact_intersect").cast("long").alias("exact_intersect"),
    )
