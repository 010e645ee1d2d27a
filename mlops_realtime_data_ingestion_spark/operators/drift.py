"""Distribution-drift detection between two time windows.

The reference monitors its deployed model with accuracy metrics (RMSE /
wQL over predictions, pipelines/blockchain/evaluate.py:23-52) and
recomputes an alarm threshold from recent history. The other half of
production model monitoring — has the INPUT distribution shifted? — is
what this module adds: PSI (population stability index, the standard
banking/industry drift score) and a binned two-sample KS statistic
between a reference window and a current window of a numeric column.

Determinism contract (DuckDB-oracle-checkable):
- bin edges are equal-width over the REFERENCE window's exact
  [min, max] (standard PSI practice: bins frozen on the baseline);
- per-bin counts are exact integers; smoothed frequencies are single
  IEEE divisions; each bin's PSI term is cast to DECIMAL(38, 18) so
  the 10-term sum is EXACT (order-independent — the engine's
  aggregation order never changes the result);
- KS is a max over bins (order-independent by construction).

Scale: one pass computes the reference bounds (tiny aggregate), one
pass bins every row (narrow), one groupBy on (bin) — shuffle volume is
``bins`` rows. 100 TB of events costs two scans and a 10-row shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["psi_ks_report"]

# Scale 12, not 18: Spark's double->decimal cast goes through the
# SHORTEST decimal rendering of the double while DuckDB expands the
# full binary value; at scale 12 both quantize to the same digits
# (the renderings differ only beyond ~16 significant digits).
_DEC = "decimal(38,12)"


def psi_ks_report(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    cutoff: str,
    bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """One-row drift report: (psi, ks, n_ref, n_cur).

    ``cutoff`` (timestamp string) splits rows into reference
    (ts < cutoff) and current (ts >= cutoff). Laplace smoothing
    ``eps`` per bin keeps empty bins finite: p_i = (c_i + eps) /
    (N + bins*eps).
    """
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("v"),
        (F.col(ts_col) < F.lit(cutoff).cast("timestamp")).alias("is_ref"),
    )
    bounds = src.filter("is_ref").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    binned = src.crossJoin(F.broadcast(bounds)).select(
        "is_ref",
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("v") - F.col("mn"))
                    * bins
                    / (F.col("mx") - F.col("mn"))
                ).cast("int"),
            ),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("c_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("c_cur"),
    )
    # every bin present even when both windows miss it (smoothing needs
    # the full bin set; a tiny static frame, broadcast by size)
    spark = df.sparkSession
    all_bins = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        all_bins.join(counts, "bin", "left")
        .fillna(0, ["c_ref", "c_cur"])
        .crossJoin(
            F.broadcast(
                src.groupBy().agg(
                    F.count(F.when(F.col("is_ref"), 1)).alias("n_ref"),
                    F.count(F.when(~F.col("is_ref"), 1)).alias("n_cur"),
                )
            )
        )
    )
    p = (F.col("c_ref") + eps) / (F.col("n_ref") + bins * eps)
    q = (F.col("c_cur") + eps) / (F.col("n_cur") + bins * eps)
    terms = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        ((p - q) * F.log(p / q)).cast(_DEC).alias("psi_term"),
        p.cast(_DEC).alias("p"),
        q.cast(_DEC).alias("q"),
    )
    # binned KS: max |CDF_ref - CDF_cur| over bin boundaries; the
    # cumulative sums are exact decimals, so the max is reproducible
    from pyspark.sql import Window

    cum = terms.select(
        "n_ref",
        "n_cur",
        "psi_term",
        F.sum("p").over(Window.orderBy("bin")).alias("cp"),
        F.sum("q").over(Window.orderBy("bin")).alias("cq"),
    )
    return cum.groupBy().agg(
        F.round(F.sum("psi_term").cast("double"), 6).alias("psi"),
        F.round(F.max(F.abs(F.col("cp") - F.col("cq"))).cast("double"), 6).alias("ks"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )
