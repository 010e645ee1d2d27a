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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = ["cms_build", "cms_probe", "cms_heavy_hitters"]

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
