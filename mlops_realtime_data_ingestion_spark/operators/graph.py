"""Iterative graph analytics: PageRank as pure DataFrame iteration.

Completes the engine's graph family (connected components /
large-star-small-star live in operators/training_data.py) with the
canonical fixed-point ranking — the shape any "importance over a
100 TB edge list" computation takes (web-graph quality signals for
training-data curation, supplier/customer centrality, etc.).

Determinism contract (DuckDB-oracle-checkable, same scheme as
k-means' unrolled oracle):
- the graph is made UNDIRECTED (both edge directions, distinct), so
  every node has degree >= 1 and no dangling-mass term is needed;
- each iteration's incoming-contribution sum is cast to
  DECIMAL(38,12) per edge and summed EXACTLY (order-independent);
  rank mass stays <= 1 so the decimal->double cast back is exact
  (< 2^53 integer units);
- ranks are doubles transformed by single IEEE ops between exact
  sums — identical in both engines; a fixed iteration count unrolls
  into the oracle's CTE chain.

Scale: per iteration, one join of the edge list against the
|V|-row rank table and one groupBy on the destination — shuffle
volume is |E| rows per iteration, nothing quadratic, no driver
state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

_DEC = "decimal(38,12)"


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank iterations
    over the undirected version of ``edges`` (string node ids)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    nodes = und.select("a").distinct()
    n_nodes = nodes.agg(F.count("*").alias("n"))
    r = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "a", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iters):
        contrib = (
            und.join(r, "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                (F.col("r") / F.col("deg")).cast(_DEC).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(sums, nodes["a"] == sums["node"], "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "a",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return r.select(F.col("a").alias("node"), F.col("r").alias("rank"))
