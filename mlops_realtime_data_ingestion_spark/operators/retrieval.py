"""Lexical retrieval: BM25 scoring + top-k over the document corpus.

The embedding-based half of retrieval lives in
``operators/similarity.py`` (exact / LSH / IVF ANN); this adds the
lexical half a training-data or RAG pipeline runs next to it — BM25
(Robertson et al., TREC-3; the Lucene k1/b variant with the +1 idf
shift so scores stay positive).

Determinism contract (DuckDB-oracle-checkable):
- tokenization = the engine-wide lower/whitespace split
  (functions/hashing.spark_tokens semantics);
- df/tf/doclen/avgdl are exact integers or single IEEE divisions;
- the per-term score is a deterministic double; the final score ADDS
  THE QUERY TERMS IN FIXED ORDER (conditional aggregation pivots each
  term into its own column; ``t1 + t2 + t3`` is one expression, not an
  aggregation, so engine summation order can never differ).

Scale: one explode->groupBy builds (doc, term) tf pairs ONLY for the
query terms (the filter pushes into the explode — shuffle volume is
docs x |query|, not docs x vocab); df and avgdl are tiny aggregates
broadcast by value; top-k is TakeOrderedAndProject, never a global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs by BM25 for ``query_terms`` (lowercased, exact-match
    tokens). Returns (id, score, n_terms_hit) ordered by score desc
    with the id as tiebreak."""
    terms = [t.lower() for t in query_terms]
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(H.spark_tokens(text_col))).alias("tok"),
    )
    # doc lengths + corpus stats (exact ints; avgdl = one division)
    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    # tf only for query terms — the filter prunes the shuffle to
    # docs x |query| rows
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    # pivot each query term into its own column so the final add runs
    # in FIXED order (t0 + t1 + ...), immune to aggregation order
    per_term = scored.groupBy("id").agg(
        *[
            F.max(F.when(F.col("tok") == t, term_score)).alias(f"__s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = None
    hits = None
    for i in range(len(terms)):
        s = F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
        h = F.when(F.col(f"__s{i}").isNotNull(), 1).otherwise(0)
        total = s if total is None else total + s
        hits = h if hits is None else hits + h
    return (
        per_term.select(
            F.col("id").alias(id_col),
            F.round(total, 6).alias("score"),
            hits.cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def retrieval_eval(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality metrics of ``results`` against ``truth``
    (both (query, item, rank) frames): macro-averaged recall@k, MRR,
    and binary NDCG@k in ONE row — the in-engine eval loop for the
    ANN/BM25 stack (measure recall where the index runs, instead of
    sampling results to the driver).

    Determinism: every order-free float sum (per-query DCG, the macro
    averages) adds 12-dp-rounded DECIMAL terms, so partitioning can
    never change the result; IDCG folds ascending ranks sequentially
    (identical op order in any engine).

    Scale: two (query, item) equi-joins plus one query-level
    aggregation — costs track |results| + |truth| (≈ queries x k),
    never the corpus behind them.
    """
    q = F.col(query_col)
    t = truth.select(q.alias("__q"), F.col(item_col).alias("__i"))
    n_truth = t.groupBy("__q").agg(F.count(F.lit(1)).alias("__nt"))
    r = results.select(
        q.alias("__q"), F.col(item_col).alias("__i"), F.col(rank_col).alias("__rk")
    ).filter(F.col("__rk") <= k)

    hits = r.join(t, ["__q", "__i"])
    dec = "decimal(18,12)"
    per_q = (
        n_truth.join(
            hits.groupBy("__q").agg(
                F.count(F.lit(1)).alias("__nh"),
                F.sum(
                    F.round(F.lit(1.0) / F.log2(F.col("__rk") + 1), 12).cast(dec)
                ).alias("__dcg"),
                F.min("__rk").alias("__minrk"),
            ),
            "__q",
            "left",
        )
        .withColumn("__nh", F.coalesce("__nh", F.lit(0)))
        .withColumn("__dcg", F.coalesce(F.col("__dcg").cast("double"), F.lit(0.0)))
        .withColumn(
            "__idcg",
            F.expr(
                f"aggregate(sequence(1, least({k}, __nt)), CAST(0 AS DOUBLE),"
                " (a, i) -> a + 1.0 / log2(CAST(i + 1 AS DOUBLE)))"
            ),
        )
        .select(
            F.round(F.col("__nh") / F.col("__nt"), 12).cast(dec).alias("__recall"),
            F.round(
                F.when(F.col("__minrk").isNotNull(), F.lit(1.0) / F.col("__minrk"))
                .otherwise(F.lit(0.0)),
                12,
            ).cast(dec).alias("__rr"),
            F.round(F.col("__dcg") / F.col("__idcg"), 12).cast(dec).alias("__ndcg"),
        )
    )
    return per_q.agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.sum("__recall").cast("double") / F.count(F.lit(1)), 6).alias(
            f"recall_at_{k}"
        ),
        F.round(F.sum("__rr").cast("double") / F.count(F.lit(1)), 6).alias("mrr"),
        F.round(F.sum("__ndcg").cast("double") / F.count(F.lit(1)), 6).alias(
            f"ndcg_at_{k}"
        ),
    )
