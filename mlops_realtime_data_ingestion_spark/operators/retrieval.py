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
