"""Registered queries: corpus-curation stages for LLM training data —
hashed quality classifier, DSIR importance resampling, exact
duplicate-passage spans, k-anonymity audit, SemDeDup embedding
pruning, dataset-card accounting.

These complete the curation funnel around the reference's train-data
path (resources/sagemaker/pipeline-modelbuild-code/pipelines/
blockchain/preprocess.py selects + filters + splits its series; a
100 TB text corpus needs the equivalent selection machinery at scale).
Every query carries a DuckDB oracle built from the engine-wide
deterministic hashing (functions/hashing.py) and decimal-summation
(plans/determinism.py) rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators.curation import (
    cdc_chunk_dedup,
    dataset_card,
    dsir_select,
    duplicate_passage_spans,
    duplicate_substring_chains,
    duplicate_substring_span_rows,
    strip_duplicate_spans,
    hashed_quality_classifier,
    k_anonymity_report,
    semdedup_prune,
)
from ..operators.curation import KNUTH, WP
from ..sources.batch import load_table
from .extension_queries import _duck_cosine, kmeans_assign_ctes
from .spec import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------- fastText-style hashed quality classifier ----------

def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality model over hashed token features (fixed
    deterministic weight table), sigmoid score + keep verdict."""
    return hashed_quality_classifier(_docs(spark, sf_dir), buckets=256)


_DUCK_WSUM = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(th,"
    f" x -> (((x % 256) * {KNUTH}) % {WP}) % 2001 - 1000)), (acc, v) -> acc + v)"
)

QUALITY_CLASSIFIER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {H.duck_token_hashes('text')} AS th
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens, {_DUCK_WSUM} AS ws
  FROM t WHERE len(th) > 0
)
SELECT doc_id, n_tokens,
       CAST(ws AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1000.0) AS raw_score,
       round(1.0 / (1.0 + exp(-(CAST(ws AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1000.0)))), 6) AS quality_prob,
       ws >= 0 AS keep
FROM s
"""


# ---------- DSIR importance resampling ----------

def dsir_select_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 docs by hashed-unigram importance weight toward the
    lang='en' target domain (DSIR)."""
    return dsir_select(_docs(spark, sf_dir), target_domain="en", buckets=64, topk=100)


DSIR_ORACLE = f"""
WITH tk AS (
  SELECT doc_id AS id, lang AS dom,
         unnest({H.duck_token_hashes('text')}) % 64 AS bucket
  FROM documents WHERE text IS NOT NULL
), bt AS (
  SELECT bucket, count(*) AS r,
         sum(CASE WHEN dom = 'en' THEN 1 ELSE 0 END) AS t
  FROM tk GROUP BY 1
), tot AS (
  SELECT sum(r) AS rt, sum(t) AS tt FROM bt
), lrs AS (
  SELECT bucket,
         ln(CAST(t + 1 AS DOUBLE) / CAST(tt + 64 AS DOUBLE))
         - ln(CAST(r + 1 AS DOUBLE) / CAST(rt + 64 AS DOUBLE)) AS lr
  FROM bt, tot
), tf AS (
  SELECT id, bucket, count(*) AS tf FROM tk GROUP BY 1, 2
), pd AS (
  SELECT id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         sum(CAST(tf * lr AS DECIMAL(38,6))) AS w
  FROM tf JOIN lrs USING (bucket) GROUP BY 1
), ranked AS (
  SELECT id, n_tokens,
         CAST(w AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS weight
  FROM pd
)
SELECT id AS doc_id, n_tokens, weight, rank FROM (
  SELECT *, row_number() OVER (ORDER BY weight DESC, id ASC) AS rank FROM ranked
) WHERE rank <= 100
"""


# ---------- exact duplicate-passage spans ----------

def passage_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-passage accounting: merged spans of token
    5-grams whose fingerprint occurs >= 2 times corpus-wide. Runs the
    whole-batch Arrow shingle path (round 12 — parity pinned in
    tests/test_round12_plans.py)."""
    return duplicate_passage_spans(_docs(spark, sf_dir), n=5, impl="arrow")


PASSAGE_SPANS_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {H.duck_token_hashes('text')} AS h
  FROM documents WHERE text IS NOT NULL
), pos AS (
  SELECT id, CAST(len(h) AS BIGINT) AS n_tokens,
         unnest(range(1, greatest(len(h) - 3, 1))) AS s,
         unnest(range(1, greatest(len(h) - 3, 1))) + 4 AS e,
         unnest({H.duck_shingle_hashes('h', 5)}) AS fp
  FROM base
), cnt AS (
  SELECT fp, count(*) AS c FROM pos GROUP BY 1
), dup AS (
  SELECT pos.id, pos.n_tokens, pos.s, pos.e
  FROM pos JOIN cnt USING (fp) WHERE c >= 2
), isl AS (
  SELECT id, n_tokens, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS new_span
  FROM dup
  WINDOW w AS (PARTITION BY id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), isl2 AS (
  SELECT *, sum(new_span) OVER (PARTITION BY id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
), spans AS (
  SELECT id, n_tokens, island, min(s) AS ss, max(e) AS ee
  FROM isl2 GROUP BY 1, 2, 3
)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(ee - ss + 1) AS BIGINT) AS dup_tokens, n_tokens,
       CAST(sum(ee - ss + 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_frac
FROM spans GROUP BY id, n_tokens
"""


# ---------- arbitrary-length exact substring dedup (chained seeds) ----------

def substring_dedup_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal exact repeated substrings per document via
    seed-and-chain (the distributed suffix-array-family spelling):
    8-gram seeds occurring 2..64 times corpus-wide, chained along
    (d1, d2, offset) diagonals into maximal runs, projected onto both
    documents and island-merged. Stays on the per-doc pandas shingle
    path: the round-12 whole-batch Arrow A/B at 100x measured a wash
    here (best-of-3 6.72 vs 6.93 s, inside run noise) and a 1.8x LOSS
    on the sibling span-rows spelling, so only the passage rows
    switched (SCALE.md round 12)."""
    return duplicate_substring_chains(_docs(spark, sf_dir), n=8, max_occ=64)


# the seed -> pair -> chain -> project -> island CTE prefix shared by
# the three substring-dedup oracles (summary / span rows / strip)
_CHAIN_CTES = f"""
WITH base AS (
  SELECT doc_id AS id, {H.duck_token_hashes('text')} AS h,
         {H.duck_token_hashes2('text')} AS h2,
         {H.duck_token_hashes3('text')} AS h3
  FROM documents WHERE text IS NOT NULL
), pos AS (
  SELECT id, CAST(len(h) AS BIGINT) AS nt,
         unnest(range(1, greatest(len(h) - 6, 1))) AS p,
         unnest({H.duck_shingle_hashes_wide('h', 'h2', 8)}) AS fp,
         unnest({H.duck_shingle_hashes3('h3', 8)}) AS fp3
  FROM base
), seeds AS (
  SELECT * FROM (
    SELECT id, nt, p, fp, fp3,
           count(*) OVER (PARTITION BY fp, fp3) AS c FROM pos
  ) WHERE c BETWEEN 2 AND 64
), pairs AS (
  SELECT a.id AS d1, a.nt AS nt1, a.p AS p1,
         b.id AS d2, b.nt AS nt2, b.p AS p2,
         b.p - a.p AS diag
  FROM seeds a JOIN seeds b USING (fp, fp3)
  WHERE a.id < b.id OR (a.id = b.id AND a.p < b.p)
), runs AS (
  SELECT *, CASE WHEN lag(p1) OVER w IS NULL
                   OR p1 > lag(p1) OVER w + 1 THEN 1 ELSE 0 END AS new_chain
  FROM pairs WINDOW w AS (PARTITION BY d1, d2, diag ORDER BY p1)
), runs2 AS (
  SELECT *, sum(new_chain) OVER (PARTITION BY d1, d2, diag ORDER BY p1
             ROWS UNBOUNDED PRECEDING) AS chain
  FROM runs
), chains AS (
  SELECT d1, d2, diag, chain, max(nt1) AS nt1, max(nt2) AS nt2,
         min(p1) AS s1, max(p1) + 7 AS e1,
         min(p1) + diag AS s2, max(p1) + diag + 7 AS e2,
         max(p1) - min(p1) + 8 AS match_len
  FROM runs2 GROUP BY 1, 2, 3, 4
), proj0 AS (
  SELECT d1 AS id, nt1 AS nt, s1 AS s, e1 AS e, match_len FROM chains
  UNION ALL
  SELECT d2, nt2, s2, e2, match_len FROM chains
), proj AS (
  -- unique (id, s, e): the island windows below order by (s, e), and
  -- tied rows can sort differently between the two window passes,
  -- nondeterministically splitting islands
  SELECT id, nt, s, e, max(match_len) AS match_len
  FROM proj0 GROUP BY 1, 2, 3, 4
), isl AS (
  SELECT id, nt, s, e, match_len,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS new_span
  FROM proj
  WINDOW w AS (PARTITION BY id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), isl2 AS (
  SELECT *, sum(new_span) OVER (PARTITION BY id ORDER BY s, e
             ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT id, nt, island, min(s) AS ss, max(e) AS ee, max(match_len) AS ml
  FROM isl2 GROUP BY 1, 2, 3
)"""

SUBSTRING_CHAINS_ORACLE = _CHAIN_CTES + """
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(ee - ss + 1) AS BIGINT) AS dup_tokens,
       nt AS n_tokens,
       CAST(max(ml) AS BIGINT) AS max_match_len,
       CAST(sum(ee - ss + 1) AS DOUBLE) / CAST(nt AS DOUBLE) AS dup_frac
FROM spans GROUP BY id, nt
"""


def substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state ingest spelling: exact duplicated substrings of
    the BATCH docs (doc_id % 5 == 0) against corpus-union-batch —
    corpus-corpus pairing skipped, occurrence threshold corpus-wide.
    Equals the self-run restricted to batch ids (the oracle spells it
    that way); the production path feeds a persisted position index
    (substring_index_build) instead of re-tokenizing the corpus."""
    from ..operators.curation import duplicate_substring_chains_incremental

    docs = _docs(spark, sf_dir)
    return duplicate_substring_chains_incremental(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        n=8,
        max_occ=64,
    )


SUBSTRING_INCREMENTAL_ORACLE = _CHAIN_CTES + """
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(ee - ss + 1) AS BIGINT) AS dup_tokens,
       nt AS n_tokens,
       CAST(max(ml) AS BIGINT) AS max_match_len,
       CAST(sum(ee - ss + 1) AS DOUBLE) / CAST(nt AS DOUBLE) AS dup_frac
FROM spans WHERE id % 5 = 0 GROUP BY id, nt
"""


def substring_span_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup output: one row per merged
    maximal duplicated region with its token bounds — the frame a
    removal / audit stage consumes directly. Stays on the per-doc
    pandas shingle path: the round-12 Arrow A/B at 100x measured a
    consistent 1.8x loss on this row (best-of-3 12.97 vs 7.37 s,
    reproduced in two sessions with both run orders — SCALE.md round
    12)."""
    return duplicate_substring_span_rows(_docs(spark, sf_dir), n=8, max_occ=64)


SUBSTRING_SPAN_ROWS_ORACLE = _CHAIN_CTES + """
SELECT id AS doc_id,
       CAST(ss AS BIGINT) AS span_start,
       CAST(ee AS BIGINT) AS span_end,
       CAST(ee - ss + 1 AS BIGINT) AS span_len,
       CAST(ml AS BIGINT) AS max_match_len,
       nt AS n_tokens
FROM spans
"""


def substring_strip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION stage: documents rewritten with every duplicated
    region cut (normalized token space), plus removal accounting."""
    return strip_duplicate_spans(_docs(spark, sf_dir), n=8, max_occ=64)


SUBSTRING_STRIP_ORACLE = _CHAIN_CTES + f""",
docspans AS (
  SELECT id, list(struct_pack(ss := ss, ee := ee)) AS sp,
         sum(ee - ss + 1) AS removed
  FROM spans GROUP BY 1
), toks AS (
  SELECT doc_id, {H.duck_tokens('text')} AS tok
  FROM documents WHERE text IS NOT NULL
)
SELECT t.doc_id,
       CAST(len(tok) AS BIGINT) AS n_tokens,
       CAST(coalesce(ds.removed, 0) AS BIGINT) AS removed_tokens,
       CASE WHEN ds.id IS NULL THEN coalesce(list_aggr(tok, 'string_agg', ' '), '')
            ELSE coalesce(list_aggr(
              list_filter(tok, (x, i) ->
                len(list_filter(ds.sp, s -> i BETWEEN s.ss AND s.ee)) = 0),
              'string_agg', ' '), '') END AS clean_text
FROM toks t LEFT JOIN docspans ds ON t.doc_id = ds.id
"""


# ---------- content-defined chunking dedup ----------

def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: token-hash boundary rule
    (cut after token i when hash % 16 == 0), 90-bit chunk
    fingerprints, corpus-wide duplicate-chunk accounting per doc.

    Round 11: chunking runs the Arrow impl (batch-vectorized numpy,
    bit-identical to the SQL folds — parity pinned in
    tests/test_round11_plans.py, measured 2.2-2.6 s vs 10.8-11.7 s
    for the HOF spelling at 100x) — and, decisively, its hot loop is
    immune to the per-JVM JIT bistability that shipped this row at
    133.5 s in the round-10 artifact (SCALE.md round 11)."""
    return cdc_chunk_dedup(_docs(spark, sf_dir), divisor=16, impl="pandas")


def dedup_cdc_chunks_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe spelling of dedup_cdc_chunks: occurrence counts
    via groupBy + join-back (map-side partial agg flattens a hot
    boilerplate fingerprint; AQE can skew-split the join) instead of
    the single-partition-per-fingerprint window. Same oracle — the
    two spellings are equal by construction and this row lets the
    driver hash-certify the join plan itself. Arrow chunking like
    dedup_cdc_chunks (round 11)."""
    return cdc_chunk_dedup(
        _docs(spark, sf_dir), divisor=16, count_mode="join", impl="pandas"
    )


def passage_dedup_spans_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe spelling of passage_dedup_spans (groupBy + join-back
    occurrence counting); same oracle as the window spelling. Runs
    the whole-batch Arrow shingle path (round 12)."""
    return duplicate_passage_spans(
        _docs(spark, sf_dir), n=5, count_mode="join", impl="arrow"
    )


CDC_CHUNKS_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {H.duck_token_hashes('text')} AS h,
         {H.duck_token_hashes2('text')} AS h2,
         {H.duck_token_hashes3('text')} AS h3
  FROM documents WHERE text IS NOT NULL
), nz AS (
  SELECT id, h, h2, h3, len(h) AS s FROM base WHERE len(h) >= 1
), bp AS (
  SELECT id, h, h2, h3, s,
         list_filter(range(1, s), i -> h[i] % 16 = 0) AS bpos
  FROM nz
), se AS (
  SELECT id, h, h2, h3, s,
         list_prepend(1, list_transform(bpos, x -> x + 1)) AS starts,
         list_append(bpos, s) AS ends
  FROM bp
), cj AS (
  SELECT id, s, h, h2, h3, unnest(list_zip(starts, ends)) AS z
  FROM se
), ch AS (
  SELECT id, s, z[2] - z[1] + 1 AS clen,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_slice(h, z[1], z[2])),
             (acc, c) -> (acc * 31 + c) % {H.P}) * {H.WIDE_SHIFT}
         + list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_slice(h2, z[1], z[2])),
             (acc2, c2) -> (acc2 * 37 + c2) % {H.P2}) AS fp,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_slice(h3, z[1], z[2])),
             (acc3, c3) -> (acc3 * 41 + c3) % {H.P3}) AS fp3
  FROM cj
), cnt AS (
  SELECT id, s, fp, clen,
         count(*) OVER (PARTITION BY fp, fp3) AS c FROM ch
)
SELECT id AS doc_id,
       CAST(s AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       CAST(sum(CASE WHEN c >= 2 THEN clen ELSE 0 END) AS BIGINT) AS dup_tokens,
       CAST(sum(CASE WHEN c >= 2 THEN clen ELSE 0 END) AS DOUBLE)
         / CAST(s AS DOUBLE) AS dup_frac
FROM cnt GROUP BY id, s
"""


# ---------- sliding-window passage extraction (RAG chunking) ----------

def passages_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token passages every 32 tokens per document,
    last window clamped to the doc end — the retrieval-chunking
    stage an embedding + ANN index ingests."""
    from ..operators.text import sliding_passages

    return sliding_passages(_docs(spark, sf_dir), window=64, stride=32)


PASSAGES_SLIDING_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {H.duck_tokens('text')} AS tok
  FROM documents WHERE text IS NOT NULL
), nz AS (
  SELECT doc_id, tok, len(tok) AS nt FROM t WHERE len(tok) >= 1
), w AS (
  SELECT doc_id, tok, nt,
         unnest(range(0, 1 + CAST(CASE WHEN nt > 64
             THEN ceil((nt - 64) / 32.0) ELSE 0 END AS INT))) AS k
  FROM nz
)
SELECT doc_id,
       CAST(k + 1 AS BIGINT) AS passage_seq,
       CAST(least(k * 32 + 1, greatest(1, nt - 64 + 1)) AS BIGINT)
         AS start_tok,
       CAST(least(least(k * 32 + 1, greatest(1, nt - 64 + 1)) + 63, nt)
            AS BIGINT) AS end_tok,
       list_aggr(list_slice(tok,
                 least(k * 32 + 1, greatest(1, nt - 64 + 1)),
                 least(least(k * 32 + 1, greatest(1, nt - 64 + 1)) + 63,
                       nt)),
                 'string_agg', ' ') AS passage_text
FROM w
"""


# ---------- k-anonymity audit ----------

def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=10 anonymity audit of customers under the
    (c_nationkey, c_mktsegment) quasi-identifier."""
    return k_anonymity_report(
        load_table(spark, sf_dir, "customer"),
        qi_cols=["c_nationkey", "c_mktsegment"],
        k=10,
    )


K_ANON_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS group_size,
       count(*) < 10 AS at_risk
FROM customer GROUP BY 1, 2
"""


# ---------- SemDeDup ----------

def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-then-prune over the embeddings table (k=4
    deterministic k-means, tau=0.35 intra-cluster cosine)."""
    return semdedup_prune(load_table(spark, sf_dir, "embeddings"), k=4, iters=2, tau=0.35)


SEMDEDUP_ORACLE = (
    "WITH "
    + ",\n".join(kmeans_assign_ctes(4, 2))
    + f""",
pairs AS (
  SELECT a1.vec_id AS id1, min(a2.vec_id) AS dup_of
  FROM assign a1
  JOIN assign a2 ON a1.cluster = a2.cluster AND a2.vec_id < a1.vec_id
  JOIN embeddings e1 ON e1.vec_id = a1.vec_id
  JOIN embeddings e2 ON e2.vec_id = a2.vec_id
  WHERE round({_duck_cosine('e1.embedding', 'e2.embedding')}, 6) >= 0.35
  GROUP BY 1
)
SELECT a.vec_id, a.cluster, CAST(p.dup_of AS BIGINT) AS dup_of,
       p.dup_of IS NOT NULL AS is_dup
FROM assign a LEFT JOIN pairs p ON p.id1 = a.vec_id
"""
)


# ---------- IVF-PQ ADC search ----------

def sim_search_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 with asymmetric distance computation for query
    vectors vec_id < 5 — the FAISS-style compressed-index ANN: coarse
    k-means cells (probe 2 of 4) + per-subspace PQ codebooks, with
    query-time distances read from a broadcast (query, subspace,
    code) lookup table instead of the raw vectors."""
    from ..operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5), dim=64,
        coarse_k=4, m=4, pq_k=4, iters=2, nprobe=2, k=5,
    )


def _ivfpq_oracle(coarse_k: int, m: int, subdim: int, pq_k: int,
                  iters: int, nprobe: int, topk: int, nq: int,
                  rerank: int | None = None,
                  train_where: str | None = None) -> str:
    from .extension_queries import _duck_sq_dist
    from .quality_queries import pq_subspace_ctes

    ctes = kmeans_assign_ctes(coarse_k, iters, train_where) + pq_subspace_ctes(
        m, subdim, pq_k, iters, train_where
    )
    ctes.append(
        f"q AS (SELECT vec_id AS query_id, embedding AS qv"
        f" FROM embeddings WHERE vec_id < {nq})"
    )
    probe_d = _duck_sq_dist("q.qv", f"c{iters}.centroid")
    ctes.append(
        f"probed AS (SELECT query_id, cell FROM ("
        f" SELECT q.query_id, c{iters}.cluster AS cell,"
        f" row_number() OVER (PARTITION BY q.query_id"
        f" ORDER BY round({probe_d}, 6) ASC, c{iters}.cluster ASC) AS cr"
        f" FROM q CROSS JOIN c{iters}) WHERE cr <= {nprobe})"
    )
    lut_parts = []
    code_parts = []
    for s in range(m):
        lo, hi = s * subdim + 1, (s + 1) * subdim
        d = _duck_sq_dist(f"q.qv[{lo}:{hi}]", "cb.centroid")
        lut_parts.append(
            f"SELECT q.query_id, {s} AS s, cb.cluster AS code,"
            f" round({d}, 6) AS d FROM q CROSS JOIN s{s}c{iters} cb"
        )
        code_parts.append(f"SELECT vec_id, {s} AS s, code{s} AS code FROM asg{s}")
    ctes.append("lut AS (" + " UNION ALL ".join(lut_parts) + ")")
    ctes.append("codes AS (" + " UNION ALL ".join(code_parts) + ")")
    ctes.append(
        "cand AS (SELECT p.query_id, a.vec_id AS neighbor_id"
        " FROM assign a JOIN probed p ON a.cluster = p.cell"
        " WHERE a.vec_id != p.query_id)"
    )
    ctes.append(
        "adc AS (SELECT c.query_id, c.neighbor_id,"
        " CAST(sum(CAST(l.d AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist"
        " FROM cand c JOIN codes co ON co.vec_id = c.neighbor_id"
        " JOIN lut l ON l.query_id = c.query_id AND l.s = co.s"
        " AND l.code = co.code GROUP BY 1, 2)"
    )
    if rerank is None:
        return (
            "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, rank, neighbor_id, adc_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM adc
) WHERE rank <= {topk}
"""
        )
    # FAISS refine stage (mirrors operators/similarity.ivfpq_rerank):
    # ADC top-``rerank`` shortlist, re-ranked by exact sequential-fold
    # cosine against the raw vectors, top-``topk`` kept.
    from .extension_queries import _duck_cosine

    ctes.append(
        f"shortlist AS (SELECT query_id, neighbor_id FROM ("
        f" SELECT *, row_number() OVER (PARTITION BY query_id"
        f" ORDER BY adc_dist ASC, neighbor_id ASC) AS srank FROM adc)"
        f" WHERE srank <= {rerank})"
    )
    ctes.append(
        f"rr AS (SELECT s.query_id, s.neighbor_id,"
        f" round({_duck_cosine('qe.embedding', 'ne.embedding')}, 6) AS sim"
        f" FROM shortlist s"
        f" JOIN embeddings ne ON ne.vec_id = s.neighbor_id"
        f" JOIN embeddings qe ON qe.vec_id = s.query_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM rr
) WHERE rank <= {topk}
"""
    )


IVFPQ_ORACLE = _ivfpq_oracle(4, 4, 16, 4, 2, nprobe=2, topk=5, nq=5)


def sim_search_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + FAISS refine stage, the PRODUCTION-QUALITY ANN
    spelling (VERDICT r8 task 3): ADC top-50 shortlist from
    finer-grained codebooks (m=4, pq_k=32), re-ranked by EXACT cosine
    against the raw vectors for shortlist rows only. The planted-
    cluster fixture (tests/test_ann_recall.py) measured ADC-only
    ranking at recall@5 = 0.045 on tightly clustered data (PQ
    quantization error is cluster-radius-scale, so ADC ties within a
    cell) and the rerank spelling at 0.995 — certifying only the
    ADC-only row meant a user copying the certified plan got the
    measured-bad quality path. Refine cost: raw vectors are touched
    for queries x 50 rows only (~1e-4 of brute force at 1e9 docs)."""
    from ..operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5), dim=64,
        coarse_k=4, m=4, pq_k=32, iters=2, nprobe=2, k=5, rerank=50,
    )


IVFPQ_RERANK_ORACLE = _ivfpq_oracle(
    4, 4, 16, 32, 2, nprobe=2, topk=5, nq=5, rerank=50
)


def sim_search_ivfpq_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ rerank with SAMPLE-TRAINED quantizers (round 9): the
    coarse quantizer and all m codebooks train on a deterministic 1/4
    slice keyed on the Knuth mix (id * 2654435761) mod 2^32 — NOT the
    raw id, which correlates with content (see _ivfpq_train) — while
    assignment, encoding, and the exact-cosine refine still cover
    every row. FAISS's standard practice, and the knob that keeps a
    1e9-vector build's Lloyd iterations sample-sized instead of
    corpus-sized. The slice is pure int64 arithmetic, so the DuckDB
    oracle mirrors the sampled training CTE-for-CTE and the row is
    value-hash certified."""
    from ..operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5), dim=64,
        coarse_k=4, m=4, pq_k=32, iters=2, nprobe=2, k=5, rerank=50,
        train_sample=4,
    )


IVFPQ_SAMPLED_ORACLE = _ivfpq_oracle(
    4, 4, 16, 32, 2, nprobe=2, topk=5, nq=5, rerank=50,
    train_where="(vec_id * 2654435761) % 4294967296 < 1073741824",
)


_IVFPQ_UPD_INDEX_CACHE: dict[tuple, str] = {}


def sim_search_ivfpq_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ incremental-index lifecycle row (round 9): build the
    index on the standing corpus (vec_id % 5 != 0), append the ingest
    batch (vec_id % 5 == 0) with ivfpq_index_update against the
    FROZEN build-time quantizers — no retraining, prior rows
    untouched — then serve rerank queries from the grown index. With
    this row the ANN family has the full build/update/serve
    lifecycle driver-certified, like the substring/simhash/
    containment families. The DuckDB oracle is exact: frozen
    quantizers == training CTEs restricted to the build corpus
    (train_where) while assignment/encoding cover every row — the
    same _ivfpq_oracle machinery as the sampled row."""
    from ..operators.similarity import ivfpq_build, ivfpq_index_update, ivfpq_search

    from .index_cache import build_once

    emb = load_table(spark, sf_dir, "embeddings")

    def _build(idx: str) -> None:
        # train_on=build corpus (not the id<k default init): the build
        # corpus lacks ids 0 and 5, so the rank-based init over the k
        # smallest BUILD ids is the well-defined spelling — and the
        # one the oracle's train_where CTEs mirror.
        build_corpus = emb.filter(F.col("vec_id") % 5 != 0)
        ivfpq_build(
            build_corpus, idx,
            dim=64, coarse_k=4, m=4, pq_k=32, iters=2,
            train_on=build_corpus,
        )
        ivfpq_index_update(
            spark, idx, emb.filter(F.col("vec_id") % 5 == 0), dim=64, m=4
        )

    idx = build_once(
        _IVFPQ_UPD_INDEX_CACHE, sf_dir, "embeddings", "ivfpq_upd_idx_", _build
    )
    return ivfpq_search(
        spark, idx, emb.filter(F.col("vec_id") < 5), dim=64,
        m=4, nprobe=2, k=5, rerank=50, vectors=emb,
    )


IVFPQ_UPDATE_ORACLE = _ivfpq_oracle(
    4, 4, 16, 32, 2, nprobe=2, topk=5, nq=5, rerank=50,
    train_where="vec_id % 5 <> 0",
)


# Build-once IVF-PQ index per (process, sf_dir, data
# fingerprint — see index_cache.py), same contract as the
# containment/simhash index caches (training_queries.py): the first
# call trains and persists the index, every later call measures the
# serve — the shape a 100 TB pipeline actually runs (index build is a
# scheduled job; query batches amortize it to zero).
_IVFPQ_INDEX_CACHE: dict[tuple, str] = {}


def sim_search_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ serve from a persisted index + exact-cosine refine: the
    steady-state ANN lifecycle row (the ANN analogue of
    dedup_containment_index_serve / dedup_simhash_index_serve — with
    this row every index-backed family has a driver-certified
    build-once/serve-per-batch spelling). Identical parameters to
    sim_search_ivfpq_rerank, so it shares that row's oracle verbatim:
    parquet round-trips doubles exactly and the training is
    deterministic, so serving from the persisted (assign, codes,
    coarse, codebooks) artifact is output-identical to the inline
    retrain (parity pinned in tests/test_curation.py and
    tests/test_round9_plans.py). Per call only the 5 query vectors are
    encoded; the corpus embedding column is read for the 5 x 50
    shortlist rows alone."""
    from ..operators.similarity import ivfpq_build, ivfpq_search

    from .index_cache import build_once

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_once(
        _IVFPQ_INDEX_CACHE, sf_dir, "embeddings", "ivfpq_idx_",
        lambda p: ivfpq_build(emb, p, dim=64, coarse_k=4, m=4, pq_k=32, iters=2),
    )
    return ivfpq_search(
        spark, idx, emb.filter(F.col("vec_id") < 5), dim=64,
        m=4, nprobe=2, k=5, rerank=50, vectors=emb,
    )


# ---------- dataset card ----------

def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) release accounting: docs, tokens, exact-dup
    docs, mean char length."""
    return dataset_card(_docs(spark, sf_dir))


DATASET_CARD_ORACLE = f"""
WITH d AS (
  SELECT source, lang, text, {H.duck_str_hash('text')} AS fp,
         CAST(len({H.duck_tokens('text')}) AS BIGINT) AS nt
  FROM documents WHERE text IS NOT NULL
)
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT fp) AS BIGINT) AS distinct_docs,
       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS exact_dup_docs,
       CAST(sum(length(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
FROM d GROUP BY 1, 2
"""


SPECS: dict[str, QuerySpec] = {
    "quality_classifier_hashed": QuerySpec(
        quality_classifier_hashed, QUALITY_CLASSIFIER_ORACLE,
        "fastText-style hashed linear quality classifier (codegen-only)"),
    "dsir_select_en": QuerySpec(
        dsir_select_en, DSIR_ORACLE,
        "DSIR importance resampling toward a target domain"),
    "passage_dedup_spans": QuerySpec(
        passage_dedup_spans, PASSAGE_SPANS_ORACLE,
        "exact duplicate-passage spans (gaps-and-islands merge)"),
    "substring_dedup_chains": QuerySpec(
        substring_dedup_chains, SUBSTRING_CHAINS_ORACLE,
        "arbitrary-length exact repeated substrings via seed chaining"),
    "substring_dedup_incremental": QuerySpec(
        substring_dedup_incremental, SUBSTRING_INCREMENTAL_ORACLE,
        "batch-vs-corpus exact substring dedup (steady-state ingest)"),
    "substring_span_rows": QuerySpec(
        substring_span_rows, SUBSTRING_SPAN_ROWS_ORACLE,
        "span-level duplicated regions (token bounds per region)"),
    "substring_strip_text": QuerySpec(
        substring_strip_text, SUBSTRING_STRIP_ORACLE,
        "documents rewritten with duplicated regions cut"),
    "dedup_cdc_chunks": QuerySpec(
        dedup_cdc_chunks, CDC_CHUNKS_ORACLE,
        "content-defined chunking dedup (shift-resistant chunk fps)"),
    "dedup_cdc_chunks_join": QuerySpec(
        dedup_cdc_chunks_join, CDC_CHUNKS_ORACLE,
        "CDC dedup, skew-safe groupBy+join-back occurrence counting"),
    "passage_dedup_spans_join": QuerySpec(
        passage_dedup_spans_join, PASSAGE_SPANS_ORACLE,
        "passage spans, skew-safe groupBy+join-back counting"),
    "passages_sliding_window": QuerySpec(
        passages_sliding_window, PASSAGES_SLIDING_ORACLE,
        "overlapping retrieval passages (64-token windows, stride 32)"),
    "k_anonymity_customers": QuerySpec(
        k_anonymity_customers, K_ANON_ORACLE,
        "k-anonymity audit over quasi-identifiers"),
    "dedup_semdedup": QuerySpec(
        dedup_semdedup, SEMDEDUP_ORACLE,
        "SemDeDup: k-means cluster + intra-cluster cosine prune"),
    "sim_search_ivfpq": QuerySpec(
        sim_search_ivfpq, IVFPQ_ORACLE,
        "IVF-PQ ANN with ADC lookup tables (deterministic)"),
    "sim_search_ivfpq_rerank": QuerySpec(
        sim_search_ivfpq_rerank, IVFPQ_RERANK_ORACLE,
        "IVF-PQ + exact-cosine refine of the ADC top-50 shortlist"),
    "sim_search_ivfpq_serve": QuerySpec(
        sim_search_ivfpq_serve, IVFPQ_RERANK_ORACLE,
        "IVF-PQ rerank served from the persisted build-once index"),
    "sim_search_ivfpq_sampled": QuerySpec(
        sim_search_ivfpq_sampled, IVFPQ_SAMPLED_ORACLE,
        "IVF-PQ rerank with sample-trained quantizers (1/4 id-slice)"),
    "sim_search_ivfpq_index_update": QuerySpec(
        sim_search_ivfpq_index_update, IVFPQ_UPDATE_ORACLE,
        "IVF-PQ build/update/serve: batch appended to frozen index"),
    "dataset_card_report": QuerySpec(
        dataset_card_report, DATASET_CARD_ORACLE,
        "per-(source,lang) dataset-card accounting"),
}


# ---------- Johnson-Lindenstrauss random projection ----------

def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 -> 8 dims: p_j(v) = v . w_j with the
    engine's fixed pseudo-random hyperplane weights (functions/
    hashing.py — the same public-constant planes the LSH bucketer
    uses). Distance-preserving sketch vectors for cheap downstream
    clustering/dedup; every output double is a sequential fold, so
    the projection is bit-identical cross-engine and ships unrounded.

    Scale: a narrow per-row projection — zero shuffle, no Python; at
    100 TB this is the embedding-side analogue of the hashed-feature
    trick (dim cost drops 8x before any index build)."""
    from ..functions.hashing import _spark_plane_dot

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        *[
            F.expr(_spark_plane_dot("embedding", j)).alias(f"p{j}")
            for j in range(8)
        ],
    )


def _jl_oracle() -> str:
    from ..functions.hashing import _duck_plane_dot

    cols = ", ".join(
        f"{_duck_plane_dot('embedding', j)} AS p{j}" for j in range(8)
    )
    return f"SELECT vec_id, {cols} FROM embeddings"


JL_PROJECTION_ORACLE = _jl_oracle()

SPECS["embedding_jl_projection"] = QuerySpec(
    embedding_jl_projection, JL_PROJECTION_ORACLE,
    "Johnson-Lindenstrauss projection 64->8 (fixed planes, bit-exact)",
)


# ---------- classifier calibration / ECE (round 5) ----------

def eval_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table + expected calibration error of the hashed
    quality classifier's normalized score against the C4-rule label."""
    from ..operators.curation import calibration_ece

    return calibration_ece(_docs(spark, sf_dir), bins=10)


from .extension_queries import _SW as _ECE_SW  # noqa: E402

ECE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {H.duck_token_hashes('text')} AS th,
         {H.duck_tokens('text')} AS toks
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id,
         CAST(len(th) AS BIGINT) AS n_tokens,
         {_DUCK_WSUM} AS ws,
         length(text) >= 100 AND len(toks) >= 20
           AND CAST(len(list_filter(toks, x -> list_contains(['{_ECE_SW}'], x)))
                    AS DOUBLE) / len(toks) >= 0.01 AS ok
  FROM t WHERE len(th) > 0
), per_doc AS (
  SELECT
    CAST(least(9, floor(((CAST(ws AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * 1000.0)) + 1) / 2 * 10)) AS INTEGER)
      AS score_bin,
    CAST(floor(((CAST(ws AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * 1000.0)) + 1) / 2 * 1e6) AS BIGINT)
      AS p_micro,
    CASE WHEN ok THEN 1 ELSE 0 END AS y
  FROM s
), binned AS (
  SELECT score_bin, count(*) AS n_docs,
         CAST(sum(y) AS BIGINT) AS t_b,
         CAST(sum(p_micro) AS BIGINT) AS s_b
  FROM per_doc GROUP BY 1
)
SELECT score_bin, n_docs,
       CAST(t_b AS DOUBLE) / CAST(n_docs AS DOUBLE) AS acc,
       CAST(s_b AS DOUBLE) / CAST(n_docs * 1000000 AS DOUBLE) AS conf,
       CAST(sum(abs(t_b * 1000000 - s_b)) OVER () AS DOUBLE)
         / CAST(sum(n_docs) OVER () * 1000000 AS DOUBLE) AS ece
FROM binned
"""

SPECS["eval_calibration_ece"] = QuerySpec(
    eval_calibration_ece, ECE_ORACLE,
    "classifier reliability table + ECE, exact-integer gap accounting",
)
