"""Round-3 registered queries: warehouse maintenance, curation, and
analytics widening — table profiling, incremental rollup merge, fuzzy
entity matching, incremental corpus dedup, semantic decontamination,
hard-negative mining, grouped HLL, histogram quantiles, BPE tokenizer
training, cross-doc boilerplate detection, retrieval evaluation
(recall/MRR/NDCG), rolling z-score anomalies, ordered funnels, mutual
information, windowed PMI, A-ES weighted sampling, and the
near-dup-aware leakage-safe split.

The reference recomputes every aggregate from scratch per run
(resources/glue/FeatureStoreAggregateParquet.py) and has none of the
fuzzy/semantic/incremental shapes; these queries add what a 100 TB
deployment actually runs, each with a bit-exact DuckDB oracle per the
engine determinism rules (plans/spec.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators.dedup import minhash_lsh_join
from ..operators.fuzzy import edit_distance_join
from ..operators.profiling import merge_rollups, partial_rollup, table_stats
from ..operators.similarity import cosine
from ..operators.sketches import _HLL_MIX, hll_cardinality_grouped
from ..sources.batch import load_table
from .extension_queries import _DUCK_H, _DUCK_JACCARD, _DUCK_SH2, _duck_cosine
from .spec import QuerySpec


# ---------- table profiling ----------

def table_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column profile of orders: one row per
    column with rows/nulls/exact-NDV/min/max/avg-length."""
    return table_stats(load_table(spark, sf_dir, "orders"))


def table_stats_orders_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profile plan, tested: per-column NDV via the
    deterministic grouped HyperLogLog over cross-engine numeric keys
    (one unpivot scan + a columns x 1024 register shuffle) instead of
    the per-column count-distinct expansion.  Exact NDV ships
    alongside as the error contract."""
    return table_stats(load_table(spark, sf_dir, "orders"), ndv="sketch")


_SKETCH_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "dbl"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _duck_hll_key(c: str, kind: str) -> str:
    if kind == "num":
        k = f"CAST({c} AS BIGINT)"
    elif kind == "dbl":
        k = f"CAST(CAST({c} AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    elif kind == "ts":
        k = f"epoch_us({c})"
    else:
        k = H.duck_str_hash(c)
    return f"((({k}) % {H.P}) + {H.P}) % {H.P}"


def _table_stats_sketch_oracle() -> str:
    m = 1 << 10
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, {_duck_hll_key(c, k)} AS hk "
        f"FROM orders WHERE {c} IS NOT NULL"
        for c, k in _SKETCH_COLS
    )
    stats = "\nUNION ALL\n".join(_stats_col(c, k) for c, k in _SKETCH_COLS)
    return f"""
WITH u AS (
{unions}
), h AS (
  SELECT column_name,
         ((((({a} * hk + {b}) % {H.P}) * (({a} * hk + {b}) % {H.P}) + {a}) % {H.P})
          * (((({a} * hk + {b}) % {H.P}) * (({a} * hk + {b}) % {H.P}) + {a}) % {H.P})
          + {b}) % {H.P} AS h
  FROM u
), t AS (
  SELECT column_name, h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN 21
              ELSE 21 - length(bin(h // {m})) END AS rho
  FROM h
), regs AS (
  SELECT column_name, bucket, max(rho) AS rho FROM t GROUP BY 1, 2
), zv AS (
  SELECT column_name,
         sum((CAST(1 AS BIGINT) << (30 - rho)))
           + ({m} - count(*)) * (CAST(1 AS BIGINT) << 30) AS z,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) + ({m} - count(*)) AS v
  FROM regs GROUP BY 1
), e AS (
  SELECT column_name,
         CASE WHEN ({est_num!r} / CAST(z AS DOUBLE)) <= {2.5 * m} AND v > 0
              THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
              ELSE {est_num!r} / CAST(z AS DOUBLE) END AS est
  FROM zv
), s AS (
{stats}
)
SELECT s.column_name, n_rows, n_null, round(e.est, 4) AS ndv_sketch,
       n_distinct, min_val, max_val, avg_len
FROM s JOIN e ON s.column_name = e.column_name
"""


def _stats_col(c: str, kind: str) -> str:
    if kind in ("num", "dbl"):
        mn, mx, ln = f"CAST(min({c}) AS DOUBLE)", f"CAST(max({c}) AS DOUBLE)", "NULL"
    elif kind == "ts":
        mn = f"CAST(epoch(min({c})) AS DOUBLE)"
        mx = f"CAST(epoch(max({c})) AS DOUBLE)"
        ln = "NULL"
    else:  # varchar
        mn, mx = "NULL", "NULL"
        ln = (
            f"round(CAST(sum(CAST(length({c}) AS DECIMAL(18,4))) AS DOUBLE)"
            f" / count({c}), 4)"
        )
    return (
        f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count(*) - count({c}) AS BIGINT) AS n_null,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        f" CAST({mn} AS DOUBLE) AS min_val, CAST({mx} AS DOUBLE) AS max_val,"
        f" CAST({ln} AS DOUBLE) AS avg_len FROM orders"
    )


TABLE_STATS_ORACLE = "\nUNION ALL\n".join(
    _stats_col(c, k)
    for c, k in [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]
)


# ---------- incremental rollup maintenance ----------

def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: monthly revenue rollup built by
    MERGING two partial rollups (orders before / since 1998) instead
    of one full-table aggregation — the algebraic-merge identity the
    incremental pipeline relies on.  The oracle is the FULL recompute,
    so the green row proves merge == recompute exactly (decimal
    sums)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "month", F.to_date(F.date_trunc("month", F.col("o_orderdate")))
    )
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    base = partial_rollup(
        orders.filter(F.col("o_orderdate") < cutoff), ["month"], "o_totalprice"
    )
    delta = partial_rollup(
        orders.filter(F.col("o_orderdate") >= cutoff), ["month"], "o_totalprice"
    )
    merged = merge_rollups([base, delta])
    return merged.select(
        "month", F.round("total_sum", 2).alias("total_sum"), "total_cnt"
    )


ROLLUP_MERGE_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_sum,
       CAST(count(*) AS BIGINT) AS total_cnt
FROM orders GROUP BY 1
"""


# ---------- fuzzy entity matching ----------

def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names: distinct p_name pairs within
    edit distance 2, found via lossless symmetric-delete blocking
    (never all-pairs)."""
    return edit_distance_join(load_table(spark, sf_dir, "part"), "p_name", max_dist=2)


FUZZY_PART_ORACLE = """
WITH v AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_1, b.name AS name_2,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM v a JOIN v b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
"""


# ---------- incremental corpus dedup ----------

def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state dedup: the 20% of documents with doc_id % 5 == 0
    play the 'new batch'; find their near-duplicates in the 80%
    corpus via the batch-to-corpus MinHash-LSH band join (candidate
    cost ~ |batch|, corpus is the reusable index)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_lsh_join(
        corpus, batch, id_col="doc_id", text_col="text", n=2, threshold=0.5
    )


DEDUP_INCR_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_H} AS h FROM documents
), sh AS (
  SELECT doc_id, list_distinct({_DUCK_SH2}) AS sh FROM base
  WHERE len(list_distinct({_DUCK_SH2})) > 0
), sig AS (
  SELECT doc_id, sh, {H.duck_minhash_sigs('sh')} AS sig FROM sh
), banded AS (
  SELECT doc_id, sh,
         unnest(range(0, {H.N_BANDS})) AS band_id,
         unnest({H.duck_band_keys('sig')}) AS band_key
  FROM sig
), cand AS (
  SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
  FROM banded b JOIN banded c
    ON b.band_id = c.band_id AND b.band_key = c.band_key
   AND b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
)
SELECT batch_doc_id, corpus_doc_id, jaccard FROM (
  SELECT a.doc_id AS batch_doc_id, b.doc_id AS corpus_doc_id, {_DUCK_JACCARD} AS jaccard
  FROM cand JOIN sh a ON cand.bid = a.doc_id JOIN sh b ON cand.cid = b.doc_id
) WHERE jaccard >= 0.5
"""


# ---------- semantic decontamination ----------

def decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: corpus vectors (vec_id >= 10)
    whose cosine against any benchmark vector (vec_id < 10, broadcast)
    reaches 0.4, each with its best-matching benchmark id.  The
    semantic complement of the 5-gram decontam_ngram_overlap."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("be")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id", F.col("embedding").alias("ce")
    )
    sims = (
        corpus.crossJoin(F.broadcast(bench))
        .withColumn("sim", F.round(cosine("ce", "be"), 6))
        .filter(F.col("sim") >= 0.4)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("bench_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "bench_id", "sim")
    )


DECONTAM_SEM_ORACLE = f"""
SELECT vec_id, bench_id, sim FROM (
  SELECT c.vec_id AS vec_id, b.vec_id AS bench_id,
         round({_duck_cosine('c.embedding', 'b.embedding')}, 6) AS sim,
         row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY round({_duck_cosine('c.embedding', 'b.embedding')}, 6) DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings c JOIN embeddings b ON c.vec_id >= 10 AND b.vec_id < 10
  WHERE round({_duck_cosine('c.embedding', 'b.embedding')}, 6) >= 0.4
)
WHERE rn = 1
"""


# ---------- hard-negative mining ----------

def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: for each query vector
    (vec_id < 5) the 3 most-similar corpus vectors with a DIFFERENT
    label — the pairs that sharpen a retrieval model's decision
    boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qe"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("ce"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("clabel") != F.col("qlabel"))
        .withColumn("sim", F.round(cosine("qe", "ce"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "sim")
    )


HARD_NEG_ORACLE = f"""
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_duck_cosine('q.embedding', 'c.embedding')}, 6) AS sim,
         CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round({_duck_cosine('q.embedding', 'c.embedding')}, 6) DESC,
                    c.vec_id
         ) AS INTEGER) AS rank
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 5 AND c.label != q.label
) WHERE rank <= 3
"""


# ---------- per-group HLL ----------

def hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog distinct-user estimate (p=10) beside
    the exact count — grouped fixed-memory cardinality."""
    return hll_cardinality_grouped(
        load_table(spark, sf_dir, "events"), "user_id", ["event_type"], p=10
    )


def _hll_grouped_oracle() -> str:
    m = 1 << 10
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)
    return f"""
WITH h AS (
  SELECT event_type,
         ((((({a} * user_id + {b}) % {H.P}) * (({a} * user_id + {b}) % {H.P}) + {a}) % {H.P})
          * (((({a} * user_id + {b}) % {H.P}) * (({a} * user_id + {b}) % {H.P}) + {a}) % {H.P})
          + {b}) % {H.P} AS h
  FROM events
), t AS (
  SELECT event_type, h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN 21
              ELSE 21 - length(bin(h // {m})) END AS rho
  FROM h
), regs AS (
  SELECT event_type, bucket, max(rho) AS rho FROM t GROUP BY 1, 2
), zv AS (
  SELECT event_type,
         sum((CAST(1 AS BIGINT) << (30 - rho)))
           + ({m} - count(*)) * (CAST(1 AS BIGINT) << 30) AS z,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) + ({m} - count(*)) AS v
  FROM regs GROUP BY 1
), ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM events GROUP BY 1
), e AS (
  SELECT zv.event_type,
         CASE WHEN ({est_num!r} / CAST(z AS DOUBLE)) <= {2.5 * m} AND v > 0
              THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
              ELSE {est_num!r} / CAST(z AS DOUBLE) END AS est,
         ex.exact_distinct
  FROM zv JOIN ex ON zv.event_type = ex.event_type
)
SELECT event_type, round(est, 4) AS hll_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       round(abs(est - exact_distinct) / exact_distinct, 4) AS rel_err
FROM e
"""


SPECS: dict[str, QuerySpec] = {
    "table_stats_orders": QuerySpec(
        table_stats_orders, TABLE_STATS_ORACLE, "ANALYZE column profile, one pass"
    ),
    "table_stats_orders_sketch": QuerySpec(
        table_stats_orders_sketch, _table_stats_sketch_oracle(),
        "column profile with deterministic HLL NDV (the 100 TB plan)",
    ),
    "rollup_incremental_merge": QuerySpec(
        rollup_incremental_merge, ROLLUP_MERGE_ORACLE,
        "incremental MV maintenance: merge == recompute",
    ),
    "fuzzy_join_part_names": QuerySpec(
        fuzzy_join_part_names, FUZZY_PART_ORACLE,
        "edit-distance join, symmetric-delete blocking",
    ),
    "dedup_incremental_lsh": QuerySpec(
        dedup_incremental_lsh, DEDUP_INCR_ORACLE,
        "incremental batch-vs-corpus MinHash-LSH dedup",
    ),
    "decontam_semantic": QuerySpec(
        decontam_semantic, DECONTAM_SEM_ORACLE,
        "embedding-space benchmark decontamination",
    ),
    "embedding_hard_negatives": QuerySpec(
        embedding_hard_negatives, HARD_NEG_ORACLE,
        "contrastive hard-negative mining",
    ),
    "hll_users_by_type": QuerySpec(
        hll_users_by_type, _hll_grouped_oracle(), "grouped HLL cardinality"
    ),
}


# ---------- histogram quantile sketch ----------

def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value from a 128-bin fixed-grid histogram
    sketch — deterministic, mergeable, error <= one bin width."""
    from ..operators.sketches import hist_quantiles

    return hist_quantiles(
        load_table(spark, sf_dir, "events"), "value", (0.5, 0.9, 0.99), bins=128
    )


APPROX_QUANTILES_ORACLE = """
WITH src AS (
  SELECT value AS v FROM events WHERE value IS NOT NULL
), stats AS (
  SELECT CAST(min(v) AS DOUBLE) AS mn, CAST(max(v) AS DOUBLE) AS mx,
         count(*) AS n FROM src
), binned AS (
  SELECT least(127, greatest(0,
           CAST(floor((v - mn) * 128 / (mx - mn)) AS INT))) AS bin
  FROM src, stats
), cnts AS (
  SELECT bin, count(*) AS cnt FROM binned GROUP BY 1
), cum AS (
  SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM cnts
), probs AS (
  SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS prob
), hit AS (
  SELECT prob, bin, cnt, cum, mn, mx, n,
         row_number() OVER (PARTITION BY prob ORDER BY bin) AS rn
  FROM cum, stats, probs
  WHERE cum >= prob * n
)
SELECT prob,
       round(mn + (bin + (prob * n - (cum - cnt)) / cnt) * ((mx - mn) / 128), 6)
         AS quantile_est
FROM hit WHERE rn = 1
"""


SPECS["approx_quantiles_value"] = QuerySpec(
    approx_quantiles_value, APPROX_QUANTILES_ORACLE,
    "mergeable histogram quantile sketch",
)


# ---------- BPE tokenizer training ----------

def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merge rules learned from the documents corpus —
    iterative top-pair-and-merge as DataFrame aggregation, fully
    deterministic (count desc, pair asc ties), oracle = the same 3
    rounds unrolled as CTEs."""
    from ..operators.bpe import bpe_merges

    return bpe_merges(load_table(spark, sf_dir, "documents"), "text", k=3)


def _bpe_oracle(k: int = 3) -> str:
    ctes = [
        """v0 AS (
  SELECT substring(regexp_replace(w, '(.)', '||\\1', 'g'), 2) || '|' AS s,
         cnt
  FROM (
    SELECT w, count(*) AS cnt FROM (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x != '' AND NOT contains(x, '|'))) AS w
      FROM documents) GROUP BY w)
)"""
    ]
    for i in range(1, k + 1):
        prev = f"v{i - 1}"
        ctes.append(f"""p{i} AS (
  SELECT cnt, syms, unnest(range(1, len(syms))) AS i
  FROM (SELECT cnt, string_split(trim(s, '|'), '||') AS syms FROM {prev})
), t{i} AS (
  SELECT {i} AS rank, l AS left_sym, r AS right_sym, l || r AS merged,
         CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM (SELECT cnt, syms[i] AS l, syms[i + 1] AS r FROM p{i})
  GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 1
), v{i} AS (
  SELECT replace(s, '|' || left_sym || '||' || right_sym || '|',
                 '|' || left_sym || right_sym || '|') AS s, cnt
  FROM {prev}, t{i}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT rank, left_sym AS left, right_sym AS right, merged, pair_count FROM t{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


SPECS["bpe_top_merges"] = QuerySpec(
    bpe_top_merges, _bpe_oracle(3), "distributed BPE tokenizer training"
)


def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION (the 100 TB encode hot path): per-doc BPE
    token counts after the first 3 learned merges — encoding runs on
    the distinct-word vocabulary (broadcast literal replaces), each
    document aggregates its words' symbol counts through one join."""
    from ..operators.bpe import bpe_encode_counts

    return bpe_encode_counts(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )


def _bpe_encode_oracle(k: int = 3) -> str:
    ctes = [
        """v0 AS (
  SELECT w, substring(regexp_replace(w, '(.)', '||\\1', 'g'), 2) || '|' AS s,
         cnt
  FROM (
    SELECT w, count(*) AS cnt FROM (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x != '' AND NOT contains(x, '|'))) AS w
      FROM documents) GROUP BY w)
)"""
    ]
    for i in range(1, k + 1):
        prev = f"v{i - 1}"
        ctes.append(f"""p{i} AS (
  SELECT cnt, syms, unnest(range(1, len(syms))) AS i
  FROM (SELECT cnt, string_split(trim(s, '|'), '||') AS syms FROM {prev})
), t{i} AS (
  SELECT l AS left_sym, r AS right_sym
  FROM (SELECT cnt, syms[i] AS l, syms[i + 1] AS r FROM p{i})
  GROUP BY l, r ORDER BY sum(cnt) DESC, l, r LIMIT 1
), v{i} AS (
  SELECT w, replace(s, '|' || left_sym || '||' || right_sym || '|',
                    '|' || left_sym || right_sym || '|') AS s, cnt
  FROM {prev}, t{i}
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
wt AS (
  SELECT w, len(string_split(trim(s, '|'), '||')) AS ntok FROM v{k}
), dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            x -> x != '' AND NOT contains(x, '|'))) AS w
  FROM documents
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN wt USING (w) GROUP BY doc_id
"""
    )


SPECS["bpe_encode_documents"] = QuerySpec(
    bpe_encode_documents, _bpe_encode_oracle(3),
    "BPE tokenizer application: per-doc token counts",
)


# ---------- cross-document boilerplate detection ----------

def boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection: 64-token chunk fingerprints
    shared by >= 2 distinct documents (headers/footers/templates in a
    real crawl; the planted near-dup docs here).  Downstream removal is
    an anti-join of chunks against this class table — chunk-granular
    where whole-doc dedup is too blunt."""
    from ..operators.training_data import chunk_tokens

    chunks = chunk_tokens(
        load_table(spark, sf_dir, "documents"), chunk=64, stride=48
    )
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _boilerplate_oracle() -> str:
    from .training_queries import CHUNK_ORACLE

    return f"""
SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       min(doc_id) AS example_doc_id
FROM ({CHUNK_ORACLE}) c
GROUP BY chunk_fp
HAVING count(DISTINCT doc_id) >= 2
"""


SPECS["boilerplate_chunks"] = QuerySpec(
    boilerplate_chunks, _boilerplate_oracle(), "cross-doc boilerplate chunk classes"
)


# ---------- retrieval evaluation ----------

def retrieval_eval_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality, measured in-engine: the hyperplane-LSH top-5
    scored against brute-force exact top-5 as ground truth —
    macro recall@5 / MRR / NDCG@5 in one row.  The eval loop for the
    retrieval stack runs where the index runs (no result sampling to
    the driver)."""
    from ..operators.retrieval import retrieval_eval
    from .extension_queries import sim_search_cosine_topk, sim_search_lsh_topk

    truth = sim_search_cosine_topk(spark, sf_dir)
    results = sim_search_lsh_topk(spark, sf_dir)
    return retrieval_eval(results, truth, k=5)


def _retrieval_eval_oracle() -> str:
    from .extension_queries import SIM_LSH_ORACLE, SIM_TOPK_ORACLE

    idcg = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(1, least(5, nt) + 1),"
        " i -> 1.0 / log2(CAST(i + 1 AS DOUBLE)))), (a, x) -> a + x)"
    )
    return f"""
WITH truth AS ({SIM_TOPK_ORACLE}),
res AS ({SIM_LSH_ORACLE}),
nt AS (SELECT query_id, count(*) AS nt FROM truth GROUP BY 1),
hits AS (
  SELECT r.query_id, r.rank FROM res r
  JOIN truth t ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
  WHERE r.rank <= 5
), agg AS (
  SELECT query_id, count(*) AS nh, min(rank) AS minrk,
         sum(CAST(round(1.0 / log2(rank + 1), 12) AS DECIMAL(18,12))) AS dcg
  FROM hits GROUP BY 1
), perq AS (
  SELECT
    CAST(round(CAST(coalesce(nh, 0) AS DOUBLE) / nt, 12) AS DECIMAL(18,12)) AS recall,
    CAST(round(CASE WHEN minrk IS NOT NULL THEN 1.0 / minrk ELSE 0.0 END, 12)
         AS DECIMAL(18,12)) AS rr,
    CAST(round(coalesce(CAST(dcg AS DOUBLE), 0.0) / ({idcg}), 12)
         AS DECIMAL(18,12)) AS ndcg
  FROM nt LEFT JOIN agg USING (query_id)
)
SELECT CAST(5 AS INTEGER) AS k, CAST(count(*) AS BIGINT) AS n_queries,
       round(CAST(sum(recall) AS DOUBLE) / count(*), 6) AS recall_at_5,
       round(CAST(sum(rr) AS DOUBLE) / count(*), 6) AS mrr,
       round(CAST(sum(ndcg) AS DOUBLE) / count(*), 6) AS ndcg_at_5
FROM perq
"""


SPECS["retrieval_eval_ann"] = QuerySpec(
    retrieval_eval_ann, _retrieval_eval_oracle(), "in-engine recall@k / MRR / NDCG"
)


# ---------- time-series anomaly detection ----------

def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomalies over events.value: |z| > 3
    vs the preceding-20-event baseline (decimal window sums — exact
    under any partitioning)."""
    from ..operators.timeseries import rolling_zscore_anomalies

    return rolling_zscore_anomalies(
        load_table(spark, sf_dir, "events"),
        series_cols=["user_id"],
        ts_col="ts",
        value_col="value",
        lookback=20,
        z_threshold=3.0,
        min_points=5,
        tiebreak_col="event_id",
    )


TS_ANOMALY_ORACLE = """
WITH w AS (
  SELECT user_id, ts, event_id, value,
         count(value) OVER win AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) OVER win AS DOUBLE) AS s1,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))
                       AS DECIMAL(28,8))) OVER win AS DOUBLE) AS s2
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT user_id, ts, value, n,
         sqrt(greatest((s2 - n * (s1 / n) * (s1 / n)) / (n - 1), 0.0)) AS stdv,
         (value - s1 / n)
           / sqrt(greatest((s2 - n * (s1 / n) * (s1 / n)) / (n - 1), 0.0)) AS zv
  FROM w
)
SELECT user_id, ts, value, round(zv, 6) AS zscore
FROM z WHERE n >= 5 AND stdv > 0 AND abs(zv) > 3.0
"""


# ---------- funnel analysis ----------

def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first view -> first click
    AFTER it -> first purchase AFTER that; one row of stage counts and
    conversion rates.  The ordered-sequence-match shape
    (MATCH_RECOGNIZE-lite) as three stage aggregations."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    nv, nc, np_ = [d.agg(F.count(F.lit(1)).alias(a)) for d, a in
                   ((v, "users_view"), (c, "users_click"), (p, "users_purchase"))]
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            F.col("users_view").cast("long").alias("users_view"),
            F.col("users_click").cast("long").alias("users_click"),
            F.col("users_purchase").cast("long").alias("users_purchase"),
            F.round(F.col("users_click") / F.col("users_view"), 6).alias("rate_click"),
            F.round(F.col("users_purchase") / F.col("users_click"), 6).alias(
                "rate_purchase"
            ),
        )
    )


FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS pt FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS users_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS users_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS users_purchase,
       round(CAST((SELECT count(*) FROM c) AS DOUBLE)
             / (SELECT count(*) FROM v), 6) AS rate_click,
       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
             / (SELECT count(*) FROM c), 6) AS rate_purchase
"""


# ---------- mutual information / entropy ----------

def feature_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-selection statistics: entropies of o_orderstatus and
    o_orderpriority and their mutual information, from one joint
    contingency aggregation (12-dp decimal term sums — ln() ULP
    differences between engines cannot move the result)."""
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    joint = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("nxy")
    )
    mx = joint.groupBy("o_orderstatus").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("o_orderpriority").agg(F.sum("nxy").alias("ny"))
    dec = "decimal(18,12)"
    cells = (
        joint.join(F.broadcast(mx), "o_orderstatus")
        .join(F.broadcast(my), "o_orderpriority")
        .select(
            F.round(
                (F.col("nxy") / n)
                * F.log((F.col("nxy") / n) / ((F.col("nx") / n) * (F.col("ny") / n))),
                12,
            ).cast(dec).alias("mi_term"),
        )
    )
    hx = mx.select(
        F.round(-(F.col("nx") / n) * F.log(F.col("nx") / n), 12).cast(dec).alias("t")
    ).agg(F.round(F.sum("t").cast("double"), 6).alias("h_status"))
    hy = my.select(
        F.round(-(F.col("ny") / n) * F.log(F.col("ny") / n), 12).cast(dec).alias("t")
    ).agg(F.round(F.sum("t").cast("double"), 6).alias("h_priority"))
    mi = cells.agg(F.round(F.sum("mi_term").cast("double"), 6).alias("mutual_info"))
    return (
        hx.crossJoin(hy)
        .crossJoin(mi)
        .select(
            F.lit(n).cast("long").alias("n_rows"),
            "h_status",
            "h_priority",
            "mutual_info",
        )
    )


MI_ORACLE = """
WITH joint AS (
  SELECT o_orderstatus AS x, o_orderpriority AS y, count(*) AS nxy FROM orders GROUP BY 1, 2
), tot AS (SELECT CAST(sum(nxy) AS DOUBLE) AS n FROM joint),
mx AS (SELECT x, sum(nxy) AS nx FROM joint GROUP BY 1),
my AS (SELECT y, sum(nxy) AS ny FROM joint GROUP BY 1),
mi AS (
  SELECT sum(CAST(round((nxy / n) * ln((nxy / n) / ((nx / n) * (ny / n))), 12)
                  AS DECIMAL(18,12))) AS v
  FROM joint JOIN mx USING (x) JOIN my USING (y), tot
), hx AS (
  SELECT sum(CAST(round(-(nx / n) * ln(nx / n), 12) AS DECIMAL(18,12))) AS v
  FROM mx, tot
), hy AS (
  SELECT sum(CAST(round(-(ny / n) * ln(ny / n), 12) AS DECIMAL(18,12))) AS v
  FROM my, tot
)
SELECT CAST((SELECT CAST(n AS BIGINT) FROM tot) AS BIGINT) AS n_rows,
       round(CAST((SELECT v FROM hx) AS DOUBLE), 6) AS h_status,
       round(CAST((SELECT v FROM hy) AS DOUBLE), 6) AS h_priority,
       round(CAST((SELECT v FROM mi) AS DOUBLE), 6) AS mutual_info
"""


SPECS["ts_anomaly_zscore"] = QuerySpec(
    ts_anomaly_zscore, TS_ANOMALY_ORACLE, "rolling z-score anomaly flags"
)
SPECS["funnel_view_click_purchase"] = QuerySpec(
    funnel_view_click_purchase, FUNNEL_ORACLE, "ordered conversion funnel"
)
SPECS["feature_mutual_info"] = QuerySpec(
    feature_mutual_info, MI_ORACLE, "entropy / mutual information"
)


# ---------- windowed co-occurrence PMI ----------

def token_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token pairs by windowed PMI (co-occurrence within ±2
    positions) — the distributional-semantics statistic behind
    count-based embeddings.  Pair and marginal probabilities both
    derive from the SAME pair table (marginal = slot occurrences /
    2·N_pairs), so the measure is self-consistent; ranking sorts
    6-dp-rounded PMI with a pair tiebreak.

    Plan: tokens stay an ARRAY — distance-d pairs come from zipping
    the array against its d-shifted self (JVM-side, no self-join on
    positions); one explode feeds the pair aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(H.spark_tokens("text")).alias("t"))
    pair_expr = (
        "flatten(transform(sequence(1, 2), d -> CASE WHEN size(t) > d THEN "
        "zip_with(slice(t, 1, size(t) - d), slice(t, d + 1, size(t) - d), "
        "(a, b) -> struct(least(a, b) AS x, greatest(a, b) AS y)) "
        "ELSE array() END))"
    )
    pairs = (
        toks.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    tot = pairs.agg(F.sum("nxy").cast("double").alias("np"))
    mx = (
        pairs.select(F.col("x").alias("tok"), "nxy")
        .unionByName(pairs.select(F.col("y").alias("tok"), "nxy"))
        .groupBy("tok")
        .agg(F.sum("nxy").alias("nt"))
    )
    scored = (
        pairs.join(F.broadcast(mx.select(F.col("tok").alias("x"), F.col("nt").alias("nx"))), "x")
        .join(F.broadcast(mx.select(F.col("tok").alias("y"), F.col("nt").alias("ny"))), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x", "y", "nxy",
            F.round(
                F.log(
                    (F.col("nxy") / F.col("np"))
                    / ((F.col("nx") / (2.0 * F.col("np"))) * (F.col("ny") / (2.0 * F.col("np"))))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), F.asc("x"), F.asc("y"))
        .limit(20)
        .select("x", "y", F.col("nxy").cast("long").alias("nxy"), "pmi")
    )


def _pmi_oracle() -> str:
    toks = H.duck_tokens("text")
    return f"""
WITH toks AS (
  SELECT {toks} AS t FROM documents
), pr AS (
  SELECT least(t[i], t[i + d]) AS x, greatest(t[i], t[i + d]) AS y
  FROM (
    SELECT t, unnest(range(1, 3)) AS d FROM toks
  ), LATERAL (SELECT unnest(range(1, greatest(len(t) - d + 1, 1))) AS i)
), pairs AS (
  SELECT x, y, count(*) AS nxy FROM pr GROUP BY 1, 2
), tot AS (SELECT CAST(sum(nxy) AS DOUBLE) AS np FROM pairs),
mx AS (
  SELECT tok, sum(nxy) AS nt FROM (
    SELECT x AS tok, nxy FROM pairs UNION ALL SELECT y AS tok, nxy FROM pairs
  ) GROUP BY 1
)
SELECT x, y, CAST(nxy AS BIGINT) AS nxy,
       round(ln((nxy / np) / ((a.nt / (2.0 * np)) * (b.nt / (2.0 * np)))), 6) AS pmi
FROM pairs JOIN mx a ON a.tok = pairs.x JOIN mx b ON b.tok = pairs.y, tot
ORDER BY pmi DESC, x, y LIMIT 20
"""


SPECS["token_pmi_topk"] = QuerySpec(
    token_pmi_topk, _pmi_oracle(), "windowed co-occurrence PMI"
)


# ---------- deterministic weighted sampling ----------

def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): key = u^(1/w) with u a deterministic id-hash uniform and
    w = n_chars; the global top-25 keys are the sample.  One scan +
    a TakeOrdered top-k — the distributed replacement for sequential
    reservoir sampling; inclusion follows doc length
    (P[first] = w_i/Σw)."""
    docs = load_table(spark, sf_dir, "documents")
    a, b = H.MINHASH_A[7], H.MINHASH_B[7]
    u = ((F.lit(a) * F.col("doc_id") + F.lit(b)) % F.lit(H.P) + 1.0) / F.lit(
        float(H.P + 1)
    )
    key = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (
        docs.select("doc_id", "n_chars", F.round(key, 12).alias("skey"))
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(25)
    )


def _weighted_sample_oracle() -> str:
    a, b = H.MINHASH_A[7], H.MINHASH_B[7]
    return f"""
SELECT doc_id, n_chars,
       round(pow((({a} * doc_id + {b}) % {H.P} + 1.0) / {float(H.P + 1)!r},
                 1.0 / n_chars), 12) AS skey
FROM documents
ORDER BY skey DESC, doc_id LIMIT 25
"""


SPECS["sample_weighted_docs"] = QuerySpec(
    sample_weighted_docs, _weighted_sample_oracle(), "A-ES weighted sampling"
)


# ---------- leakage-safe (near-dup aware) split ----------

def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split that can NEVER separate near-duplicates:
    assignment hashes the doc's dedup-component canonical id (min doc
    in its near-dup group; itself when unduplicated), so a document
    and its near-copies always land on the same side — closing the
    eval-leakage hole a plain per-doc hash split leaves open.
    Composes the Jaccard pair graph + connected components + the
    deterministic id-hash bucket."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.training_data import _id_hash, connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=2, threshold=0.5,
        block_cols=("lang",), length_band=50,
    )
    comp = connected_components(edges)
    canon = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("canonical_id", F.coalesce("component_id", "doc_id"))
    )
    bucket = (_id_hash("canonical_id") % 100).cast("int")
    return canon.select(
        "doc_id",
        "canonical_id",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
    ).select("doc_id", "canonical_id", "bucket", "split")


def _leakage_safe_oracle() -> str:
    from .training_queries import CC_ORACLE

    canon_hash = (
        f"({H.MINHASH_A[0]} * ({H.duck_str_hash('CAST(canonical_id AS VARCHAR)')})"
        f" + {H.MINHASH_B[0]}) % {H.P}"
    )
    return f"""
SELECT doc_id, canonical_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, canonical_id, CAST({canon_hash} % 100 AS INTEGER) AS bucket
  FROM (
    SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS canonical_id
    FROM documents d LEFT JOIN ({CC_ORACLE}) c USING (doc_id)
  )
)
"""


SPECS["split_leakage_safe"] = QuerySpec(
    split_leakage_safe, _leakage_safe_oracle(), "near-dup-aware leakage-safe split"
)


# ---------- sketch mergeability (HLL register union) ----------

def hll_merge_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-merge identity, proven in-engine: HLL registers built
    independently on two halves of events (user_id parity) and
    max-merged produce EXACTLY the whole-corpus estimate — the
    algebraic property that lets per-shard sketches roll up without
    rescanning (the fixed-memory analogue of rollup_incremental_merge).
    One output row: merged estimate, direct estimate, equal flag."""
    from ..operators.sketches import _HLL_MIX, hll_cardinality

    ev = load_table(spark, sf_dir, "events")
    m = 1 << 10
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)

    h1 = (F.lit(a) * F.col("user_id").cast("long") + F.lit(b)) % F.lit(H.P)
    t = (
        ev.select((F.col("user_id") % 2).alias("half"), h1.alias("h1"))
        .withColumn("h2", (F.col("h1") * F.col("h1") + F.lit(a)) % F.lit(H.P))
        .withColumn("h", (F.col("h2") * F.col("h2") + F.lit(b)) % F.lit(H.P))
        .select(
            "half",
            (F.col("h") % m).alias("bucket"),
            F.when(F.expr(f"h div {m}") == 0, F.lit(21))
            .otherwise(F.lit(21) - F.length(F.expr(f"bin(h div {m})")))
            .cast("int")
            .alias("rho"),
        )
    )
    # per-half registers (the shard sketches), then the MERGE: max per
    # bucket across halves — associative, so any shard tree works
    half_regs = t.groupBy("half", "bucket").agg(F.max("rho").alias("rho"))
    merged_regs = half_regs.groupBy("bucket").agg(F.max("rho").alias("rho"))
    zv = merged_regs.agg(
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
    raw = F.lit(est_num) / F.col("z").cast("double")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")),
    ).otherwise(raw)
    merged = zv.select(F.round(corrected, 4).alias("merged_estimate"))
    direct = hll_cardinality(ev, "user_id", p=10).select(
        F.col("hll_estimate").alias("direct_estimate")
    )
    return merged.crossJoin(direct).select(
        "merged_estimate",
        "direct_estimate",
        (F.col("merged_estimate") == F.col("direct_estimate")).alias("merge_exact"),
    )


def _hll_merge_oracle() -> str:
    from ..operators.sketches import _HLL_MIX
    from .training_queries import HLL_ORACLE

    m = 1 << 10
    a, b = H.MINHASH_A[_HLL_MIX], H.MINHASH_B[_HLL_MIX]
    alpha = 0.7213 / (1 + 1.079 / m)
    est_num = alpha * m * m * float(1 << 30)
    return f"""
WITH h AS (
  SELECT user_id % 2 AS half,
         ((((({a} * user_id + {b}) % {H.P}) * (({a} * user_id + {b}) % {H.P}) + {a}) % {H.P})
          * (((({a} * user_id + {b}) % {H.P}) * (({a} * user_id + {b}) % {H.P}) + {a}) % {H.P})
          + {b}) % {H.P} AS h
  FROM events
), t AS (
  SELECT half, h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN 21
              ELSE 21 - length(bin(h // {m})) END AS rho
  FROM h
), half_regs AS (
  SELECT half, bucket, max(rho) AS rho FROM t GROUP BY 1, 2
), merged_regs AS (
  SELECT bucket, max(rho) AS rho FROM half_regs GROUP BY 1
), zv AS (
  SELECT sum((CAST(1 AS BIGINT) << (30 - rho)))
           + ({m} - count(*)) * (CAST(1 AS BIGINT) << 30) AS z,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) + ({m} - count(*)) AS v
  FROM merged_regs
), merged AS (
  SELECT round(CASE WHEN ({est_num!r} / CAST(z AS DOUBLE)) <= {2.5 * m} AND v > 0
              THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
              ELSE {est_num!r} / CAST(z AS DOUBLE) END, 4) AS merged_estimate
  FROM zv
), direct AS (
  SELECT hll_estimate AS direct_estimate FROM ({HLL_ORACLE})
)
SELECT merged_estimate, direct_estimate,
       merged_estimate = direct_estimate AS merge_exact
FROM merged, direct
"""


SPECS["hll_merge_identity"] = QuerySpec(
    hll_merge_identity, _hll_merge_oracle(), "sketch merge == direct (HLL)"
)


# ---------- grouped histogram quantiles ----------

def approx_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95 of events.value from per-group 128-bin
    histogram sketches (each group's grid spans its own range)."""
    from ..operators.sketches import hist_quantiles_grouped

    return hist_quantiles_grouped(
        load_table(spark, sf_dir, "events"), "value", ["event_type"], (0.5, 0.95),
        bins=128,
    )


APPROX_QUANTILES_GROUPED_ORACLE = """
WITH src AS (
  SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
), stats AS (
  SELECT event_type, CAST(min(v) AS DOUBLE) AS mn, CAST(max(v) AS DOUBLE) AS mx,
         count(*) AS n
  FROM src GROUP BY 1
), binned AS (
  SELECT s.event_type,
         least(127, greatest(0,
           CAST(floor((v - mn) * 128 / (mx - mn)) AS INT))) AS bin
  FROM src s JOIN stats USING (event_type)
), cnts AS (
  SELECT event_type, bin, count(*) AS cnt FROM binned GROUP BY 1, 2
), cum AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM cnts
), probs AS (
  SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS prob
), hit AS (
  SELECT c.event_type, prob, bin, cnt, cum, mn, mx, n,
         row_number() OVER (PARTITION BY c.event_type, prob ORDER BY bin) AS rn
  FROM cum c JOIN stats USING (event_type), probs
  WHERE cum >= prob * n
)
SELECT event_type, prob,
       round(mn + (bin + (prob * n - (cum - cnt)) / cnt) * ((mx - mn) / 128), 6)
         AS quantile_est
FROM hit WHERE rn = 1
"""


SPECS["approx_quantiles_by_type"] = QuerySpec(
    approx_quantiles_by_type, APPROX_QUANTILES_GROUPED_ORACLE,
    "grouped histogram quantile sketch",
)


# ---------- incremental JOIN-view maintenance (round 4) ----------

def mv_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view delta maintenance: the per-segment revenue view
    (orders ⋈ customer, grouped by c_mktsegment) maintained by merging
    the partial aggregate of the DELTA orders (since 1998) into the
    partial built from the base orders — the ΔA⋈B term of incremental
    join-view maintenance (the dimension side is static, so the A⋈ΔB
    and ΔA⋈ΔB terms vanish; a changing dimension adds the symmetric
    terms with the same plan shape). The oracle is the FULL recompute,
    so the green row proves delta-merge == recompute exactly.

    Scale: each increment pays delta ⋈ broadcast(dim) + a
    segment-cardinality partial; the base table is never rescanned —
    MV maintenance cost tracks the delta, exactly like
    rollup_incremental_merge but across a join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")

    def part(o):
        return (
            o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_d"),
                F.count("*").alias("n"),
            )
        )

    base = part(orders.filter(F.col("o_orderdate") < cutoff))
    delta = part(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(F.sum("rev_d").alias("rev_d"), F.sum("n").alias("n_orders"))
        .select(
            "c_mktsegment",
            F.round(F.col("rev_d").cast("double"), 2).alias("revenue"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
    )


MV_JOIN_ORACLE = """
SELECT c_mktsegment,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""

SPECS["mv_join_incremental"] = QuerySpec(
    mv_join_incremental, MV_JOIN_ORACLE,
    "incremental join-view maintenance: delta-merge == recompute",
)


# ---------- CCNet perplexity buckets (round 4) ----------

def ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: docs ranked by unigram-LM
    perplexity and cut into tertiles; per-bucket counts and ppl
    bounds. The mixture recipe keeps head+middle and drops (or
    down-weights) the tail.

    Scale note: ntile here is one window over the |docs|-row scored
    frame; at 100 TB the cuts come from the mergeable histogram
    quantile sketch (operators/sketches.hist_quantiles) and the
    bucket assignment becomes a broadcast range lookup — same
    output, no global sort."""
    from ..operators.lm import unigram_perplexity

    scored = unigram_perplexity(load_table(spark, sf_dir, "documents"))
    w = Window.orderBy(F.col("ppl").asc(), F.col("doc_id").asc())
    lab = (
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
    )
    return (
        scored.withColumn("t", F.ntile(3).over(w))
        .groupBy(lab.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("ppl").alias("min_ppl"),
            F.max("ppl").alias("max_ppl"),
        )
        .select("bucket", F.col("n_docs").cast("long").alias("n_docs"),
                "min_ppl", "max_ppl")
    )



CCNET_BUCKETS_ORACLE = """
WITH toks AS (
  SELECT doc_id AS id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')) AS tok
  FROM documents WHERE text IS NOT NULL
), vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), stats AS (
  SELECT sum(c) AS n_total, count(*) AS v_size FROM vocab
), tf AS (
  SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok
), scored AS (
  SELECT id, tf,
         CAST(tf * ln((coalesce(c, 0) + 1) / (n_total + v_size))
              AS DECIMAL(38,6)) AS ll_term
  FROM tf LEFT JOIN vocab USING (tok), stats
), per_doc AS (
  SELECT id, sum(tf) AS n_tokens, sum(ll_term) AS ll
  FROM scored GROUP BY id
), ppl AS (
  SELECT id AS doc_id,
         round(exp(-(CAST(ll AS DOUBLE) / n_tokens)), 4) AS ppl
  FROM per_doc
), tiled AS (
  SELECT doc_id, ppl, ntile(3) OVER (ORDER BY ppl ASC, doc_id ASC) AS t
  FROM ppl
)
SELECT CASE WHEN t = 1 THEN 'head' WHEN t = 2 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(ppl) AS min_ppl, max(ppl) AS max_ppl
FROM tiled GROUP BY 1
"""

SPECS["ccnet_ppl_buckets"] = QuerySpec(
    ccnet_ppl_buckets, CCNET_BUCKETS_ORACLE,
    "CCNet head/middle/tail perplexity tertiles",
)


# ---------- shuffle-skew diagnostics (round 4) ----------

def skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit for a prospective join/agg key: the top-10
    heaviest l_partkey groups with each group's share of the table and
    its ratio to the mean group size — the numbers that decide whether
    a key needs salting or AQE skew-join before a 100 TB shuffle.

    Scale: one groupBy on the key (map-side partials) + a broadcast
    one-row stats frame + TakeOrdered(10); never sorts the full key
    space."""
    li = load_table(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    stats = grp.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_groups")
    )
    return (
        grp.crossJoin(F.broadcast(stats))
        .select(
            "l_partkey",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
            (
                F.col("cnt").cast("double")
                * F.col("n_groups").cast("double")
                / F.col("total").cast("double")
            ).alias("x_mean"),
        )
        .orderBy(F.col("cnt").desc(), F.col("l_partkey").asc())
        .limit(10)
    )


SKEW_REPORT_ORACLE = """
WITH grp AS (
  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
), stats AS (
  SELECT sum(cnt) AS total, count(*) AS n_groups FROM grp
)
SELECT l_partkey, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       CAST(cnt AS DOUBLE) * CAST(n_groups AS DOUBLE) / CAST(total AS DOUBLE) AS x_mean
FROM grp, stats
ORDER BY cnt DESC, l_partkey ASC
LIMIT 10
"""

SPECS["skew_report_lineitem"] = QuerySpec(
    skew_report_lineitem, SKEW_REPORT_ORACLE,
    "join-key skew audit: top heavy keys, share, x-mean ratio",
)


# ---------- Zipf vocabulary fit (round 4) ----------

_ZIPF_TOPN = 50


def vocab_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: OLS slope/intercept of
    ln(freq) on ln(rank) over the top-50 terms — the one-row
    distribution fingerprint that flags boilerplate-heavy or
    synthetic corpora (natural text slopes ~ -1). Per-row ln() terms
    are rounded to 12 dp and summed in DECIMAL (the engine
    determinism rule), so the fit is bit-identical cross-engine.

    Scale: the only corpus-sized work is the token count (explode ->
    map-side partial agg, one vocab-keyed shuffle); the rank window
    and the OLS fold touch TakeOrdered(50) rows."""
    dec = "decimal(18,12)"
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(H.spark_tokens("text"))).alias("token"))
    )
    cnt = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps); the rank window then runs on the k-row frame only — a
    # global row_number window over the full vocab would funnel it
    # through one partition (InferWindowGroupLimit does not fire on
    # this shape)
    top = cnt.orderBy(F.desc("cnt"), F.asc("token")).limit(_ZIPF_TOPN)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token"))),
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    terms = ranked.select(
        F.round(x, 12).cast(dec).alias("x"),
        F.round(y, 12).cast(dec).alias("y"),
        F.round(x * y, 12).cast(dec).alias("xy"),
        F.round(x * x, 12).cast(dec).alias("xx"),
    )
    s = terms.agg(
        F.count("*").alias("n_terms"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "n_terms",
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("zipf_intercept"),
    )


VOCAB_ZIPF_ORACLE = f"""
WITH cnt AS (
  SELECT token, count(*) AS cnt
  FROM (SELECT unnest({H.duck_tokens('text')}) AS token FROM documents)
  GROUP BY 1
), ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM cnt
  QUALIFY rank <= {_ZIPF_TOPN}
), terms AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 12) AS DECIMAL(18,12)) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)), 12) AS DECIMAL(18,12)) AS y,
         CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 12)
              AS DECIMAL(18,12)) AS xy,
         CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 12)
              AS DECIMAL(18,12)) AS xx
  FROM ranked
), s AS (
  SELECT count(*) AS n_terms,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx
  FROM terms
)
SELECT n_terms,
       (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
         / (CAST(n_terms AS DOUBLE) * sxx - sx * sx) AS zipf_slope,
       (sy - (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
               / (CAST(n_terms AS DOUBLE) * sxx - sx * sx) * sx)
         / CAST(n_terms AS DOUBLE) AS zipf_intercept
FROM s
"""

SPECS["vocab_zipf_slope"] = QuerySpec(
    vocab_zipf_slope, VOCAB_ZIPF_ORACLE,
    "Zipf-law OLS fit over the top-50 vocabulary (one-row fingerprint)",
)


# ---------- entity resolution end-to-end (round 4) ----------

def entity_resolution_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution pipeline in one plan: lossless
    SymSpell deletion-variant blocking -> levenshtein<=2 verify
    (edit_distance_join) -> connected components over the match graph
    -> every distinct name tagged with its canonical entity (the
    lexicographic min of its component; singletons are their own
    entity) and the entity's member count. The chain-collapse step is
    what pair output alone can't give ("Corp", "Corp.", "Corpx" must
    land in ONE entity even when the outer pair exceeds the
    distance bound).

    Scale: the only quadratic-risk step is blocked by deletion
    variants (V x O(L^2) candidates, never V^2); CC iterates over the
    MATCH EDGES only; the final tag is one join of the name
    vocabulary against the component labels."""
    from ..operators.training_data import connected_components

    vocab = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .localCheckpoint()  # one scan+distinct feeds BOTH the blocking
        # join (via edit_distance_join's internal distinct, a no-op on
        # this frame) and the final canonical-tag join
    )
    pairs = edit_distance_join(vocab.select(F.col("name").alias("p_name")), "p_name", max_dist=2)
    comp = connected_components(pairs, src="name_1", dst="name_2").select(
        F.col("doc_id").alias("name"), F.col("component_id").alias("entity_id")
    )
    tagged = vocab.join(comp, "name", "left").select(
        "name", F.coalesce("entity_id", F.col("name")).alias("entity_id")
    )
    sizes = tagged.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("entity_size")
    )
    return tagged.join(sizes, "entity_id").select(
        F.col("name").alias("p_name"), "entity_id", "entity_size"
    )


ENTITY_RESOLUTION_ORACLE = """
WITH RECURSIVE v AS (
  SELECT DISTINCT p_name AS name FROM part
), pairs AS (
  SELECT a.name AS n1, b.name AS n2
  FROM v a JOIN v b ON a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 2
), e AS (
  SELECT n1 AS a, n2 AS b FROM pairs
  UNION
  SELECT n2 AS a, n1 AS b FROM pairs
), nodes AS (
  SELECT DISTINCT a AS id FROM e
), reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id
), comp AS (
  SELECT id, min(r) AS entity FROM reach GROUP BY 1
), tagged AS (
  SELECT v.name, coalesce(c.entity, v.name) AS entity_id
  FROM v LEFT JOIN comp c ON v.name = c.id
), sizes AS (
  SELECT entity_id, CAST(count(*) AS BIGINT) AS entity_size
  FROM tagged GROUP BY 1
)
SELECT t.name AS p_name, t.entity_id, s.entity_size
FROM tagged t JOIN sizes s ON t.entity_id = s.entity_id
"""

SPECS["entity_resolution_part_names"] = QuerySpec(
    entity_resolution_part_names, ENTITY_RESOLUTION_ORACLE,
    "end-to-end entity resolution: blocking -> verify -> components -> canonical tag",
)


# ---------- numeric correlation matrix (round 4) ----------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric columns —
    the feature-screening profile (collinearity / leakage scan) as ONE
    wide aggregate: every Σx, Σx², Σxy rides a DECIMAL(38,4) exact
    sum in a single scan (map-side partials; scale 4 = the content
    scale of 2-dp × 2-dp products, the only double→decimal cast both
    engines agree on bit-for-bit), then the 6 pairwise r values are
    per-row scalar math on the one-row sums frame, exploded to
    (col_1, col_2, n, corr) rows; r is rounded to 8 dp to absorb the
    >53-bit decimal→double cast divergence (see the verify skill).

    Scale: one scan whatever the pair count; no shuffle carries rows
    (the aggregate moves 15 numbers)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,4)"
    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c).cast(dec)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(dec)).cast("double").alias(f"ss_{c}")
        )
    pairs = [
        (x, y)
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    ]
    for x, y in pairs:
        aggs.append(
            F.sum((F.col(x) * F.col(y)).cast(dec)).cast("double").alias(f"sp_{x}_{y}")
        )
    s = li.agg(*aggs)
    n = F.col("n").cast("double")

    def _corr(x: str, y: str):
        num = n * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        den = F.sqrt(n * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")) * F.sqrt(
            n * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        )
        return num / den

    structs = F.array(
        *[
            F.struct(
                F.lit(x).alias("col_1"), F.lit(y).alias("col_2"),
                F.round(_corr(x, y), 8).alias("corr"),
            )
            for x, y in pairs
        ]
    )
    return s.select(F.col("n"), F.explode(structs).alias("p")).select(
        "p.col_1", "p.col_2", "n", "p.corr"
    )


def _corr_oracle() -> str:
    cols = _CORR_COLS
    dec = "DECIMAL(38,4)"
    sums = ["count(*) AS n"]
    for c in cols:
        sums.append(f"CAST(sum(CAST({c} AS {dec})) AS DOUBLE) AS s_{c}")
        sums.append(f"CAST(sum(CAST({c} * {c} AS {dec})) AS DOUBLE) AS ss_{c}")
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1 :]]
    for x, y in pairs:
        sums.append(f"CAST(sum(CAST({x} * {y} AS {dec})) AS DOUBLE) AS sp_{x}_{y}")
    sel = []
    for x, y in pairs:
        num = f"(CAST(n AS DOUBLE) * sp_{x}_{y} - s_{x} * s_{y})"
        den = (
            f"(sqrt(CAST(n AS DOUBLE) * ss_{x} - s_{x} * s_{x})"
            f" * sqrt(CAST(n AS DOUBLE) * ss_{y} - s_{y} * s_{y}))"
        )
        sel.append(
            f"SELECT '{x}' AS col_1, '{y}' AS col_2, n, round({num} / {den}, 8) AS corr FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL ".join(sel)
    )


CORR_MATRIX_ORACLE = _corr_oracle()

SPECS["corr_matrix_lineitem"] = QuerySpec(
    corr_matrix_lineitem, CORR_MATRIX_ORACLE,
    "Pearson correlation matrix in one scan (decimal-exact moments)",
)


# ---------- retention cohort matrix (round 4) ----------

def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-active day,
    retention(k) = distinct cohort users active k days later /
    cohort size. Pure integer counting plus one final division, so
    the matrix is bit-exact cross-engine.

    Scale: one user-keyed shuffle for first-day, one (user, day)
    distinct, one (cohort, k) count — all map-side-combinable; the
    output is bounded by days², never by events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    act = (
        active.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("k"),
        )
    )
    # act rows are already (user, day)-unique (ev.distinct()) and k is
    # a pure function of day given the cohort, so a plain count equals
    # countDistinct without the extra distinct-expansion shuffle phase
    ret = act.groupBy("cohort_day", "k").agg(
        F.count("*").alias("active_users")
    )
    size = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        ret.join(size, "cohort_day")
        .select(
            "cohort_day",
            "k",
            "active_users",
            "cohort_size",
            (
                F.col("active_users").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
    )


RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), firsts AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, day FROM ev
), act AS (
  SELECT a.user_id, f.cohort_day, datediff('day', f.cohort_day, a.day) AS k
  FROM active a JOIN firsts f ON a.user_id = f.user_id
), ret AS (
  SELECT cohort_day, k, count(*) AS active_users
  FROM act GROUP BY 1, 2
), sz AS (
  SELECT cohort_day, count(*) AS cohort_size FROM firsts GROUP BY 1
)
SELECT r.cohort_day, r.k, r.active_users, s.cohort_size,
       CAST(r.active_users AS DOUBLE) / s.cohort_size AS retention
FROM ret r JOIN sz s ON r.cohort_day = s.cohort_day
"""

SPECS["retention_cohorts"] = QuerySpec(
    retention_cohorts, RETENTION_ORACLE,
    "first-active-day cohort retention matrix (exact counts)",
)


# ---------- A/B two-sample z-test (round 4) ----------

def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test of event values between the hash-split
    variants (user_id parity = assignment — the deterministic
    experiment bucketing): one row with per-variant n/mean/variance,
    the z statistic and a |z| > 1.96 significance flag. Moments are
    DECIMAL-exact (value is 2-dp content, value² exactly 4-dp); the
    final z arithmetic is per-row double math rounded 8 dp to absorb
    the engines' >53-bit decimal→double cast divergence.

    Scale: one scan, 2-group partial aggregates; everything after the
    shuffle touches a 2-row frame."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "value"
    )
    g = ev.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sx") / n
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - F.lit(1.0))
    stats = g.select("variant", "n", mean.alias("mean"), var.alias("var"))
    a = stats.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_0"), F.col("mean").alias("mean_0"), F.col("var").alias("var_0")
    )
    b = stats.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_1"), F.col("mean").alias("mean_1"), F.col("var").alias("var_1")
    )
    z = (F.col("mean_1") - F.col("mean_0")) / F.sqrt(
        F.col("var_1") / F.col("n_1").cast("double")
        + F.col("var_0") / F.col("n_0").cast("double")
    )
    return a.crossJoin(b).select(
        "n_0",
        "n_1",
        F.round("mean_0", 8).alias("mean_0"),
        F.round("mean_1", 8).alias("mean_1"),
        F.round("var_0", 8).alias("var_0"),
        F.round("var_1", 8).alias("var_1"),
        F.round(z, 8).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


AB_ZTEST_ORACLE = """
WITH g AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS variant, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS sxx
  FROM events GROUP BY 1
), stats AS (
  SELECT variant, n, sx / CAST(n AS DOUBLE) AS mean,
         (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var
  FROM g
), a AS (
  SELECT n AS n_0, mean AS mean_0, var AS var_0 FROM stats WHERE variant = 0
), b AS (
  SELECT n AS n_1, mean AS mean_1, var AS var_1 FROM stats WHERE variant = 1
)
SELECT n_0, n_1,
       round(mean_0, 8) AS mean_0, round(mean_1, 8) AS mean_1,
       round(var_0, 8) AS var_0, round(var_1, 8) AS var_1,
       round((mean_1 - mean_0) / sqrt(var_1 / CAST(n_1 AS DOUBLE)
                                      + var_0 / CAST(n_0 AS DOUBLE)), 8) AS z,
       abs((mean_1 - mean_0) / sqrt(var_1 / CAST(n_1 AS DOUBLE)
                                    + var_0 / CAST(n_0 AS DOUBLE))) > 1.96
         AS significant
FROM a, b
"""

SPECS["ab_test_ztest"] = QuerySpec(
    ab_test_ztest, AB_ZTEST_ORACLE,
    "two-sample Welch z-test between deterministic variants",
)
