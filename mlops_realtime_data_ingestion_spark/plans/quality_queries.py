"""Registered queries: drift monitoring, CDC snapshot diff, lexical
retrieval (BM25), bloom-prefiltered join.

These extend the reference's model-monitoring surface
(pipelines/blockchain/evaluate.py RMSE/wQL; threshold re-computation
in the monitoring Lambda) with the input-side checks and incremental-
processing primitives a production MLOps pipeline runs beside them.
Every query carries a DuckDB oracle with the engine-wide determinism
rules (plans/spec.py): exact-integer cores, fixed-order float adds,
decimal-exact sums, unique tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators.cdc import snapshot_diff
from ..operators.drift import psi_ks_report
from ..operators.lm import unigram_perplexity
from ..operators.retrieval import bm25_topk
from ..operators.sketches import bloom_prefilter_join
from ..sources.batch import load_table
from .determinism import dsum, dsum_sql
from .spec import QuerySpec


def drift_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-distribution drift of events.value across the mid-month
    cutoff: PSI + binned KS, reference bins frozen on the first half."""
    return psi_ks_report(
        load_table(spark, sf_dir, "events"),
        value_col="value",
        ts_col="ts",
        cutoff="2024-01-16 00:00:00",
        bins=10,
    )


DRIFT_PSI_ORACLE = """
WITH src AS (
  SELECT value AS v, ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
  FROM events WHERE value IS NOT NULL
), bounds AS (
  SELECT min(v) AS mn, max(v) AS mx FROM src WHERE is_ref
), totals AS (
  SELECT count(*) FILTER (is_ref) AS n_ref,
         count(*) FILTER (NOT is_ref) AS n_cur FROM src
), binned AS (
  SELECT is_ref,
         least(9, greatest(0, CAST(floor((v - mn) * 10 / (mx - mn)) AS INT))) AS bin
  FROM src, bounds
), cnt AS (
  SELECT bin, count(*) FILTER (is_ref) AS c_ref,
         count(*) FILTER (NOT is_ref) AS c_cur
  FROM binned GROUP BY bin
), freq AS (
  SELECT r.b AS bin, n_ref, n_cur,
         (coalesce(c_ref, 0) + 0.5) / (n_ref + 5.0) AS p,
         (coalesce(c_cur, 0) + 0.5) / (n_cur + 5.0) AS q
  FROM (SELECT unnest(range(0, 10)) AS b) r
  LEFT JOIN cnt ON cnt.bin = r.b, totals
), terms AS (
  SELECT bin, n_ref, n_cur,
         CAST((p - q) * ln(p / q) AS DECIMAL(38,12)) AS psi_term,
         CAST(p AS DECIMAL(38,12)) AS p, CAST(q AS DECIMAL(38,12)) AS q
  FROM freq
), cum AS (
  SELECT n_ref, n_cur, psi_term,
         sum(p) OVER (ORDER BY bin) AS cp,
         sum(q) OVER (ORDER BY bin) AS cq
  FROM terms
)
SELECT round(CAST(sum(psi_term) AS DOUBLE), 6) AS psi,
       round(CAST(max(abs(cp - cq)) AS DOUBLE), 6) AS ks,
       CAST(max(n_ref) AS BIGINT) AS n_ref,
       CAST(max(n_cur) AS BIGINT) AS n_cur
FROM cum
"""


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between the per-user latest state at Jan 16 and
    Jan 31 (15-day trailing activity windows): insert/update/delete
    rows with old+new payloads."""
    return snapshot_diff(
        load_table(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        t1="2024-01-16 00:00:00",
        t2="2024-01-31 00:00:00",
        window_days=15,
        payload_cols=("event_type", "value"),
        tiebreak_col="event_id",
    )


CDC_DIFF_ORACLE = """
WITH s1 AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
    WHERE ts > TIMESTAMP '2024-01-16 00:00:00' - INTERVAL 15 DAY
      AND ts <= TIMESTAMP '2024-01-16 00:00:00') WHERE rn = 1
), s2 AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
    WHERE ts > TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 15 DAY
      AND ts <= TIMESTAMP '2024-01-31 00:00:00') WHERE rn = 1
)
SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
       CASE WHEN s1.user_id IS NULL THEN 'insert'
            WHEN s2.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       s1.event_type AS old_event_type, s1.value AS old_value,
       s2.event_type AS new_event_type, s2.value AS new_value
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s2.user_id IS NULL
   OR s1.event_type IS DISTINCT FROM s2.event_type
   OR s1.value IS DISTINCT FROM s2.value
"""


_BM25_TERMS = ["spark", "window", "join"]


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-20 for a fixed 3-term query over
    the documents corpus (Lucene k1=1.2, b=0.75 variant)."""
    return bm25_topk(
        load_table(spark, sf_dir, "documents"), _BM25_TERMS, k=20
    )


def _bm25_oracle(terms: list[str], k: int) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    per_cols = ",\n         ".join(
        f"max(CASE WHEN tok = '{t}' THEN s END) AS s{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(f"coalesce(s{i}, 0.0)" for i in range(len(terms)))
    hits = " + ".join(
        f"CAST(s{i} IS NOT NULL AS INT)" for i in range(len(terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({H.duck_tokens('text')}) AS tok
  FROM documents WHERE text IS NOT NULL
), dl AS (
  SELECT id, count(*) AS dl FROM toks GROUP BY id
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl
), tf AS (
  SELECT id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({in_list}) GROUP BY id, tok
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.id, tf.tok,
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * (1.2 + 1)
         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl
                        / (total_len / n_docs))) AS s
  FROM tf JOIN dfreq USING (tok) JOIN dl USING (id), stats
), per AS (
  SELECT id,
         {per_cols}
  FROM scored GROUP BY id
)
SELECT id AS doc_id, round({score}, 6) AS score,
       CAST({hits} AS INT) AS n_terms_hit
FROM per ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


BM25_ORACLE = _bm25_oracle(_BM25_TERMS, 20)


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ BUILDING-segment customers with a Bloom pre-filter on
    the orders side (fixed 8192-bit set, 3 hashes); false positives
    die in the real join so the result equals the plain join — the
    oracle IS the plain join. Per-customer order count + exact-decimal
    spend."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    joined = bloom_prefilter_join(
        orders,
        cust.select("c_custkey", "c_name"),
        big_key="o_custkey",
        small_key="c_custkey",
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(dsum("o_totalprice", 2), 2).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


BLOOM_JOIN_ORACLE = f"""
SELECT c.c_custkey, c.c_name, count(*) AS n_orders,
       round({dsum_sql('o.o_totalprice', 2)}, 2) AS total_spend
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY c.c_custkey, c.c_name
ORDER BY c.c_custkey
"""


def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality gate: per-doc perplexity under the add-one
    unigram LM trained on the corpus itself."""
    return unigram_perplexity(load_table(spark, sf_dir, "documents"))


PERPLEXITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({H.duck_tokens('text')}) AS tok
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
)
SELECT id AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(exp(-(CAST(ll AS DOUBLE) / n_tokens)), 4) AS ppl
FROM per_doc
"""


_MIX_WEIGHTS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: down-sample the lang-skewed corpus to the
    target 40/15/15/15/15 proportions (largest corpus achievable
    without upsampling), deterministic id-hash permille filter."""
    from ..operators.training_data import domain_mixture_sample

    return domain_mixture_sample(
        load_table(spark, sf_dir, "documents"), _MIX_WEIGHTS
    )


_MIX_VALUES = ", ".join(f"('{s}', {w})" for s, w in _MIX_WEIGHTS.items())

# doc-id bucket hash, identical to operators/training_data._id_hash(k=0)
_DUCK_ID_HASH = (
    f"({H.MINHASH_A[0]} * ({H.duck_str_hash('CAST(doc_id AS VARCHAR)')})"
    f" + {H.MINHASH_B[0]}) % {H.P}"
)

DOMAIN_MIX_ORACLE = f"""
WITH w(lang, w) AS (VALUES {_MIX_VALUES}),
counts AS (
  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
), j AS (
  SELECT counts.lang, cnt, w FROM counts JOIN w USING (lang)
), b AS (
  SELECT min(cnt / w) AS B FROM j
), rates AS (
  SELECT lang, CAST(floor(1000 * w * B / cnt) AS INTEGER) AS rate_permille
  FROM j, b
), keyed AS (
  SELECT doc_id, lang, CAST({_DUCK_ID_HASH} % 1000 AS INTEGER) AS hb
  FROM documents
)
SELECT doc_id, keyed.lang AS lang, hb
FROM keyed JOIN rates ON keyed.lang = rates.lang
WHERE hb < rate_permille
"""


def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer—supplier bipartite graph (edges =
    distinct (customer, supplier) pairs via orders⋈lineitem), 3
    synchronous iterations, top-20 nodes. Ranks are raw doubles —
    bit-identical across engines because every per-node sum is
    decimal-exact (see operators/graph.py)."""
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, "src", "dst", iters=3, damping=0.85)
    return pr.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(20)


def _pagerank_oracle(iters: int, topk: int) -> str:
    d = "CAST(0.85 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    ctes = [
        "e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,"
        " 's' || CAST(l_suppkey AS VARCHAR) AS b"
        " FROM orders JOIN lineitem ON o_orderkey = l_orderkey)",
        "und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)",
        "deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a)",
        "nodes AS (SELECT DISTINCT a FROM und)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT a, {one} / n AS r FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT und.b AS node,"
            f" CAST(r{i-1}.r / deg.deg AS DECIMAL(38,12)) AS c"
            f" FROM und JOIN r{i-1} ON und.a = r{i-1}.a"
            f" JOIN deg ON und.a = deg.a)"
        )
        ctes.append(
            f"s{i} AS (SELECT node, sum(c) AS s FROM c{i} GROUP BY node)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.a, ({one} - {d}) / n"
            f" + {d} * coalesce(CAST(s AS DOUBLE), CAST(0.0 AS DOUBLE)) AS r"
            f" FROM nodes LEFT JOIN s{i} ON nodes.a = s{i}.node, nn)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT a AS node, r AS rank FROM r{iters}"
        f" ORDER BY r DESC, a ASC LIMIT {topk}"
    )


PAGERANK_ORACLE = _pagerank_oracle(3, 20)


def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization of the 64-dim embeddings: 4 subspaces x 4
    codes (deterministic per-subspace k-means, 2 iterations) — the
    64-float -> 4-byte compression an IVF-PQ index stores."""
    from ..operators.similarity import pq_encode

    return pq_encode(load_table(spark, sf_dir, "embeddings"), dim=64, m=4, k=4)


def pq_subspace_ctes(m: int, subdim: int, k: int, iters: int,
                     train_where: str | None = None) -> list[str]:
    """Per-subspace deterministic-kmeans CTE chains (shared with the
    IVF-PQ oracle): for each subspace s the chain ends with the
    codebook ``s{s}c{iters}(cluster, centroid)`` and the assignment
    ``asg{s}(vec_id, code{s}, d{s})``.

    ``train_where`` mirrors the Spark sample-trained codebooks (see
    kmeans_assign_ctes): iterations over the sliced sample, init =
    the k smallest sample ids renumbered 0..k-1, final encoding over
    every row."""
    from .extension_queries import _duck_sq_dist

    ctes: list[str] = []
    for s in range(m):
        lo, hi = s * subdim + 1, (s + 1) * subdim
        ctes.append(
            f"pts{s} AS (SELECT vec_id, embedding[{lo}:{hi}] AS p FROM embeddings)"
        )
        if train_where is None:
            ctes.append(
                f"s{s}c0 AS (SELECT CAST(vec_id AS INTEGER) AS cluster,"
                f" embedding[{lo}:{hi}] AS centroid"
                f" FROM embeddings WHERE vec_id < {k})"
            )
            tr = f"pts{s}"
        else:
            ctes.append(
                f"pts{s}t AS (SELECT vec_id, embedding[{lo}:{hi}] AS p"
                f" FROM embeddings WHERE {train_where})"
            )
            ctes.append(
                f"s{s}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id)"
                f" - 1 AS INTEGER) AS cluster, p AS centroid FROM"
                f" (SELECT vec_id, p FROM pts{s}t ORDER BY vec_id LIMIT {k}))"
            )
            tr = f"pts{s}t"
        for it in range(1, iters + 1):
            prev = f"s{s}c{it - 1}"
            dist = _duck_sq_dist(f"{tr}.p", f"{prev}.centroid")
            ctes.append(
                f"s{s}a{it} AS (SELECT vec_id, cluster, p FROM ("
                f" SELECT {tr}.vec_id, {prev}.cluster, {tr}.p,"
                f" row_number() OVER (PARTITION BY {tr}.vec_id"
                f" ORDER BY {dist} ASC, {prev}.cluster ASC) AS rn"
                f" FROM {tr} CROSS JOIN {prev}) WHERE rn = 1)"
            )
            ctes.append(
                f"s{s}m{it} AS (SELECT cluster, dim,"
                f" CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)"
                f" / CAST(count(x) * 1000000000 AS DOUBLE) AS m"
                f" FROM (SELECT cluster, unnest(p) AS x,"
                f" unnest(range(0, len(p))) AS dim FROM s{s}a{it})"
                f" GROUP BY cluster, dim)"
            )
            ctes.append(
                f"s{s}c{it} AS (SELECT cluster, list(m ORDER BY dim) AS centroid"
                f" FROM s{s}m{it} GROUP BY cluster)"
            )
        last = f"s{s}c{iters}"
        dist = _duck_sq_dist(f"pts{s}.p", f"{last}.centroid")
        ctes.append(
            f"asg{s} AS (SELECT vec_id, cluster AS code{s}, round(d, 6) AS d{s}"
            f" FROM (SELECT pts{s}.vec_id, {last}.cluster, {dist} AS d,"
            f" row_number() OVER (PARTITION BY pts{s}.vec_id"
            f" ORDER BY {dist} ASC, {last}.cluster ASC) AS rn"
            f" FROM pts{s} CROSS JOIN {last}) WHERE rn = 1)"
        )
    return ctes


def _pq_oracle(m: int, subdim: int, k: int, iters: int) -> str:
    ctes = pq_subspace_ctes(m, subdim, k, iters)
    joins = "asg0" + "".join(
        f" JOIN asg{s} USING (vec_id)" for s in range(1, m)
    )
    codes = ", ".join(f"code{s}" for s in range(m))
    err = " + ".join(f"d{s}" for s in range(m))
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT vec_id, {codes}, round({err}, 6) AS recon_err FROM {joins}"
    )


PQ_ORACLE = _pq_oracle(4, 16, 4, 2)


SPECS: dict[str, QuerySpec] = {
    "drift_psi_events": QuerySpec(
        drift_psi_events, DRIFT_PSI_ORACLE, "input drift: PSI + binned KS"
    ),
    "cdc_snapshot_diff": QuerySpec(
        cdc_snapshot_diff, CDC_DIFF_ORACLE, "CDC: point-in-time snapshot diff"
    ),
    "text_bm25_topk": QuerySpec(
        text_bm25_topk, BM25_ORACLE, "lexical retrieval: BM25 top-k"
    ),
    "join_bloom_prefilter": QuerySpec(
        join_bloom_prefilter, BLOOM_JOIN_ORACLE, "bloom-prefiltered join"
    ),
    "text_perplexity_filter": QuerySpec(
        text_perplexity_filter, PERPLEXITY_ORACLE, "unigram-LM perplexity quality gate"
    ),
    "sample_domain_mixture": QuerySpec(
        sample_domain_mixture, DOMAIN_MIX_ORACLE, "target-proportion domain mixture sampling"
    ),
    "graph_pagerank_topk": QuerySpec(
        graph_pagerank_topk, PAGERANK_ORACLE, "iterative PageRank over the customer-supplier graph"
    ),
    "embedding_pq_codes": QuerySpec(
        embedding_pq_codes, PQ_ORACLE, "product quantization: per-subspace k-means codes"
    ),
}
