"""North-star extension queries (SURVEY.md §7 step 8): fuzzy dedup,
similarity search, text analysis, multimodal plumbing — the operators
a 100 TB training-data pipeline needs, each oracle-matched where the
semantics are SQL-expressible.

Oracles replicate the engine's exact integer hashing
(functions/hashing) and sequential-fold float math, so hashes match
bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs
from ..operators.multimodal import (
    attach_binary,
    decode_features,
    frame_sample,
    resize_buckets,
    sniff_format,
)
from ..operators.similarity import cosine, cosine_topk
from ..operators.text import fingerprint, language_id, quality_score, token_counts
from ..sources.batch import load_table
from .spec import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# ---------- shared oracle fragments ----------

_DUCK_H = H.duck_token_hashes("text")
_DUCK_SH2 = H.duck_shingle_hashes("h", 2)  # word-bigram shingles
_DUCK_JACCARD = (
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
)
# sequential left-fold dot product / norms: bitwise-identical to
# Spark's aggregate() fold
_DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),"
    " (acc, v) -> acc + v)"
)
_DUCK_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),"
    " (acc, v) -> acc + v))"
)
_NORM_TEXT = "regexp_replace(lower(trim(text)), '\\s+', ' ')"
_DUCK_TEXT_FP = H.duck_str_hash(_NORM_TEXT)


def _duck_cosine(a: str, b: str) -> str:
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_NORM.format(a=a)
    nb = _DUCK_NORM.format(a=b)
    return f"({dot}) / (({na}) * ({nb}))"


# ---------- dedup ----------

def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint: groups sharing the same
    normalized-text hash; keeps the min doc_id as canonical."""
    fp = fingerprint(_docs(spark, sf_dir))
    return fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("n_dups"),
    )


DEDUP_EXACT_ORACLE = f"""
SELECT {_DUCK_TEXT_FP} AS fp,
       min(doc_id) AS canonical_doc_id,
       count(*)    AS n_dups
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard >= 0.5 over (lang, length-band)-blocked
    pairs."""
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        n=2,
        threshold=0.5,
        block_cols=("lang",),
        length_band=50,
    )


DEDUP_JACCARD_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, n_chars, {_DUCK_H} AS h FROM documents
), sh AS (
  SELECT doc_id, lang, CAST(floor(n_chars / 50) AS INTEGER) AS band,
         list_distinct({_DUCK_SH2}) AS sh
  FROM base
)
SELECT doc_id_1, doc_id_2, jaccard FROM (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, {_DUCK_JACCARD} AS jaccard
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
) WHERE jaccard >= 0.5
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4x4) candidates, verified Jaccard >= 0.5 —
    the no-length-assumption scale path."""
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=2, threshold=0.5
    )


DEDUP_MINHASH_ORACLE = f"""
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
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_id_1, doc_id_2, jaccard FROM (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, {_DUCK_JACCARD} AS jaccard
  FROM cand JOIN sh a ON cand.id1 = a.doc_id JOIN sh b ON cand.id2 = b.doc_id
) WHERE jaccard >= 0.5
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(48) over word-bigram shingles, hamming <= 3,
    pigeonhole-minimal banding (4 lossless 12-bit bands, round 7).
    The <= ~1e7-doc plan; dedup_simhash_combi is the same operator on
    the >= 1e8-doc combination-banding path."""
    return simhash_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", max_hamming=3, bits=48, n=2
    )


DEDUP_SIMHASH_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_H} AS h FROM documents
), shl AS (
  SELECT doc_id, unnest({_DUCK_SH2}) AS th FROM base
), votes AS (
  SELECT doc_id, b.bit,
         CASE WHEN (((th * (1 + 2 * bit) + bit * 97) % {H.P}) >> (bit % 30)) & 1 = 1
              THEN 1 ELSE -1 END AS vote
  FROM shl, (SELECT unnest(range(0, 48)) AS bit) b
), bitsum AS (
  SELECT doc_id, bit, sum(vote) AS v FROM votes GROUP BY 1, 2
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY 1
), banded AS (
  SELECT doc_id, simhash, k AS band_id, (simhash >> (8 * k)) & 255 AS band_byte
  FROM sh, (SELECT unnest(range(0, 6)) AS k) ks
), cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS s1, b.simhash AS s2
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_byte = b.band_byte AND a.doc_id < b.doc_id
)
SELECT doc_id_1, doc_id_2, hamming FROM (
  SELECT id1 AS doc_id_1, id2 AS doc_id_2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming FROM cand
) WHERE hamming <= 3
"""


def dedup_simhash_combi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(48) hamming <= 3 via Manku block-COMBINATION banding
    (6 blocks choose 3 -> 20 join keys of 24 bits): the >= 1e8-doc
    plan, where simple 12-bit banding's docs^2 * 4 / 2^12
    random-collision term re-OOMs (VERDICT r7). Output identical to
    dedup_simhash — both blockings are lossless at hamming <= 3 — so
    the oracle is shared."""
    return simhash_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        max_hamming=3, bits=48, n=2, n_blocks=6,
    )


def dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) hamming <= 3 via block-combination banding at
    b=6 — the >= 1e9-doc plan (VERDICT r9 task 4): at 48 bits no
    block count holds 1e9 docs' random collisions linear, and
    choose_simhash_banding's contract names bits=64 as the fix (b=6
    at 64 bits: 20 keys, exact collision sum ~5.0e9 random pairs at
    1e9 docs, inside the 10-pairs/doc budget — pinned in
    tests/test_round10_plans.py). This row certifies the
    64-bit fingerprint end-to-end including the bit-63 sign boundary:
    bit 63 packs into the BIGINT sign bit as two's complement in BOTH
    engines (Spark shiftleft(1L, 63) == DuckDB's explicit bit-63 CASE
    — DuckDB raises on 1::BIGINT << 63), and every band key masks
    AFTER the arithmetic shift, so sign extension never leaks into a
    key. Different hash family than the 48-bit rows (64 per-bit
    votes), so this is its own oracle, not a shared one."""
    return simhash_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        max_hamming=3, bits=64, n=2, n_blocks=6,
    )


# 64-bit packing: bit 63 is the sign bit; DuckDB's << raises on
# 1::BIGINT << 63, so the top bit is added as the explicit min-long
# constant (two's complement — exactly what Spark's shiftleft(1L, 63)
# produces). Banding: 8 lossless pigeonhole bands of 8 bits (hamming
# <= 3 needs >= 4 bands; the oracle's banding only needs losslessness,
# not plan parity — the hamming filter makes outputs identical).
DEDUP_SIMHASH64_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_H} AS h FROM documents
), shl AS (
  SELECT doc_id, unnest({_DUCK_SH2}) AS th FROM base
), votes AS (
  SELECT doc_id, b.bit,
         CASE WHEN (((th * (1 + 2 * bit) + bit * 97) % {H.P}) >> (bit % 30)) & 1 = 1
              THEN 1 ELSE -1 END AS vote
  FROM shl, (SELECT unnest(range(0, 64)) AS bit) b
), bitsum AS (
  SELECT doc_id, bit, sum(vote) AS v FROM votes GROUP BY 1, 2
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v >= 0 THEN
                    CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                         ELSE CAST(1 AS BIGINT) << bit END
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY 1
), banded AS (
  SELECT doc_id, simhash, k AS band_id, (simhash >> (8 * k)) & 255 AS band_byte
  FROM sh, (SELECT unnest(range(0, 8)) AS k) ks
), cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS s1, b.simhash AS s2
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_byte = b.band_byte AND a.doc_id < b.doc_id
)
SELECT doc_id_1, doc_id_2, hamming FROM (
  SELECT id1 AS doc_id_1, id2 AS doc_id_2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming FROM cand
) WHERE hamming <= 3
"""


def dedup_simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state ingest spelling of SimHash dedup: pairs of the
    full self-run where at least one side is a BATCH doc (doc_id % 5
    == 0); the corpus side is never re-paired against itself. The
    production path reads the corpus fingerprints from a persisted
    simhash_index_build parquet (corpus_is_index=True) — both
    spellings are output-identical (tests/test_round8_plans.py)."""
    from ..operators.dedup import simhash_join

    docs = _docs(spark, sf_dir)
    return simhash_join(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        "doc_id", "text", max_hamming=3, bits=48, n=2,
    )


DEDUP_SIMHASH_INCR_ORACLE = DEDUP_SIMHASH_ORACLE.rstrip() + """
  AND (doc_id_1 % 5 = 0 OR doc_id_2 % 5 = 0)
"""


# Build-once simhash fingerprint index per (process, sf_dir, data
# fingerprint — see index_cache.py) — mirrors the containment
# index-serve row: the build runs at
# plan-construction time on first touch (the scheduled-job role) and
# every timed window measures the SERVE, which is the plan a 100 TB
# pipeline runs per ingest.
_SIMHASH_INDEX_CACHE: dict[tuple, str] = {}


def dedup_simhash_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-mode simhash serve: corpus fingerprints come from a
    persisted simhash_index_build parquet (the corpus text is never
    re-hashed); only the batch (doc_id % 5 == 0) is fingerprinted per
    call. Output-identical to dedup_simhash_incremental — the band
    keys are query-time bit arithmetic over the stored fingerprints —
    so the oracle is shared."""
    from ..operators.dedup import simhash_index_build, simhash_join

    from .index_cache import build_once

    docs = _docs(spark, sf_dir)
    idx = build_once(
        _SIMHASH_INDEX_CACHE, sf_dir, "documents", "simhash_idx_",
        lambda p: simhash_index_build(
            docs.filter(F.col("doc_id") % 5 != 0), p, "doc_id", "text"
        ),
        subpath="fingerprints",
    )
    return simhash_join(
        idx,
        docs.filter(F.col("doc_id") % 5 == 0),
        "doc_id", "text", max_hamming=3, bits=48, n=2,
        corpus_is_index=True,
    )


DEDUP_SIMHASH64_INCR_ORACLE = DEDUP_SIMHASH64_ORACLE.rstrip() + """
  AND (doc_id_1 % 5 = 0 OR doc_id_2 % 5 = 0)
"""

_SIMHASH64_INDEX_CACHE: dict[tuple, str] = {}


def dedup_simhash64_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit index-mode simhash serve — the spelling a 1e9-doc
    corpus actually runs (round 10): at that scale the banding rule
    REQUIRES the 64-bit fingerprint (choose_simhash_banding: no
    feasible capped block count at 48 bits), and production serves
    batches against a persisted fingerprint index, not a self-run.
    This row certifies that combination: corpus fingerprints from a
    persisted 64-bit simhash_index_build parquet (corpus text never
    re-hashed; band keys are query-time bit arithmetic over the
    stored longs, so the index is banding-agnostic like the 48-bit
    one), only the batch (doc_id % 5 == 0) fingerprinted per call,
    b=6 combination banding at serve time. Oracle = the full 64-bit
    self-run restricted to batch-touching pairs, mirroring the
    48-bit incremental rows."""
    from ..operators.dedup import simhash_index_build, simhash_join

    from .index_cache import build_once

    docs = _docs(spark, sf_dir)
    idx = build_once(
        _SIMHASH64_INDEX_CACHE, sf_dir, "documents", "simhash64_idx_",
        lambda p: simhash_index_build(
            docs.filter(F.col("doc_id") % 5 != 0), p, "doc_id", "text",
            bits=64,
        ),
        subpath="fingerprints",
    )
    return simhash_join(
        idx,
        docs.filter(F.col("doc_id") % 5 == 0),
        "doc_id", "text", max_hamming=3, bits=64, n=2, n_blocks=6,
        corpus_is_index=True,
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs with cosine >= 0.4 over BOUNDED
    candidates: same label AND >= 1 shared hyperplane-LSH bucket
    (4 planes x 2 tables of fixed public planes), exact cosine
    verification (VERDICT r8 task 1 — the old spelling was a raw
    intra-label all-pairs join, the engine's last corpus^2 plan:
    10 fixed labels means pairs grew as corpus^2/10 with no filter
    in front; the banding bounds candidates at constant bucket
    occupancy, with n_planes the log2(corpus)-scaled knob and the
    recall contract documented on the operator). threshold=0.3 with
    4-table amplification: the testdata plants no true vector dups,
    so the row certifies the plan on the upper intra-cluster tail —
    53 verified pairs at sf0.01 (the old 0.4 cut would leave 1
    surviving pair under banding, too thin a hash check)."""
    from ..operators.similarity import embedding_lsh_pairs

    return embedding_lsh_pairs(
        _emb(spark, sf_dir), threshold=0.3, n_planes=4, n_tables=4,
        block_cols=("label",),
    )


def _dedup_emb_oracle(n_planes: int, n_tables: int, threshold: float) -> str:
    keys = ", ".join(
        H.duck_hyperplane_bucket_table("embedding", n_planes, t)
        for t in range(n_tables)
    )
    return f"""
WITH k AS (
  SELECT vec_id, label, [{keys}] AS keys FROM embeddings
), banded AS (
  SELECT vec_id, label, tbl, keys[tbl + 1] AS bkey
  FROM k, (SELECT unnest(range(0, {n_tables})) AS tbl) ts
), cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM banded a JOIN banded b
    ON a.label = b.label AND a.tbl = b.tbl AND a.bkey = b.bkey
   AND a.vec_id < b.vec_id
)
SELECT vec_id_1, vec_id_2, sim FROM (
  SELECT c.id1 AS vec_id_1, c.id2 AS vec_id_2,
         round({_duck_cosine('e1.embedding', 'e2.embedding')}, 6) AS sim
  FROM cand c
  JOIN embeddings e1 ON e1.vec_id = c.id1
  JOIN embeddings e2 ON e2.vec_id = c.id2
) WHERE sim >= {threshold}
"""


DEDUP_EMB_ORACLE = _dedup_emb_oracle(4, 4, 0.3)


# ---------- similarity search ----------

def sim_search_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for query vectors vec_id < 5."""
    emb = _emb(spark, sf_dir)
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


SIM_TOPK_ORACLE = f"""
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_duck_cosine('q.embedding', 'c.embedding')}, 6) AS sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round({_duck_cosine('q.embedding', 'c.embedding')}, 6) DESC, c.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id
) WHERE rank <= 5
"""


def sim_search_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a LEARNED coarse quantizer: corpus bucketed by the
    deterministic k-means clusters (kmeans_embedding_clusters), probe
    the 2 nearest cells — the production IVF shape. Approximate w.r.t.
    brute force (recall asserted in tests/test_training_data.py) but
    fully DETERMINISTIC: the assignment is the unrolled-Lloyd output,
    centroids are integer-scaled exact means, and every ranking sorts
    on 6dp-rounded cosines — so even this learned-quantizer ANN is
    value-hash oracle-checked."""
    from ..operators.similarity import ivf_topk, kmeans_iterate

    emb = _emb(spark, sf_dir)
    clusters = kmeans_iterate(emb, k=4, iters=2).select("vec_id", "cluster")
    corpus = emb.join(clusters, "vec_id")
    return ivf_topk(
        corpus,
        corpus.filter(F.col("vec_id") < 5),
        assign_col="cluster",
        k=5,
        nprobe=2,
        exact_centroids=True,
    )


def _ivf_kmeans_oracle(k: int, iters: int, nprobe: int, topk: int, nq: int) -> str:
    """The kmeans CTE chain + exact centroids + probe/rank — mirrors
    ivf_topk(exact_centroids=True) over kmeans_iterate output."""
    ctes = [
        "pts AS (SELECT vec_id, embedding AS p FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INTEGER) AS cluster, embedding AS centroid"
        f" FROM embeddings WHERE vec_id < {k})",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        dist = _duck_sq_dist("pts.p", f"{prev}.centroid")
        ctes.append(
            f"a{it} AS (SELECT vec_id, cluster, p FROM ("
            f" SELECT pts.vec_id, {prev}.cluster, pts.p,"
            f" row_number() OVER (PARTITION BY pts.vec_id"
            f" ORDER BY {dist} ASC, {prev}.cluster ASC) AS rn"
            f" FROM pts CROSS JOIN {prev}) WHERE rn = 1)"
        )
        ctes.append(
            f"m{it} AS (SELECT cluster, dim,"
            f" CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)"
            f" / CAST(count(x) * 1000000000 AS DOUBLE) AS m"
            f" FROM (SELECT cluster, unnest(p) AS x,"
            f" unnest(range(0, len(p))) AS dim FROM a{it})"
            f" GROUP BY cluster, dim)"
        )
        ctes.append(
            f"c{it} AS (SELECT cluster, list(m ORDER BY dim) AS centroid"
            f" FROM m{it} GROUP BY cluster)"
        )
    last = f"c{iters}"
    dist = _duck_sq_dist("pts.p", f"{last}.centroid")
    ctes.append(
        f"af AS (SELECT vec_id, cluster, p FROM ("
        f" SELECT pts.vec_id, {last}.cluster, pts.p,"
        f" row_number() OVER (PARTITION BY pts.vec_id"
        f" ORDER BY {dist} ASC, {last}.cluster ASC) AS rn"
        f" FROM pts CROSS JOIN {last}) WHERE rn = 1)"
    )
    ctes.append(
        "cent AS (SELECT cluster, list(m ORDER BY dim) AS centroid FROM ("
        " SELECT cluster, dim,"
        " CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)"
        " / CAST(count(x) * 1000000000 AS DOUBLE) AS m"
        " FROM (SELECT cluster, unnest(p) AS x, unnest(range(0, len(p))) AS dim FROM af)"
        " GROUP BY cluster, dim) GROUP BY cluster)"
    )
    ctes.append(
        f"q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings"
        f" WHERE vec_id < {nq})"
    )
    cell_cos = _duck_cosine("q.qv", "cent.centroid")
    ctes.append(
        f"probed AS (SELECT query_id, qv, cell FROM ("
        f" SELECT q.query_id, q.qv, cent.cluster AS cell,"
        f" row_number() OVER (PARTITION BY q.query_id"
        f" ORDER BY round({cell_cos}, 6) DESC, cent.cluster ASC) AS cr"
        f" FROM q CROSS JOIN cent) WHERE cr <= {nprobe})"
    )
    cand_cos = _duck_cosine("pr.qv", "af.p")
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim FROM ("
        f" SELECT pr.query_id, af.vec_id AS neighbor_id,"
        f" round({cand_cos}, 6) AS sim,"
        f" row_number() OVER (PARTITION BY pr.query_id"
        f" ORDER BY round({cand_cos}, 6) DESC, af.vec_id ASC) AS rank"
        f" FROM probed pr JOIN af ON af.cluster = pr.cell AND af.vec_id != pr.query_id"
        f") WHERE rank <= {topk}"
    )




def sim_search_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: candidates restricted to the query's
    sign-pattern bucket (4 fixed public hyperplanes => 16 buckets),
    exact cosine rescoring. Fully deterministic — unlike IVF, this
    ANN path is value-hash oracle-checked."""
    from ..operators.similarity import lsh_bucket_topk

    emb = _emb(spark, sf_dir)
    return lsh_bucket_topk(emb, emb.filter(F.col("vec_id") < 5), n_planes=4, k=5)


_DUCK_BUCKET = H.duck_hyperplane_bucket("embedding", 4)

SIM_LSH_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_DUCK_BUCKET} AS bucket FROM embeddings
)
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_duck_cosine('q.embedding', 'c.embedding')}, 6) AS sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round({_duck_cosine('q.embedding', 'c.embedding')}, 6) DESC, c.vec_id
         ) AS rank
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < 5 AND c.vec_id != q.vec_id
) WHERE rank <= 5
"""


# ---------- text analysis ----------

def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_docs(spark, sf_dir))


from ..operators.text import STOPWORDS as _STOPWORDS  # noqa: E402

_SW = "', '".join(_STOPWORDS)

TEXT_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {H.duck_tokens('text')} AS toks FROM documents
)
SELECT doc_id,
       length(text) AS n_chars_m,
       len(toks)    AS n_words,
       CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks) AS avg_word_len,
       CAST(len(list_filter(toks, x -> list_contains(['{_SW}'], x))) AS DOUBLE) / len(toks) AS stopword_ratio,
       CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       length(text) >= 100 AND len(toks) >= 20
         AND CAST(len(list_filter(toks, x -> list_contains(['{_SW}'], x))) AS DOUBLE) / len(toks) >= 0.01 AS quality_ok
FROM t
"""


def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gates (Rae et al. 2021 §A1.1):
    duplicate-word / top-word / duplicate-bigram fractions per doc."""
    from ..operators.text import repetition_metrics

    return repetition_metrics(_docs(spark, sf_dir))


TEXT_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {H.duck_tokens('text')} AS t FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2
), wagg AS (
  SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS mx FROM wc GROUP BY 1
), bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS b
  FROM toks
), bc AS (
  SELECT doc_id, b, count(*) AS c FROM bigrams GROUP BY 1, 2
), bagg AS (
  SELECT doc_id, sum(c) AS bn, count(*) AS bnd FROM bc GROUP BY 1
)
SELECT w.doc_id,
       CAST(w.n AS BIGINT) AS n_words,
       round(1 - w.nd / CAST(w.n AS DOUBLE), 6) AS dup_word_frac,
       round(w.mx / CAST(w.n AS DOUBLE), 6) AS top_word_frac,
       round(1 - b.bnd / CAST(b.bn AS DOUBLE), 6) AS dup_bigram_frac
FROM wagg w LEFT JOIN bagg b ON b.doc_id = w.doc_id
"""


def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build (top-1000 corpus words, deterministic tie
    break) + per-document out-of-vocabulary fraction."""
    from ..operators.text import vocab_oov

    return vocab_oov(_docs(spark, sf_dir), vocab_size=1000)


TEXT_VOCAB_OOV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {H.duck_tokens('text')} AS t FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), vocab AS (
  SELECT w FROM (SELECT w, count(*) AS c FROM words GROUP BY 1)
  ORDER BY c DESC, w LIMIT 1000
)
SELECT doc_id,
       count(*) AS n_words,
       round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS oov_frac
FROM words LEFT JOIN vocab v ON v.w = words.w
GROUP BY 1
"""


def text_kwic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 UDTF surface: keyword-in-context via a Python table
    function under LATERAL — variable rows per doc from imperative
    logic (the one UDF shape scalar/grouped pandas UDFs can't
    express)."""
    from ..operators.text import kwic

    return kwic(_docs(spark, sf_dir), term="spark", window=3)


TEXT_KWIC_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {H.duck_tokens('text')} AS toks FROM documents
), idx AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t
)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       array_to_string(toks[greatest(1, i - 3):least(len(toks), i + 3)], ' ') AS context
FROM idx WHERE toks[i] = 'spark'
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_docs(spark, sf_dir))


def _lang_profile_values() -> str:
    from ..operators.text import LANG_PROFILES

    rows = []
    for lang, words in sorted(LANG_PROFILES.items()):
        arr = "', '".join(words)
        rows.append(f"('{lang}', ['{arr}'])")
    return ", ".join(rows)


TEXT_LANG_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {H.duck_tokens('text')} AS toks FROM documents
), profiles(lang_cand, profile) AS (
  VALUES {_lang_profile_values()}
), scored AS (
  SELECT doc_id, lang_cand,
         CAST(len(list_filter(toks, x -> list_contains(profile, x))) AS DOUBLE) / len(toks) AS score
  FROM t, profiles
)
SELECT doc_id, lang_cand AS lang_pred, score
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang_cand) = 1
"""


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation decision a training pipeline ships: three
    independent gates — heuristic quality (C4-style), repetition
    (Gopher), language agreement (predicted == labeled) — combined
    into one keep/drop verdict per document. Each gate's plan is the
    already-oracle-matched operator; the funnel is three left joins on
    doc_id with NULL-safe gate defaults (a doc missing from a gate's
    output fails that gate)."""
    from ..operators.text import repetition_metrics

    docs = _docs(spark, sf_dir)
    q = quality_score(docs).select("doc_id", "quality_ok")
    rep = repetition_metrics(docs).select(
        "doc_id", "dup_word_frac", "top_word_frac"
    )
    lid = language_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", "lang")
        .join(q, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(lid, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("quality_ok"), F.lit(False)).alias("quality_ok"),
            (
                F.coalesce(F.col("dup_word_frac") <= 0.6, F.lit(False))
                & F.coalesce(F.col("top_word_frac") <= 0.15, F.lit(False))
            ).alias("rep_ok"),
            F.coalesce(F.col("lang_pred") == F.col("lang"), F.lit(False)).alias(
                "lang_ok"
            ),
        )
        .withColumn(
            "keep", F.col("quality_ok") & F.col("rep_ok") & F.col("lang_ok")
        )
    )


CURATION_FUNNEL_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, text, {H.duck_tokens('text')} AS toks FROM documents
), q AS (
  SELECT doc_id,
         (length(text) >= 100 AND len(toks) >= 20
          AND CAST(len(list_filter(toks, x -> list_contains(['{_SW}'], x))) AS DOUBLE) / len(toks) >= 0.01) AS quality_ok
  FROM t
), words AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2
), wagg AS (
  SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS mx FROM wc GROUP BY 1
), profiles(lang_cand, profile) AS (
  VALUES {_lang_profile_values()}
), scored AS (
  SELECT doc_id, lang_cand,
         CAST(len(list_filter(toks, x -> list_contains(profile, x))) AS DOUBLE) / len(toks) AS score
  FROM t, profiles
), lid AS (
  SELECT doc_id, lang_cand AS lang_pred
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang_cand) = 1
)
SELECT d.doc_id,
       coalesce(q.quality_ok, false) AS quality_ok,
       (coalesce(round(1 - w.nd / CAST(w.n AS DOUBLE), 6) <= 0.6, false)
        AND coalesce(round(w.mx / CAST(w.n AS DOUBLE), 6) <= 0.15, false)) AS rep_ok,
       coalesce(l.lang_pred = d.lang, false) AS lang_ok,
       (coalesce(q.quality_ok, false)
        AND coalesce(round(1 - w.nd / CAST(w.n AS DOUBLE), 6) <= 0.6, false)
        AND coalesce(round(w.mx / CAST(w.n AS DOUBLE), 6) <= 0.15, false)
        AND coalesce(l.lang_pred = d.lang, false)) AS keep
FROM documents d
LEFT JOIN q ON q.doc_id = d.doc_id
LEFT JOIN wagg w ON w.doc_id = d.doc_id
LEFT JOIN lid l ON l.doc_id = d.doc_id
"""




def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(_docs(spark, sf_dir))


TEXT_TOKENS_ORACLE = f"""
SELECT doc_id,
       len({H.duck_tokens('text')}) AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_tokens
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir))


TEXT_FP_ORACLE = f"""
SELECT doc_id,
       {_DUCK_TEXT_FP} AS fp
FROM documents
"""


# ---------- embeddings stats / multimodal ----------

def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats. min/max over per-row identical doubles
    is order-independent, so no decimal machinery needed."""
    emb = _emb(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return (
        emb.withColumn("norm", F.round(norm, 6))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
        )
    )


EMB_STATS_ORACLE = f"""
SELECT label, count(*) AS n,
       min(round({_DUCK_NORM.format(a='embedding')}, 6)) AS min_norm,
       max(round({_DUCK_NORM.format(a='embedding')}, 6)) AS max_norm
FROM embeddings
GROUP BY 1
"""


def ts_profile_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (EDBT'19-style, engine-shaped):
    each user's behavior is summarized as a 24-dim hour-of-day
    activity profile (exact integer counts — one conditional-agg
    pass), then the profile TABLE (|users| rows, not |events|) is
    searched for each query user's top-5 cosine neighbors. The
    aggregation is what makes 100 TB tractable: similarity runs on
    the compressed profiles, never the raw series."""
    from ..operators.similarity import cosine
    from ..sources.batch import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    prof = ev.groupBy("user_id").agg(
        F.array(
            *[
                F.sum(F.when(F.hour("ts") == h, 1).otherwise(0)).cast("double")
                for h in range(24)
            ]
        ).alias("prof")
    )
    q = prof.filter(F.col("user_id") < 10).select(
        F.col("user_id").alias("query_id"), F.col("prof").alias("qp")
    )
    scored = (
        prof.crossJoin(F.broadcast(q))
        .filter(F.col("user_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine("qp", "prof"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("user_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", F.col("user_id").alias("neighbor_id"), "sim")
    )


_HOUR_PROFILE = ", ".join(
    f"CAST(sum(CASE WHEN hour(ts) = {h} THEN 1 ELSE 0 END) AS DOUBLE)"
    for h in range(24)
)

TS_PROFILE_ORACLE = f"""
WITH prof AS (
  SELECT user_id, [{_HOUR_PROFILE}] AS prof FROM events GROUP BY user_id
)
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT q.user_id AS query_id, c.user_id AS neighbor_id,
         round({_duck_cosine('q.prof', 'c.prof')}, 6) AS sim,
         row_number() OVER (
           PARTITION BY q.user_id
           ORDER BY round({_duck_cosine('q.prof', 'c.prof')}, 6) DESC, c.user_id
         ) AS rank
  FROM prof q JOIN prof c ON q.user_id < 10 AND c.user_id != q.user_id
) WHERE rank <= 5
"""


def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=4, 2 fixed Lloyd iterations, init =
    lowest-id vectors, DECIMAL-exact centroid means) — document
    clustering / IVF quantizer training as a DataFrame plan. The
    oracle unrolls the identical iterations in SQL."""
    from ..operators.similarity import kmeans_iterate

    return kmeans_iterate(_emb(spark, sf_dir), k=4, iters=2)


def _duck_sq_dist(p: str, c: str) -> str:
    diff = f"(CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(list_zip({p}, {c}), pr -> {diff} * {diff})),"
        f" (acc, v) -> acc + v)"
    )


def kmeans_assign_ctes(k: int, iters: int,
                       train_where: str | None = None) -> list[str]:
    """CTE chain (shared with the SemDeDup oracle) that unrolls the
    deterministic Lloyd iterations and ends with
    ``assign(vec_id, cluster, dist)`` — dist rounded to 6 dp.

    ``train_where``: mirror of the Spark side's sample-trained
    quantizer (kmeans_iterate(train_on=...)): the Lloyd iterations run
    over ``pts_t`` (the WHERE-sliced sample) with init = the k
    smallest sample ids renumbered 0..k-1 in id order; the final
    assignment still covers every row."""
    if train_where is None:
        ctes = [
            "pts AS (SELECT vec_id, embedding AS p FROM embeddings)",
            f"c0 AS (SELECT CAST(vec_id AS INTEGER) AS cluster, embedding AS centroid"
            f" FROM embeddings WHERE vec_id < {k})",
        ]
        tr = "pts"
    else:
        ctes = [
            "pts AS (SELECT vec_id, embedding AS p FROM embeddings)",
            f"pts_t AS (SELECT vec_id, embedding AS p FROM embeddings"
            f" WHERE {train_where})",
            f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1"
            f" AS INTEGER) AS cluster, p AS centroid FROM"
            f" (SELECT vec_id, p FROM pts_t ORDER BY vec_id LIMIT {k}))",
        ]
        tr = "pts_t"
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        dist = _duck_sq_dist(f"{tr}.p", f"{prev}.centroid")
        ctes.append(
            f"a{it} AS (SELECT vec_id, cluster, p FROM ("
            f" SELECT {tr}.vec_id, {prev}.cluster, {tr}.p,"
            f" row_number() OVER (PARTITION BY {tr}.vec_id"
            f" ORDER BY {dist} ASC, {prev}.cluster ASC) AS rn"
            f" FROM {tr} CROSS JOIN {prev}) WHERE rn = 1)"
        )
        ctes.append(
            f"m{it} AS (SELECT cluster, dim,"
            f" CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)"
            f" / CAST(count(x) * 1000000000 AS DOUBLE) AS m"
            f" FROM (SELECT cluster, unnest(p) AS x,"
            f" unnest(range(0, len(p))) AS dim FROM a{it})"
            f" GROUP BY cluster, dim)"
        )
        ctes.append(
            f"c{it} AS (SELECT cluster, list(m ORDER BY dim) AS centroid"
            f" FROM m{it} GROUP BY cluster)"
        )
    last = f"c{iters}"
    dist = _duck_sq_dist("pts.p", f"{last}.centroid")
    ctes.append(
        f"assign AS (SELECT vec_id, cluster, round(d, 6) AS dist FROM ("
        f" SELECT pts.vec_id, {last}.cluster, {dist} AS d,"
        f" row_number() OVER (PARTITION BY pts.vec_id"
        f" ORDER BY {dist} ASC, {last}.cluster ASC) AS rn"
        f" FROM pts CROSS JOIN {last}) WHERE rn = 1)"
    )
    return ctes


def _kmeans_oracle(k: int, iters: int) -> str:
    return (
        "WITH " + ",\n".join(kmeans_assign_ctes(k, iters))
        + "\nSELECT vec_id, cluster, dist FROM assign"
    )


KMEANS_ORACLE = _kmeans_oracle(4, 2)
IVF_KMEANS_ORACLE = _ivf_kmeans_oracle(4, 2, nprobe=2, topk=5, nq=5)


def embedding_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding compression for 100 TB storage: L2-normalize then
    symmetric int8 quantization (x/norm * 127, round-half-away).
    Purely per-row array math (narrow, zero shuffle); the q8 array
    cuts vector storage 4x and is what a production ANN index would
    ingest. Norm uses the sequential fold so both engines see
    identical doubles; round(double) is half-away-from-zero in Spark
    AND DuckDB, so the int8 codes match exactly. The q8 codes are
    emitted CSV-serialized (``q8_csv``): the driver's canonicalizer
    requires flat (hashable) column types, and a comma-joined int8
    string is byte-identical across both engines."""
    emb = _emb(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    out = emb.withColumn("nrm", norm)
    q8 = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") / F.col("nrm") * 127).cast("int"),
    )
    return out.select(
        "vec_id",
        F.round("nrm", 6).alias("norm"),
        F.concat_ws(",", q8).alias("q8_csv"),
    )


EMB_QUANT_ORACLE = f"""
SELECT vec_id, round(nrm, 6) AS norm,
       array_to_string(
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) / nrm * 127) AS INTEGER)),
         ',') AS q8_csv
FROM (
  SELECT vec_id, embedding, {_DUCK_NORM.format(a='embedding')} AS nrm
  FROM embeddings
)
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach payload -> JVM-side format sniff
    -> Arrow-batched mapInPandas decode stub. The stub's outputs are
    exact-integer byte math (chunk count, byte-sum mean = one IEEE
    division) so the Python stage is fully value-hash comparable —
    the oracle recomputes the same bytes via hex-pair decoding."""
    docs = attach_binary(_docs(spark, sf_dir))
    sniffed = sniff_format(docs)
    feats = decode_features(sniffed, target_partitions=8)
    return feats.select("doc_id", "payload_len", "n_chunks", F.round("mean_byte", 6).alias("mean_byte"))


# Byte value at 0-based offset i of encode(text), via hex-pair lookup
# (DuckDB has no blob subscript; hex+strpos is exact).
_DUCK_BYTE = (
    "(strpos('0123456789ABCDEF', substr(h, 2*i+1, 1))-1)*16 "
    "+ (strpos('0123456789ABCDEF', substr(h, 2*i+2, 1))-1)"
)

MULTIMODAL_DECODE_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
  FROM documents
), bytes AS (
  SELECT doc_id, {_DUCK_BYTE} AS v
  FROM docs, unnest(range(0, n)) AS u(i)
), sums AS (
  SELECT doc_id, sum(v) AS s FROM bytes GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(d.n, 0) AS INT) AS payload_len,
       CAST(ceil(coalesce(d.n, 0) / 64.0) AS INT) AS n_chunks,
       CASE WHEN coalesce(d.n, 0) > 0
            THEN round(CAST(s.s AS DOUBLE) / d.n, 6) ELSE 0.0 END AS mean_byte
FROM docs d LEFT JOIN sums s USING (doc_id)
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame fan-out over binary payloads (every 3rd 64-byte
    frame), Arrow-batched. Hex frames make the Python stage
    byte-exactly oracle-comparable — the ONE mapInPandas extension
    with a full value-hash check."""
    docs = attach_binary(_docs(spark, sf_dir)).filter(F.col("text").isNotNull())
    return frame_sample(docs, frame_bytes=64, every_k=3).orderBy("doc_id", "frame_idx")


MULTIMODAL_FRAME_ORACLE = """
SELECT doc_id, t.i AS frame_idx,
       lower(substring(hex(encode(text)), t.i*128+1, 128)) AS frame_hex,
       CAST(least(64, octet_length(encode(text)) - t.i*64) AS INT) AS frame_len
FROM documents CROSS JOIN LATERAL (
  SELECT unnest(generate_series(0,
    CAST(ceil(octet_length(encode(text))/64.0) AS INT)-1)) AS i) t
WHERE text IS NOT NULL AND t.i % 3 = 0
ORDER BY doc_id, frame_idx
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width resize contract, flat spelling: payload → 16
    buckets of byte stats (exact sum/len + one-division mean), one
    row per (doc, bucket). Same bucket boundaries as the array-typed
    ``resize_stub`` (width invariant asserted in tests); this shape
    makes the Python resize stage value-hash comparable."""
    docs = attach_binary(_docs(spark, sf_dir)).filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    return (
        resize_buckets(docs, target=16)
        .withColumn("bucket_mean", F.round("bucket_mean", 6))
        .orderBy("doc_id", "bucket")
    )


MULTIMODAL_RESIZE_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
), bytes AS (
  SELECT doc_id, i, {_DUCK_BYTE} AS v
  FROM docs, unnest(range(0, n)) AS u(i)
), buckets AS (
  SELECT doc_id, t,
         CASE WHEN (t*n)//16 < n THEN (t*n)//16 ELSE n-1 END AS lo,
         CASE WHEN (t*n)//16 < n
              THEN least(greatest(((t+1)*n)//16, (t*n)//16 + 1), n)
              ELSE n END AS hi
  FROM docs, unnest(range(0, 16)) AS u(t)
)
SELECT b.doc_id, CAST(b.t AS INT) AS bucket,
       CAST(b.hi - b.lo AS INT) AS bucket_len,
       CAST(sum(y.v) AS BIGINT) AS bucket_sum,
       round(CAST(sum(y.v) AS DOUBLE) / (b.hi - b.lo), 6) AS bucket_mean
FROM buckets b JOIN bytes y
  ON y.doc_id = b.doc_id AND y.i >= b.lo AND y.i < b.hi
GROUP BY b.doc_id, b.t, b.lo, b.hi
ORDER BY b.doc_id, bucket
"""


SPECS: dict[str, QuerySpec] = {
    "dedup_exact_fingerprint": QuerySpec(dedup_exact_fingerprint, DEDUP_EXACT_ORACLE, "dedup-exact"),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, DEDUP_JACCARD_ORACLE, "dedup-jaccard"),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, DEDUP_MINHASH_ORACLE, "dedup-minhash-lsh"),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_ORACLE, "dedup-simhash"),
    "dedup_simhash_combi": QuerySpec(
        dedup_simhash_combi, DEDUP_SIMHASH_ORACLE,
        "simhash near-dup pairs via Manku block-combination banding",
    ),
    "dedup_simhash64": QuerySpec(
        dedup_simhash64, DEDUP_SIMHASH64_ORACLE,
        "64-bit simhash pairs (the >= 1e9-doc fingerprint width), "
        "combination-banded, bit-63 sign boundary certified",
    ),
    "dedup_simhash64_index_serve": QuerySpec(
        dedup_simhash64_index_serve, DEDUP_SIMHASH64_INCR_ORACLE,
        "64-bit simhash serve from a persisted fingerprint index — "
        "the 1e9-doc production spelling",
    ),
    "dedup_simhash_incremental": QuerySpec(
        dedup_simhash_incremental, DEDUP_SIMHASH_INCR_ORACLE,
        "batch-vs-corpus simhash pairs, full-run-restricted-to-batch",
    ),
    "dedup_simhash_index_serve": QuerySpec(
        dedup_simhash_index_serve, DEDUP_SIMHASH_INCR_ORACLE,
        "simhash serve from the persisted fingerprint index",
    ),
    "dedup_embedding_cosine": QuerySpec(
        dedup_embedding_cosine, DEDUP_EMB_ORACLE,
        "embedding near-dup pairs, hyperplane-LSH-banded candidates"),
    "sim_search_cosine_topk": QuerySpec(sim_search_cosine_topk, SIM_TOPK_ORACLE, "ann-bruteforce"),
    "sim_search_lsh_topk": QuerySpec(sim_search_lsh_topk, SIM_LSH_ORACLE, "ann-lsh (deterministic)"),
    "sim_search_ivf_kmeans": QuerySpec(sim_search_ivf_kmeans, IVF_KMEANS_ORACLE, "ann-ivf, learned quantizer (deterministic)"),
    "text_quality_score": QuerySpec(text_quality_score, TEXT_QUALITY_ORACLE, "text-quality"),
    "text_lang_id": QuerySpec(text_lang_id, TEXT_LANG_ORACLE, "text-langid"),
    "text_repetition_metrics": QuerySpec(text_repetition_metrics, TEXT_REPETITION_ORACLE, "Gopher repetition gates"),
    "text_vocab_oov": QuerySpec(text_vocab_oov, TEXT_VOCAB_OOV_ORACLE, "vocab build + OOV scoring"),
    "curation_funnel": QuerySpec(curation_funnel, CURATION_FUNNEL_ORACLE, "quality+repetition+lang keep/drop verdict"),
    "text_kwic_udtf": QuerySpec(text_kwic_udtf, TEXT_KWIC_ORACLE, "keyword-in-context via Python UDTF + LATERAL"),
    "text_token_count": QuerySpec(text_token_count, TEXT_TOKENS_ORACLE, "text-tokens"),
    "text_fingerprint": QuerySpec(text_fingerprint, TEXT_FP_ORACLE, "text-fingerprint"),
    "embedding_stats": QuerySpec(embedding_stats, EMB_STATS_ORACLE, "embedding-stats"),
    "embedding_normalize_quantize": QuerySpec(embedding_normalize_quantize, EMB_QUANT_ORACLE, "int8 embedding compression"),
    "kmeans_embedding_clusters": QuerySpec(kmeans_embedding_clusters, KMEANS_ORACLE, "deterministic k-means clustering"),
    "ts_profile_topk": QuerySpec(ts_profile_topk, TS_PROFILE_ORACLE, "time-series profile similarity"),
    "multimodal_decode": QuerySpec(multimodal_decode, MULTIMODAL_DECODE_ORACLE, "multimodal decode (mapInPandas, byte-exact)"),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, MULTIMODAL_FRAME_ORACLE, "multimodal frame fan-out"),
    "multimodal_resize": QuerySpec(multimodal_resize, MULTIMODAL_RESIZE_ORACLE, "multimodal resize contract (flat bucket stats)"),
}


# ---------- clustering evaluation: label purity (round 4) ----------

def clustering_eval_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation: per-cluster label purity of the
    deterministic k-means (k=4, 2 Lloyd iterations) against the
    embeddings' ground-truth ``label`` — the in-engine quality gate a
    pipeline runs before trusting cluster-scoped operators (SemDeDup
    pruning, IVF cell routing) built on those assignments.

    Scale: assignment is the broadcast-centroid narrow pass; the eval
    itself is two tiny shuffles over (cluster,label) partial counts —
    never the vectors. Purity = majority-label count / cluster size
    (one integer division: bit-exact cross-engine)."""
    from ..operators.similarity import kmeans_iterate

    emb = _emb(spark, sf_dir)
    assign = kmeans_iterate(emb, k=4, iters=2).select("vec_id", "cluster")
    per = (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("cnt"))
    )
    size = per.groupBy("cluster").agg(F.sum("cnt").alias("size"))
    w = Window.partitionBy("cluster").orderBy(F.desc("cnt"), F.asc("label"))
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster", F.col("label").alias("top_label"), F.col("cnt").alias("top_cnt"))
    )
    return (
        top.join(size, "cluster")
        .select(
            "cluster",
            F.col("size").cast("long").alias("size"),
            "top_label",
            F.col("top_cnt").cast("long").alias("top_cnt"),
            (F.col("top_cnt").cast("double") / F.col("size")).alias("purity"),
        )
    )


CLUSTER_PURITY_ORACLE = (
    "WITH " + ",\n".join(kmeans_assign_ctes(4, 2)) + """,
per AS (
  SELECT a.cluster, e.label, count(*) AS cnt
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY 1, 2
), sz AS (
  SELECT cluster, CAST(sum(cnt) AS BIGINT) AS size FROM per GROUP BY 1
), top AS (
  SELECT cluster, label AS top_label, CAST(cnt AS BIGINT) AS top_cnt
  FROM (SELECT cluster, label, cnt,
               row_number() OVER (PARTITION BY cluster
                                  ORDER BY cnt DESC, label) AS rn
        FROM per)
  WHERE rn = 1
)
SELECT t.cluster, s.size, t.top_label, t.top_cnt,
       CAST(t.top_cnt AS DOUBLE) / s.size AS purity
FROM top t JOIN sz s ON t.cluster = s.cluster
"""
)

SPECS["clustering_eval_purity"] = QuerySpec(
    clustering_eval_purity, CLUSTER_PURITY_ORACLE,
    "per-cluster label purity of the deterministic k-means",
)


# ---------- MMR diversified re-ranking (round 4) ----------

_MMR_NQ, _MMR_KCAND, _MMR_KOUT = 3, 10, 5


def sim_search_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-rank of the exact cosine top-10:
    greedily pick 5 results per query maximizing
    0.7*sim(q,d) - 0.3*max_{s in picked} sim(d,s) — the standard
    diversified-retrieval step after any ANN/exact top-k. The greedy
    loop is unrolled as 5 deterministic DataFrame rounds (argmax via
    row_number with id tiebreak on 6dp-rounded sims), so the full
    pipeline is value-hash oracle-matched like the k-means family.

    Scale: corpus work is the one broadcast-query top-k scan the
    engine already does; everything MMR adds runs on the (queries x
    k_cand) candidate frame — k^2 pairwise sims and 5 tiny argmax
    rounds, independent of corpus size."""
    from ..operators.similarity import cosine

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("qsim", F.round(cosine("cv", "qv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cand_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_KCAND)
        .select("query_id", "cand_id", "qsim", "cv")
        .localCheckpoint()  # reused by every MMR round; truncates the scan lineage
    )
    a = cand.select("query_id", F.col("cand_id").alias("a_id"), F.col("cv").alias("av"))
    b = cand.select(
        F.col("query_id").alias("p_qid"), F.col("cand_id").alias("b_id"),
        F.col("cv").alias("bv"),
    )
    psim = (
        a.join(b, a["query_id"] == b["p_qid"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select("p_qid", "a_id", "b_id", F.round(cosine("av", "bv"), 6).alias("ps"))
    )
    base = cand.select("query_id", "cand_id", "qsim")
    sel = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "cand_id", F.lit(1).alias("pick"), "qsim")
    )
    for t in range(2, _MMR_KOUT + 1):
        remaining = base.join(
            sel.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_anti"
        )
        selp = sel.select(
            F.col("query_id").alias("s_qid"), F.col("cand_id").alias("s_id")
        )
        mx = (
            remaining.join(
                psim,
                (F.col("query_id") == F.col("p_qid"))
                & (F.col("cand_id") == F.col("a_id")),
            )
            .join(
                selp,
                (F.col("p_qid") == F.col("s_qid")) & (F.col("b_id") == F.col("s_id")),
            )
            .groupBy("query_id", "cand_id", "qsim")
            .agg(F.max("ps").alias("mx"))
        )
        score = F.lit(0.7) * F.col("qsim") - F.lit(0.3) * F.col("mx")
        wt = Window.partitionBy("query_id").orderBy(
            F.desc(score), F.asc("cand_id")
        )
        pick_t = (
            mx.withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") == 1)
            .select("query_id", "cand_id", F.lit(t).alias("pick"), "qsim")
        )
        sel = sel.unionByName(pick_t)
    return sel.select("query_id", F.col("cand_id").alias("vec_id"), "pick", "qsim")


def _mmr_oracle() -> str:
    cos_q = _duck_cosine("cv", "qv")
    cos_p = _duck_cosine("a.cv", "b.cv")
    ctes = [
        f"q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings"
        f" WHERE vec_id < {_MMR_NQ})",
        "c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings)",
        f"scored AS (SELECT query_id, cand_id, round({cos_q}, 6) AS qsim, cv"
        f" FROM c CROSS JOIN q WHERE cand_id != query_id)",
        f"cand AS (SELECT query_id, cand_id, qsim, cv FROM ("
        f" SELECT *, row_number() OVER (PARTITION BY query_id"
        f" ORDER BY qsim DESC, cand_id) AS rn FROM scored)"
        f" WHERE rn <= {_MMR_KCAND})",
        f"psim AS (SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,"
        f" round({cos_p}, 6) AS ps FROM cand a JOIN cand b"
        f" ON a.query_id = b.query_id AND a.cand_id != b.cand_id)",
        "sel1 AS (SELECT query_id, cand_id, 1 AS pick, qsim FROM ("
        " SELECT query_id, cand_id, qsim, row_number() OVER ("
        " PARTITION BY query_id ORDER BY qsim DESC, cand_id) AS rn FROM cand)"
        " WHERE rn = 1)",
    ]
    for t in range(2, _MMR_KOUT + 1):
        prev = f"sel{t - 1}"
        ctes.append(
            f"rem{t} AS (SELECT c.query_id, c.cand_id, c.qsim FROM cand c"
            f" LEFT JOIN {prev} s ON c.query_id = s.query_id"
            f" AND c.cand_id = s.cand_id WHERE s.cand_id IS NULL)"
        )
        ctes.append(
            f"mx{t} AS (SELECT r.query_id, r.cand_id, r.qsim, max(p.ps) AS mx"
            f" FROM rem{t} r JOIN psim p ON p.query_id = r.query_id"
            f" AND p.a_id = r.cand_id JOIN {prev} s ON s.query_id = p.query_id"
            f" AND s.cand_id = p.b_id GROUP BY 1, 2, 3)"
        )
        ctes.append(
            f"pick{t} AS (SELECT query_id, cand_id, {t} AS pick, qsim FROM ("
            f" SELECT query_id, cand_id, qsim, row_number() OVER ("
            f" PARTITION BY query_id ORDER BY 0.7 * qsim - 0.3 * mx DESC, cand_id)"
            f" AS rn FROM mx{t}) WHERE rn = 1)"
        )
        ctes.append(
            f"sel{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{t})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT query_id, cand_id AS vec_id, pick, qsim FROM sel{_MMR_KOUT}"
    )


MMR_ORACLE = _mmr_oracle()

SPECS["sim_search_mmr_topk"] = QuerySpec(
    sim_search_mmr_topk, MMR_ORACLE,
    "MMR diversified re-rank of the exact top-k (unrolled greedy rounds)",
)
