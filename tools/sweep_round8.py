"""Round-8 measurement sweeps — reproduces every number cited in
SCALE.md's round-8 section. Run one mode at a time (a fresh JVM per
mode keeps timings honest; don't run concurrently with other Spark
sessions):

    python tools/sweep_round8.py simhash     [sf10_dir]
    python tools/sweep_round8.py containment [sf10_dir]
    python tools/sweep_round8.py recall

- simhash: candidate accounting for simple 4x12 banding vs Manku 6C3
  combination keys at the 100x input, best-of-2 walls for both, and
  the fingerprint-cache A/B (cache=True/False, cache cleared between
  runs) at sf0.1 and 100x.
- containment: best-of-2 walls at 100x for the full self-dedup, the
  DataFrame-mode incremental with the direction-2 prefilter ON and
  OFF, the frozen-rank index build, and the index serve ON/OFF.
- recall: the planted-Gaussian-cluster ANN quality table (IVF, LSH,
  IVFPQ ADC-only sweep, IVFPQ + exact rerank) — the
  tests/test_ann_recall.py fixture at measurement verbosity.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf10"
SF01 = "/root/testdata/sf0.1"


def _bo2(label, mk):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)


def sweep_simhash(spark):
    from pyspark.sql import functions as F

    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    docs = spark.read.parquet(f"{SF10}/documents.parquet")
    print("docs:", docs.count())
    fp = simhash_fingerprints(docs, "doc_id", "text", 48).persist()
    fp.count()

    def cand_count(band_exprs):
        banded = fp.select(
            "id", F.posexplode(F.array(*band_exprs)).alias("band_id", "band_key")
        )
        per = banded.groupBy("band_id", "band_key").agg(F.count("*").alias("c"))
        return per.agg(
            F.sum(F.expr("c * (c - 1) / 2")).alias("pairs")
        ).collect()[0]["pairs"]

    simple = [F.expr(f"(simhash >> {12 * k}) & 4095") for k in range(4)]
    print("simple 4x12 candidates:", cand_count(simple))
    combi = []
    for sub in combinations(range(6), 3):
        shift, parts = 0, []
        for k in sub:
            parts.append(f"(((simhash >> {8 * k}) & 255) << {shift})")
            shift += 8
        combi.append(F.expr(" | ".join(parts)))
    print("combi 6C3x24 candidates:", cand_count(combi))
    _bo2("simple wall 100x", lambda: simhash_pairs(docs, "doc_id", "text"))
    _bo2("combi wall 100x",
         lambda: simhash_pairs(docs, "doc_id", "text", n_blocks=6))
    fp.unpersist()

    for tag, path in [("sf0.1", SF01), ("100x", SF10)]:
        d = spark.read.parquet(f"{path}/documents.parquet")
        for cache in (True, False):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                simhash_pairs(d, "doc_id", "text", cache=cache).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"simhash {tag} cache={cache}: {best:.2f}s", flush=True)
    spark.catalog.clearCache()


def sweep_containment(spark):
    from pyspark.sql import functions as F

    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_index_build,
        containment_pairs,
        containment_pairs_incremental,
    )

    docs = spark.read.parquet(f"{SF10}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    _bo2("containment self 100x",
         lambda: containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6))
    _bo2("incremental DF mode, prefilter OFF",
         lambda: containment_pairs_incremental(
             corpus, batch, "doc_id", "text", n=3, threshold=0.6))
    _bo2("incremental DF mode, prefilter ON",
         lambda: containment_pairs_incremental(
             corpus, batch, "doc_id", "text", n=3, threshold=0.6,
             prefilter_corpus_probes=True))
    idx = tempfile.mkdtemp(prefix="cont_sweep_idx_")
    t0 = time.perf_counter()
    containment_index_build(corpus, idx, "doc_id", "text", n=3)
    print(f"index build: {time.perf_counter() - t0:.2f}s", flush=True)
    _bo2("index serve, prefilter OFF",
         lambda: containment_pairs_incremental(
             idx, batch, "doc_id", "text", n=3, threshold=0.6,
             corpus_is_index=True))
    _bo2("index serve, prefilter ON",
         lambda: containment_pairs_incremental(
             idx, batch, "doc_id", "text", n=3, threshold=0.6,
             corpus_is_index=True, prefilter_corpus_probes=True))


def sweep_recall(spark):
    import numpy as np

    from mlops_realtime_data_ingestion_spark.operators.retrieval import (
        retrieval_eval,
    )
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
        kmeans_iterate,
        lsh_bucket_topk,
    )

    DIM, NC, PER, NQ = 16, 8, 75, 40
    rng = np.random.default_rng(8)
    centers = rng.normal(0, 1, (NC, DIM))
    raw = np.concatenate(
        [centers[c] + rng.normal(0, 0.12, (PER, DIM)) for c in range(NC)]
    )
    qraw = np.concatenate(
        [centers[c] + rng.normal(0, 0.12, (NQ // NC, DIM)) for c in range(NC)]
    )
    raw = raw.reshape(NC, PER, DIM).transpose(1, 0, 2).reshape(NC * PER, DIM)
    pts = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    qs = qraw / np.linalg.norm(qraw, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        ["vec_id", "embedding"],
    ).cache()
    queries = spark.createDataFrame(
        [(1000 + i, [float(x) for x in qs[i]]) for i in range(len(qs))],
        ["vec_id", "embedding"],
    ).cache()
    truth = cosine_topk(corpus, queries, k=5).cache()
    print("truth rows:", truth.count())

    def report(label, results):
        r = retrieval_eval(results, truth, k=5).collect()[0]
        print(f"{label}: recall@5={r['recall_at_5']} mrr={r['mrr']} "
              f"ndcg@5={r['ndcg_at_5']}", flush=True)

    assign = kmeans_iterate(corpus, k=NC, iters=3)
    bucketed = corpus.join(assign.select("vec_id", "cluster"), "vec_id")
    report("IVF nprobe=2/8", ivf_topk(bucketed, queries, "cluster", k=5, nprobe=2))
    report("LSH 4 planes", lsh_bucket_topk(corpus, queries, n_planes=4, k=5))
    for m, pqk in [(4, 8), (4, 32), (4, 64), (8, 32)]:
        report(f"IVFPQ ADC m={m} pq_k={pqk}",
               ivfpq_topk(corpus, queries, dim=DIM, coarse_k=NC, m=m,
                          pq_k=pqk, iters=3, nprobe=2, k=5))
    for m, pqk in [(4, 8), (4, 32), (8, 32)]:
        report(f"IVFPQ m={m} pq_k={pqk} rerank=50",
               ivfpq_topk(corpus, queries, dim=DIM, coarse_k=NC, m=m,
                          pq_k=pqk, iters=3, nprobe=2, k=5, rerank=50))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "simhash"
    from mlops_realtime_data_ingestion_spark.session import get_spark

    spark = get_spark(f"sweep-r8-{mode}")
    {"simhash": sweep_simhash,
     "containment": sweep_containment,
     "recall": sweep_recall}[mode](spark)


if __name__ == "__main__":
    main()
