"""Round-13 pins: the fused PQ subspace trainer, the wide-codes
map-side ADC, and the fused index-update encoder must be bit-identical
to the round-12 per-subspace spellings (which the DuckDB oracles
mirror verbatim — the oracle CTEs are unchanged this round)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    return load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------
# _pq_train_all (one Lloyd chain per iteration over the posexploded
# (s, subvector) frame) vs the round-12 construction: m sequential
# kmeans_iterate runs over per-subspace slices. Codes, per-subspace
# quantization distances, and codebooks must all match exactly.
# ---------------------------------------------------------------

def _sequential_pq(emb, dim, m, pq_k, iters, train_on=None):
    """The round-12 spelling, verbatim from the old _ivfpq_train /
    pq_encode loops: one kmeans_iterate per subspace."""
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        kmeans_iterate,
    )

    subdim = dim // m
    codes, dists, books = {}, {}, {}
    for s in range(m):
        sub = emb.select(
            "vec_id",
            F.slice(F.col("embedding"), s * subdim + 1, subdim).alias(
                "embedding"
            ),
        )
        sub_train = (
            train_on.select(
                "vec_id",
                F.slice(F.col("embedding"), s * subdim + 1, subdim).alias(
                    "embedding"
                ),
            )
            if train_on is not None
            else None
        )
        res, cents = kmeans_iterate(
            sub, k=pq_k, iters=iters, dim=subdim, return_centroids=True,
            train_on=sub_train,
        )
        for r in res.collect():
            codes[(r["vec_id"], s)] = r["cluster"]
            dists[(r["vec_id"], s)] = r["dist"]
        for c in cents.collect():
            books[(s, c["cluster"])] = list(c["centroid"])
    return codes, dists, books


def _fused_pq(emb, dim, m, pq_k, iters, train_on=None):
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        _pq_train_all,
    )

    wide, cb = _pq_train_all(
        emb, dim, m, pq_k, iters, train_on=train_on, with_dists=True
    )
    codes, dists, books = {}, {}, {}
    for r in wide.collect():
        for s in range(m):
            codes[(r["vec_id"], s)] = r["codes"][s]
            dists[(r["vec_id"], s)] = r[f"__d{s}"]
    for c in cb.collect():
        books[(c["s"], c["code"])] = list(c["centroid"])
    return codes, dists, books


def test_fused_pq_trainer_matches_sequential(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    seq = _sequential_pq(emb, 64, 4, 4, 2)
    fus = _fused_pq(emb, 64, 4, 4, 2)
    assert fus[0] == seq[0]          # codes
    assert fus[1] == seq[1]          # per-subspace dists (6dp-rounded)
    assert fus[2] == seq[2]          # codebooks, exact doubles


def test_fused_pq_trainer_matches_sequential_with_train_on(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    train = emb.filter(F.col("vec_id") % 5 != 0)
    seq = _sequential_pq(emb, 64, 4, 8, 2, train_on=train)
    fus = _fused_pq(emb, 64, 4, 8, 2, train_on=train)
    assert fus[0] == seq[0]
    assert fus[1] == seq[1]
    assert fus[2] == seq[2]


# ---------------------------------------------------------------
# Map-side ADC: the per-candidate element_at(lut_map, (s, code))
# decimal chain must equal the round-12 long-form spelling — join
# candidates x m code rows against the LUT frame, then
# sum(cast(decimal(18,6))) per (query, neighbor).
# ---------------------------------------------------------------

def test_mapside_adc_matches_join_aggregate_spelling(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        _ivfpq_query,
        _ivfpq_train,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    assign, coarse, codes, books = _ivfpq_train(emb, 64, 4, 4, 4, 2)
    new = sorted(
        map(tuple, _ivfpq_query(
            assign, coarse, codes, books, queries, 64, 4, 2, 5
        ).collect())
    )

    # round-12 spelling, reconstructed from the SAME trained frames
    # (codes exploded back to long form)
    from pyspark.sql import Window

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from mlops_realtime_data_ingestion_spark.operators.similarity import sq_dist

    wc = Window.partitionBy("query_id").orderBy(
        F.col("cd").asc(), F.col("cluster").asc()
    )
    probed = (
        q.crossJoin(F.broadcast(coarse))
        .withColumn("cd", F.round(sq_dist("qv", "centroid"), 6))
        .withColumn("cr", F.row_number().over(wc))
        .filter(F.col("cr") <= 2)
        .select("query_id", F.col("cluster").alias("cell"))
    )
    subdim = 16
    qsub = None
    for s in range(4):
        part = q.select(
            "query_id", F.lit(s).alias("s"),
            F.slice("qv", s * subdim + 1, subdim).alias("qs"),
        )
        qsub = part if qsub is None else qsub.unionByName(part)
    lut_rows = qsub.join(F.broadcast(books), "s").select(
        "query_id", "s", "code",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("qs"), F.col("centroid"),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("d"),
    )
    code_rows = codes.select(
        "vec_id", F.posexplode("codes").alias("s", "code")
    )
    cand = (
        assign.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    adc = (
        cand.join(
            code_rows.withColumnRenamed("vec_id", "neighbor_id"),
            "neighbor_id",
        )
        .join(F.broadcast(lut_rows), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("d").cast("decimal(18,6)"))
            .cast("double").alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    old = sorted(
        map(tuple, adc.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", "adc_dist").collect())
    )
    assert new == old


# ---------------------------------------------------------------
# The fused index-update encoder appends wide codes that match the
# build's layout, one row per batch vector.
# ---------------------------------------------------------------

def test_index_update_appends_wide_codes(spark, sf_dir, tmp_path):
    import os

    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_index_update,
    )

    emb = _emb(spark, sf_dir)
    c1 = emb.filter(F.col("vec_id") % 5 != 0)
    c2 = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "idx")
    ivfpq_build(c1, path, dim=64, coarse_k=4, m=4, pq_k=8, iters=2,
                train_on=c1)
    ivfpq_index_update(spark, path, c2, dim=64, m=4)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert set(codes.columns) == {"vec_id", "codes"}
    assert codes.count() == codes.select("vec_id").distinct().count() == emb.count()
    assert codes.filter(F.size("codes") != 4).count() == 0


# ---------------------------------------------------------------
# ADVICE r12: the fused backtest's max(when(rn == n-k, value)) picks
# read a NULL events.value as "row absent", silently dropping
# (p50, target) pairs relative to the composed plan. The invariant
# (events.value is never NULL) was verified but unenforced — enforce
# it loudly at every fixture SF so a generator change fails here
# instead of shifting the metric.
# ---------------------------------------------------------------

def test_events_value_never_null(spark):
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        ev = load_table(spark, sf, "events")
        n_null = ev.filter(F.col("value").isNull()).count()
        assert n_null == 0, (
            f"{sf}/events has {n_null} NULL value rows — the fused "
            f"forecast_backtest_rmse_wql plan assumes value is never "
            f"NULL (see plans/timeseries_queries.py)"
        )
