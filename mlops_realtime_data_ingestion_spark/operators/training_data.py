"""Training-data pipeline operators (north-star extension, SURVEY.md
§7 step 8): deterministic dataset splitting/sampling, benchmark
decontamination, corpus statistics (heavy hitters, TF-IDF), sliding
token chunking, and dedup-group resolution (connected components).

The reference ends at "write a DeepAR training set"
(pipelines/blockchain/preprocess.py:119-167); these operators are the
corresponding stages a 100 TB LLM-training-data pipeline needs. All
randomness is replaced by the cross-engine polynomial hash
(functions/hashing) so every op is reproducible AND DuckDB-oracle
checkable.

Scale design notes per op are in the docstrings; the common rules:
no driver collects (except the CC fixpoint counter), broadcast only
provably-small sides (benchmark shingle sets, stratum rate tables),
one shuffle per logical stage, partial aggregation everywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = [
    "hash_split",
    "stratified_sample",
    "domain_mixture_sample",
    "temperature_sample",
    "decontaminate",
    "heavy_hitters",
    "chunk_tokens",
    "tfidf_topk",
    "connected_components",
    "connected_components_star",
    "survivors_best_scored",
    "shard_assign",
    "pack_sequences",
    "sample_fixed_per_stratum",
]


def _id_hash(id_col: str, k: int = 0):
    """Deterministic per-row bucket hash: polynomial fold of the id's
    decimal string, then one affine mix mod P — engine-portable (no
    murmur3), stable across runs. The mix step matters: the raw fold
    of SHORT strings is small and stride-patterned, so its low-order
    residues are badly skewed; (a*h + b) % P spreads them uniformly.
    ``k`` selects an independent affine mix (k=0 for placement, k=1
    for within-shard ordering, ...)."""
    fold = H.spark_str_hash(f"cast({id_col} as string)")
    return F.expr(f"({H.MINHASH_A[k]} * ({fold}) + {H.MINHASH_B[k]}) % {H.P}")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by id-hash bucket.

    The standard leakage-safe split for training corpora: membership
    depends only on the id, so re-runs, backfills, and incremental
    arrivals land in the same split (unlike ``df.randomSplit``).
    Narrow (no shuffle): a pure projection the optimizer can pipeline
    into the scan at any scale.
    """
    bucket = (_id_hash(id_col) % 100).cast("int")
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.select(id_col).withColumn("bucket", bucket).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``id_hash % 1000 < rate_permille(stratum)``.

    ``strata`` is a tiny (stratum, rate_permille) table — broadcast,
    so the plan is scan -> broadcast-hash-join -> filter with NO
    shuffle of the big side; per-stratum rates rebalance a skewed
    corpus (the usual language/source mixture reweighting) without a
    sampleBy() randomness dependency.
    """
    keyed = df.withColumn("hb", (_id_hash(id_col) % 1000).cast("int"))
    return (
        keyed.join(F.broadcast(strata), stratum_col)
        .filter(F.col("hb") < F.col("rate_permille"))
        .select(id_col, stratum_col, "hb")
    )


def domain_mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample a skewed corpus to TARGET domain proportions — the
    mixture-reweighting step of a pre-training data recipe (e.g. "40%
    web, 30% code, ..."). Given weights w_s (relative proportions),
    the largest achievable corpus without upsampling is
    B = min_s(c_s / w_s); each domain keeps rate_s = w_s * B / c_s of
    its rows via the deterministic id-hash permille filter
    (:func:`stratified_sample` — so the plan is the same broadcast
    join + filter, rates now COMPUTED instead of given). Domains
    absent from ``weights`` are dropped (weight 0).

    Scale: the rate computation aggregates domain counts (a
    domain-cardinality-row table) and broadcasts it; the corpus scan
    is one pass, no shuffle.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()), f"{stratum_col} string, w double"
    )
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("cnt"))
    j = counts.join(F.broadcast(wdf), stratum_col)
    budget = j.agg(F.min(F.col("cnt") / F.col("w")).alias("B"))
    rates = j.crossJoin(F.broadcast(budget)).select(
        stratum_col,
        F.floor(1000 * F.col("w") * F.col("B") / F.col("cnt"))
        .cast("int")
        .alias("rate_permille"),
    )
    return stratified_sample(df, rates, stratum_col, id_col)


def decontaminate(
    df: DataFrame,
    bench_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: fraction of each training doc's word
    ``n``-gram shingles that appear anywhere in the benchmark set
    (rows matching ``bench_filter``).

    The canonical n-gram-overlap decontamination check (GPT-3 appendix
    C / PaLM style), engine-shaped: the benchmark's distinct shingle
    hashes are a SMALL set (benchmarks are ~1e3-1e6 docs) -> broadcast
    to a left join against the corpus's exploded shingles; matches
    partial-aggregate per doc before the single doc_id shuffle. The
    100 TB side is scanned once and never carries text past the hash
    step. Shingling itself rides dedup.with_shingle_hashes — the
    Arrow/numpy fast path, repartitioned across cores (the interpreted
    HOF fold on one input partition measured 28 s vs ~1 s for the same
    5000 docs).

    Returns (id, n_shingles, n_matched, overlap_frac, contaminated);
    docs with < n tokens have no shingles and are absent (nothing to
    test overlap on).
    """
    from .dedup import with_shingle_hashes

    bench_sh = (
        with_shingle_hashes(df.filter(bench_filter), id_col, text_col, n)
        .select(F.explode("sh").alias("sh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_sh = with_shingle_hashes(
        df.filter(~bench_filter), id_col, text_col, n
    ).select(F.col("id").alias(id_col), F.explode("sh").alias("sh"))
    agg = (
        corpus_sh.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_matched"),
        )
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_matched",
        (F.col("n_matched") / F.col("n_shingles")).alias("overlap_frac"),
        (F.col("n_matched") / F.col("n_shingles") >= threshold).alias("contaminated"),
    )


def heavy_hitters(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Exact global top-k tokens by frequency.

    explode -> hash-aggregate (map-side partial combine shrinks the
    shuffle to one row per (partition, token)) -> distributed top-k:
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (a
    per-partition k-heap + driver merge of k*partitions rows), so the
    VOCABULARY-sized count table is never sorted in one partition —
    that matters once the "vocabulary" is n-grams, not words. Ranks
    are then assigned on the k survivors only. Ties break
    lexicographically so the cut is deterministic; for unbounded key
    spaces swap in a count-min sketch + candidate top-k.
    """
    counts = (
        df.select(F.explode(F.expr(H.spark_tokens(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "token", "cnt"
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking — the context-window packing step
    of a training pipeline. Each doc yields
    ``1 + ceil((n_tokens - chunk) / stride)`` overlapping chunks
    (always >= 1; the tail chunk may be short).

    Shuffle-free plan: tokenize once (Arrow/numpy fast path — the
    interpreted per-char HOF fold is the dominant cost otherwise),
    explode chunk indices, slice the per-doc token-hash array.
    ``chunk_fp`` is the polynomial fold of the chunk's token hashes
    (chunk-level exact-dup key, e.g. for cross-doc boilerplate
    removal); folding <= ``chunk`` precomputed hashes per row is cheap
    even interpreted.
    """
    from ..functions import hashing_pandas as HP

    @F.pandas_udf("array<long>")
    def th_udf(texts: pd.Series) -> pd.Series:
        return HP.token_hash_series(texts)

    fold = f"aggregate(ch, cast(0 as bigint), (acc, c) -> (acc * 31 + c) % {H.P})"
    base = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(id_col, th_udf(F.col(text_col)).alias("h"))
        .withColumn("n", F.size("h"))
    )
    n_chunks = F.when(F.col("n") <= chunk, F.lit(1)).otherwise(
        ((F.col("n") - chunk + stride - 1) / stride).cast("int") + 1
    )
    idx = base.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    sliced = idx.withColumn(
        "ch", F.slice(F.col("h"), F.col("chunk_idx") * stride + 1, chunk)
    )
    return sliced.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("ch").cast("long").alias("chunk_len"),
        F.expr(fold).alias("chunk_fp"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF with the
    BM25 idf: ``score = tf * ln((N - df + 0.5)/(df + 0.5) + 1)``.
    All inputs to ln() are exact integer/half arithmetic, so the only
    cross-engine hazard is libm's last ulp — absorbed by rounding the
    score to 6 dp before ranking (tie-break: token asc).

    Two shuffles total: (doc, token) tf aggregation, then token df
    aggregation joined back (token-keyed; the df table is
    vocabulary-sized so AQE broadcasts it in practice). N comes from a
    declarative count — no driver collect.
    """
    toks = df.select(F.col(id_col), F.explode(F.expr(H.spark_tokens(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    ndocs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "df", "score")
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup PAIRS into dedup GROUPS: connected components
    by iterative min-label propagation (each node repeatedly adopts
    the smallest label among itself and its neighbors).

    This is the canonical post-LSH step — pairs alone can't answer
    "keep one doc per group" when dups chain (a~b, b~c). Iterations =
    graph diameter; near-dup graphs are unions of near-cliques, so
    2-3 rounds in practice. Each round is one shuffle keyed on node
    id over the EDGE table only (the 100 TB corpus is not involved);
    ``localCheckpoint`` truncates the growing lineage. For adversarial
    long-chain graphs swap in large-star/small-star (O(log n) rounds,
    same per-round plan shape).

    Returns (doc_id, component_id) for every node appearing in an
    edge, component_id = min doc_id reachable.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nmin", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component_id"))


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic shuffle-shard for training export: place each doc
    in ``shard = id_hash % n_shards``, then order within the shard by
    an INDEPENDENT second hash — the distributed spelling of "shuffle
    the corpus, split into N files" that trainers expect.

    Placement and order come from different affine mixes of the same
    fold, so the within-shard order is pseudorandom (no correlation
    with the placement residue) yet fully reproducible: re-running on
    a grown corpus keeps every doc in its shard (only positions
    shift), unlike ``orderBy(rand())``.

    Scale: ONE shuffle (the window partition on shard). n_shards
    should be sized so a shard fits an executor's sort buffer —
    thousands of shards at 100 TB, not 8; per-shard ``row_number`` is
    a streaming sort, never a global one.
    """
    w = Window.partitionBy("shard").orderBy("order_key", id_col)
    return (
        df.select(
            id_col,
            (_id_hash(id_col, 0) % n_shards).cast("int").alias("shard"),
            _id_hash(id_col, 1).alias("order_key"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy token-budget sequence packing: walk each shard in its
    deterministic shuffle order and start a new sequence whenever the
    running token total would exceed ``budget`` — the batch-assembly
    step that turns a deduped corpus into trainer-ready sequences
    (docs are never split; an oversized doc gets its own sequence).

    Spark shape: tokenize (JVM-side whitespace tokens, same spelling
    as text.token_counts) -> shard_assign -> ``applyInPandas`` per
    shard for the greedy scan. The scan is inherently sequential PER
    SHARD but embarrassingly parallel ACROSS shards — exactly the
    granularity the export needs anyway, so the "imperative" step
    rides the same single shuffle as the shard placement. Oracle:
    DuckDB recursive CTE stepping pos -> pos+1 computes the identical
    fold (tests + registry hash-match it).
    """
    sharded = shard_assign(df, id_col, n_shards).join(
        df.select(
            id_col,
            F.size(F.expr(H.spark_tokens(text_col))).cast("long").alias("tokens"),
        ),
        id_col,
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        seq_ids = []
        seq, acc = 0, 0
        for t in pdf["tokens"]:
            if seq == 0 or acc + t > budget:
                seq += 1
                acc = int(t)
            else:
                acc += int(t)
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[[id_col, "shard", "pos", "tokens", "seq_id"]]

    return sharded.groupBy("shard").applyInPandas(
        pack, f"{id_col} bigint, shard int, pos int, tokens bigint, seq_id int"
    )


def sample_fixed_per_stratum(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size sample: exactly ``min(k, |stratum|)``
    docs per stratum, chosen by id-hash order — the reproducible
    spelling of per-group reservoir sampling (eval-set carving,
    per-source spot-check pulls).

    Rate-based ``stratified_sample`` keeps a proportional slice;
    this keeps a FIXED count. Hash order makes the choice a pure
    function of the ids, so a grown stratum keeps its earlier picks
    until pushed out by lower-hash arrivals (no RNG, no seed state).

    One shuffle (window partition on the stratum); the per-stratum
    sort streams — no stratum ever materializes in driver memory.
    """
    w = Window.partitionBy(stratum_col).orderBy("sample_key", id_col)
    return (
        df.select(id_col, stratum_col, _id_hash(id_col, 2).alias("sample_key"))
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= k)
        .select(id_col, stratum_col, "pick")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the adversarial-graph scale path promised next to
    ``connected_components``: O(log n) rounds regardless of diameter,
    where min-label propagation needs diameter rounds (a 1M-node
    chain = 1M rounds vs ~20).

    Each round rewrites the EDGE set toward a star per component:
    large-star hangs every larger neighbor off the neighborhood min;
    small-star does the same for the smaller neighbors. Both are one
    groupBy + one join over edges only; convergence = the edge set
    stops changing (checked with a 1-row exceptAll probe, the same
    0/1 driver counter the label-propagation variant uses).

    Returns (doc_id, component_id = min reachable id), identical
    output contract to ``connected_components`` (differentially
    tested against it and against the recursive-CTE oracle).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # large-star: center u over ALL its neighbors; hang v > u off
        # m = min(N(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient (max -> min), center the max; relink every
        # smaller neighbor (and the center) to the neighborhood min
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(mins2, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("s")
            )
            .select("s.u", "s.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        changed = (
            small.exceptAll(e).limit(1).count()
            + e.exceptAll(small).limit(1).count()
        )
        e = small
        if changed == 0:
            break
    # converged: e is a star forest (u -> component min)
    roots = e.select(F.col("v").alias("doc_id")).distinct().withColumn(
        "component_id", F.col("doc_id")
    )
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("component_id"))
        .union(roots)
        .distinct()
    )


def survivors_best_scored(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware dedup survivor selection: given near-dup
    components (from either connected-components variant), keep the
    HIGHEST-scoring member of each group (tie: min id) instead of the
    blind min-id canonical that ``dedup_survivors`` uses — near-dup
    groups usually contain one clean original plus boilerplate-wrapped
    copies, and min-id keeps an arbitrary one.

    ``docs`` must carry ``score_col``; every doc outside a component
    survives untouched. Returns the surviving ``docs`` rows.

    Scale: the window argmax runs over component MEMBERS only (the
    dup subgraph, far smaller than the corpus); the corpus itself is
    touched by one left_anti join against the loser ids — the same
    narrow anti-join shape as ``dedup_survivors``.
    """
    members = components.join(
        docs.select(id_col, score_col), id_col, "inner"
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    losers = (
        members.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def temperature_sample(
    df: DataFrame,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    frac: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture sampling (alpha = 0.5): keep a
    ``frac`` of the corpus with per-domain take proportional to
    sqrt(n_s) — the multilingual rebalancing recipe (mBERT/XLM-R/mT5
    style) that flattens head domains without the hard targets
    :func:`domain_mixture_sample` needs. Unlike explicit weights, the
    mixture ADAPTS as the corpus grows: p_s = sqrt(n_s) / sum sqrt.

    alpha is fixed at 1/2 because sqrt is the one power IEEE requires
    correctly rounded — pow(n, alpha) may differ between libm
    implementations, which would flip hash-threshold decisions at
    rate boundaries. Weights are floor(sqrt(n_s) * 1e6) BIGINTs, so
    the weight total is order-free-exact, and each domain's keep rate
    is ONE double division of exact integers, floored to a
    per-million threshold on the id-hash (exact-double bound: w*T and
    W*n below 2^53 holds to ~1e10 docs/domain; beyond that, widen the
    ppm scale down to 1e3).

    Plan: domain-count aggregate (domain-cardinality rows) ->
    broadcast rate table -> one corpus scan with a pushed filter. No
    corpus-sized shuffle.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("cnt"))
    weighted = counts.withColumn(
        "w_s", F.floor(F.sqrt(F.col("cnt")) * 1e6).cast("long")
    )
    totals = weighted.agg(
        F.sum("w_s").alias("w_tot"), F.sum("cnt").alias("n_tot")
    )
    t = F.floor(F.col("n_tot") * F.lit(frac)).cast("long")
    rate = F.least(
        F.lit(1.0),
        (F.col("w_s") * t).cast("double")
        / (F.col("w_tot") * F.col("cnt")).cast("double"),
    )
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        stratum_col,
        F.floor(rate * 1e6).cast("long").alias("rate_ppm"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter((_id_hash(id_col, 3) % 1_000_000) < F.col("rate_ppm"))
        .select(id_col, stratum_col, "rate_ppm")
    )
