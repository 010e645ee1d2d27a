"""Text analysis operators (north-star extension, SURVEY.md §7
step 8): quality scoring, language ID, token counting, document
fingerprinting. All built-in-function plans (no Python UDFs), all
cross-engine deterministic (ratios are int/int divisions; hashes are
the functions/hashing polynomial fold).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = [
    "STOPWORDS",
    "LANG_PROFILES",
    "quality_score",
    "language_id",
    "token_counts",
    "fingerprint",
    "pii_redact",
    "repetition_metrics",
    "vocab_oov",
    "kwic",
    "sliding_passages",
]

# Conservative patterns spelled to behave identically under Java
# regex (Spark) and RE2 (DuckDB): plain character classes and bounded
# quantifiers only — no lookarounds, no backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONG_DIGITS_RE = "[0-9]{7,}"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing — the redaction pass a training corpus runs
    before tokenization: emails -> ``<EMAIL>``, 7+-digit runs (phone /
    account numbers) -> ``<NUM>``.

    Purely narrow (regexp_replace/extract_all are JVM codegen — no
    Python, no shuffle). Counts are taken per pattern BEFORE its
    replacement; digit runs are counted after email redaction so an
    address's digits aren't double-counted. Returns
    (doc_id, n_emails, n_numbers, n_chars_redacted) plus the redacted
    text under ``redacted``.
    """
    email_hits = F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), 0))
    no_email = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    digit_hits = F.size(F.regexp_extract_all(no_email, F.lit(LONG_DIGITS_RE), 0))
    redacted = F.regexp_replace(no_email, LONG_DIGITS_RE, "<NUM>")
    return df.select(
        "doc_id",
        email_hits.cast("long").alias("n_emails"),
        digit_hits.cast("long").alias("n_numbers"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
        redacted.alias("redacted"),
    )

def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1): the
    quality gates a pre-training corpus applies to catch degenerate /
    boilerplate documents.

    Per document: ``dup_word_frac`` = 1 - distinct/total words,
    ``top_word_frac`` = most-frequent-word count / total words,
    ``dup_bigram_frac`` = 1 - distinct/total word bigrams.

    Plan: tokens exploded once per granularity -> (doc, term) partial
    counts -> per-doc aggregate; the shuffles key on (doc_id, term)
    then doc_id — map-side combine collapses repeated terms before the
    exchange, so shuffle volume ~ distinct terms per doc, not corpus
    tokens. Fractions are int/int divisions (engine-exact), rounded
    to 6dp. Docs with no tokens have no row (explode semantics);
    single-word docs carry a NULL dup_bigram_frac.
    """
    toks = df.select("doc_id", F.expr(H.spark_tokens(text_col)).alias("t"))
    words = toks.select("doc_id", F.explode("t").alias("w"))
    wc = words.groupBy("doc_id", "w").count()
    wagg = wc.groupBy("doc_id").agg(
        F.sum("count").alias("n"),
        F.count("*").alias("nd"),
        F.max("count").alias("mx"),
    )
    # guarded bigram construction: sequence(1, 0) would DESCEND in
    # Spark, so short docs get an explicit empty array
    bigram_expr = (
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(t) - 1), "
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) END"
    )
    bigrams = toks.select("doc_id", F.explode(F.expr(bigram_expr)).alias("b"))
    bc = bigrams.groupBy("doc_id", "b").count()
    bagg = bc.groupBy("doc_id").agg(
        F.sum("count").alias("bn"), F.count("*").alias("bnd")
    )
    # merge hint: both aggregates are DOC-proportional (billions of
    # rows at 100 TB) but the static planner sizes the bigram side at
    # the pre-explode scan and broadcasts it (round-7 broadcast audit)
    return wagg.join(bagg.hint("merge"), "doc_id", "left").select(
        "doc_id",
        F.col("n").cast("long").alias("n_words"),
        F.round(1 - F.col("nd") / F.col("n").cast("double"), 6).alias("dup_word_frac"),
        F.round(F.col("mx") / F.col("n").cast("double"), 6).alias("top_word_frac"),
        F.round(1 - F.col("bnd") / F.col("bn").cast("double"), 6).alias("dup_bigram_frac"),
    )


def vocab_oov(
    df: DataFrame, text_col: str = "text", vocab_size: int = 1000
) -> DataFrame:
    """Corpus vocabulary build + per-document OOV scoring — the
    tokenizer-coverage analysis a training pipeline runs before
    committing to a vocab.

    Stage 1 builds the top-``vocab_size`` words by corpus frequency
    (ties broken lexicographically so the cutoff is deterministic);
    stage 2 scores each document's out-of-vocabulary token fraction
    against the BROADCAST vocab.

    Scale: the frequency table is one (word) shuffle with map-side
    combine; top-k is TakeOrderedAndProject (never a global sort); the
    scoring join broadcasts the vocab (vocab_size rows) so the corpus
    re-scan is shuffle-free until the final per-doc aggregate.
    """
    toks = df.select("doc_id", F.expr(H.spark_tokens(text_col)).alias("t"))
    words = toks.select("doc_id", F.explode("t").alias("w"))
    vocab = (
        words.groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w", F.lit(True).alias("__in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias("oov"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_words"),
            F.round(F.col("oov") / F.col("n").cast("double"), 6).alias("oov_frac"),
        )
    )


def kwic(df: DataFrame, term: str, window: int = 3, text_col: str = "text") -> DataFrame:
    """Keyword-in-context extraction — the corpus-inspection tool a
    curation pipeline uses to audit how a term is used before
    filtering on it. One output row per occurrence: token position and
    the +-window-token context.

    Implemented as a Python UDTF (table function) under a LATERAL
    join — the §2.9 surface variant the scalar/grouped pandas UDFs
    don't cover: a UDTF yields a VARIABLE number of rows per input row
    from imperative logic, where a pandas UDF is locked to 1:1 (and
    explode needs the array pre-built). Tokenization matches
    functions/hashing.spark_tokens (lower, split on whitespace runs),
    so the DuckDB oracle reproduces positions exactly.

    Scale: UDTFs evaluate per-partition like any Python UDF — narrow,
    no shuffle; the LATERAL join is a generate node, not a join
    exchange.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, context string")
    class _Kwic:
        def eval(self, text: str, term: str, window: int):
            toks = (text or "").lower().split()
            for i, t in enumerate(toks):
                if t == term:
                    lo = max(0, i - window)
                    hi = min(len(toks), i + window + 1)
                    yield i, " ".join(toks[lo:hi])

    spark = df.sparkSession
    spark.udtf.register("__kwic", _Kwic)
    df.createOrReplaceTempView("__kwic_src")
    # Lowercase the term to match the lowercased tokens, and pass it as
    # a bound parameter — f-string splicing would break on quotes
    # (injection-shaped) and silently miss mixed-case terms.
    return spark.sql(
        f"SELECT s.doc_id, k.pos, k.context "
        f"FROM __kwic_src s, LATERAL __kwic(s.{text_col}, :term, {int(window)}) k",
        args={"term": term.lower()},
    )


# public, fixed word lists — the heuristic's profile, not learned
STOPWORDS = (
    "the a an of to in and is are was were be been it this that with "
    "for on as at by from or not".split()
)

LANG_PROFILES: dict[str, list[str]] = {
    "en": "the a of and to in is that it for".split(),
    "de": "der die das und ist nicht ein zu mit von".split(),
    "es": "el la de que y en un ser no por".split(),
    "fr": "le la de et un être que pour dans ce".split(),
    "zh": "的 是 不 了 在 人 有 我 他 这".split(),
}

# BPE-ish pre-tokenization: letter runs | digit runs | single other
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def quality_score(df: DataFrame, text_col: str = "text", impl: str = "pandas") -> DataFrame:
    """Length / word / stopword / punctuation heuristics — the usual
    pre-training quality gates. ``quality_ok`` mirrors C4-style
    filters (min length, min words, bounded stopword ratio).

    Default impl is a single-pass Arrow-batched UDF (integer counts +
    IEEE int/int divisions — identical values to the SQL spelling,
    which is kept under impl="sql" and mirrored by the oracle)."""
    if impl == "sql":
        toks = F.expr(H.spark_tokens(text_col))
        n_words = F.size(toks)
        sw = F.array([F.lit(w) for w in STOPWORDS])
        n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        n_punct = F.length(text_col) - F.length(
            F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9\\s]", "")
        )
        out = df.select(
            "doc_id",
            F.length(text_col).cast("long").alias("n_chars_m"),
            n_words.cast("long").alias("n_words"),
            (F.length(F.regexp_replace(F.col(text_col), "\\s+", "")) / n_words).alias("avg_word_len"),
            (n_stop / n_words).alias("stopword_ratio"),
            (n_punct / F.length(text_col)).alias("punct_ratio"),
        )
        return out.withColumn(
            "quality_ok",
            (F.col("n_chars_m") >= 100)
            & (F.col("n_words") >= 20)
            & (F.col("stopword_ratio") >= 0.01),
        )

    sw_set = frozenset(STOPWORDS)
    schema = (
        "struct<n_chars_m: bigint, n_words: bigint, avg_word_len: double,"
        " stopword_ratio: double, punct_ratio: double, quality_ok: boolean>"
    )

    @F.pandas_udf(schema)
    def q_udf(texts: pd.Series) -> pd.DataFrame:
        import re

        rows = []
        for t in texts:
            t = t or ""
            toks = t.lower().strip().split()
            nw = len(toks)
            nc = len(t)
            n_stop = sum(1 for x in toks if x in sw_set)
            no_ws = len(re.sub(r"\s+", "", t))
            n_punct = nc - len(re.sub(r"[^a-zA-Z0-9\s]", "", t))
            swr = n_stop / nw if nw else None
            rows.append(
                (
                    nc,
                    nw,
                    no_ws / nw if nw else None,
                    swr,
                    n_punct / nc if nc else None,
                    bool(nc >= 100 and nw >= 20 and swr is not None and swr >= 0.01),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_chars_m",
                "n_words",
                "avg_word_len",
                "stopword_ratio",
                "punct_ratio",
                "quality_ok",
            ],
        )

    src = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return src.select("doc_id", q_udf(F.col(text_col)).alias("q")).select(
        "doc_id", "q.*"
    )


def language_id(df: DataFrame, text_col: str = "text", impl: str = "pandas") -> DataFrame:
    """Stopword-profile language scoring: fraction of tokens matching
    each language profile, argmax with lexicographic tiebreak. The
    relational spelling (impl="sql": explode profiles -> score ->
    rank) is what the oracle replicates; the default is a single-pass
    UDF computing identical integer counts."""
    if impl == "sql":
        spark = df.sparkSession
        profiles = spark.createDataFrame(
            [(lang, words) for lang, words in sorted(LANG_PROFILES.items())],
            "lang_cand string, profile array<string>",
        )
        toks = df.select(
            "doc_id", F.expr(H.spark_tokens(text_col)).alias("toks")
        ).withColumn("n_words", F.size("toks"))
        scored = toks.crossJoin(F.broadcast(profiles)).withColumn(
            "score",
            F.size(F.filter(F.col("toks"), lambda t: F.array_contains(F.col("profile"), t)))
            / F.col("n_words"),
        )
        w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang_cand").asc())
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("doc_id", F.col("lang_cand").alias("lang_pred"), "score")
        )

    prof_sets = [(lang, frozenset(words)) for lang, words in sorted(LANG_PROFILES.items())]

    @F.pandas_udf("struct<lang_pred: string, score: double>")
    def lang_udf(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            toks = (t or "").lower().strip().split()
            nw = len(toks)
            best_lang, best_score = None, None
            for lang, words in prof_sets:  # lexicographic order => ties keep first
                score = (sum(1 for x in toks if x in words) / nw) if nw else None
                if score is not None and (best_score is None or score > best_score):
                    best_lang, best_score = lang, score
            rows.append((best_lang, best_score))
        return pd.DataFrame(rows, columns=["lang_pred", "score"])

    src = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return src.select("doc_id", lang_udf(F.col(text_col)).alias("r")).select(
        "doc_id", "r.lang_pred", "r.score"
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count (letter runs /
    digit runs / single symbols) — the cheap proxy for tokenizer cost
    budgeting."""
    return df.select(
        "doc_id",
        F.size(F.expr(H.spark_tokens(text_col))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0)).cast("long").alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", impl: str = "pandas") -> DataFrame:
    """Rolling polynomial hash of the normalized text (lowercased,
    whitespace collapsed) — a content fingerprint for exact-dup
    detection across formatting variants.

    Default impl is the vectorized numpy fold (bit-identical to the
    SQL spelling — see functions/hashing_pandas); impl="sql" keeps the
    interpreted expression for oracle documentation."""
    if impl == "sql":
        norm = f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')"
        return df.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        ).select("doc_id", F.expr(H.spark_str_hash(norm)).alias("fp"))

    from ..functions import hashing_pandas as HP

    @F.pandas_udf("long")
    def fp_udf(texts: pd.Series) -> pd.Series:
        return HP.fingerprint_series(texts)

    return df.repartition(df.sparkSession.sparkContext.defaultParallelism).select(
        "doc_id", fp_udf(F.col(text_col)).alias("fp")
    )


def sliding_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping fixed-width passage extraction — the
    retrieval-indexing prep stage (RAG chunking): each document
    yields token windows of ``window`` tokens every ``stride``
    tokens, the LAST window clamped to the doc end so coverage is
    total (every token belongs to >= 1 passage; with stride <
    window, interior tokens belong to ~window/stride).

    Output: (id, passage_seq 1-based, start_tok, end_tok, 1-based
    inclusive bounds, passage_text in normalized token space) — the
    frame an embedding stage maps and an ANN index ingests.

    Sibling contract: ``training_data.chunk_tokens`` is the TRAINING
    spelling (emits chunk-hash fingerprints for context-window
    packing/dedup; tail chunk may be short). This is the RETRIEVAL
    spelling: it carries the passage text itself and CLAMPS the last
    window back onto the doc end, so no passage is ever shorter than
    min(window, n_tokens) — short trailing passages embed badly.

    Scale: pure per-doc codegen (tokenize -> sequence -> explode);
    no shuffle at all — the fan-out is ~n_tokens/stride rows per doc.
    """
    from ..functions import hashing as H

    src = df.filter(F.col(text_col).isNotNull())
    base = src.select(
        F.col(id_col).alias("id"),
        F.expr(H.spark_tokens(text_col)).alias("tok"),
    ).filter(F.size("tok") >= 1)
    nw = (
        f"1 + cast(case when size(tok) > {window} "
        f"then ceil((size(tok) - {window}) / {float(stride)}) else 0 end as int)"
    )
    # Clamp: the LAST window back-shifts onto the doc end instead of
    # truncating, so its start is min(k*stride+1, n-window+1). The
    # single `least(...)` below is exact for EVERY window, not just
    # the last: for any non-final k, k*stride + window <= n_tokens by
    # construction of nw, so the left argument already wins. (Round 5
    # shipped truncating tails despite this docstring — ADVICE r5.)
    start = f"least(k * {stride} + 1, greatest(1, size(tok) - {window} + 1))"
    return (
        base.withColumn("k", F.expr(f"explode(sequence(0, {nw} - 1))"))
        .select(
            F.col("id").alias(id_col),
            (F.col("k") + 1).cast("long").alias("passage_seq"),
            F.expr(start).cast("long").alias("start_tok"),
            F.expr(
                f"least({start} + {window} - 1, size(tok))"
            ).cast("long").alias("end_tok"),
            F.expr(
                f"array_join(slice(tok, {start}, "
                f"least({start} + {window} - 1, size(tok)) - ({start}) + 1), ' ')"
            ).alias("passage_text"),
        )
    )
