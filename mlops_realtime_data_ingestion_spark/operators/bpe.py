"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-training stage of an LLM data pipeline, as iterative
DataFrame aggregation.

Each round finds the globally most frequent adjacent symbol pair
(weighted by word frequency) and merges it greedily left-to-right in
every word; k rounds emit the first k merge rules.  The reference has
no tokenizer stage at all; this is the Spark-native counterpart of the
single-node `tokenizers` trainer loop.

Representation: a word's symbol sequence is carried as ONE delimited
string ``|s1||s2||...||sn|`` (single pipes at the ends, double between
symbols).  The merge of pair (a, b) is then a LITERAL string
replacement ``|a||b|`` -> ``|ab|``, which both Spark and SQL engines
apply leftmost-first non-overlapping — exactly BPE's greedy merge
order.  Consecutive occurrences never collide because the doubled
inner delimiter gives each boundary one pipe per side, so adjacent
matches don't compete for a shared character.  No UDF, no regex
lookarounds, bit-identical across engines.  Tokens containing a
literal '|' are excluded from the vocabulary (they would corrupt the
delimited encoding); see bpe_merges.

Scale: the corpus is scanned ONCE into a (word, count) vocabulary
(shuffle = distinct words); each round then shuffles only
vocab x avg_word_len pair rows, finds the top pair with a
TakeOrdered(1), broadcasts it, and rewrites the vocabulary with a
narrow literal replace.  Nothing driver-side, nothing proportional to
corpus size after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_delimited(word):
    # 'abc' -> '|a||b||c|' : prefix every char with '||', drop the
    # leading pipe, wrap
    return F.concat(
        F.expr(f"substring(regexp_replace({word}, '(.)', '||$1'), 2)"), F.lit("|")
    )


def _symbols(s: str):
    """Delimited state -> symbol array."""
    return F.split(F.expr(f"regexp_replace({s}, '^\\\\||\\\\|$', '')"), "\\|\\|")


def _pairs(s: str):
    """Adjacent (l, r) structs from the delimited state; empty for
    single-symbol words (explicit guard: Spark's sequence(1, 0) counts
    DOWN rather than producing an empty array)."""
    a = _symbols(s)
    return F.when(
        F.size(a) > 1,
        F.expr(
            "transform(sequence(1, size(" + _sym_sql(s) + ") - 1), "
            "i -> struct(element_at(" + _sym_sql(s) + ", i) AS l, "
            "element_at(" + _sym_sql(s) + ", i + 1) AS r))"
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _sym_sql(s: str) -> str:
    return f"split(regexp_replace({s}, '^\\\\||\\\\|$', ''), '\\\\|\\\\|')"


def bpe_merges(df: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """First ``k`` BPE merge rules learned from the corpus: one row
    per round with (rank, left, right, merged, pair_count).  Ties on
    pair count break on (left, right) ascending, so the training is
    fully deterministic.
    """
    rules, _ = _train(_word_vocab(df, text_col), k)
    return rules


def _spark_words(text_col: str) -> str:
    # tokens containing the delimiter itself would corrupt symbol
    # boundaries in the '|s1||s2|' encoding (silently wrong pair
    # counts), so '|'-bearing tokens are excluded from the vocabulary
    # — mirrored in the oracle. They are tokenizer junk, not words.
    return (
        f"filter(split(lower(trim({text_col})), '\\\\s+'), "
        "x -> x != '' AND NOT contains(x, '|'))"
    )


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(w, s, cnt): corpus vocabulary with the delimited symbol state."""
    return (
        df.select(F.explode(F.expr(_spark_words(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w", _to_delimited("w").alias("s"), "cnt")
    )


def _train(vocab: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """k merge rounds over a (.., s, cnt) vocabulary; returns (rules,
    final vocabulary with merges applied).  Extra vocabulary columns
    (e.g. the word itself) pass through untouched."""
    out: DataFrame | None = None
    for rank in range(1, k + 1):
        pairs = vocab.select("cnt", F.explode(_pairs("s")).alias("p")).select(
            F.col("p.l").alias("left"), F.col("p.r").alias("right"), "cnt"
        )
        top = (
            pairs.groupBy("left", "right")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .select(
                F.lit(rank).alias("rank"),
                "left",
                "right",
                F.concat("left", "right").alias("merged"),
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        out = top if out is None else out.unionByName(top)
        # the merge itself: literal replace of '|l||r|' with '|lr|',
        # top pair broadcast to every vocabulary row
        vocab = (
            vocab.crossJoin(F.broadcast(top.select("left", "right")))
            .withColumn(
                "s",
                F.replace(
                    F.col("s"),
                    F.concat(F.lit("|"), "left", F.lit("||"), "right", F.lit("|")),
                    F.concat(F.lit("|"), "left", "right", F.lit("|")),
                ),
            )
            .drop("left", "right")
        )
    assert out is not None
    return out, vocab


def bpe_encode_counts(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """APPLY the learned tokenizer: per-document BPE token count after
    the first ``k`` merges — the encode stage that actually runs over
    100 TB once training has converged.

    Encoding happens on the VOCABULARY (one delimited-replace chain
    per distinct word, the same broadcast-literal plan as training),
    never on raw text: each document then just sums its words' symbol
    counts through one (word -> n_tokens) join.  Cost = train (vocab-
    sized rounds) + one explode-join-aggregate over the corpus; the
    per-word encode work is proportional to |vocab|, not corpus size.

    Returns (doc_id, n_words, n_bpe_tokens) for documents with >= 1
    valid word, where n_bpe_tokens <= chars and decreases as k grows.
    """
    _, vocab = _train(_word_vocab(df, text_col), k)
    word_tokens = vocab.select(
        "w", F.size(_symbols("s")).cast("long").alias("ntok")
    )
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_spark_words(text_col))).alias("w"),
    )
    return (
        words.join(word_tokens, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("ntok").alias("n_bpe_tokens"),
        )
    )
