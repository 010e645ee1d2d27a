"""Language-model perplexity scoring for quality filtering.

The CCNet/LLaMA-style corpus gate: score every document's perplexity
under a smoothed unigram LM and drop the tails (gibberish scores high,
boilerplate scores suspiciously low). Here the LM is trained on the
corpus itself (an external reference corpus is a parameter away — the
plan is identical: counts come from whichever DataFrame trains the
model).

Determinism contract (DuckDB-oracle-checkable):
- add-one-smoothed probabilities p(w) = (c(w)+1)/(N+V) are single
  IEEE divisions of exact integers;
- each doc's log-likelihood is summed per DISTINCT word as
  ``tf_w * ln p(w)``, cast to DECIMAL(38,6) so the per-doc sum is
  EXACT and order-independent; at scale 6 the integer magnitude stays
  under 2^53, so the decimal->double cast is exact in both engines;
- mean log-prob and ``exp`` are then single deterministic float ops.

Scale: token counts are one map-side-combined groupBy (vocab-sized
shuffle); scoring joins each doc's distinct-word tf rows against the
broadcast-or-shuffled vocab table and partial-aggregates per doc
before the single doc_id shuffle. The corpus is scanned twice (train,
score) — at 100 TB, train on a hash-sampled slice instead; the plan
does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

__all__ = ["unigram_perplexity"]

_DEC = "decimal(38,6)"


def unigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_filter=None,
) -> DataFrame:
    """Per-doc (id, n_tokens, ppl): perplexity under the add-one
    unigram LM trained on ``train_filter`` rows (default: the whole
    corpus). Unseen words at score time get the smoothing floor
    1/(N+V)."""
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(H.spark_tokens(text_col))).alias("tok"),
    )
    train = toks if train_filter is None else (
        df.filter(train_filter)
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.expr(H.spark_tokens(text_col))).alias("tok"),
        )
    )
    vocab = train.groupBy("tok").agg(F.count("*").alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    scored = (
        tf.join(vocab, "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            "tf",
            (
                F.col("tf")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("n_total") + F.col("v_size"))
                )
            ).cast(_DEC).alias("ll_term"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum("ll_term").alias("ll"),
    )
    mean_lp = F.col("ll").cast("double") / F.col("n_tokens")
    return per_doc.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.exp(-mean_lp), 4).alias("ppl"),
    )
