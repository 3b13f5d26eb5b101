"""Corpus-statistics language-model scoring (unigram surprisal).

The cheapest useful "perplexity" quality signal for training-data
curation: fit a unigram LM over the corpus itself (one aggregate),
then score each document by its mean per-token surprisal
``-ln p(w) = ln(total_tokens) - ln(count(w))``. Boilerplate and
keyword-stuffed documents score LOW (all high-frequency tokens);
lorem-ipsum/garbage scores HIGH. This is the distributed twin of the
KenLM-filter stage in C4/Gopher-style pipelines, with the model table
living in the engine instead of an external LM binary.

Shape (two phases, both pure DataFrame ops):
  1. FIT — explode tokens, count per token: the "model" is a
     (token, count) table, partial-aggregated map-side.
  2. SCORE — re-explode, equi-join tokens against the model, per-doc
     average. The model table is vocabulary-sized (Heaps' law:
     ~10^6-10^7 rows even at 100 TB of text), so Spark broadcasts it
     and the scoring pass is shuffle-free until the final per-doc
     aggregate; if a tokenizer produced an unbounded key space the
     same plan degrades to a shuffled join on the token key.

Float parity rule (queries.py header): each per-token surprisal routes
through DECIMAL(30,6) before the per-doc sum, so partial-aggregation
order cannot change the result; ln() is evaluated in-engine on both
sides on identical doubles.

Reference parity note: no LM scoring in tteofili/certa — green-field
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.textstats import words


def unigram_surprisal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram surprisal over the corpus LM.
    Returns (id_col, n_tokens, avg_surprisal[4dp])."""
    toks = docs.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = toks.groupBy().agg(
        F.log(F.count("*").cast("double")).alias("ln_total")
    )
    term = (
        (F.col("ln_total") - F.log(F.col("c").cast("double")))
        .cast("decimal(30,6)")
        .alias("term")
    )
    scored = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), term)
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            F.sum("term").cast("double") / F.count("*"), 4
        ).alias("avg_surprisal"),
    )
