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


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document mean bigram log-probability under an add-k-smoothed
    corpus bigram LM — one rung up from :func:`unigram_surprisal` on
    the KenLM-filter ladder (context-aware: catches shuffled-word and
    template text that unigram stats score as natural). Returns
    (id_col, n_bigrams, avg_logprob[4dp]).

      p(w2|w1) = (count(w1 w2) + k) / (count(w1·) + k·V)

    FIT is two aggregates off ONE exploded-bigram pass (bigram counts;
    left-context counts derived from them by a second partial agg, not
    a re-scan) plus a 1-row vocab count. SCORE re-joins doc bigrams to
    the model — bigram-vocabulary-sized, broadcast below threshold,
    hash join above. Per-bigram log terms route through DECIMAL(30,6)
    before the per-doc sum (float parity rule, queries.py header)."""
    w = words(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    doc_bg = docs.select(F.col(id_col), F.explode(bigrams).alias("bg"))
    bg_counts = doc_bg.groupBy("bg").agg(F.count("*").alias("cbg"))
    left_counts = (
        bg_counts.select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"), "cbg"
        )
        .groupBy("w1")
        .agg(F.sum("cbg").alias("cw1"))
    )
    vocab = docs.select(F.explode(w).alias("w")).groupBy().agg(
        F.count_distinct("w").cast("double").alias("v")
    )
    model = bg_counts.withColumn(
        "w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
    ).join(left_counts, "w1")
    term = (
        (
            F.log(F.col("cbg").cast("double") + F.lit(float(add_k)))
            - F.log(F.col("cw1").cast("double") + F.lit(float(add_k)) * F.col("v"))
        )
        .cast("decimal(30,6)")
        .alias("term")
    )
    scored = (
        doc_bg.join(model.select("bg", "cbg", "cw1"), "bg")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), term)
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.sum("term").cast("double") / F.count("*"), 4).alias(
            "avg_logprob"
        ),
    )


def dsir_importance(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    add_k: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every document by ``log p_target(x) - log p_raw(x)`` under two
    add-k-smoothed unigram models over HASHED word features — the
    published recipe for selecting raw-corpus documents that look like
    a target domain, with the feature space capped at ``n_buckets``
    regardless of vocabulary size (the hashing is what keeps the model
    broadcastable at 100 TB).

      w(x) = sum_f c_f(x) * [ ln((cnt_t(f)+k)/(T+kB))
                            - ln((cnt_r(f)+k)/(R+kB)) ]

    Shape: ONE aggregate off a single token-explode pass builds BOTH
    models (raw count + conditional target count per feature —
    Catalyst does not CSE across aggregate branches, so a separate
    raw/target groupBy pair would tokenize the corpus twice), giving
    one model table of at most ``n_buckets`` rows — broadcast — then
    a scoring pass whose only wide exchange carries per-doc partial
    sums: two corpus scans total. Features hash with the cross-engine
    md5 hash32, the per-feature log-ratio routes through
    DECIMAL(30,6) before the per-doc sum (float parity rule,
    queries.py header), and documents with zero tokens drop out of
    the output on both engines (inner join on features).

    Returns ``(id_col, n_tokens, dsir_logw)`` — the weight on the
    exact 1e-6 per-term grain (no final rounding; see the in-code
    note on the cross-engine .5-tie).

    Reference parity note: no data-selection operators in
    tteofili/certa — green-field training-data-pipeline surface.
    """
    from certa_spark.functions.hashing import hash32

    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(words(F.col(text_col))).alias("w"),
    ).select(
        F.col(id_col),
        "_is_target",
        F.pmod(hash32(F.col("w")), F.lit(n_buckets)).alias("f"),
    )
    # a NULL target predicate (e.g. a null source column) counts as
    # non-target, matching SQL count_if semantics
    model = toks.groupBy("f").agg(
        F.count("*").alias("cr"),
        F.sum(
            F.when(F.col("_is_target"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("ct"),
    )
    k = float(add_k)
    totals = model.groupBy().agg(
        F.log(
            F.sum("ct").cast("double") + F.lit(k * n_buckets)
        ).alias("ln_t_den"),
        F.log(
            F.sum("cr").cast("double") + F.lit(k * n_buckets)
        ).alias("ln_r_den"),
    )
    term = (
        (
            (F.log(F.col("ct").cast("double") + F.lit(k)) - F.col("ln_t_den"))
            - (F.log(F.col("cr").cast("double") + F.lit(k)) - F.col("ln_r_den"))
        )
        .cast("decimal(30,6)")
        .alias("term")
    )
    scored = (
        toks.join(F.broadcast(model.crossJoin(F.broadcast(totals))), "f")
        .select(F.col(id_col), term)
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        # NO final rounding: the per-term DECIMAL(30,6) quantization
        # already fixed the grain, so the exact decimal sum casts to
        # the same double in every engine — a round(x, 4) here hit a
        # genuine .5 tie at sf0.001 (-12.94625) that Spark (HALF_UP)
        # and DuckDB resolve differently
        F.sum("term").cast("double").alias("dsir_logw"),
    )


def dsir_resample(
    docs: DataFrame,
    target_pred,
    k_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    add_k: float = 1.0,
    seed: int = 29,
) -> DataFrame:
    """DSIR stage 2 (r10; Xie et al. §2.2): importance RESAMPLING —
    draw ``k_docs`` documents without replacement with probability
    proportional to the importance weight ``exp(dsir_logw)``. The
    draw is the A-ES weighted-sampling trick this repo already uses
    for ``doc_weighted_sample`` (:func:`sampling.weighted_sample_keys`
    — ``wkey = u^(1/w)`` with a content-hash uniform, top-k by wkey is
    a weighted sample without replacement), so the whole stage is
    deterministic under any partitioning with no RNG state, and
    composes :func:`dsir_importance` unchanged.

    Scale shape: the importance pass is dsir_importance's two corpus
    scans (broadcast model, one wide exchange of per-doc partials);
    the resample adds one map-side key expression and a partial top-k
    (per-partition heaps, then a k-row merge — never a global sort or
    a corpus-sized window: the rank window sees only the k survivors).
    ``wkey`` rounds to 6 decimals before ranking (cross-engine pow/exp
    ulp noise cannot reorder), ties to the smaller ``id_col``. The
    weight clamps at 1e-300 (r11, advice): a log-weight below ~-745
    underflows ``exp`` to exactly 0.0, and ``1/0.0`` is an engine-
    semantics question this pipeline refuses to ask — with the clamp
    both engines compute ``pow(u, 1e300) == 0.0`` deterministically
    (strongly negative weights still sort last, unchanged).

    Returns the selected docs as ``(id_col, n_tokens, dsir_logw,
    rnk, wkey)``, rank 1 = first drawn.
    """
    from certa_spark.operators.sampling import rank_top, weighted_sample_keys

    imp = dsir_importance(
        docs, target_pred, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, add_k=add_k,
    )
    keyed = weighted_sample_keys(
        imp, id_col,
        F.greatest(F.exp(F.col("dsir_logw")), F.lit(1e-300)),
        seed=seed,
    )
    # partial top-k before any exchange (TakeOrderedAndProject), then
    # row_number over the k survivors only
    top = keyed.orderBy(F.col("wkey").desc(), F.col(id_col)).limit(k_docs)
    return rank_top(top, [F.col("wkey").desc(), F.col(id_col)]).select(
        id_col, "n_tokens", "dsir_logw", "rnk", "wkey"
    )
