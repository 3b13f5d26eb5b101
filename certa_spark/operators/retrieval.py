"""Text retrieval over the document corpus: inverted index + BM25.

The text-side complement of the embedding ANN operators
(operators/similarity.py): a term-at-a-time BM25 scorer built from
relational primitives only —

  * postings:  explode tokens -> per (token, doc) term frequency. This
    IS the inverted index, stored relationally (token-partitioned at
    scale: the shuffle key is the token, so each executor owns a term
    range — the standard sharded-index layout);
  * doc stats: per-doc length + corpus-wide average length (broadcast
    scalar);
  * scoring:   filter postings to the query's terms (partition-pruning
    on the token-sharded index at scale), join the tiny per-term IDF
    table broadcast, one groupBy(doc) sum.

No UDFs anywhere — the whole scorer is Catalyst expressions inside
whole-stage codegen.

Float determinism for the DuckDB oracle: each per-(doc, term)
contribution is computed in one fixed operation order and rounded to 6
decimals, then the per-doc sum routes through DECIMAL(30,6) so partial
aggregation order cannot change the result.

Reference parity note: tteofili/certa has no retrieval operators — this
is part of the training-data-pipeline extension surface (SURVEY §2
extensions), built green-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.textstats import duck_words, words

K1 = 1.2
B = 0.75


def postings(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Inverted-index postings: (token, doc_id, tf). One explode + one
    counting aggregate; at scale this is written bucketed/partitioned
    by token so term lookups prune to one shard."""
    return (
        docs.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("token"))
        .groupBy("token", id_col)
        .agg(F.count("*").cast("long").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 score of every document matching >= 1 query term.

    Returns (doc_id, score) with score rounded to 4 decimals. Plan:
    postings filtered to the query terms (the only shuffle over corpus
    data carries just matching postings), per-term IDF computed from
    those postings' doc frequencies, broadcast back, one final
    groupBy(doc) sum.
    """
    # materialize the two derived tables a real BM25 system persists
    # anyway (term-filtered postings; doc-length stats): without these
    # leaves every downstream branch re-tokenizes the corpus — 4 full
    # scans instead of 2 (postings + doc lengths, each once).
    post = (
        postings(docs, text_col, id_col)
        .filter(F.col("token").isin(terms))
        .localCheckpoint()
    )
    dl = docs.select(
        F.col(id_col), F.size(words(F.col(text_col))).cast("double").alias("_dl")
    ).localCheckpoint()
    # doc lengths are small integers, so their double sum is exact in
    # any partial-aggregation order — both stats are bit-deterministic
    stats = dl.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    idf = (
        post.groupBy("token")
        .agg(F.count("*").cast("double").alias("_df"))
        .crossJoin(F.broadcast(stats.select("_n")))
        .select(
            "token",
            F.log(
                (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
            ).alias("_idf"),
        )
    )
    avgdl = stats.select("_avgdl")
    tf = F.col("tf").cast("double")
    contrib = F.round(
        F.col("_idf")
        * (tf * (k1 + 1.0))
        / (tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))),
        6,
    )
    return (
        post.join(F.broadcast(idf), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("_c").cast("decimal(30,6)")), 4)
            .cast("double")
            .alias("score")
        )
    )


def duck_bm25_sql(
    terms: list[str],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB oracle computing identical BM25 scores (same operation
    order, same rounding points)."""
    w = duck_words(text_col)
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH post AS (
        SELECT token, {id_col}, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT {id_col}, unnest({w}) AS token FROM {table})
        WHERE token IN ({term_list})
        GROUP BY token, {id_col}
    ),
    dl AS (
        SELECT {id_col}, CAST(len({w}) AS DOUBLE) AS dl FROM {table}
    ),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
    ),
    idf AS (
        SELECT token,
               ln((n - CAST(count(*) AS DOUBLE) + 0.5)
                  / (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf
        FROM post, stats
        GROUP BY token, n
    )
    SELECT post.{id_col} AS {id_col},
           CAST(round(sum(CAST(round(
               idf * (CAST(tf AS DOUBLE) * ({k1} + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + {k1} * (1.0 - {b} + {b} * dl / avgdl)), 6)
               AS DECIMAL(30,6))), 4) AS DOUBLE) AS score
    FROM post
    JOIN idf USING (token)
    JOIN dl ON post.{id_col} = dl.{id_col}
    CROSS JOIN stats
    GROUP BY post.{id_col}
    """
