"""TF-IDF document summarization (F16 —
certa/models/ditto/summarize.py:34-113): keep each document's top-k
tokens by corpus TF-IDF.

The reference fits sklearn TfidfVectorizer in memory; here the document
frequency table is a relational aggregation (explode -> groupBy), idf
joins back broadcast, and per-doc top-k is a window — every step a
shuffle-partitioned DataFrame op that scales to arbitrary corpora, and
the whole computation has a DuckDB SQL twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from certa_spark.functions.textstats import WORD_RE, duck_words, words


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc top-k tokens by tf * ln(N / df), ties broken by token.

    Returns (doc_id, token, rank, score) with score rounded to 6dp.
    """
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_tbl), "token").withColumn(
        "score",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            6,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "rank", "score")
    )


def duck_tfidf_topk_sql(k: int = 5) -> str:
    """DuckDB twin over the ``documents`` view."""
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({duck_words('text')}) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (
        SELECT token, count(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               round(CAST(tf.tf AS DOUBLE)
                     * ln((SELECT n_docs FROM n) / CAST(dfreq.df AS DOUBLE)), 6)
                   AS score
        FROM tf JOIN dfreq ON tf.token = dfreq.token
    )
    SELECT doc_id, token,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token) AS BIGINT) AS rank,
           score
    FROM scored
    QUALIFY rank <= {k}
    """
