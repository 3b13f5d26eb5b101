"""Overlapping token-window chunking — the RAG / long-context
preprocessing primitive: split every document into fixed-size token
windows with a stride (overlap = size - stride), keeping chunk
provenance (doc id, chunk index, token count).

Physical shape: tokenize + window-start generation + slice are ALL
map-side Column expressions (sequence/slice higher-order functions in
whole-stage codegen) — the only data movement is the explode's row
fan-out, there is NO shuffle. At 100 TB each task chunks its own
parquet split; downstream embedding/indexing stages see ~size/stride ×
input rows, which is why stride is a knob and not hardcoded.

Reference parity note: tteofili/certa has no chunking operator — this
is training-data-pipeline extension surface, built green-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Chunk ``text_col`` into ``size``-token windows every ``stride``
    tokens: returns ``(id_col, chunk_id, n_tokens, chunk)``.

    Window starts are ``0, stride, 2·stride, …`` up to the last start
    that still covers at least one token; the final window may be
    short. Empty documents produce no chunks. ``chunk_id`` is the
    window ordinal (start ÷ stride) — deterministic, so chunk rows are
    stable keys for downstream dedup/embedding joins.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        docs.select(id_col, toks.alias("_toks"), F.explode(starts).alias("_start"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            (F.col("_start") / stride).cast("long").alias("chunk_id"),
            F.size(F.slice(F.col("_toks"), F.col("_start") + 1, size))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, size), " "
            ).alias("chunk"),
        )
    )
