"""Sequence packing — assign documents to fixed-token-budget bins.

LLM training consumes fixed-length sequences; the standard
concat-then-chunk packing walks the corpus in a deterministic order,
accumulates token counts, and cuts a new pack every ``seq_len``
tokens. That running accumulation is a window cumsum, so the whole
assignment is one shuffle on the stream key — no driver loop, no UDF,
and (unlike greedy first-fit bin packing) a deterministic result any
engine can reproduce, which is what makes the pack layout auditable.

Per-key packing (key = source/shard) keeps the window partitioned —
at 100 TB one global ordering would serialize; per-shard packing is
what real pipelines do anyway (shards are the unit of shuffling at
training time). A doc longer than ``seq_len`` spans multiple packs
exactly as concat-then-chunk would (its tokens still occupy one
contiguous token range; ``pack_id`` marks the pack its first token
lands in... see ``offset_in_pack``).

Reference parity note: no packing in tteofili/certa — green-field
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_assign(
    docs: DataFrame,
    token_col: str,
    seq_len: int,
    key_col: str,
    order_col: str,
) -> DataFrame:
    """Deterministic concat-then-chunk pack assignment per ``key_col``
    stream in ``order_col`` order. Adds:

      * ``token_start`` — the doc's first-token offset in its stream,
      * ``pack_id`` — ``token_start div seq_len``,
      * ``offset_in_pack`` — ``token_start mod seq_len``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    return (
        docs.withColumn("token_start", start)
        .withColumn("pack_id", F.expr(f"token_start div {int(seq_len)}"))
        .withColumn("offset_in_pack", F.col("token_start") % F.lit(int(seq_len)))
    )
