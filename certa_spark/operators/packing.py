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


def pack_assign_salted(
    docs: DataFrame,
    token_col: str,
    seq_len: int,
    key_col: str,
    order_col: str,
    block_size: int = 1 << 20,
) -> DataFrame:
    """Hot-key-safe twin of :func:`pack_assign` — identical output, but
    the per-key running sum is a two-phase segmented scan so a single
    dominant key no longer serializes through one window partition:

      1. blocks = contiguous ``order_col`` ranges (``div block_size``);
         the local cumsum windows over (key, block) — parallel across
         a hot key's blocks;
      2. per-(key, block) token totals (tiny: keys x blocks rows) get
         a block-prefix cumsum, joined back on (key, block).

    Requires an integral ``order_col`` (same as pack_assign's
    determinism contract). Two extra shuffles versus pack_assign; use
    when key skew is expected, e.g. one source is most of the corpus.
    """
    blk = F.expr(f"{order_col} div {int(block_size)}").cast("long")
    b = docs.withColumn("_blk", blk)
    wl = (
        Window.partitionBy(key_col, "_blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (F.sum(F.col(token_col)).over(wl) - F.col(token_col)).cast("long")
    b = b.withColumn("_local_start", local)
    wp = (
        Window.partitionBy(key_col)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        b.groupBy(key_col, "_blk")
        .agg(F.sum(token_col).cast("long").alias("_blk_tokens"))
        .withColumn(
            "_blk_prefix",
            F.coalesce(F.sum("_blk_tokens").over(wp), F.lit(0)).cast("long"),
        )
        .select(key_col, "_blk", "_blk_prefix")
    )
    out = b.join(prefix, [key_col, "_blk"])
    start = (F.col("_blk_prefix") + F.col("_local_start")).cast("long")
    return (
        out.withColumn("token_start", start)
        .withColumn("pack_id", F.expr(f"token_start div {int(seq_len)}"))
        .withColumn("offset_in_pack", F.col("token_start") % F.lit(int(seq_len)))
        .drop("_blk", "_local_start", "_blk_prefix")
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    length_col: str,
    batch_size: int = 32,
    key: str | None = None,
) -> DataFrame:
    """Length-bucketed INFERENCE batching: group similar-length
    documents into fixed-count batches so per-batch padding (every row
    pads to its batch max) is minimized — the standard
    sort-by-length trick that cuts transformer inference FLOPs 2-3x on
    skewed length distributions vs arrival-order batching.

    Assignment is rank ``div`` batch_size over a (key-partitioned)
    length ordering with id tiebreak — fully deterministic, one
    shuffle. Per-key batching (key = shard/source) keeps the window
    partitioned at scale, same contract as :func:`pack_assign`; the
    unkeyed variant is for driver-sized batches only (global sort).
    Returns ``(id_col, [key,] batch_id, <length_col>, batch_max_len,
    padding_waste)`` where padding_waste = batch_max - own length (sum
    it for the total padded-token overhead).
    """
    part = [F.col(key)] if key else []
    w = Window.partitionBy(*part).orderBy(
        F.col(length_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        id_col,
        *([key] if key else []),
        F.col(length_col),
        ((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("long")
        .alias("batch_id"),
    )
    wb = Window.partitionBy(*part, "batch_id")
    return ranked.select(
        "*",
        F.max(length_col).over(wb).alias("batch_max_len"),
    ).withColumn(
        "padding_waste", F.col("batch_max_len") - F.col(length_col)
    )
