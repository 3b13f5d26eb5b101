"""Sorted-neighborhood ER blocking — the second classic sub-quadratic
candidate-generation family next to key blocking (queries
`er_blocking_pairs`): sort all records of both sources by a blocking
key and compare only records within a sliding window of the sorted
order. Catches near-boundary matches that equality blocking misses
(typos in the block key land nearby in sort order, not in the same
block).

The scale problem is the GLOBAL sort rank: a naive
``row_number() over (order by key)`` single-partitions the corpus.
:func:`global_rank` computes the exact same rank with a range
repartition + per-partition local index + tiny offset map:

  1. ``repartitionByRange`` on the (unique) order tuple — Spark's
     sampled range partitioner, the same machinery a global sort uses,
     so partitions hold contiguous key ranges;
  2. ``sortWithinPartitions`` + ``monotonically_increasing_id``: the
     id encodes (partition, local index) as ``pid·2³³ + idx`` — a
     per-partition sorted index with ZERO extra shuffle;
  3. per-partition row counts (one tiny agg) become a driver-side
     offset map (|partitions| entries, literal) added back map-side.

  The frame is checkpointed between (2) and (3): the range
  partitioner's sample seed varies per RDD, so the id assignment must
  be pinned once and reused, not recomputed per consumer.

Window pairing then needs no window function at all: rows bucket by
``(rank-1) div w``; any pair within distance w spans equal or adjacent
buckets, so one equi-join on the bucket key (right side exploded to
its own and previous bucket) enumerates exactly the candidate set.

Reference parity note: tteofili/certa ranks the full opposite source
per probe (local_explain.py:107-110); sorted-neighborhood is extension
surface a 100 TB ER pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOW33 = (1 << 33) - 1


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` (which must form a
    UNIQUE total order — ties would make the rank nondeterministic)
    without a single-partition window. See module docstring."""
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    d = d.withColumn("_pid", F.shiftright("_mid", 33)).withColumn(
        "_lrn", F.col("_mid").bitwiseAND(F.lit(_LOW33))
    )
    counts = sorted(
        (r["_pid"], r["_c"])
        for r in d.groupBy("_pid").agg(F.count("*").alias("_c")).collect()
    )
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    omap = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    return (
        d.withColumn(
            rank_col,
            (F.element_at(omap, F.col("_pid")) + F.col("_lrn") + 1).cast(
                "long"
            ),
        )
        .drop("_mid", "_pid", "_lrn")
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_col: str,
    side_col: str,
    id_col: str,
    window: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Cross-source candidate pairs within ``window`` positions of the
    global (key, side, id) sort order: returns ``(lid, rid, dist)``
    with ``dist`` = rank distance (1..window). One range shuffle for
    the rank, one bucket equi-join for the pairing; never all-pairs."""
    ranked = global_rank(
        records.select(
            F.col(key_col).alias("_k"),
            F.col(side_col).alias("_side"),
            F.col(id_col).alias("_id"),
        ),
        ["_k", "_side", "_id"],
        partitions,
    ).withColumn("_b", F.expr(f"(rank - 1) div {int(window)}"))
    a = ranked.select(
        F.col("_side").alias("_sa"),
        F.col("_id").alias("_ia"),
        F.col("rank").alias("_ra"),
        F.col("_b").alias("_ba"),
    )
    b = ranked.select(
        F.col("_side").alias("_sb"),
        F.col("_id").alias("_ib"),
        F.col("rank").alias("_rb"),
        F.explode(F.array(F.col("_b"), F.col("_b") - 1)).alias("_ba"),
    )
    d = F.col("_rb") - F.col("_ra")
    return (
        a.join(b, "_ba")
        .filter((d > 0) & (d <= window) & (F.col("_sa") != F.col("_sb")))
        .select(
            F.when(F.col("_sa") == "l", F.col("_ia"))
            .otherwise(F.col("_ib"))
            .alias("lid"),
            F.when(F.col("_sa") == "l", F.col("_ib"))
            .otherwise(F.col("_ia"))
            .alias("rid"),
            d.cast("long").alias("dist"),
        )
    )
