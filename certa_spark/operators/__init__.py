"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin-widen ``df`` ONLY when it arrives narrower than the
    cluster (r8 ADVICE low #1).

    The single-split trap (PLANS.md round 8): a small parquet source
    under ``maxPartitionBytes`` arrives as ONE input split, so
    expensive per-row map work (shingling, regexp tokenization, k-fold
    MinHash) that precedes the first shuffle runs inside one task; one
    narrow exchange of the raw rows buys full map-side parallelism at
    fixture scale. But an UNCONDITIONAL ``repartition()`` is a full
    round-robin exchange of every raw row — proportional to data size,
    not split count — so at 100 TB (thousands of input splits, already
    wider than ``defaultParallelism``) it would add a full-corpus
    shuffle for zero parallelism gain. Gating on the source's actual
    partition count keeps the small-fixture win without the at-scale
    cost: frames already at least as wide as the target pass through
    untouched (identity — no plan change at all).

    ``getNumPartitions()`` compiles the plan but runs no job — for
    the PRE-SHUFFLE SCAN frames this helper is for. Do not hand it a
    frame containing an exchange: under AQE, ``df.rdd`` forces the
    final physical plan, executing every upstream shuffle stage as
    real jobs whose results the subsequent action does NOT reuse —
    a hidden double execution. Call it on the raw source projection,
    before the first wide operator.
    """
    p = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)
