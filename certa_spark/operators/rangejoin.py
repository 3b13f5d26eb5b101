"""Bucketized point-in-interval range join.

``points.p BETWEEN intervals.lo AND intervals.hi`` has no hash-joinable
equality key, so Catalyst can only plan it as a broadcast nested-loop
join (fine when intervals fit in memory) or a cartesian product (never
fine). For large-large cases this implements the standard bucketization
scheme:

  1. pick a bucket width ``w``; explode each interval into the buckets
     it overlaps — ``sequence(floor(lo/w), floor(hi/w))`` — a JVM-side
     generator, no Python;
  2. bucket each point: ``floor(p/w)`` (map-side, no explosion);
  3. equi-join on (key, bucket) — an ordinary shuffled hash join
     Catalyst can plan, partition, and AQE-skew-split — then re-apply
     the exact BETWEEN as a post-filter.

Each point carries exactly one bucket and an interval appears at most
once per bucket, so a qualifying (point, interval) pair meets in
exactly one bucket: no duplicate results, no dedup pass needed.

Cost model: shuffle size = |points| + |intervals| * avg_buckets_per
_interval. Pick ``w`` near the median interval length so
avg_buckets_per_interval stays ~2; a too-small ``w`` inflates the
interval side, a too-large ``w`` degrades the post-filter selectivity
(many co-bucketed non-matches). Both failure modes degrade gracefully
— correctness never depends on ``w``.

Reference parity note: tteofili/certa has no range operators — this is
training-data-pipeline extension surface (event-to-session/window
attribution), built green-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each point row to every interval row (same ``on``
    key) whose ``[lo_col, hi_col]`` range contains ``point_col``.
    All columns from both sides are kept (join-key columns once).
    ``bucket_width`` is in the units of ``point_col`` and only affects
    performance, never the result."""
    w = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(lo_col) / w).cast("long"), (F.col(hi_col) / w).cast("long")
            )
        ),
    )
    pt = points.withColumn("__bucket", (F.col(point_col) / w).cast("long"))
    joined = pt.join(iv, on=on + ["__bucket"], how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("__bucket")
