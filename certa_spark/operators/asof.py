"""As-of (nearest-predecessor) join — time-series enrichment.

Spark has no ASOF JOIN operator; the naive encoding
(inequality join + row_number to keep the latest match) materializes
every (probe, earlier-match) pair before pruning — quadratic blowup on
hot keys, a non-starter at 100TB. This implements the
union-and-window formulation instead:

  1. tag left (probe) and right (reference) rows, union them,
  2. one shuffle: window partitioned by the join key, ordered by
     (timestamp, side, tiebreak) with right rows sorting BEFORE probe
     rows at equal timestamps (as-of semantics: ``right.ts <= left.ts``
     matches, ties included),
  3. ``last(payload, ignorenulls=True)`` over an UNBOUNDED
     PRECEDING..CURRENT frame carries each reference row forward to
     every later probe row.

Cost: exactly ONE hash shuffle of (|left| + |right|) rows on the join
key — the same price as sessionization — independent of how many
reference rows precede each probe. The payload travels as a single
struct so all matched columns are guaranteed to come from the SAME
reference row (per-column ``last(ignorenulls)`` would mix rows if the
reference data itself contained nulls).

Skew note: all rows for one key land in one task; a pathological key
(one user with 10^8 events) needs pre-splitting by time range before
this operator — same caveat as any window function.

Reference parity note: tteofili/certa has no temporal operators — this
is training-data-pipeline extension surface (feature backfill /
point-in-time-correct label joins), built green-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    tolerance: int | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the right row
    with the greatest ``ts_col`` <= the left row's ``ts_col`` within
    the same ``on`` group (``direction="backward"``, ties match), or
    the smallest ``ts_col`` >= it (``direction="forward"``). Left rows
    with no match get nulls (left-join semantics).

    ``tolerance`` (same unit as ``ts_col``) bounds the match distance.
    ``tiebreak_col`` makes the pick deterministic when right rows share
    a timestamp (the row nearest the probe in tiebreak order wins).
    Output = every left column, plus ``{prefix}{c}`` for each payload
    column and ``{prefix}ts`` (the matched right timestamp).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *(
            [F.col(tiebreak_col).alias("__tie")]
            if tiebreak_col
            else [F.lit(0).alias("__tie")]
        ),
    )
    left_cols = left.columns
    l = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
    )
    # align schemas: right rows carry nulls for left-only columns
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.unionByName(r.select(*l.columns))

    # backward: ascending traversal, last reference seen <= probe ts;
    # forward: descending traversal, last reference seen >= probe ts.
    # Either way references sort before probes at equal ts (ties match)
    # and the largest tiebreak among equal-ts references wins.
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)
    out = unioned.withColumn("__m", matched).filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col(ts_col) - F.col("__m.__ts")
            if direction == "backward"
            else F.col("__m.__ts") - F.col(ts_col)
        )
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    return out.select(
        *left_cols,
        F.col("__m.__ts").alias(f"{prefix}ts"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
