"""Ordered-funnel and cohort-retention analysis over an event log.

Classic product-analytics operators re-expressed Spark-first. Neither
exists in the reference (certa is an ER-explanation engine), but both
are table stakes for an analytics engine fed by the same event data the
training pipeline ingests.

Scale design
------------
``funnel_steps`` is a chain of k-1 user-keyed joins where the build
side of every join is the *aggregated* previous step (one row per user
that reached it — strictly shrinking). Each step's probe side is the
event table filtered to one event type *before* the shuffle, so the
per-step shuffle moves only that type's rows keyed by user. All joins
and aggregations share the ``user_id`` key, so Catalyst reuses the
hash partitioning across the chain instead of re-exchanging. No
windows, no per-user arrays — per-user state is one timestamp per
step, bounded regardless of how many events a hot user has.

``cohort_retention`` is two user-keyed aggregations (first-touch, then
distinct activity buckets) plus one small (cohort, offset) count — the
standard two-shuffle retention shape. The distinct() before the final
count keeps a user's many events in one bucket from inflating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_frames(
    events: DataFrame,
    steps: list[str],
    user_col: str,
    type_col: str,
    ts_col: str,
    horizon_hours: int | None,
) -> list[tuple[str, DataFrame]]:
    """The shared funnel chain: per step, the (u, t_step) frame of
    users who reached it (earliest qualifying event)."""
    reached: list[tuple[str, DataFrame]] = []
    prev: DataFrame | None = None
    for step in steps:
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if prev is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t_step"))
        else:
            cond = F.col("t") > F.col("t_prev")
            if horizon_hours is not None:
                cond = cond & (
                    F.col("t")
                    <= F.col("t_prev") + F.expr(f"INTERVAL {horizon_hours} HOURS")
                )
            cur = (
                ev.join(prev.select("u", F.col("t_step").alias("t_prev")), "u")
                .filter(cond)
                .groupBy("u")
                .agg(F.min("t").alias("t_step"))
            )
        reached.append((step, cur))
        prev = cur
    return reached


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_hours: int | None = None,
) -> DataFrame:
    """Strict ordered funnel: a user counts for step i only if their
    earliest qualifying step-i event is strictly after the timestamp
    that qualified them for step i-1 (and, with ``horizon_hours``,
    within that horizon of it).

    Returns one row per step: ``(step, event_type, users, pct_of_first)``
    with ``pct_of_first`` rounded to 6 decimals.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = _step_frames(
        events, steps, user_col, type_col, ts_col, horizon_hours
    )

    counts = None
    for i, (step, df) in enumerate(reached):
        c = df.agg(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(step).alias("event_type"),
            F.count("*").cast("long").alias("users"),
        )
        counts = c if counts is None else counts.unionByName(c)
    first = counts.filter(F.col("step") == 1).select(
        F.col("users").alias("first_users")
    )
    return (
        counts.crossJoin(F.broadcast(first))
        .select(
            "step",
            "event_type",
            "users",
            # first_users can legitimately be 0 (no step-1 events at
            # all) — every step is then 0 users and the rate is 0.0
            F.when(
                F.col("first_users") > 0,
                F.round(
                    F.col("users").cast("double") / F.col("first_users"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_of_first"),
        )
    )


def funnel_user_times(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_hours: int | None = None,
) -> DataFrame:
    """Per-user step timestamps for users completing EVERY funnel
    step: ``(u, t_1 .. t_k)``. The step frames are the shrinking
    per-user aggregates of the funnel chain, so the final assembly is
    k-1 small co-partitioned joins on the user key."""
    reached = _step_frames(
        events, steps, user_col, type_col, ts_col, horizon_hours
    )
    out = None
    for i, (_, df) in enumerate(reached):
        cur = df.select("u", F.col("t_step").alias(f"t_{i + 1}"))
        out = cur if out is None else out.join(cur, "u")
    return out


def session_sequences(
    events: DataFrame,
    n: int = 3,
    gap_ns: int = 30 * 60 * 1_000_000_000,
    top: int = 10,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_ns_col: str = "ts_ns",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Top-``top`` most frequent length-``n`` event-type sequences
    inside gap-based sessions: ``(seq, n)`` with ``seq`` like
    ``"view>click>purchase"``.

    Scale shape: gap-sessionize with the standard lag + running-sum
    boundary windows, then build the n-grams with ``lead()`` windows
    over the SAME (user)-keyed sort — no per-session arrays, no
    collect_list, so a pathological mega-session costs nothing extra.
    All three window passes share one shuffle partitioning; the final
    count is a map-side-combined groupBy on the sequence string, and
    the top-k is a TakeOrdered (count DESC, seq ASC — total order)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_ns_col, order_tiebreak)
    prev = F.lag(ts_ns_col).over(w)
    boundary = F.when(
        prev.isNull() | (F.col(ts_ns_col) - prev > gap_ns), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.withColumn("_sess", F.sum(boundary).over(w))
    ws = Window.partitionBy(user_col, "_sess").orderBy(
        ts_ns_col, order_tiebreak
    )
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(ws) for i in range(1, n)
    ]
    seq = F.concat_ws(">", *parts)
    # seq and the completeness guard MUST share one projection: a
    # filter between two Window operators would re-evaluate the leads
    # over the already-filtered partition and corrupt tail n-grams.
    return (
        sess.select(seq.alias("seq"), parts[-1].alias("_last"))
        .filter(F.col("_last").isNotNull())
        .select("seq")
        .groupBy("seq")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("seq").asc())
        .limit(top)
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort-retention matrix: users grouped by the day-bucket of
    their first event; for each (cohort, offset) bucket, how many
    distinct cohort members were active.

    Returns ``(cohort_day, offset, users)`` where ``cohort_day`` is the
    first day of the user's first-touch bucket and ``offset`` counts
    ``bucket_days``-day periods since it.
    """
    day = F.to_date(ts_col)
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(day).alias("first_day")
    )
    cohort_day = F.date_sub(
        F.col("first_day"),
        (
            F.datediff(F.col("first_day"), F.lit("2024-01-01").cast("date"))
            % bucket_days
        ),
    )
    first = first.select("u", cohort_day.alias("cohort_day"))
    active = events.select(F.col(user_col).alias("u"), day.alias("d"))
    return (
        active.join(first, "u")
        .select(
            "u",
            "cohort_day",
            (F.datediff(F.col("d"), F.col("cohort_day")) / bucket_days)
            .cast("long")
            .alias("offset"),
        )
        .distinct()
        .groupBy("cohort_day", "offset")
        .agg(F.count("*").cast("long").alias("users"))
    )
