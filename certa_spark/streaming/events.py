"""Structured Streaming operators over the events stream (green-field —
the reference has no streaming; SURVEY.md §2.10).

Batch twins of these transformations are oracle-checked in
certa_spark.queries (events_dedup / events_hourly); the streaming
variants add watermarks for state cleanup so they run unbounded:

  * watermarked_dedup   — exactly-once keyed dedup with bounded state
  * windowed_counts     — tumbling/sliding event-time aggregation
  * sessionized         — session windows per user
  * streaming_pair_dedup— north-star streaming ER ingestion: drop
                          duplicate candidate pairs inside the watermark
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keyed dedup with watermark-bounded state: late duplicates beyond
    the watermark are dropped by state cleanup rather than growing
    executor memory forever — the 100TB-stream requirement."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys + [ts_col])


def ingest_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    within: str = "30 minutes",
) -> DataFrame:
    """At-least-once ingest dedup with a bounded re-delivery horizon:
    ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival per key
    and evicts the key's state once the watermark passes its event
    time + ``within`` — state is bounded by the horizon's key-arrival
    rate, not stream lifetime. Contrast the two adjacent shapes:
    ``dropDuplicates(keys)`` alone grows state forever, and
    :func:`watermarked_dedup` bounds state only by making the event
    time PART of the key (same-key-different-ts rows stay distinct).
    Re-deliveries later than the horizon re-emit — the documented
    at-least-once contract (pinned cross-batch by
    tests/test_io_streaming_mm.py)."""
    return stream.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        keys
    )


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    win = (
        F.window(ts_col, window) if slide is None else F.window(ts_col, window, slide)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized(
    stream: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_pair_dedup(
    pair_stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """North-star streaming ER ingestion: candidate pairs arrive as a
    stream; duplicates of (ltable_id, rtable_id) within the watermark
    are dropped before the (expensive) matcher sees them."""
    return pair_stream.withWatermark(ts_col, watermark).dropDuplicates(
        ["ltable_id", "rtable_id"]
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    timeout_s: int = 120,
    output_mode: str = "append",
) -> None:
    """Test/debug helper: drain all available input into an in-memory
    table (Trigger.AvailableNow) and block until done. Use
    ``output_mode='complete'`` for aggregations whose last windows the
    watermark never closes in a finite run."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def sessionize_batch(
    events: DataFrame,
    gap_ns: int = 30 * 60 * 1_000_000_000,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """Batch twin of :func:`sessionized` — gap-based sessions via
    lag + running sum of session boundaries.

    One shuffle on ``user_col`` serves both window passes (same
    partitioning), then one partial+final aggregation per session.
    Returns (user_id, session_id, n_events, sum_value) where
    ``session_id`` is the per-user 1-based session index.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_ns_col, "event_id")
    prev = F.lag(ts_ns_col).over(w)
    boundary = F.when(
        prev.isNull() | (F.col(ts_ns_col) - prev > gap_ns), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = events.withColumn(
        "session_id", F.sum(boundary).over(w).cast("long")
    )
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
    )


def sessionize_batch_salted(
    events: DataFrame,
    gap_ns: int = 30 * 60 * 1_000_000_000,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    block_ns: int = 7 * 24 * 3600 * 1_000_000_000,
) -> DataFrame:
    """Hot-key-safe twin of :func:`sessionize_batch` — identical
    output, but gap detection + session numbering run as a two-phase
    segmented scan so a single-user firehose no longer serializes
    through one window partition:

      1. blocks = contiguous time ranges (``ts_ns div block_ns``);
         lag/boundary flags and the local boundary cumsum window over
         (user, block) — parallel across a hot user's blocks;
      2. per-(user, block) stats (first/last ts, local boundary count —
         tiny: users x blocks rows) decide each block's first-row
         boundary against the previous block's last ts and carry the
         session-count prefix, joined back on (user, block).

    Session ids match sessionize_batch exactly (1-based per user).
    Two extra shuffles; use when one key dominates the stream.
    """
    from pyspark.sql.window import Window

    # integer `div`, not float `/`: long→double loses precision above
    # 2^53 (~256ns ULP at 2024-epoch nanos) — same idiom as
    # packing.pack_assign_salted
    b = events.withColumn(
        "_blk", F.expr(f"{ts_ns_col} div {int(block_ns)}")
    )
    wl = Window.partitionBy(user_col, "_blk").orderBy(ts_ns_col, "event_id")
    prev_local = F.lag(ts_ns_col).over(wl)
    boundary_local = F.when(
        prev_local.isNotNull() & (F.col(ts_ns_col) - prev_local > gap_ns),
        F.lit(1),
    ).otherwise(F.lit(0))
    wcum = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b = b.withColumn("_local_cum", F.sum(boundary_local).over(wcum).cast("long"))

    stats = b.groupBy(user_col, "_blk").agg(
        F.min(ts_ns_col).alias("_first_ts"),
        F.max(ts_ns_col).alias("_last_ts"),
        F.max("_local_cum").alias("_n_local"),
    )
    wb = Window.partitionBy(user_col).orderBy("_blk")
    prev_last = F.lag("_last_ts").over(wb)
    first_b = F.when(
        prev_last.isNull() | (F.col("_first_ts") - prev_last > gap_ns),
        F.lit(1),
    ).otherwise(F.lit(0))
    stats = stats.withColumn("_first_b", first_b).withColumn(
        "_prefix",
        F.coalesce(
            F.sum(F.col("_n_local") + F.col("_first_b")).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    joined = b.join(
        stats.select(user_col, "_blk", "_first_b", "_prefix"),
        [user_col, "_blk"],
    )
    session = (
        F.col("_prefix") + F.col("_first_b") + F.col("_local_cum")
    ).cast("long")
    return (
        joined.withColumn("session_id", session)
        .groupBy(user_col, "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
    )


def sessionize_bounds(
    events: DataFrame,
    gap_ns: int = 30 * 60 * 1_000_000_000,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """Like :func:`sessionize_batch` but returns the session INTERVALS
    — (user_id, session_id, lo_ns, hi_ns) — for downstream range joins
    (see ``operators/rangejoin.py``). Same single-shuffle plan."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_ns_col, "event_id")
    prev = F.lag(ts_ns_col).over(w)
    boundary = F.when(
        prev.isNull() | (F.col(ts_ns_col) - prev > gap_ns), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = events.withColumn(
        "session_id", F.sum(boundary).over(w).cast("long")
    )
    return with_sess.groupBy(user_col, "session_id").agg(
        F.min(ts_ns_col).alias("lo_ns"), F.max(ts_ns_col).alias("hi_ns")
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left event
    with right events for the same key that occur in
    ``(left_ts, left_ts + max_delay]`` — the click→purchase /
    impression→conversion attribution shape.

    Both sides carry watermarks and the join has a two-sided time-range
    predicate, so Spark can bound the buffered state on BOTH sides and
    evict rows as the watermark advances — without the range bound the
    state grows forever. The key equality makes this a streaming
    symmetric hash join partitioned by key: each executor buffers only
    its key range's recent rows.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"{key}_r"])
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner")


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    max_delay: str = "30 minutes",
) -> DataFrame:
    """Batch twin of :func:`interval_join_stream` (same predicate, no
    watermarks) — the consistency oracle for tests."""
    cond = (
        (left[key] == right[f"{key}_r"])
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return left.join(right, cond, "inner")


def upsert_sink(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    query_name: str = "upsert_sink",
    timeout_s: int = 120,
):
    """Streaming MERGE/upsert via ``foreachBatch``: each micro-batch is
    merged into a parquet target with latest-wins-per-key semantics
    (max ``version_col``; ties go to the incoming batch).

    ``foreachBatch`` is the escape hatch Structured Streaming provides
    for sinks without native idempotent-merge support: the batch is a
    normal DataFrame, so the merge is the same union + row_number plan
    as the batch `orders_upsert` query. The rewrite-whole-target shown
    here is correct for dimension-sized state; at 100TB the identical
    ``merge_fn`` body becomes a Delta/Iceberg ``MERGE INTO`` (row-level,
    transactional) — the orchestration (checkpointed offsets +
    per-batch merge) is unchanged. Batch id + checkpoint make replays
    idempotent: re-merging an already-applied batch is a no-op because
    max-version keeps the stored row.
    """
    from pyspark.sql.window import Window

    spark = stream_df.sparkSession

    def merge_fn(batch_df: DataFrame, batch_id: int) -> None:
        try:
            current = spark.read.parquet(path)
            merged = current.withColumn("_src", F.lit(1)).unionByName(
                batch_df.withColumn("_src", F.lit(2))
            )
        except Exception:  # first batch: nothing to merge into
            merged = batch_df.withColumn("_src", F.lit(2))
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(version_col).desc(), F.col("_src").desc()
        )
        out = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        # rewrite target atomically-enough for tests (real deployments:
        # transactional table format)
        out.localCheckpoint().write.mode("overwrite").parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(merge_fn)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", path + "_chk")
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup pattern
    (events x user table, clicks x product catalog). The static side
    broadcasts per micro-batch, so the stream side never shuffles and
    no streaming state accrues (unlike stream-stream joins, nothing to
    watermark: the static side is re-read each batch, which is also
    what picks up slowly-changing dim updates). At 100TB-per-day rates
    the only knob is keeping the dim broadcast-sized or pre-bucketing
    both sides."""
    return stream.join(F.broadcast(dim), key, how)


def streaming_hll_registers(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 10,
) -> DataFrame:
    """Streaming per-window HLL register maintenance: the mergeable-
    sketch property is exactly what makes COUNT DISTINCT streamable —
    state per (window, bucket) is ONE long (the max rho), bounded at
    2^p rows per window regardless of stream volume, and late events
    inside the watermark fold in with a max (commutative, idempotent —
    replays are harmless). Feed the sink table to
    ``sketch.hll_estimate_by`` for estimates; registers from the
    stream are bit-identical to a batch ``hll_registers_by`` over the
    same data (tested)."""
    from certa_spark.operators.sketch import hll_bucket_rho

    bucket, rho = hll_bucket_rho(col, p)
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window_duration).alias("w"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(F.col("w.start").alias("window_start"), "bucket")
        .agg(F.max("rho").alias("m"))
    )


def streaming_oph_registers(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 128,
) -> DataFrame:
    """Streaming per-window OPH MinHash register maintenance
    (sketch.oph_registers' streaming twin): state per (window, bin) is
    ONE long — the minimum hash — bounded at k rows per window
    whatever the stream volume; late events inside the watermark fold
    in with an idempotent min, so replays are harmless. Register
    tables from different windows/streams feed ``sketch.oph_jaccard``
    for cross-window set-similarity, the question HLL registers
    cannot answer. Bit-identical to the batch sketch over the same
    data (tested)."""
    from certa_spark.functions.hashing import hash64

    h = hash64(F.col(col).cast("string"))
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.pmod(h, F.lit(k)).cast("int").alias("bin"),
            h.alias("_h"),
        )
        .groupBy(F.col("w.start").alias("window_start"), "bin")
        .agg(F.min("_h").alias("mn"))
    )
