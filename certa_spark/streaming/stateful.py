"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 green-field; the reference has no streaming).

Per-key running z-score: for every event, score its ``value`` against
the running mean/variance of all PRIOR events of the same user
(Welford accumulation in group state), then fold the event in. This is
the canonical "needs custom state" shape — per-key evolving moments
can't be expressed with watermarked built-in aggregations because each
row's output depends on the state BEFORE it.

Scale notes: state is 3 doubles per key (bounded, no event history);
keys shard across executors by the groupBy hash, so a 100TB stream
parallelizes per-user. Per-key processing is inherently sequential —
that's the semantics, not an implementation artifact. Use the timeout
to reap idle users' state.

The batch twin (:func:`running_zscore_batch`) expresses the same thing
with an UNBOUNDED PRECEDING .. 1 PRECEDING window frame and is
oracle-checked against DuckDB (queries.events_running_zscore).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# z is emitted only when at least MIN_PRIOR prior events exist and the
# prior variance clears a conditioning floor (identical prior values
# would otherwise divide by a float-noise sigma).
MIN_PRIOR = 2
VAR_FLOOR = 1e-9

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_ns", LongType()),
        StructField("value", DoubleType()),
        StructField("n_prior", LongType()),
        StructField("z", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _round_like_spark(x: float, digits: int) -> float:
    """Spark's ``F.round`` on doubles: HALF_UP on the SHORTEST decimal
    representation (``BigDecimal.valueOf`` goes through
    ``Double.toString``). Python's ``round()`` is half-even on the
    binary value and disagrees on the ...5 shortest-repr tie class —
    the exact divergence family documented in this repo's cross-engine
    parity notes — so the stream fold must round THIS way to stay
    bit-identical to the batch twin (and their shared oracle)."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-digits),
            rounding=decimal.ROUND_HALF_UP,
        )
    )


def _fold_zscore_chunks(
    key0, chunks, cnt: int, mean: float, m2: float
) -> tuple[list, int, float, float]:
    """The shared Welford fold over one group's Arrow chunks — SINGLE
    source of truth for both stateful APIs (applyInPandasWithState and
    transformWithStateInPandas), so the two implementations cannot
    drift. Concat THEN sort: a group larger than
    arrow.maxRecordsPerBatch arrives as several chunks — sorting per
    chunk would fold a multi-chunk group out of (ts_ns, event_id)
    order and break the total-order equality with the batch twin that
    the hash gate relies on."""
    import pandas as pd

    out_rows: list = []
    chunks = [pdf for pdf in chunks if len(pdf)]
    if chunks:
        whole = (
            pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ).sort_values(["ts_ns", "event_id"])
        for r in whole.itertuples(index=False):
            if pd.isna(r.value):
                # mirror the batch twin: count(value)/avg/var skip
                # nulls, so a null-valued event is emitted (z null,
                # n_prior = prior non-null count) without touching
                # the moments
                out_rows.append(
                    (key0, r.event_id, r.ts_ns, None, cnt, None)
                )
                continue
            var = m2 / (cnt - 1) if cnt >= 2 else 0.0
            z = (
                _round_like_spark((r.value - mean) / var**0.5, 4)
                if cnt >= MIN_PRIOR and var > VAR_FLOOR
                else None
            )
            out_rows.append((key0, r.event_id, r.ts_ns, r.value, cnt, z))
            cnt += 1
            delta = r.value - mean
            mean += delta / cnt
            m2 += delta * (r.value - mean)
    return out_rows, cnt, mean, m2


def _score_group(
    key: Tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    cnt, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_rows, cnt, mean, m2 = _fold_zscore_chunks(
        key[0], pdfs, cnt, mean, m2
    )
    state.update((cnt, mean, m2))
    # yield nothing for an empty update: pyspark's state serializer
    # concatenates emitted frames, and empty/all-NA frames trip the
    # pandas concat deprecation that becomes an error under pandas 3
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "event_id", "ts_ns", "value", "n_prior", "z"],
        )


def running_zscore_stream(
    stream: DataFrame,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Stateful per-user running z-score over an event stream.

    Expects columns (user_id, event_id, ts_ns, value). Within a
    micro-batch, rows are folded in (ts_ns, event_id) order; across
    micro-batches, state carries the moments forward. Note streaming
    gives per-BATCH ordering, not total ordering — late rows score
    against the state at arrival time (the batch twin is the total-order
    spec).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _score_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def running_zscore_stream_tws(stream: DataFrame) -> DataFrame:
    """:func:`running_zscore_stream` on Spark 4's NEW arbitrary-state
    API (``transformWithStateInPandas`` + ``StatefulProcessor``):
    typed ValueState (the same 3 scalars), per-key handleInputRows,
    and — the reasons to migrate at scale — native TTL on every state
    handle, timers, and first-class RocksDB backing. The fold is the
    SAME function the applyInPandasWithState path runs
    (:func:`_fold_zscore_chunks`), so the two APIs are output-
    equivalent by construction.

    ENVIRONMENT SEAM: transformWithState's state-server protocol
    needs the ``protobuf`` package, which this sandbox lacks (the
    driver worker raises ``ImportError: google.protobuf`` at query
    start) — the equality test in tests/test_io_streaming_mm.py
    skips when protobuf is missing and runs verbatim where it is
    installed. The fold itself stays fully covered through the
    applyInPandasWithState twin."""
    from pyspark.sql.streaming import StatefulProcessor

    class _ZScoreProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._moments = handle.getValueState(
                "moments", "cnt long, mean double, m2 double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            st = self._moments.get()
            cnt, mean, m2 = st if st is not None else (0, 0.0, 0.0)
            out_rows, cnt, mean, m2 = _fold_zscore_chunks(
                key[0], rows, cnt, mean, m2
            )
            self._moments.update((cnt, mean, m2))
            if out_rows:  # no empty frames to the serializer
                yield pd.DataFrame(
                    out_rows,
                    columns=[
                        "user_id", "event_id", "ts_ns", "value",
                        "n_prior", "z",
                    ],
                )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_ZScoreProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def running_zscore_batch(events: DataFrame) -> DataFrame:
    """Batch twin: prior-frame window aggregates, one shuffle on
    user_id shared by all four window functions (same frame spec).
    Emits the same schema as the stream variant, totally ordered."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_prior = F.count("value").over(w)
    mean_p = F.avg("value").over(w)
    var_p = F.var_samp("value").over(w)
    return events.select(
        "user_id",
        "event_id",
        "ts_ns",
        "value",
        n_prior.alias("n_prior"),
        F.when(
            (n_prior >= MIN_PRIOR) & (var_p > VAR_FLOOR),
            F.round((F.col("value") - mean_p) / F.sqrt(var_p), 4),
        ).alias("z"),
    )


# ------------------------------------------------------------- funnel

_FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("completed_ns", LongType()),
        StructField("duration_ns", LongType()),
    ]
)
# (stage reached, ts of first-step event, ts of last qualifying step,
# failed flag — a step window expired, so the user can never complete)
_FUNNEL_STATE = StructType(
    [
        StructField("stage", LongType()),
        StructField("t_first", LongType()),
        StructField("t_prev", LongType()),
        StructField("failed", LongType()),
    ]
)


def make_funnel_fn(steps: list, horizon_ns: int | None):
    """Build the per-group state function for :func:`funnel_stream`.
    Greedy earliest-qualifying advance == the batch funnel's chained
    min-aggregates (a later step event past the horizon can never
    re-qualify, because the earliest one already couldn't)."""

    def _fn(key, pdfs, state):
        import pandas as pd

        stage, t_first, t_prev, failed = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        out = []
        # concat-then-sort for multi-chunk groups — see _score_group
        chunks = [pdf for pdf in pdfs if len(pdf)]
        whole = (
            (pd.concat(chunks) if len(chunks) > 1 else chunks[0])
            .sort_values(["ts_ns", "event_id"])
            if chunks
            else None
        )
        if whole is not None:
            for r in whole.itertuples(index=False):
                if failed or stage >= len(steps):
                    break
                # null ts/type rows can never satisfy the batch
                # funnel's equality/range predicates — and a NaN ts
                # would poison the integer stage clock
                if pd.isna(r.ts_ns) or pd.isna(r.event_type):
                    continue
                if r.event_type != steps[stage]:
                    continue
                if stage == 0:
                    stage, t_first, t_prev = 1, r.ts_ns, r.ts_ns
                else:
                    if r.ts_ns <= t_prev:
                        continue
                    if horizon_ns is not None and r.ts_ns > t_prev + horizon_ns:
                        failed = 1
                        continue
                    stage, t_prev = stage + 1, r.ts_ns
                if stage == len(steps):
                    out.append((key[0], t_prev, t_prev - t_first))
        state.update((stage, t_first, t_prev, failed))
        if out:  # see _score_group: no empty frames to the serializer
            yield pd.DataFrame(
                out, columns=["user_id", "completed_ns", "duration_ns"]
            )

    return _fn


def funnel_stream(
    stream: DataFrame,
    steps: list,
    horizon_ns: int | None = None,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Stateful streaming funnel: emits one row per user the moment
    they complete the LAST step, with end-to-end duration. State is
    four longs per user — bounded regardless of event volume; events
    not matching the awaited step cost a comparison and are dropped.
    Batch twin: ``operators/funnel.funnel_user_times`` (parity-tested
    on a single-batch replay)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        make_funnel_fn(steps, horizon_ns),
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


_HH_OUT_SCHEMA = "window_start timestamp, item string, c long"
_HH_STATE_SCHEMA = "items array<string>, counts array<long>"


def make_heavy_hitters_fn(col: str, k: int):
    """Build the per-window state fold for
    :func:`heavy_hitters_stream`: state is the Misra-Gries summary
    (two parallel arrays, <= k entries); each micro-batch's exact
    value_counts merges in with the subtract-(k+1)th-largest
    truncation — the same mergeable-summaries step as the batch
    operator, so the MG bound (count - n/(k+1) <= c <= count over the
    window's rows so far) survives any batch boundaries."""

    def _fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            items, counts = state.get
            counters = pd.Series(
                list(counts), index=list(items), dtype="int64"
            )
        else:
            counters = pd.Series(dtype="int64")
        for pdf in pdfs:
            # dropna first — same rule as the batch operator: nulls
            # must not fabricate a 'None' item the exact recount pass
            # can never match
            vc = pdf[col].dropna().astype(str).value_counts()
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                sub = counters.nlargest(k + 1).iloc[-1]
                counters = counters - sub
                counters = counters[counters > 0]
        state.update(
            (
                [str(i) for i in counters.index],
                [int(v) for v in counters.values],
            )
        )
        if len(counters):  # see _score_group: no empty frames out
            yield pd.DataFrame(
                {
                    "window_start": key[0],
                    "item": counters.index.astype(str),
                    "c": counters.values,
                }
            )

    return _fn


def heavy_hitters_stream(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 256,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming twin of ``sketch.misra_gries``: per-window
    heavy-hitter candidate maintenance with BOUNDED state — <= k
    (item, count) pairs per open window however many distinct items
    the stream carries (the exact-count streaming aggregate this
    replaces holds state linear in the item universe). Each update
    emits the window's current summary; the last update per window is
    its final MG summary, carrying the standard guarantee that every
    item with in-window frequency > n/(k+1) is present — feed those
    candidates to a batch recount (``sketch.heavy_hitters_exact``
    pass 2) for exact top-N, the classic lambda-free two-pass.

    Summary CONTENT depends on micro-batch boundaries (MG is
    order-sensitive); the guarantee does not — that is what the tests
    pin, alongside exactness whenever cardinality stays <= k."""
    g = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(col).cast("string").alias(col),
        )
        .select(F.col("w.start").alias("window_start"), col)
        .groupBy("window_start")
    )
    return g.applyInPandasWithState(
        make_heavy_hitters_fn(col, k),
        outputStructType=_HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
