"""sessionize_bounds: gap splitting and interval endpoints."""

from certa_spark.streaming.events import sessionize_bounds


def test_bounds_gap_split(spark):
    rows = [
        (1, 100, 0), (1, 150, 1), (1, 900, 2),  # gap 750 > 500 splits
        (2, 120, 3),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ns long, event_id long")
    got = {
        (r["user_id"], r["session_id"]): (r["lo_ns"], r["hi_ns"])
        for r in sessionize_bounds(df, gap_ns=500).collect()
    }
    assert got == {
        (1, 1): (100, 150),
        (1, 2): (900, 900),
        (2, 1): (120, 120),
    }


def test_sessionize_salted_equals_plain_on_skew(spark):
    """Two-phase segmented sessionize == plain lag+cumsum version, on a
    single-user firehose whose sessions straddle block boundaries."""
    import random

    from certa_spark.streaming.events import (
        sessionize_batch,
        sessionize_batch_salted,
    )

    rng = random.Random(13)
    gap = 1000
    rows, ts = [], 0
    for i in range(500):
        # mix of sub-gap steps and session-breaking jumps
        ts += rng.choice([1, 10, 100, 1500, 5000])
        rows.append((i, ts, 1, float(i % 7)))
    rows += [(1000 + i, i * 3000, 2, 1.0) for i in range(10)]  # cold user
    df = spark.createDataFrame(
        rows, "event_id long, ts_ns long, user_id long, value double"
    )

    def canon(out):
        return sorted(
            (r["user_id"], r["session_id"], r["n_events"], r["sum_value"])
            for r in out.collect()
        )

    plain = sessionize_batch(df, gap_ns=gap)
    # tiny blocks so the hot user spans many (incl. empty) blocks
    salted = sessionize_batch_salted(df, gap_ns=gap, block_ns=700)
    assert canon(plain) == canon(salted)


def test_bench_calibration_sentinel_and_flag(spark):
    """r7 bench hygiene: the ambient-load sentinel must produce a
    positive wall-clock sample, and the flag logic must trip exactly
    on a >1.3x regression vs the previous recorded sweep."""
    import bench

    cal = bench.calibration_sentinel(spark, runs=1)
    assert cal > 0.0
    assert bench.calibration_flag(1.0, None) is False
    assert bench.calibration_flag(1.2, 1.0) is False
    assert bench.calibration_flag(1.31, 1.0) is True
    assert bench.calibration_flag(0.5, 1.0) is False
