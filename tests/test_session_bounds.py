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
