"""As-of join + bucketized range join: semantics edge cases."""

from certa_spark.operators.asof import asof_join
from certa_spark.operators.rangejoin import point_in_interval_join


def _asof(spark, left, right, **kw):
    l = spark.createDataFrame(left, "k long, ts long, lid long")
    r = spark.createDataFrame(right, "k long, ts long, rid long, v double")
    out = asof_join(
        l, r, on=["k"], ts_col="ts", payload_cols=["v"],
        tiebreak_col="rid", **kw
    )
    return {row["lid"]: (row["asof_ts"], row["asof_v"]) for row in out.collect()}


def test_asof_picks_latest_predecessor(spark):
    got = _asof(
        spark,
        [(1, 100, 1), (1, 250, 2)],
        [(1, 50, 10, 0.5), (1, 90, 11, 0.9), (1, 200, 12, 2.0)],
    )
    assert got == {1: (90, 0.9), 2: (200, 2.0)}


def test_asof_equal_ts_matches_and_no_predecessor_is_null(spark):
    got = _asof(spark, [(1, 100, 1), (1, 10, 2)], [(1, 100, 10, 7.0)])
    assert got == {1: (100, 7.0), 2: (None, None)}


def test_asof_keys_do_not_leak(spark):
    got = _asof(spark, [(1, 100, 1), (2, 100, 2)], [(1, 50, 10, 1.0)])
    assert got == {1: (50, 1.0), 2: (None, None)}


def test_asof_tolerance(spark):
    got = _asof(
        spark, [(1, 100, 1), (1, 500, 2)], [(1, 90, 10, 1.0)], tolerance=50
    )
    assert got == {1: (90, 1.0), 2: (None, None)}


def test_asof_tiebreak_largest_wins(spark):
    got = _asof(spark, [(1, 100, 1)], [(1, 90, 10, 1.0), (1, 90, 11, 2.0)])
    assert got == {1: (90, 2.0)}


def test_asof_forward_direction(spark):
    got = _asof(
        spark,
        [(1, 100, 1), (1, 300, 2)],
        [(1, 100, 10, 1.0), (1, 250, 11, 2.5), (1, 50, 12, 0.5)],
        direction="forward",
    )
    # probe 100 matches the equal-ts reference; probe 300 has no later
    # reference
    assert got == {1: (100, 1.0), 2: (None, None)}


def test_asof_forward_tolerance(spark):
    got = _asof(
        spark,
        [(1, 100, 1), (1, 200, 2)],
        [(1, 140, 10, 1.0), (1, 260, 11, 2.0)],
        direction="forward",
        tolerance=50,
    )
    assert got == {1: (140, 1.0), 2: (None, None)}


def _rj(spark, points, intervals, width):
    p = spark.createDataFrame(points, "k long, p long, pid long")
    i = spark.createDataFrame(intervals, "k long, lo long, hi long, iid long")
    out = point_in_interval_join(
        p, i, on=["k"], point_col="p", lo_col="lo", hi_col="hi", bucket_width=width
    )
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_range_join_basic_and_no_duplicates_across_buckets(spark):
    # interval spans 4 buckets at width 10; each contained point must
    # appear exactly once
    pairs = _rj(
        spark,
        [(1, 5, 1), (1, 25, 2), (1, 39, 3), (1, 41, 4)],
        [(1, 3, 40, 100)],
        width=10,
    )
    assert pairs == [(1, 100), (2, 100), (3, 100)]


def test_range_join_boundaries_inclusive(spark):
    assert _rj(spark, [(1, 3, 1), (1, 40, 2)], [(1, 3, 40, 9)], 7) == [
        (1, 9),
        (2, 9),
    ]


def test_range_join_overlapping_intervals_multi_match(spark):
    pairs = _rj(
        spark, [(1, 15, 1)], [(1, 10, 20, 7), (1, 14, 16, 8), (1, 16, 30, 9)], 5
    )
    assert pairs == [(1, 7), (1, 8)]


def test_range_join_key_isolation(spark):
    assert _rj(spark, [(2, 15, 1)], [(1, 10, 20, 7)], 5) == []


def test_asof_pitl_matches_interval_join(spark):
    """The as-of formulation of SCD2 point-in-time lookup must equal
    the BETWEEN interval join, including zero-length same-ts intervals
    (highest tiebreak wins) and probes before any interval (nulls)."""
    from certa_spark.operators.asof import asof_join
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    dim_rows = [
        (1, 101, 10.0, 100), (1, 102, 20.0, 200),
        # zero-length: two versions at ts=200 -> 103 dominates
        (1, 103, 30.0, 200), (1, 104, 40.0, 300),
        (2, 201, 5.0, 150),
    ]
    dim = spark.createDataFrame(
        dim_rows, "k long, ver long, price double, ts long"
    )
    probes = spark.createDataFrame(
        [(1, 50), (1, 100), (1, 200), (1, 250), (1, 999), (2, 150)],
        "k long, ts long",
    )
    got = {
        (r["k"], r["ts"]): (r["asof_ver"], r["asof_price"])
        for r in asof_join(
            probes, dim, on=["k"], ts_col="ts",
            payload_cols=["ver", "price"], tiebreak_col="ver",
        ).collect()
    }
    # interval twin
    w = Window.partitionBy("k").orderBy("ts", "ver")
    iv = dim.select("k", "ver", "price", F.col("ts").alias("f"),
                    F.lead("ts").over(w).alias("t"))
    want = {
        (r["k"], r["ts"]): (r["ver"], r["price"])
        for r in probes.join(
            iv,
            (probes.k == iv.k) & (iv.f <= probes.ts)
            & (iv.t.isNull() | (probes.ts < iv.t)),
            "left",
        ).select(probes.k, probes.ts, iv.ver, iv.price).collect()
    }
    assert got == want
    assert got[(1, 50)] == (None, None)
    assert got[(1, 200)] == (103, 30.0)
