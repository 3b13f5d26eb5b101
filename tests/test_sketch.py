"""HLL sketch: accuracy, mergeability, and the linear-counting range."""

from pyspark.sql import functions as F

from certa_spark.operators.sketch import hll_estimate, hll_merge, hll_registers


def _est(regs, p=10):
    return hll_estimate(regs, p=p).collect()[0]["hll_estimate"]


def test_hll_accuracy_large_range(spark):
    # 20k distinct values >> 2.5 * 1024 -> the raw HLL estimator path;
    # expected relative error ~1.04/sqrt(1024) ~ 3.2%
    df = spark.range(20000).select(F.col("id").alias("v"))
    est = _est(hll_registers(df, "v"))
    assert abs(est - 20000) / 20000 < 0.10


def test_hll_linear_counting_small_range(spark):
    # 300 distinct << 2.5 * m -> linear counting; tight at this range
    df = spark.range(300).select(F.col("id").alias("v"))
    est = _est(hll_registers(df, "v"))
    assert abs(est - 300) / 300 < 0.05


def test_hll_duplicates_dont_move_estimate(spark):
    base = spark.range(5000).select(F.col("id").alias("v"))
    dup = base.union(base).union(base)
    assert _est(hll_registers(base, "v")) == _est(hll_registers(dup, "v"))


def test_hll_merge_equals_whole(spark):
    # sketch(A) merge sketch(B) == sketch(A union B), for overlapping
    # halves — the property that makes per-partition/per-day sketches
    # combine losslessly at 100TB
    a = spark.range(0, 6000).select(F.col("id").alias("v"))
    b = spark.range(4000, 10000).select(F.col("id").alias("v"))
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    whole = hll_registers(a.union(b), "v")
    assert _est(merged) == _est(whole)
    # register tables themselves are identical, not just the estimate
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
