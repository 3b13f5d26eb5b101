"""Salted skew join: exactness + hot-key spreading."""

from pyspark.sql import functions as F

from certa_spark.operators.skewjoin import salted_join


def test_salted_join_equals_plain_on_skew(spark):
    # 90% of left rows share one hot key
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("rid"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    got = salted_join(left, right, key="k", spread_col="rid", n_salt=8)
    exp = left.join(right, "k")
    assert sorted(map(tuple, got.select("k", "rid", "payload").collect())) == sorted(
        map(tuple, exp.select("k", "rid", "payload").collect())
    )


def test_salt_actually_spreads_hot_key(spark):
    from certa_spark.functions.hashing import hash32

    left = spark.range(0, 1000).select(
        F.lit(7).alias("k"), F.col("id").alias("rid")
    )
    salts = (
        left.select((hash32(F.col("rid"), seed=99) % 8).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    # all 8 salt values used, none holding more than half the rows
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 500
