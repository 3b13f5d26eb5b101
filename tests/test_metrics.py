"""Metric golden tests on hand-computed fixtures (FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from certa_spark import metrics as M
from certa_spark.matching import NativeCosineMatcher


class ConstMatcher:
    """Scripted matcher: match_score from a lookup on ltable_name."""

    def __init__(self, scores):
        self.scores = scores

    def predict(self, pairs):
        expr = F.lit(0.5)
        for k, v in self.scores.items():
            expr = F.when(F.col("ltable_name") == k, F.lit(v)).otherwise(expr)
        return pairs.withColumn("match_score", expr).withColumn(
            "nomatch_score", 1.0 - F.col("match_score")
        )


def _cfs(spark):
    return spark.createDataFrame(
        [
            ("a", "x", "1"),
            ("b", "y", "2"),
            ("c", "z", "3"),
        ],
        ["ltable_name", "rtable_name", "ltable_price"],
    )


def test_cf_validity(spark):
    cfs = _cfs(spark)
    m = ConstMatcher({"a": 0.1, "b": 0.2, "c": 0.9})
    # explaining class 1: flipped means match_score < 0.5 -> 2 of 3
    assert abs(M.cf_validity(cfs, 1, m) - 2 / 3) < 1e-12


def test_cf_proximity_and_sparsity(spark):
    cfs = _cfs(spark)
    original = {"ltable_name": "a", "rtable_name": "zz", "ltable_price": "1"}
    # rows: (a,x,1)->2 matches, (b,y,2)->0, (c,z,3)->0 => mean 2/3
    prox = M.cf_proximity(cfs, original)
    assert abs(prox - 2 / 3) < 1e-12
    assert abs(M.cf_sparsity(prox, 3) - (1 - (2 / 3) / 1.5)) < 1e-12


def test_cf_diversity(spark):
    cfs = spark.createDataFrame(
        [("a", "x"), ("a", "y")], ["ltable_name", "rtable_name"]
    )
    # one pair, disagreement ratio = 1/2
    assert abs(M.cf_diversity(cfs, ["ltable_name", "rtable_name"]) - 0.5) < 1e-12
    single = spark.createDataFrame([("a", "x")], ["ltable_name", "rtable_name"])
    assert M.cf_diversity(single, ["ltable_name", "rtable_name"]) == 0.0


def test_faithfulness_masking(spark):
    pairs = spark.createDataFrame(
        [("same text here", "same text here", 1), ("aaa bbb", "ccc ddd", 0)],
        ["ltable_name", "rtable_name", "label"],
    )
    sal = {"ltable_name": 0.9, "rtable_name": 0.1}
    masked = M.mask_top_attributes(pairs, sal, 0.5)
    assert masked.select("ltable_name").distinct().collect()[0][0] == ""
    auc = M.faithfulness_auc(pairs, "label", sal, NativeCosineMatcher())
    assert 0.0 <= auc <= 1.0


def test_class_balance(spark):
    pairs = spark.createDataFrame([(1,), (1,), (0,)], ["label"])
    got = {r["label"]: r["n"] for r in M.class_balance(pairs).collect()}
    assert got == {1: 2, 0: 1}


def test_check_properties_symmetric_matcher(spark):
    ls = spark.createDataFrame(
        [(1, "apple pie recipe"), (2, "quantum physics")], ["id", "name"]
    )
    rs = spark.createDataFrame([(10, "apple pie recipe")], ["id", "name"])
    ident, sym, trans = M.check_properties(
        spark, ("0@1", "1@10", "0@2"), ls, rs, NativeCosineMatcher()
    )
    # cosine matcher is reflexive and symmetric by construction
    assert ident is True
    assert sym is True
    assert trans in (True, False)


def test_confidence_indication_runs(spark):
    import random

    rng = random.Random(3)
    rows = [
        (rng.random(), rng.random(), rng.random()) for _ in range(60)
    ]
    df = spark.createDataFrame(rows, ["f1", "f2", "confidence"])
    out = M.confidence_indication(df, feature_cols=["f1", "f2"], folds=2)
    assert out["mae"] >= 0.0
