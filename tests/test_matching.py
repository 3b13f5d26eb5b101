"""Matcher boundary tests: native vs pandas twin, mapInPandas adapter."""

import pandas as pd
from pyspark.sql import functions as F

from certa_spark.matching import NativeCosineMatcher, PandasPredictAdapter
from certa_spark.operators.pairs import merge_sources


def _pairs_df(spark, er_tables, n=12):
    rows_a, rows_b, A, B = er_tables
    pairs = spark.createDataFrame(
        [(i % 40, (i * 7) % 40, 0) for i in range(n)],
        ["ltable_id", "rtable_id", "label"],
    )
    return merge_sources(pairs, A, B)


def test_native_matches_pandas_twin(spark, er_tables):
    wide = _pairs_df(spark, er_tables)
    m = NativeCosineMatcher()
    got = m.predict(wide).orderBy("ltable_id", "rtable_id").toPandas()
    exp = m.predict_pandas(wide.orderBy("ltable_id", "rtable_id").toPandas())
    for g, e in zip(got["match_score"], exp["match_score"]):
        assert abs(g - e) < 1e-9
    # scores sum to 1
    assert ((got["match_score"] + got["nomatch_score"] - 1.0).abs() < 1e-12).all()


def test_pandas_adapter_agrees_with_native(spark, er_tables):
    wide = _pairs_df(spark, er_tables)
    native = NativeCosineMatcher()
    ref = native.predict(wide).orderBy("ltable_id", "rtable_id").toPandas()

    twin = NativeCosineMatcher()
    adapter = PandasPredictAdapter(predict_fn=twin.predict_pandas)
    got = adapter.predict(wide).orderBy("ltable_id", "rtable_id").toPandas()
    for g, e in zip(got["match_score"], ref["match_score"]):
        assert abs(g - e) < 1e-9


def test_adapter_factory_path(spark, er_tables):
    wide = _pairs_df(spark, er_tables, n=6)

    def factory():
        m = NativeCosineMatcher()
        return m.predict_pandas

    adapter = PandasPredictAdapter(factory=factory)
    out = adapter.predict(wide)
    assert out.count() == 6
    assert "match_score" in out.columns
