"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship CERTA explain on sf0.001 (ER cast of
                 customer/supplier), returns the saliency DataFrame.
queries()     -> one callable per implemented operator family
                 (SURVEY.md §2 + training-data extensions); see
                 certa_spark/queries.py.
oracle_sql()  -> DuckDB twins computing identical results.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CERTA saliency explanation of one part-vs-variant
    pair over /root/testdata/sf0.001 with the deterministic native
    matcher (SURVEY.md §3.1 pipeline, end-to-end)."""
    from certa_spark.explainer import CertaExplainer
    from certa_spark.matching import NativeCosineMatcher
    from certa_spark.queries import _er_sources

    sf_dir = "/root/testdata/sf0.001"
    lsource, rsource = _er_sources(spark, sf_dir)
    explainer = CertaExplainer(spark, lsource, rsource, data_augmentation="no")
    l_rec = {k: v for k, v in zip(lsource.columns, lsource.orderBy("id").first())}
    r_rec = {k: v for k, v in zip(rsource.columns, rsource.orderBy("id").first())}
    result = explainer.explain(
        l_rec, r_rec, NativeCosineMatcher(), num_triangles=10
    )
    sal = result.saliency
    if len(sal) == 0:
        return spark.createDataFrame([(0.0,)], ["empty"])
    return spark.createDataFrame(sal)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from certa_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from certa_spark.queries import ORACLES

    return dict(ORACLES)
