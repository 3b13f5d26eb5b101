import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from certa_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def er_tables(spark):
    from tests.fixtures import COLS, make_tables

    rows_a, rows_b = make_tables(60, 60)
    A = spark.createDataFrame(rows_a, COLS)
    B = spark.createDataFrame(rows_b, COLS)
    return rows_a, rows_b, A, B
