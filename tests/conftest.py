import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ophidia_server_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from ophidia_server_spark.session import load_tables

    return load_tables(spark, SF)
