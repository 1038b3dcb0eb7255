import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from big_data_analysis_spark.session import get_spark

    return get_spark("tests")


@pytest.fixture(scope="session")
def duck():
    from big_data_analysis_spark.parity import duck_connect

    return duck_connect(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
