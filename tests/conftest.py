import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from scalecast_spark import get_session

    s = get_session("scalecast-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
