import pytest


@pytest.fixture(scope="session")
def spark():
    from ringo_spark.catalog import get_spark

    s = get_spark("ringo-tests", 4)
    yield s
