from __future__ import annotations

import pytest

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from tdk_apache_log_etl_spark.session import get_spark

    s = get_spark("tdk-tests")
    yield s
