import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoio_jl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "geoio_jl_spark_tests", cores=8, shuffle_partitions=8,
        driver_memory="8g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GEOIO_TEST_SF_DIR", "/root/testdata/sf0.001")
